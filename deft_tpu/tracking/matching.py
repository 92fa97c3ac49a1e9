"""Association cost construction + motion fusion.

Mirror of ``/root/reference/src/lib/utils/matching.py`` on top of the
dependency-free IoU/assignment ops: ``iou_distance`` (optionally against LSTM
future predictions), ``iou_ddd_distance`` (BEV 3-D IoU), ``fuse_motion``
(Mahalanobis or gaussian gating blended into the appearance cost) and
``fuse_motion_ddd`` (3-D center distance gate scaled by depth).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from deft_tpu.ops.iou import pairwise_iou, pairwise_iou3d
from deft_tpu.tracking.assignment import linear_assignment  # re-export
from deft_tpu.tracking.kalman import chi2inv95

__all__ = [
    "linear_assignment", "ious", "iou_distance", "iou_ddd_distance",
    "embedding_distance", "gate_cost_matrix", "fuse_motion",
    "fuse_motion_ddd", "merge_matches",
]


def merge_matches(m1, m2, shape):
    """Compose two partial matchings (matching.py:11-25): (O->P) . (P->Q)."""
    o, p, q = shape
    a = np.zeros((o, p), bool)
    b = np.zeros((p, q), bool)
    for i, j in np.asarray(m1).reshape(-1, 2):
        a[i, j] = True
    for i, j in np.asarray(m2).reshape(-1, 2):
        b[i, j] = True
    mask = a @ b
    match = [(i, j) for i, j in zip(*np.nonzero(mask))]
    unmatched_o = tuple(set(range(o)) - {i for i, _ in match})
    unmatched_q = tuple(set(range(q)) - {j for _, j in match})
    return match, unmatched_o, unmatched_q


def ious(atlbrs, btlbrs) -> np.ndarray:
    if len(atlbrs) == 0 or len(btlbrs) == 0:
        return np.zeros((len(atlbrs), len(btlbrs)))
    return pairwise_iou(np.asarray(atlbrs), np.asarray(btlbrs))


def iou_distance(atracks, btracks, frame_id: int = 0,
                 use_prediction: bool = True) -> np.ndarray:
    """1 - IoU cost; tracks may be STrack lists or raw tlbr arrays
    (matching.py:80-104)."""
    if (len(atracks) > 0 and isinstance(atracks[0], np.ndarray)) or (
        len(btracks) > 0 and isinstance(btracks[0], np.ndarray)
    ):
        atlbrs, btlbrs = atracks, btracks
    else:
        from deft_tpu.tracking.tracker import stacked_tlbrs

        if use_prediction:
            atlbrs = [t.prediction_at_frame_tlbr(frame_id) for t in atracks]
        else:
            atlbrs = stacked_tlbrs(atracks)
        btlbrs = stacked_tlbrs(btracks)
    return 1.0 - ious(atlbrs, btlbrs)


def iou_ddd_distance(atracks, btracks, frame_id: int = 0,
                     use_prediction: bool = True) -> np.ndarray:
    """1 - 3-D IoU on yaw-rotated boxes (matching.py:107-133)."""
    if (len(atracks) > 0 and isinstance(atracks[0], np.ndarray)) or (
        len(btracks) > 0 and isinstance(btracks[0], np.ndarray)
    ):
        aboxes, bboxes = atracks, btracks
    else:
        aboxes = [t.ddd_bbox for t in atracks]
        bboxes = [t.ddd_bbox for t in btracks]
    if len(aboxes) == 0 or len(bboxes) == 0:
        return np.zeros((len(aboxes), len(bboxes)), dtype=np.float32)
    return 1.0 - pairwise_iou3d(aboxes, bboxes)


def embedding_distance(tracks, detections, metric: str = "cosine") -> np.ndarray:
    """Cosine distance on smoothed features (matching.py:276-293; kept for
    API parity although the main DEFT path uses the AFE affinity instead)."""
    cost = np.zeros((len(tracks), len(detections)))
    if cost.size == 0:
        return cost
    det = np.asarray([t.curr_feat for t in detections], dtype=np.float64)
    trk = np.asarray([t.smooth_feat for t in tracks], dtype=np.float64)
    det_n = det / np.maximum(np.linalg.norm(det, axis=1, keepdims=True), 1e-12)
    trk_n = trk / np.maximum(np.linalg.norm(trk, axis=1, keepdims=True), 1e-12)
    return np.maximum(0.0, 1.0 - trk_n @ det_n.T)


def gate_cost_matrix(kf, cost_matrix, tracks, detections,
                     only_position: bool = True) -> np.ndarray:
    if cost_matrix.size == 0:
        return cost_matrix
    gating_dim = 2 if only_position else 4
    gating_threshold = chi2inv95[gating_dim]
    measurements = np.asarray([d.to_xyah() for d in detections])
    for row, track in enumerate(tracks):
        gd = kf.gating_distance(track.mean, track.covariance, measurements,
                                only_position)
        cost_matrix[row, gd > (gating_threshold + 10)] = np.inf
    return cost_matrix


def fuse_motion(kf, cost_matrix, tracks, detections, frame_id: int,
                use_lstm: bool = True, only_position: bool = True,
                lambda_: float = 0.9) -> np.ndarray:
    """Blend appearance cost with motion gating (matching.py:311-364).

    KF path: Mahalanobis vs the filter state, gate at 5x chi2, blend
    ``0.9 c + 0.05 * 0.1 * d``.  LSTM path: gaussian distance vs the LSTM's
    prediction for this frame with empirical covariance, gate at 50 (the
    maha branch for >= 300 observations is preserved).
    """
    if cost_matrix.size == 0:
        return cost_matrix
    gating_dim = 2 if only_position else 4
    gating_threshold = chi2inv95[gating_dim]
    # vectorized to_xyah over the detections (fresh STracks: tlwh = _tlwh)
    tl = np.stack([d.tlwh for d in detections]).astype(np.float64)
    measurements = tl.copy()
    measurements[:, :2] += tl[:, 2:] / 2
    measurements[:, 2] /= np.where(tl[:, 3] != 0, tl[:, 3], 1e-6)

    if not use_lstm and only_position:
        # batched Mahalanobis over all tracks at once (the per-track loop is
        # a hot spot at ~100 tracks/frame); the 2x2 SPD solve is closed-form
        #   d' S^-1 d = (c dx^2 - 2b dx dy + a dy^2) / (ac - b^2)
        # (a batched LAPACK cholesky+solve cost ~2 ms/frame at 300 tracks)
        means = np.stack([t.mean[:2] for t in tracks])          # [T, 2]
        covs = np.stack([t.covariance[:2, :2] for t in tracks]) # [T, 2, 2]
        a = covs[:, 0, 0] + 1e-8
        b = covs[:, 0, 1]
        c = covs[:, 1, 1] + 1e-8
        det = a * c - b * b
        dx = measurements[None, :, 0] - means[:, None, 0]       # [T, M]
        dy = measurements[None, :, 1] - means[:, None, 1]
        gd = (c[:, None] * dx * dx - 2.0 * b[:, None] * dx * dy
              + a[:, None] * dy * dy) / det[:, None]
        cost_matrix[gd > 5.0 * gating_threshold] = np.inf
        return lambda_ * cost_matrix + 0.05 * (1 - lambda_) * gd

    if use_lstm:
        # batched gaussian gating for the common (<300 observations) rows:
        # the gaussian metric is an L2 over dims 3:-1 of the LSTM
        # prediction vs the measurements (kalman_filter_lstm.py:80-102) --
        # identical per-row math, one vectorized pass instead of a
        # per-track loop (the loop was ~9 ms/frame at 100 tracks)
        gauss = [r for r, t in enumerate(tracks)
                 if len(t.observations) < 300]
        if gauss:
            preds = np.stack([tracks[r].prediction_at_frame(frame_id)
                              for r in gauss])                    # [G, 4]
            dd = measurements[None, :, 3:-1] - preds[:, None, 3:-1]
            gd = np.sqrt(np.sum(dd * dd, axis=2))                 # [G, M]
            sub = cost_matrix[gauss]
            sub[gd > 50] = np.inf
            cost_matrix[gauss] = lambda_ * sub + 0.0005 * (1 - lambda_) * gd
        if len(gauss) == len(tracks):
            return cost_matrix

    for row, track in enumerate(tracks):
        if not use_lstm:
            gd = kf.gating_distance(track.mean, track.covariance, measurements,
                                    only_position, metric="maha")
            cost_matrix[row, gd > 5.0 * gating_threshold] = np.inf
            cost_matrix[row] = (
                lambda_ * cost_matrix[row] + 0.05 * (1 - lambda_) * gd
            )
        elif len(track.observations) < 300:
            continue  # handled by the batched gaussian pass above
        elif len(track.observations) >= 300:
            gd = kf.gating_distance(track.prediction_at_frame(frame_id),
                                    track.covariance, measurements,
                                    only_position, metric="maha")
            cost_matrix[row, gd > 5.0 * gating_threshold] = np.inf
            cost_matrix[row] = (
                lambda_ * cost_matrix[row] + 0.05 * (1 - lambda_) * gd
            )
        else:
            gd = kf.gating_distance(track.prediction_at_frame(frame_id),
                                    track.covariance, measurements,
                                    only_position, metric="gaussian")
            cost_matrix[row, gd > 50] = np.inf
            cost_matrix[row] = (
                lambda_ * cost_matrix[row] + 0.0005 * (1 - lambda_) * gd
            )
    return cost_matrix


def fuse_motion_ddd(kf, cost_matrix, tracks, detections, frame_id: int,
                    use_lstm: bool = True, only_position: bool = False,
                    lambda_: float = 0.9, use_prediction: bool = False,
                    classe_name: Optional[str] = None) -> np.ndarray:
    """3-D motion fusion (matching.py:367-415): gaussian distance on
    [h,w,l,x,y,z,rot] dims 3:-1 (the box center), gated at 0.2*depth with a
    class-dependent floor, blended ``0.9 c + 0.001 d``."""
    if cost_matrix.size == 0:
        return cost_matrix
    measurements = np.asarray([d.ddd_bbox for d in detections])
    for row, track in enumerate(tracks):
        ref = (track.ddd_prediction_at_frame(frame_id)
               if use_prediction else track.ddd_bbox)
        gd = kf.gating_distance(ref, track.covariance, measurements,
                                only_position, metric="gaussian")
        thr = 0.2 * track.depth
        floor = 5.0 if classe_name == "pedestrian" else 10.0
        thr = max(thr, floor)
        cost_matrix[row, gd > thr] = np.inf
        cost_matrix[row] = lambda_ * cost_matrix[row] + 0.001 * gd
    return cost_matrix
