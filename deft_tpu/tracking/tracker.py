"""Online track management: ring-buffer recorder, STrack lifecycle, cascade.

Rebuild of ``/root/reference/src/lib/utils/tracker.py`` with a TPU-first
split of responsibilities:

* ``DeviceFeatureRecorder`` keeps the 50-frame embedding window as a
  fixed-shape device array ``[W, max_object, E]`` and evaluates the AFE
  similarity of the current frame against ALL buffered frames in ONE batched
  jitted call (the reference loops <= 50 separate GPU calls per frame,
  tracker.py:76-90).  Only the final [W, N, N+1] similarity tensor crosses to
  host, where the temporal decay weighting is applied.

* ``STrack`` / ``Tracker`` reproduce the association cascade host-side
  (appearance -> motion fusion -> second-chance AFE -> IoU -> lifecycle,
  tracker.py:723-1056) including the dataset-specific branches: the nuScenes
  per-class 3-D IoU pre-step, the KITTI car filter (applied by the caller),
  and the age-based removal windows.

The tracker never touches the model: embeddings arrive pre-computed from the
fused detect program, and similarity comes through an injected callable, so
the whole module is testable without a network.
"""

from __future__ import annotations

from collections import deque
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from deft_tpu.tracking import matching
from deft_tpu.tracking.basetrack import BaseTrack, IdAllocator, TrackState
from deft_tpu.tracking.kalman import KalmanFilter
from deft_tpu.tracking.motion_lstm import LSTMMotion

MAX_RECORD_FRAME = 50
DECAY = 1.0
DECAY2 = 0.01
MAX_TRACK_NODE = 50


_EYE4 = np.eye(4)
_EYE4.setflags(write=False)


def freshness_window(dataset: str) -> int:
    """Frames considered 'fresh' for full-strength similarity
    (tracker.py:77-82)."""
    if dataset == "kitti_tracking":
        return 5
    if dataset == "nuscenes":
        return 3
    return 10


class Node:
    """Pointer into the recorder: (frame_index, detection index)."""

    __slots__ = ("frame_index", "id")

    def __init__(self, frame_index: int, det_id: int):
        self.frame_index = frame_index
        self.id = det_id


class DeviceFeatureRecorder:
    """Fixed-shape on-device embedding window + host-side similarity cache.

    ``similarity_fn(window_embeds [W,M,E], counts [W], cur [M,E], n_cur)``
    must return a [W, M, M+1] array (AFE.window_similarity); it is invoked
    once per frame.
    """

    def __init__(self, dataset: str, max_object: int, embed_dim: int,
                 similarity_fn: Callable, window: int = MAX_RECORD_FRAME):
        import jax.numpy as jnp

        self._jnp = jnp
        self.dataset = dataset
        self.window = window
        self.max_object = max_object
        self.embed_dim = embed_dim
        self.similarity_fn = similarity_fn

        self.embeds = jnp.zeros((window, max_object, embed_dim), jnp.float32)
        self.counts = np.zeros((window,), np.int32)
        self.ptr = 0                           # mirrors the device ring pointer
        self.frames: List[int] = []            # buffered frame ids, oldest first
        self.slot_of: Dict[int, int] = {}
        self.all_boxes: Dict[int, np.ndarray] = {}
        self.all_similarity: Dict[int, Dict[int, np.ndarray]] = {}
        # (frame_index, slab [P, pre_n_max, n+1], {pre_frame: rank}, pre_ns):
        # the newest frame's decayed similarity as ONE contiguous array
        self.slab = None

    def update(self, frame_index: int, features, boxes: np.ndarray):
        """features: [n, E] (device or numpy); boxes: [n, 4] tlbr.

        Two-call path: computes the windowed similarity itself (one batched
        device call) and then ingests it.  The fused single-program path
        computes sims inside the frame program and calls ``ingest`` directly.
        """
        jnp = self._jnp
        if frame_index in self.slot_of:
            return
        n = min(int(features.shape[0]), self.max_object)
        if n == 0:
            return

        padded = jnp.zeros((self.max_object, self.embed_dim), jnp.float32)
        padded = padded.at[:n].set(jnp.asarray(features)[:n])
        sims = np.asarray(
            self.similarity_fn(
                self.embeds, jnp.asarray(self.counts), padded, jnp.int32(n)
            )
        )  # [W, M, M+1] -- vs the buffer BEFORE this frame

        self.ingest(frame_index, sims, n, boxes)
        slot = self.slot_of[frame_index]
        self.embeds = self.embeds.at[slot].set(padded)

    def ingest(self, frame_index: int, sims: np.ndarray, n: int,
               boxes: np.ndarray):
        """Record a frame whose window similarity was computed elsewhere.

        ``sims`` must be evaluated against the buffer state BEFORE this frame
        (the fused program guarantees this).  Two layouts are accepted:

        * ``[W, M, M+1]`` slot-indexed (the full ring);
        * ``[F < W, M, M+1]`` freshest-first (the ``sim_window`` fast path):
          row ``rank`` is the rank-th most recently buffered frame; buffered
          frames beyond F rows carry temporal decay <= DECAY2^((F+1)/3) ~ 0
          and are recorded as exact zeros.

        Applies the temporal decay weighting (tracker.py:76-90) and mirrors
        the device ring bookkeeping (slot = ptr % W, non-empty frames only).
        """
        if frame_index in self.slot_of or n == 0:
            return
        m_frame = freshness_window(self.dataset)
        windowed = sims.shape[0] != self.window
        self.all_similarity[frame_index] = {}
        # ONE contiguous decayed slab [P, pre_n_max, n+1] for the frame; the
        # per-pre-frame dict rows are views into it, and Tracker.get_similarity
        # gathers straight from the slab instead of re-stacking the dict
        # (the per-call re-stack was ~2 ms/frame at bench load)
        prev = list(reversed(self.frames))      # newest pre-frame first
        p = len(prev)
        pre_n_max = int(self.counts.max()) if p else 0
        slab = np.zeros((p, pre_n_max, n + 1), np.float32)
        slab_f2i: Dict[int, int] = {}
        slab_pre_ns = np.zeros((p,), np.int64)
        if p:
            pf = np.asarray(prev, np.int64)
            dfv = frame_index - pf
            delta = np.where(dfv < m_frame, DECAY, DECAY2) ** (dfv / 3.0)
            slots = np.asarray([self.slot_of[f] for f in prev], np.int64)
            slab_pre_ns[:] = self.counts[slots]
            k = min(p, sims.shape[0]) if windowed else p
            src = (np.asarray(sims[:k], np.float32) if windowed
                   else np.asarray(sims, np.float32)[slots])
            mask = (np.arange(pre_n_max)[None, :]
                    < slab_pre_ns[:k, None])[:, :, None]
            slab[:k] = (src[:, :pre_n_max, : n + 1]
                        * delta[:k, None, None].astype(np.float32) * mask)
            tab = self.all_similarity[frame_index]
            for rank, pre_frame in enumerate(prev):
                slab_f2i[pre_frame] = rank
                tab[pre_frame] = slab[rank, : slab_pre_ns[rank]]
        self.slab = (frame_index, slab, slab_f2i, slab_pre_ns)

        # ring write bookkeeping
        slot = self.ptr % self.window
        if len(self.frames) == self.window:
            evict = self.frames.pop(0)
            assert self.slot_of.pop(evict) == slot
            self.all_boxes.pop(evict, None)
            self.all_similarity.pop(evict, None)
        self.frames.append(frame_index)
        self.slot_of[frame_index] = slot
        self.counts[slot] = n
        self.all_boxes[frame_index] = boxes
        self.ptr += 1


class STrack(BaseTrack):
    """Single-track state (tracker.py:142-628)."""

    def __init__(self, tlwh, score, node: Node, use_lstm: bool = True,
                 dataset: str = "mot", ddd_bbox=None, depth=None,
                 org_ddd_box=None, classe=None, ddd_submission=None):
        self._tlwh = np.asarray(tlwh, dtype=np.float64)
        self.kalman_filter = None
        # shared read-only placeholder: every consumer ASSIGNS a fresh
        # covariance (KF initiate/update/predict, _empirical_cov); ~100
        # detection STracks are built per frame and most never activate
        self.mean, self.covariance = None, _EYE4
        self.is_activated = False
        self.depth = depth
        self.score = score
        self.tracklet_len = 0
        self.classe = classe
        self.dataset = dataset
        self.use_lstm = use_lstm

        # only the newest <= mm+1 nodes feed get_similarity (tracker.py:237-
        # 250 uses the last mm rows); cap the history so per-frame cost stays
        # O(1) per track instead of growing with track age
        self.nodes = deque([node], maxlen=8)
        self.age = 0
        self.updated_frame = 0

        # LSTM feature state
        self.last_h = -1.0
        self.last_w = -1.0
        self.last_l = -1.0
        self.last_cx = 0.0
        self.last_cy = 0.0
        self.last_cz = 0.0
        self.last_rot_y = 0.0
        self.first_time = True
        self.last_frame_id = -1
        # hidden state allocated only on the LSTM path (the KF cascade
        # creates ~100 detection STracks per frame that never touch it)
        if use_lstm:
            self.hn = np.zeros((1, 128), np.float32)
            self.cn = np.zeros((1, 128), np.float32)
        self._pending_feat = None   # set by update_lstm_features*, flushed
                                    # batched by Tracker._flush_lstm
        self.future_predictions: Dict[int, np.ndarray] = {}
        self.observations: List[List[float]] = []
        self.observations_tlwh: List[np.ndarray] = [self._tlwh.copy()]
        self.observations_ddd_bboxes: List[np.ndarray] = []

        self.ddd_bbox = ddd_bbox
        self.org_ddd_box = org_ddd_box
        self.ddd_submission = ddd_submission

    # ---- similarity ---------------------------------------------------------

    def collect_similarity_rows(self, frame_index: int,
                                recorder: DeviceFeatureRecorder):
        """This track's node rows in the current-frame similarity table
        (tracker.py:219-252), already cut to the rows the median uses:
        all rows when <= mm+1, else the last mm (mm = 2 nuScenes / 4 else).
        Returns [r, D] or None."""
        table = recorder.all_similarity.get(frame_index, {})
        rows = []
        for n in self.nodes:
            if frame_index - n.frame_index >= MAX_TRACK_NODE:
                continue
            row = table.get(n.frame_index)
            if row is None or n.id >= row.shape[0]:
                continue
            rows.append(row[n.id, :])
        if not rows:
            return None
        mm = 2 if self.dataset == "nuscenes" else 4
        if len(rows) > mm + 1:
            rows = rows[-mm:]
        return np.array(rows)

    def get_similarity(self, frame_index: int, recorder: DeviceFeatureRecorder):
        rows = self.collect_similarity_rows(frame_index, recorder)
        return None if rows is None else np.median(rows, axis=0)

    # ---- motion -------------------------------------------------------------

    def predict(self):
        if not self.use_lstm:
            mean_state = self.mean.copy()
            if self.state != TrackState.Tracked:
                mean_state[7] = 0
            self.mean, self.covariance = self.kalman_filter.predict(
                mean_state, self.covariance
            )

    @staticmethod
    def multi_predict(stracks: Sequence["STrack"], kalman: KalmanFilter):
        if len(stracks) == 0:
            return
        multi_mean = np.asarray([st.mean.copy() for st in stracks])
        multi_cov = np.asarray([st.covariance for st in stracks])
        for i, st in enumerate(stracks):
            if st.state != TrackState.Tracked:
                multi_mean[i][7] = 0
        multi_mean, multi_cov = kalman.multi_predict(multi_mean, multi_cov)
        for st, mean, cov in zip(stracks, multi_mean, multi_cov):
            st.mean = mean
            st.covariance = cov

    def prediction_at_frame(self, frame_id: int) -> np.ndarray:
        max_fut = 5 if self.dataset == "nuscenes" else 6
        key = frame_id - self.frame_id
        if 1 <= key < max_fut and key in self.future_predictions:
            return self.future_predictions[key]
        return self.future_predictions[max_fut - 1]

    def prediction_at_frame_tlbr(self, frame_id: int) -> np.ndarray:
        ret = self.prediction_at_frame(frame_id).copy()   # [cx, cy, a, h]
        ret[2] *= ret[3]
        ret[:2] -= ret[2:] / 2
        ret[2:] += ret[:2]
        return ret

    def ddd_prediction_at_frame(self, frame_id: int) -> np.ndarray:
        return self.prediction_at_frame(frame_id)

    # ---- lifecycle ----------------------------------------------------------

    def activate(self, kalman_filter, frame_id: int, ids: IdAllocator,
                 motion: Optional[LSTMMotion] = None):
        self.track_id = ids.next_id()
        self.tracklet_len = 0
        self.state = TrackState.Tracked
        if frame_id == 1:
            self.is_activated = True
        self.frame_id = frame_id
        self.start_frame = frame_id
        if self.use_lstm:
            self.motion = motion
            if self.dataset == "nuscenes":
                self.update_lstm_features_ddd(self.ddd_bbox)
                self.observations_tlwh.append(self._tlwh.copy())
            else:
                self.update_lstm_features(self._tlwh)
        else:
            self.kalman_filter = kalman_filter
            self.mean, self.covariance = kalman_filter.initiate(
                self.tlwh_to_xyah(self._tlwh)
            )

    def re_activate(self, new_track: "STrack", frame_id: int,
                    kf_result=None):
        self.tracklet_len = 0
        self.state = TrackState.Tracked
        self.is_activated = True
        self.frame_id = frame_id
        self.nodes.append(new_track.nodes[-1])
        self.depth = new_track.depth
        self.org_ddd_box = new_track.org_ddd_box
        self.ddd_bbox = new_track.ddd_bbox
        self.ddd_submission = new_track.ddd_submission
        if self.use_lstm:
            if self.dataset == "nuscenes":
                self.update_lstm_features_ddd(new_track.ddd_bbox)
                self.observations_tlwh.append(new_track.tlwh.copy())
            else:
                self.update_lstm_features(new_track.tlwh)
        elif kf_result is not None:
            self.mean, self.covariance = kf_result
        else:
            self.mean, self.covariance = self.kalman_filter.update(
                self.mean, self.covariance, self.tlwh_to_xyah(new_track.tlwh)
            )

    def update(self, new_track: "STrack", frame_id: int, kf_result=None):
        self.frame_id = frame_id
        self.tracklet_len += 1
        new_tlwh = new_track.tlwh
        self.depth = new_track.depth
        self.state = TrackState.Tracked
        self.is_activated = True
        self.score = new_track.score
        self.nodes.append(new_track.nodes[-1])
        self.org_ddd_box = new_track.org_ddd_box
        self.ddd_bbox = new_track.ddd_bbox
        self.ddd_submission = new_track.ddd_submission
        if self.use_lstm:
            if self.dataset == "nuscenes":
                self.update_lstm_features_ddd(new_track.ddd_bbox)
                self.observations_tlwh.append(new_track.tlwh.copy())
            else:
                self.update_lstm_features(new_tlwh)
        elif kf_result is not None:
            self.mean, self.covariance = kf_result
        else:
            self.mean, self.covariance = self.kalman_filter.update(
                self.mean, self.covariance, self.tlwh_to_xyah(new_tlwh)
            )

    # ---- LSTM feature assembly (tracker.py:408-580) --------------------------

    def _empirical_cov(self, obs) -> np.ndarray:
        arr = np.asarray(obs)
        if arr.shape[0] < 2:
            return np.eye(arr.shape[1]) if arr.ndim == 2 else np.eye(4)
        return np.cov(arr.T)

    def update_lstm_features(self, tlwh):
        self.observations_tlwh.append(np.asarray(tlwh, np.float64).copy())
        self.observations.append(self.tlwh_to_xyah(tlwh).tolist())
        self.covariance = self._empirical_cov(self.observations)

        box = np.asarray(tlwh, np.float64).copy()
        box[:2] += box[2:] / 2
        c_x, c_y, w, h = box.tolist()
        h_w_ratio = w / h if h != 0 else 0.0

        if self.first_time:
            self.first_time = False
            delta_h = delta_w = v_x = v_y = delta_cx = delta_cy = 0.0
        else:
            dt = max(self.frame_id - self.last_frame_id, 1)
            delta_h = h - self.last_h
            delta_w = w - self.last_w
            v_x = delta_cx = (c_x - self.last_cx) / dt
            v_y = delta_cy = (c_y - self.last_cy) / dt
        self.last_h, self.last_w = h, w
        self.last_cx, self.last_cy = c_x, c_y
        self.last_frame_id = self.frame_id

        feat = np.array([c_x, c_y, delta_cx, delta_cy, h, w, h_w_ratio,
                         delta_h, delta_w, v_x, v_y], np.float32)
        # DEFER the LSTM cell step: Tracker.update flushes every updated
        # track's step as ONE batched device call per frame
        # (LSTMMotion.predict_batch) instead of a per-track jitted call +
        # three device_gets (the reference queries its torch LSTM once per
        # track per frame, tracker.py:467-469 -- at a 30 ms relay RTT the
        # per-track path is a per-frame disaster).  Nothing reads
        # future_predictions between here and the flush (the cascade only
        # queries UNMATCHED tracks' predictions).
        self._pending_feat = feat

    def _apply_lstm_deltas(self, deltas: np.ndarray):
        """Batched-flush tail of update_lstm_features: deltas [future, 4]
        ([dcx, dcy, dh, dw] -> [cx, cy, a=w/h, h], tracker.py:471-480)."""
        f = self._pending_feat.astype(np.float64)
        c_x, c_y, h, w = f[0], f[1], f[4], f[5]
        preds = {}
        for i in range(deltas.shape[0]):
            p = deltas[i].astype(np.float64)
            cx_p, cy_p = c_x + p[0], c_y + p[1]
            h_p, w_p = h + p[2], w + p[3]
            preds[i + 1] = np.array(
                [cx_p, cy_p, (w_p / h_p if h_p != 0 else 0.0), h_p]
            )
        self.future_predictions = preds
        self._pending_feat = None

    def update_lstm_features_ddd(self, ddd_box):
        ddd_box = np.asarray(ddd_box, np.float64)
        self.observations_ddd_bboxes.append(ddd_box.copy())
        self.covariance = self._empirical_cov(self.observations_ddd_bboxes)

        h, w, l, c_x, c_y, c_z, rot_y = ddd_box.tolist()
        if self.first_time:
            self.first_time = False
            delta_h = delta_w = delta_l = 0.0
            v_x = v_y = v_z = v_rot = 0.0
            delta_cx = delta_cy = delta_cz = delta_rot = 0.0
        else:
            dt = max(self.frame_id - self.last_frame_id, 1)
            delta_h, delta_w, delta_l = h - self.last_h, w - self.last_w, l - self.last_l
            v_x = (c_x - self.last_cx) / dt
            v_y = (c_y - self.last_cy) / dt
            v_z = (c_z - self.last_cz) / dt
            v_rot = (rot_y - self.last_rot_y) / dt
            delta_cx, delta_cy, delta_cz = (
                c_x - self.last_cx, c_y - self.last_cy, c_z - self.last_cz
            )
            delta_rot = rot_y - self.last_rot_y
        self.last_h, self.last_w, self.last_l = h, w, l
        self.last_cx, self.last_cy, self.last_cz = c_x, c_y, c_z
        self.last_rot_y = rot_y
        self.last_frame_id = self.frame_id

        feat = np.array([c_x, c_y, c_z, delta_cx, delta_cy, delta_cz,
                         h, w, l, delta_h, delta_w, delta_l,
                         v_x, v_y, v_z, rot_y, delta_rot, v_rot], np.float32)
        # deferred like the 2-D path; Tracker.update flushes one batched call
        self._pending_feat = feat

    def _apply_lstm_deltas_ddd(self, deltas: np.ndarray):
        """Batched-flush tail of update_lstm_features_ddd: deltas
        [future, 4] ([dx, dy, dz, drot] -> [h, w, l, x, y, z, rot])."""
        f = self._pending_feat.astype(np.float64)
        c_x, c_y, c_z = f[0], f[1], f[2]
        h, w, l = f[6], f[7], f[8]
        rot_y = f[15]
        preds = {}
        for i in range(deltas.shape[0]):
            p = deltas[i].astype(np.float64)
            preds[i + 1] = np.array(
                [h, w, l, c_x + p[0], c_y + p[1], c_z + p[2], rot_y + p[3]]
            )
        self.future_predictions = preds
        self._pending_feat = None

    # ---- geometry -----------------------------------------------------------

    @property
    def tlwh(self) -> np.ndarray:
        if self.use_lstm:
            return self.observations_tlwh[-1].copy()
        if self.mean is None:
            return self._tlwh.copy()
        ret = self.mean[:4].copy()
        ret[2] *= ret[3]
        ret[:2] -= ret[2:] / 2
        return ret

    @property
    def tlbr(self) -> np.ndarray:
        ret = self.tlwh.copy()
        ret[2:] += ret[:2]
        return ret

    @staticmethod
    def tlwh_to_xyah(tlwh) -> np.ndarray:
        ret = np.asarray(tlwh, np.float64).copy()
        ret[:2] += ret[2:] / 2
        # degenerate zero-height boxes (possible from an untrained detector)
        # get an epsilon height instead of an inf aspect ratio
        ret[2] /= ret[3] if ret[3] != 0 else 1e-6
        return ret

    def to_xyah(self) -> np.ndarray:
        return self.tlwh_to_xyah(self.tlwh)

    @staticmethod
    def tlbr_to_tlwh(tlbr) -> np.ndarray:
        ret = np.asarray(tlbr, np.float64).copy()
        ret[2:] -= ret[:2]
        return ret

    def __repr__(self):
        return f"OT_{self.track_id}_({self.start_frame}-{self.end_frame})"


class Tracker:
    """Per-sequence online tracker (tracker.py:631-1056)."""

    def __init__(self, dataset: str, max_object: int, embed_dim: int,
                 similarity_fn: Callable, use_lstm: bool = False,
                 motion: Optional[LSTMMotion] = None,
                 frame_rate: int = 10, track_buffer: int = 30,
                 ids: Optional[IdAllocator] = None):
        self.dataset = dataset
        self.tracked_stracks: List[STrack] = []
        self.lost_stracks: List[STrack] = []
        self.removed_stracks: List[STrack] = []
        self.frame_id = 0
        self.buffer_size = int(frame_rate / 30.0 * track_buffer)
        self.max_time_lost = self.buffer_size
        self.det_thresh = 0.0
        self.use_lstm = use_lstm
        self.motion = motion if motion is not None else (
            LSTMMotion(dataset) if use_lstm else None
        )
        self.kalman_filter = KalmanFilter() if not use_lstm else self.motion
        self.ids = ids if ids is not None else IdAllocator()
        self.recorder = DeviceFeatureRecorder(
            dataset, max_object, embed_dim, similarity_fn
        )

    # -- similarity matrix for a pool of tracks (tracker.py:663-688) ----------

    def get_similarity(self, frame_index: int, strack_pool: Sequence[STrack],
                       num_detections: int) -> np.ndarray:
        """Per-track median similarity, fully batched across tracks.

        The reference computes np.median per track per frame
        (tracker.py:663-688) -- the dominant host cost at 100 tracks.  Here
        the frame's row tables are stacked once and every (track, node) row
        is fetched in ONE fancy-index gather; the medians run as one sorted
        [T, mm+1, D] slab.  Semantics are identical to
        STrack.collect_similarity_rows + np.median per track (the median is
        order-invariant, so the newest-first walk needs no re-reversal)."""
        d = num_detections + 1
        n_trk = len(strack_pool)
        if n_trk == 0:
            return np.zeros((0, d), np.float32)
        out = np.zeros((n_trk, d), np.float32)
        slab_entry = getattr(self.recorder, "slab", None)
        if slab_entry is None or slab_entry[0] != frame_index:
            return out
        _, slab, f2i, pre_ns = slab_entry
        d_tab = slab.shape[2]
        mm = 2 if self.dataset == "nuscenes" else 4

        # (frame-slot, row-id) per track with the exact keep-newest-mm-of->
        # (mm+1) rule, vectorized: ONE pass collects every node triple, the
        # age filter / rank lookup / newest-mm cut run as numpy ops (the
        # per-track python walk was the cascade's top cost at 400-track
        # pools).  The per-track walk semantics it replaces: newest-first,
        # break at the first node older than MAX_TRACK_NODE (nodes are
        # chronological so break == filter), skip nodes absent from the
        # table, keep the newest mm when more than mm+1 survive.
        tt_l, tf_l, ti_l = [], [], []
        for i, t in enumerate(strack_pool):
            nd = t.nodes
            tt_l.extend([i] * len(nd))
            for n in nd:                       # oldest -> newest
                tf_l.append(n.frame_index)
                ti_l.append(n.id)
        tw = np.asarray(tt_l, np.int64)
        df = frame_index - np.asarray(tf_l, np.int64)
        idd = np.asarray(ti_l, np.int64)
        # frame -> slab rank lookup by age difference
        rank_of = np.full(MAX_TRACK_NODE, -1, np.int64)
        for pre_frame, rank in f2i.items():
            age = frame_index - pre_frame
            if 0 < age < MAX_TRACK_NODE:
                rank_of[age] = rank
        j = rank_of[np.clip(df, 0, MAX_TRACK_NODE - 1)]
        ok = (df < MAX_TRACK_NODE) & (df > 0) & (j >= 0)
        ok[ok] &= idd[ok] < pre_ns[j[ok]]
        vi = np.where(ok)[0]                   # grouped by track, oldest first
        if vi.size == 0:
            return out
        tv = tw[vi]
        cnt_all = np.bincount(tv, minlength=n_trk)
        starts = np.cumsum(cnt_all) - cnt_all
        rev = cnt_all[tv] - 1 - (np.arange(vi.size) - starts[tv])
        keep = (cnt_all[tv] <= mm + 1) | (rev < mm)
        flat_t = tv[keep]
        flat_f = j[vi][keep]
        flat_r = idd[vi][keep]
        slot = rev[keep]                       # distinct per track, < mm+1
        counts = np.where(cnt_all > mm + 1, mm, cnt_all)
        rmax = int(counts.max())
        if rmax == 0:
            return out

        rows = slab[flat_f, flat_r]                           # [K, d_tab]

        # columns beyond the recorder's table width stay +inf, matching the
        # historical padded-fill behavior when num_detections > max_object;
        # layout [T, d, rmax] so the median's sort axis is contiguous
        padded = np.full((n_trk, d, rmax), np.inf, np.float32)
        padded[flat_t, :d_tab, slot] = rows[:, :d]
        padded.sort(axis=2)
        for r in np.unique(counts):
            if r == 0:
                continue
            sel = counts == r
            if r % 2:
                med = padded[sel, :, (r - 1) // 2]
            else:
                med = (padded[sel, :, r // 2 - 1]
                       + padded[sel, :, r // 2]) / 2.0
            out[sel] = med
        return out

    # -- the cascade -----------------------------------------------------------

    def _apply_matches(self, pool, detections, matches, activated, output):
        """Apply one association stage's matches: batched Kalman correction
        (ONE LAPACK batch via KalmanFilter.multi_update instead of one solve
        per track -- same math) + the per-track lifecycle bookkeeping."""
        pairs = [(pool[it], detections[idet]) for it, idet in matches]
        results = {}
        kf_pairs = [(t, d) for t, d in pairs
                    if not self.use_lstm and t.mean is not None]
        if len(kf_pairs) >= 2:
            means = np.stack([t.mean for t, _ in kf_pairs])
            covs = np.stack([t.covariance for t, _ in kf_pairs])
            # batched tlwh -> xyah (one vectorized pass, not N method calls)
            meas = np.stack([d.tlwh for _, d in kf_pairs])
            meas[:, :2] += meas[:, 2:] / 2
            hs = meas[:, 3].copy()
            hs[hs == 0] = 1e-6
            meas[:, 2] /= hs
            nm, nc = self.kalman_filter.multi_update(means, covs, meas)
            results = {id(t): (nm[i], nc[i])
                       for i, (t, _) in enumerate(kf_pairs)}
        for track, det in pairs:
            output.append(track)
            pre = results.get(id(track))
            if track.state == TrackState.Tracked:
                track.update(det, self.frame_id, kf_result=pre)
                activated.append(track)
            else:
                track.re_activate(det, self.frame_id, kf_result=pre)

    def update(self, detections_in: List[Dict], embeddings: np.ndarray,
               ddd_boxes=None, depths=None, ddd_org_boxes=None,
               submission=None, classe=None, sims=None) -> List[STrack]:
        """One frame.

        detections_in: list of dicts with 'bbox' (tlbr, input pixels),
        'score'; (nuScenes adds per-class 3-D fields via the ddd_* args).
        embeddings: [n, E] appearance embeddings aligned with detections_in.
        sims: optional precomputed [W, M, M+1] window similarity from the
        fused frame program; when given, no device call happens here.
        """
        self.frame_id += 1
        activated: List[STrack] = []
        removed: List[STrack] = []
        output: List[STrack] = []

        n_det = len(detections_in)
        if n_det > 0:
            nodes = [Node(self.frame_id, i) for i in range(n_det)]
            if self.dataset == "nuscenes":
                detections = [
                    STrack(
                        STrack.tlbr_to_tlwh(d["bbox"]), d["score"], node,
                        use_lstm=self.use_lstm, dataset=self.dataset,
                        ddd_bbox=np.asarray(ddd_boxes[i]),
                        depth=float(np.ravel(depths[i])[0]),
                        org_ddd_box=np.asarray(ddd_org_boxes[i]),
                        classe=classe,
                        ddd_submission=submission[i],
                    )
                    for i, (d, node) in enumerate(zip(detections_in, nodes))
                ]
            else:
                detections = [
                    STrack(STrack.tlbr_to_tlwh(d["bbox"]), d["score"], node,
                           use_lstm=self.use_lstm, dataset=self.dataset)
                    for d, node in zip(detections_in, nodes)
                ]
            boxes = np.stack([np.asarray(d["bbox"], np.float64)[:4]
                              for d in detections_in])
            if sims is not None:
                self.recorder.ingest(self.frame_id, sims,
                                     min(n_det, self.recorder.max_object), boxes)
            else:
                self.recorder.update(self.frame_id, embeddings[:n_det], boxes)
        else:
            detections = []

        tracked_stracks = list(self.tracked_stracks)
        strack_pool = joint_stracks(tracked_stracks, self.lost_stracks)
        if not self.use_lstm:
            STrack.multi_predict(
                [t for t in strack_pool if t.mean is not None], self.kalman_filter
            )

        lll = n_det
        u_detection_stage0 = list(range(n_det))

        # -- nuScenes non-pedestrian pre-step: 3-D IoU on recent tracks -------
        if self.dataset == "nuscenes" and classe != "pedestrian":
            pool_old = [t for t in strack_pool
                        if abs(t.frame_id - self.frame_id) >= 3]
            pool_new = [t for t in strack_pool
                        if abs(t.frame_id - self.frame_id) < 3]
            dists = matching.iou_ddd_distance(pool_new, detections, self.frame_id)
            matches, u_track, u_detection0 = matching.linear_assignment(
                dists, thresh=0.999
            )
            for itracked, idet in matches:
                track = pool_new[itracked]
                output.append(track)
                det = detections[idet]
                if track.state == TrackState.Tracked:
                    track.update(det, self.frame_id)
                    activated.append(track)
                else:
                    track.re_activate(det, self.frame_id)
            u_detection_stage0 = list(u_detection0)
            detections = [detections[i] for i in u_detection0]
            strack_pool = joint_stracks(
                [pool_new[i] for i in u_track], pool_old
            )

        # -- primary association: AFE similarity + motion fusion --------------
        dists = np.zeros((len(strack_pool), len(detections)))
        if dists.size != 0:
            dists = self.get_similarity(self.frame_id, strack_pool, lll)
            dists = dists[:, :-1]
            if self.dataset == "nuscenes" and classe != "pedestrian":
                dists = dists[:, u_detection_stage0]
            dists = 1.0 - dists

        if self.dataset == "nuscenes":
            dists = matching.fuse_motion_ddd(
                self.kalman_filter, dists, strack_pool, detections,
                frame_id=self.frame_id, classe_name=classe,
            )
        else:
            dists = matching.fuse_motion(
                self.kalman_filter, dists, strack_pool, detections,
                frame_id=self.frame_id, use_lstm=self.use_lstm,
            )
        matches, u_track, u_detection2 = matching.linear_assignment(dists, 0.9)
        self._apply_matches(strack_pool, detections, matches, activated,
                            output)
        r_tracked = [strack_pool[i] for i in u_track]
        detections = [detections[i] for i in u_detection2]

        # -- second-chance AFE-only pass (nuScenes / KITTI) --------------------
        if self.dataset in ("nuscenes", "kitti_tracking") and len(detections) > 0:
            dists = self.get_similarity(self.frame_id, r_tracked, lll)
            if dists.size != 0:
                dists = dists[:, :-1]
                if self.dataset == "nuscenes" and classe != "pedestrian":
                    dists = dists[:, u_detection_stage0]
                dists = dists[:, u_detection2]
                dists = 1.0 - dists
                matches, u_track, u_detection = matching.linear_assignment(
                    dists, 0.9
                )
                self._apply_matches(r_tracked, detections, matches,
                                    activated, output)
                detections = [detections[i] for i in u_detection]
                strack_pool = r_tracked
            else:
                u_track = list(range(len(r_tracked)))
                strack_pool = r_tracked
        else:
            strack_pool = r_tracked
            u_track = list(range(len(r_tracked)))

        # -- IoU association on the remainder ---------------------------------
        if self.dataset in ("kitti_tracking", "nuscenes"):
            mm = 3 if self.dataset == "nuscenes" else 6
            r_tracked = [strack_pool[i] for i in u_track
                         if abs(self.frame_id - strack_pool[i].frame_id) < mm]
        else:
            r_tracked = [strack_pool[i] for i in u_track
                         if strack_pool[i].state == TrackState.Tracked]

        if self.dataset == "nuscenes":
            dists = matching.iou_distance(r_tracked, detections, self.frame_id,
                                          use_prediction=False)
            matches, u_track, u_detection = matching.linear_assignment(dists, 0.0)
        else:
            dists = matching.iou_distance(r_tracked, detections, self.frame_id,
                                          use_prediction=self.use_lstm)
            matches, u_track, u_detection = matching.linear_assignment(dists, 0.9)

        self._apply_matches(r_tracked, detections, matches, activated,
                            output)

        for it in u_track:
            track = r_tracked[it]
            if self.frame_id - track.frame_id > self.max_time_lost:
                track.mark_removed()
                removed.append(track)

        # -- births ------------------------------------------------------------
        detections = [detections[i] for i in u_detection]
        for track in detections:
            output.append(track)
            if track.score < self.det_thresh:
                continue
            track.activate(self.kalman_filter, self.frame_id, self.ids,
                           motion=self.motion)
            activated.append(track)

        # -- lifecycle bookkeeping (tracker.py:1037-1054) ----------------------
        for track in self.lost_stracks:
            if self.frame_id - track.end_frame > self.max_time_lost:
                track.mark_removed()
                removed.append(track)

        self.tracked_stracks = [
            t for t in self.tracked_stracks if t.state == TrackState.Tracked
        ]
        # NOTE: the reference also merges a `refind_stracks` list here
        # (tracker.py:1047), but no call site ever appends to it -- every
        # re_activate() leaves the track on lost_stracks for one frame, after
        # which the next match routes it through update() -> activated.  We
        # reproduce that behavior exactly (re-activated tracks rejoin
        # tracked_stracks one frame later via the Tracked-state branch).
        self.tracked_stracks = joint_stracks(self.tracked_stracks, activated)
        self.lost_stracks = sub_stracks(self.lost_stracks, self.tracked_stracks)
        self.lost_stracks = sub_stracks(self.lost_stracks, self.removed_stracks)
        self.removed_stracks.extend(removed)
        self.tracked_stracks, self.lost_stracks = remove_duplicate_stracks(
            self.tracked_stracks, self.lost_stracks,
            ddd_tracking=(self.dataset == "nuscenes"),
        )
        if self.use_lstm:
            self._flush_lstm(output)
        return output

    def _flush_lstm(self, tracks: Sequence[STrack]):
        """ONE batched LSTM step for every track updated this frame
        (VERDICT r4 #5): collect deferred features, run
        LSTMMotion.predict_batch, scatter h/c + future predictions back.
        The reference pays one torch LSTM call per track per frame
        (tracker.py:467-469); this is a single device program regardless of
        track count."""
        seen = set()
        pend = []
        for t in tracks:
            if getattr(t, "_pending_feat", None) is not None \
                    and id(t) not in seen:
                seen.add(id(t))
                pend.append(t)
        if not pend:
            return
        h = np.concatenate([t.hn for t in pend], axis=0)
        c = np.concatenate([t.cn for t in pend], axis=0)
        feats = np.stack([t._pending_feat for t in pend])
        h2, c2, deltas = self.motion.predict_batch(h, c, feats)
        ddd = self.dataset == "nuscenes"
        for i, t in enumerate(pend):
            t.hn = h2[i: i + 1]
            t.cn = c2[i: i + 1]
            if ddd:
                t._apply_lstm_deltas_ddd(deltas[i])
            else:
                t._apply_lstm_deltas(deltas[i])


def stacked_tlbrs(tracks) -> np.ndarray:
    """[N, 4] tlbr for a track pool in one vectorized pass (the per-track
    tlwh/tlbr properties cost ~6 small numpy allocs each; at 400-track pools
    the association stages were spending ms/frame just re-deriving boxes)."""
    n = len(tracks)
    out = np.empty((n, 4), np.float64)
    kf_idx = [i for i, t in enumerate(tracks)
              if not t.use_lstm and t.mean is not None]
    if kf_idx:
        mm = np.stack([tracks[i].mean[:4] for i in kf_idx])
        w = mm[:, 2] * mm[:, 3]
        h = mm[:, 3]
        x1 = mm[:, 0] - w / 2
        y1 = mm[:, 1] - h / 2
        out[kf_idx] = np.stack([x1, y1, x1 + w, y1 + h], axis=1)
    for i, t in enumerate(tracks):
        if t.use_lstm or t.mean is None:
            out[i] = t.tlbr
    return out


def joint_stracks(tlista, tlistb):
    exists = {}
    res = []
    for t in tlista:
        exists[t.track_id] = 1
        res.append(t)
    for t in tlistb:
        if not exists.get(t.track_id, 0):
            exists[t.track_id] = 1
            res.append(t)
    return res


def sub_stracks(tlista, tlistb):
    stracks = {t.track_id: t for t in tlista}
    for t in tlistb:
        stracks.pop(t.track_id, None)
    return list(stracks.values())


def remove_duplicate_stracks(stracksa, stracksb, ddd_tracking=False):
    if ddd_tracking:
        pdist = matching.iou_ddd_distance(stracksa, stracksb, use_prediction=False)
    else:
        pdist = matching.iou_distance(stracksa, stracksb, use_prediction=False)
    pairs = np.where(pdist < 0.15)
    dupa, dupb = [], []
    for p, q in zip(*pairs):
        timep = stracksa[p].frame_id - stracksa[p].start_frame
        timeq = stracksb[q].frame_id - stracksb[q].start_frame
        if timep > timeq:
            dupb.append(q)
        else:
            dupa.append(p)
    resa = [t for i, t in enumerate(stracksa) if i not in dupa]
    resb = [t for i, t in enumerate(stracksb) if i not in dupb]
    return resa, resb
