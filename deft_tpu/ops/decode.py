"""CenterNet-style heatmap decoding, jitted for TPU.

JAX mirrors of ``/root/reference/src/lib/model/utils.py:69-104`` (``_nms``,
``_topk``) and ``/root/reference/src/lib/model/decode.py:102-219``
(``generic_decode``).  Layout is NHWC (TPU-native) rather than the reference's
NCHW; head outputs are ``{name: [B, H, W, C]}``.

Everything is fixed-shape (K detections always come back, ranked by score;
callers mask on score thresholds), so the whole decode fuses into the
detector's single jitted program.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def heat_nms(heat: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """Keep only local maxima: 3x3 max-pool equality mask (model/utils.py:69)."""
    pad = (kernel - 1) // 2
    hmax = jax.lax.reduce_window(
        heat,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    keep = (hmax == heat).astype(heat.dtype)
    return heat * keep


def topk(scores: jnp.ndarray, k: int = 100):
    """Top-k peaks over an NHWC heatmap.

    Returns (score, inds, clses, ys, xs), each [B, K]; ``inds`` indexes the
    flattened H*W plane (y * W + x) to match the reference's gather contract
    (model/utils.py:89-104).
    """
    b, h, w, c = scores.shape
    flat = scores.transpose(0, 3, 1, 2).reshape(b, c, h * w)
    cat_scores, cat_inds = jax.lax.top_k(flat, k)          # [B, C, K]
    cat_ys = (cat_inds // w).astype(jnp.float32)
    cat_xs = (cat_inds % w).astype(jnp.float32)

    top_score, top_ind = jax.lax.top_k(cat_scores.reshape(b, c * k), k)  # [B, K]
    clses = (top_ind // k).astype(jnp.int32)
    gather = lambda t: jnp.take_along_axis(t.reshape(b, c * k), top_ind, axis=1)
    inds = gather(cat_inds)
    ys = gather(cat_ys)
    xs = gather(cat_xs)
    return top_score, inds, clses, ys, xs


def topk_channel(scores: jnp.ndarray, k: int = 100):
    """Per-channel top-k (model/utils.py:77-86): NHWC scores ->
    (score, inds, ys, xs) each [B, C, K]."""
    b, h, w, c = scores.shape
    flat = scores.transpose(0, 3, 1, 2).reshape(b, c, h * w)
    top_scores, top_inds = jax.lax.top_k(flat, k)
    ys = (top_inds // w).astype(jnp.float32)
    xs = (top_inds % w).astype(jnp.float32)
    return top_scores, top_inds, ys, xs


def gather_feat(feat: jnp.ndarray, inds: jnp.ndarray) -> jnp.ndarray:
    """Gather per-pixel head values at flat spatial indices.

    feat: [B, H, W, C]; inds: [B, K] in y*W+x -> [B, K, C].
    Equivalent of ``_tranpose_and_gather_feat`` (model/utils.py:32-36) without
    the NCHW transpose (we are already channels-last).
    """
    b, h, w, c = feat.shape
    flat = feat.reshape(b, h * w, c)
    return jnp.take_along_axis(flat, inds[..., None], axis=1)


def generic_decode(output: Dict[str, jnp.ndarray], k: int = 100) -> Dict[str, jnp.ndarray]:
    """Decode head maps into top-K detections (decode.py:102-219).

    ``output['hm']`` must already be sigmoided.  Returns a dict of [B, K, ...]
    arrays: scores, clses, cts, xs, ys, bboxes and any regression heads
    present.  ``ltrb``/``ltrb_amodal`` override the wh-derived boxes exactly as
    in the reference (decode.py:153-196).
    """
    heat = output["hm"]
    b = heat.shape[0]
    heat = heat_nms(heat)
    scores, inds, clses, ys0, xs0 = topk(heat, k=k)

    cts = jnp.stack([xs0, ys0], axis=2)
    ret = {
        "scores": scores,
        "clses": clses.astype(jnp.float32),
        "xs": xs0,
        "ys": ys0,
        "cts": cts,
        "inds": inds,
    }

    if "reg" in output:
        reg = gather_feat(output["reg"], inds)               # [B, K, 2]
        xs = xs0[..., None] + reg[:, :, 0:1]
        ys = ys0[..., None] + reg[:, :, 1:2]
    else:
        xs = xs0[..., None] + 0.5
        ys = ys0[..., None] + 0.5

    if "wh" in output:
        wh = gather_feat(output["wh"], inds)                 # [B, K, 2] or [B, K, 2C]
        wh = jnp.maximum(wh, 0.0)
        n_cat = output["hm"].shape[-1]
        if wh.shape[2] == 2 * n_cat and n_cat > 1:
            # category-specific wh (decode.py:136-141): pick the 2-vector of
            # the detected class
            wh = wh.reshape(b, -1, n_cat, 2)
            wh = jnp.take_along_axis(
                wh, clses[:, :, None, None].astype(jnp.int32), axis=2
            )[:, :, 0, :]
        bboxes = jnp.concatenate(
            [
                xs - wh[..., 0:1] / 2,
                ys - wh[..., 1:2] / 2,
                xs + wh[..., 0:1] / 2,
                ys + wh[..., 1:2] / 2,
            ],
            axis=2,
        )
        ret["bboxes"] = bboxes

    if "ltrb" in output:
        ltrb = gather_feat(output["ltrb"], inds)             # [B, K, 4]
        x0k = xs0[..., None]
        y0k = ys0[..., None]
        ret["bboxes"] = jnp.concatenate(
            [
                x0k + ltrb[..., 0:1],
                y0k + ltrb[..., 1:2],
                x0k + ltrb[..., 2:3],
                y0k + ltrb[..., 3:4],
            ],
            axis=2,
        )

    for head in ("tracking", "dep", "rot", "dim", "amodel_offset",
                 "nuscenes_att", "velocity"):
        if head in output:
            ret[head] = gather_feat(output[head], inds)

    if "ltrb_amodal" in output:
        ltrb_am = gather_feat(output["ltrb_amodal"], inds)
        x0k = xs0[..., None]
        y0k = ys0[..., None]
        amodal = jnp.concatenate(
            [
                x0k + ltrb_am[..., 0:1],
                y0k + ltrb_am[..., 1:2],
                x0k + ltrb_am[..., 2:3],
                y0k + ltrb_am[..., 3:4],
            ],
            axis=2,
        )
        ret["bboxes_amodal"] = amodal
        ret["bboxes"] = amodal

    if "hps" in output:
        num_joints = output["hps"].shape[-1] // 2
        kps = gather_feat(output["hps"], inds)               # [B, K, J*2]
        # offsets are center-relative (decode.py:199-203): x at even slots
        kps = kps.reshape(b, -1, num_joints, 2) + cts[:, :, None, :]
        kps = kps.reshape(b, -1, num_joints * 2)
        kps, kps_score = update_kps_with_hm(
            kps, output, num_joints, k,
            bboxes=ret.get("bboxes"), scores=scores,
        )
        ret["hps"] = kps
        ret["kps_score"] = kps_score

    if output.get("pre_inds") is not None:
        # previous-frame top-k centers from their flat indices (decode.py:213-219)
        pre_inds = output["pre_inds"]
        w = output["hm"].shape[2]
        pre_ys = (pre_inds // w).astype(jnp.float32)
        pre_xs = (pre_inds % w).astype(jnp.float32)
        ret["pre_cts"] = jnp.stack([pre_xs, pre_ys], axis=2)

    return ret


def update_kps_with_hm(kps, output, num_joints, k, bboxes=None, scores=None):
    """Snap regressed keypoints to nearby keypoint-heatmap peaks.

    Fixed-shape mirror of ``_update_kps_with_hm`` (decode.py:17-99): for each
    joint, find the per-joint top-K heatmap peaks, match each regressed
    keypoint to its nearest confident peak, and take the peak position unless
    it falls outside the (expanded) detection box or scores below 0.2.

    kps: [B, K, J*2] absolute coords; returns ([B, K, J*2], [B, K] score).
    """
    if "hm_hp" not in output:
        return kps, kps
    b = kps.shape[0]
    thresh = 0.2
    hm_hp = heat_nms(output["hm_hp"])                        # [B, H, W, J]
    kps_j = kps.reshape(b, k, num_joints, 2).transpose(0, 2, 1, 3)  # [B,J,K,2]

    hm_score, hm_inds, hm_ys, hm_xs = topk_channel(hm_hp, k=k)      # [B,J,K]
    if "hp_offset" in output or "reg" in output:
        off_map = output.get("hp_offset", output.get("reg"))
        off = gather_feat(off_map, hm_inds.reshape(b, -1))          # [B,J*K,2]
        off = off.reshape(b, num_joints, k, 2)
        hm_xs = hm_xs + off[..., 0]
        hm_ys = hm_ys + off[..., 1]
    else:
        hm_xs = hm_xs + 0.5
        hm_ys = hm_ys + 0.5

    conf = hm_score > thresh
    hm_score = jnp.where(conf, hm_score, -1.0)
    hm_xs = jnp.where(conf, hm_xs, -10000.0)
    hm_ys = jnp.where(conf, hm_ys, -10000.0)
    hm_kps = jnp.stack([hm_xs, hm_ys], axis=-1)              # [B,J,K,2]

    # nearest peak per regressed keypoint: [B,J,K(reg),K(peak)]
    dist = jnp.linalg.norm(kps_j[:, :, :, None, :] - hm_kps[:, :, None, :, :],
                           axis=-1)
    min_ind = jnp.argmin(dist, axis=3)                       # [B,J,K]
    sel_score = jnp.take_along_axis(hm_score, min_ind, axis=2)[..., None]
    sel_kps = jnp.take_along_axis(hm_kps, min_ind[..., None], axis=2)

    reject = sel_score < thresh                              # [B,J,K,1]
    if bboxes is not None:
        box = bboxes[:, None, :, :]                          # [B,1,K,4]
        l, t, r, bt = (box[..., 0:1], box[..., 1:2], box[..., 2:3],
                       box[..., 3:4])
    else:
        l = jnp.min(kps_j[..., 0:1], axis=1, keepdims=True)
        t = jnp.min(kps_j[..., 1:2], axis=1, keepdims=True)
        r = jnp.max(kps_j[..., 0:1], axis=1, keepdims=True)
        bt = jnp.max(kps_j[..., 1:2], axis=1, keepdims=True)
        margin = 0.25
        # NB: sequential updates on purpose -- the reference expands r/b using
        # the ALREADY-moved l/t (decode.py:72-79)
        l = l - (r - l) * margin
        r = r + (r - l) * margin
        t = t - (bt - t) * margin
        bt = bt + (bt - t) * margin
    reject = (
        reject | (sel_kps[..., 0:1] < l) | (sel_kps[..., 0:1] > r)
        | (sel_kps[..., 1:2] < t) | (sel_kps[..., 1:2] > bt)
    )

    det_score = scores[:, None, :, None]                     # [B,1,K,1]
    kps_score = jnp.where(reject, det_score, sel_score)      # [B,J,K,1]
    kps_score = scores * jnp.mean(kps_score[..., 0], axis=1)  # [B,K]
    fused = jnp.where(reject, kps_j, sel_kps)                # [B,J,K,2]
    fused = fused.transpose(0, 2, 1, 3).reshape(b, k, num_joints * 2)
    return fused, kps_score
