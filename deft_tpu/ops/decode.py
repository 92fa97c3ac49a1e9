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
        wh = gather_feat(output["wh"], inds)                 # [B, K, 2]
        wh = jnp.maximum(wh, 0.0)
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

    return ret
