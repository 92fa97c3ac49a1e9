"""Bilinear sampling primitives (grid-sample / deformable gather).

One shared primitive backs both users in this framework:

* the AFE matching head's per-object center sampling, which in the reference
  is ``F.grid_sample(..., padding_mode="border")`` on 13 feature maps
  (``/root/reference/src/lib/model/networks/AFE.py:162-188``), and
* DCNv2's bilinear tap gather (zero padding outside the image), which in the
  reference is a CUDA kernel (external CharlesShang/DCNv2).

Layout is NHWC.  Coordinates follow the torch convention: normalized grids are
(x, y) in [-1, 1]; ``align_corners=True`` matches torch 1.2 (the reference's
pinned version, where grid_sample used corner-aligned mapping).
"""

from __future__ import annotations

import jax.numpy as jnp


def _denormalize(coord, size, align_corners: bool):
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def bilinear_sample(feat, x, y, padding_mode: str = "border"):
    """Sample ``feat`` [H, W, C] at float pixel coords ``x``, ``y`` (any shape).

    Returns [..., C].  ``padding_mode`` is "border" (clamp) or "zeros"
    (out-of-bounds taps contribute 0, as in DCNv2's im2col).
    """
    h, w, c = feat.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def tap(xi, yi):
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = feat[yc, xc]  # advanced indexing -> [..., C]
        if padding_mode == "zeros":
            inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
            vals = vals * inb[..., None].astype(vals.dtype)
        return vals

    out = (
        tap(x0, y0) * (wx0 * wy0)[..., None]
        + tap(x1, y0) * (wx1 * wy0)[..., None]
        + tap(x0, y1) * (wx0 * wy1)[..., None]
        + tap(x1, y1) * (wx1 * wy1)[..., None]
    )
    return out


def grid_sample_points(feat, grid, padding_mode: str = "border",
                       align_corners: bool = True):
    """Sample [H, W, C] features at normalized points ``grid`` [N, 2] (x, y in
    [-1, 1]).  Returns [N, C].  Batched use goes through ``jax.vmap``.
    """
    h, w, _ = feat.shape
    x = _denormalize(grid[:, 0], w, align_corners)
    y = _denormalize(grid[:, 1], h, align_corners)
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, w - 1.0)
        y = jnp.clip(y, 0.0, h - 1.0)
    return bilinear_sample(feat, x, y, padding_mode=padding_mode)
