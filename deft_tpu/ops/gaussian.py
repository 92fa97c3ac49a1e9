"""Gaussian heatmap target rendering.

Host-side (numpy) mirrors of ``/root/reference/src/lib/utils/image.py:107-159``
(``gaussian_radius``, ``gaussian2D``, ``draw_umich_gaussian``), used by the
data pipeline to assemble training targets, plus a fixed-shape JAX renderer
(``render_gaussians``) used to build previous-frame heatmaps on device during
inference (the CenterTrack-style ``pre_hm`` conditioning input).
"""

from __future__ import annotations

import numpy as np


def gaussian_radius(det_size, min_overlap: float = 0.7) -> float:
    """CornerNet radius rule: largest radius keeping IoU >= min_overlap."""
    height, width = det_size

    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = np.sqrt(b1 ** 2 - 4 * a1 * c1)
    r1 = (b1 + sq1) / 2.0

    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = np.sqrt(b2 ** 2 - 4 * a2 * c2)
    r2 = (b2 + sq2) / 2.0

    a3 = 4.0 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = np.sqrt(b3 ** 2 - 4 * a3 * c3)
    r3 = (b3 + sq3) / 2.0
    return min(r1, r2, r3)


def gaussian2d(shape, sigma: float = 1.0) -> np.ndarray:
    m, n = [(s - 1.0) / 2.0 for s in shape]
    y, x = np.ogrid[-m : m + 1, -n : n + 1]
    h = np.exp(-(x * x + y * y) / (2 * sigma * sigma))
    h[h < np.finfo(h.dtype).eps * h.max()] = 0
    return h


def draw_gaussian(heatmap: np.ndarray, center, radius: int, k: float = 1.0):
    """Max-compose a 2-D gaussian of the given integer radius into ``heatmap``.

    In-place, returns the heatmap (same contract as ``draw_umich_gaussian``).
    """
    diameter = 2 * radius + 1
    gaussian = gaussian2d((diameter, diameter), sigma=diameter / 6.0)

    x, y = int(center[0]), int(center[1])
    height, width = heatmap.shape[:2]

    left, right = min(x, radius), min(width - x, radius + 1)
    top, bottom = min(y, radius), min(height - y, radius + 1)

    masked_hm = heatmap[y - top : y + bottom, x - left : x + right]
    masked_g = gaussian[radius - top : radius + bottom, radius - left : radius + right]
    if min(masked_g.shape) > 0 and min(masked_hm.shape) > 0:
        np.maximum(masked_hm, masked_g * k, out=masked_hm)
    return heatmap


def render_gaussians_np(shape, centers, radii, k=None) -> np.ndarray:
    """Render many gaussians into a fresh [H, W] heatmap (host)."""
    hm = np.zeros(shape, dtype=np.float32)
    if k is None:
        k = np.ones(len(centers), dtype=np.float32)
    for c, r, kk in zip(centers, radii, k):
        if r >= 0:
            draw_gaussian(hm, c, int(r), float(kk))
    return hm


def render_gaussians(shape, centers, radii, mask):
    """Fixed-shape JAX gaussian renderer.

    Args:
      shape: static (H, W).
      centers: [N, 2] float array of (x, y) centers in output pixels.
      radii: [N] float radii.
      mask: [N] {0,1} validity.

    Returns [H, W] heatmap = max over objects of exp(-d2 / (2 sigma^2)) with
    sigma = (2r+1)/6, matching the host renderer's gaussian (the host version
    additionally crops to the radius box; values outside it are < 1e-7 and do
    not affect the heatmap loss or the pre-hm conditioning in any measurable
    way).
    """
    import jax.numpy as jnp

    h, w = shape
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    cx = centers[:, 0][:, None, None]
    cy = centers[:, 1][:, None, None]
    # the host renderer centers the kernel on int(x), int(y)
    cx = jnp.floor(cx)
    cy = jnp.floor(cy)
    sigma = (2.0 * radii + 1.0) / 6.0
    sigma = jnp.maximum(sigma, 1e-6)[:, None, None]
    d2 = (xs[None] - cx) ** 2 + (ys[None] - cy) ** 2
    g = jnp.exp(-d2 / (2.0 * sigma * sigma))
    # suppress gaussians outside their radius box like the host crop does
    in_box = (jnp.abs(xs[None] - cx) <= radii[:, None, None]) & (
        jnp.abs(ys[None] - cy) <= radii[:, None, None]
    )
    g = g * in_box.astype(g.dtype)
    g = g * mask[:, None, None].astype(g.dtype)
    return jnp.max(g, axis=0) if centers.shape[0] else jnp.zeros(shape, jnp.float32)
