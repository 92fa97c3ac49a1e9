"""Device-side affine input warp as two MXU matmuls.

The reference warps every frame on the host with ``cv2.warpAffine``
(``/root/reference/src/lib/detector.py:377-422``) before upload.  This repo's
pipeline makes that a 5+ ms/frame main-thread cost at 1080p.  Every transform
in the DEFT preprocessing family has rotation 0 (``get_affine_transform`` is
always called with ``rot=0``), so the warp is SEPARABLE: dst(y, x) =
sum_j sum_i Ry[y, j] * src[j, i] * Rx[x, i] with 1-D bilinear hat matrices

    Rx[x, i] = max(0, 1 - |a*x + b - i|),   (a, b from the inverse transform)

which on TPU is two dense matmuls that ride the MXU (~13 GFLOP at
1080p -> 544x960: ~0.1 ms) instead of a 1.5M-point gather.  Border
semantics match cv2's BORDER_CONSTANT(0): a source coordinate outside the
image gets partial (edge) or zero (beyond 1 px) weight, exactly like cv2's
out-of-image neighbor contributing 0.  cv2 quantizes bilinear weights to
5-bit fixed point, so parity is within ~1 uint8 LSB, not bit-exact.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def hat_matrix(coef_a, coef_b, out_n: int, src_n: int):
    """[out_n, src_n] bilinear interpolation matrix for the 1-D affine map
    ``src = coef_a * dst + coef_b`` (dst, src in pixel indices)."""
    src = coef_a * jnp.arange(out_n, dtype=jnp.float32) + coef_b
    return jnp.maximum(
        0.0, 1.0 - jnp.abs(src[:, None]
                           - jnp.arange(src_n, dtype=jnp.float32)[None, :])
    )


def warp_affine_separable(image, inv_tf, out_h: int, out_w: int):
    """Batched separable affine warp.

    image: [B, H, W, C] (uint8 or float); inv_tf: [6] flattened 2x3 INVERSE
    transform (dst -> src, i.e. ``get_affine_transform(..., inv=True)``),
    whose off-diagonal terms must be zero (rot=0 -- asserted by the caller
    host-side).  Returns float32 [B, out_h, out_w, C].
    """
    b, h, w, c = image.shape
    rx = hat_matrix(inv_tf[0], inv_tf[2], out_w, w)      # [out_w, W]
    ry = hat_matrix(inv_tf[4], inv_tf[5], out_h, h)      # [out_h, H]
    img = image.astype(jnp.float32)
    t = jnp.einsum("bhwc,ow->bhoc", img, rx,
                   preferred_element_type=jnp.float32)
    return jnp.einsum("bhoc,ph->bpoc", t, ry,
                      preferred_element_type=jnp.float32)


def separable_inverse_tf(c, s, out_w: int, out_h: int) -> np.ndarray:
    """Host helper: the flattened inverse transform for the fix_res/fix_short
    geometry, asserting separability (rot=0 keeps off-diagonals ~0)."""
    from deft_tpu.ops.affine import get_affine_transform

    inv = np.asarray(
        get_affine_transform(c, s, 0, [out_w, out_h], inv=True), np.float32
    )
    assert abs(inv[0, 1]) < 1e-5 and abs(inv[1, 0]) < 1e-5, (
        "non-separable affine (rotation != 0)")
    return inv.reshape(-1)
