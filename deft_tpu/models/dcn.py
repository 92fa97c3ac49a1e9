"""Deformable convolution v2, TPU-native.

The reference depends on an external CUDA extension (CharlesShang/DCNv2,
cloned per ``/root/reference/README.md:72-78`` and used as every upsampling
node in the DLA neck, ``dla.py:646-665``).  Here DCNv2 is decomposed into
XLA-friendly primitives:

  1. a standard 3x3 conv predicts per-pixel offsets (9 x (dy, dx)) and a
     modulation mask (9, sigmoid), zero-initialized so the op starts as a
     plain conv (the DCNv2 init);
  2. a bilinear gather samples the 9 taps at ``p + p_k + offset_k`` with
     zero padding outside the image (the CUDA kernel's semantics);
  3. the sampled taps, scaled by the mask, contract with the [9*Cin, Cout]
     weight in one matmul -- which is where the FLOPs live and maps straight
     onto the MXU.

Step 2 is the only irregular part; a fused Pallas kernel for gather+matmul is
the planned fast path (deft_tpu/ops/pallas_dcn.py), with this decomposition as
the always-correct reference implementation.

Offset channel layout is ``[..., 9 dy, 9 dx, 9 mask]`` (tap-major); the torch
checkpoint converter permutes the reference's interleaved (dy, dx) channels
into this layout.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from deft_tpu.models.layers import torch_pad


def deform_sample(x: jnp.ndarray, offsets: jnp.ndarray, mask: jnp.ndarray,
                  kernel: int = 3, dilation: int = 1) -> jnp.ndarray:
    """Gather modulated deformable taps.

    Args:
      x: [H, W, C] input feature map.
      offsets: [H, W, K*K, 2] (dy, dx) learned offsets.
      mask: [H, W, K*K] modulation (already sigmoided).

    Returns [H, W, K*K*C] sampled-and-modulated patches (tap-major).
    """
    h, w, c = x.shape
    k = kernel
    kk = k * k
    pad = dilation * (k // 2)

    ky, kx = jnp.meshgrid(
        jnp.arange(k, dtype=jnp.float32) * dilation - pad,
        jnp.arange(k, dtype=jnp.float32) * dilation - pad,
        indexing="ij",
    )
    base_y = jnp.arange(h, dtype=jnp.float32)[:, None] + ky.reshape(-1)[None, :]  # [H, KK]
    base_x = jnp.arange(w, dtype=jnp.float32)[:, None] + kx.reshape(-1)[None, :]  # [W, KK]
    yy = base_y[:, None, :] + offsets[..., 0]  # [H, W, KK]
    xx = base_x[None, :, :] + offsets[..., 1]

    x0 = jnp.floor(xx)
    y0 = jnp.floor(yy)
    wx1 = xx - x0
    wy1 = yy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    flat = x.reshape(h * w, c)

    def tap(xi, yi, wgt):
        inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idx = (yc * w + xc).reshape(-1)
        vals = jnp.take(flat, idx, axis=0).reshape(h, w, kk, c)
        return vals * (wgt * inb.astype(x.dtype))[..., None]

    out = (
        tap(x0, y0, wx0 * wy0)
        + tap(x0 + 1, y0, wx1 * wy0)
        + tap(x0, y0 + 1, wx0 * wy1)
        + tap(x0 + 1, y0 + 1, wx1 * wy1)
    )
    out = out * mask[..., None]
    return out.reshape(h, w, kk * c)


class DCNv2(nn.Module):
    """Modulated deformable conv (3x3, stride 1, deformable_groups=1)."""

    features: int
    kernel: int = 3
    dilation: int = 1
    dtype: object = None
    impl: str = "gather"        # gather (exact) | shift | pallas (R-bounded)
    offset_range: int = 4
    # ((path-substring, radius), ...) most-specific-first; the first pattern
    # contained in this module's flax path overrides offset_range.  Static at
    # trace time, so each layer compiles with its own clamp/halo size.
    offset_range_map: Tuple[Tuple[str, int], ...] = ()

    def _resolve_radius(self) -> int:
        if self.offset_range_map:
            path = "/".join(str(p) for p in self.scope.path)
            for pat, r in self.offset_range_map:
                if pat in path:
                    return int(r)
        return self.offset_range

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        kk = self.kernel * self.kernel
        radius = self._resolve_radius()

        om = nn.Conv(
            3 * kk,
            (self.kernel, self.kernel),
            padding=torch_pad(self.kernel, self.dilation),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=True,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv_offset_mask",
        )(x)
        # offsets in float32: sub-pixel positions need the precision
        om = om.astype(jnp.float32)
        dy = om[..., 0:kk]
        dx = om[..., kk : 2 * kk]
        mask = jax.nn.sigmoid(om[..., 2 * kk : 3 * kk])
        offsets = jnp.stack([dy, dx], axis=-1)  # [B, H, W, KK, 2]

        weight = self.param(
            "weight",
            # matches torch's default Conv2d init (kaiming_uniform a=sqrt(5))
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (kk * c, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        if self.impl in ("shift", "pallas", "onehot", "pallas_cm", "hybrid"):
            from deft_tpu.ops.pallas_dcn import (
                deform_conv_hybrid,
                deform_conv_onehot,
                deform_conv_pallas_cm,
                deform_conv_pallas_tap,
                deform_conv_shift_xla,
            )

            fn = {"shift": deform_conv_shift_xla,
                  "pallas": deform_conv_pallas_tap,
                  "pallas_cm": deform_conv_pallas_cm,
                  "hybrid": deform_conv_hybrid,
                  "onehot": deform_conv_onehot}[self.impl]
            # the Pallas kernels run unbatched (inference frame programs scan
            # frames one at a time, so B==1 there); under a real batch the
            # hybrid routes through onehot rather than relying on Mosaic's
            # vmap batching rule in the training hot path.  Batched = training
            # shaped, so use the rematerialized variant: plain autodiff of
            # the onehot loop OOMs HBM at training scale (pallas_dcn.py,
            # deform_conv_onehot_remat docstring)
            if b > 1 and self.impl in ("pallas_cm", "hybrid", "onehot"):
                import os
                from deft_tpu.ops.pallas_dcn import deform_conv_onehot_remat
                if (os.environ.get("DEFT_DCN_BATCHED_IMPL") == "hybrid"
                        and self.impl in ("pallas_cm", "hybrid")):
                    # experiment knob: vmap the per-shape hybrid (Mosaic's
                    # vmap rule adds a leading grid dim to pallas_cm) instead
                    # of routing batches through onehot.  Rematerialized for
                    # training-scale memory like the onehot route.
                    from deft_tpu.ops.pallas_dcn import (
                        deform_conv_hybrid_remat)
                    fn = deform_conv_hybrid_remat
                else:
                    fn = deform_conv_onehot_remat
            w = (weight.astype(self.dtype) if self.dtype is not None
                 else weight)
            if b == 1:
                out = fn(x[0], offsets[0], mask[0], w, bias,
                         radius=radius, kernel=self.kernel)[None]
            else:
                # SEQUENTIAL over the batch (lax.map = scan), not vmap: the
                # backward of the checkpointed per-sample op then holds ONE
                # sample's per-shift [H, W, KK, C] f32 temps at a time.  The
                # vmapped backward holds the whole batch's -- measured OOM at
                # batch-4 dla34 384x1280 (XLA kept ~20 x 324 MB temps of the
                # ywks,ysc->ywkc backward on a 16 GB v5e).  Spatial dims at
                # training scale keep the MXU busy without batch parallelism.
                out = jax.lax.map(
                    lambda args: fn(*args, w, bias,
                                    radius=radius,
                                    kernel=self.kernel),
                    (x, offsets, mask),
                )
            return out.astype(self.dtype) if self.dtype is not None else out

        def gather_conv(xb, ob, mb, wt):
            patches = jax.vmap(
                lambda xi, oi, mi: deform_sample(xi, oi, mi, self.kernel,
                                                 self.dilation)
            )(xb, ob, mb)  # [B, H, W, KK*C]
            if self.dtype is not None:
                patches = patches.astype(self.dtype)
            out = jnp.einsum(
                "bhwk,kf->bhwf", patches, wt,
                preferred_element_type=jnp.float32,
            )
            return out + bias

        if b > 1:
            # training shapes: rematerialize the backward -- autodiff of the
            # 4-tap gather otherwise stores every tap's [B, H, W, KK, C]
            # intermediate across all DCN layers, which OOMs HBM at
            # realistic input sizes (same pathology and fix as
            # deform_conv_onehot_remat in ops/pallas_dcn.py)
            gather_conv = jax.checkpoint(gather_conv)
        if self.dtype is not None:
            weight = weight.astype(self.dtype)
        out = gather_conv(x, offsets, mask, weight)
        return out.astype(self.dtype) if self.dtype is not None else out
