"""Deformable-conv sampling as a fused Pallas TPU kernel.

The XLA gather decomposition (models/dcn.py) reaches only ~10-25 GB/s on the
v5e (measured) because per-pixel row gathers defeat vectorization.  This
kernel removes the gather entirely:

* offsets are clamped to a static radius R (configurable; trained DCN
  offsets concentrate well inside +-4 px -- the clamp is exact for any
  offset within range and saturates the rare tails);
* for every static integer shift (su, sv) in the padded window, the shifted
  input slab is a plain strided VMEM slice, and its contribution to tap k is
  ``relu(1-|dy_k-u|) * relu(1-|dx_k-v|)`` -- pure VPU FMAs, no gather;
* the sampled patch tile [tile_h * W, 9C] immediately contracts with the
  [9C, Cout] weight on the MXU, so patches never round-trip through HBM.

Grid: one program per tile_h output rows.  The padded input stays in HBM
(``pltpu.ANY``); each program DMAs its row slab + halo into VMEM scratch
(the canonical halo pattern).

``deform_conv_shift_xla`` is the same math in pure XLA (correctness oracle
on CPU and fallback); ``deform_conv_pallas`` is the TPU kernel.

Round-1 status (v5e, 136x240x64->64 layer, offsets in +-3; measured with
per-iteration synchronous fetches through the remote relay):
  XLA gather (models/dcn.py)          12.8 ms   (baseline; ~24 GB/s gather)
  shift-XLA per-tap (this file)        9.0 ms   exact within R
  pallas fused (deform_conv_pallas)    OOMs VMEM stack when fully unrolled
  pallas tap-grid hybrid               33 ms    correct; Mosaic materializes
                                                a physical copy per shifted
                                                slice, so the (2R+5)^2 reads
                                                become (2R+5)^2 copies

Round-2 resolution: ``deform_conv_onehot`` (below) replaces the gather with
a batched one-hot MATMUL -- the horizontal hat function evaluated on an
iota forms a [W, W+2p] left operand per row, so the gather is dense MXU
work, and the vertical axis needs only 2r+5 free dim-0 row slices.  Taps
are batched into the einsum (2r+5 contractions per layer total), keeping
the XLA compile of the dcn-node TRAIN step in minutes.  Measured at the
whole-model level (fused frame_step, v5e bf16 544x960, comparative chained
runs): gather 2.05 -> onehot 1.57 ms/frame; shift 2.22.  onehot is the
default ``dcn_impl``.  A Pallas port of the same algorithm (VMEM-resident
slab + in-kernel hat generation) is the remaining headroom (~est. 2x on
the DCN share); not pursued while the per-frame device time (~1.6 ms) sits
30x under this environment's transfer floor.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _pad_input(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    return jnp.pad(x, ((pad, pad), (pad, pad), (0, 0)))


def deform_conv_shift_xla(x, offsets, mask, weight, bias, radius: int = 4,
                          kernel: int = 3):
    """Pure-XLA shift-decomposed DCN (oracle / fallback).

    x: [H, W, C]; offsets: [H, W, KK, 2] (dy, dx); mask: [H, W, KK];
    weight: [KK*C, Cout]; bias: [Cout].  Returns [H, W, Cout].
    """
    h, w, c = x.shape
    kk = kernel * kernel
    r = radius
    pad = r + 2
    xp = _pad_input(x, pad)

    dy = jnp.clip(offsets[..., 0], -r, r)          # [H, W, KK]
    dx = jnp.clip(offsets[..., 1], -r, r)

    ky = [i // kernel - kernel // 2 for i in range(kk)]
    kx = [i % kernel - kernel // 2 for i in range(kk)]

    # per-tap accumulators; each (su, sv) slab feeds only the taps whose
    # clamped offset can reach it, so XLA keeps the intermediates [H, W, C]
    # and fuses the weight/FMA chain
    accs = [jnp.zeros((h, w, c), jnp.float32) for _ in range(kk)]
    for su in range(-r - 2, r + 3):
        for sv in range(-r - 2, r + 3):
            taps = [k for k in range(kk)
                    if abs(su - ky[k]) <= r + 1 and abs(sv - kx[k]) <= r + 1]
            if not taps:
                continue
            slab = jax.lax.dynamic_slice(
                xp, (pad + su, pad + sv, 0), (h, w, c)
            ).astype(jnp.float32)
            for k in taps:
                u = su - ky[k]
                v = sv - kx[k]
                wgt = (jnp.maximum(0.0, 1.0 - jnp.abs(dy[:, :, k] - u))
                       * jnp.maximum(0.0, 1.0 - jnp.abs(dx[:, :, k] - v)))
                accs[k] = accs[k] + slab * wgt[..., None]

    patches = jnp.concatenate(
        [(a * mask[:, :, k:k + 1]).reshape(h * w, c)
         for k, a in enumerate(accs)], axis=1,
    )
    out = patches.astype(weight.dtype) @ weight + bias
    return out.reshape(h, w, -1).astype(x.dtype)


def deform_conv_onehot(x, offsets, mask, weight, bias, radius: int = 4,
                       kernel: int = 3):
    """Bilinear gather as a batched one-hot MATMUL (round-2 kernel).

    The per-pixel horizontal gather Σ_xs hat(xs - pos) * xp[·, xs, :] is a
    batched [W, WS] x [WS, C] matmul whose left operand is the bilinear hat
    evaluated on an iota -- dense MXU work instead of the vector gathers
    that defeat the TPU (models/dcn.py ~12.8 ms on the 136x240x64 layer).
    The vertical axis needs no gather at all: the 2r+3 integer row shifts
    are plain dim-0 slices (address offsets), each weighted by its hat
    coefficient and accumulated.

    Exact (vs the gather oracle) for offsets within +-radius; offsets clamp
    outside, like deform_conv_shift_xla.  x: [H, W, C] (bf16 or f32);
    offsets [H, W, KK, 2] (dy, dx) f32; mask [H, W, KK]; weight [KK*C, Cout].
    """
    h, w, c = x.shape
    kk = kernel * kernel
    r = radius
    pad = r + 2
    xp = _pad_input(x, pad)                                 # [HS, WS, C]
    ws = w + 2 * pad
    cdt = x.dtype

    dy = jnp.clip(offsets[..., 0], -r, r)                   # [H, W, KK]
    dx = jnp.clip(offsets[..., 1], -r, r)
    xs = jnp.arange(ws, dtype=jnp.float32)
    xo = jnp.arange(w, dtype=jnp.float32)
    kys = jnp.asarray([k // kernel - kernel // 2 for k in range(kk)],
                      jnp.float32)
    kxs = jnp.asarray([k % kernel - kernel // 2 for k in range(kk)],
                      jnp.float32)

    # one-hot hat rows for ALL taps at once: [H, W, KK, WS].  Batching taps
    # into one einsum per vertical shift keeps the graph at 2r+5 contractions
    # total (vs kk*(2r+3) -- a large XLA-compile-time win) at identical math.
    pos = xo[None, :, None] + pad + kxs[None, None, :] + dx  # [H, W, KK]
    sx = jnp.maximum(
        0.0, 1.0 - jnp.abs(xs[None, None, None, :] - pos[..., None])
    ).astype(cdt)

    acc = jnp.zeros((h, w, kk, c), jnp.float32)
    for su in range(-r - 2, r + 3):
        # hat weight of this integer row shift, per tap (zero outside reach)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - (su - kys)))  # [H, W, KK]
        slab = jax.lax.dynamic_slice(
            xp, (pad + su, 0, 0), (h, ws, c)
        )                                                   # [H, WS, C]
        g = jnp.einsum("ywks,ysc->ywkc", sx, slab,
                       preferred_element_type=jnp.float32)
        acc = acc + g * wy[..., None]

    patches = (acc * mask[..., None]).reshape(h * w, kk * c)
    out = patches.astype(weight.dtype) @ weight + bias
    return out.reshape(h, w, -1).astype(x.dtype)


def _dcn_kernel(xp_hbm, off_ref, mask_ref, w_ref, b_ref, out_ref,
                slab_ref, sem, *, radius: int, kernel: int, tile_h: int,
                width: int, channels: int, cout: int, col_pad: int = None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kk = kernel * kernel
    r = radius
    pad = r + 2
    i = pl.program_id(0)

    # DMA this tile's row slab (+halo) from HBM into VMEM scratch
    cp = pltpu.make_async_copy(
        xp_hbm.at[pl.ds(i * tile_h, tile_h + 2 * pad)], slab_ref, sem
    )
    cp.start()
    cp.wait()

    off = off_ref[...]
    dy = jnp.clip(off[..., 0], -r, r)              # [tile_h, W, KK]
    dx = jnp.clip(off[..., 1], -r, r)

    # tap base offsets, generated in-kernel (captured constants not allowed)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, kk), 1)
    ky = (kidx // kernel - kernel // 2).astype(jnp.float32)   # [1, KK]
    kx = (kidx % kernel - kernel // 2).astype(jnp.float32)
    cp0 = col_pad if col_pad is not None else pad

    acc = jnp.zeros((tile_h, width, kk, channels), jnp.float32)
    for su in range(-r - 2, r + 3):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - (su - ky)))
        for sv in range(-r - 2, r + 3):
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(dx - (sv - kx)))
            slab = slab_ref[pad + su: pad + su + tile_h,
                            cp0 + sv: cp0 + sv + width, :].astype(jnp.float32)
            acc = acc + slab[:, :, None, :] * (wy * wx)[..., None]

    acc = acc * mask_ref[...][..., None]
    patches = acc.reshape(tile_h * width, kk * channels)
    out = jnp.dot(patches.astype(w_ref.dtype), w_ref[...],
                  preferred_element_type=jnp.float32)
    out_ref[...] = (out + b_ref[...]).reshape(
        tile_h, width, cout
    ).astype(out_ref.dtype)


def deform_conv_pallas(x, offsets, mask, weight, bias, radius: int = 4,
                       kernel: int = 3, tile_h: int = 8,
                       interpret: bool = False):
    """Fused shift-DCN Pallas kernel. Shapes as deform_conv_shift_xla.

    Layout constraints handled here: channels pad to the 128-lane tile,
    columns get an 8-aligned halo so every in-kernel slice is static and the
    HBM->VMEM DMA is tile-aligned.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w, c = x.shape
    kk = kernel * kernel
    cout = weight.shape[1]
    pad = radius + 2
    col_pad = -(-pad // 8) * 8                   # 8-aligned column halo
    th = tile_h
    h_pad = -(-h // th) * th

    cp = -(-c // 128) * 128
    xp = jnp.pad(x, ((pad, pad + (h_pad - h)),
                     (col_pad, col_pad),
                     (0, cp - c)))
    # slab lives in VMEM as bf16: halves the unrolled slice footprint (the
    # compile-time VMEM stack is the binding constraint) and matches the
    # bf16 trunk compute path; weights/offsets/accumulation stay fp32
    xp = xp.astype(jnp.bfloat16)
    if cp != c:
        wfull = jnp.zeros((kk * cp, cout), weight.dtype)
        for k in range(kk):
            wfull = wfull.at[k * cp: k * cp + c].set(
                weight[k * c: (k + 1) * c])
        weight = wfull
    offsets = jnp.pad(offsets, ((0, h_pad - h), (0, 0), (0, 0), (0, 0)))
    mask = jnp.pad(mask, ((0, h_pad - h), (0, 0), (0, 0)))

    out = pl.pallas_call(
        functools.partial(
            _dcn_kernel, radius=radius, kernel=kernel, tile_h=th,
            width=w, channels=cp, cout=cout, col_pad=col_pad,
        ),
        out_shape=jax.ShapeDtypeStruct((h_pad, w, cout), x.dtype),
        grid=(h_pad // th,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # padded x in HBM
            pl.BlockSpec((th, w, kk, 2), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((th, w, kk), lambda i: (i, 0, 0)),
            pl.BlockSpec((kk * cp, cout), lambda i: (0, 0)),
            pl.BlockSpec((cout,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((th, w, cout), lambda i: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * pad, w + 2 * col_pad, cp), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, offsets, mask, weight, bias)
    return out[:h]


# ---------------------------------------------------------------------------
# Variant: grid over (row tile, tap). Each program computes one tap's sampled
# map for one row tile with pure 2-D lane-aligned ops (121 shift-FMAs); the
# 9C x Cout contraction happens outside in XLA, which handles matmuls well.
# Much smaller Mosaic programs than the fused variant.
# ---------------------------------------------------------------------------

def _dcn_tap_kernel(xp_hbm, dy_ref, dx_ref, mask_ref, out_ref, slab_ref,
                    sem, *, radius: int, kernel: int, tile_h: int,
                    width: int, channels: int, col_pad: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r = radius
    pad = r + 2
    i = pl.program_id(0)
    k = pl.program_id(1)
    kk = kernel * kernel

    cp = pltpu.make_async_copy(
        xp_hbm.at[pl.ds(i * tile_h, tile_h + 2 * pad)], slab_ref, sem
    )
    cp.start()
    cp.wait()

    ky = k // kernel - kernel // 2          # traced scalar
    kx = k % kernel - kernel // 2
    dy = jnp.clip(dy_ref[...][0], -r, r)    # [tile_h, W]
    dx = jnp.clip(dx_ref[...][0], -r, r)

    kyf = ky.astype(jnp.float32) if hasattr(ky, "astype") else float(ky)
    kxf = kx.astype(jnp.float32) if hasattr(kx, "astype") else float(kx)
    span = 2 * r + 5

    def body(t, acc):
        # dynamic ROW slice only (dim 0 is untiled -> cheap); the column
        # shifts unroll statically inside, so Mosaic pipelines the 2r+5
        # small FMAs per row-shift without per-iteration relayouts
        su = t - (r + 2)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - (su.astype(jnp.float32) - kyf)))
        rows = slab_ref[pl.ds(pad + su, tile_h), :, :].astype(jnp.float32)
        for sv in range(-r - 2, r + 3):
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(dx - (sv - kxf)))
            slab = rows[:, col_pad + sv: col_pad + sv + width, :]
            acc = acc + slab * (wy * wx)[..., None]
        return acc

    acc = jax.lax.fori_loop(
        0, span, body,
        jnp.zeros((tile_h, width, channels), jnp.float32),
    )

    res = acc * mask_ref[...][0][..., None]             # [tile_h, W, Cp]
    out_ref[...] = res[None].astype(out_ref.dtype)      # [1, tile_h, W, Cp]


def deform_sample_pallas(x, offsets, mask, radius: int = 4, kernel: int = 3,
                         tile_h: int = 8, interpret: bool = False):
    """Pallas shift-DCN sampling -> [H, W, KK, Cp] patches (tap grid)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w, c = x.shape
    kk = kernel * kernel
    pad = radius + 2
    col_pad = -(-pad // 8) * 8
    th = tile_h
    h_pad = -(-h // th) * th
    cp = -(-c // 128) * 128
    xp = jnp.pad(x, ((pad, pad + (h_pad - h)), (col_pad, col_pad),
                     (0, cp - c)))
    # bf16 slab: halves the unrolled VMEM slice footprint (the binding
    # compile-time constraint) and matches the bf16 trunk compute path;
    # offsets/weights/accumulation stay fp32
    xp = xp.astype(jnp.bfloat16)
    offsets = jnp.pad(offsets, ((0, h_pad - h), (0, 0), (0, 0), (0, 0)))
    mask = jnp.pad(mask, ((0, h_pad - h), (0, 0), (0, 0)))
    # tap-major layouts so blocked trailing dims are (tile_h, w) / (w, cp)
    dy_t = jnp.transpose(offsets[..., 0], (2, 0, 1))   # [KK, H, W]
    dx_t = jnp.transpose(offsets[..., 1], (2, 0, 1))
    mask_t = jnp.transpose(mask, (2, 0, 1))            # [KK, H, W]

    out = pl.pallas_call(
        functools.partial(
            _dcn_tap_kernel, radius=radius, kernel=kernel, tile_h=th,
            width=w, channels=cp, col_pad=col_pad,
        ),
        out_shape=jax.ShapeDtypeStruct((kk, h_pad, w, cp), x.dtype),
        grid=(h_pad // th, kk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, th, w), lambda i, k: (k, i, 0)),
            pl.BlockSpec((1, th, w), lambda i, k: (k, i, 0)),
            pl.BlockSpec((1, th, w), lambda i, k: (k, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, w, cp), lambda i, k: (k, i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * pad, w + 2 * col_pad, cp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, dy_t, dx_t, mask_t)
    # [KK, H, W, Cp] -> [H, W, KK*Cp]
    out = jnp.transpose(out[:, :h], (1, 2, 0, 3)).reshape(h, w, kk * cp)
    return out, cp


def deform_conv_pallas_tap(x, offsets, mask, weight, bias, radius: int = 4,
                           kernel: int = 3, tile_h: int = 8,
                           interpret: bool = False):
    h, w, c = x.shape
    kk = kernel * kernel
    cout = weight.shape[1]
    patches, cp = deform_sample_pallas(x, offsets, mask, radius, kernel,
                                       tile_h, interpret)
    if cp != c:
        wfull = jnp.zeros((kk * cp, cout), weight.dtype)
        for k in range(kk):
            wfull = wfull.at[k * cp: k * cp + c].set(
                weight[k * c: (k + 1) * c])
        weight = wfull
    out = patches.reshape(h * w, kk * cp).astype(weight.dtype) @ weight + bias
    return out.reshape(h, w, cout).astype(x.dtype)


# ---------------------------------------------------------------------------
# Pallas port of the one-hot matmul algorithm: the padded input slab lives in
# VMEM (DMA'd with halo per row tile), the hat operands are generated
# in-kernel (never touching HBM), and each vertical shift contracts on the
# MXU.  Opt-in via dcn_impl=pallas_onehot.
# ---------------------------------------------------------------------------

def _onehot_kernel(xp_hbm, dy_ref, dx_ref, mask_ref, out_ref, slab_ref, sem,
                   *, radius: int, kernel: int, tile_h: int, width: int,
                   ws: int, channels: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kk = kernel * kernel
    r = radius
    pad = r + 2
    i = pl.program_id(0)

    cp = pltpu.make_async_copy(
        xp_hbm.at[pl.ds(i * tile_h, tile_h + 2 * pad)], slab_ref, sem
    )
    cp.start()
    cp.wait()

    dy = jnp.clip(dy_ref[...], -r, r)            # [tile_h, W, KK]
    dx = jnp.clip(dx_ref[...], -r, r)

    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, kk), 2)
    kys = (kidx // kernel - kernel // 2).astype(jnp.float32)
    kxs = (kidx % kernel - kernel // 2).astype(jnp.float32)

    # hat rows for all taps: [tile_h, W, KK, WS], generated in VMEM
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, ws), 3).astype(
        jnp.float32)
    xo = jax.lax.broadcasted_iota(jnp.int32, (1, width, 1), 1).astype(
        jnp.float32)
    pos = xo + pad + kxs + dx                     # [tile_h, W, KK]
    sx = jnp.maximum(0.0, 1.0 - jnp.abs(xs - pos[..., None]))
    sx = sx.astype(slab_ref.dtype)

    acc = jnp.zeros((tile_h, width, kk, channels), jnp.float32)
    for su in range(-r - 2, r + 3):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - (su - kys)))
        slab = slab_ref[pl.ds(pad + su, tile_h), :, :]        # [th, WS, C]
        g = jax.lax.dot_general(
            sx, slab,
            dimension_numbers=(((3,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                         # [th, W, KK, C]
        acc = acc + g * wy[..., None]

    res = acc * mask_ref[...][..., None]          # [th, W, KK, C]
    out_ref[...] = jnp.transpose(res, (2, 0, 1, 3)).astype(out_ref.dtype)


def deform_conv_pallas_onehot(x, offsets, mask, weight, bias,
                              radius: int = 4, kernel: int = 3,
                              tile_h: int = 8, interpret: bool = False):
    """One-hot matmul DCN as a Pallas kernel (sampling in-kernel; the final
    [KK*C, Cout] contraction stays in XLA).  Same contract as
    deform_conv_onehot.

    STATUS: validated in interpreter mode (bf16-slab tolerance); TPU
    compilation is blocked by Mosaic "infer-vector-layout: unsupported
    shape cast" -- first on merging [th, W, KK, WS] -> [th, W*KK, WS]
    (reshape across the lane dim), and after removing every explicit
    reshape, inside the 4-D two-free-dim dot_general lowering itself.
    Next lead: per-tap 3-D batched dots (kk in-kernel loop) at the cost of
    kk*(2r+5) dots per tile.  Not wired into dcn_impl; the XLA onehot
    lowering (deform_conv_onehot) is the production kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w, c = x.shape
    kk = kernel * kernel
    cout = weight.shape[1]
    r = radius
    pad = r + 2
    th = tile_h
    h_pad = -(-h // th) * th
    cp = -(-c // 128) * 128
    ws = w + 2 * pad
    xp = jnp.pad(x, ((pad, pad + (h_pad - h)), (pad, pad), (0, cp - c)))
    xp = xp.astype(jnp.bfloat16)
    offsets = jnp.pad(offsets, ((0, h_pad - h), (0, 0), (0, 0), (0, 0)))
    mask = jnp.pad(mask, ((0, h_pad - h), (0, 0), (0, 0)))

    patches = pl.pallas_call(
        functools.partial(
            _onehot_kernel, radius=r, kernel=kernel, tile_h=th, width=w,
            ws=ws, channels=cp,
        ),
        out_shape=jax.ShapeDtypeStruct((kk, h_pad, w, cp), jnp.bfloat16),
        grid=(h_pad // th,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((th, w, kk), lambda i: (i, 0, 0)),
            pl.BlockSpec((th, w, kk), lambda i: (i, 0, 0)),
            pl.BlockSpec((th, w, kk), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((kk, th, w, cp), lambda i: (0, i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * pad, ws, cp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, offsets[..., 0], offsets[..., 1], mask)

    # [KK, H, W, Cp] -> [H*W, KK*Cp] (tap-major rows) outside the kernel
    patches = jnp.transpose(patches[:, :h], (1, 2, 0, 3)).reshape(
        h * w, kk * cp)
    if cp != c:
        wfull = jnp.zeros((kk * cp, cout), weight.dtype)
        for k in range(kk):
            wfull = wfull.at[k * cp: k * cp + c].set(
                weight[k * c: (k + 1) * c])
        weight = wfull
    out = patches.astype(weight.dtype) @ weight + bias
    return out.reshape(h, w, cout).astype(x.dtype)
