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
the XLA compile of the dcn-node TRAIN step in minutes.  onehot is the
default ``dcn_impl``.

Round-3 measurements (v5e, per-layer, N-iteration scan chained inside ONE
jit so the relay RTT cancels -- the round-2 "1.6 ms/frame" whole-model
figure was an artifact of block_until_ready not reflecting completion
through this environment's relay; true whole-model frame time is ~35 ms,
~95% of it DCN):

  layer (HxWxC->Cout, count/model)   pallas_cm r=4   onehot r=4   conv3x3
  136x240x64->64   x10                  2.839          3.477        0.139
  68x120x128->64   x8                   1.032          1.283        0.034
  68x120x128->128  x4                   1.039          1.247        0.018
  34x60x256->128   x4                   1.089          0.390        0.002
  34x60x256->256   x2                   1.109          0.397        0.013
  34x60x256->64    x2                   1.097          0.384        0.005
  17x30x512->256   x2                   1.308          0.132        0.008
  model-weighted total                 52.2           53.4          1.8 ms

``deform_conv_pallas_cm`` (below) is the round-3 kernel: a CHANNEL-MAJOR
[H, C, W] layout makes every column shift a lane slice and every row shift
a sublane slice of one VMEM-resident slab, with the (2r+3)^2 hat-weighted
shift-FMAs computed per column-shift from one scratch copy (the Mosaic
copy-per-shift pathology of the round-1 tap-grid kernel amortizes to ONE
copy per column shift shared by all taps and row shifts).  It beats the
onehot einsum on the large-spatial/small-C layers (where hat-operand
construction dominates onehot) and loses on the small-spatial/big-C ones
(where the MXU einsum is nearly free) -- hence ``deform_conv_hybrid``
(the default ``dcn_impl``) picks per-shape (c <= 128 -> pallas_cm, else
onehot), cutting the model-weighted DCN total to 44.2 ms in the per-layer
scan harness and the WHOLE-MODEL dla34-dcn forward from 30.6 to 28.1
ms/frame (v5e bf16 544x960, chained-scan differential, reproducible to
+-0.01 ms across interleaved reps).  tile_h=8 is the optimum (th=16
measured 3.22/1.11 ms on the two large layers vs 2.84/1.03).  Gradients
flow through a custom_vjp whose backward is the VJP of the numerically
equivalent deform_conv_onehot (round 4: was shift-XLA, whose backward
compiles ~28x slower and timed out the multichip dryrun), so
``dcn_impl=hybrid`` also trains.

Why neither kernel approaches the 1.8 ms conv floor: the bilinear hat
weight w(rs,cs) = wy(rs)*wx(cs) depends on the OUTPUT pixel through the
learned per-pixel offsets, so the vertical/horizontal mixes cannot be
factored into separable passes (each would need the other's output-pixel
index); the (2r+3)^2-tap product space is inherent to any static-shift
formulation, and a 4-tap formulation needs per-pixel gathers that defeat
the TPU's vector memory.  The VPU-bound floor of the product-space kernel
at the 136x240x64 layer is ~1.2 ms (2.27 G f32 FMA-pairs / 3.7 T/s);
pallas_cm measures 2.8 ms.

Round-5 sweep (v5e, tools/bench_dcn.py --iters 30, trained offset regime;
full table in STATUS.md r5 item 1, raw logs exp/r5_measurements/):
  * the hybrid C<=128 crossover is CONFIRMED on silicon: gated pallas_cm
    wins the three large-spatial/small-C shapes (1.74/1.18/1.43 ms at
    r=2), onehot wins all four C>=256 shapes (0.90-1.17 ms);
  * the offset GATE (per-tile min/max bounds skipping provably-zero
    (tap, shift) blocks via pl.when) never loses: ~43% pruned at trained
    offsets, worst-case uniform still beats ungated;
  * shrinking the static radius r=4 -> r=2 is worth ~20% of standalone
    DCN time model-wide (hybrid-best weighted 53.6 -> 43.0 ms standalone;
    onehot-only 20.8 -> 17.1 ms in the cleaner second sweep); trained
    checkpoints keep |offset| < ~2 (tools/measure_dcn_offsets.py), so
    per-layer radii from the measured distributions (config
    dcn_layer_radii) are numerically exact.
  * the whole-model program overlaps most standalone DCN time: a jax
    profiler trace (STATUS r5 item 5) puts the full fused frame program
    at 11.55 ms/frame device-busy at 544x960 bf16.
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


# ---------------------------------------------------------------------------
# Round-3 kernel: channel-major shift DCN.  Layout [H, C, W] puts W on the
# lanes and C on the sublanes, so a column shift is ONE lane slice of a
# scratch copy shared by every (tap, row-shift) pair, and a row shift is a
# sublane slice -- no per-shift physical copies, no hat-operand matmuls.
# Wins on large-spatial/small-C layers; see module docstring for numbers.
# ---------------------------------------------------------------------------

def _cm_kernel(xp_hbm, dy_ref, dx_ref, mask_ref, out_ref,
               slab_ref, copy_ref, acc_ref, sem, *, radius, kernel, tile_h,
               width, pad_rows, col0, gated):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kk = kernel * kernel
    r = radius
    i = pl.program_id(0)

    cp = pltpu.make_async_copy(
        xp_hbm.at[pl.ds(i * tile_h, tile_h + 2 * pad_rows)], slab_ref, sem)
    cp.start()
    cp.wait()

    ky = [k // kernel - kernel // 2 for k in range(kk)]
    kx = [k % kernel - kernel // 2 for k in range(kk)]
    dy = [jnp.clip(dy_ref[k], -r, r) for k in range(kk)]    # [th, W] f32
    dx = [jnp.clip(dx_ref[k], -r, r) for k in range(kk)]

    if gated:
        # bilinear hats have 2-px support: tap k touches column shift cs only
        # if some pixel has |dx_k - (cs - kx_k)| < 1, i.e. cs - kx_k lies in
        # (min dx_k - 1, max dx_k + 1).  Trained DEFT offsets are small and
        # spatially smooth, so per-tile bounds prune most of the (2r+5)^2
        # static product space; pl.when makes the skip a real branch (the
        # full unrolled body stays compiled = worst case unchanged).
        dx_lo = [jnp.min(dx[k]) - 1.0 for k in range(kk)]
        dx_hi = [jnp.max(dx[k]) + 1.0 for k in range(kk)]
        dy_lo = [jnp.min(dy[k]) - 1.0 for k in range(kk)]
        dy_hi = [jnp.max(dy[k]) + 1.0 for k in range(kk)]

    acc_ref[...] = jnp.zeros_like(acc_ref)
    for cs in range(-r - 2, r + 3):
        taps = [k for k in range(kk) if abs(cs - kx[k]) <= r + 1]

        def cs_body(cs=cs, taps=taps):
            # ONE lane-shift copy per absolute column shift; scratch-resident
            # so the unrolled body reuses one buffer instead of stacking
            copy_ref[...] = slab_ref[:, :, col0 + cs: col0 + cs + width]
            for k in taps:
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(dx[k] - (cs - kx[k])))

                def k_body(k=k, wx=wx):
                    for rs in range(-r - 2, r + 3):
                        if abs(rs - ky[k]) > r + 1:
                            continue

                        def rs_body(k=k, wx=wx, rs=rs):
                            wy = jnp.maximum(
                                0.0, 1.0 - jnp.abs(dy[k] - (rs - ky[k])))
                            w2 = (wx * wy)[:, None, :]       # [th, 1, W]
                            rows = copy_ref[
                                pad_rows + rs: pad_rows + rs + tile_h]
                            acc_ref[k] = (acc_ref[k]
                                          + rows.astype(jnp.float32) * w2)

                        if gated:
                            t = float(rs - ky[k])
                            pl.when((dy_lo[k] < t) & (t < dy_hi[k]))(rs_body)
                        else:
                            rs_body()

                if gated:
                    s = float(cs - kx[k])
                    pl.when((dx_lo[k] < s) & (s < dx_hi[k]))(k_body)
                else:
                    k_body()

        if gated:
            act = None
            for k in taps:
                s = float(cs - kx[k])
                a = (dx_lo[k] < s) & (s < dx_hi[k])
                act = a if act is None else (act | a)
            pl.when(act)(cs_body)
        else:
            cs_body()

    for k in range(kk):
        a = acc_ref[k] * mask_ref[k][:, None, :]
        out_ref[k] = a.astype(out_ref.dtype)


def deform_conv_pallas_cm(x, offsets, mask, weight, bias, radius: int = 4,
                          kernel: int = 3, tile_h: int = 8,
                          interpret: bool = False, gated: bool = True):
    """Channel-major Pallas shift-DCN.  Same contract as
    deform_conv_shift_xla; exact within the +-radius clamp (bf16 slab).

    ``gated=True`` prunes (tap, shift) blocks whose per-tile offset bounds
    prove the bilinear hat is identically zero (pl.when scalar branches --
    output-identical, data-adaptive runtime: worst case equals ungated)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w, c = x.shape
    kk = kernel * kernel
    cout = weight.shape[1]
    r = radius
    pad = r + 2
    th = tile_h
    h_pad = -(-h // th) * th
    col0 = pad
    ws = -(-(w + 2 * pad) // 128) * 128   # DMA slices need lane-aligned dims

    # channel-major padded input [HS, C, WS]
    xp = jnp.pad(x, ((pad, pad + (h_pad - h)),
                     (pad, pad + (ws - w - 2 * pad)), (0, 0)))
    xp = jnp.transpose(xp, (0, 2, 1)).astype(jnp.bfloat16)   # [HS, C, WS]

    offsets = jnp.pad(offsets, ((0, h_pad - h), (0, 0), (0, 0), (0, 0)))
    mask = jnp.pad(mask, ((0, h_pad - h), (0, 0), (0, 0)))
    dy_t = jnp.transpose(offsets[..., 0], (2, 0, 1)).astype(jnp.float32)
    dx_t = jnp.transpose(offsets[..., 1], (2, 0, 1)).astype(jnp.float32)
    mask_t = jnp.transpose(mask, (2, 0, 1)).astype(jnp.float32)
    patches = pl.pallas_call(
        functools.partial(
            _cm_kernel, radius=r, kernel=kernel, tile_h=th, width=w,
            pad_rows=pad, col0=col0, gated=gated),
        out_shape=jax.ShapeDtypeStruct((kk, h_pad, c, w), jnp.bfloat16),
        grid=(h_pad // th,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((kk, th, w), lambda i: (0, i, 0)),
            pl.BlockSpec((kk, th, w), lambda i: (0, i, 0)),
            pl.BlockSpec((kk, th, w), lambda i: (0, i, 0)),
        ],
        out_specs=pl.BlockSpec((kk, th, c, w), lambda i: (0, i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * pad, c, ws), jnp.bfloat16),
            pltpu.VMEM((th + 2 * pad, c, w), jnp.bfloat16),
            pltpu.VMEM((kk, th, c, w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        # the f32 acc scratch at the 136x240x64 layer needs 17.4M of scoped
        # VMEM -- above the 16M default, well under the v5e's 128M
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, dy_t, dx_t, mask_t)
    wt = weight.reshape(kk, c, cout).astype(jnp.bfloat16)
    out = jnp.einsum("khcw,kcf->hwf", patches[:, :h], wt,
                     preferred_element_type=jnp.float32) + bias
    return out.astype(x.dtype)


@functools.partial(jax.checkpoint, static_argnums=(5, 6))
def _onehot_remat(x, offsets, mask, weight, bias, radius, kernel):
    return deform_conv_onehot(x, offsets, mask, weight, bias,
                              radius=radius, kernel=kernel)


def deform_conv_onehot_remat(x, offsets, mask, weight, bias, radius: int = 4,
                             kernel: int = 3):
    """onehot with rematerialized backward: plain autodiff of the onehot
    loop stores every per-row-shift [B, H, W, KK, C] f32 intermediate, which
    at training scale OOMs HBM (measured: 74 GB wanted for a batch-4 dla34
    train step at 384x1280 -- 30 DCN layers x 13 shifts x 270 MB).
    jax.checkpoint recomputes the forward inside the backward instead, so
    only the primals are stored per layer.  Free when not differentiated."""
    return _onehot_remat(x, offsets, mask, weight, bias, radius, kernel)


# -- hybrid dispatch: per-shape fastest kernel, trainable via custom_vjp ----

def _hybrid_fastest(c: int) -> bool:
    """True -> pallas_cm, False -> onehot (empirical crossover, see module
    docstring: pallas_cm wins where the onehot hat-operand build dominates,
    i.e. the large-spatial/small-channel layers)."""
    return c <= 128


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _hybrid_vjp(x, offsets, mask, weight, bias, radius, kernel):
    h, w, c = x.shape
    if _hybrid_fastest(c) and jax.default_backend() == "tpu":
        return deform_conv_pallas_cm(x, offsets, mask, weight, bias,
                                     radius=radius, kernel=kernel)
    return deform_conv_onehot(x, offsets, mask, weight, bias,
                              radius=radius, kernel=kernel)


def _hybrid_fwd(x, offsets, mask, weight, bias, radius, kernel):
    out = _hybrid_vjp(x, offsets, mask, weight, bias, radius, kernel)
    return out, (x, offsets, mask, weight, bias)


def _hybrid_bwd(radius, kernel, res, g):
    # backward = VJP of the numerically equivalent ONEHOT formulation, not
    # the unrolled shift-XLA one: identical math (both are the exact
    # clamped-bilinear sampling), but the shift-XLA VJP compiles ~28x slower
    # (measured round 3: 75.8 s vs 2.7 s for the gradient of one tiny
    # 8x8x16 layer on CPU) because its kk-accumulator unroll explodes the
    # backward graph; across the trunk's DCN layers that timed out the
    # multichip dryrun (MULTICHIP_r03 rc=124).
    _, vjp = jax.vjp(
        lambda xx, oo, mm, ww, bb: deform_conv_onehot(
            xx, oo, mm, ww, bb, radius=radius, kernel=kernel), *res)
    return vjp(g)


_hybrid_vjp.defvjp(_hybrid_fwd, _hybrid_bwd)


def deform_conv_hybrid(x, offsets, mask, weight, bias, radius: int = 4,
                       kernel: int = 3):
    """Per-shape fastest DCN: pallas_cm for C<=128 on TPU, onehot otherwise
    (and everywhere on non-TPU backends, where Mosaic is unavailable --
    the math is identical).  Backward pass is the VJP of the numerically
    equivalent onehot formulation (compiles ~28x faster than the shift-XLA
    VJP -- see _hybrid_bwd), so dcn_impl=hybrid also trains."""
    return _hybrid_vjp(x, offsets, mask, weight, bias, radius, kernel)


@functools.partial(jax.checkpoint, static_argnums=(5, 6))
def _hybrid_remat(x, offsets, mask, weight, bias, radius, kernel):
    return deform_conv_hybrid(x, offsets, mask, weight, bias,
                              radius=radius, kernel=kernel)


def deform_conv_hybrid_remat(x, offsets, mask, weight, bias, radius: int = 4,
                             kernel: int = 3):
    """hybrid with rematerialized backward (same memory rationale as
    deform_conv_onehot_remat); the batched-inference experiment route
    (models/dcn.py DEFT_DCN_BATCHED_IMPL=hybrid), vmap-able: Mosaic's vmap
    rule adds a leading grid dimension to the pallas_cm kernel."""
    return _hybrid_remat(x, offsets, mask, weight, bias, radius, kernel)
