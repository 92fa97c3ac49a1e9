#!/usr/bin/env python
"""Per-layer DCN kernel timing on the real chip (VERDICT r3 #3).

Times each dla34-dcn layer shape through the candidate kernels with the
N-iteration chained-scan method (the whole timed region is ONE jit whose
body scans the kernel N times with a data dependence between iterations, so
the relay round trip amortizes to ~0 and the per-iteration time is honest
device time; same methodology as the round-3 table in ops/pallas_dcn.py).

Offset regimes (the gated pallas_cm kernel is data-adaptive, so the regime
matters):
  zero      offsets identically 0 (fresh DCNv2 init; gating prunes maximally)
  trained   N(0, 0.5) + smooth spatial ramp, |offset| <~ 1.5 (what trained
            DEFT checkpoints actually produce -- see tools/measure_dcn_offsets)
  uniform   U(-4, 4) worst case (gating prunes nothing)

Usage:
  python tools/bench_dcn.py                     # full sweep on the TPU
  python tools/bench_dcn.py --iters 20 --impls pallas_cm,onehot
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# dla34-dcn layer shapes at 544x960 input: (H, W, Cin, Cout, count/model)
LAYERS = [
    (136, 240, 64, 64, 10),
    (68, 120, 128, 64, 8),
    (68, 120, 128, 128, 4),
    (34, 60, 256, 128, 4),
    (34, 60, 256, 256, 2),
    (34, 60, 256, 64, 2),
    (17, 30, 512, 256, 2),
]


def make_offsets(rng, h, w, kk, regime: str):
    if regime == "zero":
        return np.zeros((h, w, kk, 2), np.float32)
    if regime == "trained":
        # small noise + a smooth spatial ramp: matches trained checkpoints
        # (offsets concentrate inside ~+-1.5 px and vary smoothly, so the
        # per-tile min/max gate bounds stay tight)
        yy = np.linspace(-1.0, 1.0, h, dtype=np.float32)[:, None, None, None]
        xx = np.linspace(-1.0, 1.0, w, dtype=np.float32)[None, :, None, None]
        ramp = np.concatenate([yy + 0 * xx, xx + 0 * yy], axis=-1)
        noise = rng.normal(0.0, 0.5, (h, w, kk, 2)).astype(np.float32)
        return np.clip(noise + 0.7 * ramp, -2.0, 2.0)
    if regime == "uniform":
        return rng.uniform(-4.0, 4.0, (h, w, kk, 2)).astype(np.float32)
    raise ValueError(regime)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--impls", default="pallas_cm,pallas_cm_ungated,onehot,conv")
    ap.add_argument("--regimes", default="zero,trained,uniform")
    ap.add_argument("--radius", type=int, nargs="+", default=[4, 2])
    ap.add_argument("--layers", type=int, nargs="+", default=None,
                    help="indices into the layer table (default all)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from deft_tpu.ops.pallas_dcn import (
        deform_conv_onehot,
        deform_conv_pallas_cm,
    )
    from deft_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    kk = 9
    rng = np.random.RandomState(0)
    impls = args.impls.split(",")
    regimes = args.regimes.split(",")
    idxs = args.layers if args.layers else range(len(LAYERS))

    def timed_scan(fn, x, offs, mask, weight, bias, n):
        """ms/iter by chained scan: each iteration's input depends on the
        previous output, so the device must run all n sequentially and ONE
        fetch at the end covers them (relay RTT cancels)."""

        def body(carry, _):
            out = fn(carry, offs, mask, weight, bias)
            # fold the output back into the carry (shape-preserving, cheap)
            carry = carry + 1e-6 * jnp.tanh(out.mean())
            return carry, ()

        @jax.jit
        def run(x0):
            final, _ = jax.lax.scan(body, x0, (), length=n)
            return final.ravel()[0]

        r = run(x)
        jax.block_until_ready(r)           # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(run(x))
            ts.append((time.time() - t0) / n * 1000.0)
        return sorted(ts)[1]

    results = []
    for li in idxs:
        h, w, c, cout, count = LAYERS[li]
        x = jnp.asarray(rng.normal(0, 1, (h, w, c)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        weight = jnp.asarray(
            rng.normal(0, 0.05, (kk * c, cout)).astype(np.float32)
        ).astype(jnp.bfloat16)
        bias = jnp.zeros((cout,), jnp.float32)
        mask = jnp.asarray(
            1.0 / (1.0 + np.exp(-rng.normal(0, 0.3, (h, w, kk))))
        ).astype(jnp.float32)

        # conv floor: plain 3x3 at the same shape (the MXU speed-of-light
        # reference for this layer)
        if "conv" in impls:
            wconv = weight.reshape(3, 3, c, cout)

            def conv_fn(xx, o, m, wt, b, wconv=wconv):
                return jax.lax.conv_general_dilated(
                    xx[None], wconv, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32,
                )[0].astype(xx.dtype)

            ms = timed_scan(conv_fn, x, None, None, None, None, args.iters)
            results.append({"layer": li, "shape": f"{h}x{w}x{c}->{cout}",
                            "impl": "conv", "ms": round(ms, 3)})
            print(json.dumps(results[-1]), flush=True)

        for regime in regimes:
            offs_np = make_offsets(rng, h, w, kk, regime)
            offs = jnp.asarray(offs_np)
            for r in args.radius:
                for impl in impls:
                    if impl == "conv":
                        continue
                    if impl == "pallas_cm":
                        fn = functools.partial(deform_conv_pallas_cm,
                                               radius=r, gated=True)
                    elif impl == "pallas_cm_ungated":
                        fn = functools.partial(deform_conv_pallas_cm,
                                               radius=r, gated=False)
                    elif impl == "onehot":
                        fn = functools.partial(deform_conv_onehot, radius=r)
                    else:
                        raise ValueError(impl)
                    try:
                        ms = timed_scan(fn, x, offs, mask, weight, bias,
                                        args.iters)
                    except Exception as e:   # noqa: BLE001 - record and move on
                        results.append({"layer": li, "impl": impl,
                                        "regime": regime, "radius": r,
                                        "error": str(e)[:200]})
                        print(json.dumps(results[-1]), flush=True)
                        continue
                    results.append({
                        "layer": li, "shape": f"{h}x{w}x{c}->{cout}",
                        "impl": impl, "regime": regime, "radius": r,
                        "ms": round(ms, 3), "count": count,
                    })
                    print(json.dumps(results[-1]), flush=True)

    # model-weighted totals per (impl, regime, radius)
    from collections import defaultdict
    tot = defaultdict(float)
    for r in results:
        if "ms" in r and r["impl"] != "conv":
            tot[(r["impl"], r["regime"], r["radius"])] += (
                r["ms"] * LAYERS[r["layer"]][4])
    for k in sorted(tot):
        print(f"# model-weighted {k[0]} regime={k[1]} r={k[2]}: "
              f"{tot[k]:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
