"""End-to-end tracking benchmark.

Measures the full per-frame MOT17 pipeline on the available accelerator
through the production path: host affine warp -> ONE fused jitted program per
frame (DLA-34 forward in bf16, sigmoid, decode top-100, AFE embedding gather,
ring-buffer similarity, buffer write) -> pipelined fetch -> inverse affine +
association cascade on host.  Prints ONE JSON line; the baseline target is
60 FPS/chip (BASELINE.md).

The detection threshold is dropped so that (with an untrained net) all K=100
candidates flow through the cascade -- a max-load, conservative number
(MOT17 frames average ~30 detections).

Usage: python bench.py [--smoke] [--frames N] [--fp32] [--no-pipeline]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def make_synthetic_frame(t, h, w, n_obj=12, seed=0):
    rng = np.random.RandomState(seed)
    img = np.full((h, w, 3), 40, np.uint8)
    for i in range(n_obj):
        speed = 1.0 + 3.0 * rng.rand()
        y = int(rng.rand() * (h - 120))
        x = int((30 + speed * 4 * t + i * w / n_obj) % (w - 80))
        color = tuple(int(c) for c in rng.randint(60, 255, 3))
        img[y: y + 100, x: x + 50] = color
    return img


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes on CPU for a fast correctness check")
    ap.add_argument("--frames", type=int, default=150)
    ap.add_argument("--warmup", type=int, default=15)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--no-pipeline", action="store_true")
    ap.add_argument("--chunk", type=int, default=4,
                    help="frames per device dispatch. Swept on the tunneled "
                         "v5e with the freshness-window sims cut: "
                         "depth=2/chunk=4 is the optimum (57 ms/frame vs "
                         "~100 at chunk=1); chunk >= 8 loses again (large "
                         "serialized bursts)")
    ap.add_argument("--depth", type=int, default=2,
                    help="pipeline depth (in-flight dispatches)")
    ap.add_argument("--delta", action="store_true",
                    help="delta-encode frame uploads (bit-exact; wins only "
                         "on transports that compress -- measured neutral "
                         "through this tunnel)")
    ap.add_argument("--max-dets", type=int, default=0,
                    help="cap detections/frame fed to the cascade (0 = all "
                         "K=100; 32 emulates typical trained-detector load)")
    ap.add_argument("--profile", type=str, default="",
                    help="directory for a jax.profiler trace of the measured "
                         "run (open with tensorboard/xprof)")
    ap.add_argument("--chunk-batched", action="store_true",
                    help="batch the model forward over each chunk "
                         "(frame_chunk_batched) instead of scanning whole "
                         "frame programs -- output-identical A/B knob")
    ap.add_argument("--yuv", action="store_true",
                    help="upload planar YUV 4:2:0 frames (HALF the wire "
                         "bytes; chroma 2x2-averaged like the H.264 yuv420p "
                         "sources; device decodes in the frame program)")
    args = ap.parse_args()

    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from deft_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from deft_tpu.config import mot_config
    from deft_tpu.inference.detector import Detector
    from deft_tpu.inference.runner import PipelinedRunner

    dtype = "float32" if args.fp32 else "bfloat16"
    if args.smoke:
        cfg = mot_config(input_h=128, input_w=160, dla_node="conv",
                         track_thresh=1e-3, compute_dtype=dtype,
                         sims_quant=True, delta_upload=args.delta,
                         chunk_batched=args.chunk_batched,
                         yuv_upload=args.yuv)
        frames, warmup = 12, 4
    else:
        cfg = mot_config(track_thresh=1e-3, compute_dtype=dtype,
                         sims_quant=True, delta_upload=args.delta,
                         chunk_batched=args.chunk_batched,
                         yuv_upload=args.yuv)
        frames, warmup = args.frames, args.warmup

    det = Detector(cfg)
    det.img_height, det.img_width = 1080, 1920
    runner = PipelinedRunner(det, depth=1 if args.no_pipeline else args.depth,
                             chunk=args.chunk)
    if args.max_dets > 0:
        runner.cap = args.max_dets

    fh, fw = (270, 480) if args.smoke else (1080, 1920)
    warm_frames = [make_synthetic_frame(t, fh, fw) for t in range(warmup)]
    runner.track_sequence(warm_frames)
    runner.reset()

    seq = [make_synthetic_frame(t, fh, fw) for t in range(frames)]
    import contextlib

    if args.profile:
        import jax as _jax

        prof_ctx = _jax.profiler.trace(args.profile)
    else:
        prof_ctx = contextlib.nullcontext()

    # the remote-relay bandwidth drifts 3-4x between runs (measured 9-40
    # MB/s); report the MEDIAN of three passes so one congested window
    # doesn't define the number
    n_rep = 1 if args.smoke else 3
    fps_runs = []
    n_tracks = 0.0
    with prof_ctx:
        for _ in range(n_rep):
            runner.reset()
            t0 = time.time()
            results = runner.track_sequence(seq)
            elapsed = time.time() - t0
            fps_runs.append(frames / elapsed)
            n_tracks = sum(len(r) for r in results) / max(len(results), 1)
    fps = sorted(fps_runs)[len(fps_runs) // 2]
    elapsed = frames / fps

    # ---- attribution: upload / device / fetch ms per frame -----------------
    # Measured with fully synchronous stages: through a remote-attached
    # device the async dispatch queue behaves pathologically (a deep
    # donated-state chain runs ~2.5x SLOWER per step than synchronous
    # cycles -- relay flow control), so the honest decomposition is
    # cycle = upload + device(+dispatch) + fetch, each blocked.
    import jax
    import jax.numpy as jnp

    runner.reset()
    warps = [runner.warp(seq[i % len(seq)])[0] for i in range(6)]
    if getattr(runner, "_yuv_mode", False):
        # measure what the pipeline actually ships: packed YUV 4:2:0 planes
        from deft_tpu.inference.runner import pack_yuv420
        warps = [pack_yuv420(w) for w in warps]
    thresh = jnp.float32(cfg.out_thresh)
    img = jax.device_put(jnp.asarray(warps[0]))
    outs = runner._step(det.variables, img, runner.state, thresh, None)
    jax.block_until_ready(outs)
    state = outs[2]
    n_dev = 3 if args.smoke else 6

    if getattr(runner, "_delta_mode", False):
        # measure what the pipeline actually ships: frame deltas
        payloads = [warps[0]] + [warps[i] - warps[i - 1]
                                 for i in range(1, len(warps))]
    else:
        payloads = warps
    # measure through the runner's forced-staging path: device_put is LAZY
    # through the relay (block_until_ready returns ~3 ms with nothing
    # shipped), so the honest upload figure is the forced consume+fetch
    # that _stage_upload performs to make the buffer truly resident
    td = time.time()
    futs = [runner._stage_upload(payloads[i % len(payloads)])
            for i in range(n_dev)]
    bufs = [f.result() for f in futs]
    upload_ms = (time.time() - td) / n_dev * 1000.0

    td = time.time()
    for i in range(n_dev):
        packed, sims, state = runner._step(det.variables, bufs[i], state,
                                           thresh, None)
        out_host = jax.device_get((packed, sims))
    step_fetch_ms = (time.time() - td) / n_dev * 1000.0

    # fetch cost alone: fresh (uncached) buffers of the same shapes via a
    # trivial bump op -- jax caches the host copy of already-fetched arrays
    bump = jax.jit(lambda p, s, i: (p + i, s + i.astype(s.dtype)))
    jax.device_get(bump(packed, sims, jnp.float32(0)))      # warm compile
    td = time.time()
    for i in range(n_dev):
        jax.device_get(bump(packed, sims, jnp.float32(i + 1)))
    fetch_ms = (time.time() - td) / n_dev * 1000.0

    device_ms = max(step_fetch_ms - fetch_ms, 0.01)

    # True per-frame device time by differential timing: one synchronous
    # frame_chunk dispatch computes `chunk` frames but pays the same relay
    # round trip as one frame_step dispatch, so
    #   dev = (t_chunk - t_single) / (chunk - 1)
    # cancels the RTT that inflates device_ms above.  (jax.profiler traces
    # hang through this relay, so a device trace is not available; this is
    # the honest substitute.)
    device_ms_chained = None
    if runner.chunk > 1:
        frames_t = tuple(bufs[i % len(bufs)] for i in range(runner.chunk))
        c_out = runner._step_chunk(det.variables, frames_t, state, thresh, None)
        jax.block_until_ready(c_out)
        state = c_out[2]
        t1s, tcs = [], []
        for i in range(n_dev):
            td = time.time()
            outs = runner._step(det.variables, bufs[i % len(bufs)], state,
                                thresh, None)
            jax.block_until_ready(outs)
            t1s.append(time.time() - td)
            state = outs[2]
            td = time.time()
            c_out = runner._step_chunk(det.variables, frames_t, state,
                                       thresh, None)
            jax.block_until_ready(c_out)
            tcs.append(time.time() - td)
            state = c_out[2]
        t1 = sorted(t1s)[len(t1s) // 2]
        tc = sorted(tcs)[len(tcs) // 2]
        device_ms_chained = max((tc - t1) / (runner.chunk - 1) * 1000.0, 0.01)

    # MFU: XLA's own flop count for the step / true device time / chip peak.
    # device_ms above UPPER-bounds device time (it includes a relay round
    # trip); the differential estimate is the honest denominator when
    # available (VERDICT r2: do not use the RTT-inflated wall clock).
    mfu = None
    try:
        lowered = runner._step.lower(det.variables, img, state, thresh, None)
        cost = lowered.compile().cost_analysis()
        flops = float((cost or {}).get("flops", 0.0))
        plat = jax.devices()[0].platform
        peak = 197e12 if plat == "tpu" else 1e12  # v5e bf16 peak; CPU nominal
        denom_ms = device_ms_chained if device_ms_chained else device_ms
        if flops > 0 and denom_ms > 0.2:
            mfu = flops / (denom_ms / 1000.0) / peak
    except Exception:
        pass

    out = {
        "metric": "e2e_mot17_tracking_fps_per_chip",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 3),
        "device_ms_per_frame": round(device_ms, 2),
        "device_only_fps": round(1000.0 / device_ms, 1),
        "upload_ms_per_frame": round(upload_ms, 1),
        "fetch_ms_per_frame": round(fetch_ms, 1),
    }
    if device_ms_chained is not None:
        out["device_ms_true"] = round(device_ms_chained, 2)
    if mfu is not None:
        out["mfu"] = round(mfu, 4)
    print(json.dumps(out))
    host_ms = max(elapsed / frames * 1000.0 - device_ms - upload_ms
                  - fetch_ms, 0.0)
    print(f"# frames={frames} elapsed={elapsed:.2f}s tracks/frame={n_tracks:.1f} "
          f"dtype={dtype} pipeline_depth={runner.depth} chunk={runner.chunk} "
          f"sim_window={runner.sim_window} "
          f"runs_fps={[round(f, 2) for f in fps_runs]}", file=sys.stderr)
    true_dev = (f"{device_ms_chained:.1f}" if device_ms_chained is not None
                else "n/a")
    print(f"# attribution (sync stages): upload {upload_ms:.1f} + "
          f"dispatch+device {device_ms:.1f} + fetch {fetch_ms:.1f} ms/frame "
          f"(dispatch+device includes one relay round trip; the differential "
          f"chunk-vs-single estimate puts true per-frame device time at "
          f"{true_dev} ms); e2e remainder {host_ms:.1f} ms/frame",
          file=sys.stderr)


if __name__ == "__main__":
    main()
