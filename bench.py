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
    ap.add_argument("--device-warp", action="store_true",
                    help="warp the input affine on device (two MXU matmuls; "
                         "raw uint8 uploads -- wins on locally-attached "
                         "TPUs, costs 4x the wire bytes through a relay)")
    ap.add_argument("--dcn-layer-radii", type=str, default="",
                    help="per-layer DCN clamp radii (JSON path-substring -> "
                         "radius; from tools/measure_dcn_offsets.py)")
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
                         yuv_upload=args.yuv, device_warp=args.device_warp,
                         dcn_layer_radii=args.dcn_layer_radii)
        frames, warmup = 12, 4
    else:
        cfg = mot_config(track_thresh=1e-3, compute_dtype=dtype,
                         sims_quant=True, delta_upload=args.delta,
                         chunk_batched=args.chunk_batched,
                         yuv_upload=args.yuv, device_warp=args.device_warp,
                         dcn_layer_radii=args.dcn_layer_radii)
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

    # measure the staging modes on real frames and let the runner pick
    # (stacked vs per-frame, forced vs lazy residency): the relay's drifting
    # flow control inverts the winner between rounds (VERDICT r3 #1/#7)
    tune_scores = {}
    if runner.chunk > 1 and not args.smoke:
        tune_frames = [make_synthetic_frame(t, fh, fw)
                       for t in range(3 * runner.chunk)]
        tune_scores = runner.auto_tune(tune_frames, verbose=True)
        print(f"# auto_tune picked stacked={runner.stacked} "
              f"force_resident={runner.force_resident} "
              f"upload_parallel={runner.upload_parallel}", file=sys.stderr)

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
    run_timings = []
    n_tracks = 0.0
    with prof_ctx:
        for _ in range(n_rep):
            runner.reset()
            t0 = time.time()
            results = runner.track_sequence(seq)
            elapsed = time.time() - t0
            fps_runs.append(frames / elapsed)
            run_timings.append(runner.timings())
            n_tracks = sum(len(r) for r in results) / max(len(results), 1)
    order = sorted(range(n_rep), key=lambda i: fps_runs[i])
    med = order[n_rep // 2]
    fps = fps_runs[med]
    buckets = run_timings[med]          # per-frame ms, median run
    elapsed = frames / fps

    # ---- raw wire probe (VERDICT r3 #1: record relay degradation, don't
    # guess it): tiny-RTT + forced-resident frame / chunk-stack uploads ----
    import jax
    import jax.numpy as jnp

    runner.reset()
    force = jax.jit(lambda a: a.ravel()[0])
    tiny = jnp.zeros((8,), jnp.float32)
    bump = jax.jit(lambda x: x + 1)
    jax.block_until_ready(bump(tiny))
    n_dev = 3 if args.smoke else 6
    rtts = []
    for _ in range(n_dev):
        td = time.time()
        jax.device_get(bump(tiny))
        rtts.append((time.time() - td) * 1000.0)
    wire_rtt = sorted(rtts)[len(rtts) // 2]

    warped0, meta0 = runner.warp(seq[0])
    probe_wtf = runner._warp_tf(meta0)
    warps = [runner.warp(seq[i % len(seq)])[0] for i in range(runner.chunk)]
    if getattr(runner, "_yuv_mode", False):
        from deft_tpu.inference.runner import pack_yuv420
        warps = [pack_yuv420(w) for w in warps]
    if getattr(runner, "_delta_mode", False):
        warps = [warps[0]] + [warps[i] - warps[i - 1]
                              for i in range(1, len(warps))]

    def probe_upload(host_arr, reps):
        jax.device_get(force(jax.device_put(host_arr)))   # warm
        ts = []
        for i in range(reps):
            a = host_arr.copy()
            a.ravel()[0] = i
            td = time.time()
            jax.device_get(force(jax.device_put(a)))
            ts.append(time.time() - td)
        t = sorted(ts)[len(ts) // 2]
        return t * 1000.0, host_arr.nbytes / 1e6 / t

    frame_ms, frame_mbps = probe_upload(np.ascontiguousarray(warps[0]), n_dev)
    chunk_ms = chunk_mbps = None
    if runner.chunk > 1:
        chunk_ms, chunk_mbps = probe_upload(np.stack(warps), 3)

    # ---- true per-frame device time by differential timing: one synchronous
    # frame_chunk dispatch computes `chunk` frames but pays the same relay
    # round trip as one frame_step dispatch, so
    #   dev = (t_chunk - t_single) / (chunk - 1)
    # cancels the relay RTT.  This is THE device_ms of record (VERDICT r3
    # #8: one methodology); a jax.profiler trace cross-checks it when the
    # relay permits (--profile).
    thresh = jnp.float32(cfg.out_thresh)
    bufs = []
    for i in range(min(len(warps), 3)):
        b = jax.device_put(np.ascontiguousarray(warps[i]))
        jax.device_get(force(b))
        bufs.append(b)
    outs = runner._step(det.variables, bufs[0], runner.state, thresh,
                        None, probe_wtf)
    jax.block_until_ready(outs)
    state = outs[2]

    device_ms = None
    if runner.chunk > 1:
        frames_t = tuple(bufs[i % len(bufs)] for i in range(runner.chunk))
        c_out = runner._step_chunk(det.variables, frames_t, state, thresh,
                                   None, probe_wtf)
        jax.block_until_ready(c_out)
        state = c_out[2]
        t1s, tcs = [], []
        for i in range(n_dev):
            td = time.time()
            outs = runner._step(det.variables, bufs[i % len(bufs)], state,
                                thresh, None, probe_wtf)
            jax.block_until_ready(outs)
            t1s.append(time.time() - td)
            state = outs[2]
            td = time.time()
            c_out = runner._step_chunk(det.variables, frames_t, state,
                                       thresh, None, probe_wtf)
            jax.block_until_ready(c_out)
            tcs.append(time.time() - td)
            state = c_out[2]
        t1 = sorted(t1s)[len(t1s) // 2]
        tc = sorted(tcs)[len(tcs) // 2]
        device_ms = max((tc - t1) / (runner.chunk - 1) * 1000.0, 0.01)

    # MFU: XLA's own flop count / the differential device time / chip peak
    mfu = None
    try:
        lowered = runner._step.lower(det.variables, bufs[0], state, thresh,
                                     None, probe_wtf)
        cost = lowered.compile().cost_analysis()
        flops = float((cost or {}).get("flops", 0.0))
        plat = jax.devices()[0].platform
        peak = 197e12 if plat == "tpu" else 1e12  # v5e bf16 peak; CPU nominal
        if flops > 0 and device_ms and device_ms > 0.2:
            mfu = flops / (device_ms / 1000.0) / peak
    except Exception:
        pass

    # ---- e2e attribution from the measured run itself (main-thread wall
    # buckets sum to ~e2e; worker-side stages overlap and are informative) --
    e2e_ms = elapsed / frames * 1000.0
    main_keys = runner.main_keys()
    attributed = sum(buckets.get(k, 0.0) for k in main_keys)
    unattributed = e2e_ms - attributed

    out = {
        "metric": "e2e_mot17_tracking_fps_per_chip",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 3),
        "wire_rtt_ms": round(wire_rtt, 1),
        "wire_frame_up_ms": round(frame_ms, 1),
        "wire_frame_up_mbps": round(frame_mbps, 1),
        "e2e_ms_per_frame": round(e2e_ms, 1),
        "unattributed_ms_per_frame": round(unattributed, 1),
    }
    if chunk_mbps is not None:
        out["wire_chunk_up_ms"] = round(chunk_ms, 1)
        out["wire_chunk_up_mbps"] = round(chunk_mbps, 1)
    if device_ms is not None:
        out["device_ms"] = round(device_ms, 2)
    if mfu is not None:
        out["mfu"] = round(mfu, 4)
    for k in main_keys:
        if buckets.get(k):
            out[f"t_{k}_ms"] = round(buckets[k], 1)
    for k in ("upload_wire", "chain_dispatch", "fetch_wait", "cascade",
              "casc_post", "casc_desims", "casc_track"):
        if k not in main_keys and buckets.get(k):
            out[f"t_{k}_ms"] = round(buckets[k], 1)
    print(json.dumps(out))
    print(f"# frames={frames} elapsed={elapsed:.2f}s tracks/frame={n_tracks:.1f} "
          f"dtype={dtype} pipeline_depth={runner.depth} chunk={runner.chunk} "
          f"sim_window={runner.sim_window} stacked={runner.stacked} "
          f"force_resident={runner.force_resident} "
          f"upload_parallel={runner.upload_parallel} "
          f"runs_fps={[round(f, 2) for f in fps_runs]}", file=sys.stderr)
    if tune_scores:
        print(f"# auto_tune fps: " + ", ".join(
            f"{k}={v:.2f}" for k, v in tune_scores.items()), file=sys.stderr)
    bstr = " + ".join(f"{k} {buckets.get(k, 0.0):.1f}" for k in main_keys
                      if buckets.get(k))
    ostr = ", ".join(
        f"{k} {buckets.get(k, 0.0):.1f}"
        for k in ("upload_wire", "chain_dispatch", "fetch_wait", "cascade",
                  "casc_post", "casc_desims", "casc_track")
        if k not in main_keys and buckets.get(k))
    print(f"# e2e attribution (median run, main-thread wall): {bstr} "
          f"= {attributed:.1f} of {e2e_ms:.1f} ms/frame "
          f"(unattributed {unattributed:.1f}); worker-side overlap: {ostr} "
          f"ms/frame; wire probe: rtt {wire_rtt:.1f} ms, "
          f"frame {frame_mbps:.1f} MB/s"
          + (f", chunk {chunk_mbps:.1f} MB/s" if chunk_mbps else ""),
          file=sys.stderr)


if __name__ == "__main__":
    main()
