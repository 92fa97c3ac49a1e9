"""End-to-end tracking benchmark.

Measures the full per-frame MOT17 pipeline on the available accelerator:
host preprocess (affine warp + normalize) -> jitted detect program (DLA-34
forward, sigmoid, decode top-100, AFE embedding gather) -> host post-process
-> ring-buffer similarity -> association cascade.  Prints ONE JSON line; the
baseline target is 60 FPS/chip (BASELINE.md).

Usage: python bench.py [--smoke] [--frames N]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def make_synthetic_frame(t, h, w, n_obj=12, seed=0):
    """Deterministic moving-squares frame (uint8 BGR) with n_obj objects."""
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
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--warmup", type=int, default=10)
    args = ap.parse_args()

    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from deft_tpu.config import mot_config
    from deft_tpu.inference.detector import Detector

    # track_thresh is dropped so that (with an untrained net) all K=100
    # candidates flow through post-processing and the association cascade --
    # a max-load, conservative FPS (MOT17 frames average ~30 detections).
    if args.smoke:
        cfg = mot_config(input_h=128, input_w=160, dla_node="conv",
                         track_thresh=1e-3)
        frames = 12
        warmup = 3
    else:
        cfg = mot_config(track_thresh=1e-3)  # 544x960, dcn nodes, K=100
        frames = args.frames
        warmup = args.warmup

    det = Detector(cfg)
    det.img_height, det.img_width = 1080, 1920
    det.reset_tracking()

    fh, fw = (270, 480) if args.smoke else (1080, 1920)

    # warmup (compile)
    for t in range(warmup):
        det.run(make_synthetic_frame(t, fh, fw))

    det.timers.reset()
    t0 = time.time()
    n_tracks = 0
    for t in range(frames):
        online = det.run(make_synthetic_frame(t, fh, fw))
        n_tracks += len(online)
    elapsed = time.time() - t0

    fps = frames / elapsed
    result = {
        "metric": "e2e_mot17_tracking_fps_per_chip",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 3),
    }
    print(json.dumps(result))
    print(f"# stages: {det.timers.summary()}  tracks/frame: "
          f"{n_tracks / max(frames, 1):.1f}", file=sys.stderr)


if __name__ == "__main__":
    main()
