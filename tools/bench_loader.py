#!/usr/bin/env python
"""Input-pipeline throughput: DataLoader samples/s vs train-step demand.

VERDICT r2 #5: prove the host loader can feed a real mesh at production
shapes (544x960, batch 32).  Generates a synthetic MOT set at full frame
size, measures (a) raw DataLoader samples/s across worker counts and
(b) the jitted train-step time at the same batch on the available devices,
then reports whether the loader out-runs the device.

Usage:
  python tools/bench_loader.py [--h 544 --w 960] [--batch 32] [--steps 8]
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/bench_loader.py --skip-step   # loader only, CPU
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=544)
    ap.add_argument("--w", type=int, default=960)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--workers", type=str, default="1,4,8,16")
    ap.add_argument("--skip-step", action="store_true")
    ap.add_argument("--data_dir", type=str, default="",
                    help="reuse an existing converted MOT dir")
    args = ap.parse_args()

    from deft_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    # ---- data ---------------------------------------------------------------
    if args.data_dir:
        mot_dir = args.data_dir
    else:
        tmp = tempfile.mkdtemp(prefix="bench_loader_")
        mot_dir = os.path.join(tmp, "mot17")
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from convert_mot_to_coco import convert
        from make_synthetic_mot import make_sequence

        # frames at production size so cv2 decode+warp cost is realistic
        for i in range(2):
            make_sequence(os.path.join(mot_dir, "train"), f"SYN-{i+1:02d}",
                          n_frames=args.frames // 2, w=1920, h=1080,
                          n_obj=24, seed=i)
        convert(mot_dir, "train", half=False)

    from deft_tpu.config import mot_config
    from deft_tpu.data.datasets import get_dataset
    from deft_tpu.data.loader import DataLoader

    cfg = mot_config(input_h=args.h, input_w=args.w, dla_node="conv",
                     dataset_version="17trainval")
    ds = get_dataset("mot")(cfg, "train", data_dir=mot_dir)
    n = min(len(ds), args.frames)

    loader_rates = {}
    for nw in (int(x) for x in args.workers.split(",")):
        loader = DataLoader(ds, args.batch, num_workers=nw, seed=0)
        # warm one batch (file cache, lazy imports)
        next(iter(loader))
        t0 = time.time()
        count = 0
        for batch in loader:
            count += batch["image"].shape[0]
        dt = time.time() - t0
        loader_rates[nw] = count / dt
        print(f"# loader workers={nw}: {count} samples in {dt:.2f}s "
              f"-> {count / dt:.1f} samples/s", file=sys.stderr)

    out = {
        "metric": "loader_samples_per_s",
        "value": round(max(loader_rates.values()), 2),
        "unit": "samples/s",
        "per_workers": {str(k): round(v, 2) for k, v in loader_rates.items()},
        "shape": f"{args.h}x{args.w}",
        "batch": args.batch,
    }

    # ---- train-step demand --------------------------------------------------
    if not args.skip_step:
        import jax

        from deft_tpu.models import create_model, init_model
        from deft_tpu.parallel.mesh import make_mesh, shard_batch
        from deft_tpu.train.trainer import (
            create_train_state,
            make_optimizer,
            make_train_step,
        )

        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from train import _training_keys

        model = create_model(cfg.arch, cfg)
        params, bstats = init_model(model, cfg)
        tx = make_optimizer(cfg, 100)
        state = create_train_state(model, cfg, params, bstats)
        mesh = make_mesh()
        step_fn = make_train_step(model, cfg, tx, mesh)

        loader = DataLoader(ds, args.batch, num_workers=4, seed=0)
        batch = next(iter(loader))
        keys = _training_keys(batch, cfg)
        batch = shard_batch({k: batch[k] for k in keys}, mesh)
        state, stats = step_fn(state, batch)          # compile
        jax.block_until_ready(stats)
        t0 = time.time()
        for _ in range(args.steps):
            state, stats = step_fn(state, batch)
        jax.block_until_ready(stats)
        step_s = (time.time() - t0) / args.steps
        demand = args.batch / step_s
        out["train_step_s"] = round(step_s, 4)
        out["train_samples_per_s"] = round(demand, 2)
        out["loader_bound"] = bool(max(loader_rates.values()) < demand)
        print(f"# train step {step_s * 1000:.1f} ms at batch {args.batch} on "
              f"{mesh} -> device demand {demand:.1f} samples/s",
              file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
