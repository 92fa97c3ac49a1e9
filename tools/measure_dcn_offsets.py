#!/usr/bin/env python
"""Measure per-layer DCN offset distributions of a trained checkpoint
(VERDICT r3 #3: shrink each layer's static clamp radius to what the trained
model actually uses -- the pallas product space is (2r+5)^2, so r=2 instead
of 4 cuts it ~2.1x with zero numerical effect when offsets stay inside).

Captures every ``conv_offset_mask`` output (the DCNv2 offset/mask conv,
models/dcn.py:103-113) via flax capture_intermediates while running real
frames, and reports |dy|/|dx| max and percentiles per layer plus the
smallest exact radius (ceil of the observed max).

Usage:
  python tools/measure_dcn_offsets.py --load_model exp/tracking/e2e/model_last \
      --input_h 544 --input_w 960 [--frames 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--load_model", required=True)
    ap.add_argument("--input_h", type=int, default=544)
    ap.add_argument("--input_w", type=int, default=960)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--arch", default="dla_34")
    ap.add_argument("--images", default="",
                    help="directory of real frames (png/jpg) to probe with "
                         "instead of synthetic noise; frames are resized to "
                         "input_h x input_w")
    args = ap.parse_args()

    import jax.numpy as jnp

    from deft_tpu.config import mot_config
    from deft_tpu.models import create_model
    from deft_tpu.train.checkpoint import load_checkpoint

    cfg = mot_config(input_h=args.input_h, input_w=args.input_w,
                     dla_node="dcn", arch=args.arch)
    model = create_model(cfg.arch, cfg)
    variables = load_checkpoint(args.load_model, model, cfg)

    rng = np.random.RandomState(0)
    real_paths = []
    if args.images:
        import glob as _glob

        for ext in ("*.png", "*.jpg", "*.jpeg"):
            real_paths += _glob.glob(os.path.join(args.images, "**", ext),
                                     recursive=True)
        real_paths.sort()
        if not real_paths:
            raise SystemExit(f"no images under {args.images}")
        # spread probes across the directory instead of the first N frames
        step = max(len(real_paths) // args.frames, 1)
        real_paths = real_paths[::step][: args.frames]
        print(f"# probing {len(real_paths)} real frames from {args.images}")

    stats = {}
    for t in range(args.frames):
        if real_paths:
            import cv2

            img = cv2.imread(real_paths[t % len(real_paths)])
            img = cv2.resize(img, (args.input_w, args.input_h))
        else:
            # natural-ish frames: smooth low-frequency content + texture
            # noise
            base = rng.normal(0, 1, (args.input_h // 8, args.input_w // 8, 3))
            img = np.kron(base, np.ones((8, 8, 1)))
            img = img + rng.normal(0, 0.3, img.shape)
            img = ((img - img.min()) / (np.ptp(img) + 1e-6)
                   * 255).astype(np.uint8)
        # img2feats feeds the trunk directly (no _maybe_normalize), so apply
        # the standard input normalization here (models/deft.py:278-286)
        mean = np.array([0.40789654, 0.44719302, 0.47026115], np.float32)
        std = np.array([0.28863828, 0.27408164, 0.27809835], np.float32)
        x = jnp.asarray((img.astype(np.float32) / 255.0 - mean) / std)[None]

        _, inter = model.apply(
            variables, x, method="img2feats",
            capture_intermediates=lambda mdl, name:
                getattr(mdl, "name", "") == "conv_offset_mask",
        )

        def walk(tree, path=""):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    yield from walk(v, f"{path}/{k}")
            elif isinstance(tree, tuple):
                for v in tree:
                    yield path, v
            else:
                yield path, tree

        for path, om in walk(inter.get("intermediates", {})):
            om = np.asarray(om, np.float32)
            kk = om.shape[-1] // 3
            offs = om[..., : 2 * kk]
            key = path.replace("/__call__", "")
            s = stats.setdefault(key, {"shape": list(om.shape), "absmax": 0.0,
                                       "p999": [], "p99": []})
            a = np.abs(offs)
            s["absmax"] = max(s["absmax"], float(a.max()))
            s["p999"].append(float(np.percentile(a, 99.9)))
            s["p99"].append(float(np.percentile(a, 99.0)))

    out = []
    for key, s in sorted(stats.items()):
        out.append({
            "layer": key,
            "fmap": s["shape"][1:3],
            "absmax": round(s["absmax"], 3),
            "p99.9": round(float(np.mean(s["p999"])), 3),
            "p99": round(float(np.mean(s["p99"])), 3),
            "exact_radius": int(np.ceil(s["absmax"])),
        })
        print(json.dumps(out[-1]))
    if out:
        rmax = max(o["exact_radius"] for o in out)
        print(f"# smallest exact global radius for this checkpoint: {rmax}")
        # ready-to-paste per-layer override flag (models/factory.py
        # parse_layer_radii): pattern = module path of the DCN layer,
        # radius = smallest exact clamp observed.  Layers already at the
        # default radius are omitted.
        radii = {}
        for o in out:
            pat = o["layer"].lstrip("/")
            if pat.endswith("/conv_offset_mask"):
                pat = pat[: -len("/conv_offset_mask")]
            if o["exact_radius"] < 4:
                radii[pat] = max(o["exact_radius"], 1)
        if radii:
            print(f"# --dcn_layer_radii '{json.dumps(radii)}'")


if __name__ == "__main__":
    main()
