#!/usr/bin/env python
"""Full-scale KITTI tracking soak: generate -> convert -> train -> test ->
evaluate, at realistic density (VERDICT r2 #7 / r3 #5: 384x1280, 300+
frames/seq, 50+ objects, spawn/despawn + crossings).

The fixture is generated AT RUN TIME by tools/make_synthetic_kitti.py --rich
(deterministic under --seed); nothing is committed to git (the round-3 50 MB
data/kitti_soak commit is reverted -- ADVICE r3).

Protocol: the half-video protocol the reference uses for MOT/KITTI ablations
(convert_kittitrack_to_coco emits train_half/val_half) -- train on the first
half of every sequence, track the second half, and evaluate against the GT
restricted to the val-half frames (so first-half GT does not count as
misses).

Usage:
  python tools/soak_kitti.py                     # full soak (TPU, ~30 min)
  python tools/soak_kitti.py --smoke             # tiny CPU correctness pass
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, **kw):
    print("+ " + " ".join(cmd), flush=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.run(cmd, check=True, cwd=REPO, env=env, **kw)


def write_val_half_gt(data_dir: str, out_dir: str):
    """GT restricted to each sequence's second half (frames > n//2),
    matching the val_half annotation split of convert_kittitrack_to_coco."""
    label_dir = os.path.join(data_dir, "label_02")
    img_root = os.path.join(data_dir, "data_tracking_image_2", "training",
                            "image_02")
    os.makedirs(out_dir, exist_ok=True)
    for fname in os.listdir(label_dir):
        seq = fname[:-4]
        n = len(os.listdir(os.path.join(img_root, seq)))
        keep = []
        with open(os.path.join(label_dir, fname)) as f:
            for line in f:
                parts = line.split()
                if parts and int(parts[0]) + 1 > n // 2:
                    keep.append(line)
        with open(os.path.join(out_dir, fname), "w") as f:
            f.writelines(keep)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes on CPU (pipeline correctness only)")
    ap.add_argument("--seqs", type=int, default=2)
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--objects", type=int, default=60)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--input_h", type=int, default=384)
    ap.add_argument("--input_w", type=int, default=1280)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--data_root", default=os.path.join(REPO, "data"),
                    help="fixture root (gitignored); the fixture lands in "
                         "<data_root>/kitti_tracking")
    ap.add_argument("--exp_id", default="kitti_soak")
    ap.add_argument("--keep_data", action="store_true",
                    help="reuse an existing generated fixture")
    ap.add_argument("--skip_train", action="store_true",
                    help="test+eval an already-trained model_last only "
                         "(resume after an interrupted training run)")
    args = ap.parse_args()

    if args.smoke:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        args.seqs, args.frames, args.objects = 1, 24, 8
        args.epochs, args.input_h, args.input_w = 2, 96, 320

    data_dir = os.path.join(args.data_root, "kitti_tracking")
    if not args.keep_data:
        if os.path.exists(data_dir):
            shutil.rmtree(data_dir)
        run([sys.executable, "tools/make_synthetic_kitti.py", "--rich",
             "--out", data_dir, "--seqs", str(args.seqs),
             "--frames", str(args.frames), "--objects", str(args.objects),
             "--seed", str(args.seed)])
        run([sys.executable, "tools/convert_kittitrack_to_coco.py",
             "--data_dir", data_dir])

    common = ["tracking", "--dataset", "kitti_tracking",
              "--exp_id", args.exp_id,
              "--data_dir", args.data_root,
              "--input_h", str(args.input_h), "--input_w", str(args.input_w)]
    if not args.skip_train:
        run([sys.executable, "train.py", *common,
             "--dataset_version", "train_half",
             "--batch_size", str(args.batch_size),
             "--num_epochs", str(args.epochs),
             "--lr_step", str(max(args.epochs * 3 // 4, 1)),
             "--num_workers", "2"])

    save_dir = os.path.join(REPO, "exp", "tracking", args.exp_id)
    run([sys.executable, "test.py", *common,
         "--dataset_version", "val_half",
         "--load_model", os.path.join(save_dir, "model_last"),
         "--track_thresh", "0.4"])

    # clean half-protocol eval: GT restricted to val-half frames
    gt_half = os.path.join(save_dir, "gt_val_half")
    write_val_half_gt(data_dir, gt_half)
    sys.path.insert(0, REPO)
    from tools.eval_kitti import evaluate_kitti_dir

    metrics = evaluate_kitti_dir(
        gt_half, os.path.join(save_dir, "results_kitti_tracking"))
    overall = metrics.get("overall", {})
    summary = {
        "soak": "kitti",
        "seqs": args.seqs, "frames_per_seq": args.frames,
        "objects": args.objects, "epochs": args.epochs,
        "res": f"{args.input_h}x{args.input_w}",
        "MOTA": round(overall.get("mota", 0.0) * 100, 2),
        "IDF1": round(overall.get("idf1", 0.0) * 100, 2),
        "IDS": overall.get("num_switches", -1),
        "Frag": overall.get("num_fragmentations", -1),
        "MT": overall.get("mostly_tracked", -1),
        "ML": overall.get("mostly_lost", -1),
    }
    print(json.dumps(summary))
    with open(os.path.join(save_dir, "soak_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
