#!/usr/bin/env python
"""Synthetic KITTI-tracking-layout data (cars as moving squares) for
end-to-end pipeline testing: data_tracking_image_2/training/image_02/<seq>/
*.png, label_02/<seq>.txt, calib/<seq>.txt."""

from __future__ import annotations

import argparse
import os

import numpy as np


def make_sequence(root, seq, n_frames=30, w=512, h=160, n_obj=4, seed=0):
    import cv2

    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "data_tracking_image_2", "training",
                           "image_02", seq)
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(os.path.join(root, "label_02"), exist_ok=True)
    os.makedirs(os.path.join(root, "calib"), exist_ok=True)

    with open(os.path.join(root, "calib", f"{seq}.txt"), "w") as f:
        f.write("P2: 700.0 0.0 256.0 0.0 0.0 700.0 80.0 0.0 0.0 0.0 1.0 0.0\n")

    objs = []
    for i in range(n_obj):
        objs.append({
            "x": float(rng.randint(5, w // 3)), "y": float(rng.randint(10, h - 60)),
            "vx": float(rng.uniform(2.0, 6.0)), "w": float(rng.randint(30, 50)),
            "h": float(rng.randint(30, 50)),
            "color": tuple(int(c) for c in rng.randint(70, 255, 3)),
        })

    rows = []
    for f in range(n_frames):
        img = np.full((h, w, 3), 30, np.uint8)
        img[::13, :, 2] = 70
        for tid, o in enumerate(objs):
            x = o["x"] + o["vx"] * f
            if x + o["w"] >= w:
                continue
            x1, y1, x2, y2 = int(x), int(o["y"]), int(x + o["w"]), int(o["y"] + o["h"])
            img[y1:y2, x1:x2] = o["color"]
            img[y1:y2:3, x1:x2] = tuple(c // 2 for c in o["color"])
            rows.append(
                f"{f} {tid} Car 0 0 -1.5 {x1:.2f} {y1:.2f} {x2:.2f} {y2:.2f}"
                f" 1.5 1.7 4.0 {x1 / 50:.2f} 1.6 {20 + tid * 5:.2f} 1.2"
            )
        cv2.imwrite(os.path.join(img_dir, f"{f:06d}.png"), img)
    with open(os.path.join(root, "label_02", f"{seq}.txt"), "w") as fl:
        fl.write("\n".join(rows) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/kitti_tracking")
    ap.add_argument("--seqs", type=int, default=2)
    ap.add_argument("--frames", type=int, default=30)
    args = ap.parse_args()
    for i in range(args.seqs):
        make_sequence(args.out, f"{i:04d}", n_frames=args.frames, seed=i)
    print(f"synthetic KITTI data at {args.out}")


if __name__ == "__main__":
    main()
