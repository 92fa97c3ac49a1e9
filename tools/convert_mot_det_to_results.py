#!/usr/bin/env python
"""Public detections (MOT det.txt) -> results json for --public_det mode.

Equivalent of the reference ``src/tools/convert_mot_det_to_results.py``: maps
each sequence's ``det/det.txt`` rows to the per-image detection-dict format
that ``test.py --public_det --load_results`` injects
(detector.py:193-198 semantics).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="data/mot17")
    ap.add_argument("--ann", default="annotations/val_half.json")
    ap.add_argument("--out", default="annotations/public_dets.json")
    args = ap.parse_args()

    with open(os.path.join(args.data_dir, args.ann)) as f:
        dataset = json.load(f)

    seq_of_video = {v["id"]: v["file_name"] for v in dataset["videos"]}
    results = {}
    det_cache = {}
    for im in dataset["images"]:
        seq = seq_of_video[im["video_id"]]
        if seq not in det_cache:
            path = os.path.join(args.data_dir, "train", seq, "det", "det.txt")
            det_cache[seq] = (np.loadtxt(path, delimiter=",", ndmin=2)
                              if os.path.exists(path) else np.zeros((0, 7)))
        rows = det_cache[seq]
        # frame ids in half-split jsons are renumbered; recover the raw frame
        # from the file name (img1/000123.jpg)
        raw_frame = int(os.path.basename(im["file_name"]).split(".")[0])
        sel = rows[rows[:, 0] == raw_frame] if len(rows) else rows
        dets = []
        for r in sel:
            dets.append({
                "bbox": [float(r[2]), float(r[3]),
                         float(r[2] + r[4]), float(r[3] + r[5])],
                "score": float(r[6]) if len(r) > 6 else 1.0,
                "class": 1,
                "ct": [float(r[2] + r[4] / 2), float(r[3] + r[5] / 2)],
            })
        results[str(im["id"])] = dets

    out_path = os.path.join(args.data_dir, args.out)
    with open(out_path, "w") as f:
        json.dump(results, f)
    print(f"wrote {out_path}: {len(results)} images")


if __name__ == "__main__":
    main()
