"""MOT16/17 tracking dataset (``/root/reference/src/lib/dataset/datasets/mot.py``)."""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np

from deft_tpu.data.generic_dataset import GenericDataset


class MOTDataset(GenericDataset):
    num_categories = 1
    default_resolution = (544, 960)
    class_name = ("",)
    max_objs = 256
    cat_ids = {1: 1, -1: -1}

    def __init__(self, cfg, split, data_dir=None):
        self.dataset_version = cfg.dataset_version
        self.year = int(self.dataset_version[:2]) if self.dataset_version else 17
        data_dir = data_dir or os.path.join("data", f"mot{self.year}")
        ann_file = {
            "17halftrain": "train_half.json",
            "17halfval": "val_half.json",
            "15halftrain": "train_half.json",
            "15halfval": "val_half.json",
        }.get(self.dataset_version,
              "train.json" if split == "train" else "test.json")
        img_dir = os.path.join(
            data_dir, "test" if "test" in self.dataset_version else "train"
        )
        ann_path = os.path.join(data_dir, "annotations", ann_file)
        super().__init__(cfg, split, ann_path, img_dir)

    def save_results(self, results, save_dir):
        """MOT txt writer with track renumbering (mot.py:74-110)."""
        results_dir = os.path.join(save_dir, f"results_mot{self.dataset_version}")
        os.makedirs(results_dir, exist_ok=True)
        for video in self.coco.dataset["videos"]:
            out_path = os.path.join(results_dir, f"{video['file_name']}.txt")
            tracks = defaultdict(list)
            for image_info in self.video_to_images[video["id"]]:
                if image_info["id"] not in results:
                    continue
                for item in results[image_info["id"]]:
                    if item.get("active", 1) == 0:
                        continue
                    tid = item.get("tracking_id", np.random.randint(100000))
                    b = item["bbox"]
                    tracks[tid].append([image_info["frame_id"], b[0], b[1], b[2], b[3]])
            with open(out_path, "w") as f:
                for new_id, tid in enumerate(sorted(tracks), start=1):
                    for t in tracks[tid]:
                        f.write(
                            f"{t[0]},{new_id},{t[1]:.2f},{t[2]:.2f},"
                            f"{t[3] - t[1]:.2f},{t[4] - t[2]:.2f},-1,-1,-1,-1\n"
                        )
        return results_dir

    def run_eval(self, results, save_dir, gt_dir=None):
        """Evaluate with the bundled CLEAR-MOT evaluator (tools/eval_mot.py),
        replacing the reference's shell-out to py-motmetrics."""
        results_dir = self.save_results(results, save_dir)
        from tools.eval_mot import evaluate_mot_dir

        gt_type = ""
        if "17halftrain" in self.dataset_version:
            gt_type = "_train_half"
        elif "17halfval" in self.dataset_version or self.year in (16, 19):
            gt_type = "_val_half"
        if gt_dir is None:
            gt_dir = os.path.join("data", f"mot{self.year}", "train")
        return evaluate_mot_dir(gt_dir, results_dir, gt_type=gt_type)
