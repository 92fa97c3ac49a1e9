"""KITTI tracking dataset (``.../datasets/kitti_tracking.py``)."""

from __future__ import annotations

import os

from deft_tpu.data.generic_dataset import GenericDataset


class KITTITrackingDataset(GenericDataset):
    num_categories = 3
    default_resolution = (384, 1280)
    class_name = ("Pedestrian", "Car", "Cyclist")
    cat_ids = {1: 1, 2: 2, 3: 3, 4: -2, 5: -2, 6: -1, 7: -9999, 8: -9999, 9: 0}
    max_objs = 50

    def __init__(self, cfg, split, data_dir=None):
        data_dir = data_dir or os.path.join("data", "kitti_tracking")
        split_ = "train" if cfg.dataset_version != "test" else "test"
        img_dir = os.path.join(
            data_dir, "data_tracking_image_2", f"{split_}ing", "image_02"
        )
        ann_file = split_ if cfg.dataset_version == "" else cfg.dataset_version
        ann_path = os.path.join(data_dir, "annotations", f"tracking_{ann_file}.json")
        super().__init__(cfg, split, ann_path, img_dir)
        self.alpha_in_degree = False

    def save_results(self, results, save_dir):
        """KITTI-format txt writer (kitti_tracking.py:55-119): one line per
        detection: frame track_id type -1 -1 alpha x1 y1 x2 y2 h w l x y z
        rot_y score."""
        results_dir = os.path.join(save_dir, "results_kitti_tracking")
        os.makedirs(results_dir, exist_ok=True)
        for video in self.coco.dataset["videos"]:
            out_path = os.path.join(results_dir, f"{video['file_name']}.txt")
            with open(out_path, "w") as f:
                for image_info in self.video_to_images[video["id"]]:
                    img_id = image_info["id"]
                    if img_id not in results:
                        continue
                    frame_id = image_info["frame_id"]
                    for item in results[img_id]:
                        cname = self.class_name[item["class"] - 1]
                        alpha = item.get("alpha", -1)
                        rot_y = item.get("rot_y", -10)
                        dim = item.get("dim", [-1, -1, -1])
                        if "dim" in item:
                            dim = [max(d, 0.01) for d in item["dim"]]
                        loc = item.get("loc", [-1000, -1000, -1000])
                        tid = item.get("tracking_id", -1)
                        b = item["bbox"]
                        f.write(
                            f"{frame_id - 1} {tid} {cname} -1 -1 {int(alpha):d}"
                            f" {b[0]:.2f} {b[1]:.2f} {b[2]:.2f} {b[3]:.2f}"
                            f" {int(dim[0]):d} {int(dim[1]):d} {int(dim[2]):d}"
                            f" {int(loc[0]):d} {int(loc[1]):d} {int(loc[2]):d}"
                            f" {int(rot_y):d} {item['score']:.2f}\n"
                        )
        return results_dir

    def run_eval(self, results, save_dir, gt_dir=None):
        """Evaluate with the bundled KITTI-style CLEAR-MOT evaluator
        (the reference shells out to a script it does not ship,
        kitti_tracking.py:121-126; we evaluate with tools/eval_mot.py over
        converted sequences)."""
        results_dir = self.save_results(results, save_dir)
        from tools.eval_kitti import evaluate_kitti_dir

        if gt_dir is None:
            gt_dir = os.path.join("data", "kitti_tracking", "label_02")
        return evaluate_kitti_dir(gt_dir, results_dir)
