"""Plain COCO detection dataset (``.../datasets/coco.py``)."""

from __future__ import annotations

import json
import os

from deft_tpu.data.generic_dataset import GenericDataset


class CocoDataset(GenericDataset):
    default_resolution = (512, 512)
    num_categories = 80
    max_objs = 128

    def __init__(self, cfg, split, data_dir=None):
        data_dir = data_dir or os.path.join("data", "coco")
        img_dir = os.path.join(data_dir, f"{split}2017")
        ann_path = os.path.join(
            data_dir, "annotations", f"instances_{split}2017.json"
        )
        super().__init__(cfg, split, ann_path, img_dir)
        cat_ids = sorted(self.coco.cats.keys())
        self.cat_ids = {cid: i + 1 for i, cid in enumerate(cat_ids)}
        self.class_name = tuple(
            self.coco.cats[cid]["name"] for cid in cat_ids
        )

    def convert_eval_format(self, all_bboxes):
        """COCO results json (category-id mapped back)."""
        inv = {v: k for k, v in self.cat_ids.items()}
        detections = []
        for image_id, dets in all_bboxes.items():
            for item in dets:
                b = item["bbox"]
                detections.append({
                    "image_id": int(image_id),
                    "category_id": inv[int(item["class"])],
                    "bbox": [float(b[0]), float(b[1]),
                             float(b[2] - b[0]), float(b[3] - b[1])],
                    "score": float(f"{item['score']:.2f}"),
                })
        return detections

    def save_results(self, results, save_dir):
        os.makedirs(save_dir, exist_ok=True)
        path = os.path.join(save_dir, "results_coco.json")
        with open(path, "w") as f:
            json.dump(self.convert_eval_format(results), f)
        return path

    def run_eval(self, results, save_dir):
        """Save the results json and compute the COCO 12-metric summary with
        the bundled evaluator (reference coco.py runs pycocotools COCOeval;
        tools/eval_coco.py reimplements that protocol)."""
        self.save_results(results, save_dir)
        from tools.eval_coco import evaluate, print_summary

        stats = evaluate(self.coco, self.convert_eval_format(results))
        print_summary(stats)
        return stats


class CustomDataset(GenericDataset):
    """User-provided COCO-format dataset (``.../datasets/custom_dataset.py``)."""

    def __init__(self, cfg, split, data_dir=None):
        assert cfg.custom_dataset_img_path and cfg.custom_dataset_ann_path, (
            "custom dataset needs custom_dataset_img_path and "
            "custom_dataset_ann_path"
        )
        self.num_categories = cfg.num_classes if cfg.num_classes > 0 else 1
        self.class_name = tuple(str(i) for i in range(self.num_categories))
        self.default_resolution = (cfg.input_h, cfg.input_w)
        self.cat_ids = {i: i for i in range(1, self.num_categories + 1)}
        super().__init__(cfg, split, cfg.custom_dataset_ann_path,
                         cfg.custom_dataset_img_path)

    def run_eval(self, results, save_dir):
        raise NotImplementedError("custom datasets have no bundled evaluator")
