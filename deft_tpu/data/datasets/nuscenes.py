"""nuScenes monocular 3-D tracking dataset (``.../datasets/nuscenes.py``)."""

from __future__ import annotations

import json
import os

import numpy as np

from deft_tpu.data.datasets import NUSCENES_INFO
from deft_tpu.data.generic_dataset import GenericDataset
from deft_tpu.inference.geometry import Quaternion, camera_box_to_global


class NuScenesDataset(GenericDataset):
    default_resolution = (448, 800)
    num_categories = 10
    class_name = NUSCENES_INFO.class_name
    cat_ids = {i + 1: i + 1 for i in range(10)}
    focal_length = 1200
    max_objs = 128
    _tracking_ignored_class = ("construction_vehicle", "traffic_cone", "barrier")
    _vehicles = ("car", "truck", "bus", "trailer", "construction_vehicle")
    _cycles = ("motorcycle", "bicycle")
    _pedestrians = ("pedestrian",)
    attribute_to_id = NUSCENES_INFO.attribute_to_id
    id_to_attribute = {v: k for k, v in NUSCENES_INFO.attribute_to_id.items()}

    def __init__(self, cfg, split, data_dir=None):
        data_dir = data_dir or os.path.join("data", "nuscenes")
        if cfg.dataset_version == "test" or split == "test":
            ann_path = os.path.join(data_dir, "annotations", "test.json")
            img_dir = os.path.join(data_dir, "v1.0-test")
        else:
            ann_path = os.path.join(
                data_dir, "annotations", f"{cfg.dataset_version}{split}.json"
            )
            img_dir = os.path.join(data_dir, "v1.0-trainval")
        self.data_dir = data_dir
        self.version = ("v1.0-test" if cfg.dataset_version == "test"
                        or split == "test" else "v1.0-trainval")
        super().__init__(cfg, split, ann_path, img_dir)

    def convert_eval_format(self, results):
        """Build the nuScenes tracking/detection submission
        (nuscenes.py:120-260): per-image camera->global transforms, attribute
        argmax by class family, velocity transform, 500-cap per sample."""
        ret = {
            "meta": {
                "use_camera": True, "use_lidar": False, "use_radar": False,
                "use_map": False, "use_external": False,
            },
            "results": {},
        }
        for image_id, dets in results.items():
            image_info = self.coco.load_img(image_id)
            sample_token = image_info["sample_token"]
            trans_matrix = np.array(image_info["trans_matrix"], np.float64)
            sensor_id = image_info.get("sensor_id", 1)
            sample_results = []
            for item in dets:
                class_name = (
                    self.class_name[int(item["class"] - 1)]
                    if "class" in item else item["detection_name"]
                )
                if self.cfg.tracking and class_name in self._tracking_ignored_class:
                    continue
                score = float(item["score"]) if "score" in item else float(
                    item["detection_score"]
                )
                if "size" in item:
                    size = list(item["size"])
                else:
                    size = [float(item["dim"][1]), float(item["dim"][2]),
                            float(item["dim"][0])]
                if "translation" in item:
                    translation = item["translation"]
                else:
                    translation = trans_matrix @ np.array(
                        [item["loc"][0], item["loc"][1] - size[2],
                         item["loc"][2], 1], np.float64,
                    )
                if "rotation" in item:
                    rotation = item["rotation"]
                else:
                    box = camera_box_to_global(
                        item["loc"], size, item["rot_y"],
                        image_info["cs_record_rot"], image_info["cs_record_trans"],
                        image_info["pose_record_rot"], image_info["pose_record_trans"],
                    )
                    q = box.orientation
                    rotation = [float(q.w), float(q.x), float(q.y), float(q.z)]

                att = item.get("attribute_name")
                if att is None:
                    natt = np.array(item.get("nuscenes_att", np.zeros(8)), np.float32)
                    att = ""
                    if class_name in self._cycles:
                        att = self.id_to_attribute[int(np.argmax(natt[0:2])) + 1]
                    elif class_name in self._pedestrians:
                        att = self.id_to_attribute[int(np.argmax(natt[2:5])) + 3]
                    elif class_name in self._vehicles:
                        att = self.id_to_attribute[int(np.argmax(natt[5:8])) + 6]

                vel = item.get("velocity", [0, 0, 0])
                if len(vel) != 2:
                    v = trans_matrix @ np.array(
                        [vel[0], vel[1], vel[2], 0], np.float64
                    )
                    vel = [float(v[0]), float(v[1])]

                sample_results.append({
                    "sample_token": sample_token,
                    "translation": [float(translation[0]), float(translation[1]),
                                    float(translation[2])],
                    "size": [float(s) for s in size],
                    "rotation": rotation,
                    "velocity": vel,
                    "detection_name": class_name,
                    "attribute_name": att,
                    "detection_score": score,
                    "tracking_name": class_name,
                    "tracking_score": score,
                    "tracking_id": item.get("tracking_id", 1),
                    "sensor_id": sensor_id,
                    "det_id": item.get("det_id", -1),
                })
            ret["results"].setdefault(sample_token, []).extend(sample_results)

        for sample_token, dets in ret["results"].items():
            order = sorted(range(len(dets)),
                           key=lambda i: -dets[i]["detection_score"])
            ret["results"][sample_token] = [dets[i] for i in order[:500]]
        return ret

    def save_results(self, results, save_dir, task="tracking"):
        os.makedirs(save_dir, exist_ok=True)
        out = os.path.join(save_dir, f"results_nuscenes_{task}.json")
        with open(out, "w") as f:
            json.dump(self.convert_eval_format(results), f)
        return out

    def run_eval(self, results, save_dir):
        """Writes the submission json and, when the raw v1.0 schema tables
        are present, computes AMOTA/AMOTP/MOTAR locally via the bundled
        devkit-free evaluator (the reference shells out to devkit evaluators
        it does not ship, nuscenes.py:269-294)."""
        task = "tracking" if self.cfg.tracking else "det"
        out = self.save_results(results, save_dir, task)
        tables = os.path.join(self.data_dir, self.version, "scene.json")
        if task == "tracking" and os.path.exists(tables):
            try:
                from tools.eval_nuscenes import (evaluate_submission,
                                                 format_table)
                res = evaluate_submission(out, self.data_dir, self.version)
                print(format_table(res))
            except Exception as e:             # eval is best-effort extra
                print(f"nuScenes local eval skipped: {e}")
        return out
