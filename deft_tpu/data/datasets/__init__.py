"""Dataset registry: static per-dataset metadata + dataset class factory.

Mirrors the metadata constants on the reference dataset classes
(``/root/reference/src/lib/dataset/datasets/{mot,kitti_tracking,nuscenes,coco}.py``)
and the registry dicts in ``dataset_factory.py:16-34``.
"""

from __future__ import annotations

import numpy as np
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

# ImageNet-style normalization constants shared by every dataset
# (generic_dataset.py:66-72).
MEAN = np.array([0.40789654, 0.44719302, 0.47026115], dtype=np.float32)
STD = np.array([0.28863828, 0.27408164, 0.27809835], dtype=np.float32)

EIG_VAL = np.array([0.2141788, 0.01817699, 0.00341571], dtype=np.float32)
EIG_VEC = np.array(
    [
        [-0.58752847, -0.69563484, 0.41340352],
        [-0.5832747, 0.00994535, -0.81221408],
        [-0.56089297, 0.71832671, 0.41158938],
    ],
    dtype=np.float32,
)


@dataclass(frozen=True)
class DatasetInfo:
    name: str
    num_categories: int
    default_resolution: Tuple[int, int]   # (h, w)
    class_name: Tuple[str, ...]
    max_objs: int
    cat_ids: Dict[int, int]
    focal_length: int = 1200
    attribute_to_id: Dict[str, int] = field(default_factory=dict)


MOT_INFO = DatasetInfo(
    name="mot",
    num_categories=1,
    default_resolution=(544, 960),
    class_name=("",),
    max_objs=256,
    cat_ids={1: 1, -1: -1},
)

KITTI_TRACKING_INFO = DatasetInfo(
    name="kitti_tracking",
    num_categories=3,
    default_resolution=(384, 1280),
    class_name=("Pedestrian", "Car", "Cyclist"),
    max_objs=50,
    cat_ids={1: 1, 2: 2, 3: 3, 4: -2, 5: -2, 6: -1, 7: -9999, 8: -9999, 9: 0},
)

NUSCENES_INFO = DatasetInfo(
    name="nuscenes",
    num_categories=10,
    default_resolution=(448, 800),
    class_name=(
        "car", "truck", "bus", "trailer", "construction_vehicle",
        "pedestrian", "motorcycle", "bicycle", "traffic_cone", "barrier",
    ),
    max_objs=128,
    cat_ids={i + 1: i + 1 for i in range(10)},
    attribute_to_id={
        "": 0,
        "cycle.with_rider": 1,
        "cycle.without_rider": 2,
        "pedestrian.moving": 3,
        "pedestrian.standing": 4,
        "pedestrian.sitting_lying_down": 5,
        "vehicle.moving": 6,
        "vehicle.parked": 7,
        "vehicle.stopped": 8,
    },
)

COCO_INFO = DatasetInfo(
    name="coco",
    num_categories=80,
    default_resolution=(512, 512),
    class_name=tuple(f"class_{i}" for i in range(80)),
    max_objs=128,
    cat_ids={},  # filled by the COCO dataset class from the annotation file
)

CUSTOM_INFO = DatasetInfo(
    name="custom",
    num_categories=1,
    default_resolution=(512, 512),
    class_name=("object",),
    max_objs=128,
    cat_ids={1: 1},
)

_INFOS = {
    "mot": MOT_INFO,
    "kitti_tracking": KITTI_TRACKING_INFO,
    "nuscenes": NUSCENES_INFO,
    "coco": COCO_INFO,
    "custom": CUSTOM_INFO,
}

# nuScenes attribute-consistency ranges per class (generic_dataset.py:83-92)
NUSCENES_ATT_RANGE = {
    0: [0, 1], 1: [0, 1],
    2: [2, 3, 4], 3: [2, 3, 4], 4: [2, 3, 4],
    5: [5, 6, 7], 6: [5, 6, 7], 7: [5, 6, 7],
}

NUSCENES_TRACKING_CLASSES = (
    "car", "truck", "bus", "trailer", "pedestrian", "motorcycle", "bicycle",
)


def get_dataset_info(name: str) -> DatasetInfo:
    return _INFOS[name]


def get_dataset(name: str, prediction_model: bool = False):
    """Dataset class factory (dataset_factory.py:16-34)."""
    from deft_tpu.data import generic_dataset, trajectory_dataset
    if prediction_model:
        return trajectory_dataset.TrajectoryDataset
    from deft_tpu.data.datasets import mot, kitti_tracking, nuscenes, coco_det, custom
    table = {
        "mot": mot.MOTDataset,
        "kitti_tracking": kitti_tracking.KITTITrackingDataset,
        "nuscenes": nuscenes.NuScenesDataset,
        "coco": coco_det.CocoDataset,
        "custom": custom.CustomDataset,
    }
    return table[name]
