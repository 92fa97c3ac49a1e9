"""Alias module: CustomDataset lives beside CocoDataset."""
from deft_tpu.data.datasets.coco_det import CustomDataset  # noqa: F401
