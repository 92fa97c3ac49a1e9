#!/usr/bin/env python
"""LSTM motion-model training entry point (reference: src/train_prediction.py).

  python train_prediction.py tracking --dataset mot --dataset_version \
      17halftrain --num_epochs 40 --lr 1e-3
"""

from __future__ import annotations

import os


def main(argv=None):
    from deft_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from deft_tpu.cli import parse_config
    from deft_tpu.data.trajectory_dataset import TrajectoryDataset
    from deft_tpu.train.prediction import train_motion_model
    from deft_tpu.utils.logger import Logger

    cfg, extras = parse_config(argv)
    logger = Logger(cfg)
    dataset = TrajectoryDataset(cfg, "train")
    os.makedirs(cfg.save_dir, exist_ok=True)
    train_motion_model(cfg, dataset, logger=logger, save_dir=cfg.save_dir)
    logger.close()


if __name__ == "__main__":
    main()
