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

    # --test short-circuits straight to evaluation of the loaded checkpoint
    # through the full tracking test flow + dataset.run_eval (reference
    # train.py:68-71 routes through trainer.val + run_eval; here the bundled
    # test entry point IS that surface, with real tracking metrics)
    if cfg.test:
        return _run_tracking_eval(argv, cfg)

    import jax

    from deft_tpu.data.datasets import get_dataset
    from deft_tpu.data.loader import DataLoader
    from deft_tpu.models import create_model, init_model
    from deft_tpu.parallel.mesh import make_mesh, shard_batch
    from deft_tpu.train import checkpoint as ckpt
    from deft_tpu.train.trainer import (
        create_train_state,
        loss_and_updates,
        make_eval_step,
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
            state, start_epoch = ckpt.load_train_state(
                path, state, steps_per_epoch)
            logger.write(f"resumed from {path} at epoch {start_epoch} "
                         f"(step {int(state.step)})")

    # periodic validation (reference train.py:104-107): val losses every
    # val_intervals epochs through the jitted eval step
    val_loader = None
    eval_fn = None
    mesh = make_mesh()
    if 0 < cfg.val_intervals <= cfg.num_epochs:
        try:
            val_ds = dataset_cls(cfg, "val", data_dir=os.path.join(
                extras["data_dir"], _dataset_dirname(cfg)))
            val_loader = DataLoader(val_ds, cfg.batch_size, shuffle=False,
                                    num_workers=extras["num_workers"])
            eval_fn = make_eval_step(model, cfg, mesh)
        except (FileNotFoundError, KeyError) as e:
            logger.write(f"no val split available ({e}); skipping periodic val")

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
            state.batch_stats, opt_state=state.opt_state, epoch=epoch,
            step=int(state.step),
            extra={"s_det": state.s_det, "s_id": state.s_id},
        )
        if cfg.save_all or epoch in cfg.save_point or epoch in cfg.lr_step:
            ckpt.save_checkpoint(
                os.path.join(cfg.save_dir, f"model_{epoch}"), state.params,
                state.batch_stats, epoch=epoch,
                extra={"s_det": state.s_det, "s_id": state.s_id},
            )
        if (val_loader is not None and cfg.val_intervals > 0
                and epoch % cfg.val_intervals == 0):
            vagg = {}
            for batch in val_loader:
                batch = {k: batch[k] for k in (batch_keys or
                                               _training_keys(batch, cfg))}
                batch = shard_batch(batch, mesh)
                vstats = eval_fn(state, batch)
                for k, v in vstats.items():
                    vagg.setdefault(k, []).append(float(v))
            vmsg = " ".join(f"{k} {np.mean(v):.4f}"
                            for k, v in sorted(vagg.items()))
            logger.write(f"epoch {epoch} VAL {vmsg}")
            for k, v in vagg.items():
                logger.scalar_summary(f"val_{k}", float(np.mean(v)), epoch)
    logger.write("training done")
    logger.close()

    # --eval_val: end with the real tracking metrics table
    # (MOTA/IDF1/... via dataset.run_eval, reference train.py:106-107)
    if cfg.eval_val:
        return _run_tracking_eval(argv, cfg)


def _run_tracking_eval(argv, cfg):
    """Route the current checkpoint through the full test flow (tracking
    inference + dataset.run_eval).  This is train.py's --test / --eval_val
    evaluation surface."""
    import importlib.util
    import sys

    args = list(argv) if argv is not None else list(sys.argv[1:])
    if not cfg.load_model:
        args += ["--load_model", os.path.join(cfg.save_dir, "model_last")]
    spec = importlib.util.spec_from_file_location(
        "_deft_test_entry",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "test.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.main(args)


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
