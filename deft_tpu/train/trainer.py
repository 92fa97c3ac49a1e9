"""Training runtime: state, optimizer, jitted+sharded train step.

Replaces ``/root/reference/src/lib/trainer.py`` (Trainer/ModleWithLoss) and
``train.py``'s optimizer wiring.  One jitted ``train_step`` covers what the
reference does per iteration (two trunk passes + AFE + losses + backward +
Adam), compiled once over a data-sharded mesh; gradient all-reduce across
chips is emitted by XLA from the sharding specs (no DataParallel analog
needed -- SURVEY.md §2.2).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from deft_tpu.config import Config
from deft_tpu.models.deft import DEFTNet
from deft_tpu.train import losses as L


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # Kendall uncertainty weights (reference: s_det/s_id init to 1.0,
    # trainer.py:40-41)
    s_det: jnp.ndarray
    s_id: jnp.ndarray


def make_lr_schedule(cfg: Config, steps_per_epoch: int):
    """Step decay x0.1 at each lr_step epoch (train.py:123-127)."""
    boundaries = {int(e) * steps_per_epoch: 0.1 for e in cfg.lr_step}
    return optax.piecewise_constant_schedule(cfg.lr, boundaries)


def make_optimizer(cfg: Config, steps_per_epoch: int = 1000):
    sched = make_lr_schedule(cfg, steps_per_epoch)
    if cfg.optim == "adam":
        return optax.adam(sched)
    if cfg.optim == "sgd":
        return optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(sched, momentum=cfg.momentum),
        )
    raise ValueError(f"unknown optimizer {cfg.optim}")


def create_train_state(model: DEFTNet, cfg: Config, params, batch_stats,
                       steps_per_epoch: int = 1000) -> TrainState:
    tx = make_optimizer(cfg, steps_per_epoch)
    uncertainty = {"s_det": jnp.ones(()), "s_id": jnp.ones(())}
    opt_state = tx.init({"model": params, "uncertainty": uncertainty})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        s_det=uncertainty["s_det"],
        s_id=uncertainty["s_id"],
    )


def loss_and_updates(model: DEFTNet, cfg: Config, params, batch_stats,
                     s_det, s_id, batch: Dict[str, jnp.ndarray],
                     train: bool = True):
    """Forward + all losses; returns (total, (loss_stats, new_batch_stats))."""
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        (outputs, affinity), mutated = model.apply(
            variables,
            batch["image"],
            batch["pre_image"],
            batch["centers_pre"],
            batch["centers_next"],
            train=True,
            method="train_forward",
            mutable=["batch_stats"],
        )
        new_batch_stats = mutated["batch_stats"]
    else:
        outputs, affinity = model.apply(
            variables,
            batch["image"],
            batch["pre_image"],
            batch["centers_pre"],
            batch["centers_next"],
            train=False,
            method="train_forward",
        )
        new_batch_stats = batch_stats
    det_losses = L.generic_loss(outputs, batch, cfg.weights)
    afe_losses = L.afe_loss(
        affinity, batch["labels"], batch["mask_pre"], batch["mask_next"]
    )
    total = L.joint_loss(det_losses["tot"], afe_losses["loss"], s_det, s_id)
    stats = {**det_losses, "matching": afe_losses["loss"],
             "matching_acc": afe_losses["accuracy"], "joint": total}
    return total, (stats, new_batch_stats)


def make_train_step(model: DEFTNet, cfg: Config, tx: optax.GradientTransformation,
                    mesh=None):
    """Build the jitted train step; if ``mesh`` is given, shard batch over its
    first axis and replicate state."""

    def train_step(state: TrainState, batch):
        def loss_fn(trainables):
            return loss_and_updates(
                model, cfg,
                trainables["model"], state.batch_stats,
                trainables["uncertainty"]["s_det"],
                trainables["uncertainty"]["s_id"],
                batch,
            )

        trainables = {
            "model": state.params,
            "uncertainty": {"s_det": state.s_det, "s_id": state.s_id},
        }
        (total, (stats, new_bstats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(trainables)
        updates, new_opt = tx.update(grads, state.opt_state, trainables)
        new_trainables = optax.apply_updates(trainables, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_trainables["model"],
            batch_stats=new_bstats,
            opt_state=new_opt,
            s_det=new_trainables["uncertainty"]["s_det"],
            s_id=new_trainables["uncertainty"]["s_id"],
        )
        return new_state, stats

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    axis = mesh.axis_names[0]
    batch_sh = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        train_step,
        in_shardings=(repl, batch_sh),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_eval_step(model: DEFTNet, cfg: Config, mesh=None):
    def eval_step(state: TrainState, batch):
        total, (stats, _) = loss_and_updates(
            model, cfg, state.params, state.batch_stats,
            state.s_det, state.s_id, batch, train=False,
        )
        return stats

    if mesh is None:
        return jax.jit(eval_step)
    axis = mesh.axis_names[0]
    return jax.jit(
        eval_step,
        in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P(axis))),
        out_shardings=NamedSharding(mesh, P()),
    )
