"""LSTM motion-model training (``/root/reference/src/train_prediction.py``).

SmoothL1 on future-delta targets with the reference's loss-scale schedule
(x100 while 100*loss < 20, else x10 -- train_prediction.py:100-105), Adam
with step decay.  Trajectories vary in length (random frame drops), so steps
jit per distinct T; the dozen distinct lengths each compile once.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deft_tpu.tracking.motion_lstm import DecoderRNN, max_future


def smooth_l1(pred, target):
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))


def make_lstm_train_step(model: DecoderRNN, tx: optax.GradientTransformation):
    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, traj, target):
        def loss_fn(p):
            out = model.apply({"params": p}, traj)
            flat = out.reshape(out.shape[0], -1)
            loss = smooth_l1(flat, target.reshape(target.shape[0], -1))
            # reference schedule: magnify small losses more
            return jnp.where(100.0 * loss < 20.0, 100.0 * loss, 10.0 * loss)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def train_motion_model(cfg, dataset, num_epochs=None, logger=None,
                       steps_per_epoch=None, save_dir=None):
    """Train DecoderRNN on a TrajectoryDataset; returns final variables."""
    import os

    model = DecoderRNN(dataset=cfg.dataset)
    fut = max_future(cfg.dataset)
    dummy = jnp.zeros((1, 5, 18 if cfg.dataset == "nuscenes" else 11))
    variables = model.init(jax.random.PRNGKey(cfg.seed), dummy)
    params = variables["params"]

    sched = optax.piecewise_constant_schedule(
        cfg.lr, {int(e) * (steps_per_epoch or len(dataset)): 0.1
                 for e in cfg.lr_step}
    )
    tx = optax.adam(sched)
    opt_state = tx.init(params)
    step = make_lstm_train_step(model, tx)

    num_epochs = num_epochs or cfg.num_epochs
    n = steps_per_epoch or len(dataset)
    for epoch in range(1, num_epochs + 1):
        order = np.random.permutation(len(dataset))[:n]
        losses = []
        for idx in order:
            traj, target = dataset[int(idx)]
            if traj.shape[0] < 2:
                continue
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(traj)[None],
                jnp.asarray(target)[None],
            )
            losses.append(float(loss))
        msg = f"motion epoch {epoch}: loss {np.mean(losses):.5f}"
        (logger.write(msg) if logger else print(msg))
        if save_dir:
            from deft_tpu.train.checkpoint import save_motion_checkpoint

            class _M:
                pass

            m = _M()
            m.variables = {"params": params}
            save_motion_checkpoint(os.path.join(save_dir, "model_last"), m)
    return {"params": params}
