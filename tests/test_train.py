"""Training-stack tests: losses + jitted sharded train step on an 8-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deft_tpu.config import mot_config
from deft_tpu.models import create_model
from deft_tpu.models.factory import init_model
from deft_tpu.ops.gaussian import gaussian_radius, render_gaussians_np
from deft_tpu.parallel.mesh import make_mesh, shard_batch
from deft_tpu.train import losses as L
from deft_tpu.train.trainer import (
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

H = W = 32
M = 4  # max objects in targets AND afe slots for this test


def tiny_cfg():
    return mot_config(input_h=H, input_w=W, dla_node="conv", max_object=M,
                      batch_size=8)


def synth_batch(rng, b=8):
    """One synthetic tracking batch with consistent targets."""
    oh, ow = H // 4, W // 4
    batch = {
        "image": rng.rand(b, H, W, 3).astype(np.float32),
        "pre_image": rng.rand(b, H, W, 3).astype(np.float32),
        "centers_pre": (rng.rand(b, M, 2).astype(np.float32) * 2 - 1),
        "centers_next": (rng.rand(b, M, 2).astype(np.float32) * 2 - 1),
        "ind": np.zeros((b, M), np.int32),
        "mask": np.zeros((b, M), np.float32),
        "cat": np.zeros((b, M), np.int32),
        "hm": np.zeros((b, oh, ow, 1), np.float32),
    }
    for head, d in [("reg", 2), ("wh", 2), ("tracking", 2), ("ltrb_amodal", 4)]:
        batch[head] = rng.rand(b, M, d).astype(np.float32)
        batch[f"{head}_mask"] = np.zeros((b, M, d), np.float32)
    for i in range(b):
        n = 2
        cts = rng.rand(n, 2) * [ow - 1, oh - 1]
        radii = [1] * n
        batch["hm"][i, :, :, 0] = render_gaussians_np((oh, ow), cts, radii)
        for j, c in enumerate(cts):
            batch["ind"][i, j] = int(c[1]) * ow + int(c[0])
            batch["mask"][i, j] = 1.0
            for head in ("reg", "wh", "tracking", "ltrb_amodal"):
                batch[f"{head}_mask"][i, j] = 1.0
    # AFE labels: identity matching of first 2 objects
    labels = np.zeros((b, M + 1, M + 1), np.float32)
    labels[:, 0, 0] = labels[:, 1, 1] = 1.0
    labels[:, 2:, M] = 1.0  # unmatched rows -> false column
    batch["labels"] = labels
    mask_pre = np.zeros((b, M + 1), np.float32)
    mask_pre[:, [0, 1, M]] = 1.0
    batch["mask_pre"] = mask_pre
    batch["mask_next"] = mask_pre.copy()
    return {k: jnp.asarray(v) for k, v in batch.items()}


def test_focal_loss_perfect_prediction():
    hm = np.zeros((1, 8, 8, 1), np.float32)
    hm[0, 4, 4, 0] = 1.0
    pred = jnp.asarray(np.clip(hm, 1e-4, 1 - 1e-4))
    ind = jnp.asarray([[4 * 8 + 4]])
    loss = L.fast_focal_loss(pred, jnp.asarray(hm), ind,
                             jnp.ones((1, 1)), jnp.zeros((1, 1), jnp.int32))
    assert float(loss) < 1e-2


def test_focal_loss_no_positives():
    pred = jnp.full((1, 8, 8, 1), 0.5)
    target = jnp.zeros((1, 8, 8, 1))
    loss = L.fast_focal_loss(pred, target, jnp.zeros((1, 1), jnp.int32),
                             jnp.zeros((1, 1)), jnp.zeros((1, 1), jnp.int32))
    assert float(loss) > 0 and np.isfinite(float(loss))


def test_reg_l1_masked(rng):
    out = jnp.asarray(rng.rand(1, 4, 4, 2).astype(np.float32))
    ind = jnp.asarray([[0, 5]])
    target = jnp.asarray(rng.rand(1, 2, 2).astype(np.float32))
    mask = jnp.asarray([[[1.0, 1.0], [0.0, 0.0]]])
    loss = L.reg_weighted_l1_loss(out, mask, ind, target)
    flat = np.asarray(out).reshape(1, 16, 2)
    expect = np.abs(flat[0, 0] - np.asarray(target)[0, 0]).sum() / (2 + 1e-4)
    np.testing.assert_allclose(float(loss), expect, rtol=1e-5)


def test_afe_loss_prefers_correct_affinity():
    b, n = 1, 4
    labels = np.zeros((b, n + 1, n + 1), np.float32)
    labels[0, 0, 1] = 1.0
    labels[0, 1, 0] = 1.0
    mask = np.zeros((b, n + 1), np.float32)
    mask[0, [0, 1, n]] = 1.0

    good = np.zeros((b, n + 1, n + 1), np.float32)
    good[0, 0, 1] = good[0, 1, 0] = 10.0
    bad = np.zeros((b, n + 1, n + 1), np.float32)
    bad[0, 0, 0] = bad[0, 1, 1] = 10.0

    lg = L.afe_loss(jnp.asarray(good), jnp.asarray(labels),
                    jnp.asarray(mask), jnp.asarray(mask))
    lb = L.afe_loss(jnp.asarray(bad), jnp.asarray(labels),
                    jnp.asarray(mask), jnp.asarray(mask))
    assert float(lg["loss"]) < float(lb["loss"])
    assert float(lg["accuracy"]) == 1.0


def test_rot_loss_finite(rng):
    out = jnp.asarray(rng.rand(1, 4, 4, 8).astype(np.float32))
    loss = L.bin_rot_loss(
        out, jnp.ones((1, 2)), jnp.asarray([[0, 5]]),
        jnp.asarray([[[1, 0], [0, 1]]]), jnp.asarray(rng.rand(1, 2, 2).astype(np.float32)),
    )
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_resume_fidelity(rng, tmp_path):
    """Checkpoint/resume restores optimizer moments AND the LR-schedule step:
    a resumed run reproduces the uninterrupted run's loss trajectory, across
    an lr_step decay boundary (reference model.py:94-106 semantics)."""
    from deft_tpu.train import checkpoint as ckpt

    steps_per_epoch = 2
    cfg = tiny_cfg().replace(lr_step=(1,), lr=1e-3)  # decay boundary: step 2
    model = create_model(cfg.arch, cfg)
    params, bstats = init_model(model, cfg)
    params_np = jax.tree.map(np.asarray, params)
    bstats_np = jax.tree.map(np.asarray, bstats)

    def fresh_state():
        p = jax.tree.map(jnp.asarray, params_np)
        b = jax.tree.map(jnp.asarray, bstats_np)
        return create_train_state(model, cfg, p, b, steps_per_epoch)

    tx = make_optimizer(cfg, steps_per_epoch)
    step = make_train_step(model, cfg, tx)
    batch = synth_batch(rng)

    # uninterrupted: 4 steps (steps 3-4 run at the decayed LR)
    state = fresh_state()
    ref_losses = []
    for _ in range(4):
        state, stats = step(state, batch)
        ref_losses.append(float(stats["joint"]))

    # interrupted: 2 steps -> checkpoint (epoch 1) -> fresh state -> resume
    state = fresh_state()
    for _ in range(2):
        state, stats = step(state, batch)
    path = str(tmp_path / "model_last")
    ckpt.save_checkpoint(path, state.params, state.batch_stats,
                         opt_state=state.opt_state, epoch=1,
                         step=int(state.step),
                         extra={"s_det": state.s_det, "s_id": state.s_id})
    resumed, epoch = ckpt.load_train_state(path, fresh_state(), steps_per_epoch)
    assert epoch == 1
    assert int(resumed.step) == 2
    res_losses = []
    for _ in range(2):
        resumed, stats = step(resumed, batch)
        res_losses.append(float(stats["joint"]))
    np.testing.assert_allclose(res_losses, ref_losses[2:], rtol=1e-5)

    # legacy checkpoint (no opt_state/step): schedule step re-derived from
    # the epoch so post-lr_step resumes still use the decayed LR
    path2 = str(tmp_path / "model_old")
    ckpt.save_checkpoint(path2, state.params, state.batch_stats, epoch=1)
    resumed2, epoch2 = ckpt.load_train_state(path2, fresh_state(),
                                             steps_per_epoch)
    assert epoch2 == 1 and int(resumed2.step) == steps_per_epoch


@pytest.mark.slow
def test_train_step_decreases_loss(rng):
    cfg = tiny_cfg()
    model = create_model(cfg.arch, cfg)
    params, bstats = init_model(model, cfg)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(model, cfg, params, bstats)

    mesh = make_mesh()
    assert mesh.devices.size == 8  # forced-CPU virtual mesh
    step = make_train_step(model, cfg, tx, mesh)
    batch = shard_batch(synth_batch(rng), mesh)

    losses = []
    for _ in range(8):
        state, stats = step(state, batch)
        losses.append(float(stats["joint"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses

    ev = make_eval_step(model, cfg, mesh)
    stats = ev(state, batch)
    assert np.isfinite(float(stats["joint"]))
