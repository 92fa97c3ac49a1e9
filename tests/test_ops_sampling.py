"""Bilinear sampling parity vs torch.nn.functional.grid_sample."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from deft_tpu.ops.sampling import bilinear_sample, grid_sample_points


def _torch_grid_sample(feat_nchw, pts, padding_mode, align_corners):
    # pts: [N, 2] in [-1, 1]; mimic AFE.py:179-185 usage: grid [B, N, 1, 2]
    t = torch.from_numpy(feat_nchw)
    g = torch.from_numpy(pts).view(1, -1, 1, 2)
    out = F.grid_sample(
        t, g, padding_mode=padding_mode, align_corners=align_corners, mode="bilinear"
    )
    return out[0, :, :, 0].T.numpy()  # [N, C]


def test_grid_sample_border_align_true(rng):
    feat = rng.rand(1, 5, 9, 11).astype(np.float32)  # NCHW for torch
    pts = (rng.rand(17, 2).astype(np.float32) * 2.4) - 1.2  # include out of range
    golden = _torch_grid_sample(feat, pts, "border", True)
    ours = np.asarray(
        grid_sample_points(
            jnp.asarray(feat[0].transpose(1, 2, 0)), jnp.asarray(pts),
            padding_mode="border", align_corners=True,
        )
    )
    np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-5)


def test_grid_sample_border_align_false(rng):
    feat = rng.rand(1, 3, 7, 7).astype(np.float32)
    pts = (rng.rand(9, 2).astype(np.float32) * 2.0) - 1.0
    golden = _torch_grid_sample(feat, pts, "border", False)
    ours = np.asarray(
        grid_sample_points(
            jnp.asarray(feat[0].transpose(1, 2, 0)), jnp.asarray(pts),
            padding_mode="border", align_corners=False,
        )
    )
    np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-5)


def test_bilinear_zero_padding(rng):
    """Zero padding: out-of-bounds taps contribute nothing (DCNv2 semantics)."""
    feat = np.ones((4, 4, 2), np.float32)
    x = jnp.asarray([-0.5, 0.0, 3.0, 3.5, 10.0])
    y = jnp.asarray([0.0, 0.0, 3.0, 3.5, 0.0])
    out = np.asarray(bilinear_sample(jnp.asarray(feat), x, y, padding_mode="zeros"))
    np.testing.assert_allclose(out[:, 0], [0.5, 1.0, 1.0, 0.25, 0.0])


def test_bilinear_interpolates(rng):
    feat = np.zeros((2, 2, 1), np.float32)
    feat[0, 0, 0] = 0.0
    feat[0, 1, 0] = 1.0
    feat[1, 0, 0] = 2.0
    feat[1, 1, 0] = 3.0
    out = np.asarray(
        bilinear_sample(jnp.asarray(feat), jnp.asarray([0.5]), jnp.asarray([0.5]))
    )
    np.testing.assert_allclose(out[0, 0], 1.5)


def test_vmap_batched_sampling(rng):
    feats = rng.rand(2, 6, 6, 3).astype(np.float32)
    pts = (rng.rand(2, 4, 2).astype(np.float32) * 2) - 1
    batched = jax.vmap(
        lambda f, p: grid_sample_points(f, p, "border", True)
    )(jnp.asarray(feats), jnp.asarray(pts))
    for b in range(2):
        single = grid_sample_points(jnp.asarray(feats[b]), jnp.asarray(pts[b]), "border", True)
        np.testing.assert_allclose(np.asarray(batched[b]), np.asarray(single))
