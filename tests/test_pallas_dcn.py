"""Shift-decomposed DCN: XLA fallback and Pallas kernel vs the gather oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deft_tpu.models.dcn import deform_sample
from deft_tpu.ops.pallas_dcn import (
    deform_conv_pallas_tap,
    deform_conv_shift_xla,
)

R = 4


@pytest.fixture(scope="module")
def problem():
    rng = np.random.RandomState(0)
    H, W, C, CO = 16, 24, 8, 16
    x = rng.randn(H, W, C).astype(np.float32)
    offs = (rng.rand(H, W, 9, 2).astype(np.float32) * 2 * R - R) * 0.9
    mask = rng.rand(H, W, 9).astype(np.float32)
    wt = rng.randn(9 * C, CO).astype(np.float32) * 0.1
    b = rng.randn(CO).astype(np.float32)
    patches = deform_sample(jnp.asarray(x), jnp.asarray(offs), jnp.asarray(mask))
    golden = (np.asarray(patches).reshape(H * W, 9 * C) @ wt + b).reshape(H, W, CO)
    return x, offs, mask, wt, b, golden


def test_shift_xla_matches_gather(problem):
    x, offs, mask, wt, b, golden = problem
    out = np.asarray(deform_conv_shift_xla(
        jnp.asarray(x), jnp.asarray(offs), jnp.asarray(mask),
        jnp.asarray(wt), jnp.asarray(b), radius=R))
    np.testing.assert_allclose(out, golden, rtol=1e-4, atol=1e-5)


def test_pallas_interpret_matches_gather(problem):
    x, offs, mask, wt, b, golden = problem
    out = np.asarray(deform_conv_pallas_tap(
        jnp.asarray(x), jnp.asarray(offs), jnp.asarray(mask),
        jnp.asarray(wt), jnp.asarray(b), radius=R, tile_h=8, interpret=True))
    # the kernel samples from a bf16 slab by design (VMEM footprint + bf16
    # compute path); tolerance reflects bf16 input precision
    np.testing.assert_allclose(out, golden, rtol=3e-2, atol=3e-2)


def test_clamp_semantics(problem):
    """Offsets beyond +-R saturate exactly like a pre-clamped gather."""
    x, offs, mask, wt, b, _ = problem
    offs3 = offs * 3.0
    out = np.asarray(deform_conv_shift_xla(
        jnp.asarray(x), jnp.asarray(offs3), jnp.asarray(mask),
        jnp.asarray(wt), jnp.asarray(b), radius=R))
    patches = deform_sample(jnp.asarray(x), jnp.asarray(np.clip(offs3, -R, R)),
                            jnp.asarray(mask))
    golden = (np.asarray(patches).reshape(-1, wt.shape[0]) @ wt + b).reshape(
        out.shape)
    np.testing.assert_allclose(out, golden, rtol=1e-4, atol=1e-5)


def test_model_level_equivalence_at_init(problem):
    """Full DLASeg with dcn_impl=shift equals gather at zero-init offsets."""
    from deft_tpu.config import mot_config
    from deft_tpu.models import create_model

    cfg_g = mot_config(input_h=64, input_w=64, dcn_impl="gather")
    cfg_s = mot_config(input_h=64, input_w=64, dcn_impl="shift")
    mg = create_model(cfg_g.arch, cfg_g)
    ms = create_model(cfg_s.arch, cfg_s)
    img = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3)
                      .astype(np.float32))
    v = jax.jit(lambda r: mg.init(r, img))(jax.random.PRNGKey(0))
    og, _ = mg.apply(v, img)
    os_, _ = ms.apply(v, img)
    np.testing.assert_allclose(np.asarray(og["hm"]), np.asarray(os_["hm"]),
                               atol=1e-5)


def test_pallas_cm_interpret_matches_oracle(problem):
    """Round-3 channel-major kernel (interpreter mode on CPU; the TPU
    compile + per-layer timings live in the module docstring)."""
    from deft_tpu.ops.pallas_dcn import deform_conv_pallas_cm

    x, offs, mask, wt, b, golden = problem
    out = np.asarray(deform_conv_pallas_cm(
        jnp.asarray(x), jnp.asarray(offs), jnp.asarray(mask),
        jnp.asarray(wt), jnp.asarray(b), radius=R, tile_h=8, interpret=True))
    # bf16 slab + bf16 patch/weight einsum: bf16-mantissa tolerance
    np.testing.assert_allclose(out, golden, rtol=3e-2, atol=3e-2)


def test_pallas_cm_gating_edge_regimes():
    """The offset-gated kernel must stay exact across gating regimes:
    tiny offsets (aggressive pruning), exact-integer offsets (hat support
    collapses to one shift; the gate's open interval must still admit it),
    and full-range offsets (nothing prunes -- gated == ungated)."""
    from deft_tpu.ops.pallas_dcn import deform_conv_pallas_cm

    rng = np.random.RandomState(3)
    H, W, C, CO = 16, 24, 8, 4
    x = rng.randn(H, W, C).astype(np.float32)
    mask = rng.rand(H, W, 9).astype(np.float32)
    wt = rng.randn(9 * C, CO).astype(np.float32) * 0.1
    b = rng.randn(CO).astype(np.float32)
    regimes = {
        "tiny": (rng.rand(H, W, 9, 2).astype(np.float32) - 0.5) * 0.2,
        "integer": rng.randint(-R, R + 1, (H, W, 9, 2)).astype(np.float32),
        "full": (rng.rand(H, W, 9, 2).astype(np.float32) * 2 * R - R),
    }
    for name, offs in regimes.items():
        patches = deform_sample(jnp.asarray(x), jnp.asarray(offs),
                                jnp.asarray(mask))
        golden = (np.asarray(patches).reshape(H * W, 9 * C) @ wt
                  + b).reshape(H, W, CO)
        for gated in (True, False):
            out = np.asarray(deform_conv_pallas_cm(
                jnp.asarray(x), jnp.asarray(offs), jnp.asarray(mask),
                jnp.asarray(wt), jnp.asarray(b), radius=R, tile_h=8,
                interpret=True, gated=gated))
            np.testing.assert_allclose(
                out, golden, rtol=3e-2, atol=3e-2,
                err_msg=f"regime={name} gated={gated}")


def test_hybrid_matches_onehot_and_trains(problem):
    """dcn_impl=hybrid: CPU forward routes to onehot (exact vs oracle) and
    the custom_vjp backward (shift-XLA) matches gather-path gradients."""
    from deft_tpu.ops.pallas_dcn import deform_conv_hybrid, deform_conv_onehot

    x, offs, mask, wt, b, golden = problem
    args = tuple(jnp.asarray(a) for a in (x, offs, mask, wt, b))
    out = np.asarray(deform_conv_hybrid(*args, radius=R))
    np.testing.assert_allclose(out, golden, rtol=1e-4, atol=1e-5)

    def loss_h(wt_, x_):
        return jnp.sum(deform_conv_hybrid(x_, args[1], args[2], wt_, args[4],
                                          radius=R) ** 2)

    def loss_o(wt_, x_):
        return jnp.sum(deform_conv_onehot(x_, args[1], args[2], wt_, args[4],
                                          radius=R) ** 2)

    gh = jax.grad(loss_h, argnums=(0, 1))(args[3], args[0])
    go = jax.grad(loss_o, argnums=(0, 1))(args[3], args[0])
    for a, bb in zip(gh, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-3, atol=1e-3)


def test_pallas_onehot_interpret_matches_oracle():
    """The Pallas port of the one-hot matmul kernel (interpreter mode; TPU
    compile is Mosaic-blocked, see the function docstring)."""
    import jax.numpy as jnp

    from deft_tpu.models.dcn import deform_sample
    from deft_tpu.ops.pallas_dcn import deform_conv_pallas_onehot

    rng = np.random.RandomState(3)
    h, w, c, cout, r = 13, 17, 8, 6, 4
    x = rng.randn(h, w, c).astype(np.float32)
    off = (rng.rand(h, w, 9, 2).astype(np.float32) * 2 * r - r)
    mask = rng.rand(h, w, 9).astype(np.float32)
    wgt = rng.randn(9 * c, cout).astype(np.float32) * 0.1
    b = rng.randn(cout).astype(np.float32) * 0.1

    patches = deform_sample(jnp.asarray(x), jnp.asarray(off), jnp.asarray(mask))
    ref = np.asarray(patches.reshape(h * w, 9 * c) @ wgt + b).reshape(h, w, cout)
    got = np.asarray(deform_conv_pallas_onehot(
        jnp.asarray(x), jnp.asarray(off), jnp.asarray(mask),
        jnp.asarray(wgt), jnp.asarray(b), radius=r, interpret=True,
    ))
    # bf16 slab inside the kernel -> relative tolerance of the bf16 mantissa
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
