"""Model-zoo tests: DCNv2 decomposition, DLA shapes, AFE semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deft_tpu.config import mot_config
from deft_tpu.models import create_model
from deft_tpu.models.afe import AFE, FALSE_CONSTANT
from deft_tpu.models.dcn import DCNv2, deform_sample
from deft_tpu.models.factory import init_model


@pytest.fixture(scope="module")
def small_model():
    cfg = mot_config(input_h=64, input_w=64, dla_node="conv")
    model = create_model(cfg.arch, cfg)
    params, bstats = init_model(model, cfg)
    return cfg, model, {"params": params, "batch_stats": bstats}


def test_dcn_zero_offsets_is_half_conv(rng):
    """With zero-init offset/mask conv: offsets = 0, mask = sigmoid(0) = 0.5,
    so DCNv2(x) == 0.5 * Conv3x3(x) + bias. This validates the whole gather
    decomposition against XLA's conv."""
    x = rng.rand(2, 9, 11, 4).astype(np.float32)
    dcn = DCNv2(features=6)
    variables = dcn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = dcn.apply(variables, jnp.asarray(x))

    w = variables["params"]["weight"]  # [9*Cin, Cout], tap-major
    b = variables["params"]["bias"]
    # tap-major [ky, kx, cin, cout] -> HWIO conv kernel
    kernel = np.asarray(w).reshape(3, 3, 4, 6)
    golden = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(kernel), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(golden) * 0.5 + np.asarray(b),
        rtol=1e-4, atol=1e-5,
    )


def test_deform_sample_integer_offsets(rng):
    """Integer offsets shift taps exactly (no interpolation)."""
    x = rng.rand(6, 6, 2).astype(np.float32)
    kk = 9
    offsets = np.zeros((6, 6, kk, 2), np.float32)
    offsets[..., 1] = 1.0  # shift every tap right by 1
    mask = np.ones((6, 6, kk), np.float32)
    out = np.asarray(
        deform_sample(jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(mask))
    ).reshape(6, 6, kk, 2)
    base = np.asarray(
        deform_sample(jnp.asarray(x), jnp.zeros((6, 6, kk, 2)), jnp.asarray(mask))
    ).reshape(6, 6, kk, 2)
    # center tap (k=4) at (y, x) with right-shift == base center tap at (y, x+1)
    np.testing.assert_allclose(out[:, :-1, 4], base[:, 1:, 4], atol=1e-6)


def test_model_shapes_and_fmaps(small_model):
    cfg, model, variables = small_model
    img = jnp.zeros((1, 64, 64, 3))
    outs, fmaps = model.apply(variables, img, train=False)
    assert set(outs) == set(cfg.heads)
    for h, c in cfg.heads.items():
        assert outs[h].shape == (1, 16, 16, c)
    assert [f.shape[-1] for f in fmaps] == [16, 32, 64, 128, 256, 512,
                                            64, 128, 256, 512, 64, 64, 64]
    strides = [64 // f.shape[1] for f in fmaps]
    assert strides == [1, 2, 4, 8, 16, 32, 4, 8, 16, 32, 4, 4, 4]


def test_detect_fused(small_model):
    cfg, model, variables = small_model
    img = jnp.ones((1, 64, 64, 3)) * 0.1
    dets, emb = model.apply(variables, img, k=7, method="detect")
    assert dets["bboxes"].shape == (1, 7, 4)
    assert emb.shape == (1, 7, 416)
    assert bool(jnp.isfinite(emb).all())


def test_affinity_split_weight_equals_concat_mlp(rng):
    """The split-W broadcast trick must equal the explicit per-pair MLP on
    concat(e_i, e_j) (what the reference's tiled 1x1 conv computes)."""
    afe = AFE(dataset="mot", max_object=8)
    e_pre = jnp.asarray(rng.rand(1, 8, 416).astype(np.float32))
    e_next = jnp.asarray(rng.rand(1, 8, 416).astype(np.float32))
    variables = afe.init(jax.random.PRNGKey(1), e_pre, e_next,
                         method=lambda m, a, b: m.affinity(a, b))
    aff = afe.apply(variables, e_pre, e_next,
                    method=lambda m, a, b: m.affinity(a, b))

    p = variables["params"]
    col = variables["batch_stats"]

    def bn_eval(x, scale, bias, mean, var):
        return (x - mean) / np.sqrt(var + 1e-5) * scale + bias

    sp = p["stacker2_bn"]
    sb = col["stacker2_bn"]
    ep = bn_eval(np.asarray(e_pre), sp["scale"], sp["bias"], sb["mean"], sb["var"])
    en = bn_eval(np.asarray(e_next), sp["scale"], sp["bias"], sb["mean"], sb["var"])

    w0 = np.asarray(p["final_0_kernel"])
    b0 = np.asarray(p["final_0_bias"])
    golden = np.zeros((8, 8), np.float32)
    for i in range(8):
        for j in range(8):
            x = np.concatenate([ep[0, i], en[0, j]]) @ w0 + b0
            f0 = p["final_0_bn"]
            s0 = col["final_0_bn"]
            x = bn_eval(x, f0["scale"], f0["bias"], s0["mean"], s0["var"])
            x = np.maximum(x, 0)
            for li, name in enumerate(["final_1", "final_2", "final_3", "final_4"]):
                x = x @ np.asarray(p[name]["kernel"]) + np.asarray(p[name]["bias"])
                bn_name = f"final_{li+1}_bn"
                if bn_name in p:
                    x = bn_eval(x, p[bn_name]["scale"], p[bn_name]["bias"],
                                col[bn_name]["mean"], col[bn_name]["var"])
                x = np.maximum(x, 0)
            golden[i, j] = x[0]
    np.testing.assert_allclose(np.asarray(aff)[0], golden, rtol=1e-4, atol=1e-5)


def test_stacker_features_reference_semantics(rng):
    """Fixed-shape dual-softmax vs a literal numpy port of AFE.py:110-160."""
    n = 8
    afe = AFE(dataset="mot", max_object=n)
    e_pre_full = rng.rand(n, 416).astype(np.float32)
    e_next_full = rng.rand(n, 416).astype(np.float32)
    n_pre, n_next = 5, 3
    e_pre = e_pre_full.copy()
    e_pre[n_pre:] = 0
    e_next = e_next_full.copy()
    e_next[n_next:] = 0

    variables = afe.init(
        jax.random.PRNGKey(2), jnp.asarray(e_pre)[None], jnp.asarray(e_next)[None],
        method=lambda m, a, b: m.affinity(a, b),
    )
    ours = np.asarray(afe.apply(
        variables, jnp.asarray(e_pre), jnp.asarray(e_next),
        jnp.int32(n_pre), jnp.int32(n_next), method="stacker_features",
    ))

    # literal reference path using the same raw affinity
    aff = np.asarray(afe.apply(
        variables, jnp.asarray(e_pre)[None], jnp.asarray(e_next)[None],
        method=lambda m, a, b: m.affinity(a, b),
    ))[0]
    x = aff.copy()
    x[:, n_next:] = 0
    x[n_pre:, :] = 0
    x = np.pad(x, ((0, 1), (0, 1)), constant_values=FALSE_CONSTANT)

    def softmax(a, axis):
        e = np.exp(a - a.max(axis=axis, keepdims=True))
        return e / e.sum(axis=axis, keepdims=True)

    x_f = softmax(x, 1)
    x_t = softmax(x, 0)
    rows = list(range(n_pre)) + [n]
    cols = list(range(n_next)) + [n]
    x_f = x_f[np.ix_(rows, cols)]
    x_t = x_t[np.ix_(rows, cols)]
    golden = np.zeros((n_pre, n_next + 1), np.float32)
    golden[:, :n_next] = np.maximum(x_f[:n_pre, :n_next], x_t[:n_pre, :n_next])
    golden[:, n_next] = x_f[:n_pre, n_next]

    np.testing.assert_allclose(ours[:n_pre, : n_next + 1], golden, rtol=1e-4,
                               atol=1e-6)
    # padding rows/cols zero
    assert np.abs(ours[n_pre:]).max() == 0
    assert np.abs(ours[:, n_next + 1:]).max() == 0


def test_training_forward_has_false_row_col(rng):
    afe = AFE(dataset="mot", max_object=4)
    fmaps = [jnp.asarray(rng.rand(1, 8 // (2 ** min(i, 3)) + 1, 9, c).astype(np.float32))
             for i, c in enumerate([16, 32, 64, 128, 256, 512, 64, 128, 256, 512, 64, 64, 64])]
    centers = jnp.zeros((1, 4, 2))
    variables = afe.init(jax.random.PRNGKey(0), fmaps, fmaps, centers, centers)
    out = afe.apply(variables, fmaps, fmaps, centers, centers)
    assert out.shape == (1, 5, 5)
    np.testing.assert_allclose(np.asarray(out)[0, -1, :], FALSE_CONSTANT)
    np.testing.assert_allclose(np.asarray(out)[0, :, -1], FALSE_CONSTANT)


def test_model_gradients_flow(small_model):
    cfg, model, variables = small_model

    def loss_fn(params):
        outs, fmaps = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.ones((1, 64, 64, 3)) * 0.2, train=False,
        )
        return sum(jnp.sum(o ** 2) for o in outs.values())

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # backbone gets gradient
    total = sum(float(jnp.abs(g).sum()) for g in flat)
    assert total > 0


def test_dcn_per_layer_radii(rng):
    """Per-layer radius overrides (--dcn_layer_radii): a pattern matching
    this layer's flax path shrinks the clamp (output changes once offsets
    exceed the smaller radius); a non-matching pattern leaves the layer on
    the global radius (bit-identical output)."""
    from deft_tpu.models.factory import parse_layer_radii

    import flax.linen as nn

    x = rng.rand(1, 8, 16, 4).astype(np.float32)

    class Node(nn.Module):
        radii_map: tuple = ()

        @nn.compact
        def __call__(self, x):
            return DCNv2(features=6, impl="onehot", offset_range=4,
                         offset_range_map=self.radii_map, name="conv")(x)

    class Neck(nn.Module):
        """Stands in for IDAUp: DCNv2 lives at path node_1/conv like the
        real trunk (the radius map keys on that path)."""
        radii_map: tuple = ()

        @nn.compact
        def __call__(self, x):
            return Node(radii_map=self.radii_map, name="node_1")(x)

    def build(radii_map):
        neck = Neck(radii_map=radii_map)
        variables = neck.init(jax.random.PRNGKey(0), jnp.asarray(x))
        # push every dy/dx offset to +3.5 (inside r=4, outside r=2)
        params = jax.tree_util.tree_map(np.asarray, variables["params"])
        dcn = params["node_1"]["conv"]
        dcn["conv_offset_mask"]["bias"] = np.concatenate(
            [np.full(18, 3.5, np.float32), np.zeros(9, np.float32)])
        return neck, {"params": params}

    outs = {}
    for name, spec in [("base", ""),
                       ("hit", '{"node_1/conv": 2}'),
                       ("miss", '{"some_other_layer": 2}')]:
        neck, variables = build(parse_layer_radii(spec))
        outs[name] = np.asarray(neck.apply(variables, jnp.asarray(x)))

    np.testing.assert_array_equal(outs["base"], outs["miss"])
    assert not np.allclose(outs["base"], outs["hit"]), \
        "r=2 clamp should change the output for 3.5-px offsets"
