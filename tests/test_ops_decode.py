"""Decode parity vs a torch reimplementation of the reference semantics.

The golden path reimplements model/utils.py:69-104 and decode.py:102-219 with
torch (CPU) so we validate our NHWC JAX decode against the exact reference
contract without importing reference code.
"""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from deft_tpu.ops.decode import gather_feat, generic_decode, heat_nms, topk


def torch_nms(heat, kernel=3):
    pad = (kernel - 1) // 2
    hmax = F.max_pool2d(heat, (kernel, kernel), stride=1, padding=pad)
    keep = (hmax == heat).float()
    return heat * keep


def torch_topk(scores, K):
    batch, cat, height, width = scores.size()
    topk_scores, topk_inds = torch.topk(scores.view(batch, cat, -1), K)
    topk_inds = topk_inds % (height * width)
    topk_ys = (topk_inds // width).float()
    topk_xs = (topk_inds % width).float()
    topk_score, topk_ind = torch.topk(topk_scores.view(batch, -1), K)
    topk_clses = (topk_ind // K).int()

    def gf(feat, ind):
        dim = feat.size(2)
        ind = ind.unsqueeze(2).expand(ind.size(0), ind.size(1), dim)
        return feat.gather(1, ind)

    topk_inds = gf(topk_inds.view(batch, -1, 1), topk_ind).view(batch, K)
    topk_ys = gf(topk_ys.view(batch, -1, 1), topk_ind).view(batch, K)
    topk_xs = gf(topk_xs.view(batch, -1, 1), topk_ind).view(batch, K)
    return topk_score, topk_inds, topk_clses, topk_ys, topk_xs


def test_nms_matches_torch(rng):
    hm = rng.rand(2, 3, 32, 48).astype(np.float32)
    golden = torch_nms(torch.from_numpy(hm)).numpy()
    ours = np.asarray(heat_nms(jnp.asarray(hm.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), golden, atol=1e-6)


def test_topk_matches_torch(rng):
    hm = rng.rand(2, 3, 24, 40).astype(np.float32)
    gs, gi, gc, gy, gx = torch_topk(torch_nms(torch.from_numpy(hm)), K=20)
    heat = heat_nms(jnp.asarray(hm.transpose(0, 2, 3, 1)))
    s, i, c, y, x = topk(heat, k=20)
    np.testing.assert_allclose(np.asarray(s), gs.numpy(), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), gi.numpy())
    np.testing.assert_array_equal(np.asarray(c), gc.numpy())
    np.testing.assert_allclose(np.asarray(y), gy.numpy())
    np.testing.assert_allclose(np.asarray(x), gx.numpy())


def test_gather_feat(rng):
    feat = rng.rand(2, 8, 10, 4).astype(np.float32)
    inds = rng.randint(0, 80, size=(2, 5))
    ours = np.asarray(gather_feat(jnp.asarray(feat), jnp.asarray(inds)))
    flat = feat.reshape(2, 80, 4)
    for b in range(2):
        np.testing.assert_allclose(ours[b], flat[b][inds[b]])


def test_generic_decode_boxes(rng):
    """End-to-end: boxes from wh must match the reference formula; ltrb_amodal
    overrides bboxes (decode.py:182-196)."""
    b, h, w, c, K = 1, 16, 16, 2, 8
    hm = rng.rand(b, h, w, c).astype(np.float32)
    reg = rng.rand(b, h, w, 2).astype(np.float32)
    wh = rng.rand(b, h, w, 2).astype(np.float32) * 5
    out = {"hm": jnp.asarray(hm), "reg": jnp.asarray(reg), "wh": jnp.asarray(wh)}
    ret = generic_decode(out, k=K)

    heat = np.asarray(heat_nms(jnp.asarray(hm)))
    scores, inds, clses, ys, xs = (np.asarray(v) for v in topk(jnp.asarray(heat), K))
    flat_reg = reg.reshape(b, h * w, 2)
    flat_wh = wh.reshape(b, h * w, 2)
    for kk in range(K):
        ind = inds[0, kk]
        cx = xs[0, kk] + flat_reg[0, ind, 0]
        cy = ys[0, kk] + flat_reg[0, ind, 1]
        ww = max(flat_wh[0, ind, 0], 0)
        hh = max(flat_wh[0, ind, 1], 0)
        np.testing.assert_allclose(
            np.asarray(ret["bboxes"])[0, kk],
            [cx - ww / 2, cy - hh / 2, cx + ww / 2, cy + hh / 2],
            rtol=1e-5,
        )

    # ltrb_amodal overrides bboxes
    ltrb_am = rng.rand(b, h, w, 4).astype(np.float32)
    out["ltrb_amodal"] = jnp.asarray(ltrb_am)
    ret2 = generic_decode(out, k=K)
    flat_am = ltrb_am.reshape(b, h * w, 4)
    for kk in range(K):
        ind = inds[0, kk]
        x0, y0 = xs[0, kk], ys[0, kk]
        np.testing.assert_allclose(
            np.asarray(ret2["bboxes"])[0, kk],
            [x0 + flat_am[0, ind, 0], y0 + flat_am[0, ind, 1],
             x0 + flat_am[0, ind, 2], y0 + flat_am[0, ind, 3]],
            rtol=1e-5,
        )
    np.testing.assert_allclose(
        np.asarray(ret2["bboxes"]), np.asarray(ret2["bboxes_amodal"])
    )


def test_decode_scores_sorted(rng):
    hm = rng.rand(2, 12, 12, 3).astype(np.float32)
    ret = generic_decode({"hm": jnp.asarray(hm)}, k=10)
    s = np.asarray(ret["scores"])
    assert (np.diff(s, axis=1) <= 1e-6).all()


def test_hps_decode_matches_reference(rng):
    """Keypoint decode + hm_hp fusion parity vs the actual reference
    generic_decode (decode.py:17-99, 197-207), run on the mounted repo."""
    import os
    import sys
    from types import SimpleNamespace

    import pytest

    ref = "/root/reference/src/lib"
    if not os.path.isdir(ref):
        pytest.skip("reference repo not mounted")
    sys.path.insert(0, ref)
    from model.decode import generic_decode as ref_decode

    # B=1: the reference fusion's scores.expand() only broadcasts at batch 1
    # (inference-only code path); our version generalizes but we compare there
    B, H, W, J, K = 1, 24, 32, 17, 8
    out_nchw = {
        "hm": rng.rand(B, 1, H, W).astype(np.float32),
        "reg": rng.randn(B, 2, H, W).astype(np.float32),
        "wh": (rng.rand(B, 2, H, W).astype(np.float32) * 12),
        "hps": (rng.randn(B, 2 * J, H, W).astype(np.float32) * 4),
        "hm_hp": rng.rand(B, J, H, W).astype(np.float32),
        "hp_offset": rng.randn(B, 2, H, W).astype(np.float32),
    }
    golden = ref_decode(
        {k: torch.from_numpy(v) for k, v in out_nchw.items()},
        K=K, opt=SimpleNamespace(zero_tracking=False),
    )
    ours = generic_decode(
        {k: jnp.asarray(v.transpose(0, 2, 3, 1)) for k, v in out_nchw.items()},
        k=K,
    )
    np.testing.assert_allclose(np.asarray(ours["bboxes"]),
                               golden["bboxes"].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours["hps"]),
                               golden["hps"].numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours["kps_score"]),
                               golden["kps_score"].numpy(), atol=1e-5)


def test_pre_inds_to_pre_cts(rng):
    hm = jnp.asarray(rng.rand(1, 16, 24, 1).astype(np.float32))
    pre_inds = jnp.asarray(np.array([[5 * 24 + 7, 3 * 24 + 1]], np.int32))
    ret = generic_decode({"hm": hm, "pre_inds": pre_inds}, k=4)
    np.testing.assert_array_equal(np.asarray(ret["pre_cts"]),
                                  [[[7.0, 5.0], [1.0, 3.0]]])


def test_cat_spec_wh(rng):
    """wh with 2*C channels selects the detected class's (w, h) pair."""
    B, H, W, C, K = 1, 16, 16, 3, 5
    hm = rng.rand(B, H, W, C).astype(np.float32)
    wh = rng.rand(B, H, W, 2 * C).astype(np.float32) * 10
    ret = generic_decode({"hm": jnp.asarray(hm), "wh": jnp.asarray(wh)}, k=K)
    boxes = np.asarray(ret["bboxes"])
    for j in range(K):
        cls = int(ret["clses"][0, j])
        y, x = int(ret["ys"][0, j]), int(ret["xs"][0, j])
        w_j, h_j = wh[0, y, x, 2 * cls], wh[0, y, x, 2 * cls + 1]
        np.testing.assert_allclose(boxes[0, j, 2] - boxes[0, j, 0], w_j,
                                   atol=1e-5)
        np.testing.assert_allclose(boxes[0, j, 3] - boxes[0, j, 1], h_j,
                                   atol=1e-5)
