"""Gaussian target + IoU op tests."""

import jax.numpy as jnp
import numpy as np

from deft_tpu.ops.gaussian import (
    draw_gaussian,
    gaussian2d,
    gaussian_radius,
    render_gaussians,
    render_gaussians_np,
)
from deft_tpu.ops.iou import box3d_to_corners, iou3d, pairwise_iou, pairwise_iou3d


def test_gaussian_radius_known_values():
    # r such that shifting a (h, w) box by r keeps IoU >= 0.7 (CornerNet rule)
    r = gaussian_radius((10, 10), 0.7)
    assert 0 < r < 10
    big = gaussian_radius((100, 100), 0.7)
    assert big > r


def test_draw_gaussian_peak_and_clip():
    hm = np.zeros((16, 16), np.float32)
    draw_gaussian(hm, (8, 8), 3)
    assert hm[8, 8] == 1.0
    assert hm[8, 11] > 0
    assert hm[8, 12] == 0.0  # outside radius box
    # near the border: must not raise, kernel clipped
    draw_gaussian(hm, (0, 0), 3)
    assert hm[0, 0] == 1.0


def test_draw_gaussian_max_composition():
    hm = np.zeros((16, 16), np.float32)
    draw_gaussian(hm, (8, 8), 2)
    before = hm.copy()
    draw_gaussian(hm, (9, 8), 2)
    assert (hm >= before - 1e-7).all()  # max-composition never decreases


def test_jax_renderer_matches_numpy():
    centers = np.array([[8.3, 8.7], [3.0, 12.0]], np.float32)
    radii = np.array([3.0, 2.0], np.float32)
    golden = render_gaussians_np((16, 16), centers, radii)
    ours = np.asarray(
        render_gaussians(
            (16, 16), jnp.asarray(centers), jnp.asarray(radii), jnp.ones(2)
        )
    )
    np.testing.assert_allclose(ours, golden, atol=1e-5)


def test_pairwise_iou_matches_bruteforce(rng):
    def one_iou(a, b):
        iw = min(a[2], b[2]) - max(a[0], b[0]) + 1
        ih = min(a[3], b[3]) - max(a[1], b[1]) + 1
        if iw <= 0 or ih <= 0:
            return 0.0
        inter = iw * ih
        ua = (
            (a[2] - a[0] + 1) * (a[3] - a[1] + 1)
            + (b[2] - b[0] + 1) * (b[3] - b[1] + 1)
            - inter
        )
        return inter / ua

    a = rng.rand(5, 4) * 50
    b = rng.rand(7, 4) * 50
    a[:, 2:] += a[:, :2] + 1
    b[:, 2:] += b[:, :2] + 1
    got = pairwise_iou(a, b)
    for i in range(5):
        for j in range(7):
            np.testing.assert_allclose(got[i, j], one_iou(a[i], b[j]), rtol=1e-6)


def test_iou3d_identical_boxes():
    box = np.array([1.5, 1.6, 3.9, 10.0, 1.0, 20.0, 0.3])
    c = box3d_to_corners(box)
    iou, bev = iou3d(c, c)
    np.testing.assert_allclose(iou, 1.0, atol=1e-6)
    np.testing.assert_allclose(bev, 1.0, atol=1e-6)


def test_iou3d_disjoint():
    a = box3d_to_corners(np.array([1.5, 1.6, 3.9, 0.0, 1.0, 0.0, 0.0]))
    b = box3d_to_corners(np.array([1.5, 1.6, 3.9, 100.0, 1.0, 0.0, 0.0]))
    iou, bev = iou3d(a, b)
    assert iou == 0.0 and bev == 0.0


def test_iou3d_partial_overlap_rotation_invariant():
    a = np.array([2.0, 2.0, 4.0, 0.0, 0.0, 0.0, 0.0])
    b = np.array([2.0, 2.0, 4.0, 2.0, 0.0, 0.0, 0.0])  # half-shifted along x (l=4)
    ca, cb = box3d_to_corners(a), box3d_to_corners(b)
    iou, _ = iou3d(ca, cb)
    np.testing.assert_allclose(iou, 1.0 / 3.0, rtol=1e-5)  # 0.5 inter / 1.5 union

    # rotate both by the same yaw: IoU unchanged
    a2, b2 = a.copy(), b.copy()
    a2[6] = b2[6] = 0.7
    # also rotate b's center about origin like a rigid scene rotation
    c, s = np.cos(0.7), np.sin(0.7)
    x, z = b[3], b[5]
    b2[3], b2[5] = c * x + s * z, -s * x + c * z
    iou2, _ = iou3d(box3d_to_corners(a2), box3d_to_corners(b2))
    np.testing.assert_allclose(iou2, iou, rtol=1e-5)


def test_pairwise_iou3d_shape():
    boxes = [np.array([2.0, 2.0, 4.0, 0.0, 0.0, 0.0, 0.0])]
    m = pairwise_iou3d(boxes, boxes * 3)
    assert m.shape == (1, 3)
    np.testing.assert_allclose(m, 1.0, atol=1e-6)
