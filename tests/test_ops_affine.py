"""Affine transform parity vs cv2.getAffineTransform (the reference's backend)."""

import cv2
import numpy as np
import pytest

from deft_tpu.ops.affine import (
    affine_transform,
    get_affine_transform,
    transform_preds_with_trans,
)


def _cv2_reference(center, scale, rot, output_size, shift=(0, 0), inv=False):
    """Reimplementation of the reference get_affine_transform via cv2 for
    golden comparison (image.py:42-73 semantics)."""
    center = np.asarray(center, np.float32)
    scale = np.array([scale, scale], np.float32) if np.isscalar(scale) else np.asarray(scale, np.float32)
    shift = np.asarray(shift, np.float32)
    src_w = scale[0]
    dst_w, dst_h = output_size

    rot_rad = np.pi * rot / 180
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    src_dir = np.array([0 * cs - (-0.5 * src_w) * sn, 0 * sn + (-0.5 * src_w) * cs], np.float32)
    dst_dir = np.array([0, dst_w * -0.5], np.float32)

    def third(a, b):
        d = a - b
        return b + np.array([-d[1], d[0]], np.float32)

    src = np.zeros((3, 2), np.float32)
    dst = np.zeros((3, 2), np.float32)
    src[0] = center + scale * shift
    src[1] = center + src_dir + scale * shift
    dst[0] = [dst_w * 0.5, dst_h * 0.5]
    dst[1] = np.array([dst_w * 0.5, dst_h * 0.5], np.float32) + dst_dir
    src[2] = third(src[0], src[1])
    dst[2] = third(dst[0], dst[1])
    if inv:
        return cv2.getAffineTransform(np.float32(dst), np.float32(src))
    return cv2.getAffineTransform(np.float32(src), np.float32(dst))


@pytest.mark.parametrize("rot", [0.0, 15.0, -30.0])
@pytest.mark.parametrize("inv", [False, True])
def test_affine_matches_cv2(rot, inv):
    center = np.array([321.5, 240.25], np.float32)
    scale = 703.0
    out = (960, 544)
    ours = get_affine_transform(center, scale, rot, out, inv=inv)
    golden = _cv2_reference(center, scale, rot, out, inv=inv)
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-3)


def test_affine_roundtrip():
    center = np.array([100.0, 50.0])
    scale = 200.0
    out = (128, 96)
    fwd = get_affine_transform(center, scale, 0, out)
    inv = get_affine_transform(center, scale, 0, out, inv=True)
    pts = np.array([[10.0, 20.0], [64.0, 48.0], [100.0, 90.0]], np.float32)
    back = transform_preds_with_trans(transform_preds_with_trans(pts, fwd), inv)
    np.testing.assert_allclose(back, pts, atol=1e-3)


def test_affine_transform_single_point():
    trans = get_affine_transform([50, 50], 100.0, 0, (100, 100))
    pt = affine_transform([50, 50], trans)
    np.testing.assert_allclose(pt, [50.0, 50.0], atol=1e-4)


def test_shift_moves_crop():
    t0 = get_affine_transform([50, 50], 100.0, 0, (100, 100), shift=(0.0, 0.0))
    t1 = get_affine_transform([50, 50], 100.0, 0, (100, 100), shift=(0.1, 0.0))
    p0 = affine_transform([50, 50], t0)
    p1 = affine_transform([50, 50], t1)
    assert p1[0] < p0[0]  # shifting the source right moves content left
