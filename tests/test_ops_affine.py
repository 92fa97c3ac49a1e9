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


def test_device_warp_matches_cv2():
    """warp_affine_separable must reproduce cv2.warpAffine INTER_LINEAR +
    BORDER_CONSTANT(0) for the rot=0 preprocessing family (cv2 quantizes
    bilinear weights to 5 bits -> ~1 LSB tolerance)."""
    import cv2
    import jax

    from deft_tpu.ops.affine import get_affine_transform
    from deft_tpu.ops.warp import separable_inverse_tf, warp_affine_separable

    rng = np.random.RandomState(0)
    for (h, w, out_h, out_w) in [(108, 192, 64, 96), (75, 100, 96, 64),
                                 (64, 64, 64, 64)]:
        img = rng.randint(0, 256, (h, w, 3), np.uint8)
        c = np.array([w / 2.0, h / 2.0], np.float32)
        s = max(h, w) * 1.0                      # fix_res geometry
        trans = get_affine_transform(c, s, 0, [out_w, out_h])
        ref = cv2.warpAffine(img, trans, (out_w, out_h),
                             flags=cv2.INTER_LINEAR).astype(np.float32)
        inv6 = separable_inverse_tf(c, s, out_w, out_h)
        got = np.asarray(jax.jit(
            lambda im, tf: warp_affine_separable(im, tf, out_h, out_w)
        )(img[None], inv6))[0]
        assert np.abs(got - ref).max() <= 2.0, (h, w, np.abs(got - ref).max())


def test_device_warp_border_zero():
    """Out-of-source regions must be exactly 0 like BORDER_CONSTANT."""
    import jax

    from deft_tpu.ops.warp import warp_affine_separable

    img = np.full((1, 10, 10, 1), 255, np.uint8)
    # shift far right/down: most of the output sees no source
    inv6 = np.array([1.0, 0.0, 20.0, 0.0, 1.0, 20.0], np.float32)
    out = np.asarray(jax.jit(
        lambda im, tf: warp_affine_separable(im, tf, 16, 16))(img, inv6))
    assert np.all(out == 0.0)
