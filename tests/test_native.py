"""C++ native module tests (skipped when no compiler is available)."""

import numpy as np
import pytest

nat = pytest.importorskip("deft_tpu.native")
pytestmark = pytest.mark.skipif(not nat.AVAILABLE,
                                reason="native build unavailable")

from deft_tpu.ops.iou import pairwise_iou
from deft_tpu.tracking.assignment import linear_assignment


def test_lapjv_matches_scipy_objective(rng):
    for _ in range(60):
        n, m = rng.randint(1, 35), rng.randint(1, 35)
        cost = rng.rand(n, m)
        th = float(rng.choice([0.0, 0.3, 0.9, 2.0]))
        m1, _, _ = linear_assignment(cost, th)
        m2, u2, v2 = nat.lapjv(cost, th)
        assert len(m1) == len(m2)
        c1 = sum(cost[i, j] for i, j in m1)
        c2 = sum(cost[i, j] for i, j in m2)
        assert abs(c1 - c2) < 1e-9
        # unmatched bookkeeping is consistent
        assert len(m2) + len(u2) == n and len(m2) + len(v2) == m


def test_lapjv_inf_entries(rng):
    cost = rng.rand(5, 5)
    cost[0, :] = np.inf
    m, u, v = nat.lapjv(cost, 0.9)
    assert 0 in u  # fully-gated row stays unmatched


def test_iou_matrix_parity(rng):
    a = rng.rand(15, 4) * 80
    b = rng.rand(25, 4) * 80
    a[:, 2:] += a[:, :2] + 1
    b[:, 2:] += b[:, :2] + 1
    np.testing.assert_allclose(nat.iou_matrix(a, b), pairwise_iou(a, b),
                               rtol=1e-12)


def test_warp_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    img = (rng.rand(80, 120, 3) * 255).astype(np.uint8)
    M = np.array([[0.7, 0.05, 3.0], [-0.02, 0.8, 2.0]])
    ours = nat.warp_affine(img, M, (100, 70))
    ref = cv2.warpAffine(img, M, (100, 70), flags=cv2.INTER_LINEAR)
    diff = np.abs(ours.astype(int) - ref.astype(int))
    # interiors match to rounding; borders may differ by cv2's edge policy
    assert np.percentile(diff, 99) <= 1
