"""Tracking layer tests: assignment semantics, KF algebra, full cascade."""

import numpy as np
import pytest

from deft_tpu.tracking.assignment import linear_assignment
from deft_tpu.tracking.basetrack import IdAllocator
from deft_tpu.tracking.kalman import KalmanFilter, chi2inv95
from deft_tpu.tracking.tracker import (
    DeviceFeatureRecorder,
    Node,
    STrack,
    Tracker,
)

E = 16  # embedding dim for mock similarity


def mock_similarity(window_embeds, counts, cur, n_cur):
    """Stand-in for AFE.window_similarity: row-normalized gaussian kernel with
    an unmatched column, same [W, M, M+1] contract."""
    import jax.numpy as jnp

    w, m, _ = window_embeds.shape
    d2 = jnp.sum(
        (window_embeds[:, :, None, :] - cur[None, None, :, :]) ** 2, axis=-1
    )
    sim = jnp.exp(-d2)                                     # [W, M, M]
    ids = jnp.arange(m)
    valid = (ids[None, :, None] < counts[:, None, None]) & (
        ids[None, None, :] < n_cur
    )
    sim = sim * valid
    unmatched = jnp.full((w, m, 1), 0.05)
    out = jnp.concatenate([sim, unmatched], axis=-1)
    # move unmatched mass to column n_cur like the real head
    col = jnp.arange(m + 1)[None, None, :]
    out = jnp.where(col < n_cur, out, jnp.where(col == n_cur, 0.05, 0.0))
    real = jnp.concatenate([sim, jnp.zeros((w, m, 1))], axis=-1)
    return jnp.where(col < n_cur, real, out)


# --------------------------------------------------------------------------
# assignment
# --------------------------------------------------------------------------

def test_assignment_basic():
    cost = np.array([[0.1, 0.9], [0.8, 0.2]])
    m, ur, uc = linear_assignment(cost, thresh=0.5)
    assert sorted(map(tuple, m)) == [(0, 0), (1, 1)]
    assert len(ur) == len(uc) == 0


def test_assignment_cost_limit():
    cost = np.array([[0.95, 0.9], [0.8, 0.99]])
    m, ur, uc = linear_assignment(cost, thresh=0.5)
    assert len(m) == 0
    assert list(ur) == [0, 1] and list(uc) == [0, 1]


def test_assignment_partial():
    cost = np.array([[0.1, 0.9, 0.95], [0.9, 0.95, 0.97]])
    m, ur, uc = linear_assignment(cost, thresh=0.5)
    assert (0, 0) in set(map(tuple, m))
    assert 1 in ur  # second row unmatched (all costs > limit)


def test_assignment_prefers_global_optimum():
    # greedy would take (0,0)=0.1 then (1,1)=0.8; optimal is 0.2+0.3
    cost = np.array([[0.1, 0.2], [0.3, 0.8]])
    m, _, _ = linear_assignment(cost, thresh=0.9)
    assert sorted(map(tuple, m)) == [(0, 1), (1, 0)]


def test_assignment_empty():
    m, ur, uc = linear_assignment(np.zeros((0, 3)), 0.5)
    assert m.shape == (0, 2) and list(uc) == [0, 1, 2]


# --------------------------------------------------------------------------
# Kalman filter
# --------------------------------------------------------------------------

def test_kf_predict_update_cycle():
    kf = KalmanFilter()
    mean, cov = kf.initiate(np.array([10.0, 20.0, 0.5, 40.0]))
    assert mean.shape == (8,) and cov.shape == (8, 8)
    # constant-velocity: after update with moving measurement, velocity grows
    for t in range(1, 10):
        mean, cov = kf.predict(mean, cov)
        mean, cov = kf.update(mean, cov, np.array([10.0 + 2 * t, 20.0, 0.5, 40.0]))
    assert mean[4] > 1.0  # learned x-velocity ~2
    # prediction tracks the motion
    pred_mean, _ = kf.predict(mean, cov)
    assert abs(pred_mean[0] - (10.0 + 2 * 10)) < 1.0


def test_kf_multi_predict_matches_single():
    kf = KalmanFilter()
    m1, c1 = kf.initiate(np.array([5.0, 5.0, 1.0, 10.0]))
    m2, c2 = kf.initiate(np.array([50.0, 50.0, 0.5, 20.0]))
    means = np.stack([m1, m2])
    covs = np.stack([c1, c2])
    mm, cc = kf.multi_predict(means, covs)
    sm1, sc1 = kf.predict(m1, c1)
    sm2, sc2 = kf.predict(m2, c2)
    np.testing.assert_allclose(mm[0], sm1, atol=1e-10)
    np.testing.assert_allclose(cc[1], sc2, atol=1e-10)


def test_kf_gating_distance():
    kf = KalmanFilter()
    mean, cov = kf.initiate(np.array([10.0, 10.0, 1.0, 5.0]))
    meas = np.array([[10.0, 10.0, 1.0, 5.0], [500.0, 500.0, 1.0, 5.0]])
    d = kf.gating_distance(mean, cov, meas, only_position=True)
    assert d[0] < chi2inv95[2] < d[1]


# --------------------------------------------------------------------------
# recorder + tracker cascade
# --------------------------------------------------------------------------

def identity_embedding(i):
    e = np.zeros(E, np.float32)
    e[i % E] = 1.0
    return e


def make_frame(ids, t):
    """3 objects moving right at 5 px/frame."""
    dets, embs = [], []
    for i in ids:
        x = 50.0 + 5 * t + 100 * i
        y = 60.0 + 30 * i
        dets.append({"bbox": np.array([x, y, x + 40, y + 80]), "score": 0.9})
        embs.append(identity_embedding(i))
    return dets, np.stack(embs) if embs else np.zeros((0, E), np.float32)


def test_recorder_window_and_decay():
    rec = DeviceFeatureRecorder("mot", 8, E, mock_similarity, window=4)
    for f in range(1, 7):
        dets, embs = make_frame([0, 1], f)
        rec.update(f, embs, np.stack([d["bbox"] for d in dets]))
    assert len(rec.frames) == 4
    assert rec.frames == [3, 4, 5, 6]
    # similarity of frame 6 vs frame 3 has shape [2, 3]
    assert rec.all_similarity[6][3].shape == (2, 3)
    # same identity similar, different identity not
    s = rec.all_similarity[6][5]
    assert s[0, 0] > s[0, 1]


def test_tracker_consistent_ids():
    trk = Tracker("mot", max_object=8, embed_dim=E,
                  similarity_fn=mock_similarity, use_lstm=False)
    id_history = []
    for t in range(6):
        dets, embs = make_frame([0, 1, 2], t)
        out = trk.update(dets, embs)
        ids = sorted(tr.track_id for tr in out)
        id_history.append(ids)
    assert id_history[0] == [1, 2, 3]
    for ids in id_history[1:]:
        assert ids == id_history[0], id_history  # no switches, no births


def test_tracker_birth_and_death():
    trk = Tracker("mot", max_object=8, embed_dim=E,
                  similarity_fn=mock_similarity, use_lstm=False)
    for t in range(3):
        dets, embs = make_frame([0, 1], t)
        trk.update(dets, embs)
    # object 1 disappears, object 2 appears
    for t in range(3, 6):
        dets, embs = make_frame([0, 2], t)
        out = trk.update(dets, embs)
    ids = {tr.track_id for tr in out}
    assert 1 in ids           # object 0 keeps its id
    assert max(ids) >= 3      # object 2 got a fresh id
    # dead track eventually removed from the active pool
    assert all(tr.track_id != 2 for tr in trk.tracked_stracks
               if tr.frame_id == trk.frame_id)


def test_tracker_identity_via_appearance_after_crossing():
    """Two objects swap positions; appearance should keep ids straight."""
    trk = Tracker("mot", max_object=8, embed_dim=E,
                  similarity_fn=mock_similarity, use_lstm=False)
    # approach and cross: object 0 moves right, object 1 moves left
    first = {}
    for t in range(8):
        dets = []
        embs = []
        for i, x in [(0, 50.0 + 20 * t), (1, 190.0 - 20 * t)]:
            dets.append({"bbox": np.array([x, 60.0, x + 30, 120.0]),
                         "score": 0.9})
            embs.append(identity_embedding(i))
        out = trk.update(dets, np.stack(embs))
        by_x = sorted(out, key=lambda tr: tr.tlbr[0])
        if t == 0:
            first = {tr.track_id for tr in out}
    # after crossing, the left-most object is identity 1 and must carry the
    # same id it had at frame 0 (appearance won over position)
    assert {tr.track_id for tr in out} == first


def test_tracker_empty_frames():
    trk = Tracker("mot", max_object=8, embed_dim=E,
                  similarity_fn=mock_similarity, use_lstm=False)
    dets, embs = make_frame([0], 0)
    trk.update(dets, embs)
    out = trk.update([], np.zeros((0, E), np.float32))
    assert out == []
    dets, embs = make_frame([0], 2)
    out = trk.update(dets, embs)
    assert len(out) == 1


def test_assignment_infeasible_reduction_exact():
    """The all-above-limit row/col pre-reduction must match the unreduced
    padded solve's objective exactly (the dummies are diagonal, so an
    infeasible row can only take its own dummy -- assignment.py)."""
    from scipy.optimize import linear_sum_assignment as lsa

    def unreduced(cost, thresh):
        n, m = cost.shape
        big = np.full((n + m, n + m), 1e9)
        big[:n, :m] = np.minimum(np.nan_to_num(cost, posinf=1e9), 1e9)
        big[n:, m:] = 0.0
        np.fill_diagonal(big[:n, m:], thresh / 2.0)
        np.fill_diagonal(big[n:, :m], thresh / 2.0)
        rows, cols = lsa(big)
        return big[rows, cols].sum()

    rng = np.random.RandomState(7)
    for _ in range(60):
        n, m = rng.randint(1, 25), rng.randint(1, 25)
        cost = rng.rand(n, m) * 2
        cost[rng.rand(n, m) < rng.rand() * 0.95] = np.inf
        th = float(rng.uniform(0.1, 1.5))
        matches, ur, uc = linear_assignment(cost, th)
        cc = np.nan_to_num(cost, posinf=1e9)
        obj = sum(cc[r, c] for r, c in matches) + (
            (n - len(matches)) + (m - len(matches))) * th / 2
        assert abs(obj - unreduced(cost, th)) < 1e-9
        assert len(matches) + len(ur) == n
        assert len(matches) + len(uc) == m
        assert all(cc[r, c] <= th + 1e-12 for r, c in matches)


def test_kf_multi_update_matches_single():
    kf = KalmanFilter()
    rng = np.random.RandomState(3)
    means, covs, meas = [], [], []
    for _ in range(32):
        m, c = kf.initiate(np.abs(rng.rand(4)) * 80 + 1)
        for _ in range(rng.randint(1, 6)):
            m, c = kf.predict(m, c)
        means.append(m)
        covs.append(c)
        meas.append(np.abs(rng.rand(4)) * 80 + 1)
    nm, nc = kf.multi_update(np.stack(means), np.stack(covs), np.stack(meas))
    for i in range(32):
        m1, c1 = kf.update(means[i], covs[i], meas[i])
        np.testing.assert_allclose(nm[i], m1, atol=1e-10)
        np.testing.assert_allclose(nc[i], c1, atol=1e-10)


def test_stacked_tlbrs_matches_property():
    from deft_tpu.tracking.tracker import STrack, stacked_tlbrs
    from deft_tpu.tracking.tracker import Node

    kf = KalmanFilter()
    rng = np.random.RandomState(5)
    ids = IdAllocator()
    tracks = []
    for i in range(20):
        t = STrack(np.abs(rng.rand(4)) * 50 + 1, 0.9, Node(1, i),
                   use_lstm=False)
        if i % 3 != 2:          # leave some tracks without KF state
            t.activate(kf, 1, ids)
            if i % 3 == 1:
                t.mean, t.covariance = kf.predict(t.mean, t.covariance)
        tracks.append(t)
    got = stacked_tlbrs(tracks)
    want = np.stack([t.tlbr for t in tracks])
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_assignment_rect_matches_padded_square():
    """The rectangular n x (m+n) encoding with dummy diag = thresh must
    produce the padded-square (lapjv extend_cost/cost_limit) optimum:
    square objective c(M) - k*thr + const == rect objective with d = thr
    (assignment.py).  Randomized A/B on objective value and matched sets."""
    from scipy.optimize import linear_sum_assignment as lsa

    def padded_square(cost, thresh):
        n, m = cost.shape
        big = np.full((n + m, n + m), 1e9)
        big[:n, :m] = np.minimum(np.nan_to_num(cost, posinf=1e9), 1e9)
        big[n:, m:] = 0.0
        np.fill_diagonal(big[:n, m:], thresh / 2.0)
        np.fill_diagonal(big[n:, :m], thresh / 2.0)
        rows, cols = lsa(big)
        matches = [(r, c) for r, c in zip(rows, cols) if r < n and c < m]
        return matches

    rng = np.random.RandomState(0)
    for trial in range(60):
        n = rng.randint(1, 12)
        m = rng.randint(1, 12)
        cost = rng.rand(n, m) * 1.4
        # sprinkle gating infs like fuse_motion does
        cost[rng.rand(n, m) < 0.3] = np.inf
        thresh = float(rng.choice([0.3, 0.7, 0.9, 1.1]))
        ref = padded_square(cost, thresh)
        got, ur, uc = linear_assignment(cost, thresh)
        obj_ref = sum(cost[r, c] for r, c in ref) - len(ref) * thresh
        obj_got = sum(cost[r, c] for r, c in got) - len(got) * thresh
        assert np.isclose(obj_ref, obj_got), (trial, ref, got)
        assert all(cost[r, c] <= thresh for r, c in got)
        # unmatched bookkeeping is exact
        assert sorted({r for r, _ in got} | set(ur)) == list(range(n))
        assert sorted({c for _, c in got} | set(uc)) == list(range(m))


def test_get_similarity_matches_per_track_median():
    """Tracker.get_similarity's vectorized gather/median must equal the
    naive per-track STrack.get_similarity path (tracker.py:663-688
    semantics) on a live cascade's pools."""
    rng = np.random.RandomState(3)
    trk = Tracker("mot", max_object=8, embed_dim=E,
                  similarity_fn=mock_similarity, use_lstm=False)
    for t in range(12):
        ids = [i for i in range(6) if (t + i) % 5 != 0]  # churn
        dets, embs = [], []
        for i in ids:
            x = 20.0 + 35 * i + 2 * t
            dets.append({"bbox": np.array([x, 60.0, x + 30, 120.0]),
                         "score": 0.9})
            embs.append(identity_embedding(i))
        trk.update(dets, np.stack(embs))
    pool = trk.tracked_stracks + trk.lost_stracks
    assert len(pool) >= 4
    n_det = len(dets)
    batched = trk.get_similarity(trk.frame_id, pool, n_det)
    for i, tr in enumerate(pool):
        naive = tr.get_similarity(trk.frame_id, trk.recorder)
        if naive is None:
            assert np.allclose(batched[i], 0.0)
        else:
            np.testing.assert_allclose(
                batched[i, : naive.shape[0]], naive, rtol=1e-6, atol=1e-6)
