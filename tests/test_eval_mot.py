"""Evaluator sanity tests with hand-constructed scenarios."""

import numpy as np

from tools.eval_mot import combine, evaluate_sequence


def seq_from(rows):
    """rows: (frame, id, x, y, w, h)"""
    out = {}
    for frame, tid, x, y, w, h in rows:
        out.setdefault(frame, []).append((tid, np.array([x, y, w, h], float)))
    return out


def test_perfect_tracking():
    rows = [(f, 1, 10 + f, 10, 20, 40) for f in range(1, 11)]
    rows += [(f, 2, 100, 50 + f, 20, 40) for f in range(1, 11)]
    gt = seq_from(rows)
    m = evaluate_sequence(gt, seq_from(rows))
    assert m["mota"] == 1.0
    assert m["idf1"] == 1.0
    assert m["num_switches"] == 0
    assert m["mostly_tracked"] == 2 and m["mostly_lost"] == 0
    assert abs(m["motp"] - 1.0) < 1e-9


def test_id_switch_detected():
    gt = seq_from([(f, 1, 10, 10, 20, 40) for f in range(1, 11)])
    # hypothesis switches id at frame 6
    hyp_rows = [(f, 101 if f <= 5 else 202, 10, 10, 20, 40)
                for f in range(1, 11)]
    m = evaluate_sequence(gt, seq_from(hyp_rows))
    assert m["num_switches"] == 1
    assert m["mota"] == 1.0 - 1 / 10
    # idf1: best assignment covers 5 of 10 gt frames
    assert abs(m["idf1"] - 2 * 5 / (2 * 5 + 5 + 5)) < 1e-9


def test_false_positives_and_misses():
    gt = seq_from([(f, 1, 10, 10, 20, 40) for f in range(1, 6)])
    hyp = seq_from(
        [(f, 7, 10, 10, 20, 40) for f in range(1, 4)]       # 3 TP, 2 FN
        + [(f, 8, 200, 200, 20, 40) for f in range(1, 6)]   # 5 FP
    )
    m = evaluate_sequence(gt, hyp)
    assert m["num_misses"] == 2
    assert m["num_false_positives"] == 5
    assert m["mota"] == 1.0 - (2 + 5 + 0) / 5


def test_mostly_lost():
    gt = seq_from([(f, 1, 10, 10, 20, 40) for f in range(1, 11)])
    hyp = seq_from([(1, 5, 10, 10, 20, 40)])  # only covers 10%
    m = evaluate_sequence(gt, hyp)
    assert m["mostly_lost"] == 1 and m["mostly_tracked"] == 0


def test_persistent_match_prevents_greedy_switch():
    """CLEAR keeps an existing match even when a new hyp is slightly closer."""
    gt = {}
    hyp = {}
    for f in range(1, 6):
        gt[f] = [(1, np.array([10.0, 10, 20, 40]))]
        hyp[f] = [(101, np.array([12.0, 10, 20, 40]))]
        if f >= 3:
            hyp[f].append((202, np.array([10.0, 10, 20, 40])))  # exact match
    m = evaluate_sequence(gt, hyp)
    # 101 stays matched (persistence) -> 202 is a pure FP, no switch
    assert m["num_switches"] == 0
    assert m["num_false_positives"] == 3


def test_combine_weighted():
    a = evaluate_sequence(
        seq_from([(f, 1, 10, 10, 20, 40) for f in range(1, 11)]),
        seq_from([(f, 1, 10, 10, 20, 40) for f in range(1, 11)]),
    )
    b = evaluate_sequence(
        seq_from([(f, 1, 10, 10, 20, 40) for f in range(1, 11)]),
        seq_from([]),
    )
    overall = combine([a, b])
    assert abs(overall["mota"] - 0.5) < 1e-9
    assert overall["num_misses"] == 10


# ---- golden fixture table (py-motmetrics semantics, hand-computed) ---------
# Each case documents the exact expectation and the rule it pins down,
# mirroring the reference's motmetrics-based eval
# (/root/reference/src/tools/eval_motchallenge.py:59-186).


def test_golden_swap_double_switch():
    """Two crossing tracks whose hypothesis ids swap at frame 6: exactly two
    SWITCH events (one per gt), zero misses/FPs; MOTA = 1 - 2/20."""
    gt = seq_from(
        [(f, 1, 10, 10, 20, 40) for f in range(1, 11)]
        + [(f, 2, 200, 10, 20, 40) for f in range(1, 11)]
    )
    hyp = seq_from(
        [(f, 101 if f <= 5 else 102, 10, 10, 20, 40) for f in range(1, 11)]
        + [(f, 102 if f <= 5 else 101, 200, 10, 20, 40) for f in range(1, 11)]
    )
    m = evaluate_sequence(gt, hyp)
    assert m["num_switches"] == 2
    assert m["num_false_positives"] == 0 and m["num_misses"] == 0
    assert abs(m["mota"] - (1.0 - 2 / 20)) < 1e-9
    # IDF1: each hyp id covers 5 frames of each gt; any assignment gives
    # IDTP = 10, IDFP = IDFN = 10 -> IDF1 = 2*10 / (2*10 + 10 + 10)
    assert abs(m["idf1"] - 0.5) < 1e-9


def test_golden_fragmentation_no_switch():
    """Matched 1-3, present-but-missed 4-5, re-acquired 6-8 by the SAME id:
    one FRAG, zero switches, FN = 2."""
    gt = seq_from([(f, 1, 10, 10, 20, 40) for f in range(1, 9)])
    hyp = seq_from([(f, 7, 10, 10, 20, 40) for f in (1, 2, 3, 6, 7, 8)])
    m = evaluate_sequence(gt, hyp)
    assert m["num_fragmentations"] == 1
    assert m["num_switches"] == 0
    assert m["num_misses"] == 2 and m["num_false_positives"] == 0
    assert abs(m["mota"] - (1.0 - 2 / 8)) < 1e-9


def test_golden_gap_resume_different_id_is_switch_not_frag_only():
    """Re-acquired after a gap by a DIFFERENT id: one SWITCH and one FRAG
    (motmetrics counts both on the re-acquisition frame)."""
    gt = seq_from([(f, 1, 10, 10, 20, 40) for f in range(1, 9)])
    hyp = seq_from(
        [(f, 7, 10, 10, 20, 40) for f in (1, 2, 3)]
        + [(f, 8, 10, 10, 20, 40) for f in (6, 7, 8)]
    )
    m = evaluate_sequence(gt, hyp)
    assert m["num_switches"] == 1
    assert m["num_fragmentations"] == 1


def test_golden_persistent_match_beats_better_iou():
    """The keep-persistent-match rule: once g-A is matched, a later
    better-overlapping hypothesis B must NOT steal the match while A still
    has IoU >= 0.5 -- B becomes a false positive, and no switch occurs."""
    gt = seq_from([(f, 1, 0, 0, 100, 100) for f in range(1, 6)])
    # A: shifted 25px -> IoU = 75*100 / (2*100*100 - 75*100) = 0.6
    hyp_rows = [(f, 50, 25, 0, 100, 100) for f in range(1, 6)]
    # B appears from frame 2 dead-on (IoU 1.0)
    hyp_rows += [(f, 60, 0, 0, 100, 100) for f in range(2, 6)]
    m = evaluate_sequence(gt, seq_from(hyp_rows))
    assert m["num_switches"] == 0
    assert m["num_false_positives"] == 4          # B, frames 2-5
    assert m["num_misses"] == 0
    # matches stay with A at IoU 0.6 exactly
    exp_iou = (75 * 100) / (100 * 100 * 2 - 75 * 100)
    assert abs(m["motp"] - exp_iou) < 1e-9


def test_golden_iou_exactly_half_is_valid():
    """distth boundary: IoU == 0.5 is still a valid correspondence
    (motmetrics: 1 - IoU <= 0.5 kept)."""
    gt = seq_from([(1, 1, 0, 0, 100, 100)])
    # full-width box of height 50 inside: inter 50*100=5000, union 10000
    hyp = seq_from([(1, 9, 0, 0, 100, 50)])
    m = evaluate_sequence(gt, hyp)
    assert m["num_matches"] == 1
    assert m["num_misses"] == 0 and m["num_false_positives"] == 0
    assert abs(m["motp"] - 0.5) < 1e-9


def test_golden_mt_ml_boundaries():
    """MT at coverage >= 0.8; ML strictly < 0.2 (a 2/10 track is partially
    tracked, not mostly lost -- motmetrics track_ratios semantics)."""
    gt = seq_from(
        [(f, 1, 10, 10, 20, 40) for f in range(1, 11)]      # covered 8/10
        + [(f, 2, 200, 10, 20, 40) for f in range(1, 11)]   # covered 2/10
        + [(f, 3, 400, 10, 20, 40) for f in range(1, 11)]   # covered 1/10
    )
    hyp = seq_from(
        [(f, 11, 10, 10, 20, 40) for f in range(1, 9)]
        + [(f, 12, 200, 10, 20, 40) for f in (1, 2)]
        + [(f, 13, 400, 10, 20, 40) for f in (1,)]
    )
    m = evaluate_sequence(gt, hyp)
    assert m["mostly_tracked"] == 1
    assert m["mostly_lost"] == 1      # only the 1/10 track
    assert m["num_gt_tracks"] == 3


def test_golden_idf1_disjoint_covers():
    """One gt covered 6 frames by id A and 4 by id B (disjoint): the global
    assignment keeps A; IDTP=6, IDFP=4, IDFN=4 -> IDF1 = 12/20."""
    gt = seq_from([(f, 1, 10, 10, 20, 40) for f in range(1, 11)])
    hyp = seq_from(
        [(f, 70, 10, 10, 20, 40) for f in range(1, 7)]
        + [(f, 71, 10, 10, 20, 40) for f in range(7, 11)]
    )
    m = evaluate_sequence(gt, hyp)
    assert m["idtp"] == 6 and m["idfp"] == 4 and m["idfn"] == 4
    assert abs(m["idf1"] - 12 / 20) < 1e-9
