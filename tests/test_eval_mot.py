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
