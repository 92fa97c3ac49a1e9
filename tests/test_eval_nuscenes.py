"""Golden fixtures for the devkit-free nuScenes tracking evaluator.

Every expected value is hand-computed from the published definitions
(AB3DMOT recall-normalized MOTA adopted by the nuScenes benchmark; 2 m
center-distance gate; AMOTA/AMOTP = means over 40 recall levels)."""

import json
import os

import numpy as np
import pytest

from tools.eval_nuscenes import (evaluate_class, evaluate_submission,
                                 tracking_name)


def scene(frames):
    """[frame] -> [(tid, xy[, score])] wrapped as a single-scene list."""
    return [frames]


def test_perfect_tracking_is_amota_1():
    gt = scene([[(1, [0.0, 0.0]), (2, [10.0, 0.0])],
                [(1, [1.0, 0.0]), (2, [11.0, 0.0])]])
    pred = scene([[("a", [0.0, 0.0], 0.9), ("b", [10.0, 0.0], 0.9)],
                  [("a", [1.0, 0.0], 0.9), ("b", [11.0, 0.0], 0.9)]])
    r = evaluate_class(gt, pred)
    assert r["gt"] == 4
    assert r["amota"] == pytest.approx(1.0)
    assert r["amotp"] == pytest.approx(0.0)
    assert r["mota"] == pytest.approx(1.0)
    assert r["recall"] == pytest.approx(1.0)
    assert r["ids"] == 0 and r["frag"] == 0


def test_half_recall_clean_half():
    """Track B never predicted: levels up to r=0.5 are clean (the missing
    half is exactly the (1-r_hat)P discount), levels above are 0 ->
    AMOTA = 0.5; AMOTP averages 0 over reachable and the 2 m gate over
    unreachable levels -> 1.0."""
    gt = scene([[(1, [0.0, 0.0]), (2, [10.0, 0.0])],
                [(1, [1.0, 0.0]), (2, [11.0, 0.0])]])
    pred = scene([[("a", [0.0, 0.0], 0.9)],
                  [("a", [1.0, 0.0], 0.9)]])
    r = evaluate_class(gt, pred)
    assert r["recall"] == pytest.approx(0.5)
    assert r["amota"] == pytest.approx(0.5)
    assert r["amotp"] == pytest.approx(1.0)
    # reachable levels are error-free after the recall discount
    assert r["motar"] == pytest.approx(1.0)


def test_id_switch_costs_1_over_p():
    gt = scene([[(1, [float(t), 0.0])] for t in range(4)])
    pred = scene([[("a", [0.0, 0.0], 0.9)], [("a", [1.0, 0.0], 0.9)],
                  [("b", [2.0, 0.0], 0.9)], [("b", [3.0, 0.0], 0.9)]])
    r = evaluate_class(gt, pred)
    assert r["ids"] == 1
    # every level: thresh 0.9, r_hat=1, MOTAR = 1 - 1/4
    assert r["amota"] == pytest.approx(0.75)
    assert r["mota"] == pytest.approx(0.75)
    assert r["frag"] == 0


def test_high_score_fp_kills_every_level():
    """An FP scored above every TP survives all thresholds: with P=2 and
    2 FPs, MOTAR = max(0, 1 - 2/2) = 0 at every level."""
    gt = scene([[(1, [0.0, 0.0])], [(1, [1.0, 0.0])]])
    pred = scene([[("a", [0.0, 0.0], 0.9), ("x", [100.0, 0.0], 0.95)],
                  [("a", [1.0, 0.0], 0.9), ("x", [100.0, 0.0], 0.95)]])
    r = evaluate_class(gt, pred)
    assert r["amota"] == pytest.approx(0.0)
    assert r["fp"] == 2


def test_gate_is_2m():
    gt = scene([[(1, [0.0, 0.0])]])
    ok = evaluate_class(gt, scene([[("a", [1.9, 0.0], 0.9)]]))
    far = evaluate_class(gt, scene([[("a", [2.1, 0.0], 0.9)]]))
    assert ok["recall"] == pytest.approx(1.0)
    assert far["recall"] == 0.0 and far["amota"] == 0.0


def test_fragmentation_counted_on_reacquire():
    gt = scene([[(1, [float(t), 0.0])] for t in range(3)])
    pred = scene([[("a", [0.0, 0.0], 0.9)], [],
                  [("a", [2.0, 0.0], 0.9)]])
    r = evaluate_class(gt, pred)
    assert r["frag"] == 1
    assert r["ids"] == 0


def test_tracking_name_mapping():
    assert tracking_name("vehicle.car") == "car"
    assert tracking_name("human.pedestrian.adult") == "pedestrian"
    assert tracking_name("car") == "car"
    assert tracking_name("movable_object.barrier") == ""


def test_evaluate_submission_from_schema(tmp_path):
    """End-to-end over raw v1.0 tables: 1 scene, 2 samples, one car track
    predicted perfectly, one pedestrian missed entirely."""
    version = tmp_path / "v1.0-trainval"
    version.mkdir()
    samples = [
        {"token": "s0", "next": "s1", "prev": "", "scene_token": "sc"},
        {"token": "s1", "next": "", "prev": "s0", "scene_token": "sc"},
    ]
    cats = [{"token": "c_car", "name": "vehicle.car"},
            {"token": "c_ped", "name": "human.pedestrian.adult"}]
    insts = [{"token": "i_car", "category_token": "c_car"},
             {"token": "i_ped", "category_token": "c_ped"}]
    anns = []
    for t, tok in enumerate(["s0", "s1"]):
        anns.append({"token": f"a{t}", "sample_token": tok,
                     "instance_token": "i_car",
                     "translation": [float(t), 0.0, 0.0]})
        anns.append({"token": f"p{t}", "sample_token": tok,
                     "instance_token": "i_ped",
                     "translation": [50.0 + t, 0.0, 0.0]})
    scenes = [{"token": "sc", "name": "scene-0001",
               "first_sample_token": "s0"}]
    for name, table in [("sample", samples), ("category", cats),
                        ("instance", insts), ("sample_annotation", anns),
                        ("scene", scenes)]:
        with open(version / f"{name}.json", "w") as f:
            json.dump(table, f)
    sub = {"meta": {}, "results": {
        tok: [{"tracking_name": "car", "tracking_id": 7,
               "tracking_score": 0.8,
               "translation": [float(t), 0.0, 0.0]}]
        for t, tok in enumerate(["s0", "s1"])}}
    sub_path = tmp_path / "sub.json"
    with open(sub_path, "w") as f:
        json.dump(sub, f)

    res = evaluate_submission(str(sub_path), str(tmp_path))
    assert set(res["classes"]) == {"car", "pedestrian"}
    assert res["classes"]["car"]["amota"] == pytest.approx(1.0)
    assert res["classes"]["pedestrian"]["amota"] == pytest.approx(0.0)
    assert res["overall"]["amota"] == pytest.approx(0.5)
    assert res["overall"]["gt"] == 4
