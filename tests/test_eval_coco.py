"""Hand-computed golden fixtures for the bundled COCO evaluator
(tools/eval_coco.py), pinning the COCOeval protocol: 101-point interpolated
AP, IoU threshold sweep, crowd/ignore semantics, area ranges, maxDets."""

import numpy as np
import pytest

from deft_tpu.data.coco_index import CocoIndex
from tools.eval_coco import IOU_THRS, bbox_iou_xywh, evaluate


def make_index(anns, imgs=(1,), cats=(1,)):
    ds = {
        "images": [{"id": i} for i in imgs],
        "categories": [{"id": c} for c in cats],
        "annotations": [
            {"id": k + 1, "image_id": a.get("image_id", 1),
             "category_id": a.get("category_id", 1), "bbox": a["bbox"],
             "area": a["bbox"][2] * a["bbox"][3],
             "iscrowd": a.get("iscrowd", 0)}
            for k, a in enumerate(anns)
        ],
    }
    return CocoIndex(dataset=ds)


def det(bbox, score, image_id=1, category_id=1):
    return {"image_id": image_id, "category_id": category_id,
            "bbox": list(bbox), "score": score}


def test_iou_crowd_semantics():
    dt = np.array([[0.0, 0.0, 10, 10]])
    gt = np.array([[0.0, 0.0, 20, 20]])
    plain = bbox_iou_xywh(dt, gt, np.array([0]))
    crowd = bbox_iou_xywh(dt, gt, np.array([1]))
    np.testing.assert_allclose(plain[0, 0], 100.0 / 400.0)
    np.testing.assert_allclose(crowd[0, 0], 1.0)  # inter / det area


def test_perfect_detection():
    gts = [{"bbox": [10, 10, 50, 50]}, {"bbox": [100, 20, 40, 60]}]
    dets = [det(g["bbox"], s) for g, s in zip(gts, (0.9, 0.8))]
    stats = evaluate(make_index(gts), dets)
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["AP50"] == pytest.approx(1.0)
    assert stats["AR100"] == pytest.approx(1.0)


def test_101_point_interpolation():
    """TP(.9), FP(.8), TP(.7) over 2 GTs: rc=[.5,.5,1], pr=[1,.5,2/3];
    envelope -> 1.0 for r<=0.5 (51 grid points), 2/3 above (50 points)."""
    gts = [{"bbox": [0, 0, 10, 10]}, {"bbox": [50, 50, 10, 10]}]
    dets = [det([0, 0, 10, 10], 0.9), det([200, 200, 10, 10], 0.8),
            det([50, 50, 10, 10], 0.7)]
    stats = evaluate(make_index(gts), dets)
    expect = (51 * 1.0 + 50 * (2.0 / 3.0)) / 101.0
    assert stats["AP50"] == pytest.approx(expect)
    assert stats["AP"] == pytest.approx(expect)  # IoU=1 matches at every thr
    assert stats["AR100"] == pytest.approx(1.0)


def test_iou_threshold_sweep():
    """A det with IoU 0.62 counts only at thresholds .5/.55/.6 -> AP=0.3."""
    gts = [{"bbox": [0, 0, 10, 10]}]
    dets = [det([0, 0, 10, 6.2], 0.9)]
    assert float((0.62 >= IOU_THRS).sum()) == 3
    stats = evaluate(make_index(gts), dets)
    assert stats["AP"] == pytest.approx(0.3)
    assert stats["AP50"] == pytest.approx(1.0)
    assert stats["AP75"] == pytest.approx(0.0)


def test_crowd_absorbs_detection_without_fp():
    """A det matching only a crowd GT is ignored, not a false positive."""
    gts = [{"bbox": [0, 0, 10, 10]},
           {"bbox": [100, 100, 50, 50], "iscrowd": 1}]
    dets = [det([0, 0, 10, 10], 0.9), det([110, 110, 20, 20], 0.8)]
    stats = evaluate(make_index(gts), dets)
    assert stats["AP"] == pytest.approx(1.0)
    # without the crowd flag the second det is a plain FP after full recall
    gts2 = [{"bbox": [0, 0, 10, 10]}]
    stats2 = evaluate(make_index(gts2), dets)
    assert stats2["AP"] == pytest.approx(1.0)  # FP after last TP: no effect
    dets3 = [det([110, 110, 20, 20], 0.95), det([0, 0, 10, 10], 0.9)]
    stats3 = evaluate(make_index(gts2), dets3)
    assert stats3["AP"] < 1.0  # FP ranked above the TP drags precision


def test_area_ranges():
    gts = [{"bbox": [0, 0, 16, 16]}]          # small (256 < 32^2)
    dets = [det([0, 0, 16, 16], 0.9)]
    stats = evaluate(make_index(gts), dets)
    assert stats["APs"] == pytest.approx(1.0)
    assert stats["APl"] == -1.0               # no large GT -> undefined
    assert stats["APm"] == -1.0


def test_max_dets_recall():
    gts = [{"bbox": [0, 0, 10, 10]}, {"bbox": [50, 50, 10, 10]}]
    dets = [det([0, 0, 10, 10], 0.9), det([50, 50, 10, 10], 0.8)]
    stats = evaluate(make_index(gts), dets)
    assert stats["AR1"] == pytest.approx(0.5)
    assert stats["AR10"] == pytest.approx(1.0)


def test_multi_category_mean():
    """AP averages over categories with GT; absent categories excluded."""
    gts = [{"bbox": [0, 0, 10, 10], "category_id": 1},
           {"bbox": [50, 50, 10, 10], "category_id": 2}]
    dets = [det([0, 0, 10, 10], 0.9, category_id=1),
            det([200, 200, 10, 10], 0.8, category_id=2)]  # miss for cat 2
    stats = evaluate(make_index(gts, cats=(1, 2, 3)), dets)
    assert stats["AP"] == pytest.approx(0.5)  # (1.0 + 0.0) / 2, cat 3 absent


def test_coco_dataset_run_eval(tmp_path):
    """CocoDataset.run_eval computes mAP from tracker-style results."""
    import json
    import os

    from deft_tpu.config import Config, finalize, wire_dataset
    from deft_tpu.data.datasets import get_dataset_info

    data_dir = tmp_path / "coco"
    (data_dir / "annotations").mkdir(parents=True)
    (data_dir / "val2017").mkdir()
    ds = {
        "images": [{"id": 1, "file_name": "000001.jpg",
                    "width": 128, "height": 128}],
        "categories": [{"id": 7, "name": "thing"}],
        "annotations": [{"id": 1, "image_id": 1, "category_id": 7,
                         "bbox": [10, 10, 30, 40], "area": 1200,
                         "iscrowd": 0}],
    }
    with open(data_dir / "annotations" / "instances_val2017.json", "w") as f:
        json.dump(ds, f)

    from deft_tpu.data.datasets.coco_det import CocoDataset

    cfg = wire_dataset(
        finalize(Config(task="ctdet", dataset="coco",
                        input_h=128, input_w=128)),
        get_dataset_info("coco"))
    dataset = CocoDataset(cfg, "val", data_dir=str(data_dir))
    results = {1: [{"bbox": np.array([10, 10, 40, 50], np.float32),
                    "score": 0.9, "class": 1}]}
    stats = dataset.run_eval(results, str(tmp_path / "out"))
    assert stats["AP"] == pytest.approx(1.0)
    assert os.path.exists(tmp_path / "out" / "results_coco.json")
