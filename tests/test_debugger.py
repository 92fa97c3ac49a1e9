"""Debugger board: per-class colormaps, themes, pose overlays, --debug hook
(reference surface: debugger.py:21-899, hooks detector.py:585-668)."""

import os

import numpy as np
import pytest

from deft_tpu.utils.visualize import Debugger, _class_palette


class FakeInfo:
    class_name = ["person", "car", "bike"]


def test_palette_deterministic_distinct():
    p = _class_palette(80)
    assert p.shape == (80, 3)
    assert len({tuple(c) for c in p}) == 80          # all distinct
    np.testing.assert_array_equal(p, _class_palette(80))


def test_gen_colormap_per_class_and_theme():
    dbg_w = Debugger(dataset=FakeInfo(), theme="white")
    dbg_b = Debugger(dataset=FakeInfo(), theme="black")
    hm = np.zeros((8, 8, 3), np.float32)
    hm[2, 2, 0] = 1.0   # class 0 peak -> "ignore" remap to 0.5
    hm[5, 5, 1] = 0.8   # class 1 peak
    cm = dbg_w.gen_colormap(hm)
    assert cm.shape == (32, 32, 3) and cm.dtype == np.uint8
    # the two peaks must be colored differently (per-class colors)
    c0 = cm[8, 8].astype(int)
    c1 = cm[20, 20].astype(int)
    assert np.abs(c0 - c1).sum() > 30, (c0, c1)
    # themes give different colors for the same class
    cb = dbg_b.gen_colormap(hm)
    assert np.abs(cm[20, 20].astype(int) - cb[20, 20].astype(int)).sum() > 30
    # ignore-region remap: exact-1.0 cells render at half intensity
    hm2 = np.zeros((8, 8, 1), np.float32)
    hm2[1, 1, 0] = 1.0
    hm2[6, 6, 0] = 0.5
    cm2 = dbg_b.gen_colormap(hm2)
    np.testing.assert_array_equal(cm2[4, 4], cm2[24, 24])


def test_gen_colormap_hp_and_pose_overlay():
    dbg = Debugger(dataset=FakeInfo(), theme="black")
    hp = np.zeros((8, 8, 17), np.float32)
    hp[3, 3, 0] = 1.0
    cm = dbg.gen_colormap_hp(hp)
    assert cm.shape == (32, 32, 3)

    dbg.add_img(np.zeros((64, 64, 3), np.uint8), "pose")
    pts = np.stack([np.linspace(5, 58, 17), np.linspace(5, 58, 17)], 1)
    dbg.add_coco_hp(pts, img_id="pose")
    assert dbg.imgs["pose"].sum() > 0                # joints + limbs drawn


def test_board_blend_track_id_arrow_save(tmp_path):
    dbg = Debugger(dataset=FakeInfo(), theme="white")
    img = np.full((32, 32, 3), 200, np.uint8)
    dbg.add_img(img, "generic")
    dbg.add_coco_bbox([4, 4, 20, 20], 1, 0.9, img_id="generic")
    dbg.add_tracking_id((12, 12), 7, img_id="generic")
    dbg.add_arrow((8, 8), (16, 16), img_id="generic")
    hm = np.zeros((8, 8, 3), np.float32)
    hm[4, 4, 2] = 0.9
    dbg.add_blend_img(img, dbg.gen_colormap(hm), "pred_hm")
    dbg.save_all_imgs(str(tmp_path), prefix="01_")
    assert sorted(os.listdir(tmp_path)) == ["01_generic.png", "01_pred_hm.png"]


@pytest.mark.slow
def test_detector_debug_board_e2e(tmp_path):
    """--debug 2 on a synthetic MOT frame writes the generic + previous +
    pred_hm boards."""
    from deft_tpu.config import mot_config
    from deft_tpu.inference.detector import Detector

    cfg = mot_config(input_h=96, input_w=128, dla_node="conv",
                     compute_dtype="float32", track_thresh=1e-3,
                     vis_thresh=0.0, debug=2, save_dir=str(tmp_path))
    det = Detector(cfg)
    det.img_height, det.img_width = 240, 320
    frame = np.full((240, 320, 3), 60, np.uint8)
    frame[40:140, 60:120] = (200, 80, 80)
    det.run(frame)
    det.run(frame)
    files = sorted(os.listdir(os.path.join(str(tmp_path), "debug")))
    assert "00001_generic.png" in files
    assert "00001_previous.png" in files
    assert "00001_pred_hm.png" in files
    assert "00002_generic.png" in files
