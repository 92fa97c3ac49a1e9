"""Data pipeline tests on a synthetic COCO-video dataset."""

import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from deft_tpu.config import mot_config
from deft_tpu.data.coco_index import CocoIndex
from deft_tpu.data.generic_dataset import GenericDataset
from deft_tpu.data.loader import DataLoader, collate
from deft_tpu.data.trajectory_dataset import TrajectoryDataset


def make_synthetic_coco(tmp_path, n_videos=2, n_frames=20, img_w=128, img_h=96):
    """Synthetic video dataset: 2 objects moving linearly, images on disk."""
    import cv2

    images, annotations, videos = [], [], []
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir, exist_ok=True)
    aid = 1
    iid = 1
    for v in range(1, n_videos + 1):
        videos.append({"id": v, "file_name": f"video{v}"})
        for f in range(1, n_frames + 1):
            fname = f"v{v}_f{f:03d}.jpg"
            img = np.full((img_h, img_w, 3), 30, np.uint8)
            anns_here = []
            for obj in range(2):
                x = 5 + 3 * f + 40 * obj
                y = 10 + 25 * obj
                w, h = 14, 20
                if x + w >= img_w:
                    continue
                img[y: y + h, x: x + w] = (50 + 80 * obj, 200 - 60 * obj, 120)
                anns_here.append({
                    "id": aid, "image_id": iid, "category_id": 1,
                    "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0,
                    "track_id": obj + 1,
                })
                aid += 1
            cv2.imwrite(str(img_dir / fname), img)
            images.append({"id": iid, "file_name": fname, "video_id": v,
                           "frame_id": f})
            annotations.extend(anns_here)
            iid += 1
    dataset = {
        "images": images, "annotations": annotations, "videos": videos,
        "categories": [{"id": 1, "name": "object"}],
    }
    ann_path = tmp_path / "anns.json"
    with open(ann_path, "w") as fjson:
        json.dump(dataset, fjson)
    return str(ann_path), str(img_dir)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("synthdata")
    return make_synthetic_coco(tmp)


@pytest.fixture(scope="module")
def cfg():
    return mot_config(input_h=96, input_w=128, max_object=8)


def make_ds(cfg, synth, split="train"):
    ann_path, img_dir = synth

    class DS(GenericDataset):
        num_categories = 1
        class_name = ("object",)
        cat_ids = {1: 1}
        max_objs = 16

    return DS(cfg, split, ann_path, img_dir)


def test_sample_shapes_and_targets(cfg, synth):
    ds = make_ds(cfg, synth)
    np.random.seed(0)
    s = ds[5]
    assert s["image"].shape == (96, 128, 3)
    assert s["pre_image"].shape == (96, 128, 3)
    assert s["hm"].shape == (24, 32, 1)
    assert s["labels"].shape == (9, 9)
    assert s["centers_pre"].shape == (8, 2)
    assert s["mask"].sum() >= 1
    # heatmap peaks at annotated centers
    k = int(np.argmax(s["mask"]))
    ind = int(s["ind"][k])
    y, x = divmod(ind, 32)
    assert s["hm"][y, x, 0] == 1.0
    # wh target positive
    assert (s["wh"][s["mask"] > 0] > 0).all()


def test_afe_labels_consistent(cfg, synth):
    ds = make_ds(cfg, synth)
    np.random.seed(1)
    s = ds[10]
    labels = s["labels"]
    mask_pre, mask_next = s["mask_pre"], s["mask_next"]
    n = 8
    # every valid pre row has exactly one positive (a match or the false col)
    for i in range(n):
        if mask_pre[i] > 0:
            assert labels[i].sum() == 1.0
    # false row/col of invalid slots all zero
    for i in range(n):
        if mask_pre[i] == 0:
            assert labels[i].sum() == 0.0
    assert mask_pre[-1] == 1.0 and mask_next[-1] == 1.0
    # padded centers out of range
    assert (np.abs(s["centers_pre"][mask_pre[:-1] == 0]) > 1.0).all()


def test_eval_split_uses_previous_frame(cfg, synth):
    ds = make_ds(cfg, synth, split="val")
    np.random.seed(2)
    s = ds[5]
    assert "pre_image" in s


def test_loader_batches(cfg, synth):
    ds = make_ds(cfg, synth)
    dl = DataLoader(ds, batch_size=4, num_workers=2, seed=3)
    batch = next(iter(dl))
    assert batch["image"].shape == (4, 96, 128, 3)
    assert batch["labels"].shape == (4, 9, 9)
    assert len(dl) == len(ds) // 4


def test_trajectory_dataset(cfg, synth):
    ann_path, img_dir = synth
    ds = TrajectoryDataset(cfg, "train", ann_path, img_dir)
    np.random.seed(4)
    traj, target = ds[15]
    assert traj.shape[1] == 11
    assert target.shape == (5, 4)
    assert traj.shape[0] >= 2
    # trajectory x-centers increase (objects move right at 3 px/frame)
    assert traj[-1, 0] > traj[0, 0]
    # future dx positive
    assert (target[:, 0] > 0).all()


def test_numpy_hugepage_madvise_disabled():
    """Importing the package turns off numpy's MADV_HUGEPAGE (measured
    30-70x elementwise stalls under THP defrag=madvise, see __init__)."""
    try:
        from numpy._core.multiarray import _get_madvise_hugepage
    except ImportError:
        from numpy.core.multiarray import _get_madvise_hugepage
    assert _get_madvise_hugepage() is False


def test_loader_process_pool(tmp_path):
    """Forkserver worker-process mode: correct shapes, full epoch coverage,
    pool reuse across epochs (workers stay jax-free by design)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from make_synthetic_mot import make_sequence
        import convert_mot_to_coco as conv
    finally:
        sys.path.pop(0)
    from deft_tpu.config import mot_config as mk
    from deft_tpu.data.datasets import get_dataset

    mot_dir = os.path.join(str(tmp_path), "mot17")
    make_sequence(os.path.join(mot_dir, "train"), "SYN-01",
                  n_frames=10, w=320, h=180, n_obj=2, seed=0)
    conv.convert(mot_dir, "train", half=False)
    cfg2 = mk(input_h=96, input_w=160, dataset_version="17trainval")
    ds = get_dataset("mot")(cfg2, "train", data_dir=mot_dir)
    dl = DataLoader(ds, batch_size=2, num_workers=2, seed=5,
                    use_processes=True)
    assert dl.use_processes
    try:
        for epoch in range(2):  # second epoch reuses the started pool
            n = 0
            for batch in dl:
                assert batch["image"].shape == (2, 96, 160, 3)
                assert np.isfinite(batch["image"]).all()
                n += batch["image"].shape[0]
            assert n == (len(ds) // 2) * 2
    finally:
        dl.close()
