"""End-to-end train.py entry-point tests: periodic validation, --test
short-circuit, resumable checkpoints (reference train.py:68-71,104-107)."""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _gen_mot(data_root):
    """Synthetic MOT17 layout + COCO conversion with half splits."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from make_synthetic_mot import make_sequence
        import convert_mot_to_coco as conv
    finally:
        sys.path.pop(0)
    mot_dir = os.path.join(data_root, "mot17")
    for i in range(2):
        make_sequence(os.path.join(mot_dir, "train"), f"SYN-{i+1:02d}",
                      n_frames=12, w=320, h=180, n_obj=3, seed=i)
    conv.convert(mot_dir, "train", half=True)
    return mot_dir


@pytest.mark.slow
def test_train_val_test_surface(tmp_path):
    """train.py logs val losses at val_intervals, writes a resumable
    checkpoint, and --test ends with the MOTA/IDF1 table."""
    sys.path.insert(0, REPO)
    try:
        import train as train_entry
    finally:
        sys.path.pop(0)

    data_root = str(tmp_path / "data")
    exp_root = str(tmp_path / "exp")
    _gen_mot(data_root)

    common = [
        "tracking", "--dataset", "mot", "--dataset_version", "17halftrain",
        "--input_h", "64", "--input_w", "96", "--dla_node", "conv",
        "--exp_id", "valtest", "--exp_dir", exp_root, "--data_dir", data_root,
        "--num_workers", "2",
    ]
    train_entry.main(common + [
        "--batch_size", "8", "--num_epochs", "1", "--num_iters", "2",
        "--val_intervals", "1",
    ])

    save_dir = os.path.join(exp_root, "tracking", "valtest")
    log = open(os.path.join(save_dir, "log.txt")).read()
    assert "VAL" in log, log          # periodic val losses logged
    assert "matching" in log
    assert os.path.isdir(os.path.join(save_dir, "model_last"))

    # checkpoint carries optimizer state + step (resume fidelity)
    from deft_tpu.train.checkpoint import _restore_numpy
    loaded = _restore_numpy(os.path.join(save_dir, "model_last"))
    assert "opt_state" in loaded and int(loaded["step"]) >= 1

    # --test short-circuit: straight to tracking eval + metrics table
    metrics = train_entry.main(common + ["--test"])
    assert metrics and "mota" in metrics["overall"]
    assert "idf1" in metrics["overall"]
