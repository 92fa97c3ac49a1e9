"""Alternative-architecture and CLI tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deft_tpu.cli import parse_config
from deft_tpu.config import mot_config
from deft_tpu.models import create_model


@pytest.mark.parametrize("arch,kw", [
    ("res_18", {}),
    ("resdcn_18", {}),
    ("dlav0_34", {}),
    ("generic", dict(backbone="mobilenet", neck="msraup", msra_outchannel=64)),
    ("generic", dict(backbone="resnet", num_layers=18, neck="dlaup",
                     dla_node="conv")),
])
def test_alt_arch_forward(arch, kw):
    cfg = mot_config(input_h=64, input_w=64, **kw)
    model = create_model(arch, cfg)
    img = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(lambda r: model.init(r, img))(jax.random.PRNGKey(0))
    outs, taps = model.apply(variables, img)
    assert outs["hm"].shape == (1, 16, 16, 1), arch
    for h, c in cfg.heads.items():
        assert outs[h].shape[-1] == c
    assert len(taps) >= 5


def test_unknown_arch_raises():
    cfg = mot_config(input_h=64, input_w=64)
    with pytest.raises(ValueError):
        create_model("hourglass_104", cfg)


def test_cli_reference_flags():
    cfg, extras = parse_config([
        "tracking", "--dataset", "mot", "--dataset_version", "17halftrain",
        "--ltrb_amodal", "--track_thresh", "0.4", "--pre_hm",
        "--shift", "0.05", "--scale", "0.05", "--hm_disturb", "0.05",
        "--lost_disturb", "0.4", "--fp_disturb", "0.1", "--gpus", "0,1",
        "--batch_size", "32", "--K", "50", "--max_frame_dist_AFE", "5",
    ])
    assert cfg.tracking and cfg.ltrb_amodal and cfg.pre_hm
    assert cfg.out_thresh == 0.4 and cfg.new_thresh == 0.4
    assert cfg.K == 50 and cfg.max_frame_dist_afe == 5
    assert cfg.batch_size == 32
    assert cfg.hm_disturb == 0.05 and cfg.lost_disturb == 0.4
    assert cfg.heads["hm"] == 1 and "ltrb_amodal" in cfg.heads
    assert cfg.lstm is False  # forced off for non-nuscenes


def test_cli_nuscenes():
    cfg, _ = parse_config([
        "tracking,ddd", "--dataset", "nuscenes", "--nuscenes_att",
        "--velocity", "--track_thresh", "0.1",
    ])
    assert cfg.lstm is True
    assert set(cfg.heads) >= {"dep", "rot", "dim", "amodel_offset",
                              "nuscenes_att", "velocity"}
    assert cfg.input_h == 448 and cfg.input_w == 800


def test_cli_afe_off():
    cfg, _ = parse_config(["tracking", "--dataset", "mot", "--AFE", "false"])
    assert cfg.afe is False


def test_cli_round2_flags():
    cfg, _ = parse_config([
        "tracking", "--dataset", "mot", "--public_det",
        "--load_results", "dets.json", "--embed_parity",
        "--sim_window", "6", "--dcn_impl", "gather", "--delta_upload",
        "--sims_quant", "--debug", "2",
    ])
    assert cfg.public_det and cfg.embed_parity and cfg.delta_upload
    assert cfg.sim_window == 6 and cfg.dcn_impl == "gather"
    assert cfg.sims_quant and cfg.debug == 2
    assert cfg.load_results == "dets.json"
