"""Command-line front end: reference-compatible flags -> typed Config.

Accepts the same surface as the reference's ``opts`` argparse class (task
positional, ``--dataset``, ``--arch``, thresholds, aug/disturb flags, ...;
opts.py:14-407) and produces a finalized, dataset-wired Config.
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import List, Optional, Sequence, Tuple

from deft_tpu.config import Config, finalize, wire_dataset

# reference flag name -> Config field where they differ
_ALIASES = {
    "AFE": "afe",
    "max_frame_dist_AFE": "max_frame_dist_afe",
    "not_max_crop": "not_max_crop",
}
_TUPLE_FIELDS = {"lr_step", "save_point", "test_scales"}
_SKIP = {"heads", "weights", "head_convs", "output_h", "output_w",
         "input_res", "output_res", "num_stacks", "pad", "mesh_shape",
         "mesh_axis_names"}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("deft_tpu")
    p.add_argument("task", default="tracking", nargs="?",
                   help="tracking | ddd | comma-combinable (e.g. tracking,ddd)")
    defaults = Config()
    for f in dataclasses.fields(Config):
        if f.name in _SKIP or f.name == "task":
            continue
        flag = f"--{f.name}"
        default = getattr(defaults, f.name)
        if f.name in _TUPLE_FIELDS:
            p.add_argument(flag, type=str,
                           default=",".join(str(x) for x in default))
        elif isinstance(default, bool):
            if default:
                p.add_argument(flag, type=lambda s: s.lower() not in
                               ("0", "false", "no"), default=True)
            else:
                p.add_argument(flag, action="store_true")
        elif isinstance(default, (int, float, str)):
            p.add_argument(flag, type=type(default), default=default)
    # reference-compatible aliases
    p.add_argument("--AFE", dest="afe",
                   type=lambda s: s.lower() not in ("0", "false", "no"),
                   default=True)
    p.add_argument("--max_frame_dist_AFE", dest="max_frame_dist_afe",
                   type=int, default=defaults.max_frame_dist_afe)
    p.add_argument("--gpus", type=str, default="0",
                   help="accepted for reference-CLI compatibility (ignored; "
                        "device selection is JAX's)")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--exp_dir", type=str, default="exp")
    p.add_argument("--data_dir", type=str, default="data")
    return p


def parse_config(argv: Optional[Sequence[str]] = None):
    """Returns (cfg, extras) where extras carries non-Config runtime options."""
    args = build_parser().parse_args(argv)
    d = vars(args).copy()
    extras = {
        "num_workers": d.pop("num_workers"),
        "exp_dir": d.pop("exp_dir"),
        "data_dir": d.pop("data_dir"),
    }
    d.pop("gpus", None)
    for tf in _TUPLE_FIELDS:
        try:
            d[tf] = tuple(float(x) if tf == "test_scales" else int(x)
                          for x in str(d[tf]).split(",") if x != "")
        except ValueError:
            raise SystemExit(
                f"error: --{tf} expects a comma-separated list of numbers, "
                f"got {d[tf]!r}"
            )
    valid = {f.name for f in dataclasses.fields(Config)}
    d = {k: v for k, v in d.items() if k in valid}
    cfg = finalize(Config(**d))
    import os

    cfg = cfg.replace(save_dir=os.path.join(extras["exp_dir"], cfg.task,
                                            cfg.exp_id))
    from deft_tpu.data.datasets import get_dataset_info

    cfg = wire_dataset(cfg, get_dataset_info(cfg.dataset))
    return cfg, extras
