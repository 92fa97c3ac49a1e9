"""Checkpoint save/load.

Replaces ``model.py:40-121`` (tolerant torch state-dict load, save with
epoch/optimizer) with orbax: each checkpoint stores
``{params, batch_stats, opt_state?, epoch, s_det, s_id}``; loading tolerates
missing/extra keys the same way the reference does (warn + keep the
initialized value) so head-grafting across class counts works
(``reset_hm``/``reuse_hm`` semantics).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def _restore_numpy(path: str):
    """Restore a checkpoint as plain numpy arrays regardless of how (or on
    which mesh) it was saved -- orbax otherwise demands the original
    shardings at load time."""
    ocp = _ocp()
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(path)
    if hasattr(meta, "item_metadata"):          # StepMetadata (orbax >= 0.6)
        meta = meta.item_metadata
    tree = meta.tree if hasattr(meta, "tree") else meta
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree,
        is_leaf=lambda x: not isinstance(x, dict),
    )
    return ckptr.restore(path, restore_args=restore_args)


def save_checkpoint(path: str, params, batch_stats, opt_state=None,
                    epoch: int = 0, extra: Optional[Dict[str, Any]] = None):
    ocp = _ocp()
    path = os.path.abspath(path)
    payload = {"params": params, "batch_stats": batch_stats, "epoch": epoch}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if extra:
        payload.update(extra)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)
    return path


def _merge_tolerant(init_tree, loaded_tree, prefix=""):
    """Overlay loaded leaves onto the initialized tree; warn on mismatches
    (shape mismatch or missing keys keep the initialized value, like
    model.py:47-90)."""
    if not isinstance(init_tree, dict):
        return loaded_tree
    out = {}
    for k, v in init_tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if loaded_tree is not None and k in loaded_tree:
            lv = loaded_tree[k]
            if isinstance(v, dict):
                out[k] = _merge_tolerant(v, lv, key)
            elif hasattr(v, "shape") and hasattr(lv, "shape") and v.shape != lv.shape:
                print(f"checkpoint: shape mismatch at {key} "
                      f"({lv.shape} vs {v.shape}); keeping init")
                out[k] = v
            else:
                out[k] = lv
        else:
            print(f"checkpoint: {key} missing; keeping init")
            out[k] = v
    for k in (loaded_tree or {}):
        if k not in init_tree:
            print(f"checkpoint: dropping unexpected key {prefix}/{k}")
    return out


def load_checkpoint(path: str, model, cfg, params=None, batch_stats=None):
    """Load a checkpoint into ``{"params", "batch_stats"}`` variables.

    ``.pth`` files are treated as reference PyTorch checkpoints and routed
    through the torch converter (published DEFT weights load directly).
    """
    if path.endswith(".pth"):
        from deft_tpu.train.torch_convert import convert_torch_checkpoint

        return convert_torch_checkpoint(path, cfg)
    loaded = _restore_numpy(os.path.abspath(path))
    if params is None:
        from deft_tpu.models.factory import init_model

        params, batch_stats = init_model(model, cfg)
    params = _merge_tolerant(params, loaded.get("params"))
    batch_stats = _merge_tolerant(batch_stats, loaded.get("batch_stats"))
    return {"params": params, "batch_stats": batch_stats}


def load_train_state(path: str, state):
    """Resume training: restore into an existing TrainState pytree."""
    loaded = _restore_numpy(os.path.abspath(path))
    return state.replace(
        params=_merge_tolerant(state.params, loaded.get("params")),
        batch_stats=_merge_tolerant(state.batch_stats, loaded.get("batch_stats")),
        s_det=loaded.get("s_det", state.s_det),
        s_id=loaded.get("s_id", state.s_id),
    ), int(loaded.get("epoch", 0))


def save_motion_checkpoint(path: str, motion):
    ocp = _ocp()
    ocp.PyTreeCheckpointer().save(os.path.abspath(path), motion.variables,
                                  force=True)
    return path


def load_motion_checkpoint(path: str, motion):
    loaded = _restore_numpy(os.path.abspath(path))
    return _merge_tolerant(motion.variables, loaded)
