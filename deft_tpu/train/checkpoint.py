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
                    epoch: int = 0, step=None,
                    extra: Optional[Dict[str, Any]] = None):
    """Write a checkpoint.  ``opt_state``/``step`` make it resumable with full
    fidelity (the reference stores the torch optimizer dict the same way,
    model.py:113-121); epoch-snapshot checkpoints may omit them."""
    ocp = _ocp()
    path = os.path.abspath(path)
    payload = {"params": params, "batch_stats": batch_stats, "epoch": epoch}
    if opt_state is not None:
        # optax states are NamedTuple pytrees; orbax round-trips plain dicts,
        # so serialize through flax (structure restored in load_train_state)
        from flax import serialization

        payload["opt_state"] = serialization.to_state_dict(opt_state)
    if step is not None:
        payload["step"] = int(step)
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


def load_train_state(path: str, state, steps_per_epoch: int = 0):
    """Resume training: restore into an existing TrainState pytree.

    Restores optimizer state and the schedule step so a resumed run keeps its
    Adam moments AND its position in the piecewise LR decay (reference
    model.py:94-106 restores the optimizer and re-derives the LR from the
    epoch).  Checkpoints written without ``opt_state``/``step`` (epoch
    snapshots, pre-round-3 files) fall back to fresh optimizer moments with
    the step re-derived from ``epoch * steps_per_epoch`` -- which still puts
    the LR schedule at the right boundary.
    """
    loaded = _restore_numpy(os.path.abspath(path))
    epoch = int(loaded.get("epoch", 0))
    new = state.replace(
        params=_merge_tolerant(state.params, loaded.get("params")),
        batch_stats=_merge_tolerant(state.batch_stats, loaded.get("batch_stats")),
        s_det=loaded.get("s_det", state.s_det),
        s_id=loaded.get("s_id", state.s_id),
    )
    step = loaded.get("step")
    if step is None:
        step = epoch * steps_per_epoch
        if "opt_state" in loaded:
            print("checkpoint: no step recorded; deriving LR-schedule step "
                  f"from epoch ({epoch} * {steps_per_epoch})")
    new = new.replace(step=jnp_int32(step))
    if "opt_state" in loaded:
        from flax import serialization

        try:
            new = new.replace(opt_state=serialization.from_state_dict(
                state.opt_state, loaded["opt_state"]))
        except (KeyError, ValueError, TypeError) as e:
            # structural mismatch (e.g. head graft changed the params tree):
            # keep fresh moments, like the reference's tolerant load
            print(f"checkpoint: optimizer state incompatible ({e}); "
                  "keeping fresh optimizer moments")
    else:
        print("checkpoint: no optimizer state saved; fresh moments")
    return new, epoch


def jnp_int32(x):
    import jax.numpy as jnp

    return jnp.asarray(int(x), jnp.int32)


def save_motion_checkpoint(path: str, motion):
    ocp = _ocp()
    ocp.PyTreeCheckpointer().save(os.path.abspath(path), motion.variables,
                                  force=True)
    return path


def load_motion_checkpoint(path: str, motion):
    loaded = _restore_numpy(os.path.abspath(path))
    return _merge_tolerant(motion.variables, loaded)
