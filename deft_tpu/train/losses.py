"""Training losses.

JAX mirrors of ``/root/reference/src/lib/model/losses.py`` (penalty-reduced
focal loss, masked L1, weighted BCE, 2-bin rotation loss), the AFE matching
loss (``AFE.py:235-328``), and the joint loss assembly of
``trainer.py:30-170`` -- implementing the *intended* uncertainty-weighted
total ``exp(-s_det) L_det + exp(-s_id) L_id + s_det + s_id`` (the reference's
``ModleWithLoss`` is broken at HEAD: ``nn`` unimported at trainer.py:40 and
``self.s_det`` read from the wrong object at trainer.py:168; see SURVEY.md
§2.4 -- we implement the intended semantics).

All target tensors are fixed-shape [B, M, ...] with validity masks, exactly as
the data pipeline pads them.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from deft_tpu.ops.decode import gather_feat


def fast_focal_loss(pred: jnp.ndarray, target: jnp.ndarray, ind: jnp.ndarray,
                    mask: jnp.ndarray, cat: jnp.ndarray) -> jnp.ndarray:
    """CornerNet penalty-reduced focal loss (losses.py:75-100).

    pred, target: [B, H, W, C] (pred already sigmoided+clamped);
    ind, mask: [B, M]; cat: [B, M] class ids of the peaks.
    """
    neg_weights = jnp.power(1.0 - target, 4.0)
    neg_loss = jnp.sum(jnp.log(1.0 - pred) * jnp.power(pred, 2.0) * neg_weights)

    pos_pred_pix = gather_feat(pred, ind)                       # [B, M, C]
    pos_pred = jnp.take_along_axis(pos_pred_pix, cat[..., None], axis=2)[..., 0]
    num_pos = jnp.sum(mask)
    pos_loss = jnp.sum(
        jnp.log(pos_pred) * jnp.power(1.0 - pos_pred, 2.0) * mask
    )
    return jnp.where(
        num_pos == 0, -neg_loss, -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0)
    )


def reg_weighted_l1_loss(output: jnp.ndarray, mask: jnp.ndarray,
                         ind: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Masked L1 at peak indices (losses.py:121-130).

    output: [B, H, W, F]; mask: [B, M, F]; ind: [B, M]; target: [B, M, F].
    """
    pred = gather_feat(output, ind)
    loss = jnp.sum(jnp.abs(pred * mask - target * mask))
    return loss / (jnp.sum(mask) + 1e-4)


def weighted_bce_loss(output: jnp.ndarray, mask: jnp.ndarray, ind: jnp.ndarray,
                      target: jnp.ndarray) -> jnp.ndarray:
    """Per-attribute BCE-with-logits at peaks (losses.py:133-146)."""
    pred = gather_feat(output, ind)                             # [B, M, F]
    bce = jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    return jnp.sum(mask * bce) / (jnp.sum(mask) + 1e-4)


def _smooth_l1(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    d = jnp.abs(x - y)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def _masked_softmax_ce(logits: jnp.ndarray, labels: jnp.ndarray,
                       mask: jnp.ndarray) -> jnp.ndarray:
    """cross_entropy(logits * mask, labels) averaged over ALL rows, matching
    torch F.cross_entropy(reduction='mean') on masked logits
    (losses.py:163-166: masked-out rows contribute log(num_classes))."""
    masked = logits * mask
    logp = jax.nn.log_softmax(masked, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def bin_rot_loss(output: jnp.ndarray, mask: jnp.ndarray, ind: jnp.ndarray,
                 rotbin: jnp.ndarray, rotres: jnp.ndarray) -> jnp.ndarray:
    """2-bin orientation loss (losses.py:149-204).

    output: [B, H, W, 8]; rotbin: [B, M, 2] int; rotres: [B, M, 2]; mask [B, M].
    """
    pred = gather_feat(output, ind).reshape(-1, 8)
    rotbin = rotbin.reshape(-1, 2)
    rotres = rotres.reshape(-1, 2)
    m = mask.reshape(-1, 1).astype(pred.dtype)

    loss_bin1 = _masked_softmax_ce(pred[:, 0:2], rotbin[:, 0], m)
    loss_bin2 = _masked_softmax_ce(pred[:, 4:6], rotbin[:, 1], m)

    def res_branch(sin_col, cos_col, bin_col):
        valid = (rotbin[:, bin_col] != 0).astype(pred.dtype)
        cnt = jnp.sum(valid)
        s = jnp.sum(_smooth_l1(pred[:, sin_col], jnp.sin(rotres[:, bin_col])) * valid)
        c = jnp.sum(_smooth_l1(pred[:, cos_col], jnp.cos(rotres[:, bin_col])) * valid)
        return jnp.where(cnt > 0, (s + c) / jnp.maximum(cnt, 1.0), 0.0)

    loss_res = res_branch(2, 3, 0) + res_branch(6, 7, 1)
    return loss_bin1 + loss_bin2 + loss_res


# --------------------------------------------------------------------------
# AFE matching loss (AFE.py:235-328)
# --------------------------------------------------------------------------

def afe_loss(affinity: jnp.ndarray, target: jnp.ndarray, mask_pre: jnp.ndarray,
             mask_next: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Forward/backward masked softmax CE + consistency.

    affinity: [B, N+1, N+1] raw (with false row/col); target: [B, N+1, N+1]
    binary matrix; mask_pre, mask_next: [B, N+1] row/col validity.

    Matches the reference exactly, including its quirks: softmax runs over
    *masked* (zeroed, not -inf) logits and the row/col for the false entries.
    """
    n1 = affinity.shape[-1]  # max_object + 1
    m0 = mask_pre[:, :, None] * jnp.ones((1, 1, n1), affinity.dtype)   # [B,N1,N1]
    m1 = mask_next[:, None, :] * jnp.ones((1, n1, 1), affinity.dtype)
    mask_region = m0 * m1
    mask_region_pre = mask_region.at[:, n1 - 1, :].set(0.0)
    mask_region_next = mask_region.at[:, :, n1 - 1].set(0.0)
    mask_region_union = mask_region_pre * mask_region_next

    input_pre = jax.nn.softmax(mask_region_pre * affinity, axis=2)
    input_next = jax.nn.softmax(mask_region_next * affinity, axis=1)
    # input_all: average of both on the real block, forward softmax elsewhere
    avg = (input_pre + input_next) / 2.0
    input_all = input_pre.at[:, : n1 - 1, : n1 - 1].set(avg[:, : n1 - 1, : n1 - 1])

    target = target.astype(affinity.dtype)
    target_pre = mask_region_pre * target
    target_next = mask_region_next * target
    target_union = mask_region_union * target
    n_pre = jnp.sum(target_pre)
    n_next = jnp.sum(target_next)
    n_union = jnp.sum(target_union)
    n_total = jnp.sum(target)

    eps = 1e-12
    loss_pre = -jnp.sum(target_pre * jnp.log(input_pre + eps))
    loss_pre = jnp.where(n_pre > 0, loss_pre / jnp.maximum(n_pre, 1.0), loss_pre)
    loss_next = -jnp.sum(target_next * jnp.log(input_next + eps))
    loss_next = jnp.where(n_next > 0, loss_next / jnp.maximum(n_next, 1.0), loss_next)
    loss_all = -jnp.sum(target_pre * jnp.log(input_all + eps))
    loss_all = jnp.where(
        (n_pre > 0) & (n_next > 0), loss_all / jnp.maximum(n_pre, 1.0), loss_all
    )
    loss_sim = jnp.sum(target_union * jnp.abs(input_next - input_pre))
    loss_sim = jnp.where(n_union > 0, loss_sim / jnp.maximum(n_total, 1.0), loss_sim)

    total = (loss_pre + loss_next + loss_all + loss_sim) / 4.0

    # accuracy diagnostics (argmax agreement on valid rows/cols)
    idx_t = jnp.argmax(target_pre, axis=2)[:, : n1 - 1]
    idx_p = jnp.argmax(input_all, axis=2)[:, : n1 - 1]
    valid_rows = mask_pre[:, : n1 - 1]
    acc_pre = jnp.sum((idx_t == idx_p) * valid_rows) / jnp.maximum(
        jnp.sum(valid_rows), 1.0
    )
    idx_t2 = jnp.argmax(target_next, axis=1)[:, : n1 - 1]
    idx_p2 = jnp.argmax(input_next, axis=1)[:, : n1 - 1]
    valid_cols = mask_next[:, : n1 - 1]
    acc_next = jnp.sum((idx_t2 == idx_p2) * valid_cols) / jnp.maximum(
        jnp.sum(valid_cols), 1.0
    )

    return {
        "loss_pre": loss_pre,
        "loss_next": loss_next,
        "loss_similarity": loss_sim,
        "loss": total,
        "accuracy_pre": acc_pre,
        "accuracy_next": acc_next,
        "accuracy": (acc_pre + acc_next) / 2.0,
    }


# --------------------------------------------------------------------------
# Joint detection loss (GenericLoss, trainer.py:30-146)
# --------------------------------------------------------------------------

def generic_loss(outputs: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray],
                 weights: Dict[str, float]) -> Dict[str, jnp.ndarray]:
    """Per-head loss dispatch; total = 0.05 * sum(w_h * loss_h)
    (trainer.py:142-146)."""
    from deft_tpu.models.deft import clamped_sigmoid

    losses: Dict[str, jnp.ndarray] = {}
    out = dict(outputs)
    out["hm"] = clamped_sigmoid(out["hm"])

    losses["hm"] = fast_focal_loss(
        out["hm"], batch["hm"], batch["ind"], batch["mask"], batch["cat"]
    )

    for head in ("reg", "wh", "tracking", "ltrb", "ltrb_amodal", "dim",
                 "amodel_offset", "velocity"):
        if head in out:
            losses[head] = reg_weighted_l1_loss(
                out[head],
                batch[f"{head}_mask"],
                batch["ind"],
                batch[head],
            )

    if "dep" in out:
        # trainer.py:48: dep decoded as 1/(sigmoid+1e-6) - 1 before the L1
        dep_pred = 1.0 / (jax.nn.sigmoid(out["dep"]) + 1e-6) - 1.0
        losses["dep"] = reg_weighted_l1_loss(
            dep_pred, batch["dep_mask"], batch["ind"], batch["dep"]
        )

    if "rot" in out:
        losses["rot"] = bin_rot_loss(
            out["rot"], batch["rot_mask"], batch["ind"],
            batch["rotbin"], batch["rotres"],
        )

    if "nuscenes_att" in out:
        losses["nuscenes_att"] = weighted_bce_loss(
            out["nuscenes_att"], batch["nuscenes_att_mask"], batch["ind"],
            batch["nuscenes_att"],
        )

    total = jnp.asarray(0.0)
    for head, l in losses.items():
        total = total + weights.get(head, 1.0) * l
    losses["tot"] = 0.05 * total
    return losses


def joint_loss(det_total: jnp.ndarray, match_total: jnp.ndarray,
               s_det: jnp.ndarray, s_id: jnp.ndarray) -> jnp.ndarray:
    """Kendall uncertainty weighting (trainer.py:168, intended semantics)."""
    return (
        jnp.exp(-s_det) * det_total + jnp.exp(-s_id) * match_total + s_det + s_id
    )
