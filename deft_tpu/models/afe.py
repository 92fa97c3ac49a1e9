"""AFE: the appearance-feature-extraction + affinity matching head.

Re-design of ``/root/reference/src/lib/model/networks/AFE.py`` (itself derived
from SST/DAN).  Semantics preserved, compute restructured for the MXU:

* **Selectors**: one 3x3 conv per feature-map scale (13 scales); per-object
  embeddings are bilinear samples of the selector outputs at object centers
  (grid_sample with border padding, AFE.py:162-188), concatenated to
  E = sum(out_channels) dims (416 for MOT/KITTI, 704 for nuScenes).

* **Pairwise affinity MLP**: the reference tiles [B, N, E] x [B, N, E] into
  [B, 2E, N, N] and runs a 1x1-conv stack [2E->512->256->128->64->1]
  (AFE.py:190-213, 331-347).  A 1x1 conv over a tiled tensor is exactly a
  per-pair MLP on concat(e_pre_i, e_next_j); we split the first layer's weight
  into W_pre, W_next and materialize the N x N grid only *after* the two
  [N, 512] matmuls, via a broadcast add -- O(N*E*512) instead of
  O(N^2*E*512) for the dominant layer.  The remaining layers are batched
  [N*N, C] matmuls.

* **BatchNorm on embeddings**: the reference applies a shared BatchNorm2d to
  the tiled pre/next tensors (AFE.py:202-203).  Each embedding appears exactly
  N times in its tile, so batch statistics over the tile equal statistics over
  the un-tiled [B, N, E] embeddings; we normalize there (two separate BN
  invocations through the same module, matching the reference).

* **Dual-softmax fusion** (``forward_stacker_features``, AFE.py:110-160):
  fixed-shape jittable version; padded rows/cols are ZEROS (not -inf) before
  the softmax, matching the reference exactly (zeros participate in the
  denominator -- a quirk that affects the calibration of the similarity).

* **Windowed affinity**: the tracker evaluates the current frame against up to
  50 buffered frames; the reference loops host-side (tracker.py:76-90), here
  it is one batched call over the window dimension.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from deft_tpu.models.layers import BN_EPS, BN_MOMENTUM
from deft_tpu.ops.sampling import grid_sample_points

SELECTOR_INPUT_CHANNELS = (16, 32, 64, 128, 256, 512, 64, 128, 256, 512, 64, 64, 64)
SELECTOR_OUT_2D = (32,) * 13
SELECTOR_OUT_NUSCENES = (48, 48, 64, 64, 64, 64, 64, 64, 64, 64, 32, 32, 32)
FINAL_WIDTHS = (512, 256, 128, 64, 1)
FALSE_CONSTANT = 1.0


def selector_out_channels(dataset: str) -> Tuple[int, ...]:
    return SELECTOR_OUT_NUSCENES if dataset == "nuscenes" else SELECTOR_OUT_2D


class AFE(nn.Module):
    """Embedding extractor + pairwise affinity head."""

    dataset: str = "mot"
    max_object: int = 100
    align_corners: bool = True
    dtype: object = None   # selector compute dtype; the affinity MLP is fp32

    @property
    def embed_dim(self) -> int:
        return int(sum(selector_out_channels(self.dataset)))

    def setup(self):
        outs = selector_out_channels(self.dataset)
        self.selectors = [
            nn.Conv(oc, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                    dtype=self.dtype, name=f"selector_{i}")
            for i, oc in enumerate(outs)
        ]
        self.stacker2_bn = nn.BatchNorm(momentum=BN_MOMENTUM, epsilon=BN_EPS)
        e = self.embed_dim
        self.final_0_kernel = self.param(
            "final_0_kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (2 * e, FINAL_WIDTHS[0]),
        )
        self.final_0_bias = self.param(
            "final_0_bias", nn.initializers.zeros, (FINAL_WIDTHS[0],)
        )
        self.final_0_bn = nn.BatchNorm(momentum=BN_MOMENTUM, epsilon=BN_EPS)
        self.final_layers = [
            nn.Dense(w, name=f"final_{li}")
            for li, w in enumerate(FINAL_WIDTHS[1:], start=1)
        ]
        # BN after all but the last two layers (AFE.py:331-347)
        self.final_bns = [
            nn.BatchNorm(momentum=BN_MOMENTUM, epsilon=BN_EPS,
                         name=f"final_{li}_bn")
            for li in range(1, len(FINAL_WIDTHS) - 2)
        ]

    # ---- embedding extraction ------------------------------------------------

    def extract(self, feature_maps: Sequence[jnp.ndarray], centers: jnp.ndarray):
        """Per-object embeddings: 13 scales + [B, N, 2] centers -> [B, N, E]."""
        feats = []
        for sel_conv, fm in zip(self.selectors, feature_maps):
            sel = nn.relu(sel_conv(fm))
            sampled = jax.vmap(
                lambda f, c: grid_sample_points(
                    f, c, padding_mode="border", align_corners=self.align_corners
                )
            )(sel, centers)                                   # [B, N, oc]
            feats.append(sampled)
        # embeddings downstream (affinity MLP, dual softmax) run in fp32
        return jnp.concatenate(feats, axis=-1).astype(jnp.float32)  # [B, N, E]

    # ---- affinity MLP --------------------------------------------------------

    def affinity(self, e_pre: jnp.ndarray, e_next: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        """[B, N, E] x [B, M, E] -> [B, N, M] raw affinity (ReLU'd >= 0)."""
        e = self.embed_dim
        e_pre = self.stacker2_bn(e_pre, use_running_average=not train)
        e_next = self.stacker2_bn(e_next, use_running_average=not train)

        w0 = self.final_0_kernel
        pre0 = jnp.einsum("bne,ef->bnf", e_pre, w0[:e],
                          preferred_element_type=jnp.float32)
        next0 = jnp.einsum("bme,ef->bmf", e_next, w0[e:],
                           preferred_element_type=jnp.float32)
        x = pre0[:, :, None, :] + next0[:, None, :, :] + self.final_0_bias
        x = self.final_0_bn(x, use_running_average=not train)
        x = nn.relu(x)

        for li, layer in enumerate(self.final_layers):
            x = layer(x)
            if li < len(self.final_bns):
                x = self.final_bns[li](x, use_running_average=not train)
            x = nn.relu(x)
        return x[..., 0]                                      # [B, N, M]

    def __call__(self, feature_maps_pre, feature_maps_next, centers_pre,
                 centers_next, train: bool = False):
        """Training forward: [B, N+1, N+1] affinity with false row/col
        (AFE.py:74-86 + add_unmatched_dim)."""
        e_pre = self.extract(feature_maps_pre, centers_pre)
        e_next = self.extract(feature_maps_next, centers_next)
        aff = self.affinity(e_pre, e_next, train)             # [B, N, M]
        b, n, m = aff.shape
        false_col = jnp.full((b, n, 1), FALSE_CONSTANT, aff.dtype)
        aff = jnp.concatenate([aff, false_col], axis=2)
        false_row = jnp.full((b, 1, m + 1), FALSE_CONSTANT, aff.dtype)
        return jnp.concatenate([aff, false_row], axis=1)      # [B, N+1, M+1]

    # ---- inference similarity (dual softmax) ---------------------------------

    def stacker_features(self, e_pre: jnp.ndarray, e_next: jnp.ndarray,
                         n_pre: jnp.ndarray, n_next: jnp.ndarray) -> jnp.ndarray:
        """Fixed-shape ``forward_stacker_features`` (AFE.py:110-160).

        Args:
          e_pre, e_next: [N, E] zero-padded embeddings (N = max_object).
          n_pre, n_next: scalar int32 valid counts.

        Returns [N, N+1]: fused similarity for real (i, j) pairs; column
        ``n_next`` holds the unmatched ("false") probability; rows >= n_pre
        and columns > n_next are zero.
        """
        n = self.max_object
        aff = self.affinity(e_pre[None], e_next[None], train=False)[0]  # [N, N]
        ids = jnp.arange(n)
        aff = aff * (ids < n_next)[None, :] * (ids < n_pre)[:, None]

        # append false row/col of 1.0 -> [N+1, N+1]
        aff = jnp.pad(aff, ((0, 1), (0, 1)), constant_values=FALSE_CONSTANT)

        x_f = jax.nn.softmax(aff, axis=1)
        x_t = jax.nn.softmax(aff, axis=0)

        real = jnp.maximum(x_f[:n, :n], x_t[:n, :n])
        last_col_f = x_f[:n, n:]                              # [N, 1]
        fused = jnp.concatenate([real, last_col_f], axis=1)   # [N, N+1]
        col_ids = jnp.arange(n + 1)[None, :]
        unmatched = jnp.where(col_ids == n_next, last_col_f, 0.0)
        fused = jnp.where(col_ids < n_next, fused, unmatched)
        return fused * (ids < n_pre)[:, None]

    def window_similarity(self, window_embeds, window_counts, e_next, n_next):
        """Batched windowed similarity: one call for all buffered frames.

        window_embeds: [W, N, E]; window_counts: [W]; e_next: [N, E].
        Returns [W, N, N+1] (slot w = stacker_features(window[w], current)).
        """
        return jax.vmap(
            lambda ew, cw: self.stacker_features(ew, e_next, cw, n_next)
        )(window_embeds, window_counts)
