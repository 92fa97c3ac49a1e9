"""Learned LSTM motion model.

Rebuild of ``DecoderRNN`` / ``KalmanFilterLSTM``
(``/root/reference/src/lib/utils/tracking_utils/kalman_filter_lstm.py``):
an LSTM (11-d 2-D features or 18-d 3-D features -> 128 hidden) followed by
FC(128->64) -> FC(64 -> 4*future) predicting per-future-frame box deltas
(5 futures for 2-D, 4 for nuScenes 3-D).

The step runs as a single jitted cell update batched over ALL live tracks at
once -- the reference invokes the torch LSTM once per track per frame
(tracker.py:467-469); batching the slot dimension makes the per-frame motion
cost one tiny device program.  Training rollout over a trajectory uses
``jax.lax.scan`` (see deft_tpu/train/prediction.py).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def motion_feature_dim(dataset: str) -> int:
    return 18 if dataset == "nuscenes" else 11


def max_future(dataset: str) -> int:
    return 4 if dataset == "nuscenes" else 5


class DecoderRNN(nn.Module):
    """LSTM + 2-layer head; one flax module serves both step and rollout."""

    dataset: str = "mot"
    hidden: int = 128

    def setup(self):
        self.cell = nn.OptimizedLSTMCell(features=self.hidden)
        self.out1 = nn.Dense(64)
        self.out2 = nn.Dense(4 * max_future(self.dataset))

    def step(self, h, c, feat):
        """One cell update. h, c: [B, H]; feat: [B, F] ->
        (h', c', deltas [B, future, 4])."""
        (c2, h2), _ = self.cell((c, h), feat)
        x = self.out2(self.out1(h2))
        return h2, c2, x.reshape(feat.shape[0], max_future(self.dataset), 4)

    def __call__(self, traj):
        """Training rollout: traj [B, T, F] -> deltas [B, future, 4] from the
        final step (matches DecoderRNN.forward using output[-1]).  T is small
        (<= 15) and static, so the loop unrolls into one XLA graph."""
        b, t, _ = traj.shape
        carry = (jnp.zeros((b, self.hidden)), jnp.zeros((b, self.hidden)))
        y = jnp.zeros((b, self.hidden))
        for i in range(t):
            carry, y = self.cell(carry, traj[:, i])
        x = self.out2(self.out1(y))
        return x.reshape(b, max_future(self.dataset), 4)


class LSTMMotion:
    """Host-side wrapper holding jitted step/rollout (KalmanFilterLSTM role)."""

    def __init__(self, dataset: str, variables=None, seed: int = 0):
        self.dataset = dataset
        self.max_dis_fut = max_future(dataset)
        self.model = DecoderRNN(dataset=dataset)
        if variables is None:
            feat = jnp.zeros((1, motion_feature_dim(dataset)))
            h = jnp.zeros((1, 128))
            variables = self.model.init(
                jax.random.PRNGKey(seed), h, h, feat, method="step"
            )
        self.variables = variables
        self._step = jax.jit(
            lambda v, h, c, f: self.model.apply(v, h, c, f, method="step")
        )

    def predict(self, h, c, new_features):
        """h, c: [1, 128] arrays; new_features: [1, F] (one track).

        Returns (h', c', {1..max_fut: delta[4]}) like KalmanFilterLSTM.predict
        (kalman_filter_lstm.py:65-78).
        """
        h2, c2, deltas = self._step(
            self.variables, jnp.asarray(h), jnp.asarray(c),
            jnp.asarray(new_features, dtype=jnp.float32),
        )
        d = np.asarray(deltas)[0]
        preds = {i + 1: d[i].copy() for i in range(self.max_dis_fut)}
        return np.asarray(h2), np.asarray(c2), preds

    def predict_batch(self, h, c, feats):
        """Batched over tracks: [N,128],[N,128],[N,F] -> (h', c', [N,fut,4]).

        N is padded to the next power of two so the jitted step compiles
        once per BUCKET, not once per live-track count (the count changes
        every frame)."""
        n = int(np.shape(h)[0])
        m = 1
        while m < n:
            m *= 2
        if m != n:
            pad = ((0, m - n), (0, 0))
            h = np.pad(np.asarray(h, np.float32), pad)
            c = np.pad(np.asarray(c, np.float32), pad)
            feats = np.pad(np.asarray(feats, np.float32), pad)
        h2, c2, deltas = self._step(
            self.variables, jnp.asarray(h), jnp.asarray(c),
            jnp.asarray(feats, dtype=jnp.float32),
        )
        return (np.asarray(h2)[:n], np.asarray(c2)[:n],
                np.asarray(deltas)[:n])

    @staticmethod
    def gating_distance(mean, covariance, measurements, only_position=False,
                        metric="gaussian"):
        """LSTM-flavored gating (kalman_filter_lstm.py:80-102): 'gaussian' is
        an L2 over dims 3:-1 of the prediction vs measurements."""
        measurements = np.asarray(measurements)
        mean = np.asarray(mean)
        if only_position:
            mean, covariance = mean[:2], covariance[:2, :2]
            measurements = measurements[:, :2]
        if metric == "gaussian":
            d = measurements[:, 3:-1] - mean[3:-1]
            return np.sqrt(np.sum(d * d, axis=1))
        if metric == "maha":
            d = measurements - mean
            l = np.linalg.cholesky(covariance)
            z = np.linalg.solve(l, d.T)
            return np.sum(z * z, axis=0)
        raise ValueError("invalid distance metric")
