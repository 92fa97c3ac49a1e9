"""Constant-velocity Kalman filter for (x, y, a, h) boxes.

Mirror of ``/root/reference/src/lib/utils/tracking_utils/kalman_filter.py``
(the DeepSORT-style 8-state filter), vectorized numpy on host: the filter
serves the association cascade, which is host-side by design; N tracks x 8
states is far too small to benefit from a device round trip.
"""

from __future__ import annotations

import numpy as np

chi2inv95 = {
    1: 3.8415, 2: 5.9915, 3: 7.8147, 4: 9.4877, 5: 11.070,
    6: 12.592, 7: 14.067, 8: 15.507, 9: 16.919,
}


class KalmanFilter:
    def __init__(self):
        ndim, dt = 4, 1.0
        self._motion_mat = np.eye(2 * ndim)
        for i in range(ndim):
            self._motion_mat[i, ndim + i] = dt
        self._update_mat = np.eye(ndim, 2 * ndim)
        self._std_weight_position = 1.0 / 20
        self._std_weight_velocity = 1.0 / 160

    def initiate(self, measurement):
        mean = np.r_[measurement, np.zeros_like(measurement)]
        h = measurement[3]
        std = [
            2 * self._std_weight_position * h,
            2 * self._std_weight_position * h,
            1e-2,
            2 * self._std_weight_position * h,
            10 * self._std_weight_velocity * h,
            10 * self._std_weight_velocity * h,
            1e-5,
            10 * self._std_weight_velocity * h,
        ]
        return mean, np.diag(np.square(std))

    def _motion_cov(self, mean):
        h = mean[3]
        std = [
            self._std_weight_position * h,
            self._std_weight_position * h,
            1e-2,
            self._std_weight_position * h,
            self._std_weight_velocity * h,
            self._std_weight_velocity * h,
            1e-5,
            self._std_weight_velocity * h,
        ]
        return np.diag(np.square(std))

    def predict(self, mean, covariance):
        mean = mean @ self._motion_mat.T
        covariance = (
            self._motion_mat @ covariance @ self._motion_mat.T
            + self._motion_cov(mean)
        )
        return mean, covariance

    def multi_predict(self, mean, covariance):
        """[N, 8], [N, 8, 8] vectorized predict (kalman_filter.py:161-200)."""
        h = mean[:, 3]
        std = np.stack([
            self._std_weight_position * h,
            self._std_weight_position * h,
            1e-2 * np.ones_like(h),
            self._std_weight_position * h,
            self._std_weight_velocity * h,
            self._std_weight_velocity * h,
            1e-5 * np.ones_like(h),
            self._std_weight_velocity * h,
        ], axis=1)
        motion_cov = np.zeros((len(mean), 8, 8))
        idx = np.arange(8)
        motion_cov[:, idx, idx] = np.square(std)

        mean = mean @ self._motion_mat.T
        # batched F P F^T via broadcasting matmul (BLAS) -- measurably
        # faster than the einsum lowering at a few hundred tracks
        covariance = (
            self._motion_mat @ covariance @ self._motion_mat.T + motion_cov
        )
        return mean, covariance

    def project(self, mean, covariance):
        h = mean[3]
        std = [
            self._std_weight_position * h,
            self._std_weight_position * h,
            1e-1,
            self._std_weight_position * h,
        ]
        innovation_cov = np.diag(np.square(std))
        pmean = self._update_mat @ mean
        pcov = self._update_mat @ covariance @ self._update_mat.T
        return pmean, pcov + innovation_cov

    def update(self, mean, covariance, measurement):
        projected_mean, projected_cov = self.project(mean, covariance)
        # gain via Cholesky solve; tiny jitter keeps zero-size boxes (h = 0
        # from an untrained detector) from producing a singular projection
        projected_cov = projected_cov + 1e-8 * np.eye(projected_cov.shape[0])
        l = np.linalg.cholesky(projected_cov)
        b = (covariance @ self._update_mat.T).T
        z = np.linalg.solve(l, b)
        kalman_gain = np.linalg.solve(l.T, z).T
        innovation = measurement - projected_mean
        new_mean = mean + innovation @ kalman_gain.T
        new_cov = covariance - kalman_gain @ projected_cov @ kalman_gain.T
        return new_mean, new_cov

    def multi_update(self, mean, covariance, measurement):
        """Vectorized ``update`` over N tracks: mean [N, 8], covariance
        [N, 8, 8], measurement [N, 4].  Same math as the scalar path
        (project -> batched Cholesky gain -> correct), one LAPACK batch
        instead of N solves -- the association cascade applies every match
        through here (measured ~8 ms/frame of per-track solves at 100
        tracks)."""
        n = mean.shape[0]
        h = mean[:, 3]
        std = np.stack([
            self._std_weight_position * h,
            self._std_weight_position * h,
            1e-1 * np.ones_like(h),
            self._std_weight_position * h,
        ], axis=1)
        # update_mat is eye(4, 8): projection = leading 4x4 block
        pmean = mean[:, :4]
        pcov = covariance[:, :4, :4].copy()
        idx = np.arange(4)
        pcov[:, idx, idx] += np.square(std) + 1e-8
        l = np.linalg.cholesky(pcov)                       # [N, 4, 4]
        b = np.transpose(covariance[:, :, :4], (0, 2, 1))  # [N, 4, 8]
        z = np.linalg.solve(l, b)
        gain = np.transpose(
            np.linalg.solve(np.transpose(l, (0, 2, 1)), z), (0, 2, 1)
        )                                                  # [N, 8, 4]
        innovation = measurement - pmean                   # [N, 4]
        new_mean = mean + np.einsum("nij,nj->ni", gain, innovation)
        new_cov = covariance - np.einsum(
            "nij,njk,nlk->nil", gain, pcov, gain
        )
        return new_mean, new_cov

    def gating_distance(self, mean, covariance, measurements,
                        only_position=True, metric="maha"):
        # NB: the reference gates against the RAW state distribution, not the
        # projected innovation covariance (kalman_filter.py:267-280).
        if only_position:
            mean_p, cov_p = mean[:2], covariance[:2, :2]
            measurements = measurements[:, :2]
        else:
            mean_p, cov_p = mean[:4], covariance[:4, :4]
        d = measurements - mean_p
        if metric == "gaussian":
            return np.sum(d * d, axis=1)
        if metric == "maha":
            # tiny jitter keeps degenerate states (e.g. zero-size boxes from
            # an untrained detector) from producing singular covariances
            cov_p = cov_p + 1e-8 * np.eye(cov_p.shape[0])
            l = np.linalg.cholesky(cov_p)
            z = np.linalg.solve(l, d.T)
            return np.sum(z * z, axis=0)
        raise ValueError("invalid distance metric")
