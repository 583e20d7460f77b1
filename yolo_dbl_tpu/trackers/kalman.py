"""Kalman filter for box tracking (host-side numpy).

Equivalent of the reference's trackers/utils/kalman_filter.py
(KalmanFilterXYAH for BYTETracker, KalmanFilterXYWH for BOT-SORT):
constant-velocity model over 8-dim state, standard-weight process /
measurement noise scaled by box height (XYAH) or size (XYWH).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


class KalmanFilterXYAH:
    """State: (cx, cy, aspect, h, vcx, vcy, va, vh)."""

    ndim = 4

    def __init__(self):
        dt = 1.0
        self._motion_mat = np.eye(8)
        for i in range(4):
            self._motion_mat[i, 4 + i] = dt
        self._update_mat = np.eye(4, 8)
        self._std_weight_position = 1.0 / 20
        self._std_weight_velocity = 1.0 / 160

    def _std_pos(self, m):
        return [
            2 * self._std_weight_position * m[3],
            2 * self._std_weight_position * m[3],
            1e-2,
            2 * self._std_weight_position * m[3],
        ]

    def _std_vel(self, m):
        return [
            10 * self._std_weight_velocity * m[3],
            10 * self._std_weight_velocity * m[3],
            1e-5,
            10 * self._std_weight_velocity * m[3],
        ]

    def initiate(self, measurement: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        mean = np.r_[measurement, np.zeros(4)]
        std = self._std_pos(measurement) + self._std_vel(measurement)
        return mean, np.diag(np.square(std))

    def predict(self, mean, cov):
        std_pos = [
            self._std_weight_position * mean[3],
            self._std_weight_position * mean[3],
            1e-2,
            self._std_weight_position * mean[3],
        ]
        std_vel = [
            self._std_weight_velocity * mean[3],
            self._std_weight_velocity * mean[3],
            1e-5,
            self._std_weight_velocity * mean[3],
        ]
        motion_cov = np.diag(np.square(std_pos + std_vel))
        mean = self._motion_mat @ mean
        cov = self._motion_mat @ cov @ self._motion_mat.T + motion_cov
        return mean, cov

    def project(self, mean, cov):
        std = [
            self._std_weight_position * mean[3],
            self._std_weight_position * mean[3],
            1e-1,
            self._std_weight_position * mean[3],
        ]
        innovation_cov = np.diag(np.square(std))
        mean_p = self._update_mat @ mean
        cov_p = self._update_mat @ cov @ self._update_mat.T + innovation_cov
        return mean_p, cov_p

    def update(self, mean, cov, measurement):
        mean_p, cov_p = self.project(mean, cov)
        chol = np.linalg.cholesky(cov_p)
        kalman_gain = np.linalg.solve(
            chol.T, np.linalg.solve(chol, (cov @ self._update_mat.T).T)
        ).T
        innovation = measurement - mean_p
        new_mean = mean + kalman_gain @ innovation
        new_cov = cov - kalman_gain @ cov_p @ kalman_gain.T
        return new_mean, new_cov


class KalmanFilterXYWH(KalmanFilterXYAH):
    """State: (cx, cy, w, h, ...); noise scaled by both w and h (BOT-SORT)."""

    def _wh_std(self, m, k):
        return [k * m[2], k * m[3], k * m[2], k * m[3]]

    def initiate(self, measurement):
        mean = np.r_[measurement, np.zeros(4)]
        std = self._wh_std(measurement, 2 * self._std_weight_position) + self._wh_std(
            measurement, 10 * self._std_weight_velocity
        )
        return mean, np.diag(np.square(std))

    def predict(self, mean, cov):
        motion_cov = np.diag(
            np.square(
                self._wh_std(mean, self._std_weight_position)
                + self._wh_std(mean, self._std_weight_velocity)
            )
        )
        mean = self._motion_mat @ mean
        cov = self._motion_mat @ cov @ self._motion_mat.T + motion_cov
        return mean, cov

    def project(self, mean, cov):
        std = self._wh_std(mean, self._std_weight_position)
        innovation_cov = np.diag(np.square(std))
        mean_p = self._update_mat @ mean
        cov_p = self._update_mat @ cov @ self._update_mat.T + innovation_cov
        return mean_p, cov_p
