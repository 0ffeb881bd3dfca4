"""Trajectory evaluation: ATE / RPE for benchmark parity checks."""

from __future__ import annotations

import numpy as np


def align_se2(est: np.ndarray, ref: np.ndarray) -> np.ndarray:
    """Best rigid SE(2) alignment of est[N, >=2] xy onto ref (Umeyama, no
    scale). Returns est transformed."""
    pe = est[:, :2]
    pr = ref[:, :2]
    mue, mur = pe.mean(0), pr.mean(0)
    a, b = pe - mue, pr - mur
    cov = b.T @ a / len(pe)
    u, _, vt = np.linalg.svd(cov)
    s = np.diag([1.0, np.sign(np.linalg.det(u @ vt))])
    R = u @ s @ vt
    t = mur - R @ mue
    return pe @ R.T + t


def ate_rmse(est: np.ndarray, ref: np.ndarray, align: bool = True) -> float:
    """Absolute trajectory error (RMSE over xy), optionally SE(2)-aligned."""
    pe = align_se2(est, ref) if align else est[:, :2]
    err = pe - ref[:, :2]
    return float(np.sqrt(np.mean(np.sum(err * err, axis=1))))


def rpe_rmse(est: np.ndarray, ref: np.ndarray, delta: int = 1) -> float:
    """Relative pose error over xy increments."""
    de = est[delta:, :2] - est[:-delta, :2]
    dr = ref[delta:, :2] - ref[:-delta, :2]
    err = np.linalg.norm(de - dr, axis=1)
    return float(np.sqrt(np.mean(err * err)))
