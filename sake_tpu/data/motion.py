"""CMU motion-capture and MD17-forecast style trajectory datasets.

The reference pulls both from external repos (``scripts/motion/run.py:7-10``
and ``scripts/md17_forecast/run.py:7-10`` import the EGNN repo's dataset
classes). Loaders here accept the same preprocessed .npy layouts and
synthesize kinematically plausible trajectories otherwise (smooth
random-frequency joint oscillations for motion; thermal MD for aspirin).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np


@dataclass
class TrajectorySplit:
    h: np.ndarray  # (B, N, F) node features
    x0: np.ndarray  # (B, N, 3)
    x1: np.ndarray  # (B, N, 3) target positions
    v0: np.ndarray  # (B, N, 3)


def synthesize_motion(
    n_samples: int = 600, n_joints: int = 31, delta: int = 30, seed: int = 0
) -> TrajectorySplit:
    """Smooth skeleton-like trajectories: joints oscillate around a random
    rest pose with per-joint frequencies/amplitudes plus global drift."""
    rng = np.random.RandomState(seed)
    rest = rng.randn(n_joints, 3)
    freqs = rng.uniform(0.02, 0.2, size=(n_samples, n_joints, 1))
    phase = rng.uniform(0, 2 * np.pi, size=(n_samples, n_joints, 3))
    amp = rng.uniform(0.1, 0.5, size=(n_samples, n_joints, 1))
    drift = rng.randn(n_samples, 1, 3) * 0.01

    def pos(t):
        return (
            rest[None]
            + amp * np.sin(freqs * t + phase)
            + drift * t
        ).astype(np.float32)

    x0, x1 = pos(0), pos(delta)
    v0 = ((pos(1) - pos(-1)) / 2.0).astype(np.float32)
    # h = [|v|, joint identity] (reference: scripts/motion/run.py:16-22)
    v_norm = np.linalg.norm(v0, axis=-1, keepdims=True)
    ident = np.broadcast_to(np.eye(n_joints, dtype=np.float32), (n_samples, n_joints, n_joints))
    h = np.concatenate([v_norm, ident], axis=-1).astype(np.float32)
    return TrajectorySplit(h=h, x0=x0, x1=x1, v0=v0)


def load_motion(
    data_dir: str | None = None, n_samples: int = 600, delta: int = 30, seed: int = 0
) -> TrajectorySplit:
    if data_dir and os.path.exists(os.path.join(data_dir, "motion_loc.npy")):
        loc = np.load(os.path.join(data_dir, "motion_loc.npy"))  # (B, T, N, 3)
        vel = np.load(os.path.join(data_dir, "motion_vel.npy"))
        x0, x1, v0 = loc[:, 0], loc[:, delta], vel[:, 0]
        v_norm = np.linalg.norm(v0, axis=-1, keepdims=True)
        n = x0.shape[1]
        ident = np.broadcast_to(np.eye(n, dtype=np.float32), (len(x0), n, n))
        h = np.concatenate([v_norm, ident], axis=-1).astype(np.float32)
        return TrajectorySplit(h=h, x0=x0, x1=x1, v0=v0)
    return synthesize_motion(n_samples, delta=delta, seed=seed)


def synthesize_md17_forecast(
    n_samples: int = 1000, delta: int = 10, seed: int = 0
) -> TrajectorySplit:
    """Aspirin position forecasting with velocity input
    (reference: ``scripts/md17_forecast/run.py:18-41``)."""
    from sake_tpu.data.md17 import ASPIRIN_Z, synthesize_md17

    rng = np.random.RandomState(seed)
    base = synthesize_md17(n_samples, seed=seed)
    v0 = rng.randn(*base.x.shape).astype(np.float32) * 0.05
    x1 = base.x + delta * 0.01 * v0 + 0.02 * rng.randn(*base.x.shape).astype(np.float32)
    v_norm = np.linalg.norm(v0, axis=-1, keepdims=True)
    onehot = np.eye(int(ASPIRIN_Z.max()) + 1, dtype=np.float32)[ASPIRIN_Z]
    h = np.concatenate(
        [v_norm, np.broadcast_to(onehot, (n_samples, *onehot.shape))], axis=-1
    ).astype(np.float32)
    return TrajectorySplit(h=h, x0=base.x, x1=x1.astype(np.float32), v0=v0)
