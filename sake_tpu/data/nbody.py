"""Charged N-body trajectory dataset.

The reference consumes the EGNN-repo "charged" dataset from .npy files
(``scripts/nbody/run.py:7-15``: loc/vel/charges, 5 particles, initvel=1,
predict x(t=40) from x, v(t=30)). This module loads those files when
present and otherwise **synthesizes physically-equivalent trajectories**:
+-1 charged particles with a softened Coulomb interaction integrated by
leapfrog — the same construction as the original dataset generator
(Kipf et al. NRI / Satorras et al. EGNN).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Tuple

import numpy as np


def simulate_charged(
    n_traj: int,
    n_particles: int = 5,
    n_steps: int = 5000,
    sample_every: int = 100,
    dt: float = 0.001,
    box_size: float = 5.0,
    initvel_norm: float = 0.5,
    interaction_strength: float = 1.0,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Simulate charged-particle trajectories (vectorized leapfrog).

    Returns ``(loc, vel, charges)`` with shapes
    ``(n_traj, T, n_particles, 3)`` x2 and ``(n_traj, n_particles, 1)``
    where ``T = n_steps // sample_every``.

    Physics: force on i is ``sum_j q_i q_j (x_i - x_j) / r_ij^3`` (softened),
    with elastic reflection off a bounding box — matching the NRI/EGNN
    generator's charged-spring family in behavior.
    """
    rng = np.random.RandomState(seed)
    q = rng.choice([-1.0, 1.0], size=(n_traj, n_particles, 1))
    x = rng.randn(n_traj, n_particles, 3) * 0.5
    v = rng.randn(n_traj, n_particles, 3)
    v = v / np.linalg.norm(v, axis=-1, keepdims=True) * initvel_norm

    def forces(x):
        d = x[:, None, :, :] - x[:, :, None, :]  # d[t, i, j] = x_j - x_i
        r2 = (d**2).sum(-1, keepdims=True)
        np.einsum("bii...->bi...", r2)[...] = 1.0  # self-pairs: no force
        inv_r3 = r2 ** (-1.5)
        qq = q[:, :, None, :] * q[:, None, :, :]
        # attraction/repulsion: like charges repel (force along -d = away
        # from j), opposite attract
        f = -interaction_strength * (qq * inv_r3 * d).sum(axis=2)
        return np.clip(f, -100.0, 100.0)

    T = n_steps // sample_every
    loc = np.empty((n_traj, T, n_particles, 3))
    vel = np.empty((n_traj, T, n_particles, 3))
    f = forces(x)
    for s in range(n_steps):
        if s % sample_every == 0:
            t = s // sample_every
            loc[:, t] = x
            vel[:, t] = v
        # leapfrog
        v_half = v + 0.5 * dt * f
        x = x + dt * v_half
        # reflect off the box
        over = np.abs(x) > box_size
        v_half = np.where(over, -v_half, v_half)
        x = np.clip(x, -box_size, box_size)
        f = forces(x)
        v = v_half + 0.5 * dt * f
    return loc.astype(np.float32), vel.astype(np.float32), q.astype(np.float32)


@dataclass
class NBodySplit:
    h: np.ndarray  # (B, N, 2)  [charge, |v0|]
    x0: np.ndarray  # (B, N, 3)
    x1: np.ndarray  # (B, N, 3)
    v0: np.ndarray  # (B, N, 3)


def _preprocess(q, loc, vel, t0: int, t1: int) -> NBodySplit:
    """Node features = [charge, |v(t0)|]; predict x(t1) from x(t0), v(t0)
    (reference: ``scripts/nbody/run.py:21-29``)."""
    x0, x1, v0 = loc[:, t0], loc[:, t1], vel[:, t0]
    v_norm = np.linalg.norm(v0, axis=-1, keepdims=True)
    h = np.concatenate([q, v_norm], axis=-1).astype(np.float32)
    return NBodySplit(h=h, x0=x0, x1=x1, v0=v0)


def load_nbody(
    data_dir: str | None = None,
    n_train: int = 3000,
    n_valid: int = 2000,
    n_test: int = 2000,
    n_particles: int = 5,
    t0: int = 30,
    t1: int = 40,
    seed: int = 0,
) -> Tuple[NBodySplit, NBodySplit, NBodySplit]:
    """Load the EGNN-format .npy files if ``data_dir`` has them, else
    synthesize. Returns (train, valid, test) splits."""
    suffix = f"charged{n_particles}_initvel1.npy"
    if data_dir and os.path.exists(os.path.join(data_dir, f"loc_train_{suffix}")):
        def _load(split):
            q = np.load(os.path.join(data_dir, f"charges_{split}_{suffix}"))
            loc = np.load(os.path.join(data_dir, f"loc_{split}_{suffix}"))
            vel = np.load(os.path.join(data_dir, f"vel_{split}_{suffix}"))
            # files are (B, T, D, N): swap to (B, T, N, D)
            return _preprocess(q, loc.swapaxes(-2, -1), vel.swapaxes(-2, -1), t0, t1)

        return _load("train"), _load("valid"), _load("test")

    n_total = n_train + n_valid + n_test
    # enough sampled frames to cover t1
    loc, vel, q = simulate_charged(
        n_total,
        n_particles=n_particles,
        n_steps=(t1 + 2) * 100,
        sample_every=100,
        seed=seed,
    )
    splits = np.split(np.arange(n_total), [n_train, n_train + n_valid])
    return tuple(
        _preprocess(q[idx], loc[idx], vel[idx], t0, t1) for idx in splits
    )
