"""Toy particle-system datasets for flow training: DW-4 and LJ-13.

The reference pulls these from the cloned ``en_flows`` repo
(``scripts/dw4_aug/prep.py``); here they are generated directly by MCMC
from the same potentials:

- DW-4: 4 particles in 2D, pairwise double-well in interparticle distance
  (a(d-d0) + b(d-d0)^2 + c(d-d0)^4 with the standard a=0, b=-4, c=0.9,
  d0=4, temperature 1).
- LJ-13: 13 particles in 3D, Lennard-Jones.

Samples are mean-centered (the flows model the translation-quotient).
"""

from __future__ import annotations

import numpy as np


def dw4_energy(x: np.ndarray) -> np.ndarray:
    """Double-well pair energy; x (..., 4, 2)."""
    d = np.linalg.norm(x[..., :, None, :] - x[..., None, :, :], axis=-1)
    iu = np.triu_indices(x.shape[-2], 1)
    dd = d[..., iu[0], iu[1]] - 4.0
    return (-4.0 * dd**2 + 0.9 * dd**4).sum(-1) / 2.0


def lj13_energy(x: np.ndarray, eps: float = 1.0, rm: float = 1.0) -> np.ndarray:
    """Lennard-Jones energy; x (..., 13, 3)."""
    d = np.linalg.norm(x[..., :, None, :] - x[..., None, :, :], axis=-1)
    iu = np.triu_indices(x.shape[-2], 1)
    r = np.clip(d[..., iu[0], iu[1]], 0.5, None)
    return (eps * ((rm / r) ** 12 - 2 * (rm / r) ** 6)).sum(-1)


def _mcmc(energy_fn, n_samples, n_particles, dim, step=0.1, burn=2000,
          thin=20, seed=0):
    rng = np.random.RandomState(seed)
    n_chains = 64
    x = rng.randn(n_chains, n_particles, dim) * 2.0
    e = energy_fn(x)
    out = []
    total = burn + thin * (n_samples // n_chains + 1)
    for it in range(total):
        prop = x + step * rng.randn(*x.shape)
        ep = energy_fn(prop)
        accept = rng.rand(n_chains) < np.exp(np.clip(e - ep, -50, 50))
        x = np.where(accept[:, None, None], prop, x)
        e = np.where(accept, ep, e)
        if it >= burn and (it - burn) % thin == 0:
            out.append(x.copy())
    samples = np.concatenate(out)[:n_samples]
    samples = samples - samples.mean(axis=-2, keepdims=True)
    return samples.astype(np.float32)


def load_dw4(n_samples: int = 1000, seed: int = 0) -> np.ndarray:
    return _mcmc(dw4_energy, n_samples, 4, 2, step=0.3, seed=seed)


def load_lj13(n_samples: int = 1000, seed: int = 0) -> np.ndarray:
    return _mcmc(lj13_energy, n_samples, 13, 3, step=0.05, seed=seed)
