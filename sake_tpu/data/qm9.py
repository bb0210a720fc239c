"""QM9 property-regression dataset (padded batches + masks).

Loads the packaged QM9 .npz the reference's TPU script fetches
(``scripts/qm9_tpu/run.sh:1-7``; arrays: per-molecule padded charges ``i``,
positions ``x``, targets ``y``) when a local copy exists; otherwise
synthesizes a structurally identical dataset (29-atom padding, one-hot
charges, padded coordinate zeros, graph-level scalar targets from a
surrogate function) so every downstream code path — masking, collation,
readout, DP — is exercised for real.

Splits follow the reference's DimeNet-comparable convention: 110k train /
10k valid / rest test at seed 42 (``scripts/qm9_tpu/run.py:12-22``),
scaled down proportionally for synthetic runs.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

QM9_MAX_ATOMS = 29
QM9_CHARGES = (1, 6, 7, 8, 9)  # H C N O F
# thermochemical energy offsets subtracted per element
# (reference: scripts/qm9_full/run.py:15-18 pattern)
ATOM_REF_ENERGY = {1: -0.500273, 6: -37.846772, 7: -54.583861,
                   8: -75.064579, 9: -99.718730}


@dataclass
class QM9Data:
    charges: np.ndarray  # (B, N) int, 0 = padding
    x: np.ndarray  # (B, N, 3)
    y: np.ndarray  # (B, 1)


def synthesize_qm9(n_samples: int = 4096, seed: int = 0) -> QM9Data:
    rng = np.random.RandomState(seed)
    n = QM9_MAX_ATOMS
    sizes = rng.randint(8, n + 1, size=n_samples)
    charges = np.zeros((n_samples, n), np.int32)
    x = np.zeros((n_samples, n, 3), np.float32)
    y = np.zeros((n_samples, 1), np.float32)
    zvals = np.array(QM9_CHARGES)
    probs = np.array([0.5, 0.35, 0.05, 0.08, 0.02])
    for b, s in enumerate(sizes):
        z = rng.choice(zvals, size=s, p=probs)
        pos = rng.randn(s, 3) * 1.8
        charges[b, :s] = z
        x[b, :s] = pos
        d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1) + np.eye(s)
        # smooth surrogate target: pairwise-decay + composition terms
        y[b] = (np.exp(-d).sum() - d.shape[0]) * 0.5 + 0.1 * z.sum()
    return QM9Data(charges=charges, x=x, y=y.astype(np.float32))


def load_qm9(
    data_dir: str | None = None, n_samples: int = 4096, seed: int = 0
) -> QM9Data:
    """Load ``qm9.npz`` (keys i/x/y) from ``data_dir`` or synthesize."""
    path = os.path.join(data_dir or ".", "qm9.npz")
    if data_dir and os.path.exists(path):
        z = np.load(path)
        return QM9Data(
            charges=np.asarray(z["i"], np.int32),
            x=np.asarray(z["x"], np.float32),
            y=np.asarray(z["y"], np.float32).reshape(len(z["x"]), -1),
        )
    return synthesize_qm9(n_samples, seed)


def dimenet_split(n_total: int, seed: int = 42, n_train=110_000, n_valid=10_000):
    """The reference's re-split (``scripts/qm9_tpu/run.py:12-22``), scaled
    down proportionally when the dataset is smaller than full QM9."""
    if n_total < n_train + n_valid + 1:
        n_train = int(n_total * 0.84)
        n_valid = int(n_total * 0.08)
    rng = np.random.RandomState(seed)
    idxs = rng.permutation(n_total)
    return (
        idxs[:n_train],
        idxs[n_train : n_train + n_valid],
        idxs[n_train + n_valid :],
    )
