"""OC20 IS2RE catalyst dataset (heterogeneous large systems).

The reference reads the OC20 lmdb (``scripts/oc20_batch/data.py:7-16``:
pickled Data objects with ``pos``, ``atomic_numbers``, ``y_relaxed``) and
buckets systems by size (``oc20_batch/run.py:12-70``). Gated on lmdb and
file presence; synthesized otherwise (20-80 atom systems over the OC20
element set, surrogate relaxed-energy targets).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List

import numpy as np


def load_oc20_lmdb(path: str, limit: int | None = None) -> List[Dict[str, np.ndarray]]:
    import lmdb  # optional dep; not baked — callers gate

    samples = []
    env = lmdb.open(path, subdir=False, readonly=True, lock=False)
    with env.begin() as txn:
        n = int(txn.get("length".encode()).decode()) if txn.get(b"length") else None
        cursor = txn.cursor()
        for i, (k, v) in enumerate(cursor):
            if k == b"length":
                continue
            if limit is not None and i >= limit:
                break
            d = pickle.loads(v)
            samples.append(
                {
                    "z": np.asarray(d.atomic_numbers, np.int32),
                    "x": np.asarray(d.pos, np.float32),
                    "e": np.float32(d.y_relaxed),
                }
            )
    return samples


def synthesize_oc20(
    n_samples: int = 512, min_atoms: int = 20, max_atoms: int = 80, seed: int = 0
) -> List[Dict[str, np.ndarray]]:
    rng = np.random.RandomState(seed)
    zvals = np.array([1, 6, 8, 13, 29, 46, 78])  # H C O Al Cu Pd Pt
    samples = []
    for _ in range(n_samples):
        n = rng.randint(min_atoms, max_atoms + 1)
        z = rng.choice(zvals, size=n)
        x = rng.randn(n, 3).astype(np.float32) * 3.0
        d = np.linalg.norm(x[:, None] - x[None, :], axis=-1) + np.eye(n)
        e = np.float32((np.exp(-d / 2).sum() - n) * 0.1 + 0.001 * z.sum())
        samples.append({"z": z.astype(np.int32), "x": x, "e": e})
    return samples


def load_oc20(
    data_dir: str | None = None, n_samples: int = 512, seed: int = 0
) -> List[Dict[str, np.ndarray]]:
    if data_dir and os.path.isdir(data_dir):
        lmdbs = sorted(
            os.path.join(data_dir, f)
            for f in os.listdir(data_dir)
            if f.endswith(".lmdb")
        )
        if lmdbs:
            try:
                out: List[Dict[str, np.ndarray]] = []
                for p in lmdbs:
                    out.extend(load_oc20_lmdb(p))
                return out
            except ImportError:
                pass
    return synthesize_oc20(n_samples, seed=seed)
