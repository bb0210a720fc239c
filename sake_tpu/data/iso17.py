"""ISO17 energy+force dataset (C7O2H10 isomers, fixed 19 atoms).

The reference reads the ``ase.db`` files (``scripts/iso17/run.py:9-33``:
reference_eV energies, atomic_forces) with in-distribution and
out-of-distribution eval splits (``iso17/eval.py``). Gated on ase and file
presence; synthesized otherwise (fixed-size 19-atom conformers with the
MD17 surrogate potential — ISO17 molecules are all C7O2H10).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from sake_tpu.data.md17 import _surrogate_energy_forces

ISO17_Z = np.array([6] * 7 + [8] * 2 + [1] * 10, dtype=np.int32)  # C7O2H10


@dataclass
class ISO17Data:
    x: np.ndarray  # (B, 19, 3)
    e: np.ndarray  # (B, 1)
    f: np.ndarray  # (B, 19, 3)
    z: np.ndarray  # (19,)


def load_iso17_db(path: str, limit: int | None = None) -> ISO17Data:
    """Read an ISO17 ``ase.db`` file (reference: ``scripts/iso17/run.py:9-33``)."""
    from ase.db import connect  # optional dep; not baked — callers gate

    xs, es, fs = [], [], []
    with connect(path) as db:
        for i, row in enumerate(db.select()):
            if limit is not None and i >= limit:
                break
            xs.append(row.positions)
            es.append(row["total_energy" if "total_energy" in row else "energy"])
            fs.append(np.asarray(row.data["atomic_forces"]))
    return ISO17Data(
        x=np.asarray(xs, np.float32),
        e=np.asarray(es, np.float32).reshape(-1, 1),
        f=np.asarray(fs, np.float32),
        z=ISO17_Z,
    )


def synthesize_iso17(n_samples: int = 2000, seed: int = 0) -> ISO17Data:
    rng = np.random.RandomState(seed)
    template = rng.randn(len(ISO17_Z), 3) * 2.0
    x = template[None] + 0.15 * rng.randn(n_samples, len(ISO17_Z), 3)
    e, f = _surrogate_energy_forces(x, ISO17_Z.astype(np.float64))
    return ISO17Data(x=x.astype(np.float32), e=e, f=f, z=ISO17_Z)


def load_iso17(
    data_dir: str | None = None,
    split: str = "reference",
    n_samples: int = 2000,
    seed: int = 0,
) -> ISO17Data:
    """``split``: reference (train), test_within (in-distribution eval),
    test_other (out-of-distribution eval) — the reference's three db files."""
    path = os.path.join(data_dir or ".", f"{split}.db")
    if data_dir and os.path.exists(path):
        try:
            return load_iso17_db(path)
        except ImportError:
            pass  # no ase in this environment — fall through
    return synthesize_iso17(n_samples, seed=seed + hash(split) % 1000)
