"""ANI-1x energy dataset: HDF5 ingestion, self-energy offsets, size buckets.

Capability match for ``scripts/ani/data.py``:

- ingestion of the ANI-1x HDF5 shards (``data.py:20-48``; gated on h5py and
  file presence — synthesized otherwise),
- per-element self-energy subtraction (``ELEMENT_ENERGY``, ``data.py:4-16``),
- conformers grouped by molecule size for uniform-shape batching
  (``data.py:37-48``), here through the generic
  ``sake_tpu.data.collate.BucketedDataset`` with *bounded* bucket edges
  (the reference compiled one XLA program per distinct size).
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

# self energies (Hartree) per atomic number — reference scripts/ani/data.py:4-16
ELEMENT_ENERGY = {
    1: -0.500607632585,
    6: -37.8302333826,
    7: -54.5680045287,
    8: -75.0362229210,
}
ANI_SPECIES = (1, 6, 7, 8)  # H C N O


def subtract_self_energy(z: np.ndarray, e: np.ndarray) -> np.ndarray:
    """Remove per-element atomic reference energies from total energies."""
    offset = np.zeros((), np.float64)
    for zi, ei in ELEMENT_ENERGY.items():
        offset = offset + ei * (z == zi).sum(-1)
    return (e - offset).astype(np.float32)


def load_ani_hdf5(paths: List[str]) -> List[Dict[str, np.ndarray]]:
    """Read ANI-1x HDF5 shards into per-conformer sample dicts
    (keys: ``z (N,)``, ``x (N, 3)``, ``e ()``)."""
    import h5py  # optional dependency, baked in this image

    samples: List[Dict[str, np.ndarray]] = []
    for path in paths:
        with h5py.File(path, "r") as f:
            for grp in f.values():
                for mol in grp.values():
                    z = np.asarray(mol["atomic_numbers"], np.int32)
                    xs = np.asarray(mol["coordinates"], np.float32)
                    es = np.asarray(mol["energies"], np.float64)
                    es = subtract_self_energy(z[None], es)
                    for x, e in zip(xs, es):
                        samples.append({"z": z, "x": x, "e": np.float32(e)})
    return samples


def synthesize_ani(
    n_samples: int = 2048, min_atoms: int = 4, max_atoms: int = 26, seed: int = 0
) -> List[Dict[str, np.ndarray]]:
    """Heterogeneous-size conformer list with surrogate energies — the
    structural stand-in when the HDF5 shards are absent."""
    rng = np.random.RandomState(seed)
    zvals = np.array(ANI_SPECIES)
    samples = []
    for _ in range(n_samples):
        n = rng.randint(min_atoms, max_atoms + 1)
        z = rng.choice(zvals, size=n, p=[0.55, 0.3, 0.07, 0.08])
        x = rng.randn(n, 3).astype(np.float32) * 1.5
        d = np.linalg.norm(x[:, None] - x[None, :], axis=-1) + np.eye(n)
        e = np.float32((np.exp(-d).sum() - n) * 0.3 + 0.01 * z.sum())
        samples.append({"z": z.astype(np.int32), "x": x, "e": e})
    return samples


def load_ani(
    data_dir: str | None = None, n_samples: int = 2048, seed: int = 0
) -> List[Dict[str, np.ndarray]]:
    if data_dir and os.path.isdir(data_dir):
        paths = sorted(
            os.path.join(data_dir, f)
            for f in os.listdir(data_dir)
            if f.endswith((".h5", ".hdf5"))
        )
        if paths:
            return load_ani_hdf5(paths)
    return synthesize_ani(n_samples, seed=seed)


def to_bucket_samples(samples: List[Dict[str, np.ndarray]]):
    """Per-sample dicts shaped for ``BucketedDataset`` (leading axis =
    nodes for padded keys; scalars broadcast)."""
    out = []
    for s in samples:
        n = len(s["z"])
        out.append(
            {
                "z": s["z"],
                "x": s["x"],
                # energy broadcast per-node so padding machinery is uniform;
                # readout uses the graph-level value at index 0
                "e": np.full((n, 1), s["e"], np.float32),
            }
        )
    return out


def smiles_inventory(paths: List[str], out_path: str = None):
    """Dataset SMILES inventory: list every molecule's SMILES string in a
    set of ANI HDF5 shards, optionally writing a JSON list.

    Parity for the reference's dataset-inventory utility
    (``scripts/ani/smiles.py:19-30``), minus its bugs (it json-dumps to a
    ``.pkl`` name and its ``get_data`` returns ``None`` that then gets
    ``np.save``-d). Molecule groups that carry no ``smiles`` field (e.g.
    the fixture shards CI writes) are inventoried by group name instead.
    """
    import json

    import h5py  # optional dependency, baked in this image

    smiles: List[str] = []
    for path in paths:
        with h5py.File(path, "r") as f:
            for grp in f.values():
                for name, mol in grp.items():
                    if "smiles" in mol:
                        smiles.append(
                            "".join(np.asarray(mol["smiles"]).astype(str))
                        )
                    else:
                        smiles.append(name)
    if out_path is not None:
        with open(out_path, "w") as fo:
            json.dump(smiles, fo)
    return smiles
