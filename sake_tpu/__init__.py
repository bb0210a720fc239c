"""sake_tpu — a TPU-native framework for E(n)-equivariant molecular ML.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
SAKE library (Spatial Attention Kinetic networks with E(n)-Equivariance):

- ``geometry``  — O(N^2) pairwise geometry core (displacements, distances,
  edge feature concatenation, masks).
- ``radial``    — radial basis smearing and cutoff envelopes.
- ``layers``    — SAKE message-passing layers and EGNN baselines (flax linen).
- ``models``    — depth-stacked models and readout heads.
- ``flows``     — equivariant normalizing flows (augmented coupling + CNF).
- ``kernels``   — fused Pallas TPU kernels for the hot pairwise pipeline,
  with lax reference implementations for parity testing.
- ``parallel``  — device-mesh construction and shard_map data parallelism.
- ``train``     — training state, optimizer chains, scanned epoch loops,
  checkpointing, metrics.
- ``data``      — dataset ingestion, padded/bucketed collation.
- ``tasks``     — end-to-end workload harnesses (nbody, MD17, QM9, ANI,
  OC20, ISO17, flows, motion).

The numerical contract (constants, masking semantics, activation choices)
matches the reference at fp32 tolerance; see ``tests/test_reference_parity``.
"""

from sake_tpu import geometry, radial, layers, models, flows, utils
from sake_tpu import kernels, parallel, train, data, bigsys, md, compat, sparse

# Reference-compatible aliases (reference: sake/__init__.py:1 re-exports
# functional, utils, layers, models, flows).
functional = geometry

__all__ = [
    "geometry",
    "functional",
    "radial",
    "layers",
    "models",
    "flows",
    "utils",
    "kernels",
    "parallel",
    "train",
    "data",
    "bigsys",
    "sparse",
    "md",
    "compat",
]

__version__ = "0.1.0"
