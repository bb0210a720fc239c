"""Benchmark: MD17 aspirin energy+force evaluations per second per chip.

The north-star metric (BASELINE.json): fused E+F evaluation — one forward
plus one position-gradient backward of the flagship SAKE model (hidden=64,
depth=6, the ``scripts/md17/run.py:40-44`` config) on aspirin (21 atoms).

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "evals/s/chip", "vs_baseline": N}``
where ``vs_baseline`` is the ratio against the 50,000 evals/s/chip
north-star target (>= 1.0 means target met).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sake_tpu.data.md17 import ASPIRIN_Z
from sake_tpu.models import SAKEModel
from sake_tpu.tasks.md17 import make_energy_force_fn

TARGET_EVALS_PER_SEC = 50_000.0


def build(batch: int, *, kernel: str = "auto"):
    z = ASPIRIN_Z
    n = len(z)
    species = jax.nn.one_hot(z, z.max())
    model = SAKEModel(hidden_features=64, out_features=1, depth=6)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, n, 3) * 1.5, jnp.float32)
    h0 = jnp.broadcast_to(species, (n, species.shape[-1]))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), h0, x[0])
    ef = jax.jit(make_energy_force_fn(model, species, 0.0, 1.0))
    return ef, params, x


def measure(ef, params, x, min_seconds: float = 2.0) -> float:
    e, f = ef(params, x)
    jax.block_until_ready((e, f))  # warmup/compile
    n_iter, elapsed = 0, 0.0
    t0 = time.perf_counter()
    while elapsed < min_seconds:
        e, f = ef(params, x)
        jax.block_until_ready((e, f))
        n_iter += 1
        elapsed = time.perf_counter() - t0
    return n_iter * x.shape[0] / elapsed


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    ef, params, x = build(batch)
    evals_per_sec = measure(ef, params, x)
    print(
        json.dumps(
            {
                "metric": "md17_aspirin_energy_force_evals_per_sec_per_chip",
                "value": round(evals_per_sec, 1),
                "unit": "evals/s/chip",
                "vs_baseline": round(evals_per_sec / TARGET_EVALS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
