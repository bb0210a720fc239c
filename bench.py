"""Benchmark: MD17 aspirin energy+force evaluations per second per chip.

The north-star metric (BASELINE.json): fused E+F evaluation — one forward
plus one position-gradient backward of the flagship SAKE model (hidden=64,
depth=6, the ``scripts/md17/run.py:40-44`` config) on aspirin (21 atoms).

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "evals/s/chip", "vs_baseline": N}``
where ``vs_baseline`` is the ratio against the 50,000 evals/s/chip
north-star target (>= 1.0 means target met).

Two implementations are measured and the best is reported:
- ``lax``   — the XLA-compiled linen path (always runs; fast compile).
- ``fused`` — the Pallas merged edge-pipeline kernel, attempted in a
  subprocess bounded by ``SAKE_BENCH_FUSED_TIMEOUT`` seconds and VERIFIED
  against the lax oracle before its number can count. Disabled by default
  (timeout 0): measured on this environment it is correct but ~2.3x
  slower than lax — Mosaic's per-grid-step/per-chunk loop overhead (~50us
  per 0.5us-compute chunk) dominates at these tiny-molecule shapes, and
  the compile service is flaky (see CLAUDE.md). Kept as the starting
  point for the next round of kernel work.
"""

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

TARGET_EVALS_PER_SEC = 50_000.0


def build(batch: int):
    """lax-path (linen) fused E+F callable + inputs."""
    from sake_tpu.data.md17 import ASPIRIN_Z
    from sake_tpu.models import SAKEModel
    from sake_tpu.tasks.md17 import make_energy_force_fn

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


def build_fused(batch: int, io_tile: int = 64, chunk: int = 2):
    """Pallas merged-kernel E+F callable + inputs, plus a lax oracle for
    verification (a kernel number only counts if it computes the truth)."""
    from sake_tpu.data.md17 import ASPIRIN_Z
    from sake_tpu.kernels import model_params_from_linen
    from sake_tpu.kernels.split_ef import merged_energy_forces

    ef_lax, params, x = build(batch)
    kp = model_params_from_linen(params)
    z = ASPIRIN_Z
    species = jax.nn.one_hot(z, z.max())
    h = jnp.broadcast_to(species, (batch, len(z), species.shape[-1])).astype(
        jnp.float32
    )
    ef = jax.jit(
        lambda p, xx: merged_energy_forces(p, h, xx, io_tile=io_tile, chunk=chunk)
    )
    return ef, kp, x, ef_lax, params


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


def _fused_main(batch: int):
    """Subprocess entry: compile, VERIFY against the lax oracle, measure
    honestly (block every call), print the result."""
    import numpy as _np

    ef, kp, x, ef_lax, params = build_fused(batch)
    e, f = ef(kp, x)
    jax.block_until_ready((e, f))
    e_ref, f_ref = ef_lax(params, x)
    f_err = float(jnp.abs(f - f_ref).max())
    f_scale = float(jnp.abs(f_ref).max()) + 1e-12
    if f_err / f_scale > 1e-2:
        print(f"FUSED_REJECTED f_err={f_err} scale={f_scale}")
        return
    times = []
    for _ in range(20):
        t = time.perf_counter()
        e, f = ef(kp, x)
        jax.block_until_ready((e, f))
        times.append(time.perf_counter() - t)
    print("FUSED_RESULT", batch / float(_np.median(times)))


def _fused_subprocess(batch: int, timeout: float):
    """Measure the fused kernel in a killable subprocess; None on failure."""
    code = f"import bench; bench._fused_main({batch})"
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=timeout,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in out.stdout.splitlines():
            if line.startswith("FUSED_RESULT"):
                return float(line.split()[1])
    except (subprocess.TimeoutExpired, ValueError, OSError):
        pass
    return None


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    ef, params, x = build(batch)
    value, impl = measure(ef, params, x), "lax"

    fused_timeout = float(os.environ.get("SAKE_BENCH_FUSED_TIMEOUT", "0"))
    if fused_timeout > 0:
        fused = _fused_subprocess(batch, fused_timeout)
        if fused is not None and fused > value:
            value, impl = fused, "fused"

    print(
        json.dumps(
            {
                "metric": "md17_aspirin_energy_force_evals_per_sec_per_chip",
                "value": round(value, 1),
                "unit": "evals/s/chip",
                "vs_baseline": round(value / TARGET_EVALS_PER_SEC, 4),
                "impl": impl,
                "batch": batch,
            }
        )
    )


if __name__ == "__main__":
    main()
