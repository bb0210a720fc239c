"""Benchmark: MD17 aspirin energy+force evaluations per second per chip.

The north-star metric (BASELINE.json): fused E+F evaluation — one forward
plus one position-gradient backward of the flagship SAKE model (hidden=64,
depth=6, the ``scripts/md17/run.py:40-44`` config) on aspirin (21 atoms).

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "evals/s/chip", "vs_baseline": N,
"impl": ..., "batch": N, "sweep": {...}}``
where ``vs_baseline`` is the ratio against the 50,000 evals/s/chip
north-star target (>= 1.0 means target met) and ``sweep`` records the
lax-path throughput at several batch sizes plus the HBM-ceiling boundary
(batch 4096 OOMs device HBM) so the memory envelope is regression-checked.

Two implementations are measured and the best VERIFIED one is reported:

- ``lax``       — the XLA-compiled linen path (always runs; fast compile).
- ``depthgrid`` — the Pallas depth-on-grid kernel pair
  (``kernels/depthgrid_ef.py``), attempted in a subprocess bounded by
  ``SAKE_BENCH_KERNEL_TIMEOUT`` seconds (0 disables) and VERIFIED against
  the lax oracle before its number can count. Mosaic compiles are cached
  server-side, so after a first warm run this is cheap. A kernel number
  is NEVER reported without the oracle check (two round-1 runs printed
  absurd throughputs when verification was skipped).
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
SWEEP_BATCHES = (512, 1024, 2048)
OOM_PROBE_BATCH = 4096  # known to exceed device HBM on v5e (16.6G > 15.75G)


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


def measure(ef, params, x, min_seconds: float = 2.0, chain: int = 8) -> float:
    """Device throughput: chains of ``chain`` async dispatches ended by a
    host READBACK (a value transfer cannot lie; ``block_until_ready`` alone
    proved unreliable over the device tunnel, and a per-call sync adds
    ~25 ms of tunnel latency that a production loop would never pay)."""
    e, f = ef(params, x)
    jax.block_until_ready((e, f))  # warmup/compile
    float(np.asarray(e).ravel()[0])
    n_iter, elapsed = 0, 0.0
    t0 = time.perf_counter()
    while elapsed < min_seconds:
        for _ in range(chain):
            e, f = ef(params, x)
        float(np.asarray(e).ravel()[0] + np.asarray(f).ravel()[0])
        n_iter += chain
        elapsed = time.perf_counter() - t0
    return n_iter * x.shape[0] / elapsed


def _kernel_main(batch: int, variant: str):
    """Subprocess entry: compile the depthgrid kernel, VERIFY against the
    lax oracle, measure honestly (block every call), print the result."""
    from sake_tpu.data.md17 import ASPIRIN_Z
    from sake_tpu.kernels import model_params_from_linen
    from sake_tpu.kernels.depthgrid_ef import depthgrid_energy_forces

    kw = {
        "hi-bt4": dict(precision=jax.lax.Precision.HIGHEST, batch_tile=4),
        "hi-bt2": dict(precision=jax.lax.Precision.HIGHEST, batch_tile=2),
        "bf16-bt4": dict(matmul_dtype=jnp.bfloat16, batch_tile=4),
    }[variant]

    ef_lax, params, x = build(batch)
    e_ref, f_ref = ef_lax(params, x)
    jax.block_until_ready((e_ref, f_ref))
    # Ground truth: the same lax program at HIGHEST matmul precision
    # (measured ~4e-5 from CPU fp32 truth, vs ~1e-2 for the default-
    # precision lax path). A kernel number only counts if it is at least
    # as close to the truth as the incumbent it would replace.
    with jax.default_matmul_precision("highest"):
        from sake_tpu.models import SAKEModel
        from sake_tpu.tasks.md17 import make_energy_force_fn

        model = SAKEModel(hidden_features=64, out_features=1, depth=6)
        z0 = ASPIRIN_Z
        sp = jax.nn.one_hot(z0, z0.max())
        ef_hi = jax.jit(make_energy_force_fn(model, sp, 0.0, 1.0))
        e_t, f_t = ef_hi(params, x)
        jax.block_until_ready((e_t, f_t))
    f_scale = float(jnp.abs(f_t).max()) + 1e-12
    err_lax = float(jnp.abs(f_ref - f_t).max()) / f_scale

    kp = model_params_from_linen(params)
    z = ASPIRIN_Z
    species = jax.nn.one_hot(z, z.max())
    h = jnp.broadcast_to(species, (batch, len(z), species.shape[-1])).astype(
        jnp.float32
    )
    ef = jax.jit(lambda p, xx: depthgrid_energy_forces(p, h, xx, **kw))
    e, f = ef(kp, x)
    jax.block_until_ready((e, f))
    f_err = float(jnp.abs(f - f_t).max()) / f_scale
    if f_err > max(2e-3, 2.0 * err_lax):
        print(f"KERNEL_REJECTED f_err={f_err} err_lax={err_lax}")
        return
    print(f"KERNEL_VERIFIED f_err={f_err} err_lax={err_lax}")
    rate = measure(ef, kp, x)
    print("KERNEL_RESULT", rate)


def _kernel_subprocess(batch: int, variant: str, timeout: float):
    """Measure a kernel variant in a killable subprocess; None on failure."""
    code = f"import bench; bench._kernel_main({batch}, {variant!r})"
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=timeout,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in out.stdout.splitlines():
            if line.startswith("KERNEL_RESULT"):
                return float(line.split()[1])
    except (subprocess.TimeoutExpired, ValueError, OSError):
        pass
    return None


def _oom_probe(batch: int) -> str:
    """Run one E+F evaluation at ``batch`` in a subprocess; 'oom' / 'ok'."""
    code = (
        "import bench, jax; ef, p, x = bench.build(%d); "
        "jax.block_until_ready(ef(p, x)); print('PROBE_OK')" % batch
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=600,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        if "PROBE_OK" in out.stdout:
            return "ok"
        if "RESOURCE_EXHAUSTED" in out.stderr or "OOM" in out.stderr:
            return "oom"
        return "error"
    except subprocess.TimeoutExpired:
        return "timeout"


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    sweep = {}
    value = None
    for b in SWEEP_BATCHES:
        ef, params, x = build(b)
        rate = measure(ef, params, x)
        sweep[str(b)] = round(rate, 1)
        if b == batch:
            value = rate
        del ef, params, x
    if value is None:
        ef, params, x = build(batch)
        value = measure(ef, params, x)
        del ef, params, x
    impl = "lax"
    if os.environ.get("SAKE_BENCH_OOM_PROBE", "1") != "0":
        sweep[str(OOM_PROBE_BATCH)] = _oom_probe(OOM_PROBE_BATCH)

    kernel_timeout = float(os.environ.get("SAKE_BENCH_KERNEL_TIMEOUT", "1200"))
    if kernel_timeout > 0:
        variants = os.environ.get("SAKE_BENCH_KERNEL_VARIANTS", "hi-bt4").split(",")
        for variant in variants:
            rate = _kernel_subprocess(batch, variant, kernel_timeout)
            if rate is not None:
                sweep[f"depthgrid-{variant}"] = round(rate, 1)
                if rate > value:
                    value, impl = rate, f"depthgrid-{variant}"

    print(
        json.dumps(
            {
                "metric": "md17_aspirin_energy_force_evals_per_sec_per_chip",
                "value": round(value, 1),
                "unit": "evals/s/chip",
                "vs_baseline": round(value / TARGET_EVALS_PER_SEC, 4),
                "impl": impl,
                "batch": batch,
                "sweep": sweep,
            }
        )
    )


if __name__ == "__main__":
    main()
