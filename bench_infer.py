"""Benchmark: MD17 aspirin ENERGY-only inference evals/s/chip (verified).

The E+F headline (``bench.py``) pays one forward plus one position-gradient
backward per evaluation. The tasks' jitted INFERENCE path
(``jax.jit(forward)`` for property prediction / energy eval — capability
match for the reference's separate energy jit,
``/root/reference/scripts/md17/eval.py`` and ``scripts/nbody/speed.py``)
runs only the no-streaming forward kernel
(``kernels/resid_ef.make_hidden_fn``'s ``_fwd_infer``) plus the XLA
readout. This artifact records that rate as a first-class number.

Unlike ``kern_probe.py``'s ``-fwd`` variants — timing-only probes whose F
output is filled with cached truth, and which ``bench.py`` therefore
REJECTS from the E+F headline by design — the energies measured here are
the real model output and are verified against the HIGHEST-precision lax
oracle before any number is reported (repo protocol: no kernel number
without an oracle check).

Prints ONE JSON line:
``{"metric": "md17_aspirin_energy_inference", "value": N,
"unit": "evals/s/chip", "impl": ..., "batch": N, "e_err": ...,
"e_err_lax": ..., "sweep": {...}}``

Usage: ``python bench_infer.py [batch]`` (default 8192; inference has no
residual HBM traffic so large batches fit).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# verified-accuracy gate: kernel energies must be within 2x the default-
# precision lax path's own distance from the HIGHEST-precision oracle,
# or within an absolute fp32 floor for when the lax path is near-exact
E_ERR_FACTOR = 2.0
E_ERR_FLOOR = 1e-4


def _measure_e(fn, params, x, min_seconds=2.0, chain=8) -> float:
    """Same protocol as bench.measure: chains of async dispatches ended by
    a host readback (a value transfer cannot lie over the device tunnel)."""
    e = fn(params, x)
    jax.block_until_ready(e)
    float(np.asarray(e).ravel()[0])
    n_iter, elapsed = 0, 0.0
    t0 = time.perf_counter()
    while elapsed < min_seconds:
        for _ in range(chain):
            e = fn(params, x)
        float(np.asarray(e).ravel()[0])
        n_iter += chain
        elapsed = time.perf_counter() - t0
    return n_iter * x.shape[0] / elapsed


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    from sake_tpu.data.md17 import ASPIRIN_Z
    from sake_tpu.kernels import model_params_from_linen
    from sake_tpu.kernels.resid_ef import make_hidden_fn
    from sake_tpu.models import SAKEModel

    model = SAKEModel(hidden_features=64, out_features=1, depth=6)
    rng = np.random.RandomState(0)
    n_at = len(ASPIRIN_Z)
    x = jnp.asarray(rng.randn(batch, n_at, 3) * 1.5, jnp.float32)
    sp = jax.nn.one_hot(ASPIRIN_Z, ASPIRIN_Z.max())
    h0 = jnp.broadcast_to(sp, (n_at, sp.shape[-1]))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), h0, x[0])
    h = jnp.broadcast_to(sp, (batch, n_at, sp.shape[-1])).astype(jnp.float32)

    def lax_energy(p, xx):
        out, _, _ = model.apply(p, h[: xx.shape[0]], xx)
        return out.sum(axis=(-2, -1))

    e_lax_fn = jax.jit(lax_energy)
    # oracle: lax at HIGHEST matmul precision (measured ~4e-5 from CPU
    # fp32 truth; CLAUDE.md measurement log) — evaluated in pieces to
    # stay inside the lax path's HBM envelope
    piece = min(batch, 2048)

    def _piecewise(fn):
        es = []
        for s in range(0, batch, piece):
            e = fn(params, x[s : s + piece])
            jax.block_until_ready(e)
            es.append(np.asarray(e))
        return np.concatenate(es)

    e_ref = _piecewise(e_lax_fn)
    with jax.default_matmul_precision("highest"):
        e_t = _piecewise(jax.jit(lax_energy))
    e_scale = float(np.abs(e_t).max()) + 1e-12
    e_err_lax = float(np.abs(e_ref - e_t).max()) / e_scale
    gate = max(E_ERR_FACTOR * e_err_lax, E_ERR_FLOOR)

    kp = model_params_from_linen(params)
    sweep = {}
    best = None

    # lax rate at its best feasible batch (memory-bound at 2048)
    t_rate = _measure_e(e_lax_fn, params, x[:piece])
    sweep["lax"] = round(t_rate, 1)
    best = ("lax", t_rate, e_err_lax)

    for bt in (4, 8):
        hidden = make_hidden_fn(
            batch_tile=bt, pad_atoms=True, edge_matmul_dtype=jnp.bfloat16
        )

        def k_energy(p_pair, xx, hidden=hidden):
            kp_, = p_pair
            h_fin = hidden(kp_, h, xx, None)
            B, N, F = h_fin.shape
            z = jax.nn.silu(h_fin.reshape(B * N, F) @ kp_.w_out0 + kp_.b_out0)
            e = (z @ kp_.w_out1 + kp_.b_out1).reshape(B, N, -1)
            return e.sum(axis=(-2, -1))

        fn = jax.jit(k_energy)
        t0 = time.perf_counter()
        try:
            e_k = fn((kp,), x)
            jax.block_until_ready(e_k)
        except Exception as exc:  # compile/VMEM failures: skip the variant
            sweep[f"infer:bt={bt}"] = f"failed: {type(exc).__name__}"
            continue
        compile_s = time.perf_counter() - t0
        e_err = float(np.abs(np.asarray(e_k) - e_t).max()) / e_scale
        if e_err > gate:
            sweep[f"infer:bt={bt}"] = f"REJECTED e_err={e_err:.2e}"
            continue
        rate = _measure_e(fn, (kp,), x)
        sweep[f"infer:bt={bt}"] = round(rate, 1)
        sweep[f"infer:bt={bt}:e_err"] = f"{e_err:.2e}"
        sweep[f"infer:bt={bt}:compile_s"] = round(compile_s, 1)
        if rate > best[1]:
            best = (f"infer:bt={bt}", rate, e_err)

    impl, rate, e_err = best
    print(
        json.dumps(
            {
                "metric": "md17_aspirin_energy_inference",
                "value": round(rate, 1),
                "unit": "evals/s/chip",
                # no north-star target exists for inference; the baseline
                # here is the XLA/lax path at its best feasible batch
                "vs_baseline": round(rate / t_rate, 2),
                "impl": impl,
                "batch": batch,
                "e_err": float(f"{e_err:.3e}"),
                "e_err_lax": float(f"{e_err_lax:.3e}"),
                "gate": float(f"{gate:.3e}"),
                "sweep": sweep,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
