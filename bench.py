"""Benchmark: MD17 aspirin energy+force evaluations per second per chip.

The north-star metric (BASELINE.json): fused E+F evaluation — one forward
plus one position-gradient backward of the flagship SAKE model (hidden=64,
depth=6, the ``scripts/md17/run.py:40-44`` config) on aspirin (21 atoms).

Prints ONE-OR-MORE complete JSON lines, each of the form
``{"metric": ..., "value": N, "unit": "evals/s/chip", "vs_baseline": N,
"impl": ..., "batch": N, "sweep": {...}}``; the LAST line printed is the
final answer and every earlier line is a valid provisional snapshot.
``vs_baseline`` is the ratio against the 50,000 evals/s/chip north-star
target (>= 1.0 means target met) and ``sweep`` records the lax-path
throughput at several batch sizes plus the HBM-ceiling boundary (batch
4096 OOMs device HBM) so the memory envelope is regression-checked.

Evidence-robustness contract (round-4 lesson: the driver's window expired
before the single end-of-run print, so the round recorded ``parsed:
null``): the whole run operates under a total wall-clock budget
(``SAKE_BENCH_TOTAL_BUDGET`` seconds, default 1500) and EMITS EARLY —
a complete line goes out the moment the lax path at the main batch is
measured, an improved line after the first verified kernel variant, and a
final line at the end. Every optional stage (extra sweep points, the OOM
probe, further kernel variants, big-batch probes) first checks the
remaining budget and is skipped — recorded as ``"skipped (budget)"`` —
rather than allowed to blow the window. If the budget expires with
nothing measured, the line carries ``last_verified`` (the most recent
oracle-verified on-chip number) clearly labeled as NOT from this run.

Degraded-tunnel gate: CLAUDE.md records a tunnel mode (2026-08-19) where
single-dispatch latency looks fine but CHAINED dispatches take ~1.9 s
each and every measured number collapses uniformly. Before measuring,
``_chained_dispatch_probe`` times a chain of trivial jitted dispatches
ended by a readback; above 0.25 s/dispatch the run is flagged
``tunnel_degraded`` and ``last_verified`` rides along so a depressed
number is never mistaken for a regression.

Two implementations are measured and the best VERIFIED one is reported:

- ``lax`` — the XLA-compiled linen path (always runs; fast compile).
- Pallas kernel variants (``SAKE_BENCH_KERNEL_VARIANTS``, ";"-separated
  ``kern_probe.py`` configs, e.g. ``fori:bt=4,prec=hi,edtype=bf16,pad=1``),
  each attempted in a subprocess bounded by the smaller of
  ``SAKE_BENCH_KERNEL_TIMEOUT`` seconds and the remaining budget, and
  VERIFIED against the HIGHEST-precision oracle before its number can
  count. Mosaic compiles are cached server-side, so after a first warm
  run this is cheap. A kernel number is NEVER reported without the
  oracle check (two round-1 runs printed absurd throughputs when
  verification was skipped).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

TARGET_EVALS_PER_SEC = 50_000.0
SWEEP_BATCHES = (512, 1024, 2048)
OOM_PROBE_BATCH = 4096  # known to exceed device HBM on v5e (16.6G > 15.75G)
# ";"-separated "<impl>:key=val,..." kern_probe.py configs tried in order.
# Measured 2026-08-16/17 (v5e, batch 2048, f_err gate = 2x lax = 7.8e-3):
#   one bt=4 (gen-5 1-kernel)   = 23.6k evals/s (f_err 3.5e-3)  <- best
#   resid/bf16-resids(exc. r,t) = 23.5k (f_err 4.4e-3)
#   one bt=8 (needs vmem=124)   = 21.1k (f_err 3.5e-3)
#   fori/default-node/bf16-edge = 19.5k (f_err 4.6e-3)
#   lax                         =  9.7k
DEFAULT_KERNEL_VARIANTS = (
    "one:bt=4,prec=default,edtype=bf16,pad=1,rdtype=bf16x;"
    "resid:bt=8,prec=default,edtype=bf16,pad=1,ch=512,rdtype=bf16x;"
    "fori:bt=8,prec=default,edtype=bf16,pad=1"
)
# Most recent oracle-verified on-chip result (PERF.md) — carried on error
# or degraded-tunnel lines so an outage never erases the evidence trail.
LAST_VERIFIED = {
    "value": 25632.6,
    "impl": "one:bt=4,edtype=bf16,rdtype=bf16x,pad=1",
    "batch": 32768,
    "f_err_vs_oracle": 4.84e-3,
    "measured": "2026-08-21 on-chip (kern_probe; historical best 25,760"
                " on 2026-08-17 — see PERF.md)",
    "vs_baseline": 0.5127,
}


def build(batch: int):
    """lax-path (linen) fused E+F callable + inputs."""
    import jax
    import jax.numpy as jnp

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
    import jax

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


def _kernel_subprocess(batch: int, variant: str, timeout: float):
    """Verify + measure a kernel variant via ``kern_probe.py`` in a
    killable subprocess (Mosaic compile failures can SIGKILL the remote
    compile helper). ``variant`` is ``"<impl>:key=val,key=val"``. Returns
    the measured rate, or None on failure/timeout/REJECTION.

    The acceptance gate lives HERE (the parent): the probe's f_err against
    the HIGHEST-precision truth must be <= max(2e-3, 2x the default lax
    path's own error) — a kernel number is NEVER reported without the
    oracle check (two round-1 runs printed absurd throughputs when
    verification was skipped).
    """
    impl, _, kvs = variant.partition(":")
    if impl.endswith("-fwd"):
        # timing-only probes fill F with the cached truth (f_err ~ 0): the
        # oracle gate would pass trivially — never let one headline
        return None
    args = [a for a in kvs.split(",") if a]
    try:
        out = subprocess.run(
            [sys.executable, "kern_probe.py", impl, str(batch), *args],
            capture_output=True,
            text=True,
            timeout=timeout,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        f_err = err_lax = rate = None
        for line in out.stdout.splitlines():
            if line.startswith("PROBE_VERIFIED"):
                kv = dict(p.split("=") for p in line.split()[1:])
                f_err, err_lax = float(kv["f_err"]), float(kv["err_lax"])
            elif line.startswith("PROBE_RESULT"):
                rate = float(line.split()[1])
        if rate is None or f_err is None:
            return None
        if f_err > max(2e-3, 2.0 * err_lax):
            return None
        return rate, f_err
    except (subprocess.TimeoutExpired, ValueError, OSError):
        pass
    return None


def _oom_probe(batch: int, timeout: float = 600) -> str:
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
            timeout=timeout,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        if "PROBE_OK" in out.stdout:
            return "ok"
        err = out.stderr + out.stdout
        # the device tunnel reports HBM OOM as an XLA compile error
        if (
            "RESOURCE_EXHAUSTED" in err
            or "Ran out of memory" in err
            or "OOM" in err
        ):
            return "oom"
        return "error"
    except subprocess.TimeoutExpired:
        return "timeout"


def _wait_for_tpu(deadline: float, sleep_s: int = 90) -> bool:
    """The tunnel can go UNAVAILABLE for an hour+ (observed 2026-08-17):
    an unguarded jax op then blocks ~35 min in the client's retry loop and
    dies without printing the JSON line. Probe in a bounded subprocess and
    wait until ``deadline`` (perf_counter seconds) for the chip; return
    False if it never comes back so the caller can emit an honest error
    line — within the budget, not after the driver's window."""
    probe = (
        "import jax, jax.numpy as jnp; "
        "print(float(jax.jit(lambda x: (x @ x.T).sum())(jnp.ones((8, 128)))))"
    )
    i = 0
    while True:
        i += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe],
                timeout=min(150, max(10, deadline - time.perf_counter())),
                capture_output=True,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.perf_counter() + sleep_s + 60 > deadline:
            return False
        print(
            f"# TPU tunnel unavailable (probe {i}); waiting",
            file=sys.stderr, flush=True,
        )
        time.sleep(sleep_s)


def _chained_dispatch_probe(chain: int = 16):
    """Seconds per CHAINED dispatch of a trivial jitted op (degraded-tunnel
    gate). Healthy tunnel: well under 10 ms/dispatch. The 2026-08-19
    degradation mode ran ~1.9 s per chained dispatch while single-call
    latency looked fine — a liveness probe cannot see it, this can."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x @ x.T + 1.0)
    x = jnp.ones((128, 128))
    x = f(x)
    jax.block_until_ready(x)
    float(np.asarray(x).ravel()[0])  # sync
    t0 = time.perf_counter()
    y = x
    for _ in range(chain):
        y = f(y)
    float(np.asarray(y).ravel()[0])  # readback ends the chain
    return (time.perf_counter() - t0) / chain


def _other_headlines():
    """Key figures from the repo's OTHER verified on-chip artifacts (each
    measured by its own oracle-gated harness — see the named JSON files)
    so the driver-captured line carries the whole performance picture,
    not just the E+F axis."""
    picks = {
        "BENCH_TRAIN.json": (
            "qm9_train_samples_per_sec",
            ["value", "reference_value", "vs_reference_cross_run_median"],
        ),
        "BENCH_TRAIN_MD17.json": (
            "md17_2nd_order_train_samples_per_sec",
            ["value", "lax_value", "vs_lax"],
        ),
        "BENCH_MD.json": (
            "md_rollout_steps_per_sec",
            ["value", "lax_value"],
        ),
        "BENCH_INFER.json": (
            "energy_inference_evals_per_sec",
            ["value", "vs_baseline"],
        ),
        "BENCH_HEADLINE.json": (
            "reference_own_headline_speedups",
            ["nbody_speedup", "motion_speedup", "motion_kernel_speedup"],
        ),
        "BENCH_BIGSYS.json": (
            "bigsys_sparse_atom_evals_per_sec",
            ["value", "unit"],
        ),
        "BENCH_SPARSE_TRAIN.json": (
            "bigsys_sparse_train_samples_per_sec",
            ["value", "vs_lax", "n_atoms"],
        ),
        "BENCH_MDENGINE.json": (
            "mdengine_atom_steps_per_sec",
            ["value", "gates_passed"],
        ),
        "BENCH_SPARSE_TRAIN2.json": (
            "bigsys_sparse_train2_samples_per_sec",
            ["value", "vs_lax", "n_atoms"],
        ),
        # the convergence artifact lives at ACCURACY_MD17.json (round-4
        # verdict: the old BENCH_CONVERGENCE.json pick silently missed)
        "ACCURACY_MD17.json": (
            "md17_convergence_force_mae_ratio_vs_lax",
            ["vs_baseline", "gates_passed"],
        ),
    }
    out = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for fname, (label, keys) in picks.items():
        try:
            with open(os.path.join(here, fname)) as f:
                d = json.load(f)
            out[label] = {k: d[k] for k in keys if k in d}
        except (OSError, ValueError):
            pass
    return out


def main():
    t_start = time.perf_counter()
    budget = float(os.environ.get("SAKE_BENCH_TOTAL_BUDGET", "1500"))

    def remaining():
        return budget - (time.perf_counter() - t_start)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    headlines = _other_headlines()  # disk-only; safe before the chip is up
    state = {
        "metric": "md17_aspirin_energy_force_evals_per_sec_per_chip",
        "value": None,
        "unit": "evals/s/chip",
        "vs_baseline": None,
        "impl": None,
        "batch": batch,
        "f_err_vs_oracle": None,
        "sweep": {},
        "budget_s": budget,
        "other_headlines": headlines,
    }

    def emit(final=False):
        """Print a complete, valid JSON snapshot NOW (flushed). The driver
        takes the last line; every earlier line is a safe fallback if the
        window expires mid-run."""
        state["elapsed_s"] = round(time.perf_counter() - t_start, 1)
        state["provisional"] = not final
        print(json.dumps(state), flush=True)

    if not _wait_for_tpu(deadline=t_start + budget - 30):
        state["error"] = (
            "tpu_unavailable: tunnel backend down for the whole probe window"
        )
        # NOT a measurement from this run — carried so an outage doesn't
        # erase the round's evidence trail.
        state["last_verified"] = LAST_VERIFIED
        emit(final=True)
        return

    # degraded-tunnel gate (see module docstring)
    spd = _chained_dispatch_probe()
    state["chained_dispatch_s"] = round(spd, 4)
    if spd > 0.25:
        state["tunnel_degraded"] = True
        state["last_verified"] = LAST_VERIFIED

    # ---- lax path at the MAIN batch first: the minimum complete answer --
    ef, params, x = build(batch)
    value = measure(ef, params, x)
    del ef, params, x
    state["sweep"][str(batch)] = round(value, 1)
    state["value"] = round(value, 1)
    state["vs_baseline"] = round(value / TARGET_EVALS_PER_SEC, 4)
    state["impl"] = "lax"
    emit()  # first complete line: the lax number is on the record

    def improve(rate, impl, ferr, at_batch):
        if rate > value_box[0]:
            value_box[0] = rate
            state["value"] = round(rate, 1)
            state["vs_baseline"] = round(rate / TARGET_EVALS_PER_SEC, 4)
            state["impl"] = impl
            state["f_err_vs_oracle"] = ferr
            state["batch"] = at_batch
            return True
        return False

    value_box = [value]

    # ---- first kernel variant: the headline usually lives here ----------
    kernel_timeout = float(os.environ.get("SAKE_BENCH_KERNEL_TIMEOUT", "2700"))
    variants = [
        v
        for v in os.environ.get(
            "SAKE_BENCH_KERNEL_VARIANTS", DEFAULT_KERNEL_VARIANTS
        ).split(";")
        if v
    ]
    ranked = []  # (rate, variant) at the base batch

    def try_variant(v, at_batch, tag=None):
        t = min(kernel_timeout, remaining() - 30)
        if kernel_timeout <= 0:
            return
        if t < 120:
            state["sweep"][tag or v] = "skipped (budget)"
            return
        res = _kernel_subprocess(at_batch, v, t)
        if res is None:
            state["sweep"][tag or v] = "failed-or-timeout"
            return
        rate, ferr = res
        state["sweep"][tag or v] = round(rate, 1)
        if at_batch == batch or tag is None:
            ranked.append((rate, v))
        improve(rate, tag or v, ferr, at_batch)

    big = int(os.environ.get("SAKE_BENCH_KERNEL_BIG_BATCH", "32768"))
    if variants:
        try_variant(variants[0], batch)
        emit()  # lax + first verified kernel variant: the VERDICT minimum
        # champion's big-batch point NEXT, before the informational
        # sweep legs: it is the headline (25.6k vs 23.4k at 2048) and
        # repeatedly fell off the end of the budget when probed last
        if big > batch and isinstance(
            state["sweep"].get(variants[0]), (int, float)
        ):
            try_variant(variants[0], big, tag=f"{variants[0]}@{big}")
            emit()

    # ---- everything else is budget-gated gravy. Guarded leg-by-leg AND
    # as a whole: a tunnel blip on an informational leg must not kill
    # the process after the headline is on the record (a "response body
    # closed" mid-sweep crash cost rc!=0 on 2026-08-21) -----------------
    try:
        for b in SWEEP_BATCHES:
            if str(b) in state["sweep"]:
                continue
            if remaining() < 180:
                state["sweep"][str(b)] = "skipped (budget)"
                continue
            try:
                ef, params, x = build(b)
                state["sweep"][str(b)] = round(measure(ef, params, x), 1)
                del ef, params, x
            except Exception as ex:  # noqa: BLE001 — tunnel/OOM legs
                state["sweep"][str(b)] = (
                    "failed: " + str(ex).split("\n")[0][:120]
                )

        if os.environ.get("SAKE_BENCH_OOM_PROBE", "1") != "0":
            if remaining() > 240:
                state["sweep"][str(OOM_PROBE_BATCH)] = _oom_probe(
                    OOM_PROBE_BATCH, timeout=min(600, remaining() - 60)
                )
            else:
                state["sweep"][str(OOM_PROBE_BATCH)] = "skipped (budget)"
        emit()

        for v in variants[1:]:
            try_variant(v, batch)

        # the kernel path scales past the lax HBM ceiling (batch 4096
        # OOMs the lax program; the resident-residual kernels do not) —
        # probe the TWO best variants at a big batch too (verified like
        # the rest; the oracle is evaluated in 2048-sized pieces). Two,
        # not one: the 2048 ranking does not always hold at 8192.
        if big > batch:
            for _, v in sorted(ranked, reverse=True)[:2]:
                if f"{v}@{big}" not in state["sweep"]:
                    try_variant(v, big, tag=f"{v}@{big}")
    except Exception as ex:  # noqa: BLE001 — never lose the final line
        state["late_error"] = str(ex).split("\n")[0][:160]

    if state["impl"] == "lax":
        # no kernel variant verified THIS run (cold server Mosaic cache:
        # a one_ef recompile is ~20 min, which can exceed the budget
        # left after a cold lax compile — observed 2026-08-21). Carry
        # the most recent oracle-verified number, clearly labeled as
        # such, so a cache eviction doesn't read as a capability loss.
        state["last_verified"] = LAST_VERIFIED
    emit(final=True)


if __name__ == "__main__":
    main()
