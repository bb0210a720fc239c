"""Kernel-variant probe: verify + time one fused E+F kernel config on the
real chip. Run as a subprocess per config (Mosaic compile failures can
SIGKILL the remote compile helper; a probe must be killable).

Usage:
    python kern_probe.py <impl> <batch> [key=val ...]

impl: depthgrid | fori | resid | resid-fwd | fori-fwd
      (the -fwd variants are timing-only: the backward kernel is
      dead-code-eliminated and F is filled with the cached truth)
keys: bt (batch_tile), prec (hi|high|default), dtype (bf16|f32),
      eprec/edtype (edge-matmul tier overrides), pad (0|1),
      rdtype (f32|bf16|bf16x, resid residual storage),
      ch (resid batch chunk), pdtype (bf16 pooled products — measured
      slower; see CLAUDE.md)

Prints PROBE_COMPILE_S, PROBE_VERIFIED f_err=... err_lax=... (against
the HIGHEST-precision oracle, cached per batch in /tmp), and
PROBE_RESULT <evals/s>.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    impl = sys.argv[1]
    batch = int(sys.argv[2])
    kv = dict(a.split("=", 1) for a in sys.argv[3:])
    bt = int(kv.get("bt", 4))
    PREC = {
        "hi": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": None,
    }
    DT = {"bf16": jnp.bfloat16, "f32": None}
    prec = PREC[kv.get("prec", "hi")]
    dtype = DT[kv.get("dtype", "f32")]
    eprec = PREC[kv["eprec"]] if "eprec" in kv else None
    edtype = DT[kv["edtype"]] if "edtype" in kv else None
    pad = kv.get("pad", "0") == "1"

    sys.path.insert(0, "/root/repo")
    import os

    import bench
    from sake_tpu.data.md17 import ASPIRIN_Z
    from sake_tpu.kernels import model_params_from_linen
    from sake_tpu.models import SAKEModel
    from sake_tpu.tasks.md17 import make_energy_force_fn

    # Oracle outputs are deterministic per batch (seed 0); cache them so a
    # probe sweep doesn't redo two lax compiles per subprocess. The cache
    # lives IN-REPO (.kern_oracle/, committed): /tmp is wiped between
    # sessions, and recomputing the HIGHEST-precision truth (~6 min cold)
    # plus a cold one_ef Mosaic compile (~20 min) cannot fit bench.py's
    # budget — observed 2026-08-21. Staleness is self-correcting: if the
    # model code changes, the cached truth no longer matches ANY correct
    # kernel and the f_err gate rejects the variant (bench then carries
    # last_verified), so a wrong cache can never mint a headline.
    cdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".kern_oracle")
    cache = os.path.join(cdir, f"oracle_{batch}.npz")
    tmp_cache = f"/tmp/kern_probe_oracle_{batch}.npz"
    if not os.path.exists(cache) and os.path.exists(tmp_cache):
        cache = tmp_cache
    model = SAKEModel(hidden_features=64, out_features=1, depth=6)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, len(ASPIRIN_Z), 3) * 1.5, jnp.float32)
    sp = jax.nn.one_hot(ASPIRIN_Z, ASPIRIN_Z.max())
    h0 = jnp.broadcast_to(sp, (len(ASPIRIN_Z), sp.shape[-1]))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), h0, x[0])
    if os.path.exists(cache):
        d = np.load(cache)
        e_t, f_t, err_lax = d["e_t"], d["f_t"], float(d["err_lax"])
    else:
        # the lax path OOMs HBM above batch 2048 — evaluate the oracle in
        # 2048-sized pieces (the kernels themselves scale past it)
        piece = min(batch, 2048)

        def _piecewise(ef):
            es, fs = [], []
            for s_ in range(0, batch, piece):
                e_, f_ = ef(params, x[s_ : s_ + piece])
                jax.block_until_ready((e_, f_))
                es.append(np.asarray(e_))
                fs.append(np.asarray(f_))
            return np.concatenate(es), np.concatenate(fs)

        ef_lax = jax.jit(make_energy_force_fn(model, sp, 0.0, 1.0))
        e_ref, f_ref = _piecewise(ef_lax)
        # truth: lax path at HIGHEST matmul precision (measured ~4e-5 from
        # CPU fp32 truth; see CLAUDE.md measurement log)
        with jax.default_matmul_precision("highest"):
            ef_hi = jax.jit(make_energy_force_fn(model, sp, 0.0, 1.0))
            e_t, f_t = _piecewise(ef_hi)
        scale = float(np.abs(f_t).max()) + 1e-12
        err_lax = float(np.abs(f_ref - f_t).max()) / scale
        os.makedirs(cdir, exist_ok=True)
        np.savez(os.path.join(cdir, f"oracle_{batch}.npz"),
                 e_t=e_t, f_t=f_t, err_lax=err_lax)
    f_scale = float(np.abs(f_t).max()) + 1e-12

    kp = model_params_from_linen(params)
    h = jnp.broadcast_to(
        sp, (batch, len(ASPIRIN_Z), sp.shape[-1])
    ).astype(jnp.float32)

    kw = dict(
        batch_tile=bt,
        matmul_dtype=dtype,
        precision=prec,
        edge_matmul_dtype=edtype,
        edge_precision=eprec,
    )
    if impl == "depthgrid":
        from sake_tpu.kernels.depthgrid_ef import depthgrid_energy_forces

        ef = jax.jit(lambda p, xx: depthgrid_energy_forces(p, h, xx, **kw))
    elif impl == "fori":
        from sake_tpu.kernels.fori_ef import fori_energy_forces

        ef = jax.jit(
            lambda p, xx: fori_energy_forces(p, h, xx, pad_atoms=pad, **kw)
        )
    elif impl == "resid":
        from sake_tpu.kernels.resid_ef import resid_energy_forces

        rd = kv.get("rdtype", "f32")
        rdt = jnp.float32 if rd == "f32" else jnp.bfloat16
        from sake_tpu.kernels.resid_ef import _EDGE_RESIDS, _NODE_RESIDS
        lowp = None
        if rd == "bf16":  # TRUE all-bf16 residuals incl. geometry planes
            # (measured to FAIL the force gate — kept probeable on purpose)
            lowp = set(_EDGE_RESIDS + _NODE_RESIDS)
        elif rd == "bf16x":  # everything except the geometry planes (r, t)
            lowp = set(_EDGE_RESIDS + _NODE_RESIDS) - {"r", "t"}
        ch = int(kv.get("ch", 512))
        pdt = jnp.bfloat16 if kv.get("pdtype") == "bf16" else None
        sp = kv.get("sp")  # None | mxu | mxuf | mxub
        spdt = DT[kv["spdt"]] if "spdt" in kv else None
        spprec = PREC[kv["spprec"]] if "spprec" in kv else None
        gp = kv.get("gp", "0") == "1"  # parallel batch grid dim
        ef = jax.jit(
            lambda p, xx: resid_energy_forces(
                p, h, xx, pad_atoms=pad, resid_dtype=rdt, chunk=ch,
                resid_lowp=lowp, pool_dtype=pdt, spatial_mode=sp,
                pool_matmul_dtype=spdt, pool_precision=spprec,
                batch_parallel=gp, **kw
            )
        )
    elif impl == "one":
        from sake_tpu.kernels.one_ef import one_energy_forces

        rd = kv.get("rdtype", "f32")
        rdt = jnp.float32 if rd == "f32" else jnp.bfloat16
        from sake_tpu.kernels.resid_ef import _EDGE_RESIDS, _NODE_RESIDS
        lowp = None
        if rd == "bf16":  # true all-bf16 scratch (geometry planes too)
            lowp = set(_EDGE_RESIDS + _NODE_RESIDS)
        elif rd == "bf16x":  # everything except the geometry planes (r, t)
            lowp = set(_EDGE_RESIDS + _NODE_RESIDS) - {"r", "t"}
        vmem = int(kv["vmem"]) * 1024 * 1024 if "vmem" in kv else None
        gp = kv.get("gp", "0") == "1"  # parallel batch grid dim
        ef = jax.jit(
            lambda p, xx: one_energy_forces(
                p, h, xx, pad_atoms=pad, resid_dtype=rdt, resid_lowp=lowp,
                vmem_limit=vmem, batch_parallel=gp, **kw
            )
        )
    elif impl in ("resid-fwd", "fori-fwd"):
        # TIMING-ONLY: evaluate just the energy output, so XLA dead-code
        # eliminates the backward kernel — isolates the forward half. F is
        # filled with the truth so the verification step passes trivially.
        from sake_tpu.kernels.fori_ef import fori_energy_forces
        from sake_tpu.kernels.resid_ef import resid_energy_forces

        f_truth = jnp.asarray(f_t)
        if impl == "resid-fwd":
            rdt = (
                jnp.float32 if kv.get("rdtype", "f32") == "f32"
                else jnp.bfloat16
            )
            full = lambda p, xx: resid_energy_forces(
                p, h, xx, pad_atoms=pad, chunk=int(kv.get("ch", 512)),
                resid_dtype=rdt, **kw
            )
        else:
            full = lambda p, xx: fori_energy_forces(
                p, h, xx, pad_atoms=pad, **kw
            )
        ef = jax.jit(lambda p, xx: (full(p, xx)[0], f_truth))
    else:
        raise SystemExit(f"unknown impl {impl}")

    t0 = time.perf_counter()
    e, f = ef(kp, x)
    jax.block_until_ready((e, f))
    print(f"PROBE_COMPILE_S {time.perf_counter() - t0:.1f}", flush=True)
    e_t = np.asarray(e_t).ravel()  # lax path returns (B, 1), kernels (B,)
    f_err = float(jnp.abs(f - f_t).max()) / f_scale
    e_err = float(jnp.abs(np.asarray(e).ravel() - e_t).max()) / (
        float(np.abs(e_t).max()) + 1e-12
    )
    print(
        f"PROBE_VERIFIED f_err={f_err:.2e} e_err={e_err:.2e} "
        f"err_lax={err_lax:.2e}",
        flush=True,
    )
    rate = bench.measure(ef, kp, x)
    print(f"PROBE_RESULT {rate:.1f}", flush=True)


if __name__ == "__main__":
    main()
