"""MD17 force-loss TRAINING throughput: second-order gradients on kernels.

The canonical MD17 objective (reference ``scripts/md17/run.py:54-70``)
trains on ``loss = F-MAE + 1e-3 E-MAE`` with ``F = -dE/dx`` — so the
training gradient is a SECOND derivative of the model. Measures, on the
same chip with identical data (aspirin, 21 atoms, hidden=64 depth=6):

- ``lax``: plain double autodiff through the functional model (the
  XLA-optimal formulation — grad-of-(value_and_grad) scanned on device).
- ``train2``: the JVP-augmented Pallas kernel pair
  (``kernels/train2_ef.make_ef_train2``) — primal on the residual-
  streaming kernels, pullback on the augmented kernels.

Protocol: the kernel rate only counts after a one-batch parity gate
(loss + parameter-gradient agreement vs the lax double-autodiff oracle).
Prints ONE JSON line. Usage: ``python bench_md17_train.py [batch]``.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    # shared mode lax.map's its backward over 512-sample chunks of the
    # chunk-blocked saved streams (train2_ef shared_chunk), so batch
    # 1024/2048 fit HBM; the lax comparison still tops out at 512
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    # "fused" (default, measured champion 2.98x lax @ bt=4/aug_bt=2):
    # whole training backward (and primal) each in ONE Pallas program.
    # "shared" (2.56x): primal streams residuals across the custom_vjp
    # boundary, backward = hand-written tangent-only forward + 3-backward
    # aug pullback, no primal recompute. "resid": chunked jvp-of-forward
    # pipeline (2.47x). "retrace": round-3 vjp(jvp(layer)) (2.44x).
    aug_mode = sys.argv[3] if len(sys.argv) > 3 else "fused"
    # fused aug-bwd VMEM-OOMs at aug_bt=4 (199M > 128M); non-fused OOMs
    # at 8 — per-mode champion defaults
    aug_bt = (
        int(sys.argv[2]) if len(sys.argv) > 2
        else (2 if aug_mode == "fused" else 4)
    )
    aug_chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 128
    # shared-mode backward chunk; lax.map chunk slices are materialized
    # per iteration, so big batches want chunk <= 256 to fit the plan
    shared_chunk = int(sys.argv[5]) if len(sys.argv) > 5 else 512
    # decompose the fused mode's two fusions: argv[6] forces the fused
    # primal on (1) / off (0); default follows aug_mode ("fused" -> on)
    fused_primal = (
        bool(int(sys.argv[6])) if len(sys.argv) > 6 else None
    )
    # primal batch tile — the fused primal's residual OUTPUT windows
    # carry the whole depth axis ((1, depth, bt, E, C), double-buffered),
    # so its VMEM footprint is ~bt-proportional; 8 OOMs (196M > 128M)
    bt = (
        int(sys.argv[7]) if len(sys.argv) > 7
        else (4 if aug_mode == "fused" else 8)
    )

    from sake_tpu.data.md17 import ASPIRIN_Z
    from sake_tpu.kernels import model_params_from_linen
    from sake_tpu.kernels.functional import model_forward
    from sake_tpu.kernels.train2_ef import make_ef_train2
    from sake_tpu.models import SAKEModel

    z = ASPIRIN_Z
    n = len(z)
    sp = jax.nn.one_hot(z, z.max())
    model = SAKEModel(hidden_features=64, out_features=1, depth=6)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, n, 3) * 1.5, jnp.float32)
    h = jnp.broadcast_to(sp, (batch, n, sp.shape[-1])).astype(jnp.float32)
    e_t = jnp.asarray(rng.randn(batch), jnp.float32)
    f_t = jnp.asarray(rng.randn(batch, n, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), h[0], x[0])
    kp = model_params_from_linen(params)

    def ef_lax(p, h_, x_):
        def e_fn(xx):
            out, _, _ = model_forward(p, h_, xx, n_heads=4, update=True)
            return out.sum(axis=(-2, -1)).sum(), out.sum(axis=(-2, -1))

        g, e = jax.grad(e_fn, has_aux=True)(x_)
        return e, -g

    ef_k = make_ef_train2(
        n_heads=4, update=True, batch_tile=bt, aug_batch_tile=aug_bt,
        edge_matmul_dtype=jnp.bfloat16, resid_dtype=jnp.bfloat16,
        pad_atoms=True, chunk=min(batch, 512),
        aug_mode=aug_mode, aug_chunk=min(batch, aug_chunk),
        shared_chunk=shared_chunk, fused_primal=fused_primal,
    )

    def loss_with(ef, h_, x_, e_tt, f_tt):
        def loss(p):
            e, f = ef(p, h_, x_)
            return (
                jnp.abs(f - f_tt).mean() + 1e-3 * jnp.abs(e - e_tt).mean()
            )

        return loss

    tx = optax.adam(1e-4)

    def make_steps(ef, h_, x_, e_tt, f_tt):
        def step(carry, _):
            p, o = carry
            l, g = jax.value_and_grad(loss_with(ef, h_, x_, e_tt, f_tt))(p)
            u, o = tx.update(g, o)
            return (optax.apply_updates(p, u), o), l

        @jax.jit
        def steps(p, o):
            (p, o), ls = jax.lax.scan(step, (p, o), None, length=8)
            return p, o, ls

        return steps

    def measure(ef, bs):
        steps = make_steps(ef, h[:bs], x[:bs], e_t[:bs], f_t[:bs])
        o = tx.init(kp)
        p2, o2, ls = steps(kp, o)
        jax.block_until_ready(ls)
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            p2, o2, ls = steps(p2, o2)
            float(
                np.asarray(ls).ravel()[0]
                + np.asarray(jax.tree.leaves(p2)[0]).ravel()[0]
            )
            reps.append(time.perf_counter() - t0)
        return 8 * bs / float(np.median(reps))

    # --- parity gate: the kernel rate only counts if gradients agree -----
    # the lax double-autodiff program OOMs HBM above batch 512 (the
    # kernel path does not) — gate and measure lax at its feasible batch
    bl = min(batch, 512)
    l_r, g_r = jax.jit(
        jax.value_and_grad(loss_with(ef_lax, h[:bl], x[:bl],
                                     e_t[:bl], f_t[:bl]))
    )(kp)
    l_k, g_k = jax.jit(
        jax.value_and_grad(loss_with(ef_k, h[:bl], x[:bl],
                                     e_t[:bl], f_t[:bl]))
    )(kp)
    jax.block_until_ready((g_r, g_k))
    worst = max(
        float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-10))
        for a, b in zip(jax.tree.leaves(g_r), jax.tree.leaves(g_k))
    )
    l_err = abs(float(l_k) - float(l_r)) / (abs(float(l_r)) + 1e-12)
    gate_ok = worst <= 1e-1 and l_err <= 1e-3  # bf16-tier gradient noise

    lax_rate = measure(ef_lax, bl)
    kern_rate = measure(ef_k, batch) if gate_ok else None
    # when batch > bl the headline vs_lax would mix operating points
    # (throughput grows with batch) — also measure the kernel AT bl so
    # one matched-batch ratio is always on the record
    kern_rate_bl = (
        kern_rate if batch == bl
        else (measure(ef_k, bl) if gate_ok else None)
    )
    ours = max(lax_rate, kern_rate or 0.0)
    print(
        json.dumps(
            {
                "metric": "md17_aspirin_force_loss_train_samples_per_sec_per_chip",
                "value": round(ours, 1),
                "unit": "samples/s/chip",
                "lax_value": round(lax_rate, 1),
                "kernel_value": round(kern_rate, 1) if kern_rate else None,
                "vs_lax": round(ours / lax_rate, 3),
                "vs_lax_matched_batch": (
                    round(kern_rate_bl / lax_rate, 3) if kern_rate_bl
                    else None
                ),
                "parity_worst_grad_rel": round(worst, 6),
                "parity_loss_rel": round(l_err, 8),
                "batch": batch,
                "lax_batch": bl,
                "batch_tile": bt,
                "aug_batch_tile": aug_bt,
                "aug_mode": aug_mode,
                # the EFFECTIVE value (argv default None resolves inside
                # make_ef_train2 to aug_mode == "fused") so the artifact
                # is reproducible from the script's own output
                "fused_primal": (
                    fused_primal if fused_primal is not None
                    else aug_mode == "fused"
                ),
                "order": "second (force-loss) — grad(loss(E, -dE/dx), params)",
            }
        )
    )


if __name__ == "__main__":
    main()
