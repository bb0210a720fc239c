"""SECOND-order sparse training throughput: force-loss (F = -dE/dx)
training on the Pallas sparse edge kernels vs lax double autodiff.

Round-5 stretch (VERDICT r4 item 7): the MD17 force-matching objective
(``/root/reference/scripts/md17/run.py:54-70``) at cutoff-sparse scale.
The kernel path is ``make_sparse_kernel_force_loss`` — reverse-over-
reverse through the two-level custom_vjp edge op: inner transpose = the
first backward kernel; outer grad = the param-grad backward (∂E/∂p) +
the second-order pullback kernel ``_call_bwd2`` (VJP of the whole edge
pullback, ∂²E/∂p∂x Hessian terms in-kernel). The lax leg is plain
double autodiff through ``sparse.sparse_model_forward(remat=True)``,
measured at its HBM-feasible N (halved until it fits, reported as
``lax_n``) while the kernel takes the full requested N.

Protocol mirrors bench_sparse_train.py: PARITY GATE first (same N both
paths — loss rel + worst ModelParams-leaf grad rel under the bf16-edge
tier), then a timed adam train step (jit, median of ``reps``). Prints
ONE JSON line (BENCH_SPARSE_TRAIN2.json).

Usage::

    python bench_sparse_train2.py [N] [reps] [block_rows] [bn2]
"""

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

FEATURES = 5
GRAD_GATE = 1e-1   # worst-leaf rel err, bf16-edge tier (train_ef gate)
LOSS_GATE = 5e-2   # per-atom cancellation tier (see bench_sparse_train)


def _median_time(fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    block_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    bn2 = int(sys.argv[4]) if len(sys.argv) > 4 else None
    # argv[5] "bf16g": bf16 h-gathers — halves the per-layer gathered
    # residuals the training graph keeps live (the N=16384 step misses
    # HBM by 200M at f32 gathers; measured BETTER f_err at 16384 eval)
    gather_dtype = (
        jnp.bfloat16 if len(sys.argv) > 5 and sys.argv[5] == "bf16g"
        else None
    )
    cutoff, max_nbr = 5.0, 64

    from sake_tpu.kernels import model_params_from_linen
    from sake_tpu.kernels.sparse_ef import (
        SPARSE_TRAIN_COMPILER_OPTIONS,
        make_sparse_kernel_force_loss,
    )
    from sake_tpu.models import SAKEModel
    from sake_tpu.sparse import neighbor_list, sparse_model_forward

    rng = np.random.RandomState(0)
    model = SAKEModel(hidden_features=64, out_features=1, depth=6)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.randn(8, FEATURES), jnp.float32),
        jnp.asarray(rng.randn(8, 3), jnp.float32),
    )
    kp = model_params_from_linen(params)

    def inputs(nn):
        side = (nn / 0.05) ** (1.0 / 3.0)
        x = jnp.asarray(rng.rand(1, nn, 3) * side, jnp.float32)
        h = jax.nn.one_hot(
            jnp.asarray(rng.randint(0, FEATURES, (1, nn))), FEATURES
        ).astype(jnp.float32)
        f_t = jnp.asarray(rng.randn(1, nn, 3), jnp.float32)
        e_t = jnp.asarray(rng.randn(1), jnp.float32) * 10.0
        return x, h, f_t, e_t

    nlist = jax.jit(
        lambda x_: neighbor_list(x_, cutoff, max_nbr, row_chunk=1024)
    )

    def make_lax_loss(h_):
        def loss(p, x, idx, m, f_t, e_t):
            def e_sum(x_):
                out, _, _ = sparse_model_forward(
                    p, h_, x_, idx, m, update=False, remat=True
                )
                e_b = out.sum(axis=(-2, -1))
                return e_b.sum(), e_b

            (_, e_b), neg_f = jax.value_and_grad(e_sum, has_aux=True)(x)
            return (
                jnp.abs(-neg_f - f_t).mean()
                + 1e-3 * jnp.abs(e_b - e_t).mean()
            )
        return loss

    # ---- parity gate at the lax-feasible N (halved on OOM: the lax
    # double-autodiff program needs 63G HBM at N=16384) -------------------
    x, h, f_t, e_t = inputs(n)
    idx, m = jax.block_until_ready(nlist(x))
    kern_loss = make_sparse_kernel_force_loss(
        h, block_rows=block_rows, bn2=bn2, gather_dtype=gather_dtype
    )
    gate_n = n
    while gate_n >= 256:
        if gate_n == n:
            xg, hg, ftg, etg = x, h, f_t, e_t
            idxg, mg = idx, m
        else:
            xg, hg, ftg, etg = inputs(gate_n)
            idxg, mg = jax.block_until_ready(nlist(xg))
        try:
            lax_vg = jax.jit(jax.value_and_grad(make_lax_loss(hg)))
            l_l, g_l = jax.block_until_ready(
                lax_vg(kp, xg, idxg, mg, ftg, etg)
            )
            break
        except Exception as ex:  # noqa: BLE001 — OOM probe
            msg = str(ex)
            if not any(s in msg for s in (
                "RESOURCE_EXHAUSTED", "Ran out of memory",
                "out of memory", "exceeds the limit",
            )):
                raise
            print(f"# gate lax OOM at N={gate_n}, halving",
                  file=sys.stderr, flush=True)
            gate_n //= 2
    kg_loss = (
        kern_loss if gate_n == n
        else make_sparse_kernel_force_loss(
            hg, block_rows=block_rows, bn2=bn2, gather_dtype=gather_dtype
        )
    )
    kern_vg = jax.jit(
        jax.value_and_grad(kg_loss),
        compiler_options=SPARSE_TRAIN_COMPILER_OPTIONS,
    )
    l_k, g_k = jax.block_until_ready(kern_vg(kp, xg, idxg, mg, ftg, etg))
    loss_rel = abs(float(l_k) - float(l_l)) / max(abs(float(l_l)), 1e-9)
    worst = ("", 0.0)
    for (path, a), b in zip(
        jax.tree_util.tree_flatten_with_path(g_l)[0],
        jax.tree_util.tree_flatten(g_k)[0],
    ):
        a, b = np.asarray(a), np.asarray(b)
        err = float(np.abs(a - b).max() / max(np.abs(a).max(), 1e-8))
        if err > worst[1]:
            worst = (jax.tree_util.keystr(path), err)
    print(
        f"# parity: loss_rel {loss_rel:.2e}, worst grad rel "
        f"{worst[1]:.2e} at {worst[0]}", file=sys.stderr, flush=True,
    )
    if loss_rel > LOSS_GATE or worst[1] > GRAD_GATE:
        print(json.dumps({
            "metric": "bigsys_sparse_train2_samples_per_sec",
            "value": 0.0, "error": "parity gate failed",
            "loss_rel": loss_rel, "worst_grad_rel": worst[1],
        }))
        sys.exit(1)

    # ---- timed adam step ------------------------------------------------
    tx = optax.adam(1e-4)

    def make_step(loss_fn, opts=None):
        @partial(
            jax.jit,
            **({"compiler_options": opts} if opts else {}),
        )
        def step(p, opt, x_, idx_, m_, ft_, et_):
            lval, grads = jax.value_and_grad(loss_fn)(
                p, x_, idx_, m_, ft_, et_
            )
            upd, opt = tx.update(grads, opt, p)
            return optax.apply_updates(p, upd), opt, lval

        def run(p, opt):
            p2, opt2, lval = step(p, opt, x, idx, m, f_t, e_t)
            return lval
        return run

    opt0 = tx.init(kp)
    ksec, _ = _median_time(
        make_step(
            lambda p, *a: kern_loss(p, *a),
            opts=SPARSE_TRAIN_COMPILER_OPTIONS,
        ), kp, opt0, reps=reps,
    )
    print(f"# kernel: {ksec * 1e3:.1f} ms/step", file=sys.stderr,
          flush=True)

    # lax leg: halve N until the double-autodiff program fits HBM
    # (start from the gate's already-discovered feasible N)
    lax_n, lsec = gate_n, None
    while lax_n >= 256:
        try:
            if lax_n == n:
                xl, hl, ftl, etl = x, h, f_t, e_t
                idxl, ml = idx, m
            else:
                xl, hl, ftl, etl = inputs(lax_n)
                idxl, ml = jax.block_until_ready(nlist(xl))
            loss_l = make_lax_loss(hl)

            @jax.jit
            def lstep(p, opt, x_, idx_, m_, ft_, et_):
                lval, grads = jax.value_and_grad(loss_l)(
                    p, x_, idx_, m_, ft_, et_
                )
                upd, opt = tx.update(grads, opt, p)
                return optax.apply_updates(p, upd), opt, lval

            lsec, _ = _median_time(
                lambda p, o: lstep(p, o, xl, idxl, ml, ftl, etl)[2],
                kp, tx.init(kp), reps=reps,
            )
            break
        except Exception as ex:  # noqa: BLE001 — OOM probe
            msg = str(ex)
            if not any(s in msg for s in (
                "RESOURCE_EXHAUSTED", "Ran out of memory",
                "out of memory", "exceeds the limit",
            )):
                raise
            print(f"# lax OOM at N={lax_n}, halving", file=sys.stderr,
                  flush=True)
            lax_n //= 2
    print(f"# lax: {lsec * 1e3:.1f} ms/step at N={lax_n}",
          file=sys.stderr, flush=True)

    lax_rate = lax_n / lsec
    kern_rate = n / ksec
    print(json.dumps({
        "metric": "bigsys_sparse_train2_samples_per_sec",
        "value": round(kern_rate, 1),
        "unit": f"atom-grad-updates/s at N={n} (force-loss adam step, "
                "single chip, second-order on the sparse edge kernels)",
        "vs_lax": round(kern_rate / lax_rate, 3),
        "n_atoms": n,
        "lax_n": lax_n,
        "gate_n": gate_n,
        "ms_per_step": {"lax": round(lsec * 1e3, 2),
                        "kernel": round(ksec * 1e3, 2)},
        "parity": {
            "loss_rel": round(loss_rel, 8),
            "worst_grad_rel": round(worst[1], 6),
            "worst_grad_leaf": worst[0],
            "grad_gate": GRAD_GATE,
        },
        "block_rows": block_rows,
        "gather_dtype": "bf16" if gather_dtype is not None else "f32",
        "bn2": bn2,
        "cutoff": cutoff,
        "max_neighbors": max_nbr,
        "order": "second (force-loss) — grad(loss(E, -dE/dx), params)",
        "notes": (
            "force-matching training on the cutoff-sparse kernel path: "
            "inner force transpose = first backward kernel; outer grad "
            "= param-grad backward (dE/dp) + the bwd2 kernel (VJP of "
            "the edge pullback, in-kernel Hessian-term dW). lax leg = "
            "double autodiff through sparse_model_forward(remat=True) "
            "at its HBM-feasible N (lax_n); rates are atoms/s so the "
            "ratio is operating-point-honest."
        ),
    }))


if __name__ == "__main__":
    main()
