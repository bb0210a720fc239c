"""Sparse-path TRAINING throughput: in-kernel dW vs lax autodiff at large N.

Round-4 verdict item 4: ``kernels/sparse_ef.py`` covered E+F *evaluation*
only; training at OC20 scale (relaxed-energy regression over thousands of
atoms, ``/root/reference/scripts/oc20_batch/run.py:93-97``) ran on the lax
sparse path. This benchmark measures the round-5 closure — first-order
parameter gradients computed INSIDE the sparse edge kernels
(``make_sparse_kernel_energy_loss``: the ``train_ef`` row-contraction-dW
idiom applied to the gathered (E, K) layout) — against lax autodiff
through ``sparse.sparse_model_forward`` on the same graph.

Protocol (flagship config: depth 6, hidden 64, 4 heads; B=1 amorphous
box at liquid density, cutoff 5.0, K<=64 — the bench_bigsys geometry):

1. PARITY GATE first, at the bench N: one ``value_and_grad`` of the
   energy-MAE loss on both paths; losses must agree and the worst
   ModelParams-leaf gradient rel err must be under the bf16-edge tier
   (the dense train kernels measured 4.5e-2 worst at this tier). A
   training number is NEVER reported without this gate.
2. Timed leg: a full adam train step (loss + grads + optax update),
   jitted with donated state, median of ``reps`` chained steps.

Prints ONE JSON line (BENCH_SPARSE_TRAIN.json schema — picked up by
bench.py's ``other_headlines``). Usage::

    python bench_sparse_train.py [N] [reps] [block_rows]
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
GRAD_GATE = 1e-1  # worst-leaf rel err: bf16-edge tier, same as train_ef
# the loss is |sum(E) - target|: the SUMMED energy of a random box
# cancels across thousands of bf16-tier per-atom terms (the sparse
# module's documented per-atom-vs-total contract), so the loss gate is
# the 2e-2 sparse tier, not machine eps — the GRAD gate is the real one
# (measured worst leaf 4.9e-3 at N=512 on-chip)
LOSS_GATE = 5e-2


def _median_time(fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    block_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    cutoff, max_nbr = 5.0, 64

    from sake_tpu.kernels import model_params_from_linen
    from sake_tpu.kernels.sparse_ef import (
        SPARSE_TRAIN_COMPILER_OPTIONS as SPARSE_TRAIN_COMPILER_OPTS,
        make_sparse_kernel_energy_loss,
    )
    from sake_tpu.models import SAKEModel
    from sake_tpu.sparse import neighbor_list, sparse_model_forward

    rng = np.random.RandomState(0)
    model = SAKEModel(hidden_features=64, out_features=1, depth=6)
    h_init = jnp.asarray(rng.randn(8, FEATURES), jnp.float32)
    x_init = jnp.asarray(rng.randn(8, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), h_init, x_init)
    kp = model_params_from_linen(params)

    side = (n / 0.05) ** (1.0 / 3.0)
    x = jnp.asarray(rng.rand(1, n, 3) * side, jnp.float32)
    h = jax.nn.one_hot(
        jnp.asarray(rng.randint(0, FEATURES, (1, n))), FEATURES
    ).astype(jnp.float32)
    e_t = jnp.asarray([0.0], jnp.float32)
    idx, m = jax.block_until_ready(
        jax.jit(lambda x_: neighbor_list(x_, cutoff, max_nbr,
                                         row_chunk=1024))(x)
    )

    def lax_loss(p, x_, idx_, m_, e_):
        out, _, _ = sparse_model_forward(
            p, h, x_, idx_, m_, update=False, remat=True
        )
        e_b = out.sum(axis=(-2, -1))
        return jnp.abs(e_b - e_).mean()

    kern_loss = make_sparse_kernel_energy_loss(
        h, update=False, block_rows=block_rows,
        edge_matmul_dtype=jnp.bfloat16,
    )

    # ---- parity gate (a training number NEVER ships without it) ---------
    l_l, g_l = jax.block_until_ready(
        jax.jit(jax.value_and_grad(lax_loss))(kp, x, idx, m, e_t)
    )
    l_k, g_k = jax.block_until_ready(
        jax.jit(
            jax.value_and_grad(kern_loss),
            compiler_options=SPARSE_TRAIN_COMPILER_OPTS,
        )(kp, x, idx, m, e_t)
    )
    loss_rel = float(abs(l_k - l_l) / (abs(l_l) + 1e-9))
    worst = ("", 0.0)
    paths = jax.tree_util.tree_flatten_with_path(g_l)[0]
    leaves_k = jax.tree_util.tree_leaves(g_k)
    for (path, a), b in zip(paths, leaves_k):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-8)
        err = float(np.abs(a - b).max() / scale)
        if err > worst[1]:
            worst = (jax.tree_util.keystr(path), err)
    verified = loss_rel < LOSS_GATE and worst[1] < GRAD_GATE
    print(
        f"# parity: loss_rel {loss_rel:.2e}, worst grad rel {worst[1]:.2e}"
        f" at {worst[0]}", file=sys.stderr, flush=True,
    )
    if not verified:
        print(json.dumps({
            "metric": "bigsys_sparse_train_samples_per_sec",
            "value": 0.0, "unit": "atom-grad-updates/s", "vs_lax": 0.0,
            "error": f"parity FAILED: loss_rel {loss_rel:.2e} worst grad "
                     f"rel {worst[1]:.2e} ({worst[0]})",
        }))
        sys.exit(1)

    # ---- timed leg: full adam train steps --------------------------------
    tx = optax.adam(1e-4)

    def make_step(loss_fn):
        @partial(jax.jit, compiler_options=SPARSE_TRAIN_COMPILER_OPTS)
        def step(p, opt, x_, idx_, m_, e_):
            l, g = jax.value_and_grad(loss_fn)(p, x_, idx_, m_, e_)
            upd, opt = tx.update(g, opt, p)
            return optax.apply_updates(p, upd), opt, l

        def run(p, opt):
            return step(p, opt, x, idx, m, e_t)

        return run

    opt0 = tx.init(kp)
    times = {}
    for name, loss_fn in (("lax", lax_loss), ("kernel", kern_loss)):
        run = make_step(loss_fn)
        sec, _ = _median_time(run, kp, opt0, reps=reps)
        times[name] = sec
        print(f"# {name}: {sec * 1e3:.1f} ms/step", file=sys.stderr,
              flush=True)

    vs_lax = times["lax"] / times["kernel"]
    print(json.dumps({
        "metric": "bigsys_sparse_train_samples_per_sec",
        "value": round(n / times["kernel"], 1),
        "unit": f"atom-grad-updates/s at N={n} (energy-MAE adam step, "
                "single chip, sparse kernel in-kernel dW)",
        "vs_lax": round(vs_lax, 3),
        "n_atoms": n,
        "ms_per_step": {k: round(v * 1e3, 2) for k, v in times.items()},
        "parity": {
            "loss_rel": round(loss_rel, 8),
            "worst_grad_rel": round(worst[1], 6),
            "worst_grad_leaf": worst[0],
            "grad_gate": GRAD_GATE,
        },
        "block_rows": block_rows,
        "cutoff": cutoff,
        "max_neighbors": max_nbr,
        "notes": (
            "first-order (energy-loss) sparse training: edge-scope dW "
            "computed inside the Pallas backward kernels (row-contraction "
            "matmuls accumulated across grid steps), node-level grads via "
            "XLA autodiff; lax leg = sparse_model_forward(remat=True) "
            "under jax.grad. Reference capability: scripts/oc20_batch "
            "energy training."
        ),
    }))


if __name__ == "__main__":
    main()
