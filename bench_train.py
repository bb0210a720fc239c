"""North-star #2 benchmark: QM9 training throughput vs the reference.

Runs, on the SAME chip with IDENTICAL synthetic QM9-shaped data and an
architecturally identical model (hidden=64, depth=6, update=True, masked
padded batches, mean-abs property loss):

- ``reference``: the reference's actual code path — ``sake`` imported from
  ``/root/reference`` (read-only), driven exactly like
  ``scripts/qm9_tpu/run.py:89-111``: a ``jax.pmap(axis_name="batch")`` step
  with ``lax.pmean`` gradients, ``flax.jax_utils.replicate``-style state,
  and a host-side python loop dispatching one pmap call per batch.
- ``sake_tpu``: this framework's path (``tasks/qm9.py`` structure) — the
  whole epoch scanned ON DEVICE inside a ``shard_map`` program
  (``parallel.data_parallel.make_dp_epoch``), one host round trip per
  epoch.

Prints ONE JSON line with both throughputs (molecules/sec/chip) and
``vs_baseline`` = ratio sake_tpu / reference. BASELINE.json target: >= 10x.

Usage: ``python bench_train.py [batch_size] [n_batches]``.
"""

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def make_data(n_batches: int, batch: int, n_atoms: int = 29, n_species: int = 10):
    """Synthetic QM9-shaped padded batches (one-hot species, positions,
    edge masks from variable molecule sizes, scalar targets)."""
    rng = np.random.RandomState(0)
    total = n_batches * batch
    sizes = rng.randint(5, n_atoms + 1, size=total)
    node_mask = (np.arange(n_atoms)[None, :] < sizes[:, None]).astype(np.float32)
    z = rng.randint(1, n_species, size=(total, n_atoms)) * node_mask.astype(int)
    i = jax.nn.one_hot(jnp.asarray(z), n_species)
    x = jnp.asarray(
        rng.randn(total, n_atoms, 3) * node_mask[..., None], jnp.float32
    )
    m = jnp.asarray(node_mask[:, :, None] * node_mask[:, None, :], jnp.float32)
    y = jnp.asarray(rng.randn(total, 1), jnp.float32)
    return i, x, m, y


def bench_reference(i, x, m, y, batch: int, repeats: int = 7) -> float:
    """Reference rate is the noisiest number in this file (a host-side
    python loop dispatching one pmap per batch is extremely sensitive to
    tunnel latency; measured 1,127-1,605 samples/s across round-2/3
    runs). 7 repeats + median pins it near its true central value.

    The reference's own model + training structure
    (``/root/reference/scripts/qm9_tpu/run.py:60-111``)."""
    sys.path.insert(0, "/root/reference")
    import optax
    import sake
    from flax.training.train_state import TrainState
    from functools import partial

    model = sake.models.DenseSAKEModel(
        hidden_features=64, out_features=1, depth=6, update=True
    )

    def sum_mask(m_):
        return jnp.sign(m_.sum(-1, keepdims=True))

    def loss_fn(params, i_, x_, m_, y_):
        y_hat, _, __ = model.apply(params, i_, x_, mask=m_)
        y_hat = (y_hat * sum_mask(m_)).sum(-2)
        return jnp.abs(y_ - y_hat).mean()

    @partial(jax.pmap, axis_name="batch")
    def step(state, i_, x_, m_, y_):
        grads = jax.grad(loss_fn)(state.params, i_, x_, m_, y_)
        grads = jax.lax.pmean(grads, "batch")
        return state.apply_gradients(grads=grads)

    n_dev = jax.local_device_count()
    n_batches = i.shape[0] // (batch * n_dev)
    total = n_batches * batch * n_dev

    def shard(a):
        return a[:total].reshape(n_batches, n_dev, batch, *a.shape[1:])

    i_b, x_b, m_b, y_b = shard(i), shard(x), shard(m), shard(y)

    params = jax.jit(model.init)(
        jax.random.PRNGKey(2666), i[:batch], x[:batch]
    )
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adam(5e-4)
    )
    state = jax.device_put_replicated(state, jax.local_devices())

    def epoch(state):
        # the reference's host loop: one pmap dispatch per batch
        # (scripts/qm9_tpu/run.py:110-111)
        for idx in range(n_batches):
            state = step(state, i_b[idx], x_b[idx], m_b[idx], y_b[idx])
        return state

    def force(s):
        # a host readback of a value that depends on every step of the
        # epoch; block_until_ready alone proved unreliable over the
        # device tunnel (returned before execution finished)
        return float(np.asarray(jax.tree.leaves(s.params)[0]).ravel()[0])

    state = epoch(state)  # warmup/compile
    force(state)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        state = epoch(state)
        force(state)
        times.append(time.perf_counter() - t0)
    return total / float(np.median(times))


def bench_kernel(i, x, m, y, batch: int, repeats: int = 3) -> float:
    """The Pallas train-kernel path: custom-VJP hidden-state function
    (residual streaming + hand-written backward with in-kernel parameter
    gradients), masked, scanned epoch on device."""
    import optax

    from sake_tpu.kernels import model_params_from_linen
    from sake_tpu.kernels.resid_ef import make_hidden_fn
    from sake_tpu.models import SAKEModel

    model = SAKEModel(hidden_features=64, out_features=1, depth=6)
    params = jax.jit(model.init)(jax.random.PRNGKey(2666), i[0], x[0])
    kp = model_params_from_linen(params)
    hidden = make_hidden_fn(
        # N=29->32 edge blocks are 1.8x aspirin's; bt=8 VMEM-OOMs the
        # train-bwd kernel (resident grads + leaves + windows), bt=4 fits
        batch_tile=4,
        precision=None,
        edge_matmul_dtype=jnp.bfloat16,
        resid_dtype=jnp.bfloat16,
        pad_atoms=True,
    )

    n_dev = jax.local_device_count()
    n_batches = i.shape[0] // (batch * n_dev)
    total = n_batches * batch * n_dev

    def stack(a):
        return a[:total].reshape(n_batches, batch * n_dev, *a.shape[1:])

    batches = {"i": stack(i), "x": stack(x), "m": stack(m), "y": stack(y)}

    def loss_fn(kp_, b):
        h_fin = hidden(kp_, b["i"], b["x"], b["m"])
        B, N, F = h_fin.shape
        z = jax.nn.silu(h_fin.reshape(B * N, F) @ kp_.w_out0 + kp_.b_out0)
        out = (z @ kp_.w_out1 + kp_.b_out1).reshape(B, N, -1)
        graph_live = jnp.sign(b["m"].sum(-1, keepdims=True))
        y_hat = (out * graph_live).sum(-2)
        return jnp.abs(b["y"] - y_hat).mean()

    # --- parity gate (repo protocol: no kernel number without a check) ---
    # One-batch loss + input-gradient agreement against the lax/linen
    # model: exercises the full hand-written backward. bf16 edge matmuls
    # + residuals bound the tolerance.
    b0 = {k: v[0] for k, v in batches.items()}

    def lax_loss(xx):
        y_hat, _, __ = model.apply(params, b0["i"], xx, None, b0["m"])
        graph_live = jnp.sign(b0["m"].sum(-1, keepdims=True))
        return jnp.abs(b0["y"] - (y_hat * graph_live).sum(-2)).mean()

    def kern_loss(xx):
        return loss_fn(kp, {**b0, "x": xx})

    l_ref, g_ref = jax.jit(jax.value_and_grad(lax_loss))(b0["x"])
    l_k, g_k = jax.jit(jax.value_and_grad(kern_loss))(b0["x"])
    scale = float(jnp.abs(g_ref).max()) + 1e-12
    g_err = float(jnp.abs(g_k - g_ref).max()) / scale
    l_err = abs(float(l_k) - float(l_ref)) / (abs(float(l_ref)) + 1e-12)
    if g_err > 5e-2 or l_err > 1e-2:
        raise RuntimeError(
            f"kernel train path failed parity gate: grad rel err {g_err:.2e},"
            f" loss rel err {l_err:.2e}"
        )

    tx = optax.adam(5e-4)
    opt_state = tx.init(kp)

    def step(carry, b):
        kp_, o_ = carry
        g = jax.grad(loss_fn)(kp_, b)
        u, o_ = tx.update(g, o_)
        return (optax.apply_updates(kp_, u), o_), None

    @jax.jit
    def epoch(kp_, o_):
        (kp_, o_), _ = jax.lax.scan(step, (kp_, o_), batches)
        return kp_, o_

    def force(kp_):
        return float(np.asarray(jax.tree.leaves(kp_)[0]).ravel()[0])

    kp, opt_state = epoch(kp, opt_state)  # warmup/compile
    force(kp)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        kp, opt_state = epoch(kp, opt_state)
        force(kp)
        times.append(time.perf_counter() - t0)
    return total / float(np.median(times))


def bench_kernel_bucketed(i, x, m, y, batch: int, repeats: int = 5) -> float:
    """The kernel path with SIZE-BUCKETED batches: molecules grouped by
    atom count padded to the next multiple of 8 (the reference's own ANI
    bucketing, ``scripts/ani/data.py:37-48``, applied to QM9). Identical
    per-sample math — smaller pads cut the O(N^2) edge grid ~2x on
    QM9's 5-29-atom size distribution. One scanned program per bucket.
    """
    import optax

    from sake_tpu.kernels import model_params_from_linen
    from sake_tpu.kernels.resid_ef import make_hidden_fn
    from sake_tpu.models import SAKEModel

    model = SAKEModel(hidden_features=64, out_features=1, depth=6)
    params = jax.jit(model.init)(jax.random.PRNGKey(2666), i[0], x[0])
    kp = model_params_from_linen(params)

    n_dev = jax.local_device_count()
    bs = batch * n_dev
    sizes = np.asarray(m.sum(axis=(-1, -2)) ** 0.5).round().astype(int)
    pad_to = np.maximum(8, (sizes + 7) // 8 * 8)

    # per-bucket batch tile: the train-bwd kernel VMEM-OOMs at bt=8 for
    # N=32 edge blocks, but small buckets (N <= 16) have 4-16x smaller
    # blocks — run them at bt=8
    _hidden = {
        bt: make_hidden_fn(
            batch_tile=bt,
            precision=None,
            edge_matmul_dtype=jnp.bfloat16,
            resid_dtype=jnp.bfloat16,
            pad_atoms=True,
        )
        for bt in (4, 8)
    }

    def hidden(kp_, i_, x_, m_):
        bt = 8 if x_.shape[-2] <= 16 else 4
        return _hidden[bt](kp_, i_, x_, m_)

    # group -> stacked (n_batches, bs, n_slice, ...) arrays; the stored
    # width caps the slice (the top bucket's 8-multiple may exceed it —
    # make_hidden_fn's pad_atoms completes the sublane alignment)
    n_stored = i.shape[1]
    groups = []
    total = 0
    for n_pad in sorted(set(pad_to.tolist())):
        idx = np.where(pad_to == n_pad)[0]
        nb = len(idx) // bs
        if nb == 0:
            continue
        idx = idx[: nb * bs]
        total += len(idx)
        ns = min(n_pad, n_stored)
        sl = lambda a, ns=ns, idx=idx, nb=nb: jnp.asarray(
            np.asarray(a)[idx][:, :ns].reshape(nb, bs, ns, *a.shape[2:])
        )
        groups.append(
            {
                "i": sl(i),
                "x": sl(x),
                "m": jnp.asarray(
                    np.asarray(m)[idx][:, :ns, :ns].reshape(
                        nb, bs, ns, ns
                    )
                ),
                "y": jnp.asarray(np.asarray(y)[idx].reshape(nb, bs, -1)),
                "n_pad": n_pad,
            }
        )

    def loss_fn(kp_, b):
        h_fin = hidden(kp_, b["i"], b["x"], b["m"])
        B, N, F = h_fin.shape
        zz = jax.nn.silu(h_fin.reshape(B * N, F) @ kp_.w_out0 + kp_.b_out0)
        out = (zz @ kp_.w_out1 + kp_.b_out1).reshape(B, N, -1)
        graph_live = jnp.sign(b["m"].sum(-1, keepdims=True))
        y_hat = (out * graph_live).sum(-2)
        return jnp.abs(b["y"] - y_hat).mean()

    tx = optax.adam(5e-4)

    def step(carry, b):
        kp_, o_ = carry
        g = jax.grad(loss_fn)(kp_, b)
        u, o_ = tx.update(g, o_)
        return (optax.apply_updates(kp_, u), o_), None

    # ONE jit for the whole epoch: every bucket's scan lives in a single
    # XLA program (different static shapes per scan are fine inside one
    # trace). The per-bucket-dispatch version paid one tunnel round trip
    # (~25 ms) per bucket per epoch — ~10% of the epoch at these rates.
    group_data = tuple(
        {k: g[k] for k in ("i", "x", "m", "y")} for g in groups
    )

    @partial(jax.jit, donate_argnums=(0, 1))
    def epoch(kp_, o_, gs):
        for batches in gs:
            (kp_, o_), _ = jax.lax.scan(step, (kp_, o_), batches)
        return kp_, o_

    # parity gate on the largest bucket's first batch vs the linen model
    gb = {k: groups[-1][k][0] for k in ("i", "x", "m", "y")}

    def lax_loss(xx):
        y_hat, _, __ = model.apply(params, gb["i"], xx, None, gb["m"])
        graph_live = jnp.sign(gb["m"].sum(-1, keepdims=True))
        return jnp.abs(gb["y"] - (y_hat * graph_live).sum(-2)).mean()

    l_ref, g_ref = jax.jit(jax.value_and_grad(lax_loss))(gb["x"])
    l_k, g_k = jax.jit(
        jax.value_and_grad(lambda xx: loss_fn(kp, {**gb, "x": xx}))
    )(gb["x"])
    g_err = float(jnp.abs(g_k - g_ref).max()) / (
        float(jnp.abs(g_ref).max()) + 1e-12
    )
    if g_err > 5e-2 or abs(float(l_k) - float(l_ref)) > 1e-2 * abs(float(l_ref)):
        raise RuntimeError(
            f"bucketed kernel path failed parity gate (grad rel {g_err:.2e})"
        )

    def force(kp_):
        return float(np.asarray(jax.tree.leaves(kp_)[0]).ravel()[0])

    o = tx.init(kp)
    kp2, o2 = epoch(kp, o, group_data)  # warmup/compile
    force(kp2)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        kp2, o2 = epoch(kp2, o2, group_data)
        force(kp2)
        times.append(time.perf_counter() - t0)
    return total / float(np.median(times))


def bench_sake_tpu(i, x, m, y, batch: int, repeats: int = 3) -> float:
    """This framework's path: scanned shard_map epoch (one dispatch)."""
    import optax

    from sake_tpu.models import SAKEModel
    from sake_tpu.parallel import make_dp_epoch, make_mesh, replicate_state
    from sake_tpu.train import TrainState

    model = SAKEModel(hidden_features=64, out_features=1, depth=6)

    def loss_fn(params, b):
        y_hat, _, __ = model.apply(params, b["i"], b["x"], None, b["m"])
        graph_live = jnp.sign(b["m"].sum(-1, keepdims=True))
        y_hat = (y_hat * graph_live).sum(-2)
        return jnp.abs(b["y"] - y_hat).mean()

    n_dev = jax.local_device_count()
    mesh = make_mesh((("data", n_dev),))
    n_batches = i.shape[0] // (batch * n_dev)
    total = n_batches * batch * n_dev

    def stack(a):
        return a[:total].reshape(n_batches, batch * n_dev, *a.shape[1:])

    batches = {"i": stack(i), "x": stack(x), "m": stack(m), "y": stack(y)}

    params = jax.jit(model.init)(jax.random.PRNGKey(2666), i[0], x[0])
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adam(5e-4)
    )
    state = replicate_state(state, mesh)
    epoch = jax.jit(make_dp_epoch(loss_fn, mesh), donate_argnums=0)

    def force(s):
        return float(np.asarray(jax.tree.leaves(s.params)[0]).ravel()[0])

    state, _ = epoch(state, batches)  # warmup/compile
    force(state)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, _ = epoch(state, batches)
        force(state)
        times.append(time.perf_counter() - t0)
    return total / float(np.median(times))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    i, x, m, y = make_data(n_batches, batch * jax.local_device_count())
    lax_rate = bench_sake_tpu(i, x, m, y, batch)
    import os

    kern_rate = None
    bucket_rate = None
    if os.environ.get("SAKE_BENCH_TRAIN_KERNEL", "1") != "0":
        try:
            kern_rate = bench_kernel(i, x, m, y, batch)
        except Exception as exc:  # kernel path is optional; report lax
            print(f"# kernel train path failed: {exc!r}", file=sys.stderr)
        try:
            bucket_rate = bench_kernel_bucketed(i, x, m, y, batch)
        except Exception as exc:
            print(f"# bucketed kernel path failed: {exc!r}", file=sys.stderr)
    ours = max(lax_rate, kern_rate or 0.0, bucket_rate or 0.0)
    # The reference's rate is dominated by per-batch dispatch over the
    # device tunnel (one pmap call per batch = one network round trip),
    # which drifts across sessions (observed 773-1,605 samples/s between
    # runs, each already a median-of-7). Measure it in THREE separated
    # passes and report all three: the headline ratio uses the median
    # pass, and the spread is in the JSON so the ratio's sensitivity to
    # tunnel latency is visible rather than hidden in a single draw.
    ref_passes = [bench_reference(i, x, m, y, batch) for _ in range(3)]
    ref = float(np.median(ref_passes))
    print(
        json.dumps(
            {
                "metric": "qm9_train_samples_per_sec_per_chip",
                "value": round(ours, 1),
                "unit": "samples/s/chip",
                "lax_value": round(lax_rate, 1),
                "kernel_value": round(kern_rate, 1) if kern_rate else None,
                "kernel_bucketed_value": (
                    round(bucket_rate, 1) if bucket_rate else None
                ),
                "reference_value": round(ref, 1),
                "reference_passes": [round(r, 1) for r in ref_passes],
                "vs_baseline": round(ours / ref, 3),
                "target_ratio": 10.0,
                "batch_per_device": batch,
                "n_batches": n_batches,
                "n_devices": jax.local_device_count(),
            }
        )
    )


if __name__ == "__main__":
    main()
