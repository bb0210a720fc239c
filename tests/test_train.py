"""Training-subsystem tests: loops, optimizers, checkpointing, collation."""

import jax
import jax.numpy as jnp
import numpy as np

from sake_tpu.data.collate import (
    BucketedCollater,
    BucketedDataset,
    make_bucket_edges,
    pad_graphs,
)
from sake_tpu.train import (
    Checkpointer,
    TrainState,
    make_optimizer,
    notfinite_count,
    scan_epochs,
    shuffle_batches,
)


def _toy_state(lr=1e-1):
    params = {"w": jnp.ones((3,)), "b": jnp.zeros(())}

    def apply_fn(params, x):
        return x @ params["w"] + params["b"]

    tx = make_optimizer(lr, if_finite_patience=5)
    return TrainState.create(apply_fn=apply_fn, params=params, tx=tx)


def test_scan_epochs_learns():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 3), jnp.float32)
    w_true = jnp.array([1.0, -2.0, 0.5])
    y = x @ w_true
    state = _toy_state()

    def step(state, batch):
        def loss_fn(p):
            return ((batch["x"] @ p["w"] + p["b"] - batch["y"]) ** 2).mean()

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    state, losses = jax.jit(
        lambda s: scan_epochs(step, s, {"x": x, "y": y}, batch_size=16, n_epochs=20)
    )(state)
    assert float(losses[-1]) < 1e-2
    np.testing.assert_allclose(state.params["w"], w_true, atol=0.1)


def test_shuffle_batches_shapes_and_determinism():
    data = {"a": jnp.arange(10.0), "b": jnp.arange(20.0).reshape(10, 2)}
    out1 = shuffle_batches(jax.random.PRNGKey(0), data, 3)
    out2 = shuffle_batches(jax.random.PRNGKey(0), data, 3)
    assert out1["a"].shape == (3, 3)
    assert out1["b"].shape == (3, 3, 2)
    np.testing.assert_array_equal(out1["a"], out2["a"])


def test_apply_if_finite_skips_nan_updates():
    state = _toy_state()
    good = jax.tree.map(jnp.ones_like, state.params)
    bad = jax.tree.map(lambda a: jnp.full_like(a, jnp.nan), state.params)
    p0 = state.params
    state = state.apply_gradients(bad)
    # params unchanged after a NaN update
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, b), state.params, p0
    )
    assert notfinite_count(state.opt_state) == 1
    state = state.apply_gradients(good)
    assert notfinite_count(state.opt_state) == 0  # reset on a finite step


def test_checkpointer_roundtrip(tmp_path):
    state = {"w": jnp.arange(4.0), "step": jnp.asarray(7)}
    with Checkpointer(str(tmp_path / "ckpt"), async_save=False) as ckpt:
        ckpt.save(1, state)
        ckpt.save(2, jax.tree.map(lambda a: a + 1, state))
        ckpt.wait()
        assert ckpt.latest_step() == 2
        restored = ckpt.restore(state)
    np.testing.assert_allclose(restored["w"], state["w"] + 1)


def test_pad_graphs_masks():
    graphs = [
        {"x": np.ones((3, 3), np.float32)},
        {"x": np.full((5, 3), 2.0, np.float32)},
    ]
    out = pad_graphs(graphs)
    assert out["x"].shape == (2, 5, 3)
    np.testing.assert_array_equal(out["node_mask"][0], [1, 1, 1, 0, 0])
    assert out["edge_mask"].shape == (2, 5, 5)
    assert out["x"][0, 3:].sum() == 0  # padding is zero


def test_bucket_edges_bounded():
    sizes = list(range(4, 60))
    edges = make_bucket_edges(sizes, max_buckets=5)
    assert len(edges) <= 6
    assert max(edges) == 59


def test_bucketed_collater_uniform_shapes():
    rng = np.random.RandomState(0)
    samples = [
        {"z": np.ones(n, np.int32), "x": rng.randn(n, 3).astype(np.float32)}
        for n in rng.randint(4, 30, size=100)
    ]
    ds = BucketedDataset(samples, max_buckets=4)
    assert len(ds.buckets) <= 4
    collater = BucketedCollater(ds, batch_size=8)
    seen = 0
    for edge, batch in collater:
        assert batch["x"].shape == (8, edge, 3)
        seen += 1
    assert seen == collater.batches_per_epoch()
    assert seen > 0
