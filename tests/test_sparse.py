"""Cutoff-sparse path: neighbor list correctness and exactness vs the
masked dense path (the contract documented in sake_tpu/sparse.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sake_tpu.kernels import model_forward, model_params_from_linen
from sake_tpu.models import SAKEModel
from sake_tpu.sparse import (
    densify_neighbors,
    neighbor_list,
    sparse_model_forward,
)

TOL = dict(rtol=5e-5, atol=5e-6)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    B, N, F = 2, 48, 5
    h = jnp.asarray(rng.randn(B, N, F), jnp.float32)
    x = jnp.asarray(rng.randn(B, N, 3) * 2.5, jnp.float32)
    model = SAKEModel(hidden_features=16, out_features=1, depth=2)
    params = model.init(jax.random.PRNGKey(0), h[0], x[0])
    kp = model_params_from_linen(params)
    return kp, h, x


def test_neighbor_list_matches_bruteforce(setup):
    _, _, x = setup
    cutoff, K = 2.0, 24
    idx, m = jax.jit(
        lambda x_: neighbor_list(x_, cutoff, K, row_chunk=16)
    )(x)
    xn = np.asarray(x)
    for b in range(xn.shape[0]):
        d = np.linalg.norm(xn[b][:, None] - xn[b][None], axis=-1)
        for i in range(xn.shape[1]):
            true = {
                j for j in range(xn.shape[1])
                if j != i and d[i, j] < cutoff
            }
            assert len(true) <= K, "test geometry must fit K"
            got = {
                int(idx[b, i, k])
                for k in range(K)
                if m[b, i, k] > 0
            }
            assert got == true, (b, i, got, true)


def test_sparse_matches_masked_dense(setup):
    kp, h, x = setup
    N = h.shape[1]
    idx, m = neighbor_list(x, 2.5, 32)
    mask = densify_neighbors(idx, m, N)
    out_d, x_d, v_d = model_forward(kp, h, x, mask=mask)
    out_s, x_s, v_s = sparse_model_forward(kp, h, x, idx, m)
    np.testing.assert_allclose(out_s, out_d, **TOL)
    np.testing.assert_allclose(x_s, x_d, **TOL)
    np.testing.assert_allclose(v_s, v_d, **TOL)


def test_sparse_forces_match_masked_dense(setup):
    kp, h, x = setup
    N = h.shape[1]
    idx, m = neighbor_list(x, 2.5, 32)
    mask = densify_neighbors(idx, m, N)

    def e_dense(x_):
        out, _, _ = model_forward(kp, h, x_, mask=mask)
        return out.sum()

    def e_sparse(x_, remat):
        out, _, _ = sparse_model_forward(kp, h, x_, idx, m, remat=remat)
        return out.sum()

    g_d = jax.grad(e_dense)(x)
    g_s = jax.jit(jax.grad(lambda x_: e_sparse(x_, False)))(x)
    g_r = jax.jit(jax.grad(lambda x_: e_sparse(x_, True)))(x)
    # the dense graph differentiates through its own mask=0 edges exactly
    # the same way (zeroed contributions), so gradients agree
    np.testing.assert_allclose(g_s, g_d, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(g_r, g_s, rtol=1e-6, atol=1e-7)


def test_neighbor_list_node_mask_and_ragged_chunk(setup):
    _, _, x = setup
    rng = np.random.RandomState(1)
    node_mask = jnp.asarray(rng.rand(*x.shape[:2]) > 0.3, jnp.float32)
    # row_chunk not dividing N falls back to a single chunk
    idx, m = neighbor_list(x, 2.0, 16, node_mask=node_mask, row_chunk=7)
    # no neighbor may point at a padded atom, padded rows have none
    sel_real = jnp.take_along_axis(node_mask, idx.reshape(2, -1), axis=1)
    assert bool((m.reshape(2, -1) * (1 - sel_real) == 0).all())
    assert bool((m * (1 - node_mask[:, :, None]) == 0).all())


def test_neighborlist_rollout_matches_dense_at_full_cutoff(setup):
    """With cutoff covering every pair (complete graph each rebuild), the
    neighborlist MD rollout is the dense masked all-pairs rollout."""
    from sake_tpu.kernels import model_forward
    from sake_tpu.md import neighborlist_verlet_rollout, velocity_verlet_rollout
    from sake_tpu.sparse import make_sparse_energy_forces

    kp, h, x = setup
    B, N = x.shape[:2]
    h, x = h[:, :12], x[:, :12]  # keep the dense N^2 reference cheap
    N = 12
    v0 = jnp.zeros_like(x)
    masses = jnp.ones((N,), jnp.float32)
    big = 1e3  # larger than any pair distance

    sparse_ef = make_sparse_energy_forces(h, remat=True)
    xs_s, vs_s, es_s = jax.jit(
        lambda p, x_: neighborlist_verlet_rollout(
            sparse_ef, p, x_, v0, masses, 1e-3, 6,
            cutoff=big, max_neighbors=N, rebuild_every=2,
        )
    )(kp, x)

    # dense reference on the complete-minus-self graph
    idx, m = neighbor_list(x, big, N)
    mask = densify_neighbors(idx, m, N)

    def dense_ef(p, x_):
        def e_sum(x__):
            out, _, _ = model_forward(p, h, x__, mask=mask)
            e_b = out.sum(axis=(-2, -1))
            return e_b.sum(), e_b

        (_, e_b), neg_f = jax.value_and_grad(e_sum, has_aux=True)(x_)
        return e_b, -neg_f

    xs_d, vs_d, es_d = jax.jit(
        lambda p, x_: velocity_verlet_rollout(
            dense_ef, p, x_, v0, masses, 1e-3, 6, sample_every=2
        )
    )(kp, x)
    np.testing.assert_allclose(xs_s, xs_d, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(es_s, es_d, rtol=1e-4, atol=1e-4)


def test_neighborlist_rollout_small_cutoff_finite(setup):
    """A genuinely sparse rollout (small cutoff, K << N) stays finite and
    the rebuild cadence is live (graph changes as atoms move)."""
    from sake_tpu.md import neighborlist_verlet_rollout
    from sake_tpu.sparse import make_sparse_energy_forces

    kp, h, x = setup
    v0 = jnp.zeros_like(x)
    masses = jnp.ones((x.shape[1],), jnp.float32)
    ef = make_sparse_energy_forces(h, remat=True)
    xs, vs, es = jax.jit(
        lambda p, x_: neighborlist_verlet_rollout(
            ef, p, x_, v0, masses, 5e-2, 8,
            cutoff=2.0, max_neighbors=12, rebuild_every=4, skin=0.3,
        )
    )(kp, x)
    assert xs.shape == (2, *x.shape) and es.shape == (2, x.shape[0])
    assert bool(jnp.isfinite(xs).all()) and bool(jnp.isfinite(es).all())
    assert float(jnp.abs(xs[-1] - x).max()) > 0  # atoms actually moved


def test_sparse_isolated_atoms_finite(setup):
    """Zero-neighbor rows (cutoff smaller than any pair) stay finite."""
    kp, h, x = setup
    idx, m = neighbor_list(x, 1e-4, 8)
    assert float(m.sum()) == 0.0
    out, x_o, _ = sparse_model_forward(kp, h, x, idx, m)
    assert bool(jnp.isfinite(out).all()) and bool(jnp.isfinite(x_o).all())
