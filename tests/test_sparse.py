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


def test_sparse_isolated_atoms_finite(setup):
    """Zero-neighbor rows (cutoff smaller than any pair) stay finite."""
    kp, h, x = setup
    idx, m = neighbor_list(x, 1e-4, 8)
    assert float(m.sum()) == 0.0
    out, x_o, _ = sparse_model_forward(kp, h, x, idx, m)
    assert bool(jnp.isfinite(out).all()) and bool(jnp.isfinite(x_o).all())
