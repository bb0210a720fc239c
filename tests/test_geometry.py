"""Shape and semantics tests for the pairwise geometry core
(models the reference's ``sake/tests/test_functional.py``)."""

import jax
import jax.numpy as jnp
import numpy as np

from sake_tpu import geometry


def test_pairwise_displacement_shape_and_antisymmetry():
    x = jnp.asarray(np.random.RandomState(0).randn(5, 3), jnp.float32)
    d = geometry.pairwise_displacement(x)
    assert d.shape == (5, 5, 3)
    # out[i, j] = x[j] - x[i]
    np.testing.assert_allclose(d[1, 3], x[3] - x[1], rtol=1e-6)
    np.testing.assert_allclose(d, -d.swapaxes(0, 1), rtol=1e-6)


def test_pairwise_distance_shape_and_diagonal():
    x = jnp.asarray(np.random.RandomState(0).randn(5, 3), jnp.float32)
    d = geometry.pairwise_displacement(x)
    r = geometry.pairwise_distance(d)
    assert r.shape == (5, 5, 1)
    # diagonal is sqrt(eps), not 0 — the differentiability guard
    np.testing.assert_allclose(
        np.diag(r[..., 0]), np.sqrt(geometry.EPSILON), rtol=1e-4
    )


def test_pairwise_distance_differentiable_at_zero():
    x = jnp.zeros((3, 3))
    g = jax.grad(lambda x_: geometry.pairwise_distance(
        geometry.pairwise_displacement(x_)).sum())(x)
    assert np.all(np.isfinite(np.asarray(g)))


def test_edge_concat():
    h = jnp.asarray(np.random.RandomState(0).randn(5, 3), jnp.float32)
    hh = geometry.edge_concat(h)
    assert hh.shape == (5, 5, 6)
    # out[i, j] = concat(h[j], h[i])
    np.testing.assert_allclose(hh[1, 3, :3], h[3], rtol=1e-6)
    np.testing.assert_allclose(hh[1, 3, 3:], h[1], rtol=1e-6)


def test_edge_concat_batched():
    h = jnp.ones((2, 5, 3))
    assert geometry.edge_concat(h).shape == (2, 5, 5, 6)


def test_edge_mask_from_node_mask():
    m = jnp.array([1.0, 1.0, 0.0])
    em = geometry.edge_mask_from_node_mask(m)
    np.testing.assert_allclose(em, jnp.outer(m, m))
