"""The scientific contract: node features invariant, positions equivariant
under E(3) (translation, rotation, reflection)
(models the reference's ``sake/tests/test_equivariance.py``).

fp32 tolerance note: the velocity-update path amplifies rounding; the
*reference* layer itself drifts ~1.4e-3 in h under rotation at fp32
(measured, hidden=16). We therefore assert at that measured envelope in
fp32 and additionally prove architectural exactness in float64.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sake_tpu.layers import DenseSAKELayer
from sake_tpu.models import SAKEModel

FP32_TOL = dict(rtol=1e-3, atol=5e-3)
FP64_TOL = dict(rtol=1e-8, atol=1e-8)


def _check(apply_h_x, h, x, translation, rotation, reflection, tol):
    h0, x0 = apply_h_x(h, x)

    # translation: h invariant, x translates
    h_t, x_t = apply_h_x(h, x + translation)
    np.testing.assert_allclose(h_t, h0, **tol)
    np.testing.assert_allclose(x_t, x0 + translation, **tol)

    # rotation: h invariant, x rotates
    h_r, x_r = apply_h_x(h, x @ rotation)
    np.testing.assert_allclose(h_r, h0, **tol)
    np.testing.assert_allclose(x_r, x0 @ rotation, **tol)

    # reflection: h invariant, x reflects
    h_f, x_f = apply_h_x(h, x @ reflection)
    np.testing.assert_allclose(h_f, h0, **tol)
    np.testing.assert_allclose(x_f, x0 @ reflection, **tol)


@pytest.mark.parametrize("update", [True, False])
def test_layer_equivariance_fp32(equivariance_ops, update):
    h, x, v, translation, rotation, reflection = equivariance_ops
    layer = DenseSAKELayer(hidden_features=16, out_features=16, update=update)
    params = layer.init(jax.random.PRNGKey(0), h, x)

    def apply_h_x(h_, x_):
        h_out, x_out, _ = layer.apply(params, h_, x_)
        return h_out, x_out

    _check(apply_h_x, h, x, translation, rotation, reflection, FP32_TOL)


def test_layer_equivariance_fp64_exact(equivariance_ops):
    """In float64 the architecture must be equivariant to ~1e-8 — this is
    the check that catches real equivariance bugs (fp32 only bounds noise).
    """
    h, x, v, translation, rotation, reflection = equivariance_ops
    with jax.enable_x64(True):
        h64 = jnp.asarray(np.asarray(h), jnp.float64)
        x64 = jnp.asarray(np.asarray(x), jnp.float64)
        layer = DenseSAKELayer(hidden_features=16, out_features=16, update=True)
        params = layer.init(jax.random.PRNGKey(0), h64, x64)
        params = jax.tree.map(lambda a: a.astype(jnp.float64), params)

        def apply_h_x(h_, x_):
            h_out, x_out, _ = layer.apply(params, h_, x_)
            return h_out, x_out

        _check(
            apply_h_x,
            h64,
            x64,
            jnp.asarray(np.asarray(translation), jnp.float64),
            jnp.asarray(np.asarray(rotation), jnp.float64),
            jnp.asarray(np.asarray(reflection), jnp.float64),
            FP64_TOL,
        )


def test_model_equivariance(equivariance_ops):
    h, x, v, translation, rotation, reflection = equivariance_ops
    model = SAKEModel(hidden_features=16, out_features=16, depth=3)
    params = model.init(jax.random.PRNGKey(0), h, x)

    def apply_h_x(h_, x_):
        h_out, x_out, _ = model.apply(params, h_, x_)
        return h_out, x_out

    _check(apply_h_x, h, x, translation, rotation, reflection, FP32_TOL)


def test_velocity_equivariance(equivariance_ops):
    """Velocities must rotate with the frame and be translation-invariant
    (a velocity is a vector, not a point)."""
    h, x, v, translation, rotation, reflection = equivariance_ops
    layer = DenseSAKELayer(hidden_features=16, out_features=16, update=True)
    params = layer.init(jax.random.PRNGKey(0), h, x, v)

    _, _, v0 = layer.apply(params, h, x, v)
    _, _, v_r = layer.apply(params, h, x @ rotation, v @ rotation)
    np.testing.assert_allclose(v_r, v0 @ rotation, **FP32_TOL)

    _, _, v_t = layer.apply(params, h, x + translation, v)
    np.testing.assert_allclose(v_t, v0, **FP32_TOL)
