"""Flow contract tests: mean-free outputs, exact invertibility, and
log-determinants cross-checked against brute-force ``slogdet(jacrev)``
(models the reference's ``sake/tests/test_augmented_flow.py`` and
``test_ode_flow.py`` — the latter's stale call signature fixed, quirk Q2)."""

import jax
import jax.numpy as jnp
import numpy as np

from sake_tpu.flows import AugmentedFlowLayer, AugmentedFlowModel, CenteredGaussian, ODEFlow
from sake_tpu.models import SAKEModel


def _data(b=2, n=5, f=3):
    rng = np.random.RandomState(2666)
    h = jnp.asarray(rng.randn(b, n, f), jnp.float32)
    x = jnp.asarray(rng.randn(b, n, 3), jnp.float32)
    x = x - x.mean(axis=-2, keepdims=True)
    v = jnp.asarray(rng.randn(b, n, 3), jnp.float32)
    return h, x, v


def test_centered_gaussian():
    key = jax.random.PRNGKey(0)
    s = CenteredGaussian.sample(key, (4, 5, 3))
    np.testing.assert_allclose(s.mean(axis=-2), 0.0, atol=1e-6)
    lp = CenteredGaussian.log_prob(s)
    assert lp.shape == (4,)


def test_flow_layer_invertible():
    h, x, v = _data()
    layer = AugmentedFlowLayer(hidden_features=16, depth=2)
    params = layer.init(jax.random.PRNGKey(0), h, x, v)
    x1, v1, ld_f = layer.apply(params, h, x, v, method=layer.f_forward)
    x2, v2, ld_b = layer.apply(params, h, x1, v1, method=layer.f_backward)
    np.testing.assert_allclose(x2, x, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(v2, v, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(ld_f, ld_b, rtol=1e-4)


def test_flow_model_invertible():
    h, x, v = _data()
    model = AugmentedFlowModel(depth=2, mp_depth=2, hidden_features=16)
    params = model.init(jax.random.PRNGKey(0), h, x, v)
    x1, v1, ld_f = model.apply(params, h, x, v, method=model.f_forward)
    x2, v2, ld_b = model.apply(params, h, x1, v1, method=model.f_backward)
    np.testing.assert_allclose(x2, x, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(v2, v, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(ld_f, ld_b, rtol=1e-3)


def test_flow_logdet_exact():
    """log_det must match slogdet of the brute-force (N*3, N*3) Jacobian of
    v' w.r.t. v (x passes through unchanged, so the full Jacobian is block
    triangular and the v-block carries the whole determinant)."""
    h, x, v = _data(b=1)
    layer = AugmentedFlowLayer(hidden_features=8, depth=2)
    params = layer.init(jax.random.PRNGKey(0), h, x, v)

    def fwd_v(v_flat):
        v_ = v_flat.reshape(v.shape)
        _, v1, _ = layer.apply(params, h, x, v_, method=layer.f_forward)
        return v1.reshape(-1)

    _, _, log_det = layer.apply(params, h, x, v, method=layer.f_forward)
    jac = jax.jacrev(fwd_v)(v.reshape(-1))
    _, expected = np.linalg.slogdet(np.asarray(jac, dtype=np.float64))
    np.testing.assert_allclose(log_det.sum(), expected, rtol=1e-3)


def test_flow_outputs_mean_free_translation():
    h, x, v = _data()
    layer = AugmentedFlowLayer(hidden_features=8, depth=2)
    params = layer.init(jax.random.PRNGKey(0), h, x, v)
    scale, translation = layer.apply(params, h, x, method=layer.mp)
    np.testing.assert_allclose(
        translation.mean(axis=-2), 0.0, atol=1e-5
    )
    assert np.all(np.abs(np.asarray(scale)) <= 1.0)  # tanh-bounded


def test_flow_nll_finite():
    h, x, v = _data()
    model = AugmentedFlowModel(depth=2, mp_depth=2, hidden_features=16)
    params = model.init(jax.random.PRNGKey(0), h, x, v)
    nll = model.apply(params, h, x, jax.random.PRNGKey(1), method=model.nll)
    assert np.isfinite(float(nll))


def test_ode_flow_shapes():
    _, x, _ = _data(b=2, n=5)
    model = SAKEModel(hidden_features=8, out_features=1, depth=2)
    t = jnp.ones((*x.shape[:-1], 1))
    params = model.init(jax.random.PRNGKey(0), t, x)
    y, logdet = ODEFlow.call(model, params, x, jax.random.PRNGKey(1))
    assert y.shape == (2, 5, 3)
    assert logdet.shape == (2,)


def test_odeflow_trace_identity_and_exact_jacobian():
    """The Hutchinson estimator is exactly ``u^T J u`` for any fixed probe
    ``u`` — cross-check ``ODEFlow.trace`` against the brute-force
    ``ODEFlow.jacobian`` (the reference kept these exact variants for this
    purpose, ``sake/flows.py:38-46,67-74``; they were untested in r1)."""
    from functools import partial

    _, x, _ = _data(b=2, n=4)
    model = SAKEModel(hidden_features=8, out_features=1, depth=2)
    t0 = 0.3
    t_feat = jnp.ones((*x.shape[:-1], 1)) * t0
    params = model.init(jax.random.PRNGKey(0), t_feat, x)
    dyn = partial(ODEFlow.dynamics, model, params)

    J = ODEFlow.jacobian(dyn, x, t0)  # (B, N, 3, N, 3) per-sample jacobian
    probe = jax.random.normal(jax.random.PRNGKey(7), x.shape)
    est = ODEFlow.trace(dyn, x, t0, probe)
    expected = jnp.einsum("bnd,bndme,bme->b", probe, J, probe)
    np.testing.assert_allclose(est, expected, rtol=1e-4, atol=1e-5)

    # exact_logdet of the identity-plus-scaled-jacobian of a LINEAR map is
    # checkable in closed form: use the flow-map jacobian directly
    dof = x.shape[-2] * x.shape[-1]
    J2 = J.reshape(x.shape[0], dof, dof)
    sign, expected_ld = np.linalg.slogdet(np.eye(dof) + np.asarray(J2))
    got = ODEFlow.exact_logdet(
        lambda x_: jax.vmap(jax.jacrev(lambda xi: xi + dyn(xi[None], t0)[0]))(x_),
        x,
    )
    np.testing.assert_allclose(got, expected_ld, rtol=1e-4, atol=1e-5)
