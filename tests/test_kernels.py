"""Kernel parity: the functional model, staged-VJP forces, and the Pallas
fused kernel (interpret mode) must match the linen/lax oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sake_tpu.kernels import (
    energy_and_forces_fn,
    fused_energy_forces,
    model_forward,
    model_params_from_linen,
)
from sake_tpu.models import SAKEModel

TOL = dict(rtol=2e-4, atol=2e-5)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    B, N, F = 4, 7, 5
    h = jnp.asarray(rng.randn(B, N, F), jnp.float32)
    x = jnp.asarray(rng.randn(B, N, 3), jnp.float32)
    model = SAKEModel(hidden_features=16, out_features=1, depth=3)
    params = model.init(jax.random.PRNGKey(0), h, x)
    kp = model_params_from_linen(params)
    return model, params, kp, h, x


def test_functional_model_matches_linen(setup):
    model, params, kp, h, x = setup
    rh, rx, rv = model.apply(params, h, x)
    oh, ox, ov = model_forward(kp, h, x)
    np.testing.assert_allclose(oh, rh, **TOL)
    np.testing.assert_allclose(ox, rx, **TOL)
    np.testing.assert_allclose(ov, rv, **TOL)


def test_functional_model_masked(setup):
    model, params, kp, h, x = setup
    rng = np.random.RandomState(1)
    node_mask = jnp.asarray(rng.rand(*h.shape[:2]) > 0.3, jnp.float32)
    mask = node_mask[..., :, None] * node_mask[..., None, :]
    rh, rx, rv = model.apply(params, h, x, None, mask)
    oh, ox, ov = model_forward(kp, h, x, mask=mask)
    m = node_mask[..., None]
    np.testing.assert_allclose(oh * m, rh * m, **TOL)
    np.testing.assert_allclose(ox * m, rx * m, **TOL)


def test_staged_vjp_forces_match_autodiff(setup):
    """The hand-staged per-layer VJP (kernel-side remat) must equal plain
    jax.grad of the energy."""
    model, params, kp, h, x = setup

    def energy(x_):
        out, _, _ = model.apply(params, h, x_)
        return out.sum(), out.sum(axis=(-2, -1))

    (_, e_ref), g = jax.value_and_grad(energy, has_aux=True)(x)
    e, f = energy_and_forces_fn(kp, h, x)
    np.testing.assert_allclose(e, e_ref, **TOL)
    np.testing.assert_allclose(f, -g, **TOL)


def test_staged_vjp_with_update_schedule(setup):
    _, _, _, h, x = setup
    model = SAKEModel(
        hidden_features=16, out_features=1, depth=3, update=[False, True, False]
    )
    params = model.init(jax.random.PRNGKey(2), h, x)
    kp = model_params_from_linen(params)

    def energy(x_):
        out, _, _ = model.apply(params, h, x_)
        return out.sum(), out.sum(axis=(-2, -1))

    (_, e_ref), g = jax.value_and_grad(energy, has_aux=True)(x)
    e, f = energy_and_forces_fn(kp, h, x, update=[False, True, False])
    np.testing.assert_allclose(e, e_ref, **TOL)
    np.testing.assert_allclose(f, -g, **TOL)


def test_fused_kernel_interpret(setup):
    """The Pallas kernel in interpreter mode (runs on CPU) matches."""
    model, params, kp, h, x = setup

    def energy(x_):
        out, _, _ = model.apply(params, h, x_)
        return out.sum(), out.sum(axis=(-2, -1))

    (_, e_ref), g = jax.value_and_grad(energy, has_aux=True)(x)
    e, f = fused_energy_forces(
        kp, h, x, batch_tile=2, matmul_dtype=None, interpret=True
    )
    np.testing.assert_allclose(e, e_ref, **TOL)
    np.testing.assert_allclose(f, -g, **TOL)


def test_split_kernels_interpret(setup):
    """The split Pallas ops (edge+attention / coeff+pool) with custom VJPs
    must reproduce E and F in interpreter mode."""
    from sake_tpu.kernels.split_ef import split_energy_forces

    model, params, kp, h, x = setup

    def energy(x_):
        out, _, _ = model.apply(params, h, x_)
        return out.sum(), out.sum(axis=(-2, -1))

    (_, e_ref), g = jax.value_and_grad(energy, has_aux=True)(x)
    e, f = split_energy_forces(
        kp, h, x, batch_tile_edge=2, batch_tile_pool=2, interpret=True
    )
    np.testing.assert_allclose(e, e_ref, **TOL)
    np.testing.assert_allclose(f, -g, **TOL)


def test_merged_kernel_interpret(setup):
    """The merged chunked edge-pipeline op must reproduce E and F."""
    from sake_tpu.kernels.split_ef import merged_energy_forces

    model, params, kp, h, x = setup

    def energy(x_):
        out, _, _ = model.apply(params, h, x_)
        return out.sum(), out.sum(axis=(-2, -1))

    (_, e_ref), g = jax.value_and_grad(energy, has_aux=True)(x)
    e, f = merged_energy_forces(kp, h, x, io_tile=4, chunk=2, interpret=True)
    np.testing.assert_allclose(e, e_ref, **TOL)
    np.testing.assert_allclose(f, -g, **TOL)


def test_depthgrid_kernel_interpret(setup):
    """The round-2 depth-on-grid kernel pair (fwd + remat bwd) must
    reproduce E and F in interpreter mode."""
    from sake_tpu.kernels.depthgrid_ef import depthgrid_energy_forces

    model, params, kp, h, x = setup

    def energy(x_):
        out, _, _ = model.apply(params, h, x_)
        return out.sum(), out.sum(axis=(-2, -1))

    (_, e_ref), g = jax.value_and_grad(energy, has_aux=True)(x)
    e, f = depthgrid_energy_forces(kp, h, x, batch_tile=2, interpret=True)
    np.testing.assert_allclose(e, e_ref, **TOL)
    np.testing.assert_allclose(f, -g, **TOL)


def test_depthgrid_kernel_update_schedule(setup):
    """Depth-on-grid kernel with a mixed per-layer update schedule."""
    from sake_tpu.kernels.depthgrid_ef import depthgrid_energy_forces

    _, _, _, h, x = setup
    model = SAKEModel(
        hidden_features=16, out_features=1, depth=3, update=[False, True, False]
    )
    params = model.init(jax.random.PRNGKey(2), h, x)
    kp = model_params_from_linen(params)

    def energy(x_):
        out, _, _ = model.apply(params, h, x_)
        return out.sum(), out.sum(axis=(-2, -1))

    (_, e_ref), g = jax.value_and_grad(energy, has_aux=True)(x)
    e, f = depthgrid_energy_forces(
        kp, h, x, batch_tile=2, update=[False, True, False], interpret=True
    )
    np.testing.assert_allclose(e, e_ref, **TOL)
    np.testing.assert_allclose(f, -g, **TOL)
