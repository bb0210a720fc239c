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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_kernel_path_second_order_training_grad(setup):
    """grad(loss(E, F), params) through the kernel-path custom VJP must
    equal plain double autodiff of the linen oracle (VERDICT r1 item 5:
    force-loss training on the kernel path)."""
    from sake_tpu.kernels.train_ef import make_trainable_energy_forces

    model, params, kp, h, x = setup
    rng = np.random.RandomState(5)
    f_target = jnp.asarray(rng.randn(*x.shape), jnp.float32)
    e_target = jnp.asarray(rng.randn(x.shape[0]), jnp.float32)

    ef = make_trainable_energy_forces(batch_tile=2, interpret=True)

    def kernel_loss(kp_):
        e, f = ef(kp_, h, x)
        return ((f - f_target) ** 2).mean() + 1e-3 * jnp.abs(e - e_target).mean()

    def oracle_loss(params_):
        def energy(x_):
            out, _, _ = model.apply(params_, h, x_)
            return out.sum(axis=(-2, -1)).sum(), out.sum(axis=(-2, -1))

        (_, e), neg_f = jax.value_and_grad(energy, has_aux=True)(x)
        f = -neg_f
        return ((f - f_target) ** 2).mean() + 1e-3 * jnp.abs(e - e_target).mean()

    from sake_tpu.kernels import model_params_from_linen

    g_kernel = jax.grad(kernel_loss)(kp)
    g_oracle_linen = jax.grad(oracle_loss)(params)
    g_oracle = model_params_from_linen(g_oracle_linen)

    flat_k, _ = jax.flatten_util.ravel_pytree(
        [g_kernel.w_embed, g_kernel.b_embed, g_kernel.w_out0, g_kernel.w_out1]
    )
    flat_o, _ = jax.flatten_util.ravel_pytree(
        [g_oracle.w_embed, g_oracle.b_embed, g_oracle.w_out0, g_oracle.w_out1]
    )
    np.testing.assert_allclose(flat_k, flat_o, rtol=1e-3, atol=1e-5)
    # layer-parameter gradients too (the deep second-order path)
    for i, (gl_k, gl_o) in enumerate(zip(g_kernel.layers, g_oracle.layers)):
        fk, _ = jax.flatten_util.ravel_pytree(gl_k)
        fo, _ = jax.flatten_util.ravel_pytree(gl_o)
        np.testing.assert_allclose(
            fk, fo, rtol=2e-3, atol=2e-5, err_msg=f"layer {i}"
        )


@pytest.mark.slow
def test_fori_kernel_interpret(setup):
    """The split fori-over-depth kernel pair (resident params) must
    reproduce E and F in interpreter mode."""
    from sake_tpu.kernels.fori_ef import fori_energy_forces

    model, params, kp, h, x = setup

    def energy(x_):
        out, _, _ = model.apply(params, h, x_)
        return out.sum(), out.sum(axis=(-2, -1))

    (_, e_ref), g = jax.value_and_grad(energy, has_aux=True)(x)
    e, f = fori_energy_forces(kp, h, x, batch_tile=2, interpret=True)
    np.testing.assert_allclose(e, e_ref, **TOL)
    np.testing.assert_allclose(f, -g, **TOL)


@pytest.mark.slow
def test_fori_kernel_update_schedule(setup):
    from sake_tpu.kernels.fori_ef import fori_energy_forces

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
    e, f = fori_energy_forces(
        kp, h, x, batch_tile=2, update=[False, True, False], interpret=True
    )
    np.testing.assert_allclose(e, e_ref, **TOL)
    np.testing.assert_allclose(f, -g, **TOL)


@pytest.mark.slow
def test_fori_kernel_padded_atoms(setup):
    """Atom padding to a sublane-aligned N (static attention mask on pad
    senders) must not change E or F."""
    from sake_tpu.kernels.fori_ef import fori_energy_forces

    model, params, kp, h, x = setup  # N=7 -> padded to 8

    def energy(x_):
        out, _, _ = model.apply(params, h, x_)
        return out.sum(), out.sum(axis=(-2, -1))

    (_, e_ref), g = jax.value_and_grad(energy, has_aux=True)(x)
    e, f = fori_energy_forces(
        kp, h, x, batch_tile=2, pad_atoms=True, interpret=True
    )
    np.testing.assert_allclose(e, e_ref, **TOL)
    np.testing.assert_allclose(f, -g, **TOL)


@pytest.mark.parametrize("n_real,upd", [(None, 1.0), (5, 1.0), (None, 0.0), (5, 0.3)])
def test_resid_backward_matches_vjp(setup, n_real, upd):
    """The hand-written layer backward (``resid_ef.layer_bwd_resid``) must
    match ``jax.vjp`` of the shared forward exactly (same fp32 graph, no
    recompute differences beyond reassociation)."""
    from sake_tpu.kernels.depthgrid_ef import (
        layer_forward_wide,
        wide_stack,
        _LEAF_NAMES,
    )
    from sake_tpu.kernels.resid_ef import layer_fwd_resid, layer_bwd_resid
    from sake_tpu.kernels.split_ef import head_expansion_matrices

    _, _, kp, h_raw, x = setup
    rng = np.random.RandomState(3)
    B, N, _ = h_raw.shape
    leaves = wide_stack(kp, n_heads=4)
    p = {name: leaf[0] for name, leaf in zip(_LEAF_NAMES, leaves)}
    e_rep, e_tile = head_expansion_matrices(16, 4)
    mm = lambda a, w: jnp.dot(a, w, preferred_element_type=jnp.float32)
    # the layer operates post-embedding (hidden width)
    h = (h_raw @ kp.w_embed + kp.b_embed).astype(jnp.float32)

    xp = [x[..., k : k + 1] for k in range(3)]
    vp = [jnp.asarray(rng.randn(B, N, 1), jnp.float32) for _ in range(3)]

    def f(h_, xp_, vp_):
        h2, xp2, vp2 = layer_forward_wide(
            p, h_, xp_, vp_, upd, e_rep=e_rep, e_tile=e_tile, mm=mm,
            n_real=n_real,
        )
        return h2, list(xp2), list(vp2)

    out, vjp = jax.vjp(f, h, list(xp), list(vp))
    h2_ref, xp2_ref, vp2_ref = out

    h2, xp2, vp2, resid = layer_fwd_resid(
        p, h, xp, vp, upd, e_rep=e_rep, e_tile=e_tile, mm=mm, n_real=n_real
    )
    np.testing.assert_allclose(h2, h2_ref, **TOL)
    for k in range(3):
        np.testing.assert_allclose(xp2[k], xp2_ref[k], **TOL)
        np.testing.assert_allclose(vp2[k], vp2_ref[k], **TOL)

    dh = jnp.asarray(rng.randn(*h2.shape), jnp.float32)
    dxp = [jnp.asarray(rng.randn(B, N, 1), jnp.float32) for _ in range(3)]
    dvp = [jnp.asarray(rng.randn(B, N, 1), jnp.float32) for _ in range(3)]
    want_dh, want_dxp, want_dvp = vjp((dh, dxp, dvp))

    got_dh, got_dxp, got_dvp = layer_bwd_resid(
        p, resid, h, xp, vp, upd, dh, dxp, dvp,
        e_rep=e_rep, e_tile=e_tile, mm=mm, n_real=n_real,
    )
    np.testing.assert_allclose(got_dh, want_dh, rtol=1e-3, atol=1e-4)
    for k in range(3):
        np.testing.assert_allclose(got_dxp[k], want_dxp[k], rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(got_dvp[k], want_dvp[k], rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_resid_kernel_interpret(setup):
    """The residual-streaming kernel pair (fwd + hand-written bwd) must
    reproduce E and F in interpreter mode."""
    from sake_tpu.kernels.resid_ef import resid_energy_forces

    model, params, kp, h, x = setup

    def energy(x_):
        out, _, _ = model.apply(params, h, x_)
        return out.sum(), out.sum(axis=(-2, -1))

    (_, e_ref), g = jax.value_and_grad(energy, has_aux=True)(x)
    e, f = resid_energy_forces(kp, h, x, batch_tile=2, interpret=True)
    np.testing.assert_allclose(e, e_ref, **TOL)
    np.testing.assert_allclose(f, -g, **TOL)


@pytest.mark.slow
def test_resid_kernel_padded_update_schedule(setup):
    """Residual kernel with atom padding AND a mixed update schedule."""
    from sake_tpu.kernels.resid_ef import resid_energy_forces

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
    e, f = resid_energy_forces(
        kp, h, x, batch_tile=2, update=[False, True, False],
        pad_atoms=True, interpret=True,
    )
    np.testing.assert_allclose(e, e_ref, **TOL)
    np.testing.assert_allclose(f, -g, **TOL)


@pytest.mark.slow
def test_resid_kernel_chunked(setup):
    """Chunked pipeline (lax.map over batch chunks) must match unchunked."""
    from sake_tpu.kernels.resid_ef import resid_energy_forces

    model, params, kp, h, x = setup
    e_ref, f_ref = resid_energy_forces(
        kp, h, x, batch_tile=2, chunk=None, interpret=True
    )
    e, f = resid_energy_forces(
        kp, h, x, batch_tile=2, chunk=2, interpret=True
    )
    np.testing.assert_allclose(e, e_ref, **TOL)
    np.testing.assert_allclose(f, f_ref, **TOL)


def _edge_mask(rng, B, N, min_n=3):
    sizes = rng.randint(min_n, N + 1, size=B)
    m = (np.arange(N)[None, :] < sizes[:, None]).astype(np.float32)
    return jnp.asarray(m[:, :, None] * m[:, None, :]), jnp.asarray(m)


def test_resid_masked_backward_matches_vjp(setup):
    """Masked hand-written backward vs jax.vjp of the masked forward."""
    from sake_tpu.kernels.depthgrid_ef import wide_stack, _LEAF_NAMES
    from sake_tpu.kernels.resid_ef import layer_fwd_resid, layer_bwd_resid
    from sake_tpu.kernels.split_ef import head_expansion_matrices

    _, _, kp, h_raw, x = setup
    rng = np.random.RandomState(7)
    B, N, _ = h_raw.shape
    leaves = wide_stack(kp, n_heads=4)
    p = {name: leaf[0] for name, leaf in zip(_LEAF_NAMES, leaves)}
    e_rep, e_tile = head_expansion_matrices(16, 4)
    mm = lambda a, w: jnp.dot(a, w, preferred_element_type=jnp.float32)
    h = (h_raw @ kp.w_embed + kp.b_embed).astype(jnp.float32)
    mask, _ = _edge_mask(rng, B, N)
    mask4 = mask[..., None]

    xp = [x[..., k : k + 1] for k in range(3)]
    vp = [jnp.asarray(rng.randn(B, N, 1), jnp.float32) for _ in range(3)]

    def f(h_, xp_, vp_):
        h2, xp2, vp2, _ = layer_fwd_resid(
            p, h_, xp_, vp_, 1.0, e_rep=e_rep, e_tile=e_tile, mm=mm,
            mask=mask4,
        )
        return h2, list(xp2), list(vp2)

    out, vjp = jax.vjp(f, h, list(xp), list(vp))
    _, _, _, resid = layer_fwd_resid(
        p, h, xp, vp, 1.0, e_rep=e_rep, e_tile=e_tile, mm=mm, mask=mask4
    )
    dh = jnp.asarray(rng.randn(*h.shape), jnp.float32)
    dxp = [jnp.asarray(rng.randn(B, N, 1), jnp.float32) for _ in range(3)]
    dvp = [jnp.asarray(rng.randn(B, N, 1), jnp.float32) for _ in range(3)]
    want_dh, want_dxp, want_dvp = vjp((dh, dxp, dvp))
    got_dh, got_dxp, got_dvp = layer_bwd_resid(
        p, resid, h, xp, vp, 1.0, dh, dxp, dvp,
        e_rep=e_rep, e_tile=e_tile, mm=mm, mask=mask4,
    )
    np.testing.assert_allclose(got_dh, want_dh, rtol=1e-3, atol=1e-4)
    for k in range(3):
        np.testing.assert_allclose(got_dxp[k], want_dxp[k], rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(got_dvp[k], want_dvp[k], rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_resid_kernel_masked_interpret(setup):
    """Masked residual kernel pair vs the masked linen oracle, including a
    fully-padded graph (mask all zero)."""
    from sake_tpu.kernels.resid_ef import resid_energy_forces

    model, params, kp, h, x = setup
    rng = np.random.RandomState(11)
    B, N, _ = h.shape
    mask, node_m = _edge_mask(rng, B, N)
    # one fully-padded graph
    mask = mask.at[0].set(0.0)
    node_m = node_m.at[0].set(0.0)

    def energy(x_):
        out, _, _ = model.apply(params, h, x_, mask=mask)
        e = (out * node_m[..., None]).sum(axis=(-2, -1))
        return e.sum(), e

    (_, e_ref), g = jax.value_and_grad(energy, has_aux=True)(x)
    e, f = resid_energy_forces(
        kp, h, x, mask=mask, batch_tile=2, pad_atoms=True, interpret=True
    )
    assert np.isfinite(np.asarray(e)).all()
    assert np.isfinite(np.asarray(f)).all()
    np.testing.assert_allclose(e, e_ref, **TOL)
    np.testing.assert_allclose(f, -g, **TOL)


@pytest.mark.parametrize("masked", [False, True])
def test_resid_backward_param_grads(setup, masked):
    """want_param_grads=True must reproduce jax.vjp's PARAMETER cotangents
    (every _LEAF_NAMES leaf) for the layer, masked and unmasked."""
    from sake_tpu.kernels.depthgrid_ef import wide_stack, _LEAF_NAMES
    from sake_tpu.kernels.resid_ef import layer_fwd_resid, layer_bwd_resid
    from sake_tpu.kernels.split_ef import head_expansion_matrices

    _, _, kp, h_raw, x = setup
    rng = np.random.RandomState(13)
    B, N, _ = h_raw.shape
    leaves = wide_stack(kp, n_heads=4)
    p = {name: leaf[0] for name, leaf in zip(_LEAF_NAMES, leaves)}
    e_rep, e_tile = head_expansion_matrices(16, 4)
    mm = lambda a, w: jnp.dot(a, w, preferred_element_type=jnp.float32)
    h = (h_raw @ kp.w_embed + kp.b_embed).astype(jnp.float32)
    mask4 = None
    if masked:
        mask, _ = _edge_mask(rng, B, N)
        mask4 = mask[..., None]
    xp = [x[..., k : k + 1] for k in range(3)]
    vp = [jnp.asarray(rng.randn(B, N, 1), jnp.float32) for _ in range(3)]

    def f(p_, h_, xp_, vp_):
        h2, xp2, vp2, _ = layer_fwd_resid(
            p_, h_, xp_, vp_, 1.0, e_rep=e_rep, e_tile=e_tile, mm=mm,
            mask=mask4,
        )
        return h2, list(xp2), list(vp2)

    out, vjp = jax.vjp(f, p, h, list(xp), list(vp))
    _, _, _, resid = layer_fwd_resid(
        p, h, xp, vp, 1.0, e_rep=e_rep, e_tile=e_tile, mm=mm, mask=mask4
    )
    dh = jnp.asarray(rng.randn(*h.shape), jnp.float32)
    dxp = [jnp.asarray(rng.randn(B, N, 1), jnp.float32) for _ in range(3)]
    dvp = [jnp.asarray(rng.randn(B, N, 1), jnp.float32) for _ in range(3)]
    want_p, want_dh, _, _ = vjp((dh, dxp, dvp))
    got_dh, _, _, dW = layer_bwd_resid(
        p, resid, h, xp, vp, 1.0, dh, dxp, dvp,
        e_rep=e_rep, e_tile=e_tile, mm=mm, mask=mask4,
        want_param_grads=True,
    )
    np.testing.assert_allclose(got_dh, want_dh, rtol=1e-3, atol=1e-4)
    assert set(dW) == set(want_p)
    for name in sorted(dW):
        np.testing.assert_allclose(
            dW[name], want_p[name], rtol=2e-3, atol=2e-4,
            err_msg=f"param grad mismatch: {name}",
        )


def _kernel_readout(kp, h_fin):
    """XLA-side energy readout matching the linen embedding_out head."""
    B, N, F = h_fin.shape
    z = jax.nn.silu(h_fin.reshape(B * N, F) @ kp.w_out0 + kp.b_out0)
    out = (z @ kp.w_out1 + kp.b_out1).reshape(B, N, -1)
    return out


@pytest.mark.parametrize("masked", [False, True])
@pytest.mark.slow
def test_hidden_fn_training_grads(setup, masked):
    """make_hidden_fn: jax.grad of an energy loss through the custom-VJP
    kernel path must match the linen autodiff oracle for EVERY parameter
    (converted through the adapter, which is linear on leaves)."""
    from sake_tpu.kernels.resid_ef import make_hidden_fn

    model, params, kp, h, x = setup
    rng = np.random.RandomState(17)
    B, N, _ = h.shape
    mask = node_m = None
    if masked:
        mask, node_m = _edge_mask(rng, B, N)
    w = jnp.asarray(rng.randn(B), jnp.float32)

    hidden = make_hidden_fn(batch_tile=2, pad_atoms=True, interpret=True)

    def loss_kernel(kp_):
        h_fin = hidden(kp_, h, x, mask)
        out = _kernel_readout(kp_, h_fin)
        if node_m is not None:
            out = out * node_m[..., None]
        e = out.sum(axis=(-2, -1))
        return (e * w).sum()

    def loss_linen(p_):
        out, _, _ = model.apply(p_, h, x, mask=mask)
        if node_m is not None:
            out = out * node_m[..., None]
        e = out.sum(axis=(-2, -1))
        return (e * w).sum()

    l_k = loss_kernel(kp)
    l_l = loss_linen(params)
    np.testing.assert_allclose(l_k, l_l, rtol=1e-4)

    g_kernel = jax.grad(loss_kernel)(kp)
    g_linen_tree = jax.grad(loss_linen)(params)
    g_oracle = model_params_from_linen(g_linen_tree)

    flat_k, _ = jax.tree.flatten(g_kernel)
    flat_o, _ = jax.tree.flatten(g_oracle)
    paths = jax.tree_util.tree_flatten_with_path(g_kernel)[0]
    assert len(flat_k) == len(flat_o)
    for (path, gk), go in zip(paths, flat_o):
        np.testing.assert_allclose(
            gk, go, rtol=2e-3, atol=2e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


@pytest.mark.slow
@pytest.mark.parametrize("masked", [False, True])
def test_hidden_fn_inference_primal(setup, masked):
    """make_hidden_fn called OUTSIDE autodiff takes the no-streaming
    ``_fwd_infer`` kernel (the tasks' jitted eval path; avoids dead
    residual HBM traffic). It must match the linen forward exactly like
    the streaming custom-VJP forward does."""
    from sake_tpu.kernels.resid_ef import make_hidden_fn

    model, params, kp, h, x = setup
    rng = np.random.RandomState(29)
    B, N, _ = h.shape
    mask = None
    if masked:
        mask, _ = _edge_mask(rng, B, N)

    hidden = make_hidden_fn(batch_tile=2, pad_atoms=True, interpret=True)
    h_fin = hidden(kp, h, x, mask)  # no grad: the inference primal
    out_k = _kernel_readout(kp, h_fin)
    out_l, _, _ = model.apply(params, h, x, mask=mask)
    np.testing.assert_allclose(out_k, out_l, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_hidden_fn_want_x_forecast_grads():
    """make_hidden_fn(want_x=True): the position-forecasting training
    shape (motion/nbody/md17_forecast regress the UPDATED coordinates,
    so gradient seeds enter through the x channel and the initial
    velocity is a real input). Params, x, and v gradients of a combined
    x-regression + energy loss must match the linen autodiff oracle."""
    from sake_tpu.kernels.resid_ef import make_hidden_fn

    rng = np.random.RandomState(3)
    B, N, F = 4, 7, 5
    h = jnp.asarray(rng.randn(B, N, F), jnp.float32)
    x = jnp.asarray(rng.randn(B, N, 3), jnp.float32)
    v = jnp.asarray(rng.randn(B, N, 3) * 0.5, jnp.float32)
    x1 = jnp.asarray(rng.randn(B, N, 3), jnp.float32)
    w = jnp.asarray(rng.randn(B), jnp.float32)
    model = SAKEModel(hidden_features=16, out_features=1, depth=3)
    # init WITH v: the linen layer only creates layer_0's velocity MLP
    # when a velocity is supplied (reference semantics)
    params = model.init(jax.random.PRNGKey(0), h, x, v)
    kp = model_params_from_linen(params)

    hx = make_hidden_fn(
        n_heads=4, update=True, batch_tile=2, pad_atoms=True,
        want_x=True, interpret=True,
    )

    def loss_k(p, v_):
        h_fin, x_hat = hx(p, h, x, v_, None)
        e = _kernel_readout(p, h_fin).sum(axis=(-2, -1))
        return ((x_hat - x1) ** 2).mean() + 0.1 * (e * w).sum()

    def loss_l(p_, v_):
        out, x_hat, _ = model.apply(p_, h, x, v_)
        e = out.sum(axis=(-2, -1))
        return ((x_hat - x1) ** 2).mean() + 0.1 * (e * w).sum()

    np.testing.assert_allclose(
        float(loss_k(kp, v)), float(loss_l(params, v)), rtol=1e-4
    )
    g_k = jax.grad(loss_k)(kp, v)
    g_o = model_params_from_linen(jax.grad(loss_l)(params, v))
    for a, b in zip(jax.tree.leaves(g_o), jax.tree.leaves(g_k)):
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        jax.grad(loss_k, argnums=1)(kp, v),
        jax.grad(loss_l, argnums=1)(params, v),
        rtol=2e-3, atol=1e-5,
    )


@pytest.mark.slow
def test_forecast_task_kernel_backbone():
    """The motion task's kernel backbone (use_kernels=True) must produce
    the same training trajectory as its lax path (interpret mode, f32)."""
    from sake_tpu.tasks.forecast import ForecastConfig, run

    kw = dict(workload="motion", n_epochs=2, epochs_per_block=2,
              n_samples=40, batch_size=8, hidden_features=16, depth=2)
    _, res_k = run(ForecastConfig(
        use_kernels=True, kernel_batch_tile=4, kernel_interpret=True, **kw
    ))
    _, res_l = run(ForecastConfig(**kw))
    np.testing.assert_allclose(
        res_k["test_mse"], res_l["test_mse"], rtol=1e-4
    )


@pytest.mark.slow
def test_resid_kernel_other_widths():
    """Kernel path generality: hidden/head sizes other than the flagship
    (64, 4) — shapes are read off the parameter pytree, nothing baked in."""
    from sake_tpu.kernels.resid_ef import resid_energy_forces

    rng = np.random.RandomState(23)
    B, N, F = 4, 6, 5
    h = jnp.asarray(rng.randn(B, N, F), jnp.float32)
    x = jnp.asarray(rng.randn(B, N, 3), jnp.float32)
    model = SAKEModel(
        hidden_features=32, out_features=1, depth=2, n_heads=2
    )
    params = model.init(jax.random.PRNGKey(0), h, x)
    kp = model_params_from_linen(params)

    def energy(x_):
        out, _, _ = model.apply(params, h, x_)
        return out.sum(), out.sum(axis=(-2, -1))

    (_, e_ref), g = jax.value_and_grad(energy, has_aux=True)(x)
    e, f = resid_energy_forces(
        kp, h, x, n_heads=2, batch_tile=2, pad_atoms=True, interpret=True
    )
    np.testing.assert_allclose(e, e_ref, **TOL)
    np.testing.assert_allclose(f, -g, **TOL)


@pytest.mark.parametrize("use_mask", [False, True])
def test_mxu_pooled_layer_matches_vpu(setup, use_mask):
    """The MXU-pooled spatial attention (eye-expanded batched matmuls,
    ``spats``) must match the VPU multiply+reduce path in both the
    forward residuals and the hand-written backward."""
    from sake_tpu.kernels.depthgrid_ef import wide_stack, _LEAF_NAMES
    from sake_tpu.kernels.resid_ef import (
        layer_fwd_resid, layer_bwd_resid, pool_patterns, _make_bmm_prec)
    from sake_tpu.kernels.split_ef import head_expansion_matrices

    _, _, kp, h_raw, x = setup
    rng = np.random.RandomState(3)
    B, N, _ = h_raw.shape
    leaves = wide_stack(kp, n_heads=4)
    p = {nm: lf[0] for nm, lf in zip(_LEAF_NAMES, leaves)}
    e_rep, e_tile = head_expansion_matrices(16, 4)
    mm = lambda a, w: jnp.dot(a, w, preferred_element_type=jnp.float32)
    mm_pool = _make_bmm_prec(None, None)
    patT = pool_patterns(N)
    h = (h_raw.reshape(B * N, -1) @ kp.w_embed + kp.b_embed).reshape(B, N, 16)
    xp = [x[..., k : k + 1] for k in range(3)]
    vp = [jnp.asarray(rng.randn(B, N, 1), jnp.float32) for _ in range(3)]
    m4 = None
    if use_mask:
        nm_ = (jnp.asarray(rng.rand(B, N)) > 0.25).astype(jnp.float32)
        m4 = (nm_[:, :, None] * nm_[:, None, :])[..., None]

    kw = dict(e_rep=e_rep, e_tile=e_tile, mm=mm, mask=m4)
    kw_m = dict(kw, spat=patT, mm_pool=mm_pool)
    r_v = layer_fwd_resid(p, h, xp, vp, 1.0, **kw)
    r_m = layer_fwd_resid(p, h, xp, vp, 1.0, **kw_m)
    np.testing.assert_allclose(r_v[0], r_m[0], rtol=2e-5, atol=2e-5)
    for k in range(3):
        np.testing.assert_allclose(r_v[1][k], r_m[1][k], rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(r_v[2][k], r_m[2][k], rtol=2e-5, atol=2e-5)
    for nm in r_v[3]:
        np.testing.assert_allclose(
            r_v[3][nm], r_m[3][nm], rtol=2e-5, atol=2e-5, err_msg=nm
        )
    dh = jnp.asarray(rng.randn(B, N, 16), jnp.float32)
    dxp = [jnp.asarray(rng.randn(B, N, 1), jnp.float32) for _ in range(3)]
    dvp = [jnp.asarray(rng.randn(B, N, 1), jnp.float32) for _ in range(3)]
    bv = layer_bwd_resid(p, r_v[3], h, xp, vp, 1.0, dh, dxp, dvp, **kw)
    bm = layer_bwd_resid(p, r_m[3], h, xp, vp, 1.0, dh, dxp, dvp, **kw_m)
    np.testing.assert_allclose(bv[0], bm[0], rtol=1e-4, atol=1e-4)
    for k in range(3):
        np.testing.assert_allclose(bv[1][k], bm[1][k], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(bv[2][k], bm[2][k], rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_resid_kernel_mxu_interpret(setup):
    """The full residual kernel pair with ``spatial_mode='mxu'`` must
    reproduce E and F (interpret mode)."""
    from sake_tpu.kernels.resid_ef import resid_energy_forces

    model, params, kp, h, x = setup

    def energy(x_):
        out, _, _ = model.apply(params, h, x_)
        return out.sum(), out.sum(axis=(-2, -1))

    (_, e_ref), g = jax.value_and_grad(energy, has_aux=True)(x)
    e, f = resid_energy_forces(
        kp, h, x, batch_tile=2, spatial_mode="mxu", interpret=True
    )
    np.testing.assert_allclose(e, e_ref, **TOL)
    np.testing.assert_allclose(f, -g, **TOL)


@pytest.mark.parametrize(
    "mode", ["unmasked", "n_real", "masked"]
)
def test_layer_jvp_resid_matches_jvp(setup, mode):
    """The hand-derived tangent-only layer forward (consuming saved
    primal residuals) must equal ``jax.jvp`` of ``layer_fwd_resid`` —
    outputs AND the tangent-residual dict. Pure XLA (no Pallas): this is
    the math contract the shared-mode second-order kernels build on."""
    from sake_tpu.kernels.depthgrid_ef import (
        _LEAF_NAMES,
        _make_mm_prec,
        wide_stack,
    )
    from sake_tpu.kernels.resid_ef import layer_fwd_resid, layer_jvp_resid
    from sake_tpu.kernels.split_ef import head_expansion_matrices

    model, params, kp, h0b, x0b = setup
    rng = np.random.RandomState(11)
    BT, N = 2, 8
    leaves = wide_stack(kp, 4)
    p = {nm: a[0] for nm, a in zip(_LEAF_NAMES, leaves)}
    F = kp.w_embed.shape[-1]
    e_rep, e_tile = head_expansion_matrices(
        kp.layers[0].edge.w_out0.shape[-1], 4
    )
    mm = _make_mm_prec(None, None)
    h = jnp.asarray(rng.randn(BT, N, F), jnp.float32)
    xp = [jnp.asarray(rng.randn(BT, N, 1), jnp.float32) for _ in range(3)]
    vp = [jnp.asarray(rng.randn(BT, N, 1), jnp.float32) for _ in range(3)]
    th = jnp.asarray(rng.randn(BT, N, F), jnp.float32)
    txp = [jnp.asarray(rng.randn(BT, N, 1), jnp.float32) for _ in range(3)]
    tvp = [jnp.asarray(rng.randn(BT, N, 1), jnp.float32) for _ in range(3)]
    kw = {}
    if mode == "n_real":
        kw = dict(n_real=6)
    elif mode == "masked":
        nm_ = (rng.rand(BT, N) > 0.25).astype(np.float32)
        kw = dict(
            mask=jnp.asarray(nm_[:, :, None] * nm_[:, None, :])[..., None]
        )

    def f(h_, xp_, vp_):
        hh, xx, vv, resid = layer_fwd_resid(
            p, h_, xp_, vp_, 1.0, e_rep=e_rep, e_tile=e_tile, mm=mm, **kw
        )
        return (hh, list(xx), list(vv), resid)

    out, tout = jax.jvp(f, (h, xp, vp), (th, txp, tvp))
    got = layer_jvp_resid(
        p, out[3], h, xp, vp, th, txp, tvp, 1.0,
        e_rep=e_rep, e_tile=e_tile, mm=mm, **kw
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(tout), jax.tree_util.tree_leaves(got)
    ):
        scale = float(jnp.abs(a).max()) + 1e-8
        np.testing.assert_allclose(b / scale, a / scale, rtol=2e-5,
                                   atol=2e-5)


@pytest.mark.slow
@pytest.mark.parametrize(
    "aug_mode",
    ["retrace", "resid", "shared", "shared-chunked", "fused",
     "fused-chunked"],
)
def test_train2_second_order_grads(setup, aug_mode):
    """Second-order (force-loss) training on the JVP-augmented kernel
    pair: gradients of a force+energy loss w.r.t. every parameter, h and
    x must match plain lax double autodiff (reference objective:
    ``scripts/md17/run.py:54-70``). Both aug-backward formulations (the
    vjp-retrace original and the residual-streaming 3-backward scheme,
    incl. its chunked pipeline) must agree."""
    from sake_tpu.kernels.train2_ef import make_ef_train2

    model, params, kp, h, x = setup
    rng = np.random.RandomState(7)
    B, N, _ = h.shape
    e_t = jnp.asarray(rng.randn(B), jnp.float32)
    f_t = jnp.asarray(rng.randn(B, N, 3), jnp.float32)

    def ef_lax(p, h_, x_):
        def e_fn(xx):
            out, _, _ = model_forward(p, h_, xx, n_heads=4, update=True)
            return out.sum(axis=(-2, -1)).sum(), out.sum(axis=(-2, -1))
        g, e = jax.grad(e_fn, has_aux=True)(x_)
        return e, -g

    # "shared-chunked": shared mode with the backward lax.map'd over
    # 2-sample chunks of the chunk-blocked saved streams (B=4 -> nc=2)
    ef_k = make_ef_train2(
        n_heads=4, update=True, batch_tile=2, aug_batch_tile=2,
        pad_atoms=True, chunk=None,
        aug_mode=aug_mode.split("-")[0], aug_chunk=2,
        shared_chunk=2 if aug_mode.endswith("-chunked") else None,
        interpret=True,
    )

    def loss_with(ef):
        def loss(p, h_, x_):
            e, f = ef(p, h_, x_)
            return ((e - e_t) ** 2).sum() + 0.5 * ((f - f_t) ** 2).sum()
        return loss

    l_ref, g_ref = jax.value_and_grad(loss_with(ef_lax), argnums=(0, 1, 2))(
        kp, h, x
    )
    l_k, g_k = jax.value_and_grad(loss_with(ef_k), argnums=(0, 1, 2))(
        kp, h, x
    )
    np.testing.assert_allclose(l_k, l_ref, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_k)):
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=1e-5)


@pytest.mark.slow
def test_one_kernel_interpret(setup):
    """Gen-5 single-kernel fused E+F (VMEM-resident residuals, in-kernel
    readout) must reproduce the lax E and F in interpreter mode — plain,
    atom-padded, and with a mixed update schedule."""
    from sake_tpu.kernels.one_ef import one_energy_forces

    model, params, kp, h, x = setup

    def energy(x_):
        out, _, _ = model.apply(params, h, x_)
        return out.sum(), out.sum(axis=(-2, -1))

    (_, e_ref), g = jax.value_and_grad(energy, has_aux=True)(x)
    for kw in (dict(), dict(pad_atoms=True)):
        e, f = one_energy_forces(kp, h, x, batch_tile=2, interpret=True, **kw)
        np.testing.assert_allclose(e, e_ref, **TOL)
        np.testing.assert_allclose(f, -g, **TOL)

    sched = [False, True, False]
    model3 = SAKEModel(
        hidden_features=16, out_features=1, depth=3, update=sched
    )
    params3 = model3.init(jax.random.PRNGKey(2), h, x)
    kp3 = model_params_from_linen(params3)

    def energy3(x_):
        out, _, _ = model3.apply(params3, h, x_)
        return out.sum(), out.sum(axis=(-2, -1))

    (_, e_ref3), g3 = jax.value_and_grad(energy3, has_aux=True)(x)
    e3, f3 = one_energy_forces(
        kp3, h, x, batch_tile=2, update=sched, pad_atoms=True, interpret=True
    )
    np.testing.assert_allclose(e3, e_ref3, **TOL)
    np.testing.assert_allclose(f3, -g3, **TOL)


@pytest.mark.slow
def test_one_kernel_masked_interpret(setup):
    """Gen-5 fused kernel with an edge mask must match the gen-4 masked
    path (same layer math, in-kernel masked readout)."""
    from sake_tpu.kernels.one_ef import one_energy_forces
    from sake_tpu.kernels.resid_ef import resid_energy_forces

    model, params, kp, h, x = setup
    rng = np.random.RandomState(11)
    B, N, _ = h.shape
    mask, _ = _edge_mask(rng, B, N)
    e_ref, f_ref = resid_energy_forces(
        kp, h, x, mask, batch_tile=2, chunk=None, interpret=True
    )
    e, f = one_energy_forces(kp, h, x, mask, batch_tile=2, interpret=True)
    np.testing.assert_allclose(e, e_ref, **TOL)
    np.testing.assert_allclose(f, f_ref, **TOL)


def test_dispatch_energy_forces(setup, monkeypatch):
    """Batch-aware dispatch (VERDICT r3 item 8): one public entry point
    must pick the measured champion per batch — one_ef at >=2048,
    resid_ef below — with tiles that divide the batch."""
    from sake_tpu.kernels import dispatch
    from sake_tpu.kernels import dispatch_energy_forces  # package export

    model, params, kp, h, x = setup

    calls = []
    monkeypatch.setattr(
        dispatch, "one_energy_forces",
        lambda *a, **kw: calls.append(("one", kw)) or ("e", "f"),
    )
    monkeypatch.setattr(
        dispatch, "resid_energy_forces",
        lambda *a, **kw: calls.append(("resid", kw)) or ("e", "f"),
    )

    def fake(b):
        hh = jnp.zeros((b, 7, 5), jnp.float32)
        return hh, jnp.zeros((b, 7, 3), jnp.float32)

    dispatch.dispatch_energy_forces(kp, *fake(2048))
    dispatch.dispatch_energy_forces(kp, *fake(512))
    dispatch.dispatch_energy_forces(kp, *fake(12))  # 12 % 8 != 0
    (k0, kw0), (k1, kw1), (k2, kw2) = calls
    assert k0 == "one" and kw0["batch_tile"] == 4
    assert k1 == "resid" and kw1["batch_tile"] == 8
    assert k2 == "resid" and kw2["batch_tile"] == 4
    # production tier is baked in
    assert kw0["edge_matmul_dtype"] == jnp.bfloat16
    assert kw0["resid_dtype"] == jnp.bfloat16
    # overrides reach the kernel
    dispatch.dispatch_energy_forces(kp, *fake(2048), batch_tile=2)
    assert calls[-1][1]["batch_tile"] == 2

    # real interpret-mode run through the dispatcher (small batch ->
    # resid path), full-precision overrides -> exact vs the lax oracle
    monkeypatch.undo()

    def energy(x_):
        out, _, _ = model.apply(params, h, x_)
        return out.sum(), out.sum(axis=(-2, -1))

    (_, e_ref), g = jax.value_and_grad(energy, has_aux=True)(x)
    e, f = dispatch_energy_forces(
        kp, h, x, interpret=True, batch_tile=2,
        edge_matmul_dtype=None, resid_dtype=jnp.float32, resid_lowp=None,
    )
    np.testing.assert_allclose(e, e_ref, **TOL)
    np.testing.assert_allclose(f, -g, **TOL)
