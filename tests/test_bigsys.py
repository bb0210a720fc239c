"""Blocked / atom-sharded large-system execution must match the dense path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sake_tpu.bigsys import atom_sharded_forward, blocked_model_forward
from sake_tpu.kernels import model_forward, model_params_from_linen
from sake_tpu.models import SAKEModel
from sake_tpu.parallel import make_mesh

TOL = dict(rtol=5e-4, atol=5e-5)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    B, N, F = 2, 64, 5
    h = jnp.asarray(rng.randn(B, N, F), jnp.float32)
    x = jnp.asarray(rng.randn(B, N, 3) * 2.0, jnp.float32)
    model = SAKEModel(hidden_features=16, out_features=1, depth=2)
    params = model.init(jax.random.PRNGKey(0), h[0], x[0])
    kp = model_params_from_linen(params)
    return kp, h, x


def test_blocked_matches_dense(setup):
    kp, h, x = setup
    out_d, x_d, v_d = model_forward(kp, h, x)
    out_b, x_b, v_b = blocked_model_forward(kp, h, x, block_size=16)
    np.testing.assert_allclose(out_b, out_d, **TOL)
    np.testing.assert_allclose(x_b, x_d, **TOL)
    np.testing.assert_allclose(v_b, v_d, **TOL)


def test_blocked_masked(setup):
    kp, h, x = setup
    rng = np.random.RandomState(1)
    node_mask = jnp.asarray(rng.rand(*h.shape[:2]) > 0.2, jnp.float32)
    mask = node_mask[:, :, None] * node_mask[:, None, :]
    out_d, x_d, _ = model_forward(kp, h, x, mask=mask)
    out_b, x_b, _ = blocked_model_forward(kp, h, x, block_size=16, mask=mask)
    m = node_mask[..., None]
    np.testing.assert_allclose(out_b * m, out_d * m, **TOL)
    np.testing.assert_allclose(x_b * m, x_d * m, **TOL)


def test_blocked_forces_match(setup):
    """Gradients (forces) through the blocked path equal the dense path."""
    kp, h, x = setup

    def e_dense(x_):
        out, _, _ = model_forward(kp, h, x_)
        return out.sum()

    def e_blocked(x_):
        out, _, _ = blocked_model_forward(kp, h, x_, block_size=16)
        return out.sum()

    g_d = jax.grad(e_dense)(x)
    g_b = jax.grad(e_blocked)(x)
    np.testing.assert_allclose(g_b, g_d, rtol=2e-3, atol=2e-4)


def test_blocked_forces_remat(setup):
    """remat=True (O(N*block) autodiff memory) changes nothing numerically."""
    kp, h, x = setup

    def e_blocked(x_, remat):
        out, _, _ = blocked_model_forward(
            kp, h, x_, block_size=16, remat=remat
        )
        return out.sum()

    g_plain = jax.grad(lambda x_: e_blocked(x_, False))(x)
    g_remat = jax.jit(jax.grad(lambda x_: e_blocked(x_, True)))(x)
    np.testing.assert_allclose(g_remat, g_plain, rtol=1e-5, atol=1e-6)


def test_atom_sharded_matches_dense(setup):
    kp, h, x = setup
    mesh = make_mesh()
    out_d, x_d, _ = model_forward(kp, h, x)
    out_s, x_s = jax.jit(
        lambda h_, x_: atom_sharded_forward(kp, h_, x_, mesh, block_size=8)
    )(h, x)
    np.testing.assert_allclose(out_s, out_d, **TOL)
    np.testing.assert_allclose(x_s, x_d, **TOL)


def test_atom_sharded_forces(setup):
    kp, h, x = setup
    mesh = make_mesh()

    def e_sharded(x_):
        out, _ = atom_sharded_forward(kp, h, x_, mesh, block_size=8)
        return out.sum()

    def e_dense(x_):
        out, _, _ = model_forward(kp, h, x_)
        return out.sum()

    g_s = jax.jit(jax.grad(e_sharded))(x)
    g_d = jax.grad(e_dense)(x)
    np.testing.assert_allclose(g_s, g_d, rtol=2e-3, atol=2e-4)


def test_dp_atom_sharded_step_matches_oracle(setup):
    """2D (data x atoms) sharded training step: loss and parameter grads
    equal the unsharded computation (collective accounting is subtle —
    see the pmean note in bigsys.dp_atom_sharded_loss_step)."""
    from sake_tpu.bigsys import dp_atom_sharded_loss_step

    kp, h, x = setup
    h, x = h[:2], x[:2]
    # batch 2 over data=2, atoms 64 over sp=4
    mesh = make_mesh((("data", 2), ("sp", 4)))
    rng = np.random.RandomState(3)
    y = jnp.asarray(rng.randn(2, 1), jnp.float32)
    step = jax.jit(dp_atom_sharded_loss_step(kp, mesh, block_size=16))
    loss, grads = step(kp, {"h": h, "x": x, "y": y})

    def ref_loss(kp_):
        out, _, _ = model_forward(kp_, h, x)
        e = out.sum(axis=(-2, -1))[:, None]
        return ((e - y) ** 2).mean()

    loss_ref, grads_ref = jax.value_and_grad(ref_loss)(kp)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5),
        grads,
        grads_ref,
    )


def test_ring_atom_sharded_matches_dense(setup):
    """Ring-ppermute sender exchange must equal the dense model (the
    bandwidth-optimal large-N refinement of the all-gather path)."""
    from sake_tpu.bigsys import ring_atom_sharded_forward

    kp, h, x = setup
    mesh = make_mesh()
    out_d, x_d, _ = model_forward(kp, h, x)
    out_s, x_s = jax.jit(
        lambda h_, x_: ring_atom_sharded_forward(kp, h_, x_, mesh)
    )(h, x)
    np.testing.assert_allclose(out_s, out_d, **TOL)
    np.testing.assert_allclose(x_s, x_d, **TOL)


def test_ring_atom_sharded_forces(setup):
    """Forces through the ring (ppermute transposes to the reverse
    permutation under AD) must match the dense gradient."""
    from sake_tpu.bigsys import ring_atom_sharded_forward

    kp, h, x = setup
    mesh = make_mesh()

    def e_ring(x_):
        out, _ = ring_atom_sharded_forward(kp, h, x_, mesh)
        return out.sum()

    def e_dense(x_):
        out, _, _ = model_forward(kp, h, x_)
        return out.sum()

    g_r = jax.jit(jax.grad(e_ring))(x)
    g_d = jax.grad(e_dense)(x)
    np.testing.assert_allclose(g_r, g_d, rtol=2e-3, atol=2e-4)


def test_ring_atom_sharded_masked(setup):
    """Masked ring (sender masks travel the ring) must equal the masked
    dense model, including a fully-padded shard's worth of atoms and the
    0/0 fully-masked-receiver guard."""
    from sake_tpu.bigsys import ring_atom_sharded_forward

    kp, h, x = setup
    rng = np.random.RandomState(5)
    B, N, _ = h.shape
    node_mask = (rng.rand(B, N) > 0.3).astype(np.float32)
    node_mask[0, N // 2 :] = 0.0  # a long fully-padded tail
    node_mask = jnp.asarray(node_mask)
    mask = node_mask[:, :, None] * node_mask[:, None, :]

    out_d, x_d, _ = model_forward(kp, h, x, mask=mask)
    mesh = make_mesh()
    out_s, x_s = jax.jit(
        lambda h_, x_, m_: ring_atom_sharded_forward(
            kp, h_, x_, mesh, node_mask=m_
        )
    )(h, x, node_mask)
    live = np.asarray(node_mask, bool)
    np.testing.assert_allclose(
        np.asarray(out_s)[live], np.asarray(out_d)[live], **TOL
    )
    np.testing.assert_allclose(
        np.asarray(x_s)[live], np.asarray(x_d)[live], **TOL
    )


def test_ring_atom_sharded_masked_forces(setup):
    """Forces through the MASKED ring match the masked dense gradient on
    live atoms."""
    from sake_tpu.bigsys import ring_atom_sharded_forward

    kp, h, x = setup
    rng = np.random.RandomState(6)
    B, N, _ = h.shape
    node_mask = jnp.asarray(
        (rng.rand(B, N) > 0.25).astype(np.float32)
    )
    mask = node_mask[:, :, None] * node_mask[:, None, :]
    mesh = make_mesh()

    def e_ring(x_):
        out, _ = ring_atom_sharded_forward(
            kp, h, x_, mesh, node_mask=node_mask
        )
        return (out[..., 0] * node_mask).sum()

    def e_dense(x_):
        out, _, _ = model_forward(kp, h, x_, mask=mask)
        return (out[..., 0] * node_mask).sum()

    g_r = jax.jit(jax.grad(e_ring))(x)
    g_d = jax.grad(e_dense)(x)
    live = np.asarray(node_mask, bool)
    np.testing.assert_allclose(
        np.asarray(g_r)[live], np.asarray(g_d)[live], rtol=2e-3, atol=2e-4
    )


def test_sharded_selector_gather_and_masked(setup):
    """sharded_model_forward: 'auto' picks gather at small N; the masked
    gather path must equal the masked dense model on live atoms."""
    from sake_tpu.bigsys import sharded_model_forward, RING_CROSSOVER_ATOMS

    kp, h, x = setup
    B, N, _ = h.shape
    assert N <= RING_CROSSOVER_ATOMS  # auto -> gather here
    rng = np.random.RandomState(9)
    node_mask = jnp.asarray((rng.rand(B, N) > 0.3).astype(np.float32))
    mask = node_mask[:, :, None] * node_mask[:, None, :]
    mesh = make_mesh()

    out_d, x_d, _ = model_forward(kp, h, x, mask=mask)
    out_s, x_s = jax.jit(
        lambda h_, x_, m_: sharded_model_forward(
            kp, h_, x_, mesh, mode="auto", block_size=8, node_mask=m_
        )
    )(h, x, node_mask)
    live = np.asarray(node_mask, bool)
    np.testing.assert_allclose(
        np.asarray(out_s)[live], np.asarray(out_d)[live], **TOL
    )
    np.testing.assert_allclose(
        np.asarray(x_s)[live], np.asarray(x_d)[live], **TOL
    )
