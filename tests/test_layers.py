"""Shape tests for blocks, layers, and models
(models the reference's ``sake/tests/test_layers.py`` / ``test_model.py`` /
``test_jit.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sake_tpu import models
from sake_tpu.blocks import ContinuousFilterConv
from sake_tpu.layers import DenseSAKELayer, EGNNLayer, EGNNSmearedLayer
from sake_tpu.radial import ExpNormalSmearing


def _hx(n=5, f=7):
    rng = np.random.RandomState(0)
    return (
        jnp.asarray(rng.randn(n, f), jnp.float32),
        jnp.asarray(rng.randn(n, 3), jnp.float32),
    )


def test_exp_normal_smearing_shape():
    m = ExpNormalSmearing(num_rbf=50)
    x = jnp.ones((5, 5, 1))
    params = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(params, x).shape == (5, 5, 50)


def test_cfconv_shape():
    m = ContinuousFilterConv(out_features=16)
    h = jnp.ones((5, 5, 14))
    d = jnp.ones((5, 5, 1))
    params = m.init(jax.random.PRNGKey(0), h, d)
    assert m.apply(params, h, d).shape == (5, 5, 16)


@pytest.mark.parametrize("update", [True, False])
def test_dense_sake_layer_shapes(update):
    h, x = _hx(f=16)
    v = jnp.zeros_like(x)
    layer = DenseSAKELayer(hidden_features=16, out_features=16, update=update)
    params = layer.init(jax.random.PRNGKey(0), h, x, v)
    h_out, x_out, v_out = layer.apply(params, h, x, v)
    assert h_out.shape == (5, 16)
    assert x_out.shape == (5, 3)
    assert v_out.shape == (5, 3)


def test_dense_sake_layer_no_velocity():
    h, x = _hx(f=16)
    layer = DenseSAKELayer(hidden_features=16, out_features=16, update=True)
    params = layer.init(jax.random.PRNGKey(0), h, x)
    h_out, x_out, v_out = layer.apply(params, h, x)
    assert v_out.shape == x.shape  # v initialized to delta_v


@pytest.mark.parametrize("cls", [EGNNLayer, EGNNSmearedLayer])
def test_egnn_layer_shapes(cls):
    h, x = _hx(f=16)
    v = jnp.zeros_like(x)
    layer = cls(hidden_features=16, out_features=16, update=True)
    params = layer.init(jax.random.PRNGKey(0), h, x, v)
    h_out, x_out, v_out = layer.apply(params, h, x, v)
    assert h_out.shape == (5, 16)
    assert x_out.shape == (5, 3)


def test_sake_model_shapes():
    h, x = _hx()
    model = models.SAKEModel(hidden_features=16, out_features=4, depth=3)
    params = model.init(jax.random.PRNGKey(0), h, x)
    h_out, x_out, v_out = model.apply(params, h, x)
    assert h_out.shape == (5, 4)
    assert x_out.shape == (5, 3)


def test_sake_model_per_layer_update():
    h, x = _hx()
    model = models.SAKEModel(
        hidden_features=8, out_features=1, depth=4, update=[False, False, True, True]
    )
    params = model.init(jax.random.PRNGKey(0), h, x)
    h_out, x_out, _ = model.apply(params, h, x)
    assert h_out.shape == (5, 1)


def test_egnn_model_runs():
    """The reference EGNN model crashes on the he kwarg (models.py:109);
    ours must run."""
    h, x = _hx()
    for smear in (False, True):
        model = models.EGNN(hidden_features=8, out_features=2, depth=2, smear=smear)
        params = model.init(jax.random.PRNGKey(0), h, x)
        h_out, _, _ = model.apply(params, h, x)
        assert h_out.shape == (5, 2)


def test_layer_jits():
    h, x = _hx(f=16)
    v = jnp.zeros_like(x)
    layer = DenseSAKELayer(hidden_features=16, out_features=16)
    params = layer.init(jax.random.PRNGKey(0), h, x, v)
    out = jax.jit(layer.apply)(params, h, x, v)
    assert out[0].shape == (5, 16)


def test_model_with_extra_edge_features():
    h, x = _hx()
    he = jnp.ones((5, 5, 2))
    model = models.SAKEModel(hidden_features=8, out_features=2, depth=2)
    params = model.init(jax.random.PRNGKey(0), h, x, he=he)
    h_out, _, _ = model.apply(params, h, x, he=he)
    assert h_out.shape == (5, 2)


def test_layer_with_cosine_cutoff():
    """Wiring the cosine cutoff into combined attention (the envelope the
    reference defined but never connected, ``sake/utils.py:10-26`` /
    ``sake/layers.py:172-175``): the euclidean factor must actually shape
    the attention, and outputs stay finite and equivariance-shaped."""
    from functools import partial

    from sake_tpu.radial import cosine_cutoff

    h, x = _hx(f=16)
    cut = partial(cosine_cutoff, lower=0.0, upper=3.0)
    layer = DenseSAKELayer(out_features=16, hidden_features=16, cutoff=cut)
    params = layer.init(jax.random.PRNGKey(0), h, x)
    h1, x1, v1 = layer.apply(params, h, x)
    assert np.isfinite(np.asarray(h1)).all()

    base = DenseSAKELayer(out_features=16, hidden_features=16)
    # same weights: the param trees are structurally identical
    h0_, _, _ = base.apply(params, h, x)
    assert not np.allclose(np.asarray(h1), np.asarray(h0_)), (
        "cutoff envelope had no effect on the combined attention"
    )
