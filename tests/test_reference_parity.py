"""fp32 numerical parity against the reference implementation.

The reference library (read-only at /root/reference) is imported directly
and run on identical inputs with identical weights (converted through
``sake_tpu.compat``). This is the strongest correctness check: every
activation, constant, masking rule, and reduction must agree to fp32
tolerance.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/reference")
ref_sake = pytest.importorskip("sake")

from sake_tpu import models as our_models
from sake_tpu import flows as our_flows
from sake_tpu import geometry
from sake_tpu.compat import convert_reference_params
from sake_tpu.layers import DenseSAKELayer

TOL = dict(rtol=2e-4, atol=2e-5)


def _inputs(n=5, f=16, seed=0):
    rng = np.random.RandomState(seed)
    h = jnp.asarray(rng.randn(n, f), jnp.float32)
    x = jnp.asarray(rng.randn(n, 3), jnp.float32)
    v = jnp.asarray(rng.randn(n, 3), jnp.float32)
    return h, x, v


def test_layer_parity():
    h, x, v = _inputs()
    ref = ref_sake.layers.DenseSAKELayer(hidden_features=16, out_features=16)
    ref_params = ref.init(jax.random.PRNGKey(7), h, x, v)
    ours = DenseSAKELayer(hidden_features=16, out_features=16)
    our_params = convert_reference_params(ref_params)

    rh, rx, rv = ref.apply(ref_params, h, x, v)
    oh, ox, ov = ours.apply(our_params, h, x, v)
    np.testing.assert_allclose(oh, rh, **TOL)
    np.testing.assert_allclose(ox, rx, **TOL)
    np.testing.assert_allclose(ov, rv, **TOL)


def test_layer_parity_masked():
    h, x, v = _inputs(n=6)
    node_mask = jnp.array([1.0] * 5 + [0.0])
    mask = geometry.edge_mask_from_node_mask(node_mask)
    ref = ref_sake.layers.DenseSAKELayer(hidden_features=16, out_features=16)
    ref_params = ref.init(jax.random.PRNGKey(7), h, x, v, mask=mask)
    ours = DenseSAKELayer(hidden_features=16, out_features=16)
    our_params = convert_reference_params(ref_params)

    rh, rx, rv = ref.apply(ref_params, h, x, v, mask=mask)
    oh, ox, ov = ours.apply(our_params, h, x, v, mask=mask)
    # compare only real atoms: the reference's padded rows are NaN (its
    # masked-renormalization bug, fixed in sake_tpu)
    np.testing.assert_allclose(oh[:5], rh[:5], **TOL)
    np.testing.assert_allclose(ox[:5], rx[:5], **TOL)
    np.testing.assert_allclose(ov[:5], rv[:5], **TOL)


def test_layer_parity_no_update():
    h, x, v = _inputs()
    ref = ref_sake.layers.DenseSAKELayer(
        hidden_features=16, out_features=16, update=False
    )
    ref_params = ref.init(jax.random.PRNGKey(3), h, x, v)
    ours = DenseSAKELayer(hidden_features=16, out_features=16, update=False)
    our_params = convert_reference_params(ref_params)
    rh, rx, rv = ref.apply(ref_params, h, x, v)
    oh, ox, ov = ours.apply(our_params, h, x, v)
    np.testing.assert_allclose(oh, rh, **TOL)
    np.testing.assert_allclose(ox, rx, **TOL)


def test_model_parity():
    h, x, v = _inputs(f=7)
    ref = ref_sake.models.DenseSAKEModel(hidden_features=16, out_features=4, depth=3)
    ref_params = ref.init(jax.random.PRNGKey(11), h, x, v)
    ours = our_models.SAKEModel(hidden_features=16, out_features=4, depth=3)
    our_params = convert_reference_params(ref_params)
    rh, rx, rv = ref.apply(ref_params, h, x, v)
    oh, ox, ov = ours.apply(our_params, h, x, v)
    np.testing.assert_allclose(oh, rh, **TOL)
    np.testing.assert_allclose(ox, rx, **TOL)
    np.testing.assert_allclose(ov, rv, **TOL)


def test_model_parity_per_layer_update():
    h, x, _ = _inputs(f=7)
    schedule = [False, True, False]
    ref = ref_sake.models.DenseSAKEModel(
        hidden_features=16, out_features=4, depth=3, update=schedule
    )
    ref_params = ref.init(jax.random.PRNGKey(1), h, x)
    ours = our_models.SAKEModel(
        hidden_features=16, out_features=4, depth=3, update=schedule
    )
    our_params = convert_reference_params(ref_params)
    rh, rx, _ = ref.apply(ref_params, h, x)
    oh, ox, _ = ours.apply(our_params, h, x)
    np.testing.assert_allclose(oh, rh, **TOL)
    np.testing.assert_allclose(ox, rx, **TOL)


def test_model_parity_with_edge_features():
    h, x, _ = _inputs(f=7)
    he = jnp.asarray(np.random.RandomState(9).randn(5, 5, 2), jnp.float32)
    ref = ref_sake.models.DenseSAKEModel(hidden_features=8, out_features=2, depth=2)
    ref_params = ref.init(jax.random.PRNGKey(5), h, x, he=he)
    ours = our_models.SAKEModel(hidden_features=8, out_features=2, depth=2)
    our_params = convert_reference_params(ref_params)
    rh, rx, _ = ref.apply(ref_params, h, x, he=he)
    oh, ox, _ = ours.apply(our_params, h, x, he=he)
    np.testing.assert_allclose(oh, rh, **TOL)


def test_flow_parity():
    rng = np.random.RandomState(4)
    h = jnp.asarray(rng.randn(2, 5, 3), jnp.float32)
    x = jnp.asarray(rng.randn(2, 5, 3), jnp.float32)
    v = jnp.asarray(rng.randn(2, 5, 3), jnp.float32)
    ref = ref_sake.flows.AugmentedFlowModel(depth=2, mp_depth=2, hidden_features=8)
    ref_params = ref.init(jax.random.PRNGKey(13), h, x, v)
    ours = our_flows.AugmentedFlowModel(depth=2, mp_depth=2, hidden_features=8)
    our_params = convert_reference_params(ref_params)

    rx, rv, rld = ref.apply(ref_params, h, x, v, method=ref.f_forward)
    ox, ov, old = ours.apply(our_params, h, x, v, method=ours.f_forward)
    np.testing.assert_allclose(ox, rx, **TOL)
    np.testing.assert_allclose(ov, rv, **TOL)
    np.testing.assert_allclose(old, rld, rtol=1e-3)

    rx, rv, rld = ref.apply(ref_params, h, x, v, method=ref.f_backward)
    ox, ov, old = ours.apply(our_params, h, x, v, method=ours.f_backward)
    np.testing.assert_allclose(ox, rx, **TOL)
    np.testing.assert_allclose(ov, rv, **TOL)


def test_egnn_layer_parity():
    h, x, v = _inputs()
    for smear in (False, True):
        if smear:
            ref = ref_sake.layers.EquivariantGraphConvolutionalLayerWithSmearing(
                hidden_features=16, out_features=16, update=True, sigmoid=True
            )
            from sake_tpu.layers import EGNNSmearedLayer as Ours

            ours = Ours(hidden_features=16, out_features=16, update=True, sigmoid=True)
        else:
            ref = ref_sake.layers.EquivariantGraphConvolutionalLayer(
                hidden_features=16, out_features=16, update=True, sigmoid=True
            )
            from sake_tpu.layers import EGNNLayer as Ours

            ours = Ours(hidden_features=16, out_features=16, update=True, sigmoid=True)
        ref_params = ref.init(jax.random.PRNGKey(2), h, x, v)
        our_params = convert_reference_params(ref_params)
        rh, rx, rv = ref.apply(ref_params, h, x, v)
        oh, ox, ov = ours.apply(our_params, h, x, v)
        np.testing.assert_allclose(oh, rh, **TOL)
        np.testing.assert_allclose(ox, rx, **TOL)


def test_exp_normal_smearing_parity():
    from sake_tpu.radial import ExpNormalSmearing as Ours

    d = jnp.linspace(0.0, 6.0, 20).reshape(4, 5, 1)
    ref = ref_sake.utils.ExpNormalSmearing(num_rbf=50)
    ref_params = ref.init(jax.random.PRNGKey(0), d)
    ours = Ours(num_rbf=50)
    np.testing.assert_allclose(
        ours.apply(ref_params, d), ref.apply(ref_params, d), **TOL
    )
