"""Mask-consistency golden pairs: append a padded ghost atom and zero its
mask row/col — outputs on the real atoms must be unchanged
(models the reference's ``sake/tests/test_mask.py``, including the
euclidean-attention case its dense layer could not run — quirk Q1 fixed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sake_tpu import geometry
from sake_tpu.layers import DenseSAKELayer
from sake_tpu.models import SAKEModel

N, F, HID = 5, 16, 16  # F == HID: the layer's residual requires it


@pytest.fixture
def padded_pair():
    rng = np.random.RandomState(2666)
    h = jnp.asarray(rng.randn(N, F), jnp.float32)
    x = jnp.asarray(rng.randn(N, 3), jnp.float32)
    # ghost atom with arbitrary (nonzero!) values — the mask must hide it
    h_pad = jnp.concatenate([h, jnp.asarray(rng.randn(1, F), jnp.float32)], axis=0)
    x_pad = jnp.concatenate([x, jnp.asarray(rng.randn(1, 3), jnp.float32)], axis=0)
    node_mask = jnp.array([1.0] * N + [0.0])
    edge_mask = geometry.edge_mask_from_node_mask(node_mask)
    return h, x, h_pad, x_pad, node_mask, edge_mask


def _layer_and_params(h, x, **kwargs):
    layer = DenseSAKELayer(hidden_features=HID, out_features=HID, **kwargs)
    params = layer.init(jax.random.PRNGKey(0), h, x)
    return layer, params


def _fake_edges(hh, width=HID):
    """Synthetic edge features of the edge-model's output width, depending
    only on the sender node (so padded vs unpadded values agree on real
    pairs)."""
    n = hh.shape[-2]
    return jnp.tanh(
        jnp.broadcast_to(hh.sum(-1)[..., None, :, None], (n, n, width))
    )


def test_semantic_attention_masked(padded_pair):
    h, x, h_pad, x_pad, node_mask, edge_mask = padded_pair
    layer, params = _layer_and_params(h, x)
    att = layer.apply(params, _fake_edges(h), method=layer.semantic_attention)
    att_pad = layer.apply(
        params, _fake_edges(h_pad), edge_mask, method=layer.semantic_attention
    )
    np.testing.assert_allclose(att_pad[:N, :N], att, rtol=1e-4, atol=1e-5)


def test_euclidean_attention_masked(padded_pair):
    h, x, h_pad, x_pad, node_mask, edge_mask = padded_pair
    layer, params = _layer_and_params(h, x)
    r = geometry.pairwise_distance(geometry.pairwise_displacement(x))
    r_pad = geometry.pairwise_distance(geometry.pairwise_displacement(x_pad))
    att = layer.apply(params, r, method=layer.euclidean_attention)
    att_pad = layer.apply(params, r_pad, edge_mask, method=layer.euclidean_attention)
    np.testing.assert_allclose(att_pad[:N, :N], att, rtol=1e-4, atol=1e-5)


def test_combined_attention_masked(padded_pair):
    h, x, h_pad, x_pad, node_mask, edge_mask = padded_pair
    layer, params = _layer_and_params(h, x)
    r = geometry.pairwise_distance(geometry.pairwise_displacement(x))
    r_pad = geometry.pairwise_distance(geometry.pairwise_displacement(x_pad))
    _, _, comb = layer.apply(
        params, r, _fake_edges(h), method=layer.combined_attention
    )
    _, _, comb_pad = layer.apply(
        params, r_pad, _fake_edges(h_pad), edge_mask, method=layer.combined_attention
    )
    np.testing.assert_allclose(comb_pad[:N, :N], comb, rtol=1e-4, atol=1e-5)


def test_aggregate_masked(padded_pair):
    h, x, h_pad, x_pad, node_mask, edge_mask = padded_pair
    layer, params = _layer_and_params(h, x)
    edges = geometry.edge_concat(h)
    edges_pad = geometry.edge_concat(h_pad)
    agg = layer.apply(params, edges, method=layer.aggregate)
    agg_pad = layer.apply(params, edges_pad, edge_mask, method=layer.aggregate)
    np.testing.assert_allclose(agg_pad[:N], agg, rtol=1e-4, atol=1e-5)


def test_spatial_attention_masked(padded_pair):
    h, x, h_pad, x_pad, node_mask, edge_mask = padded_pair
    layer, params = _layer_and_params(h, x)
    n_att = layer.n_heads * HID

    def pieces(hh, xx, mask):
        d = geometry.pairwise_displacement(xx)
        r = geometry.pairwise_distance(d)
        n = hh.shape[-2]
        h_e_att = jnp.tanh(
            jnp.broadcast_to(hh.sum(-1)[..., None, :, None], (n, n, n_att))
        )
        return layer.apply(
            params, h_e_att, d, r, mask, method=layer.spatial_attention
        )

    h_comb, _ = pieces(h, x, None)
    h_comb_pad, _ = pieces(h_pad, x_pad, edge_mask)
    np.testing.assert_allclose(h_comb_pad[:N], h_comb, rtol=1e-3, atol=1e-4)


def test_full_layer_masked(padded_pair):
    h, x, h_pad, x_pad, node_mask, edge_mask = padded_pair
    layer, params = _layer_and_params(h, x)
    h0, x0, v0 = layer.apply(params, h, x)
    hp, xp, vp = layer.apply(params, h_pad, x_pad, None, edge_mask)
    np.testing.assert_allclose(hp[:N], h0, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(xp[:N], x0, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(vp[:N], v0, rtol=1e-3, atol=1e-4)


def test_full_model_masked(padded_pair):
    h, x, h_pad, x_pad, node_mask, edge_mask = padded_pair
    model = SAKEModel(hidden_features=HID, out_features=4, depth=3)
    params = model.init(jax.random.PRNGKey(0), h, x)
    h0, x0, v0 = model.apply(params, h, x)
    hp, xp, vp = model.apply(params, h_pad, x_pad, None, edge_mask)
    np.testing.assert_allclose(hp[:N], h0, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(xp[:N], x0, rtol=1e-3, atol=1e-4)


def test_batched_full_model_masked(padded_pair):
    """Padded batches (the QM9 collation pattern) keep per-graph results."""
    h, x, h_pad, x_pad, node_mask, edge_mask = padded_pair
    model = SAKEModel(hidden_features=HID, out_features=4, depth=2)
    params = model.init(jax.random.PRNGKey(0), h, x)
    h0, x0, _ = model.apply(params, h, x)

    hb = jnp.stack([h_pad, h_pad])
    xb = jnp.stack([x_pad, x_pad])
    mb = jnp.stack([edge_mask, edge_mask])
    hbo, xbo, _ = model.apply(params, hb, xb, None, mb)
    np.testing.assert_allclose(hbo[0, :N], h0, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(xbo[1, :N], x0, rtol=1e-3, atol=1e-4)
