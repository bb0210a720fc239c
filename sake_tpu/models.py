"""Depth-stacked models and readout heads.

``SAKEModel`` threads ``(h, x, v)`` through a stack of ``DenseSAKELayer``s —
positions/velocities are updated *between* layers, so a depth-D model with
``update=True`` is a D-step learned integrator
(reference: ``sake/models.py:11-61``).

Readout heads implement the patterns every reference workload hand-rolled:
sum-pooled (masked) energies with de-standardization, energy->force
differentiation, and property regression heads.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from sake_tpu.blocks import MLP
from sake_tpu.layers import DenseSAKELayer, EGNNLayer, EGNNSmearedLayer
from sake_tpu.utils import coloring


def _per_layer(update: Union[bool, Sequence[bool]], depth: int) -> Sequence[bool]:
    if isinstance(update, bool):
        return [update] * depth
    assert len(update) == depth, "per-layer update list must match depth"
    return list(update)


class SAKEModel(nn.Module):
    """Stack of dense SAKE layers with in/out embeddings.

    ``update`` may be a per-layer schedule (e.g. ``[False]*4 + [True]*2``,
    the pattern of ``scripts/ani/run.py:70``). Call signature
    ``(h, x, v=None, mask=None, he=None) -> (h, x, v)``
    (reference: ``sake/models.py:11-61``).
    """

    hidden_features: int
    out_features: int
    depth: int = 4
    activation: Callable = jax.nn.silu
    update: Union[bool, Sequence[bool]] = True
    use_semantic_attention: bool = True
    use_euclidean_attention: bool = True
    use_spatial_attention: bool = True
    n_heads: int = 4
    cutoff: Optional[Callable] = None

    def setup(self):
        self.embedding_in = nn.Dense(self.hidden_features, name="embedding_in")
        self.embedding_out = MLP(
            (self.hidden_features, self.out_features),
            self.activation,
            act_last=False,
            name="embedding_out",
        )
        updates = _per_layer(self.update, self.depth)
        self.layers = [
            DenseSAKELayer(
                hidden_features=self.hidden_features,
                out_features=self.hidden_features,
                activation=self.activation,
                update=updates[i],
                use_semantic_attention=self.use_semantic_attention,
                use_euclidean_attention=self.use_euclidean_attention,
                use_spatial_attention=self.use_spatial_attention,
                n_heads=self.n_heads,
                cutoff=self.cutoff,
                name=f"layer_{i}",
            )
            for i in range(self.depth)
        ]

    def __call__(self, h, x, v=None, mask=None, he=None):
        h = self.embedding_in(h)
        for layer in self.layers:
            h, x, v = layer(h, x, v, mask=mask, he=he)
        h = self.embedding_out(h)
        return h, x, v


# Reference-compatible alias (reference class name: DenseSAKEModel).
DenseSAKEModel = SAKEModel


class EGNN(nn.Module):
    """EGNN baseline model (reference: ``sake/models.py:64-111``).

    The reference version crashes when called because it forwards ``he=`` to
    layers that do not accept it (``models.py:109``); fixed here by not
    forwarding (the EGNN layers take no extra edge features).
    """

    hidden_features: int
    out_features: int
    depth: int = 4
    activation: Callable = jax.nn.silu
    update: Union[bool, Sequence[bool]] = True
    smear: bool = False
    sigmoid: bool = False

    def setup(self):
        self.embedding_in = nn.Dense(self.hidden_features, name="embedding_in")
        self.embedding_out = MLP(
            (self.hidden_features, self.out_features),
            self.activation,
            act_last=False,
            name="embedding_out",
        )
        layer_cls = EGNNSmearedLayer if self.smear else EGNNLayer
        updates = _per_layer(self.update, self.depth)
        self.layers = [
            layer_cls(
                hidden_features=self.hidden_features,
                out_features=self.hidden_features,
                activation=self.activation,
                update=updates[i],
                sigmoid=self.sigmoid,
                name=f"layer_{i}",
            )
            for i in range(self.depth)
        ]

    def __call__(self, h, x, v=None, mask=None):
        h = self.embedding_in(h)
        if v is None:
            v = jnp.zeros_like(x)
        for layer in self.layers:
            h, x, v = layer(h, x, v, mask=mask)
        h = self.embedding_out(h)
        return h, x, v


EquivariantGraphNeuralNetwork = EGNN


# --- Readouts ----------------------------------------------------------------


def energy_readout(h_out, mask=None, mean=0.0, std=1.0):
    """Sum node outputs to a per-graph energy and de-standardize.

    ``E = std * sum_i h_i + mean`` with optional node masking — the readout
    every energy workload builds by hand (e.g. ``scripts/md17/run.py:46-52``,
    ``scripts/qm9_full/run.py:46-55``). ``h_out (..., N, 1) -> (...,)``.
    """
    if mask is not None:
        h_out = h_out * mask[..., None]
    e = h_out.sum(axis=(-2, -1))
    return coloring(e, mean, std)


def energy_and_forces(apply_fn, params, h, x, mask=None, mean=0.0, std=1.0):
    """Energy and conservative forces ``F = -dE/dx`` in one pass.

    The nested-differentiation pattern of ``scripts/md17/run.py:46-58``:
    the energy readout is differentiated w.r.t. input positions, and the
    whole thing remains differentiable w.r.t. ``params`` for the outer
    training gradient (second-order use).
    """

    def energy(x_):
        h_out, _, _ = apply_fn(params, h, x_, mask=mask)
        return energy_readout(h_out, mask=mask, mean=mean, std=std).sum()

    e, neg_f = jax.value_and_grad(energy)(x)
    return e, -neg_f


class GraphPropertyHead(nn.Module):
    """Masked sum-pool over node features followed by an optional MLP —
    the QM9 property readout (``scripts/qm9_full/run.py:46-68``)."""

    out_features: int = 1
    hidden_features: int = 64
    use_mlp: bool = True
    activation: Callable = jax.nn.silu

    @nn.compact
    def __call__(self, h, mask=None):
        if mask is not None:
            h = h * mask[..., None]
        pooled = h.sum(axis=-2)
        if self.use_mlp:
            pooled = MLP(
                (self.hidden_features, self.out_features),
                self.activation,
                act_last=False,
                name="head",
            )(pooled)
        return pooled
