"""Small neural building blocks shared by the SAKE and EGNN layers."""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from sake_tpu.radial import ExpNormalSmearing


def double_sigmoid(x: jax.Array) -> jax.Array:
    """``2 * sigmoid(x)`` — velocity-gate nonlinearity with range (0, 2) so a
    layer can amplify or damp velocities (reference: ``sake/layers.py:9-10``).
    """
    return 2.0 * jax.nn.sigmoid(x)


class MLP(nn.Module):
    """Dense stack with an activation after each listed layer (optionally
    skipping the last), mirroring the reference's ``nn.Sequential`` chains.

    ``features=(a, b), act_last=True``  -> Dense(a)-act-Dense(b)-act
    ``features=(a, b), act_last=False`` -> Dense(a)-act-Dense(b)
    """

    features: Sequence[int]
    activation: Callable = jax.nn.silu
    act_last: bool = True
    use_bias: bool = True
    use_bias_last: bool = True  # the scale/shift heads end in a bias-free Dense

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n = len(self.features)
        for i, f in enumerate(self.features):
            bias = self.use_bias and (i < n - 1 or self.use_bias_last)
            x = nn.Dense(f, use_bias=bias, name=f"dense_{i}")(x)
            if i < n - 1 or self.act_last:
                x = self.activation(x)
        return x


class ContinuousFilterConv(nn.Module):
    """Continuous-filter convolution with concatenation — the SAKE edge model.

    Pipeline (reference: ``sake/layers.py:12-40``): project edge features to
    the RBF width, modulate by the distance-smeared filter, then re-project a
    concatenation of [raw edges, filtered features, distance].

    Inputs: ``h`` ``(..., N, N, 2F[+he])`` edge features and ``dist``
    ``(..., N, N, 1)`` pairwise distances. Output ``(..., N, N, out_features)``.
    """

    out_features: int
    kernel_features: int = 50
    activation: Callable = jax.nn.silu

    @nn.compact
    def __call__(self, h: jax.Array, dist: jax.Array) -> jax.Array:
        h0 = h
        h = nn.Dense(self.kernel_features, name="mlp_in")(h)
        filtered = ExpNormalSmearing(num_rbf=self.kernel_features, name="kernel")(dist) * h
        out = jnp.concatenate([h0, filtered, dist], axis=-1)
        return MLP(
            (self.out_features, self.out_features),
            activation=self.activation,
            act_last=False,
            name="mlp_out",
        )(out)
