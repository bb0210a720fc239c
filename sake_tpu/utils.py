"""Small numerics utilities: de-standardization and bootstrap metrics."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def coloring(x: jax.Array, mean, std) -> jax.Array:
    """De-standardize predictions: ``std * x + mean``.

    Every energy workload wraps this with train-set statistics
    (reference: ``sake/utils.py:7-8``).
    """
    return std * x + mean


@jax.jit
def mae(x: jax.Array, y: jax.Array) -> jax.Array:
    """Mean absolute error (reference: ``sake/utils.py:67-69``)."""
    return jnp.abs(x - y).mean()


@jax.jit
def mae_with_replacement(x: jax.Array, y: jax.Array, seed: int = 0) -> jax.Array:
    """MAE on a bootstrap resample drawn with PRNGKey(seed)
    (reference: ``sake/utils.py:71-78``)."""
    key = jax.random.PRNGKey(seed)
    idxs = jax.random.choice(key, x.shape[0], shape=(x.shape[0],), replace=True)
    return mae(x[idxs], y[idxs])


def bootstrap_mae(x, y, n_samples: int = 10, ci: float = 0.95):
    """Bootstrap-resampled MAE with a percentile confidence interval.

    Returns ``(original, low, high)``; used by every eval harness to print
    ``mean_{low}^{high}`` (reference: ``sake/utils.py:81-89``).
    """
    original = jnp.abs(x - y).mean().item()
    results = [mae_with_replacement(x, y, i).item() for i in range(n_samples)]
    low = np.percentile(results, 100.0 * 0.5 * (1.0 - ci))
    high = np.percentile(results, (1.0 - (1.0 - ci) * 0.5) * 100.0)
    return original, low, high
