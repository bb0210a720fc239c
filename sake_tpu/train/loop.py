"""On-device epoch loops.

The reference's single biggest performance trick is keeping whole epochs on
device as one XLA program (``lax.fori_loop`` over batches inside jit,
``scripts/md17/run.py:74-102``). Generalized here as ``lax.scan``-based
loops with donated state:

- ``scan_epoch``: one pass over a pre-batched array pytree.
- ``scan_epochs``: multiple epochs, each with an on-device reshuffle
  (the reference's ``many_epochs``), as a single program.

The same loop body works inside ``shard_map`` for data parallelism
(``sake_tpu.parallel``), fixing the reference's per-batch host round trips
in its pmap path (``scripts/qm9_tpu/run.py:110-111``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def shuffle_batches(key: jax.Array, data, batch_size: int):
    """Shuffle sample axis 0 and reshape to ``(n_batches, batch_size, ...)``,
    dropping the ragged tail (reference pattern: ``scripts/md17/run.py:74-82``).

    ``data`` is a pytree of arrays with a common leading sample axis.
    """
    n = jax.tree.leaves(data)[0].shape[0]
    n_batches = n // batch_size
    perm = jax.random.permutation(key, n)[: n_batches * batch_size]
    return jax.tree.map(
        lambda a: a[perm].reshape(n_batches, batch_size, *a.shape[1:]), data
    )


def scan_epoch(step_fn: Callable, state, batched_data):
    """Run ``step_fn(state, batch) -> (state, aux)`` over the leading batch
    axis as one ``lax.scan`` (no host round trips)."""
    return jax.lax.scan(step_fn, state, batched_data)


def scan_epochs(
    step_fn: Callable,
    state,
    data,
    *,
    batch_size: int,
    n_epochs: int,
    seed_from_step: bool = True,
):
    """Run ``n_epochs`` full passes as a single on-device program.

    Each epoch reshuffles with ``PRNGKey(state.step)`` (the reference's
    deterministic reshuffle keyed on the optimizer step,
    ``scripts/md17/run.py:76``), scans ``step_fn`` over the batches, and
    carries the state. Returns ``(state, aux_per_epoch)`` where ``aux`` is
    the mean of the step aux over each epoch.
    """

    def epoch(state, _):
        key = jax.random.PRNGKey(0)
        if seed_from_step:
            key = jax.random.fold_in(key, jnp.asarray(state.step, jnp.uint32))
        batches = shuffle_batches(key, data, batch_size)
        state, aux = jax.lax.scan(step_fn, state, batches)
        return state, jax.tree.map(lambda a: a.mean(axis=0), aux)

    return jax.lax.scan(epoch, state, None, length=n_epochs)
