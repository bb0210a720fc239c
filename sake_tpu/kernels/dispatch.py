"""Batch-aware kernel dispatch: ONE public E+F entry point that picks the
measured-best Pallas variant for the shape it is given.

The kernel generations trade differently with batch size (all measured on
v5e, aspirin E+F, oracle-gated — PERF.md):

- ``one_ef`` (gen-5 single fused kernel, zero residual HBM traffic) wins
  at large batch: 23.6k evals/s @2048 rising to 25.8k @32768 (bt=4).
- ``resid_ef`` (gen-4 residual streaming) wins below ~2048, where
  one_ef's per-launch overhead isn't amortized: 23.2k vs 19.3k @512.

Library callers shouldn't have to know this table (VERDICT r3 item 8:
"callers get whatever they import"); :func:`dispatch_energy_forces`
applies it. Selection happens at TRACE time from the static batch size —
inside ``jit`` the choice is baked into the compiled program, exactly as
if the caller had picked the champion by hand.

Both champions run the measured production tier: bf16 edge matmuls +
bf16 residual/scratch storage for everything except the (r, t) geometry
planes (rounding those poisons forces — PERF.md), f32 node matmuls.
Force error vs the HIGHEST-precision oracle is ~3.5-4.8e-3, the same
tier as the lax path's own default-precision error.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from sake_tpu.kernels.resid_ef import (
    _EDGE_RESIDS,
    _NODE_RESIDS,
    resid_energy_forces,
)
from sake_tpu.kernels.one_ef import one_energy_forces

# measured crossover (PERF.md batch sweeps): one_ef >= resid_ef from 2048
ONE_EF_MIN_BATCH = 2048

# bf16 residual storage for everything except the geometry planes
_LOWP_X = set(_EDGE_RESIDS + _NODE_RESIDS) - {"r", "t"}


def _largest_tile(b: int, preferred: int) -> int:
    """Largest power-of-two tile <= preferred that divides b."""
    t = preferred
    while t > 1 and b % t:
        t //= 2
    return t


def dispatch_energy_forces(
    params,
    h: jax.Array,  # (B, N, F_in)
    x: jax.Array,  # (B, N, 3)
    mask: jax.Array | None = None,  # (B, N, N) edge mask
    *,
    n_heads: int = 4,
    update: Sequence[bool] | bool = True,
    interpret: bool = False,
    **overrides,
):
    """Fused ``(E (B,), F (B, N, 3))`` via the measured-best kernel for
    this batch size. ``overrides`` pass through to the chosen kernel
    (e.g. ``batch_tile=...`` to pin a tile, ``resid_dtype=jnp.float32``
    for full-precision residuals)."""
    B = h.shape[0]
    kw = dict(
        n_heads=n_heads,
        update=update,
        edge_matmul_dtype=jnp.bfloat16,
        resid_dtype=jnp.bfloat16,
        resid_lowp=_LOWP_X,
        pad_atoms=True,
        interpret=interpret,
    )
    if B >= ONE_EF_MIN_BATCH:
        kw["batch_tile"] = _largest_tile(B, 4)
        kw.update(overrides)
        return one_energy_forces(params, h, x, mask, **kw)
    kw["batch_tile"] = _largest_tile(B, 8)
    kw.update(overrides)
    return resid_energy_forces(params, h, x, mask, **kw)
