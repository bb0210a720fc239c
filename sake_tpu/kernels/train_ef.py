"""Differentiable (second-order) energy+force evaluation on the kernel path.

Round 1's kernel custom-VJPs were first-order only, so force-loss
*training* — ``grad(loss(E, F), params)`` with ``F = -dE/dx`` itself a
gradient (the canonical hot path, ``scripts/md17/run.py:54-70``) — could
never leave the lax path. This module closes that gap with a custom VJP
over the fused (E, F) map:

- **primal**: the Pallas depth-on-grid kernel pair (fast, VMEM-resident);
- **backward**: the exact pullback of cotangents ``(gE, gF)`` through the
  *functional lax model*, using the identity

  ``<(gE, gF), d(E, F)> = d[ sum_b gE_b E_b - <gF, grad_x (sum_b E_b)> ]``

  i.e. the mixed second derivative is the gradient of a JVP — a
  higher-order program XLA differentiates natively. No kernel needs to be
  differentiated twice; the kernels accelerate the primal evaluation while
  the training gradient stays oracle-exact (tested against plain
  double-autodiff in ``tests/test_kernels.py``).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from sake_tpu.kernels.depthgrid_ef import depthgrid_energy_forces
from sake_tpu.kernels.functional import ModelParams, model_forward


def make_trainable_energy_forces(
    *,
    n_heads: int = 4,
    update: Sequence[bool] | bool = True,
    batch_tile: int = 8,
    matmul_dtype=None,
    precision=None,
    edge_matmul_dtype=None,
    edge_precision=None,
    primal: str = "fori",
    pad_atoms: bool = False,
    interpret: bool = False,
):
    """Build ``ef(params, h, x) -> (e, f)`` that runs the Pallas kernels
    forward and is differentiable (to any order reachable through the lax
    model) w.r.t. ``params``, ``h`` and ``x``.

    ``primal`` selects the kernel generation for the forward evaluation:
    ``"fori"`` (fori-over-depth pair, fastest measured), ``"resid"``
    (residual-streaming + hand-written backward), or ``"depthgrid"``.
    """

    kernel_kw = dict(
        n_heads=n_heads,
        update=update,
        batch_tile=batch_tile,
        matmul_dtype=matmul_dtype,
        precision=precision,
        edge_matmul_dtype=edge_matmul_dtype,
        edge_precision=edge_precision,
        interpret=interpret,
    )

    def _e_per_graph(params: ModelParams, h, x):
        out, _, _ = model_forward(params, h, x, n_heads=n_heads, update=update)
        return out.sum(axis=(-2, -1))  # (B,)

    if primal == "fori":
        from sake_tpu.kernels.fori_ef import fori_energy_forces

        def primal_fn(params, h, x):
            return fori_energy_forces(
                params, h, x, pad_atoms=pad_atoms, **kernel_kw
            )

    elif primal == "resid":
        from sake_tpu.kernels.resid_ef import resid_energy_forces

        def primal_fn(params, h, x):
            return resid_energy_forces(
                params, h, x, pad_atoms=pad_atoms, **kernel_kw
            )

    elif primal == "depthgrid":
        def primal_fn(params, h, x):
            return depthgrid_energy_forces(params, h, x, **kernel_kw)

    else:
        raise ValueError(f"unknown primal {primal!r}")

    @jax.custom_vjp
    def ef(params, h, x):
        return primal_fn(params, h, x)

    def ef_fwd(params, h, x):
        return ef(params, h, x), (params, h, x)

    def ef_bwd(residuals, cotangents):
        params, h, x = residuals
        g_e, g_f = cotangents

        def pullback_scalar(p, h_, x_):
            # <gE, E> + <gF, F> with F = -grad_x sum(E):
            term1 = (g_e * _e_per_graph(p, h_, x_)).sum()
            _, term2 = jax.jvp(
                lambda x2: _e_per_graph(p, h_, x2).sum(), (x_,), (g_f,)
            )
            return term1 - term2

        return jax.grad(pullback_scalar, argnums=(0, 1, 2))(params, h, x)

    ef.defvjp(ef_fwd, ef_bwd)
    return ef
