"""Fused energy+forces Pallas TPU kernel.

One kernel evaluates the FULL SAKE model's energy *and* its position
gradient (forces) for a tile of molecules, entirely in VMEM. The kernel
body traces ``jax.value_and_grad`` of the functional model
(``kernels.functional.model_forward``) — Mosaic compiles forward and
backward as one fused program, so none of the O(N^2) edge tensors ever
touch HBM. The lax path moves ~80 MB of HBM traffic per evaluation
(measured, XLA cost analysis, aspirin config); the fused path moves only
positions, features, parameters, and (E, F).

Per-layer ``jax.checkpoint`` keeps AD residuals bounded to one layer's
edge tensors, holding peak VMEM at roughly
``batch_tile * N^2 * (hidden * heads) * 4 B`` (~3.6 MB for the aspirin
config at tile 8).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sake_tpu.kernels.functional import ModelParams, energy_and_forces_fn


def fused_energy_forces(
    params: ModelParams,
    h: jax.Array,  # (B, N, F_in)
    x: jax.Array,  # (B, N, 3)
    *,
    n_heads: int = 4,
    update: Sequence[bool] | bool = True,
    batch_tile: int = 8,
    matmul_dtype=jnp.bfloat16,
    remat: bool = True,
    interpret: bool = False,
):
    """Fused (E, F) evaluation: ``E (B,)``, ``F = -dE/dx (B, N, 3)``.

    ``matmul_dtype=bfloat16`` runs MXU contractions on bf16 inputs with f32
    accumulation (full-rate MXU); pass ``None`` for strict f32.
    """
    B, N, _ = h.shape
    if B % batch_tile:
        raise ValueError(f"batch {B} not divisible by batch_tile {batch_tile}")
    leaves, treedef = jax.tree.flatten(params)
    n_leaves = len(leaves)

    def kernel(*refs):
        x_ref, h_ref = refs[0], refs[1]
        param_refs = refs[2 : 2 + n_leaves]
        e_ref, f_ref = refs[2 + n_leaves], refs[3 + n_leaves]
        p = jax.tree.unflatten(treedef, [r[:] for r in param_refs])
        hb = h_ref[:]
        xb = x_ref[:]
        e, f = energy_and_forces_fn(
            p, hb, xb, n_heads=n_heads, update=update, matmul_dtype=matmul_dtype
        )
        e_ref[:] = e[:, None]
        f_ref[:] = f

    grid = (B // batch_tile,)
    x_spec = pl.BlockSpec(
        (batch_tile, N, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    h_spec = pl.BlockSpec(
        (batch_tile, N, h.shape[-1]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    param_specs = [
        pl.BlockSpec(
            leaf.shape,
            lambda i, nd=leaf.ndim: (0,) * nd,  # bind ndim per leaf
            memory_space=pltpu.VMEM,
        )
        for leaf in leaves
    ]
    e, f = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 3), jnp.float32),
        ),
        in_specs=[x_spec, h_spec, *param_specs],
        out_specs=(
            pl.BlockSpec((batch_tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (batch_tile, N, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        interpret=interpret,
    )(x, h, *leaves)
    return e[:, 0], f
