"""Fused energy+forces Pallas TPU kernel.

One kernel evaluates the FULL SAKE model's energy *and* its position
gradient (forces) for a tile of molecules, entirely in VMEM. The lax path
moves ~80 MB of HBM traffic per evaluation (measured via XLA cost analysis
on the aspirin config); the fused path moves only positions, features,
parameters, and (E, F).

Design notes (earned empirically against Mosaic):

- **Coordinates cross the kernel boundary as three (B, N) planes** — a
  3-wide minor dimension maps poorly onto 128-lane vregs and trips Mosaic
  relayout bugs; split/stack happens outside in XLA where it is free.
- **The depth loop lives INSIDE the kernel** as ``lax.fori_loop`` over
  parameter stacks with a leading depth axis. Unrolling the layers made
  Mosaic compile time grow ~3x per pipeline stage (a fully unrolled
  6-layer forward+backward would take hours); with the loop, the layer
  body is traced once for the forward and once for the backward.
- **Backward is hand-staged rematerialization**: the forward stores only
  per-layer boundary states ``(h, x, v)`` in VMEM scratch; the backward
  fori_loop re-traces each layer under ``jax.vjp`` and applies the
  cotangent immediately — ``jax.checkpoint`` has no Pallas lowering, and
  storing every edge tensor for 6 layers would blow VMEM anyway.
- **Per-layer ``update`` flags are arithmetic gates** (0/1 floats carried
  in VMEM) so the loop body is uniform across layers; the velocity
  placeholder starts at zero, which reproduces the reference's
  ``v=None -> v=delta_v`` first-update semantics exactly
  (``gate * 0 + delta_v``).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sake_tpu.kernels.functional import (
    ModelParams,
    _embed,
    _make_mm,
    _readout,
    layer_forward_planes,
)


def _layer_step(lp, h, xp, vp, upd, *, n_heads, matmul_dtype):
    """Uniform layer body: always compute the update, select by flag."""
    h2, xp2, vp2 = layer_forward_planes(
        lp, h, xp, vp, n_heads=n_heads, update=True, matmul_dtype=matmul_dtype
    )
    xp_out = [xk + upd * (x2k - xk) for xk, x2k in zip(xp, xp2)]
    vp_out = [vk + upd * (v2k - vk) for vk, v2k in zip(vp, vp2)]
    return h2, xp_out, vp_out


def fused_energy_forces(
    params: ModelParams,
    h: jax.Array,  # (B, N, F_in)
    x: jax.Array,  # (B, N, 3)
    *,
    n_heads: int = 4,
    update: Sequence[bool] | bool = True,
    batch_tile: int = 8,
    matmul_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Fused (E, F) evaluation: ``E (B,)``, ``F = -dE/dx (B, N, 3)``.

    ``matmul_dtype=bfloat16`` runs MXU contractions on bf16 inputs with f32
    accumulation (full-rate MXU); pass ``None`` for strict f32.
    """
    B, N, F_in = h.shape
    if B % batch_tile:
        raise ValueError(f"batch {B} not divisible by batch_tile {batch_tile}")
    depth = len(params.layers)
    updates = [update] * depth if isinstance(update, bool) else list(update)
    upd_flags = jnp.asarray(updates, jnp.float32).reshape(depth, 1)

    from sake_tpu.kernels.adapter import stack_layer_params

    stacked = stack_layer_params(list(params.layers))
    layer_leaves, layer_treedef = jax.tree.flatten(stacked)
    head = (params.w_embed, params.b_embed, params.w_out0, params.b_out0,
            params.w_out1, params.b_out1)
    n_ll = len(layer_leaves)
    # keepdims plane format: (B, N, 1) in/out — see kernels.functional
    x_planes = [x[..., k : k + 1] for k in range(3)]
    F = params.w_embed.shape[-1]
    BT = batch_tile

    def kernel(*refs):
        (x0_ref, x1_ref, x2_ref, h_ref) = refs[:4]
        lrefs = refs[4 : 4 + n_ll]
        (we_ref, be_ref, wo0_ref, bo0_ref, wo1_ref, bo1_ref, upd_ref) = refs[
            4 + n_ll : 11 + n_ll
        ]
        e_ref, f0_ref, f1_ref, f2_ref = refs[11 + n_ll : 15 + n_ll]
        (sh_ref, sx0_ref, sx1_ref, sx2_ref, sv0_ref, sv1_ref, sv2_ref) = refs[
            15 + n_ll :
        ]
        sx_refs = (sx0_ref, sx1_ref, sx2_ref)
        sv_refs = (sv0_ref, sv1_ref, sv2_ref)

        mm = _make_mm(matmul_dtype)

        class HeadP:  # lightweight namespace for _embed/_readout
            w_embed, b_embed = we_ref[:], be_ref[:]
            w_out0, b_out0 = wo0_ref[:], bo0_ref[:]
            w_out1, b_out1 = wo1_ref[:], bo1_ref[:]

        def load_layer(i):
            return jax.tree.unflatten(layer_treedef, [r[i] for r in lrefs])

        def step(i, h_, xp_, vp_):
            return _layer_step(
                load_layer(i), h_, xp_, vp_, upd_ref[i, 0],
                n_heads=n_heads, matmul_dtype=matmul_dtype,
            )

        # ---- forward: save boundary states in scratch -------------------
        h0 = _embed(HeadP, h_ref[:], mm)
        xp0 = [x0_ref[:], x1_ref[:], x2_ref[:]]  # (BT, N, 1) each
        vp0 = [jnp.zeros_like(xp0[0])] * 3

        def fwd_body(i, carry):
            h_, xp_, vp_ = carry
            sh_ref[i] = h_.reshape(BT * N, F)  # 2D stores into 3D scratch
            for k in range(3):
                sx_refs[k][i] = xp_[k]
                sv_refs[k][i] = vp_[k]
            h_, xp_, vp_ = step(i, h_, xp_, vp_)
            return (h_, list(xp_), list(vp_))

        h_f, xp_f, vp_f = jax.lax.fori_loop(
            0, depth, fwd_body, (h0, xp0, vp0)
        )

        def readout_e(h_):
            # 2D (BT, 1) output: 1-D values trip Mosaic layout inference
            out = _readout(HeadP, h_, mm)
            return out.sum(axis=-1).sum(axis=-1, keepdims=True)

        e, readout_vjp = jax.vjp(readout_e, h_f)
        (dh0,) = readout_vjp(jnp.ones_like(e))

        # ---- backward: recompute each layer under vjp, reversed ---------
        def bwd_body(t, carry):
            dh, dx, dv = carry
            i = depth - 1 - t
            h_in = sh_ref[i].reshape(BT, N, F)
            xp_in = [sx_refs[k][i] for k in range(3)]
            vp_in = [sv_refs[k][i] for k in range(3)]
            _, layer_vjp = jax.vjp(
                lambda a, b, c: step(i, a, b, c), h_in, xp_in, vp_in
            )
            dh, dx, dv = layer_vjp((dh, list(dx), list(dv)))
            return (dh, list(dx), list(dv))

        zeros3 = [jnp.zeros_like(xp0[0])] * 3
        _, dx, _ = jax.lax.fori_loop(
            0, depth, bwd_body, (dh0, zeros3, zeros3)
        )

        e_ref[:] = e
        f0_ref[:] = -dx[0]
        f1_ref[:] = -dx[1]
        f2_ref[:] = -dx[2]

    grid = (B // BT,)
    plane_spec = pl.BlockSpec(
        (BT, N, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    h_spec = pl.BlockSpec((BT, N, F_in), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def full_spec(a):
        return pl.BlockSpec(
            a.shape, lambda i, nd=a.ndim: (0,) * nd, memory_space=pltpu.VMEM
        )

    e, f0, f1, f2 = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
        ),
        in_specs=(
            [plane_spec] * 3
            + [h_spec]
            + [full_spec(a) for a in layer_leaves]
            + [full_spec(a) for a in head]
            + [full_spec(upd_flags)]
        ),
        out_specs=(
            pl.BlockSpec((BT, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            plane_spec,
            plane_spec,
            plane_spec,
        ),
        scratch_shapes=[pltpu.VMEM((depth, BT * N, F), jnp.float32)]  # h states
        + [pltpu.VMEM((depth, BT, N, 1), jnp.float32)] * 6,  # x, v planes
        interpret=interpret,
    )(*x_planes, h, *layer_leaves, *head, upd_flags)
    return e[:, 0], jnp.concatenate([f0, f1, f2], axis=-1)
