"""Single-kernel fused E+F: forward, readout, and backward in ONE Pallas
program with residuals held in VMEM scratch — zero residual HBM traffic.

Fifth kernel generation. The gen-4 champion (``resid_ef``) splits the
evaluation into a forward kernel that STREAMS every per-layer residual to
HBM, an XLA readout, and a backward kernel that streams them back —
~6 MB/eval (f32) of round-trip DMA plus a chunked ``lax.map`` to bound
residual liveness, plus two kernel launches and an XLA segment per chunk.
Round-3 profiling attributed ~10% of E+F time to that residual DMA.

This kernel removes the HBM round trip entirely:

- grid ``(B/BT,)`` — one grid step per batch tile, nothing carried
  across steps;
- forward ``fori_loop`` over depth (resident stacked params, the
  ``fori_ef`` orchestration) writing each layer's residual dict and
  boundary state into ``(depth, ...)``-stacked **VMEM scratch** at the
  dynamic layer index;
- the energy readout head and its cotangent seed evaluated **in-kernel**
  (``jax.vjp`` of the two-matmul MLP — the same math the gen-4 path runs
  in XLA between its kernels);
- backward ``fori_loop`` (reversed) running the hand-written pullback
  ``layer_bwd_resid`` on the VMEM-resident residuals.

Residual scratch uses the same per-name dtype policy as gen-4
(``_RESID_LOWP``: everything except the (E, 1) geometry planes ``r``/``t``
may round to bf16 — halves scratch bytes at the measured-acceptable force
error). At ``batch_tile=8``, depth 6, N=24 the scratch footprint is
~25 MB (bf16) — comfortably inside the 128 MB v5e VMEM.

Reference behavior matched: the fused E+F evaluation of
``/root/reference/scripts/md17/run.py:54-70`` (energy model + forces via
``-dE/dx``); numerics identical to ``resid_ef.resid_energy_forces``
(shared ``layer_fwd_resid``/``layer_bwd_resid``).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sake_tpu.kernels.depthgrid_ef import (
    _LEAF_NAMES,
    _compiler_params,
    _make_mm_prec,
    wide_stack,
)
from sake_tpu.kernels.functional import ModelParams, _silu
from sake_tpu.kernels.resid_ef import (
    _EDGE_RESIDS,
    _NODE_RESIDS,
    _edge_channels,
    _node_channels,
    _resid_dtype_for,
    layer_bwd_resid,
    layer_fwd_resid,
)
from sake_tpu.kernels.split_ef import head_expansion_matrices


# bt=8's scoped allocation is ~113 MB at depth-6/N=24 (measured from the
# Mosaic compile rejection) — above the 100 MB default scoped-vmem limit,
# inside the 128 MB part. Applied automatically when batch_tile >= 8 and
# no explicit vmem_limit is given; bt<=4 (the champion tile) stays on the
# default limit it was measured under.
_BT8_VMEM = 124 * 1024 * 1024


def _resident(a):
    """Whole-array VMEM block, constant index map: DMA'd once per launch."""
    return pl.BlockSpec(
        a.shape, lambda b, nd=a.ndim: (0,) * nd, memory_space=pltpu.VMEM
    )


def _bspec1(shape, bt):
    nd = len(shape)
    return pl.BlockSpec(
        (bt,) + shape[1:], lambda b, nd=nd: (b,) + (0,) * (nd - 1),
        memory_space=pltpu.VMEM,
    )


def one_energy_forces(
    params: ModelParams,
    h: jax.Array,  # (B, N, F_in)
    x: jax.Array,  # (B, N, 3)
    mask: jax.Array | None = None,  # (B, N, N) edge mask
    *,
    n_heads: int = 4,
    update: Sequence[bool] | bool = True,
    batch_tile: int = 8,
    matmul_dtype=None,
    precision=None,
    edge_matmul_dtype=None,
    edge_precision=None,
    resid_dtype=jnp.float32,
    resid_lowp=None,
    pad_atoms: bool = False,
    vmem_limit: int | None = None,
    batch_parallel: bool = False,
    interpret: bool = False,
):
    """Fused single-kernel (E, F) evaluation: ``E (B,)``, ``F = -dE/dx``.

    Same contract and numerics as ``resid_ef.resid_energy_forces`` —
    masked/padded semantics included — with no residual HBM streaming,
    no chunking (residuals never leave VMEM), and one kernel launch for
    the whole batch.
    """
    B, N, F_in = h.shape
    n_real = None
    if pad_atoms and N % 8:
        n_real = N
        n_pad = (-N) % 8
        h = jnp.pad(h, ((0, 0), (0, n_pad), (0, 0)))
        x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)))
        if mask is not None:
            mask = jnp.pad(mask, ((0, 0), (0, n_pad), (0, n_pad)))
        N = N + n_pad
    node_mask = None
    if mask is not None:
        eyeN = jnp.eye(N, dtype=mask.dtype)
        node_mask = (mask * eyeN).sum(axis=-1)[..., None]  # (B, N, 1)
    BT = batch_tile
    if B % BT:
        raise ValueError(f"batch {B} not divisible by batch_tile {BT}")
    depth = len(params.layers)
    updates = [update] * depth if isinstance(update, bool) else list(update)
    upd_flags = jnp.asarray(updates, jnp.float32).reshape(depth, 1)
    F = params.w_embed.shape[-1]
    lay0 = params.layers[0]
    R = lay0.edge.w_in.shape[-1]
    H = lay0.edge.w_out0.shape[-1]
    K = n_heads
    C = lay0.w_xmix.shape[-1]
    mm = _make_mm_prec(matmul_dtype, precision)
    mm_edge = None
    if edge_matmul_dtype is not None or edge_precision is not None:
        mm_edge = _make_mm_prec(edge_matmul_dtype, edge_precision)
    e_rep, e_tile = head_expansion_matrices(H, K)
    leaves = wide_stack(params, n_heads)
    ech = _edge_channels(R, H, K, C)
    nch = _node_channels(lay0, C)
    NN = N * N
    resid_shapes = [
        ((depth, BT, NN, ech[nm]), nm) for nm in _EDGE_RESIDS
    ] + [((depth, BT, N, nch[nm]), nm) for nm in _NODE_RESIDS]
    n_resid = len(resid_shapes)

    h0 = (
        mm(h.reshape(B * N, F_in), params.w_embed) + params.b_embed
    ).reshape(B, N, F)
    x_planes = [x[..., k : k + 1] for k in range(3)]
    # readout-head leaves as >=2D values (1-D breaks Mosaic layouts)
    w_out0 = params.w_out0
    b_out0 = params.b_out0.reshape(1, -1)
    w_out1 = params.w_out1
    b_out1 = params.b_out1.reshape(1, -1)
    out_f = w_out1.shape[-1]

    mask_flat = mask.reshape(B, NN, 1) if mask is not None else None
    has_mask = mask is not None
    n_real_k = None if has_mask else n_real

    def read_p(lrefs, i):
        return {nm: r[i] for nm, r in zip(_LEAF_NAMES, lrefs)}

    flag_spec = pl.BlockSpec(
        (depth, 1), lambda b: (0, 0), memory_space=pltpu.SMEM
    )

    def kernel(*refs):
        (x0r, x1r, x2r, hr, updr, err, etr, w0r, b0r, w1r, b1r) = refs[:11]
        o = 11
        lrefs = refs[o : o + len(leaves)]
        o += len(leaves)
        m4 = nmr = None
        if has_mask:
            m4 = refs[o][:].reshape(BT, N, N, 1)
            nmr = refs[o + 1]
            o += 2
        e_ref, dx0_ref, dx1_ref, dx2_ref = refs[o : o + 4]
        scr = refs[o + 4 :]
        sb = scr[:7]  # boundary: h, x0..x2, v0..v2 per layer
        srefs = scr[7 : 7 + n_resid]

        def fwd_body(i, carry):
            hc, xp, vp = carry
            sb[0][i] = hc
            for k in range(3):
                sb[1 + k][i] = xp[k]
                sb[4 + k][i] = vp[k]
            h2, xp2, vp2, resid = layer_fwd_resid(
                read_p(lrefs, i), hc, xp, vp, updr[i, 0],
                e_rep=err[:], e_tile=etr[:], mm=mm, mm_edge=mm_edge,
                n_real=n_real_k, mask=m4,
            )
            for (_, nm), sr in zip(resid_shapes, srefs):
                sr[i] = resid[nm].astype(sr.dtype)
            return h2, list(xp2), list(vp2)

        xp0 = [x0r[:], x1r[:], x2r[:]]
        vp0 = [jnp.zeros_like(xp0[0])] * 3
        h_fin, _, _ = jax.lax.fori_loop(
            0, depth, fwd_body, (hr[:], xp0, vp0)
        )

        # --- readout + cotangent seed, in-kernel --------------------------
        w0, b0, w1, b1 = w0r[:], b0r[:], w1r[:], b1r[:]

        def readout_e(h_):
            out = mm(_silu(mm(h_.reshape(BT * N, F), w0) + b0), w1) + b1
            out = out.reshape(BT, N, out_f)
            if nmr is not None:
                out = out * nmr[:]
            elif n_real is not None:
                out = out[:, :n_real]
            return jnp.sum(out, axis=1)  # (BT, out_f): trailing dim kept

        e_blk, readout_vjp = jax.vjp(readout_e, h_fin)
        (dh_fin,) = readout_vjp(jnp.ones_like(e_blk))
        # energy as a broadcast (BT, N, 1) plane: (BT, 1)-shaped blocks
        # violate the (8, 128) block rule at batch_tile < 8
        e_ref[:] = jnp.broadcast_to(
            jnp.sum(e_blk, axis=-1, keepdims=True)[:, :, None], (BT, N, 1)
        )

        # --- reversed backward on VMEM residuals --------------------------
        def bwd_body(t, carry):
            dh, dxp, dvp = carry
            i = depth - 1 - t
            h_in = sb[0][i]
            xp_in = [sb[1 + k][i] for k in range(3)]
            vp_in = [sb[4 + k][i] for k in range(3)]
            resid = {
                nm: sr[i].astype(jnp.float32)
                for (_, nm), sr in zip(resid_shapes, srefs)
            }
            dh2, dxp2, dvp2 = layer_bwd_resid(
                read_p(lrefs, i), resid, h_in, xp_in, vp_in, updr[i, 0],
                dh, dxp, dvp,
                e_rep=err[:], e_tile=etr[:], mm=mm, mm_edge=mm_edge,
                n_real=n_real_k, mask=m4,
            )
            return dh2, list(dxp2), list(dvp2)

        zero = jnp.zeros((BT, N, 1), jnp.float32)
        _, dxp, _ = jax.lax.fori_loop(
            0, depth, bwd_body, (dh_fin, [zero] * 3, [zero] * 3)
        )
        dx0_ref[:] = dxp[0]
        dx1_ref[:] = dxp[1]
        dx2_ref[:] = dxp[2]

    plane = jax.ShapeDtypeStruct((B, N, 1), jnp.float32)
    e_out, dx0, dx1, dx2 = pl.pallas_call(
        kernel,
        grid=(B // BT,),
        out_shape=(plane, plane, plane, plane),
        in_specs=(
            [_bspec1((B, N, 1), BT)] * 3
            + [_bspec1((B, N, F), BT), flag_spec]
            + [_resident(a) for a in (e_rep, e_tile, w_out0, b_out0,
                                      w_out1, b_out1)]
            + [_resident(a) for a in leaves]
            + (
                [_bspec1((B, NN, 1), BT), _bspec1((B, N, 1), BT)]
                if has_mask
                else []
            )
        ),
        out_specs=(_bspec1((B, N, 1), BT),) * 4,
        scratch_shapes=(
            [pltpu.VMEM((depth, BT, N, F), jnp.float32)]
            + [pltpu.VMEM((depth, BT, N, 1), jnp.float32)] * 6
            + [
                pltpu.VMEM(s, _resid_dtype_for(nm, resid_dtype, resid_lowp))
                for s, nm in resid_shapes
            ]
        ),
        # grid steps are fully independent (no carried scratch state), so
        # "parallel" semantics are always legal here
        compiler_params=_compiler_params(
            1, batch_parallel=batch_parallel,
            vmem_limit=(
                _BT8_VMEM if vmem_limit is None and BT >= 8 else vmem_limit
            ),
        ),
        interpret=interpret,
    )(*x_planes, h0, upd_flags, e_rep, e_tile, w_out0, b_out0, w_out1,
      b_out1, *leaves,
      *([mask_flat, node_mask] if has_mask else []))

    e = e_out[:, 0, 0]
    f = -jnp.concatenate([dx0, dx1, dx2], axis=-1)
    if n_real is not None:
        f = f[:, :n_real]
    return e, f
