"""Depth-on-grid fused energy+forces Pallas TPU kernels.

Round-2 kernel design. The round-1 whole-model kernel (``fused_ef.py``) put
both the forward and the hand-staged backward ``fori_loop`` in ONE kernel
body — a program large enough to OOM the Mosaic compiler at depth 6 — and
the merged per-layer op paid ~50us per dynamically-sliced chunk iteration.
This file keeps the same math (behavior: ``sake/layers.py:188-235``,
``sake/models.py:56-61``) but restructures the orchestration around the
Pallas grid:

- **Depth is a grid dimension, not a ``fori_loop``.** The grid is
  ``(B/BT, depth)`` with depth innermost; the carried state ``(h, x, v)``
  lives in VMEM scratch (scratch persists across grid steps, the standard
  Pallas carry/reduction pattern). The compiled body is therefore ONE
  layer — an order of magnitude smaller program than round 1's, which
  keeps Mosaic compile time and memory bounded.
- **Boundary states stream via BlockSpec index maps.** The forward writes
  each layer's input state to a ``(depth, B, ...)`` HBM output indexed by
  the grid position; the backward reads them back with a reversed index
  map (``depth-1-t``). Block DMA is double-buffered by the Pallas
  pipeline itself — no in-kernel ``pl.ds`` ref slicing (round 1's 50us/
  chunk trap). Boundary traffic is ~35 KB/eval vs the lax path's ~80 MB.
- **Backward is per-layer rematerialization**: each backward grid step
  re-traces one layer under ``jax.vjp`` (flash-attention style; no O(N^2)
  tensor is ever stored). Cotangents are carried in scratch. Only input
  cotangents are formed (parameters are closed over), so the backward
  costs ~2x the forward FLOPs, not 3x.
- **Wide head formulation**: the attended-edge outer product uses the
  constant 0/1 expansion matmuls of ``split_ef.head_expansion_matrices``
  (Mosaic-lowerable AND vjp-able), giving one K=256 matmul instead of
  four unrolled per-head K=64 matmuls — fewer ops, better MXU shapes.
- **Per-layer ``update`` flags are arithmetic gates** ((depth, 1) array,
  one (1, 1) block per step), keeping the body uniform across layers.

Parameters are pre-split/stacked in XLA (``wide_stack``) so the kernel
body does no weight slicing: every leaf arrives as a ``(depth, ...)``
array whose ``(1, ...)`` block for the current layer is prefetched by the
pipeline.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sake_tpu.kernels.functional import (
    EPSILON,
    INF,
    ModelParams,
    _celu2,
    _silu,
)
from sake_tpu.kernels.split_ef import head_expansion_matrices


def _make_mm_prec(matmul_dtype, precision):
    """In-kernel matmul: optional bf16 input cast (f32 accumulation), and
    an explicit Mosaic precision for the f32 path (the MXU's default f32
    handling is lower-precision than XLA's; HIGHEST restores parity)."""

    def mm(a, w):
        if matmul_dtype is not None:
            a = a.astype(matmul_dtype)
            w = w.astype(matmul_dtype)
        return jnp.dot(
            a, w, preferred_element_type=jnp.float32, precision=precision
        )

    return mm


_VMEM_LIMIT = 100 * 1024 * 1024


def _compiler_params(n_grid_dims: int = 2, batch_parallel: bool = False,
                     vmem_limit: int | None = None):
    """``batch_parallel=True`` marks the leading (batch-tile) grid dim
    ``parallel``: legal whenever the carried scratch state is re-seeded
    at the innermost dim's step 0 (every kernel here does), and it lets
    the Mosaic pipeline overlap DMA across batch-tile boundaries that
    ``arbitrary`` serializes.

    ``vmem_limit`` overrides the default 100M scoped-VMEM budget — the
    heaviest bodies (train2's aug-backward, which streams TWO residual
    sets) sit within ~1% of it; v5e physically has 128M."""
    sem = ("arbitrary",) * n_grid_dims
    if batch_parallel:
        sem = ("parallel",) + sem[1:]
    return pltpu.CompilerParams(
        vmem_limit_bytes=vmem_limit if vmem_limit is not None else
        _VMEM_LIMIT,
        dimension_semantics=sem,
    )


# Order of the per-layer leaves as they cross the kernel boundary.
_LEAF_NAMES = (
    "w_in_j", "w_in_i", "b_in", "rbf_m", "rbf_b",
    "w_o_j", "w_o_i", "w_o_f", "w_o_r", "b_o0", "w_o1", "b_o1",
    "w_sem", "b_sem", "w_xmix",
    "w_post0", "b_post0", "w_post1", "b_post1",
    "w_node_h", "w_node_agg", "w_node_comb", "b_node0", "w_node1", "b_node1",
    "w_vmix", "w_vel0", "b_vel0", "w_vel1",
)


def _split_layer(lp, F: int, n_heads: int) -> dict:
    """Pre-split one ``LayerParams`` into kernel-ready 2D leaves (biases as
    (1, dim) rows; concat-weights split at their segment boundaries)."""
    e = lp.edge
    R = e.w_in.shape[-1]
    H = e.w_out0.shape[-1]
    HK = H * n_heads
    return dict(
        w_in_j=e.w_in[:F], w_in_i=e.w_in[F:], b_in=e.b_in[None],
        rbf_m=e.rbf_means[None], rbf_b=e.rbf_betas[None],
        w_o_j=e.w_out0[:F], w_o_i=e.w_out0[F : 2 * F],
        w_o_f=e.w_out0[2 * F : 2 * F + R],
        w_o_r=e.w_out0[2 * F + R][None], b_o0=e.b_out0[None],
        w_o1=e.w_out1, b_o1=e.b_out1[None],
        w_sem=lp.w_sem, b_sem=lp.b_sem[None], w_xmix=lp.w_xmix,
        w_post0=lp.w_post0, b_post0=lp.b_post0[None],
        w_post1=lp.w_post1, b_post1=lp.b_post1[None],
        w_node_h=lp.w_node0[:F], w_node_agg=lp.w_node0[F : F + HK],
        w_node_comb=lp.w_node0[F + HK :], b_node0=lp.b_node0[None],
        w_node1=lp.w_node1, b_node1=lp.b_node1[None],
        w_vmix=lp.w_vmix, w_vel0=lp.w_vel0, b_vel0=lp.b_vel0[None],
        w_vel1=lp.w_vel1,
    )


def wide_stack(params: ModelParams, n_heads: int):
    """Stack the pre-split per-layer leaves along a leading depth axis,
    returned in ``_LEAF_NAMES`` order."""
    F = params.w_embed.shape[-1]
    per_layer = [_split_layer(lp, F, n_heads) for lp in params.layers]
    return [
        jnp.stack([d[name] for d in per_layer]) for name in _LEAF_NAMES
    ]


def layer_forward_wide(p: dict, h, xp, vp, upd, *, e_rep, e_tile, mm,
                       mm_edge=None, n_real=None):
    """One dense SAKE layer (always-update, gated by ``upd`` in [0, 1]).

    ``h (BT, N, F)``, ``xp``/``vp`` three ``(BT, N, 1)`` planes. Same math
    as ``functional.layer_forward_planes`` (unmasked), with the per-head
    loop replaced by the wide expansion-matmul formulation.

    ``mm_edge``: matmul used for the O(N^2)-row edge-grid contractions
    (o_f, w_o1, semantic, the head expansions, x_mixing) — >95% of the
    layer FLOPs. Running these at a cheaper precision (bf16 inputs) while
    node-level matmuls stay high-precision trades ~2e-3 force error for
    the MXU's full bf16 rate; defaults to ``mm``.

    ``n_real``: when ``N`` is padded to a sublane-aligned size (21 -> 24
    makes every (BT, N, N, .) -> (BT*N*N, .) reshape an aligned, free
    layout change instead of a Mosaic relayout), atoms ``>= n_real`` are
    statically masked out of the attention and all mean divisors use
    ``n_real`` — pad receivers compute garbage no real row ever reads
    (their attention over real senders is fine, and they never send).
    """
    BT, N, F = h.shape
    R = p["w_in_j"].shape[-1]
    H = p["w_o_j"].shape[-1]
    if mm_edge is None:
        mm_edge = mm
    n_eff = float(n_real if n_real is not None else N)
    h2d = h.reshape(BT * N, F)

    d0 = [pk[:, None, :, :] - pk[:, :, None, :] for pk in xp]
    r = jnp.sqrt(jax.nn.relu(d0[0] * d0[0] + d0[1] * d0[1] + d0[2] * d0[2]) + EPSILON)

    # --- edge model (CFConv), node-factorized ---------------------------
    a_j = (mm(h2d, p["w_in_j"]) + p["b_in"]).reshape(BT, N, R)
    a_i = mm(h2d, p["w_in_i"]).reshape(BT, N, R)
    pre = a_j[:, None, :, :] + a_i[:, :, None, :]
    rbf = jnp.exp(-p["rbf_b"] * (jnp.exp(-r) - p["rbf_m"]) ** 2)
    filtered = rbf * pre
    o_j = mm(h2d, p["w_o_j"]).reshape(BT, N, H)
    o_i = mm(h2d, p["w_o_i"]).reshape(BT, N, H)
    o_f = mm_edge(filtered.reshape(BT * N * N, R), p["w_o_f"]).reshape(
        BT, N, N, H
    )
    e0 = o_j[:, None] + o_i[:, :, None] + o_f + r * p["w_o_r"][0] + p["b_o0"]
    h_e = mm_edge(_silu(e0).reshape(BT * N * N, H), p["w_o1"]).reshape(
        BT, N, N, H
    ) + p["b_o1"]

    # --- semantic attention over senders j -------------------------------
    K = p["w_sem"].shape[-1]
    logits = _celu2(
        mm_edge(h_e.reshape(BT * N * N, H), p["w_sem"]).reshape(BT, N, N, K)
        + p["b_sem"]
    )
    logits = logits - INF * jnp.eye(N, dtype=logits.dtype)[None, :, :, None]
    if n_real is not None and n_real < N:
        # integer iota: Mosaic's tpu.iota rejects float result types
        pad_sender = (
            jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0) >= n_real
        ).astype(logits.dtype)
        logits = logits - INF * pad_sender[None, None, :, :]
    att = jax.nn.softmax(logits, axis=-2)

    # --- attended edges, wide (hidden-major/head-minor) ------------------
    h_e_att = mm_edge(h_e.reshape(BT * N * N, H), e_rep) * mm_edge(
        att.reshape(BT * N * N, K), e_tile
    )  # (BT*N*N, H*K)
    HK = h_e_att.shape[-1]
    C = p["w_xmix"].shape[-1]
    coeff = jnp.tanh(mm_edge(h_e_att, p["w_xmix"]).reshape(BT, N, N, C))

    # --- pooled spatial attention (no (N,N,C,3) field) --------------------
    inv_r = 1.0 / (r + 1e-5)
    # pad senders contribute zero: att=0 there => h_e_att=0 => coeff=tanh(0)=0
    pooled = [(coeff * (d0[k] * inv_r)).sum(axis=-2) for k in range(3)]
    norm = [pk / n_eff for pk in pooled]
    pool_sq = norm[0] ** 2 + norm[1] ** 2 + norm[2] ** 2
    h_comb = _silu(
        mm(
            _silu(mm(pool_sq.reshape(BT * N, C), p["w_post0"]) + p["b_post0"]),
            p["w_post1"],
        )
        + p["b_post1"]
    )

    # --- node update ------------------------------------------------------
    hatt_sum = h_e_att.reshape(BT, N, N, HK).sum(axis=-2)
    node_pre = (
        mm(h2d, p["w_node_h"])
        + mm(hatt_sum.reshape(BT * N, HK), p["w_node_agg"])
        + mm(h_comb, p["w_node_comb"])
        + p["b_node0"]
    )
    upd_val = mm(_silu(node_pre), p["w_node1"]) + p["b_node1"]
    h_out = h + _silu(upd_val).reshape(BT, N, F)

    # --- velocity/position update, arithmetically gated -------------------
    delta = [
        mm(pk.reshape(BT * N, C), p["w_vmix"]).reshape(BT, N, 1) / n_eff
        for pk in pooled
    ]
    gate = 2.0 * jax.nn.sigmoid(
        mm(
            _silu(mm(h_out.reshape(BT * N, F), p["w_vel0"]) + p["b_vel0"]),
            p["w_vel1"],
        )
    ).reshape(BT, N, 1)
    # v=None first-update semantics: vp starts at zero, so gate*0+delta.
    v_new = [gate * vk + dk for vk, dk in zip(vp, delta)]
    x_new = [xk + vk for xk, vk in zip(xp, v_new)]
    xp_out = [xk + upd * (xn - xk) for xk, xn in zip(xp, x_new)]
    vp_out = [vk + upd * (vn - vk) for vk, vn in zip(vp, v_new)]
    return h_out, xp_out, vp_out


def _leaf_specs(leaves, rev_depth=None):
    """BlockSpecs for the stacked per-layer leaves: a (1, ...) block at the
    current grid depth (reversed for the backward kernel)."""
    specs = []
    for a in leaves:
        nd = a.ndim

        def imap(b, d, nd=nd):
            i = rev_depth - 1 - d if rev_depth is not None else d
            return (i,) + (0,) * (nd - 1)

        specs.append(
            pl.BlockSpec((1,) + a.shape[1:], imap, memory_space=pltpu.VMEM)
        )
    return specs


def _flag_spec(depth):
    """(depth, 1) scalar flag array, whole-array resident in SMEM; the
    kernel indexes the current layer's flag by ``pl.program_id``."""
    return pl.BlockSpec(
        (depth, 1), lambda b, d: (0, 0), memory_space=pltpu.SMEM
    )


def _full_spec(a):
    return pl.BlockSpec(
        a.shape, lambda b, d, nd=a.ndim: (0,) * nd, memory_space=pltpu.VMEM
    )


def _bspec(shape, bt):
    """(B, ...) array: (BT, ...) block at batch-grid position, all depths."""
    nd = len(shape)
    return pl.BlockSpec(
        (bt,) + shape[1:], lambda b, d, nd=nd: (b,) + (0,) * (nd - 1),
        memory_space=pltpu.VMEM,
    )


def _dbspec(shape, bt, rev_depth=None):
    """(depth, B, ...) boundary array: (1, BT, ...) block at (depth, batch)
    grid position (depth reversed for the backward kernel)."""
    nd = len(shape)

    def imap(b, d, nd=nd):
        i = rev_depth - 1 - d if rev_depth is not None else d
        return (i, b) + (0,) * (nd - 2)

    return pl.BlockSpec((1, bt) + shape[2:], imap, memory_space=pltpu.VMEM)


def depthgrid_energy_forces(
    params: ModelParams,
    h: jax.Array,  # (B, N, F_in)
    x: jax.Array,  # (B, N, 3)
    *,
    n_heads: int = 4,
    update: Sequence[bool] | bool = True,
    batch_tile: int = 8,
    matmul_dtype=None,
    precision=None,
    edge_matmul_dtype=None,
    edge_precision=None,
    interpret: bool = False,
):
    """Fused (E, F) evaluation: ``E (B,)``, ``F = -dE/dx (B, N, 3)``.

    ``matmul_dtype=jnp.bfloat16`` runs in-kernel MXU contractions on bf16
    inputs with f32 accumulation; ``None`` keeps strict f32 (parity mode).
    """
    B, N, F_in = h.shape
    BT = batch_tile
    if B % BT:
        raise ValueError(f"batch {B} not divisible by batch_tile {BT}")
    depth = len(params.layers)
    updates = [update] * depth if isinstance(update, bool) else list(update)
    upd_flags = jnp.asarray(updates, jnp.float32).reshape(depth, 1)
    F = params.w_embed.shape[-1]
    H = params.layers[0].edge.w_out0.shape[-1]
    K = n_heads
    mm = _make_mm_prec(matmul_dtype, precision)
    mm_edge = None
    if edge_matmul_dtype is not None or edge_precision is not None:
        mm_edge = _make_mm_prec(edge_matmul_dtype, edge_precision)
    e_rep, e_tile = head_expansion_matrices(H, K)
    leaves = wide_stack(params, n_heads)
    grid = (B // BT, depth)

    # --- embed (XLA) ------------------------------------------------------
    h0 = (mm(h.reshape(B * N, F_in), params.w_embed) + params.b_embed).reshape(
        B, N, F
    )
    x_planes = [x[..., k : k + 1] for k in range(3)]

    def read_p(lrefs):
        return {name: r[0] for name, r in zip(_LEAF_NAMES, lrefs)}

    # --- forward kernel ----------------------------------------------------
    def fwd_kernel(*refs):
        x0_ref, x1_ref, x2_ref, h_ref, upd_ref, erep_ref, etile_ref = refs[:7]
        lrefs = refs[7 : 7 + len(leaves)]
        (bh_ref, bx0_ref, bx1_ref, bx2_ref, bv0_ref, bv1_ref, bv2_ref,
         hfin_ref) = refs[7 + len(leaves) : 15 + len(leaves)]
        sh, sx0, sx1, sx2, sv0, sv1, sv2 = refs[15 + len(leaves) :]
        sx, sv = (sx0, sx1, sx2), (sv0, sv1, sv2)

        d = pl.program_id(1)

        @pl.when(d == 0)
        def _():
            sh[:] = h_ref[:]
            for k, xr in enumerate((x0_ref, x1_ref, x2_ref)):
                sx[k][:] = xr[:]
                sv[k][:] = jnp.zeros_like(xr[:])

        hc = sh[:]
        xp = [sx[k][:] for k in range(3)]
        vp = [sv[k][:] for k in range(3)]
        # boundary (layer-input) states for the backward remat
        bh_ref[0] = hc
        for k, (bxr, bvr) in enumerate(
            zip((bx0_ref, bx1_ref, bx2_ref), (bv0_ref, bv1_ref, bv2_ref))
        ):
            bxr[0] = xp[k]
            bvr[0] = vp[k]

        h2, xp2, vp2 = layer_forward_wide(
            read_p(lrefs), hc, xp, vp, upd_ref[d, 0],
            e_rep=erep_ref[:], e_tile=etile_ref[:], mm=mm, mm_edge=mm_edge,
        )
        sh[:] = h2
        for k in range(3):
            sx[k][:] = xp2[k]
            sv[k][:] = vp2[k]
        hfin_ref[:] = h2  # last depth step's write survives

    plane = jax.ShapeDtypeStruct((B, N, 1), jnp.float32)
    bplane = jax.ShapeDtypeStruct((depth, B, N, 1), jnp.float32)
    fwd_outs = pl.pallas_call(
        fwd_kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((depth, B, N, F), jnp.float32),
            bplane, bplane, bplane, bplane, bplane, bplane,
            jax.ShapeDtypeStruct((B, N, F), jnp.float32),
        ),
        in_specs=(
            [_bspec((B, N, 1), BT)] * 3
            + [_bspec((B, N, F), BT), _flag_spec(depth)]
            + [_full_spec(e_rep), _full_spec(e_tile)]
            + _leaf_specs(leaves)
        ),
        out_specs=(
            (_dbspec((depth, B, N, F), BT),)
            + (_dbspec((depth, B, N, 1), BT),) * 6
            + (_bspec((B, N, F), BT),)
        ),
        scratch_shapes=[pltpu.VMEM((BT, N, F), jnp.float32)]
        + [pltpu.VMEM((BT, N, 1), jnp.float32)] * 6,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(*x_planes, h0, upd_flags, e_rep, e_tile, *leaves)
    bh, bx0, bx1, bx2, bv0, bv1, bv2, h_fin = fwd_outs

    # --- readout + seed cotangent (XLA) ------------------------------------
    def readout_e(h_):
        out = mm(
            _silu(mm(h_.reshape(B * N, F), params.w_out0) + params.b_out0),
            params.w_out1,
        ) + params.b_out1
        return out.reshape(B, N, -1).sum(axis=(-2, -1))

    e, readout_vjp = jax.vjp(readout_e, h_fin)
    (dh_fin,) = readout_vjp(jnp.ones_like(e))

    # --- backward kernel: per-layer remat, reversed depth -------------------
    def bwd_kernel(*refs):
        (bh_ref, bx0_ref, bx1_ref, bx2_ref, bv0_ref, bv1_ref, bv2_ref,
         dhf_ref, upd_ref, erep_ref, etile_ref) = refs[:11]
        lrefs = refs[11 : 11 + len(leaves)]
        dx0_ref, dx1_ref, dx2_ref = refs[
            11 + len(leaves) : 14 + len(leaves)
        ]
        sdh, sdx0, sdx1, sdx2, sdv0, sdv1, sdv2 = refs[14 + len(leaves) :]
        sdx, sdv = (sdx0, sdx1, sdx2), (sdv0, sdv1, sdv2)

        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            sdh[:] = dhf_ref[:]
            zero = jnp.zeros((BT, N, 1), jnp.float32)
            for k in range(3):
                sdx[k][:] = zero
                sdv[k][:] = zero

        dh = sdh[:]
        dxp = [sdx[k][:] for k in range(3)]
        dvp = [sdv[k][:] for k in range(3)]

        h_in = bh_ref[0]
        xp_in = [r[0] for r in (bx0_ref, bx1_ref, bx2_ref)]
        vp_in = [r[0] for r in (bv0_ref, bv1_ref, bv2_ref)]
        p = read_p(lrefs)
        upd = upd_ref[depth - 1 - t, 0]

        def f(h_, xp_, vp_):
            h2, xp2, vp2 = layer_forward_wide(
                p, h_, xp_, vp_, upd,
                e_rep=erep_ref[:], e_tile=etile_ref[:], mm=mm, mm_edge=mm_edge,
            )
            return h2, list(xp2), list(vp2)

        _, vjp = jax.vjp(f, h_in, xp_in, vp_in)
        dh2, dxp2, dvp2 = vjp((dh, dxp, dvp))
        sdh[:] = dh2
        for k in range(3):
            sdx[k][:] = dxp2[k]
            sdv[k][:] = dvp2[k]
        # x cotangent is complete after layer 0 (embedding consumes only h);
        # last depth step's write survives.
        dx0_ref[:] = dxp2[0]
        dx1_ref[:] = dxp2[1]
        dx2_ref[:] = dxp2[2]

    dx0, dx1, dx2 = pl.pallas_call(
        bwd_kernel,
        grid=grid,
        out_shape=(plane, plane, plane),
        in_specs=(
            [_dbspec((depth, B, N, F), BT, rev_depth=depth)]
            + [_dbspec((depth, B, N, 1), BT, rev_depth=depth)] * 6
            + [_bspec((B, N, F), BT)]
            + [_flag_spec(depth)]
            + [_full_spec(e_rep), _full_spec(e_tile)]
            + _leaf_specs(leaves, rev_depth=depth)
        ),
        out_specs=(_bspec((B, N, 1), BT),) * 3,
        scratch_shapes=[pltpu.VMEM((BT, N, F), jnp.float32)]
        + [pltpu.VMEM((BT, N, 1), jnp.float32)] * 6,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(bh, bx0, bx1, bx2, bv0, bv1, bv2, dh_fin, upd_flags, e_rep, e_tile,
      *leaves)

    f = -jnp.concatenate([dx0, dx1, dx2], axis=-1)
    return e, f
