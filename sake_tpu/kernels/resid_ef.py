"""Residual-saving fused E+F kernels with a HAND-WRITTEN layer backward.

Fourth kernel generation. Generations 1-3 (``fused_ef``, ``depthgrid_ef``,
``fori_ef``) all rematerialize in the backward: each backward step runs
``jax.vjp`` over the layer, whose traced pullback RE-RUNS the layer
forward before applying cotangents — so one E+F evaluation costs ~3x the
forward FLOPs (fwd kernel + re-fwd + cotangents). This file removes the
re-forward:

- The **forward kernel additionally streams compact residuals** to HBM —
  exactly the nonlinearity activations the backward needs (distance ``r``,
  ``exp(-r)``, RBF values, pre-SiLU edge activations, edge features,
  semantic logits, attention weights, tanh outputs, pooled vectors, and
  the small node-level pre-activations). ~1.1 MB/molecule/layer: two
  orders of magnitude less than saving the lax autodiff graph (~80 MB),
  and cheap against HBM bandwidth at the target rates.
- The **backward kernel is the hand-derived pullback** of
  ``depthgrid_ef.layer_forward_wide`` consuming those residuals: input
  cotangents only (parameters are closed over), no forward recompute
  beyond a handful of trivially cheap node-level matmuls (``a_j``/``a_i``)
  and elementwise derivative evaluations. Total E+F cost drops to ~2.2x
  forward FLOPs.

Orchestration is the depth-on-grid pattern of ``depthgrid_ef``: grid
``(B/BT, depth)``, carried state in VMEM scratch, per-(batch, depth)
blocks streamed by BlockSpec index maps (reversed for the backward).

Behavior: ``sake/layers.py:188-235`` + ``sake/models.py:56-61`` (same
math as the lax path; verified against ``jax.vjp`` of the shared forward
in ``tests/test_kernels.py``).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sake_tpu.kernels.depthgrid_ef import (
    _LEAF_NAMES,
    _bspec,
    _compiler_params,
    _dbspec,
    _flag_spec,
    _full_spec,
    _leaf_specs,
    _make_mm_prec,
    wide_stack,
)
from sake_tpu.kernels.functional import EPSILON, INF, ModelParams, _silu
from sake_tpu.kernels.split_ef import head_expansion_matrices


import os as _os

# TIMING-ONLY ablations (SAKE_ABLATE env, comma-separated): replace a
# transcendental with a cheap surrogate to measure its cost share.
# Results are numerically WRONG under ablation — the bench oracle gate
# rejects them by construction; probe via resid-fwd/e-only paths.
_ABLATE = set(
    a for a in _os.environ.get("SAKE_ABLATE", "").split(",") if a
)
if _ABLATE - {"geomfold"}:  # pragma: no cover — geomfold is exact
    import sys as _sys

    print(
        f"WARNING: SAKE_ABLATE={sorted(_ABLATE)} — resid kernels are "
        "numerically WRONG (timing-only ablation mode)",
        file=_sys.stderr,
        flush=True,
    )
_tanh = (lambda x: x * 0.5) if "notanh" in _ABLATE else jnp.tanh
# Block-level ablations (round-4: the "fewer, wider intermediates"
# hypothesis needs per-BLOCK time shares, not per-op-class): each one
# deletes a whole chain of the layer body, so the fwd-only timing delta
# IS that block's cost. noatt = semantic attention (sem matmul, celu,
# softmax, renorm; the (E, 4)-lane narrow ops), nopool = spatial
# coefficient + pooled chains (tanh, u_k, 3 multiply+reduce), nogeom =
# the (E, 1) geometry planes (d0, r, sqrt), nofilt = the rbf filter.
_AB_NOATT = "noatt" in _ABLATE
_AB_NOPOOL = "nopool" in _ABLATE
_AB_NOGEOM = "nogeom" in _ABLATE
_AB_NOFILT = "nofilt" in _ABLATE
# EXACT rewrite probe (unlike the above, numerically identical): fold the
# three (·, 1) geometry planes into ONE (·, 3) lane-tile so d0 / r / u
# build in single VPU ops instead of three. Every (E, 1) plane occupies a
# full 128-lane vreg tile, so each plane op costs ~half an (E, 256) wide
# op — folding removes ~8 such ops per layer forward.
_AB_GEOMFOLD = "geomfold" in _ABLATE
if "nosilu" in _ABLATE:  # shadows the imported _silu (timing-only)
    _silu = lambda x: x * 0.5  # noqa: F811


def _exp(x):
    if "noexp" in _ABLATE:
        return 1.0 + x * 0.1
    return jnp.exp(x)


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def _dsilu(x):
    """d/dx silu(x) = sigmoid(x) * (1 + x * (1 - sigmoid(x)))."""
    s = _sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


# Residual tensors, in kernel-boundary order. Edge residuals are stored
# flattened as (BT, N*N, ch) (leading-dims reshape: layout-free); node
# residuals as (BT, N, ch).
_EDGE_RESIDS = ("r", "t", "rbf", "e0", "h_e", "sem_pre", "att", "coeff")
_NODE_RESIDS = ("pool0", "pool1", "pool2", "ps0", "ps1", "node_pre", "uv",
                "g0", "g1")


def _edge_channels(R, H, K, C):
    return dict(r=1, t=1, rbf=R, e0=H, h_e=H, sem_pre=K, att=K, coeff=C)


# Residuals allowed to round to bf16 when ``resid_dtype=bfloat16``:
# everything EXCEPT the geometry planes (r, t) — (E, 1) slivers whose
# rounding poisons forces (bf16-r pushed f_err from 4.4e-3 to 2.5e-2,
# past the 2x-lax acceptance gate) while saving <1% of the traffic.
# Measured (v5e, batch 2048): this set = 23.5k evals/s at f_err 4.4e-3.
_RESID_LOWP = set(_EDGE_RESIDS + _NODE_RESIDS) - {"r", "t"}


def _resid_dtype_for(name, resid_dtype, lowp=None):
    return resid_dtype if name in (lowp or _RESID_LOWP) else jnp.float32


def _node_channels(lay, C):
    """Node-level residual widths, read off the actual weights."""
    return dict(
        pool0=C, pool1=C, pool2=C,
        ps0=lay.w_post0.shape[-1], ps1=lay.w_post1.shape[-1],
        node_pre=lay.w_node0.shape[-1], uv=lay.w_node1.shape[-1],
        g0=lay.w_vel0.shape[-1], g1=1,
    )


def layer_fwd_resid(p, h, xp, vp, upd, *, e_rep, e_tile, mm, mm_edge=None,
                    n_real=None, mask=None, pool_dtype=None,
                    spat=None, mm_pool=None):
    """Forward of one layer, returning outputs AND the residual dict the
    hand-written backward consumes. Must stay numerically identical to
    ``depthgrid_ef.layer_forward_wide`` (tested); with ``mask`` (a
    ``(BT, N, N, 1)`` edge-mask plane) it matches the MASKED lax layer
    (``functional.layer_forward_planes``): -INF masked logits, attention
    renormalized over surviving senders, masked spatial coefficients, and
    count-based mean divisors — the padded-batch (QM9/ANI/OC20) semantics.
    Atom padding should be folded into ``mask`` by the caller (pad rows
    and columns zeroed), not passed as ``n_real``."""
    BT, N, F = h.shape
    R = p["w_in_j"].shape[-1]
    H = p["w_o_j"].shape[-1]
    if mm_edge is None:
        mm_edge = mm
    n_eff = float(n_real if n_real is not None else N)
    h2d = h.reshape(BT * N, F)

    d0cat = None
    if _AB_GEOMFOLD:
        xcat = jnp.concatenate(xp, axis=-1)  # (BT, N, 3): one lane tile
        d0cat = xcat[:, None, :, :] - xcat[:, :, None, :]  # (BT, N, N, 3)
        d0 = [d0cat[..., k : k + 1] for k in range(3)]
    else:
        d0 = [pk[:, None, :, :] - pk[:, :, None, :] for pk in xp]
    if _AB_NOGEOM:  # pragma: no cover — timing-only
        r = d0[0] * 0.25 + 0.5
    elif _AB_GEOMFOLD:
        r = jnp.sqrt(
            jax.nn.relu((d0cat * d0cat).sum(axis=-1, keepdims=True))
            + EPSILON
        )
    else:
        r = jnp.sqrt(
            jax.nn.relu(
                d0[0] * d0[0] + d0[1] * d0[1] + d0[2] * d0[2]
            ) + EPSILON
        )

    a_j = (mm(h2d, p["w_in_j"]) + p["b_in"]).reshape(BT, N, R)
    a_i = mm(h2d, p["w_in_i"]).reshape(BT, N, R)
    pre = a_j[:, None, :, :] + a_i[:, :, None, :]
    t = _exp(-r)
    if _AB_NOFILT:  # pragma: no cover — timing-only
        rbf = t * p["rbf_b"]
    else:
        rbf = _exp(-p["rbf_b"] * (t - p["rbf_m"]) ** 2)
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

    K = p["w_sem"].shape[-1]
    if _AB_NOATT:  # pragma: no cover — timing-only: whole attention block
        sem_pre = h_e[..., :K] * 1.0
        att = att2 = sem_pre * (1.0 / n_eff)
    else:
        sem_pre = mm_edge(h_e.reshape(BT * N * N, H), p["w_sem"]).reshape(
            BT, N, N, K
        ) + p["b_sem"]
        logits = jnp.where(
            sem_pre > 0, sem_pre, 2.0 * (jnp.exp(sem_pre / 2.0) - 1.0)
        )
        logits = logits - INF * jnp.eye(N, dtype=logits.dtype)[None, :, :, None]
        if mask is not None:
            logits = logits - INF * (1.0 - mask)
        elif n_real is not None and n_real < N:
            pad_sender = (
                jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0) >= n_real
            ).astype(logits.dtype)
            logits = logits - INF * pad_sender[None, None, :, :]
        att = jax.nn.softmax(logits, axis=-2)  # raw softmax: saved residual
        if mask is not None:
            att_s = att * mask
            denom = att_s.sum(axis=-2, keepdims=True)
            att2 = att_s / jnp.where(denom == 0.0, 1.0, denom)
        else:
            att2 = att

    h_e_att = mm_edge(h_e.reshape(BT * N * N, H), e_rep) * mm_edge(
        att2.reshape(BT * N * N, K), e_tile
    )
    HK = h_e_att.shape[-1]
    C = p["w_xmix"].shape[-1]
    if _AB_NOPOOL:  # pragma: no cover — timing-only: coeff+pooled chains
        coeff = h_e_att.reshape(BT, N, N, HK)[..., :C] * 1.0
        inv_r = r
        pooled = [coeff.sum(axis=-2)] * 3
    else:
        coeff = _tanh(mm_edge(h_e_att, p["w_xmix"]).reshape(BT, N, N, C))
        if mask is not None:
            coeff = coeff * mask

        inv_r = 1.0 / (r + 1e-5)
    if _AB_NOPOOL:
        pass
    elif spat is not None:
        # MXU-pooled: pooled_k[b,i,:] = sum_j coeff[b,i,j,:] * u_k[b,i,j]
        # as ONE batched matmul U3T^T @ coeff (row-contraction over the
        # N*N edge sublanes) via the eye-expanded U3T — replaces three
        # full-width (E, C) VPU multiply+reduce chains (the measured
        # round-2 wall).
        U3T = _build_u3t(d0, inv_r, spat, BT, N)
        cflat = coeff.reshape(BT, N * N, C)
        pooled_stack = mm_pool(U3T, cflat, ((1,), (1,)))  # (BT, 3N, C)
        pooled = [
            pooled_stack[:, k * N : (k + 1) * N, :] for k in range(3)
        ]
    elif pool_dtype is not None:
        cp = coeff.astype(pool_dtype)
        pooled = [
            (cp * (d0[k] * inv_r).astype(pool_dtype)).sum(
                axis=-2, dtype=jnp.float32
            )
            for k in range(3)
        ]
    elif _AB_GEOMFOLD:
        ucat = d0cat * inv_r  # one (E, 3) op instead of three (E, 1)
        pooled = [
            (coeff * ucat[..., k : k + 1]).sum(axis=-2) for k in range(3)
        ]
    else:
        pooled = [(coeff * (d0[k] * inv_r)).sum(axis=-2) for k in range(3)]
    if mask is not None:
        count = mask.sum(axis=-2)  # (BT, N, 1)
        norm = [pk / (count + 1e-8) for pk in pooled]
    else:
        norm = [pk / n_eff for pk in pooled]
    pool_sq = norm[0] ** 2 + norm[1] ** 2 + norm[2] ** 2
    ps0 = mm(pool_sq.reshape(BT * N, C), p["w_post0"]) + p["b_post0"]
    ps1 = mm(_silu(ps0), p["w_post1"]) + p["b_post1"]
    h_comb = _silu(ps1)

    hatt_sum = h_e_att.reshape(BT, N, N, HK).sum(axis=-2)
    node_pre = (
        mm(h2d, p["w_node_h"])
        + mm(hatt_sum.reshape(BT * N, HK), p["w_node_agg"])
        + mm(h_comb, p["w_node_comb"])
        + p["b_node0"]
    )
    uv = mm(_silu(node_pre), p["w_node1"]) + p["b_node1"]
    h_out = h + _silu(uv).reshape(BT, N, F)

    dv_denom = (count + 1e-10) if mask is not None else n_eff
    delta = [
        mm(pk.reshape(BT * N, C), p["w_vmix"]).reshape(BT, N, 1) / dv_denom
        for pk in pooled
    ]
    g0 = mm(h_out.reshape(BT * N, F), p["w_vel0"]) + p["b_vel0"]
    g1 = mm(_silu(g0), p["w_vel1"])
    gate = 2.0 * _sigmoid(g1).reshape(BT, N, 1)
    v_new = [gate * vk + dk for vk, dk in zip(vp, delta)]
    x_new = [xk + vk for xk, vk in zip(xp, v_new)]
    xp_out = [xk + upd * (xn - xk) for xk, xn in zip(xp, x_new)]
    vp_out = [vk + upd * (vn - vk) for vk, vn in zip(vp, v_new)]

    e2 = lambda a: a.reshape(BT, N * N, -1)
    resid = dict(
        r=e2(r), t=e2(t), rbf=e2(rbf), e0=e2(e0), h_e=e2(h_e),
        sem_pre=e2(sem_pre), att=e2(att), coeff=e2(coeff),
        pool0=pooled[0], pool1=pooled[1], pool2=pooled[2],
        ps0=ps0.reshape(BT, N, -1), ps1=ps1.reshape(BT, N, -1),
        node_pre=node_pre.reshape(BT, N, -1), uv=uv.reshape(BT, N, -1),
        g0=g0.reshape(BT, N, -1), g1=g1.reshape(BT, N, 1),
    )
    return h_out, xp_out, vp_out, resid


def pool_patterns(N: int):
    """Constant 0/1 selection pattern for the MXU-pooled spatial
    attention (computed in XLA, passed as a kernel input — Pallas rejects
    captured array constants): ``patT (N*N, 3N)`` with
    ``patT[i2*N + j, k*N + i] = delta(i, i2)`` (the same block repeated
    for the three coordinate planes k)."""
    eye = jnp.eye(N, dtype=jnp.float32)
    pat1 = jnp.kron(eye, jnp.ones((1, N), jnp.float32))  # (N, N*N)
    return jnp.tile(pat1.T, (1, 3))  # (N*N, 3N)


def _make_bmm_prec(matmul_dtype, precision):
    """Batched (single leading batch dim) ``dot_general`` with the same
    dtype/precision contract as ``_make_mm_prec``. ``dims`` are the
    (lhs, rhs) contracting dims."""

    def bmm(a, b, dims):
        if matmul_dtype is not None:
            a = a.astype(matmul_dtype)
            b = b.astype(matmul_dtype)
        return jax.lax.dot_general(
            a, b, dimension_numbers=(dims, ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=precision,
        )

    return bmm


def _build_u3t(d0, inv_r, patT, BT, N):
    """Eye-expanded selection tensor in TRANSPOSED form
    ``U3T (BT, N*N, 3N)`` with
    ``U3T[b, i2*N + j, k*N + i] = delta(i, i2) * u_k[b, i2, j]``.

    Built entirely in the u-planes' natural sublane-major layout (the
    edge index stays in sublanes; u values broadcast along lanes into
    their k-block) — no sublane->lane relayout anywhere. The pooled
    contraction then contracts the SUBLANE dim of U3T (the ``a^T @ g``
    row-contraction shape Mosaic lowers exactly).
    """
    NN = N * N
    u_flat = [(dk * inv_r).reshape(BT, NN, 1) for dk in d0]
    ucat = jnp.concatenate(
        [jnp.broadcast_to(uf, (BT, NN, N)) for uf in u_flat], axis=-1
    )  # (BT, N*N, 3N)
    return patT[None] * ucat


def _make_mmt_prec(matmul_dtype, precision):
    """Row-contraction matmul ``a^T @ g`` via ``dot_general`` contracting
    dim 0 of both operands — the weight-gradient shape. No transpose is
    materialized (Mosaic lowers it directly; verified exact on-chip)."""

    def mmt(a, g):
        if matmul_dtype is not None:
            a = a.astype(matmul_dtype)
            g = g.astype(matmul_dtype)
        return jax.lax.dot_general(
            a, g, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

    return mmt


def layer_bwd_resid(p, resid, h_in, xp, vp, upd, d_h_out, d_xp_out,
                    d_vp_out, *, e_rep, e_tile, mm, mm_edge=None,
                    n_real=None, mask=None, mm_t=None, mm_edge_t=None,
                    want_param_grads=False, pool_dtype=None,
                    spat=None, mm_pool=None):
    """Hand-written pullback of ``layer_fwd_resid`` w.r.t. its INPUTS
    ``(h, xp, vp)`` — parameters are closed over (input-only cotangents,
    matching what force evaluation needs). Consumes the residual dict; the
    only recomputed forward values are ``a_j``/``a_i`` (two node-level
    matmuls, needed for the rbf*pre product rule) and elementwise
    derivative evaluations (sigmoids/exp) from saved pre-activations.

    Returns ``(d_h, d_xp, d_vp)`` — or, with ``want_param_grads=True``,
    ``(d_h, d_xp, d_vp, dW)`` where ``dW`` maps every ``_LEAF_NAMES``
    entry to this tile's parameter-gradient contribution (``a^T @ g``
    row-contractions via ``mm_t``/``mm_edge_t``; bias gradients as
    ``(1, dim)`` row sums). Accumulate across tiles/layers outside.
    """
    if mm_t is None:
        mm_t = _make_mmt_prec(None, None)
    if mm_edge_t is None:
        mm_edge_t = mm_t
    BT = xp[0].shape[0]
    N = xp[0].shape[1]
    F = p["w_in_j"].shape[0]
    R = p["w_in_j"].shape[-1]
    H = p["w_o_j"].shape[-1]
    K = p["w_sem"].shape[-1]
    C = p["w_xmix"].shape[-1]
    if mm_edge is None:
        mm_edge = mm
    n_eff = float(n_real if n_real is not None else N)
    E = BT * N * N

    e4 = lambda a: a.reshape(BT, N, N, -1)
    r = e4(resid["r"])
    t = e4(resid["t"])
    rbf = e4(resid["rbf"])
    e0 = e4(resid["e0"])
    h_e = e4(resid["h_e"])
    sem_pre = e4(resid["sem_pre"])
    att = e4(resid["att"])
    coeff = e4(resid["coeff"])
    pooled = [resid["pool0"], resid["pool1"], resid["pool2"]]
    ps0 = resid["ps0"].reshape(BT * N, -1)
    ps1 = resid["ps1"].reshape(BT * N, -1)
    node_pre = resid["node_pre"].reshape(BT * N, -1)
    uv = resid["uv"].reshape(BT * N, -1)
    g0 = resid["g0"].reshape(BT * N, -1)
    g1 = resid["g1"].reshape(BT, N, 1)

    # geometry recompute (cheap, VPU): displacements and units from inputs
    d0cat = None
    if _AB_GEOMFOLD:  # one (·, 3) lane tile instead of three (·, 1) planes
        xcat = jnp.concatenate(xp, axis=-1)
        d0cat = xcat[:, None, :, :] - xcat[:, :, None, :]
        d0 = [d0cat[..., k : k + 1] for k in range(3)]
    else:
        d0 = [pk[:, None, :, :] - pk[:, :, None, :] for pk in xp]
    inv_r = 1.0 / (r + 1e-5)

    # --- EE/DD: position/velocity update gates -----------------------------
    # x_out = x + upd*v_new ; v_out = v + upd*(v_new - v)
    d_v_new = [upd * (dxk + dvk) for dxk, dvk in zip(d_xp_out, d_vp_out)]
    gate = 2.0 * _sigmoid(g1)
    d_gate = sum(dvn * vk for dvn, vk in zip(d_v_new, vp))  # (BT, N, 1)
    d_delta = d_v_new
    d_vp = [
        gate * dvn + (1.0 - upd) * dvk
        for dvn, dvk in zip(d_v_new, d_vp_out)
    ]
    d_xp = [dxk + 0.0 for dxk in d_xp_out]  # direct pass-through term

    # --- CC: gate MLP -------------------------------------------------------
    sig_g1 = _sigmoid(g1)
    d_g1 = (d_gate * 2.0 * sig_g1 * (1.0 - sig_g1)).reshape(BT * N, 1)
    d_sg0 = mm(d_g1, p["w_vel1"].T)
    d_g0 = d_sg0 * _dsilu(g0)
    d_h_out2d = mm(d_g0, p["w_vel0"].T)  # (BT*N, F)

    if mask is not None:
        count = mask.sum(axis=-2)  # (BT, N, 1)
        dv_denom = count + 1e-10
        pool_denom = count + 1e-8
    else:
        dv_denom = pool_denom = None

    # --- BB: delta_k = (pooled_k @ Wv)/denom --------------------------------
    d_pooled = [
        mm(dd.reshape(BT * N, 1), p["w_vmix"].T).reshape(BT, N, C)
        / (dv_denom if mask is not None else n_eff)
        for dd in d_delta
    ]

    # --- AA: h_out = h_in + silu(uv) ----------------------------------------
    dho = d_h_out.reshape(BT * N, F) + d_h_out2d
    d_h2d = dho + 0.0  # d_h_in accumulator (h_out = h_in + ...)
    d_uv = dho * _dsilu(uv)
    d_snp = mm(d_uv, p["w_node1"].T)
    d_node_pre = d_snp * _dsilu(node_pre)

    # --- Z: node_pre = h@Wnh + hatt@Wna + h_comb@Wnc ------------------------
    d_h2d = d_h2d + mm(d_node_pre, p["w_node_h"].T)
    d_hatt = mm(d_node_pre, p["w_node_agg"].T)  # (BT*N, HK)
    d_h_comb = mm(d_node_pre, p["w_node_comb"].T)  # (BT*N, C)

    # --- X/W: post-norm MLP --------------------------------------------------
    d_ps1 = d_h_comb * _dsilu(ps1)
    d_sp0 = mm(d_ps1, p["w_post1"].T)
    d_ps0 = d_sp0 * _dsilu(ps0)
    d_pool_sq = mm(d_ps0, p["w_post0"].T).reshape(BT, N, C)

    # --- V: pool_sq = sum_k (pooled_k/denom)^2 ------------------------------
    pd2 = (
        pool_denom * pool_denom if mask is not None else n_eff * n_eff
    )
    for k in range(3):
        d_pooled[k] = d_pooled[k] + 2.0 * pooled[k] * d_pool_sq / pd2

    # --- U/T: pooled_k = sum_j coeff * u_k ----------------------------------
    if _AB_GEOMFOLD:
        ucat = d0cat * inv_r
        u = [ucat[..., k : k + 1] for k in range(3)]
    else:
        u = [dk * inv_r for dk in d0]
    if spat is not None:
        # MXU pullback of the pooled contraction:
        #   d_coeff = U3T @ d_pooled_stack   (one batched matmul)
        #   d_u via the Gram G = coeff @ d_pooled_stack^T, rows extracted
        #   by the patT selection (cheap (BT, N*N, 3N) mask+reduce).
        NN = N * N
        U3T = _build_u3t(d0, inv_r, spat, BT, N)
        dps = jnp.concatenate(d_pooled, axis=1)  # (BT, 3N, C)
        d_coeff = mm_pool(U3T, dps, ((2,), (1,))).reshape(BT, N, N, C)
        cflat = coeff.reshape(BT, NN, C)
        G = mm_pool(cflat, dps, ((2,), (2,)))  # (BT, N*N, 3N)
        Gp = G * spat[None]
        d_u = [
            Gp[:, :, k * N : (k + 1) * N]
            .sum(axis=-1, keepdims=True)
            .reshape(BT, N, N, 1)
            for k in range(3)
        ]
    elif pool_dtype is not None:
        dpl = [dp.astype(pool_dtype)[:, :, None, :] for dp in d_pooled]
        ul = [uk.astype(pool_dtype) for uk in u]
        cl = coeff.astype(pool_dtype)
        d_coeff = (
            dpl[0] * ul[0] + dpl[1] * ul[1] + dpl[2] * ul[2]
        ).astype(jnp.float32)
        d_u = [
            (cl * dpl[k]).sum(axis=-1, keepdims=True, dtype=jnp.float32)
            for k in range(3)
        ]
    else:
        d_coeff = (
            d_pooled[0][:, :, None, :] * u[0]
            + d_pooled[1][:, :, None, :] * u[1]
            + d_pooled[2][:, :, None, :] * u[2]
        )  # (BT, N, N, C)
        d_u = [
            (coeff * d_pooled[k][:, :, None, :]).sum(axis=-1, keepdims=True)
            for k in range(3)
        ]  # 3 x (BT, N, N, 1)
    if _AB_GEOMFOLD:
        d_ucat = jnp.concatenate(d_u, axis=-1)  # (BT, N, N, 3)
        d_d0cat = d_ucat * inv_r
        d_ir = (d_ucat * d0cat).sum(axis=-1, keepdims=True)
    else:
        d_d0 = [du * inv_r for du in d_u]
        d_ir = d_u[0] * d0[0] + d_u[1] * d0[1] + d_u[2] * d0[2]
    d_r = -(inv_r * inv_r) * d_ir  # from ir = 1/(r + 1e-5)

    # --- S: coeff = tanh(he_att @ Wx) [* mask] ------------------------------
    # saved coeff is the MASKED value; at mask=0 the factor zeroes d_xm, so
    # using (1 - coeff^2) there (=1) is harmless.
    d_xm = d_coeff * (1.0 - coeff * coeff)
    if mask is not None:
        d_xm = d_xm * mask
    d_xm = d_xm.reshape(E, C)
    d_he_att = mm_edge(d_xm, p["w_xmix"].T)  # (E, HK)

    # --- Y: hatt = sum_j he_att (broadcast cotangent over senders) ----------
    HK = d_he_att.shape[-1]
    d_he_att = d_he_att.reshape(BT, N, N, HK) + d_hatt.reshape(
        BT, N, 1, HK
    )

    # --- R/Q: he_att = (h_e@Erep) * (att2@Etile) ----------------------------
    # saved att is the RAW softmax; recompute the masked renormalization
    if mask is not None:
        att_s = att * mask
        denom = att_s.sum(axis=-2, keepdims=True)
        dg = jnp.where(denom == 0.0, 1.0, denom)
        att2 = att_s / dg
    else:
        att2 = att
    heE = mm_edge(h_e.reshape(E, H), e_rep).reshape(BT, N, N, HK)
    attE = mm_edge(att2.reshape(E, K), e_tile).reshape(BT, N, N, HK)
    d_h_e = mm_edge((d_he_att * attE).reshape(E, HK), e_rep.T).reshape(
        BT, N, N, H
    )
    d_att2 = mm_edge((d_he_att * heE).reshape(E, HK), e_tile.T).reshape(
        BT, N, N, K
    )

    # --- renormalization backward (masked): att2 = att*mask / dg ------------
    if mask is not None:
        live = (denom != 0.0).astype(att.dtype)  # grad flows iff denom != 0
        d_att = (
            d_att2 / dg
            - live * (d_att2 * att_s).sum(axis=-2, keepdims=True) / (dg * dg)
        ) * mask
    else:
        d_att = d_att2

    # --- P: softmax over senders j (axis -2) --------------------------------
    d_logits = att * (d_att - (d_att * att).sum(axis=-2, keepdims=True))

    # --- O/N: logits = celu2(sem_pre) (+ additive masks) --------------------
    dcelu = jnp.where(sem_pre > 0, 1.0, jnp.exp(sem_pre / 2.0))
    d_sem_pre = d_logits * dcelu
    d_h_e = d_h_e + mm_edge(d_sem_pre.reshape(E, K), p["w_sem"].T).reshape(
        BT, N, N, H
    )

    # --- M/L: h_e = silu(e0) @ Wo1 ------------------------------------------
    d_se = mm_edge(d_h_e.reshape(E, H), p["w_o1"].T)
    d_e0 = (d_se * _dsilu(e0.reshape(E, H))).reshape(BT, N, N, H)

    # --- K: e0 = o_j[j] + o_i[i] + o_f + r*wor ------------------------------
    d_o_j = d_e0.sum(axis=-3)  # (BT, N, H) at sender index
    d_o_i = d_e0.sum(axis=-2)  # (BT, N, H) at receiver index
    d_r = d_r + (d_e0 * p["w_o_r"][0]).sum(axis=-1, keepdims=True)
    # --- J/H: o_f = (rbf*pre) @ Wof ------------------------------------------
    d_filtered = mm_edge(d_e0.reshape(E, H), p["w_o_f"].T).reshape(
        BT, N, N, R
    )
    # pre = a_j[j] + a_i[i], recomputed from the boundary h_in (two tiny
    # node-level matmuls — the only forward matmuls the backward redoes)
    h2d_in = h_in.reshape(BT * N, F)
    a_j = (mm(h2d_in, p["w_in_j"]) + p["b_in"]).reshape(BT, N, R)
    a_i = mm(h2d_in, p["w_in_i"]).reshape(BT, N, R)
    pre = a_j[:, None, :, :] + a_i[:, :, None, :]
    d_rbf = d_filtered * pre
    d_pre = d_filtered * rbf
    d_a_j = d_pre.sum(axis=-3)  # (BT, N, R)
    d_a_i = d_pre.sum(axis=-2)
    d_h2d = (
        d_h2d
        + mm(d_a_j.reshape(BT * N, R), p["w_in_j"].T)
        + mm(d_a_i.reshape(BT * N, R), p["w_in_i"].T)
        + mm(d_o_j.reshape(BT * N, H), p["w_o_j"].T)
        + mm(d_o_i.reshape(BT * N, H), p["w_o_i"].T)
    )

    # --- E/D: rbf = exp(-b*(t-m)^2), t = exp(-r) ----------------------------
    d_t = (d_rbf * rbf * (-2.0 * p["rbf_b"] * (t - p["rbf_m"]))).sum(
        axis=-1, keepdims=True
    )
    d_r = d_r + (-t) * d_t

    # --- C/B: r = sqrt(relu(s)+eps), s = sum d0^2, d0 = x[j]-x[i] -----------
    relu_s_pos = (r * r > EPSILON).astype(r.dtype)  # relu'(s) as seen by jax
    d_s = d_r * (0.5 / r) * relu_s_pos
    if _AB_GEOMFOLD:
        d_d0cat = d_d0cat + 2.0 * d0cat * d_s
        dsum_j = d_d0cat.sum(axis=-3)  # (BT, N, 3) at sender j
        dsum_i = d_d0cat.sum(axis=-2)  # (BT, N, 3) at receiver i
        for k in range(3):
            # d0[b,i,j] = x[b,j] - x[b,i]
            d_xp[k] = (
                d_xp[k]
                + dsum_j[..., k : k + 1]
                - dsum_i[..., k : k + 1]
            )
    else:
        for k in range(3):
            d_d0[k] = d_d0[k] + 2.0 * d0[k] * d_s
        for k in range(3):
            # d0[b,i,j] = x[b,j] - x[b,i]
            d_xp[k] = (
                d_xp[k]
                + d_d0[k].sum(axis=-3)  # + at sender j
                - d_d0[k].sum(axis=-2)  # - at receiver i
            )

    d_h = d_h2d.reshape(BT, N, F)
    if not want_param_grads:
        return d_h, d_xp, d_vp

    # --- parameter gradients (a^T @ g row-contractions + bias row-sums) ----
    # Shapes mirror the _split_layer leaves exactly. All intermediates are
    # already in scope from the cotangent flow above.
    rsum = lambda a: a.sum(axis=0, keepdims=True)  # (rows, d) -> (1, d)
    h2d = h2d_in
    e2 = lambda a: a.reshape(E, a.shape[-1])
    d_e02 = e2(d_e0)
    d_he2 = e2(d_h_e)
    he_att4 = heE * attE
    he_att2 = he_att4.reshape(E, HK)
    filtered2 = e2(rbf * pre)
    se2 = _silu(e0.reshape(E, H))
    hatt2 = he_att4.sum(axis=-2).reshape(BT * N, HK)
    pq_denom = pool_denom if mask is not None else n_eff
    pool_sq2 = (
        (pooled[0] / pq_denom) ** 2
        + (pooled[1] / pq_denom) ** 2
        + (pooled[2] / pq_denom) ** 2
    ).reshape(BT * N, C)
    h_out2 = h2d + _silu(uv)
    dd_denom = dv_denom if mask is not None else n_eff
    d_delta2 = [
        (dd / dd_denom).reshape(BT * N, 1) for dd in d_delta
    ]
    tm = t - p["rbf_m"]  # (BT, N, N, R)
    d_rbf2 = e2(d_rbf)
    rbf2 = e2(rbf)
    tm2 = e2(tm)

    # The expensive leaves are (a, g) row-contractions a^T @ g. ``mm_pairs``
    # holds the OPERANDS (unreduced); the cheap bias/offset leaves are
    # reduced here either way. ``want_param_grads="pairs"`` returns the
    # operands instead of contracting them — the shared-mode aug backward
    # runs this function under ``jax.jvp`` where only the TANGENT of dW is
    # consumed, so the primal's ~19 per-layer dW matmuls would be computed
    # and discarded; with "pairs", the caller forms just the tangent
    # ``t_a^T @ g + a^T @ t_g`` (the identical ops jax.jvp would emit for
    # the contraction's tangent — bit-for-bit parity) and skips the
    # primal contractions entirely.
    mm_pairs = dict(
        w_in_j=((h2d, d_a_j.reshape(BT * N, R)),),
        w_in_i=((h2d, d_a_i.reshape(BT * N, R)),),
        w_o_j=((h2d, d_o_j.reshape(BT * N, H)),),
        w_o_i=((h2d, d_o_i.reshape(BT * N, H)),),
        w_o_f=((filtered2, d_e02),),
        w_o1=((se2, d_he2),),
        w_sem=((e2(h_e), e2(d_sem_pre)),),
        w_xmix=((he_att2, d_xm),),
        w_post0=((pool_sq2, d_ps0),),
        w_post1=((_silu(ps0), d_ps1),),
        w_node_h=((h2d, d_node_pre),),
        w_node_agg=((hatt2, d_node_pre),),
        w_node_comb=((_silu(ps1), d_node_pre),),
        w_node1=((_silu(node_pre), d_uv),),
        w_vmix=tuple(
            (pooled[k].reshape(BT * N, C), d_delta2[k]) for k in range(3)
        ),
        w_vel0=((h_out2, d_g0),),
        w_vel1=((_silu(g0), d_g1),),
    )
    dW = dict(
        b_in=rsum(d_a_j.reshape(BT * N, R)),
        rbf_m=rsum(d_rbf2 * rbf2 * (2.0 * p["rbf_b"] * tm2)),
        rbf_b=rsum(d_rbf2 * rbf2 * (-(tm2 * tm2))),
        w_o_r=rsum(e2(d_e0 * r)),
        b_o0=rsum(d_e02),
        b_o1=rsum(d_he2),
        b_sem=rsum(e2(d_sem_pre)),
        b_post0=rsum(d_ps0),
        b_post1=rsum(d_ps1),
        b_node0=rsum(d_node_pre),
        b_node1=rsum(d_uv),
        b_vel0=rsum(d_g0),
    )
    if want_param_grads == "pairs":
        return d_h, d_xp, d_vp, dW, mm_pairs
    dW.update(contract_param_pairs(mm_pairs, mm_t, mm_edge_t))
    return d_h, d_xp, d_vp, dW


# Leaves whose row-contraction runs at the EDGE matmul tier (mm_edge_t);
# all other mm_pairs leaves contract with mm_t.
_EDGE_MM_LEAVES = frozenset({"w_o_f", "w_o1", "w_sem", "w_xmix"})


def contract_param_pairs(mm_pairs, mm_t, mm_edge_t):
    """``{name: sum_k a_k^T @ g_k}`` over a ``mm_pairs`` dict from
    ``layer_bwd_resid(want_param_grads="pairs")``."""
    out = {}
    for nm, pairs in mm_pairs.items():
        f = mm_edge_t if nm in _EDGE_MM_LEAVES else mm_t
        acc = f(*pairs[0])
        for a, g in pairs[1:]:
            acc = acc + f(a, g)
        out[nm] = acc
    return out


def contract_param_pair_tangents(mm_pairs, t_mm_pairs, mm_t, mm_edge_t):
    """Tangent of :func:`contract_param_pairs` along ``t_mm_pairs``:
    ``sum_k t_a^T @ g + a^T @ t_g`` — exactly the ops ``jax.jvp`` of the
    contraction would emit, without ever forming the primal ``a^T @ g``."""
    out = {}
    for nm, pairs in mm_pairs.items():
        f = mm_edge_t if nm in _EDGE_MM_LEAVES else mm_t
        acc = None
        for (a, g), (ta, tg) in zip(pairs, t_mm_pairs[nm]):
            term = f(ta, g) + f(a, tg)
            acc = term if acc is None else acc + term
        out[nm] = acc
    return out


def layer_jvp_resid(p, resid, h, xp, vp, th, txp, tvp, upd, *, e_rep,
                    e_tile, mm, mm_edge=None, n_real=None, mask=None):
    """Hand-derived TANGENT-ONLY forward of one layer: propagates the
    tangent state ``(th, txp, tvp)`` through ``layer_fwd_resid``'s map
    using the SAVED primal residuals — none of the expensive primal edge
    matmuls or transcendentals are recomputed (only the node-level
    ``a_j``/``a_i`` and the cheap ``heE``/``attE`` head expansions, the
    same recomputes ``layer_bwd_resid`` makes).

    Returns ``(th2, txp2, tvp2, tresid)`` where ``tresid`` is the exact
    tangent of the residual dict — the inputs the second-order backward's
    Hessian term (``jax.jvp`` of ``layer_bwd_resid``) consumes. Verified
    against ``jax.jvp(layer_fwd_resid)`` in ``tests/test_kernels.py``.
    """
    BT, N, F = h.shape
    R = p["w_in_j"].shape[-1]
    H = p["w_o_j"].shape[-1]
    K = p["w_sem"].shape[-1]
    C = p["w_xmix"].shape[-1]
    if mm_edge is None:
        mm_edge = mm
    n_eff = float(n_real if n_real is not None else N)
    E = BT * N * N

    e4 = lambda a: a.reshape(BT, N, N, -1)
    r = e4(resid["r"])
    t = e4(resid["t"])
    rbf = e4(resid["rbf"])
    e0 = e4(resid["e0"])
    h_e = e4(resid["h_e"])
    sem_pre = e4(resid["sem_pre"])
    att = e4(resid["att"])
    coeff = e4(resid["coeff"])
    pooled = [resid["pool0"], resid["pool1"], resid["pool2"]]
    ps0 = resid["ps0"].reshape(BT * N, -1)
    ps1 = resid["ps1"].reshape(BT * N, -1)
    node_pre = resid["node_pre"].reshape(BT * N, -1)
    uv = resid["uv"].reshape(BT * N, -1)
    g0 = resid["g0"].reshape(BT * N, -1)
    g1 = resid["g1"].reshape(BT, N, 1)

    h2d = h.reshape(BT * N, F)
    th2d = th.reshape(BT * N, F)
    d0cat = td0cat = None
    if _AB_GEOMFOLD:  # (·, 3) lane-tile geometry (see layer_fwd_resid)
        xcat = jnp.concatenate(xp, axis=-1)
        txcat = jnp.concatenate(txp, axis=-1)
        d0cat = xcat[:, None, :, :] - xcat[:, :, None, :]
        td0cat = txcat[:, None, :, :] - txcat[:, :, None, :]
        d0 = [d0cat[..., k : k + 1] for k in range(3)]
        td0 = [td0cat[..., k : k + 1] for k in range(3)]
    else:
        d0 = [pk[:, None, :, :] - pk[:, :, None, :] for pk in xp]
        td0 = [tk[:, None, :, :] - tk[:, :, None, :] for tk in txp]

    # r = sqrt(relu(s) + eps): dr = 0.5/r * relu'(s) * ds
    relu_s_pos = (r * r > EPSILON).astype(r.dtype)
    if _AB_GEOMFOLD:
        t_s = 2.0 * (d0cat * td0cat).sum(axis=-1, keepdims=True)
    else:
        t_s = 2.0 * (d0[0] * td0[0] + d0[1] * td0[1] + d0[2] * td0[2])
    t_r = (0.5 / r) * relu_s_pos * t_s

    # edge model tangents on saved activations
    a_j = (mm(h2d, p["w_in_j"]) + p["b_in"]).reshape(BT, N, R)
    a_i = mm(h2d, p["w_in_i"]).reshape(BT, N, R)
    pre = a_j[:, None, :, :] + a_i[:, :, None, :]
    t_a_j = mm(th2d, p["w_in_j"]).reshape(BT, N, R)
    t_a_i = mm(th2d, p["w_in_i"]).reshape(BT, N, R)
    t_pre = t_a_j[:, None, :, :] + t_a_i[:, :, None, :]
    t_t = -t * t_r
    t_rbf = rbf * (-2.0 * p["rbf_b"] * (t - p["rbf_m"])) * t_t
    t_filtered = t_rbf * pre + rbf * t_pre
    t_o_j = mm(th2d, p["w_o_j"]).reshape(BT, N, H)
    t_o_i = mm(th2d, p["w_o_i"]).reshape(BT, N, H)
    t_o_f = mm_edge(t_filtered.reshape(E, R), p["w_o_f"]).reshape(
        BT, N, N, H
    )
    t_e0 = (
        t_o_j[:, None] + t_o_i[:, :, None] + t_o_f + t_r * p["w_o_r"][0]
    )
    t_se = _dsilu(e0) * t_e0
    t_h_e = mm_edge(t_se.reshape(E, H), p["w_o1"]).reshape(BT, N, N, H)

    t_sem_pre = mm_edge(t_h_e.reshape(E, H), p["w_sem"]).reshape(
        BT, N, N, K
    )
    dcelu = jnp.where(sem_pre > 0, 1.0, jnp.exp(sem_pre / 2.0))
    t_logits = dcelu * t_sem_pre  # additive -INF masks: constant
    # softmax jvp on the saved raw softmax (axis -2)
    t_att = att * (t_logits - (att * t_logits).sum(axis=-2, keepdims=True))
    if mask is not None:
        att_s = att * mask
        t_att_s = t_att * mask
        denom = att_s.sum(axis=-2, keepdims=True)
        dg = jnp.where(denom == 0.0, 1.0, denom)
        att2 = att_s / dg
        t_dg = jnp.where(denom == 0.0, 0.0, t_att_s.sum(axis=-2, keepdims=True))
        t_att2 = (t_att_s - att2 * t_dg) / dg
    else:
        att2 = att
        t_att2 = t_att

    heE = mm_edge(h_e.reshape(E, H), e_rep).reshape(BT, N, N, -1)
    attE = mm_edge(att2.reshape(E, K), e_tile).reshape(BT, N, N, -1)
    HK = heE.shape[-1]
    t_heE = mm_edge(t_h_e.reshape(E, H), e_rep).reshape(BT, N, N, HK)
    t_attE = mm_edge(t_att2.reshape(E, K), e_tile).reshape(BT, N, N, HK)
    t_h_e_att = t_heE * attE + heE * t_attE

    t_xm = mm_edge(t_h_e_att.reshape(E, HK), p["w_xmix"]).reshape(
        BT, N, N, C
    )
    # saved coeff is masked; at mask=0 the (1-coeff^2)=1 error is zeroed
    t_coeff = (1.0 - coeff * coeff) * t_xm
    if mask is not None:
        t_coeff = t_coeff * mask

    inv_r = 1.0 / (r + 1e-5)
    t_inv_r = -(inv_r * inv_r) * t_r
    if _AB_GEOMFOLD:
        ucat = d0cat * inv_r
        t_ucat = td0cat * inv_r + d0cat * t_inv_r
        u = [ucat[..., k : k + 1] for k in range(3)]
        t_u = [t_ucat[..., k : k + 1] for k in range(3)]
    else:
        u = [dk * inv_r for dk in d0]
        t_u = [tk * inv_r + dk * t_inv_r for tk, dk in zip(td0, d0)]
    t_pooled = [
        (t_coeff * u[k] + coeff * t_u[k]).sum(axis=-2) for k in range(3)
    ]
    if mask is not None:
        count = mask.sum(axis=-2)
        pool_denom = count + 1e-8
        dv_denom = count + 1e-10
    else:
        pool_denom = dv_denom = n_eff
    t_pool_sq = sum(
        2.0 * (pooled[k] / pool_denom) * (t_pooled[k] / pool_denom)
        for k in range(3)
    )
    t_ps0 = mm(t_pool_sq.reshape(BT * N, C), p["w_post0"])
    t_ps1 = mm(_dsilu(ps0) * t_ps0, p["w_post1"])
    t_h_comb = _dsilu(ps1) * t_ps1

    t_hatt_sum = t_h_e_att.sum(axis=-2)
    t_node_pre = (
        mm(th2d, p["w_node_h"])
        + mm(t_hatt_sum.reshape(BT * N, HK), p["w_node_agg"])
        + mm(t_h_comb, p["w_node_comb"])
    )
    t_uv = mm(_dsilu(node_pre) * t_node_pre, p["w_node1"])
    t_h_out2d = th2d + _dsilu(uv) * t_uv
    t_h_out = t_h_out2d.reshape(BT, N, F)

    t_delta = [
        mm(t_pooled[k].reshape(BT * N, C), p["w_vmix"]).reshape(BT, N, 1)
        / dv_denom
        for k in range(3)
    ]
    t_g0 = mm(t_h_out2d, p["w_vel0"])
    t_g1 = mm(_dsilu(g0) * t_g0, p["w_vel1"]).reshape(BT, N, 1)
    sig_g1 = _sigmoid(g1)
    gate = 2.0 * sig_g1
    t_gate = 2.0 * sig_g1 * (1.0 - sig_g1) * t_g1
    t_v_new = [
        t_gate * vk + gate * tvk + tdk
        for vk, tvk, tdk in zip(vp, tvp, t_delta)
    ]
    txp_out = [tk + upd * tvn for tk, tvn in zip(txp, t_v_new)]
    tvp_out = [
        tvk + upd * (tvn - tvk) for tvk, tvn in zip(tvp, t_v_new)
    ]

    e2 = lambda a: a.reshape(BT, N * N, -1)
    tresid = dict(
        r=e2(t_r), t=e2(t_t), rbf=e2(t_rbf), e0=e2(t_e0), h_e=e2(t_h_e),
        sem_pre=e2(t_sem_pre), att=e2(t_att), coeff=e2(t_coeff),
        pool0=t_pooled[0], pool1=t_pooled[1], pool2=t_pooled[2],
        ps0=t_ps0.reshape(BT, N, -1), ps1=t_ps1.reshape(BT, N, -1),
        node_pre=t_node_pre.reshape(BT, N, -1),
        uv=t_uv.reshape(BT, N, -1),
        g0=t_g0.reshape(BT, N, -1), g1=t_g1,
    )
    return t_h_out, txp_out, tvp_out, tresid


def resid_energy_forces(
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
    pad_atoms: bool = False,
    chunk: int | None = 512,
    resid_lowp=None,
    pool_dtype=None,
    spatial_mode: str | None = None,
    pool_matmul_dtype=None,
    pool_precision=None,
    batch_parallel: bool = False,
    interpret: bool = False,
):
    """Fused (E, F) evaluation with residual streaming + hand-written
    backward: ``E (B,)``, ``F = -dE/dx (B, N, 3)``.

    ``spatial_mode``: ``None`` keeps the VPU pooled-spatial path;
    ``'mxu'`` routes the pooled contraction AND its pullback through
    batched MXU matmuls (transposed eye-expansion ``U3T``, built without
    any relayout); ``'mxuf'``/``'mxub'`` apply it to only the forward /
    only the backward kernel (A/B isolation).
    ``pool_matmul_dtype``/``pool_precision`` set the tier of those
    matmuls (default: the edge tier, else the node tier).

    ``resid_dtype=jnp.bfloat16`` halves residual HBM traffic (the backward
    evaluates derivative formulas on bf16-rounded activations — error
    comparable to bf16 edge matmuls).

    ``chunk``: residuals for a whole batch do not fit in HBM (~6 MB/eval
    f32: 12.6 GB at batch 2048), so the fwd+readout+bwd pipeline runs per
    batch chunk under ``lax.map`` — only one chunk's residuals are ever
    live. The mapped body is compiled once regardless of chunk count.
    """
    B, N, F_in = h.shape
    n_real = None
    if pad_atoms and N % 8:
        n_real = N
        n_pad = (-N) % 8
        h = jnp.pad(h, ((0, 0), (0, n_pad), (0, 0)))
        x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)))
        if mask is not None:
            # padding rides the mask (zero rows/cols); count-based divisors
            # and the masked readout then handle pad atoms uniformly
            mask = jnp.pad(mask, ((0, 0), (0, n_pad), (0, n_pad)))
        N = N + n_pad
    node_mask = None
    if mask is not None:
        # node mask = self-pair diagonal of the edge mask (m (x) m)
        eyeN = jnp.eye(N, dtype=mask.dtype)
        node_mask = (mask * eyeN).sum(axis=-1)  # (B, N)
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
    sp_consts: list = []
    mm_pool = None
    if spatial_mode is not None:
        if spatial_mode not in ("mxu", "mxuf", "mxub"):
            raise ValueError(f"unknown spatial_mode {spatial_mode!r}")
        pm_dt = pool_matmul_dtype
        pm_pr = pool_precision
        if pm_dt is None and pm_pr is None:
            pm_dt = (
                edge_matmul_dtype
                if edge_matmul_dtype is not None
                else matmul_dtype
            )
            pm_pr = (
                edge_precision if edge_precision is not None else precision
            )
        mm_pool = _make_bmm_prec(pm_dt, pm_pr)
        sp_consts = [pool_patterns(N)]

    h0_full = (
        mm(h.reshape(B * N, F_in), params.w_embed) + params.b_embed
    ).reshape(B, N, F)
    x_planes_full = [x[..., k : k + 1] for k in range(3)]

    def read_p(lrefs):
        return {name: r[0] for name, r in zip(_LEAF_NAMES, lrefs)}

    def _pipeline(h0, x_planes, mask_flat, node_mask_c):
        Bc = h0.shape[0]
        grid = (Bc // BT, depth)
        resid_shapes = [
            ((depth, Bc, N * N, ech[name]), name) for name in _EDGE_RESIDS
        ] + [((depth, Bc, N, nch[name]), name) for name in _NODE_RESIDS]
        n_resid = len(resid_shapes)

        # --- forward kernel -----------------------------------------------------
        has_mask = mask_flat is not None

        n_sp = len(sp_consts)

        def fwd_kernel(*refs):
            x0_ref, x1_ref, x2_ref, h_ref, upd_ref, erep_ref, etile_ref = refs[:7]
            o = 7
            sp_refs = refs[o : o + n_sp]
            o += n_sp
            spat_k = (
                sp_refs[0][:]
                if n_sp and spatial_mode in ("mxu", "mxuf")
                else None
            )
            lrefs = refs[o : o + len(leaves)]
            o = o + len(leaves)
            m4 = None
            if has_mask:
                m4 = refs[o][:].reshape(BT, N, N, 1)
                o = o + 1
            (bh_ref, bx0_ref, bx1_ref, bx2_ref, bv0_ref, bv1_ref, bv2_ref,
             hfin_ref) = refs[o : o + 8]
            rrefs = refs[o + 8 : o + 8 + n_resid]
            sh, sx0, sx1, sx2, sv0, sv1, sv2 = refs[o + 8 + n_resid :]
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
            bh_ref[0] = hc
            for k, (bxr, bvr) in enumerate(
                zip((bx0_ref, bx1_ref, bx2_ref), (bv0_ref, bv1_ref, bv2_ref))
            ):
                bxr[0] = xp[k]
                bvr[0] = vp[k]

            h2, xp2, vp2, resid = layer_fwd_resid(
                read_p(lrefs), hc, xp, vp, upd_ref[d, 0],
                e_rep=erep_ref[:], e_tile=etile_ref[:], mm=mm, mm_edge=mm_edge,
                n_real=None if has_mask else n_real, mask=m4,
                pool_dtype=pool_dtype,
                spat=spat_k, mm_pool=mm_pool,
            )
            for (_, name), rr in zip(resid_shapes, rrefs):
                rr[0] = resid[name].astype(rr.dtype)
            sh[:] = h2
            for k in range(3):
                sx[k][:] = xp2[k]
                sv[k][:] = vp2[k]
            hfin_ref[:] = h2

        plane = jax.ShapeDtypeStruct((Bc, N, 1), jnp.float32)
        bplane = jax.ShapeDtypeStruct((depth, Bc, N, 1), jnp.float32)
        fwd_outs = pl.pallas_call(
            fwd_kernel,
            grid=grid,
            out_shape=tuple(
                [jax.ShapeDtypeStruct((depth, Bc, N, F), jnp.float32)]
                + [bplane] * 6
                + [jax.ShapeDtypeStruct((Bc, N, F), jnp.float32)]
                + [
                jax.ShapeDtypeStruct(
                    s, _resid_dtype_for(nm, resid_dtype, resid_lowp)
                )
                for s, nm in resid_shapes
            ]
            ),
            in_specs=(
                [_bspec((Bc, N, 1), BT)] * 3
                + [_bspec((Bc, N, F), BT), _flag_spec(depth)]
                + [_full_spec(e_rep), _full_spec(e_tile)]
                + [_full_spec(sc) for sc in sp_consts]
                + _leaf_specs(leaves)
                + ([_bspec((Bc, N * N, 1), BT)] if has_mask else [])
            ),
            out_specs=tuple(
                [_dbspec((depth, Bc, N, F), BT)]
                + [_dbspec((depth, Bc, N, 1), BT)] * 6
                + [_bspec((Bc, N, F), BT)]
                + [_dbspec(s, BT) for s, _ in resid_shapes]
            ),
            scratch_shapes=[pltpu.VMEM((BT, N, F), jnp.float32)]
            + [pltpu.VMEM((BT, N, 1), jnp.float32)] * 6,
            compiler_params=_compiler_params(batch_parallel=batch_parallel),
            interpret=interpret,
        )(*x_planes, h0, upd_flags, e_rep, e_tile, *sp_consts, *leaves,
          *([mask_flat] if has_mask else []))
        bh, bx0, bx1, bx2, bv0, bv1, bv2, h_fin = fwd_outs[:8]
        resid_arrays = fwd_outs[8:]

        # --- readout + seed cotangent (XLA) ------------------------------------
        def readout_e(h_):
            out = mm(
                _silu(mm(h_.reshape(Bc * N, F), params.w_out0) + params.b_out0),
                params.w_out1,
            ) + params.b_out1
            out = out.reshape(Bc, N, -1)
            if node_mask_c is not None:
                out = out * node_mask_c[..., None]
            elif n_real is not None:
                out = out[:, :n_real]
            return out.sum(axis=(-2, -1))

        e, readout_vjp = jax.vjp(readout_e, h_fin)
        (dh_fin,) = readout_vjp(jnp.ones_like(e))

        # --- backward kernel: hand-written pullback, reversed depth -------------
        def bwd_kernel(*refs):
            (bh_ref, bx0_ref, bx1_ref, bx2_ref, bv0_ref, bv1_ref, bv2_ref,
             dhf_ref, upd_ref, erep_ref, etile_ref) = refs[:11]
            o = 11
            sp_refs = refs[o : o + n_sp]
            o += n_sp
            spat_k = (
                sp_refs[0][:]
                if n_sp and spatial_mode in ("mxu", "mxub")
                else None
            )
            lrefs = refs[o : o + len(leaves)]
            o = o + len(leaves)
            rrefs = refs[o : o + n_resid]
            o = o + n_resid
            m4 = None
            if has_mask:
                m4 = refs[o][:].reshape(BT, N, N, 1)
                o = o + 1
            dx0_ref, dx1_ref, dx2_ref = refs[o : o + 3]
            sdh, sdx0, sdx1, sdx2, sdv0, sdv1, sdv2 = refs[o + 3 :]
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
            resid = {
                name: rr[0].astype(jnp.float32)
                for (_, name), rr in zip(resid_shapes, rrefs)
            }
            upd = upd_ref[depth - 1 - t, 0]

            dh2, dxp2, dvp2 = layer_bwd_resid(
                read_p(lrefs), resid, h_in, xp_in, vp_in, upd, dh, dxp, dvp,
                e_rep=erep_ref[:], e_tile=etile_ref[:], mm=mm, mm_edge=mm_edge,
                n_real=None if has_mask else n_real, mask=m4,
                pool_dtype=pool_dtype,
                spat=spat_k, mm_pool=mm_pool,
            )
            sdh[:] = dh2
            for k in range(3):
                sdx[k][:] = dxp2[k]
                sdv[k][:] = dvp2[k]
            dx0_ref[:] = dxp2[0]
            dx1_ref[:] = dxp2[1]
            dx2_ref[:] = dxp2[2]

        dx0, dx1, dx2 = pl.pallas_call(
            bwd_kernel,
            grid=grid,
            out_shape=(plane, plane, plane),
            in_specs=(
                [_dbspec((depth, Bc, N, F), BT, rev_depth=depth)]
                + [_dbspec((depth, Bc, N, 1), BT, rev_depth=depth)] * 6
                + [_bspec((Bc, N, F), BT)]
                + [_flag_spec(depth)]
                + [_full_spec(e_rep), _full_spec(e_tile)]
                + [_full_spec(sc) for sc in sp_consts]
                + _leaf_specs(leaves, rev_depth=depth)
                + [_dbspec(s, BT, rev_depth=depth) for s, _ in resid_shapes]
                + ([_bspec((Bc, N * N, 1), BT)] if has_mask else [])
            ),
            out_specs=(_bspec((Bc, N, 1), BT),) * 3,
            scratch_shapes=[pltpu.VMEM((BT, N, F), jnp.float32)]
            + [pltpu.VMEM((BT, N, 1), jnp.float32)] * 6,
            compiler_params=_compiler_params(batch_parallel=batch_parallel),
            interpret=interpret,
        )(bh, bx0, bx1, bx2, bv0, bv1, bv2, dh_fin, upd_flags, e_rep, e_tile,
          *sp_consts, *leaves, *resid_arrays,
          *([mask_flat] if has_mask else []))

        return e, dx0, dx1, dx2

    mask_flat_full = (
        mask.reshape(B, N * N, 1) if mask is not None else None
    )
    if chunk is not None and B > chunk:
        if chunk % BT or B % chunk:
            raise ValueError(
                f"batch {B} not divisible by chunk {chunk} (or chunk by "
                f"batch_tile {BT})"
            )
        nc = B // chunk
        xs = [
            h0_full.reshape(nc, chunk, N, F),
        ] + [p.reshape(nc, chunk, N, 1) for p in x_planes_full]
        if mask is not None:
            xs.append(mask_flat_full.reshape(nc, chunk, N * N, 1))
            xs.append(node_mask.reshape(nc, chunk, N))
            fn = lambda a: _pipeline(a[0], [a[1], a[2], a[3]], a[4], a[5])
        else:
            fn = lambda a: _pipeline(a[0], [a[1], a[2], a[3]], None, None)
        e, dx0, dx1, dx2 = jax.lax.map(fn, tuple(xs))
        e = e.reshape(B)
        dx0, dx1, dx2 = (
            d.reshape(B, N, 1) for d in (dx0, dx1, dx2)
        )
    else:
        e, dx0, dx1, dx2 = _pipeline(
            h0_full, x_planes_full, mask_flat_full, node_mask
        )

    f = -jnp.concatenate([dx0, dx1, dx2], axis=-1)
    if n_real is not None:
        f = f[:, :n_real]
    return e, f


# ---------------------------------------------------------------------------
# Training path: custom-VJP hidden-state function with in-kernel parameter
# gradients. ``make_hidden_fn`` returns ``hidden(params, h, x, mask) ->
# h_fin`` whose backward runs the train kernel: the hand-written pullback
# PLUS per-layer weight-gradient row-contractions accumulated in resident
# VMEM output blocks across all (batch-tile, depth) grid steps. First-order
# only (enough for energy/property losses: QM9/ANI/OC20 training); force-
# loss (second-order) training stays on ``train_ef``.
# ---------------------------------------------------------------------------


def unsplit_layer_grads(g: dict) -> "LayerParams":
    """Inverse of ``_split_layer`` for GRADIENT leaves: reassemble one
    ``LayerParams`` pytree from per-name arrays (depth axis removed)."""
    from sake_tpu.kernels.functional import CFConvParams, LayerParams

    edge = CFConvParams(
        w_in=jnp.concatenate([g["w_in_j"], g["w_in_i"]], axis=0),
        b_in=g["b_in"][0],
        rbf_means=g["rbf_m"][0],
        rbf_betas=g["rbf_b"][0],
        w_out0=jnp.concatenate(
            [g["w_o_j"], g["w_o_i"], g["w_o_f"], g["w_o_r"]], axis=0
        ),
        b_out0=g["b_o0"][0],
        w_out1=g["w_o1"],
        b_out1=g["b_o1"][0],
    )
    return LayerParams(
        edge=edge,
        w_sem=g["w_sem"], b_sem=g["b_sem"][0], w_xmix=g["w_xmix"],
        w_post0=g["w_post0"], b_post0=g["b_post0"][0],
        w_post1=g["w_post1"], b_post1=g["b_post1"][0],
        w_node0=jnp.concatenate(
            [g["w_node_h"], g["w_node_agg"], g["w_node_comb"]], axis=0
        ),
        b_node0=g["b_node0"][0],
        w_node1=g["w_node1"], b_node1=g["b_node1"][0],
        w_vmix=g["w_vmix"], w_vel0=g["w_vel0"], b_vel0=g["b_vel0"][0],
        w_vel1=g["w_vel1"],
    )


def make_hidden_fn(
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
    want_x: bool = False,
    interpret: bool = False,
):
    """Build ``hidden(params: ModelParams, h, x, mask) -> h_fin`` with a
    custom first-order VJP on the Pallas train kernels.

    ``h_fin (B, N, F)`` is the final node representation (positions and
    velocities are folded through the layer stack but not returned —
    energy/property heads consume ``h_fin``). Gradients flow to every
    layer parameter, the embedding, ``h`` and ``x``; readout leaves of
    ``ModelParams`` receive zeros here (they get their cotangents from
    the XLA-side head that uses them). ``mask`` may be None (fixed-size
    batches); its cotangent is zeros. Batch = one chunk: wrap in
    ``lax.map`` + gradient accumulation for big batches (residuals for
    the chunk live in HBM between fwd and bwd).

    ``want_x=True`` returns ``(h_fin, x_out)`` and the VJP accepts
    cotangents on BOTH — the position-forecasting training shape
    (motion / md17_forecast / nbody losses regress the UPDATED
    coordinates, ``scripts/motion/run.py`` / ``scripts/nbody/run.py``,
    so their gradient seeds enter through the x channel, not an energy
    readout).
    """
    BT = batch_tile
    mm = _make_mm_prec(matmul_dtype, precision)
    mm_edge = None
    if edge_matmul_dtype is not None or edge_precision is not None:
        mm_edge = _make_mm_prec(edge_matmul_dtype, edge_precision)
    mm_t = _make_mmt_prec(matmul_dtype, precision)
    mm_edge_t = _make_mmt_prec(
        edge_matmul_dtype if edge_matmul_dtype is not None else matmul_dtype,
        edge_precision if edge_precision is not None else precision,
    )

    def _prep(params, h, x, mask, v=None):
        B, N0, F_in = h.shape
        n_real = None
        if pad_atoms and N0 % 8:
            n_real = N0
            n_pad = (-N0) % 8
            h = jnp.pad(h, ((0, 0), (0, n_pad), (0, 0)))
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)))
            if v is not None:
                v = jnp.pad(v, ((0, 0), (0, n_pad), (0, 0)))
            if mask is not None:
                mask = jnp.pad(mask, ((0, 0), (0, n_pad), (0, n_pad)))
        N = h.shape[1]
        if B % BT:
            raise ValueError(f"batch {B} not divisible by batch_tile {BT}")
        depth = len(params.layers)
        updates = (
            [update] * depth if isinstance(update, bool) else list(update)
        )
        upd_flags = jnp.asarray(updates, jnp.float32).reshape(depth, 1)
        F = params.w_embed.shape[-1]
        lay0 = params.layers[0]
        R = lay0.edge.w_in.shape[-1]
        H = lay0.edge.w_out0.shape[-1]
        C = lay0.w_xmix.shape[-1]
        e_rep, e_tile = head_expansion_matrices(H, n_heads)
        leaves = wide_stack(params, n_heads)
        ech = _edge_channels(R, H, n_heads, C)
        nch = _node_channels(lay0, C)
        resid_shapes = [
            ((depth, B, N * N, ech[nm]), nm) for nm in _EDGE_RESIDS
        ] + [((depth, B, N, nch[nm]), nm) for nm in _NODE_RESIDS]
        h0 = (
            mm(h.reshape(B * N, F_in), params.w_embed) + params.b_embed
        ).reshape(B, N, F)
        x_planes = [x[..., k : k + 1] for k in range(3)]
        v_planes = (
            [v[..., k : k + 1] for k in range(3)] if v is not None else None
        )
        mask_flat = (
            mask.reshape(B, N * N, 1) if mask is not None else None
        )
        return dict(
            B=B, N=N, F=F, F_in=F_in, depth=depth, n_real=n_real,
            upd_flags=upd_flags, e_rep=e_rep, e_tile=e_tile, leaves=leaves,
            resid_shapes=resid_shapes, h0=h0, x_planes=x_planes,
            v_planes=v_planes,
            mask_flat=mask_flat, h_padded=h, grid=(B // BT, depth),
        )

    def _read_p(lrefs):
        return {name: r[0] for name, r in zip(_LEAF_NAMES, lrefs)}

    def _fwd(params, h, x, mask, v=None):
        c = _prep(params, h, x, mask, v)
        B, N, F, depth = c["B"], c["N"], c["F"], c["depth"]
        leaves, resid_shapes = c["leaves"], c["resid_shapes"]
        n_resid = len(resid_shapes)
        has_mask = c["mask_flat"] is not None
        has_v = c["v_planes"] is not None
        layer_n_real = None if has_mask else c["n_real"]

        def fwd_kernel(*refs):
            x0r, x1r, x2r = refs[:3]
            o = 3
            vrs = None
            if has_v:
                vrs = refs[o : o + 3]
                o += 3
            hr, updr, err, etr = refs[o : o + 4]
            o += 4
            lrefs = refs[o : o + len(leaves)]
            o += len(leaves)
            m4 = None
            if has_mask:
                m4 = refs[o][:].reshape(BT, N, N, 1)
                o += 1
            (bh, bx0, bx1, bx2, bv0, bv1, bv2, hfin) = refs[o : o + 8]
            o += 8
            xfins = ()
            if want_x:
                xfins = refs[o : o + 3]
                o += 3
            rrefs = refs[o : o + n_resid]
            sh, sx0, sx1, sx2, sv0, sv1, sv2 = refs[o + n_resid :]
            sx, sv = (sx0, sx1, sx2), (sv0, sv1, sv2)
            d = pl.program_id(1)

            @pl.when(d == 0)
            def _():
                sh[:] = hr[:]
                for k, xr in enumerate((x0r, x1r, x2r)):
                    sx[k][:] = xr[:]
                    sv[k][:] = (
                        vrs[k][:] if has_v else jnp.zeros_like(xr[:])
                    )

            hc = sh[:]
            xp = [sx[k][:] for k in range(3)]
            vp = [sv[k][:] for k in range(3)]
            bh[0] = hc
            for k, (bxr, bvr) in enumerate(
                zip((bx0, bx1, bx2), (bv0, bv1, bv2))
            ):
                bxr[0] = xp[k]
                bvr[0] = vp[k]
            h2, xp2, vp2, resid = layer_fwd_resid(
                _read_p(lrefs), hc, xp, vp, updr[d, 0],
                e_rep=err[:], e_tile=etr[:], mm=mm, mm_edge=mm_edge,
                n_real=layer_n_real, mask=m4,
            )
            for (_, nm), rr in zip(resid_shapes, rrefs):
                rr[0] = resid[nm].astype(rr.dtype)
            sh[:] = h2
            for k in range(3):
                sx[k][:] = xp2[k]
                sv[k][:] = vp2[k]
            hfin[:] = h2
            for k, xfr in enumerate(xfins):
                xfr[:] = xp2[k]

        bplane = jax.ShapeDtypeStruct((depth, B, N, 1), jnp.float32)
        xplane = jax.ShapeDtypeStruct((B, N, 1), jnp.float32)
        outs = pl.pallas_call(
            fwd_kernel,
            grid=c["grid"],
            out_shape=tuple(
                [jax.ShapeDtypeStruct((depth, B, N, F), jnp.float32)]
                + [bplane] * 6
                + [jax.ShapeDtypeStruct((B, N, F), jnp.float32)]
                + ([xplane] * 3 if want_x else [])
                + [
                    jax.ShapeDtypeStruct(
                        sh_, _resid_dtype_for(nm, resid_dtype, resid_lowp)
                    )
                    for sh_, nm in resid_shapes
                ]
            ),
            in_specs=(
                [_bspec((B, N, 1), BT)] * (6 if has_v else 3)
                + [_bspec((B, N, F), BT), _flag_spec(depth)]
                + [_full_spec(c["e_rep"]), _full_spec(c["e_tile"])]
                + _leaf_specs(leaves)
                + ([_bspec((B, N * N, 1), BT)] if has_mask else [])
            ),
            out_specs=tuple(
                [_dbspec((depth, B, N, F), BT)]
                + [_dbspec((depth, B, N, 1), BT)] * 6
                + [_bspec((B, N, F), BT)]
                + ([_bspec((B, N, 1), BT)] * 3 if want_x else [])
                + [_dbspec(sh_, BT) for sh_, _ in resid_shapes]
            ),
            scratch_shapes=[pltpu.VMEM((BT, N, F), jnp.float32)]
            + [pltpu.VMEM((BT, N, 1), jnp.float32)] * 6,
            compiler_params=_compiler_params(),
            interpret=interpret,
        )(*c["x_planes"], *(c["v_planes"] if has_v else ()),
          c["h0"], c["upd_flags"], c["e_rep"], c["e_tile"],
          *leaves, *([c["mask_flat"]] if has_mask else []))
        boundary = outs[:7]
        h_fin = outs[7]
        x_fins = outs[8:11] if want_x else ()
        resid_arrays = outs[8 + 3 * want_x :]
        return c, boundary, h_fin, x_fins, resid_arrays

    def _train_bwd(params, c, boundary, resid_arrays, dh_fin,
                   dx_planes=None, want_dv=False):
        B, N, F, depth = c["B"], c["N"], c["F"], c["depth"]
        leaves, resid_shapes = c["leaves"], c["resid_shapes"]
        n_resid = len(resid_shapes)
        has_mask = c["mask_flat"] is not None
        layer_n_real = None if has_mask else c["n_real"]
        bh, bx0, bx1, bx2, bv0, bv1, bv2 = boundary

        seed_x = dx_planes is not None

        def bwd_kernel(*refs):
            (bhr, bx0r, bx1r, bx2r, bv0r, bv1r, bv2r, dhfr, updr,
             err, etr) = refs[:11]
            o = 11
            dxfrs = ()
            if seed_x:
                dxfrs = refs[o : o + 3]
                o += 3
            lrefs = refs[o : o + len(leaves)]
            o += len(leaves)
            rrefs = refs[o : o + n_resid]
            o += n_resid
            m4 = None
            if has_mask:
                m4 = refs[o][:].reshape(BT, N, N, 1)
                o += 1
            dh0_ref, dx0_ref, dx1_ref, dx2_ref = refs[o : o + 4]
            o += 4
            dvrefs = ()
            if want_dv:
                dvrefs = refs[o : o + 3]
                o += 3
            grefs = refs[o : o + len(leaves)]
            sdh, sdx0, sdx1, sdx2, sdv0, sdv1, sdv2 = refs[
                o + len(leaves) :
            ]
            sdx, sdv = (sdx0, sdx1, sdx2), (sdv0, sdv1, sdv2)

            b = pl.program_id(0)
            t = pl.program_id(1)

            @pl.when(jnp.logical_and(b == 0, t == 0))
            def _():
                for gr in grefs:
                    gr[:] = jnp.zeros_like(gr)

            @pl.when(t == 0)
            def _():
                sdh[:] = dhfr[:]
                zero = jnp.zeros((BT, N, 1), jnp.float32)
                for k in range(3):
                    sdx[k][:] = dxfrs[k][:] if seed_x else zero
                    sdv[k][:] = zero

            dh = sdh[:]
            dxp = [sdx[k][:] for k in range(3)]
            dvp = [sdv[k][:] for k in range(3)]
            h_in = bhr[0]
            xp_in = [r[0] for r in (bx0r, bx1r, bx2r)]
            vp_in = [r[0] for r in (bv0r, bv1r, bv2r)]
            resid = {
                nm: rr[0].astype(jnp.float32)
                for (_, nm), rr in zip(resid_shapes, rrefs)
            }
            i = depth - 1 - t
            upd = updr[i, 0]
            dh2, dxp2, dvp2, dW = layer_bwd_resid(
                _read_p(lrefs), resid, h_in, xp_in, vp_in, upd,
                dh, dxp, dvp,
                e_rep=err[:], e_tile=etr[:], mm=mm, mm_edge=mm_edge,
                n_real=layer_n_real, mask=m4,
                mm_t=mm_t, mm_edge_t=mm_edge_t, want_param_grads=True,
            )
            for nm, gr in zip(_LEAF_NAMES, grefs):
                gr[i] += dW[nm]
            sdh[:] = dh2
            for k in range(3):
                sdx[k][:] = dxp2[k]
                sdv[k][:] = dvp2[k]
            dh0_ref[:] = dh2
            dx0_ref[:] = dxp2[0]
            dx1_ref[:] = dxp2[1]
            dx2_ref[:] = dxp2[2]
            for k, dvr in enumerate(dvrefs):
                dvr[:] = dvp2[k]

        plane = jax.ShapeDtypeStruct((B, N, 1), jnp.float32)
        gspec = [
            pl.BlockSpec(a.shape, (lambda bb, dd, nd=a.ndim: (0,) * nd),
                         memory_space=pltpu.VMEM)
            for a in leaves
        ]
        outs = pl.pallas_call(
            bwd_kernel,
            grid=c["grid"],
            out_shape=tuple(
                [jax.ShapeDtypeStruct((B, N, F), jnp.float32)]
                + [plane] * (6 if want_dv else 3)
                + [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in leaves]
            ),
            in_specs=(
                [_dbspec((depth, B, N, F), BT, rev_depth=depth)]
                + [_dbspec((depth, B, N, 1), BT, rev_depth=depth)] * 6
                + [_bspec((B, N, F), BT)]
                + [_flag_spec(depth)]
                + [_full_spec(c["e_rep"]), _full_spec(c["e_tile"])]
                + ([_bspec((B, N, 1), BT)] * 3 if seed_x else [])
                + _leaf_specs(leaves, rev_depth=depth)
                + [_dbspec(sh_, BT, rev_depth=depth) for sh_, _ in resid_shapes]
                + ([_bspec((B, N * N, 1), BT)] if has_mask else [])
            ),
            out_specs=tuple(
                [_bspec((B, N, F), BT)]
                + [_bspec((B, N, 1), BT)] * (6 if want_dv else 3)
                + gspec
            ),
            scratch_shapes=[pltpu.VMEM((BT, N, F), jnp.float32)]
            + [pltpu.VMEM((BT, N, 1), jnp.float32)] * 6,
            compiler_params=_compiler_params(),
            interpret=interpret,
        )(bh, bx0, bx1, bx2, bv0, bv1, bv2, dh_fin, c["upd_flags"],
          c["e_rep"], c["e_tile"], *(dx_planes if seed_x else ()),
          *leaves, *resid_arrays,
          *([c["mask_flat"]] if has_mask else []))
        dh0 = outs[0]
        dxp = outs[1:4]
        dvp = outs[4:7] if want_dv else None
        leaf_grads = dict(
            zip(_LEAF_NAMES, outs[4 + 3 * want_dv :])
        )
        return dh0, dxp, dvp, leaf_grads

    def _fwd_infer(params, h, x, mask, v=None):
        """Forward WITHOUT residual/boundary streaming — the jitted
        inference path (``jax.jit(forward)`` in the tasks) otherwise pays
        ~1.1 MB/molecule/layer of dead HBM traffic for residuals no
        backward will read."""
        c = _prep(params, h, x, mask, v)
        B, N, F, depth = c["B"], c["N"], c["F"], c["depth"]
        leaves = c["leaves"]
        has_mask = c["mask_flat"] is not None
        has_v = c["v_planes"] is not None
        layer_n_real = None if has_mask else c["n_real"]

        def infer_kernel(*refs):
            x0r, x1r, x2r = refs[:3]
            o = 3
            vrs = None
            if has_v:
                vrs = refs[o : o + 3]
                o += 3
            hr, updr, err, etr = refs[o : o + 4]
            o += 4
            lrefs = refs[o : o + len(leaves)]
            o += len(leaves)
            m4 = None
            if has_mask:
                m4 = refs[o][:].reshape(BT, N, N, 1)
                o += 1
            hfin = refs[o]
            o += 1
            xfins = ()
            if want_x:
                xfins = refs[o : o + 3]
                o += 3
            sh, sx0, sx1, sx2, sv0, sv1, sv2 = refs[o:]
            sx, sv = (sx0, sx1, sx2), (sv0, sv1, sv2)
            d = pl.program_id(1)

            @pl.when(d == 0)
            def _():
                sh[:] = hr[:]
                for k, xr in enumerate((x0r, x1r, x2r)):
                    sx[k][:] = xr[:]
                    sv[k][:] = (
                        vrs[k][:] if has_v else jnp.zeros_like(xr[:])
                    )

            h2, xp2, vp2, _ = layer_fwd_resid(
                _read_p(lrefs), sh[:], [sx[k][:] for k in range(3)],
                [sv[k][:] for k in range(3)], updr[d, 0],
                e_rep=err[:], e_tile=etr[:], mm=mm, mm_edge=mm_edge,
                n_real=layer_n_real, mask=m4,
            )
            sh[:] = h2
            for k in range(3):
                sx[k][:] = xp2[k]
                sv[k][:] = vp2[k]
            hfin[:] = h2
            for k, xfr in enumerate(xfins):
                xfr[:] = xp2[k]

        outs = pl.pallas_call(
            infer_kernel,
            grid=c["grid"],
            out_shape=tuple(
                [jax.ShapeDtypeStruct((B, N, F), jnp.float32)]
                + (
                    [jax.ShapeDtypeStruct((B, N, 1), jnp.float32)] * 3
                    if want_x else []
                )
            ),
            in_specs=(
                [_bspec((B, N, 1), BT)] * (6 if has_v else 3)
                + [_bspec((B, N, F), BT), _flag_spec(depth)]
                + [_full_spec(c["e_rep"]), _full_spec(c["e_tile"])]
                + _leaf_specs(leaves)
                + ([_bspec((B, N * N, 1), BT)] if has_mask else [])
            ),
            out_specs=tuple(
                [_bspec((B, N, F), BT)]
                + ([_bspec((B, N, 1), BT)] * 3 if want_x else [])
            ),
            scratch_shapes=[pltpu.VMEM((BT, N, F), jnp.float32)]
            + [pltpu.VMEM((BT, N, 1), jnp.float32)] * 6,
            compiler_params=_compiler_params(),
            interpret=interpret,
        )(*c["x_planes"], *(c["v_planes"] if has_v else ()),
          c["h0"], c["upd_flags"], c["e_rep"], c["e_tile"],
          *leaves, *([c["mask_flat"]] if has_mask else []))
        n_real = c["n_real"]
        h_fin = outs[0]
        if n_real is not None:
            h_fin = h_fin[:, :n_real]
        if not want_x:
            return h_fin
        x_out = jnp.concatenate(outs[1:4], axis=-1)
        if n_real is not None:
            x_out = x_out[:, :n_real]
        return h_fin, x_out

    @jax.custom_vjp
    def hidden(params, h, x, mask):
        return _fwd_infer(params, h, x, mask)

    @jax.custom_vjp
    def hidden_x(params, h, x, v, mask):
        return _fwd_infer(params, h, x, mask, v)

    def hidden_fwd(params, h, x, mask):
        return _hx_fwd(params, h, x, None, mask)

    def hidden_x_fwd(params, h, x, v, mask):
        return _hx_fwd(params, h, x, v, mask)

    def _hx_fwd(params, h, x, v, mask):
        c, boundary, h_fin, x_fins, resid_arrays = _fwd(
            params, h, x, mask, v
        )
        n_real = c["n_real"]
        out = h_fin[:, :n_real] if n_real is not None else h_fin
        if want_x:
            x_out = jnp.concatenate(x_fins, axis=-1)
            if n_real is not None:
                x_out = x_out[:, :n_real]
            out = (out, x_out)
        # saved must be a pure-array pytree; the (cheap) config dict is
        # re-derived in the backward
        saved = (params, h, x, mask, boundary, resid_arrays)
        if want_x:
            saved = saved + (v,)
        return out, saved

    def hidden_bwd(saved, cots):
        params, h, x, mask, boundary, resid_arrays = saved[:6]
        v = saved[6] if want_x else None
        c = _prep(params, h, x, mask, v)
        B, N, F_in, n_real = c["B"], c["N"], c["F_in"], c["n_real"]
        dx_planes = None
        if want_x:
            dh_fin, dx_out = cots
            if n_real is not None:
                dx_out = jnp.pad(
                    dx_out, ((0, 0), (0, N - n_real), (0, 0))
                )
            dx_planes = [dx_out[..., k : k + 1] for k in range(3)]
        else:
            dh_fin = cots
        if n_real is not None:
            dh_fin = jnp.pad(
                dh_fin, ((0, 0), (0, N - n_real), (0, 0))
            )
        dh0, dxp, dvp, leaf_grads = _train_bwd(
            params, c, boundary, resid_arrays, dh_fin, dx_planes,
            want_dv=v is not None,
        )
        # embedding pullback (XLA): h0 = h @ We + be
        h_pad = c["h_padded"]
        dh0_2d = dh0.reshape(B * N, -1)
        d_we = jax.lax.dot_general(
            h_pad.reshape(B * N, F_in), dh0_2d,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d_be = dh0_2d.sum(axis=0)
        d_h = (dh0_2d @ params.w_embed.T).reshape(B, N, F_in)
        dx = jnp.concatenate(dxp, axis=-1)
        if n_real is not None:
            d_h = d_h[:, :n_real]
            dx = dx[:, :n_real]
        d_layers = tuple(
            unsplit_layer_grads(
                {nm: leaf_grads[nm][i] for nm in _LEAF_NAMES}
            )
            for i in range(c["depth"])
        )
        d_params = ModelParams(
            w_embed=d_we,
            b_embed=d_be,
            layers=d_layers,
            w_out0=jnp.zeros_like(params.w_out0),
            b_out0=jnp.zeros_like(params.b_out0),
            w_out1=jnp.zeros_like(params.w_out1),
            b_out1=jnp.zeros_like(params.b_out1),
        )
        d_mask = None if mask is None else jnp.zeros_like(mask)
        if want_x:
            dv = jnp.concatenate(dvp, axis=-1)
            if n_real is not None:
                dv = dv[:, :n_real]
            return d_params, d_h, dx, dv, d_mask
        return d_params, d_h, dx, d_mask

    if want_x:
        hidden_x.defvjp(hidden_x_fwd, hidden_bwd)
        return hidden_x
    hidden.defvjp(hidden_fwd, hidden_bwd)
    return hidden
