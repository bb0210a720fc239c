"""Pallas edge kernels for the cutoff-sparse path: O(N·K) work at
kernel-fused memory traffic (VERDICT r3 item 2).

``sake_tpu.sparse`` runs the SAKE layer on gathered (B, N, K)
neighborhoods in pure lax; measured on-chip the XLA program streams every
(E, 256)-wide edge intermediate through HBM (the same wall that made the
dense lax path 20x memory-bound). This module fuses the ENTIRE per-layer
edge chain — rbf → CFConv filter → h_e → semantic attention (softmax +
mask renormalization over the K neighbor axis) → head expansion → spatial
coefficients → pooled reductions — into one Pallas kernel per layer:

- the edge grid lives only in VMEM; HBM sees the gathered INPUTS
  (pre (E, R), oji (E, H), three (E, 1) displacement planes, the mask)
  and the per-receiver OUTPUTS (3 pooled (N, C) planes + the (N, HK)
  attention-aggregated features);
- gathers/scatters and the node-level matmuls stay in XLA (tiny at
  O(N·ch), and XLA's gather/transposed-scatter lowering is already
  tuned); the kernel boundary is exactly the O(N·K·ch) edge work;
- the backward is a second kernel that RECOMPUTES the edge chain from
  the saved inputs and applies the hand-written pullback (the
  ``resid_ef.layer_bwd_resid`` recipe restricted to the edge scope) —
  zero residual HBM traffic, ~2.2x forward cost;
- the layer loop is a ``lax.scan`` over depth-stacked leaves (one trace,
  one Mosaic compile regardless of depth — the round-1 lesson).

Differentiation contract: the edge op's ``custom_vjp`` produces INPUT
cotangents only (what force evaluation ``F = -dE/dx`` consumes); its
parameter cotangents are ZERO. ``make_sparse_kernel_energy_forces``
is therefore the supported entry point — for *training* on the sparse
path use ``sake_tpu.sparse`` (lax autodiff, exact param grads).

Numerics match ``sparse.sparse_model_forward`` (same masked-dense
semantics: −INF logits, renormalized attention, count-based divisors),
which in turn equals the masked dense oracle (tested); the per-head
mixing loop is replaced by the dense kernels' ``e_rep``/``e_tile``
expansion matmuls (equivalent, tested). Reference behavior:
``/root/reference/sake/layers.py:188-235`` (the reference's own sparse
layer is vestigial/broken — ``sake/layers.py:266-409``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

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
from sake_tpu.kernels.functional import EPSILON, INF, ModelParams, _silu
from sake_tpu.kernels.resid_ef import _make_mmt_prec
from sake_tpu.kernels.split_ef import head_expansion_matrices


def _dsilu(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


# Per-program compile options REQUIRED when jitting a sparse TRAINING
# graph (``param_grads=True`` under ``jax.grad``): inside the depth
# scan's transposed body, XLA promotes the backward pallas call's result
# tuple (d_h_g + the dW leaves) into scoped vmem, and past the default
# 16M limit the compile fails with "Ran out of memory in memory space
# vmem ... It should not be possible to run out of scoped vmem" instead
# of falling back to HBM. Raising the per-program limit is the supported
# knob — pass ``jax.jit(fn, compiler_options=SPARSE_TRAIN_COMPILER_OPTIONS)``
# (options are forwarded to the device-side compile; evaluation/MD
# graphs don't need it). Measured on-chip 2026-08-20 at N=512 (33.67M
# scoped) and N=4096.
SPARSE_TRAIN_COMPILER_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": "65536"}


# leaves the edge kernel consumes (in _LEAF_NAMES order, filtered).
# w_in_j / w_o_j are applied to the GATHERED h inside the kernel: h is
# gathered once per layer ((E, F) traffic) instead of gathering the two
# projected arrays ((E, R) + (E, H)) — measured on-chip, the XLA
# gather/scatter glue was the wall (37 ms of a 50 ms fwd at N=4096), and
# the j-side projections are ~free MXU work in-kernel.
_EDGE_LEAVES = (
    "w_in_j", "w_o_j", "rbf_m", "rbf_b", "w_o_f", "w_o_r", "w_o1", "b_o1",
    "w_sem", "b_sem", "w_xmix",
)


def _row_spec(shape, bn):
    """(NR, ...) array blocked to (bn, ...) along the receiver-row axis."""
    nd = len(shape)
    return pl.BlockSpec(
        (bn,) + shape[1:], lambda i, nd=nd: (i,) + (0,) * (nd - 1),
        memory_space=pltpu.VMEM,
    )


def _const_spec(a):
    return pl.BlockSpec(
        a.shape, lambda i, nd=a.ndim: (0,) * nd, memory_space=pltpu.VMEM
    )


def _edge_chain(h_g, a_i, o_i, d0, m, ep, mm_e):
    """The per-edge forward chain on one (BN, K, ·) receiver block.
    Returns the pooled outputs and every intermediate the pullback needs.
    Must match ``sparse.sparse_layer_forward``'s edge scope exactly.

    ``h_g (BN, K, F)`` gathered sender features; ``a_i (BN, R)`` /
    ``o_i (BN, H)`` receiver-side projections (biases folded in)."""
    BN, K, F = h_g.shape
    R = a_i.shape[-1]
    H = o_i.shape[-1]
    E2 = BN * K

    h_g2 = h_g.reshape(E2, F)
    pre = mm_e(h_g2, ep["w_in_j"]).reshape(BN, K, R) + a_i[:, None, :]
    oji = mm_e(h_g2, ep["w_o_j"]).reshape(BN, K, H) + o_i[:, None, :]

    r = jnp.sqrt(
        jax.nn.relu(d0[0] * d0[0] + d0[1] * d0[1] + d0[2] * d0[2]) + EPSILON
    )  # (BN, K, 1)
    t = jnp.exp(-r)
    rbf = jnp.exp(-ep["rbf_b"] * (t - ep["rbf_m"]) ** 2)  # (BN, K, R)
    filtered = rbf * pre
    o_f = mm_e(filtered.reshape(E2, R), ep["w_o_f"]).reshape(BN, K, H)
    e0 = oji + o_f + r * ep["w_o_r"][0]
    h_e = mm_e(_silu(e0).reshape(E2, H), ep["w_o1"]).reshape(
        BN, K, H
    ) + ep["b_o1"]

    Kh = ep["w_sem"].shape[-1]
    sem_pre = mm_e(h_e.reshape(E2, H), ep["w_sem"]).reshape(
        BN, K, Kh
    ) + ep["b_sem"]
    logits = jnp.where(
        sem_pre > 0, sem_pre, 2.0 * (jnp.exp(sem_pre / 2.0) - 1.0)
    )
    logits = logits - INF * (1.0 - m)
    att = jax.nn.softmax(logits, axis=-2)
    att_s = att * m
    denom = att_s.sum(axis=-2, keepdims=True)
    dg = jnp.where(denom == 0.0, 1.0, denom)
    att2 = att_s / dg

    heE = mm_e(h_e.reshape(E2, H), ep["e_rep"])
    attE = mm_e(att2.reshape(E2, Kh), ep["e_tile"])
    he_att = heE * attE  # (E2, HK)
    HK = he_att.shape[-1]
    C = ep["w_xmix"].shape[-1]
    tanh_v = jnp.tanh(
        mm_e(he_att, ep["w_xmix"]).reshape(BN, K, C)
    )
    coeff = tanh_v * m

    inv_r = 1.0 / (r + 1e-5)
    u = [dk * inv_r for dk in d0]
    pooled = [(coeff * u[k]).sum(axis=-2) for k in range(3)]  # (BN, C)
    hatt = he_att.reshape(BN, K, HK).sum(axis=-2)  # (BN, HK)
    return dict(
        pre=pre, oji=oji,
        r=r, t=t, rbf=rbf, e0=e0, h_e=h_e, sem_pre=sem_pre, att=att,
        att_s=att_s, denom=denom, dg=dg, att2=att2, heE=heE, attE=attE,
        he_att=he_att, tanh_v=tanh_v, coeff=coeff, inv_r=inv_r, u=u,
        pooled=pooled, hatt=hatt,
    )


def _edge_pullback(h_g, d0, m, ep, mm_e, f, g_pooled, g_hatt, mmt=None):
    """Hand-written pullback of ``_edge_chain`` w.r.t.
    (h_g, a_i, o_i, d0): the ``layer_bwd_resid`` recipe restricted to
    the edge scope, driven by recomputed intermediates ``f``.

    With ``mmt`` (a row-contraction matmul, ``_make_mmt_prec``) the
    pullback ALSO returns the edge-scope parameter gradients ``dW`` —
    ``a^T @ g`` row-contractions + bias row-sums over the block's E2
    edge rows, in ``_EDGE_LEAVES`` order/shapes — the ``layer_bwd_resid
    (want_param_grads=True)`` recipe restricted to the edge scope. This
    is what makes the sparse path TRAINABLE at kernel speed (round-5:
    first-order in-kernel dW for the gathered (E, K) layout)."""
    BN, K, F = h_g.shape
    pre, oji = f["pre"], f["oji"]
    R = pre.shape[-1]
    H = oji.shape[-1]
    E2 = BN * K
    Kh = ep["w_sem"].shape[-1]
    C = ep["w_xmix"].shape[-1]
    HK = f["he_att"].shape[-1]

    # pooled_k = sum_K coeff * u_k ; hatt = sum_K he_att
    d_coeff = (
        g_pooled[0][:, None, :] * f["u"][0]
        + g_pooled[1][:, None, :] * f["u"][1]
        + g_pooled[2][:, None, :] * f["u"][2]
    )  # (BN, K, C)
    d_u = [
        (f["coeff"] * g_pooled[k][:, None, :]).sum(axis=-1, keepdims=True)
        for k in range(3)
    ]

    # coeff = tanh(xm) * m
    d_xm = d_coeff * m * (1.0 - f["tanh_v"] * f["tanh_v"])
    d_he_att = mm_e(d_xm.reshape(E2, C), ep["w_xmix"].T) + jnp.broadcast_to(
        g_hatt[:, None, :], (BN, K, HK)
    ).reshape(E2, HK)

    # he_att = (h_e @ e_rep) * (att2 @ e_tile)
    d_h_e = mm_e(d_he_att * f["attE"], ep["e_rep"].T).reshape(BN, K, H)
    d_att2 = mm_e(d_he_att * f["heE"], ep["e_tile"].T).reshape(BN, K, Kh)

    # att2 = att*m / dg renormalization
    live = (f["denom"] != 0.0).astype(d_att2.dtype)
    d_att = (
        d_att2 / f["dg"]
        - live
        * (d_att2 * f["att_s"]).sum(axis=-2, keepdims=True)
        / (f["dg"] * f["dg"])
    ) * m

    # softmax over the K neighbor axis
    att = f["att"]
    d_logits = att * (d_att - (d_att * att).sum(axis=-2, keepdims=True))

    # logits = celu2(sem_pre) + additive mask (const)
    dcelu = jnp.where(
        f["sem_pre"] > 0, 1.0, jnp.exp(f["sem_pre"] / 2.0)
    )
    d_sem = d_logits * dcelu
    d_h_e = d_h_e + mm_e(d_sem.reshape(E2, Kh), ep["w_sem"].T).reshape(
        BN, K, H
    )

    # h_e = silu(e0) @ w_o1 + b_o1
    d_se = mm_e(d_h_e.reshape(E2, H), ep["w_o1"].T)
    d_e0 = (d_se * _dsilu(f["e0"].reshape(E2, H))).reshape(BN, K, H)

    # e0 = oji + o_f + r * w_o_r
    d_oji = d_e0
    d_r = (d_e0 * ep["w_o_r"][0]).sum(axis=-1, keepdims=True)

    # o_f = (rbf * pre) @ w_o_f
    d_filtered = mm_e(d_e0.reshape(E2, H), ep["w_o_f"].T).reshape(BN, K, R)
    d_rbf = d_filtered * pre
    d_pre = d_filtered * f["rbf"]

    # rbf = exp(-b (t - m)^2), t = exp(-r)
    d_t = (
        d_rbf * f["rbf"] * (-2.0 * ep["rbf_b"] * (f["t"] - ep["rbf_m"]))
    ).sum(axis=-1, keepdims=True)
    d_r = d_r + (-f["t"]) * d_t

    # u_k = d0_k * inv_r, inv_r = 1/(r + 1e-5)
    inv_r = f["inv_r"]
    d_d0 = [d_u[k] * inv_r for k in range(3)]
    d_ir = d_u[0] * d0[0] + d_u[1] * d0[1] + d_u[2] * d0[2]
    d_r = d_r - (inv_r * inv_r) * d_ir

    # r = sqrt(relu(s) + eps), s = sum d0^2
    r = f["r"]
    pos = (r * r > EPSILON).astype(r.dtype)
    d_s = d_r * (0.5 / r) * pos
    for k in range(3):
        d_d0[k] = d_d0[k] + 2.0 * d0[k] * d_s

    # pre = h_g@w_in_j + a_i ; oji = h_g@w_o_j + o_i
    d_a_i = d_pre.sum(axis=-2)  # (BN, R)
    d_o_i = d_oji.sum(axis=-2)  # (BN, H)
    d_h_g = (
        mm_e(d_pre.reshape(E2, R), ep["w_in_j"].T)
        + mm_e(d_oji.reshape(E2, H), ep["w_o_j"].T)
    ).reshape(BN, K, F)
    if mmt is None:
        return d_h_g, d_a_i, d_o_i, d_d0, None

    # --- edge-scope parameter gradients (shapes == the _EDGE_LEAVES) ----
    rsum = lambda a: a.sum(axis=0, keepdims=True)  # (rows, d) -> (1, d)
    h_g2 = h_g.reshape(E2, F)
    d_pre2 = d_pre.reshape(E2, R)
    d_oji2 = d_oji.reshape(E2, H)
    d_e02 = d_e0.reshape(E2, H)
    d_he2 = d_h_e.reshape(E2, H)
    d_sem2 = d_sem.reshape(E2, Kh)
    tm = f["t"] - ep["rbf_m"]  # (BN, K, R)
    d_rbf2 = d_rbf.reshape(E2, R)
    rbf2 = f["rbf"].reshape(E2, R)
    tm2 = tm.reshape(E2, R)
    dW = dict(
        w_in_j=mmt(h_g2, d_pre2),
        w_o_j=mmt(h_g2, d_oji2),
        rbf_m=rsum(d_rbf2 * rbf2 * (2.0 * ep["rbf_b"] * tm2)),
        rbf_b=rsum(d_rbf2 * rbf2 * (-(tm2 * tm2))),
        w_o_f=mmt((f["rbf"] * pre).reshape(E2, R), d_e02),
        w_o_r=rsum((d_e0 * f["r"]).reshape(E2, H)),
        w_o1=mmt(_silu(f["e0"]).reshape(E2, H), d_he2),
        b_o1=rsum(d_he2),
        w_sem=mmt(f["h_e"].reshape(E2, H), d_sem2),
        b_sem=rsum(d_sem2),
        w_xmix=mmt(f["he_att"], d_xm.reshape(E2, C)),
    )
    return d_h_g, d_a_i, d_o_i, d_d0, dW


def _make_edge_op(
    BN: int,
    edge_matmul_dtype=None,
    edge_precision=None,
    interpret: bool = False,
    vmem_limit: int | None = None,
    grad_dtype=None,
    want_param_grads: bool = False,
    order2: bool = False,
    bn2: int | None = None,
):
    """Build the custom-vjp edge op for a given receiver-block size.

    Signature: ``op(h_g (NR,K,F), a_i (NR,R), o_i (NR,H), d00, d01, d02
    (NR,K,1), m (NR,K,1), *edge_leaves) -> (p0, p1, p2 (NR,C),
    hatt (NR,HK))``. ``grad_dtype`` optionally stores the big ``d_h_g``
    cotangent (the scatter-add operand) at a lower dtype.

    ``want_param_grads=False`` (evaluation/MD): edge-leaf cotangents are
    ZERO (see the module docstring). ``want_param_grads=True`` (TRAINING):
    the backward kernel additionally computes the 11 ``_EDGE_LEAVES``
    gradients in-kernel — ``a^T @ g`` row-contraction matmuls over each
    (BN·K)-edge block, accumulated across grid steps into resident
    whole-array output blocks (the ``train_ef``/``resid_ef`` in-kernel dW
    idiom: every grid step maps to block 0, zero-initialized at step 0,
    ``+=`` after — verified exact on-chip for the dense kernels). The
    ``e_rep``/``e_tile`` head-expansion constants stay zero-cotangent
    (they are not parameters).
    """
    mm_e = _make_mm_prec(edge_matmul_dtype, edge_precision)
    mmt_e = (
        _make_mmt_prec(edge_matmul_dtype, edge_precision)
        if (want_param_grads or order2)
        else None
    )
    names = _EDGE_LEAVES + ("e_rep", "e_tile")

    def _call_fwd(h_g, a_i, o_i, d00, d01, d02, m, *leaves):
        NR, K, F = h_g.shape
        R = a_i.shape[-1]
        H = o_i.shape[-1]
        ep = dict(zip(names, leaves))
        HK = ep["e_rep"].shape[-1]
        C = ep["w_xmix"].shape[-1]
        grid = (NR // BN,)

        def fwd_kernel(hg_r, ai_r, oi_r, d0_r, d1_r, d2_r, m_r, *refs):
            lrefs, orefs = refs[: len(names)], refs[len(names):]
            epk = {n: lr[:] for n, lr in zip(names, lrefs)}
            f = _edge_chain(
                hg_r[:].astype(jnp.float32), ai_r[:], oi_r[:],
                [d0_r[:], d1_r[:], d2_r[:]], m_r[:], epk, mm_e,
            )
            for k in range(3):
                orefs[k][:] = f["pooled"][k]
            orefs[3][:] = f["hatt"]

        return pl.pallas_call(
            fwd_kernel,
            grid=grid,
            in_specs=[
                _row_spec((NR, K, F), BN),
                _row_spec((NR, R), BN),
                _row_spec((NR, H), BN),
            ]
            + [_row_spec((NR, K, 1), BN)] * 4
            + [_const_spec(a) for a in leaves],
            out_shape=tuple(
                [jax.ShapeDtypeStruct((NR, C), jnp.float32)] * 3
                + [jax.ShapeDtypeStruct((NR, HK), jnp.float32)]
            ),
            out_specs=tuple(
                [_row_spec((NR, C), BN)] * 3 + [_row_spec((NR, HK), BN)]
            ),
            compiler_params=_compiler_params(
                n_grid_dims=1, vmem_limit=vmem_limit
            ),
            interpret=interpret,
        )(h_g, a_i, o_i, d00, d01, d02, m, *leaves)

    def _call_bwd(h_g, a_i, o_i, d00, d01, d02, m, leaves, g, pg=None):
        NR, K, F = h_g.shape
        R = a_i.shape[-1]
        H = o_i.shape[-1]
        gp0, gp1, gp2, ghatt = g
        ep = dict(zip(names, leaves))
        HK = ep["e_rep"].shape[-1]
        C = ep["w_xmix"].shape[-1]
        gdt = grad_dtype or jnp.float32
        grid = (NR // BN,)

        pg = want_param_grads if pg is None else pg
        n_dw = len(_EDGE_LEAVES) if pg else 0

        def bwd_kernel(hg_r, ai_r, oi_r, d0_r, d1_r, d2_r, m_r, g0_r,
                       g1_r, g2_r, gh_r, *refs):
            lrefs = refs[: len(names)]
            orefs = refs[len(names): len(names) + 6]
            grefs = refs[len(names) + 6:]
            epk = {n: lr[:] for n, lr in zip(names, lrefs)}
            hg_v = hg_r[:].astype(jnp.float32)
            m_v = m_r[:]
            d0_v = [d0_r[:], d1_r[:], d2_r[:]]
            f = _edge_chain(hg_v, ai_r[:], oi_r[:], d0_v, m_v, epk, mm_e)
            d_h_g, d_a_i, d_o_i, d_d0, dW = _edge_pullback(
                hg_v, d0_v, m_v, epk, mm_e, f,
                [g0_r[:], g1_r[:], g2_r[:]], gh_r[:],
                mmt=mmt_e if n_dw else None,
            )
            orefs[0][:] = d_h_g.astype(orefs[0].dtype)
            orefs[1][:] = d_a_i
            orefs[2][:] = d_o_i
            for k in range(3):
                orefs[3 + k][:] = d_d0[k]
            if n_dw:
                @pl.when(pl.program_id(0) == 0)
                def _():
                    for gr in grefs:
                        gr[:] = jnp.zeros_like(gr)

                for nm, gr in zip(_EDGE_LEAVES, grefs):
                    gr[:] += dW[nm]

        # leaves arrive in ``names`` order = _EDGE_LEAVES + (e_rep, e_tile)
        dw_shapes = list(leaves[: len(_EDGE_LEAVES)]) if n_dw else []
        outs = pl.pallas_call(
            bwd_kernel,
            grid=grid,
            in_specs=[
                _row_spec((NR, K, F), BN),
                _row_spec((NR, R), BN),
                _row_spec((NR, H), BN),
            ]
            + [_row_spec((NR, K, 1), BN)] * 4
            + [_row_spec((NR, C), BN)] * 3
            + [_row_spec((NR, HK), BN)]
            + [_const_spec(a) for a in leaves],
            out_shape=tuple(
                [
                    jax.ShapeDtypeStruct((NR, K, F), gdt),
                    jax.ShapeDtypeStruct((NR, R), jnp.float32),
                    jax.ShapeDtypeStruct((NR, H), jnp.float32),
                ]
                + [jax.ShapeDtypeStruct((NR, K, 1), jnp.float32)] * 3
                + [
                    jax.ShapeDtypeStruct(a.shape, jnp.float32)
                    for a in dw_shapes
                ]
            ),
            out_specs=tuple(
                [
                    _row_spec((NR, K, F), BN),
                    _row_spec((NR, R), BN),
                    _row_spec((NR, H), BN),
                ]
                + [_row_spec((NR, K, 1), BN)] * 3
                + [_const_spec(a) for a in dw_shapes]
            ),
            compiler_params=_compiler_params(
                n_grid_dims=1, vmem_limit=vmem_limit
            ),
            interpret=interpret,
        )(h_g, a_i, o_i, d00, d01, d02, m, gp0, gp1, gp2, ghatt, *leaves)
        return outs

    def _call_bwd2(h_g, a_i, o_i, d00, d01, d02, m, leaves, g, cg):
        """Second-order kernel: the VJP of the backward pass itself.

        ``g`` are the first-backward's output cotangents (pooled×3, hatt);
        ``cg`` are the incoming cotangents on the first-backward's SIX
        outputs (d_h_g, d_a_i, d_o_i, d_d0×3). Returns cotangents w.r.t.
        every first-backward input: the six primal-input streams, the
        four ``g`` streams (the force-graph's downstream consumers), and
        the 11 ``_EDGE_LEAVES`` — the ∂²E/∂p∂x Hessian terms that make
        force-loss TRAINING exact on the sparse kernels. The body traces
        ``jax.vjp`` of (_edge_chain ∘ _edge_pullback) on one receiver
        block (the round-3 'jvp/vjp of the layer body inside a kernel
        lowers fine' result); leaf cotangents accumulate across grid
        steps into resident whole-array blocks (the in-kernel dW idiom).
        """
        NR, K, F = h_g.shape
        R = a_i.shape[-1]
        H = o_i.shape[-1]
        gp0, gp1, gp2, ghatt = g
        c_hg, c_ai, c_oi, c_d00, c_d01, c_d02 = cg
        ep = dict(zip(names, leaves))
        HK = ep["e_rep"].shape[-1]
        C = ep["w_xmix"].shape[-1]
        B2 = bn2 or max(1, BN // 2)
        while B2 > 1 and NR % B2:
            B2 //= 2
        grid = (NR // B2,)
        n_dw = len(_EDGE_LEAVES)

        def bwd2_kernel(hg_r, ai_r, oi_r, d0_r, d1_r, d2_r, m_r,
                        g0_r, g1_r, g2_r, gh_r,
                        ch_r, ca_r, co_r, c0_r, c1_r, c2_r, *refs):
            lrefs = refs[:len(names)]
            orefs = refs[len(names):len(names) + 10]
            grefs = refs[len(names) + 10:]
            lv = [lr[:] for lr in lrefs]
            m_v = m_r[:]

            def pb(hg, da, db, dc, ai, oi, p0, p1, p2, ph, *wl):
                epk = dict(zip(names, tuple(wl) + tuple(lv[n_dw:])))
                f = _edge_chain(hg, ai, oi, [da, db, dc], m_v, epk, mm_e)
                d_h_g, d_a_i, d_o_i, d_d0, _ = _edge_pullback(
                    hg, [da, db, dc], m_v, epk, mm_e, f,
                    [p0, p1, p2], ph, mmt=None,
                )
                return (d_h_g, d_a_i, d_o_i, d_d0[0], d_d0[1], d_d0[2])

            prim = (
                hg_r[:].astype(jnp.float32), d0_r[:], d1_r[:], d2_r[:],
                ai_r[:], oi_r[:], g0_r[:], g1_r[:], g2_r[:], gh_r[:],
            ) + tuple(lv[:n_dw])
            _, vjp_fn = jax.vjp(pb, *prim)
            cots = vjp_fn((
                ch_r[:].astype(jnp.float32), ca_r[:], co_r[:],
                c0_r[:], c1_r[:], c2_r[:],
            ))
            # (e_hg, e_d0×3, e_ai, e_oi, e_g0..2, e_gh, dW2×11)
            orefs[0][:] = cots[0]
            for k in range(3):
                orefs[1 + k][:] = cots[1 + k]
            orefs[4][:] = cots[4]
            orefs[5][:] = cots[5]
            for k in range(4):
                orefs[6 + k][:] = cots[6 + k]

            @pl.when(pl.program_id(0) == 0)
            def _():
                for gr in grefs:
                    gr[:] = jnp.zeros_like(gr)

            for k, gr in enumerate(grefs):
                gr[:] += cots[10 + k]

        dw_shapes = list(leaves[:n_dw])
        outs = pl.pallas_call(
            bwd2_kernel,
            grid=grid,
            in_specs=[
                _row_spec((NR, K, F), B2),
                _row_spec((NR, R), B2),
                _row_spec((NR, H), B2),
            ]
            + [_row_spec((NR, K, 1), B2)] * 4
            + [_row_spec((NR, C), B2)] * 3
            + [_row_spec((NR, HK), B2)]
            + [
                _row_spec((NR, K, F), B2),
                _row_spec((NR, R), B2),
                _row_spec((NR, H), B2),
            ]
            + [_row_spec((NR, K, 1), B2)] * 3
            + [_const_spec(a) for a in leaves],
            out_shape=tuple(
                [jax.ShapeDtypeStruct((NR, K, F), jnp.float32)]
                + [jax.ShapeDtypeStruct((NR, K, 1), jnp.float32)] * 3
                + [
                    jax.ShapeDtypeStruct((NR, R), jnp.float32),
                    jax.ShapeDtypeStruct((NR, H), jnp.float32),
                ]
                + [jax.ShapeDtypeStruct((NR, C), jnp.float32)] * 3
                + [jax.ShapeDtypeStruct((NR, HK), jnp.float32)]
                + [
                    jax.ShapeDtypeStruct(a.shape, jnp.float32)
                    for a in dw_shapes
                ]
            ),
            out_specs=tuple(
                [_row_spec((NR, K, F), B2)]
                + [_row_spec((NR, K, 1), B2)] * 3
                + [
                    _row_spec((NR, R), B2),
                    _row_spec((NR, H), B2),
                ]
                + [_row_spec((NR, C), B2)] * 3
                + [_row_spec((NR, HK), B2)]
                + [_const_spec(a) for a in dw_shapes]
            ),
            compiler_params=_compiler_params(
                n_grid_dims=1, vmem_limit=vmem_limit
            ),
            interpret=interpret,
        )(h_g, a_i, o_i, d00, d01, d02, m, gp0, gp1, gp2, ghatt,
          c_hg, c_ai, c_oi, c_d00, c_d01, c_d02, *leaves)
        return outs

    @jax.custom_vjp
    def edge_op(h_g, a_i, o_i, d00, d01, d02, m, *leaves):
        return _call_fwd(h_g, a_i, o_i, d00, d01, d02, m, *leaves)

    def edge_fwd(h_g, a_i, o_i, d00, d01, d02, m, *leaves):
        out = _call_fwd(h_g, a_i, o_i, d00, d01, d02, m, *leaves)
        return out, (h_g, a_i, o_i, d00, d01, d02, m, leaves)

    def edge_bwd(saved, g):
        h_g, a_i, o_i, d00, d01, d02, m, leaves = saved
        outs = _call_bwd(h_g, a_i, o_i, d00, d01, d02, m, leaves, g)
        d_h_g, d_a_i, d_o_i, d_d00, d_d01, d_d02 = outs[:6]
        if want_param_grads:
            d_leaves = tuple(
                dw.astype(a.dtype)
                for dw, a in zip(outs[6:], leaves)
            ) + tuple(
                jnp.zeros_like(a) for a in leaves[len(_EDGE_LEAVES):]
            )
        else:
            d_leaves = tuple(jnp.zeros_like(a) for a in leaves)
        return (
            d_h_g.astype(h_g.dtype) if h_g.dtype != d_h_g.dtype else d_h_g,
            d_a_i, d_o_i, d_d00, d_d01, d_d02, jnp.zeros_like(m),
        ) + d_leaves

    edge_op.defvjp(edge_fwd, edge_bwd)
    if not order2:
        return edge_op

    # ---- second-order wiring: nested custom_vjp ------------------------
    # Reverse-over-reverse consumes one custom_vjp level per grad. The
    # inner (force) transpose inlines edge_op2's fwd/bwd rules, so those
    # rules must call STILL-WRAPPED ops for the outer (training) grad to
    # find rules: fwd_l2 (bwd = the param-grad backward kernel — the
    # first-order ∂E/∂p term) and bwd_l2 (bwd = _call_bwd2 — the
    # ∂²E/∂p∂x Hessian term). Third-order is deliberately unsupported.

    @jax.custom_vjp
    def fwd_l2(h_g, a_i, o_i, d00, d01, d02, m, *leaves):
        return _call_fwd(h_g, a_i, o_i, d00, d01, d02, m, *leaves)

    def fwd_l2_fwd(h_g, a_i, o_i, d00, d01, d02, m, *leaves):
        out = _call_fwd(h_g, a_i, o_i, d00, d01, d02, m, *leaves)
        return out, (h_g, a_i, o_i, d00, d01, d02, m, leaves)

    def fwd_l2_bwd(saved, g):
        h_g, a_i, o_i, d00, d01, d02, m, leaves = saved
        outs = _call_bwd(
            h_g, a_i, o_i, d00, d01, d02, m, leaves, g, pg=True
        )
        d_h_g, d_a_i, d_o_i, d_d00, d_d01, d_d02 = outs[:6]
        d_leaves = tuple(
            dw.astype(a.dtype) for dw, a in zip(outs[6:], leaves)
        ) + tuple(jnp.zeros_like(a) for a in leaves[len(_EDGE_LEAVES):])
        return (
            d_h_g.astype(h_g.dtype) if h_g.dtype != d_h_g.dtype else d_h_g,
            d_a_i, d_o_i, d_d00, d_d01, d_d02, jnp.zeros_like(m),
        ) + d_leaves

    fwd_l2.defvjp(fwd_l2_fwd, fwd_l2_bwd)

    @jax.custom_vjp
    def bwd_l2(h_g, a_i, o_i, d00, d01, d02, m, g0, g1, g2, gh, *leaves):
        return _call_bwd(
            h_g, a_i, o_i, d00, d01, d02, m, leaves, (g0, g1, g2, gh),
            pg=False,
        )[:6]

    def bwd_l2_fwd(h_g, a_i, o_i, d00, d01, d02, m, g0, g1, g2, gh,
                   *leaves):
        out = bwd_l2(h_g, a_i, o_i, d00, d01, d02, m, g0, g1, g2, gh,
                     *leaves)
        return out, (h_g, a_i, o_i, d00, d01, d02, m, g0, g1, g2, gh,
                     leaves)

    def bwd_l2_bwd(saved, cg):
        h_g, a_i, o_i, d00, d01, d02, m, g0, g1, g2, gh, leaves = saved
        outs = _call_bwd2(
            h_g, a_i, o_i, d00, d01, d02, m, leaves,
            (g0, g1, g2, gh), cg,
        )
        e_hg, e_d00, e_d01, e_d02, e_ai, e_oi = outs[:6]
        e_g0, e_g1, e_g2, e_gh = outs[6:10]
        dW2 = tuple(
            dw.astype(a.dtype) for dw, a in zip(outs[10:], leaves)
        ) + tuple(jnp.zeros_like(a) for a in leaves[len(_EDGE_LEAVES):])
        return (
            e_hg.astype(h_g.dtype) if h_g.dtype != e_hg.dtype else e_hg,
            e_ai, e_oi, e_d00, e_d01, e_d02, jnp.zeros_like(m),
            e_g0, e_g1, e_g2, e_gh,
        ) + dW2

    bwd_l2.defvjp(bwd_l2_fwd, bwd_l2_bwd)

    @jax.custom_vjp
    def edge_op2(h_g, a_i, o_i, d00, d01, d02, m, *leaves):
        return _call_fwd(h_g, a_i, o_i, d00, d01, d02, m, *leaves)

    def edge_op2_fwd(h_g, a_i, o_i, d00, d01, d02, m, *leaves):
        out = fwd_l2(h_g, a_i, o_i, d00, d01, d02, m, *leaves)
        return out, (h_g, a_i, o_i, d00, d01, d02, m, leaves)

    def edge_op2_bwd(saved, g):
        # invoked by the INNER (force) transpose: input cotangents only;
        # parameter gradients reach the outer grad through fwd_l2's and
        # bwd_l2's own rules, so zero leaf cotangents here are exact.
        h_g, a_i, o_i, d00, d01, d02, m, leaves = saved
        g0, g1, g2, gh = g
        d_h_g, d_a_i, d_o_i, d_d00, d_d01, d_d02 = bwd_l2(
            h_g, a_i, o_i, d00, d01, d02, m, g0, g1, g2, gh, *leaves
        )
        return (
            d_h_g.astype(h_g.dtype) if h_g.dtype != d_h_g.dtype else d_h_g,
            d_a_i, d_o_i, d_d00, d_d01, d_d02, jnp.zeros_like(m),
        ) + tuple(jnp.zeros_like(a) for a in leaves)

    edge_op2.defvjp(edge_op2_fwd, edge_op2_bwd)
    return edge_op2


def _gather_rows(a: jax.Array, idx: jax.Array):
    """a (B, N, D), idx (B, N, K) -> (B, N, K, D) (same as sparse._gather)."""
    B, N, K = idx.shape
    flat = jnp.take_along_axis(a, idx.reshape(B, N * K, 1), axis=1)
    return flat.reshape(B, N, K, a.shape[-1])


def sparse_kernel_model_forward(
    params: ModelParams,
    h: jax.Array,  # (B, N, F_in)
    x: jax.Array,  # (B, N, 3)
    idx: jax.Array,  # (B, N, K)
    nbr_mask: jax.Array,  # (B, N, K)
    v: Optional[jax.Array] = None,
    *,
    n_heads: int = 4,
    update: Sequence[bool] | bool = True,
    block_rows: int = 32,
    edge_matmul_dtype=None,
    edge_precision=None,
    matmul_dtype=None,
    gather_dtype=None,
    box=None,
    interpret: bool = False,
    vmem_limit: int | None = None,
    param_grads: bool = False,
    order2: bool = False,
    bn2: int | None = None,
):
    """Full sparse model with the edge chain on Pallas kernels.

    Same contract as ``sparse.sparse_model_forward`` (returns
    ``(out (B, N, F_out), x_out, v_out)``). ``block_rows`` receiver rows
    per grid step (BN·K edge sublanes in VMEM at a time). ``gather_dtype=
    jnp.bfloat16`` halves the h-gather/scatter traffic (the measured
    XLA-side wall) at the bf16 edge tier.

    ``param_grads=False`` (evaluation/MD): gradients flow to ``x``/``h``
    only (see module docstring). ``param_grads=True`` (TRAINING): the
    edge kernels also emit in-kernel parameter gradients, so
    ``jax.grad(loss)(params, ...)`` is exact end-to-end — the node-level
    matmuls/embed/readout/gathers differentiate in XLA, the O(N·K·ch)
    edge-scope dW comes out of the backward kernel as row-contraction
    matmuls (zero extra HBM traffic). Keep it off for E+F evaluation:
    the extra resident accumulators are pure overhead there.
    """
    from sake_tpu.kernels.functional import _embed, _make_mm, _readout

    B, N, F_in = h.shape
    K = idx.shape[-1]
    depth = len(params.layers)
    updates = [update] * depth if isinstance(update, bool) else list(update)
    upd_flags = jnp.asarray(updates, jnp.float32)
    NR = B * N
    BN = block_rows
    while BN > 1 and NR % BN:
        BN //= 2

    mm = _make_mm(matmul_dtype)
    leaves = wide_stack(params, n_heads)  # depth-stacked, _LEAF_NAMES order
    H = params.layers[0].edge.w_out0.shape[-1]
    e_rep, e_tile = head_expansion_matrices(H, n_heads)
    edge_op = _make_edge_op(
        BN, edge_matmul_dtype, edge_precision, interpret, vmem_limit,
        grad_dtype=gather_dtype, want_param_grads=param_grads,
        order2=order2, bn2=bn2,
    )

    hc = _embed(params, h, mm)
    F = hc.shape[-1]
    m3 = nbr_mask[..., None]  # (B, N, K, 1)
    m_flat = m3.reshape(NR, K, 1)
    count = m3.sum(axis=-2)  # (B, N, 1)
    if box is not None:
        bx = jnp.asarray(box, jnp.float32)

    def layer(carry, lw):
        hc, xc, vc = carry
        lp, upd = lw
        h2d = hc.reshape(NR, F)

        # receiver-side projections (XLA: tiny O(N·ch) matmuls); the
        # sender side is ONE gather of h (the j-projections happen
        # in-kernel — half the gather/scatter traffic of gathering the
        # two projected arrays)
        a_i = mm(h2d, lp["w_in_i"]) + lp["b_in"]
        o_i = mm(h2d, lp["w_o_i"]) + lp["b_o0"]
        h_g = _gather_rows(
            hc if gather_dtype is None else hc.astype(gather_dtype), idx
        ).reshape(NR, K, F)

        xg = _gather_rows(xc, idx)  # (B, N, K, 3)
        d0 = xg - xc[:, :, None, :]
        if box is not None:
            d0 = d0 - bx * jnp.round(d0 / bx)
        d0p = [d0[..., k].reshape(NR, K, 1) for k in range(3)]

        ep_leaves = tuple(lp[n] for n in _EDGE_LEAVES) + (e_rep, e_tile)
        p0, p1, p2, hatt = edge_op(h_g, a_i, o_i, *d0p, m_flat, *ep_leaves)
        pooled = [pk.reshape(B, N, -1) for pk in (p0, p1, p2)]
        C = pooled[0].shape[-1]

        # node update (XLA)
        norm = [pk / (count + 1e-8) for pk in pooled]
        pool_sq = (norm[0] ** 2 + norm[1] ** 2 + norm[2] ** 2).reshape(
            NR, C
        )
        h_comb = _silu(
            mm(_silu(mm(pool_sq, lp["w_post0"]) + lp["b_post0"]),
               lp["w_post1"]) + lp["b_post1"]
        )
        node_pre = (
            mm(h2d, lp["w_node_h"])
            + mm(hatt, lp["w_node_agg"])
            + mm(h_comb, lp["w_node_comb"])
            + lp["b_node0"]
        )
        uv = mm(_silu(node_pre), lp["w_node1"]) + lp["b_node1"]
        h_out = hc + _silu(uv).reshape(B, N, F)

        # position/velocity update, gated by the layer's update flag
        delta = jnp.concatenate(
            [
                mm(pk.reshape(NR, C), lp["w_vmix"]).reshape(B, N, 1)
                for pk in pooled
            ],
            axis=-1,
        ) / (count + 1e-10)
        g0 = mm(h_out.reshape(NR, F), lp["w_vel0"]) + lp["b_vel0"]
        gate = 2.0 * jax.nn.sigmoid(
            mm(_silu(g0), lp["w_vel1"])
        ).reshape(B, N, 1)
        v_new = gate * vc + delta
        x_new = xc + v_new
        x_out = xc + upd * (x_new - xc)
        v_out = vc + upd * (v_new - vc)
        return (h_out, x_out, v_out), None

    lw = (dict(zip(_LEAF_NAMES, leaves)), upd_flags)
    v0 = v if v is not None else jnp.zeros_like(x)
    (hc, x_out, v_out), _ = jax.lax.scan(layer, (hc, x, v0), lw)
    out = _readout(params, hc, mm)
    return out, x_out, (v_out if (v is not None or any(updates)) else None)


def make_sparse_kernel_energy_forces(
    h: jax.Array,  # (B, N, F_in)
    *,
    n_heads: int = 4,
    update: Sequence[bool] | bool = True,
    block_rows: int = 32,
    edge_matmul_dtype=jnp.bfloat16,
    matmul_dtype=None,
    gather_dtype=None,
    node_mask: Optional[jax.Array] = None,  # (B, N)
    box=None,
    interpret: bool = False,
    vmem_limit: int | None = None,
):
    """``(params, x, idx, nbr_mask) -> (e (B,), f (B, N, 3))`` on the
    kernel-fused sparse model — drop-in for
    ``sparse.make_sparse_energy_forces`` (the force field of
    ``md.neighborlist_verlet_rollout``), at kernel speed. Forces are
    exact for the bf16-edge tier (same tier as the dense champions);
    pass ``edge_matmul_dtype=None`` for the f32 tier."""
    nm = None if node_mask is None else node_mask[..., None]

    def energy_forces(p: ModelParams, x, idx, nbr_mask):
        def e_sum(x_):
            out, _, _ = sparse_kernel_model_forward(
                p, h, x_, idx, nbr_mask,
                n_heads=n_heads, update=update, block_rows=block_rows,
                edge_matmul_dtype=edge_matmul_dtype,
                matmul_dtype=matmul_dtype, gather_dtype=gather_dtype,
                box=box, interpret=interpret, vmem_limit=vmem_limit,
            )
            if nm is not None:
                out = out * nm
            e_b = out.sum(axis=(-2, -1))
            return e_b.sum(), e_b

        (_, e_b), neg_f = jax.value_and_grad(e_sum, has_aux=True)(x)
        return e_b, -neg_f

    return energy_forces


def make_sparse_kernel_energy_loss(
    h: jax.Array,  # (B, N, F_in)
    *,
    n_heads: int = 4,
    update: Sequence[bool] | bool = False,
    block_rows: int = 32,
    edge_matmul_dtype=jnp.bfloat16,
    matmul_dtype=None,
    gather_dtype=None,
    node_mask: Optional[jax.Array] = None,  # (B, N)
    box=None,
    interpret: bool = False,
    vmem_limit: int | None = None,
):
    """``(params, x, idx, nbr_mask, e_target (B,)) -> scalar`` energy-MAE
    loss on the kernel-fused sparse model, differentiable w.r.t.
    ``params`` — the TRAINING entry for the cutoff-sparse path (the OC20
    energy-regression capability, ``/root/reference/scripts/oc20_batch/
    run.py:93-97``, at large N where the dense train kernels don't
    apply). ``jax.value_and_grad(loss)(params, ...)`` runs the edge-scope
    backward + in-kernel dW in one Pallas program per layer; everything
    else (node matmuls, gathers/scatter-adds, the depth scan) is XLA
    autodiff. First-order (energy) objective — for force-loss
    (second-order) training on the kernels use
    ``make_sparse_kernel_force_loss``.

    ``update=False`` default: OC20-style relaxed-energy regression does
    not flow positions; flip it on for flow-matching-style objectives.
    """
    nm = None if node_mask is None else node_mask[..., None]

    def loss(p: ModelParams, x, idx, nbr_mask, e_target):
        out, _, _ = sparse_kernel_model_forward(
            p, h, x, idx, nbr_mask,
            n_heads=n_heads, update=update, block_rows=block_rows,
            edge_matmul_dtype=edge_matmul_dtype,
            matmul_dtype=matmul_dtype, gather_dtype=gather_dtype,
            box=box, interpret=interpret, vmem_limit=vmem_limit,
            param_grads=True,
        )
        if nm is not None:
            out = out * nm
        e_b = out.sum(axis=(-2, -1))
        return jnp.abs(e_b - e_target).mean()

    return loss


def make_sparse_kernel_force_loss(
    h: jax.Array,  # (B, N, F_in)
    *,
    energy_coef: float = 1e-3,
    n_heads: int = 4,
    update: Sequence[bool] | bool = False,
    block_rows: int = 32,
    bn2: int | None = None,
    edge_matmul_dtype=jnp.bfloat16,
    matmul_dtype=None,
    gather_dtype=None,
    node_mask: Optional[jax.Array] = None,  # (B, N)
    box=None,
    interpret: bool = False,
    vmem_limit: int | None = None,
):
    """``(params, x, idx, nbr_mask, f_target (B,N,3), e_target (B,)) ->
    scalar`` force-matching loss (F-MAE + ``energy_coef``·E-MAE with
    F = −dE/dx) on the kernel-fused sparse model, differentiable w.r.t.
    ``params`` — SECOND-order training at large N entirely on the edge
    kernels (the MD17 objective, ``/root/reference/scripts/md17/
    run.py:54-70``, at cutoff-sparse scale the reference never reached).

    Reverse-over-reverse works because the edge op is built two
    custom_vjp levels deep (``order2=True``): the inner (force)
    transpose runs the first backward kernel; the outer (training) grad
    then differentiates it through ``_call_bwd2`` — one Pallas program
    computing the VJP of the whole edge pullback, including the
    ∂²E/∂p∂x Hessian-term parameter cotangents — and picks up the
    first-order ∂E/∂p term from the param-grad backward kernel. Jit
    training graphs with ``SPARSE_TRAIN_COMPILER_OPTIONS``. ``bn2``:
    receiver rows per second-order grid step (default ``block_rows//2``
    — the bwd2 body is ~3x the backward's VMEM footprint).
    """
    nm = None if node_mask is None else node_mask[..., None]

    def loss(p: ModelParams, x, idx, nbr_mask, f_target, e_target):
        def e_sum(x_):
            out, _, _ = sparse_kernel_model_forward(
                p, h, x_, idx, nbr_mask,
                n_heads=n_heads, update=update, block_rows=block_rows,
                edge_matmul_dtype=edge_matmul_dtype,
                matmul_dtype=matmul_dtype, gather_dtype=gather_dtype,
                box=box, interpret=interpret, vmem_limit=vmem_limit,
                order2=True, bn2=bn2,
            )
            if nm is not None:
                out = out * nm
            e_b = out.sum(axis=(-2, -1))  # (B,)
            return e_b.sum(), e_b

        (_, e_b), neg_f = jax.value_and_grad(e_sum, has_aux=True)(x)
        forces = -neg_f
        if nm is not None:
            forces = forces * nm
        f_loss = jnp.abs(forces - f_target).mean()
        e_loss = jnp.abs(e_b - e_target).mean()
        return f_loss + energy_coef * e_loss

    return loss
