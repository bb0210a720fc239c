"""Functional (pytree-parameterized) SAKE model — the kernel-side math.

A pure-function reformulation of ``sake_tpu.layers.DenseSAKELayer`` /
``models.SAKEModel`` used inside Pallas kernels (whose bodies trace plain
jnp code on VMEM-resident values) and as the lax oracle for kernel parity
tests. Numerics match the linen path (fp32 reassociation only; the same
EPSILON/masking constants).

TPU/Mosaic-specific reformulations (same math, hardware-shaped):

- **Node-level factorization of edge matmuls.** Every edge Dense whose
  input is the ``[h_j, h_i]`` broadcast-concat splits into two *node*-level
  matmuls broadcast-added over the pair grid:
  ``concat(h_j, h_i) @ W = (h @ W_top)_j + (h @ W_bot)_i`` — an N-fold
  FLOP cut on the widest matmuls vs the reference's per-edge form
  (``sake/layers.py:30``).
- **Coordinate planes, keepdims style.** Positions/velocities/forces are
  threaded as three ``(B, N, 1)`` planes; a 3-wide minor dimension maps
  terribly onto 128-lane vregs, and minor singleton dims are never
  created/removed mid-graph (the AD transposes of such expands are
  squeeze-reshapes Mosaic rejects).
- **Per-head splitting instead of (H*K)-flattening.** The attended edge
  tensor ``h_e (x) att`` is never reshaped to width H*K (a minor-dims
  shape cast Mosaic refuses); its consumers (x_mixing, aggregation, node
  MLP) are decomposed into K per-head matmuls against weight slices.
- **Pooled spatial attention**: the (N, N, C, 3) combination field of the
  reference (``sake/layers.py:118``) is never built.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

EPSILON = 1e-5
INF = 1e5


class CFConvParams(NamedTuple):
    """ContinuousFilterConv: mlp_in, RBF (means/betas), mlp_out (2 Dense)."""

    w_in: jax.Array  # (2F [+he], R)
    b_in: jax.Array  # (R,)
    rbf_means: jax.Array  # (R,)
    rbf_betas: jax.Array  # (R,)
    w_out0: jax.Array  # (2F + R + 1, H)
    b_out0: jax.Array  # (H,)
    w_out1: jax.Array  # (H, H)
    b_out1: jax.Array  # (H,)


class LayerParams(NamedTuple):
    edge: CFConvParams
    w_sem: jax.Array  # (H, K) semantic attention
    b_sem: jax.Array  # (K,)
    w_xmix: jax.Array  # (H*K, C) no bias (hidden-major, head-minor rows)
    w_post0: jax.Array  # (C, H)
    b_post0: jax.Array
    w_post1: jax.Array  # (H, H)
    b_post1: jax.Array
    w_node0: jax.Array  # (F + H*K + H, H)
    b_node0: jax.Array
    w_node1: jax.Array  # (H, F)
    b_node1: jax.Array
    # update head (zeros-shaped placeholders when update=False)
    w_vmix: jax.Array  # (C, 1)
    w_vel0: jax.Array  # (F, H)
    b_vel0: jax.Array
    w_vel1: jax.Array  # (H, 1)


class ModelParams(NamedTuple):
    w_embed: jax.Array  # (F_in, H)
    b_embed: jax.Array
    layers: tuple  # tuple[LayerParams, ...]
    w_out0: jax.Array  # (H, H)
    b_out0: jax.Array
    w_out1: jax.Array  # (H, out)
    b_out1: jax.Array


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _celu2(x):
    """celu with alpha=2 (reference: ``sake/layers.py:82``).

    Written as ``exp(x/2) - 1`` rather than ``expm1`` (not lowered by
    Pallas TPU); the expm1 precision advantage near 0 is below fp32 noise
    for these logits.
    """
    return jnp.where(x > 0, x, 2.0 * (jnp.exp(x / 2.0) - 1.0))


def _make_mm(matmul_dtype):
    def mm(a, w):
        if matmul_dtype is not None:
            a = a.astype(matmul_dtype)
            w = w.astype(matmul_dtype)
        return jnp.dot(a, w, preferred_element_type=jnp.float32)

    return mm


def pairwise_geometry_planes(x_planes):
    """``x_planes``: 3 arrays ``(B, N, 1)`` -> (d_planes 3x(B,N,N,1),
    r (B,N,N,1)) with ``d_k[b,i,j] = x_k[b,j] - x_k[b,i]`` and the
    EPSILON-regularized distance (reference ``sake/functional.py:10-19``).

    Planes carry a trailing singleton everywhere ("keepdims style"): minor
    dimensions are never created or removed mid-graph, because the AD
    transpose of a trailing ``[..., None]`` expand is a squeeze-reshape
    that Mosaic's layout inference rejects.
    """
    d = [p[:, None, :, :] - p[:, :, None, :] for p in x_planes]
    r2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
    r = jnp.sqrt(jax.nn.relu(r2) + EPSILON)
    return d, r


def layer_forward_planes(
    p: LayerParams,
    h: jax.Array,  # (B, N, F)
    x_planes,  # 3 x (B, N, 1)
    v_planes,  # 3 x (B, N, 1) or None
    *,
    n_heads: int,
    update: bool,
    mask: Optional[jax.Array] = None,  # (B, N, N) edge mask
    matmul_dtype=None,
):
    """One dense SAKE layer on coordinate planes, keepdims style
    (behavior: ``sake/layers.py:188-235``)."""
    B, N, F = h.shape
    H = p.edge.w_out0.shape[-1]
    K = n_heads
    mm = _make_mm(matmul_dtype)
    h2d = h.reshape(B * N, F)
    mask4 = mask[..., None] if mask is not None else None  # (B, N, N, 1)

    d_planes, r = pairwise_geometry_planes(x_planes)

    # --- edge model (CFConv), node-factorized ---------------------------
    R = p.edge.w_in.shape[-1]
    a_j = mm(h2d, p.edge.w_in[:F]).reshape(B, N, R)
    a_i = mm(h2d, p.edge.w_in[F:]).reshape(B, N, R)
    pre = a_j[:, None, :, :] + a_i[:, :, None, :] + p.edge.b_in  # (B,N,N,R)
    # RBF filter on distances (reference: sake/utils.py:28-65; alpha=1 for
    # the fixed (0,5) cutoff bounds)
    rbf = jnp.exp(
        -p.edge.rbf_betas * (jnp.exp(-r) - p.edge.rbf_means) ** 2
    )
    filtered = rbf * pre  # (B, N, N, R)
    o_j = mm(h2d, p.edge.w_out0[:F]).reshape(B, N, H)
    o_i = mm(h2d, p.edge.w_out0[F : 2 * F]).reshape(B, N, H)
    o_f = mm(filtered.reshape(B * N * N, R), p.edge.w_out0[2 * F : 2 * F + R])
    o_r = r * p.edge.w_out0[2 * F + R]
    e0 = (
        o_j[:, None, :, :]
        + o_i[:, :, None, :]
        + o_f.reshape(B, N, N, H)
        + o_r
        + p.edge.b_out0
    )
    h_e = mm(_silu(e0).reshape(B * N * N, H), p.edge.w_out1).reshape(
        B, N, N, H
    ) + p.edge.b_out1  # (B, N, N, H) edge features

    # --- semantic attention (softmax over senders j) --------------------
    logits = _celu2(
        mm(h_e.reshape(B * N * N, H), p.w_sem).reshape(B, N, N, K) + p.b_sem
    )
    eye = jnp.eye(N, dtype=logits.dtype)
    logits = logits - INF * eye[None, :, :, None]
    if mask4 is not None:
        logits = logits - INF * (1.0 - mask4)
    att = jax.nn.softmax(logits, axis=-2)  # (B, N, N, K)
    if mask4 is not None:
        att = att * mask4
        denom = att.sum(axis=-2, keepdims=True)
        att = att / jnp.where(denom == 0.0, 1.0, denom)
    # (unmasked: softmax already sums to 1 over j — renormalization no-op)

    # --- per-head attended edges: never flattened to width H*K ----------
    # weight rows are hidden-major/head-minor: row(h, k) = h*K + k
    C = p.w_xmix.shape[-1]
    w_xmix_hk = p.w_xmix.reshape(H, K, C)
    w_nagg_hk = p.w_node0[F : F + H * K].reshape(H, K, -1)
    coeff_pre = jnp.zeros((B, N, N, C), jnp.float32)
    agg_node = jnp.zeros((B * N, p.w_node0.shape[-1]), jnp.float32)
    he2d = h_e.reshape(B * N * N, H)
    for k in range(K):
        att_k = att[..., k : k + 1]  # (B, N, N, 1) static lane slice
        # x_mixing head-slice on raw edges, scaled by attention
        coeff_pre = coeff_pre + att_k * mm(
            he2d, w_xmix_hk[:, k, :]
        ).reshape(B, N, N, C)
        # aggregated (sum_j) attended edges, pre-multiplied into node MLP:
        # sum_j (h_e * att_k) @ Wn_k  ==  (sum_j h_e * att_k) @ Wn_k
        a_k = (h_e * att_k).sum(axis=-2)  # (B, N, H)
        agg_node = agg_node + mm(a_k.reshape(B * N, H), w_nagg_hk[:, k, :])
    coeff = jnp.tanh(coeff_pre)
    if mask4 is not None:
        coeff = coeff * mask4

    # --- spatial attention, pooled (no (N,N,C,3) tensor) ----------------
    inv_r = 1.0 / (r + 1e-5)
    pooled_planes = [
        (coeff * (d_planes[k] * inv_r)).sum(axis=-2) for k in range(3)
    ]  # 3 x (B, N, C)
    if mask4 is not None:
        count = mask4.sum(axis=-2)  # (B, N, 1)
        norm_pool = [pk / (count + 1e-8) for pk in pooled_planes]
    else:
        norm_pool = [pk / float(N) for pk in pooled_planes]
    pool_sq = norm_pool[0] ** 2 + norm_pool[1] ** 2 + norm_pool[2] ** 2
    h_comb = _silu(
        mm(
            _silu(mm(pool_sq.reshape(B * N, C), p.w_post0) + p.b_post0),
            p.w_post1,
        )
        + p.b_post1
    )  # (B*N, H)

    # --- node update: concat-free first Dense ----------------------------
    node_pre = (
        mm(h2d, p.w_node0[:F])
        + agg_node
        + mm(h_comb, p.w_node0[F + H * K :])
        + p.b_node0
    )
    upd = mm(_silu(node_pre), p.w_node1) + p.b_node1
    h_out = h + _silu(upd).reshape(B, N, F)

    if not update:
        return h_out, x_planes, v_planes

    # --- velocity/position update ----------------------------------------
    if mask4 is not None:
        dv_denom = mask4.sum(axis=-2) + 1e-10  # (B, N, 1)
    else:
        dv_denom = float(N)
    delta_planes = [
        mm(pk.reshape(B * N, C), p.w_vmix).reshape(B, N, 1) / dv_denom
        for pk in pooled_planes
    ]
    if v_planes is not None:
        gate = 2.0 * jax.nn.sigmoid(
            mm(_silu(mm(h_out.reshape(B * N, F), p.w_vel0) + p.b_vel0), p.w_vel1)
        ).reshape(B, N, 1)
        v_new = [gate * vk + dk for vk, dk in zip(v_planes, delta_planes)]
    else:
        v_new = delta_planes
    x_new = [xk + vk for xk, vk in zip(x_planes, v_new)]
    return h_out, x_new, v_new


def _embed(p, h, mm):
    B, N, _ = h.shape
    return (mm(h.reshape(B * N, -1), p.w_embed) + p.b_embed).reshape(
        B, N, p.w_embed.shape[-1]
    )


def _readout(p, h, mm):
    B, N, _ = h.shape
    out = mm(
        _silu(mm(h.reshape(B * N, -1), p.w_out0) + p.b_out0), p.w_out1
    ) + p.b_out1
    return out.reshape(B, N, -1)


def model_forward_planes(
    p: ModelParams,
    h: jax.Array,
    x_planes,
    v_planes=None,
    *,
    n_heads: int = 4,
    update: Sequence[bool] | bool = True,
    mask: Optional[jax.Array] = None,
    matmul_dtype=None,
):
    depth = len(p.layers)
    updates = [update] * depth if isinstance(update, bool) else list(update)
    mm = _make_mm(matmul_dtype)
    h = _embed(p, h, mm)
    for lp, upd in zip(p.layers, updates):
        h, x_planes, v_planes = layer_forward_planes(
            lp, h, x_planes, v_planes,
            n_heads=n_heads, update=upd, mask=mask, matmul_dtype=matmul_dtype,
        )
    return _readout(p, h, mm), x_planes, v_planes


def model_forward(
    p: ModelParams,
    h: jax.Array,  # (B, N, F_in)
    x: jax.Array,  # (B, N, 3)
    v: Optional[jax.Array] = None,
    *,
    n_heads: int = 4,
    update: Sequence[bool] | bool = True,
    mask: Optional[jax.Array] = None,
    matmul_dtype=None,
):
    """(B, N, 3) API wrapper over the plane implementation."""
    x_planes = [x[..., k : k + 1] for k in range(3)]
    v_planes = [v[..., k : k + 1] for k in range(3)] if v is not None else None
    out, xp, vp = model_forward_planes(
        p, h, x_planes, v_planes,
        n_heads=n_heads, update=update, mask=mask, matmul_dtype=matmul_dtype,
    )
    x_out = jnp.concatenate(xp, axis=-1)
    v_out = jnp.concatenate(vp, axis=-1) if vp is not None else None
    return out, x_out, v_out


def energy_and_forces_planes(
    p: ModelParams,
    h: jax.Array,  # (B, N, F_in)
    x_planes,  # 3 x (B, N, 1)
    *,
    n_heads: int = 4,
    update: Sequence[bool] | bool = True,
    mask: Optional[jax.Array] = None,
    matmul_dtype=None,
):
    """Energy and forces with hand-rolled per-layer rematerialization.

    ``jax.checkpoint`` does not lower inside Pallas kernels (no ``remat2``
    primitive), so the backward pass is staged manually: the forward stores
    only the tiny per-layer boundary states ``(h, x, v)``; the backward
    walks the layers in reverse, recomputing each under ``jax.vjp`` and
    applying the cotangent immediately. Peak AD residency is ONE layer's
    edge tensors — the property that lets the whole model fit in VMEM.

    Returns ``(e, f_planes)``: per-molecule raw energy ``(B,)`` and force
    planes ``3 x (B, N, 1)`` (``f = -dE/dx``).
    """
    depth = len(p.layers)
    updates = [update] * depth if isinstance(update, bool) else list(update)
    mm = _make_mm(matmul_dtype)
    B, N, _ = h.shape

    def layer_fn(i, vdef):
        def fn(h_, xp_, vp_):
            h2, xp2, vp2 = layer_forward_planes(
                p.layers[i], h_, xp_, vp_ if vdef else None,
                n_heads=n_heads, update=updates[i], mask=mask,
                matmul_dtype=matmul_dtype,
            )
            if vp2 is None:
                vp2 = vp_  # pass the placeholder through unchanged
            return h2, list(xp2), list(vp2)

        return fn

    def readout_e(h_):
        # 2D output (B, 1): keep minor dims alive for Mosaic
        return _readout(p, h_, mm).sum(axis=-1).sum(axis=-1, keepdims=True)

    # --- forward: store boundary states only -----------------------------
    h0 = _embed(p, h, mm)
    states, vdefs = [], []
    hc = h0
    xc = [jnp.asarray(pk) for pk in x_planes]
    vc = [jnp.zeros_like(pk) for pk in x_planes]
    vdef = False
    for i in range(depth):
        states.append((hc, xc, vc))
        vdefs.append(vdef)
        hc, xc, vc = layer_fn(i, vdef)(hc, xc, vc)
        vdef = vdef or updates[i]
    e = readout_e(hc)

    # --- backward: recompute layer-by-layer in reverse -------------------
    _, readout_vjp = jax.vjp(readout_e, hc)
    (dh,) = readout_vjp(jnp.ones_like(e))
    dx = [jnp.zeros_like(pk) for pk in x_planes]
    dv = [jnp.zeros_like(pk) for pk in x_planes]
    for i in reversed(range(depth)):
        h_in, x_in, v_in = states[i]
        _, layer_vjp = jax.vjp(layer_fn(i, vdefs[i]), h_in, x_in, v_in)
        dh, dx, dv = layer_vjp((dh, dx, dv))
    # embedding consumes only h; x cotangent is complete at stage 0
    return e, [-g for g in dx]


def energy_and_forces_fn(
    p: ModelParams,
    h: jax.Array,
    x: jax.Array,  # (B, N, 3)
    *,
    n_heads: int = 4,
    update: Sequence[bool] | bool = True,
    mask: Optional[jax.Array] = None,
    matmul_dtype=None,
):
    """(B, N, 3) API wrapper: returns ``(e (B,), f (B, N, 3))``."""
    x_planes = [x[..., k : k + 1] for k in range(3)]
    e, f_planes = energy_and_forces_planes(
        p, h, x_planes,
        n_heads=n_heads, update=update, mask=mask, matmul_dtype=matmul_dtype,
    )
    return e[:, 0], jnp.concatenate(f_planes, axis=-1)
