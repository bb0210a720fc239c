"""Functional (pytree-parameterized) SAKE model — the kernel-side math.

A pure-function reformulation of ``sake_tpu.layers.DenseSAKELayer`` /
``models.SAKEModel`` used inside Pallas kernels (whose bodies trace plain
jnp code on VMEM-resident values) and as the lax oracle for kernel parity
tests. Numerics match the linen path (fp32 reassociation only; the same
EPSILON/masking constants).

TPU-specific reformulations (same math, hardware-shaped):

- **Node-level factorization of edge matmuls.** Every edge Dense whose
  input is the ``[h_j, h_i]`` broadcast-concat splits into two *node*-level
  matmuls broadcast-added over the pair grid:
  ``concat(h_j, h_i) @ W = (h @ W_top)_j + (h @ W_bot)_i``.
  The reference multiplies (N^2 x 2F) @ (2F x R) per edge
  (``sake/layers.py:30``); this does (N x F) @ (F x R) twice — an N-fold
  FLOP cut on the widest matmuls in the model.
- **Coordinate-plane geometry.** Pairwise displacements/distances are
  computed per coordinate on (N, N) planes (VPU-friendly lanes) instead of
  an (N, N, 3) tensor whose 3-wide minor dim maps terribly onto the
  128-lane registers.
- **Pooled spatial attention** (see ``DenseSAKELayer._spatial_pooled``):
  the (N, N, C, 3) combination field is never built.
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
    w_xmix: jax.Array  # (H*K, C) no bias
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


def pairwise_geometry(x):
    """Coordinate-plane pairwise geometry.

    ``x (B, N, 3)`` -> ``(d_planes, r)`` where ``d_planes`` is a list of 3
    ``(B, N, N)`` arrays with ``d_k[b, i, j] = x[b, j, k] - x[b, i, k]`` and
    ``r (B, N, N)`` is the EPSILON-regularized distance
    (``sqrt(relu(sum d^2) + eps)``, reference ``sake/functional.py:10-19``).
    """
    planes = [x[..., k] for k in range(x.shape[-1])]
    d = [p[..., None, :] - p[..., :, None] for p in planes]
    r2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
    r = jnp.sqrt(jax.nn.relu(r2) + EPSILON)
    return d, r


def layer_forward(
    p: LayerParams,
    h: jax.Array,  # (B, N, F)
    x: jax.Array,  # (B, N, 3)
    v: Optional[jax.Array],
    *,
    n_heads: int,
    update: bool,
    mask: Optional[jax.Array] = None,  # (B, N, N) edge mask
    matmul_dtype=None,
):
    """One dense SAKE layer (behavior: ``sake/layers.py:188-235``)."""
    B, N, F = h.shape
    H = p.edge.w_out0.shape[-1]
    K = n_heads

    def mm(a, w):
        """Matmul with optional reduced-precision inputs, f32 accumulation."""
        if matmul_dtype is not None:
            a = a.astype(matmul_dtype)
            w = w.astype(matmul_dtype)
        return jnp.dot(a, w, preferred_element_type=jnp.float32)

    d_planes, r = pairwise_geometry(x)

    # --- edge model (CFConv), node-factorized ---------------------------
    # mlp_in(concat[h_j, h_i]): node-level halves broadcast-added
    R = p.edge.w_in.shape[-1]
    a_j = mm(h.reshape(B * N, F), p.edge.w_in[:F]).reshape(B, N, R)
    a_i = mm(h.reshape(B * N, F), p.edge.w_in[F:]).reshape(B, N, R)
    pre = a_j[:, None, :, :] + a_i[:, :, None, :] + p.edge.b_in  # (B,N,N,R)
    # RBF filter on distances (reference: sake/utils.py:28-65)
    alpha = 1.0  # 5.0 / (5.0 - 0.0) — cutoff bounds fixed as in reference
    rbf = jnp.exp(
        -p.edge.rbf_betas
        * (jnp.exp(-alpha * r)[..., None] - p.edge.rbf_means) ** 2
    )
    filtered = rbf * pre  # (B, N, N, R)
    # mlp_out first Dense on concat[h_cat(2F), filtered(R), r(1)]:
    # node-level halves + edge-level R block + distance column
    o_j = mm(h.reshape(B * N, F), p.edge.w_out0[:F]).reshape(B, N, H)
    o_i = mm(h.reshape(B * N, F), p.edge.w_out0[F : 2 * F]).reshape(B, N, H)
    o_f = mm(filtered.reshape(B * N * N, R), p.edge.w_out0[2 * F : 2 * F + R])
    o_r = r[..., None] * p.edge.w_out0[2 * F + R]
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
    if mask is not None:
        logits = logits - INF * (1.0 - mask[..., None])
    att = jax.nn.softmax(logits, axis=-2)  # (B, N, N, K)
    if mask is not None:
        att = att * mask[..., None]
        denom = att.sum(axis=-2, keepdims=True)
        att = att / jnp.where(denom == 0.0, 1.0, denom)
    # (unmasked: softmax already sums to 1 over j — renormalization no-op)

    # --- attended edge features (hidden-major, head-minor) --------------
    h_e_att = (h_e[..., :, None] * att[..., None, :]).reshape(B, N, N, H * K)

    # --- spatial attention, pooled (no (N,N,C,3) tensor) ----------------
    C = p.w_xmix.shape[-1]
    coeff = jnp.tanh(
        mm(h_e_att.reshape(B * N * N, H * K), p.w_xmix).reshape(B, N, N, C)
    )
    if mask is not None:
        coeff = coeff * mask[..., None]
    inv_r = 1.0 / (r + 1e-5)  # (B, N, N)
    # sum_j coeff[b,i,j,c] * unit_k[b,i,j] as multiply+reduce (Mosaic does
    # not accept the equivalent multi-batch-dim dot_general)
    pooled_planes = [
        (coeff * (d_planes[k] * inv_r)[..., None]).sum(axis=-2) for k in range(3)
    ]  # 3 x (B, N, C)
    if mask is not None:
        count = mask.sum(-1)[..., None]  # (B, N, 1)
        norm_pool = [pk / (count + 1e-8) for pk in pooled_planes]
    else:
        count = float(N)
        norm_pool = [pk / count for pk in pooled_planes]
    pool_sq = (
        norm_pool[0] ** 2 + norm_pool[1] ** 2 + norm_pool[2] ** 2
    )  # (B, N, C)
    h_comb = _silu(
        mm(
            _silu(mm(pool_sq.reshape(B * N, C), p.w_post0) + p.b_post0),
            p.w_post1,
        )
        + p.b_post1
    ).reshape(B, N, H)

    # --- aggregate + node update ----------------------------------------
    if mask is not None:
        h_e_att = h_e_att * mask[..., None]
    agg = h_e_att.sum(axis=-2)  # (B, N, H*K)
    node_in = jnp.concatenate([h, agg, h_comb], axis=-1)
    upd = mm(
        _silu(
            mm(node_in.reshape(B * N, -1), p.w_node0) + p.b_node0
        ),
        p.w_node1,
    ) + p.b_node1
    h_out = h + _silu(upd).reshape(B, N, F)

    if not update:
        return h_out, x, v

    # --- velocity/position update ---------------------------------------
    # delta_v: v_mixing over C of the *raw* pooled sums; reference
    # denominator (+1e-10 with mask, mean over N without)
    delta_v = jnp.stack(
        [mm(pk.reshape(B * N, C), p.w_vmix).reshape(B, N) for pk in pooled_planes],
        axis=-1,
    )  # (B, N, 3)
    if mask is not None:
        delta_v = delta_v / (mask.sum(-1)[..., None] + 1e-10)
    else:
        delta_v = delta_v / float(N)
    if v is not None:
        gate = 2.0 * jax.nn.sigmoid(
            mm(
                _silu(mm(h_out.reshape(B * N, F), p.w_vel0) + p.b_vel0),
                p.w_vel1,
            )
        ).reshape(B, N, 1)
        v_new = gate * v + delta_v
    else:
        v_new = delta_v
    x_out = x + v_new
    return h_out, x_out, v_new


def energy_and_forces_fn(
    p: ModelParams,
    h: jax.Array,  # (B, N, F_in)
    x: jax.Array,  # (B, N, 3)
    *,
    n_heads: int = 4,
    update: Sequence[bool] | bool = True,
    mask: Optional[jax.Array] = None,
    matmul_dtype=None,
):
    """Energy and forces with hand-rolled per-layer rematerialization.

    ``jax.checkpoint`` does not lower inside Pallas kernels (no ``remat2``
    primitive), so this stages the backward pass manually: the forward
    stores only the tiny per-layer boundary states ``(h, x, v)``; the
    backward walks the layers in reverse, recomputing each layer under
    ``jax.vjp`` and applying the cotangent immediately. Peak AD residency
    is therefore ONE layer's edge tensors — the property that lets the
    whole model fit in VMEM.

    Returns ``(e, f)``: per-molecule energy ``(B,)`` (raw, un-colored) and
    forces ``f = -dE/dx`` ``(B, N, 3)``.
    """
    depth = len(p.layers)
    updates = [update] * depth if isinstance(update, bool) else list(update)
    B, N, _ = h.shape

    def mm(a, w):
        if matmul_dtype is not None:
            a = a.astype(matmul_dtype)
            w = w.astype(matmul_dtype)
        return jnp.dot(a, w, preferred_element_type=jnp.float32)

    def layer_fn(i, vdef):
        def fn(h_, x_, v_):
            h2, x2, v2 = layer_forward(
                p.layers[i],
                h_,
                x_,
                v_ if vdef else None,
                n_heads=n_heads,
                update=updates[i],
                mask=mask,
                matmul_dtype=matmul_dtype,
            )
            if v2 is None:
                v2 = v_  # pass the placeholder through unchanged
            return h2, x2, v2

        return fn

    def readout(h_):
        out = mm(
            _silu(mm(h_.reshape(B * N, -1), p.w_out0) + p.b_out0), p.w_out1
        ) + p.b_out1
        e = out.reshape(B, N, -1).sum(axis=(-2, -1))
        return e

    # --- forward: store boundary states only -----------------------------
    h0 = (mm(h.reshape(B * N, -1), p.w_embed) + p.b_embed).reshape(
        B, N, p.w_embed.shape[-1]
    )
    states = []
    vdefs = []
    hc, xc, vc = h0, x, jnp.zeros_like(x)
    vdef = False
    for i in range(depth):
        states.append((hc, xc, vc))
        vdefs.append(vdef)
        hc, xc, vc = layer_fn(i, vdef)(hc, xc, vc)
        vdef = vdef or updates[i]
    e = readout(hc)

    # --- backward: recompute layer-by-layer in reverse -------------------
    _, readout_vjp = jax.vjp(readout, hc)
    (dh,) = readout_vjp(jnp.ones_like(e))
    dx = jnp.zeros_like(x)
    dv = jnp.zeros_like(x)
    for i in reversed(range(depth)):
        h_in, x_in, v_in = states[i]
        _, layer_vjp = jax.vjp(layer_fn(i, vdefs[i]), h_in, x_in, v_in)
        dh, dx_i, dv = layer_vjp((dh, dx, dv))
        dx = dx_i
    # embedding consumes only h; x cotangent is complete at stage 0
    return e, -dx


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
    remat: bool = False,
):
    """Full SAKE model: embed -> depth x layer -> output MLP.

    ``remat=True`` wraps each layer in ``jax.checkpoint`` — essential for
    keeping the in-kernel AD's residuals bounded to one layer's worth of
    edge tensors (the Pallas fused path) and useful for big-batch training.
    """
    B, N, _ = h.shape
    depth = len(p.layers)
    updates = [update] * depth if isinstance(update, bool) else list(update)

    def mm(a, w):
        if matmul_dtype is not None:
            a = a.astype(matmul_dtype)
            w = w.astype(matmul_dtype)
        return jnp.dot(a, w, preferred_element_type=jnp.float32)

    h = (mm(h.reshape(B * N, -1), p.w_embed) + p.b_embed).reshape(
        B, N, p.w_embed.shape[-1]
    )
    for lp, upd in zip(p.layers, updates):
        fn = lambda lp_, h_, x_, v_, u=upd: layer_forward(
            lp_, h_, x_, v_, n_heads=n_heads, update=u, mask=mask,
            matmul_dtype=matmul_dtype,
        )
        if remat:
            fn = jax.checkpoint(fn, static_argnums=())
        h, x, v = fn(lp, h, x, v)
    out = mm(
        _silu(mm(h.reshape(B * N, -1), p.w_out0) + p.b_out0), p.w_out1
    ) + p.b_out1
    return out.reshape(B, N, -1), x, v
