"""Split fused kernels: the O(N^2) middle of a SAKE layer as two small
Pallas ops with custom VJPs, composed by XLA.

Why this shape: the whole-model-in-VMEM kernel exceeds this environment's
Mosaic compiler limits (compile time grows ~3x per pipeline stage and the
depth-6 forward+backward build gets OOM-killed server-side), while the lax
path is HBM-bound at ~80 MB/eval. The HBM budget at the 50k evals/s target
is ~16 MB/eval, so full VMEM residency is unnecessary — it suffices to fuse
the edge pipeline into a few kernels whose *boundary* tensors are compact:

- ``edge_att`` op: (node-factorized edge-MLP halves, positions) ->
  edge features ``h_e (B,N,N,H)`` and semantic attention ``att (B,N,N,K)``.
- ``coeff_pool`` op: (h_e, att, positions) -> pooled spatial-attention
  planes ``(B,N,C) x3`` and the sender-summed attended edges ``(B,N,H*K)``.

Everything node-level (embeddings, the mlp_in/out halves, node MLP,
post-norm MLP, velocity gate, readout) stays in XLA, which handles those
matmuls well. Per-layer boundary traffic is ~0.6 MB/eval (vs ~13 MB in the
lax path). Both ops carry custom VJPs whose backward is a second Pallas
kernel that *recomputes* the forward under ``jax.vjp`` (flash-attention
style; no edge tensor is ever stored between passes).

Note: custom_vjp is first-order — training with force losses (second
order) uses the linen/lax path; this path serves E+F evaluation (MD,
inference, the benchmark).
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
    _make_mm,
    _silu,
)

# In-kernel matmuls accumulate in f32; inputs stay f32 (the model is
# memory- not compute-bound, and f32 keeps parity with the lax path).
_mm = _make_mm(None)


# =============================================================================
# op 1: edge features + semantic attention
# =============================================================================


def _edge_att_body(x0, x1, x2, a_j, a_i, o_j, o_i, rbf_m, rbf_b, w_r, w_rr,
                   b0, w1, b1, w_sem, b_sem):
    """(B,N,1)x3 positions + node-level halves -> (h_e, att)."""
    B, N, R = a_j.shape
    H = o_j.shape[-1]
    d = [p[:, None, :, :] - p[:, :, None, :] for p in (x0, x1, x2)]
    r = jnp.sqrt(jax.nn.relu(d[0] * d[0] + d[1] * d[1] + d[2] * d[2]) + EPSILON)
    pre = a_j[:, None] + a_i[:, :, None]  # b_in folded into a_i by caller
    rbf = jnp.exp(-rbf_b * (jnp.exp(-r) - rbf_m) ** 2)
    filtered = rbf * pre
    o_f = _mm(filtered.reshape(B * N * N, R), w_r).reshape(B, N, N, H)
    e0 = o_j[:, None] + o_i[:, :, None] + o_f + r * w_rr + b0
    h_e = _mm(_silu(e0).reshape(B * N * N, H), w1).reshape(B, N, N, H) + b1
    logits = _celu2(
        _mm(h_e.reshape(B * N * N, H), w_sem).reshape(B, N, N, -1) + b_sem
    )
    eye = jnp.eye(N, dtype=logits.dtype)
    logits = logits - INF * eye[None, :, :, None]
    att = jax.nn.softmax(logits, axis=-2)
    return h_e, att


# =============================================================================
# op 2: per-edge coefficient field, pooled; attended-edge aggregation
# =============================================================================


def head_expansion_matrices(H, K):
    """Constant 0/1 matrices realizing the hidden-major/head-minor outer
    product as matmuls: ``h_e_att = (h_e @ E_rep) * (att @ E_tile)`` with
    ``E_rep[h, h*K+k] = 1`` and ``E_tile[k, h*K+k] = 1``. Matmuls are the
    one expansion primitive that is both differentiable (the bwd kernel
    re-traces the body under jax.vjp) and Mosaic-lowerable (jnp.repeat /
    pltpu.repeat are each only one of the two)."""
    import numpy as _np

    e_rep = _np.zeros((H, H * K), _np.float32)
    e_tile = _np.zeros((K, H * K), _np.float32)
    for h in range(H):
        for k in range(K):
            e_rep[h, h * K + k] = 1.0
            e_tile[k, h * K + k] = 1.0
    return jnp.asarray(e_rep), jnp.asarray(e_tile)


def _coeff_pool_body(x0, x1, x2, h_e, att, w_xmix, e_rep, e_tile):
    """-> (pooled0, pooled1, pooled2 (B,N,C), hatt_sum (B,N,H*K))."""
    B, N, _, H = h_e.shape
    K = att.shape[-1]
    C = w_xmix.shape[-1]
    d = [p[:, None, :, :] - p[:, :, None, :] for p in (x0, x1, x2)]
    r = jnp.sqrt(jax.nn.relu(d[0] * d[0] + d[1] * d[1] + d[2] * d[2]) + EPSILON)
    # attended edges, flattened hidden-major/head-minor via constant matmuls
    h_e_att = _mm(h_e.reshape(B * N * N, H), e_rep) * _mm(
        att.reshape(B * N * N, K), e_tile
    )  # (B*N*N, H*K)
    coeff = jnp.tanh(_mm(h_e_att, w_xmix).reshape(B, N, N, C))
    inv_r = 1.0 / (r + 1e-5)
    pooled = [(coeff * (d[k] * inv_r)).sum(axis=-2) for k in range(3)]
    hatt_sum = h_e_att.reshape(B, N, N, H * K).sum(axis=-2)  # (B, N, H*K)
    return pooled[0], pooled[1], pooled[2], hatt_sum


# =============================================================================
# pallas wrappers with custom VJPs
# =============================================================================


def _vmem_full(a):
    return pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,) * nd,
                        memory_space=pltpu.VMEM)


def _vmem_batch(a, bt):
    shape = (bt,) + a.shape[1:]
    return pl.BlockSpec(shape, lambda i, nd=a.ndim: (i,) + (0,) * (nd - 1),
                        memory_space=pltpu.VMEM)


# Mosaic's default scoped-VMEM limit is 16 MB; v5e has more physical VMEM
# and the kernels here are compute-light, so raise the cap rather than
# shrinking tiles to 1.
_VMEM_LIMIT = 100 * 1024 * 1024


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _call_batched(body, batched, consts, out_struct, bt, interpret):
    """pallas_call with the leading axis of ``batched`` tiled by ``bt``;
    ``consts`` replicated; outputs batched."""
    B = batched[0].shape[0]
    n_b = len(batched)

    def kernel(*refs):
        ins = [r[:] for r in refs[: n_b + len(consts)]]
        outs = refs[n_b + len(consts):]
        res = body(*ins)
        for o_ref, val in zip(outs, res):
            o_ref[:] = val

    return pl.pallas_call(
        kernel,
        grid=(B // bt,),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B,) + s[1:], jnp.float32) for s in out_struct
        ),
        in_specs=[_vmem_batch(a, bt) for a in batched]
        + [_vmem_full(c) for c in consts],
        out_specs=tuple(
            _vmem_batch(jax.ShapeDtypeStruct(s, jnp.float32), bt)
            for s in out_struct
        ),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(*batched, *consts)



def _generic_bwd(body, primals, cots, n_batched, batch_tile, interpret):
    """Backward kernel: recompute ``body`` under jax.vjp per batch tile.

    Batched-input cotangents stream out tile-by-tile; replicated-constant
    cotangents accumulate ACROSS grid steps into full-array outputs (TPU
    grids execute sequentially; an output whose index_map ignores the grid
    index stays resident, the standard Pallas reduction pattern).
    """
    batched, consts = primals[:n_batched], primals[n_batched:]
    B = batched[0].shape[0]
    n_tiles = B // batch_tile
    n_c = len(consts)
    n_cot = len(cots)

    def kernel(*refs):
        ins = [r[:] for r in refs[: n_batched + n_c + n_cot]]
        outs = refs[n_batched + n_c + n_cot:]
        prim = ins[: n_batched + n_c]
        cot = tuple(ins[n_batched + n_c:])
        _, vjp = jax.vjp(body, *prim)
        grads = vjp(cot)
        for o_ref, val in zip(outs[:n_batched], grads[:n_batched]):
            o_ref[:] = val
        first = pl.program_id(0) == 0
        for o_ref, val in zip(outs[n_batched:], grads[n_batched:]):
            @pl.when(first)
            def _(o_ref=o_ref, val=val):
                o_ref[:] = val

            @pl.when(jnp.logical_not(first))
            def _(o_ref=o_ref, val=val):
                o_ref[:] = o_ref[:] + val

    out_shapes = tuple(
        jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in batched
    ) + tuple(jax.ShapeDtypeStruct(c.shape, jnp.float32) for c in consts)
    grads = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=out_shapes,
        in_specs=[_vmem_batch(a, batch_tile) for a in batched]
        + [_vmem_full(c) for c in consts]
        + [_vmem_batch(c, batch_tile) for c in cots],
        out_specs=tuple(_vmem_batch(a, batch_tile) for a in batched)
        + tuple(_vmem_full(c) for c in consts),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(*batched, *consts, *cots)
    return tuple(grads)


def make_edge_att_op(N, R, H, K, *, batch_tile=16, interpret=False):
    """Build the differentiable edge+attention op for fixed shapes."""

    n_batched = 7  # x0 x1 x2 a_j a_i o_j o_i

    def fwd_raw(*args):
        batched, consts = args[:n_batched], args[n_batched:]
        B = batched[0].shape[0]
        out_struct = [(B, N, N, H), (B, N, N, K)]
        return _call_batched(
            _edge_att_body, batched, consts, out_struct, batch_tile, interpret
        )

    @jax.custom_vjp
    def op(*args):
        return fwd_raw(*args)

    def op_fwd(*args):
        return fwd_raw(*args), args

    def op_bwd(residuals, cots):
        return _generic_bwd(
            _edge_att_body, residuals, cots, n_batched, batch_tile, interpret
        )

    op.defvjp(op_fwd, op_bwd)
    return op


def make_coeff_pool_op(N, H, K, C, *, batch_tile=8, interpret=False):
    n_batched = 5  # x0 x1 x2 h_e att

    body = _coeff_pool_body

    def fwd_raw(*args):
        batched, consts = args[:n_batched], args[n_batched:]
        B = batched[0].shape[0]
        out_struct = [(B, N, C)] * 3 + [(B, N, H * K)]
        return _call_batched(body, batched, consts, out_struct, batch_tile, interpret)

    @jax.custom_vjp
    def op(*args):
        return fwd_raw(*args)

    def op_fwd(*args):
        return fwd_raw(*args), args

    def op_bwd(residuals, cots):
        return _generic_bwd(
            _coeff_pool_body, residuals, cots, n_batched, batch_tile, interpret
        )

    op.defvjp(op_fwd, op_bwd)
    return op


# =============================================================================
# full model on the split kernels
# =============================================================================


def split_energy_forces(
    params: ModelParams,
    h: jax.Array,  # (B, N, F_in)
    x: jax.Array,  # (B, N, 3)
    *,
    n_heads: int = 4,
    update: Sequence[bool] | bool = True,
    batch_tile_edge: int = 16,
    batch_tile_pool: int = 8,
    interpret: bool = False,
):
    """E+F evaluation with the edge pipeline in Pallas and node-level math
    in XLA. Returns ``(e (B,), f (B, N, 3))``."""
    depth = len(params.layers)
    updates = [update] * depth if isinstance(update, bool) else list(update)
    B, N, _ = h.shape
    H = params.layers[0].edge.w_out0.shape[-1]
    R = params.layers[0].edge.w_in.shape[-1]
    K = n_heads
    C = params.layers[0].w_xmix.shape[-1]
    F = params.w_embed.shape[-1]

    edge_att = make_edge_att_op(
        N, R, H, K, batch_tile=batch_tile_edge, interpret=interpret
    )
    coeff_pool = make_coeff_pool_op(
        N, H, K, C, batch_tile=batch_tile_pool, interpret=interpret
    )
    e_rep, e_tile = head_expansion_matrices(H, K)

    def energy(x_in):
        xp = [x_in[..., k : k + 1] for k in range(3)]
        hc = (_mm(h.reshape(B * N, -1), params.w_embed) + params.b_embed).reshape(
            B, N, F
        )
        vp = None
        for lp, upd in zip(params.layers, updates):
            h2d = hc.reshape(B * N, F)
            a_j = _mm(h2d, lp.edge.w_in[:F]).reshape(B, N, R)
            a_i = (_mm(h2d, lp.edge.w_in[F:]) + lp.edge.b_in).reshape(B, N, R)
            o_j = _mm(h2d, lp.edge.w_out0[:F]).reshape(B, N, H)
            o_i = _mm(h2d, lp.edge.w_out0[F : 2 * F]).reshape(B, N, H)
            h_e, att = edge_att(
                *xp, a_j, a_i, o_j, o_i,
                lp.edge.rbf_means, lp.edge.rbf_betas,
                lp.edge.w_out0[2 * F : 2 * F + R], lp.edge.w_out0[2 * F + R],
                lp.edge.b_out0, lp.edge.w_out1, lp.edge.b_out1,
                lp.w_sem, lp.b_sem,
            )
            p0, p1, p2, hatt_sum = coeff_pool(
                *xp, h_e, att, lp.w_xmix, e_rep, e_tile
            )
            pooled = [p0, p1, p2]
            # node-level math in XLA
            agg_node = _mm(hatt_sum.reshape(B * N, H * K), lp.w_node0[F : F + H * K])
            norm = [pk / float(N) for pk in pooled]
            pool_sq = norm[0] ** 2 + norm[1] ** 2 + norm[2] ** 2
            h_comb = _silu(
                _mm(
                    _silu(_mm(pool_sq.reshape(B * N, C), lp.w_post0) + lp.b_post0),
                    lp.w_post1,
                )
                + lp.b_post1
            )
            node_pre = (
                _mm(h2d, lp.w_node0[:F])
                + agg_node
                + _mm(h_comb, lp.w_node0[F + H * K :])
                + lp.b_node0
            )
            upd_val = _mm(_silu(node_pre), lp.w_node1) + lp.b_node1
            hc = hc + _silu(upd_val).reshape(B, N, F)
            if upd:
                delta = [
                    _mm(pk.reshape(B * N, C), lp.w_vmix).reshape(B, N, 1) / float(N)
                    for pk in pooled
                ]
                if vp is not None:
                    gate = 2.0 * jax.nn.sigmoid(
                        _mm(
                            _silu(_mm(hc.reshape(B * N, F), lp.w_vel0) + lp.b_vel0),
                            lp.w_vel1,
                        )
                    ).reshape(B, N, 1)
                    vp = [gate * vk + dk for vk, dk in zip(vp, delta)]
                else:
                    vp = delta
                xp = [xk + vk for xk, vk in zip(xp, vp)]
        out = _mm(
            _silu(_mm(hc.reshape(B * N, F), params.w_out0) + params.b_out0),
            params.w_out1,
        ) + params.b_out1
        e = out.reshape(B, N, -1).sum(axis=(-2, -1))
        return e.sum(), e

    (_, e), g = jax.value_and_grad(energy, has_aux=True)(x)
    return e, -g


# =============================================================================
# merged op: edge model + attention + coefficient pool in ONE kernel,
# with an internal chunk loop so the IO tile is large (amortizing per-
# grid-step overhead) while the edge-tensor working set stays tiny.
# =============================================================================


def _merged_body(x0, x1, x2, a_j, a_i, o_j, o_i, rbf_m, rbf_b, w_r, w_rr,
                 b0, w1, b1, w_sem, b_sem, w_xmix, e_rep, e_tile):
    """Full O(N^2) middle for a chunk of molecules: positions + node-level
    halves -> (pooled0..2 (B,N,C), hatt_sum (B,N,H*K)). h_e/att never
    leave the kernel."""
    h_e, att = _edge_att_body(
        x0, x1, x2, a_j, a_i, o_j, o_i, rbf_m, rbf_b, w_r, w_rr, b0, w1, b1,
        w_sem, b_sem,
    )
    return _coeff_pool_body(x0, x1, x2, h_e, att, w_xmix, e_rep, e_tile)


_N_MERGED_BATCHED = 7
_N_MERGED_CONSTS = 12


def make_edge_pool_op(
    N, R, H, K, C, *, io_tile=64, chunk=2, interpret=False
):
    """Differentiable merged edge-pipeline op.

    ``io_tile`` molecules stream HBM<->VMEM per grid step; inside, a
    ``fori_loop`` processes ``chunk`` molecules at a time so only a
    chunk's edge tensors are ever live. The backward kernel recomputes
    each chunk under ``jax.vjp`` (nothing O(N^2) is stored anywhere).
    """
    assert io_tile % chunk == 0
    n_chunks = io_tile // chunk

    def _fwd_kernel(*refs):
        b_refs = refs[:_N_MERGED_BATCHED]
        consts = [r[:] for r in refs[_N_MERGED_BATCHED:_N_MERGED_BATCHED + _N_MERGED_CONSTS]]
        out_refs = refs[_N_MERGED_BATCHED + _N_MERGED_CONSTS:]

        def body(c, _):
            sl = pl.ds(c * chunk, chunk)
            ins = [r[sl] for r in b_refs]
            outs = _merged_body(*ins, *consts)
            for o_ref, val in zip(out_refs, outs):
                o_ref[sl] = val
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)

    def fwd_raw(*args):
        batched = args[:_N_MERGED_BATCHED]
        consts = args[_N_MERGED_BATCHED:]
        B = batched[0].shape[0]
        out_shapes = (
            jax.ShapeDtypeStruct((B, N, C), jnp.float32),
            jax.ShapeDtypeStruct((B, N, C), jnp.float32),
            jax.ShapeDtypeStruct((B, N, C), jnp.float32),
            jax.ShapeDtypeStruct((B, N, H * K), jnp.float32),
        )
        return pl.pallas_call(
            _fwd_kernel,
            grid=(B // io_tile,),
            out_shape=out_shapes,
            in_specs=[_vmem_batch(a, io_tile) for a in batched]
            + [_vmem_full(c) for c in consts],
            out_specs=tuple(_vmem_batch(s, io_tile) for s in out_shapes),
            compiler_params=_compiler_params(),
            interpret=interpret,
        )(*batched, *consts)

    @jax.custom_vjp
    def op(*args):
        return fwd_raw(*args)

    def op_fwd(*args):
        return fwd_raw(*args), args

    def op_bwd(residuals, cots):
        batched = residuals[:_N_MERGED_BATCHED]
        consts = residuals[_N_MERGED_BATCHED:]
        B = batched[0].shape[0]

        def kernel(*refs):
            b_refs = refs[:_N_MERGED_BATCHED]
            const_vals = [
                r[:] for r in refs[_N_MERGED_BATCHED:_N_MERGED_BATCHED + _N_MERGED_CONSTS]
            ]
            cot_refs = refs[
                _N_MERGED_BATCHED + _N_MERGED_CONSTS:
                _N_MERGED_BATCHED + _N_MERGED_CONSTS + 4
            ]
            bgrad_refs = refs[
                _N_MERGED_BATCHED + _N_MERGED_CONSTS + 4:
                2 * _N_MERGED_BATCHED + _N_MERGED_CONSTS + 4
            ]
            cgrad_refs = refs[2 * _N_MERGED_BATCHED + _N_MERGED_CONSTS + 4:]

            def body(c, cgrads):
                sl = pl.ds(c * chunk, chunk)
                prim = [r[sl] for r in b_refs]
                cot = tuple(r[sl] for r in cot_refs)
                _, vjp = jax.vjp(_merged_body, *prim, *const_vals)
                grads = vjp(cot)
                for o_ref, val in zip(bgrad_refs, grads[:_N_MERGED_BATCHED]):
                    o_ref[sl] = val
                return [
                    acc + g for acc, g in zip(grads[_N_MERGED_BATCHED:], cgrads)
                ]

            czero = [jnp.zeros(c.shape, jnp.float32) for c in const_vals]
            cgrads = jax.lax.fori_loop(0, n_chunks, body, czero)
            first = pl.program_id(0) == 0
            for o_ref, val in zip(cgrad_refs, cgrads):
                @pl.when(first)
                def _(o_ref=o_ref, val=val):
                    o_ref[:] = val

                @pl.when(jnp.logical_not(first))
                def _(o_ref=o_ref, val=val):
                    o_ref[:] = o_ref[:] + val

        out_shapes = tuple(
            jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in batched
        ) + tuple(jax.ShapeDtypeStruct(c.shape, jnp.float32) for c in consts)
        grads = pl.pallas_call(
            kernel,
            grid=(B // io_tile,),
            out_shape=out_shapes,
            in_specs=[_vmem_batch(a, io_tile) for a in batched]
            + [_vmem_full(c) for c in consts]
            + [_vmem_batch(c, io_tile) for c in cots],
            out_specs=tuple(_vmem_batch(a, io_tile) for a in batched)
            + tuple(_vmem_full(c) for c in consts),
            compiler_params=_compiler_params(),
            interpret=interpret,
        )(*batched, *consts, *cots)
        return tuple(grads)

    op.defvjp(op_fwd, op_bwd)
    return op


def merged_energy_forces(
    params: ModelParams,
    h: jax.Array,  # (B, N, F_in)
    x: jax.Array,  # (B, N, 3)
    *,
    n_heads: int = 4,
    update: Sequence[bool] | bool = True,
    io_tile: int = 64,
    chunk: int = 2,
    interpret: bool = False,
):
    """E+F with the merged edge-pipeline kernel (one Pallas op per layer
    per direction; node-level math in XLA). Returns ``(e (B,), f (B,N,3))``."""
    depth = len(params.layers)
    updates = [update] * depth if isinstance(update, bool) else list(update)
    B, N, _ = h.shape
    H = params.layers[0].edge.w_out0.shape[-1]
    R = params.layers[0].edge.w_in.shape[-1]
    K = n_heads
    C = params.layers[0].w_xmix.shape[-1]
    F = params.w_embed.shape[-1]

    edge_pool = make_edge_pool_op(
        N, R, H, K, C, io_tile=io_tile, chunk=chunk, interpret=interpret
    )
    e_rep, e_tile = head_expansion_matrices(H, K)

    def energy(x_in):
        xp = [x_in[..., k : k + 1] for k in range(3)]
        hc = (_mm(h.reshape(B * N, -1), params.w_embed) + params.b_embed).reshape(
            B, N, F
        )
        vp = None
        for lp, upd in zip(params.layers, updates):
            h2d = hc.reshape(B * N, F)
            a_j = _mm(h2d, lp.edge.w_in[:F]).reshape(B, N, R)
            a_i = (_mm(h2d, lp.edge.w_in[F:]) + lp.edge.b_in).reshape(B, N, R)
            o_j = _mm(h2d, lp.edge.w_out0[:F]).reshape(B, N, H)
            o_i = _mm(h2d, lp.edge.w_out0[F : 2 * F]).reshape(B, N, H)
            p0, p1, p2, hatt_sum = edge_pool(
                *xp, a_j, a_i, o_j, o_i,
                lp.edge.rbf_means, lp.edge.rbf_betas,
                lp.edge.w_out0[2 * F : 2 * F + R], lp.edge.w_out0[2 * F + R],
                lp.edge.b_out0, lp.edge.w_out1, lp.edge.b_out1,
                lp.w_sem, lp.b_sem, lp.w_xmix, e_rep, e_tile,
            )
            pooled = [p0, p1, p2]
            agg_node = _mm(hatt_sum.reshape(B * N, H * K), lp.w_node0[F : F + H * K])
            norm = [pk / float(N) for pk in pooled]
            pool_sq = norm[0] ** 2 + norm[1] ** 2 + norm[2] ** 2
            h_comb = _silu(
                _mm(
                    _silu(_mm(pool_sq.reshape(B * N, C), lp.w_post0) + lp.b_post0),
                    lp.w_post1,
                )
                + lp.b_post1
            )
            node_pre = (
                _mm(h2d, lp.w_node0[:F])
                + agg_node
                + _mm(h_comb, lp.w_node0[F + H * K :])
                + lp.b_node0
            )
            upd_val = _mm(_silu(node_pre), lp.w_node1) + lp.b_node1
            hc = hc + _silu(upd_val).reshape(B, N, F)
            if upd:
                delta = [
                    _mm(pk.reshape(B * N, C), lp.w_vmix).reshape(B, N, 1) / float(N)
                    for pk in pooled
                ]
                if vp is not None:
                    gate = 2.0 * jax.nn.sigmoid(
                        _mm(
                            _silu(_mm(hc.reshape(B * N, F), lp.w_vel0) + lp.b_vel0),
                            lp.w_vel1,
                        )
                    ).reshape(B, N, 1)
                    vp = [gate * vk + dk for vk, dk in zip(vp, delta)]
                else:
                    vp = delta
                xp = [xk + vk for xk, vk in zip(xp, vp)]
        out = _mm(
            _silu(_mm(hc.reshape(B * N, F), params.w_out0) + params.b_out0),
            params.w_out1,
        ) + params.b_out1
        e = out.reshape(B, N, -1).sum(axis=(-2, -1))
        return e.sum(), e

    (_, e), g = jax.value_and_grad(energy, has_aux=True)(x)
    return e, -g
