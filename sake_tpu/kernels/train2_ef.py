"""Second-order (force-loss) training on Pallas kernels.

The canonical MD17 objective trains on forces: ``loss(E, F)`` with
``F = -dE/dx`` itself a gradient (reference ``scripts/md17/run.py:54-70``),
so ``grad(loss, params)`` is a *second* derivative of the model. Round 2's
``train_ef`` ran only the primal on kernels and paid full lax
double-autodiff in the backward. This module puts the backward on kernels
too, using the JVP-augmented-state formulation:

  ``<(gE, gF), d(E, F)> = d[ sum_b gE_b E_b  -  E_dot ]``

where ``E_dot`` is the *tangent* of the energy under the input
perturbation ``x_dot = gF`` (forward-mode). The pullback of the (E, F)
map is therefore ONE reverse pass over a *JVP-augmented* forward whose
per-layer state is ``(h, x, v, h_dot, x_dot, v_dot)``:

- **aug-forward kernel**: depth-on-grid (grid ``(B/BT, depth)``), carries
  the 14-plane augmented state in VMEM scratch; each step runs
  ``jax.jvp`` of the shared layer (``depthgrid_ef.layer_forward_wide``)
  traced *inside* the kernel body, and streams the augmented boundary
  states to HBM.
- **XLA head**: seeds ``d(h_fin), d(h_dot_fin)`` by differentiating
  ``S = sum_b gE_b E_b - sum_b e_dot_b`` through the (tiny, node-level)
  readout JVP; also yields the readout parameter gradients.
- **aug-backward kernel**: reversed depth; each step re-traces the
  augmented layer under ``jax.vjp`` *with the layer parameters as
  differentiable inputs*, applies the carried cotangents, and
  accumulates per-layer parameter gradients into resident VMEM output
  blocks across all (batch, depth) grid steps (the reduction idiom
  proven in ``resid_ef.make_hidden_fn``).

No kernel is differentiated twice: forward-over-reverse is realized as
reverse-over-forward(-mode), all inside single-layer kernel bodies that
Mosaic can compile. Gradients are oracle-exact vs plain lax double
autodiff (``tests/test_kernels.py``).
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
    layer_forward_wide,
    wide_stack,
)
from sake_tpu.kernels.functional import ModelParams, _silu
from sake_tpu.kernels.resid_ef import (
    _EDGE_RESIDS,
    _NODE_RESIDS,
    _edge_channels,
    _make_mmt_prec,
    _node_channels,
    _resid_dtype_for,
    contract_param_pair_tangents,
    layer_bwd_resid,
    layer_fwd_resid,
    layer_jvp_resid,
    unsplit_layer_grads,
)
from sake_tpu.kernels.split_ef import head_expansion_matrices

# The aug-backward bodies (3 backward-equivalents, TWO residual streams
# resident per grid step) sit ~0.6% over the default 100M scoped-VMEM
# budget at abt=4 — grant them most of v5e's physical 128M instead of
# dropping to abt=2.
_AUG_BWD_VMEM = 117 * 1024 * 1024


def _cbspec(shape5, bt, rev_depth=None):
    """Chunk-blocked ``(nc, depth, ca, ...)`` saved-stream array:
    ``(1, 1, BT, ...)`` block at (batch, depth) grid position, the batch
    index split as (chunk, intra-chunk tile). Depth reversed for the
    consumer-side backward kernel."""
    ca = shape5[2]
    tpc = ca // bt
    nd = len(shape5)

    def imap(b, d, tpc=tpc, nd=nd):
        i = rev_depth - 1 - d if rev_depth is not None else d
        return (b // tpc, i, b % tpc) + (0,) * (nd - 3)

    return pl.BlockSpec(
        (1, 1, bt) + shape5[3:], imap, memory_space=pltpu.VMEM
    )


def _aug_layer(p, upd, e_rep, e_tile, mm, mm_edge, n_real):
    """The JVP-augmented layer map: 14-tuple state in, 14-tuple out."""

    def layer(h, xp, vp):
        h2, xp2, vp2 = layer_forward_wide(
            p, h, xp, vp, upd,
            e_rep=e_rep, e_tile=e_tile, mm=mm, mm_edge=mm_edge,
            n_real=n_real,
        )
        return h2, list(xp2), list(vp2)

    def aug(h, xp, vp, th, txp, tvp):
        out, tout = jax.jvp(layer, (h, xp, vp), (th, txp, tvp))
        return out + tout  # (h2, xp2, vp2, th2, txp2, tvp2)

    return aug


def make_ef_train2(
    *,
    n_heads: int = 4,
    update: Sequence[bool] | bool = True,
    batch_tile: int = 8,
    aug_batch_tile: int | None = None,
    matmul_dtype=None,
    precision=None,
    edge_matmul_dtype=None,
    edge_precision=None,
    resid_dtype=jnp.float32,
    resid_lowp=None,
    spatial_mode: str | None = None,
    pad_atoms: bool = False,
    chunk: int | None = 512,
    aug_mode: str = "resid",
    aug_chunk: int | None = 128,
    shared_chunk: int | None = 512,
    fused_primal: bool | None = None,
    interpret: bool = False,
):
    """Build ``ef(params, h, x) -> (e, f)`` whose primal runs the champion
    residual-streaming kernel pair and whose *backward* (the training
    gradient) runs a JVP-augmented kernel pair. First- and second-order
    gradients w.r.t. ``params``/``h``/``x`` are exact for any loss of
    ``(e, f)``.

    ``aug_batch_tile``: batch tile of the augmented kernels (their bodies
    trace several layer-equivalents of ops; the Mosaic compiler's memory
    scales with block size x op count, so this usually wants to be
    smaller than the primal's ``batch_tile``).

    ``aug_mode`` selects the augmented-backward formulation:

    - ``"retrace"`` — round-3 scheme: the aug-backward re-traces
      ``jax.vjp(jvp(layer))`` per layer (~5-6 forward-equivalents of
      in-kernel work; no residual traffic).
    - ``"resid"`` (default) — the aug-forward runs ``jax.jvp`` OF
      ``layer_fwd_resid``, streaming BOTH primal and tangent residuals;
      the aug-backward is then 3 hand-written-backward equivalents:
      ``layer_bwd_resid(c_p)`` for the primal cotangent + one in-kernel
      ``jax.jvp`` of ``layer_bwd_resid`` whose primal output propagates
      the tangent cotangent (``J^T c_t``) and whose tangent output is the
      Hessian-vector term (and the matching parameter-gradient term).
      Identical math (same measured bf16-tier error), ~1.2-1.4x faster.

    ``aug_chunk``: batch chunk of the resid aug pipeline (two residual
    streams for a whole chunk live in HBM between aug-fwd and aug-bwd;
    ~7 MB/eval at bf16).

    - ``"shared"`` — the primal itself streams residuals + boundary
      states and saves them across the ``custom_vjp`` boundary, so the
      backward runs NO primal recompute: a tangent-only forward
      (``layer_jvp_resid``) plus the same 3-backward aug pullback.

    - ``"fused"`` — "shared"'s math with the whole backward (tangent
      forward, seed head, aug pullback) in ONE Pallas program per chunk:
      tangent residuals/boundaries live in VMEM scratch, the primal
      stream is read once as full-depth resident blocks, cotangents ride
      the fori carry. Removes the tangent-stream HBM round trip, one
      primal-stream re-read, and two kernel launches per chunk — and,
      with only ONE whole-batch stream left in HBM, unlocks batch sizes
      the two-stream "shared" mode OOMs at.

    ``fused_primal``: run the primal as one fused program too (forward,
    readout, and force-backward per batch tile, with the saved streams as
    chunk-blocked output blocks the in-kernel backward reads straight
    back). Defaults to ``aug_mode == "fused"``; pass explicitly to
    decompose the two fusions when measuring.

    ``shared_chunk``: batch chunk of the *shared* backward. The saved
    primal stream is whole-batch (it must survive to the backward), but
    the tangent stream's liveness is bounded to one chunk: the primal
    writes its stream in a chunk-blocked ``(nc, depth, chunk, ...)``
    layout (pure index-map change — zero extra data movement) and the
    backward ``lax.map``s the (tangent-fwd, head, aug-bwd) pipeline over
    chunks, accumulating parameter grads. Unlocks batch >= 1024 (two
    whole-batch streams OOM HBM). Used only when it divides the batch
    and both tiles; otherwise the whole batch is one chunk.
    """
    from sake_tpu.kernels.resid_ef import resid_energy_forces

    if aug_mode not in ("retrace", "resid", "shared", "fused"):
        raise ValueError(f"unknown aug_mode {aug_mode!r}")
    ABT = aug_batch_tile if aug_batch_tile is not None else batch_tile
    BT_P = batch_tile
    mm = _make_mm_prec(matmul_dtype, precision)
    # In-kernel READOUT-head matmuls run at HIGHEST precision: Mosaic's
    # default-precision matmul equals a bf16 cast (f_rel ~2e-2, CLAUDE.md
    # measurement log), and in fused mode the head — whose pullback IS
    # the energy parameter gradient — lives inside the Pallas program
    # (shared mode's head runs in XLA at f32). Training 400 epochs with
    # the head at the Mosaic default left the energy MAE at 2.52 vs lax
    # 0.59 kcal/mol while forces converged (ACCURACY_MD17_FUSED.json);
    # the head is O(N·F·C) — 6-pass HIGHEST there costs ~nothing.
    mm_hi = _make_mm_prec(None, jax.lax.Precision.HIGHEST)
    mm_edge = None
    if edge_matmul_dtype is not None or edge_precision is not None:
        mm_edge = _make_mm_prec(edge_matmul_dtype, edge_precision)
    mm_t = _make_mmt_prec(matmul_dtype, precision)
    mm_edge_t = _make_mmt_prec(
        edge_matmul_dtype if edge_matmul_dtype is not None else matmul_dtype,
        edge_precision if edge_precision is not None else precision,
    )

    def primal_fn(params, h, x):
        return resid_energy_forces(
            params, h, x,
            n_heads=n_heads, update=update, batch_tile=batch_tile,
            matmul_dtype=matmul_dtype, precision=precision,
            edge_matmul_dtype=edge_matmul_dtype,
            edge_precision=edge_precision,
            resid_dtype=resid_dtype, resid_lowp=resid_lowp,
            spatial_mode=spatial_mode,
            pad_atoms=pad_atoms, chunk=chunk, interpret=interpret,
        )

    def _aug_grad(params, h, x, g_e, g_f):
        """d(params, h, x) of S = <g_e, E> - jvp_{g_f}(sum E): the exact
        pullback of (E, F) = (E, -dE/dx) under cotangents (g_e, g_f)."""
        B, N0, F_in = h.shape
        n_real = None
        if pad_atoms and N0 % 8:
            n_real = N0
            n_pad = (-N0) % 8
            h = jnp.pad(h, ((0, 0), (0, n_pad), (0, 0)))
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)))
            g_f = jnp.pad(g_f, ((0, 0), (0, n_pad), (0, 0)))
        N = h.shape[1]
        if B % ABT:
            raise ValueError(f"batch {B} not divisible by aug tile {ABT}")
        depth = len(params.layers)
        updates = (
            [update] * depth if isinstance(update, bool) else list(update)
        )
        upd_flags = jnp.asarray(updates, jnp.float32).reshape(depth, 1)
        F = params.w_embed.shape[-1]
        H = params.layers[0].edge.w_out0.shape[-1]
        e_rep, e_tile = head_expansion_matrices(H, n_heads)
        leaves = wide_stack(params, n_heads)
        grid = (B // ABT, depth)

        h0 = (
            mm(h.reshape(B * N, F_in), params.w_embed) + params.b_embed
        ).reshape(B, N, F)
        x_planes = [x[..., k : k + 1] for k in range(3)]
        t_planes = [g_f[..., k : k + 1] for k in range(3)]

        def read_p(lrefs):
            return {nm: r[0] for nm, r in zip(_LEAF_NAMES, lrefs)}

        # --- augmented forward kernel ---------------------------------------
        def fwd_kernel(*refs):
            (x0r, x1r, x2r, t0r, t1r, t2r, hr, updr, err, etr) = refs[:10]
            lrefs = refs[10 : 10 + len(leaves)]
            o = 10 + len(leaves)
            brefs = refs[o : o + 14]  # boundary outs: h, x*3, v*3, th, tx*3, tv*3
            hfin_ref, thfin_ref = refs[o + 14 : o + 16]
            scr = refs[o + 16 :]
            sh, sth = scr[0], scr[1]
            sx = scr[2:5]
            sv = scr[5:8]
            stx = scr[8:11]
            stv = scr[11:14]

            d = pl.program_id(1)

            @pl.when(d == 0)
            def _():
                sh[:] = hr[:]
                sth[:] = jnp.zeros_like(hr[:])
                for k, (xr, tr) in enumerate(
                    zip((x0r, x1r, x2r), (t0r, t1r, t2r))
                ):
                    sx[k][:] = xr[:]
                    sv[k][:] = jnp.zeros_like(xr[:])
                    stx[k][:] = tr[:]
                    stv[k][:] = jnp.zeros_like(xr[:])

            state = (
                sh[:],
                [sx[k][:] for k in range(3)],
                [sv[k][:] for k in range(3)],
                sth[:],
                [stx[k][:] for k in range(3)],
                [stv[k][:] for k in range(3)],
            )
            # stream this layer's INPUT augmented state
            flat_in = (
                [state[0]] + state[1] + state[2]
                + [state[3]] + state[4] + state[5]
            )
            for br, val in zip(brefs, flat_in):
                br[0] = val

            aug = _aug_layer(
                read_p(lrefs), updr[d, 0], err[:], etr[:], mm, mm_edge,
                n_real,
            )
            h2, xp2, vp2, th2, txp2, tvp2 = aug(*state)
            sh[:] = h2
            sth[:] = th2
            for k in range(3):
                sx[k][:] = xp2[k]
                sv[k][:] = vp2[k]
                stx[k][:] = txp2[k]
                stv[k][:] = tvp2[k]
            hfin_ref[:] = h2
            thfin_ref[:] = th2

        hblock = jax.ShapeDtypeStruct((depth, B, N, F), jnp.float32)
        bplane = jax.ShapeDtypeStruct((depth, B, N, 1), jnp.float32)
        fwd_outs = pl.pallas_call(
            fwd_kernel,
            grid=grid,
            out_shape=tuple(
                [hblock] + [bplane] * 6 + [hblock] + [bplane] * 6
                + [jax.ShapeDtypeStruct((B, N, F), jnp.float32)] * 2
            ),
            in_specs=(
                [_bspec((B, N, 1), ABT)] * 6
                + [_bspec((B, N, F), ABT), _flag_spec(depth)]
                + [_full_spec(e_rep), _full_spec(e_tile)]
                + _leaf_specs(leaves)
            ),
            out_specs=tuple(
                [_dbspec((depth, B, N, F), ABT)]
                + [_dbspec((depth, B, N, 1), ABT)] * 6
                + [_dbspec((depth, B, N, F), ABT)]
                + [_dbspec((depth, B, N, 1), ABT)] * 6
                + [_bspec((B, N, F), ABT)] * 2
            ),
            scratch_shapes=[pltpu.VMEM((ABT, N, F), jnp.float32)] * 2
            + [pltpu.VMEM((ABT, N, 1), jnp.float32)] * 12,
            compiler_params=_compiler_params(),
            interpret=interpret,
        )(*x_planes, *t_planes, h0, upd_flags, e_rep, e_tile, *leaves)
        boundary = fwd_outs[:14]
        h_fin, th_fin = fwd_outs[14], fwd_outs[15]

        # --- XLA head: seeds + readout parameter grads ----------------------
        def head(w_out0, b_out0, w_out1, b_out1, hf, thf):
            def readout_e(h_):
                out = mm(
                    _silu(mm(h_.reshape(B * N, F), w_out0) + b_out0), w_out1
                ) + b_out1
                out = out.reshape(B, N, -1)
                if n_real is not None:
                    out = out[:, :n_real]
                return out.sum(axis=(-2, -1))

            e, e_dot = jax.jvp(readout_e, (hf,), (thf,))
            return (g_e * e).sum() - e_dot.sum()

        head_grads = jax.grad(head, argnums=(0, 1, 2, 3, 4, 5))(
            params.w_out0, params.b_out0, params.w_out1, params.b_out1,
            h_fin, th_fin,
        )
        d_wo0, d_bo0, d_wo1, d_bo1, dh_fin, dth_fin = head_grads

        # --- augmented backward kernel --------------------------------------
        def bwd_kernel(*refs):
            brefs = refs[:14]
            dhf_ref, dthf_ref, updr, err, etr = refs[14:19]
            lrefs = refs[19 : 19 + len(leaves)]
            o = 19 + len(leaves)
            outs = refs[o : o + 5]  # dh0, dx*3, dth0 (dth0 unused; debug)
            grefs = refs[o + 5 : o + 5 + len(leaves)]
            scr = refs[o + 5 + len(leaves) :]
            sdh, sdth = scr[0], scr[1]
            sdx = scr[2:5]
            sdv = scr[5:8]
            sdtx = scr[8:11]
            sdtv = scr[11:14]

            b = pl.program_id(0)
            t = pl.program_id(1)

            @pl.when(jnp.logical_and(b == 0, t == 0))
            def _():
                for gr in grefs:
                    gr[:] = jnp.zeros_like(gr)

            @pl.when(t == 0)
            def _():
                sdh[:] = dhf_ref[:]
                sdth[:] = dthf_ref[:]
                zero = jnp.zeros((ABT, N, 1), jnp.float32)
                for k in range(3):
                    sdx[k][:] = zero
                    sdv[k][:] = zero
                    sdtx[k][:] = zero
                    sdtv[k][:] = zero

            h_in = brefs[0][0]
            xp_in = [brefs[1 + k][0] for k in range(3)]
            vp_in = [brefs[4 + k][0] for k in range(3)]
            th_in = brefs[7][0]
            txp_in = [brefs[8 + k][0] for k in range(3)]
            tvp_in = [brefs[11 + k][0] for k in range(3)]

            i = depth - 1 - t
            upd = updr[i, 0]
            p = read_p(lrefs)

            def f(p_, h_, xp_, vp_, th_, txp_, tvp_):
                aug = _aug_layer(
                    p_, upd, err[:], etr[:], mm, mm_edge, n_real
                )
                h2, xp2, vp2, th2, txp2, tvp2 = aug(
                    h_, xp_, vp_, th_, txp_, tvp_
                )
                return h2, list(xp2), list(vp2), th2, list(txp2), list(tvp2)

            _, vjp = jax.vjp(f, p, h_in, xp_in, vp_in, th_in, txp_in, tvp_in)
            cot = (
                sdh[:],
                [sdx[k][:] for k in range(3)],
                [sdv[k][:] for k in range(3)],
                sdth[:],
                [sdtx[k][:] for k in range(3)],
                [sdtv[k][:] for k in range(3)],
            )
            dp, dh2, dxp2, dvp2, dth2, dtxp2, dtvp2 = vjp(cot)

            for nm, gr in zip(_LEAF_NAMES, grefs):
                gr[i] += dp[nm]
            sdh[:] = dh2
            sdth[:] = dth2
            for k in range(3):
                sdx[k][:] = dxp2[k]
                sdv[k][:] = dvp2[k]
                sdtx[k][:] = dtxp2[k]
                sdtv[k][:] = dtvp2[k]
            outs[0][:] = dh2
            outs[1][:] = dxp2[0]
            outs[2][:] = dxp2[1]
            outs[3][:] = dxp2[2]
            outs[4][:] = dth2

        plane = jax.ShapeDtypeStruct((B, N, 1), jnp.float32)
        gspec = [
            pl.BlockSpec(a.shape, (lambda bb, dd, nd=a.ndim: (0,) * nd),
                         memory_space=pltpu.VMEM)
            for a in leaves
        ]
        outs = pl.pallas_call(
            bwd_kernel,
            grid=grid,
            out_shape=tuple(
                [jax.ShapeDtypeStruct((B, N, F), jnp.float32)]
                + [plane] * 3
                + [jax.ShapeDtypeStruct((B, N, F), jnp.float32)]
                + [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in leaves]
            ),
            in_specs=(
                [_dbspec((depth, B, N, F), ABT, rev_depth=depth)]
                + [_dbspec((depth, B, N, 1), ABT, rev_depth=depth)] * 6
                + [_dbspec((depth, B, N, F), ABT, rev_depth=depth)]
                + [_dbspec((depth, B, N, 1), ABT, rev_depth=depth)] * 6
                + [_bspec((B, N, F), ABT)] * 2
                + [_flag_spec(depth)]
                + [_full_spec(e_rep), _full_spec(e_tile)]
                + _leaf_specs(leaves, rev_depth=depth)
            ),
            out_specs=tuple(
                [_bspec((B, N, F), ABT)]
                + [_bspec((B, N, 1), ABT)] * 3
                + [_bspec((B, N, F), ABT)]
                + gspec
            ),
            scratch_shapes=[pltpu.VMEM((ABT, N, F), jnp.float32)] * 2
            + [pltpu.VMEM((ABT, N, 1), jnp.float32)] * 12,
            compiler_params=_compiler_params(),
            interpret=interpret,
        )(*boundary, dh_fin, dth_fin, upd_flags, e_rep, e_tile, *leaves)
        dh0 = outs[0]
        dxp = outs[1:4]
        leaf_grads = dict(zip(_LEAF_NAMES, outs[5:]))

        # --- embedding pullback + pytree assembly (XLA) ---------------------
        dh0_2d = dh0.reshape(B * N, F)
        d_we = jax.lax.dot_general(
            h.reshape(B * N, F_in), dh0_2d,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d_be = dh0_2d.sum(axis=0)
        d_h = (dh0_2d @ params.w_embed.T).reshape(B, N, F_in)
        d_x = jnp.concatenate(dxp, axis=-1)
        if n_real is not None:
            d_h = d_h[:, :n_real]
            d_x = d_x[:, :n_real]
        d_layers = tuple(
            unsplit_layer_grads(
                {nm: leaf_grads[nm][i] for nm in _LEAF_NAMES}
            )
            for i in range(depth)
        )
        d_params = ModelParams(
            w_embed=d_we, b_embed=d_be, layers=d_layers,
            w_out0=d_wo0, b_out0=d_bo0, w_out1=d_wo1, b_out1=d_bo1,
        )
        return d_params, d_h, d_x

    def _aug_grad_resid(params, h, x, g_e, g_f):
        """``aug_mode="resid"`` backward. For the augmented layer map
        ``A(s, t) = (L(s), J(s)t)`` with output cotangents ``(c_p, c_t)``:

            d s = J^T c_p + [d_s(J(s)t)]^T c_t
            d t = J^T c_t
            d p = (d_p L)^T c_p + [d_p(J(s)t)]^T c_t

        ``layer_bwd_resid`` evaluates ``J^T c`` (+ ``(d_p L)^T c``) from
        saved residuals; ``jax.jvp`` OF it at ``(resid, inputs)`` along
        ``(tresid, tangent inputs)`` yields ``d t`` as its primal output
        and both Hessian-term contributions as its tangent output — one
        trace, ~2 backward-equivalents, no layer re-forward. The aug
        forward is ``jax.jvp`` of ``layer_fwd_resid`` so the tangent of
        the residual dict (``tresid``) comes out for free.
        """
        B, N0, F_in = h.shape
        n_real = None
        if pad_atoms and N0 % 8:
            n_real = N0
            n_pad = (-N0) % 8
            h = jnp.pad(h, ((0, 0), (0, n_pad), (0, 0)))
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)))
            g_f = jnp.pad(g_f, ((0, 0), (0, n_pad), (0, 0)))
        N = h.shape[1]
        if B % ABT:
            raise ValueError(f"batch {B} not divisible by aug tile {ABT}")
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

        h0_full = (
            mm(h.reshape(B * N, F_in), params.w_embed) + params.b_embed
        ).reshape(B, N, F)
        xp_full = [x[..., k : k + 1] for k in range(3)]
        tp_full = [g_f[..., k : k + 1] for k in range(3)]

        def read_p(lrefs):
            return {nm: r[0] for nm, r in zip(_LEAF_NAMES, lrefs)}

        def _pipe(h0, x_planes, t_planes, g_e_c):
            Bc = h0.shape[0]
            grid = (Bc // ABT, depth)
            resid_shapes = [
                ((depth, Bc, N * N, ech[nm]), nm) for nm in _EDGE_RESIDS
            ] + [((depth, Bc, N, nch[nm]), nm) for nm in _NODE_RESIDS]
            n_resid = len(resid_shapes)

            # --- aug forward: jvp of layer_fwd_resid, streams both
            # residual streams + augmented boundary states ----------------
            def fwd_kernel(*refs):
                (x0r, x1r, x2r, t0r, t1r, t2r, hr, updr, err, etr) = refs[:10]
                lrefs = refs[10 : 10 + len(leaves)]
                o = 10 + len(leaves)
                brefs = refs[o : o + 14]
                hfin_ref, thfin_ref = refs[o + 14 : o + 16]
                rrefs = refs[o + 16 : o + 16 + n_resid]
                trrefs = refs[o + 16 + n_resid : o + 16 + 2 * n_resid]
                scr = refs[o + 16 + 2 * n_resid :]
                sh, sth = scr[0], scr[1]
                sx = scr[2:5]
                sv = scr[5:8]
                stx = scr[8:11]
                stv = scr[11:14]

                d = pl.program_id(1)

                @pl.when(d == 0)
                def _():
                    sh[:] = hr[:]
                    sth[:] = jnp.zeros_like(hr[:])
                    for k, (xr, tr) in enumerate(
                        zip((x0r, x1r, x2r), (t0r, t1r, t2r))
                    ):
                        sx[k][:] = xr[:]
                        sv[k][:] = jnp.zeros_like(xr[:])
                        stx[k][:] = tr[:]
                        stv[k][:] = jnp.zeros_like(xr[:])

                state = (
                    sh[:],
                    [sx[k][:] for k in range(3)],
                    [sv[k][:] for k in range(3)],
                    sth[:],
                    [stx[k][:] for k in range(3)],
                    [stv[k][:] for k in range(3)],
                )
                flat_in = (
                    [state[0]] + state[1] + state[2]
                    + [state[3]] + state[4] + state[5]
                )
                for br, val in zip(brefs, flat_in):
                    br[0] = val

                p = read_p(lrefs)
                upd = updr[d, 0]

                def layer(h_, xp_, vp_):
                    h2, xp2, vp2, resid = layer_fwd_resid(
                        p, h_, xp_, vp_, upd,
                        e_rep=err[:], e_tile=etr[:], mm=mm, mm_edge=mm_edge,
                        n_real=n_real,
                    )
                    return (h2, list(xp2), list(vp2)), resid

                ((h2, xp2, vp2), resid), ((th2, txp2, tvp2), tresid) = (
                    jax.jvp(
                        layer,
                        (state[0], state[1], state[2]),
                        (state[3], state[4], state[5]),
                    )
                )
                for (_, nm), rr in zip(resid_shapes, rrefs):
                    rr[0] = resid[nm].astype(rr.dtype)
                for (_, nm), rr in zip(resid_shapes, trrefs):
                    rr[0] = tresid[nm].astype(rr.dtype)
                sh[:] = h2
                sth[:] = th2
                for k in range(3):
                    sx[k][:] = xp2[k]
                    sv[k][:] = vp2[k]
                    stx[k][:] = txp2[k]
                    stv[k][:] = tvp2[k]
                hfin_ref[:] = h2
                thfin_ref[:] = th2

            hblock = jax.ShapeDtypeStruct((depth, Bc, N, F), jnp.float32)
            bplane = jax.ShapeDtypeStruct((depth, Bc, N, 1), jnp.float32)
            rstructs = [
                jax.ShapeDtypeStruct(
                    s, _resid_dtype_for(nm, resid_dtype, resid_lowp)
                )
                for s, nm in resid_shapes
            ]
            fwd_outs = pl.pallas_call(
                fwd_kernel,
                grid=grid,
                out_shape=tuple(
                    [hblock] + [bplane] * 6 + [hblock] + [bplane] * 6
                    + [jax.ShapeDtypeStruct((Bc, N, F), jnp.float32)] * 2
                    + rstructs + rstructs
                ),
                in_specs=(
                    [_bspec((Bc, N, 1), ABT)] * 6
                    + [_bspec((Bc, N, F), ABT), _flag_spec(depth)]
                    + [_full_spec(e_rep), _full_spec(e_tile)]
                    + _leaf_specs(leaves)
                ),
                out_specs=tuple(
                    [_dbspec((depth, Bc, N, F), ABT)]
                    + [_dbspec((depth, Bc, N, 1), ABT)] * 6
                    + [_dbspec((depth, Bc, N, F), ABT)]
                    + [_dbspec((depth, Bc, N, 1), ABT)] * 6
                    + [_bspec((Bc, N, F), ABT)] * 2
                    + [_dbspec(s, ABT) for s, _ in resid_shapes]
                    + [_dbspec(s, ABT) for s, _ in resid_shapes]
                ),
                scratch_shapes=[pltpu.VMEM((ABT, N, F), jnp.float32)] * 2
                + [pltpu.VMEM((ABT, N, 1), jnp.float32)] * 12,
                compiler_params=_compiler_params(),
                interpret=interpret,
            )(*x_planes, *t_planes, h0, upd_flags, e_rep, e_tile, *leaves)
            boundary = fwd_outs[:14]
            h_fin, th_fin = fwd_outs[14], fwd_outs[15]
            resid_arrays = fwd_outs[16 : 16 + n_resid]
            tresid_arrays = fwd_outs[16 + n_resid :]

            # --- XLA head: seeds + readout parameter grads ----------------
            def head(w_out0, b_out0, w_out1, b_out1, hf, thf):
                def readout_e(h_):
                    out = mm(
                        _silu(mm(h_.reshape(Bc * N, F), w_out0) + b_out0),
                        w_out1,
                    ) + b_out1
                    out = out.reshape(Bc, N, -1)
                    if n_real is not None:
                        out = out[:, :n_real]
                    return out.sum(axis=(-2, -1))

                e, e_dot = jax.jvp(readout_e, (hf,), (thf,))
                return (g_e_c * e).sum() - e_dot.sum()

            head_grads = jax.grad(head, argnums=(0, 1, 2, 3, 4, 5))(
                params.w_out0, params.b_out0, params.w_out1, params.b_out1,
                h_fin, th_fin,
            )
            d_wo0, d_bo0, d_wo1, d_bo1, dh_fin, dth_fin = head_grads

            # --- aug backward: 3 backward-equivalents on saved residuals --
            def bwd_kernel(*refs):
                brefs = refs[:14]
                dhf_ref, dthf_ref, updr, err, etr = refs[14:19]
                lrefs = refs[19 : 19 + len(leaves)]
                o = 19 + len(leaves)
                rrefs = refs[o : o + n_resid]
                trrefs = refs[o + n_resid : o + 2 * n_resid]
                o = o + 2 * n_resid
                outs = refs[o : o + 5]
                grefs = refs[o + 5 : o + 5 + len(leaves)]
                scr = refs[o + 5 + len(leaves) :]
                sdh, sdth = scr[0], scr[1]
                sdx = scr[2:5]
                sdv = scr[5:8]
                sdtx = scr[8:11]
                sdtv = scr[11:14]

                b = pl.program_id(0)
                t = pl.program_id(1)

                @pl.when(jnp.logical_and(b == 0, t == 0))
                def _():
                    for gr in grefs:
                        gr[:] = jnp.zeros_like(gr)

                @pl.when(t == 0)
                def _():
                    sdh[:] = dhf_ref[:]
                    sdth[:] = dthf_ref[:]
                    zero = jnp.zeros((ABT, N, 1), jnp.float32)
                    for k in range(3):
                        sdx[k][:] = zero
                        sdv[k][:] = zero
                        sdtx[k][:] = zero
                        sdtv[k][:] = zero

                h_in = brefs[0][0]
                xp_in = [brefs[1 + k][0] for k in range(3)]
                vp_in = [brefs[4 + k][0] for k in range(3)]
                th_in = brefs[7][0]
                txp_in = [brefs[8 + k][0] for k in range(3)]
                tvp_in = [brefs[11 + k][0] for k in range(3)]

                resid = {
                    nm: rr[0].astype(jnp.float32)
                    for (_, nm), rr in zip(resid_shapes, rrefs)
                }
                tresid = {
                    nm: rr[0].astype(jnp.float32)
                    for (_, nm), rr in zip(resid_shapes, trrefs)
                }

                i = depth - 1 - t
                upd = updr[i, 0]
                p = read_p(lrefs)
                kw = dict(
                    e_rep=err[:], e_tile=etr[:], mm=mm, mm_edge=mm_edge,
                    n_real=n_real, mm_t=mm_t, mm_edge_t=mm_edge_t,
                    want_param_grads=True,
                )

                # J^T c_p + (d_p L)^T c_p
                dh_a, dxp_a, dvp_a, dW_a = layer_bwd_resid(
                    p, resid, h_in, xp_in, vp_in, upd,
                    sdh[:], [sdx[k][:] for k in range(3)],
                    [sdv[k][:] for k in range(3)], **kw
                )

                # primal of the jvp = J^T c_t (tangent-cotangent chain);
                # tangent of the jvp = the two Hessian terms. The primal
                # dW ((d_p L)^T c_t) is NOT a term of dp — unused, DCE'd.
                ct_h = sdth[:]
                ct_x = [sdtx[k][:] for k in range(3)]
                ct_v = [sdtv[k][:] for k in range(3)]

                def bwd_fn(resid_, h_, xp_, vp_):
                    return layer_bwd_resid(
                        p, resid_, h_, xp_, vp_, upd, ct_h, ct_x, ct_v, **kw
                    )

                ((dth2, dtxp2, dtvp2, _dW_unused), (hc, xc, vc, dW_t)) = (
                    jax.jvp(
                        bwd_fn,
                        (resid, h_in, xp_in, vp_in),
                        (tresid, th_in, txp_in, tvp_in),
                    )
                )

                for nm, gr in zip(_LEAF_NAMES, grefs):
                    gr[i] += dW_a[nm] + dW_t[nm]
                dh2 = dh_a + hc
                dxp2 = [dxp_a[k] + xc[k] for k in range(3)]
                dvp2 = [dvp_a[k] + vc[k] for k in range(3)]
                sdh[:] = dh2
                sdth[:] = dth2
                for k in range(3):
                    sdx[k][:] = dxp2[k]
                    sdv[k][:] = dvp2[k]
                    sdtx[k][:] = dtxp2[k]
                    sdtv[k][:] = dtvp2[k]
                outs[0][:] = dh2
                outs[1][:] = dxp2[0]
                outs[2][:] = dxp2[1]
                outs[3][:] = dxp2[2]
                outs[4][:] = dth2

            plane = jax.ShapeDtypeStruct((Bc, N, 1), jnp.float32)
            gspec = [
                pl.BlockSpec(
                    a.shape, (lambda bb, dd, nd=a.ndim: (0,) * nd),
                    memory_space=pltpu.VMEM,
                )
                for a in leaves
            ]
            outs = pl.pallas_call(
                bwd_kernel,
                grid=grid,
                out_shape=tuple(
                    [jax.ShapeDtypeStruct((Bc, N, F), jnp.float32)]
                    + [plane] * 3
                    + [jax.ShapeDtypeStruct((Bc, N, F), jnp.float32)]
                    + [
                        jax.ShapeDtypeStruct(a.shape, jnp.float32)
                        for a in leaves
                    ]
                ),
                in_specs=(
                    [_dbspec((depth, Bc, N, F), ABT, rev_depth=depth)]
                    + [_dbspec((depth, Bc, N, 1), ABT, rev_depth=depth)] * 6
                    + [_dbspec((depth, Bc, N, F), ABT, rev_depth=depth)]
                    + [_dbspec((depth, Bc, N, 1), ABT, rev_depth=depth)] * 6
                    + [_bspec((Bc, N, F), ABT)] * 2
                    + [_flag_spec(depth)]
                    + [_full_spec(e_rep), _full_spec(e_tile)]
                    + _leaf_specs(leaves, rev_depth=depth)
                    + [
                        _dbspec(s, ABT, rev_depth=depth)
                        for s, _ in resid_shapes
                    ]
                    + [
                        _dbspec(s, ABT, rev_depth=depth)
                        for s, _ in resid_shapes
                    ]
                ),
                out_specs=tuple(
                    [_bspec((Bc, N, F), ABT)]
                    + [_bspec((Bc, N, 1), ABT)] * 3
                    + [_bspec((Bc, N, F), ABT)]
                    + gspec
                ),
                scratch_shapes=[pltpu.VMEM((ABT, N, F), jnp.float32)] * 2
                + [pltpu.VMEM((ABT, N, 1), jnp.float32)] * 12,
                compiler_params=_compiler_params(
                    vmem_limit=_AUG_BWD_VMEM
                ),
                interpret=interpret,
            )(*boundary, dh_fin, dth_fin, upd_flags, e_rep, e_tile, *leaves,
              *resid_arrays, *tresid_arrays)
            return (
                outs[0], outs[1], outs[2], outs[3],
                d_wo0, d_bo0, d_wo1, d_bo1, *outs[5:],
            )

        ca = aug_chunk
        if ca is not None and B > ca and B % ca == 0 and ca % ABT == 0:
            nc = B // ca
            xs = (
                h0_full.reshape(nc, ca, N, F),
                *[p_.reshape(nc, ca, N, 1) for p_ in xp_full],
                *[p_.reshape(nc, ca, N, 1) for p_ in tp_full],
                g_e.reshape(nc, ca),
            )
            res = jax.lax.map(
                lambda a: _pipe(a[0], [a[1], a[2], a[3]],
                                [a[4], a[5], a[6]], a[7]),
                xs,
            )
            dh0 = res[0].reshape(B, N, F)
            dxp = [r.reshape(B, N, 1) for r in res[1:4]]
            d_wo0, d_bo0, d_wo1, d_bo1 = (r.sum(axis=0) for r in res[4:8])
            leaf_list = [r.sum(axis=0) for r in res[8:]]
        else:
            res = _pipe(h0_full, xp_full, tp_full, g_e)
            dh0 = res[0]
            dxp = list(res[1:4])
            d_wo0, d_bo0, d_wo1, d_bo1 = res[4:8]
            leaf_list = list(res[8:])
        leaf_grads = dict(zip(_LEAF_NAMES, leaf_list))

        # --- embedding pullback + pytree assembly (XLA) ---------------------
        dh0_2d = dh0.reshape(B * N, F)
        d_we = jax.lax.dot_general(
            h.reshape(B * N, F_in), dh0_2d,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d_be = dh0_2d.sum(axis=0)
        d_h = (dh0_2d @ params.w_embed.T).reshape(B, N, F_in)
        d_x = jnp.concatenate(dxp, axis=-1)
        if n_real is not None:
            d_h = d_h[:, :n_real]
            d_x = d_x[:, :n_real]
        d_layers = tuple(
            unsplit_layer_grads(
                {nm: leaf_grads[nm][i] for nm in _LEAF_NAMES}
            )
            for i in range(depth)
        )
        d_params = ModelParams(
            w_embed=d_we, b_embed=d_be, layers=d_layers,
            w_out0=d_wo0, b_out0=d_bo0, w_out1=d_wo1, b_out1=d_bo1,
        )
        return d_params, d_h, d_x

    # ------------------------------------------------------------------
    # aug_mode="shared": the primal streams residuals + boundary states
    # ONCE and saves them across the custom_vjp boundary; the training
    # backward is then a hand-written tangent-only forward
    # (``layer_jvp_resid``, ~1 forward-equivalent — no primal recompute)
    # plus the same 3-backward aug pullback as aug_mode="resid". Whole
    # batch, unchunked: residuals live in HBM between primal and
    # backward (~3.4 MB/eval at bf16 — batch <= ~1024 on a 16G chip).
    # ------------------------------------------------------------------

    def _shared_prep(params, h, x):
        B, N0, F_in = h.shape
        n_real = None
        if pad_atoms and N0 % 8:
            n_real = N0
            n_pad = (-N0) % 8
            h = jnp.pad(h, ((0, 0), (0, n_pad), (0, 0)))
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)))
        N = h.shape[1]
        if B % BT_P or B % ABT:
            raise ValueError(
                f"batch {B} must divide batch_tile {BT_P} and aug tile {ABT}"
            )
        depth = len(params.layers)
        updates = (
            [update] * depth if isinstance(update, bool) else list(update)
        )
        upd_flags = jnp.asarray(updates, jnp.float32).reshape(depth, 1)
        F = params.w_embed.shape[-1]
        lay0 = params.layers[0]
        C = lay0.w_xmix.shape[-1]
        e_rep, e_tile = head_expansion_matrices(
            lay0.edge.w_out0.shape[-1], n_heads
        )
        leaves = wide_stack(params, n_heads)
        ech = _edge_channels(
            lay0.edge.w_in.shape[-1], lay0.edge.w_out0.shape[-1], n_heads, C
        )
        nch = _node_channels(lay0, C)
        ca = B
        if (
            shared_chunk
            and B > shared_chunk
            and B % shared_chunk == 0
            and shared_chunk % BT_P == 0
            and shared_chunk % ABT == 0
        ):
            ca = shared_chunk
        nc = B // ca
        # per-chunk (4-D) shapes; the saved arrays are (nc,) + these
        resid_shapes = [
            ((depth, ca, N * N, ech[nm]), nm) for nm in _EDGE_RESIDS
        ] + [((depth, ca, N, nch[nm]), nm) for nm in _NODE_RESIDS]
        h0 = (
            mm(h.reshape(B * N, F_in), params.w_embed) + params.b_embed
        ).reshape(B, N, F)
        return dict(
            B=B, N=N, F=F, F_in=F_in, depth=depth, n_real=n_real,
            nc=nc, ca=ca,
            upd_flags=upd_flags, e_rep=e_rep, e_tile=e_tile, leaves=leaves,
            resid_shapes=resid_shapes, h0=h0,
            x_planes=[x[..., k : k + 1] for k in range(3)],
        )

    def read_p_(lrefs):
        return {nm: r[0] for nm, r in zip(_LEAF_NAMES, lrefs)}

    def _shared_readout(params, c, h_fin):
        B, N, F, n_real = c["B"], c["N"], c["F"], c["n_real"]

        def readout_e(h_):
            out = mm(
                _silu(
                    mm(h_.reshape(B * N, F), params.w_out0) + params.b_out0
                ),
                params.w_out1,
            ) + params.b_out1
            out = out.reshape(B, N, -1)
            if n_real is not None:
                out = out[:, :n_real]
            return out.sum(axis=(-2, -1))

        return readout_e

    def _shared_primal(params, h, x):
        c = _shared_prep(params, h, x)
        B, N, F, depth = c["B"], c["N"], c["F"], c["depth"]
        nc, ca = c["nc"], c["ca"]
        leaves, resid_shapes = c["leaves"], c["resid_shapes"]
        n_resid = len(resid_shapes)
        n_real = c["n_real"]
        grid = (B // BT_P, depth)

        def fwd_kernel(*refs):
            x0r, x1r, x2r, hr, updr, err, etr = refs[:7]
            lrefs = refs[7 : 7 + len(leaves)]
            o = 7 + len(leaves)
            brefs = refs[o : o + 7]
            hfin_ref = refs[o + 7]
            rrefs = refs[o + 8 : o + 8 + n_resid]
            scr = refs[o + 8 + n_resid :]
            sh = scr[0]
            sx = scr[1:4]
            sv = scr[4:7]
            d = pl.program_id(1)

            @pl.when(d == 0)
            def _():
                sh[:] = hr[:]
                for k, xr in enumerate((x0r, x1r, x2r)):
                    sx[k][:] = xr[:]
                    sv[k][:] = jnp.zeros_like(xr[:])

            hc = sh[:]
            xp = [sx[k][:] for k in range(3)]
            vp = [sv[k][:] for k in range(3)]
            for br, val in zip(brefs, [hc] + xp + vp):
                br[0, 0] = val
            h2, xp2, vp2, resid = layer_fwd_resid(
                read_p_(lrefs), hc, xp, vp, updr[d, 0],
                e_rep=err[:], e_tile=etr[:], mm=mm, mm_edge=mm_edge,
                n_real=n_real,
            )
            for (_, nm), rr in zip(resid_shapes, rrefs):
                rr[0, 0] = resid[nm].astype(rr.dtype)
            sh[:] = h2
            for k in range(3):
                sx[k][:] = xp2[k]
                sv[k][:] = vp2[k]
            hfin_ref[:] = h2

        bplane = jax.ShapeDtypeStruct((nc, depth, ca, N, 1), jnp.float32)
        outs = pl.pallas_call(
            fwd_kernel,
            grid=grid,
            out_shape=tuple(
                [jax.ShapeDtypeStruct((nc, depth, ca, N, F), jnp.float32)]
                + [bplane] * 6
                + [jax.ShapeDtypeStruct((B, N, F), jnp.float32)]
                + [
                    jax.ShapeDtypeStruct(
                        (nc, *s),
                        _resid_dtype_for(nm, resid_dtype, resid_lowp),
                    )
                    for s, nm in resid_shapes
                ]
            ),
            in_specs=(
                [_bspec((B, N, 1), BT_P)] * 3
                + [_bspec((B, N, F), BT_P), _flag_spec(depth)]
                + [_full_spec(c["e_rep"]), _full_spec(c["e_tile"])]
                + _leaf_specs(leaves)
            ),
            out_specs=tuple(
                [_cbspec((nc, depth, ca, N, F), BT_P)]
                + [_cbspec((nc, depth, ca, N, 1), BT_P)] * 6
                + [_bspec((B, N, F), BT_P)]
                + [_cbspec((nc, *s), BT_P) for s, _ in resid_shapes]
            ),
            scratch_shapes=[pltpu.VMEM((BT_P, N, F), jnp.float32)]
            + [pltpu.VMEM((BT_P, N, 1), jnp.float32)] * 6,
            compiler_params=_compiler_params(),
            interpret=interpret,
        )(*c["x_planes"], c["h0"], c["upd_flags"], c["e_rep"], c["e_tile"],
          *leaves)
        boundary = outs[:7]
        h_fin = outs[7]
        resid_arrays = outs[8:]

        e, readout_vjp = jax.vjp(_shared_readout(params, c, h_fin), h_fin)
        (dh_fin,) = readout_vjp(jnp.ones_like(e))

        # F backward: input-cotangent-only hand-written pullback
        def fbwd_kernel(*refs):
            brefs = refs[:7]
            dhf_ref, updr, err, etr = refs[7:11]
            lrefs = refs[11 : 11 + len(leaves)]
            o = 11 + len(leaves)
            rrefs = refs[o : o + n_resid]
            dx0_ref, dx1_ref, dx2_ref = refs[o + n_resid : o + n_resid + 3]
            scr = refs[o + n_resid + 3 :]
            sdh = scr[0]
            sdx = scr[1:4]
            sdv = scr[4:7]
            t = pl.program_id(1)

            @pl.when(t == 0)
            def _():
                sdh[:] = dhf_ref[:]
                zero = jnp.zeros((BT_P, N, 1), jnp.float32)
                for k in range(3):
                    sdx[k][:] = zero
                    sdv[k][:] = zero

            h_in = brefs[0][0, 0]
            xp_in = [brefs[1 + k][0, 0] for k in range(3)]
            vp_in = [brefs[4 + k][0, 0] for k in range(3)]
            resid = {
                nm: rr[0, 0].astype(jnp.float32)
                for (_, nm), rr in zip(resid_shapes, rrefs)
            }
            upd = updr[depth - 1 - t, 0]
            dh2, dxp2, dvp2 = layer_bwd_resid(
                read_p_(lrefs), resid, h_in, xp_in, vp_in, upd,
                sdh[:], [sdx[k][:] for k in range(3)],
                [sdv[k][:] for k in range(3)],
                e_rep=err[:], e_tile=etr[:], mm=mm, mm_edge=mm_edge,
                n_real=n_real,
            )
            sdh[:] = dh2
            for k in range(3):
                sdx[k][:] = dxp2[k]
                sdv[k][:] = dvp2[k]
            dx0_ref[:] = dxp2[0]
            dx1_ref[:] = dxp2[1]
            dx2_ref[:] = dxp2[2]

        plane = jax.ShapeDtypeStruct((B, N, 1), jnp.float32)
        dx0, dx1, dx2 = pl.pallas_call(
            fbwd_kernel,
            grid=grid,
            out_shape=(plane, plane, plane),
            in_specs=(
                [_cbspec((nc, depth, ca, N, F), BT_P, rev_depth=depth)]
                + [
                    _cbspec((nc, depth, ca, N, 1), BT_P, rev_depth=depth)
                ] * 6
                + [_bspec((B, N, F), BT_P)]
                + [_flag_spec(depth)]
                + [_full_spec(c["e_rep"]), _full_spec(c["e_tile"])]
                + _leaf_specs(leaves, rev_depth=depth)
                + [
                    _cbspec((nc, *s), BT_P, rev_depth=depth)
                    for s, _ in resid_shapes
                ]
            ),
            out_specs=(_bspec((B, N, 1), BT_P),) * 3,
            scratch_shapes=[pltpu.VMEM((BT_P, N, F), jnp.float32)]
            + [pltpu.VMEM((BT_P, N, 1), jnp.float32)] * 6,
            compiler_params=_compiler_params(),
            interpret=interpret,
        )(*boundary, dh_fin, c["upd_flags"], c["e_rep"], c["e_tile"],
          *leaves, *resid_arrays)
        f = -jnp.concatenate([dx0, dx1, dx2], axis=-1)
        if n_real is not None:
            f = f[:, :n_real]
        return (e, f), boundary, h_fin, resid_arrays

    # Fused primal (used when ``aug_mode="fused"``): forward, readout,
    # and force-backward in ONE Pallas program per batch tile (the
    # ``one_ef`` orchestration), with the residual + boundary streams
    # written to chunk-blocked OUTPUT blocks that the in-kernel backward
    # phase reads straight back from VMEM — the streams reach HBM once
    # (they must survive to the training backward) but the force
    # backward never re-reads them from HBM, and the fwd/readout/fbwd
    # kernel launches collapse to one.
    def _fused_primal(params, h, x):
        c = _shared_prep(params, h, x)
        B, N, F, depth = c["B"], c["N"], c["F"], c["depth"]
        nc, ca = c["nc"], c["ca"]
        leaves, resid_shapes = c["leaves"], c["resid_shapes"]
        n_resid = len(resid_shapes)
        n_real = c["n_real"]
        grid = (B // BT_P,)
        tpc = ca // BT_P

        def cbspec1(shape5):
            nd = len(shape5)

            def imap(b, tpc=tpc, nd=nd):
                return (b // tpc, 0, b % tpc) + (0,) * (nd - 3)

            return pl.BlockSpec(
                (1, shape5[1], BT_P) + shape5[3:], imap,
                memory_space=pltpu.VMEM,
            )

        def bspec1(shape):
            nd = len(shape)
            return pl.BlockSpec(
                (BT_P,) + shape[1:],
                lambda b, nd=nd: (b,) + (0,) * (nd - 1),
                memory_space=pltpu.VMEM,
            )

        def resident(a):
            return pl.BlockSpec(
                a.shape, lambda b, nd=a.ndim: (0,) * nd,
                memory_space=pltpu.VMEM,
            )

        flag1 = pl.BlockSpec(
            (depth, 1), lambda b: (0, 0), memory_space=pltpu.SMEM
        )

        w_out0 = params.w_out0
        b_out0 = params.b_out0.reshape(1, -1)
        w_out1 = params.w_out1
        b_out1 = params.b_out1.reshape(1, -1)
        out_f = w_out1.shape[-1]
        nr = n_real if n_real is not None else N

        def kernel(*refs):
            (x0r, x1r, x2r, hr, updr, err, etr) = refs[:7]
            o = 7
            w0r, b0r, w1r, b1r = refs[o : o + 4]
            o += 4
            lrefs = refs[o : o + len(leaves)]
            o += len(leaves)
            brefs = refs[o : o + 7]
            hfin_ref = refs[o + 7]
            o += 8
            rrefs = refs[o : o + n_resid]
            o += n_resid
            e_ref, dx0_ref, dx1_ref, dx2_ref = refs[o : o + 4]

            def read_leaf(i):
                return {nm: r[i] for nm, r in zip(_LEAF_NAMES, lrefs)}

            def fwd_body(i, carry):
                hc, xp, vp = carry
                for br, val in zip(brefs, [hc] + xp + vp):
                    br[0, i] = val
                h2, xp2, vp2, resid = layer_fwd_resid(
                    read_leaf(i), hc, xp, vp, updr[i, 0],
                    e_rep=err[:], e_tile=etr[:], mm=mm, mm_edge=mm_edge,
                    n_real=n_real,
                )
                for (_, nm), rr in zip(resid_shapes, rrefs):
                    rr[0, i] = resid[nm].astype(rr.dtype)
                return h2, list(xp2), list(vp2)

            xp0 = [x0r[:], x1r[:], x2r[:]]
            vp0 = [jnp.zeros_like(xp0[0])] * 3
            h_fin, _, _ = jax.lax.fori_loop(
                0, depth, fwd_body, (hr[:], xp0, vp0)
            )
            hfin_ref[:] = h_fin

            w0, b0, w1, b1 = w0r[:], b0r[:], w1r[:], b1r[:]

            def readout_e(h_):
                out = mm_hi(
                    _silu(mm_hi(h_.reshape(BT_P * N, F), w0) + b0), w1
                ) + b1
                out = out.reshape(BT_P, N, out_f)[:, :nr]
                return jnp.sum(out, axis=1)  # (BT_P, out_f)

            e_blk, readout_vjp = jax.vjp(readout_e, h_fin)
            (dh_fin,) = readout_vjp(jnp.ones_like(e_blk))
            e_ref[:] = jnp.broadcast_to(
                jnp.sum(e_blk, axis=-1, keepdims=True)[:, :, None],
                (BT_P, N, 1),
            )

            def bwd_body(t, carry):
                dh, dxp, dvp = carry
                i = depth - 1 - t
                h_in = brefs[0][0, i]
                xp_in = [brefs[1 + k][0, i] for k in range(3)]
                vp_in = [brefs[4 + k][0, i] for k in range(3)]
                resid = {
                    nm: rr[0, i].astype(jnp.float32)
                    for (_, nm), rr in zip(resid_shapes, rrefs)
                }
                dh2, dxp2, dvp2 = layer_bwd_resid(
                    read_leaf(i), resid, h_in, xp_in, vp_in, updr[i, 0],
                    dh, dxp, dvp,
                    e_rep=err[:], e_tile=etr[:], mm=mm, mm_edge=mm_edge,
                    n_real=n_real,
                )
                return dh2, list(dxp2), list(dvp2)

            zero = jnp.zeros((BT_P, N, 1), jnp.float32)
            _, dxp, _ = jax.lax.fori_loop(
                0, depth, bwd_body, (dh_fin, [zero] * 3, [zero] * 3)
            )
            dx0_ref[:] = dxp[0]
            dx1_ref[:] = dxp[1]
            dx2_ref[:] = dxp[2]

        plane = jax.ShapeDtypeStruct((B, N, 1), jnp.float32)
        bplane5 = jax.ShapeDtypeStruct((nc, depth, ca, N, 1), jnp.float32)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=tuple(
                [jax.ShapeDtypeStruct((nc, depth, ca, N, F), jnp.float32)]
                + [bplane5] * 6
                + [jax.ShapeDtypeStruct((B, N, F), jnp.float32)]
                + [
                    jax.ShapeDtypeStruct(
                        (nc, *s),
                        _resid_dtype_for(nm, resid_dtype, resid_lowp),
                    )
                    for s, nm in resid_shapes
                ]
                + [plane] * 4
            ),
            in_specs=(
                [bspec1((B, N, 1))] * 3
                + [bspec1((B, N, F)), flag1]
                + [resident(c["e_rep"]), resident(c["e_tile"])]
                + [resident(a) for a in (w_out0, b_out0, w_out1, b_out1)]
                + [resident(a) for a in leaves]
            ),
            out_specs=tuple(
                [cbspec1((nc, depth, ca, N, F))]
                + [cbspec1((nc, depth, ca, N, 1))] * 6
                + [bspec1((B, N, F))]
                + [cbspec1((nc, *s)) for s, _ in resid_shapes]
                + [bspec1((B, N, 1))] * 4
            ),
            # one_ef's bt>=8 budget (124M): same fwd+bwd body, the
            # resident stream buffers are outputs instead of scratch;
            # at bt<8 the boundary-stream outputs add ~2M over one_ef's
            # at-the-edge 100M default, so grant the aug budget (117M)
            compiler_params=_compiler_params(
                1,
                vmem_limit=(
                    124 * 1024 * 1024 if BT_P >= 8 else _AUG_BWD_VMEM
                ),
            ),
            interpret=interpret,
        )(*c["x_planes"], c["h0"], c["upd_flags"], c["e_rep"],
          c["e_tile"], w_out0, b_out0, w_out1, b_out1, *leaves)
        boundary = outs[:7]
        h_fin = outs[7]
        resid_arrays = outs[8 : 8 + n_resid]
        e_out, dx0, dx1, dx2 = outs[8 + n_resid :]
        del e_out
        # E VALUE from the XLA readout on h_fin — the exact tier the
        # shared primal (and the task's f32 eval oracle) uses. The
        # in-kernel head still computes the dh_fin force seed and, in
        # the backward, the readout grads (at HIGHEST). Training on the
        # in-kernel E value left a tier mismatch vs the evaluator:
        # with the Mosaic-default head, 400-epoch energy MAE was 2.52
        # vs lax 0.59 kcal/mol; HIGHEST cut it to 0.87; value-via-XLA
        # closes the rest (the optimizer and the evaluator must read E
        # through the same rounding).
        e = _shared_readout(params, c, h_fin)(h_fin)
        f = -jnp.concatenate([dx0, dx1, dx2], axis=-1)
        if n_real is not None:
            f = f[:, :n_real]
        return (e, f), boundary, h_fin, resid_arrays

    # One chunk of the shared backward: tangent-only forward -> head seeds
    # -> aug backward. ``_shared_bwd`` maps this over the saved streams'
    # chunk axis so only ONE chunk's tangent stream is live in HBM at a
    # time. From this body's view the chunk IS the batch (``B = ca``).
    def _shared_bwd_chunk(params, c, boundary, resid_arrays, h_fin, g_e,
                          t_planes):
        B = c["ca"]
        N, F, depth = c["N"], c["F"], c["depth"]
        leaves, resid_shapes = c["leaves"], c["resid_shapes"]
        n_resid = len(resid_shapes)
        n_real = c["n_real"]
        grid = (B // ABT, depth)

        # --- tangent-only forward on saved residuals ----------------------
        def tfwd_kernel(*refs):
            brefs = refs[:7]
            t0r, t1r, t2r, updr, err, etr = refs[7:13]
            lrefs = refs[13 : 13 + len(leaves)]
            o = 13 + len(leaves)
            rrefs = refs[o : o + n_resid]
            o = o + n_resid
            tbrefs = refs[o : o + 7]
            thfin_ref = refs[o + 7]
            trrefs = refs[o + 8 : o + 8 + n_resid]
            scr = refs[o + 8 + n_resid :]
            sth = scr[0]
            stx = scr[1:4]
            stv = scr[4:7]
            d = pl.program_id(1)

            @pl.when(d == 0)
            def _():
                sth[:] = jnp.zeros_like(sth)
                for k, tr in enumerate((t0r, t1r, t2r)):
                    stx[k][:] = tr[:]
                    stv[k][:] = jnp.zeros_like(tr[:])

            th = sth[:]
            txp = [stx[k][:] for k in range(3)]
            tvp = [stv[k][:] for k in range(3)]
            for br, val in zip(tbrefs, [th] + txp + tvp):
                br[0] = val
            h_in = brefs[0][0]
            xp_in = [brefs[1 + k][0] for k in range(3)]
            vp_in = [brefs[4 + k][0] for k in range(3)]
            resid = {
                nm: rr[0].astype(jnp.float32)
                for (_, nm), rr in zip(resid_shapes, rrefs)
            }
            th2, txp2, tvp2, tresid = layer_jvp_resid(
                read_p_(lrefs), resid, h_in, xp_in, vp_in, th, txp, tvp,
                updr[d, 0],
                e_rep=err[:], e_tile=etr[:], mm=mm, mm_edge=mm_edge,
                n_real=n_real,
            )
            for (_, nm), rr in zip(resid_shapes, trrefs):
                rr[0] = tresid[nm].astype(rr.dtype)
            sth[:] = th2
            for k in range(3):
                stx[k][:] = txp2[k]
                stv[k][:] = tvp2[k]
            thfin_ref[:] = th2

        bplane = jax.ShapeDtypeStruct((depth, B, N, 1), jnp.float32)
        tfwd_outs = pl.pallas_call(
            tfwd_kernel,
            grid=grid,
            out_shape=tuple(
                [jax.ShapeDtypeStruct((depth, B, N, F), jnp.float32)]
                + [bplane] * 6
                + [jax.ShapeDtypeStruct((B, N, F), jnp.float32)]
                + [
                    jax.ShapeDtypeStruct(
                        s, _resid_dtype_for(nm, resid_dtype, resid_lowp)
                    )
                    for s, nm in resid_shapes
                ]
            ),
            in_specs=(
                [_dbspec((depth, B, N, F), ABT)]
                + [_dbspec((depth, B, N, 1), ABT)] * 6
                + [_bspec((B, N, 1), ABT)] * 3
                + [_flag_spec(depth)]
                + [_full_spec(c["e_rep"]), _full_spec(c["e_tile"])]
                + _leaf_specs(leaves)
                + [_dbspec(s, ABT) for s, _ in resid_shapes]
            ),
            out_specs=tuple(
                [_dbspec((depth, B, N, F), ABT)]
                + [_dbspec((depth, B, N, 1), ABT)] * 6
                + [_bspec((B, N, F), ABT)]
                + [_dbspec(s, ABT) for s, _ in resid_shapes]
            ),
            scratch_shapes=[pltpu.VMEM((ABT, N, F), jnp.float32)]
            + [pltpu.VMEM((ABT, N, 1), jnp.float32)] * 6,
            compiler_params=_compiler_params(),
            interpret=interpret,
        )(*boundary, *t_planes, c["upd_flags"], c["e_rep"], c["e_tile"],
          *leaves, *resid_arrays)
        tboundary = tfwd_outs[:7]
        th_fin = tfwd_outs[7]
        tresid_arrays = tfwd_outs[8:]

        # --- seeds + readout parameter grads ------------------------------
        def head(w_out0, b_out0, w_out1, b_out1, hf, thf):
            def readout_e(h_):
                out = mm(
                    _silu(mm(h_.reshape(B * N, F), w_out0) + b_out0), w_out1
                ) + b_out1
                out = out.reshape(B, N, -1)
                if n_real is not None:
                    out = out[:, :n_real]
                return out.sum(axis=(-2, -1))

            e, e_dot = jax.jvp(readout_e, (hf,), (thf,))
            return (g_e * e).sum() - e_dot.sum()

        head_grads = jax.grad(head, argnums=(0, 1, 2, 3, 4, 5))(
            params.w_out0, params.b_out0, params.w_out1, params.b_out1,
            h_fin, th_fin,
        )
        d_wo0, d_bo0, d_wo1, d_bo1, dh_fin, dth_fin = head_grads

        # --- aug backward (same 3-backward scheme as aug_mode="resid") ----
        def bwd_kernel(*refs):
            brefs = refs[:7]
            tbrefs = refs[7:14]
            dhf_ref, dthf_ref, updr, err, etr = refs[14:19]
            lrefs = refs[19 : 19 + len(leaves)]
            o = 19 + len(leaves)
            rrefs = refs[o : o + n_resid]
            trrefs = refs[o + n_resid : o + 2 * n_resid]
            o = o + 2 * n_resid
            outs = refs[o : o + 5]
            grefs = refs[o + 5 : o + 5 + len(leaves)]
            scr = refs[o + 5 + len(leaves) :]
            sdh, sdth = scr[0], scr[1]
            sdx = scr[2:5]
            sdv = scr[5:8]
            sdtx = scr[8:11]
            sdtv = scr[11:14]

            b = pl.program_id(0)
            t = pl.program_id(1)

            @pl.when(jnp.logical_and(b == 0, t == 0))
            def _():
                for gr in grefs:
                    gr[:] = jnp.zeros_like(gr)

            @pl.when(t == 0)
            def _():
                sdh[:] = dhf_ref[:]
                sdth[:] = dthf_ref[:]
                zero = jnp.zeros((ABT, N, 1), jnp.float32)
                for k in range(3):
                    sdx[k][:] = zero
                    sdv[k][:] = zero
                    sdtx[k][:] = zero
                    sdtv[k][:] = zero

            h_in = brefs[0][0]
            xp_in = [brefs[1 + k][0] for k in range(3)]
            vp_in = [brefs[4 + k][0] for k in range(3)]
            th_in = tbrefs[0][0]
            txp_in = [tbrefs[1 + k][0] for k in range(3)]
            tvp_in = [tbrefs[4 + k][0] for k in range(3)]
            resid = {
                nm: rr[0].astype(jnp.float32)
                for (_, nm), rr in zip(resid_shapes, rrefs)
            }
            tresid = {
                nm: rr[0].astype(jnp.float32)
                for (_, nm), rr in zip(resid_shapes, trrefs)
            }

            i = depth - 1 - t
            upd = updr[i, 0]
            p = read_p_(lrefs)
            kw = dict(
                e_rep=err[:], e_tile=etr[:], mm=mm, mm_edge=mm_edge,
                n_real=n_real, mm_t=mm_t, mm_edge_t=mm_edge_t,
                want_param_grads=True,
            )

            dh_a, dxp_a, dvp_a, dW_a = layer_bwd_resid(
                p, resid, h_in, xp_in, vp_in, upd,
                sdh[:], [sdx[k][:] for k in range(3)],
                [sdv[k][:] for k in range(3)], **kw
            )

            ct_h = sdth[:]
            ct_x = [sdtx[k][:] for k in range(3)]
            ct_v = [sdtv[k][:] for k in range(3)]

            # "pairs": the jvp's PRIMAL would otherwise compute (and
            # discard) the ~19 per-layer dW row-contraction matmuls; the
            # operand-pairs mode skips them and the dW tangent is formed
            # from the primal/tangent operands (bit-identical ops to what
            # jax.jvp of the contraction emits).
            kw_pairs = {**kw, "want_param_grads": "pairs"}

            def bwd_fn(resid_, h_, xp_, vp_):
                return layer_bwd_resid(
                    p, resid_, h_, xp_, vp_, upd, ct_h, ct_x, ct_v,
                    **kw_pairs
                )

            (
                (dth2, dtxp2, dtvp2, _dWc_unused, pairs_p),
                (hc, xc, vc, dWc_t, pairs_t),
            ) = jax.jvp(
                bwd_fn,
                (resid, h_in, xp_in, vp_in),
                (tresid, th_in, txp_in, tvp_in),
            )
            dW_t = dict(dWc_t)
            dW_t.update(
                contract_param_pair_tangents(
                    pairs_p, pairs_t, mm_t, mm_edge_t
                )
            )

            for nm, gr in zip(_LEAF_NAMES, grefs):
                gr[i] += dW_a[nm] + dW_t[nm]
            dh2 = dh_a + hc
            dxp2 = [dxp_a[k] + xc[k] for k in range(3)]
            dvp2 = [dvp_a[k] + vc[k] for k in range(3)]
            sdh[:] = dh2
            sdth[:] = dth2
            for k in range(3):
                sdx[k][:] = dxp2[k]
                sdv[k][:] = dvp2[k]
                sdtx[k][:] = dtxp2[k]
                sdtv[k][:] = dtvp2[k]
            outs[0][:] = dh2
            outs[1][:] = dxp2[0]
            outs[2][:] = dxp2[1]
            outs[3][:] = dxp2[2]
            outs[4][:] = dth2

        plane = jax.ShapeDtypeStruct((B, N, 1), jnp.float32)
        gspec = [
            pl.BlockSpec(
                a.shape, (lambda bb, dd, nd=a.ndim: (0,) * nd),
                memory_space=pltpu.VMEM,
            )
            for a in leaves
        ]
        outs = pl.pallas_call(
            bwd_kernel,
            grid=grid,
            out_shape=tuple(
                [jax.ShapeDtypeStruct((B, N, F), jnp.float32)]
                + [plane] * 3
                + [jax.ShapeDtypeStruct((B, N, F), jnp.float32)]
                + [
                    jax.ShapeDtypeStruct(a.shape, jnp.float32)
                    for a in leaves
                ]
            ),
            in_specs=(
                [_dbspec((depth, B, N, F), ABT, rev_depth=depth)]
                + [_dbspec((depth, B, N, 1), ABT, rev_depth=depth)] * 6
                + [_dbspec((depth, B, N, F), ABT, rev_depth=depth)]
                + [_dbspec((depth, B, N, 1), ABT, rev_depth=depth)] * 6
                + [_bspec((B, N, F), ABT)] * 2
                + [_flag_spec(depth)]
                + [_full_spec(c["e_rep"]), _full_spec(c["e_tile"])]
                + _leaf_specs(leaves, rev_depth=depth)
                + [
                    _dbspec(s, ABT, rev_depth=depth)
                    for s, _ in resid_shapes
                ]
                + [
                    _dbspec(s, ABT, rev_depth=depth)
                    for s, _ in resid_shapes
                ]
            ),
            out_specs=tuple(
                [_bspec((B, N, F), ABT)]
                + [_bspec((B, N, 1), ABT)] * 3
                + [_bspec((B, N, F), ABT)]
                + gspec
            ),
            scratch_shapes=[pltpu.VMEM((ABT, N, F), jnp.float32)] * 2
            + [pltpu.VMEM((ABT, N, 1), jnp.float32)] * 12,
            compiler_params=_compiler_params(vmem_limit=_AUG_BWD_VMEM),
            interpret=interpret,
        )(*boundary, *tboundary, dh_fin, dth_fin, c["upd_flags"],
          c["e_rep"], c["e_tile"], *leaves, *resid_arrays, *tresid_arrays)
        # (dh0, dx0, dx1, dx2, head grads, per-leaf stacked param grads)
        return (
            outs[0], outs[1], outs[2], outs[3],
            d_wo0, d_bo0, d_wo1, d_bo1, *outs[5:],
        )

    # One chunk of the FUSED shared backward: the tangent-only forward,
    # the seed head, and the 3-backward aug pullback run in ONE Pallas
    # program (grid ``(B/ABT,)``, ``one_ef``-style fori phases):
    #
    # - phase 1 (fori over depth): ``layer_jvp_resid`` on the saved primal
    #   residuals — read ONCE as full-depth resident input blocks — with
    #   the tangent residuals and tangent boundary states written to VMEM
    #   scratch (never to HBM);
    # - the seed head (readout jvp + its pullback and parameter grads)
    #   evaluated in-kernel via ``jax.vjp`` of the node-level readout
    #   pair, seeded with the per-sample ``g_e`` plane and ``-1`` on the
    #   tangent nodes (no scalar reductions in-kernel);
    # - phase 2 (reversed fori): the same 3-backward body as
    #   ``aug_mode="shared"`` with the 14 cotangent planes carried in the
    #   loop (no cotangent scratch), parameter grads accumulated into
    #   resident output blocks across grid steps.
    #
    # vs "shared" this removes the tangent-residual HBM round trip, one
    # primal-residual re-read, the tangent-boundary streams, the
    # ``h_fin``/``th_fin``/seed round trips, and two kernel launches —
    # the aug path is bandwidth/issue-bound (round-3: "retrace", with
    # ~30% more FLOPs, measured only 6% slower than "shared"), so the
    # DMA removal is the live lever.
    def _fused_bwd_chunk(params, c, boundary, resid_arrays, h_fin, g_e,
                         t_planes):
        B = c["ca"]
        N, F, depth = c["N"], c["F"], c["depth"]
        leaves, resid_shapes = c["leaves"], c["resid_shapes"]
        n_resid = len(resid_shapes)
        n_real = c["n_real"]
        grid = (B // ABT,)
        nr = n_real if n_real is not None else N

        def fdspec(shape4):
            """Full-depth resident block of a (depth, B, rows, ch) saved
            stream at the batch-grid position: read once per grid step."""
            return pl.BlockSpec(
                (shape4[0], ABT) + shape4[2:],
                lambda b: (0, b, 0, 0),
                memory_space=pltpu.VMEM,
            )

        def bspec1(shape):
            nd = len(shape)
            return pl.BlockSpec(
                (ABT,) + shape[1:],
                lambda b, nd=nd: (b,) + (0,) * (nd - 1),
                memory_space=pltpu.VMEM,
            )

        def resident(a):
            return pl.BlockSpec(
                a.shape, lambda b, nd=a.ndim: (0,) * nd,
                memory_space=pltpu.VMEM,
            )

        flag1 = pl.BlockSpec(
            (depth, 1), lambda b: (0, 0), memory_space=pltpu.SMEM
        )

        ge_plane = jnp.broadcast_to(
            g_e[:, None, None].astype(jnp.float32), (B, N, 1)
        )
        # readout-head leaves as >=2D values (1-D breaks Mosaic layouts)
        w_out0 = params.w_out0
        b_out0 = params.b_out0.reshape(1, -1)
        w_out1 = params.w_out1
        b_out1 = params.b_out1.reshape(1, -1)
        out_f = w_out1.shape[-1]

        def kernel(*refs):
            brefs = refs[:7]
            rrefs = refs[7 : 7 + n_resid]
            o = 7 + n_resid
            (hfin_r, ger, t0r, t1r, t2r, updr, err, etr) = refs[o : o + 8]
            o += 8
            w0r, b0r, w1r, b1r = refs[o : o + 4]
            o += 4
            lrefs = refs[o : o + len(leaves)]
            o += len(leaves)
            dh0_ref, dx0_ref, dx1_ref, dx2_ref = refs[o : o + 4]
            o += 4
            gw0, gb0, gw1, gb1 = refs[o : o + 4]
            o += 4
            grefs = refs[o : o + len(leaves)]
            scr = refs[o + len(leaves) :]
            tb = scr[:7]
            trefs = scr[7 : 7 + n_resid]

            b = pl.program_id(0)

            @pl.when(b == 0)
            def _():
                for gr in grefs:
                    gr[:] = jnp.zeros_like(gr)
                for gr in (gw0, gb0, gw1, gb1):
                    gr[:] = jnp.zeros_like(gr)

            def read_leaf(i):
                return {nm: r[i] for nm, r in zip(_LEAF_NAMES, lrefs)}

            def get_resid(i):
                return {
                    nm: rr[i].astype(jnp.float32)
                    for (_, nm), rr in zip(resid_shapes, rrefs)
                }

            # --- phase 1: tangent-only forward, tresid -> VMEM scratch ---
            def tfwd_body(d, carry):
                th, txp, tvp = carry
                tb[0][d] = th
                for k in range(3):
                    tb[1 + k][d] = txp[k]
                    tb[4 + k][d] = tvp[k]
                h_in = brefs[0][d]
                xp_in = [brefs[1 + k][d] for k in range(3)]
                vp_in = [brefs[4 + k][d] for k in range(3)]
                th2, txp2, tvp2, tresid = layer_jvp_resid(
                    read_leaf(d), get_resid(d), h_in, xp_in, vp_in,
                    th, txp, tvp, updr[d, 0],
                    e_rep=err[:], e_tile=etr[:], mm=mm, mm_edge=mm_edge,
                    n_real=n_real,
                )
                for (_, nm), tr in zip(resid_shapes, trefs):
                    tr[d] = tresid[nm].astype(tr.dtype)
                return th2, list(txp2), list(tvp2)

            zero = jnp.zeros((ABT, N, 1), jnp.float32)
            th_fin, _, _ = jax.lax.fori_loop(
                0, depth, tfwd_body,
                (
                    jnp.zeros((ABT, N, F), jnp.float32),
                    [t0r[:], t1r[:], t2r[:]],
                    [zero] * 3,
                ),
            )

            # --- in-kernel seed head: S = <g_e, e> - sum(e_dot) ----------
            w0, b0, w1, b1 = w0r[:], b0r[:], w1r[:], b1r[:]

            def aug_ro(h_, th_, w0_, b0_, w1_, b1_):
                def ro_nodes(hh):
                    out = mm_hi(
                        _silu(mm_hi(hh.reshape(ABT * N, F), w0_) + b0_),
                        w1_,
                    ) + b1_
                    return out.reshape(ABT, N, out_f)[:, :nr]

                return jax.jvp(ro_nodes, (h_,), (th_,))

            (o_p, o_d), ro_vjp = jax.vjp(
                aug_ro, hfin_r[:], th_fin, w0, b0, w1, b1
            )
            ge_seed = jnp.broadcast_to(ger[:][:, :nr], (ABT, nr, out_f))
            dhf, dthf, dw0, db0, dw1, db1 = ro_vjp(
                (ge_seed, -jnp.ones_like(o_d))
            )
            gw0[:] += dw0
            gb0[:] += db0
            gw1[:] += dw1
            gb1[:] += db1

            # --- phase 2: reversed 3-backward aug pullback ----------------
            def bwd_body(t, carry):
                dh, dxp, dvp, dth, dtxp, dtvp = carry
                i = depth - 1 - t
                h_in = brefs[0][i]
                xp_in = [brefs[1 + k][i] for k in range(3)]
                vp_in = [brefs[4 + k][i] for k in range(3)]
                th_in = tb[0][i]
                txp_in = [tb[1 + k][i] for k in range(3)]
                tvp_in = [tb[4 + k][i] for k in range(3)]
                resid = get_resid(i)
                tresid = {
                    nm: tr[i].astype(jnp.float32)
                    for (_, nm), tr in zip(resid_shapes, trefs)
                }
                p = read_leaf(i)
                upd = updr[i, 0]
                kw = dict(
                    e_rep=err[:], e_tile=etr[:], mm=mm, mm_edge=mm_edge,
                    n_real=n_real, mm_t=mm_t, mm_edge_t=mm_edge_t,
                    want_param_grads=True,
                )
                dh_a, dxp_a, dvp_a, dW_a = layer_bwd_resid(
                    p, resid, h_in, xp_in, vp_in, upd, dh, dxp, dvp, **kw
                )
                kw_pairs = {**kw, "want_param_grads": "pairs"}

                def bwd_fn(resid_, h_, xp_, vp_):
                    return layer_bwd_resid(
                        p, resid_, h_, xp_, vp_, upd, dth, dtxp, dtvp,
                        **kw_pairs
                    )

                (
                    (dth2, dtxp2, dtvp2, _dWu, pairs_p),
                    (hc, xc, vc, dWc_t, pairs_t),
                ) = jax.jvp(
                    bwd_fn,
                    (resid, h_in, xp_in, vp_in),
                    (tresid, th_in, txp_in, tvp_in),
                )
                dW_t = dict(dWc_t)
                dW_t.update(
                    contract_param_pair_tangents(
                        pairs_p, pairs_t, mm_t, mm_edge_t
                    )
                )
                for nm, gr in zip(_LEAF_NAMES, grefs):
                    gr[i] += dW_a[nm] + dW_t[nm]
                dh2 = dh_a + hc
                dxp2 = [dxp_a[k] + xc[k] for k in range(3)]
                dvp2 = [dvp_a[k] + vc[k] for k in range(3)]
                return (
                    dh2, dxp2, dvp2, dth2, list(dtxp2), list(dtvp2)
                )

            dh, dxp, _, _, _, _ = jax.lax.fori_loop(
                0, depth, bwd_body,
                (dhf, [zero] * 3, [zero] * 3, dthf, [zero] * 3, [zero] * 3),
            )
            dh0_ref[:] = dh
            dx0_ref[:] = dxp[0]
            dx1_ref[:] = dxp[1]
            dx2_ref[:] = dxp[2]

        plane = jax.ShapeDtypeStruct((B, N, 1), jnp.float32)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=tuple(
                [jax.ShapeDtypeStruct((B, N, F), jnp.float32)]
                + [plane] * 3
                + [
                    jax.ShapeDtypeStruct(a.shape, jnp.float32)
                    for a in (w_out0, b_out0, w_out1, b_out1)
                ]
                + [
                    jax.ShapeDtypeStruct(a.shape, jnp.float32)
                    for a in leaves
                ]
            ),
            in_specs=(
                [fdspec((depth, B, N, F))]
                + [fdspec((depth, B, N, 1))] * 6
                + [fdspec(s) for s, _ in resid_shapes]
                + [bspec1((B, N, F))]
                + [bspec1((B, N, 1))] * 4
                + [flag1]
                + [resident(c["e_rep"]), resident(c["e_tile"])]
                + [resident(a) for a in (w_out0, b_out0, w_out1, b_out1)]
                + [resident(a) for a in leaves]
            ),
            out_specs=tuple(
                [bspec1((B, N, F))]
                + [bspec1((B, N, 1))] * 3
                + [
                    resident(a)
                    for a in (w_out0, b_out0, w_out1, b_out1)
                ]
                + [resident(a) for a in leaves]
            ),
            scratch_shapes=(
                [pltpu.VMEM((depth, ABT, N, F), jnp.float32)]
                + [pltpu.VMEM((depth, ABT, N, 1), jnp.float32)] * 6
                + [
                    pltpu.VMEM(
                        (s[0], ABT) + s[2:],
                        _resid_dtype_for(nm, resid_dtype, resid_lowp),
                    )
                    for s, nm in resid_shapes
                ]
            ),
            compiler_params=_compiler_params(
                1, vmem_limit=_AUG_BWD_VMEM
            ),
            interpret=interpret,
        )(*boundary, *resid_arrays, h_fin, ge_plane, *t_planes,
          c["upd_flags"], c["e_rep"], c["e_tile"],
          w_out0, b_out0, w_out1, b_out1, *leaves)
        return (
            outs[0], outs[1], outs[2], outs[3],
            outs[4], outs[5].reshape(params.b_out0.shape), outs[6],
            outs[7].reshape(params.b_out1.shape), *outs[8:],
        )

    def _shared_bwd(params, h, x, boundary, h_fin, resid_arrays, g_e, g_f):
        c = _shared_prep(params, h, x)
        B, N, F, depth = c["B"], c["N"], c["F"], c["depth"]
        nc, ca = c["nc"], c["ca"]
        n_resid = len(c["resid_shapes"])
        n_real = c["n_real"]
        if n_real is not None:
            g_f = jnp.pad(g_f, ((0, 0), (0, N - n_real), (0, 0)))
        t_planes = [
            g_f[..., k : k + 1].reshape(nc, ca, N, 1) for k in range(3)
        ]
        chunk_fn = (
            _fused_bwd_chunk if aug_mode == "fused" else _shared_bwd_chunk
        )
        res = jax.lax.map(
            lambda ops: chunk_fn(
                params, c, ops[:7], ops[7 : 7 + n_resid],
                ops[7 + n_resid], ops[8 + n_resid], ops[9 + n_resid :],
            ),
            (
                *boundary, *resid_arrays,
                h_fin.reshape(nc, ca, N, F), g_e.reshape(nc, ca),
                *t_planes,
            ),
        )
        dh0 = res[0].reshape(B, N, F)
        dxp = [r.reshape(B, N, 1) for r in res[1:4]]
        d_wo0, d_bo0, d_wo1, d_bo1 = (r.sum(axis=0) for r in res[4:8])
        leaf_grads = dict(
            zip(_LEAF_NAMES, (r.sum(axis=0) for r in res[8:]))
        )

        dh0_2d = dh0.reshape(B * N, F)
        F_in = c["F_in"]
        h_p = h
        if n_real is not None:
            h_p = jnp.pad(h, ((0, 0), (0, N - n_real), (0, 0)))
        d_we = jax.lax.dot_general(
            h_p.reshape(B * N, F_in), dh0_2d,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d_be = dh0_2d.sum(axis=0)
        d_h = (dh0_2d @ params.w_embed.T).reshape(B, N, F_in)
        d_x = jnp.concatenate(dxp, axis=-1)
        if n_real is not None:
            d_h = d_h[:, :n_real]
            d_x = d_x[:, :n_real]
        d_layers = tuple(
            unsplit_layer_grads(
                {nm: leaf_grads[nm][i] for nm in _LEAF_NAMES}
            )
            for i in range(depth)
        )
        d_params = ModelParams(
            w_embed=d_we, b_embed=d_be, layers=d_layers,
            w_out0=d_wo0, b_out0=d_bo0, w_out1=d_wo1, b_out1=d_bo1,
        )
        return d_params, d_h, d_x

    if aug_mode in ("shared", "fused"):
        use_fused_primal = (
            fused_primal if fused_primal is not None
            else aug_mode == "fused"
        )
        primal = _fused_primal if use_fused_primal else _shared_primal

        @jax.custom_vjp
        def ef_shared(params, h, x):
            (e, f), *_ = primal(params, h, x)
            return e, f

        def ef_shared_fwd(params, h, x):
            (e, f), boundary, h_fin, resid_arrays = primal(
                params, h, x
            )
            return (e, f), (
                params, h, x, tuple(boundary), h_fin, tuple(resid_arrays)
            )

        def ef_shared_bwd(saved, cots):
            params, h, x, boundary, h_fin, resid_arrays = saved
            g_e, g_f = cots
            return _shared_bwd(
                params, h, x, boundary, h_fin, resid_arrays, g_e, g_f
            )

        ef_shared.defvjp(ef_shared_fwd, ef_shared_bwd)
        return ef_shared

    @jax.custom_vjp
    def ef(params, h, x):
        return primal_fn(params, h, x)

    def ef_fwd(params, h, x):
        return ef(params, h, x), (params, h, x)

    def ef_bwd(saved, cots):
        params, h, x = saved
        g_e, g_f = cots
        # F = -dE/dx: <gF, dF> = -d[jvp_{gF}(sum E)] — the minus lives in
        # the head's ``- e_dot`` term, so the tangent seed is +g_f.
        if aug_mode == "resid":
            return _aug_grad_resid(params, h, x, g_e, g_f)
        return _aug_grad(params, h, x, g_e, g_f)

    ef.defvjp(ef_fwd, ef_bwd)
    return ef
