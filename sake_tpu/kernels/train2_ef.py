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
from sake_tpu.kernels.resid_ef import unsplit_layer_grads
from sake_tpu.kernels.split_ef import head_expansion_matrices


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
    interpret: bool = False,
):
    """Build ``ef(params, h, x) -> (e, f)`` whose primal runs the champion
    residual-streaming kernel pair and whose *backward* (the training
    gradient) runs the JVP-augmented kernel pair above. First- and
    second-order gradients w.r.t. ``params``/``h``/``x`` are exact for any
    loss of ``(e, f)``.

    ``aug_batch_tile``: batch tile of the augmented kernels (their bodies
    trace ~6 layer-equivalents of ops; the Mosaic compiler's memory
    scales with block size x op count, so this usually wants to be
    smaller than the primal's ``batch_tile``).
    """
    from sake_tpu.kernels.resid_ef import resid_energy_forces

    ABT = aug_batch_tile if aug_batch_tile is not None else batch_tile
    mm = _make_mm_prec(matmul_dtype, precision)
    mm_edge = None
    if edge_matmul_dtype is not None or edge_precision is not None:
        mm_edge = _make_mm_prec(edge_matmul_dtype, edge_precision)

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
        return _aug_grad(params, h, x, g_e, g_f)

    ef.defvjp(ef_fwd, ef_bwd)
    return ef
