"""Large-system scaling: blocked O(N·block)-memory E+F vs the dense path.

The reference's "sparse"/scalable story is a vestigial ``SparseSAKELayer``
(``/root/reference/sake/layers.py`` — broken, unused by any script); this
framework's is ``bigsys.blocked_model_forward``: the dense SAKE layer with
the sender axis scanned in blocks under an online softmax, `remat=True`
bounding the *force/backward* memory the same way (the molecular analog of
flash/ring attention, SURVEY §5.7). This benchmark puts a number on it:

- verification gate first (numbers only count after it): at the largest N
  the dense path still fits, blocked E+F must match dense E+F;
- then a single-chip N sweep of fused E+F (energy + F = −dE/dx) wall time
  for both paths — the dense path exhausts HBM where the blocked path
  keeps scaling at bounded memory.

The CUTOFF-SPARSE path (``sake_tpu/sparse.py``: O(N·K) *work*, not just
memory) is swept alongside: its gate is exactness vs the masked dense
path on its own neighbor graph (the sparse-module contract), timed at a
liquid-density cutoff (~30 neighbors/atom). Neighbor-list build time is
reported separately — in MD it amortizes over many force evals.

Flagship model config (depth 6, hidden 64, 4 heads), B=1 system.

Prints ONE JSON line. Usage: ``python bench_bigsys.py [Nmax] [block] [cutoff]``.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

FEATURES = 5  # element one-hot width (C/H/O/N/S-ish synthetic systems)


def _time_evals(fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main():
    n_max = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    cutoff = float(sys.argv[3]) if len(sys.argv) > 3 else 5.0
    max_nbr = 64
    sizes = [n for n in (512, 1024, 2048, 4096, 8192, 16384) if n <= n_max]

    from sake_tpu.bigsys import blocked_model_forward
    from sake_tpu.kernels import model_forward, model_params_from_linen
    from sake_tpu.models import SAKEModel
    from sake_tpu.sparse import (
        cell_neighbor_list, densify_neighbors, neighbor_list,
        sparse_model_forward,
    )

    rng = np.random.RandomState(0)
    model = SAKEModel(hidden_features=64, out_features=1, depth=6)
    h_init = jnp.asarray(rng.randn(8, FEATURES), jnp.float32)
    x_init = jnp.asarray(rng.randn(8, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), h_init, x_init)
    kp = model_params_from_linen(params)

    def make_ef(kind, n):
        if kind == "dense":
            def e(x_, h_):
                out, _, _ = model_forward(kp, h_, x_)
                return out.sum()
        else:
            def e(x_, h_):
                out, _, _ = blocked_model_forward(
                    kp, h_, x_, block_size=block, remat=True
                )
                return out.sum()

        @jax.jit
        def ef(x_, h_):
            e_val, neg_f = jax.value_and_grad(e)(x_, h_)
            return e_val, -neg_f

        return ef

    def inputs(n):
        # amorphous box at roughly liquid density so distances are sane
        side = (n / 0.05) ** (1.0 / 3.0)
        x = jnp.asarray(rng.rand(1, n, 3) * side, jnp.float32)
        h = jax.nn.one_hot(
            jnp.asarray(rng.randint(0, FEATURES, (1, n))), FEATURES
        ).astype(jnp.float32)
        return x, h, side

    nlist = jax.jit(
        lambda x_: neighbor_list(x_, cutoff, max_nbr, row_chunk=1024)
    )

    def make_open_cell(side):
        # O(N·27·cap) OPEN-boundary grid build — identical neighbor sets
        # to the all-pairs `nlist` (sparse.py contract, tested); this is
        # what keeps the build ~flat through N=16384 where the all-pairs
        # O(N²) distance pass goes superlinear (251 ms at 16384, r3).
        return jax.jit(
            lambda x_: cell_neighbor_list(
                x_, cutoff, max_nbr, box=(side,) * 3, periodic=False,
                cell_capacity=32,
            )
        )

    def make_sparse_ef():
        def e(x_, h_, idx, m):
            out, _, _ = sparse_model_forward(kp, h_, x_, idx, m, remat=True)
            return out.sum()

        @jax.jit
        def ef(x_, h_, idx, m):
            e_val, neg_f = jax.value_and_grad(e)(x_, h_, idx, m)
            return e_val, -neg_f

        return ef

    def make_sparse_kernel_ef(h_, **kw):
        # Pallas edge-kernel path (kernels/sparse_ef.py): the same O(N*K)
        # work with the per-layer edge chain fused into kernels
        from sake_tpu.kernels.sparse_ef import (
            make_sparse_kernel_energy_forces,
        )

        raw = make_sparse_kernel_energy_forces(h_, update=True, **kw)

        @jax.jit
        def ef(x_, idx, m):
            e_b, f = raw(kp, x_, idx, m)
            return e_b.sum(), f

        return ef

    # ---- verification gate at the smallest size --------------------------
    n0 = sizes[0]
    x0, h0, _ = inputs(n0)
    (e_d, f_d) = jax.block_until_ready(make_ef("dense", n0)(x0, h0))
    (e_b, f_b) = jax.block_until_ready(make_ef("blocked", n0)(x0, h0))
    e_err = float(abs(e_b - e_d) / (abs(e_d) + 1e-9))
    f_err = float(
        jnp.abs(f_b - f_d).max() / (jnp.abs(f_d).max() + 1e-9)
    )
    # sparse gate: exact vs the masked dense oracle on ITS OWN graph
    idx0, m0 = jax.block_until_ready(nlist(x0))
    mask0 = densify_neighbors(idx0, m0, n0)

    @jax.jit
    def ef_masked(x_, h_):
        def e(x__):
            out, _, _ = model_forward(kp, h_, x__, mask=mask0)
            return out.sum()
        e_val, neg_f = jax.value_and_grad(e)(x_)
        return e_val, -neg_f

    (e_m, f_m) = jax.block_until_ready(ef_masked(x0, h0))
    (e_s, f_s) = jax.block_until_ready(make_sparse_ef()(x0, h0, idx0, m0))
    # PER-ATOM energy comparison: the summed energy of a ~500-atom random
    # box cancels to near zero, so its relative error is meaningless
    out_m = jax.jit(lambda: model_forward(kp, h0, x0, mask=mask0)[0])()
    out_s = jax.jit(
        lambda: sparse_model_forward(kp, h0, x0, idx0, m0)[0]
    )()
    se_err = float(
        jnp.abs(out_s - out_m).max() / (jnp.abs(out_m).max() + 1e-9)
    )
    sf_err = float(jnp.abs(f_s - f_m).max() / (jnp.abs(f_m).max() + 1e-9))
    # kernel-path gate: forces vs the lax sparse path on the same graph
    # (Mosaic default-f32 matmul tier, measured ~7e-3 — see PERF.md)
    (_, f_sk) = jax.block_until_ready(
        make_sparse_kernel_ef(h0)(x0, idx0, m0)
    )
    skf_err = float(
        jnp.abs(f_sk - f_s).max() / (jnp.abs(f_s).max() + 1e-9)
    )
    verified = (
        e_err < 5e-3 and f_err < 5e-3 and se_err < 1e-2 and sf_err < 5e-3
        and skf_err < 2e-2
    )
    if not verified:
        print(json.dumps({
            "metric": "bigsys_blocked_ef_atoms_per_s",
            "value": 0.0, "unit": "atom-evals/s",
            "vs_baseline": 0.0, "error":
                f"verification FAILED at N={n0}: e_err {e_err:.2e} "
                f"f_err {f_err:.2e} sparse e {se_err:.2e} f {sf_err:.2e} "
                f"kernel f {skf_err:.2e}",
        }))
        sys.exit(1)

    # ---- sweep ------------------------------------------------------------
    table = {}
    best_blocked = None
    best_sparse = None
    best_impl = "sparse"
    dense_limit = None
    sparse_ef = make_sparse_ef()
    for n in sizes:
        x, h, side = inputs(n)
        row = {}
        try:
            nl_sec, (idx_n, m_n) = _time_evals(nlist, x, reps=3)
            oc_sec, (idx_o, m_o) = _time_evals(make_open_cell(side), x,
                                               reps=3)
            same = bool(
                jnp.all(jnp.sort(jnp.where(m_o > 0, idx_o, n), -1)
                        == jnp.sort(jnp.where(m_n > 0, idx_n, n), -1))
            )
            row["open_cell_nlist"] = (
                round(oc_sec * 1e3, 2) if same else "failed: sets differ"
            )
            sec, _ = _time_evals(sparse_ef, x, h, idx_n, m_n, reps=3)
            row["sparse"] = round(sec * 1e3, 2)
            row["sparse_nlist"] = round(nl_sec * 1e3, 2)
            row["sparse_mean_nbrs"] = round(float(m_n.sum()) / n, 1)
            best_sparse = (n, sec)
            best_impl = "sparse(lax)"
        except Exception as ex:  # noqa: BLE001 — OOM/compile failures
            row["sparse"] = "failed: " + str(ex).split("\n")[0][:140]
        try:
            ksec, _ = _time_evals(
                make_sparse_kernel_ef(h), x, idx_n, m_n, reps=3
            )
            row["sparse_kernel"] = round(ksec * 1e3, 2)
            if best_sparse is None or ksec < best_sparse[1] \
                    or best_sparse[0] < n:
                best_sparse = (n, ksec)
                best_impl = "sparse(kernel)"
        except Exception as ex:  # noqa: BLE001 — OOM/compile failures
            row["sparse_kernel"] = "failed: " + str(ex).split("\n")[0][:140]
        if n >= 8192:
            # bf16 h-gathers: a wash at 4096 (r4) but a measured +6% at
            # 16384 where the gather/scatter glue share has grown —
            # 274 vs 291 ms at N=16384, and the per-atom f_err vs the
            # lax sparse oracle is BETTER (3.9e-3 vs 4.5e-3, r5 probe)
            try:
                ksec, _ = _time_evals(
                    make_sparse_kernel_ef(h, gather_dtype=jnp.bfloat16),
                    x, idx_n, m_n, reps=3,
                )
                row["sparse_kernel_bf16g"] = round(ksec * 1e3, 2)
                if best_sparse is None or ksec < best_sparse[1] \
                        or best_sparse[0] < n:
                    best_sparse = (n, ksec)
                    best_impl = "sparse(kernel,bf16g)"
            except Exception as ex:  # noqa: BLE001
                row["sparse_kernel_bf16g"] = (
                    "failed: " + str(ex).split("\n")[0][:140]
                )
        try:
            # O(N·27·cap) grid-binned build vs the O(N²) all-pairs pass,
            # both under the same periodic box; neighbor SETS must match
            # (sorted masked indices — densify is O(N²) memory at this N)
            box = (side,) * 3
            cl = jax.jit(
                lambda x_, box=box: cell_neighbor_list(
                    x_, cutoff, max_nbr, box=box, cell_capacity=32
                )
            )
            pb = jax.jit(
                lambda x_, box=box: neighbor_list(
                    x_, cutoff, max_nbr, row_chunk=1024, box=box
                )
            )
            cl_sec, (idx_c, m_c) = _time_evals(cl, x, reps=3)
            pb_sec, (idx_p, m_p) = _time_evals(pb, x, reps=3)

            def key(i_, m_):
                return jnp.sort(
                    jnp.where(m_ > 0, i_, n).astype(jnp.int32), axis=-1
                )

            # compare only rows whose coordination fits max_nbr: when the
            # true coordination exceeds K, both builds truncate to
            # K-nearest with different tie-breaking and a full-set
            # comparison would spuriously fail (e.g. a user-supplied
            # larger cutoff via argv)
            full_c = m_c.sum(-1) < max_nbr
            full_p = m_p.sum(-1) < max_nbr
            cmp_rows = (full_c & full_p)[..., None]
            kc = jnp.where(cmp_rows, key(idx_c, m_c), 0)
            kp_ = jnp.where(cmp_rows, key(idx_p, m_p), 0)
            if bool(jnp.all(kc == kp_)):
                row["cell_nlist"] = round(cl_sec * 1e3, 2)
                row["allpairs_nlist_pbc"] = round(pb_sec * 1e3, 2)
            else:
                row["cell_nlist"] = (
                    "failed: neighbor sets differ on rows with "
                    "coordination < max_nbr"
                )
        except Exception as ex:  # noqa: BLE001 — OOM/compile failures
            row["cell_nlist"] = "failed: " + str(ex).split("\n")[0][:140]
        for kind in ("dense", "blocked"):
            if kind == "dense" and dense_limit is not None:
                row[kind] = "skipped (OOM at smaller N)"
                continue
            if kind == "blocked" and n > 8192:
                # ~29 s/eval at 8192 and O(N^2) work — a 16k timing would
                # cost ~8 min for a number the 8k point already implies
                row[kind] = "skipped (O(N^2) work; see N=8192)"
                continue
            try:
                sec, _ = _time_evals(make_ef(kind, n), x, h, reps=3)
                row[kind] = round(sec * 1e3, 2)  # ms / E+F eval
                if kind == "blocked":
                    best_blocked = (n, sec)
            except Exception as ex:  # noqa: BLE001 — OOM/compile failures
                msg = str(ex).split("\n")[0][:140]
                row[kind] = f"failed: {msg}"
                if kind == "dense":
                    dense_limit = n
                elif block > 64:
                    # the (B, N, block, H) edge intermediates scale with
                    # N*block — halve the block once before giving up
                    # (N=8192 compiles at 128 where 256 dies)
                    try:
                        block //= 2
                        sec, _ = _time_evals(make_ef(kind, n), x, h, reps=3)
                        row[kind] = round(sec * 1e3, 2)
                        row["blocked_block_size"] = block
                        best_blocked = (n, sec)
                    except Exception as ex2:  # noqa: BLE001
                        row[kind] += (
                            f"; retry bs={block}: "
                            + str(ex2).split("\n")[0][:100]
                        )
        table[n] = row
        print(f"# N={n}: {row}", file=sys.stderr, flush=True)

    n_big, sec_big = best_sparse if best_sparse else best_blocked
    atoms_per_s = n_big / sec_big
    print(json.dumps({
        "metric": "bigsys_ef_atoms_per_s",
        "value": round(atoms_per_s, 1),
        "unit": f"atom-evals/s at N={n_big} (fused E+F, single chip, "
                f"{best_impl if best_sparse else 'blocked'})",
        "vs_baseline": 0.0,
        "verified": {"N": n0, "e_rel_err": round(e_err, 8),
                     "f_rel_err": round(f_err, 8),
                     "sparse_e_rel_err": round(se_err, 8),
                     "sparse_f_rel_err": round(sf_err, 8),
                     "sparse_kernel_f_rel_err": round(skf_err, 8)},
        "ms_per_eval": table,
        "block_size": block,
        "cutoff": cutoff,
        "max_neighbors": max_nbr,
        "blocked_atoms_per_s": (
            round(best_blocked[0] / best_blocked[1], 1) if best_blocked
            else None
        ),
        "notes": (
            "sparse = sake_tpu.sparse (cutoff neighborlist, O(N*K) work, "
            "exact vs the masked dense oracle on its graph; nlist build "
            "reported separately — amortized in MD); blocked = bigsys."
            "blocked_model_forward(remat=True): online-softmax sender "
            "blocks, O(N*block) memory, ALL-pairs semantics; dense = the "
            "O(N^2)-materializing path. vs_baseline 0: the reference's "
            "sparse layer is vestigial/broken — no comparable capability "
            "exists there."
        ),
    }))


if __name__ == "__main__":
    main()
