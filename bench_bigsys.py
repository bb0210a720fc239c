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

Flagship model config (depth 6, hidden 64, 4 heads), B=1 system.

Prints ONE JSON line. Usage: ``python bench_bigsys.py [Nmax] [block]``.
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
    sizes = [n for n in (512, 1024, 2048, 4096, 8192) if n <= n_max]

    from sake_tpu.bigsys import blocked_model_forward
    from sake_tpu.kernels import model_forward, model_params_from_linen
    from sake_tpu.models import SAKEModel

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
        return x, h

    # ---- verification gate at the smallest size --------------------------
    n0 = sizes[0]
    x0, h0 = inputs(n0)
    (e_d, f_d) = jax.block_until_ready(make_ef("dense", n0)(x0, h0))
    (e_b, f_b) = jax.block_until_ready(make_ef("blocked", n0)(x0, h0))
    e_err = float(abs(e_b - e_d) / (abs(e_d) + 1e-9))
    f_err = float(
        jnp.abs(f_b - f_d).max() / (jnp.abs(f_d).max() + 1e-9)
    )
    verified = e_err < 5e-3 and f_err < 5e-3
    if not verified:
        print(json.dumps({
            "metric": "bigsys_blocked_ef_atoms_per_s",
            "value": 0.0, "unit": "atom-evals/s",
            "vs_baseline": 0.0, "error":
                f"verification FAILED at N={n0}: e_err {e_err:.2e} "
                f"f_err {f_err:.2e}",
        }))
        sys.exit(1)

    # ---- sweep ------------------------------------------------------------
    table = {}
    best_blocked = None
    dense_limit = None
    for n in sizes:
        x, h = inputs(n)
        row = {}
        for kind in ("dense", "blocked"):
            if kind == "dense" and dense_limit is not None:
                row[kind] = "skipped (OOM at smaller N)"
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

    n_big, sec_big = best_blocked
    atoms_per_s = n_big / sec_big
    print(json.dumps({
        "metric": "bigsys_blocked_ef_atoms_per_s",
        "value": round(atoms_per_s, 1),
        "unit": f"atom-evals/s at N={n_big} (fused E+F, single chip)",
        "vs_baseline": 0.0,
        "verified": {"N": n0, "e_rel_err": round(e_err, 8),
                     "f_rel_err": round(f_err, 8)},
        "ms_per_eval": table,
        "block_size": block,
        "notes": (
            "blocked = bigsys.blocked_model_forward(remat=True): online-"
            "softmax sender blocks, O(N*block) memory for forward AND "
            "forces; dense = the O(N^2)-materializing path. vs_baseline "
            "0: the reference's sparse layer is vestigial/broken — no "
            "comparable capability exists there."
        ),
    }))


if __name__ == "__main__":
    main()
