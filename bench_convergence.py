"""MD17 training CONVERGENCE: proof the kernel path *learns*, not just runs.

Throughput artifacts (BENCH_TRAIN_MD17.json) show the second-order kernel
path is 2.5x faster per step than lax double autodiff; this artifact shows
the steps go to the same place. It trains the flagship aspirin energy+force
workload twice with the SAME config and seed through ``tasks/md17.run``
(capability match for ``/root/reference/scripts/md17/run.py`` +
``eval.py:78-85``):

- ``lax``  — double autodiff through the linen model (the oracle path);
- ``kernel`` — ``use_kernel_ef``: the SHIPPING default kernel path —
  ``kernels/train2_ef`` ``aug_mode="fused"`` (whole training backward
  and primal each in one Pallas program, the round-4 2.98x champion,
  bt=4/aug_bt=2) — with eval on the lax f32 functional oracle (the
  canonical precision tier — the bf16 kernel eval tier once inflated
  energy MAE 3.1x on identical params). The fused mode's worst on-chip
  param-grad rel is 8.1e-2 (bf16 tier); THIS artifact is the proof that
  tier converges to lax-parity MAE, not just matches per-step.

and reports both validation force/energy MAEs (bootstrap CI, kcal/mol)
next to the untrained-data force scale. Gates (recorded in the JSON and
reflected in the exit code): the kernel-path force MAE must land within
25% of the lax path's and both must beat the trivial mean-force
predictor by >2x — i.e. the fast path converges like the reference
formulation does.

Data is the Morse-surrogate synthetic MD17 (zero-egress environments ship
no ``aspirin_dft.npz``); with ``--data-dir`` pointing at real npz files the
same protocol runs on true DFT data.

Prints ONE JSON line. Usage: ``python bench_convergence.py [n_epochs]``.
``--smoke`` shrinks the protocol (64 train / 64 valid, batch 32) and runs
the kernels in interpret mode so the script is executable end-to-end on a
CPU backend; gates are still evaluated but a smoke run's MAEs are not a
performance artifact.
"""

import io
import json
import sys
import time

import numpy as np


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_epochs = int(args[0]) if args else 400
    data_dir = None
    if "--data-dir" in sys.argv:
        data_dir = sys.argv[sys.argv.index("--data-dir") + 1]
    smoke = "--smoke" in sys.argv
    aug_mode = None  # None = the task's shipping default
    if "--aug-mode" in sys.argv:
        aug_mode = sys.argv[sys.argv.index("--aug-mode") + 1]

    from sake_tpu.data.md17 import load_md17
    from sake_tpu.tasks.md17 import MD17Config, run
    from sake_tpu.train.metrics import KCAL_PER_MOL, MetricLogger

    n_train, n_valid, batch = (64, 64, 32) if smoke else (1000, 500, 128)
    common = dict(
        molecule="aspirin",
        n_train=n_train,
        n_valid=n_valid,
        batch_size=batch,
        n_epochs=n_epochs,
        epochs_per_block=max(1, n_epochs // 4),
        data_dir=data_dir,
        kernel_interpret=smoke,
    )

    # trivial predictor baseline: force MAE of always answering the mean
    # training force (~= the force scale of the data)
    data = load_md17("aspirin", data_dir, n_samples=n_train + 2 * n_valid)
    f_tr = data.f[:n_train].reshape(-1, 3)
    f_vl = data.f[n_train : n_train + n_valid].reshape(-1, 3)  # valid slice
    baseline_mae = float(
        np.abs(f_vl - f_tr.mean(0)).mean() * KCAL_PER_MOL
    )

    kextra = {"use_kernel_ef": True}
    if aug_mode is not None:
        kextra["aug_mode"] = aug_mode
        if aug_mode == "fused":
            kextra["kernel_batch_tile"] = 4
            kextra["aug_batch_tile"] = 2
    results = {}
    for name, extra in (
        ("lax", {}),
        ("kernel", kextra),
    ):
        cfg = MD17Config(**common, **extra)
        logger = MetricLogger(stream=io.StringIO())  # quiet block logs
        t0 = time.time()
        _, res = run(cfg, logger=logger)
        results[name] = {
            "f_mae_kcalmol": round(res["f_mae_kcalmol"], 5),
            "f_mae_ci": [round(v, 5) for v in res["f_mae_ci"]],
            "e_mae_kcalmol": round(res["e_mae_kcalmol"], 5),
            "wall_s": round(time.time() - t0, 1),
        }
        print(f"# {name}: {results[name]}", file=sys.stderr, flush=True)

    k, l = results["kernel"]["f_mae_kcalmol"], results["lax"]["f_mae_kcalmol"]
    ke, le = (
        results["kernel"]["e_mae_kcalmol"], results["lax"]["e_mae_kcalmol"]
    )
    gates = {
        "lax_learns (mae < trivial/2)": l < baseline_mae / 2,
        "kernel_learns (mae < trivial/2)": k < baseline_mae / 2,
        "kernel_matches_lax (within 25%)": k < 1.25 * l,
        # energy too: the MD17 loss weights energy at 1e-3 so forces
        # dominate training, but the reference's eval reports energy MAE
        # (scripts/md17/eval.py:78-85) — a kernel-path energy regression
        # must fail this artifact. The bf16 EVAL tier once cost 3.1x
        # here while the trained params were fine (eval now f32).
        "kernel_energy_matches_lax (within 25%)": ke < 1.25 * le,
    }
    print(
        json.dumps(
            {
                "metric": "md17_aspirin_train_convergence_force_mae",
                "value": k,
                "unit": "kcal/mol (validation force MAE, lower is better)",
                "vs_baseline": round(k / l, 4),
                "gates": gates,
                "gates_passed": all(gates.values()),
                "lax_f_mae_kcalmol": l,
                "trivial_predictor_f_mae_kcalmol": round(baseline_mae, 5),
                "kernel": results["kernel"],
                "lax": results["lax"],
                "n_epochs": n_epochs,
                "aug_mode": aug_mode or MD17Config.aug_mode,
                "notes": (
                    "same config+seed trained twice via tasks/md17.run: lax "
                    "double autodiff vs the second-order kernel path "
                    "(train2_ef, the shipping-default aug_mode recorded "
                    "above, lax-f32 eval oracle); vs_baseline = kernel/lax "
                    "MAE ratio (1.0 = identical convergence). Data: "
                    "Morse-surrogate synthetic MD17."
                ),
            }
        )
    )
    if not all(gates.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
