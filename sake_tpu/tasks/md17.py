"""MD17 energy+force fitting — the canonical hot path.

Capability match for ``scripts/md17/run.py`` (and its ``md17_traj``
checkpoint-series variant): one-hot species features, energy = colored sum
of node outputs, forces by differentiating the energy w.r.t. positions
(``F = -dE/dx``, ``run.py:54-58``), loss = F-MAE + 1e-3 * E-MAE, scanned
on-device epochs, periodic checkpointing, bootstrap-MAE eval in kcal/mol.

TPU-native differences:
- energy and forces come from ONE ``value_and_grad`` pass (the reference
  ran separate jitted E and F evaluations inside the loss, recomputing the
  forward a third time for the loss gradient);
- epochs are ``lax.scan``-fused blocks with a donated state;
- checkpoints via Orbax (async, preemption-tolerant).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from sake_tpu.data.md17 import load_md17
from sake_tpu.models import SAKEModel
from sake_tpu.train import (
    Checkpointer,
    TrainState,
    make_optimizer,
    scan_epochs,
    warmup_cosine_schedule,
)
from sake_tpu.train.metrics import KCAL_PER_MOL, MetricLogger, bootstrap_mae


@dataclass
class MD17Config:
    molecule: str = "aspirin"
    hidden_features: int = 64
    depth: int = 6
    n_heads: int = 4
    learning_rate: float = 1e-4
    batch_size: int = 4
    n_train: int = 1000
    n_valid: int = 1000
    n_epochs: int = 100
    epochs_per_block: int = 10
    energy_loss_weight: float = 1e-3
    data_dir: Optional[str] = None
    checkpoint_dir: Optional[str] = None
    checkpoint_every_blocks: int = 1
    seed: int = 2666
    # Second-order Pallas kernel path (kernels/train2_ef): the fused E+F
    # primal runs on the residual-streaming kernels and the force-loss
    # training gradient on the JVP-augmented kernel pair — measured 2.56x
    # the lax double-autodiff step (BENCH_TRAIN_MD17.json). Training
    # state becomes the functional ModelParams pytree.
    use_kernel_ef: bool = False
    # VMEM champions per mode (BENCH_TRAIN_MD17.json): fused needs
    # bt=4/aug_bt=2 (its windows carry the whole depth axis — 196M >
    # 128M otherwise); shared runs bt=8/aug_bt=4 (abt=8 OOMs the
    # aug-bwd blocks). Defaults match the shipping aug_mode ("fused").
    kernel_batch_tile: int = 4
    aug_batch_tile: int = 2
    # "fused" (whole training backward — and primal — each in ONE
    # Pallas program) is the SHIPPING default: throughput champion
    # (2.98x lax, 6,574/s, BENCH_TRAIN_MD17.json) AND passes all four
    # 400-epoch convergence gates (ACCURACY_MD17.json: force MAE ratio
    # 1.000, energy 0.61 vs lax 0.59 kcal/mol). Getting there took two
    # r5 fixes — the in-kernel readout head runs at HIGHEST matmul
    # precision (Mosaic's default equals a bf16 cast, which biased the
    # energy grads), and the E VALUE is read through the same XLA
    # readout tier the evaluator uses (train/eval tier mismatch left
    # e_mae at 0.87; see ACCURACY_MD17_FUSED_BUG.json for the original
    # 2.52 failure). "shared" (2.56x, ACCURACY_MD17_SHARED.json) and
    # "resid"/"retrace" are fallbacks.
    aug_mode: str = "fused"
    kernel_interpret: bool = False  # CPU-backend testing


def make_model(cfg: MD17Config) -> SAKEModel:
    return SAKEModel(
        hidden_features=cfg.hidden_features,
        out_features=1,
        depth=cfg.depth,
        n_heads=cfg.n_heads,
    )


def make_energy_force_fn(model: SAKEModel, species_onehot, e_mean, e_std):
    """Fused (E, F) evaluation: one forward + one backward via
    ``value_and_grad`` (vs the reference's separate E and F jits)."""

    def energy_sum(params, x):
        h = jnp.broadcast_to(
            species_onehot, (*x.shape[:-1], species_onehot.shape[-1])
        )
        out, _, _ = model.apply(params, h, x)
        e = out.sum(axis=(-2, -1)) * e_std + e_mean
        return e.sum(), e

    def energy_and_forces(params, x):
        (_, e), neg_f = jax.value_and_grad(energy_sum, argnums=1, has_aux=True)(
            params, x
        )
        return e[..., None], -neg_f

    return energy_and_forces


def make_step_fn(ef_fn, energy_loss_weight):
    def loss_fn(params, batch):
        e_pred, f_pred = ef_fn(params, batch["x"])
        e_loss = jnp.abs(e_pred - batch["e"]).mean()
        f_loss = jnp.abs(f_pred - batch["f"]).mean()
        return f_loss + energy_loss_weight * e_loss

    def step(state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        return state.apply_gradients(grads), loss

    return step


def run(cfg: MD17Config, logger: Optional[MetricLogger] = None):
    logger = logger or MetricLogger()
    data = load_md17(cfg.molecule, cfg.data_dir, n_samples=cfg.n_train + 2 * cfg.n_valid)
    n_tr = cfg.n_train
    x_tr, e_tr, f_tr = data.x[:n_tr], data.e[:n_tr], data.f[:n_tr]
    x_vl = data.x[n_tr : n_tr + cfg.n_valid]
    e_vl = data.e[n_tr : n_tr + cfg.n_valid]
    f_vl = data.f[n_tr : n_tr + cfg.n_valid]

    e_mean, e_std = float(e_tr.mean()), float(e_tr.std())
    species = jax.nn.one_hot(data.z, data.z.max())

    model = make_model(cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(cfg.seed),
        jnp.broadcast_to(species, (x_tr.shape[1], species.shape[-1])),
        jnp.asarray(x_tr[0]),
    )
    total_steps = (n_tr // cfg.batch_size) * cfg.n_epochs
    tx = make_optimizer(warmup_cosine_schedule(cfg.learning_rate, total_steps))
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    if cfg.use_kernel_ef:
        from sake_tpu.kernels import model_params_from_linen
        from sake_tpu.kernels.train2_ef import make_ef_train2

        bt = min(cfg.kernel_batch_tile, cfg.batch_size)
        abt = min(cfg.aug_batch_tile, cfg.batch_size)
        if cfg.batch_size % bt or cfg.batch_size % abt:
            raise ValueError("batch_size must be divisible by kernel tiles")
        ef_raw = make_ef_train2(
            n_heads=cfg.n_heads,
            update=True,
            batch_tile=bt,
            aug_batch_tile=abt,
            edge_matmul_dtype=None if cfg.kernel_interpret else jnp.bfloat16,
            resid_dtype=(
                jnp.float32 if cfg.kernel_interpret else jnp.bfloat16
            ),
            pad_atoms=True,
            aug_mode=cfg.aug_mode,
            interpret=cfg.kernel_interpret,
        )
        n_atoms = x_tr.shape[1]

        def ef_fn(kp, x):
            h = jnp.broadcast_to(
                species, (x.shape[0], n_atoms, species.shape[-1])
            ).astype(jnp.float32)
            e, f = ef_raw(kp, h, x)
            # coloring: E = raw*std + mean => F = -dE/dx = std * f_raw
            return (e * e_std + e_mean)[..., None], f * e_std

        # EVAL runs the lax f32 functional oracle on the kernel params —
        # NOT a kernel. TRAINING stays on the bf16-tier kernels, but the
        # low-precision matmul tier adds ~0.5-1.2 kcal/mol of ENERGY MAE
        # (the 21-atom energy sum accumulates rounding noise the force
        # components don't), which once made kernel-path runs report 3x
        # the lax energy MAE while the trained parameters were actually
        # equivalent (cross-eval diagnosis, 2026-08-19: kernel-params +
        # f32-eval 0.620 vs lax 0.594 kcal/mol). Mosaic's DEFAULT f32
        # matmul is itself bf16-tier, and Precision.HIGHEST in one_ef
        # VMEM-OOMs at eval shapes (131M > 128M: 6-pass register spills)
        # — the lax path is the canonical f32 tier, costs ~50 ms once
        # per run at eval size, and needs no batch-tile padding.
        # Reference eval shape: scripts/md17/eval.py:78-85.
        from sake_tpu.kernels.functional import energy_and_forces_fn

        @jax.jit
        def ef_eval(kp, x):
            h = jnp.broadcast_to(
                species, (x.shape[0], n_atoms, species.shape[-1])
            ).astype(jnp.float32)
            e, f = energy_and_forces_fn(kp, h, x, n_heads=cfg.n_heads)
            return (e * e_std + e_mean)[..., None], f * e_std

        params = model_params_from_linen(params["params"])
        state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    else:
        ef_fn = make_energy_force_fn(model, species, e_mean, e_std)
        ef_eval = jax.jit(ef_fn)
    step_fn = make_step_fn(ef_fn, cfg.energy_loss_weight)
    train_data = {
        "x": jnp.asarray(x_tr),
        "e": jnp.asarray(e_tr),
        "f": jnp.asarray(f_tr),
    }

    @partial(jax.jit, donate_argnums=0)
    def train_block(state):
        return scan_epochs(
            step_fn,
            state,
            train_data,
            batch_size=cfg.batch_size,
            n_epochs=cfg.epochs_per_block,
        )

    ckpt = (
        Checkpointer(cfg.checkpoint_dir, keep_every_n=cfg.checkpoint_every_blocks)
        if cfg.checkpoint_dir
        else None
    )
    # kill-and-resume: restore the full train state from the latest
    # checkpoint (the reference's restart pattern, ani_mpi/run_mpi.py:110)
    if ckpt and ckpt.latest_step() is not None:
        template = jax.device_get(
            {"step": state.step, "params": state.params, "opt_state": state.opt_state}
        )
        restored = ckpt.restore(template)
        state = state.replace(
            step=jnp.asarray(restored["step"]),
            params=jax.tree.map(jnp.asarray, restored["params"]),
            opt_state=jax.tree.map(jnp.asarray, restored["opt_state"]),
        )
        logger.log(int(state.step), resumed_from=int(restored["step"]))

    n_blocks = cfg.n_epochs // cfg.epochs_per_block
    t0 = time.time()
    for block in range(n_blocks):
        state, losses = train_block(state)
        logger.log(
            int(state.step),
            epoch=(block + 1) * cfg.epochs_per_block,
            train_loss=float(jax.device_get(losses)[-1]),
            wall=round(time.time() - t0, 2),
        )
        if ckpt and (block + 1) % cfg.checkpoint_every_blocks == 0:
            ckpt.save(
                int(state.step),
                jax.device_get(
                    {"step": state.step, "params": state.params,
                     "opt_state": state.opt_state}
                ),
            )
    if ckpt:
        ckpt.wait()

    # eval: bootstrap MAE in kcal/mol (reference: md17/eval.py:78-85)
    e_pred, f_pred = ef_eval(state.params, jnp.asarray(x_vl))
    e_mae = bootstrap_mae(e_pred * KCAL_PER_MOL, jnp.asarray(e_vl) * KCAL_PER_MOL)
    f_mae = bootstrap_mae(
        f_pred.reshape(-1, 3) * KCAL_PER_MOL,
        jnp.asarray(f_vl).reshape(-1, 3) * KCAL_PER_MOL,
    )
    results = {
        "e_mae_kcalmol": e_mae[0],
        "e_mae_ci": (e_mae[1], e_mae[2]),
        "f_mae_kcalmol": f_mae[0],
        "f_mae_ci": (f_mae[1], f_mae[2]),
    }
    logger.log(int(state.step), **{k: v for k, v in results.items() if not isinstance(v, tuple)})
    return state, results


def select_best_checkpoint(cfg: MD17Config, params_like=None):
    """Checkpoint-series model selection (the md17_traj pattern,
    reference ``scripts/md17_traj/eval.py:60-78``): evaluate every saved
    checkpoint's validation force-MAE and return (best_step, best_params,
    per_step_mae)."""
    assert cfg.checkpoint_dir, "needs a checkpoint_dir"
    data = load_md17(cfg.molecule, cfg.data_dir, n_samples=cfg.n_train + 2 * cfg.n_valid)
    x_vl = jnp.asarray(data.x[cfg.n_train : cfg.n_train + cfg.n_valid])
    f_vl = jnp.asarray(data.f[cfg.n_train : cfg.n_train + cfg.n_valid])
    e_tr = data.e[: cfg.n_train]
    species = jax.nn.one_hot(data.z, data.z.max())
    model = make_model(cfg)
    if params_like is None:
        params_like = jax.jit(model.init)(
            jax.random.PRNGKey(cfg.seed),
            jnp.broadcast_to(species, (data.x.shape[1], species.shape[-1])),
            jnp.asarray(data.x[0]),
        )
        params_like = jax.device_get(params_like)
    ef_fn = jax.jit(
        make_energy_force_fn(model, species, float(e_tr.mean()), float(e_tr.std()))
    )
    total_steps = (cfg.n_train // cfg.batch_size) * cfg.n_epochs
    tx = make_optimizer(warmup_cosine_schedule(cfg.learning_rate, total_steps))
    state_like = jax.device_get(
        TrainState.create(apply_fn=model.apply, params=params_like, tx=tx)
    )
    template = {
        "step": state_like.step,
        "params": state_like.params,
        "opt_state": state_like.opt_state,
    }
    scores = {}
    best = (None, None, float("inf"))
    with Checkpointer(cfg.checkpoint_dir) as ckpt:
        for step in ckpt.all_steps():
            params = ckpt.restore(template, step=step)["params"]
            _, f_pred = ef_fn(params, x_vl)
            mae = float(jnp.abs(f_pred - f_vl).mean())
            scores[step] = mae
            if mae < best[2]:
                best = (step, params, mae)
    return best[0], best[1], scores


if __name__ == "__main__":
    import sys

    molecule = sys.argv[1] if len(sys.argv) > 1 else "aspirin"
    run(MD17Config(molecule=molecule, n_epochs=20, epochs_per_block=5))
