"""Ablation runs: the MD17 template with one architecture flag toggled.

Capability match for ``scripts/ablation/{egnn,no_euclidean,no_semantic,
no_spatial,no_update}``. Note the reference quirk (documented at
``sake_tpu.layers.DenseSAKELayer``): in the dense layer,
``use_semantic_attention``/``use_euclidean_attention`` only change whether
``log_gamma`` is a learned parameter — replicated faithfully.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from sake_tpu.data.md17 import load_md17
from sake_tpu.models import EGNN, SAKEModel
from sake_tpu.tasks.md17 import make_step_fn
from sake_tpu.train import TrainState, make_optimizer, scan_epochs
from sake_tpu.train.metrics import KCAL_PER_MOL, MetricLogger, bootstrap_mae

FLAGS = ("egnn", "no_euclidean", "no_semantic", "no_spatial", "no_update")


@dataclass
class AblationConfig:
    flag: str = "no_update"
    molecule: str = "aspirin"
    hidden_features: int = 64
    depth: int = 6
    learning_rate: float = 1e-4
    batch_size: int = 4
    n_train: int = 400
    n_valid: int = 200
    n_epochs: int = 20
    epochs_per_block: int = 5
    energy_loss_weight: float = 1e-3
    data_dir: Optional[str] = None
    seed: int = 2666


def make_model(cfg: AblationConfig):
    if cfg.flag == "egnn":
        return EGNN(
            hidden_features=cfg.hidden_features,
            out_features=1,
            depth=cfg.depth,
            update=False,
        )
    kwargs = dict(
        hidden_features=cfg.hidden_features, out_features=1, depth=cfg.depth
    )
    if cfg.flag == "no_euclidean":
        kwargs["use_euclidean_attention"] = False
    elif cfg.flag == "no_semantic":
        kwargs["use_semantic_attention"] = False
    elif cfg.flag == "no_spatial":
        kwargs.update(use_spatial_attention=False, update=False)
    elif cfg.flag == "no_update":
        kwargs["update"] = False
    else:
        raise ValueError(f"unknown ablation flag {cfg.flag!r}; known: {FLAGS}")
    return SAKEModel(**kwargs)


def run(cfg: AblationConfig, logger: Optional[MetricLogger] = None):
    logger = logger or MetricLogger()
    data = load_md17(cfg.molecule, cfg.data_dir, n_samples=cfg.n_train + cfg.n_valid)
    x_tr, e_tr, f_tr = (
        data.x[: cfg.n_train],
        data.e[: cfg.n_train],
        data.f[: cfg.n_train],
    )
    x_vl = data.x[cfg.n_train :]
    f_vl = data.f[cfg.n_train :]
    e_mean, e_std = float(e_tr.mean()), float(e_tr.std())
    species = jax.nn.one_hot(data.z, data.z.max())
    model = make_model(cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(cfg.seed),
        jnp.broadcast_to(species, (x_tr.shape[1], species.shape[-1])),
        jnp.asarray(x_tr[0]),
    )
    tx = make_optimizer(cfg.learning_rate)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    def ef_fn(params, x):
        def energy_sum(x_):
            h = jnp.broadcast_to(species, (*x_.shape[:-1], species.shape[-1]))
            out, _, _ = model.apply(params, h, x_)
            e = out.sum(axis=(-2, -1)) * e_std + e_mean
            return e.sum(), e

        (_, e), neg_f = jax.value_and_grad(energy_sum, argnums=0, has_aux=True)(x)
        return e[..., None], -neg_f

    step_fn = make_step_fn(ef_fn, cfg.energy_loss_weight)
    dset = {"x": jnp.asarray(x_tr), "e": jnp.asarray(e_tr), "f": jnp.asarray(f_tr)}

    @partial(jax.jit, donate_argnums=0)
    def train_block(state):
        return scan_epochs(
            step_fn, state, dset,
            batch_size=cfg.batch_size, n_epochs=cfg.epochs_per_block,
        )

    t0 = time.time()
    for block in range(cfg.n_epochs // cfg.epochs_per_block):
        state, losses = train_block(state)
        logger.log(
            int(state.step),
            epoch=(block + 1) * cfg.epochs_per_block,
            train_loss=float(jax.device_get(losses)[-1]),
            wall=round(time.time() - t0, 2),
        )

    _, f_pred = jax.jit(ef_fn)(state.params, jnp.asarray(x_vl))
    f_mae = bootstrap_mae(
        f_pred.reshape(-1, 3) * KCAL_PER_MOL,
        jnp.asarray(f_vl).reshape(-1, 3) * KCAL_PER_MOL,
    )
    results = {"flag": cfg.flag, "f_mae_kcalmol": f_mae[0]}
    logger.log(int(state.step), **results)
    return state, results
