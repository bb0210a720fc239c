"""Flow-model training: augmented coupling flows and the CNF/ODE flow.

Capability match for ``scripts/dw4_aug``, ``scripts/lj13_aug``,
``scripts/qm9_aug`` (augmented-coupling NLL via ``f_backward``,
``dw4_aug/run.py:39-43``), and ``scripts/dw4`` (continuous NF,
``dw4/run.py:36-41``). The reference fuses 100-epoch blocks into one jit
(``many_epochs``); here the same is done with ``scan_epochs``.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sake_tpu.data.particles import load_dw4, load_lj13
from sake_tpu.flows import AugmentedFlowModel, ODEFlow
from sake_tpu.models import SAKEModel
from sake_tpu.train import TrainState, make_optimizer, scan_epochs
from sake_tpu.train.metrics import MetricLogger


@dataclass
class AugmentedFlowConfig:
    system: str = "dw4"  # dw4 | lj13 | qm9
    depth: int = 4
    mp_depth: int = 4
    hidden_features: int = 32
    learning_rate: float = 1e-4
    batch_size: int = 100
    n_epochs: int = 20
    epochs_per_block: int = 10
    n_train: int = 1000
    n_test: int = 500
    data_dir: Optional[str] = None
    seed: int = 2666


def _flow_data(cfg: AugmentedFlowConfig):
    if cfg.system == "dw4":
        x = load_dw4(cfg.n_train + cfg.n_test, seed=cfg.seed)
        h_dim = 2
    elif cfg.system == "lj13":
        x = load_lj13(cfg.n_train + cfg.n_test, seed=cfg.seed)
        h_dim = 2
    elif cfg.system == "qm9":
        # fixed-size (19 heavy atom) positions, as scripts/qm9_aug/run.py:14-17
        from sake_tpu.data.qm9 import load_qm9

        data = load_qm9(cfg.data_dir, (cfg.n_train + cfg.n_test) * 3, cfg.seed)
        sizes = (data.charges > 0).sum(-1)
        sel = np.where(sizes == np.bincount(sizes).argmax())[0]
        n = int(sizes[sel[0]])
        x = data.x[sel][:, :n].astype(np.float32)
        x = x - x.mean(axis=-2, keepdims=True)
        h_dim = 2
    else:
        raise ValueError(cfg.system)
    return x, h_dim


def run_augmented(cfg: AugmentedFlowConfig, logger: Optional[MetricLogger] = None):
    logger = logger or MetricLogger()
    x, h_dim = _flow_data(cfg)
    # the qm9 modal-size filter can return fewer samples than requested
    # (scripts/qm9_aug/run.py:14-17 filters to one molecule size); split
    # proportionally over what exists and clamp the batch to the train set.
    n_tr = min(
        cfg.n_train,
        max(1, round(len(x) * cfg.n_train / (cfg.n_train + cfg.n_test))),
    )
    x_tr, x_te = x[:n_tr], x[n_tr:]
    bs = min(cfg.batch_size, len(x_tr))
    n = x_tr.shape[1]
    h = jnp.zeros((bs, n, h_dim))

    model = AugmentedFlowModel(
        depth=cfg.depth, mp_depth=cfg.mp_depth, hidden_features=cfg.hidden_features
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(cfg.seed),
        h,
        jnp.asarray(x_tr[:bs]),
        jnp.asarray(x_tr[:bs]),
    )
    tx = make_optimizer(cfg.learning_rate)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    def step_fn(state, batch):
        key = jax.random.fold_in(jax.random.PRNGKey(0), state.step)

        def loss_fn(params):
            return model.apply(params, h, batch["x"], key, method=model.nll)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    data = {"x": jnp.asarray(x_tr)}

    @partial(jax.jit, donate_argnums=0)
    def train_block(state):
        return scan_epochs(
            step_fn, state, data,
            batch_size=bs, n_epochs=cfg.epochs_per_block,
        )

    t0 = time.time()
    for block in range(cfg.n_epochs // cfg.epochs_per_block):
        state, losses = train_block(state)
        logger.log(
            int(state.step),
            epoch=(block + 1) * cfg.epochs_per_block,
            nll=float(jax.device_get(losses)[-1]),
            wall=round(time.time() - t0, 2),
        )

    # test NLL (same estimator on held-out data; fall back to one train
    # batch when the modal-size filter leaves no full held-out batch)
    if len(x_te) < bs:
        x_te = x_tr[-bs:]
    n_te = (len(x_te) // bs) * bs
    te_nll = []
    eval_nll = jax.jit(
        lambda params, xb, key: model.apply(params, h, xb, key, method=model.nll)
    )
    for i, s in enumerate(range(0, n_te, bs)):
        te_nll.append(
            float(
                eval_nll(
                    state.params,
                    jnp.asarray(x_te[s : s + bs]),
                    jax.random.PRNGKey(i),
                )
            )
        )
    results = {"test_nll": float(np.mean(te_nll))}
    logger.log(int(state.step), **results)
    return state, results


@dataclass
class CNFConfig:
    depth: int = 16
    hidden_features: int = 16
    learning_rate: float = 1e-4
    n_epochs: int = 20
    n_train: int = 256
    n_test: int = 128
    seed: int = 2666


def run_cnf(cfg: CNFConfig, logger: Optional[MetricLogger] = None):
    """DW-4 continuous normalizing flow (``scripts/dw4/run.py``)."""
    logger = logger or MetricLogger()
    x = load_dw4(cfg.n_train + cfg.n_test, seed=cfg.seed)
    x_tr = jnp.asarray(x[: cfg.n_train])
    x_te = jnp.asarray(x[cfg.n_train :])

    model = SAKEModel(
        hidden_features=cfg.hidden_features, depth=cfg.depth, out_features=1
    )
    t_feat = x_tr.sum(axis=-1, keepdims=True)
    params = jax.jit(model.init)(jax.random.PRNGKey(cfg.seed), t_feat, x_tr)
    tx = make_optimizer(cfg.learning_rate)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    @jax.jit
    def step(state, key):
        def loss_fn(params):
            return ODEFlow.nll(model, params, x_tr, key)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    t0 = time.time()
    for epoch in range(cfg.n_epochs):
        state, loss = step(state, jax.random.PRNGKey(epoch))
        if (epoch + 1) % max(1, cfg.n_epochs // 5) == 0:
            logger.log(
                int(state.step),
                epoch=epoch + 1,
                nll=float(loss),
                wall=round(time.time() - t0, 2),
            )

    test_nll = float(
        jax.jit(lambda p, k: ODEFlow.nll(model, p, x_te, k))(
            state.params, jax.random.PRNGKey(12345)
        )
    )
    results = {"test_nll": test_nll}
    logger.log(int(state.step), **results)
    return state, results


if __name__ == "__main__":
    import sys

    system = sys.argv[1] if len(sys.argv) > 1 else "dw4"
    if system == "cnf":
        run_cnf(CNFConfig(n_epochs=5, depth=4))
    else:
        run_augmented(
            AugmentedFlowConfig(system=system, n_epochs=4, epochs_per_block=2)
        )
