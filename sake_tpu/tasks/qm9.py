"""QM9 property regression — padded batches, NaN containment, and
mesh data parallelism.

Capability match for the reference's qm9 family (``scripts/qm9_full``,
``scripts/qm9_tpu`` and their 10 tweak-variants, which differ only in
batch size, update schedule, LR, readout, and epochs — all config fields
here):

- zero-padded batches with node/edge masks (``qm9_full/run.py:23-27``),
- one-hot charge features, masked sum readout + MLP head
  (``qm9_full/run.py:46-68``),
- ``optax.apply_if_finite`` + non-finite abort threshold
  (``qm9_full/run.py:149,160``),
- data parallelism over a device mesh via shard_map — replacing the pmap +
  host-loop-per-batch path (``qm9_tpu/run.py:89-111``) with scanned
  on-device epochs inside the sharded program.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from sake_tpu.data.qm9 import dimenet_split, load_qm9
from sake_tpu.models import GraphPropertyHead, SAKEModel
from sake_tpu.parallel import make_dp_epoch, make_mesh, replicate_state
from sake_tpu.train import TrainState, make_optimizer, notfinite_count
from sake_tpu.train.metrics import MetricLogger, bootstrap_mae
from sake_tpu.utils import coloring
from flax import linen as nn


@dataclass
class QM9Config:
    hidden_features: int = 64
    depth: int = 6
    n_heads: int = 4
    update: Union[bool, List[bool]] = True
    use_mlp_head: bool = True
    learning_rate: float = 1e-4
    weight_decay: float = 1e-5
    batch_size: int = 64  # global
    n_epochs: int = 10
    epochs_per_block: int = 1
    n_samples: int = 4096  # synthetic-size fallback
    data_dir: Optional[str] = None
    # per-target selection (reference: ``python run.py <target>``,
    # qm9_full/run.py:9-18): str key for named-target npz files, int
    # column index for multi-column ``y``; thermo offsets subtracted at
    # ingestion (data/qm9.py).
    target: Union[str, int, None] = None
    subtract_thermo: bool = True
    # Size-bucketed training batches: group molecules by atom count
    # padded up to this multiple (the reference's ANI bucketing,
    # scripts/ani/data.py:37-48, applied to QM9) — cuts the O(N^2) edge
    # grid ~2x on QM9's size distribution. None keeps the reference's
    # flat 29-atom padding. Eval always runs flat (full split).
    bucket_pad_multiple: Optional[int] = None
    data_parallel: bool = True
    max_notfinite: int = 10
    seed: int = 2666
    # Pallas train-kernel backbone (first-order, masked): the residual-
    # streaming forward + hand-written backward with in-kernel parameter
    # gradients (kernels/resid_ef.make_hidden_fn). Measured 2.4x the lax
    # epoch on v5e (bench_train.py). Composes with data_parallel (the
    # custom-VJP kernel runs inside the shard_map'd scanned epoch).
    use_kernel_backbone: bool = False
    kernel_batch_tile: int = 4
    kernel_interpret: bool = False  # CPU-backend testing


class QM9Model(nn.Module):
    """SAKE backbone + masked-sum property head (qm9_full/run.py:46-68)."""

    cfg: QM9Config

    @nn.compact
    def __call__(self, species, x, edge_mask, node_mask):
        backbone = SAKEModel(
            hidden_features=self.cfg.hidden_features,
            out_features=self.cfg.hidden_features,
            depth=self.cfg.depth,
            n_heads=self.cfg.n_heads,
            update=self.cfg.update,
            name="backbone",
        )
        y, _, _ = backbone(species, x, mask=edge_mask)
        return GraphPropertyHead(
            out_features=1,
            hidden_features=self.cfg.hidden_features,
            use_mlp=self.cfg.use_mlp_head,
            name="head",
        )(y, mask=node_mask)


def run(cfg: QM9Config, logger: Optional[MetricLogger] = None):
    logger = logger or MetricLogger()
    data = load_qm9(
        cfg.data_dir, cfg.n_samples, seed=cfg.seed,
        target=cfg.target, subtract_thermo=cfg.subtract_thermo,
    )
    tr_idx, vl_idx, te_idx = dimenet_split(len(data.x))

    n_classes = int(data.charges.max()) + 1
    y_mean, y_std = float(data.y[tr_idx].mean()), float(data.y[tr_idx].std())

    def prep(idx):
        charges = data.charges[idx]
        node_mask = (charges > 0).astype(np.float32)
        return {
            "species": jax.nn.one_hot(charges, n_classes),
            "x": jnp.asarray(data.x[idx]),
            "node_mask": jnp.asarray(node_mask),
            "edge_mask": jnp.asarray(node_mask[:, :, None] * node_mask[:, None, :]),
            "y": jnp.asarray((data.y[idx] - y_mean) / y_std),
        }

    train, valid, test = prep(tr_idx), prep(vl_idx), prep(te_idx)

    model = QM9Model(cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(cfg.seed),
        train["species"][:2],
        train["x"][:2],
        train["edge_mask"][:2],
        train["node_mask"][:2],
    )
    tx = make_optimizer(
        cfg.learning_rate,
        weight_decay=cfg.weight_decay,
        if_finite_patience=5,
    )
    if cfg.use_kernel_backbone:
        from sake_tpu.kernels import model_params_from_linen
        from sake_tpu.kernels.resid_ef import make_hidden_fn

        hidden = make_hidden_fn(
            n_heads=cfg.n_heads,
            update=cfg.update,
            batch_tile=cfg.kernel_batch_tile,
            pad_atoms=True,
            edge_matmul_dtype=None if cfg.kernel_interpret else jnp.bfloat16,
            resid_dtype=jnp.float32 if cfg.kernel_interpret else jnp.bfloat16,
            interpret=cfg.kernel_interpret,
        )
        head = GraphPropertyHead(
            out_features=1,
            hidden_features=cfg.hidden_features,
            use_mlp=cfg.use_mlp_head,
        )
        params = {
            "kp": model_params_from_linen(params["params"]["backbone"]),
            "head": {"params": params["params"]["head"]},
        }

        def forward(p, species, x, edge_mask, node_mask):
            kp = p["kp"]
            h_fin = hidden(kp, species, x, edge_mask)
            B, N, F = h_fin.shape
            z = jax.nn.silu(h_fin.reshape(B * N, F) @ kp.w_out0 + kp.b_out0)
            y = (z @ kp.w_out1 + kp.b_out1).reshape(B, N, -1)
            return head.apply(p["head"], y, mask=node_mask)

    else:

        def forward(p, species, x, edge_mask, node_mask):
            return model.apply(p, species, x, edge_mask, node_mask)

    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    def loss_fn(params, batch):
        pred = forward(
            params, batch["species"], batch["x"], batch["edge_mask"], batch["node_mask"]
        )
        return ((pred - batch["y"]) ** 2).mean()

    n_batches = len(tr_idx) // cfg.batch_size
    used = n_batches * cfg.batch_size

    def batchify(split, rng):
        perm = rng.permutation(len(split["x"]))[:used]
        return jax.tree.map(
            lambda a: a[perm].reshape(n_batches, cfg.batch_size, *a.shape[1:]),
            split,
        )

    def batchify_bucketed(split, rng):
        """Groups of shape-uniform stacked batches, one entry per padded
        size (each yields its own jitted program — bounded count)."""
        mult = cfg.bucket_pad_multiple
        n_stored = split["x"].shape[1]
        sizes = np.asarray(split["node_mask"].sum(axis=-1)).astype(int)
        pad_to = np.minimum(
            np.maximum(mult, (sizes + mult - 1) // mult * mult), n_stored
        )
        perm = rng.permutation(len(sizes))
        groups = []
        for n_pad in sorted(set(pad_to.tolist())):
            idx = perm[pad_to[perm] == n_pad]
            nb = len(idx) // cfg.batch_size
            if nb == 0:
                continue
            idx = idx[: nb * cfg.batch_size]

            def cut(a, idx=idx, nb=nb, n_pad=n_pad):
                a = np.asarray(a)[idx]
                if a.ndim >= 2 and a.shape[1] == n_stored:
                    a = a[:, :n_pad]
                if a.ndim >= 3 and a.shape[2] == n_stored:
                    a = a[:, :, :n_pad]
                return jnp.asarray(
                    a.reshape(nb, cfg.batch_size, *a.shape[1:])
                )

            groups.append(jax.tree.map(cut, split))
        return groups

    rng = np.random.RandomState(cfg.seed)
    t0 = time.time()

    n_dev = len(jax.devices())
    if cfg.use_kernel_backbone:
        per_dev = cfg.batch_size // (
            n_dev if cfg.data_parallel and n_dev > 1 else 1
        )
        if per_dev % cfg.kernel_batch_tile:
            raise ValueError(
                "per-device batch must be divisible by kernel_batch_tile"
            )
    if cfg.data_parallel and n_dev > 1:
        # kernel backbone + DP compose (custom-VJP under shard_map is
        # bit-exact vs single device — tests/test_parallel.py): the same
        # loss_fn runs inside the sharded scanned epoch either way.
        mesh = make_mesh()
        epoch_fn = jax.jit(make_dp_epoch(loss_fn, mesh), donate_argnums=0)
        state = replicate_state(state, mesh)
        place = lambda b: jax.tree.map(
            lambda a: jax.device_put(
                a,
                jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec(None, "data")
                ),
            ),
            b,
        )
    else:
        def _epoch(state, batches):
            def step(state, batch):
                loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
                return state.apply_gradients(grads), loss

            return jax.lax.scan(step, state, batches)

        epoch_fn = jax.jit(_epoch, donate_argnums=0)
        place = lambda b: b

    for epoch_i in range(cfg.n_epochs):
        if cfg.bucket_pad_multiple:
            losses = []
            for group in batchify_bucketed(train, rng):
                state, gl = epoch_fn(state, place(group))
                losses.append(gl)
            losses = jnp.concatenate(losses)
        else:
            batches = place(batchify(train, rng))
            state, losses = epoch_fn(state, batches)
        nfc = notfinite_count(jax.device_get(state.opt_state))
        assert nfc <= cfg.max_notfinite, f"too many non-finite steps ({nfc})"
        logger.log(
            int(jax.device_get(state.step)),
            epoch=epoch_i + 1,
            train_loss=float(jax.device_get(losses)[-1]),
            wall=round(time.time() - t0, 2),
        )

    # eval (single device is fine; padded batches are static-shape)
    params_eval = jax.device_get(state.params)
    infer = jax.jit(forward)

    def predict(split):
        # FULL split: the ragged tail batch is padded with duplicate rows
        # (one static shape, no recompile) whose predictions are sliced
        # off — the reference evaluates every sample (qm9_full/eval.py).
        preds = []
        bs = min(max(cfg.batch_size, 64), len(split["x"]))
        if cfg.use_kernel_backbone:
            bs -= bs % cfg.kernel_batch_tile
        n = len(split["x"])
        for s in range(0, n, bs):
            sl = jax.tree.map(lambda a: a[s : s + bs], split)
            nb = len(sl["x"])
            if nb < bs:
                sl = jax.tree.map(
                    lambda a: jnp.concatenate(
                        [a, jnp.broadcast_to(a[:1], (bs - nb, *a.shape[1:]))]
                    ),
                    sl,
                )
            preds.append(
                infer(
                    params_eval, sl["species"], sl["x"], sl["edge_mask"],
                    sl["node_mask"],
                )[:nb]
            )
        return jnp.concatenate(preds), split["y"]

    results = {}
    for name, split in (("valid", valid), ("test", test)):
        pred, y = predict(split)
        mae, low, high = bootstrap_mae(
            coloring(pred, y_mean, y_std), coloring(y, y_mean, y_std)
        )
        results[f"{name}_mae"] = mae
        results[f"{name}_mae_ci"] = (low, high)
    logger.log(
        int(jax.device_get(state.step)),
        **{k: v for k, v in results.items() if not isinstance(v, tuple)},
    )
    return state, results


if __name__ == "__main__":
    run(QM9Config(n_epochs=3, n_samples=2048))
