"""ANI-1x energy regression — the bucketed big-data path.

Capability match for ``scripts/ani/{data,split,run,run_tpu,run_gpu}.py``
and ``ani_mpi``: length-bucketed uniform-shape batches, per-element
self-energy offsets, per-layer update schedule ([False]*k + [True]*m as in
``scripts/ani/run.py:70``), NaN scrubbing (``optax.zero_nans``,
``run_tpu.py:111``), data parallelism over the mesh (replacing both the
pmap and the MPI variants — and NOT reproducing the ani_mpi bug that
all-reduced *parameters* as gradients, ``run_mpi.py:129``).

Compilation economics: one XLA program per bucket edge (bounded by
``max_buckets``), not per distinct molecule size as in the reference.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sake_tpu.data.ani import ANI_SPECIES, load_ani, to_bucket_samples
from sake_tpu.data.collate import (
    BucketedCollater,
    BucketedDataset,
    prefetch_to_device,
)
from sake_tpu.models import SAKEModel
from sake_tpu.parallel import make_dp_epoch, make_mesh, replicate_state
from sake_tpu.train import TrainState, make_optimizer
from sake_tpu.train.metrics import MetricLogger, bootstrap_mae


@dataclass
class ANIConfig:
    hidden_features: int = 64
    depth: int = 6
    n_heads: int = 4
    update: Union[bool, List[bool]] = None  # default: [False]*4 + [True]*2
    learning_rate: float = 1e-4
    batch_size: int = 32  # per bucket batch (global)
    n_epochs: int = 3
    n_samples: int = 2048
    max_buckets: int = 5
    data_dir: Optional[str] = None
    data_parallel: bool = False
    seed: int = 2666
    # Pallas train-kernel backbone (kernels/resid_ef.make_hidden_fn): one
    # kernel compile per bucket edge (bounded by max_buckets), masked,
    # first-order. Single-device path only.
    use_kernel_backbone: bool = False
    kernel_batch_tile: int = 4
    kernel_interpret: bool = False

    def __post_init__(self):
        # default schedule: message-passing-only early layers, updates last
        # (scripts/ani/run.py:70). Rebuilt whenever it no longer matches
        # depth (e.g. after dataclasses.replace(depth=...)).
        if self.update is None or (
            isinstance(self.update, list) and len(self.update) != self.depth
        ):
            k = min(2, self.depth)
            self.update = [False] * (self.depth - k) + [True] * k


class ANIModel(nn.Module):
    cfg: ANIConfig

    @nn.compact
    def __call__(self, species, x, edge_mask, node_mask):
        backbone = SAKEModel(
            hidden_features=self.cfg.hidden_features,
            out_features=1,
            depth=self.cfg.depth,
            n_heads=self.cfg.n_heads,
            update=self.cfg.update,
            name="backbone",
        )
        out, _, _ = backbone(species, x, mask=edge_mask)
        return (out[..., 0] * node_mask).sum(-1, keepdims=True)


def _prep_batch(batch, n_classes):
    """Model-ready arrays from a raw bucket batch; works for a single
    ``(B, ...)`` batch and for stacked ``(n_batches, B, ...)`` groups."""
    node_mask = (batch["z"] > 0).astype(np.float32)
    return {
        "species": jax.nn.one_hot(batch["z"], n_classes),
        "x": jnp.asarray(batch["x"]),
        "node_mask": jnp.asarray(node_mask),
        "edge_mask": jnp.asarray(
            node_mask[..., :, None] * node_mask[..., None, :]
        ),
        # graph-level energy: the per-node broadcast copy at node 0
        # ((..., N, 1) -> (...,)). The round-1 code took [:, 0], leaving a
        # trailing (N->1) axis that silently broadcast (B,) - (B, 1) to
        # (B, B) in the loss — fixed.
        "e": jnp.asarray(batch["e"][..., 0, 0]),
    }


def run(cfg: ANIConfig, logger: Optional[MetricLogger] = None):
    logger = logger or MetricLogger()
    samples = load_ani(cfg.data_dir, cfg.n_samples, seed=cfg.seed)
    rng = np.random.RandomState(cfg.seed)
    order = rng.permutation(len(samples))
    n_tr = int(len(samples) * 0.85)
    n_vl = int(len(samples) * 0.05)
    tr = [samples[i] for i in order[:n_tr]]
    te = [samples[i] for i in order[n_tr + n_vl :]]

    ds_tr = BucketedDataset(to_bucket_samples(tr), max_buckets=cfg.max_buckets)
    ds_te = BucketedDataset(to_bucket_samples(te), max_buckets=cfg.max_buckets)
    collater = BucketedCollater(ds_tr, cfg.batch_size, seed=cfg.seed)

    n_classes = max(ANI_SPECIES) + 1
    e_all = np.array([s["e"] for s in tr])
    e_mean, e_std = float(e_all.mean()), float(e_all.std() + 1e-8)

    model = ANIModel(cfg)
    edge0, first = next(iter(collater))
    b0 = _prep_batch(first, n_classes)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(cfg.seed),
        b0["species"],
        b0["x"],
        b0["edge_mask"],
        b0["node_mask"],
    )
    tx = make_optimizer(cfg.learning_rate, zero_nans=True, if_finite_patience=None)

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
        params = model_params_from_linen(params["params"]["backbone"])

        def forward(p, species, x, edge_mask, node_mask):
            h_fin = hidden(p, species, x, edge_mask)
            b, n, f = h_fin.shape
            z = jax.nn.silu(h_fin.reshape(b * n, f) @ p.w_out0 + p.b_out0)
            out = (z @ p.w_out1 + p.b_out1).reshape(b, n, -1)
            return (out[..., 0] * node_mask).sum(-1, keepdims=True)

    else:

        def forward(p, species, x, edge_mask, node_mask):
            return model.apply(p, species, x, edge_mask, node_mask)

    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    def loss_fn(params, batch):
        pred = forward(
            params, batch["species"], batch["x"], batch["edge_mask"], batch["node_mask"]
        )[..., 0]
        target = (batch["e"] - e_mean) / e_std
        return ((pred - target) ** 2).mean()

    # One scanned program per bucket group: a whole bucket's batches run as
    # one dispatch (<= max_buckets dispatches/epoch, vs the reference's one
    # pmap per batch, scripts/ani/run_tpu.py:132-134); the prefetcher
    # overlaps host collation + H2D transfer with device compute.
    sharding = None
    if cfg.data_parallel and len(jax.devices()) > 1:
        mesh = make_mesh()
        scan_group = jax.jit(make_dp_epoch(loss_fn, mesh), donate_argnums=0)
        state = replicate_state(state, mesh)
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P(None, "data"))
    else:

        def _step(state, batch):
            loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
            return state.apply_gradients(grads), loss

        @jax.jit
        def scan_group(state, batches):
            return jax.lax.scan(_step, state, batches)

    t0 = time.time()
    for epoch in range(cfg.n_epochs):
        feed = prefetch_to_device(
            (
                (e, _prep_batch(g, n_classes))
                for e, g in collater.epoch_groups()
            ),
            size=2,
            sharding=sharding,
        )
        group_losses = []
        for edge, batches in feed:
            state, losses = scan_group(state, batches)
            group_losses.append(losses)  # device arrays; no per-step sync
        logger.log(
            int(jax.device_get(state.step)),
            epoch=epoch + 1,
            train_loss=float(
                np.mean(np.concatenate([np.asarray(l).ravel() for l in group_losses]))
            ),
            wall=round(time.time() - t0, 2),
        )

    # eval over test buckets
    params_eval = jax.device_get(state.params)
    infer = jax.jit(forward)
    preds, targets = [], []
    for edge, bucket in ds_te.buckets.items():
        b = _prep_batch(bucket, n_classes)
        nb = len(b["x"])
        if cfg.use_kernel_backbone and nb % cfg.kernel_batch_tile:
            # pad the eval batch with duplicate copies of row 0 (full
            # rows, row-0 masks and all) up to a batch-tile multiple;
            # correctness comes from dropping the pads' predictions via
            # the [:nb] slice below, not from masking
            n_pad = cfg.kernel_batch_tile - nb % cfg.kernel_batch_tile
            b = jax.tree.map(
                lambda a: jnp.concatenate(
                    [jnp.asarray(a)]
                    + [jnp.asarray(a[:1])] * n_pad,
                    axis=0,
                ),
                b,
            )
        p = infer(params_eval, b["species"], b["x"], b["edge_mask"], b["node_mask"])
        preds.append(np.asarray(p[..., 0])[:nb] * e_std + e_mean)
        targets.append(np.asarray(b["e"])[:nb])
    pred, target = np.concatenate(preds), np.concatenate(targets)
    mae, low, high = bootstrap_mae(jnp.asarray(pred), jnp.asarray(target))
    results = {"test_mae": mae, "test_mae_ci": (low, high),
               "n_programs": len(ds_tr.buckets)}
    logger.log(int(jax.device_get(state.step)), test_mae=mae)
    return state, results


if __name__ == "__main__":
    run(ANIConfig(n_epochs=2, n_samples=1024))
