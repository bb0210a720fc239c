"""Training subsystem: state, optimizer chains, on-device epoch loops,
checkpointing, and metrics."""

from sake_tpu.train.state import TrainState
from sake_tpu.train.optim import (
    make_optimizer,
    warmup_cosine_schedule,
    notfinite_count,
)
from sake_tpu.train.loop import scan_epoch, scan_epochs, shuffle_batches
from sake_tpu.train.checkpoint import Checkpointer
from sake_tpu.train import metrics

__all__ = [
    "TrainState",
    "make_optimizer",
    "warmup_cosine_schedule",
    "notfinite_count",
    "scan_epoch",
    "scan_epochs",
    "shuffle_batches",
    "Checkpointer",
    "metrics",
]
