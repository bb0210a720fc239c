"""Dataset ingestion and batch collation."""

from sake_tpu.data.collate import (
    BucketedCollater,
    BucketedDataset,
    pad_graphs,
    make_bucket_edges,
)
from sake_tpu.data import nbody

__all__ = [
    "BucketedCollater",
    "BucketedDataset",
    "pad_graphs",
    "make_bucket_edges",
    "nbody",
]
