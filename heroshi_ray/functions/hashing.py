"""Deterministic 64-bit hashing, vectorized (seen-set keys, shard routing).

``hash64`` must be stable across processes and nodes (actor shards and
map_batches tasks must agree on routing), so Python's salted ``hash()``
is out. Backend: polars' xxhash-based ``Series.hash`` with a pinned
seed — C/Rust-speed, deterministic within a polars version, and
Arrow-NATIVE: an Arrow string column hashes without a ``to_pylist``
round-trip (7-8x faster than the previous pandas SipHash path on the
gate's hot columns). All hash consumers are per-run state (cuckoo
fingerprints, shard routing, bucket ids) or share this function on both
sides of a comparison (the oracle crawler imports it), so a polars
upgrade changing values is a fresh-run event, not a correctness one —
checkpoints record only their own run's admissions.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

_SEED = 0x5EED5EED


def hash64(values) -> np.ndarray:
    """uint64 hash of an iterable / numpy / Arrow array of strings (or
    ints), vectorized. Arrow inputs are hashed zero-conversion."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        s = pl.from_arrow(values)
    elif isinstance(values, pl.Series):
        s = values
    else:
        s = pl.Series(values)
    return s.hash(seed=_SEED).to_numpy()


def hash64_one(value: str) -> int:
    return int(hash64([value])[0])


def shard_of(values, n_shards: int) -> np.ndarray:
    """Routing key for seen-set shards / host partitions."""
    return (hash64(values) % np.uint64(n_shards)).astype(np.int64)
