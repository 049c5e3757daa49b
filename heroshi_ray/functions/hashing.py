"""Deterministic 64-bit hashing, vectorized (seen-set keys, shard routing).

``hash64`` must be stable across processes and nodes (actor shards and
map_batches tasks must agree on routing), so Python's salted ``hash()``
is out. We use pandas' SipHash-1-3 string hasher (``pd.util.hash_array``
with its fixed default key) — C-speed, deterministic, public API.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_HASH_KEY = "0123456789123456"  # pandas' documented default key, pinned explicitly


def hash64(values) -> np.ndarray:
    """uint64 SipHash of an iterable / array of strings (vectorized)."""
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, categorize=False, hash_key=_HASH_KEY)


def hash64_one(value: str) -> int:
    return int(hash64([value])[0])


def shard_of(values, n_shards: int) -> np.ndarray:
    """Routing key for seen-set shards / host partitions."""
    return (hash64(values) % np.uint64(n_shards)).astype(np.int64)
