"""Canonicalize stage — M1+M2+M3+M6+M7+M12 fused into ONE map_batches
(SURVEY.md §2.2): parse, RFC 3986 normalize, SURT, scheme/policy filter,
priority score. One fused stage instead of five chained ``ds.filter``
calls keeps each Arrow block in cache and avoids per-stage task overhead.

Input: any table with a ``url`` column (seeds are a 1-col table).
Output: FRONTIER-schema candidate rows (state=pending).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.urlnorm import canonicalize_batch
from ..schemas import FRONTIER, STATE_PENDING


def priority_score(depth: np.ndarray) -> np.ndarray:
    """Deterministic priority: shallower pages first (M12). Pluggable via
    the ``priority_fn`` hook; the oracle crawler uses this same function."""
    return 1.0 / (1.0 + depth.astype(np.float64))


def blocklist_filter(blocked_hosts: frozenset = frozenset(),
                     blocked_substrings: tuple[str, ...] = ()):
    """M7 factory: batch-level URL filter (blocklist). Returns a hook
    compatible with ``canonicalize_candidates(url_filter=...)`` —
    vectorized, closure-captured, cloudpickle-shippable."""

    def fn(urls: list[str], hosts: list[str], depth: np.ndarray) -> np.ndarray:
        mask = np.ones(len(urls), dtype=bool)
        for i, (u, h) in enumerate(zip(urls, hosts)):
            if h in blocked_hosts or any(s in u for s in blocked_substrings):
                mask[i] = False
        return mask

    return fn


def canonicalize_candidates(
    batch: pa.Table,
    *,
    depth_col: str | None = None,
    parent_col: str | None = None,
    max_depth: int = 64,
    now_us: int = 0,
    epoch: int = 0,
    url_filter=None,
    priority_fn=None,
) -> pa.Table:
    """url[, depth, parent_surt] -> FRONTIER candidate rows (malformed and
    non-http(s) rows dropped — canonicalize() rejects them).

    Extension hooks (SURVEY.md §2.9): ``url_filter(urls, hosts, depth) ->
    mask`` prunes candidates (blocklist / mime / custom policy);
    ``priority_fn(depth) -> float array`` replaces the default scoring.
    Both are batch-level (vectorized) so they compose with map_batches."""
    urls = batch.column("url").to_pylist()
    canon, surt, host, ok = canonicalize_batch(urls)
    depth = (
        batch.column(depth_col).to_numpy(zero_copy_only=False).astype(np.int32)
        if depth_col
        else np.zeros(len(urls), dtype=np.int32)
    )
    parents = batch.column(parent_col).to_pylist() if parent_col else [""] * len(urls)
    mask = np.array(ok) & (depth <= max_depth)
    if url_filter is not None:
        mask &= np.asarray(url_filter(canon, host, depth), dtype=bool)
    idx = np.flatnonzero(mask)
    n = len(idx)
    canon_a = [canon[i] for i in idx]
    surt_a = [surt[i] for i in idx]
    host_a = [host[i] for i in idx]
    depth_a = depth[idx]
    parent_a = [parents[i] for i in idx]
    score = (priority_fn or priority_score)(depth_a)
    return pa.table(
        {
            "url": pa.array(canon_a, pa.string()),
            "surt": pa.array(surt_a, pa.string()),
            "host": pa.array(host_a, pa.string()),
            "priority": pa.array(score, pa.float64()),
            "depth": pa.array(depth_a, pa.int32()),
            "parent_surt": pa.array(parent_a, pa.string()),
            "discovered_at": pa.array(np.full(n, now_us, dtype=np.int64), pa.timestamp("us")),
            "state": pa.array(np.full(n, STATE_PENDING, dtype=np.uint8), pa.uint8()),
            "retries": pa.array(np.zeros(n, dtype=np.int32), pa.int32()),
            "epoch": pa.array(np.full(n, epoch, dtype=np.int64), pa.int64()),
        },
        schema=FRONTIER,
    )


def canonicalize_dataset(
    ds: "ray.data.Dataset",
    *,
    depth_col: str | None = None,
    parent_col: str | None = None,
    now_us: int = 0,
    epoch: int = 0,
    batch_size: int | None = None,
    url_filter=None,
    priority_fn=None,
) -> "ray.data.Dataset":
    # batch_size=None = one batch per block: parallelism stays equal to the
    # input block count (an explicit batch_size bundles input blocks and
    # can silently serialize a wide stage)
    return ds.map_batches(
        lambda b: canonicalize_candidates(
            b, depth_col=depth_col, parent_col=parent_col, now_us=now_us,
            epoch=epoch, url_filter=url_filter, priority_fn=priority_fn,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
