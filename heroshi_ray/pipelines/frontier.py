"""The flagship frontier-schedule pipeline (the BASELINE.json:2 metric
path): canonicalize -> exact dedup -> cuckoo seen-filter -> per-host
politeness cap -> deterministic global order.

Throughput metric = URLs pushed through this path per second
("URLs scheduled+deduped/sec"). The input is a frontier-shaped table;
``synth_frontier_from_sf`` derives one deterministically from the
driver's lineitem table (no external data), with Zipf-ish host skew from
the supplier key and ~8% duplicate URLs so the dedup stages do real work.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..stages.canonicalize import canonicalize_dataset
from ..stages.dedup import dedup_first
from ..stages.schedule import global_order, per_host_topk
from ..state.seen import SeenSet


def synth_frontier_from_sf(sf_dir: str) -> "ray.data.Dataset":
    """lineitem rows -> URL candidates. Hosts come from l_suppkey (skewed:
    supplier activity is not uniform), paths from order/line keys;
    duplicate URLs arise naturally when (suppkey, orderkey, linenumber)
    repeats noise variants. Deterministic, derived only from sf tables."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_linenumber", "l_partkey"],
    )

    def to_urls(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        ln = batch.column("l_linenumber").to_numpy(zero_copy_only=False)
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        # skew: fold suppliers into a few hot hosts + a long tail
        hostid = np.where(sk % 7 == 0, 0, sk % 97)
        urls = []
        for i in range(len(ok)):
            # noise variants exercise the canonicalizer (collapse to one URL)
            style = pk[i] % 4
            h = f"host{hostid[i]}.example"
            path = f"/o/{ok[i]}/l/{ln[i]}"
            if style == 0:
                urls.append(f"http://{h}{path}")
            elif style == 1:
                urls.append(f"HTTP://{h.upper()}:80{path}")
            elif style == 2:
                urls.append(f"http://{h}/x/..{path}#frag")
            else:
                urls.append(f"http://{h}/.{path}")
        return pa.table({"url": pa.array(urls, pa.string())})

    return ds.map_batches(to_urls, batch_format="pyarrow", zero_copy_batch=True)


def schedule_pipeline(
    urls: "ray.data.Dataset",
    *,
    per_host_budget: int = 64,
    epoch_budget: int = 100_000,
    n_seen_shards: int = 8,
    seen_capacity: int = 1 << 22,
    n_buckets: int = 32,
    seen: SeenSet | None = None,
):
    """url table -> scheduled FRONTIER rows (one politeness epoch).

    Owns a SeenSet actor pool unless one is passed in; caller must
    ``SeenSet.shutdown()`` when done if it passed its own."""
    own_seen = seen is None
    if seen is None:
        seen = SeenSet(n_seen_shards, seen_capacity)
    try:
        cand = canonicalize_dataset(urls)
        cand = dedup_first(cand, n_buckets=n_buckets)
        admitted = seen.filter_new(cand)
        budgets_ref = ray.put({})
        k1 = per_host_topk(
            admitted, budgets_ref, n_shards=n_buckets, default_budget=per_host_budget
        )
        sched = global_order(k1, epoch_budget)
        # consume here (count() executes the plan) so the actor pool can be
        # torn down before returning a materialized result
        out = sched.materialize()
        return out
    finally:
        if own_seen:
            seen.shutdown()


def run_flagship(sf_dir: str, **kwargs):
    """entry()'s flagship: synth frontier from sf tables -> schedule."""
    return schedule_pipeline(synth_frontier_from_sf(sf_dir), **kwargs)
