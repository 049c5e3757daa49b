"""Robots gate (J2) + politeness top-k (K1) + global schedule order (K2).

This is the frontier's "hand out a crawl batch" path — heroshi's
manager crawl-queue handout with a ``limit`` ([UPSTREAM-M], reference
unavailable), re-expressed as Ray Data shuffles (BASELINE.json:6
"priority frontier expressed as groupby(host)-aggregate-sort shuffles"):

1. J2: robots semi-join — the parsed robots table is tiny relative to
   the frontier, so it is broadcast once via ``ray.put`` and applied as
   a vectorized mask inside ``map_batches`` (no shuffle).
2. K1: per-host budget cap — ONE shuffle keyed on
   ``host_shard = hash64(host) % P`` (coarse buckets, not per-host
   groups), then a vectorized per-bucket "top budget_h per host".
   Hot hosts can't flood an epoch: their emission is capped by budget,
   which also contains Zipf host skew at the K2 sort.
3. K2: deterministic global order — sort by (priority desc, surt asc)
   + limit(epoch_budget). The ONLY global sort in the hot path; its
   input is already budget-capped (≤ Σ budgets rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions.hashing import hash64
from ..functions.robots import allowed

_SHARD_COL = "__host_shard"


def _path_of(url: str, host: str) -> str:
    # canonical urls are scheme://hostport/path[?query]; locate the path
    # from the authority separator, NOT by searching for the host string
    # (a short host like "t" would match inside "http://")
    i = url.find("://")
    j = url.find("/", i + 3 if i != -1 else 0)
    return url[j:] if j != -1 else "/"

_ALLOWED_COL = "__allowed"


def mark_robots(ds: "ray.data.Dataset", robots_ref) -> "ray.data.Dataset":
    """ONE robots pass: append a boolean ``__allowed`` column using the
    broadcast parsed-robots dict {host: Rules}. Hosts absent from the
    dict are allowed (no robots -> allow-all). Hosts with no rules (the
    common case) short-circuit to an all-True slice per host run."""

    def gate(batch: pa.Table) -> pa.Table:
        robots = ray.get(robots_ref)
        urls = batch.column("url").to_pylist()
        hosts = batch.column("host").to_pylist()
        mask = np.ones(len(urls), dtype=bool)
        # per-batch host->rules cache: one dict lookup per distinct host
        cache: dict = {}
        for i, (u, h) in enumerate(zip(urls, hosts)):
            try:
                rules = cache[h]
            except KeyError:
                rules = cache[h] = robots.get(h)
            if rules is not None and rules[0]:
                mask[i] = allowed(rules, _path_of(u, h))
        return batch.append_column(_ALLOWED_COL, pa.array(mask))

    return ds.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)


def split_robots(ds: "ray.data.Dataset", robots_ref) -> tuple:
    """Split pending rows into (allowed_ds, denied_ds) with ONE robots
    evaluation pass: mark_robots appends ``__allowed``, the marked set is
    pinned in the object store (spills at scale), and both sides are
    cheap column filters over it."""
    gated = mark_robots(ds, robots_ref).materialize()

    def side(keep: bool):
        def f(batch: pa.Table) -> pa.Table:
            m = batch.column(_ALLOWED_COL)
            if not keep:
                m = pa.compute.invert(m)
            return batch.filter(m).drop_columns([_ALLOWED_COL])

        return gated.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)

    return side(True), side(False)


def per_host_topk(
    ds: "ray.data.Dataset",
    budgets_ref,
    n_shards: int = 32,
    default_budget: int = 0,
) -> "ray.data.Dataset":
    """K1: within each host keep the ``budget[host]`` highest-priority rows
    (priority desc, surt asc tie-break). One bucket-keyed shuffle; the
    per-bucket body is vectorized pandas (sort + groupby.cumcount)."""

    def add_shard(batch: pa.Table) -> pa.Table:
        sh = (hash64(batch.column("host")) % np.uint64(n_shards)).astype(
            np.int32
        )
        return batch.append_column(_SHARD_COL, pa.array(sh, pa.int32()))

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        budgets = ray.get(budgets_ref)
        g = group.sort_values(
            ["host", "priority", "surt"], ascending=[True, False, True], kind="mergesort"
        )
        rank = g.groupby("host", sort=False).cumcount()
        cap = g["host"].map(budgets).fillna(default_budget).to_numpy()
        return g[rank.to_numpy() < cap]

    return (
        ds.map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(_SHARD_COL)
        .map_groups(topk, batch_format="pandas")
        .drop_columns([_SHARD_COL])
    )


def global_order(ds: "ray.data.Dataset", epoch_budget: int) -> "ray.data.Dataset":
    """K2: deterministic cross-host schedule order."""
    return ds.sort(["priority", "surt"], descending=[True, False]).limit(epoch_budget)


class VectorRobots:
    """Vectorized robots gate for the flagship hot path.

    mark_robots() above evaluates ``allowed()`` per row in Python — fine
    for the crawl loop's epoch batches, wrong for the headline path that
    streams tens of millions of URLs. This matcher evaluates a broadcast
    {host: Rules} dict with one Arrow/numpy pass per (rule-bearing host,
    rule) instead of per row:

    - rows are grouped by host via np.unique (a ~|hosts| operation);
      hosts absent from the dict — the common case — are skipped whole;
    - plain-prefix rules (no '*' or '$', the overwhelmingly common robots
      form) vectorize as np.char.startswith over that host's path slice;
      wildcard/anchored rules fall back to the compiled-regex matcher on
      the slice only;
    - longest-match-wins / allow-wins-ties is replayed vectorially with
      (best_len, best_allow) arrays, bit-identical to ``allowed()``
      (equivalence-tested in tests/test_robots.py).
    """

    def __init__(self, robots: dict[str, "Rules"]):
        # keep only hosts that can deny anything
        self.robots = {h: r for h, r in robots.items() if r[0]}

    def mask(self, urls: np.ndarray, hosts: np.ndarray) -> np.ndarray:
        out = np.ones(len(urls), dtype=bool)
        if not self.robots:
            return out
        uh, inv = np.unique(hosts, return_inverse=True)
        for hi, h in enumerate(uh):
            rules = self.robots.get(h)
            if rules is None:
                continue
            idx = np.flatnonzero(inv == hi)
            paths = _paths_np(urls[idx])
            best_len = np.full(len(idx), -1, dtype=np.int64)
            best_allow = np.ones(len(idx), dtype=bool)
            for pattern, is_allow in rules[0]:
                if "*" in pattern or pattern.endswith("$"):
                    from ..functions.robots import _rule_re

                    rx = _rule_re(pattern)
                    m = np.fromiter(
                        (rx.match(p) is not None for p in paths),
                        dtype=bool, count=len(paths),
                    )
                else:
                    m = np.char.startswith(paths, pattern)
                plen = len(pattern)
                upd = m & (
                    (plen > best_len)
                    | ((plen == best_len) & is_allow & ~best_allow)
                )
                best_len[upd] = plen
                best_allow[upd] = is_allow
            out[idx] = best_allow
        return out


def _paths_np(urls: np.ndarray) -> np.ndarray:
    """Path component of canonical urls, vectorized (one RE2 pass)."""
    import polars as pl

    s = pl.Series(urls.astype(object).tolist(), dtype=pl.String)
    p = s.str.replace(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", "")
    return np.asarray(
        p.to_pandas().fillna("/").replace("", "/").to_numpy(), dtype="U"
    )
