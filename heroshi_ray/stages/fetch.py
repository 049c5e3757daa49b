"""A-F — the fetcher actor pool (SURVEY.md §2.3).

Heroshi's io-worker is a "dumb" concurrent fetcher: URLs in, one result
record per URL out ([UPSTREAM-H], reference unavailable). Here the
fetcher is a callable CLASS passed to ``map_batches(Fetcher,
concurrency=N, batch_size=B)``: per-actor setup (session pool / page
index) happens once in ``__init__``, per-batch work in ``__call__``.

The sandbox has no network (SURVEY.md §7.6), so ``SyntheticFetcher``
resolves against the deterministic pages fixture, shipped ONCE via
``ray.put`` and read per actor in ``__init__`` (broadcast, not
re-shipped per batch). Its interface — FRONTIER rows in, FETCH rows
out — is exactly what a real HTTP fetcher would implement; swap the
class to go live.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..schemas import FETCH


def pages_index(pages: pa.Table) -> dict:
    """url -> (status, content_type, body, fetch_ms) lookup dict."""
    urls = pages.column("url").to_pylist()
    st = pages.column("status_code").to_pylist()
    ct = pages.column("content_type").to_pylist()
    body = pages.column("body").to_pylist()
    ms = pages.column("fetch_ms").to_pylist()
    return {u: (s, c, b, m) for u, s, c, b, m in zip(urls, st, ct, body, ms)}


class SyntheticFetcher:
    """Deterministic in-sandbox stand-in for an HTTP fetcher actor."""

    def __init__(self, pages_ref, now_us: int = 0, counters=None):
        self.pages = ray.get(pages_ref)  # broadcast: one get per ACTOR, zero per batch
        self.now_us = now_us
        self.counters = counters  # A-C actor handle; fire-and-forget reporting

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        surts = batch.column("surt").to_pylist()
        hosts = batch.column("host").to_pylist()
        n = len(urls)
        status = np.empty(n, dtype=np.int32)
        success = np.empty(n, dtype=bool)
        ctypes: list[str] = []
        bodies: list[bytes | None] = []
        errs: list[str] = []
        ms = np.empty(n, dtype=np.float64)
        for i, u in enumerate(urls):
            rec = self.pages.get(u)
            if rec is None:
                status[i] = -1
                success[i] = False
                ctypes.append("")
                bodies.append(None)
                errs.append("connect: host unreachable")
                ms[i] = 1.0
            else:
                s, c, b, m = rec
                status[i] = s
                success[i] = s == 200
                ctypes.append(c)
                bodies.append(b if s == 200 else None)
                errs.append("" if s == 200 else f"http status {s}")
                ms[i] = m
        if self.counters is not None:
            ok = int(success.sum())
            self.counters.add.remote(fetch_ok=ok, fetch_err=n - ok)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "surt": pa.array(surts, pa.string()),
                "host": pa.array(hosts, pa.string()),
                "status_code": pa.array(status, pa.int32()),
                "success": pa.array(success, pa.bool_()),
                "headers": pa.array(["{}"] * n, pa.string()),
                "content": pa.array(bodies, pa.binary()),
                "content_type": pa.array(ctypes, pa.string()),
                "fetch_ms": pa.array(ms, pa.float64()),
                "fetched_at": pa.array(
                    np.full(n, self.now_us, dtype=np.int64), pa.timestamp("us")
                ),
                "error": pa.array(errs, pa.string()),
            },
            schema=FETCH,
        ).append_column(
            # passthrough frontier context for downstream extract/retry logic
            "depth", batch.column("depth")
        ).append_column("retries", batch.column("retries")).append_column(
            "priority", batch.column("priority")
        )


def fetch_dataset(
    scheduled: "ray.data.Dataset",
    pages_ref,
    now_us: int = 0,
    concurrency: int | tuple[int, int] = 4,
    batch_size: int = 256,
    counters=None,
) -> "ray.data.Dataset":
    return scheduled.map_batches(
        SyntheticFetcher,
        fn_constructor_kwargs={
            "pages_ref": pages_ref, "now_us": now_us, "counters": counters,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.25,  # I/O-shaped stage: don't starve CPU stages
    )
