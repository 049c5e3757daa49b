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


REDIRECT_STATUSES = (301, 302, 303, 307, 308)
MAX_REDIRECTS = 4


def pages_index(pages: pa.Table) -> dict:
    """url -> (status, content_type, body, fetch_ms, location) lookup."""
    urls = pages.column("url").to_pylist()
    st = pages.column("status_code").to_pylist()
    ct = pages.column("content_type").to_pylist()
    body = pages.column("body").to_pylist()
    ms = pages.column("fetch_ms").to_pylist()
    loc = (
        pages.column("location").to_pylist()
        if "location" in pages.column_names
        else [""] * len(urls)
    )
    return {
        u: (s, c, b, m, lo) for u, s, c, b, m, lo in zip(urls, st, ct, body, ms, loc)
    }


class SyntheticFetcher:
    """Deterministic in-sandbox stand-in for an HTTP fetcher actor.

    Follows 3xx redirect chains itself (bounded at MAX_REDIRECTS hops,
    like heroshi's Go http.Client): the terminal page's status/body is
    the result, ``final_url`` / ``redirect_chain`` record the chase so
    the crawl loop can mark the discovered URLs seen (they flow through
    canonicalize like links). A loop or over-long chain fails the fetch
    with the last 3xx status (non-retryable)."""

    def __init__(self, pages_ref, now_us: int = 0, counters=None):
        from ..functions.urlnorm import resolve

        obj = ray.get(pages_ref)  # broadcast: one get per ACTOR, zero per batch
        # an Arrow pages TABLE ships zero-copy through the object store
        # (a 146k-entry dict cost ~1 s to build+pickle on the driver);
        # the url->row dict is built here, once per actor/worker process
        self.pages = pages_index(obj) if isinstance(obj, pa.Table) else obj
        self.now_us = now_us
        self.counters = counters  # A-C actor handle; fire-and-forget reporting
        self.resolve = resolve

    def _fetch_one(self, url: str):
        """-> (status, ctype, body, ms, error, final_url, chain)."""
        cur = url
        chain: list[str] = []
        total_ms = 0.0
        while True:
            rec = self.pages.get(cur)
            if rec is None:
                return -1, "", None, total_ms + 1.0, "connect: host unreachable", cur, chain
            s, c, b, m, loc = rec
            total_ms += m
            if s in REDIRECT_STATUSES and loc:
                nxt = self.resolve(cur, loc)
                if nxt is None:
                    return s, c, None, total_ms, f"bad Location {loc!r}", cur, chain
                if len(chain) >= MAX_REDIRECTS or nxt in chain or nxt == url:
                    return s, c, None, total_ms, "too many redirects", nxt, chain
                chain.append(nxt)
                cur = nxt
                continue
            if s == 200:
                return s, c, b, total_ms, "", cur, chain
            return s, c, None, total_ms, f"http status {s}", cur, chain

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
        finals: list[str] = []
        chains: list[list[str]] = []
        headers: list[list[tuple[str, str]]] = []
        ms = np.empty(n, dtype=np.float64)
        for i, u in enumerate(urls):
            s, c, b, m, err, fin, chain = self._fetch_one(u)
            status[i] = s
            success[i] = s == 200 and not err
            ctypes.append(c)
            bodies.append(b)
            errs.append(err)
            finals.append(fin)
            chains.append(chain)
            ms[i] = m
            hdr = [("content-type", c)] if c else []
            if chain:
                hdr.append(("location", chain[0]))
            headers.append(hdr)
        if self.counters is not None:
            from ..state.seen import idem_token

            ok = int(success.sum())
            # retry-stable token (task id + url digest): a Ray-retried
            # task re-reports with the same token and the counters actor
            # drops the duplicate; a content-only token would also drop
            # a later LEGITIMATE re-fetch of the same url batch (e.g. a
            # retry epoch), undercounting fetch_ok/fetch_err
            tok = idem_token("\n".join(urls).encode())
            self.counters.add.remote(_token=tok, fetch_ok=ok, fetch_err=n - ok)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "surt": pa.array(surts, pa.string()),
                "host": pa.array(hosts, pa.string()),
                "status_code": pa.array(status, pa.int32()),
                "success": pa.array(success, pa.bool_()),
                "headers": pa.array(headers, pa.map_(pa.string(), pa.string())),
                "content": pa.array(bodies, pa.binary()),
                "content_type": pa.array(ctypes, pa.string()),
                "fetch_ms": pa.array(ms, pa.float64()),
                "fetched_at": pa.array(
                    np.full(n, self.now_us, dtype=np.int64), pa.timestamp("us")
                ),
                "error": pa.array(errs, pa.string()),
                "final_url": pa.array(finals, pa.string()),
                "n_redirects": pa.array(
                    np.array([len(c) for c in chains], dtype=np.int32), pa.int32()
                ),
                "redirect_chain": pa.array(chains, pa.list_(pa.string())),
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
    mode: str = "actors",
) -> "ray.data.Dataset":
    if mode == "tasks":
        # small-epoch physical plan: same Fetcher semantics, but the
        # instance is cached per worker PROCESS (survives epochs) instead
        # of per actor-pool execution — see runtime.task_stage
        from ..runtime import task_stage

        return scheduled.map_batches(
            task_stage(
                SyntheticFetcher,
                {"pages_ref": pages_ref, "counters": counters},
                volatile={"now_us": now_us},
            ),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
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
