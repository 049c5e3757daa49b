"""Resume test (SURVEY.md §5.2.4): kill after epoch k, restart, final
state identical to an uninterrupted run; no URL fetched twice."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from heroshi_ray.fixtures import write_fixture_dir


def run_full(paths, wd, cfg_kwargs):
    from heroshi_ray.pipelines.crawl import Crawler, CrawlConfig

    c = Crawler(paths, wd, CrawlConfig(**cfg_kwargs))
    rep = c.run()
    order = c.schedule_order()
    corpus = c.corpus().to_pandas().sort_values("image_id").reset_index(drop=True)
    c.shutdown()
    return rep, order, corpus


def test_resume_identical(ray_session, tmp_path):
    fx = str(tmp_path / "fx")
    paths = write_fixture_dir(fx, n_hosts=4, n_pages=40, n_images=12, n_seeds=6, seed=7)
    base = dict(epoch_budget=48, max_epochs=10)

    # uninterrupted reference run
    rep_a, order_a, corpus_a = run_full(paths, str(tmp_path / "wd_full"), base)

    # interrupted: stop after 3 epochs (simulates a kill at a commit point),
    # then a brand-new Crawler resumes from the last committed manifest
    from heroshi_ray.pipelines.crawl import Crawler, CrawlConfig

    wd = str(tmp_path / "wd_resume")
    c1 = Crawler(paths, wd, CrawlConfig(**{**base, "max_epochs": 3}))
    c1.run()
    c1.shutdown()

    # simulate a crash mid-epoch-3: leave partial (uncommitted) outputs behind
    for sub in ("fetchlog", "corpus"):
        d = os.path.join(wd, sub, "e3")
        os.makedirs(d, exist_ok=True)
        pq.write_table(pa.table({"junk": pa.array([1])}), os.path.join(d, "junk.parquet"))

    c2 = Crawler(paths, wd, CrawlConfig(**base))
    rep_b = c2.run(resume=True)
    order_b = c2.schedule_order()
    corpus_b = c2.corpus().to_pandas().sort_values("image_id").reset_index(drop=True)
    totals_b = c2.counters_totals()
    c2.shutdown()

    # counters are checkpointed+restored: a resumed run's actor totals are
    # indistinguishable from the uninterrupted run's
    assert totals_b.get("fetch_ok", 0) == rep_a.fetch_ok
    assert totals_b.get("fetch_err", 0) == rep_a.fetch_err

    # metrics rows are per-epoch DELTAS: summing them reproduces totals
    from heroshi_ray.sources.io import read_epoch_tables

    m = read_epoch_tables(wd, "metrics").to_pandas()
    assert int(m["fetch_ok"].sum()) == rep_a.fetch_ok
    assert int(m["fetch_err"].sum()) == rep_a.fetch_err

    # identical schedule order
    da = order_a.to_pandas().sort_values(["sched_epoch", "rank"]).reset_index(drop=True)
    db = order_b.to_pandas().sort_values(["sched_epoch", "rank"]).reset_index(drop=True)
    assert da[["sched_epoch", "rank", "url"]].equals(db[["sched_epoch", "rank", "url"]])

    # identical corpus
    assert corpus_a[["image_id", "caption", "phash", "fmt"]].equals(
        corpus_b[["image_id", "caption", "phash", "fmt"]]
    )

    # no URL fetched twice across the interrupted+resumed run
    files = sorted(glob.glob(os.path.join(wd, "fetchlog", "e*", "*.parquet")))
    fdf = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()
    ok = fdf[fdf["success"]]
    assert ok["surt"].is_unique


def test_fetch_jsonl_round_trip(ray_session, tmp_path):
    """io-worker JSONL protocol sink/source: binary content base64s
    through JSON and round-trips byte-identically."""
    import ray.data

    from heroshi_ray.sources.io import read_fetch_jsonl, write_fetch_jsonl

    rows = pa.table(
        {
            "url": pa.array([f"http://h{i}.example/p{i}" for i in range(64)]),
            "status_code": pa.array([200 + (i % 3) for i in range(64)], pa.int32()),
            "content": pa.array(
                [bytes([i % 256]) * (i + 1) for i in range(64)], pa.binary()
            ),
        }
    )
    out = str(tmp_path / "fetchlog")
    write_fetch_jsonl(ray.data.from_arrow(rows), out)
    back = read_fetch_jsonl(out).to_pandas().sort_values("url").reset_index(drop=True)
    orig = rows.to_pandas().sort_values("url").reset_index(drop=True)
    assert list(back["url"]) == list(orig["url"])
    assert list(back["status_code"]) == list(orig["status_code"])
    assert list(back["content"]) == list(orig["content"])


def test_csv_round_trip(ray_session, tmp_path):
    """CSV sink/source: binary columns base64 through CSV and
    round-trip byte-identically; non-binary columns survive Arrow's
    CSV type inference."""
    import ray.data

    from heroshi_ray.sources.io import read_table_csv, write_table_csv

    rows = pa.table(
        {
            "url": pa.array([f"http://h{i}.example/p{i}" for i in range(64)]),
            "status_code": pa.array([200 + (i % 3) for i in range(64)], pa.int32()),
            "content": pa.array(
                [bytes([i % 256]) * (i + 1) for i in range(64)], pa.binary()
            ),
        }
    )
    out = str(tmp_path / "csvdir")
    write_table_csv(ray.data.from_arrow(rows), out)
    back = read_table_csv(out).to_pandas().sort_values("url").reset_index(drop=True)
    orig = rows.to_pandas().sort_values("url").reset_index(drop=True)
    assert list(back["url"]) == list(orig["url"])
    assert list(back["status_code"]) == list(orig["status_code"])
    assert list(back["content"]) == list(orig["content"])
