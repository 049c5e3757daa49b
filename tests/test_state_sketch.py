"""Robots cache actor pool, HLL sketch accuracy, phash near-dup op."""

from __future__ import annotations

import numpy as np
import pytest


def test_hll_accuracy_and_merge():
    from heroshi_ray.functions.hashing import hash64
    from heroshi_ray.functions.sketch import HyperLogLog

    n = 200_000
    keys = [f"url{i}" for i in range(n)]
    h1 = HyperLogLog(p=14)
    h2 = HyperLogLog(p=14)
    hashes = hash64(keys)
    h1.add_hashes(hashes[: n // 2])
    h2.add_hashes(hashes[n // 3 :])  # overlapping halves
    merged = h1.merge(h2)
    est = merged.estimate()
    assert abs(est - n) / n < 0.02
    # roundtrip
    r = HyperLogLog.from_bytes(merged.to_bytes())
    assert r.estimate() == est
    # deterministic
    h3 = HyperLogLog(p=14)
    h3.add_hashes(hash64(keys))
    assert isinstance(h3.estimate(), float)


def test_robots_cache_pool(ray_session):
    from heroshi_ray.functions.robots import allowed, crawl_delay
    from heroshi_ray.state.robotscache import RobotsCache

    fetch_table = {
        "a.example": ("User-agent: *\nDisallow: /x/\nCrawl-delay: 3\n", 200),
        "b.example": ("", 404),
        "c.example": ("", 503),
    }
    rc = RobotsCache(fetch_table, n_shards=2)
    rules = rc.rules_for(["a.example", "b.example", "c.example", "unknown.example"])
    assert not allowed(rules["a.example"], "/x/page")
    assert allowed(rules["a.example"], "/y")
    assert crawl_delay(rules["a.example"]) == 3.0
    assert allowed(rules["b.example"], "/anything")
    assert not allowed(rules["c.example"], "/anything")  # 5xx -> disallow all
    assert allowed(rules["unknown.example"], "/anything")  # no robots -> allow
    # second lookup is served from cache (same result)
    rules2 = rc.rules_for(["a.example"])
    assert rules2["a.example"] == rules["a.example"]
    stats = rc.stats()
    assert sum(s["hosts_cached"] for s in stats) >= 4
    rc.shutdown()


def test_phash_neardup_finds_planted(ray_session):
    from heroshi_ray.pipelines.dataops import q_phash_neardup

    out = q_phash_neardup("unused").to_pandas()
    # the three lossy re-encodes pair with their originals
    planted = {("img00000000", "dup0000"), ("img00000001", "dup0001"),
               ("img00000002", "dup0002")}
    found = set(zip(out["image_a"], out["image_b"]))
    normalized = {tuple(sorted(p)) for p in found}
    assert {tuple(sorted(p)) for p in planted} <= normalized
    assert (out["hamming"] <= 6).all()


def test_approx_distinct_close_to_exact(ray_session):
    import duckdb

    from heroshi_ray.pipelines.dataops import q_approx_distinct

    sf = "/root/testdata/sf0.001"
    est = q_approx_distinct(sf).column("approx_distinct")[0].as_py()
    exact = duckdb.sql(
        f"SELECT count(DISTINCT l_orderkey || ':' || l_partkey) FROM '{sf}/lineitem.parquet'"
    ).fetchone()[0]
    assert abs(est - exact) / exact < 0.05


def test_sample_deterministic(ray_session):
    from heroshi_ray.pipelines.dataops import q_sample

    sf = "/root/testdata/sf0.001"
    a = q_sample(sf).to_pandas()
    b = q_sample(sf).to_pandas()
    assert len(a) == len(b)
    assert 0 < len(a) < 6000 * 0.05


def test_tdigest_rank_error_and_mergeability():
    import numpy as np

    from heroshi_ray.functions.sketch import TDigest

    rng = np.random.default_rng(11)
    v = rng.lognormal(3.0, 1.5, 100_000)
    sv = np.sort(v)

    def rank_of(x):
        return np.searchsorted(sv, x) / len(sv)

    # two different block splits must both land within the error bound
    for n_blocks in (16, 64):
        acc = TDigest()
        for b in np.array_split(v, n_blocks):
            acc = acc.merge(TDigest.from_values(b))
        for q in (0.5, 0.9, 0.99, 0.999):
            est = acc.quantile(q)
            assert abs(rank_of(est) - q) < 0.005, (n_blocks, q)
        # sketch stays small regardless of input size
        assert len(acc.means) < 400


def test_tdigest_quantiles_query(ray_session):
    import duckdb
    import numpy as np

    from heroshi_ray.pipelines.dataops import q_tdigest_quantiles

    sf = "/root/testdata/sf0.001"
    out = q_tdigest_quantiles(sf).to_pandas().set_index("q")["value_approx"]
    vals = np.sort(
        duckdb.sql(f"SELECT value FROM '{sf}/events.parquet'").df()["value"].to_numpy()
    )
    for q in (50, 90, 99):
        est = out[q]
        rank = np.searchsorted(vals, est) / len(vals)
        assert abs(rank - q / 100.0) < 0.02, q
