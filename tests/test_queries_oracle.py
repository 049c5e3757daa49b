"""Replicates the driver's oracle check: for every queries() entry with
an oracle_sql() twin, run both at sf0.001 and compare row count, column
names and order-insensitive values exactly."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def sql_pairs():
    import __ray_entry__ as entrymod

    q = entrymod.queries()
    o = entrymod.oracle_sql()
    return [(name, q[name], sql) for name, sql in o.items()]


@pytest.mark.parametrize("name,fn,sql", sql_pairs(), ids=[p[0] for p in sql_pairs()])
def test_query_matches_oracle(ray_session, oracle_con, name, fn, sql):
    ours = canon(to_df(fn(SF_DIR)))
    theirs = canon(oracle_con.sql(sql).df())
    assert list(ours.columns) == list(theirs.columns), (
        f"{name}: columns {list(ours.columns)} vs {list(theirs.columns)}"
    )
    assert len(ours) == len(theirs), f"{name}: rows {len(ours)} vs {len(theirs)}"
    pd.testing.assert_frame_equal(ours, theirs, check_dtype=False, check_exact=True)


def test_rows_only_queries_run(ray_session):
    import __ray_entry__ as entrymod

    q = entrymod.queries()
    o = entrymod.oracle_sql()
    rows_only = [n for n in q if n not in o]
    assert rows_only
    for name in rows_only:
        df = to_df(q[name](SF_DIR))
        assert df is not None, name
        # deterministic: run twice, same result
        if name in ("q_simhash", "q_fingerprint", "q_canonicalize"):
            df2 = to_df(q[name](SF_DIR))
            pd.testing.assert_frame_equal(
                canon(df), canon(df2), check_dtype=False, check_exact=True
            )


def test_entry_smoke(ray_session):
    import __ray_entry__ as entrymod

    res = entrymod.entry()
    df = to_df(res)
    assert len(df) >= 0
    assert "surt" in df.columns


def test_skew_join_salted_fork_equivalence(ray_session):
    """The salted shuffle join must reproduce the broadcast plan exactly
    (both are oracled against the same SQL twin)."""
    from heroshi_ray.pipelines import relational as r

    a = canon(to_df(r.q_skew_join(SF_DIR)))
    b = canon(to_df(r.q_skew_join(SF_DIR, force_salted=True, n_salts=5)))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_triangle_count_distributed_fork_equivalence(ray_session):
    """Node-scale degree broadcast vs distributed degree-join orientation
    must count identically."""
    from heroshi_ray.pipelines import dataops as d

    a = to_df(d.q_triangle_count(SF_DIR))  # driver fork at sf0.001
    b = to_df(d.q_triangle_count(SF_DIR, force_distributed=True))
    c = to_df(d.q_triangle_count(SF_DIR, driver_edges_max=0))  # broadcast
    e = to_df(d.q_triangle_count(SF_DIR, wedge_driver_max=0))  # wedge fallthrough
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    pd.testing.assert_frame_equal(a, c, check_dtype=False, check_exact=True)
    pd.testing.assert_frame_equal(a, e, check_dtype=False, check_exact=True)


def test_trap_detect_distributed_fork_equivalence(ray_session):
    """Driver-combined exact-distinct counts must equal the salted
    two-level shuffle path exactly."""
    from heroshi_ray.pipelines import webops as w

    a = canon(to_df(w.q_trap_detect(SF_DIR)))
    b = canon(to_df(w.q_trap_detect(SF_DIR, force_distributed=True)))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_url_strip_params_distributed_fork_equivalence(ray_session):
    from heroshi_ray.pipelines import webops as w

    a = canon(to_df(w.q_url_strip_params(SF_DIR)))
    b = canon(to_df(w.q_url_strip_params(SF_DIR, force_distributed=True)))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_url_host_stats_distributed_fork_equivalence(ray_session):
    from heroshi_ray.pipelines import relational as r

    a = canon(to_df(r.q_url_host_stats(SF_DIR)))
    b = canon(to_df(r.q_url_host_stats(SF_DIR, force_distributed=True)))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_fulfillment_days_distributed_fork_equivalence(ray_session):
    """Driver-combined fulfillment stats must equal the bucket-shuffle
    + distributed-hash-join path exactly (pure int64 day arithmetic)."""
    from heroshi_ray.pipelines import relational as r

    a = canon(to_df(r.q_fulfillment_days(SF_DIR)))
    b = canon(to_df(r.q_fulfillment_days(SF_DIR, force_distributed=True)))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_lm_score_distributed_fork_equivalence(ray_session):
    """Driver-bincount LM count combine must equal the distributed
    key-bounded groupby exactly (int64 counts -> identical model)."""
    from heroshi_ray.pipelines import dataops as d

    a = canon(to_df(d.q_lm_score(SF_DIR)))
    b = canon(to_df(d.q_lm_score(SF_DIR, force_distributed=True)))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_ccnet_bucket_distributed_fork_equivalence(ray_session):
    """Driver-combined (lang, nll_e4) cutoff pick must equal the
    distributed groupby+map_groups path exactly (integer cutoffs, so
    bucket labels are bit-identical across forks)."""
    from heroshi_ray.pipelines import dataops as d

    a = canon(to_df(d.q_ccnet_bucket(SF_DIR)))
    b = canon(to_df(d.q_ccnet_bucket(SF_DIR, force_distributed=True)))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_degree_stats_distributed_fork_equivalence(ray_session):
    """Driver-combined degree histogram must equal the node-keyed
    groupby path exactly (pure int64 arithmetic on both sides)."""
    from heroshi_ray.pipelines import dataops as d

    a = canon(to_df(d.q_degree_stats(SF_DIR)))
    b = canon(to_df(d.q_degree_stats(SF_DIR, force_distributed=True)))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_market_share_distributed_fork_equivalence(ray_session):
    """The orders-window hash-join path must reproduce the broadcast
    probe exactly."""
    from heroshi_ray.pipelines import relational as r

    a = canon(to_df(r.q_market_share(SF_DIR)))
    b = canon(to_df(r.q_market_share(SF_DIR, force_distributed=True)))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_attach_by_key_distributed_fork_equivalence(ray_session):
    """The three TPC-H shapes that attach order attributes through
    _attach_by_key must produce identical results on the broadcast
    searchsorted path and the distributed hash-join path."""
    from heroshi_ray.pipelines import relational as r

    for fn in (r.q_product_profit, r.q_ship_priority_class, r.q_late_suppliers):
        a = canon(to_df(fn(SF_DIR)))
        b = canon(to_df(fn(SF_DIR, force_distributed=True)))
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_top_parts_distributed_fork_equivalence(ray_session):
    """q_top_parts' driver-combine and distributed forks must agree
    exactly (forced via driver_parts_max=0)."""
    from heroshi_ray.pipelines.relational import q_top_parts

    sf = "/root/testdata/sf0.001"
    a = q_top_parts(sf).to_pandas()
    b = q_top_parts(sf, driver_parts_max=0).to_pandas()
    key = ["p_brand", "rk"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)[a.columns]
    assert a.equals(b)


def test_clv_quartiles_distributed_fork_equivalence(ray_session):
    """q_clv_quartiles' driver-combine and distributed forks must agree
    exactly (forced via driver_cust_max=0)."""
    from heroshi_ray.pipelines.relational import q_clv_quartiles

    sf = "/root/testdata/sf0.001"
    a = q_clv_quartiles(sf).to_pandas().sort_values("c_mktsegment").reset_index(drop=True)
    b = q_clv_quartiles(sf, driver_cust_max=0).to_pandas()
    b = b.sort_values("c_mktsegment").reset_index(drop=True)[a.columns]
    assert a.astype(str).equals(b.astype(str))
