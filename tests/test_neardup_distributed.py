"""The distributed near-dup verify tails (round-2 rework) pinned against
independent single-process ground truth.

Each of q_minhash_neardup / q_phash_neardup / q_embed_neardup used to
collapse its verify/merge step onto the driver; they now run as
map_groups + pair-dedup shuffles. These tests recompute the expected
pair sets with plain Python/numpy (same candidate-generation semantics,
no Ray) and assert exact equality — rows AND values — so the rework is
behaviour-preserving and the IVF-bucketed embedding path has recall 1.0
on the driver data.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_minhash_neardup_matches_single_process(ray_session):
    from heroshi_ray.functions.text import MinHasher, jaccard, shingles
    from heroshi_ray.pipelines.dataops import q_minhash_neardup

    got = q_minhash_neardup(SF_DIR).to_pandas()

    docs = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pandas()
    mh = MinHasher(64)
    buckets: dict[tuple[int, int], list[int]] = {}
    sh = {}
    for r in docs.itertuples():
        s = shingles(r.text or "", 3)
        sh[r.doc_id] = s
        for b, key in enumerate(mh.bands(mh.signature(s), 16)):
            buckets.setdefault((b, key), []).append(r.doc_id)
    pairs = set()
    for ids in buckets.values():
        ids = sorted(set(ids))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    expect = sorted(
        (a, b, round(jaccard(sh[a], sh[b]), 4))
        for a, b in pairs
        if jaccard(sh[a], sh[b]) >= 0.6
    )
    assert list(map(tuple, got.itertuples(index=False))) == expect


def test_minhash_neardup_driver_fork_equivalence(ray_session):
    """The driver bucket-pair fork (bands pulled once, _group_pairs +
    np.unique dedup, broadcast-id text fetch) must reproduce the
    distributed banding/verify plan exactly."""
    from heroshi_ray.pipelines.dataops import q_minhash_neardup

    a = q_minhash_neardup(SF_DIR).to_pandas()
    b = q_minhash_neardup(SF_DIR, force_distributed=True).to_pandas()
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_phash_neardup_matches_single_process(ray_session):
    from heroshi_ray.functions.image import hamming64
    from heroshi_ray.pipelines.dataops import q_phash_neardup

    got = q_phash_neardup(SF_DIR).to_pandas()
    # the query builds/caches its own synthetic corpus; recompute truth
    # from the same cached file with plain loops
    t = pq.read_table(
        "/tmp/heroshi_ray_cache/corpus_neardup.parquet", columns=["image_id", "phash"]
    )
    ids = t.column("image_id").to_pylist()
    phs = np.array(t.column("phash").to_pylist(), dtype=np.int64)
    # multi-index candidate rule: pairs sharing >= 1 of 4 16-bit quadrants
    expect = []
    up = phs.view(np.uint64)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            share = any(
                int((up[i] >> np.uint64(16 * b)) & np.uint64(0xFFFF))
                == int((up[j] >> np.uint64(16 * b)) & np.uint64(0xFFFF))
                for b in range(4)
            )
            if not share:
                continue
            d = int(hamming64([phs[i]], [phs[j]])[0])
            if d <= 6:
                a, b = sorted((ids[i], ids[j]))
                expect.append((a, b, d))
    expect.sort()
    assert list(map(tuple, got.itertuples(index=False))) == expect
    assert len(expect) >= 3  # the fixture plants 3 near-dups


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_embed_neardup_ivf_recall_exact(ray_session, sf_dir):
    """IVF-bucketed near-dup == brute-force all-pairs (recall 1.0) on the
    driver data, including the e4-rounded similarity values."""
    from heroshi_ray.functions.ann import as_matrix, l2_normalize
    from heroshi_ray.pipelines.dataops import q_embed_neardup

    got = q_embed_neardup(sf_dir).to_pandas()

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    mat = l2_normalize(as_matrix(t.column("embedding").to_pylist()).astype(np.float64))
    sims = mat @ mat.T
    iu, ju = np.triu_indices(len(ids), k=1)
    cand = sims[iu, ju] >= 0.45 - 1e-9
    ci, cj = iu[cand], ju[cand]
    s = np.einsum("ij,ij->i", mat[ci], mat[cj])
    keep = s >= 0.45
    expect = sorted(
        (int(min(ids[a], ids[b])), int(max(ids[a], ids[b])), int(round(float(x) * 10000)))
        for a, b, x in zip(ci[keep], cj[keep], s[keep])
    )
    assert list(map(tuple, got.itertuples(index=False))) == expect
    assert len(expect) > 0


def test_embed_neardup_driver_fork_equivalence(ray_session):
    """The driver assign/cell_pairs pass must reproduce the distributed
    explode+shuffle plan exactly (same centroid sample, same e4
    rounding)."""
    from heroshi_ray.pipelines.dataops import q_embed_neardup

    a = q_embed_neardup(SF_DIR).to_pandas()
    b = q_embed_neardup(SF_DIR, force_distributed=True).to_pandas()
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_minhash_join_path_equals_broadcast_path(ray_session):
    """broadcast_limit=0 forces the distributed hash-join verify; both
    layouts must return identical pairs+values."""
    from heroshi_ray.pipelines.dataops import q_minhash_neardup

    a = q_minhash_neardup(SF_DIR).to_pandas()
    b = q_minhash_neardup(SF_DIR, broadcast_limit=0).to_pandas()
    assert a.equals(b)


def test_simhash_neardup_matches_single_process(ray_session):
    """4-band multi-index with hamming<=3 is EXACT (pigeonhole): result
    must equal brute-force all-pairs."""
    from heroshi_ray.functions.image import hamming64
    from heroshi_ray.functions.text import simhash64
    from heroshi_ray.pipelines.dataops import q_simhash_neardup

    got = q_simhash_neardup("/root/testdata/sf0.01").to_pandas()

    t = pq.read_table(
        os.path.join("/root/testdata/sf0.01", "documents.parquet"),
        columns=["doc_id", "text"],
    )
    ids = np.array(t.column("doc_id").to_pylist(), dtype=np.int64)
    v = np.array(simhash64(t.column("text").to_pylist()), dtype=np.int64)
    iu, ju = np.triu_indices(len(ids), 1)
    d = hamming64(v[iu], v[ju])
    keep = d <= 3
    expect = sorted(
        (int(min(ids[a], ids[b])), int(max(ids[a], ids[b])), int(x))
        for a, b, x in zip(iu[keep], ju[keep], d[keep])
    )
    assert list(map(tuple, got.itertuples(index=False))) == expect
    assert len(expect) > 0


def test_shipping_priority_join_path_equals_broadcast(ray_session):
    """broadcast_limit=0 forces the two-hash-join Q3 plan; results must
    equal the broadcast-probe plan."""
    import pandas as pd

    from heroshi_ray.pipelines.relational import q_shipping_priority

    a = q_shipping_priority(SF_DIR).to_pandas()
    b = q_shipping_priority(SF_DIR, broadcast_limit=0).to_pandas()
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    assert len(a) == 10


def test_dedup_clusters_transitive_chain(ray_session, tmp_path):
    """Label propagation must close transitively: v0~v1 and v1~v2 put
    v0,v2 in ONE cluster even though cos(v0,v2) < threshold; v3 is
    isolated and keeps its own id."""
    import pyarrow as pa

    from heroshi_ray.pipelines.dataops import q_dedup_clusters

    def rot(deg):
        r = np.deg2rad(deg)
        v = np.zeros(8, np.float32)
        v[0], v[1] = np.cos(r), np.sin(r)
        return v.tolist()

    # cos(v0,v1)=cos(60°)=0.5 ≥ 0.45; cos(v1,v2)=0.5; cos(v0,v2)=cos(120°)=-0.5
    tbl = pa.table(
        {
            "vec_id": pa.array([10, 20, 30, 99], pa.int64()),
            "embedding": pa.array(
                [rot(0), rot(60), rot(120), [0.0] * 7 + [1.0]],
                pa.list_(pa.float32()),
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    out = (
        q_dedup_clusters(str(tmp_path), threshold=0.45)
        .to_pandas()
        .set_index("vec_id")["cluster_id"]
    )
    assert out[10] == out[20] == out[30] == 10  # one transitive cluster, min id
    assert out[99] == 99  # isolated: own id


def test_anti_join_distributed_path_equals_broadcast(ray_session):
    """broadcast_limit=0 forces the bucketed left_anti hash join; both
    layouts must return identical customers."""
    import pandas as pd

    from heroshi_ray.pipelines.relational import q_anti_join

    cols = ["c_custkey", "c_name"]
    a = q_anti_join(SF_DIR).to_pandas().sort_values(cols).reset_index(drop=True)
    b = (
        q_anti_join(SF_DIR, broadcast_limit=0)
        .to_pandas()[cols]
        .sort_values(cols)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    assert len(a) > 0


def test_small_qty_revenue_join_path_equals_broadcast(ray_session):
    """broadcast_limit=0 forces the distributed lineitem ⋈ per-part
    hash join for pass 2; the single-row result must be identical."""
    from heroshi_ray.pipelines.relational import q_small_qty_revenue

    a = q_small_qty_revenue(SF_DIR).to_pandas()
    b = q_small_qty_revenue(SF_DIR, broadcast_limit=0).to_pandas()
    assert a.equals(b)


def test_ngram_df_join_path_equals_broadcast(ray_session):
    """df_broadcast_limit=0 forces the distributed DF hash join +
    groupby(doc) prefix selection; results must be identical (the
    AllPairs prefix lemma holds for any path computing the same DF
    order)."""
    from heroshi_ray.pipelines.dataops import q_ngram_jaccard

    a = q_ngram_jaccard(SF_DIR).to_pandas()
    b = q_ngram_jaccard(SF_DIR, df_broadcast_limit=0).to_pandas()
    assert a.equals(b)
    assert len(a) > 0


def _chain_embeddings(tmp_path, n: int):
    """Chain of n vectors where cos(v_i, v_{i+1}) = 0.5 >= 0.45 and all
    non-adjacent cosines are 0: v_i = (e_i + e_{i+1}) / sqrt(2)."""
    import pyarrow as pa

    dim = n + 2
    vecs = []
    for i in range(n):
        v = np.zeros(dim, np.float32)
        v[i], v[i + 1] = 1.0, 1.0
        vecs.append((v / np.sqrt(2)).tolist())
    iso = np.zeros(dim, np.float32)
    iso[dim - 1] = 1.0
    vecs.append(iso.tolist())
    tbl = pa.table(
        {
            "vec_id": pa.array(list(range(100, 100 + n)) + [9999], pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))


def test_dedup_clusters_long_chain_log_rounds(ray_session, tmp_path):
    """Pointer doubling must close a diameter-40 chain in O(log n)
    rounds, not O(n): the pre-doubling layout needed ~40 iterations."""
    from heroshi_ray.pipelines.dataops import q_dedup_clusters

    n = 40
    _chain_embeddings(tmp_path, n)
    stats: dict = {}
    out = (
        q_dedup_clusters(str(tmp_path), threshold=0.45, stats=stats)
        .to_pandas()
        .set_index("vec_id")["cluster_id"]
    )
    assert (out.loc[100 : 100 + n - 1] == 100).all()  # one transitive cluster
    assert out[9999] == 9999  # isolated keeps own id
    assert 0 < stats["iters"] <= 8, stats  # log2(40)≈5.3 + slack, not ~40


def test_dedup_clusters_distributed_labels_equal_driver(ray_session, tmp_path):
    """driver_labels_max=0 forces the Dataset-resident label path
    (joins + groupby-Min + doubling self-join); cluster assignment must
    be identical to the driver-vector path, and rounds stay O(log n)."""
    from heroshi_ray.pipelines.dataops import q_dedup_clusters

    n = 24
    _chain_embeddings(tmp_path, n)
    a = (
        q_dedup_clusters(str(tmp_path), threshold=0.45)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    stats: dict = {}
    b = (
        q_dedup_clusters(
            str(tmp_path), threshold=0.45, driver_labels_max=0, stats=stats
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    assert 0 < stats["iters"] <= 8, stats


def test_dedup_clusters_distributed_path_sf001(ray_session):
    """Forced-distributed path on the real sf0.001 fixture equals the
    default path row-for-row (the equivalence standard every other
    size-adaptive switch in the repo is held to)."""
    import pandas as pd

    from heroshi_ray.pipelines.dataops import q_dedup_clusters

    a = (
        q_dedup_clusters(SF_DIR)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    b = (
        q_dedup_clusters(SF_DIR, driver_labels_max=0)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_pagerank_distributed_path_equals_broadcast(ray_session):
    """force_distributed keeps the rank vector Dataset-resident (the
    100-TB path); both layouts must produce identical int64 fixed-point
    ranks — the arithmetic is exact, so equality is bitwise."""
    import pandas as pd

    from heroshi_ray.pipelines.dataops import q_pagerank

    def norm(res):
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        return df.sort_values("custkey").reset_index(drop=True).astype("int64")

    a = norm(q_pagerank(SF_DIR))  # driver fork (under driver_edges_max)
    b = norm(q_pagerank(SF_DIR, force_distributed=True))
    c = norm(q_pagerank(SF_DIR, driver_edges_max=0))  # broadcast regime
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    pd.testing.assert_frame_equal(a, c, check_exact=True)
    assert len(a) > 0
    # rank mass is conserved up to per-node floor loss: sum <= 10^12,
    # within n_nodes + n_edges units of it
    assert a["pagerank_e12"].sum() <= 10**12


def test_hamming_pairs_distributed_dedup_equals_driver(ray_session):
    """driver_pairs_max=0 forces the distributed hash(pair) dedup
    shuffle before pairs reach the driver (the high-dup-corpus path);
    the verified pair set must be identical to the driver-pandas path."""
    import pandas as pd
    import pyarrow as pa

    import ray
    from heroshi_ray.functions.text import simhash64
    from heroshi_ray.pipelines.dataops import _pq, hamming_band_pairs

    def run(**kw):
        ds = _pq(SF_DIR, "documents", columns=["doc_id", "text"], split=True)

        def sh(batch):
            v = simhash64(batch.column("text").to_pylist())
            return pa.table(
                {"doc_id": batch.column("doc_id"),
                 "simhash": pa.array(v, pa.int64())}
            )

        hashed = ds.map_batches(sh, batch_format="pyarrow", zero_copy_batch=True)
        return hamming_band_pairs(
            hashed, id_col="doc_id", hash_col="simhash", max_hamming=3,
            a_col="doc_a", b_col="doc_b", id_arrow_type=pa.int64(), **kw
        ).to_pandas()

    a = run()
    b = run(driver_pairs_max=0)
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True), check_exact=True
    )


def test_volume_shipping_distributed_path_equals_broadcast(ray_session):
    """broadcast_limit=0 forces lineitem-partials ⋈ orders hash join;
    both layouts must produce identical nation-pair volumes."""
    import pandas as pd

    from heroshi_ray.pipelines.relational import q_volume_shipping

    cols = ["supp_nation", "cust_nation", "l_year", "revenue_e4"]

    def norm(t):
        return (
            t.to_pandas()[cols].sort_values(cols).reset_index(drop=True)
        )

    a = norm(q_volume_shipping(SF_DIR))
    b = norm(q_volume_shipping(SF_DIR, broadcast_limit=0))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    assert len(a) > 0


def test_no_order_customers_distributed_path_equals_broadcast(ray_session):
    """broadcast_limit=0 forces the left_anti hash join on the recent-
    order key set; both layouts must produce identical rollups."""
    import pandas as pd

    from heroshi_ray.pipelines.relational import q_no_order_customers

    cols = ["c_nationkey", "n_cust", "acctbal_e2"]

    def norm(ds):
        return ds.to_pandas()[cols].sort_values(cols).reset_index(drop=True)

    a = norm(q_no_order_customers(SF_DIR))
    b = norm(q_no_order_customers(SF_DIR, broadcast_limit=0))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    assert len(a) > 0


def test_image_clusters_match_union_find(ray_session):
    """q_image_clusters must equal a brute-force union-find over the
    verified q_phash_neardup pair list, with the lexicographically
    smallest member as the cluster id; images without a near-dup keep
    their own id."""
    from heroshi_ray.pipelines.dataops import q_image_clusters, q_phash_neardup

    pairs = q_phash_neardup(SF_DIR).to_pandas()
    assert len(pairs) > 0  # planted dups guarantee a non-trivial graph

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    for x, y in zip(pairs["image_a"], pairs["image_b"]):
        union(x, y)

    # canonical root = min member id per component
    members: dict = {}
    for x in parent:
        members.setdefault(find(x), set()).add(x)
    expected = {}
    for root, ms in members.items():
        rep = min(ms | {root})
        for m in ms | {root}:
            expected[m] = rep

    out = q_image_clusters(SF_DIR).to_pandas()
    assert len(out) > 0
    n_nontrivial = 0
    for iid, cid in zip(out["image_id"], out["cluster_id"]):
        assert cid == expected.get(iid, iid), (iid, cid)
        if cid != iid:
            n_nontrivial += 1
    assert n_nontrivial > 0


def test_promo_revenue_distributed_path_equals_broadcast(ray_session):
    """broadcast_limit=0 forces the per-part-partials ⋈ part hash join;
    both layouts must produce the identical two sums."""
    from heroshi_ray.pipelines.relational import q_promo_revenue

    a = q_promo_revenue(SF_DIR).to_pandas()
    b = q_promo_revenue(SF_DIR, broadcast_limit=0).to_pandas()
    assert a["promo_e4"].iloc[0] == b["promo_e4"].iloc[0]
    assert a["total_e4"].iloc[0] == b["total_e4"].iloc[0]
    assert int(a["total_e4"].iloc[0]) > 0


def test_large_orders_distributed_fork(ray_session):
    """broadcast_limit=0 forces the hot-set hash join onto orders; both
    plans must produce the identical Q18 result."""
    from heroshi_ray.pipelines.relational import q_large_orders

    a = q_large_orders(SF_DIR).to_pandas()
    b = q_large_orders(SF_DIR, broadcast_limit=0).to_pandas()
    ca = a[sorted(a.columns)].sort_values(sorted(a.columns)).reset_index(drop=True)
    cb = b[sorted(b.columns)].sort_values(sorted(b.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(ca, cb, check_dtype=False, check_exact=True)


def test_hits_distributed_path_equals_broadcast(ray_session):
    """q_hits' Dataset-resident score-vector path (the 100-TB regime)
    must reproduce the broadcast path bit-for-bit — all arithmetic is
    int64 fixed-point with a global-max rescale, so equality is exact."""
    import pandas as pd

    from heroshi_ray.pipelines.dataops import q_hits

    def norm(res):
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        return df.sort_values("custkey").reset_index(drop=True).astype("int64")

    a = norm(q_hits(SF_DIR))  # driver-combine fork at sf0.001
    b = norm(q_hits(SF_DIR, force_distributed=True))
    c = norm(q_hits(SF_DIR, driver_edges_max=0))  # broadcast mid fork
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    pd.testing.assert_frame_equal(a, c, check_exact=True)
    # rescale invariant: every round tops out at exactly e6
    assert a["auth_e6"].max() == 10**6 and a["hub_e6"].max() == 10**6


def test_opic_distributed_matches_broadcast(ray_session):
    """q_opic's Dataset-resident cash/history path (the 100-TB regime)
    must reproduce the broadcast path bit-for-bit — all arithmetic is
    int64 with floored divisions, so equality is exact; and total cash
    is conserved up to the deterministic flooring losses (history sums
    to <= n_rounds * 10^12, > 90% of it)."""
    import pandas as pd

    from heroshi_ray.pipelines.dataops import q_opic

    def norm(res):
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        return df.sort_values("custkey").reset_index(drop=True).astype("int64")

    a = norm(q_opic(SF_DIR))  # driver-combine fork at sf0.001
    b = norm(q_opic(SF_DIR, force_distributed=True))
    c = norm(q_opic(SF_DIR, driver_edges_max=0))  # broadcast mid fork
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    pd.testing.assert_frame_equal(a, c, check_exact=True)
    total = int(a["history"].sum())
    assert total <= 3 * 10**12
    assert total > 0.9 * 3 * 10**12  # flooring loses < 10% of the mass
    assert a["history"].nunique() > 1  # the graph actually differentiates


def test_minhash_clusters_distributed_equals_driver(ray_session):
    """driver_labels_max=0 forces the Dataset-resident label path (the
    web-duplicate-rate regime where the pair graph is corpus-scale);
    cluster assignment must equal the driver-vector path exactly."""
    import pandas as pd

    from heroshi_ray.pipelines.dataops import q_minhash_clusters

    def norm(ds):
        return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)

    a = norm(q_minhash_clusters(SF_DIR))
    b = norm(q_minhash_clusters(SF_DIR, driver_labels_max=0))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    assert (a["doc_id"] != a["cluster_id"]).sum() > 0  # non-trivial graph


def test_phash_clusters_distributed_equals_driver(ray_session):
    """String-id distributed fork: min-STRING label propagation
    (Dataset-resident) must reproduce the lexicographic-rank driver
    path exactly, including representatives."""
    import pandas as pd

    from heroshi_ray.pipelines.dataops import q_phash_clusters

    def norm(ds):
        return ds.to_pandas().sort_values("image_id").reset_index(drop=True)

    a = norm(q_phash_clusters(SF_DIR))
    b = norm(q_phash_clusters(SF_DIR, driver_labels_max=0))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    assert (a["image_id"] != a["cluster_id"]).sum() > 0


def test_image_clusters_distributed_equals_driver(ray_session):
    """driver_nodes_max=0 forces q_image_clusters through the
    Dataset-resident string fork; must equal the default path."""
    import pandas as pd

    from heroshi_ray.pipelines.dataops import q_image_clusters

    def norm(ds):
        return ds.to_pandas().sort_values("image_id").reset_index(drop=True)

    a = norm(q_image_clusters(SF_DIR))
    b = norm(q_image_clusters(SF_DIR, driver_nodes_max=0))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    assert (a["image_id"] != a["cluster_id"]).sum() > 0


def test_minhash_clusters_matches_union_find(ray_session):
    """q_minhash_clusters must equal brute-force union-find over the
    same verified pair list, with min-id representatives."""
    import pandas as pd

    from heroshi_ray.pipelines.dataops import (
        q_minhash_clusters,
        q_minhash_neardup,
    )

    out = q_minhash_clusters(SF_DIR).to_pandas()
    pairs = q_minhash_neardup(SF_DIR)
    pairs = pairs.to_pandas() if not isinstance(pairs, pd.DataFrame) else pairs
    assert len(pairs) > 0

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for _, r in pairs.iterrows():
        ra, rb = find(int(r["doc_a"])), find(int(r["doc_b"]))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    got = dict(zip(out["doc_id"].astype(int), out["cluster_id"].astype(int)))
    assert len(got) == len(out)
    for did, cid in got.items():
        assert cid == (find(did) if did in parent else did)


def test_cc_attach_str_variable_length_ids(ray_session):
    """Regression (r4 review): the driver-path attach must not truncate
    a cluster representative longer than a batch's longest id (numpy
    fixed-width <U-n assignment semantics). Edge ('aa_long','z') must
    label 'z' with 'aa_long', including in a batch containing only
    'z'."""
    import pyarrow as pa

    import ray
    from heroshi_ray.pipelines.dataops import _cc_attach_str

    ids = ["z", "aa_long", "mmm"]
    ds = ray.data.from_arrow(
        pa.table({"doc": pa.array(ids, pa.string())})
    ).repartition(3)  # one id per batch -> 'z' batch has <U1 ids
    sa = np.asarray(["aa_long"])
    sb = np.asarray(["z"])
    out = (
        _cc_attach_str(ds, "doc", sa, sb, max_iters=10, driver_labels_max=1000)
        .to_pandas()
        .set_index("doc")["cluster_id"]
    )
    assert out["z"] == "aa_long"
    assert out["aa_long"] == "aa_long"
    assert out["mmm"] == "mmm"


def test_containment_prefix_fork_equivalence(ray_session):
    """The prefix-filtered candidate+verify fast path must reproduce the
    pairwise partial-count plan exactly (same pairs, same cont_e4)."""
    from heroshi_ray.pipelines.dataops import q_containment_neardup

    def norm(r):
        df = r.to_pandas() if hasattr(r, "to_pandas") else r
        return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    a = norm(q_containment_neardup(SF_DIR))
    b = norm(q_containment_neardup(SF_DIR, force_distributed=True))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    # candidate-overflow guard: when the prefix-filter candidate set
    # outgrows the broadcast bound the fast path must FALL THROUGH to
    # the pairwise plan (not assert/crash) with identical output
    c = norm(q_containment_neardup(SF_DIR, cand_broadcast_limit=1))
    pd.testing.assert_frame_equal(a, c, check_dtype=False, check_exact=True)
