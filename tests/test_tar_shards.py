"""WebDataset-style tar shard sink/source: roundtrip equality,
deterministic bytes, resumable overwrite, manifest accounting."""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pytest

import ray

from heroshi_ray.fixtures import make_corpus
from heroshi_ray.sources.tarshards import read_tar_shards, write_tar_shards


@pytest.fixture(scope="module")
def corpus() -> pa.Table:
    return make_corpus(40, seed=7)


def _sorted_pylist(t: pa.Table):
    return sorted(t.to_pylist(), key=lambda r: r["image_id"])


def test_roundtrip_and_manifest(ray_session, corpus, tmp_path):
    out = str(tmp_path / "shards")
    ds = ray.data.from_arrow(corpus).repartition(4)
    manifest = write_tar_shards(ds, out, samples_per_shard=16).to_pandas()
    assert manifest["n_samples"].sum() == corpus.num_rows
    files = sorted(f for f in os.listdir(out) if f.endswith(".tar"))
    assert set(manifest["shard"]) == set(files)
    for row in manifest.itertuples():
        assert os.path.getsize(os.path.join(out, row.shard)) == row.n_bytes
        assert row.key_min <= row.key_max

    back = read_tar_shards(out)
    got = _sorted_pylist(pa.Table.from_pandas(back.to_pandas()))
    want = _sorted_pylist(corpus)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        for col in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash"):
            assert g[col] == w[col], (g["image_id"], col)


def test_deterministic_and_resumable(ray_session, corpus, tmp_path):
    out = str(tmp_path / "shards")
    ds = ray.data.from_arrow(corpus)  # single block: stable batching
    write_tar_shards(ds, out, samples_per_shard=16).materialize()
    digests = {
        f: hashlib.sha256(open(os.path.join(out, f), "rb").read()).hexdigest()
        for f in os.listdir(out)
    }
    mtimes = {f: os.path.getmtime(os.path.join(out, f)) for f in digests}
    # second run: same bytes, existing complete shards skipped (mtime kept)
    write_tar_shards(
        ray.data.from_arrow(corpus), out, samples_per_shard=16
    ).materialize()
    for f, d in digests.items():
        p = os.path.join(out, f)
        assert hashlib.sha256(open(p, "rb").read()).hexdigest() == d
        assert os.path.getmtime(p) == mtimes[f], "complete shard rewritten"


def test_reshard_roundtrips_and_rebalances(ray_session, corpus, tmp_path):
    """reshard_tar_shards must preserve every sample byte-exactly while
    changing the shard-size layout."""
    from heroshi_ray.sources.tarshards import reshard_tar_shards

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ds = ray.data.from_arrow(corpus).repartition(4)
    m1 = write_tar_shards(ds, src, samples_per_shard=8).to_pandas()
    assert (m1["n_samples"] <= 8).all() and len(m1) >= 5

    m2 = reshard_tar_shards(src, dst, samples_per_shard=32).to_pandas()
    assert (m2["n_samples"] <= 32).all()
    assert int(m2["n_samples"].sum()) == int(m1["n_samples"].sum())

    back = _sorted_pylist(
        pa.Table.from_pandas(read_tar_shards(dst).to_pandas())
    )
    orig = _sorted_pylist(corpus)
    assert len(back) == len(orig)
    for a, b in zip(back, orig):
        assert a["image_id"] == b["image_id"]
        assert a["bytes"] == b["bytes"]
        assert a["caption"] == b["caption"]
        assert a["phash"] == b["phash"]
