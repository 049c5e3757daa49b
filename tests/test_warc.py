"""WARC 1.1 sink/source (ISO 28500): roundtrip equality, deterministic
bytes, resumable overwrite, manifest accounting, spec-shape checks."""

from __future__ import annotations

import gzip
import hashlib
import os

import pyarrow as pa
import pytest

import ray

from heroshi_ray.sources.warc import read_warc, write_warc


def _fetch_table(n: int = 37) -> pa.Table:
    urls, st, hd, ct, bo, ts = [], [], [], [], [], []
    for i in range(n):
        urls.append(f"http://h{i % 5}.example/p/{i}")
        st.append(200 if i % 7 else 404)
        c = "image/qpng" if i % 3 else "text/html"
        # Content-Type carried in the headers (the writer only injects
        # one when the fetch recorded none)
        hd.append([("Server", "unit"), ("X-Seq", str(i)), ("Content-Type", c)])
        ct.append(c)
        bo.append(bytes([i % 251]) * (10 + i * 3))
        ts.append(1_700_000_000_000_000 + i * 1_000_000)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "status_code": pa.array(st, pa.int32()),
            "headers": pa.array(hd, pa.map_(pa.string(), pa.string())),
            "content_type": pa.array(ct, pa.string()),
            "content": pa.array(bo, pa.binary()),
            "fetched_at": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        }
    )


def _rows(t: pa.Table):
    out = []
    for r in t.to_pylist():
        out.append(
            (
                r["url"],
                r["status_code"],
                tuple(tuple(p) for p in (r["headers"] or [])),
                r["content_type"],
                r["content"],
                r["fetched_at"],
            )
        )
    return sorted(out)


def test_warc_roundtrip_and_manifest(ray_session, tmp_path):
    out = str(tmp_path / "warc")
    src = _fetch_table()
    man = write_warc(
        ray.data.from_arrow(src).repartition(3), out, records_per_file=16
    ).to_pandas()
    assert man["n_records"].sum() == src.num_rows
    files = sorted(f for f in os.listdir(out) if f.endswith(".warc.gz"))
    assert set(os.path.basename(p) for p in man["path"]) == set(files)
    for row in man.itertuples():
        assert os.path.getsize(row.path) == row.n_bytes

    back = pa.Table.from_pandas(read_warc(out).to_pandas())
    assert _rows(back) == _rows(src)


def test_warc_deterministic_and_resumable(ray_session, tmp_path):
    out = str(tmp_path / "w1")
    src = _fetch_table(20)
    write_warc(ray.data.from_arrow(src), out, records_per_file=20).to_pandas()
    files = sorted(os.listdir(out))
    digests = {
        f: hashlib.md5(open(os.path.join(out, f), "rb").read()).hexdigest()
        for f in files
    }
    mtimes = {f: os.path.getmtime(os.path.join(out, f)) for f in files}
    # identical re-run: same bytes, nothing rewritten
    write_warc(ray.data.from_arrow(src), out, records_per_file=20).to_pandas()
    assert {
        f: hashlib.md5(open(os.path.join(out, f), "rb").read()).hexdigest()
        for f in sorted(os.listdir(out))
    } == digests
    assert {f: os.path.getmtime(os.path.join(out, f)) for f in files} == mtimes


def test_warc_spec_shape(ray_session, tmp_path):
    """Each record is its own gzip member; headers follow the WARC/1.1
    grammar; the block is a parseable HTTP response."""
    out = str(tmp_path / "w2")
    src = _fetch_table(5)
    write_warc(ray.data.from_arrow(src), out, records_per_file=5).to_pandas()
    f = [p for p in os.listdir(out) if p.endswith(".warc.gz")][0]
    data = open(os.path.join(out, f), "rb").read()
    # gzip multi-member: the magic appears once per record
    assert data.count(b"\x1f\x8b\x08") == 5
    first = gzip.decompress(data)  # gzip.decompress walks all members
    assert first.startswith(b"WARC/1.1\r\n")
    head = first.split(b"\r\n\r\n", 1)[0].decode()
    assert "WARC-Type: response" in head
    assert "WARC-Target-URI: " in head
    assert "WARC-Record-ID: <urn:uuid:" in head
    assert "Content-Type: application/http;msgtype=response" in head
    block = first.split(b"\r\n\r\n", 1)[1]
    assert block.startswith(b"HTTP/1.1 ")
