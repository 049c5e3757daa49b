"""Verify pipeline — the per-row corpus invariant (SURVEY.md §3.3, M10).

BASELINE.json:15: for every crawled corpus row vs the reference corpus,
decoded pixels must be allclose — PSNR ≥ 40 dB when ``fmt`` is lossy,
byte-equality when lossless — and the caption byte-equal.

J3 join strategy: the reference side is broadcast (``ray.put`` of an
image_id -> (bytes, fmt, caption) dict) and probed inside an actor-pool
``map_batches`` — no shuffle. At reference-corpus sizes beyond a
broadcastable dict this becomes ``Dataset.join(on="image_id")`` (hash
join) with identical downstream math; the check itself is unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions.image import decode_image, psnr

VERIFY_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("found", pa.bool_()),
        ("bytes_equal", pa.bool_()),
        ("psnr_db", pa.float64()),
        ("caption_equal", pa.bool_()),
        ("passed", pa.bool_()),
    ]
)

PSNR_THRESHOLD_DB = 40.0


class CorpusVerifier:
    """Actor-pool stage: crawled CORPUS rows -> per-row verdicts."""

    def __init__(self, ref_ref):
        self.ref = ray.get(ref_ref)  # {image_id: (bytes, fmt, caption)}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        caps = batch.column("caption").to_pylist()
        n = len(ids)
        found = np.zeros(n, dtype=bool)
        beq = np.zeros(n, dtype=bool)
        pval = np.zeros(n, dtype=np.float64)
        ceq = np.zeros(n, dtype=bool)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            ref = self.ref.get(ids[i])
            if ref is None:
                continue
            rbytes, rfmt, rcap = ref
            found[i] = True
            beq[i] = blobs[i] == rbytes
            ceq[i] = caps[i] == rcap
            if beq[i]:
                pval[i] = float("inf")
            else:
                try:
                    ours = decode_image(blobs[i], fmts[i])
                    theirs = decode_image(rbytes, rfmt)
                    pval[i] = psnr(theirs, ours)
                except (ValueError, NotImplementedError):
                    pval[i] = 0.0
            pixel_ok = beq[i] if fmts[i] == "png" else pval[i] >= PSNR_THRESHOLD_DB
            ok[i] = found[i] and pixel_ok and ceq[i]
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "found": pa.array(found, pa.bool_()),
                "bytes_equal": pa.array(beq, pa.bool_()),
                "psnr_db": pa.array(pval, pa.float64()),
                "caption_equal": pa.array(ceq, pa.bool_()),
                "passed": pa.array(ok, pa.bool_()),
            },
            schema=VERIFY_SCHEMA,
        )


def reference_index(ref_tbl: pa.Table) -> dict:
    return {
        i: (b, f, c)
        for i, b, f, c in zip(
            ref_tbl.column("image_id").to_pylist(),
            ref_tbl.column("bytes").to_pylist(),
            ref_tbl.column("fmt").to_pylist(),
            ref_tbl.column("caption").to_pylist(),
        )
    }


def verify_corpus(
    ours: "ray.data.Dataset", ref_tbl: pa.Table, concurrency: int = 2
) -> "ray.data.Dataset":
    ref_ref = ray.put(reference_index(ref_tbl))
    return ours.map_batches(
        CorpusVerifier,
        fn_constructor_kwargs={"ref_ref": ref_ref},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, concurrency),
        num_cpus=0.5,
    )
