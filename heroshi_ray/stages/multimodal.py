"""Multimodal column stages — image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``.

The sandbox ships no image/audio libraries (SURVEY.md §7.6), so:
- PNG/QPNG decode + resize are REAL (pure numpy/zlib codecs);
- JPEG/WebP decode, audio feature extraction and video frame sampling
  are STUBS behind clearly-marked ``NotImplementedError`` raises with a
  deterministic-fake fallback flag — the Ray-side plumbing (schema,
  batch size, actor signature, output layout) is real and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.image import decode_image, phash64, png_encode


def block_mean_resize(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic block-mean downscale (any size -> out_h x out_w)."""
    h, w = px.shape[:2]
    ye = (np.arange(out_h + 1) * h) // out_h
    xe = (np.arange(out_w + 1) * w) // out_w
    out = np.empty((out_h, out_w, px.shape[2]), dtype=np.float64)
    for i in range(out_h):
        rows = px[ye[i] : max(ye[i] + 1, ye[i + 1])]
        for j in range(out_w):
            out[i, j] = rows[:, xe[j] : max(xe[j] + 1, xe[j + 1])].mean(axis=(0, 1))
    return np.clip(out, 0, 255).astype(np.uint8)


class ImageDecodeStage:
    """bytes+fmt -> decoded metadata (+ optional re-encoded thumbnail).

    Real for "png"/"qpng". Other formats: raise (strict=True) or emit a
    deterministic fake gray image sized from metadata (strict=False) so
    scale tests of the plumbing run without codecs.
    """

    def __init__(self, thumb: int | None = 8, strict: bool = False):
        self.thumb = thumb
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        ws = batch.column("w").to_pylist()
        hs = batch.column("h").to_pylist()
        out_w = np.empty(len(blobs), np.int32)
        out_h = np.empty(len(blobs), np.int32)
        ph = np.empty(len(blobs), np.int64)
        thumbs: list[bytes | None] = []
        for i, (b, f) in enumerate(zip(blobs, fmts)):
            try:
                px = decode_image(b, f)
            except (ValueError, NotImplementedError):
                if self.strict:
                    raise
                # deterministic fake: flat gray at the declared size
                px = np.full((hs[i], ws[i], 3), 128, np.uint8)
            out_h[i], out_w[i] = px.shape[0], px.shape[1]
            ph[i] = phash64(px)
            if self.thumb:
                thumbs.append(
                    png_encode(block_mean_resize(px, self.thumb, self.thumb))
                )
            else:
                thumbs.append(None)
        cols = {
            "image_id": batch.column("image_id"),
            "decoded_w": pa.array(out_w, pa.int32()),
            "decoded_h": pa.array(out_h, pa.int32()),
            "phash_recomputed": pa.array(ph, pa.int64()),
        }
        if self.thumb:
            cols["thumb_png"] = pa.array(thumbs, pa.binary())
        return pa.table(cols)


class ImageFeatureStage:
    """bytes+fmt -> compact image feature vector (REAL, pure numpy):
    per-channel 8-bin histograms (normalized) + per-channel mean/std,
    30 floats total. The embedding-extraction shape of the pipeline —
    a batched model would slot in behind the same actor-pool interface
    (weights loaded once in ``__init__``)."""

    N_BINS = 8

    def __init__(self, strict: bool = False):
        self.strict = strict
        self.edges = np.linspace(0, 256, self.N_BINS + 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        ws = batch.column("w").to_pylist()
        hs = batch.column("h").to_pylist()
        feats: list[list[float]] = []
        for i, (b, f) in enumerate(zip(blobs, fmts)):
            try:
                px = decode_image(b, f)
            except (ValueError, NotImplementedError):
                if self.strict:
                    raise
                px = np.full((hs[i], ws[i], 3), 128, np.uint8)
            v = []
            npx = px.shape[0] * px.shape[1]
            for c in range(3):
                hist, _ = np.histogram(px[:, :, c], bins=self.edges)
                v.extend((hist / npx).astype(np.float32).tolist())
                v.append(float(px[:, :, c].mean() / 255.0))
                v.append(float(px[:, :, c].std() / 255.0))
            feats.append(v)
        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "features": pa.array(feats, pa.list_(pa.float32())),
            }
        )


class AudioFeatureStage:
    """STUB: audio bytes -> frame-level features. No audio codec is
    available in this container; cite the interface so the actor-pool
    plumbing is testable. strict=True raises; strict=False emits a
    deterministic fake feature vector derived from the byte length."""

    def __init__(self, n_mels: int = 16, strict: bool = True):
        self.n_mels = n_mels
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "audio decode requires an audio library not present in this "
                "sandbox; run with strict=False for deterministic fakes"
            )
        blobs = batch.column("bytes").to_pylist()
        feats = [
            np.full(self.n_mels, (len(b) % 997) / 997.0, np.float32).tolist()
            for b in blobs
        ]
        return pa.table(
            {
                "id": batch.column(batch.column_names[0]),
                "features": pa.array(feats, pa.list_(pa.float32())),
            }
        )


class VideoFrameSampleStage:
    """STUB: video bytes -> sampled frame images. Same contract as
    AudioFeatureStage: strict raises NotImplementedError; non-strict
    emits ``n_frames`` deterministic fake frames per row."""

    def __init__(self, n_frames: int = 4, strict: bool = True):
        self.n_frames = n_frames
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "video decode requires a codec library not present in this sandbox"
            )
        ids = batch.column(batch.column_names[0]).to_pylist()
        out_id, out_frame, out_png = [], [], []
        for i in ids:
            for f in range(self.n_frames):
                out_id.append(i)
                out_frame.append(f)
                out_png.append(png_encode(np.full((8, 8, 3), (f * 37) % 256, np.uint8)))
        return pa.table(
            {
                "id": pa.array(out_id),
                "frame": pa.array(out_frame, pa.int32()),
                "frame_png": pa.array(out_png, pa.binary()),
            }
        )
