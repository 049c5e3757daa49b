"""Multimodal column stages — image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``.

The sandbox ships no image/audio libraries (SURVEY.md §7.6), so:
- PNG/QPNG decode + resize are REAL (pure numpy/zlib codecs);
- baseline JPEG decode is REAL as of r4 (functions/jpeg.py — pure-numpy
  ITU-T T.81 sequential-DCT codec, 4:4:4/4:2:0/grayscale, DRI/RSTn);
- WebP decode, compressed-audio feature extraction and compressed-video
  frame sampling remain STUBS behind clearly-marked
  ``NotImplementedError`` raises with a deterministic-fake fallback
  flag — the Ray-side plumbing (schema, batch size, actor signature,
  output layout) is real and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.image import decode_image, phash64, png_encode


def block_mean_resize(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic block-mean downscale (any size -> out_h x out_w):
    two np.add.reduceat passes (rows then cols) + one divide — O(h*w)
    vectorized, no per-output-pixel Python. Empty segments (upscaling,
    ye[i]==ye[i+1]) follow reduceat's single-element rule, which equals
    the old max(lo+1, hi) slice semantics; uint8 sums are exact in
    float64, so results are bit-identical to the loop version."""
    h, w = px.shape[:2]
    ye = (np.arange(out_h + 1) * h) // out_h
    xe = (np.arange(out_w + 1) * w) // out_w
    rcnt = np.maximum(ye[1:] - ye[:-1], 1).astype(np.float64)
    ccnt = np.maximum(xe[1:] - xe[:-1], 1).astype(np.float64)
    rsum = np.add.reduceat(px.astype(np.float64), ye[:-1], axis=0)
    csum = np.add.reduceat(rsum, xe[:-1], axis=1)
    out = csum / (rcnt[:, None, None] * ccnt[None, :, None])
    return np.clip(out, 0, 255).astype(np.uint8)


class ImageDecodeStage:
    """bytes+fmt -> decoded metadata (+ optional re-encoded thumbnail).

    Real for "png"/"qpng"/"jpeg". Other formats: raise (strict=True) or emit a
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
    """Audio bytes -> clip-level log-mel features — REAL for RIFF/WAVE
    PCM16 (functions/audio.py, r4). The mel filterbank is built ONCE per
    actor here in ``__init__`` (the model-load slot of the actor-pool
    contract) and applied vectorized per clip in ``__call__``.

    Output per row: mean + std over frames of the (n_frames, n_mels)
    log-mel matrix (2*n_mels floats) plus n_frames / sample_rate /
    duration_ms. Compressed audio (mp3/ogg/...) still raises
    ``NotImplementedError`` when strict, or emits the deterministic
    byte-length fake when strict=False (the r1-r3 plumbing contract)."""

    def __init__(
        self,
        n_mels: int = 16,
        strict: bool = True,
        frame: int = 400,
        hop: int = 160,
        n_fft: int = 512,
        expect_sr: int = 16000,
    ):
        from ..functions.audio import mel_filterbank

        self.n_mels = n_mels
        self.strict = strict
        self.frame = frame
        self.hop = hop
        self.n_fft = n_fft
        self.expect_sr = expect_sr
        self.fb = mel_filterbank(n_mels, n_fft, expect_sr)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.audio import logmel, mel_filterbank, wav_decode

        blobs = batch.column("bytes").to_pylist()
        feats: list[list[float]] = []
        n_frames = np.zeros(len(blobs), np.int32)
        srs = np.zeros(len(blobs), np.int32)
        dur = np.zeros(len(blobs), np.int32)
        for i, b in enumerate(blobs):
            try:
                samples, sr = wav_decode(b)
            except ValueError:
                if self.strict:
                    raise NotImplementedError(
                        "compressed-audio decode requires a codec library not "
                        "present in this sandbox (RIFF/WAVE PCM16 is supported)"
                    )
                feats.append(
                    np.full(2 * self.n_mels, (len(b) % 997) / 997.0, np.float32).tolist()
                )
                continue
            fb = (
                self.fb
                if sr == self.expect_sr
                else mel_filterbank(self.n_mels, self.n_fft, sr)
            )
            lm = logmel(
                samples, sr, self.n_mels, self.frame, self.hop, self.n_fft, fb=fb
            )
            feats.append(
                np.concatenate([lm.mean(axis=0), lm.std(axis=0)])
                .astype(np.float32)
                .tolist()
            )
            n_frames[i] = lm.shape[0]
            srs[i] = sr
            dur[i] = round(samples.shape[0] * 1000.0 / sr)
        return pa.table(
            {
                "id": batch.column(batch.column_names[0]),
                "features": pa.array(feats, pa.list_(pa.float32())),
                "n_frames": pa.array(n_frames, pa.int32()),
                "sample_rate": pa.array(srs, pa.int32()),
                "duration_ms": pa.array(dur, pa.int32()),
            }
        )


class VideoFrameSampleStage:
    """Video bytes -> sampled frame phashes (+ optional PNG thumbs) —
    REAL for YUV4MPEG2 (functions/y4m.py, r4). Frames are read by
    OFFSET SEEK: the stage parses the fixed-size-frame header and
    slices only the sampled frames' bytes, so sampling 4 frames of a
    long clip never materializes the other frames' pixels. Compressed
    video (mp4/webm/...) raises ``NotImplementedError`` when strict, or
    emits the r1-r3 deterministic fake frames when strict=False."""

    def __init__(self, n_frames: int = 4, strict: bool = True, thumb: bool = False):
        self.n_frames = n_frames
        self.strict = strict
        self.thumb = thumb

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.y4m import y4m_parse_header, y4m_read_frame

        ids = batch.column(batch.column_names[0]).to_pylist()
        blobs = batch.column("bytes").to_pylist()
        out_id, out_frame, out_ph, out_png = [], [], [], []

        def fake(i):
            for f in range(self.n_frames):
                out_id.append(i)
                out_frame.append(f)
                out_ph.append(0)
                out_png.append(
                    png_encode(np.full((8, 8, 3), (f * 37) % 256, np.uint8))
                    if self.thumb
                    else None
                )

        for i, b in zip(ids, blobs):
            # the WHOLE per-clip decode is under the fallback contract:
            # a spec-legal stream our fixed-stride seek can't handle
            # (e.g. per-frame parameters) fails in y4m_read_frame, not
            # just in header parse — strict raises, non-strict fakes
            try:
                if b[:4] == b"GIF8":
                    # animated GIF: LZW frames have NO random access
                    # (each frame composites on the previous canvas),
                    # so decode sequentially up to the LAST sampled
                    # index — still bounded by the clip, and early
                    # frames never re-decode
                    from ..functions.gif import gif_decode

                    all_frames, _ = gif_decode(b)
                    total = all_frames.shape[0]
                    take = min(self.n_frames, total)
                    idxs = (
                        np.linspace(0, total - 1, take).round().astype(np.int64)
                        if take
                        else np.array([], np.int64)
                    )
                    rows = [(int(k), all_frames[int(k)]) for k in idxs.tolist()]
                else:
                    meta = y4m_parse_header(b)
                    total = meta["n_frames"]
                    take = min(self.n_frames, total)
                    # evenly spaced sample (first frame always included)
                    idxs = (
                        np.linspace(0, total - 1, take).round().astype(np.int64)
                        if take
                        else np.array([], np.int64)
                    )
                    rows = [
                        (k, y4m_read_frame(b, meta, k)) for k in idxs.tolist()
                    ]
            except ValueError as e:
                if self.strict:
                    raise NotImplementedError(
                        "video decode failed — compressed formats and "
                        "parameterized-frame y4m need a codec library not "
                        f"present in this sandbox (plain YUV4MPEG2 works): {e}"
                    )
                fake(i)
                continue
            for k, px in rows:
                out_id.append(i)
                out_frame.append(k)
                out_ph.append(phash64(px))
                out_png.append(png_encode(px) if self.thumb else None)
        cols = {
            "id": pa.array(out_id),
            "frame": pa.array(out_frame, pa.int32()),
            "frame_phash": pa.array(out_ph, pa.int64()),
        }
        if self.thumb:
            cols["frame_png"] = pa.array(out_png, pa.binary())
        return pa.table(cols)


# ------------------------------------------------- image-text alignment ---
ALIGN_DIM = 64


def text_embed64(captions, dim: int = ALIGN_DIM) -> np.ndarray:
    """Deterministic caption embedding: hashed char-3-gram bag with the
    sign trick (feature hashing — Weinberger et al., "Feature hashing
    for large scale multitask learning", ICML 2009), L2-normalized.
    Vectorized: ONE hash64 call over the batch's flattened gram list,
    then a segment scatter-add — no per-gram Python hashing."""
    from ..functions.hashing import hash64

    grams: list[str] = []
    bounds = [0]
    for c in captions:
        c = f" {c.lower()} "
        grams.extend(c[i : i + 3] for i in range(max(len(c) - 2, 1)))
        bounds.append(len(grams))
    out = np.zeros((len(captions), dim), np.float64)
    if grams:
        h = hash64(grams)
        d = (h % np.uint64(dim)).astype(np.int64)
        sign = np.where((h >> np.uint64(32)) & np.uint64(1), 1.0, -1.0)
        row = np.repeat(
            np.arange(len(captions)), np.diff(np.asarray(bounds, np.int64))
        )
        np.add.at(out, (row, d), sign)
    n = np.linalg.norm(out, axis=1, keepdims=True)
    return out / np.where(n == 0, 1.0, n)


def image_embed64(feats: np.ndarray, proj: np.ndarray) -> np.ndarray:
    """Project the 30-float histogram/moment features through the model
    matrix and L2-normalize."""
    v = feats @ proj
    n = np.linalg.norm(v, axis=1, keepdims=True)
    return v / np.where(n == 0, 1.0, n)


def make_align_proj(seed: int = 0x0A11C4, dim: int = ALIGN_DIM) -> np.ndarray:
    """The alignment 'model': a fixed seeded Gaussian projection from
    the 30-dim image features into the shared space. A trained CLIP
    image tower slots in behind the same (load-once, batch-matmul)
    interface."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((30, dim)).astype(np.float64)


class AlignmentScoreStage:
    """CLIP-score-shaped image-text alignment over the corpus schema:
    embed image (feature extract -> projection) and caption (hashed
    3-gram bag) into a shared space, score = cosine, emitted as e4
    fixed-point. The batched-model-inference stage shape: weights
    (projection matrix) load once per actor in ``__init__``; ``__call__``
    is two matmuls + a rowwise dot per batch. Real CLIP towers replace
    ``make_align_proj``/``text_embed64`` behind the same interface
    (Radford et al. 2021's score is the same cosine; LAION's curation
    gate keeps pairs above a threshold — Schuhmann et al. 2021 §2.2)."""

    def __init__(self, seed: int = 0x0A11C4):
        self.proj = make_align_proj(seed)
        self._feat = ImageFeatureStage()

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats_tbl = self._feat(batch)
        feats = np.asarray(feats_tbl.column("features").to_pylist(), np.float64)
        iv = image_embed64(feats, self.proj)
        tv = text_embed64(batch.column("caption").to_pylist())
        cos = np.sum(iv * tv, axis=1)
        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "align_e4": pa.array(
                    np.round(cos * 10_000).astype(np.int64), pa.int64()
                ),
            }
        )
