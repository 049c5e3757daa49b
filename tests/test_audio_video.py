"""Real audio (RIFF/WAVE PCM16 + log-mel) and video (YUV4MPEG2 offset-
seek frame sampling) paths — functions/audio.py, functions/y4m.py, and
the upgraded multimodal stages (r4)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from heroshi_ray.fixtures import _pixels, make_audio_corpus, make_video_corpus
from heroshi_ray.functions.audio import (
    audio_stats,
    hz_to_mel,
    logmel,
    mel_filterbank,
    wav_decode,
    wav_encode,
)
from heroshi_ray.functions.image import phash64, psnr
from heroshi_ray.functions.y4m import (
    y4m_decode,
    y4m_encode,
    y4m_parse_header,
    y4m_read_frame,
)


# ----------------------------------------------------------------- wav ---
def test_wav_roundtrip_mono_stereo():
    rng = np.random.default_rng(0)
    mono = (rng.uniform(-0.9, 0.9, 5000) * 32767).astype(np.int16)
    dec, sr = wav_decode(wav_encode(mono, 16000))
    assert sr == 16000 and np.array_equal(dec[:, 0], mono)
    stereo = (rng.uniform(-0.9, 0.9, (3000, 2)) * 32767).astype(np.int16)
    dec2, sr2 = wav_decode(wav_encode(stereo, 22050))
    assert sr2 == 22050 and np.array_equal(dec2, stereo)


def test_wav_tolerates_extra_chunks():
    body = wav_encode(np.zeros(100, np.int16), 8000)
    # splice a LIST chunk between fmt and data
    import struct

    i = body.find(b"data")
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = body[:i] + extra + body[i:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    dec, sr = wav_decode(patched)
    assert sr == 8000 and dec.shape == (100, 1)


def test_wav_rejects_compressed_and_garbage():
    body = bytearray(wav_encode(np.zeros(10, np.int16), 8000))
    i = body.find(b"fmt ")
    body[i + 8] = 85  # wFormatTag = MP3
    with pytest.raises(ValueError, match="compressed"):
        wav_decode(bytes(body))
    with pytest.raises(ValueError, match="RIFF"):
        wav_decode(b"not audio")


# -------------------------------------------------------------- logmel ---
def test_logmel_tone_lands_in_right_bin():
    sr, n_mels = 16000, 16
    for tone in (500.0, 1000.0, 3000.0):
        t = np.arange(sr) / sr
        x = (0.5 * np.sin(2 * np.pi * tone * t) * 32767).astype(np.int16)
        lm = logmel(x, sr, n_mels=n_mels)
        mpts = np.linspace(hz_to_mel(0), hz_to_mel(sr / 2), n_mels + 2)
        expected = int(np.argmin(np.abs(mpts[1:-1] - hz_to_mel(tone))))
        assert abs(int(lm.mean(axis=0).argmax()) - expected) <= 1, tone


def test_logmel_shape_and_determinism():
    rng = np.random.default_rng(3)
    x = (rng.uniform(-0.5, 0.5, 4000) * 32767).astype(np.int16)
    a = logmel(x, 16000, n_mels=8)
    b = logmel(x, 16000, n_mels=8)
    assert a.shape == (1 + (4000 - 400) // 160, 8)
    assert np.array_equal(a, b)


def test_filterbank_partition():
    fb = mel_filterbank(16, 512, 16000)
    assert fb.shape == (16, 257)
    assert (fb >= 0).all() and fb.max() <= 1.0
    assert (fb.sum(axis=1) > 0).all()  # no empty filter


def test_audio_stats():
    sr = 8000
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    st = audio_stats(x, sr)
    assert st["duration_ms"] == 1000
    # a 440 Hz sine crosses zero 880x/s
    assert abs(st["zcr_hz"] - 880) <= 4
    # rms of 0.25 full scale ~ -15 dB (0.5 amp * 1/sqrt(2))
    assert abs(st["rms_db"] - 20 * np.log10(0.5 / np.sqrt(2))) < 0.5


# ----------------------------------------------------------------- y4m ---
def test_y4m_roundtrip_smooth_psnr():
    rng = np.random.default_rng(5)
    frames = np.stack([_pixels(rng, 32, 48) for _ in range(4)])
    for chroma, floor in (("444", 45.0), ("420", 28.0)):
        dec, fps = y4m_decode(y4m_encode(frames, (30, 1), chroma))
        assert dec.shape == frames.shape and fps == (30, 1)
        assert min(psnr(frames[i], dec[i]) for i in range(4)) >= floor


def test_y4m_seek_equals_full_decode():
    rng = np.random.default_rng(6)
    frames = np.stack([_pixels(rng, 24, 24) for _ in range(9)])
    data = y4m_encode(frames, (25, 1), "444")
    meta = y4m_parse_header(data)
    assert meta["n_frames"] == 9
    full, _ = y4m_decode(data)
    for k in (0, 4, 8):
        assert np.array_equal(y4m_read_frame(data, meta, k), full[k])
    with pytest.raises(ValueError, match="out of range"):
        y4m_read_frame(data, meta, 9)


def test_y4m_rejects_unknown():
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        y4m_parse_header(b"\x00\x00\x00 ftypmp42")
    data = y4m_encode(np.zeros((1, 8, 8, 3), np.uint8))
    with pytest.raises(ValueError, match="chroma"):
        y4m_parse_header(data.replace(b"C444", b"C422"))


# -------------------------------------------------------------- stages ---
def test_audio_stage_matches_replica():
    from heroshi_ray.stages.multimodal import AudioFeatureStage

    corpus = make_audio_corpus(12, seed=77)
    out = AudioFeatureStage(strict=True)(corpus)
    assert out.num_rows == 12
    fb_cache = {}
    for i in range(12):
        blob = corpus.column("bytes")[i].as_py()
        samples, sr = wav_decode(blob)
        fb = fb_cache.setdefault(sr, mel_filterbank(16, 512, sr))
        lm = logmel(samples, sr, 16, fb=fb)
        want = np.concatenate([lm.mean(axis=0), lm.std(axis=0)]).astype(np.float32)
        got = np.asarray(out.column("features")[i].as_py(), np.float32)
        assert np.array_equal(got, want)
        assert out.column("n_frames")[i].as_py() == lm.shape[0]
        assert out.column("sample_rate")[i].as_py() == sr


def test_audio_stage_tone_physics():
    from heroshi_ray.stages.multimodal import AudioFeatureStage

    corpus = make_audio_corpus(24, seed=123)
    out = AudioFeatureStage(strict=True)(corpus)
    ok = 0
    for i in range(24):
        sr = corpus.column("sample_rate")[i].as_py()
        tone = corpus.column("tone_hz")[i].as_py()
        mean16 = np.asarray(out.column("features")[i].as_py()[:16])
        mpts = np.linspace(hz_to_mel(0), hz_to_mel(sr / 2), 18)
        expected = int(np.argmin(np.abs(mpts[1:-1] - hz_to_mel(tone))))
        ok += abs(int(mean16.argmax()) - expected) <= 1
    assert ok >= 20  # secondary sinusoids may dominate a few clips


def test_video_stage_sampling():
    from heroshi_ray.stages.multimodal import VideoFrameSampleStage

    corpus = make_video_corpus(8, seed=88)
    out = VideoFrameSampleStage(strict=True, n_frames=4)(corpus)
    df = out.to_pandas()
    assert (df.groupby("id").size() == 4).all()
    for vid, g in df.groupby("id"):
        row = corpus.to_pandas().set_index("video_id").loc[vid]
        data = row["bytes"]
        meta = y4m_parse_header(data)
        want = np.linspace(0, meta["n_frames"] - 1, 4).round().astype(int)
        assert sorted(g["frame"].tolist()) == sorted(want.tolist())
        # phash matches a direct decode of the same frame
        k = int(g["frame"].iloc[0])
        assert g["frame_phash"].iloc[0] == phash64(y4m_read_frame(data, meta, k))


def test_strict_stage_raises_on_compressed():
    from heroshi_ray.stages.multimodal import (
        AudioFeatureStage,
        VideoFrameSampleStage,
    )

    batch = pa.table({"id": pa.array(["x"]), "bytes": pa.array([b"\x00mp3ish"])})
    with pytest.raises(NotImplementedError):
        AudioFeatureStage(strict=True)(batch)
    with pytest.raises(NotImplementedError):
        VideoFrameSampleStage(strict=True)(batch)


# ------------------------------------------------------------- queries ---
def test_q_audio_features(ray_session):
    from heroshi_ray.pipelines.dataops import q_audio_features

    df = q_audio_features("unused").to_pandas()
    assert len(df) == 64
    assert (df["n_frames"] > 0).all() and (df["duration_ms"] >= 200).all()
    assert df["features"].map(len).eq(32).all()


def test_q_video_frames(ray_session):
    from heroshi_ray.pipelines.dataops import q_video_frames

    df = q_video_frames("unused").to_pandas()
    assert len(df) == 48 * 4
    assert df["frame_phash"].nunique() > 1


def test_wav_decode_malformed_raises_valueerror_only():
    """Regression (r4 review): short fmt chunk (struct.error) and
    wChannels=0 (ZeroDivisionError) must surface as ValueError so the
    stage fallback contract holds."""
    import struct as _struct

    short_fmt = b"RIFF" + _struct.pack("<I", 16) + b"WAVEfmt " + _struct.pack(
        "<I", 4
    ) + b"\x01\x00\x01\x00"
    with pytest.raises(ValueError):
        wav_decode(short_fmt)
    zero_ch = bytearray(wav_encode(np.zeros(4, np.int16), 8000))
    i = zero_ch.find(b"fmt ")
    zero_ch[i + 10 : i + 12] = b"\x00\x00"  # wChannels = 0
    with pytest.raises(ValueError):
        wav_decode(bytes(zero_ch))


def test_video_stage_fallback_covers_read_failures():
    """Regression (r4 review): a y4m stream with per-frame parameters
    passes header parse but fails the fixed-stride read; strict raises
    NotImplementedError, non-strict emits the fake frames."""
    import pyarrow as pa

    from heroshi_ray.stages.multimodal import VideoFrameSampleStage

    rng = np.random.default_rng(1)
    frames = np.stack([_pixels(rng, 16, 16) for _ in range(4)])
    data = y4m_encode(frames, (25, 1), "444")
    # give every frame a parameter: FRAME\n -> FRAME I\n shifts strides
    bad = data.replace(b"FRAME\n", b"FRAME I\n")
    batch = pa.table({"id": pa.array(["v"]), "bytes": pa.array([bad])})
    with pytest.raises(NotImplementedError):
        VideoFrameSampleStage(strict=True, n_frames=2)(batch)
    out = VideoFrameSampleStage(strict=False, n_frames=2)(batch)
    assert out.num_rows == 2
    assert out.column("frame_phash").to_pylist() == [0, 0]


def test_q_video_neardup(ray_session):
    """Sampled-frame phash near-dup pairs: every emitted pair's hamming
    must verify exactly against direct frame decode+phash, and at least
    one same-clip adjacent sampled pair must appear (the fixture's
    small-roll consecutive frames are planted near-dups)."""
    from heroshi_ray.functions.image import hamming64
    from heroshi_ray.pipelines.dataops import _ensure_media, q_video_neardup

    out = q_video_neardup("unused")
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert len(df) > 0
    import pyarrow.parquet as pq

    vids = pq.read_table(_ensure_media("video")).to_pandas().set_index("video_id")

    def frame_phash(tag):
        vid, k = tag.rsplit("#", 1)
        data = vids.loc[vid, "bytes"]
        meta = y4m_parse_header(data)
        return phash64(y4m_read_frame(data, meta, int(k)))

    sample = df.head(20)
    for _, row in sample.iterrows():
        ha = frame_phash(row["frame_a"])
        hb = frame_phash(row["frame_b"])
        assert int(hamming64([ha], [hb])[0]) == row["hamming"]
    same_clip = df[
        df["frame_a"].str.rsplit("#", n=1).str[0]
        == df["frame_b"].str.rsplit("#", n=1).str[0]
    ]
    assert len(same_clip) > 0
