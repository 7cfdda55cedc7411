"""Audio modality tier: WAV/PCM16 codec round-trips, integer frame
features, and the energy-envelope fingerprint near-dup — crafted
near-identical clips through the REAL encode/decode path."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from musicflow_spark.operators.wavcodec import (
    AUDIO_CLIP_ABS,
    AUDIO_FRAME_LEN,
    audio_features,
    decode_wav,
    encode_wav,
    energy_fingerprint_bands,
    frame_energies,
    mono_samples,
)


# ------------------------------------------------------- codec
def test_wav_roundtrip_mono():
    rng = np.random.default_rng(3)
    s = rng.integers(-30000, 30000, size=1000, dtype=np.int16)
    got, rate = decode_wav(encode_wav(s, 8000))
    assert rate == 8000
    assert got.shape == (1000, 1)
    assert (got[:, 0] == s).all()


def test_wav_roundtrip_stereo():
    rng = np.random.default_rng(4)
    s = rng.integers(-30000, 30000, size=(500, 2), dtype=np.int16)
    got, rate = decode_wav(encode_wav(s, 44100))
    assert rate == 44100
    assert got.shape == (500, 2)
    assert (got == s).all()
    # mono averaging is integer floor division of the channel sum
    mono, _ = mono_samples(encode_wav(s, 44100))
    assert (mono == s.astype(np.int64).sum(axis=1) // 2).all()


def test_wav_decode_rejects_junk():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not a wav at all")
    # valid header claiming float format must be refused, not misread
    import struct

    bad = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32)
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError, match="unsupported WAV shape"):
        decode_wav(bad)


def test_wav_skips_unknown_chunks():
    # LIST/INFO chunks between fmt and data must be walked over
    import struct

    s = np.arange(-50, 50, dtype=np.int16)
    payload = encode_wav(s, 8000)
    head, data_part = payload[:36], payload[36:]
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = (
        payload[:12]
        + payload[12:36]  # fmt chunk
        + extra
        + data_part
    )
    # fix the RIFF size field
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    got, rate = decode_wav(spliced)
    assert (got[:, 0] == s).all()


# ------------------------------------------------------- features
def test_audio_features_match_numpy_reference():
    rng = np.random.default_rng(7)
    s = rng.integers(-2500, 2500, size=320, dtype=np.int64)
    f = audio_features(s)
    assert f["n_samples"] == 320
    assert f["peak_abs"] == int(np.abs(s).max())
    assert f["n_clipped"] == int((np.abs(s) >= AUDIO_CLIP_ABS).sum())
    assert f["n_zero_cross"] == int((s[:-1] * s[1:] < 0).sum())
    assert f["energy_sum"] == int((s.astype(np.int64) ** 2).sum())
    e = (s.reshape(-1, AUDIO_FRAME_LEN) ** 2).sum(axis=1)
    assert f["frame_e_min"] == int(e.min())
    assert f["frame_e_max"] == int(e.max())


def test_frame_energies_drops_partial_tail():
    s = np.ones(AUDIO_FRAME_LEN + 5, dtype=np.int64)
    e = frame_energies(s)
    assert list(e) == [AUDIO_FRAME_LEN]


# ------------------------------------------------------- fingerprint
def _clip(rng, n=2304):
    return rng.integers(-2000, 2000, size=n, dtype=np.int64)


def test_fingerprint_gain_invariant_sensitive_to_edits():
    rng = np.random.default_rng(11)
    base = _clip(rng)
    # uniform gain scales every frame energy by g^2: comparisons hold
    assert energy_fingerprint_bands(base) == energy_fingerprint_bands(base * 3)
    # short local edit: one frame's energy moves -> at most 2 bits
    edited = base.copy()
    edited[100:104] = 0
    diff = sum(
        bin(a ^ b).count("1")
        for a, b in zip(
            energy_fingerprint_bands(base), energy_fingerprint_bands(edited)
        )
    )
    assert diff <= 2
    # unrelated clip: far away
    far = sum(
        bin(a ^ b).count("1")
        for a, b in zip(
            energy_fingerprint_bands(base), energy_fingerprint_bands(_clip(rng))
        )
    )
    assert far > 7


def test_audio_neardup_finds_crafted_copies_only(spark):
    from musicflow_spark.operators.multimodal import (
        audio_energy_bands,
        phash_neardup_pairs,
    )

    rng = np.random.default_rng(13)
    base = _clip(rng)
    regained = np.clip(base * 2, -32768, 32767)  # louder copy: hamming 0
    edited = base.copy()
    edited[500:510] = 0  # dropout: a couple of bits
    unrelated = _clip(rng)
    rows = [
        (0, encode_wav(base.astype(np.int16))),
        (1, encode_wav(regained.astype(np.int16))),
        (2, encode_wav(edited.astype(np.int16))),
        (3, encode_wav(unrelated.astype(np.int16))),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_neardup_pairs(
            audio_energy_bands(media), max_hamming=7
        ).collect()
    }
    assert pairs.get((0, 1)) == 0           # gain change is invisible
    assert (0, 2) in pairs                  # local dropout survives
    assert all(3 not in p for p in pairs)   # unrelated never pairs


def test_audio_fixture_groups_are_neardups(spark):
    # consecutive ids in an AUDIO_GROUP must pair within the hamming
    # budget through the REAL wav encode/decode path
    from musicflow_spark.operators.multimodal import (
        audio_energy_bands,
        phash_neardup_pairs,
        wav_media_from_documents,
    )

    docs = spark.range(8).select(F.col("id").alias("doc_id"))
    got = {
        (r["id_a"], r["id_b"])
        for r in phash_neardup_pairs(
            audio_energy_bands(wav_media_from_documents(docs))
        ).collect()
    }
    for g in (0, 1):
        ids = [g * 4 + i for i in range(4)]
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                assert (a, b) in got


def test_audio_neardup_plan_is_banded_not_allpairs(spark):
    from musicflow_spark.operators.multimodal import (
        audio_energy_bands,
        phash_neardup_pairs,
        wav_media_from_documents,
    )

    docs = spark.range(64).select(F.col("id").alias("doc_id"))
    plan = (
        phash_neardup_pairs(audio_energy_bands(wav_media_from_documents(docs)))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
