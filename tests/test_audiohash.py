"""Perceptual audio near-dup semantics (operators/audiohash.py r12):
fingerprint parity vs an independent direct-DFT reference, exact
volume/phase invariance, group recall through the shared banding
machinery, cross-group exclusion, short-clip guard."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.audiohash import (
    AUDIO_FIXTURE,
    N_BANDS,
    N_SEGMENTS,
    audio_fingerprint,
    audio_neardup_pairs,
    synthetic_neardup_audio,
)

GS = AUDIO_FIXTURE["group_size"]


def _ids(spark, n):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def _ref_afp(samples) -> int:
    """Independent reference: direct DFT via explicit cos/sin sums (no
    np.fft), the textbook band-energy-difference fingerprint."""
    s = [float(x) for x in samples]
    seg_len = len(s) // N_SEGMENTS
    bits = []
    for q in range(N_SEGMENTS):
        seg = s[q * seg_len : (q + 1) * seg_len]
        n = len(seg)
        mags = []
        for f in range(1, n // 2 + 1):  # rFFT bins, DC dropped
            re = sum(seg[i] * math.cos(2 * math.pi * f * i / n) for i in range(n))
            im = sum(seg[i] * math.sin(2 * math.pi * f * i / n) for i in range(n))
            mags.append(math.hypot(re, im))
        nb = N_BANDS + 1
        edges = [(b * len(mags)) // nb for b in range(nb + 1)]
        E = [sum(mags[edges[b] : edges[b + 1]]) for b in range(nb)]
        bits.extend(int(E[b] > E[b + 1]) for b in range(N_BANDS))
    v = 0
    for b in bits:
        v = (v << 1) | b
    return v - (1 << 64) if v >= (1 << 63) else v


def test_fingerprint_matches_independent_reference(spark):
    media = synthetic_neardup_audio(_ids(spark, 4))
    got = {r["doc_id"]: r["afp"] for r in audio_fingerprint(media).collect()}
    # pull the actual PCM back out of the WAV payloads for the reference
    from architrave_project_apache_nifi_spark.operators.multimodal import (
        _wav_samples,
    )

    payloads = {
        r["doc_id"]: bytes(r["p"])
        for r in media.select("doc_id", F.col("media.payload").alias("p")).collect()
    }
    for i in range(4):
        _, _, s = _wav_samples(payloads[i])
        assert got[i] == _ref_afp(s), i


def test_volume_and_phase_variants_hash_identically(spark):
    # variants 0..2 differ by volume scale + phase shifts only — both
    # leave every band-energy comparison unchanged (measured worst
    # within-group Hamming 0 incl. the v=3 gain nudge)
    media = synthetic_neardup_audio(_ids(spark, 32))
    rows = {r["doc_id"]: r["afp"] for r in audio_fingerprint(media).collect()}
    for g in range(8):
        base = rows[g * GS]
        for v in (1, 2):
            assert rows[g * GS + v] == base, (g, v)


def test_neardups_full_recall_within_groups(spark):
    n = 40
    pairs = {
        (r["id_a"], r["id_b"])
        for r in audio_neardup_pairs(
            synthetic_neardup_audio(_ids(spark, n))
        ).collect()
    }
    for g in range(n // GS):
        for v1 in range(GS):
            for v2 in range(v1 + 1, GS):
                assert (g * GS + v1, g * GS + v2) in pairs


def test_neardups_exclude_distant_groups(spark):
    n = 40
    rows = audio_neardup_pairs(synthetic_neardup_audio(_ids(spark, n))).collect()
    for r in rows:
        assert r["id_a"] // GS == r["id_b"] // GS
        assert r["hamming"] <= 3


def test_composes_with_cluster_keep_best(spark):
    from architrave_project_apache_nifi_spark.operators.cluster import (
        canonical_docs_best,
    )

    n = 16
    media = synthetic_neardup_audio(_ids(spark, n))
    pairs = audio_neardup_pairs(media)
    docs = _ids(spark, n).withColumn(
        "quality", (F.col("doc_id") % GS).cast("double")
    )
    kept = {
        r["doc_id"]
        for r in canonical_docs_best(
            docs, pairs, "doc_id", "quality", a_col="id_a", b_col="id_b"
        ).collect()
        if r["is_kept"]
    }
    assert kept == {g * GS + (GS - 1) for g in range(n // GS)}


def test_short_clip_raises(spark):
    from architrave_project_apache_nifi_spark.operators.multimodal import (
        wav_bytes,
    )

    short = wav_bytes(np.zeros(16, dtype=np.int16))
    df = spark.createDataFrame(
        [(1, bytearray(short))], "doc_id long, payload binary"
    ).select(
        "doc_id",
        F.struct(
            F.col("payload"),
            F.struct(
                F.lit("audio/wav").alias("mime"),
                F.octet_length("payload").cast("long").alias("byte_len"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("long").alias("duration_ms"),
            ).alias("meta"),
        ).alias("media"),
    )
    with pytest.raises(Exception, match="too short"):
        audio_fingerprint(df).collect()


def test_non_wav_magic_raises(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"ID3\x04whatever"))], "doc_id long, payload binary"
    ).select(
        "doc_id",
        F.struct(
            F.col("payload"),
            F.struct(
                F.lit("audio/mpeg").alias("mime"),
                F.octet_length("payload").cast("long").alias("byte_len"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("long").alias("duration_ms"),
            ).alias("meta"),
        ).alias("media"),
    )
    with pytest.raises(Exception, match="unsupported payload magic"):
        audio_fingerprint(df).collect()
