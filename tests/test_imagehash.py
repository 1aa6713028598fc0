"""Perceptual image near-dup semantics (operators/imagehash.py r12):
dHash arithmetic vs an independent numpy reference, banding recall
guarantees on the perturbed-duplicates fixture, verify precision, and
composition with the cluster keep-best rule."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.imagehash import (
    FIXTURE,
    GRID,
    _fixture_channel,
    dhash_candidates,
    dhash_neardups,
    image_dhash,
    image_neardup_pairs,
    synthetic_neardup_media,
)


def _ids(spark, n):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def _ref_dhash(doc_id: int) -> int:
    """Independent reference: build the fixture pixel field directly
    (no BMP round-trip), float-free dHash written a different way."""
    w, h = FIXTURE["w"], FIXTURE["h"]
    gray = np.empty((h, w), dtype=np.int64)
    for r in range(h):
        for c in range(w):
            rr, gg, bb = (
                _fixture_channel(doc_id, r, c, 0),
                _fixture_channel(doc_id, r, c, 1),
                _fixture_channel(doc_id, r, c, 2),
            )
            gray[r, c] = (299 * rr + 587 * gg + 114 * bb) // 1000
    bits = []
    for br in range(GRID):
        for bc in range(GRID):
            m = []
            for b in (bc, bc + 1):
                blk = gray[2 * br : 2 * br + 2, 2 * b : 2 * b + 2]
                m.append(int(blk.sum()) // 4)
            bits.append(1 if m[0] > m[1] else 0)
    v = 0
    for b in bits:
        v = (v << 1) | b
    return v - (1 << 64) if v >= (1 << 63) else v


def test_dhash_matches_independent_reference(spark):
    media = synthetic_neardup_media(_ids(spark, 24))
    got = {r["doc_id"]: r["dhash"] for r in image_dhash(media).collect()}
    assert len(got) == 24
    for i in range(24):
        assert got[i] == _ref_dhash(i), i


def test_group_members_within_one_bit(spark):
    # the fixture confines every variant's perturbation to luminance
    # block (0,0), so group members differ in at most ONE comparison
    media = synthetic_neardup_media(_ids(spark, 32))
    hashes = image_dhash(media)
    rows = {r["doc_id"]: r["dhash"] for r in hashes.collect()}
    gs = FIXTURE["group_size"]
    for g in range(32 // gs):
        members = [rows[g * gs + v] for v in range(gs)]
        for a in members:
            for b in members:
                assert bin((a ^ b) & ((1 << 64) - 1)).count("1") <= 1


def test_neardups_full_recall_within_groups(spark):
    # pigeonhole: hamming <= 1 < n_bands=4 -> every within-group pair
    # MUST be a candidate, and the verify keeps it
    n, gs = 40, FIXTURE["group_size"]
    media = synthetic_neardup_media(_ids(spark, n))
    pairs = {
        (r["id_a"], r["id_b"])
        for r in image_neardup_pairs(media, max_distance=3).collect()
    }
    for g in range(n // gs):
        for v1 in range(gs):
            for v2 in range(v1 + 1, gs):
                assert (g * gs + v1, g * gs + v2) in pairs


def test_neardups_exclude_distant_groups(spark):
    # small-n fixture: gradient slopes (19+2(g%89), 23+2(g%97)) are
    # unique per group, so cross-group hashes sit far apart in
    # Hamming space
    n = 40
    media = synthetic_neardup_media(_ids(spark, n))
    rows = image_neardup_pairs(media, max_distance=3).collect()
    gs = FIXTURE["group_size"]
    for r in rows:
        assert r["id_a"] // gs == r["id_b"] // gs
        assert r["hamming"] <= 3


def test_verify_bounds_candidates(spark):
    # candidates >= verified pairs; every verified pair is a candidate
    media = synthetic_neardup_media(_ids(spark, 24))
    hashes = image_dhash(media).persist()
    cand = {
        (r["id_a"], r["id_b"]) for r in dhash_candidates(hashes).collect()
    }
    near = {
        (r["id_a"], r["id_b"]) for r in dhash_neardups(hashes).collect()
    }
    assert near <= cand
    hashes.unpersist()


def test_pigeonhole_contract_enforced(spark):
    media = synthetic_neardup_media(_ids(spark, 8))
    hashes = image_dhash(media)
    with pytest.raises(ValueError, match="pigeonhole"):
        dhash_neardups(hashes, max_distance=4, n_bands=4)


def test_composes_with_cluster_keep_best(spark):
    from architrave_project_apache_nifi_spark.operators.cluster import (
        canonical_docs_best,
    )

    n, gs = 20, FIXTURE["group_size"]
    media = synthetic_neardup_media(_ids(spark, n))
    pairs = image_neardup_pairs(media)
    docs = _ids(spark, n).withColumn(
        "quality", (F.col("doc_id") % gs).cast("double")
    )
    out = canonical_docs_best(
        docs, pairs, "doc_id", "quality", a_col="id_a", b_col="id_b"
    ).collect()
    kept = {r["doc_id"] for r in out if r["is_kept"]}
    # one representative per group — the best-scoring variant (v=3)
    assert kept == {g * gs + (gs - 1) for g in range(n // gs)}


def test_unsupported_magic_raises(spark):
    import pandas as pd  # noqa: F401

    df = spark.createDataFrame(
        [(1, bytearray(b"GIF89a\x00\x00"))], "doc_id long, payload binary"
    ).select(
        "doc_id",
        F.struct(
            F.col("payload"),
            F.struct(
                F.lit("image/gif").alias("mime"),
                F.octet_length("payload").cast("long").alias("byte_len"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("long").alias("duration_ms"),
            ).alias("meta"),
        ).alias("media"),
    )
    with pytest.raises(Exception, match="unsupported payload magic"):
        image_dhash(df).collect()


def test_dhash_invariant_under_exact_upscale(spark):
    # the property that makes dHash PERCEPTUAL: a 2x nearest-neighbor
    # upscale scales every block sum by 4 exactly, so the means — and
    # the hash — are unchanged; byte-identity hashing would miss this
    import pandas as pd

    from architrave_project_apache_nifi_spark.operators.multimodal import (
        bmp_bytes,
    )

    w, h = FIXTURE["w"], FIXTURE["h"]
    rows = []
    for i in range(6):
        px = np.empty((h, w, 3), dtype=np.uint8)
        for r in range(h):
            for c in range(w):
                for off in range(3):
                    px[r, c, off] = _fixture_channel(i, r, c, off)
        big = np.repeat(np.repeat(px, 2, axis=0), 2, axis=1)
        rows.append((i, bytearray(bmp_bytes(px))))
        rows.append((i + 100, bytearray(bmp_bytes(big))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary").select(
        "doc_id",
        F.struct(
            F.col("payload"),
            F.struct(
                F.lit("image/bmp").alias("mime"),
                F.octet_length("payload").cast("long").alias("byte_len"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("long").alias("duration_ms"),
            ).alias("meta"),
        ).alias("media"),
    )
    got = {r["doc_id"]: r["dhash"] for r in image_dhash(df).collect()}
    for i in range(6):
        assert got[i] == got[i + 100], i


# --- pHash (DCT) ------------------------------------------------------

from architrave_project_apache_nifi_spark.operators.imagehash import (  # noqa: E402
    PHASH_KEEP,
    PHASH_SIZE,
    image_phash,
)


def _ref_phash(doc_id: int) -> int:
    """Independent reference: explicit cos-sum DCT (no matrix form)."""
    import math

    w, h = FIXTURE["w"], FIXTURE["h"]
    luma = [
        [
            (
                299 * _fixture_channel(doc_id, r, c, 0)
                + 587 * _fixture_channel(doc_id, r, c, 1)
                + 114 * _fixture_channel(doc_id, r, c, 2)
            )
            / 1000.0
            for c in range(w)
        ]
        for r in range(h)
    ]
    n = PHASH_SIZE
    G = [[luma[(r * h) // n][(c * w) // n] for c in range(n)] for r in range(n)]
    C = []
    for u in range(PHASH_KEEP):
        row = []
        au = math.sqrt((1 if u == 0 else 2) / n)
        for v in range(PHASH_KEEP):
            av = math.sqrt((1 if v == 0 else 2) / n)
            s = 0.0
            for r in range(n):
                for c in range(n):
                    s += (
                        G[r][c]
                        * math.cos(math.pi * (2 * r + 1) * u / (2 * n))
                        * math.cos(math.pi * (2 * c + 1) * v / (2 * n))
                    )
            row.append(au * av * s)
        C.append(row)
    block = [C[u][v] for u in range(PHASH_KEEP) for v in range(PHASH_KEEP)][1:]
    med = float(np.median(block))
    v = 0
    for x in block:
        v = (v << 1) | int(x > med)
    return v - (1 << 64) if v >= (1 << 63) else v


def test_phash_matches_independent_reference(spark):
    media = synthetic_neardup_media(_ids(spark, 8))
    got = {r["doc_id"]: r["phash"] for r in image_phash(media).collect()}
    for i in range(8):
        assert got[i] == _ref_phash(i), i


def test_phash_invariant_under_brightness_scaling(spark):
    # double every channel (values kept < 128): luma doubles exactly,
    # the DCT scales linearly, the median scales with it — every
    # comparison-vs-median is unchanged. dHash-style absolute means
    # survive too, but pHash keeps this under CONTRAST changes where
    # block-mean comparisons near ties would flip.
    import pandas as pd  # noqa: F401

    from architrave_project_apache_nifi_spark.operators.multimodal import (
        bmp_bytes,
    )

    rng = np.random.RandomState(7)
    rows = []
    for i in range(5):
        px = rng.randint(0, 120, size=(16, 18, 3)).astype(np.uint8)
        rows.append((i, bytearray(bmp_bytes(px))))
        rows.append((i + 100, bytearray(bmp_bytes((px * 2).astype(np.uint8)))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary").select(
        "doc_id",
        F.struct(
            F.col("payload"),
            F.struct(
                F.lit("image/bmp").alias("mime"),
                F.octet_length("payload").cast("long").alias("byte_len"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("long").alias("duration_ms"),
            ).alias("meta"),
        ).alias("media"),
    )
    got = {r["doc_id"]: r["phash"] for r in image_phash(df).collect()}
    for i in range(5):
        assert got[i] == got[i + 100], i


def test_phash_composes_with_banding_machinery(spark):
    # the candidate/verify machinery is hash-agnostic: group members
    # (small perturbations) stay within a few low-frequency bits
    media = synthetic_neardup_media(_ids(spark, 16))
    hashes = image_phash(media)
    rows = {r["doc_id"]: r["phash"] for r in hashes.collect()}
    gs = FIXTURE["group_size"]
    for g in range(16 // gs):
        members = [rows[g * gs + v] for v in range(gs)]
        for a in members:
            for b in members:
                assert bin((a ^ b) & ((1 << 64) - 1)).count("1") <= 8
    near = dhash_neardups(
        hashes, hash_col="phash", max_distance=3, n_bands=4
    ).collect()
    for r in near:  # verified pairs carry exact Hamming, sign-safe
        assert r["hamming"] <= 3
