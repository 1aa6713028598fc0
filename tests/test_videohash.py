"""Video modality semantics (operators/videohash.py r12): AVI codec
round-trip, real frame sampling, pooled-dHash invariants, near-dup
recall/exclusion through the shared banding machinery, composition
with the image operators, and hostile-payload guards."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.imagehash import (
    _luma_block_means,
    image_dhash,
)
from architrave_project_apache_nifi_spark.operators.videohash import (
    VIDEO_FIXTURE,
    _avi_info,
    _dib_pixels,
    _pooled_dhash_bits,
    _sample_plan,
    _video_channel,
    avi_bytes,
    synthetic_neardup_video,
    video_frames,
    video_neardup_pairs,
    video_pooled_dhash,
)

GS = VIDEO_FIXTURE["group_size"]
W, H = VIDEO_FIXTURE["w"], VIDEO_FIXTURE["h"]
NF = VIDEO_FIXTURE["n_frames"]


def _ids(spark, n):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def _media_struct(spark, payload: bytes, mime: str = "video/avi"):
    return spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    ).select(
        "doc_id",
        F.struct(
            F.col("payload"),
            F.struct(
                F.lit(mime).alias("mime"),
                F.octet_length("payload").cast("long").alias("byte_len"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("long").alias("duration_ms"),
            ).alias("meta"),
        ).alias("media"),
    )


# --- codec ------------------------------------------------------------


def test_avi_roundtrip_exact():
    rng = np.random.RandomState(3)
    frames = [
        rng.randint(0, 256, size=(11, 13, 3), dtype=np.uint8)  # odd w: pad path
        for _ in range(4)
    ]
    buf = avi_bytes(frames, fps=25)
    w, h, upf, locs = _avi_info(buf)
    assert (w, h, upf, len(locs)) == (13, 11, 1_000_000 // 25, 4)
    for fi, f in enumerate(frames):
        got = _dib_pixels(buf, locs[fi][0], w, h)
        assert np.array_equal(got, f.astype(np.int64).reshape(-1)), fi


def test_avi_info_rejects_garbage_and_truncation():
    with pytest.raises(ValueError, match="unsupported payload magic"):
        _avi_info(b"\x00" * 64)
    frames = [np.zeros((9, 9, 3), dtype=np.uint8)]
    buf = avi_bytes(frames)
    with pytest.raises(ValueError, match="overruns|no "):
        _avi_info(buf[: len(buf) // 2])


def test_avi_info_rejects_compressed_stream():
    buf = bytearray(avi_bytes([np.zeros((9, 9, 3), dtype=np.uint8)]))
    # flip the strf biCompression field (BI_RGB=0 -> 1) in place
    at = buf.find(b"strf")
    assert at > 0
    comp_off = at + 8 + 16
    buf[comp_off] = 1
    with pytest.raises(ValueError, match="compression=1"):
        _avi_info(bytes(buf))


def test_sample_plan_caps_and_maps():
    # 10 frames at 10 fps (100 ms each), sampled every 200 ms, max 5
    assert _sample_plan(100_000, 10, 200, 5) == [
        (0, 0, 0),
        (1, 200, 2),
        (2, 400, 4),
        (3, 600, 6),
        (4, 800, 8),
    ]
    # clip shorter than the grid: stops at the clip end
    assert _sample_plan(100_000, 3, 200, 5) == [(0, 0, 0), (1, 200, 2)]
    # sub-frame grid repeats the source frame (grid semantics)
    assert _sample_plan(100_000, 2, 40, 4) == [
        (0, 0, 0),
        (1, 40, 0),
        (2, 80, 0),
        (3, 120, 1),
    ]


# --- frame sampling ---------------------------------------------------


def test_video_frames_matches_direct_decode(spark):
    media = synthetic_neardup_video(_ids(spark, 3))
    rows = video_frames(media, every_ms=200, max_frames=5).collect()
    payloads = {
        r["doc_id"]: bytes(r["p"])
        for r in media.select(
            "doc_id", F.col("media.payload").alias("p")
        ).collect()
    }
    assert len(rows) == 3 * 5
    for r in rows:
        buf = payloads[r["doc_id"]]
        w, h, upf, locs = _avi_info(buf)
        assert (r["width"], r["height"]) == (w, h) == (W, H)
        assert r["frame_idx"] == (r["frame_ms"] * 1000) // upf
        px = _dib_pixels(buf, locs[r["frame_idx"]][0], w, h).reshape(h, w, 3)
        luma = (
            299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
        ) // 1000
        assert r["luma_sum"] == int(luma.sum())


def test_video_frames_payload_composes_with_image_dhash(spark):
    media = synthetic_neardup_video(_ids(spark, 2))
    frames = video_frames(media, every_ms=200, max_frames=2, with_payload=True)
    as_media = frames.select(
        (F.col("doc_id") * 10 + F.col("sample_idx")).alias("doc_id"),
        F.struct(
            F.col("frame_bmp").alias("payload"),
            F.struct(
                F.lit("image/bmp").alias("mime"),
                F.octet_length("frame_bmp").cast("long").alias("byte_len"),
                F.col("width"),
                F.col("height"),
                F.lit(None).cast("long").alias("duration_ms"),
            ).alias("meta"),
        ).alias("media"),
    )
    hashed = image_dhash(as_media).collect()
    assert len(hashed) == 4
    assert all(r["width"] == W and r["height"] == H for r in hashed)


# --- pooled hash + near-dup -------------------------------------------


def test_pooled_bits_match_manual_pooling():
    rng = np.random.RandomState(11)
    frames = [
        rng.randint(0, 256, size=(H, W, 3)).astype(np.int64).reshape(-1)
        for _ in range(5)
    ]
    bits = _pooled_dhash_bits(frames, W, H)
    total = sum(_luma_block_means(px, W, H) for px in frames)
    want = (total[:, :-1] > total[:, 1:]).reshape(-1)
    assert np.array_equal(bits, want)


def test_fixture_variants_within_one_bit(spark):
    media = synthetic_neardup_video(_ids(spark, 24))
    rows = {
        r["doc_id"]: r["vhash"]
        for r in video_pooled_dhash(media).collect()
    }
    for g in range(6):
        base = rows[g * GS]
        for v in (1, 2, 3):
            d = bin((base ^ rows[g * GS + v]) & ((1 << 64) - 1)).count("1")
            assert d <= 1, (g, v, d)


def test_neardups_full_recall_within_groups(spark):
    n = 32
    pairs = {
        (r["id_a"], r["id_b"])
        for r in video_neardup_pairs(
            synthetic_neardup_video(_ids(spark, n))
        ).collect()
    }
    for g in range(n // GS):
        for v1 in range(GS):
            for v2 in range(v1 + 1, GS):
                assert (g * GS + v1, g * GS + v2) in pairs


def test_neardups_exclude_distant_groups(spark):
    rows = video_neardup_pairs(synthetic_neardup_video(_ids(spark, 32))).collect()
    for r in rows:
        assert r["id_a"] // GS == r["id_b"] // GS
        assert r["hamming"] <= 3


def test_pooled_dhash_counts_frames(spark):
    media = synthetic_neardup_video(_ids(spark, 2))
    rows = video_pooled_dhash(media, every_ms=200, max_frames=5).collect()
    for r in rows:
        assert r["n_frames"] == NF
        assert r["n_sampled"] == 5


def test_scalar_channel_is_the_generator(spark):
    """The scalar _video_channel (the oracle's reference form) equals
    what the vectorized fixture generator actually encoded."""
    media = synthetic_neardup_video(_ids(spark, 2))
    payloads = {
        r["doc_id"]: bytes(r["p"])
        for r in media.select(
            "doc_id", F.col("media.payload").alias("p")
        ).collect()
    }
    for d in (0, 1):
        w, h, upf, locs = _avi_info(payloads[d])
        for f in (0, 7):
            px = _dib_pixels(payloads[d], locs[f][0], w, h).reshape(h, w, 3)
            for r in (0, 3, H - 1):
                for c in (0, 1, W - 1):
                    for off in range(3):
                        assert px[r, c, off] == _video_channel(d, f, r, c, off)


def test_non_avi_magic_raises(spark):
    df = _media_struct(spark, b"\x00\x01\x02\x03" * 16, "video/mp4")
    with pytest.raises(Exception, match="unsupported payload magic"):
        video_pooled_dhash(df).collect()
