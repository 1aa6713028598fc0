"""Tests for multimodal column plumbing (SURVEY.md §2.9): the schema /
partitioning / Arrow-batch machinery is real; the codec is a
deterministic stub (no image/audio libraries in this environment)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators import multimodal as mm


def _df(spark):
    return spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "binary-ish éÀ")],
        "doc_id LONG, text STRING",
    )


def test_attach_media_schema_and_meta(spark):
    out = mm.attach_media(_df(spark), "text", "text/plain")
    field = dict(zip(out.schema.names, out.schema.fields))["media"]
    sub = {f.name: f.dataType.simpleString() for f in field.dataType.fields}
    assert sub["payload"] == "binary"
    assert [f.name for f in field.dataType["meta"].dataType.fields] == [
        "mime", "byte_len", "width", "height", "duration_ms",
    ]
    rows = {r.doc_id: r for r in out.select("doc_id", "media.*").collect()}
    assert rows[1].meta.mime == "text/plain"
    assert rows[1].meta.byte_len == len("hello world")
    assert rows[2].meta.byte_len == 0
    # utf-8 byte length, not char count
    assert rows[3].meta.byte_len == len("binary-ish éÀ".encode())


def test_decode_stub_deterministic_and_shaped(spark):
    media = mm.attach_media(_df(spark), "text", "text/plain")
    a = {r.doc_id: r for r in mm.decode_stub_features(media).collect()}
    b = {r.doc_id: r for r in mm.decode_stub_features(media).collect()}
    for doc_id in (1, 2, 3):
        assert len(a[doc_id].feature) == 8
        assert a[doc_id].feature == b[doc_id].feature  # deterministic
        assert all(0.0 <= v < 1.0 for v in a[doc_id].feature)
    assert a[1].byte_len == len("hello world")


def test_decode_real_rejects_unknown_magic(spark):
    """Non-BMP/WAV payloads raise naming the integration point (the
    former blanket NotImplementedError is gone — BMP and WAV decode
    for real since r7)."""
    media = mm.attach_media(_df(spark), "text", "application/octet-stream")
    with pytest.raises(Exception, match="unsupported payload magic"):
        mm.decode_real(media).collect()


def test_bmp_roundtrip_geometry_sensitive():
    """bmp_bytes ∘ _decode_bmp recovers dimensions and the
    position-weighted content sum — including a width whose row needs
    padding (w=3 → stride 12, three 0xAB pad bytes per row), so a
    decoder that sums raw payload bytes or skips the bottom-up flip
    fails this value."""
    import numpy as np

    px = np.arange(3 * 3 * 3, dtype=np.uint8).reshape(3, 3, 3) * 7 % 256
    buf = mm.bmp_bytes(px)
    assert buf[:2] == b"BM"
    w, h, weighted = mm._decode_bmp(buf)
    assert (w, h) == (3, 3)
    flat = px.reshape(-1).astype(np.int64)
    expect = int((np.arange(1, flat.size + 1) * flat).sum())
    assert weighted == expect
    # padding bytes are present and nonzero in the encoded form
    assert mm.BMP_PAD_BYTE in buf[14 + 40:]


def test_wav_roundtrip():
    import numpy as np

    s = (np.arange(500, dtype=np.int64) * 131 % 65536) - 32768
    buf = mm.wav_bytes(s, sample_rate=8000)
    n_ch, rate, n, weighted = mm._decode_wav(buf)
    assert (n_ch, rate, n) == (1, 8000, 500)
    assert weighted == int((np.arange(1, 501) * s).sum())


def test_decode_real_matches_closed_form(spark):
    """decode_real over synthetic_media equals the closed-form features
    computed independently in Python — the same arithmetic the DuckDB
    oracle of multimodal_decode_real runs."""
    import numpy as np

    ids = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    out = {
        r.doc_id: r for r in mm.decode_real(mm.synthetic_media(ids)).collect()
    }
    assert set(out) == set(range(12))
    for d in range(12):
        r = out[d]
        if d % 2 == 0:
            w, h = 4 + d % 5, 3 + d % 4
            i = np.arange(h * w * 3, dtype=np.int64)
            expect = int(((i + 1) * ((d + i) % 256)).sum())
            assert (r.kind, r.width, r.height, r.n_channels) == ("image", w, h, 3)
            assert r.n_samples == w * h and r.content_sum == expect
        else:
            n = 800 + d % 400
            i = np.arange(n, dtype=np.int64)
            expect = int(((i + 1) * (((d * 31 + i * 17) % 65536) - 32768)).sum())
            assert (r.kind, r.n_channels, r.sample_rate) == ("audio", 1, 8000)
            assert r.n_samples == n
            assert r.duration_ms == n * 1000 // 8000
            assert r.content_sum == expect


def test_resize_stub_shapes_and_determinism(spark):
    media = mm.attach_media(_df(spark), "text", "image/png")
    out = {r.doc_id: r for r in mm.resize_stub(media, 4, 3).collect()}
    assert set(out) == {1, 2, 3}
    for r in out.values():
        assert (r.width, r.height) == (4, 3)
    assert len(out[1].payload) == 12  # target_w * target_h bytes
    assert out[2].payload == b""  # empty payload passes through empty
    again = {r.doc_id: r.payload for r in mm.resize_stub(media, 4, 3).collect()}
    assert {k: v.payload for k, v in out.items()} == again


def test_frame_sample_fanout_and_bounds(spark):
    media = mm.attach_media(_df(spark), "text", "video/mp4")
    out = mm.frame_sample_stub(media, every_ms=2, max_frames=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # len("hello world")=11 → min(4, 11//2+1)=4 frames; empty → 1 frame
    assert len(by_doc[1]) == 4
    assert len(by_doc[2]) == 1
    for doc_id, frames in by_doc.items():
        idxs = sorted(f.frame_idx for f in frames)
        assert idxs == list(range(len(frames)))
        for f in frames:
            assert f.frame_ms == f.frame_idx * 2
            assert f.frame_hash >= 0


def test_media_features_matches_direct_numpy(spark):
    """media_features (r8): the Spark pipeline's features over REAL
    decoded payloads equal a direct numpy computation on the same
    synthetic arrays — including the float spectral centroid, which
    the SQL oracle cannot express (rFFT) and which this test owns."""
    import numpy as np

    ids = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    got = {
        r.doc_id: r.asDict()
        for r in mm.media_features(mm.synthetic_media(ids)).collect()
    }
    assert len(got) == 24
    for d in range(24):
        r = got[d]
        if d % 2 == 0:
            w, h = 4 + d % 5, 3 + d % 4
            i = np.arange(h * w * 3, dtype=np.int64)
            px = (d + i) % 256
            img = px.reshape(h, w, 3)
            assert r["kind"] == "image"
            assert r["n_values"] == px.size
            assert (r["sum_r"], r["sum_g"], r["sum_b"]) == (
                int(px[0::3].sum()), int(px[1::3].sum()), int(px[2::3].sum())
            )
            assert r["edge_energy"] == int(np.abs(np.diff(img, axis=1)).sum())
            assert r["sum_abs"] is None and r["spectral_centroid"] is None
        else:
            n = 800 + d % 400
            i = np.arange(n, dtype=np.int64)
            s = ((d * 31 + i * 17) % 65536) - 32768
            assert r["kind"] == "audio"
            assert r["n_values"] == n
            assert r["sum_abs"] == int(np.abs(s).sum())
            assert r["peak"] == int(np.abs(s).max())
            assert r["zero_crossings"] == int(((s[:-1] < 0) != (s[1:] < 0)).sum())
            mags = np.abs(np.fft.rfft(s.astype(np.float64)))
            exp = float(
                (np.fft.rfftfreq(n, d=1.0 / 8000) * mags).sum() / mags.sum()
            )
            assert abs(r["spectral_centroid"] - exp) < 1e-9 * max(1.0, exp)
            assert r["sum_r"] is None and r["edge_energy"] is None


def test_media_features_geometry_sensitivity():
    """A bottom-up-row or BGR-confused decode CANNOT reproduce the
    features: flipping rows changes edge rows' neighbors only across
    rows (edge_energy is horizontal → invariant) but channel swap
    breaks sum_r/sum_b, and padding leakage breaks n_values. Build a
    BMP whose R and B channel sums differ and whose rows differ, then
    assert the decoded features see the canonical orientation."""
    import numpy as np

    px = np.zeros((2, 3, 3), dtype=np.uint8)
    px[0, :, 0] = 200  # top row strongly red
    px[1, :, 2] = 10   # bottom row weakly blue
    buf = mm.bmp_bytes(px)
    w, h, flat = mm._bmp_pixels(buf)
    assert (w, h) == (3, 2)
    img = flat.reshape(2, 3, 3)
    assert img[0, :, 0].sum() == 600 and img[1, :, 2].sum() == 30
    # BGR-confused parse would swap these
    assert flat[0::3].sum() == 600 and flat[2::3].sum() == 30


def test_png_roundtrip_every_filter_type():
    """png_bytes ∘ _png_pixels is the identity for each of the five
    scanline filter types applied uniformly — a decoder whose
    Sub/Up/Average/Paeth reconstruction is wrong cannot return the
    original image (filters only cancel when unfiltering matches the
    spec)."""
    import numpy as np

    rng = np.random.default_rng(42)
    px = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    for ft in range(5):
        buf = mm.png_bytes(px, [ft] * 9)
        assert buf[:8] == mm.PNG_SIG
        w, h, flat = mm._png_pixels(buf)
        assert (w, h) == (7, 9)
        assert np.array_equal(flat.reshape(9, 7, 3), px.astype(np.int64)), ft


def test_png_roundtrip_fuzz_shapes_and_mixed_filters():
    """Random small images × random per-row filter sequences — w=1
    (Sub/Paeth left neighbor is always the zero pixel) and h=1 (Up /
    Paeth up neighbor is the zero scanline) are the degenerate
    geometries."""
    import numpy as np

    rng = np.random.default_rng(7)
    shapes = [(1, 1), (1, 5), (5, 1), (2, 2)] + [
        (int(rng.integers(1, 11)), int(rng.integers(1, 11)))
        for _ in range(40)
    ]
    for h, w in shapes:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        filts = rng.integers(0, 5, size=h).tolist()
        w2, h2, flat = mm._png_pixels(mm.png_bytes(px, filts))
        assert (w2, h2) == (w, h)
        assert np.array_equal(flat.reshape(h, w, 3), px.astype(np.int64)), (
            h, w, filts,
        )


def test_png_rejects_unsupported_shapes():
    """The decoder's error contract: bad signature, missing chunks,
    and non-8-bit-truecolor IHDRs raise ValueError naming the
    constraint — never a silent misparse."""
    import struct
    import zlib

    import numpy as np

    px = np.zeros((2, 2, 3), dtype=np.uint8)
    good = mm.png_bytes(px)

    with pytest.raises(ValueError, match="not a PNG signature"):
        mm._png_pixels(b"\x89PNX" + good[4:])
    with pytest.raises(ValueError, match="missing IHDR/IDAT"):
        mm._png_pixels(mm.PNG_SIG)  # signature only
    # grayscale (color type 0) IHDR
    def chunk(typ, body):
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body))
        )
    gray = (
        mm.PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00" * 2))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="only 8-bit truecolor"):
        mm._png_pixels(gray)
    # truncated scanline data
    short = (
        mm.PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 5))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="scanline data"):
        mm._png_pixels(short)


def test_decode_png_matches_closed_form(spark):
    """decode_real over synthetic_png_media equals the closed-form
    features computed independently in Python — the same arithmetic
    the DuckDB oracle of multimodal_decode_png runs. Ids 0..29 cover
    every (w, h, leading-filter) combination of the fixture scheme."""
    import numpy as np

    ids = spark.range(0, 30).select(F.col("id").alias("doc_id"))
    out = {
        r.doc_id: r
        for r in mm.decode_real(mm.synthetic_png_media(ids)).collect()
    }
    assert set(out) == set(range(30))
    for d in range(30):
        r = out[d]
        w, h = 4 + d % 6, 3 + d % 5
        i = np.arange(h * w * 3, dtype=np.int64)
        expect = int(((i + 1) * ((d * 7 + i * 3) % 256)).sum())
        assert (r.kind, r.width, r.height, r.n_channels) == (
            "image", w, h, 3,
        )
        assert r.n_samples == w * h and r.content_sum == expect
        assert r.sample_rate is None and r.duration_ms is None


def test_media_features_over_png(spark):
    """media_features accepts PNG payloads through the same dispatch
    as BMP — features computed on the unfiltered canonical top-down
    RGB image, identical to direct numpy on the fixture closed form."""
    import numpy as np

    ids = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    got = {
        r.doc_id: r.asDict()
        for r in mm.media_features(mm.synthetic_png_media(ids)).collect()
    }
    for d in range(10):
        r = got[d]
        w, h = 4 + d % 6, 3 + d % 5
        i = np.arange(h * w * 3, dtype=np.int64)
        px = (d * 7 + i * 3) % 256
        img = px.reshape(h, w, 3)
        assert r["kind"] == "image" and r["n_values"] == px.size
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == (
            int(px[0::3].sum()), int(px[1::3].sum()), int(px[2::3].sum())
        )
        assert r["edge_energy"] == int(np.abs(np.diff(img, axis=1)).sum())
