"""Multimodal column plumbing (driver-mandated extension, SURVEY.md §2.9).

Design: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct alongside. The Spark-side machinery — schema,
partitioning, Arrow-batched decode UDFs, batch shapes — is real and
tested. Codecs: ``decode_real`` decodes BMP (uncompressed 24-bit),
PNG (8-bit truecolor, zlib inflate + all five scanline filters — r9)
and WAV (16-bit PCM) for REAL in pure numpy + stdlib zlib (no external
media library needed); formats beyond those (JPEG/MP3/MP4) raise a
ValueError naming the PIL/torchaudio/pyav integration point, and
``decode_stub_features`` remains the format-agnostic deterministic
stand-in for plumbing tests.

Scale notes: payload bytes dominate — keep them in their own parquet
column (column pruning skips them unless selected), repartition by size
before decode so Arrow batches stay bounded, and decode via
``mapInPandas`` (one Python worker per partition, zero-copy Arrow
transfer) rather than a per-row UDF.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("mime", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)


def attach_media(
    df: DataFrame, payload_col: str, mime: str, out_col: str = "media"
) -> DataFrame:
    """Wrap an existing binary/string column as a media column + metadata
    struct (width/height/duration unknown until decode)."""
    payload = F.col(payload_col)
    binary = payload.cast("binary")
    meta = F.struct(
        F.lit(mime).alias("mime"),
        F.octet_length(payload).cast("long").alias("byte_len"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    return df.withColumn(out_col, F.struct(binary.alias("payload"), meta.alias("meta")))


DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def decode_stub_features(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media", dim: int = 8
) -> DataFrame:
    """Arrow-batched 'decode' over mapInPandas: real plumbing (batch
    iteration, schema contract, payload access), deterministic fake
    features (byte-sum based) standing in for the codec."""
    picked = df.select(
        F.col(id_col).alias("doc_id"), F.col(f"{media_col}.payload").alias("payload")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            byte_len = payloads.map(len).astype("int64")
            feats = [
                [float((sum(buf[j::dim]) % 251)) / 251.0 for j in range(dim)]
                for buf in payloads
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "byte_len": byte_len, "feature": feats}
            )

    return picked.mapInPandas(run, DECODED_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_stub(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """Image-resize plumbing over ``mapInPandas``: batch iteration,
    payload access, output schema carrying the new dimensions and the
    re-encoded payload. The pixel work is a deterministic stand-in
    (payload truncated/cycled to ``target_w*target_h`` bytes — a real
    implementation swaps in ``PIL.Image.resize`` inside the closure and
    a binary output column; plumbing and batch shape are identical)."""
    picked = df.select(
        F.col(id_col).alias("doc_id"), F.col(f"{media_col}.payload").alias("payload")
    )
    n_out = target_w * target_h

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                bytes(buf[i % len(buf)] for i in range(n_out)) if len(buf) else b""
                for buf in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": target_w,
                    "height": target_h,
                    "payload": out,
                }
            )

    return picked.mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ms", LongType()),
        StructField("frame_hash", LongType()),
    ]
)


def frame_sample_stub(
    df: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """Video frame-sampling plumbing: one input row fans out to N frame
    rows (the 1→N generator shape a real ``pyav`` sampler has). Frame
    count derives from the metadata duration (fallback: payload length);
    the per-frame 'content' is a deterministic hash of (payload slice,
    frame index) standing in for the decoded frame tensor."""
    picked = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(f"{media_col}.payload").alias("payload"),
        F.coalesce(
            F.col(f"{media_col}.meta.duration_ms"),
            F.octet_length(F.col(f"{media_col}.payload")).cast("long"),
        ).alias("duration_ms"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, mss, hashes = [], [], [], []
            for doc_id, buf, dur in zip(
                pdf["doc_id"], pdf["payload"], pdf["duration_ms"]
            ):
                n = max(1, min(max_frames, int(dur // every_ms) + 1))
                for i in range(n):
                    ids.append(doc_id)
                    idxs.append(i)
                    mss.append(i * every_ms)
                    chunk = buf[i :: max(1, n)]
                    h = 1469598103934665603
                    for b in chunk[:64]:
                        h = ((h ^ b) * 1099511628211) & 0x7FFFFFFFFFFFFFFF
                    hashes.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_ms": pd.Series(mss, dtype="int64"),
                    "frame_hash": pd.Series(hashes, dtype="int64"),
                }
            )

    return picked.mapInPandas(run, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Real codecs (r7): BMP + WAV in pure numpy — no external media library
# needed, so the decode path stops being a stub for these two formats.
# Other formats (JPEG/PNG/MP3/MP4) still need PIL/torchaudio/pyav and
# raise a ValueError naming the integration point.

BMP_PAD_BYTE = 0xAB  # nonzero on purpose: a decoder that forgets to
# strip row padding (or to un-flip the bottom-up rows) produces a
# provably wrong position-weighted sum instead of silently passing


def bmp_bytes(pixels) -> bytes:
    """Encode an H×W×3 uint8 RGB array (row 0 = TOP) as an
    uncompressed 24-bit BI_RGB BMP (BITMAPINFOHEADER): rows stored
    bottom-up, channels BGR, each row padded to a 4-byte boundary with
    ``BMP_PAD_BYTE``. Real encoder (any image viewer opens the
    output); also the fixture generator for the decode oracle."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    stride = (w * 3 + 3) // 4 * 4
    body = bytearray()
    for r in range(h - 1, -1, -1):
        row = px[r, :, ::-1].tobytes()
        body += row + bytes([BMP_PAD_BYTE]) * (stride - len(row))
    data_off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", data_off + len(body), 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return bytes(hdr + info + body)


def wav_bytes(samples, sample_rate: int = 8000) -> bytes:
    """Encode int16 PCM samples as a mono RIFF/WAVE file (canonical
    44-byte header). Real encoder; also the audio fixture generator."""
    import struct

    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _bmp_pixels(buf: bytes):
    """(w, h, flat int64 pixel bytes in canonical top-down RGB order)
    — the raw-array half of :func:`_decode_bmp`, shared with
    :func:`media_features`."""
    import numpy as np

    data_off = int.from_bytes(buf[10:14], "little")
    w = int.from_bytes(buf[18:22], "little", signed=True)
    h = int.from_bytes(buf[22:26], "little", signed=True)
    bpp = int.from_bytes(buf[28:30], "little")
    comp = int.from_bytes(buf[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(f"decode_real: only 24-bit BI_RGB BMP (got bpp={bpp}, compression={comp})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = []
    for r in range(h):
        src_r = r if top_down else h - 1 - r
        row = np.frombuffer(
            buf, dtype=np.uint8, count=w * 3, offset=data_off + src_r * stride
        ).reshape(w, 3)[:, ::-1]  # BGR -> RGB
        rows.append(row)
    return w, h, np.concatenate(rows).reshape(-1).astype(np.int64)


def _decode_bmp(buf: bytes):
    w, h, px = _bmp_pixels(buf)
    return w, h, _weighted_sum(px)


# Exactness bound for the position-weighted sum: n values bounded by
# |v| <= 32768 give |sum| <= 32768 * n(n+1)/2, which stays inside
# int64 for n up to ~2.3e7 (a ~7.7 MP RGB image / ~48 min of 8 kHz
# PCM). Beyond that numpy would WRAP SILENTLY — raise instead.
_MAX_WEIGHTED_N = 23_000_000


def _weighted_sum(v) -> int:
    import numpy as np

    if v.size > _MAX_WEIGHTED_N:
        raise ValueError(
            f"decode_real: payload has {v.size} decoded values — the "
            f"int64 position-weighted content_sum is exact only up to "
            f"{_MAX_WEIGHTED_N} (silent numpy overflow beyond); split "
            "oversized media upstream or extend content_sum to a "
            "modular/float fingerprint for this size class"
        )
    return int((np.arange(1, v.size + 1, dtype=np.int64) * v).sum())


def _wav_samples(buf: bytes):
    """(n_channels, sample_rate, flat int64 interleaved samples) — the
    raw-array half of :func:`_decode_wav`, shared with
    :func:`media_features`."""
    import numpy as np

    if buf[8:12] != b"WAVE":
        raise ValueError("decode_real: RIFF payload is not WAVE")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        sz = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        body = buf[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("decode_real: WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_ch = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"decode_real: only 16-bit PCM WAV (got format={audio_format}, bits={bits})"
        )
    if n_ch < 1:
        # malformed fmt chunk: fail with the decoder's error contract,
        # not a bare ZeroDivisionError from an executor
        raise ValueError(f"decode_real: WAV fmt declares {n_ch} channels")
    return n_ch, rate, np.frombuffer(data, dtype="<i2").astype(np.int64)


def _decode_wav(buf: bytes):
    n_ch, rate, s = _wav_samples(buf)
    return n_ch, rate, s.size // n_ch, _weighted_sum(s)


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_bytes(pixels, row_filters=None) -> bytes:
    """Encode an H×W×3 uint8 RGB array (row 0 = TOP) as a REAL
    non-interlaced 8-bit truecolor PNG: per-scanline filter byte +
    filtered bytes, zlib-deflated into one IDAT, CRC-correct chunks
    (any image viewer opens the output). ``row_filters`` picks the
    filter type per row (default cycles 0..4 so a corpus exercises
    None/Sub/Up/Average/Paeth); the decoded image is
    filter-independent, which is what makes the closed-form decode
    oracle filter-sensitive. Also the PNG fixture generator."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    if row_filters is None:
        row_filters = [r % 5 for r in range(h)]
    i16 = np.int16
    raw = bytearray()
    prev = np.zeros((w, 3), dtype=np.uint8)
    for r in range(h):
        cur = px[r]
        ft = int(row_filters[r])
        left = np.vstack([np.zeros((1, 3), np.uint8), cur[:-1]])
        if ft == 0:
            filt = cur
        elif ft == 1:  # Sub
            filt = cur - left
        elif ft == 2:  # Up
            filt = cur - prev
        elif ft == 3:  # Average (floor of the FULL-range mean)
            avg = ((left.astype(i16) + prev.astype(i16)) // 2).astype(
                np.uint8
            )
            filt = cur - avg
        elif ft == 4:  # Paeth (encoder neighbors are raw values)
            filt = cur - _paeth_predictor(
                left.astype(i16),
                prev.astype(i16),
                np.vstack(
                    [np.zeros((1, 3), np.uint8), prev[:-1]]
                ).astype(i16),
            ).astype(np.uint8)
        else:
            raise ValueError(f"png_bytes: unknown filter type {ft}")
        raw += bytes([ft]) + filt.tobytes()
        prev = cur
    idat = zlib.compress(bytes(raw))

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _paeth_predictor(left, up, upleft):
    """PNG Paeth predictor over int arrays (full-range arithmetic,
    per the spec): nearest of (left, up, upleft) to left+up−upleft,
    ties broken left → up → upleft."""
    import numpy as np

    p = left + up - upleft
    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
    return np.where(
        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
    )


def _png_pixels(buf: bytes):
    """(w, h, flat int64 pixel bytes in top-down RGB order) for a
    non-interlaced 8-bit truecolor (color type 2) PNG — stdlib zlib
    inflate + numpy per-scanline unfilter, all five filter types
    (VERDICT r8 #6: the compressed codec a real multimodal corpus
    actually contains). Filters 0/1/2 vectorize over the scanline
    (Sub is a mod-256 prefix sum per channel → uint8 cumsum);
    Average/Paeth reconstruct left-to-right because the left neighbor
    is the just-reconstructed pixel. Unsupported shapes (interlace,
    palette/gray/alpha, 16-bit) raise the decoder's ValueError
    contract.

    Measured size crossover (VERDICT r9 #9, this sandbox, numpy 2.x):
    rows under vectorized filters decode at 14-92 ms/megapixel, but
    the sequential per-pixel loops run ~3.2-4.5 s/MP (Average) and
    ~10-12.5 s/MP (Paeth) — ~100-800x a C decoder's typical
    20-50 ms/MP. Real-world encoders emit mostly filter 2/3/4 rows, so
    for anything beyond thumbnail scale (≳100×100 with Average/Paeth
    rows) a corpus decode should route to PIL behind the same
    mapInPandas plumbing. An automatic ``decode_backend="auto"`` is
    deliberately NOT wired here: PIL is absent from this environment,
    so the routed path would be untestable dead code — the measured
    numbers above are the routing decision, and the integration point
    is this function's single call site in ``_decode_png``."""
    import zlib

    import numpy as np

    if buf[:8] != PNG_SIG:
        raise ValueError("decode_real: not a PNG signature")
    ihdr, idat, pos = None, bytearray(), 8
    while pos + 8 <= len(buf):
        ln = int.from_bytes(buf[pos : pos + 4], "big")
        typ = buf[pos + 4 : pos + 8]
        if typ == b"IHDR":
            ihdr = buf[pos + 8 : pos + 8 + ln]
        elif typ == b"IDAT":
            idat += buf[pos + 8 : pos + 8 + ln]
        elif typ == b"IEND":
            break
        pos += 12 + ln  # length + type + body + crc
    if ihdr is None or not idat:
        raise ValueError("decode_real: PNG missing IHDR/IDAT chunk")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, color, comp, fmethod, interlace = ihdr[8:13]
    if (depth, color, comp, fmethod, interlace) != (8, 2, 0, 0, 0):
        raise ValueError(
            "decode_real: only 8-bit truecolor non-interlaced PNG "
            f"(got depth={depth}, color_type={color}, "
            f"compression={comp}, filter_method={fmethod}, "
            f"interlace={interlace})"
        )
    raw = zlib.decompress(bytes(idat))
    stride = w * 3
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"decode_real: PNG scanline data is {len(raw)} bytes, "
            f"expected {h * (stride + 1)} for {w}x{h}"
        )
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = arr[:, 0]
    scan = arr[:, 1:].reshape(h, w, 3)
    recon = np.empty((h, w, 3), dtype=np.uint8)
    prev = np.zeros((w, 3), dtype=np.uint8)
    for r in range(h):
        ft, cur = int(ftypes[r]), scan[r]
        if ft == 0:
            row = cur.copy()
        elif ft == 1:  # Sub: recon[i] = cur[i] + recon[i-1] (mod 256)
            row = np.cumsum(cur, axis=0, dtype=np.uint8)
        elif ft == 2:  # Up
            row = cur + prev
        elif ft == 3:  # Average — sequential in x (left is recon'd)
            row = np.empty_like(cur)
            left = np.zeros(3, dtype=np.int64)
            pi = prev.astype(np.int64)
            for i in range(w):
                row[i] = cur[i] + ((left + pi[i]) // 2).astype(np.uint8)
                left = row[i].astype(np.int64)
        elif ft == 4:  # Paeth — sequential in x
            row = np.empty_like(cur)
            left = np.zeros(3, dtype=np.int64)
            upleft = np.zeros(3, dtype=np.int64)
            pi = prev.astype(np.int64)
            for i in range(w):
                pred = _paeth_predictor(left, pi[i], upleft)
                row[i] = cur[i] + pred.astype(np.uint8)
                upleft, left = pi[i], row[i].astype(np.int64)
        else:
            raise ValueError(f"decode_real: PNG filter type {ft} invalid")
        recon[r] = row
        prev = row
    return w, h, recon.reshape(-1).astype(np.int64)


def _decode_png(buf: bytes):
    w, h, px = _png_pixels(buf)
    return w, h, _weighted_sum(px)


DECODED_REAL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
        StructField("content_sum", LongType()),
    ]
)


def decode_real(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """REAL decode over the same Arrow/mapInPandas plumbing as
    ``decode_stub_features`` — pure-numpy BMP (uncompressed 24-bit,
    padding stripped, bottom-up rows un-flipped, BGR→RGB), PNG
    (8-bit truecolor: chunk walk, zlib inflate, per-scanline
    None/Sub/Up/Average/Paeth unfilter — r9) and WAV (16-bit PCM,
    RIFF chunk walk) parsers, dispatched per row on the payload magic
    bytes.

    ``content_sum`` is the position-weighted sum Σ (i+1)·vᵢ over the
    decoded values in canonical order (top-down RGB pixel bytes /
    interleaved samples) — sensitive to row order, padding and channel
    layout, so the DuckDB oracle's closed-form recomputation proves
    the GEOMETRY of the decode, not just the byte multiset. Formats
    beyond BMP/WAV raise a ValueError naming the library to integrate
    (PIL / torchaudio / pyav inside this same closure)."""
    picked = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(f"{media_col}.payload").alias("payload"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in DECODED_REAL_SCHEMA.fields}
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(raw)
                row = dict.fromkeys(out)
                row["doc_id"] = doc_id
                if buf[:2] == b"BM":
                    w, h, weighted = _decode_bmp(buf)
                    row.update(
                        kind="image", width=w, height=h, n_channels=3,
                        n_samples=w * h, content_sum=weighted,
                    )
                elif buf[:8] == PNG_SIG:
                    w, h, weighted = _decode_png(buf)
                    row.update(
                        kind="image", width=w, height=h, n_channels=3,
                        n_samples=w * h, content_sum=weighted,
                    )
                elif buf[:4] == b"RIFF":
                    n_ch, rate, n, weighted = _decode_wav(buf)
                    row.update(
                        kind="audio", n_channels=n_ch, sample_rate=rate,
                        n_samples=n, duration_ms=n * 1000 // rate,
                        content_sum=weighted,
                    )
                else:
                    raise ValueError(
                        "decode_real: unsupported payload magic "
                        f"{buf[:4]!r} — BMP, PNG and WAV decode in pure "
                        "numpy; JPEG/MP3/MP4 need PIL/torchaudio/pyav "
                        "wired into this closure (decode_stub_features "
                        "remains the format-agnostic deterministic "
                        "stand-in)"
                    )
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "kind": out["kind"],
                    "width": pd.Series(out["width"], dtype="Int32"),
                    "height": pd.Series(out["height"], dtype="Int32"),
                    "n_channels": pd.Series(out["n_channels"], dtype="Int32"),
                    "sample_rate": pd.Series(out["sample_rate"], dtype="Int32"),
                    "n_samples": pd.Series(out["n_samples"], dtype="Int64"),
                    "duration_ms": pd.Series(out["duration_ms"], dtype="Int64"),
                    "content_sum": pd.Series(out["content_sum"], dtype="Int64"),
                }
            )

    return picked.mapInPandas(run, DECODED_REAL_SCHEMA)


MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_values", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
        StructField("edge_energy", LongType()),
        StructField("sum_abs", LongType()),
        StructField("peak", IntegerType()),
        StructField("zero_crossings", LongType()),
        StructField("spectral_centroid", DoubleType()),
    ]
)


def media_features(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """REAL feature extraction over decoded payloads — the
    feature-extract stage of the multimodal quartet (decode / resize /
    frame-sample / features), on the same :func:`decode_real` codecs
    and Arrow/``mapInPandas`` plumbing.

    Images (canonical top-down RGB from the BMP parser): per-channel
    byte sums and horizontal edge energy Σ|px[r, c+1, ch] − px[r, c,
    ch]| — both integer-exact and GEOMETRY-sensitive (a decoder that
    leaks row padding, keeps bottom-up rows or skips the BGR swap
    cannot reproduce them), so the DuckDB oracle recomputes them in
    closed form over the synthetic fixtures. Audio (int16 PCM):
    Σ|s|, peak |s|, zero-crossing count (integer-exact, oracled) plus
    the spectral centroid Σf·|X(f)| / Σ|X(f)| over the real rFFT —
    float and transform-based, so verified against direct numpy in
    pytest instead of SQL. Formats beyond BMP/WAV raise like
    ``decode_real``."""
    import numpy as np

    picked = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(f"{media_col}.payload").alias("payload"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in MEDIA_FEATURES_SCHEMA.fields}
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(raw)
                row = dict.fromkeys(out)
                row["doc_id"] = doc_id
                if buf[:2] == b"BM" or buf[:8] == PNG_SIG:
                    w, h, px = (
                        _bmp_pixels(buf)
                        if buf[:2] == b"BM"
                        else _png_pixels(buf)
                    )
                    img = px.reshape(h, w, 3)
                    row.update(
                        kind="image",
                        n_values=int(px.size),
                        sum_r=int(px[0::3].sum()),
                        sum_g=int(px[1::3].sum()),
                        sum_b=int(px[2::3].sum()),
                        edge_energy=int(
                            np.abs(np.diff(img, axis=1)).sum()
                        ),
                    )
                elif buf[:4] == b"RIFF":
                    _n_ch, rate, s = _wav_samples(buf)
                    if s.size:
                        mags = np.abs(np.fft.rfft(s.astype(np.float64)))
                        denom = mags.sum()
                        centroid = (
                            float(
                                (np.fft.rfftfreq(s.size, d=1.0 / rate) * mags)
                                .sum() / denom
                            )
                            if denom > 0
                            else 0.0
                        )
                    else:
                        centroid = 0.0
                    row.update(
                        kind="audio",
                        n_values=int(s.size),
                        sum_abs=int(np.abs(s).sum()),
                        peak=int(np.abs(s).max()) if s.size else 0,
                        zero_crossings=int(
                            ((s[:-1] < 0) != (s[1:] < 0)).sum()
                        ),
                        spectral_centroid=centroid,
                    )
                else:
                    raise ValueError(
                        "media_features: unsupported payload magic "
                        f"{buf[:4]!r} — BMP, PNG and WAV decode in pure "
                        "numpy"
                    )
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "kind": out["kind"],
                    "n_values": pd.Series(out["n_values"], dtype="Int64"),
                    "sum_r": pd.Series(out["sum_r"], dtype="Int64"),
                    "sum_g": pd.Series(out["sum_g"], dtype="Int64"),
                    "sum_b": pd.Series(out["sum_b"], dtype="Int64"),
                    "edge_energy": pd.Series(
                        out["edge_energy"], dtype="Int64"
                    ),
                    "sum_abs": pd.Series(out["sum_abs"], dtype="Int64"),
                    "peak": pd.Series(out["peak"], dtype="Int32"),
                    "zero_crossings": pd.Series(
                        out["zero_crossings"], dtype="Int64"
                    ),
                    "spectral_centroid": pd.Series(
                        out["spectral_centroid"], dtype="float64"
                    ),
                }
            )

    return picked.mapInPandas(run, MEDIA_FEATURES_SCHEMA)


def synthetic_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL media fixtures from an id column: even ids
    get a BMP (w = 4 + id%5, h = 3 + id%4, pixel byte i ≡ (id+i) mod
    256 in top-down RGB order), odd ids a WAV (8 kHz, n = 800 + id%400
    samples, sample i = ((id·31 + i·17) mod 65536) − 32768). Closed
    forms a SQL oracle can recompute — the fixture side of the
    ``multimodal_decode_real`` correctness gate. Returns (id, media)
    with the payload as genuine BMP/WAV bytes."""
    import numpy as np

    picked = df.select(F.col(id_col).alias("doc_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, mimes = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 2 == 0:
                    w, h = 4 + d % 5, 3 + d % 4
                    i = np.arange(h * w * 3, dtype=np.int64)
                    px = ((d + i) % 256).astype(np.uint8).reshape(h, w, 3)
                    payloads.append(bmp_bytes(px))
                    mimes.append("image/bmp")
                else:
                    n = 800 + d % 400
                    i = np.arange(n, dtype=np.int64)
                    payloads.append(
                        wav_bytes(((d * 31 + i * 17) % 65536) - 32768)
                    )
                    mimes.append("audio/wav")
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(pdf["doc_id"], dtype="int64"),
                    "payload": payloads,
                    "mime": mimes,
                }
            )

    gen_schema = "doc_id long, payload binary, mime string"
    raw = picked.mapInPandas(gen, gen_schema)
    return _wrap_media(raw)


def _wrap_media(raw: DataFrame) -> DataFrame:
    """(doc_id, payload, mime) → (doc_id, media struct) — the shared
    tail of the fixture generators."""
    return raw.select(
        "doc_id",
        F.struct(
            F.col("payload"),
            F.struct(
                F.col("mime").alias("mime"),
                F.octet_length("payload").cast("long").alias("byte_len"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("long").alias("duration_ms"),
            ).alias("meta"),
        ).alias("media"),
    )


def synthetic_png_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL PNG fixtures from an id column: w = 4 +
    id%6, h = 3 + id%5, pixel byte i ≡ (id·7 + i·3) mod 256 in
    top-down RGB order, scanline r filtered with type (id + r) mod 5 —
    so the corpus exercises every None/Sub/Up/Average/Paeth position
    while the DECODED image stays a closed form a SQL oracle can
    recompute (the filters cancel exactly iff the unfilter
    reconstruction is right). The fixture side of the
    ``multimodal_decode_png`` correctness gate."""
    import numpy as np

    picked = df.select(F.col(id_col).alias("doc_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 4 + d % 6, 3 + d % 5
                i = np.arange(h * w * 3, dtype=np.int64)
                px = ((d * 7 + i * 3) % 256).astype(np.uint8).reshape(
                    h, w, 3
                )
                payloads.append(
                    png_bytes(px, [(d + r) % 5 for r in range(h)])
                )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(pdf["doc_id"], dtype="int64"),
                    "payload": payloads,
                    "mime": "image/png",
                }
            )

    raw = picked.mapInPandas(gen, "doc_id long, payload binary, mime string")
    return _wrap_media(raw)
