"""WARC/WET landed source (driver-mandated extension, SURVEY.md §2.9;
VERDICT r10 "What's missing" #1): real crawl corpora arrive as WARC
containers (ISO 28500 — CommonCrawl's WARC/WET/WAT drops), not as one
HTML document per parquet row. This module lands them: WARC record
framing (``WARC/1.0`` header block + ``Content-Length``-delimited
payload) parsed into (url, type, date, payload) rows that compose
straight into ``operators.html.extract_html_text`` → the C4/Gopher
gates, completing the crawl→clean-text story end-to-end.

Reference anchor: the NiFi flow's only ingress is JSON-over-CDC
(final_template.xml:4110-4382); a standalone engine mirroring the C4 /
CCNet / RefinedWeb pipelines (which this engine's §2.9 surface
implements) needs the container format those corpora are published in.

Scale design — why file-granularity parallelism, not byte-splitting:
CommonCrawl WARCs are MULTI-MEMBER GZIP (one gzip member per record),
so a byte-range split cannot start mid-file without a member index;
the public readers (sparkwarc, archives-unleashed) parallelize across
files for exactly this reason. Crawl drops are many ~1 GiB files
(a CC-MAIN segment is ~800 of them), so a 1000-executor cluster
saturates on file count alone. Each task streams ONE file:
``binaryFile`` scan → Arrow batch → a pure-Python framing parser
(regex-free, O(bytes)) → decoded rows. Column pruning CANNOT reach
inside a ``mapInPandas`` output schema (the worker emits every column
it declares, and the raw payload would ride the Arrow transfer just to
be projected away JVM-side), so payload shipping is an explicit knob:
``with_payload=False`` (the default) drops the binary column from the
declared schema and the worker never materializes it — text-only
pipelines move decoded strings, never double-ship the raw bytes.

Corrupt-input contract (same spirit as files.read_csv_table's (good,
bad) channel, one pass instead of two scans): a malformed region
(bad version line, non-integer/overlong Content-Length, truncated
payload) yields ONE row with ``parse_error`` set and the remaining
bytes skipped to the next plausible record boundary; well-formed rows
carry ``parse_error IS NULL``. ``read_warc_records`` returns the
single DataFrame; ``good``/``bad`` views are one ``filter`` away and
stay column-pruned.
"""

from __future__ import annotations

import gzip
import io
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"
_MAGIC = b"WARC/"
_GZIP_MAGIC = b"\x1f\x8b"

# One row per WARC record. `payload` is the raw Content-Length body
# (binary — emitted only when with_payload=True); `text` is the decoded HTTP body
# for response records / the decoded payload for conversion (WET) and
# resource records; `http_status`/`http_content_type` come from the
# embedded HTTP envelope of response records and are NULL elsewhere.
WARC_SCHEMA = (
    "source_file string, record_offset long, record_id string, "
    "warc_type string, warc_date string, target_uri string, "
    "content_type string, content_length long, http_status int, "
    "http_content_type string, payload binary, text string, "
    "parse_error string"
)


def frame_warc_record(
    *,
    warc_type: str,
    target_uri: str | None = None,
    warc_date: str = "2026-01-01T00:00:00Z",
    record_id: str = "<urn:uuid:00000000-0000-0000-0000-000000000000>",
    content_type: str = "application/http; msgtype=response",
    payload: bytes,
) -> bytes:
    """Serialize ONE record in canonical WARC/1.0 framing (header block
    terminated by an empty line, ``Content-Length`` counting payload
    bytes, two CRLF after the payload). Inverse of the parser — used by
    tests and the oracle entry's synthesized-framing shell, and a
    legitimate tiny writer for fixtures."""
    headers = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode("ascii"),
        b"WARC-Date: " + warc_date.encode("ascii"),
        b"WARC-Record-ID: " + record_id.encode("ascii"),
    ]
    if target_uri is not None:
        headers.append(b"WARC-Target-URI: " + target_uri.encode("ascii"))
    headers.append(b"Content-Type: " + content_type.encode("ascii"))
    headers.append(b"Content-Length: " + str(len(payload)).encode("ascii"))
    return _CRLF.join(headers) + _HDR_END + payload + _CRLF + _CRLF


# Framing shells shared by the Column-side synthesizer below, the
# queries.py oracle (replayed through _sql_str_net), and tests. Only
# the two Content-Length values and the doc-keyed fields vary.
WARC_HTTP_HEAD = (
    "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
    "Content-Length: "
)
WARC_RESPONSE_HEAD = (
    "WARC/1.0\r\nWARC-Type: response\r\n"
    "WARC-Date: 2026-01-01T00:00:00Z\r\nWARC-Record-ID: <urn:uuid:"
)


def warc_response_record_col(record_key, target_uri, body):
    """Column-side inverse of the parser for an HTML body: wrap it in
    an HTTP/1.1 200 envelope inside a canonical WARC/1.0 response
    record, Content-Length framing computed with ``octet_length``
    (bytes, not chars). Map-only concat in whole-stage codegen — this
    is how the oracle entry and clean_corpus synthesize landed WARC
    bytes DISTRIBUTEDLY; the Python :func:`frame_warc_record` is for
    driver-side fixtures."""
    http = F.concat(
        F.lit(WARC_HTTP_HEAD),
        F.octet_length(body).cast("string"),
        F.lit("\r\n\r\n"),
        body,
    )
    return F.concat(
        F.lit(WARC_RESPONSE_HEAD),
        record_key,
        F.lit(">\r\nWARC-Target-URI: "),
        target_uri,
        F.lit("\r\nContent-Type: application/http; msgtype=response"),
        F.lit("\r\nContent-Length: "),
        F.octet_length(http).cast("string"),
        F.lit("\r\n\r\n"),
        http,
        F.lit("\r\n\r\n"),
    )


def warc_blobs(
    df: DataFrame,
    id_col: str,
    record_col,
    n_blobs: int,
    *,
    path_prefix: str = "blob://",
) -> DataFrame:
    """Concatenate per-row WARC record strings (from
    :func:`warc_response_record_col`) into ``n_blobs`` deterministic
    multi-record blobs — the (path, content-binary) shape
    :func:`warc_records_from_binary` consumes, standing in for landed
    .warc files when synthesizing framing from a table. Records within
    a blob order by ``id_col`` (one hash agg; each blob bounded by
    rows/n_blobs records). Shared by the oracle entry and the
    clean_corpus example so the framing↔parser contract lives in one
    place."""
    return (
        df.select(
            (F.col(id_col) % n_blobs).alias("__blob_id"),
            F.struct(F.col(id_col), record_col.alias("rec")).alias("__s"),
        )
        .groupBy("__blob_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("__s")), lambda s: s["rec"]
                ),
                "",
            ).alias("__blob_str")
        )
        .select(
            F.concat(
                F.lit(path_prefix), F.col("__blob_id").cast("string")
            ).alias("path"),
            F.col("__blob_str").cast("binary").alias("content"),
        )
    )


def frame_http_response(
    body: bytes,
    *,
    status: int = 200,
    content_type: str = "text/html; charset=utf-8",
) -> bytes:
    """Minimal HTTP/1.1 response envelope — what a WARC ``response``
    record's payload actually is (the parser strips it back off)."""
    return (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("ascii") + body


def _decode(b: bytes) -> str:
    return b.decode("utf-8", errors="replace")


def _parse_http_payload(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """Split an HTTP response envelope: (status, content_type, body).
    Payloads without a plausible envelope come back unchanged."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    sep = payload.find(_HDR_END)
    if sep < 0:
        return None, None, payload
    head, body = payload[:sep], payload[sep + len(_HDR_END):]
    lines = head.split(_CRLF)
    parts = lines[0].split(b" ", 2)
    status = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else None
    ctype = None
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = _decode(v.strip())
    return status, ctype, body


def parse_warc_stream(data: bytes, source: str) -> Iterator[dict]:
    """Frame-split one (decompressed) WARC stream into record dicts —
    the pure-Python core shared by the Spark reader, tests, and the
    oracle entry. Regex-free, single forward scan: find the header
    block, honor ``Content-Length`` exactly (payloads may legally
    contain blank lines and even the literal string ``WARC/1.0`` — a
    delimiter-split reader is WRONG; only the declared length is),
    then skip inter-record padding to the next boundary, flagging
    intervening non-whitespace. Malformed regions emit one
    ``parse_error`` row; a record whose length can't be trusted (bad
    ``Content-Length``) resyncs at the next ``CRLF CRLF + WARC/``
    sequence — the record-final framing — not at a bare ``WARC/``
    magic, which legally occurs INSIDE payloads and would fabricate
    records from payload bytes (best-effort by necessity: without a
    valid length the true boundary is unknowable)."""
    pos, n = 0, len(data)

    def _err(offset: int, msg: str) -> dict:
        return {
            "source_file": source, "record_offset": offset,
            "record_id": None, "warc_type": None, "warc_date": None,
            "target_uri": None, "content_type": None,
            "content_length": None, "http_status": None,
            "http_content_type": None, "payload": None, "text": None,
            "parse_error": msg,
        }

    while pos < n:
        # skip inter-record padding (trailing CRLFs, leading junk)
        start = data.find(_MAGIC, pos)
        if start < 0:
            if data[pos:].strip():
                yield _err(pos, "trailing bytes with no WARC/ magic")
            return
        if data[pos:start].strip():
            yield _err(pos, "garbage before record boundary")
        hdr_end = data.find(_HDR_END, start)
        if hdr_end < 0:
            yield _err(start, "unterminated WARC header block")
            return
        head_lines = data[start:hdr_end].split(_CRLF)
        version = head_lines[0]
        if version not in (b"WARC/1.0", b"WARC/1.1"):
            yield _err(start, f"unsupported version line {version[:20]!r}")
            pos = start + len(_MAGIC)
            continue
        fields: dict[bytes, bytes] = {}
        for ln in head_lines[1:]:
            k, _, v = ln.partition(b":")
            fields[k.strip().lower()] = v.strip()
        body_at = hdr_end + len(_HDR_END)
        clen_raw = fields.get(b"content-length", b"")
        if not clen_raw.isdigit():
            yield _err(start, f"bad Content-Length {clen_raw[:20]!r}")
            # resync at the record-FINAL framing (CRLF CRLF + magic),
            # not a bare magic — payloads legally contain "WARC/1.0"
            nxt = data.find(_HDR_END + _MAGIC, body_at)
            if nxt < 0:
                # the remainder has no recoverable boundary: account
                # for it (one-pass (good, bad) contract — bytes never
                # vanish silently), then stop
                if data[body_at:].strip():
                    yield _err(
                        body_at,
                        "unrecoverable region after bad Content-Length "
                        "(no record-final CRLF CRLF + WARC/ framing)",
                    )
                return
            pos = nxt + len(_HDR_END)
            continue
        clen = int(clen_raw)
        if body_at + clen > n:
            yield _err(start, f"truncated payload (want {clen} bytes)")
            return
        payload = data[body_at:body_at + clen]
        ctype = _decode(fields.get(b"content-type", b"")) or None
        wtype = _decode(fields.get(b"warc-type", b"")) or None
        status, http_ct, body = (None, None, payload)
        if wtype == "response":
            status, http_ct, body = _parse_http_payload(payload)
        yield {
            "source_file": source,
            "record_offset": start,
            "record_id": _decode(fields.get(b"warc-record-id", b"")) or None,
            "warc_type": wtype,
            "warc_date": _decode(fields.get(b"warc-date", b"")) or None,
            "target_uri": _decode(fields.get(b"warc-target-uri", b"")) or None,
            "content_type": ctype,
            "content_length": clen,
            "http_status": status,
            "http_content_type": http_ct,
            "payload": payload,
            "text": _decode(body),
            "parse_error": None,
        }
        pos = body_at + clen


def _maybe_gunzip(data: bytes) -> bytes:
    """Transparent multi-member gzip (the CommonCrawl layout: one gzip
    member per record — GzipFile reads concatenated members)."""
    if data[:2] == _GZIP_MAGIC:
        with gzip.GzipFile(fileobj=io.BytesIO(data)) as fh:
            return fh.read()
    return data


def warc_records_from_binary(
    df: DataFrame,
    *,
    content_col: str = "content",
    path_col: str = "path",
    with_payload: bool = False,
) -> DataFrame:
    """Parse a (path, content-bytes) DataFrame — the ``binaryFile``
    scan shape, or any synthesized framing — into WARC record rows via
    ``mapInPandas`` (Arrow batches; one Python pass per file, O(bytes),
    no regex). Split out so the oracle entry can exercise the EXACT
    production parse on in-memory framing without a filesystem write.
    ``with_payload`` controls whether the raw binary body rides the
    Arrow transfer next to the decoded ``text`` (see module docstring —
    pruning cannot reach inside a mapInPandas schema)."""
    import pandas as pd

    cols = [f.split(" ")[0] for f in WARC_SCHEMA.split(", ")]
    schema = WARC_SCHEMA
    if not with_payload:
        cols = [c for c in cols if c != "payload"]
        schema = ", ".join(
            f for f in WARC_SCHEMA.split(", ") if not f.startswith("payload ")
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for path, blob in zip(pdf[path_col], pdf[content_col]):
                # a truncated/corrupt gzip member must route to the
                # parse_error channel like any malformed region — an
                # unguarded EOFError here would fail the WHOLE job on
                # one partially-downloaded file in an 800-file drop
                try:
                    data = _maybe_gunzip(bytes(blob))
                except (OSError, EOFError, zlib.error) as exc:
                    rows.append({
                        "source_file": str(path), "record_offset": 0,
                        "record_id": None, "warc_type": None,
                        "warc_date": None, "target_uri": None,
                        "content_type": None, "content_length": None,
                        "http_status": None, "http_content_type": None,
                        "payload": None, "text": None,
                        "parse_error": f"gzip decode failed: {exc}",
                    })
                    continue
                for rec in parse_warc_stream(data, str(path)):
                    if not with_payload:
                        rec.pop("payload", None)
                    rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return df.select(
        F.col(path_col).alias(path_col), F.col(content_col).alias(content_col)
    ).mapInPandas(run, schema)


def read_warc_records(
    spark: SparkSession, path: str, *, with_payload: bool = False
) -> DataFrame:
    """Land a WARC/WET drop: ``binaryFile`` scan (one task per file —
    see the module docstring for why that IS the crawl-scale parallel
    unit) → framing parse → one row per record. Filter
    ``parse_error IS NULL`` for the good channel; compose ``text``
    into ``operators.html.extract_html_text`` + the C4 gates. WET
    ``conversion`` records arrive with ``text`` already extracted."""
    scan = spark.read.format("binaryFile").load(path)
    return warc_records_from_binary(scan, with_payload=with_payload)


# binaryFile's fixed schema, needed explicitly because file STREAM
# sources require a user schema (no inference pass on a stream).
_BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def read_warc_stream(
    spark: SparkSession,
    path: str,
    *,
    with_payload: bool = False,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """STREAMING WARC ingest — crawl drops land continuously (a
    CC-MAIN segment appears as ~800 files over hours), so the landed
    source has a streaming form: ``readStream.format("binaryFile")``
    discovers newly-arrived .warc/.warc.gz files, each file is parsed
    once by the SAME ``warc_records_from_binary`` pass the batch
    reader uses (mapInPandas composes onto streaming DataFrames
    unchanged), and the checkpoint makes file pickup exactly-once
    across restarts — new files only, no re-parse of the processed
    backlog. Compose downstream exactly like the batch form
    (extract_html_text → gates → dedup/ANN ingest stores), sink via
    ``foreachBatch`` or any streaming writer with a checkpoint.

    ``max_files_per_trigger`` bounds each micro-batch (one task per
    file — the same file-granularity parallel unit as the batch scan,
    applied per trigger)."""
    reader = spark.readStream.format("binaryFile").schema(
        _BINARY_FILE_SCHEMA
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return warc_records_from_binary(
        reader.load(path), with_payload=with_payload
    )
