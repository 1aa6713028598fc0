"""WARC/WET landed source (sources/warc.py): framing parse semantics,
Content-Length honoring against delimiter-lookalike payloads, gzip
multi-member files, corrupt-region routing, and the Spark reader."""

from __future__ import annotations

import gzip

from hypothesis import given, settings
from hypothesis import strategies as st

from architrave_project_apache_nifi_spark.sources.warc import (
    frame_http_response,
    frame_warc_record,
    parse_warc_stream,
    read_warc_records,
    warc_records_from_binary,
)

# Hand-written framing, NOT produced by frame_warc_record — pins the
# parser against the spec, not against its own inverse. The payload
# deliberately contains a blank line AND the literal "WARC/1.0": only
# Content-Length may delimit it.
_HOSTILE_BODY = b"line one\r\n\r\nWARC/1.0\r\nnot a real header\r\nend"
_HAND_WARC = (
    b"WARC/1.0\r\n"
    b"WARC-Type: resource\r\n"
    b"WARC-Date: 2026-02-03T04:05:06Z\r\n"
    b"WARC-Record-ID: <urn:uuid:aaaa>\r\n"
    b"WARC-Target-URI: http://h.example/x\r\n"
    b"Content-Type: text/plain\r\n"
    b"Content-Length: " + str(len(_HOSTILE_BODY)).encode() + b"\r\n"
    b"\r\n" + _HOSTILE_BODY + b"\r\n\r\n"
    b"WARC/1.0\r\n"
    b"WARC-Type: conversion\r\n"
    b"WARC-Date: 2026-02-03T04:05:07Z\r\n"
    b"WARC-Record-ID: <urn:uuid:bbbb>\r\n"
    b"WARC-Target-URI: http://h.example/y\r\n"
    b"Content-Type: text/plain\r\n"
    b"Content-Length: 9\r\n"
    b"\r\n"
    b"wet text.\r\n\r\n"
)


def test_hand_written_framing_content_length_delimits():
    recs = list(parse_warc_stream(_HAND_WARC, "hand"))
    assert [r["parse_error"] for r in recs] == [None, None]
    a, b = recs
    assert a["warc_type"] == "resource"
    assert a["payload"] == _HOSTILE_BODY  # blank line + WARC/1.0 inside survived
    assert a["text"] == _HOSTILE_BODY.decode()
    assert a["target_uri"] == "http://h.example/x"
    assert a["record_offset"] == 0
    assert b["warc_type"] == "conversion"
    assert b["text"] == "wet text."
    assert b["record_offset"] > 0


def test_response_record_strips_http_envelope():
    body = "<html><body><p>Hello crawl.</p></body></html>".encode()
    rec = frame_warc_record(
        warc_type="response",
        target_uri="http://e.com/a",
        payload=frame_http_response(body, status=200),
    )
    (r,) = parse_warc_stream(rec, "s")
    assert r["parse_error"] is None
    assert r["http_status"] == 200
    assert r["http_content_type"].startswith("text/html")
    assert r["text"] == body.decode()
    assert r["payload"].startswith(b"HTTP/1.1 200")  # raw kept verbatim


def test_corrupt_regions_route_and_resync():
    good = frame_warc_record(
        warc_type="conversion", target_uri="http://e.com/ok", payload=b"fine."
    )
    bad_len = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\n"
        b"Content-Length: NaN\r\n\r\npayload"
    )
    blob = b"junk-before\r\n" + good + bad_len + b"\r\n\r\n" + good
    recs = list(parse_warc_stream(blob, "s"))
    errs = [r for r in recs if r["parse_error"] is not None]
    oks = [r for r in recs if r["parse_error"] is None]
    assert len(oks) == 2 and all(r["text"] == "fine." for r in oks)
    assert any("garbage" in r["parse_error"] for r in errs)
    assert any("Content-Length" in r["parse_error"] for r in errs)


def test_bad_length_resync_never_fabricates_from_payload():
    """A bad Content-Length must resync at the record-FINAL framing
    (CRLF CRLF + magic), not a bare 'WARC/' — the NEXT record's payload
    legally contains the magic and a delimiter-based resync would
    manufacture parse_error IS NULL rows from payload bytes."""
    bad = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\n"
        b"Content-Length: NaN\r\n\r\n"
        # undelimited payload embedding a full fake record head
        b"prose WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 4"
        b"\r\n\r\nfake"
    )
    good = frame_warc_record(
        warc_type="conversion", target_uri="http://e.com/ok", payload=b"fine."
    )
    recs = list(parse_warc_stream(bad + b"\r\n\r\n" + good, "s"))
    oks = [r for r in recs if r["parse_error"] is None]
    errs = [r for r in recs if r["parse_error"] is not None]
    assert len(oks) == 1 and oks[0]["target_uri"] == "http://e.com/ok"
    assert len(errs) == 1 and "Content-Length" in errs[0]["parse_error"]


def test_bad_length_without_recoverable_boundary_accounts_for_remainder():
    """If no record-final framing follows a bad Content-Length, the
    dropped remainder must still surface as an error row — bytes never
    vanish silently from the (good, bad) accounting."""
    bad = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\n"
        b"Content-Length: NaN\r\n\r\n"
        b"remaining prose with no framing at all"
    )
    recs = list(parse_warc_stream(bad, "s"))
    assert len(recs) == 2
    assert "Content-Length" in recs[0]["parse_error"]
    assert "unrecoverable" in recs[1]["parse_error"]


def test_corrupt_gzip_member_routes_not_fails(spark, tmp_path):
    """One truncated .warc.gz in a drop must yield a parse_error row,
    never fail the job (the one-pass (good, bad) contract)."""
    d = tmp_path / "gz"
    d.mkdir()
    rec = frame_warc_record(
        warc_type="conversion", target_uri="u", payload=b"fine."
    )
    (d / "good.warc.gz").write_bytes(gzip.compress(rec))
    blob = gzip.compress(rec)
    (d / "trunc.warc.gz").write_bytes(blob[: len(blob) // 2])
    out = read_warc_records(spark, str(d) + "/*.warc.gz").collect()
    oks = [r for r in out if r["parse_error"] is None]
    errs = [r for r in out if r["parse_error"] is not None]
    assert len(oks) == 1 and oks[0]["text"] == "fine."
    assert len(errs) == 1 and "gzip" in errs[0]["parse_error"]
    assert errs[0]["source_file"].endswith("trunc.warc.gz")


def test_truncated_payload_routes():
    rec = frame_warc_record(
        warc_type="conversion", target_uri="u", payload=b"0123456789"
    )
    recs = list(parse_warc_stream(rec[:-8], "s"))  # cut inside payload
    assert len(recs) == 1 and "truncated" in recs[0]["parse_error"]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.binary(min_size=0, max_size=200), min_size=1, max_size=6),
    st.booleans(),
)
def test_frame_parse_roundtrip_property(payloads, as_response):
    blob = b"".join(
        frame_warc_record(
            warc_type="response" if as_response else "conversion",
            target_uri=f"http://e.com/{i}",
            payload=frame_http_response(p) if as_response else p,
        )
        for i, p in enumerate(payloads)
    )
    recs = list(parse_warc_stream(blob, "s"))
    assert [r["parse_error"] for r in recs] == [None] * len(payloads)
    for i, (r, p) in enumerate(zip(recs, payloads)):
        assert r["target_uri"] == f"http://e.com/{i}"
        body = r["payload"]
        if as_response:
            assert r["http_status"] == 200
            assert body.endswith(p)
        else:
            assert body == p


def _write_warc_files(tmp_path, *, gz: bool):
    d = tmp_path / ("warc_gz" if gz else "warc")
    d.mkdir()
    for f in range(2):
        members = []
        for i in range(3):
            body = f"<p>Doc {f}-{i} text.</p>".encode()
            rec = frame_warc_record(
                warc_type="response",
                target_uri=f"http://e.com/{f}/{i}",
                payload=frame_http_response(body),
            )
            # CommonCrawl layout: one gzip MEMBER per record
            members.append(gzip.compress(rec) if gz else rec)
        suffix = ".warc.gz" if gz else ".warc"
        (d / f"part-{f}{suffix}").write_bytes(b"".join(members))
    return str(d)


def test_read_warc_records_spark(spark, tmp_path):
    path = _write_warc_files(tmp_path, gz=False)
    out = read_warc_records(spark, path + "/*.warc")
    rows = out.filter("parse_error IS NULL").collect()
    assert len(rows) == 6
    assert {r["target_uri"] for r in rows} == {
        f"http://e.com/{f}/{i}" for f in range(2) for i in range(3)
    }
    assert all(r["http_status"] == 200 for r in rows)
    assert all(r["text"].startswith("<p>Doc") for r in rows)
    assert len({r["source_file"] for r in rows}) == 2


def test_read_warc_records_multimember_gzip(spark, tmp_path):
    path = _write_warc_files(tmp_path, gz=True)
    out = read_warc_records(spark, path + "/*.warc.gz")
    rows = out.collect()
    assert [r["parse_error"] for r in rows] == [None] * 6
    assert {r["target_uri"] for r in rows} == {
        f"http://e.com/{f}/{i}" for f in range(2) for i in range(3)
    }


def test_warc_composes_into_html_gates(spark, tmp_path):
    from pyspark.sql import functions as F

    from architrave_project_apache_nifi_spark.operators.html import (
        extract_html_text,
    )

    path = _write_warc_files(tmp_path, gz=False)
    recs = read_warc_records(spark, path + "/*.warc").filter(
        "parse_error IS NULL AND warc_type = 'response'"
    )
    docs = extract_html_text(
        recs.select("target_uri", F.col("text").alias("html")), "html"
    )
    got = {r["target_uri"]: r["text"] for r in docs.collect()}
    assert got["http://e.com/0/0"] == "Doc 0-0 text."
    assert len(got) == 6


def test_payload_is_opt_in(spark, tmp_path):
    """mapInPandas output schemas can't be pruned by Catalyst, so the
    raw bytes ride the Arrow transfer only when asked for."""
    path = _write_warc_files(tmp_path, gz=False)
    slim = read_warc_records(spark, path + "/*.warc")
    assert "payload" not in slim.columns
    assert slim.count() == 6
    fat = read_warc_records(spark, path + "/*.warc", with_payload=True)
    assert "payload" in fat.columns
    row = fat.filter("target_uri = 'http://e.com/0/0'").collect()[0]
    assert bytes(row["payload"]).startswith(b"HTTP/1.1 200")


def test_streaming_warc_ingest_exactly_once_per_file(spark, tmp_path):
    """read_warc_stream: files arriving across micro-batches parse
    once each through the production pass; a restart on the same
    checkpoint picks up ONLY new files (no backlog re-parse)."""
    import time

    from architrave_project_apache_nifi_spark.sources.warc import (
        read_warc_stream,
    )

    d = tmp_path / "drop"
    d.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def _drop(name, n_recs, tag):
        blob = b"".join(
            frame_warc_record(
                warc_type="response",
                target_uri=f"http://e.com/{tag}/{i}",
                payload=frame_http_response(f"<p>{tag} {i}.</p>".encode()),
            )
            for i in range(n_recs)
        )
        (d / name).write_bytes(blob)

    seen: list = []

    def run_until(done, timeout_s=90):
        q = (
            read_warc_stream(spark, str(d) + "/*.warc", max_files_per_trigger=1)
            .filter("parse_error IS NULL")
            .writeStream.foreachBatch(
                lambda b, _: seen.extend(
                    r["target_uri"] for r in b.select("target_uri").collect()
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)
        q.stop()

    _drop("f0.warc", 2, "a")
    _drop("f1.warc", 3, "b")
    run_until(lambda: len(seen) >= 5)
    assert sorted(seen) == sorted(
        [f"http://e.com/a/{i}" for i in range(2)]
        + [f"http://e.com/b/{i}" for i in range(3)]
    )

    # restart on the same checkpoint with one NEW file: only its
    # records arrive — the processed backlog is never re-parsed
    before = list(seen)
    _drop("f2.warc", 2, "c")
    time.sleep(1.1)  # distinct mtime for the new file
    run_until(lambda: len(seen) >= 7)
    new = seen[len(before):]
    assert sorted(new) == [f"http://e.com/c/{i}" for i in range(2)]
