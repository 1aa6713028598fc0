"""URL canonicalization semantics (operators/urls.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.urls import (
    normalize_url,
    url_features,
    url_host,
)


def _norm(spark, *urls: str) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    return [r["n"] for r in df.select(normalize_url(F.col("u")).alias("n")).collect()]


def test_equivalent_variants_collapse(spark):
    got = _norm(
        spark,
        "HTTP://News.Example.com/en/a/7?id=7",
        "http://news.example.com:80/en/a/7?id=7#frag",
        "http://NEWS.example.COM/en/a/7?utm_source=feed&id=7",
        "http://news.example.com/en/a/7?id=7&utm_campaign=x",
    )
    assert set(got) == {"http://news.example.com/en/a/7?id=7"}


def test_default_port_and_trailing_slash(spark):
    got = _norm(
        spark,
        "https://News.Example.com:443/en/b/7/",
        "https://news.example.com/en/b/7",
        "https://example.com:8443/x",  # non-default port kept
        "http://example.com/",  # root slash stays
    )
    assert got[0] == got[1] == "https://news.example.com/en/b/7"
    assert got[2] == "https://example.com:8443/x"
    assert got[3] == "http://example.com/"


def test_tracking_params_only_query_drops_entirely(spark):
    (a, b, c) = _norm(
        spark,
        "http://e.com/p?utm_source=x",
        "http://e.com/p?utm_source=x&fbclid=abc",
        "http://e.com/p?keep=1&gclid=zzz&also=2",
    )
    assert a == "http://e.com/p"
    assert b == "http://e.com/p"
    assert c == "http://e.com/p?keep=1&also=2"


def test_path_case_preserved_host_lowered(spark):
    (got,) = _norm(spark, "HTTPS://WWW.Site.ORG/Path/To/File.HTML")
    assert got == "https://www.site.org/Path/To/File.HTML"


def test_idempotent(spark):
    urls = [
        "HTTP://News.Example.com:80/en/a/7/?utm_source=x#f",
        "https://example.com/",
        "not a url at all",
    ]
    once = _norm(spark, *urls)
    twice = _norm(spark, *once)
    assert once == twice


def test_non_url_strings_pass_through_sanely(spark):
    got = _norm(spark, "not a url at all", "")
    assert got[0] == "not a url at all"
    assert got[1] == ""


def test_url_features(spark):
    df = spark.createDataFrame(
        [
            (1, "https://news.example.com/en/a/7?id=7"),
            (2, "http://10.0.0.1/x"),
            (3, "https://user@site.com:8080/a/b/c"),
        ],
        "id long, url string",
    )
    rows = {r["id"]: r for r in url_features(df, "url").collect()}
    assert rows[1]["host"] == "news.example.com"
    assert rows[1]["path_depth"] == 3
    assert rows[1]["has_query"] == 1
    assert rows[1]["is_ip_host"] == 0
    assert rows[2]["is_ip_host"] == 1 and rows[2]["path_depth"] == 1
    assert rows[3]["host"] == "site.com"  # userinfo and port excluded
    assert rows[3]["has_query"] == 0


def test_url_host_edge_shapes(spark):
    df = spark.createDataFrame(
        [("ftp://Files.Example.net/a",), ("no-scheme.com/a",)], "u string"
    )
    got = [r["h"] for r in df.select(url_host(F.col("u")).alias("h")).collect()]
    assert got[0] == "files.example.net"
    assert got[1] == ""  # contract: no scheme -> no host claim


def test_trailing_slash_never_fires_inside_query_values(spark):
    # a slash ending a query VALUE is content, not path layout
    got = _norm(
        spark,
        "http://e.com/search?path=/docs/",
        "http://e.com/a/b/?x=1",  # path slash BEFORE query also kept
    )
    assert got[0] == "http://e.com/search?path=/docs/"
    assert got[1] == "http://e.com/a/b/?x=1"


def test_tracking_shaped_path_segment_survives(spark):
    # '&' is a legal path sub-delimiter (RFC 3986 §3.3): a query-less
    # URL with a literal '&utm_b=1/c' in its PATH must pass through
    # untouched — the tracking strip applies only after the first '?'
    got = _norm(
        spark,
        "http://e.com/a&utm_b=1/c",
        "http://e.com/a&gclid=x/deep?utm_source=f&id=2",
    )
    assert got[0] == "http://e.com/a&utm_b=1/c"
    assert got[1] == "http://e.com/a&gclid=x/deep?id=2"


def test_ref_param_is_content_addressing_and_kept(spark):
    # bare ?ref= selects content on many sites (a git ref, a section);
    # stripping it would dedup distinct pages together
    (a, b) = _norm(
        spark,
        "https://site.com/tree?ref=main",
        "https://site.com/tree?ref=release-1.0",
    )
    assert a != b
    assert a.endswith("?ref=main")
