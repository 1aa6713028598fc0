"""URL normalization + features (driver-mandated extension, SURVEY.md
§2.9): the companion to the HTML/boilerplate stage — crawl pipelines
(C4, CCNet, RefinedWeb §3.1) key dedup, blocklists, and domain mixing
on a CANONICAL url, not the raw crawl string, because the same page
arrives as `HTTP://Example.com:80/a/?utm_source=x#frag` and
`http://example.com/a/`.

Pure Column expressions over the shared Java-regex/RE2 dialect —
map-only, codegen, zero shuffles — so the DuckDB oracle replays the
same chain exactly (queries.py ``url_canonical_dedup``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Query parameters that are tracking noise, never content-addressing
# (Google/Facebook/Microsoft click ids + the utm_*/Mailchimp families).
# Deliberately NOT included: bare `ref` — many real sites use it as a
# content selector (a git ref, a section anchor), so stripping it would
# collapse distinct pages into one canonical URL and dedup them away.
TRACKING_PARAM_PATTERN = (
    r"(?i)&(?:utm_[a-z]+|gclid|fbclid|msclkid|mc_cid|mc_eid)"
    r"=[^&#]*"
)

_SCHEME = r"^[a-zA-Z][a-zA-Z0-9+.-]*://"
_PREFIX = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"
# Non-root, query-less path ending in '/': the [^?#]+ path part keeps
# the rule from firing across a '?' (a slash inside a query VALUE is
# content, not layout). Shared with the DuckDB oracle.
TRAILING_SLASH_PATTERN = r"://[^/?#]+/[^?#]+/$"


def normalize_url(url: Column) -> Column:
    """Canonical form: fragment dropped, tracking params stripped (and
    a then-bare ``?`` with them), scheme+host lowercased with default
    ports removed, trailing slash trimmed off non-root query-less
    paths. Pure map-side expressions.

    Dialect discipline (what lets the DuckDB oracle replay this): no
    regex uses lookaround and every regexp_replace replacement is a
    plain literal — RE2 has no lookahead, and Java (``$1``) and RE2
    (``\\1``) disagree on group-reference syntax, so neither feature
    may appear in a shared chain. Structure edits that need the
    matched text (host lowercasing, port strip) are expressed as
    extract + substr + concat instead.

    Deliberately NOT full RFC 3986 resolution (no %-decoding, no path
    segment ``..`` collapse): those change semantics on hostile input,
    and real pipelines canonicalize exactly this conservative set.
    """
    u = F.trim(url)
    u = F.regexp_replace(u, r"#.*$", "")  # fragment
    # tracking params: applied ONLY to the substring after the first
    # '?' — '&' is a legal path sub-delimiter (RFC 3986 §3.3), so a
    # literal '&utm_x=…' inside a path segment of a query-less URL must
    # survive. Within the query, the sentinel makes every param &-led
    # so ONE pattern covers first/middle/last positions, then unwinds.
    pre_q = F.regexp_extract(u, r"^([^?]*)", 1)
    qs = u.substr(F.length(pre_q) + F.lit(1), F.length(u))
    qs = F.regexp_replace(qs, r"\?", "?&")
    qs = F.regexp_replace(qs, TRACKING_PARAM_PATTERN, "")
    qs = F.regexp_replace(qs, r"\?&", "?")
    qs = F.regexp_replace(qs, r"\?$", "")
    u = F.concat(pre_q, qs)
    # scheme://host[:port] lowercased, default port dropped; the rest
    # of the string (path, case preserved) re-attached via substr
    pref = F.regexp_extract(u, _PREFIX, 1)
    rest = u.substr(F.length(pref) + F.lit(1), F.length(u))
    low = F.lower(pref)
    low = (
        F.when(
            low.startswith("https://") & low.endswith(":443"),
            low.substr(F.lit(1), F.length(low) - F.lit(4)),
        )
        .when(
            low.startswith("http://") & low.endswith(":80"),
            low.substr(F.lit(1), F.length(low) - F.lit(3)),
        )
        .otherwise(low)
    )
    u = F.concat(low, rest)
    # trailing slash off a non-root, query-less path: …/a/ -> …/a
    # (see TRAILING_SLASH_PATTERN for why it can't fire across a '?')
    return F.when(
        u.rlike(TRAILING_SLASH_PATTERN),
        u.substr(F.lit(1), F.length(u) - F.lit(1)),
    ).otherwise(u)


def url_host(url: Column) -> Column:
    """Registrable host portion (userinfo and port excluded),
    lowercased; '' when the string has no scheme://host shape."""
    return F.lower(
        F.regexp_extract(url, _SCHEME + r"(?:[^/?#@]*@)?([^/?#:]*)", 1)
    )


def url_features(
    df: DataFrame, url_col: str, *, out_prefix: str = ""
) -> DataFrame:
    """Attach ``host``, ``path_depth`` (segments in the path),
    ``has_query``, ``is_ip_host`` — the signals URL blocklist/quality
    rules key on. Map-only; composes with ``normalize_url`` upstream."""
    p = out_prefix
    u = F.col(url_col)
    path = F.regexp_extract(u, _SCHEME + r"[^/?#]*(/[^?#]*)", 1)
    return df.select(
        "*",
        url_host(u).alias(f"{p}host"),
        F.size(
            F.filter(F.split(path, "/"), lambda s: s != "")
        ).alias(f"{p}path_depth"),
        u.contains("?").cast("int").alias(f"{p}has_query"),
        url_host(u)
        .rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
        .cast("int")
        .alias(f"{p}is_ip_host"),
    )
