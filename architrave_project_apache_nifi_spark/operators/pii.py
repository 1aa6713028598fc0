"""PII redaction — regex scrubbing of emails / phones / SSNs / credit
cards / IPv4s from a text column (driver-mandated §2.9 family: the
compliance pass every training-data pipeline runs before packing).

Pure ``regexp_replace`` Column chain: JVM-side, codegen, zero UDFs, and
every pattern is written in the common subset of Java regex and RE2 so
the DuckDB oracle replays the identical chain (queries.py pairs it with
``regexp_replace(..., 'g')`` SQL). Order matters — more specific
patterns run first (SSN/card before generic phone) so a later, looser
pattern can't eat a prefix of a more specific match; the chain order is
part of the operator contract and mirrored in the oracle.

At 100 TB this is a map-only operator: no shuffle, streams through the
scan, and composes with any downstream op.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied strictly in order. Patterns
# deliberately use only syntax shared by java.util.regex and RE2:
# char classes, bounded repeats, alternation, \\d, word boundaries.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ssn",
        r"\b\d{3}-\d{2}-\d{4}\b",
        "<SSN>",
    ),
    (
        "credit_card",
        r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b",
        "<CARD>",
    ),
    (
        "ipv4",
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "<IP>",
    ),
    (
        "phone",
        r"\b\d{3}[ .-]\d{3}[ .-]\d{4}\b",
        "<PHONE>",
    ),
)


def redact_pii(text: Column) -> Column:
    """Apply the full redaction chain; replaces ALL occurrences of each
    pattern (Spark ``regexp_replace`` is global; the oracle SQL passes
    the 'g' flag for the same semantics)."""
    out = text
    for _, pattern, replacement in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, replacement)
    return out


def pii_hit_counts(text: Column) -> dict[str, Column]:
    """Per-category match counts (for audit metrics), via the same
    patterns: count = number of non-overlapping matches."""
    return {
        name: F.size(F.regexp_extract_all(text, F.lit(f"({pattern})"), F.lit(1)))
        for name, pattern, _ in PII_PATTERNS
    }
