"""Lookup join — the reference's ``LookupRecord`` +
``DatabaseRecordLookupService`` pair (the only join in the flow).

Reference: per-record JDBC SELECT against the derived table
``(SELECT * FROM sample_data.products_catalog_history WHERE
Is_current='Y') AS current`` keyed ``/ProductID``; the matched row is
embedded whole at ``/resultSet``; records route to ``matched`` /
``unmatched`` (nifi/templates/final_template.xml:3220-3361, service at
:1367-1471, subquery at :1439, result path :3311-3312, routing
:3316-3320).

Spark-first mapping: an index-nested-loop-over-JDBC becomes one
broadcast (or AQE-chosen shuffle) hash join. The hand-written subquery
pushdown becomes a plain ``filter`` that Catalyst pushes into the scan.
The matched/unmatched routes are ``left_semi`` / ``left_anti`` joins —
both shuffle-free when the dimension broadcasts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _keys(key_cols: str | Sequence[str]) -> list[str]:
    return [key_cols] if isinstance(key_cols, str) else list(key_cols)


def lookup_record(
    stream: DataFrame,
    lookup: DataFrame,
    key_cols: str | Sequence[str],
    prefilter: Column | None = None,
    result_col: str = "resultSet",
    broadcast: bool = True,
) -> DataFrame:
    """Left equi-join embedding the entire matched lookup row as a
    struct column (the reference's ``insert-entire-record`` →
    ``/resultSet``). NULL struct == unmatched."""
    keys = _keys(key_cols)
    if prefilter is not None:
        lookup = lookup.filter(prefilter)
    payload = [c for c in lookup.columns if c not in keys]
    packed = lookup.select(
        *keys, F.struct(*[F.col(c) for c in payload]).alias(result_col)
    )
    if broadcast:
        packed = F.broadcast(packed)
    return stream.join(packed, on=keys, how="left")


def lookup_matched(
    stream: DataFrame,
    lookup: DataFrame,
    key_cols: str | Sequence[str],
    prefilter: Column | None = None,
    broadcast: bool = True,
) -> DataFrame:
    """The ``matched`` route: rows having a lookup hit (``left_semi``)."""
    keys = _keys(key_cols)
    if prefilter is not None:
        lookup = lookup.filter(prefilter)
    dim = lookup.select(*keys)
    if broadcast:
        dim = F.broadcast(dim)
    return stream.join(dim, on=keys, how="left_semi")


def lookup_unmatched(
    stream: DataFrame,
    lookup: DataFrame,
    key_cols: str | Sequence[str],
    prefilter: Column | None = None,
    broadcast: bool = True,
) -> DataFrame:
    """The ``unmatched`` route (``left_anti``) — the path V9 wired to a
    LogAttribute and the final flow dropped (SURVEY.md §2.6)."""
    keys = _keys(key_cols)
    if prefilter is not None:
        lookup = lookup.filter(prefilter)
    dim = lookup.select(*keys)
    if broadcast:
        dim = F.broadcast(dim)
    return stream.join(dim, on=keys, how="left_anti")
