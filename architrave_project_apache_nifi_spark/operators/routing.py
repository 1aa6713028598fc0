"""Event routing — the reference's ``RouteOnAttribute`` processor.

Reference: "insert or update" router, strategy ``Route to Property
name`` with EL predicates ``${cdc.event.type:equals('insert')}`` /
``:equals('update')`` (nifi/templates/final_template.xml:1946-1955);
events matching no route are silently dropped (no ``unmatched``
connection in the flow, final_template.xml:7-770).

Spark-first mapping: routes are independent filters over one
DataFrame. Catalyst pushes each predicate to the scan, so N routes cost
N pruned scans of the same columnar file — or, if the upstream is
cached / a single pass is required (streaming), use ``tag_route`` to
materialize the route decision as a column in one pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def route_on_predicates(
    df: DataFrame, routes: dict[str, Column]
) -> dict[str, DataFrame]:
    """One output DataFrame per named route (a row can match several
    routes, exactly like NiFi's route-to-property-name semantics).
    Unmatched rows appear in no output (reference drops them)."""
    return {name: df.filter(pred) for name, pred in routes.items()}


def tag_route(df: DataFrame, routes: dict[str, Column], tag_col: str = "route") -> DataFrame:
    """Single-pass variant: adds ``tag_col`` with the FIRST matching
    route name (NULL if none) — use when the input must be read once
    (e.g. inside a streaming micro-batch)."""
    expr = F.lit(None).cast("string")
    for name, pred in reversed(list(routes.items())):
        expr = F.when(pred, F.lit(name)).otherwise(expr)
    return df.withColumn(tag_col, expr)


def route_cdc_events(df: DataFrame, type_col: str = "type") -> dict[str, DataFrame]:
    """The reference's exact router: ``insert`` and ``update`` routes;
    delete/begin/commit/ddl dropped (README.md:28)."""
    return route_on_predicates(
        df,
        {
            "insert": F.col(type_col) == "insert",
            "update": F.col(type_col) == "update",
        },
    )
