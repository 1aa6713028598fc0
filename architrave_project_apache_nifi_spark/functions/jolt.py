"""Jolt JSON-transform equivalents.

The reference uses three Jolt operations (SURVEY.md §2.3):

- ``shift`` with ``@(value)``/``@(1,name)`` — pivot a
  ``columns: [{name, value}, …]`` array into a flat object
  (final_template.xml:5161-5173 insert route, :2675-2688 update route);
- ``default`` — add SCD2 columns if absent (:5286-5315, :2532-2560);
- ``modify-overwrite-beta`` — overwrite fields (:2402-2419, :3545-3552).

All three map to native Column expressions; the array pivot uses
``map_from_entries(transform(...))`` which stays JVM-side and inside
whole-stage codegen (no JSON round-trip, unlike the reference which
re-parses content at every processor hop).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shift_pivot(
    df: DataFrame,
    array_col: str,
    keys: Sequence[str],
    name_field: str = "name",
    value_field: str = "value",
    keep: Sequence[str] = (),
    types: Mapping[str, str] | None = None,
) -> DataFrame:
    """The flatten shift: pivot ``array<struct<name,value>>`` into one
    column per ``keys`` entry (reference "Transform to Flat JSON" /
    "grab the new row"). ``keep`` = passthrough columns; ``types`` =
    optional per-key cast (the reference stays weakly typed — strings —
    until MySQL coerces; we pin types, SURVEY.md §1.3).
    """
    m = F.map_from_entries(
        F.transform(
            F.col(array_col),
            lambda c: F.struct(
                c[name_field].alias("key"), c[value_field].alias("value")
            ),
        )
    )
    cols = [F.col(k) for k in keep]
    for key in keys:
        c = m[key]
        if types and key in types:
            c = c.cast(types[key])
        cols.append(c.alias(key))
    return df.select(*cols)


def default(df: DataFrame, defaults: Mapping[str, Column]) -> DataFrame:
    """Jolt ``default``: set a column only when it does not already
    exist (Jolt defaults don't clobber present keys)."""
    out = df
    existing = {c.lower() for c in df.columns}
    for name, value in defaults.items():
        if name.lower() not in existing:
            out = out.withColumn(name, value)
    return out


def modify_overwrite(df: DataFrame, exprs: Mapping[str, Column]) -> DataFrame:
    """Jolt ``modify-overwrite-beta``: unconditional column overwrite."""
    out = df
    for name, value in exprs.items():
        out = out.withColumn(name, value)
    return out
