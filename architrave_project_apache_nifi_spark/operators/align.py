"""Column aligner — the reference's record/column reconciliation.

Reference: ``ConvertJSONToSQL`` / ``PutDatabaseRecord`` reconcile JSON
field names against table columns case-insensitively with
``Translate Field Names = true``, ``Unmatched Field Behavior = Ignore
Unmatched Fields``, ``Unmatched Column Behavior = Fail on Unmatched
Columns`` (nifi/templates/final_template.xml:1843-1856).

Applied before every sink write (sinks.py) so the engine keeps the
reference's write-contract while being strongly typed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def align_to_schema(
    df: DataFrame,
    target: StructType,
    case_insensitive: bool = True,
    ignore_unmatched_fields: bool = True,
    fail_on_unmatched_columns: bool = True,
) -> DataFrame:
    """Rename/cast/reorder ``df`` columns to ``target``.

    - case-insensitive name match (Translate Field Names);
    - extra input columns dropped (Ignore Unmatched Fields) or error;
    - missing target columns error (Fail on Unmatched Columns) or NULL.
    """
    index = {
        (c.lower() if case_insensitive else c): c for c in df.columns
    }
    out = []
    missing = []
    for field in target.fields:
        key = field.name.lower() if case_insensitive else field.name
        src = index.pop(key, None)
        if src is None:
            missing.append(field.name)
            out.append(F.lit(None).cast(field.dataType).alias(field.name))
        else:
            out.append(F.col(src).cast(field.dataType).alias(field.name))
    if missing and fail_on_unmatched_columns:
        raise ValueError(f"unmatched target columns: {missing}")
    if index and not ignore_unmatched_fields:
        raise ValueError(f"unmatched input fields: {sorted(index.values())}")
    return df.select(*out)


# ---------------------------------------------------------------------------
# Schema compatibility (data-contract checking for evolving sources)
# ---------------------------------------------------------------------------

# Safe implicit widenings: reading old data with the new type loses
# nothing. Anything else (drops, narrowings, type flips) is breaking.
_WIDENINGS: dict[str, tuple[str, ...]] = {
    # keys/values are Spark DataType.simpleString() names
    "tinyint": ("smallint", "int", "bigint", "float", "double", "decimal"),
    "smallint": ("int", "bigint", "float", "double", "decimal"),
    "int": ("bigint", "float", "double", "decimal"),
    "bigint": ("float", "double", "decimal"),
    "float": ("double",),
    "date": ("timestamp",),
}


def schema_compat(old: StructType, new: StructType) -> dict:
    """Classify a schema change the way a data contract needs:

    - ``added``: columns only in ``new`` (non-breaking — readers of the
      old schema ignore them; nullable backfill on old rows);
    - ``widened``: same column, type widened along a safe implicit
      path (non-breaking);
    - ``dropped``: columns only in ``old`` (BREAKING);
    - ``narrowed_or_changed``: same column, incompatible type change
      (BREAKING);
    - ``breaking``: convenience bool.

    Name matching is case-insensitive (the engine's reconciliation
    convention, see ``align_to_schema``). Nested struct/array types
    compare by exact equality — partial nested evolution is a
    ``narrowed_or_changed`` until explicitly migrated."""
    o = {f.name.lower(): f for f in old.fields}
    n = {f.name.lower(): f for f in new.fields}
    added = sorted(k for k in n if k not in o)
    dropped = sorted(k for k in o if k not in n)
    widened, changed = [], []
    for k in sorted(set(o) & set(n)):
        ot, nt = o[k].dataType.simpleString(), n[k].dataType.simpleString()
        if ot == nt:
            continue
        base_ot = ot.split("(")[0]
        base_nt = nt.split("(")[0]
        if base_nt in _WIDENINGS.get(base_ot, ()):
            widened.append(k)
        else:
            changed.append(k)
    return {
        "added": added,
        "dropped": dropped,
        "widened": widened,
        "narrowed_or_changed": changed,
        "breaking": bool(dropped or changed),
    }


def assert_compatible(old: StructType, new: StructType) -> dict:
    """Raise with a precise message on a breaking change; return the
    report otherwise — the gate a landing pipeline calls before
    accepting a source's new schema version."""
    rep = schema_compat(old, new)
    if rep["breaking"]:
        raise ValueError(
            "breaking schema change: "
            f"dropped={rep['dropped']} narrowed_or_changed={rep['narrowed_or_changed']}"
        )
    return rep
