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
