"""File-format sources beyond parquet: CSV and JSON-lines readers with
pinned schemas and a queryable corrupt-line side channel, plus the
matching writers.

The reference's only file-ish ingress is JSON-over-CDC
(FT:4368 CaptureChangeMySQL emits JSON; nifi JsonTreeReader infers
per-record schemas — SURVEY.md §1.4). A standalone engine needs the
general form: land CSV/JSONL drops with an EXPLICIT schema (inference
is a full extra pass over the data at 100 TB and produces
non-deterministic types) and route unparseable lines to a queryable
side-channel instead of failing the job (the LogMessage/LogAttribute
parity — SURVEY.md §2.5).

Implementation note: both readers go through ``spark.read.text`` +
``from_csv`` / ``from_json`` rather than the direct csv/json file
scans. Two reasons, both load-bearing:

1. Spark disallows querying ONLY the internal ``_corrupt_record``
   column of a raw file scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
   RECORD_COLUMN) — the documented workaround is caching the whole
   parse, which is exactly the wrong contract at 100 TB. Parsing a
   text column has no such restriction, and each of the (good, bad)
   branches re-reads + re-parses its own column-pruned scan instead
   of pinning the corpus in executor memory.
2. The bad channel gets the RAW LINE verbatim (the text column),
   which is strictly more useful for triage than the corrupt-column
   echo of the file scan.

Text reads of uncompressed files still split by byte range, so one
huge file fans out across executors exactly like the native reader.

Both readers return (good, bad): ``good`` carries the pinned schema;
``bad`` is (raw_line, source_file) — the same contract as
``cdc.parse_envelope_with_errors``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType([*schema.fields, StructField(CORRUPT_COL, StringType())])


def _split_good_bad(
    lines: DataFrame, parsed: F.Column, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    df = lines.select(
        F.col("value"), F.input_file_name().alias("source_file"), parsed.alias("e")
    )
    ok = F.col("e").isNotNull() & F.col(f"e.{CORRUPT_COL}").isNull()
    good = df.filter(ok).select(*[f"e.{n}" for n in schema.fieldNames()])
    bad = df.filter(~ok).select(
        F.col("value").alias("raw_line"), F.col("source_file")
    )
    return good, bad


def read_csv_table(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    delimiter: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """CSV with a pinned schema; returns (good, bad). A line is bad if
    it fails type coercion or arity. With ``header=True`` any line
    exactly matching the schema's header is dropped (per-file headers
    of a multi-file drop included — text reads don't track line
    numbers, and matching the header string is deterministic)."""
    full = _with_corrupt(schema)
    lines = spark.read.text(path)
    if header:
        hdr = delimiter.join(schema.fieldNames())
        lines = lines.filter(F.col("value") != hdr)
    # from_csv wants a DDL schema string; build it from the StructType.
    ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in full.fields)
    parsed = F.from_csv(
        F.col("value"),
        F.lit(ddl),
        {
            "mode": "PERMISSIVE",
            "columnNameOfCorruptRecord": CORRUPT_COL,
            "delimiter": delimiter,
        },
    )
    return _split_good_bad(lines, parsed, schema)


def read_jsonl_table(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines with a pinned schema; same (good, bad) contract. A
    line is bad if it is unparseable OR any declared field fails type
    coercion (PERMISSIVE fills the corrupt column; the whole raw line
    is routed)."""
    full = _with_corrupt(schema)
    lines = spark.read.text(path)
    parsed = F.from_json(
        F.col("value"),
        full,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    return _split_good_bad(lines, parsed, schema)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", header).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str], max_records_per_file: int = 0
) -> None:
    """Hive-style partitioned parquet layout — the lake-landing shape
    downstream scans prune by directory. ``maxRecordsPerFile`` caps
    file size without an extra repartition job."""
    w = df.write.mode("overwrite").partitionBy(*partition_cols)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def read_orc_table(spark, path: str, schema: StructType) -> DataFrame:
    """ORC landed source with a pinned schema — the third columnar
    lake format next to parquet (primary) and CSV/JSONL (text drops).
    ORC scans get the same predicate pushdown / column pruning /
    vectorized read path as parquet in Spark, so every downstream
    plan-shape guarantee in this engine holds unchanged; the explicit
    schema keeps types deterministic (no footer-inference drift when a
    producer widens a column between drops — schema_compat gates that
    instead)."""
    return spark.read.schema(schema).orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)
