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

from .dialects import SqlDialect, dialect_for_url


def write_history(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write the SCD2 history store. Partitioned by ``is_current`` so
    that ``scd2_current`` reads prune to the 'Y' partition; at 100 TB
    add a key-bucket subpartition (``.bucketBy``) via a metastore table."""
    df.write.mode(mode).partitionBy("is_current").parquet(path)


def read_history(
    spark: SparkSession, path: str, as_of: int | None = None
) -> DataFrame:
    """Read a history table: either the incremental manifest-committed
    store the streaming sink writes (streaming/history_store.py) or a
    plain (optionally partitioned) parquet directory from
    ``write_history``. ``as_of`` time-travels to a retained snapshot
    sequence number (store only; see ``Scd2Store.snapshots``)."""
    from ..streaming.history_store import Scd2Store

    store = Scd2Store(path)
    if store.exists():
        if as_of is not None:
            return store.read_snapshot(spark, as_of)
        return store.read_all(spark)
    if as_of is not None:
        raise ValueError(f"{path} is not a snapshot-retaining store")
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


def jdbc_append_transactional(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str],
    staging_table: str | None = None,
    batchsize: int = 100,
    batch_id: int | None = None,
) -> int:
    """All-or-nothing JDBC append — PutSQL's ``Support Fragmented
    Transactions = true`` (final_template.xml:2284 block), which plain
    ``jdbc_append`` lacks: Spark's JDBC writer commits per partition, so
    a mid-job failure can leave the target with SOME partitions' rows.

    Two-phase, same protocol as the ``json_audit`` custom sink
    (pyds_sink.py) with the staging table playing the temp-files role
    and one atomic SQL statement playing the manifest flip:

    1. executors write ``df`` to a staging table in parallel (partial
       staging data after a crash is invisible to readers of the target
       and is overwritten by the next attempt);
    2. the driver finalizes with ONE ``INSERT INTO target SELECT … FROM
       staging`` — a single statement, atomic in any SQL database: the
       target gains all rows or none;
    3. staging is dropped (best-effort: a failed drop must not mask the
       committed append — the next attempt overwrites staging anyway).

    Within ONE invocation the append is all-or-nothing, but a RETRY of a
    crashed invocation (e.g. a replayed ``foreachBatch``) would run the
    finalize again and duplicate the batch. Pass ``batch_id`` for
    exactly-once across retries: the finalize and an insert into
    ``<table>_commits (batch_id BIGINT PRIMARY KEY)`` share one JDBC
    transaction, so a replayed id is a no-op (returns 0) and a crash
    between finalize and marker rolls both back together.

    Returns rows appended."""
    staging = staging_table or f"{table}_stage_append"
    cols = df.columns
    (
        df.write.mode("overwrite")
        .option("batchsize", str(batchsize))
        .jdbc(url, staging, properties=properties)
    )
    # Spark's JDBC writer quotes staging identifiers (case-sensitive);
    # target identifiers are used verbatim as the caller wrote them.
    quoted = ", ".join(f'"{c}"' for c in cols)
    sql = (  # noqa: S608 — identifiers come from the caller, not user data
        f"INSERT INTO {table} ({', '.join(cols)}) SELECT {quoted} FROM {staging}"
    )
    spark = df.sparkSession
    try:
        if batch_id is None:
            return execute_sql(spark, url, sql, properties)
        markers = f"{table}_commits"
        try:
            execute_sql(
                spark, url,
                f"CREATE TABLE {markers} (batch_id BIGINT PRIMARY KEY)",
                properties,
            )
        except Exception:  # noqa: BLE001 — already-exists is expected
            pass
        return _execute_marked_commit(
            spark, url, properties, sql, markers, int(batch_id)
        )
    finally:
        try:
            execute_sql(spark, url, f"DROP TABLE {staging}", properties)
        except Exception:  # noqa: BLE001 — stale staging is harmless;
            pass  # raising here would mask a committed append as failure


def _execute_txn(
    spark: SparkSession,
    url: str,
    properties: dict[str, str],
    statements: Sequence[str],
    markers: str | None = None,
    batch_id: int | None = None,
) -> list[int]:
    """Run ``statements`` in ONE JDBC transaction on the driver: all
    commit together or all roll back. With ``markers``/``batch_id``,
    the commit-marker insert joins the same transaction — a replayed id
    is a no-op (returns all zeros), the markers PRIMARY KEY rejects a
    concurrent double-commit, and a crash between any statement and the
    marker rolls everything back together. Returns per-statement update
    counts."""
    jvm = spark._jvm  # type: ignore[attr-defined]
    if "user" in properties:
        conn = jvm.java.sql.DriverManager.getConnection(
            url, properties["user"], properties.get("password", "")
        )
    else:
        conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        conn.setAutoCommit(False)
        stmt = conn.createStatement()
        try:
            if markers is not None and batch_id is not None:
                rs = stmt.executeQuery(
                    f"SELECT COUNT(*) FROM {markers} WHERE batch_id = {batch_id}"
                )
                rs.next()
                if rs.getInt(1) > 0:
                    conn.rollback()
                    return [0] * len(statements)  # replayed batch
            counts = [stmt.executeUpdate(sql) for sql in statements]
            if markers is not None and batch_id is not None:
                stmt.executeUpdate(
                    f"INSERT INTO {markers} (batch_id) VALUES ({batch_id})"
                )
            conn.commit()
            return counts
        except Exception:
            conn.rollback()
            raise
        finally:
            stmt.close()
    finally:
        conn.close()


def _execute_marked_commit(
    spark: SparkSession,
    url: str,
    properties: dict[str, str],
    insert_sql: str,
    markers: str,
    batch_id: int,
) -> int:
    """Finalize + commit-marker insert in ONE JDBC transaction: replayed
    batch ids are no-ops; the markers PRIMARY KEY also rejects a
    concurrent double-commit of the same id."""
    return _execute_txn(
        spark, url, properties, [insert_sql], markers, batch_id
    )[0]


def execute_sql(spark: SparkSession, url: str, sql: str,
                properties: dict[str, str] | None = None) -> int:
    """Run one DDL/DML statement on the target database from the driver
    JVM (java.sql over py4j — works with any driver jar on the Spark
    classpath). Returns the update count."""
    jvm = spark._jvm  # type: ignore[attr-defined]
    props = properties or {}
    if "user" in props:
        conn = jvm.java.sql.DriverManager.getConnection(
            url, props["user"], props.get("password", "")
        )
    else:
        conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        stmt = conn.createStatement()
        try:
            return stmt.executeUpdate(sql)
        finally:
            stmt.close()
    finally:
        conn.close()


def jdbc_update(
    df: DataFrame,
    url: str,
    table: str,
    key_cols: Sequence[str],
    set_cols: Sequence[str],
    properties: dict[str, str],
    staging_table: str | None = None,
    dialect: "SqlDialect | None" = None,
) -> int:
    """PutDatabaseRecord UPDATE path (statement-type=UPDATE, update-keys
    ProductID, max batch 1000 — FT:4699/4736/4764). Spark's JDBC sink has
    no UPDATE mode; the reference's per-row ``executeBatch`` shape would
    serialize 100 TB of updates through row-at-a-time JDBC. Instead:

    1. executors write ``df`` to a **staging table** in parallel
       (``df.write.jdbc`` — batched INSERTs, one connection per
       partition);
    2. the driver issues ONE set-based ``UPDATE … WHERE EXISTS`` joining
       staging onto the target — the database applies it as a join, not
       N statements;
    3. staging is dropped.

    Unlike the reference (which UPDATEs every history row of the key —
    Bug 1, README.md:186), callers pass the full intended key, e.g.
    ``("ProductID", "valid_from")``. Returns rows updated.

    STAGING IS KEY-UNIQUE BY CONTRACT (ADVICE r5): with duplicate
    staging keys the two dialects diverge — Derby's correlated scalar
    subquery raises at execution, MySQL's ``UPDATE … JOIN`` silently
    applies an arbitrary duplicate — and the MySQL side is untestable
    by construction. So the contract is enforced HERE, before either
    statement runs: exact duplicate rows are dropped (harmless — same
    values either way), and conflicting duplicates (same key,
    different set values) raise a ValueError naming an offending key.
    The uniqueness probe is one map-side-combined agg + limit(1) over
    the batch-sized update set — same bounded-eager-job precedent as
    scd2_apply's broadcast sizing."""
    spark = df.sparkSession
    staging = staging_table or f"{table}_stage"
    # persist: the probe and the staging write must see ONE evaluation
    # of the input lineage — nondeterministic lineage (rand(), a source
    # re-read) could otherwise pass the probe and still stage
    # conflicting keys, re-opening the divergence the probe closes
    # (and expensive lineage would be computed twice)
    stage_df = df.select(*set_cols, *key_cols).dropDuplicates().persist()
    try:
        dup = (
            stage_df.groupBy(*key_cols)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            key_repr = ", ".join(f"{k}={dup[0][k]!r}" for k in key_cols)
            raise ValueError(
                f"jdbc_update: conflicting staging rows for key ({key_repr}) — "
                "multiple distinct value tuples for one update key. The "
                "set-based UPDATE contract requires key-unique staging "
                "(Derby would raise mid-statement, MySQL would silently pick "
                "one). Deduplicate upstream (e.g. keep the latest version per "
                "key) or extend key_cols with a discriminating column."
            )
        stage_df.write.mode("overwrite").jdbc(
            url, staging, properties=properties
        )
    finally:
        stage_df.unpersist()
    # dialect seam (sources/dialects.py): Derby = portable correlated
    # UPDATE (the executed-in-tests form), MySQL = multi-table
    # UPDATE … JOIN; auto-detected from the URL unless passed.
    d = dialect or dialect_for_url(url)
    sql = d.update_from_staging(table, staging, key_cols, set_cols)
    try:
        return execute_sql(spark, url, sql, properties)
    finally:
        execute_sql(spark, url, f"DROP TABLE {staging}", properties)


def jdbc_scd2_commit(
    changes: DataFrame,
    url: str,
    table: str,
    key_cols: str | Sequence[str],
    ts_col: str,
    properties: dict[str, str],
    order_cols: Sequence[str] = (),
    tombstone_col: str | None = None,
    batch_id: int | None = None,
    dialect: "SqlDialect | None" = None,
) -> tuple[int, int]:
    """The reference's ENTIRE update path — expire the previously-
    current row (PutDatabaseRecord UPDATE, final_template.xml:4646-4797)
    AND insert the new version rows (PutSQL INSERT, FT:2220-2321) — as
    ONE atomic database transaction.

    In the reference these are two independent sinks racing on the same
    table: a reader between Task 1 and Task 2 sees a key with two
    current rows or none, and a crash between them strands the
    half-applied state (SURVEY.md §2.8 bugs 2-3). Here the race and the
    torn state are impossible by construction:

    1. executors stage, in parallel, (a) the per-key first-change
       summary — one row per touched key: the expire predicate — and
       (b) the batch's chained new versions (``scd2_build`` over the
       batch: the multi-update-per-key Bug 1 fix);
    2. the driver runs expire-UPDATE + version-INSERT in one JDBC
       transaction (``_execute_txn``): readers see the history jump
       atomically from pre-batch to post-batch; any failure rolls BOTH
       back;
    3. with ``batch_id``, the commit marker joins the same transaction
       → exactly-once under foreachBatch replay.

    Returns ``(rows_expired, rows_inserted)``; ``(0, 0)`` on a replayed
    ``batch_id``. Scale shape: both staged writes are parallel batched
    INSERTs (small — proportional to the micro-batch, never the
    history); the UPDATE is one set-based statement the database
    executes as a join against staging.

    Single-writer per target table (like the reference's one NiFi
    flow, and like the parquet store's manifest): the fixed staging
    table names mean two concurrent committers to the same ``table``
    would clobber each other's staging — serialize batches per table
    (foreachBatch already does)."""
    from ..operators.scd2 import scd2_build

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    spark = changes.sparkSession
    stage_x = f"{table}_stage_expire"
    stage_i = f"{table}_stage_insert"

    first_change = changes.groupBy(*keys).agg(
        F.min(ts_col).alias("first_change_ts")
    )
    new_versions = scd2_build(
        changes, keys, ts_col, order_cols, tombstone_col=tombstone_col,
        # micro-batch-sized input (foreachBatch) — skip the auto
        # detection job; the JDBC write is the bottleneck here anyway
        skew_protection=False,
    )

    first_change.write.mode("overwrite").jdbc(url, stage_x, properties=properties)
    new_versions.write.mode("overwrite").jdbc(url, stage_i, properties=properties)

    # dialect seam (sources/dialects.py): expire/insert statements per
    # target database; Derby's forms are the live-tested ones
    d = dialect or dialect_for_url(url)
    expire_sql = d.expire_update(table, stage_x, keys)
    insert_sql = d.insert_from_staging(table, stage_i, new_versions.columns)

    markers = None
    if batch_id is not None:
        markers = f"{table}_commits"
        try:
            execute_sql(
                spark, url,
                f"CREATE TABLE {markers} (batch_id BIGINT PRIMARY KEY)",
                properties,
            )
        except Exception:  # noqa: BLE001 — already-exists is expected
            pass
    try:
        n_exp, n_ins = _execute_txn(
            spark, url, properties, [expire_sql, insert_sql], markers, batch_id
        )
        return n_exp, n_ins
    finally:
        for stg in (stage_x, stage_i):
            try:
                execute_sql(spark, url, f"DROP TABLE {stg}", properties)
            except Exception:  # noqa: BLE001 — stale staging is harmless;
                pass  # raising would mask a committed merge as failure
