"""Bucketed tables: co-located, shuffle-free joins (100 TB design
surface; SURVEY.md §4.1 "Partitioning / shuffle").

The reference is single-node and serial — every lookup is a remote
point SELECT. At cluster scale the equivalent repeated join (facts ⋈
current-rows, events ⋈ user dim) must not re-shuffle 100 TB per query:
writing both sides bucketed by the join key makes Spark plan a
sort-merge join over the EXISTING bucket layout — zero Exchange on
either side (asserted in tests/test_bucketing.py). The bucket count is
the write-time parallelism contract; pick it for target-cluster cores
(e.g. 4× executor count) — it cannot be changed without a rewrite, so
it is the one physical knob worth over-provisioning.
"""

from __future__ import annotations

import glob
import math
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and bucket-sorted) by
    ``key``. Sorting inside buckets lets the sort-merge join skip its
    sort too — the join degenerates to a zip of pre-sorted bucket files."""
    w = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. Catalyst sees
    matching ``HashPartitioning(key, n)`` output partitionings and drops
    both Exchanges; with sorted buckets, both Sorts too."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
    sort_cols: list[str] | None = None,
) -> int:
    """Small-files maintenance for a plain parquet directory — the
    generic sibling of the SCD2 store's ``compact_closed``: streaming
    sinks and per-batch appends accumulate thousands of tiny files,
    and at 100 TB the scan's file-listing + per-file open overhead
    dominates long before the bytes do.

    Rewrites the directory to ``ceil(bytes / target_mb)`` files
    (optionally re-sorting via :func:`write_sorted`'s layout), then
    swaps it in with a verify-then-rename protocol:

    1. write compacted data to a sibling temp dir (readers of ``path``
       see nothing);
    2. VERIFY the compacted row count equals the source (a failed or
       torn write raises here — the original is untouched);
    3. rename original → trash, temp → original, delete trash. The
       two renames are the only non-atomic window; a crash between
       them leaves the data intact under the trash name (documented
       single-writer maintenance op, same assumption as the store).

    POSIX-rename semantics assumed (local/HDFS). On object stores,
    where directory rename is copy+delete, use the manifest-committed
    store (streaming/history_store.py) whose commit is a file replace,
    or a table format's rewrite operation — this helper is for the
    plain-directory case only.

    Returns the number of files after compaction."""
    files = glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    if not files:
        raise ValueError(f"{path} has no parquet files to compact")
    total_bytes = sum(os.path.getsize(f) for f in files)
    n = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))
    src = spark.read.parquet(path)
    expected = src.count()

    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    if sort_cols:
        write_sorted(src, sort_cols, tmp, n_partitions=n)
    else:
        src.repartition(n).write.mode("overwrite").parquet(tmp)
    got = spark.read.parquet(tmp).count()
    if got != expected:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compaction row mismatch ({got} != {expected}); original kept"
        )
    trash = f"{path.rstrip('/')}__trash_{uuid.uuid4().hex[:8]}"
    os.rename(path, trash)
    os.rename(tmp, path)
    shutil.rmtree(trash)
    return len(glob.glob(os.path.join(path, "*.parquet")))


def write_sorted(
    df: DataFrame,
    order_cols: list[str],
    path: str,
    n_partitions: int | None = None,
) -> None:
    """Range-partitioned, sorted-within-partition parquet layout — the
    write-side half of scan-time min/max pruning (the poor man's
    clustering / Z-order for a single sort dimension).

    ``repartitionByRange`` samples the keys and assigns globally
    DISJOINT ranges to partitions; ``sortWithinPartitions`` orders rows
    inside each file. Every parquet row group then carries tight
    min/max stats on the sort key, so a later scan with a range filter
    skips whole row groups / files — the layout does the pruning, no
    index needed. One range-exchange at write time buys every future
    read; at 100 TB this is the difference between scanning a time
    slice and scanning the table (pair with a partitionBy(date) dir
    level for coarse pruning + this for fine)."""
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .write.mode("overwrite")
        .parquet(path)
    )
