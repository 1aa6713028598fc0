"""Bucketed co-located joins (operators/bucketing.py): the join over two
same-bucketed tables must plan with ZERO Exchange operators — the scale
property the module exists for — and return the same rows as the plain
join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators import bucketing as bk
from architrave_project_apache_nifi_spark.plans.inspect import formatted_plan
from architrave_project_apache_nifi_spark.tables import load

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_no_exchange_and_correct(spark, no_broadcast):
    events = load(spark, "events", SF_DIR)
    users = (
        events.groupBy("user_id").agg(F.round(F.sum("value"), 2).alias("total"))
    )
    bk.write_bucketed(events.select("user_id", "event_id", "value"),
                      "ev_bucketed", "user_id", n_buckets=4)
    bk.write_bucketed(users, "usr_bucketed", "user_id", n_buckets=4)
    try:
        joined = bk.bucketed_join(spark, "ev_bucketed", "usr_bucketed", "user_id")
        plan = formatted_plan(joined)
        assert "Exchange" not in plan, plan  # co-located: no shuffle either side
        assert "SortMergeJoin" in plan, plan

        plain = (
            events.select("user_id", "event_id", "value")
            .join(users, "user_id")
            .count()
        )
        assert joined.count() == plain
    finally:
        spark.sql("DROP TABLE IF EXISTS ev_bucketed")
        spark.sql("DROP TABLE IF EXISTS usr_bucketed")


def test_bucketed_agg_skips_shuffle(spark, no_broadcast):
    """A groupBy on the bucket key also rides the existing layout —
    no Exchange before the aggregate."""
    events = load(spark, "events", SF_DIR)
    bk.write_bucketed(events.select("user_id", "value"), "ev_b2", "user_id", 4)
    try:
        agg = spark.table("ev_b2").groupBy("user_id").agg(F.sum("value"))
        assert "Exchange" not in formatted_plan(agg)
    finally:
        spark.sql("DROP TABLE IF EXISTS ev_b2")


def test_write_sorted_ranges_disjoint_and_sorted(spark, tmp_path):
    """write_sorted's physical contract: per-file key ranges are
    pairwise DISJOINT (range partitioning) and rows inside each file
    are sorted — exactly the layout parquet min/max row-group pruning
    needs."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from architrave_project_apache_nifi_spark.operators.bucketing import (
        write_sorted,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = str(tmp_path / "sorted")
    write_sorted(events, ["ts"], out, n_partitions=8)

    per_file = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"), F.count("*").alias("n"))
        .collect()
    )
    assert len(per_file) > 1
    spans = sorted((r.lo, r.hi) for r in per_file)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: {(lo1, hi1)} vs {(lo2, hi2)}"
    # within-file sortedness: ts equals its sorted self per file
    unsorted = (
        spark.read.parquet(out)
        .withColumn("f", F.input_file_name())
        .withColumn(
            "prev",
            F.lag("ts").over(
                Window.partitionBy("f").orderBy(F.monotonically_increasing_id())
            ),
        )
        .filter(F.col("prev") > F.col("ts"))
        .count()
    )
    assert unsorted == 0


def test_compact_parquet_dir_rows_exact_fewer_files(spark, tmp_path):
    """Compaction: many tiny files fold to few, rows byte-exact, and
    the verify step protects the original on mismatch."""
    from pyspark.sql import functions as F

    from architrave_project_apache_nifi_spark.operators.bucketing import (
        compact_parquet_dir,
    )

    path = str(tmp_path / "frag")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.repartition(40).write.parquet(path)
    import glob

    before_files = len(glob.glob(path + "/*.parquet"))
    assert before_files >= 30
    before = sorted(
        (r.event_id, r.user_id) for r in spark.read.parquet(path).collect()
    )

    n_after = compact_parquet_dir(spark, path, target_mb=128)
    assert n_after < before_files
    after = sorted(
        (r.event_id, r.user_id) for r in spark.read.parquet(path).collect()
    )
    assert after == before
    # sorted variant keeps rows and produces range-disjoint layout
    n2 = compact_parquet_dir(spark, path, target_mb=1, sort_cols=["ts"])
    assert sorted(
        (r.event_id, r.user_id) for r in spark.read.parquet(path).collect()
    ) == before
    assert n2 >= 1
