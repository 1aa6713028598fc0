"""EL and Jolt function-layer parity (SURVEY.md §2.3)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.functions import el, jolt


def test_el_to_number_is_epoch_millis(spark):
    df = spark.createDataFrame([(dt.datetime(2024, 1, 1, 0, 0, 0),)], "ts TIMESTAMP")
    out = df.select(el.to_number(F.col("ts")).alias("n")).collect()[0]
    assert out.n == 1704067200000  # NiFi toNumber() = millis, not seconds


def test_el_format_default_pattern(spark):
    df = spark.createDataFrame([(dt.datetime(2024, 1, 2, 3, 4, 5),)], "ts TIMESTAMP")
    out = df.select(el.format(F.col("ts")).alias("s")).collect()[0]
    assert out.s == "2024-01-02 03:04:05"


def test_el_roundtrip_and_equals(spark):
    df = spark.createDataFrame([("insert", 1704067200000)], "t STRING, ms LONG")
    out = df.select(
        el.equals(F.col("t"), "insert").alias("eq"),
        el.format(el.from_number(F.col("ms"))).alias("s"),
    ).collect()[0]
    assert out.eq is True
    assert out.s == "2024-01-01 00:00:00"


def test_el_interpolate(spark):
    df = spark.createDataFrame([(9014,)], "ProductID INT")
    out = df.select(
        el.interpolate(
            "*********** failed to write ${id} ***********", id=F.col("ProductID")
        ).alias("msg")
    ).collect()[0]
    assert out.msg == "*********** failed to write 9014 ***********"


def test_jolt_default_does_not_clobber(spark):
    df = spark.createDataFrame([("Y",)], "is_current STRING")
    out = jolt.default(
        df,
        {"is_current": F.lit("SHOULD_NOT_APPEAR"), "valid_until": F.lit(None).cast("timestamp")},
    )
    row = out.collect()[0]
    assert row.is_current == "Y"
    assert row.valid_until is None


def test_jolt_modify_overwrite(spark):
    df = spark.createDataFrame([("Y", 1.0)], "Is_current STRING, Price DOUBLE")
    out = jolt.modify_overwrite(df, {"Is_current": F.lit("N")}).collect()[0]
    assert out.Is_current == "N"


def test_jolt_shift_pivot(spark):
    df = spark.createDataFrame(
        [
            ([{"name": "ProductID", "value": "7"}, {"name": "Price", "value": "9.5"}],),
        ],
        "columns ARRAY<STRUCT<name STRING, value STRING>>",
    )
    out = jolt.shift_pivot(
        df, "columns", ["ProductID", "Price"], types={"ProductID": "int", "Price": "double"}
    ).collect()[0]
    assert out.ProductID == 7 and out.Price == 9.5


def test_sketch_distinct_error_bound(spark):
    """HLL++ at rsd=0.02 must land within 10% of the exact distinct
    count on the test data (the sketch query has no SQL oracle — this
    bounds its error instead)."""
    from architrave_project_apache_nifi_spark.queries import REGISTRY

    rows = REGISTRY["sketch_approx_aggs"].fn(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.exact_users > 0
        assert abs(r.approx_users - r.exact_users) / r.exact_users <= 0.10


def test_sketch_percentile_brackets_exact(spark):
    """approx_percentile's [p50, p99] must bracket sanely: within the
    observed min/max and ordered."""
    from architrave_project_apache_nifi_spark.queries import REGISTRY
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    got = {
        r.event_type: r.approx_p50_p99
        for r in REGISTRY["sketch_approx_aggs"].fn(spark, sf).collect()
    }
    bounds = {
        r.event_type: (r.lo, r.hi)
        for r in spark.read.parquet(f"{sf}/events.parquet")
        .groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for et, (p50, p99) in got.items():
        lo, hi = bounds[et]
        assert lo <= p50 <= p99 <= hi
