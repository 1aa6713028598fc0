"""Interop closure: engine changesets serialize into the reference's
CDC envelope JSON and round-trip through the engine's own
parse → flatten path unchanged — so a snapshot-shipping source can
FEED the reference flow (or this engine's streaming SCD2) with
byte-shaped CaptureChangeMySQL events."""

from __future__ import annotations

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.functions.jolt import shift_pivot
from architrave_project_apache_nifi_spark.operators.snapshot_diff import (
    snapshot_diff,
)
from architrave_project_apache_nifi_spark.sources.cdc import (
    parse_envelope,
    to_envelope,
)


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, name string, price double")


def test_diff_to_envelope_round_trip(spark):
    old = _snap(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)])
    new = _snap(spark, [(1, "a", 1.0), (2, "B", 2.5), (4, "d", 4.0)])
    diff = snapshot_diff(old, new, "k").withColumn("snapshot_ts", F.lit(777))

    env = to_envelope(
        diff, ["k"], ["name", "price"],
        database="db", table_name="t",
    )
    parsed = parse_envelope(env)
    back = shift_pivot(
        parsed,
        "columns",
        ("k", "name", "price"),
        keep=("type", "timestamp"),
        types={"k": "bigint", "price": "double"},
    )
    rows = {r["k"]: r for r in back.collect()}
    assert rows[2]["type"] == "update" and rows[2]["name"] == "B"
    assert rows[2]["price"] == 2.5 and rows[2]["timestamp"] == 777
    assert rows[3]["type"] == "delete" and rows[3]["name"] == "c"
    assert rows[4]["type"] == "insert" and rows[4]["price"] == 4.0


def test_envelope_shape_matches_reference_contract(spark):
    old = _snap(spark, [(1, "a", 1.0)])
    new = _snap(spark, [(1, "a", 9.0)])
    diff = snapshot_diff(old, new, "k").withColumn("snapshot_ts", F.lit(5))
    env = to_envelope(diff, ["k"], ["name", "price"]).collect()[0]["value"]
    import json

    d = json.loads(env)
    assert d["type"] == "update"
    assert d["database"] == "sample_data"
    assert d["table_name"] == "products_catalog"
    assert isinstance(d["cdc_sequence_id"], int)
    assert [c["name"] for c in d["columns"]] == ["k", "name", "price"]
    assert all(set(c) == {"id", "name", "value", "last_value"} for c in d["columns"])


def test_null_values_survive(spark):
    old = _snap(spark, [(1, "x", 1.0)])
    new = _snap(spark, [(1, None, 1.0)])
    diff = snapshot_diff(old, new, "k").withColumn("snapshot_ts", F.lit(1))
    parsed = parse_envelope(to_envelope(diff, ["k"], ["name", "price"]))
    back = shift_pivot(
        parsed, "columns", ("k", "name", "price"),
        keep=("type",), types={"k": "bigint", "price": "double"},
    ).collect()[0]
    assert back["name"] is None and back["price"] == 1.0
