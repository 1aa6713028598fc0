"""Multi-table CDC demux: one envelope stream feeds per-table SCD2
stores with per-table schemas; unrouted tables drop; replay converges."""

from __future__ import annotations

import datetime as dt
import json
import os

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.sources.cdc import (
    read_envelope_stream,
)
from architrave_project_apache_nifi_spark.streaming.history_store import (
    Scd2Store,
)
from architrave_project_apache_nifi_spark.streaming.multi_table import (
    TableSpec,
    run_multi_table_scd2_stream,
)


def _env(seq, table, etype, cols):
    base = dt.datetime(2023, 9, 27, 10, 0, 0)
    return {
        "type": etype,
        "timestamp": int((base + dt.timedelta(minutes=seq)).timestamp() * 1000),
        "database": "sample_data",
        "table_name": table,
        "cdc_sequence_id": seq,
        "columns": [
            {"id": i + 1, "name": k, "value": None if v is None else str(v)}
            for i, (k, v) in enumerate(cols.items())
        ],
    }


_EVENTS = [
    _env(1, "products", "insert", {"ProductID": 1, "Price": 10.0}),
    _env(2, "customers", "insert", {"CustID": 7, "Tier": "gold"}),
    _env(3, "products", "update", {"ProductID": 1, "Price": 12.0}),
    _env(4, "customers", "update", {"CustID": 7, "Tier": "silver"}),
    _env(5, "orphans", "insert", {"X": 1}),  # unrouted → dropped
]

_SPECS = {
    "products": TableSpec(
        columns=("ProductID", "Price"),
        key="ProductID",
        types={"ProductID": "int", "Price": "double"},
    ),
    "customers": TableSpec(
        columns=("CustID", "Tier"), key="CustID", types={"CustID": "int"}
    ),
}


def _write_events(path, events):
    os.makedirs(path, exist_ok=True)
    fp = os.path.join(path, "events.json")
    with open(fp, "w") as fh:
        for e in events:
            fh.write(json.dumps(e) + "\n")


def test_demux_routes_each_table_to_its_own_store(spark, tmp_path):
    src, root, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "stores"),
        str(tmp_path / "ckpt"),
    )
    _write_events(src, _EVENTS)
    stream = read_envelope_stream(spark, src)
    q = run_multi_table_scd2_stream(spark, stream, root, _SPECS, ckpt)
    q.awaitTermination(120)

    prod = Scd2Store(root + "/products", key_col="ProductID").read_all(spark)
    rows = sorted(
        (r["Price"], r["is_current"]) for r in prod.collect()
    )
    assert rows == [(10.0, "N"), (12.0, "Y")]

    cust = Scd2Store(root + "/customers", key_col="CustID").read_all(spark)
    crows = sorted((r["Tier"], r["is_current"]) for r in cust.collect())
    assert crows == [("gold", "N"), ("silver", "Y")]
    # Each store's schema is its own table's columns.
    assert "Tier" in cust.columns and "CustID" in cust.columns
    assert "CustID" not in prod.columns and "Price" in prod.columns

    # The unrouted 'orphans' table produced no store.
    assert not os.path.exists(root + "/orphans")


def test_demux_restart_consumes_only_new_files(spark, tmp_path):
    src, root, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "stores"),
        str(tmp_path / "ckpt"),
    )
    _write_events(src, _EVENTS[:2])
    stream = read_envelope_stream(spark, src)
    q = run_multi_table_scd2_stream(spark, stream, root, _SPECS, ckpt)
    q.awaitTermination(120)

    _write_events(src + "/more", [])  # no-op dir; real new file below
    with open(os.path.join(src, "events2.json"), "w") as fh:
        for e in _EVENTS[2:4]:
            fh.write(json.dumps(e) + "\n")
    stream2 = read_envelope_stream(spark, src)
    q2 = run_multi_table_scd2_stream(spark, stream2, root, _SPECS, ckpt)
    q2.awaitTermination(120)

    prod = Scd2Store(root + "/products", key_col="ProductID").read_all(spark)
    assert sorted(r["Price"] for r in prod.collect()) == [10.0, 12.0]
    cur = prod.filter(F.col("is_current") == "Y").collect()
    assert len(cur) == 1 and cur[0]["Price"] == 12.0
