"""CDC envelope parse → route → flatten → SCD2 path (reference DAG,
SURVEY.md §2.6) in batch, plus the lookup join and column aligner."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType, StringType, StructField, StructType

from architrave_project_apache_nifi_spark.operators.align import align_to_schema
from architrave_project_apache_nifi_spark.operators.lookup import (
    lookup_matched,
    lookup_record,
    lookup_unmatched,
)
from architrave_project_apache_nifi_spark.operators.routing import route_cdc_events
from architrave_project_apache_nifi_spark.operators.scd2 import scd2_build, scd2_current
from architrave_project_apache_nifi_spark.sources import cdc


def _events_df(spark):
    raw = spark.createDataFrame(
        [(json.dumps(e),) for e in cdc.golden_scenario_events()], "value STRING"
    )
    return cdc.parse_envelope(raw)


def test_parse_envelope_schema(spark):
    df = _events_df(spark)
    assert df.count() == 8
    assert set(df.columns) == {
        "type", "timestamp", "database", "table_name", "cdc_sequence_id", "columns",
    }


def test_route_drops_noninsert_nonupdate(spark):
    routes = route_cdc_events(_events_df(spark))
    assert set(routes) == {"insert", "update"}
    assert routes["insert"].count() == 3
    assert routes["update"].count() == 2
    # delete/begin/commit dropped — reference has no route for them
    total = routes["insert"].count() + routes["update"].count()
    assert total == 5


def test_flatten_pivots_and_types(spark):
    routes = route_cdc_events(_events_df(spark))
    flat = cdc.flatten_events(routes["insert"])
    row = flat.filter(F.col("ProductID") == 9014).collect()[0]
    assert row.Price == 56.0 and isinstance(row.Price, float)
    assert row.ProductName == "fancy pants"
    assert str(row.Launch_date) == "2023-08-01"


def test_end_to_end_golden_scd2(spark):
    """Full reference semantics on the F4 fixture: 5 history rows, 9014
    with three chained versions (multi-update bug fixed)."""
    events = _events_df(spark)
    changes = (
        cdc.flatten_events(events.filter(F.col("type").isin("insert", "update")))
        .withColumn("change_ts", F.timestamp_millis(F.col("timestamp")))
    )
    hist = scd2_build(changes, "ProductID", "change_ts", ("cdc_sequence_id",))
    assert hist.count() == 5
    v9014 = hist.filter(F.col("ProductID") == 9014).orderBy("valid_from").collect()
    assert [r.Price for r in v9014] == [56.0, 100.0, 120.0]
    assert [r.is_current for r in v9014] == ["N", "N", "Y"]
    assert v9014[0].valid_until == v9014[1].valid_from
    assert v9014[1].valid_until == v9014[2].valid_from
    cur = scd2_current(hist)
    assert cur.count() == 3  # 9012, 9013, 9014


def test_lookup_record_embeds_result_struct(spark):
    stream = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k INT, v STRING")
    dim = spark.createDataFrame(
        [(1, "Y", 10.0), (2, "N", 20.0)], "k INT, is_current STRING, price DOUBLE"
    )
    out = lookup_record(
        stream, dim, "k", prefilter=F.col("is_current") == "Y"
    ).collect()
    by_k = {r.k: r.resultSet for r in out}
    assert by_k[1].price == 10.0          # matched, embedded whole
    assert by_k[2] is None                # filtered out by Is_current='Y'
    assert by_k[3] is None                # no row at all
    assert lookup_matched(stream, dim, "k", F.col("is_current") == "Y").count() == 1
    assert lookup_unmatched(stream, dim, "k", F.col("is_current") == "Y").count() == 2


def test_align_to_schema_reconciles_case_and_extras(spark):
    df = spark.createDataFrame([("1", "x", 5.0)], "productid STRING, EXTRA STRING, PRICE DOUBLE")
    target = StructType(
        [StructField("ProductID", IntegerType()), StructField("Price", DoubleType())]
    )
    out = align_to_schema(df, target)
    assert out.columns == ["ProductID", "Price"]
    row = out.collect()[0]
    assert row.ProductID == 1 and row.Price == 5.0
    # missing target column fails (Fail on Unmatched Columns)
    target2 = StructType([StructField("Nope", StringType())])
    try:
        align_to_schema(df, target2)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_parse_envelope_with_errors_routes_bad_records(spark, tmp_path):
    """Malformed envelope JSON goes to the bad side-channel (LogMessage
    failure route), never silently nulls into the good stream."""
    from architrave_project_apache_nifi_spark.sources import sinks
    from architrave_project_apache_nifi_spark.sources.cdc import (
        golden_scenario_events,
        parse_envelope_with_errors,
    )

    good_json = json.dumps(golden_scenario_events()[0])
    raw = spark.createDataFrame(
        [(good_json,), ("{not json at all",), (None,)], "value STRING"
    )
    good, bad = parse_envelope_with_errors(raw)
    assert good.count() == 1
    assert good.first().table_name == "products_catalog"
    bad_rows = bad.collect()
    assert [r.raw_payload for r in bad_rows] == ["{not json at all"]
    sinks.write_failures(bad, str(tmp_path / "bad"), reason="envelope_parse_error")
    back = spark.read.parquet(str(tmp_path / "bad")).collect()
    assert back[0].failure_reason == "envelope_parse_error"


def test_kafka_source_contract(spark, tmp_path):
    """The Kafka CDC variant (production live-connector shape,
    final_template.xml:4277): read_envelope_kafka_stream must build a
    streaming DataFrame with the envelope schema. With the real
    connector on the classpath it runs against ``format("kafka")``;
    on this sandbox (no jar, no network) the SAME function runs
    against the contract-identical loopback format — either way the
    contract is asserted, never skipped."""
    from architrave_project_apache_nifi_spark.sources import kafka_loopback

    try:
        stream = cdc.read_envelope_kafka_stream(spark, "localhost:9092", "cdc")
    except Exception as exc:  # noqa: BLE001
        assert "kafka" in str(exc).lower()  # standard missing-source error
        kafka_loopback.register(spark)
        broker = str(tmp_path / "broker")
        kafka_loopback.produce(
            broker, "cdc", json.dumps(cdc.golden_scenario_events()[0])
        )
        stream = cdc.read_envelope_kafka_stream(
            spark, broker, "cdc", fmt=kafka_loopback.FORMAT_NAME
        )
    assert stream.isStreaming
    assert set(cdc.CDC_ENVELOPE_SCHEMA.fieldNames()) <= set(stream.columns)


def test_kafka_loopback_matches_kafka_record_contract(spark, tmp_path):
    """The loopback's batch read returns column-for-column the Kafka
    source's record schema, with keyed messages stably partitioned and
    per-partition monotone offsets."""
    from architrave_project_apache_nifi_spark.sources import kafka_loopback as kl

    kl.register(spark)
    broker = str(tmp_path / "broker")
    for i, e in enumerate(cdc.golden_scenario_events()):
        kl.produce(
            broker, "cdc", json.dumps(e), key=f"k{i % 3}", n_partitions=2
        )
    df = (
        spark.read.format(kl.FORMAT_NAME)
        .option("kafka.bootstrap.servers", broker)
        .option("subscribe", "cdc")
        .load()
    )
    assert df.schema == kl.KAFKA_RECORD_SCHEMA
    rows = df.collect()
    assert len(rows) == 8
    # same key -> same partition; offsets dense per partition
    by_key = {}
    for r in rows:
        by_key.setdefault(bytes(r.key), set()).add(r.partition)
    assert all(len(parts) == 1 for parts in by_key.values())
    for p in {r.partition for r in rows}:
        offs = sorted(r.offset for r in rows if r.partition == p)
        assert offs == list(range(len(offs)))
    # values round-trip to the envelope JSON
    parsed = cdc.parse_envelope(df.select(F.col("value").cast("string")))
    assert parsed.count() == 8
    by_type = {
        r.type: r.n
        for r in parsed.groupBy("type").agg(F.count("*").alias("n")).collect()
    }
    assert by_type == {
        "insert": 3, "update": 2, "delete": 1, "begin": 1, "commit": 1,
    }


def test_kafka_loopback_starting_offsets_latest(spark, tmp_path):
    """startingOffsets=latest must skip the backlog present at stream
    start and deliver only messages produced afterwards — the Kafka
    semantics a tail-consumer relies on."""
    import time

    from architrave_project_apache_nifi_spark.sources import kafka_loopback as kl

    kl.register(spark)
    broker = str(tmp_path / "broker")
    kl.produce(broker, "cdc", "backlog-1")
    kl.produce(broker, "cdc", "backlog-2")
    out = str(tmp_path / "out")
    stream = (
        spark.readStream.format(kl.FORMAT_NAME)
        .option("kafka.bootstrap.servers", broker)
        .option("subscribe", "cdc")
        .option("startingOffsets", "latest")
        .load()
        .select(F.col("value").cast("string").alias("v"))
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline and not q.recentProgress:
            time.sleep(0.2)
        kl.produce(broker, "cdc", "live-1")
        deadline = time.monotonic() + 60

        def _vals():
            try:
                return sorted(r.v for r in spark.read.parquet(out).collect())
            except Exception:
                return []

        while time.monotonic() < deadline and _vals() != ["live-1"]:
            time.sleep(0.3)
    finally:
        q.stop()
    assert _vals() == ["live-1"], "latest must see only post-start messages"


def test_kafka_loopback_batch_writer_roundtrip(spark, tmp_path):
    """Batch sink: keyed rows land in their hash partition and read
    back byte-identical through the source."""
    from architrave_project_apache_nifi_spark.sources import kafka_loopback as kl

    kl.register(spark)
    broker = str(tmp_path / "broker")
    df = spark.createDataFrame(
        [("k1", "v-one"), ("k2", "v-two"), (None, "v-unkeyed")],
        "key STRING, value STRING",
    )
    (
        df.write.format(kl.FORMAT_NAME)
        .option("kafka.bootstrap.servers", broker)
        .option("topic", "t")
        .option("npartitions", "2")
        .mode("append")
        .save()
    )
    back = (
        spark.read.format(kl.FORMAT_NAME)
        .option("kafka.bootstrap.servers", broker)
        .option("subscribe", "t")
        .load()
    )
    vals = sorted(bytes(r.value).decode() for r in back.collect())
    assert vals == ["v-one", "v-two", "v-unkeyed"]
    assert back.filter("key IS NULL").first().partition == 0
