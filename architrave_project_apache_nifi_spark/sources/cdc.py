"""CDC envelope source — the reference's ``CaptureChangeMySQL``.

Reference (nifi/templates/final_template.xml:4110-4382): streams MySQL
binlog row events as JSON, one event per FlowFile, starting with a full
snapshot (``retrieve-all-records=true``, FT:4321); begin/commit/DDL flow
in-band (FT:4325-4331) and are dropped by the router; binlog position is
kept in a DistributedMapCache (FT:1519).

Spark-first mapping: a (file/Kafka) stream of envelope JSON parsed with
``from_json`` against a pinned StructType (FIXTURES.md F3); the snapshot
is the initial file listing; the binlog-position state is the streaming
checkpoint. No custom DataSourceV2 needed — the envelope is plain JSON.
"""

from __future__ import annotations

import datetime as dt
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.jolt import shift_pivot

# FIXTURES.md F3; column structs carry old values (`last_value`) on
# update events — the reference's shift takes only `value` (new values).
CDC_ENVELOPE_SCHEMA = StructType(
    [
        StructField("type", StringType()),
        StructField("timestamp", LongType()),  # epoch millis
        StructField("database", StringType()),
        StructField("table_name", StringType()),
        StructField("cdc_sequence_id", LongType()),
        StructField(
            "columns",
            ArrayType(
                StructType(
                    [
                        StructField("id", IntegerType()),
                        StructField("name", StringType()),
                        StructField("value", StringType()),
                        StructField("last_value", StringType()),
                    ]
                )
            ),
        ),
    ]
)

# products_catalog columns + types (FIXTURES.md F1,
# mysql/sql-scripts/03-create-table.sql.txt:1-16).
PRODUCT_KEYS = (
    "ProductID",
    "ProductName",
    "ProductBrand",
    "Target_Gender",
    "Price",
    "Currency",
    "Description",
    "Launch_date",
    "Loaded_at",
)
PRODUCT_TYPES = {
    "ProductID": "int",
    "Price": "double",
    "Launch_date": "date",
    "Loaded_at": "date",
}


def parse_envelope(raw: DataFrame, json_col: str = "value") -> DataFrame:
    """Parse a column of envelope JSON strings into typed columns."""
    return raw.select(
        F.from_json(F.col(json_col), CDC_ENVELOPE_SCHEMA).alias("e")
    ).select("e.*")


def parse_envelope_with_errors(
    raw: DataFrame, json_col: str = "value"
) -> tuple[DataFrame, DataFrame]:
    """Like :func:`parse_envelope`, but routes malformed input to a bad
    -records DataFrame instead of silently nulling it. Parsing runs
    PERMISSIVE with a ``_corrupt_record`` column — the Spark-native
    corrupt-row channel — so even partially-parseable garbage is
    flagged, not absorbed as an all-null struct. Returns ``(good,
    bad)``; feed ``bad`` to ``sinks.write_failures`` — the LogMessage
    failure route (final_template.xml:738, :4031-4099) made queryable."""
    schema_with_corrupt = StructType(
        [*CDC_ENVELOPE_SCHEMA.fields, StructField("_corrupt_record", StringType())]
    )
    parsed = raw.select(
        F.col(json_col).alias("_raw"),
        F.from_json(
            F.col(json_col),
            schema_with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("e"),
    )
    ok = F.col("e").isNotNull() & F.col("e._corrupt_record").isNull()
    good = parsed.filter(ok).select("e.*").drop("_corrupt_record")
    bad = parsed.filter(~ok & F.col("_raw").isNotNull()).select(
        F.col("_raw").alias("raw_payload")
    )
    return good, bad


def flatten_events(events: DataFrame, keep: tuple[str, ...] = ("type", "timestamp", "cdc_sequence_id")) -> DataFrame:
    """The reference's first transform: pivot the ``columns`` array into
    flat, typed product columns ("Transform to Flat JSON",
    final_template.xml:5161-5173). The Jolt ``[#1]`` 1-element array
    wrap has no equivalent here (it is immediately unwrapped by the
    ``$.[0]`` EvaluateJsonPath downstream, final_template.xml:3434-3435).
    """
    return shift_pivot(
        events,
        "columns",
        PRODUCT_KEYS,
        keep=keep,
        types=PRODUCT_TYPES,
    )


def read_envelope_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based CDC stream: each line one envelope JSON (the
    reference's 1-event-per-FlowFile, final_template.xml:4298-4301).
    Offset tracking (which files are consumed) lives in the query's
    checkpoint — the DistributedMapCache equivalent."""
    reader = spark.readStream.schema(CDC_ENVELOPE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def read_envelope_batch(spark: SparkSession, path: str) -> DataFrame:
    """Batch read of the same files (the snapshot path)."""
    return spark.read.schema(CDC_ENVELOPE_SCHEMA).json(path)


def read_envelope_socket_stream(
    spark: SparkSession, host: str, port: int
) -> DataFrame:
    """Network CDC stream: one envelope JSON per line over a TCP socket —
    the live-connector shape of ``CaptureChangeMySQL`` (a push feed from
    the binlog endpoint, final_template.xml:4110-4382, host/port at
    :4277) without a database in the loop. Everything downstream is the
    same pluggable merge (``run_scd2_stream_from``); swapping in a Kafka
    topic is ``format("kafka")`` + the same ``parse_envelope`` on the
    value column. Spark's socket source is dev-grade (no offset replay)
    — production uses the replayable file/Kafka/custom-DataSource
    variants; this proves the source-agnostic contract over a real
    network boundary."""
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    return parse_envelope(raw, "value")


def read_envelope_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    fmt: str = "kafka",
) -> DataFrame:
    """Kafka CDC stream: envelope JSON per record value — the production
    shape of ``CaptureChangeMySQL``'s live feed (binlog →
    Debezium-style producer → topic; reference host/port at
    final_template.xml:4277, snapshot-then-stream at :4321). Offsets
    live in the streaming checkpoint (the DistributedMapCache
    equivalent, FT:1519), so a restarted query resumes exactly where it
    stopped — including mid-topic.

    Requires the ``spark-sql-kafka`` connector on the classpath (ship
    ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark
    version>``); without it Spark raises its standard missing-data-source
    error at stream start. Key ordering note: the merge sorts on
    (``timestamp``, ``cdc_sequence_id``) per key, so a topic partitioned
    by primary key (the usual CDC layout) preserves correctness even
    across partition rebalances.

    ``fmt`` swaps the wire format for a contract-identical stand-in —
    ``sources.kafka_loopback`` (same columns, option names, and offset
    semantics; bootstrap_servers is its broker-log directory) — which
    is how the e2e tests drive this exact function on a sandbox with no
    connector jar. Everything from the returned DataFrame on is
    byte-for-byte the production path."""
    raw = (
        spark.readStream.format(fmt)
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_envelope(raw.select(F.col("value").cast("string")), "value")


# ---------------------------------------------------------------------------
# Deterministic fixture generator — FIXTURES.md F4 golden scenario
# (the reference's manual README.md:271-307 test as data).
# ---------------------------------------------------------------------------

_SEED_ROWS = {
    9012: dict(ProductName="Casual Shirts", ProductBrand="Ralph Lauren",
               Target_Gender="Male", Price=106.0, Currency="Euro",
               Description="comfy", Launch_date="2023-07-17"),
    9013: dict(ProductName="Tees", ProductBrand="Gucci",
               Target_Gender="Female", Price=77.0, Currency="Euro",
               Description="", Launch_date="2023-07-15"),
    9014: dict(ProductName="fancy pants", ProductBrand="Hugo Boss",
               Target_Gender="Female", Price=56.0, Currency="Euro",
               Description="Created with love", Launch_date="2023-08-01"),
}


def _envelope(seq: int, etype: str, pid: int | None, price: float | None = None) -> dict:
    base = dt.datetime(2023, 9, 27, 10, 0, 0)
    ts = int((base + dt.timedelta(minutes=seq)).timestamp() * 1000)
    cols = None
    if pid is not None:
        row = dict(_SEED_ROWS[pid])
        if price is not None:
            row["Price"] = price
        row["ProductID"] = pid
        row["Loaded_at"] = "2023-09-27"
        cols = [
            {"id": i + 1, "name": k, "value": None if v is None else str(v)}
            for i, (k, v) in enumerate(row.items())
        ]
    return {
        "type": etype,
        "timestamp": ts,
        "database": "sample_data",
        "table_name": "products_catalog",
        "cdc_sequence_id": seq,
        "columns": cols,
    }


def golden_scenario_events() -> list[dict]:
    """FIXTURES.md F4: 2 snapshot inserts, 1 insert, 2 updates to the
    same key (exercises the reference's multiple-update bug,
    README.md:186), 1 delete + begin/commit to be dropped."""
    return [
        _envelope(1, "insert", 9012),
        _envelope(2, "insert", 9013),
        _envelope(3, "insert", 9014),            # price 56.00
        _envelope(4, "update", 9014, price=100.0),
        _envelope(5, "update", 9014, price=120.0),
        _envelope(6, "delete", 9013),
        _envelope(7, "begin", None),
        _envelope(8, "commit", None),
    ]


def write_golden_scenario(path: str, files: int = 1) -> list[str]:
    """Write the F4 events as JSON-lines file(s) for batch/stream reads.
    ``files>1`` splits events across files (stream micro-batch replay)."""
    os.makedirs(path, exist_ok=True)
    events = golden_scenario_events()
    out = []
    per = max(1, (len(events) + files - 1) // files)
    for i in range(0, len(events), per):
        fp = os.path.join(path, f"events_{i:04d}.json")
        with open(fp, "w") as fh:
            for e in events[i : i + per]:
                fh.write(json.dumps(e) + "\n")
        out.append(fp)
    return out


def write_replay(
    path: str,
    n_events: int = 50_000,
    n_keys: int = 500,
    files: int = 20,
) -> int:
    """Deterministic BULK CDC replay (streaming-throughput measurement,
    soak tests): ``n_events`` insert/update envelopes over ``n_keys``
    ProductIDs — first touch of a key is an insert, later touches are
    updates with a hash-evolved price — monotone timestamps (1 s apart)
    and ``cdc_sequence_id``, split across ``files`` JSON-lines files so
    ``run_scd2_stream(..., max_files_per_trigger=1)`` replays them as
    ``files`` micro-batches (the reference's 200 ms poll shape,
    FT:4363, at measurable volume). Same wire shape as
    :func:`golden_scenario_events`; fully deterministic (no RNG) so
    repeated benches replay the identical stream. Returns the number
    of data events written."""
    os.makedirs(path, exist_ok=True)
    # pinned UTC: a naive .timestamp() is local-time — the corpus would
    # vary with host TZ and break cross-environment byte determinism
    base_ms = int(
        dt.datetime(
            2023, 9, 27, 10, 0, 0, tzinfo=dt.timezone.utc
        ).timestamp() * 1000
    )
    per = max(1, (n_events + files - 1) // files)
    brands = ("Ralph Lauren", "Gucci", "Hugo Boss")
    seq = 0
    for f in range(files):
        if seq >= n_events:
            break
        fp = os.path.join(path, f"replay_{f:05d}.json")
        with open(fp, "w") as fh:
            for _ in range(per):
                if seq >= n_events:
                    break
                pid = 10_000 + (seq % n_keys)
                row = {
                    "ProductName": f"replay product {pid}",
                    "ProductBrand": brands[pid % 3],
                    "Target_Gender": "Female" if pid % 2 else "Male",
                    "Price": round(50.0 + (seq * 2654435761 % 100_000) / 100.0, 2),
                    "Currency": "Euro",
                    "Description": "bulk replay row",
                    "Launch_date": "2023-08-01",
                    "ProductID": pid,
                    "Loaded_at": "2023-09-27",
                }
                fh.write(
                    json.dumps(
                        {
                            "type": "insert" if seq < n_keys else "update",
                            "timestamp": base_ms + seq * 1000,
                            "database": "sample_data",
                            "table_name": "products_catalog",
                            "cdc_sequence_id": seq + 1,
                            "columns": [
                                {"id": i + 1, "name": k, "value": str(v)}
                                for i, (k, v) in enumerate(row.items())
                            ],
                        }
                    )
                    + "\n"
                )
                seq += 1
    return seq


def to_envelope(
    changes: DataFrame,
    key_cols: "Sequence[str]",
    value_cols: "Sequence[str]",
    event_type_col: str = "event_type",
    ts_col: str = "snapshot_ts",
    database: str = "sample_data",
    table_name: str = "products_catalog",
) -> DataFrame:
    """Serialize engine changesets BACK into the reference's CDC
    envelope JSON (CaptureChangeMySQL wire shape, SURVEY.md §1.2 /
    FT:4368-4382) — the interop closure: ``snapshot_diff`` output
    rendered as the very JSON the reference flow consumes, so
    ``to_envelope ∘ snapshot_diff`` feeds ``parse_envelope`` →
    ``flatten`` → ``scd2_build`` unchanged (round trip tested). Pure
    Column expressions (``to_json`` over a struct) — map-only.

    Output: one ``value`` STRING column of envelope JSON, ordered by
    nothing (attach your own sequencing; ``cdc_sequence_id`` is a
    row-local hash of key+ts for determinism, not a global order)."""
    from collections.abc import Sequence  # noqa: F401 (doc type)

    cols = [*key_cols, *value_cols]
    col_structs = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("id"),
                F.lit(c).alias("name"),
                F.col(c).cast("string").alias("value"),
                F.lit(None).cast("string").alias("last_value"),
            )
            for i, c in enumerate(cols)
        ]
    )
    env = F.struct(
        F.col(event_type_col).alias("type"),
        F.col(ts_col).cast("long").alias("timestamp"),
        F.lit(database).alias("database"),
        F.lit(table_name).alias("table_name"),
        F.abs(
            F.xxhash64(*[F.col(c) for c in key_cols], F.col(ts_col))
        ).alias("cdc_sequence_id"),
        col_structs.alias("columns"),
    )
    # ignoreNullFields=false: the reference envelope carries explicit
    # nulls (a NULL column value is data, not absence)
    return changes.select(
        F.to_json(env, {"ignoreNullFields": "false"}).alias("value")
    )
