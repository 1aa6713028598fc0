"""Loopback Kafka stand-in: a Python DataSource with the EXACT output
contract of Spark's ``kafka`` source, over an append-only partition log
on local disk.

Why it exists: the production CDC feed is Kafka
(``read_envelope_kafka_stream`` — the live-connector shape of the
reference's ``CaptureChangeMySQL``, final_template.xml:4110-4382), but
the ``spark-sql-kafka`` connector jar is not on this sandbox's
classpath and there is no network to fetch it. Everything downstream of
the source is format-agnostic, so the gap to close is precisely the
source contract; this module closes it with a drop-in format whose
output is column-for-column the Kafka source's:

    key binary, value binary, topic string, partition int,
    offset long, timestamp timestamp, timestampType int

and whose semantics mirror the connector where the engine depends on
them:

- ``subscribe`` (comma-separated topics), ``startingOffsets``
  earliest|latest;
- monotone per-(topic, partition) offsets, resumed from the streaming
  checkpoint (restart replays nothing, loses nothing — the
  DistributedMapCache binlog-position semantics, FT:1519);
- a producer API appending (key, value, timestamp) messages, with
  Kafka's default partitioner (hash of key when a key is given);
- the SINK shape too (batch ``writer`` + ``streamWriter``): rows with
  ``value`` (+ optional ``key``/``partition``/``timestamp``) append to
  the topic, streaming commits dedupe on batch id (exactly-once under
  replay) — so stream → topic → stream chains run end-to-end.

Broker log layout: ``<dir>/<topic>/p<partition>.jsonl``, one JSON
message per line, offset = line number. Appends are atomic at line
granularity (single local writer — this is a test double for the wire
protocol, not a broker).

The real-connector path is unchanged: ``read_envelope_kafka_stream``
defaults to ``format("kafka")`` and takes this format's name as an
override; tests/test_e2e_chain.py drives the golden scenario through
it into the same SCD2 merge the file/socket/custom sources use.
"""

from __future__ import annotations

import base64
import datetime as dt
import glob
import json
import os
from collections.abc import Iterator

import dataclasses

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

FORMAT_NAME = "kafka_loopback"

# Column-for-column the Kafka connector's output schema.
KAFKA_RECORD_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)


# ---------------------------------------------------------------------------
# Producer side
# ---------------------------------------------------------------------------


def _partition_file(broker_dir: str, topic: str, partition: int) -> str:
    return os.path.join(broker_dir, topic, f"p{partition}.jsonl")


def _default_partition(key: bytes | None, n_partitions: int) -> int:
    """Kafka's default partitioner shape: keyed messages hash to a
    stable partition (so one CDC primary key always lands in one
    partition — the ordering guarantee the merge relies on); unkeyed
    messages go to partition 0 (the loopback has no sticky batching)."""
    if key is None or n_partitions <= 1:
        return 0
    import zlib

    return zlib.crc32(key) % n_partitions


def produce(
    broker_dir: str,
    topic: str,
    value: bytes | str,
    key: bytes | str | None = None,
    timestamp_ms: int | None = None,
    n_partitions: int = 1,
    partition: int | None = None,
) -> tuple[int, int]:
    """Append one message; returns its (partition, offset)."""
    kb = key.encode() if isinstance(key, str) else key
    vb = value.encode() if isinstance(value, str) else value
    if partition is None:
        partition = _default_partition(kb, n_partitions)
    fp = _partition_file(broker_dir, topic, partition)
    os.makedirs(os.path.dirname(fp), exist_ok=True)
    ts = (
        timestamp_ms
        if timestamp_ms is not None
        else int(dt.datetime.now(dt.timezone.utc).timestamp() * 1000)
    )
    record = {
        "key": None if kb is None else base64.b64encode(kb).decode(),
        "value": base64.b64encode(vb).decode(),
        "timestamp": ts,
    }
    offset = 0
    if os.path.exists(fp):
        with open(fp) as fh:
            offset = sum(1 for _ in fh)
    with open(fp, "a") as fh:
        fh.write(json.dumps(record) + "\n")
    return partition, offset


# ---------------------------------------------------------------------------
# Reader side
# ---------------------------------------------------------------------------


def _topic_partitions(broker_dir: str, topic: str) -> list[int]:
    return sorted(
        int(os.path.basename(fp)[1:].split(".")[0])
        for fp in glob.glob(os.path.join(broker_dir, topic, "p*.jsonl"))
    )


def _end_offsets(broker_dir: str, topics: list[str]) -> dict[str, int]:
    out: dict[str, int] = {}
    for topic in topics:
        for p in _topic_partitions(broker_dir, topic):
            with open(_partition_file(broker_dir, topic, p)) as fh:
                out[f"{topic}/{p}"] = sum(1 for _ in fh)
    return out


def _read_span(
    broker_dir: str, tp: str, lo: int, hi: int
) -> Iterator[tuple]:
    topic, _, p = tp.rpartition("/")
    fp = _partition_file(broker_dir, topic, int(p))
    if not os.path.exists(fp):
        return
    with open(fp) as fh:
        for offset, line in enumerate(fh):
            if offset >= hi:
                break
            if offset < lo or not line.strip():
                continue
            rec = json.loads(line)
            yield (
                None
                if rec.get("key") is None
                else base64.b64decode(rec["key"]),
                base64.b64decode(rec["value"]),
                topic,
                int(p),
                offset,
                dt.datetime.fromtimestamp(
                    rec["timestamp"] / 1000.0, dt.timezone.utc
                ).replace(tzinfo=None),
                0,  # timestampType: CreateTime
            )


class _LoopbackBatchReader(DataSourceReader):
    def __init__(self, broker_dir: str, topics: list[str]):
        self.broker_dir = broker_dir
        self.topics = topics

    def read(self, partition) -> Iterator[tuple]:
        for tp, end in _end_offsets(self.broker_dir, self.topics).items():
            yield from _read_span(self.broker_dir, tp, 0, end)


class _LoopbackStreamReader(SimpleDataSourceStreamReader):
    """Driver-side cursor over the partition logs (a CDC tail is a
    single ordered cursor per partition; fan-out happens after
    ingestion, as in sources/pyds.py). The offset dict maps
    ``topic/partition`` → next unread offset — the same shape the Kafka
    source checkpoints, so restart-resume falls out of Structured
    Streaming's offset log."""

    def __init__(
        self,
        broker_dir: str,
        topics: list[str],
        starting_offsets: str,
        max_records: int,
    ):
        self.broker_dir = broker_dir
        self.topics = topics
        self.starting = starting_offsets
        self.max_records = max_records

    def initialOffset(self) -> dict:
        if self.starting == "latest":
            return _end_offsets(self.broker_dir, self.topics)
        return {}  # earliest: every partition starts at 0 (incl. future ones)

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        end = _end_offsets(self.broker_dir, self.topics)
        budget = self.max_records
        rows: list[tuple] = []
        next_off = dict(start)
        for tp, hi in sorted(end.items()):
            lo = start.get(tp, 0)
            next_off.setdefault(tp, lo)
            if budget <= 0 or hi <= lo:
                continue
            span = list(_read_span(self.broker_dir, tp, lo, min(hi, lo + budget)))
            rows.extend(span)
            next_off[tp] = lo + len(span)
            budget -= len(span)
        return iter(rows), next_off

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        for tp, hi in sorted(end.items()):
            lo = start.get(tp, 0)
            if hi > lo:
                yield from _read_span(self.broker_dir, tp, lo, hi)

    def commit(self, end: dict) -> None:
        pass  # log files are immutable history; offsets live in the checkpoint


# ---------------------------------------------------------------------------
# Writer side (the Kafka SINK shape: rows with value [+ key, partition])
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class _ProducerCommit(WriterCommitMessage):
    # (key_b64 | None, value_b64, timestamp_ms | None, partition | None)
    rows: list[tuple]


def _encode_row(row) -> tuple:
    d = row.asDict()
    if d.get("value") is None:
        raise ValueError("kafka_loopback sink rows need a non-null 'value'")
    val = d["value"]
    vb = val.encode() if isinstance(val, str) else bytes(val)
    key = d.get("key")
    kb = None if key is None else (key.encode() if isinstance(key, str) else bytes(key))
    ts = d.get("timestamp")
    ts_ms = None if ts is None else int(ts.timestamp() * 1000)
    part = d.get("partition")
    return (
        None if kb is None else base64.b64encode(kb).decode(),
        base64.b64encode(vb).decode(),
        ts_ms,
        None if part is None else int(part),
    )


class _LoopbackWriterBase:
    """Tasks buffer their rows into the commit message; the DRIVER
    appends them serially at commit time. That mirrors what the real
    sink gets from the broker protocol — per-partition append order
    from one producer, all-or-nothing per job (no partial topic state
    from a failed job) — and sidesteps concurrent file appends, which
    a log directory cannot serialize (documented test-double limit)."""

    def __init__(self, broker_dir: str, topic: str, n_partitions: int):
        self.broker_dir = broker_dir
        self.topic = topic
        self.n_partitions = n_partitions

    def write(self, rows) -> _ProducerCommit:
        return _ProducerCommit(rows=[_encode_row(r) for r in rows])

    def _apply(self, messages: list[_ProducerCommit]) -> None:
        # bulk append: route every row to its partition first, then ONE
        # open+append per partition file (produce() per row would
        # re-count the log per append — O(n²) in the batch)
        by_part: dict[int, list[str]] = {}
        for m in messages:
            for k_b64, v_b64, ts_ms, part in m.rows:
                if part is None:
                    kb = None if k_b64 is None else base64.b64decode(k_b64)
                    part = _default_partition(kb, self.n_partitions)
                ts = (
                    ts_ms
                    if ts_ms is not None
                    else int(
                        dt.datetime.now(dt.timezone.utc).timestamp() * 1000
                    )
                )
                by_part.setdefault(int(part), []).append(
                    json.dumps({"key": k_b64, "value": v_b64, "timestamp": ts})
                )
        for part, lines in sorted(by_part.items()):
            fp = _partition_file(self.broker_dir, self.topic, part)
            os.makedirs(os.path.dirname(fp), exist_ok=True)
            with open(fp, "a") as fh:
                fh.write("\n".join(lines) + "\n")

    def abort(self, *args) -> None:
        pass  # nothing staged outside commit messages


class _LoopbackBatchWriter(_LoopbackWriterBase, DataSourceWriter):
    def commit(self, messages) -> None:
        self._apply(list(messages))


class _LoopbackStreamWriter(_LoopbackWriterBase, DataSourceStreamWriter):
    """Exactly-once per micro-batch. ``<topic>/_commits.json`` (flipped
    by atomic replace) records BOTH the committed batch ids — so a
    replayed epoch is skipped — and the committed byte length of every
    partition log. The lengths close the crash window between append
    and marker write: a commit attempt first TRUNCATES each partition
    log back to its committed length (and deletes partition files the
    marker has never seen), erasing any half-appended rows a crashed
    attempt left behind, then appends, then flips the marker. Until
    the replay runs, uncommitted tail rows are visible to readers —
    the same ``read_uncommitted`` isolation a real Kafka consumer has
    by default; the truncation plays the abort-marker role.

    Corollary (documented test-double limit): a topic fed by this
    streaming writer must not concurrently take batch-writer appends —
    the fence cannot tell those from a crashed attempt's residue, just
    as a transactional Kafka producer fences zombie writers."""

    def _commits_path(self) -> str:
        return os.path.join(self.broker_dir, self.topic, "_commits.json")

    def _load_state(self) -> dict | None:
        p = self._commits_path()
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def _committed(self) -> set[int]:
        state = self._load_state()
        return set(state["batches"]) if state else set()

    def _partition_sizes(self) -> dict[str, int]:
        return {
            str(part): os.path.getsize(
                _partition_file(self.broker_dir, self.topic, part)
            )
            for part in _topic_partitions(self.broker_dir, self.topic)
        }

    def _write_state(self, batches: set[int]) -> None:
        os.makedirs(os.path.dirname(self._commits_path()), exist_ok=True)
        tmp = self._commits_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {"batches": sorted(batches), "ends": self._partition_sizes()},
                fh,
            )
        os.replace(tmp, self._commits_path())

    def _fence(self, ends: dict[str, int]) -> None:
        for part in _topic_partitions(self.broker_dir, self.topic):
            fp = _partition_file(self.broker_dir, self.topic, part)
            committed = ends.get(str(part))
            if committed is None:
                os.remove(fp)  # born in an uncommitted attempt
            elif os.path.getsize(fp) > committed:
                with open(fp, "r+") as fh:
                    fh.truncate(committed)

    def commit(self, messages, batchId: int) -> None:  # noqa: N803 — API name
        state = self._load_state()
        if state is None:
            # first-ever commit on this topic: record the baseline
            # (pre-populated batch data included) BEFORE appending, so
            # a crash during this very batch is fence-able on replay
            self._write_state(set())
            state = self._load_state()
        done = set(state["batches"])
        if batchId in done:
            return
        if "ends" in state:  # a lengths-free legacy marker can't fence
            self._fence(state["ends"])
        self._apply(list(messages))
        self._write_state(done | {batchId})

    def abort(self, messages, batchId: int) -> None:  # noqa: N803 — API name
        pass


class KafkaLoopbackDataSource(DataSource):
    """``spark.readStream.format("kafka_loopback")`` with the Kafka
    source's option names: ``kafka.bootstrap.servers`` is reinterpreted
    as the broker-log DIRECTORY (so callers swap only the format
    string), ``subscribe`` is the comma-separated topic list,
    ``startingOffsets`` is earliest|latest. ``maxRecordsPerBatch``
    (loopback-only) caps a micro-batch like ``maxOffsetsPerTrigger``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        return KAFKA_RECORD_SCHEMA

    def _broker_and_topics(self) -> tuple[str, list[str]]:
        broker = self.options.get("kafka.bootstrap.servers") or self.options.get(
            "path"
        )
        if not broker:
            raise ValueError(
                "kafka_loopback requires .option('kafka.bootstrap.servers', "
                "<broker log dir>)"
            )
        topics = [
            t.strip()
            for t in (self.options.get("subscribe") or "").split(",")
            if t.strip()
        ]
        if not topics:
            raise ValueError("kafka_loopback requires .option('subscribe', <topics>)")
        return broker, topics

    def reader(self, schema: StructType) -> DataSourceReader:
        broker, topics = self._broker_and_topics()
        return _LoopbackBatchReader(broker, topics)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        broker, topics = self._broker_and_topics()
        return _LoopbackStreamReader(
            broker,
            topics,
            self.options.get("startingoffsets", "earliest").lower(),
            int(self.options.get("maxrecordsperbatch", 10_000)),
        )

    def _sink_target(self) -> tuple[str, str, int]:
        broker = self.options.get("kafka.bootstrap.servers") or self.options.get(
            "path"
        )
        topic = self.options.get("topic")
        if not broker or not topic:
            raise ValueError(
                "kafka_loopback sink requires .option('kafka.bootstrap."
                "servers', <dir>) and .option('topic', <topic>)"
            )
        return broker, topic, int(self.options.get("npartitions", 1))

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return _LoopbackBatchWriter(*self._sink_target())

    def streamWriter(self, schema: StructType, overwrite: bool) -> DataSourceStreamWriter:
        return _LoopbackStreamWriter(*self._sink_target())


def register(spark) -> None:
    """Idempotent registration: ``spark.dataSource.register``."""
    spark.dataSource.register(KafkaLoopbackDataSource)
