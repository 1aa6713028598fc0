"""Custom Python DataSource: rate-limited CDC envelope replay.

The reference's ``CaptureChangeMySQL`` (final_template.xml:4110-4382)
polls the binlog every 200 ms (schedulingPeriod, FT:4363) and emits ONE
event per FlowFile (``number-of-events-per-flowfile=1``, FT:4298-4301),
persisting the binlog position in a DistributedMapCache (FT:1519).

This source reproduces those semantics on Spark's Python DataSource API
(pyspark >= 4):

- events come from JSON-lines envelope files (the binlog stand-in);
- each micro-batch serves at most ``maxEventsPerBatch`` events — the
  poll-budget knob (the reference's schedule × events-per-FlowFile);
- the offset is the global event index — checkpointed by Structured
  Streaming exactly like the MapCache binlog position, so restart
  resumes where the last committed batch ended and ``readBetweenOffsets``
  replays a batch deterministically after failure.

A ``SimpleDataSourceStreamReader`` reads on the driver — correct for a
CDC tail, which is inherently a single ordered cursor (the reference is
also a single-threaded poller). Fan-out happens AFTER ingestion, where
Spark repartitions the parsed events; a partition-parallel
``DataSourceStreamReader`` would only help for multi-shard sources
(e.g. one binlog per shard), noted for that extension.

Batch mode (``spark.read.format("cdc_replay")``) serves the full file
set — the reference's ``retrieve-all-records`` initial snapshot
(FT:4321-4323).
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from .cdc import CDC_ENVELOPE_SCHEMA

FORMAT_NAME = "cdc_replay"


def _event_files(path: str) -> list[str]:
    return sorted(glob.glob(os.path.join(path, "*.json")))


def _iter_events(path: str) -> Iterator[dict]:
    for fp in _event_files(path):
        with open(fp) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    yield json.loads(line)


def _to_row(e: dict) -> tuple:
    cols = e.get("columns")
    col_rows = (
        None
        if cols is None
        else [
            (c.get("id"), c.get("name"), c.get("value"), c.get("last_value"))
            for c in cols
        ]
    )
    return (
        e.get("type"),
        e.get("timestamp"),
        e.get("database"),
        e.get("table_name"),
        e.get("cdc_sequence_id"),
        col_rows,
    )


class _CdcBatchReader(DataSourceReader):
    def __init__(self, path: str):
        self.path = path

    def read(self, partition) -> Iterator[tuple]:
        for e in _iter_events(self.path):
            yield _to_row(e)


class _CdcStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, path: str, max_events_per_batch: int):
        self.path = path
        self.max_events = max_events_per_batch

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = start["index"]
        hi = lo + self.max_events
        rows = [
            _to_row(e)
            for i, e in enumerate(_iter_events(self.path))
            if lo <= i < hi
        ]
        return iter(rows), {"index": lo + len(rows)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        lo, hi = start["index"], end["index"]
        return iter(
            _to_row(e)
            for i, e in enumerate(_iter_events(self.path))
            if lo <= i < hi
        )

    def commit(self, end: dict) -> None:
        # Offsets live in the streaming checkpoint (the MapCache
        # equivalent); the file set is immutable, nothing to clean up.
        pass


class CdcReplayDataSource(DataSource):
    """``spark.readStream.format("cdc_replay").option("path", dir)``.

    Options:
      path                directory of JSON-lines envelope files
      maxEventsPerBatch   poll budget per micro-batch (default 100)
    """

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        return CDC_ENVELOPE_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _CdcBatchReader(self._path())

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _CdcStreamReader(
            self._path(), int(self.options.get("maxeventsperbatch", 100))
        )

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("cdc_replay requires .option('path', <dir>)")
        return path


def register(spark) -> None:
    """Idempotent registration: ``spark.dataSource.register``."""
    spark.dataSource.register(CdcReplayDataSource)
