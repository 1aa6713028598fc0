"""Custom Python DataSource WRITER: transactional JSON-lines audit sink.

Completes the "custom sources/sinks" pair (BASELINE.json's Spark
approach; the reader half is ``pyds.CdcReplayDataSource``). The
reference's sinks are transactional JDBC batches (PutSQL with
``Support Fragmented Transactions``, final_template.xml:2220-2321) —
this sink reproduces the *protocol* on the Python DataSource writer
API with a filesystem target:

- each task writes its partition to ``part-<pid>-<uuid>.json.tmp`` and
  reports the file + row count in its ``WriterCommitMessage``;
- ``commit`` (driver, runs once, only if every task succeeded) renames
  the temps to final names and writes a ``_MANIFEST.json`` listing the
  committed files — readers that honor the manifest never observe a
  half-written result (the two-phase commit PutSQL gets from JDBC
  transactions);
- ``abort`` removes the orphan temps.

Scale notes: tasks write in parallel straight from executors (no
driver funnel); the commit step is O(#files) metadata-only. On object
stores swap rename-based finalize for manifest-only commit — readers
already key off the manifest, so only ``commit`` changes.
"""

from __future__ import annotations

import dataclasses
import json
import os
import uuid
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage
from pyspark.sql.types import StructType

FORMAT_NAME = "json_audit"
MANIFEST = "_MANIFEST.json"


@dataclasses.dataclass
class _FileCommit(WriterCommitMessage):
    tmp_name: str
    final_name: str
    n_rows: int


class _AuditWriter(DataSourceWriter):
    def __init__(self, path: str, overwrite: bool) -> None:
        self.path = path
        self.overwrite = overwrite

    def write(self, rows: Iterator) -> _FileCommit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        token = uuid.uuid4().hex[:8]
        final_name = f"part-{pid:05d}-{token}.json"
        tmp_name = final_name + ".tmp"
        os.makedirs(self.path, exist_ok=True)
        n = 0
        with open(os.path.join(self.path, tmp_name), "w") as fh:
            for row in rows:
                fh.write(json.dumps(row.asDict(recursive=True), default=str) + "\n")
                n += 1
        return _FileCommit(tmp_name=tmp_name, final_name=final_name, n_rows=n)

    def commit(self, messages: list[_FileCommit]) -> None:
        """Crash-safe commit order: (1) finalize temp files — invisible
        to manifest readers until the flip; (2) ATOMICALLY replace the
        manifest (tmp + ``os.replace``); (3) only then delete files the
        new manifest no longer references. A crash at any point leaves
        the currently-installed manifest referencing only intact files —
        at worst orphan data files exist, which manifest-honoring
        readers never see."""
        manifest_path = os.path.join(self.path, MANIFEST)
        previous = []
        if os.path.exists(manifest_path):
            with open(manifest_path) as fh:
                previous = json.load(fh)["files"]
        new_entries = []
        for m in messages:
            os.rename(
                os.path.join(self.path, m.tmp_name),
                os.path.join(self.path, m.final_name),
            )
            new_entries.append({"file": m.final_name, "n_rows": m.n_rows})
        committed = new_entries if self.overwrite else previous + new_entries
        tmp_manifest = manifest_path + ".tmp"
        with open(tmp_manifest, "w") as fh:
            json.dump({"files": committed}, fh)
        os.replace(tmp_manifest, manifest_path)
        if self.overwrite:
            keep = {e["file"] for e in committed}
            for entry in os.listdir(self.path):
                if (
                    entry.endswith(".json")
                    and entry != MANIFEST
                    and entry not in keep
                ):
                    os.remove(os.path.join(self.path, entry))

    def abort(self, messages: list[_FileCommit]) -> None:
        for m in messages:
            if m is None:
                continue
            tmp = os.path.join(self.path, m.tmp_name)
            if os.path.exists(tmp):
                os.remove(tmp)


class JsonAuditDataSource(DataSource):
    """``df.write.format("json_audit").option("path", dir).save()``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        path = self.options.get("path")
        if not path:
            raise ValueError("json_audit requires .option('path', <dir>)")
        return _AuditWriter(path, overwrite)


def register(spark) -> None:
    spark.dataSource.register(JsonAuditDataSource)


def read_committed(spark, path: str):
    """Read ONLY manifest-committed files (the reader side of the
    two-phase protocol; stray temps are invisible)."""
    with open(os.path.join(path, MANIFEST)) as fh:
        files = [e["file"] for e in json.load(fh)["files"]]
    return spark.read.json([os.path.join(path, f) for f in files])
