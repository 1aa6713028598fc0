"""Incremental SCD2 history store: manifest-committed, append-only.

The round-1 streaming sink rewrote the ENTIRE history store twice per
micro-batch (merge → staging → final) — O(|history|) I/O per batch, a
scale-killer at 100 TB. This store exploits the SCD2 write pattern:

- closed rows (``is_current='N'``) are IMMUTABLE — once an interval has
  a ``valid_until`` it never changes again;
- only the current-rows set (``is_current='Y'``, one row per live key)
  is replaced by a merge.

Layout (a minimal Delta/Iceberg-style commit protocol on plain parquet —
on a cluster with a transactional table format, ``commit`` maps 1:1 to a
MERGE/commit; the protocol here is what those formats do internally):

    <path>/_MANIFEST.json          {"version": b, "closed_batches": [...]}
    <path>/current/v=<b>/          snapshot of current rows after batch b
    <path>/closed/batch=<b>/       rows CLOSED by batch b (immutable)

Per micro-batch I/O: write the (small) closed delta + rewrite the
current snapshot — O(|current| + |delta|), independent of accumulated
history size. Historical batches are never touched again
(``test_streaming.py`` asserts their files stay byte-identical).

Crash safety / effectively-exactly-once: both data writes go to
batch-id-addressed directories (idempotent overwrite on replay of the
same micro-batch); the manifest is flipped LAST via atomic
``os.replace``. A crash anywhere leaves the previous manifest — and
therefore the previous committed state — fully readable; Structured
Streaming replays the batch, the writes land in the same directories,
and the flip happens once. Readers never observe a half-written store.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_MANIFEST.json"


class Scd2Store:
    """Manifest-gated SCD2 history store (see module docstring)."""

    def __init__(self, path: str) -> None:
        self.path = path.rstrip("/")

    # -- read side ----------------------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.path, MANIFEST)

    def exists(self) -> bool:
        """True iff a committed manifest exists. This is the EXPLICIT
        first-batch test — a store directory that exists but has no
        manifest (or an unreadable one) is NOT silently treated as
        empty; read errors propagate and fail the batch rather than
        rebuilding history from one micro-batch."""
        return os.path.exists(self._manifest_path())

    def manifest(self) -> dict:
        with open(self._manifest_path()) as fh:
            m = json.load(fh)
        if "version" not in m or "closed_batches" not in m:
            raise ValueError(
                f"corrupt SCD2 store manifest at {self._manifest_path()}: {m!r}"
            )
        return m

    def _current_dir(self, version: int) -> str:
        return os.path.join(self.path, "current", f"v={version}")

    def _closed_dir(self, batch_id: int) -> str:
        return os.path.join(self.path, "closed", f"batch={batch_id}")

    def read_current(self, spark: SparkSession) -> DataFrame:
        """Current rows only — the reference's ``Is_current='Y'`` lookup
        dimension (final_template.xml:1439) as a single-directory scan."""
        return spark.read.parquet(self._current_dir(self.manifest()["version"]))

    def read_all(self, spark: SparkSession) -> DataFrame:
        """Full history: committed closed batches + the current snapshot.
        One multi-path parquet scan (no partition discovery needed)."""
        m = self.manifest()
        paths = [self._closed_dir(b) for b in m["closed_batches"]]
        paths.append(self._current_dir(m["version"]))
        return spark.read.parquet(*paths)

    # -- write side ---------------------------------------------------------

    @staticmethod
    def _has_data(directory: str) -> bool:
        try:
            return any(
                f.startswith("part-") and not f.endswith(".crc")
                for f in os.listdir(directory)
            )
        except FileNotFoundError:
            return False

    def commit(
        self,
        new_current: DataFrame,
        closed_delta: DataFrame,
        batch_id: int,
        keep_snapshots: int = 2,
    ) -> None:
        """Commit one merged micro-batch.

        Write order (each step idempotent under replay of ``batch_id``):
        1. closed delta  → closed/batch=<id>   (overwrite)
        2. current rows  → current/v=<id>      (overwrite; the snapshot
           it was DERIVED from lives in a different directory, so there
           is no same-path read/write hazard and no staging double-write)
        3. manifest flip (tmp file + atomic ``os.replace``)
        4. GC of superseded snapshots (keep the previous one so a crash
           during GC can never touch the newly committed state)
        """
        prev = self.manifest()["closed_batches"] if self.exists() else []
        closed_dir = self._closed_dir(batch_id)
        closed_delta.write.mode("overwrite").parquet(closed_dir)
        new_current.write.mode("overwrite").parquet(self._current_dir(batch_id))

        closed_batches = [b for b in prev if b != batch_id]
        if self._has_data(closed_dir):
            closed_batches.append(batch_id)
        manifest = {"version": batch_id, "closed_batches": sorted(closed_batches)}
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, self._manifest_path())

        self._gc_snapshots(keep=keep_snapshots)

    def _gc_snapshots(self, keep: int) -> None:
        cur_root = os.path.join(self.path, "current")
        try:
            versions = sorted(
                int(d.split("=", 1)[1])
                for d in os.listdir(cur_root)
                if d.startswith("v=")
            )
        except (FileNotFoundError, ValueError):
            return
        for v in versions[:-keep]:
            shutil.rmtree(self._current_dir(v), ignore_errors=True)
