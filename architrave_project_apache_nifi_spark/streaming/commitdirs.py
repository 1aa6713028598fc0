"""Batch-addressed directory commit discipline, shared by the
idempotent streaming stores (dedup_ingest / rollup_stream / ann_ingest).

Those stores write each micro-batch into its own ``batch=<id>``
directory with ``mode("overwrite")`` so a replay converges — but a
crash MID-write leaves a partial directory on disk, and a reader that
ran between the crash and the replay would otherwise see a torn
snapshot. Spark's file committer already gives us the fix for free:
the job-level ``_SUCCESS`` marker is written only after every task
output is committed, so "directory contains ``_SUCCESS``" is exactly
"this batch's write finished". Readers here treat that marker as the
commit record and skip torn directories; the crashed batch's replay
overwrites the partial dir wholesale and re-earns the marker.

(The SCD2 history store doesn't need this: it has a real manifest and
never trusts directory listings — history_store.py:30-38.)
"""

from __future__ import annotations

import os

_SUCCESS = "_SUCCESS"


def is_committed_dir(path: str) -> bool:
    """True iff the Spark job that wrote ``path`` committed."""
    return os.path.isfile(os.path.join(path, _SUCCESS))


def committed_batch_dirs(
    parent: str, exclude_batch: int | None = None
) -> list[tuple[int, str]]:
    """``(batch_id, path)`` for every COMMITTED ``batch=<id>`` child of
    ``parent``, sorted by id. Partial directories (crashed mid-write,
    no ``_SUCCESS``) and ``exclude_batch`` (a replaying batch must not
    read its own first attempt) are skipped. Empty when ``parent``
    doesn't exist."""
    if not os.path.isdir(parent):
        return []
    out = []
    for d in os.listdir(parent):
        if not d.startswith("batch="):
            continue
        bid = int(d.split("=", 1)[1])
        p = os.path.join(parent, d)
        if bid == exclude_batch or not is_committed_dir(p):
            continue
        out.append((bid, p))
    return sorted(out)
