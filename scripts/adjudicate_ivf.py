#!/usr/bin/env python
"""Formal adjudication of the ann_topk_ivf r8→r9 bench delta
(VERDICT r9 #1): 0.842 s → 4.046 s (4.8×) on an unchanged plan — real
probe-path cost, index-storage eviction forcing rebuilds, or sandbox
contention?

Protocol (same isolation discipline as adjudicate_lsh.py): the query
runs in its OWN fresh process/JVM exactly as bench.py runs it — index
pre-built via ivf_index_for, then one warm pass and 3 timed passes of
the ann_topk_ivf registry entry, min-of-3. The harness waits (bounded)
for loadavg_1m below a threshold before the run and records loadavg_1m
AND loadavg_5m at each pass start (the r9 official run passed the
1-minute gate while the 5-minute average said the host was busy), plus
the index's post-build storage state, so an eviction — were one to
happen — would be visible in the artifact.

Note on the eviction hypothesis: ivf_build persists with the Spark 3+
default StorageLevel (MEMORY_AND_DISK_DESER), so memory-pressure
eviction degrades to a disk read, never a silent k-means rebuild; the
centroids themselves live driver-side in the IvfIndex. The artifact
records the storage level to pin that in writing.

Usage:
    python scripts/adjudicate_ivf.py [sf_dir] [--load-max 2.0]

Prints one JSON line; paste the verdict into BASELINE.md.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _wait_for_quiet  # noqa: E402 — ONE load-gate policy


def run_isolated(sf_dir: str) -> dict:
    code = f"""
import json, os, time
from architrave_project_apache_nifi_spark.session import get_spark
from architrave_project_apache_nifi_spark.queries import REGISTRY
from architrave_project_apache_nifi_spark.operators.similarity import (
    ivf_index_for,
)
from architrave_project_apache_nifi_spark.tables import load
spark = get_spark("ivf-adjudicate"); spark.sparkContext.setLogLevel("ERROR")
# same pre-build bench.py does (the probe path is what's timed)
idx = ivf_index_for(load(spark, "embeddings", {sf_dir!r}), cache_key={sf_dir!r})
storage = idx.assigned.storageLevel
times, loads = [], []
for i in range(4):  # pass 0 = warm-up (JVM/codegen/arrow worker pool)
    loads.append(os.getloadavg())
    t0 = time.perf_counter()
    REGISTRY["ann_topk_ivf"].fn(spark, {sf_dir!r}).write.format("noop").mode(
        "overwrite").save()
    times.append(time.perf_counter() - t0)
cached = spark.sparkContext._jsc.sc().getRDDStorageInfo()
print(json.dumps({{
    "warm": round(times[0], 3),
    "passes": [round(t, 3) for t in times[1:]],
    "best": round(min(times[1:]), 3),
    "storage_level": str(storage),
    "cached_rdds": len(cached),
    "loadavg_per_pass": [[round(x, 2) for x in l] for l in loads],
}}))
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        check=True, cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    argv = sys.argv[1:]
    load_max = 2.0
    if "--load-max" in argv:
        i = argv.index("--load-max")
        load_max = float(argv[i + 1])
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"

    gate = _wait_for_quiet(load_max, 600.0)
    result = {
        "query": "ann_topk_ivf",
        "sf_dir": sf_dir,
        "gate": gate,
        "isolated": run_isolated(sf_dir),
        "r8_official": 0.842,
        "r9_official": 4.046,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
