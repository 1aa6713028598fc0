#!/usr/bin/env python
"""Formal adjudication of the dedup_minhash_lsh r4→r5 bench delta
(VERDICT r5/r6): is hot-band salting detection a real plan cost at
sf0.1, or was the observed 1.3-1.6× drift sandbox contention?

Protocol (the isolation discipline bench_growth.py --isolate uses,
hardened): each variant (max_band_bucket=10_000 vs None) runs in its
OWN fresh process/JVM, one warm pass then 3 timed passes taking the
min; the harness waits (bounded) for loadavg_1m below a threshold
before each variant and records the start-of-variant loadavg alongside
the numbers, so a contended run is visible in the artifact instead of
poisoning it.

Usage:
    python scripts/adjudicate_lsh.py [sf_dir] [--load-max 2.0]

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


def run_variant(sf_dir: str, cap: int | None) -> dict:
    code = f"""
import json, time
from pyspark.sql import functions as F
from architrave_project_apache_nifi_spark.session import get_spark
from architrave_project_apache_nifi_spark.operators import dedup as dd
spark = get_spark("lsh-adjudicate"); spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet({sf_dir!r} + "/documents.parquet")
times = []
for i in range(4):  # pass 0 = warm-up (JVM/codegen/page cache)
    t0 = time.perf_counter()
    dd.minhash_lsh_candidates(
        docs, "doc_id", "text", 64, 16, 2, max_band_bucket={cap!r}
    ).write.format("noop").mode("overwrite").save()
    times.append(time.perf_counter() - t0)
print(json.dumps({{"warm": round(times[0], 3),
                   "passes": [round(t, 3) for t in times[1:]],
                   "best": round(min(times[1:]), 3)}}))
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
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"

    result: dict = {"sf_dir": sf_dir, "load_max": load_max, "variants": {}}
    for label, cap in (("salted_10k", 10_000), ("unsalted", None)):
        gate = _wait_for_quiet(load_max, 600.0)
        result["variants"][label] = {
            "loadavg_1m_at_start": gate["loadavg_1m_at_start"],
            "load_wait_timed_out": gate["proceeded_over_threshold"],
            **run_variant(sf_dir, cap),
        }
    s = result["variants"]["salted_10k"]["best"]
    u = result["variants"]["unsalted"]["best"]
    result["salted_over_unsalted"] = round(s / u, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
