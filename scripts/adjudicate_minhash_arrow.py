#!/usr/bin/env python
"""Formal adjudication of the Arrow/numpy minhash band path (VERDICT
r7 #6): at sf0.1 the LSH stages are fixed-cost dominated and the numpy
signature path measured not-worth-it; the open question is sf1, where
per-doc shingle counts × 64 hash functions dominate. Ship rule: flip
``band_impl`` only if the Arrow path is ≥1.3× on dedup_minhash_lsh's
shape at sf1.

Protocol = scripts/adjudicate_lsh.py's: each variant in its OWN fresh
process/JVM, one warm pass then 3 timed passes taking the min,
load-gated per variant with the start loadavg recorded in the artifact.

Usage:
    python scripts/adjudicate_minhash_arrow.py [sf_dir] [--load-max 2.0]

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


def run_variant(sf_dir: str, band_impl: str) -> dict:
    code = f"""
import json, time
from architrave_project_apache_nifi_spark.session import get_spark
from architrave_project_apache_nifi_spark.operators import dedup as dd
spark = get_spark("minhash-arrow-adjudicate")
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet({sf_dir!r} + "/documents.parquet")
# warm the Arrow worker pool so pass 0 absorbs spawn cost for BOTH
# variants symmetrically
spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long") \\
    .write.format("noop").mode("overwrite").save()
times = []
for i in range(4):  # pass 0 = warm-up (JVM/codegen/page cache)
    t0 = time.perf_counter()
    dd.minhash_lsh_candidates(
        docs, "doc_id", "text", 64, 16, 3, band_impl={band_impl!r}
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
    sf_dir = args[0] if args else os.path.join(REPO, ".localdata", "sf1")

    result: dict = {"sf_dir": sf_dir, "load_max": load_max, "variants": {}}
    for label in ("expr", "arrow"):
        gate = _wait_for_quiet(load_max, 600.0)
        result["variants"][label] = {
            "loadavg_1m_at_start": gate["loadavg_1m_at_start"],
            "load_wait_timed_out": gate["proceeded_over_threshold"],
            **run_variant(sf_dir, label),
        }
    e = result["variants"]["expr"]["best"]
    a = result["variants"]["arrow"]["best"]
    result["expr_over_arrow"] = round(e / a, 3)
    result["ship_arrow"] = result["expr_over_arrow"] >= 1.3
    print(json.dumps(result))


if __name__ == "__main__":
    main()
