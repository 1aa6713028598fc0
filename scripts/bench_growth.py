#!/usr/bin/env python
"""Scale-growth harness: run the headline bench at two scale factors
and print per-query growth, reproducing BASELINE.md's "Scale growth"
table.

Usage:
    python scripts/gen_scale.py                  # materialize sf1 first
    python scripts/bench_growth.py [small_dir] [big_dir] [--isolate q ...]

Defaults: /root/testdata/sf0.1 vs /root/repo/.localdata/sf1.

Runs ``bench.py`` (the FROZEN protocol — BASELINE.md) once per SF in a
SEPARATE process each, so JVM heap history from the big run cannot
contaminate the small one. ``--isolate q1 q2`` additionally re-times
the named queries in their own fresh sessions at the big SF — use for
queries that share a bench pass with a quadratic neighbor and absorb
its GC pressure (BASELINE.md footnote 1). Standard r5 invocation for
the known contamination-prone entries:

    python scripts/bench_growth.py --isolate q3_shipping_priority \
        q6_revenue_change doc_fingerprint

(measured isolated truths recorded in BASELINE.md footnote 3).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_isolated(sf_dir: str, names: list[str]) -> dict[str, float]:
    code = f"""
import json, time
from architrave_project_apache_nifi_spark.session import get_spark
from architrave_project_apache_nifi_spark.queries import REGISTRY
spark = get_spark("growth-isolated"); spark.sparkContext.setLogLevel("ERROR")
out = {{}}
for name in {names!r}:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    out[name] = round(best, 3)
print(json.dumps(out))
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        check=True, cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    isolate: list[str] = []
    if "--isolate" in sys.argv:
        isolate = sys.argv[sys.argv.index("--isolate") + 1 :]
    small = args[0] if args else "/root/testdata/sf0.1"
    big = args[1] if len(args) > 1 else "/root/repo/.localdata/sf1"

    a = run_bench(small)["queries"]
    b = run_bench(big)["queries"]
    iso = run_isolated(big, [q for q in isolate if q in a]) if isolate else {}

    print(f"{'query':38s} {'small':>8s} {'big':>9s} {'growth':>8s}  isolated")
    for q in a:
        g = b[q] / a[q]
        extra = f"  {iso[q]:.2f}s ({iso[q]/a[q]:.1f}x)" if q in iso else ""
        print(f"{q:38s} {a[q]:8.3f} {b[q]:9.3f} {g:7.1f}x{extra}")
    ta, tb = sum(a.values()), sum(b.values())
    print(f"{'TOTAL':38s} {ta:8.2f} {tb:9.2f} {tb/ta:7.1f}x")
    print(
        json.dumps(
            {"small": small, "big": big, "growth_total": round(tb / ta, 2),
             "isolated": iso}
        )
    )


if __name__ == "__main__":
    main()
