"""One-off bisect harness for the r2 bench regressions (VERDICT.md
"What's wrong" #3): times the regressed queries under a toggled
configuration in a fresh JVM.

Usage: python scripts/bisect_bench.py {prebuild|noprebuild} [queries...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from architrave_project_apache_nifi_spark.queries import REGISTRY  # noqa: E402
from architrave_project_apache_nifi_spark.session import get_spark  # noqa: E402

MODE = sys.argv[1] if len(sys.argv) > 1 else "prebuild"
QUERIES = sys.argv[2:] or [
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ann_topk_bruteforce",
    "ann_topk_ivf",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bisect")
    spark.sparkContext.setLogLevel("ERROR")

    REGISTRY["agg_percentiles_by_type"].fn(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(64).repartition(
        int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    if MODE == "prebuild":
        from architrave_project_apache_nifi_spark.operators.similarity import (
            ivf_index_for,
        )
        from architrave_project_apache_nifi_spark.tables import load

        ivf_index_for(load(spark, "embeddings", sf_dir), cache_key=sf_dir)

    timings: dict[str, float] = {}
    for name in QUERIES:
        fn = REGISTRY[name].fn
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    print(json.dumps({"mode": MODE, "queries": timings}))


if __name__ == "__main__":
    main()
