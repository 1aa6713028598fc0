#!/usr/bin/env python
"""Regenerate tests/plan_goldens.json — the physical-plan signature of
every REGISTRY query at sf0.001 (see plans/inspect.plan_signature).

Run DELIBERATELY after a change that intentionally alters a plan,
review the diff (`git diff tests/plan_goldens.json` — every changed
count is a changed shuffle/join/sort), then commit the new goldens
together with the change that earned them.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from architrave_project_apache_nifi_spark.plans.inspect import plan_signature
from architrave_project_apache_nifi_spark.queries import REGISTRY
from architrave_project_apache_nifi_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "plan_goldens.json")


def main() -> None:
    spark = get_spark("plan-goldens")
    spark.sparkContext.setLogLevel("ERROR")
    # signatures are defined over uncached plans (see
    # tests/test_plan_goldens.py::_uncached_plans)
    spark.catalog.clearCache()
    goldens: dict[str, dict[str, int]] = {}
    for name in sorted(REGISTRY):
        try:
            df = REGISTRY[name].fn(spark, SF_DIR)
            goldens[name] = plan_signature(df)
        except Exception as exc:  # noqa: BLE001 — record, don't abort the sweep
            print(f"FAILED {name}: {exc}", file=sys.stderr)
    with open(os.path.abspath(OUT), "w") as fh:
        json.dump(goldens, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"{len(goldens)}/{len(REGISTRY)} signatures -> {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
