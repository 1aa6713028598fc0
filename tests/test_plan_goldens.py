"""Full-registry plan-regression harness: every REGISTRY query's
physical-plan signature (shuffle / sort / join node counts,
plans/inspect.plan_signature) must match the reviewed golden in
plan_goldens.json.

test_plans.py proves ~23 hand-picked plans have the RIGHT shape
(pushdown, broadcast, bounded shuffles); this file pins ALL 133 so a
future refactor can't silently add an Exchange, degrade a broadcast
join to sort-merge, or introduce a cartesian product on a query nobody
hand-tested. On an INTENTIONAL plan change, regenerate with
`python scripts/gen_plan_goldens.py`, review the diff (every changed
count is a changed shuffle/join/sort), and commit goldens + change
together.
"""

from __future__ import annotations

import json
import os

import pytest

from architrave_project_apache_nifi_spark.plans.inspect import plan_signature
from architrave_project_apache_nifi_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"
_GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "plan_goldens.json")

with open(_GOLDEN_PATH) as _fh:
    GOLDENS: dict[str, dict[str, int]] = json.load(_fh)


@pytest.fixture(scope="module", autouse=True)
def _uncached_plans(spark):
    """Signatures are defined over UNCACHED plans: a query whose shared
    view another test materialized earlier in the session (e.g. q15's
    persisted revenue view, run by the overflow-oracle sweep) would
    otherwise print the cached relation's stored child plan and drift
    by one Exchange. Goldens are generated in a fresh session —
    equalize by dropping session cache once for this module."""
    spark.catalog.clearCache()


def test_goldens_cover_exactly_the_registry():
    assert sorted(GOLDENS) == sorted(REGISTRY), (
        "plan_goldens.json out of sync with REGISTRY — run "
        "scripts/gen_plan_goldens.py and review the diff"
    )


def test_no_golden_blesses_a_cartesian_product():
    """The goldens themselves must never normalize a cartesian product
    — reviewing a regenerated file can't accidentally wave one in."""
    offenders = [n for n, s in GOLDENS.items() if s["cartesian_product"] > 0]
    assert offenders == []


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_plan_signature_matches_golden(spark, name):
    got = plan_signature(REGISTRY[name].fn(spark, SF_DIR))
    want = GOLDENS[name]
    assert got == want, (
        f"{name}: physical-plan signature drifted.\n"
        f"  golden: {want}\n  now:    {got}\n"
        "If intentional: python scripts/gen_plan_goldens.py, review, commit."
    )
