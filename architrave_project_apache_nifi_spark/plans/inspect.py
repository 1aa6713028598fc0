"""Assertions over physical plans.

The reference's only "optimizations" are hand-written (the prefiltered
lookup subquery, final_template.xml:1439). Ours come from Catalyst —
these helpers let tests PROVE pushdown/broadcast/codegen happened
instead of assuming it (the 100 TB contract: a scan that reads all
columns for a 2-column projection is wrong).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    plan = formatted_plan(df)
    if "PushedFilters" not in plan or fragment not in plan:
        raise AssertionError(
            f"expected pushed filter containing {fragment!r}; plan:\n{plan}"
        )


def assert_pruned_columns(df: DataFrame, max_read_cols: int) -> None:
    """Every parquet scan in the plan must read at most N columns."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            schema = line.split("ReadSchema:", 1)[1]
            ncols = schema.count(":")
            if ncols > max_read_cols:
                raise AssertionError(
                    f"scan reads {ncols} columns (> {max_read_cols}): {line.strip()}"
                )


def assert_broadcast_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    if "BroadcastHashJoin" not in plan and "BroadcastNestedLoopJoin" not in plan:
        raise AssertionError(f"expected a broadcast join; plan:\n{plan}")


def assert_no_shuffle(df: DataFrame) -> None:
    if count_shuffles(df) > 0:
        raise AssertionError(
            f"unexpected shuffle exchange; plan:\n{formatted_plan(df)}"
        )


def count_shuffles(df: DataFrame) -> int:
    """Hash-partitioning exchanges in the plan (formatted mode prints
    each Exchange node's partitioning on an ``Arguments:`` line;
    SinglePartition/broadcast exchanges don't count)."""
    plan = formatted_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if line.strip().startswith("Arguments: hashpartitioning")
    )


def plan_signature(df: DataFrame) -> dict[str, int]:
    """Shuffle/sort/join operator counts of the physical plan — the
    scale-relevant shape, condensed to a comparable dict. Used by the
    full-registry plan-regression harness (tests/test_plan_goldens.py):
    a refactor that silently adds an Exchange, degrades a broadcast
    join to a sort-merge join, or introduces a cartesian product to ANY
    registry query breaks the golden diff, not just the ~23 hand-picked
    plan tests.

    Keys count node occurrences in the pre-execution plan (AQE's
    initial plan — deterministic, unlike the runtime-adapted final
    plan); exchanges are split by partitioning kind, since a
    rangepartitioning (global sort) and a SinglePartition funnel are
    different scale hazards than a hash shuffle."""
    import re

    plan = formatted_plan(df)
    nodes = re.findall(r"^\(\d+\) ([A-Za-z][\w]*)", plan, re.M)
    args = [
        ln.strip().split("Arguments:", 1)[1]
        for ln in plan.splitlines()
        if ln.strip().startswith("Arguments:")
    ]
    sig = {
        "exchange_hash": sum(
            1 for a in args if a.lstrip().startswith("hashpartitioning")
        ),
        "exchange_range": sum(
            1 for a in args if a.lstrip().startswith("rangepartitioning")
        ),
        "exchange_single": sum(
            1 for a in args if a.lstrip().startswith("SinglePartition")
        ),
        "broadcast_exchange": nodes.count("BroadcastExchange"),
        "sort": nodes.count("Sort"),
        "sort_merge_join": nodes.count("SortMergeJoin"),
        "broadcast_hash_join": nodes.count("BroadcastHashJoin"),
        "shuffled_hash_join": nodes.count("ShuffledHashJoin"),
        "broadcast_nl_join": nodes.count("BroadcastNestedLoopJoin"),
        "cartesian_product": nodes.count("CartesianProduct"),
        "window": nodes.count("Window") + nodes.count("WindowGroupLimit"),
    }
    return sig


def has_wholestage_codegen(df: DataFrame) -> bool:
    """True if any part of the plan compiles into whole-stage codegen.

    AQE wraps the whole plan in an opaque AdaptiveSparkPlan until
    execution, hiding codegen subtrees from every explain mode — so
    re-plan a fresh copy of the logical plan with AQE off and read the
    ``codegen`` dump (the physical strategy AQE stages also use)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        probe = df.alias("__codegen_probe")  # fresh QueryExecution
        dump = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            probe._jdf.queryExecution(), "codegen"
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    return "Found 0 WholeStageCodegen subtrees" not in dump
