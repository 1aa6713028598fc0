"""Physical-plan assertions (SURVEY.md §4): prove that the declarative
queries actually get predicate pushdown, column pruning, broadcast
joins, and bounded shuffles — the properties the 100 TB design relies
on — instead of assuming Catalyst did the right thing."""

from __future__ import annotations

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.lookup import lookup_record
from architrave_project_apache_nifi_spark.operators.scd2 import scd2_apply, scd2_build
from architrave_project_apache_nifi_spark.plans import inspect as pi
from architrave_project_apache_nifi_spark.queries import REGISTRY
from architrave_project_apache_nifi_spark.tables import load

SF_DIR = "/root/testdata/sf0.001"


def test_q6_filters_reach_parquet_scan(spark):
    df = REGISTRY["q6_revenue_change"].fn(spark, SF_DIR)
    pi.assert_pushed_filter(df, "l_shipdate")
    pi.assert_pushed_filter(df, "l_discount")
    pi.assert_pushed_filter(df, "l_quantity")


def test_q6_reads_only_needed_columns(spark):
    df = REGISTRY["q6_revenue_change"].fn(spark, SF_DIR)
    # lineitem has 16 columns; Q6 needs 4 (shipdate, discount, quantity,
    # extendedprice)
    pi.assert_pruned_columns(df, 4)


def test_q1_pushdown_and_pruning(spark):
    df = REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR)
    pi.assert_pushed_filter(df, "l_shipdate")
    pi.assert_pruned_columns(df, 6)


def test_q3_broadcasts_dimension(spark):
    df = REGISTRY["q3_shipping_priority"].fn(spark, SF_DIR)
    pi.assert_broadcast_join(df)


def test_q5_broadcasts_all_dims(spark):
    df = REGISTRY["q5_local_supplier_volume"].fn(spark, SF_DIR)
    plan = pi.formatted_plan(df)
    # all four dimension joins broadcast; the fact table shuffles only
    # for its own join key / aggregation
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_lookup_join_broadcasts_prefiltered_dim(spark):
    orders = load(spark, "orders", SF_DIR)
    customer = load(spark, "customer", SF_DIR).withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    df = lookup_record(orders, customer, "o_custkey", prefilter=F.col("c_acctbal") > 0)
    pi.assert_broadcast_join(df)
    # the Is_current='Y'-style prefilter reaches the dimension scan
    pi.assert_pushed_filter(df, "c_acctbal")


def test_scd2_build_single_shuffle(spark):
    events = load(spark, "events", SF_DIR)
    hist = scd2_build(events, "user_id", "ts", ("event_id",))
    assert pi.count_shuffles(hist) == 1, pi.formatted_plan(hist)


def test_scd2_apply_never_shuffles_history(spark):
    """The merge's contract at scale: history (the 100 TB side) joins
    the per-key change summary via BROADCAST — the only hash exchanges
    in the plan must be on the (small) changes side."""
    events = load(spark, "events", SF_DIR)
    first = events.filter(F.col("event_type") != "purchase")
    second = events.filter(F.col("event_type") == "purchase")
    hist = scd2_build(first, "user_id", "ts", ("event_id",))
    merged = scd2_apply(hist, second, "user_id", "ts", ("event_id",))
    pi.assert_broadcast_join(merged)


def test_whole_stage_codegen_on_hot_paths(spark):
    for name in ("q1_pricing_summary", "route_events", "agg_percentiles_by_type"):
        df = REGISTRY[name].fn(spark, SF_DIR)
        assert pi.has_wholestage_codegen(df), f"{name} fell out of codegen"


def test_q10_broadcasts_dims_and_pushes_returnflag(spark):
    df = REGISTRY["q10_returned_items"].fn(spark, SF_DIR)
    plan = pi.formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan  # customer + nation
    pi.assert_pushed_filter(df, "l_returnflag")


def test_q14_pushes_shipdate_range(spark):
    df = REGISTRY["q14_promo_revenue"].fn(spark, SF_DIR)
    pi.assert_pushed_filter(df, "l_shipdate")
    pi.assert_broadcast_join(df)


def test_q19_extracts_per_side_conjuncts(spark):
    """The disjunctive predicate must not block pushdown entirely:
    Catalyst extracts brand/size/quantity conjuncts below the join."""
    df = REGISTRY["q19_discounted_revenue"].fn(spark, SF_DIR)
    plan = pi.formatted_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    # the OR of quantity ranges reaches the lineitem scan, the OR of
    # brand/size conjuncts reaches the part scan
    assert any("l_quantity" in ln for ln in pushed), plan
    assert any("p_brand" in ln for ln in pushed), plan


def test_salted_join_has_no_salt_in_output_and_spreads(spark):
    from architrave_project_apache_nifi_spark.operators.skew import SALT

    df = REGISTRY["salted_join_order_volume_by_nation"].fn(spark, SF_DIR)
    assert SALT not in df.columns


def test_scd2_build_with_tombstones_single_shuffle(spark):
    """Tombstones ride the same key window: the soft-delete filter adds
    ZERO shuffles to the build plan."""
    events = load(spark, "events", SF_DIR).withColumn(
        "__tomb", F.col("event_type") == "error"
    )
    hist = scd2_build(events, "user_id", "ts", ("event_id",), tombstone_col="__tomb")
    assert pi.count_shuffles(hist) == 1, pi.formatted_plan(hist)


def test_q8_single_fact_shuffle_all_dims_broadcast(spark):
    df = REGISTRY["q8_market_share"].fn(spark, SF_DIR)
    plan = pi.formatted_plan(df)
    # part, customer, nation x2, region, supplier all broadcast; the only
    # hash exchanges are the lineitem-orders edge + the tiny final agg
    assert plan.count("BroadcastHashJoin") >= 6, plan
    assert pi.count_shuffles(df) <= 3, plan


def test_q9_part_filter_prunes_fact_before_join(spark):
    df = REGISTRY["q9_product_type_profit"].fn(spark, SF_DIR)
    plan = pi.formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 3, plan
    pi.assert_pushed_filter(df, "p_name")


def test_q2_decorrelated_min_reuses_partkey_exchange(spark):
    df = REGISTRY["q2_min_cost_supplier"].fn(spark, SF_DIR)
    plan = pi.formatted_plan(df)
    # the min-agg and the join-back both hash on l_partkey; supplier /
    # nation / region / part broadcast
    assert plan.count("BroadcastHashJoin") >= 4, plan


def test_q15_revenue_view_max_broadcasts(spark):
    # the revenue view is persist()'d (computed once for its two
    # consumers, recomputable lineage — unlike localCheckpoint it
    # survives executor loss); the cached relation keeps its lineage
    # in the plan, so exactly ONE shuffle is visible (the view's own
    # groupBy); the 1-row max and the supplier dim must broadcast —
    # no additional shuffle after the view
    df = REGISTRY["q15_top_supplier"].fn(spark, SF_DIR)
    plan = pi.formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "InMemoryRelation" in plan, plan  # the view is shared, not recomputed
    # 1 shuffle (the view's own groupBy) in a fresh session; when the
    # CacheManager reuses an earlier identical view, the rendered
    # cached-child plan can surface its exchange as a second numbered
    # node — either way nothing beyond the view + tiny agg shuffles
    assert pi.count_shuffles(df) <= 2, plan


def test_q16_anti_join_broadcasts_blacklist(spark):
    df = REGISTRY["q16_supplier_part_counts"].fn(spark, SF_DIR)
    plan = pi.formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    # NOT IN becomes a broadcast anti join, not a shuffle
    assert "LeftAnti" in plan, plan


def test_q17_correlated_avg_single_fact_scan_per_side(spark):
    df = REGISTRY["q17_small_quantity_revenue"].fn(spark, SF_DIR)
    plan = pi.formatted_plan(df)
    pi.assert_broadcast_join(df)
    # decorrelated avg shuffles on partkey once; final agg is 1 row
    assert pi.count_shuffles(df) <= 3, plan


def test_scd2_as_of_single_key_window_shuffle(spark):
    # the point-in-time read costs exactly the build's one key-window
    # shuffle; both interval bounds are constant-folded filters on the
    # window output (they cannot reach the parquet scan — valid_from /
    # valid_until are window-computed — but they add no exchange)
    df = REGISTRY["scd2_as_of"].fn(spark, SF_DIR)
    plan = pi.formatted_plan(df)
    assert pi.count_shuffles(df) == 1, plan
    assert "Window" in plan, plan


def test_pipeline_clean_corpus_broadcasts_and_bounded_shuffles(spark):
    # the composed pipeline's scale contract: the Gopher gate is a
    # scan-side filter (no flags-table join-back); the genuinely-small
    # sides (benchmark grams, per-lang rates) broadcast; the corpus-
    # sized edges (dedup text-groupBy + id semi-joins, gram explode/
    # join, per-lang counts) shuffle linearly — every exchange is a
    # key-hash of corpus-or-smaller data, never a cartesian pair space
    df = REGISTRY["pipeline_clean_corpus"].fn(spark, SF_DIR)
    plan = pi.formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    # 1-row scalar broadcasts (the rate normalizer's max) legitimately
    # plan as BroadcastNestedLoop; an unbroadcast CartesianProduct is
    # the pair-space blowup this test forbids
    assert "CartesianProduct" not in plan, plan
    # 26 = the round-4 count after ngram_decontaminate adopted the
    # _shingle_sets barrier pair (row-sized, one row per doc — the
    # projection-collapse fix measured minutes→seconds at sf1); the
    # exact number is pinned per-query by test_plan_goldens.py, this
    # bound only guards against pair-space regressions
    assert pi.count_shuffles(df) <= 26, plan


def test_dedup_incremental_joins_on_hash_never_text(spark):
    df = REGISTRY["dedup_incremental"].fn(spark, SF_DIR)
    plan = pi.formatted_plan(df)
    # The store side aggregates/joins on the 8-byte fp — document text
    # must not appear in any join condition or shuffle key.
    join_lines = [
        ln for ln in plan.splitlines() if "Join" in ln or "hashpartitioning" in ln
    ]
    assert join_lines and not any("text" in ln for ln in join_lines), plan


def test_quality_adaptive_floor_broadcasts_scalar_threshold(spark):
    df = REGISTRY["quality_adaptive_floor"].fn(spark, SF_DIR)
    pi.assert_broadcast_join(df)
    # The corpus branch is map-only into the join: the plan's only
    # exchanges feed the scalar percentile aggregation (≤2: partials →
    # ObjectHashAggregate), never re-partition the documents.
    plan = pi.formatted_plan(df)
    assert pi.count_shuffles(df) <= 2, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_mixture_upsample_is_broadcast_plus_generator(spark):
    df = REGISTRY["mixture_upsample"].fn(spark, SF_DIR)
    pi.assert_broadcast_join(df)
    plan = pi.formatted_plan(df)
    assert "Generate" in plan, plan  # explode(sequence(...)) fan-out
    # Map-only after the broadcast: the corpus never hits an exchange.
    assert pi.count_shuffles(df) == 0, plan


def test_token_budget_single_stratum_shuffle(spark):
    df = REGISTRY["token_budget_per_source"].fn(spark, SF_DIR)
    # One exchange total: hash partitioning by source for the window.
    assert pi.count_shuffles(df) == 1, pi.formatted_plan(df)


def test_training_order_no_corpus_single_partition_window(spark):
    df = REGISTRY["training_order"].fn(spark, SF_DIR)
    plan = pi.formatted_plan(df)
    # The corpus windows per hash-range shard (hashpartitioning); the
    # only SinglePartition exchange feeds the <= n_shards offset rows.
    corpus_single = [
        ln
        for ln in plan.splitlines()
        if "Exchange SinglePartition" in ln
    ]
    assert len(corpus_single) <= 1, plan
    assert "hashpartitioning(__shard" in plan, plan


# --- round-3 session-3 extension entries -----------------------------------


def test_doc_chunking_is_shuffle_free(spark):
    df = REGISTRY["doc_chunking"].fn(spark, SF_DIR)
    pi.assert_no_shuffle(df)
    pi.assert_pruned_columns(df, 2)  # doc_id + text only


def test_quantize_is_shuffle_free_and_pruned(spark):
    df = REGISTRY["embedding_quantize_int8"].fn(spark, SF_DIR)
    pi.assert_no_shuffle(df)


def test_unit_dedup_two_row_sized_shuffles(spark):
    df = REGISTRY["dedup_unit_firstseen"].fn(spark, SF_DIR)
    # unit-hash window + doc-id regroup; nothing else
    assert pi.count_shuffles(df) == 2, pi.formatted_plan(df)


def test_incremental_agg_partial_before_every_exchange(spark):
    df = REGISTRY["incremental_agg_merge"].fn(spark, SF_DIR)
    plan = pi.formatted_plan(df)
    # two state builds + one merge, each with map-side partial aggs
    assert plan.count("HashAggregate") >= 4, plan


def test_weighted_sample_plans_as_take_ordered(spark):
    df = REGISTRY["weighted_sample_events"].fn(spark, SF_DIR)
    plan = pi.formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_zorder_code_single_bounds_exchange(spark):
    df = REGISTRY["zorder_code"].fn(spark, SF_DIR)
    plan = pi.formatted_plan(df)
    # the 1-row bounds agg broadcasts; the events side stays map-only
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "Exchange hashpartitioning(event_id" not in plan, plan


def test_snapshot_diff_one_key_shuffle_per_side(spark):
    df = REGISTRY["snapshot_diff_cdc"].fn(spark, SF_DIR)
    plan = pi.formatted_plan(df)
    assert "SortMergeJoin FullOuter" in plan or "ShuffledHashJoin FullOuter" in plan or "FullOuter" in plan, plan


def test_bloom_bitmap_broadcasts(spark):
    df = REGISTRY["bloom_pruned_join"].fn(spark, SF_DIR)
    pi.assert_broadcast_join(df)
