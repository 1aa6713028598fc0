"""Leakage-safe splitting + the round-3 incremental/budget operators.

The load-bearing property of ``leakage_safe_split`` is checked
directly: no verified near-dup pair may straddle a split boundary.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators import dedup as dd
from architrave_project_apache_nifi_spark.operators import sampling as sp
from architrave_project_apache_nifi_spark.operators import textanalysis as ta
from architrave_project_apache_nifi_spark.operators.splits import (
    assign_split,
    leakage_safe_split,
    split_bounds_sql,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_no_neardup_pair_straddles_a_split(spark):
    docs = _docs(spark)
    cands = dd.minhash_lsh_candidates(docs, "doc_id", "text", 64, 64, 2)
    pairs = dd.verify_candidate_pairs(docs, cands, "doc_id", "text", 0.2, 2)
    split = leakage_safe_split(docs, pairs, "doc_id", "id_a", "id_b")
    a = split.select(
        F.col("doc_id").alias("id_a"), F.col("split").alias("split_a")
    )
    b = split.select(
        F.col("doc_id").alias("id_b"), F.col("split").alias("split_b")
    )
    straddling = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
    )
    assert straddling.isEmpty()
    # All three splits are populated at default 90/5/5 on 500 docs.
    names = {r["split"] for r in split.select("split").distinct().collect()}
    assert names == {"train", "val", "test"}


def test_split_is_function_of_canonical_id(spark):
    docs = _docs(spark)
    empty_pairs = spark.createDataFrame([], "id_a long, id_b long")
    split = leakage_safe_split(docs, empty_pairs, "doc_id", "id_a", "id_b")
    # Singletons: canonical_id == doc_id, split = hash band of own id.
    rows = split.orderBy("doc_id").limit(5).collect()
    assert all(r["canonical_id"] == r["doc_id"] for r in rows)


def test_assign_split_validates_fractions(spark):
    with pytest.raises(ValueError, match="sum to 1"):
        assign_split(F.lit(1), (0.5, 0.4), ("a", "b"))
    with pytest.raises(ValueError, match="align"):
        assign_split(F.lit(1), (0.5, 0.5), ("a",))


def test_split_bounds_sql_matches_assign_split(spark):
    sql_case = split_bounds_sql(id_expr="id")
    df = spark.range(0, 200).select(
        F.col("id"),
        assign_split(F.col("id")).alias("s_col"),
        F.expr(sql_case.replace("id", "id")).alias("s_sql"),
    )
    assert df.filter(F.col("s_col") != F.col("s_sql")).isEmpty()


def test_dedup_incremental_store_roundtrip(spark, tmp_path):
    docs = _docs(spark)
    hist = docs.filter(F.col("doc_id") % 4 != 0)
    inc = docs.filter(F.col("doc_id") % 4 == 0)
    store_dir = str(tmp_path / "fp_store")
    dd.content_fingerprints(hist, "doc_id", "text").write.parquet(store_dir)
    store = spark.read.parquet(store_dir)
    out = dd.dedup_incremental(inc, store, "doc_id", "text")
    # Every incoming row is annotated; kept rows are store-new and
    # batch-unique.
    assert out.count() == inc.count()
    kept = out.filter(F.col("is_kept") == 1)
    assert kept.filter(F.col("dup_of_store") == 1).isEmpty()
    dup_fp = kept.groupBy("fp").count().filter(F.col("count") > 1)
    assert dup_fp.isEmpty()


def test_span_duplication_flags_shared_spans(spark):
    rows = [
        (1, "a b c d e f g h unique one"),
        (2, "a b c d e f g h unique two"),
        (3, "totally different words here nothing shared at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in dd.span_duplication(df, "doc_id", "text", span_n=8).collect()
    }
    # Docs 1 and 2 share the 8-token span "a b c d e f g h".
    assert out[1]["n_dup_spans"] >= 1 and out[2]["n_dup_spans"] >= 1
    assert out[3]["n_dup_spans"] == 0 and out[3]["is_dropped"] == 0


def test_token_budget_boundary_doc_never_truncated(spark):
    rows = [("s", i, "w " * 10) for i in range(1, 6)]  # 10 tokens each
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    out = sp.token_budget_filter(
        df, ["source"], "doc_id", ta.token_count(F.col("text")), budget=25
    )
    kept = sorted(
        r["doc_id"] for r in out.filter(F.col("in_budget") == 1).collect()
    )
    # 10 + 10 = 20 <= 25; adding doc 3 reaches 30 > 25 → exactly 2 kept,
    # the boundary doc is dropped whole, never truncated.
    assert kept == [1, 2]


def test_adaptive_percentile_filter_quartile(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a b"), (3, "a b c"), (4, "a b c d")],
        "doc_id long, text string",
    )
    out = ta.adaptive_percentile_filter(
        df, "doc_id", ta.token_count(F.col("text")), 0.25
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    # percentile([1,2,3,4], .25) = 1.75 → keep metric >= 1.75 → docs 2-4.
    assert rows[1]["is_kept"] == 0
    assert all(rows[i]["is_kept"] == 1 for i in (2, 3, 4))
    assert abs(rows[1]["threshold"] - 1.75) < 1e-9


def test_replicate_by_rate_copy_counts(spark):
    docs = _docs(spark)
    rates = spark.createDataFrame(
        [("de", 2.0), ("zh", 0.0)], "lang string, rate double"
    )
    out = sp.replicate_by_rate(docs, rates, ["lang"], "doc_id")
    # Integer rate 2.0 → exactly 2 copies of every de row.
    de_in = docs.filter(F.col("lang") == "de").count()
    assert out.filter(F.col("lang") == "de").count() == 2 * de_in
    per_doc = (
        out.filter(F.col("lang") == "de").groupBy("doc_id").count().collect()
    )
    assert all(r["count"] == 2 for r in per_doc)
    # Rate 0 → stratum vanishes; absent strata default to 1 copy.
    assert out.filter(F.col("lang") == "zh").isEmpty()
    en_in = docs.filter(F.col("lang") == "en").count()
    assert out.filter(F.col("lang") == "en").count() == en_in


def test_shuffle_rank_is_dense_permutation_and_shard_invariant(spark):
    docs = _docs(spark)
    n = docs.count()
    r8 = sp.shuffle_rank(docs, "doc_id", n_shards=8)
    ranks = sorted(r["rank"] for r in r8.select("rank").collect())
    assert ranks == list(range(n))
    r1 = sp.shuffle_rank(docs, "doc_id", n_shards=1)
    joined = r8.select("doc_id", F.col("rank").alias("r8")).join(
        r1.select("doc_id", F.col("rank").alias("r1")), "doc_id"
    )
    assert joined.filter(F.col("r8") != F.col("r1")).isEmpty()
