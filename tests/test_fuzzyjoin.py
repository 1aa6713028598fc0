from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.fuzzyjoin import (
    block_length_band,
    block_prefix,
    block_suffix,
    fuzzy_join,
    fuzzy_self_join,
)
from architrave_project_apache_nifi_spark.operators.sampling import (
    weighted_sample,
)

SF_DIR = "/root/testdata/sf0.001"


def _names(spark, rows):
    return spark.createDataFrame(rows, "id long, name string")


def test_self_join_finds_typo_pairs(spark):
    df = _names(
        spark,
        [
            (1, "john smith"),
            (2, "jon smith"),  # dist 1, shares suffix
            (3, "john smyth"),  # dist 1 vs 1, shares prefix
            (4, "completely different"),
        ],
    )
    out = fuzzy_self_join(df, "id", "name", max_dist=2)
    pairs = {(r["id_a"], r["id_b"]): r["dist"] for r in out.collect()}
    assert pairs[(1, 2)] == 1
    assert pairs[(1, 3)] == 1
    assert all(4 not in p for p in pairs)


def test_self_join_no_duplicate_pairs_across_blocks(spark):
    # identical strings share BOTH prefix and suffix blocks — the pair
    # must still appear exactly once
    df = _names(spark, [(1, "same name"), (2, "same name")])
    out = fuzzy_self_join(df, "id", "name", max_dist=0)
    assert out.count() == 1


def test_recall_vs_bruteforce_on_parts(spark):
    parts = (
        spark.read.parquet(f"{SF_DIR}/part.parquet")
        .select(F.col("p_partkey").alias("id"), F.col("p_name").alias("name"))
        .limit(300)
    )
    blocked = fuzzy_self_join(parts, "id", "name", max_dist=2)
    a = parts.select(F.col("id").alias("ia"), F.col("name").alias("na"))
    b = parts.select(F.col("id").alias("ib"), F.col("name").alias("nb"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("ia") < F.col("ib"))
        .filter(F.levenshtein("na", "nb") <= 2)
    )
    got = {(r["id_a"], r["id_b"]) for r in blocked.collect()}
    want = {(r["ia"], r["ib"]) for r in brute.collect()}
    assert got <= want  # blocking never invents pairs
    recall = len(got & want) / max(len(want), 1)
    assert recall >= 0.8, f"recall {recall}"


def test_two_table_join_and_column_guard(spark):
    left = spark.createDataFrame([(1, "acme corp")], "lid long, lname string")
    right = spark.createDataFrame([(9, "acme korp")], "rid long, rname string")
    out = fuzzy_join(left, right, "lname", "rname", max_dist=1)
    assert out.count() == 1 and out.collect()[0]["dist"] == 1
    with pytest.raises(ValueError):
        fuzzy_join(left, left, "lname", "lname")


def test_length_band_blocker(spark):
    df = _names(spark, [(1, "ab"), (2, "abc"), (3, "abcdefghij")])
    out = fuzzy_self_join(
        df, "id", "name", max_dist=2, blockers=[lambda c: block_length_band(c, 4)]
    )
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (1, 2) in pairs and (1, 3) not in pairs


def test_weighted_sample_deterministic_and_biased(spark):
    rows = [(i, "heavy" if i % 2 == 0 else "light", 10.0 if i % 2 == 0 else 1.0)
            for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, grp string, w double")
    s1 = weighted_sample(df, "id", "w", 200)
    s2 = weighted_sample(df, "id", "w", 200)
    assert sorted(r["id"] for r in s1.collect()) == sorted(
        r["id"] for r in s2.collect()
    )
    counts = {r["grp"]: r["count"] for r in s1.groupBy("grp").count().collect()}
    # 10:1 weights → heavy rows dominate the sample decisively
    assert counts.get("heavy", 0) > 3 * counts.get("light", 1)


def test_weighted_sample_excludes_nonpositive(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, -1.0), (3, 5.0)], "id long, w double"
    )
    ids = {r["id"] for r in weighted_sample(df, "id", "w", 10).collect()}
    assert ids == {3}


def test_entity_resolution_composition(spark):
    """fuzzy pairs → connected components → canonical entity per
    typo-cluster: the full record-linkage pipeline composes from
    existing operators."""
    from architrave_project_apache_nifi_spark.operators.cluster import (
        canonical_docs,
    )

    df = _names(
        spark,
        [
            (1, "john smith"),
            (2, "jon smith"),   # ~1 edit from 1
            (3, "john smyth"),  # ~1 edit from 1 (chained into the same entity)
            (7, "acme corp"),
            (8, "acme korp"),
            (9, "zebra unrelated"),
        ],
    )
    pairs = fuzzy_self_join(df, "id", "name", max_dist=2)
    decisions = canonical_docs(df, pairs, id_col="id")
    canon = {r["id"]: r["canonical_id"] for r in decisions.collect()}
    assert canon[1] == canon[2] == canon[3] == 1
    assert canon[7] == canon[8] == 7
    assert canon[9] == 9
    kept = {r["id"] for r in decisions.filter(F.col("is_kept") == 1).collect()}
    assert kept == {1, 7, 9}


def test_negative_pairs_deterministic_and_valid(spark):
    from architrave_project_apache_nifi_spark.operators.sampling import (
        negative_pairs,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = negative_pairs(emb, "vec_id", k=4, dense=True)
    rows = out.collect()
    assert len(rows) == emb.count() * 4
    ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    for r in rows:
        assert r["neg_id"] in ids and r["neg_id"] != r["vec_id"]
    again = negative_pairs(emb, "vec_id", k=4, dense=True).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_negative_pairs_sparse_ids_map_into_actual_set(spark):
    from architrave_project_apache_nifi_spark.operators.sampling import (
        negative_pairs,
    )

    df = spark.createDataFrame(
        [(7,), (100,), (5003,), (9000,), (12345,)], "id long"
    )
    out = negative_pairs(df, "id", k=3)
    rows = out.collect()
    assert len(rows) == 15
    ids = {7, 100, 5003, 9000, 12345}
    for r in rows:
        assert r["neg_id"] in ids and r["neg_id"] != r["id"]


def test_pair_set_metrics_arithmetic(spark):
    from architrave_project_apache_nifi_spark.operators.evaluation import (
        pair_set_metrics,
    )

    pred = spark.createDataFrame([(1, 2), (3, 4), (5, 6)], "id_a long, id_b long")
    truth = spark.createDataFrame([(2, 1), (3, 4), (7, 8)], "id_a long, id_b long")
    r = pair_set_metrics(pred, truth).collect()[0]
    assert (r["n_predicted"], r["n_truth"], r["n_common"]) == (3, 3, 2)
    assert abs(r["precision"] - 2 / 3) < 1e-12
    assert abs(r["recall"] - 2 / 3) < 1e-12
    assert abs(r["f1"] - 2 / 3) < 1e-12
    # empty predicted → NULL precision, not crash
    empty = spark.createDataFrame([], "id_a long, id_b long")
    r2 = pair_set_metrics(empty, truth).collect()[0]
    assert r2["precision"] is None and r2["recall"] == 0.0


def test_pair_set_metrics_drops_null_endpoint_edges(spark):
    """least/greatest skip NULLs — a (1, NULL) edge must be dropped,
    not counted as a degenerate (1, 1) pair."""
    from architrave_project_apache_nifi_spark.operators.evaluation import (
        pair_set_metrics,
    )

    pred = spark.createDataFrame(
        [(1, None), (None, 2), (3, 4)], "id_a long, id_b long"
    )
    truth = spark.createDataFrame([(1, 1), (3, 4)], "id_a long, id_b long")
    r = pair_set_metrics(pred, truth).collect()[0]
    assert (r["n_predicted"], r["n_truth"], r["n_common"]) == (1, 2, 1)
