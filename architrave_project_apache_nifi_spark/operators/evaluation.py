"""Pair-set evaluation — precision/recall/F1 of a candidate pair
method against ground truth, as a DataFrame op.

Every approximate pair generator in this engine (LSH banding, fuzzy
blocking, SimHash buckets, LSH-bucketed gram blocks) trades recall
for cost; this module makes the tradeoff a MEASURED, queryable number
instead of a docstring claim: run the cheap method and the exact one
on (a sample of) the data, and report the overlap.

One row out: (n_predicted, n_truth, n_common, precision, recall, f1).
Cost: two semi-join counts over pair sets — each pair set is already
the small output of its generator; the metric never touches the
underlying corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pair_set_metrics(
    predicted: DataFrame,
    truth: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Pairs are canonicalized (min, max) before comparison so
    direction never miscounts; duplicates collapse. Empty-set edges:
    precision is NULL when nothing was predicted, recall NULL when
    truth is empty (SQL division semantics — explicit, not 0)."""
    def canon(df: DataFrame) -> DataFrame:
        # least/greatest skip NULLs, so an edge with one NULL endpoint
        # would degenerate to (x, x) and be counted; drop such edges.
        return (
            df.where(F.col(a_col).isNotNull() & F.col(b_col).isNotNull())
            .select(
                F.least(F.col(a_col), F.col(b_col)).alias("a"),
                F.greatest(F.col(a_col), F.col(b_col)).alias("b"),
            )
            .distinct()
        )

    p = canon(predicted)
    t = canon(truth)
    n_p = p.count()
    n_t = t.count()
    n_c = p.join(t, ["a", "b"], "left_semi").count()
    spark = predicted.sparkSession
    from ..tables import local_df

    # local_df (r12): one-row LocalTableScan, no Python stage per eval
    row = local_df(
        spark, [(n_p, n_t, n_c)], "n_predicted long, n_truth long, n_common long"
    )
    prec = F.when(F.col("n_predicted") > 0, F.col("n_common") / F.col("n_predicted"))
    rec = F.when(F.col("n_truth") > 0, F.col("n_common") / F.col("n_truth"))
    return row.select(
        "n_predicted",
        "n_truth",
        "n_common",
        prec.alias("precision"),
        rec.alias("recall"),
        F.when(
            (prec + rec) > 0, 2 * prec * rec / (prec + rec)
        ).alias("f1"),
    )
