"""Connected components + canonical-document selection over near-dup
pair edges — the step that turns pairwise dedup evidence
(`dedup.minhash_lsh_candidates` → `dedup.verify_candidate_pairs`) into
an actual keep/drop decision per document, the way a training-data
pipeline consumes it.

Reference parity: the NiFi reference (final_template.xml) has no dedup
at all; this belongs to the §2.9 LLM-data-pipeline extension surface
(SURVEY.md §2.9), where clustering is the standard third stage of
MinHash dedup (candidates → verify → components → keep min-id).

Algorithm: bulk-synchronous min-label propagation with pointer
jumping. Each round does
  1. neighbor-min: ``comp(u) ← min(comp(u), min over neighbors v of
     comp(v))`` — one shuffle (join edges⋈labels + groupBy), and
  2. pointer jumping: ``comp(u) ← comp(comp(u))`` — one self-join,
     which halves the depth of any label-forwarding chain (bulk
     path compression).
With jumping, convergence is O(log d) rounds for diameter d instead of
O(d); near-dup components are band-collision cliques with tiny
diameter, so 2-4 rounds in practice. Every round cuts lineage with
``localCheckpoint`` so the plan does not grow with iterations (at
cluster scale, swap for ``checkpoint`` against a durable dir — same
call site, noted inline).

Scale shape (100 TB): per round the only wide ops are one equi-join of
edges against the label table and one groupBy(min) — both hash-
partitioned on the node id, no broadcast of anything O(N). The edge
set for dedup is LSH-candidate pairs, i.e. already ~linear in corpus
size, not quadratic. For adversarial graphs (long paths) the
alternating large-star/small-star formulation (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) bounds rounds
at O(log² n) with the same per-round shuffle budget; pointer jumping
gives the same effect here with simpler invariants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(``id``, ``comp``) for every node appearing in ``edges``, where
    ``comp`` is the minimum node id of the node's connected component.

    Deterministic (min-id labeling), converges in O(log diameter)
    rounds via pointer jumping; raises if ``max_iter`` rounds do not
    converge rather than returning a partially-propagated labeling.
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    und = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = (
        und.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    und = und.localCheckpoint(eager=True)
    for _ in range(max_iter):
        # Neighbor-min: one shuffle on the node id.
        nmin = (
            und.join(labels, und["dst"] == labels["id"])
            .groupBy(und["src"].alias("id"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = labels.alias("l").join(nmin.alias("n"), "id", "left").select(
            "id",
            F.least(
                F.col("l.comp"), F.coalesce(F.col("n.nbr_comp"), F.col("l.comp"))
            ).alias("comp"),
        )
        # Pointer jumping: comp ← comp(comp). Bulk path compression.
        jumped = (
            stepped.alias("a")
            .join(
                stepped.select(
                    F.col("id").alias("jid"), F.col("comp").alias("jcomp")
                ).alias("b"),
                F.col("a.comp") == F.col("b.jid"),
                "left",
            )
            .select(
                F.col("a.id").alias("id"),
                F.coalesce(F.col("b.jcomp"), F.col("a.comp")).alias("comp"),
            )
        )
        # At cluster scale use .checkpoint() against a durable dir here;
        # localCheckpoint keeps the local[32] iteration plan O(1).
        new_labels = jumped.localCheckpoint(eager=True)
        if (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .isEmpty()
        ):
            return new_labels
        labels = new_labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def canonical_docs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Per-document dedup decision: (``doc_id``, ``canonical_id``,
    ``is_kept``) where ``canonical_id`` is the min doc id of the
    document's near-dup component (itself for singletons) and
    ``is_kept`` = 1 exactly for the component representative — the row
    set a training pipeline keeps.

    The component table is at most |nodes-in-pairs| rows — for LSH
    dedup that is the duplicate subset, typically a small fraction of
    the corpus — joined back to ``docs`` on the id. Spark broadcasts it
    when small; at 100 TB the join is a plain hash join on the id, and
    the docs side never re-shuffles (id is the natural partition key).
    """
    comp = connected_components(pairs, src=a_col, dst=b_col)
    return (
        docs.select(F.col(id_col).cast("long").alias(id_col))
        .join(comp.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("comp", F.col(id_col)).alias("canonical_id"),
            (F.coalesce("comp", F.col(id_col)) == F.col(id_col))
            .cast("int")
            .alias("is_kept"),
        )
    )


def canonical_docs_best(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "n_chars",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """:func:`canonical_docs` with the production keep rule: keep the
    BEST-scoring member of each near-dup component, not the smallest
    id — dedup should discard the worse copies (truncated scrapes,
    boilerplate-padded mirrors), so the representative is
    ``argmax(score, tie -> min id)``. ``score_col`` is any per-doc
    quality signal (chars, quality_score, mean_logprob).

    The argmax is ``max(struct(score, -id))`` — a decomposable partial
    aggregation, so a corpus-sized mono-duplicate component collapses
    map-side (the skew-audit "rewritten algebraic" class; no per-key
    window anywhere). The component table stays bounded by the nodes
    that appear in ``pairs`` — for LSH dedup, the duplicate subset —
    and the join back to ``docs`` broadcasts when small; singletons
    are their own component and always kept.
    """
    comp = connected_components(pairs, src=a_col, dst=b_col)
    scored = (
        docs.select(
            F.col(id_col).cast("long").alias(id_col), F.col(score_col)
        )
        .join(comp.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            score_col,
            F.coalesce("comp", F.col(id_col)).alias("comp"),
        )
    )
    best = (
        scored.groupBy("comp")
        .agg(
            F.max(
                F.struct(
                    F.col(score_col).alias("s"),
                    (-F.col(id_col)).alias("nid"),
                )
            ).alias("b")
        )
        .select("comp", (-F.col("b.nid")).alias("canonical_id"))
    )
    return scored.join(best, "comp").select(
        id_col,
        "canonical_id",
        (F.col("canonical_id") == F.col(id_col)).cast("int").alias("is_kept"),
    )
