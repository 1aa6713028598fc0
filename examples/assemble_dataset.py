"""End-to-end example: assembling a training dataset from a cleaned
corpus — the steps BETWEEN cleaning (examples/clean_corpus.py) and the
trainer's data loader.

Run: python examples/assemble_dataset.py   (reads testdata, prints a report)

Chains: quality floor (corpus-adaptive percentile) → leakage-safe
train/val/test split (near-dup clusters never straddle a boundary) →
per-source token budgets → mixture upsampling of rare languages →
deterministic training-order shuffle → sequence packing (both
contracts: concat-then-chunk and boundary-respecting FFD bins, with
the padding waste of the latter measured). Every step is
replayable: thresholds come from the corpus, randomness is the integer
LCG, ordering is the hash permutation.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators import dedup as dd
from architrave_project_apache_nifi_spark.operators import sampling as sp
from architrave_project_apache_nifi_spark.operators import textanalysis as ta
from architrave_project_apache_nifi_spark.operators.packing import (
    pack_bins,
    pack_sequences,
    packing_waste,
)
from architrave_project_apache_nifi_spark.operators.splits import (
    leakage_safe_split,
)
from architrave_project_apache_nifi_spark.session import get_spark


def main() -> None:
    spark = get_spark("example-assemble", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    # -- 1. corpus-adaptive quality floor (drop the worst quartile) -----
    floor = ta.adaptive_percentile_filter(
        docs, "doc_id", ta.token_count(F.col("text")), 0.25
    )
    kept = docs.join(
        floor.filter("is_kept = 1").select("doc_id"), "doc_id", "left_semi"
    )
    print("after quality floor:", kept.count(), "/", docs.count())

    # -- 2. leakage-safe split: near-dup clusters move as a unit --------
    cands = dd.minhash_lsh_candidates(kept, "doc_id", "text", 64, 64, 2)
    pairs = dd.verify_candidate_pairs(kept, cands, "doc_id", "text", 0.2, 2)
    split = leakage_safe_split(kept, pairs, "doc_id", "id_a", "id_b")
    by_split = {
        r["split"]: r["n"]
        for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    print("split sizes:", dict(sorted(by_split.items())))
    train = kept.join(
        split.filter("split = 'train'").select("doc_id"), "doc_id", "left_semi"
    )

    # -- 3. per-source token budgets ------------------------------------
    budget = sp.token_budget_filter(
        train, ["source"], "doc_id", ta.token_count(F.col("text")), 10_000
    )
    in_budget = train.join(
        budget.filter("in_budget = 1").select("doc_id"), "doc_id", "left_semi"
    )
    print("within token budget:", in_budget.count())

    # -- 4. upsample rare languages (deterministic LCG replication) -----
    rates = sp.temperature_rates(in_budget, ["lang"], alpha=0.5)
    # temperature_rates keeps ≤1; invert to upsample toward the mixture
    # instead: rate' = rate_max/rate capped at 2× (illustrative).
    up = rates.select(
        "lang", F.least(F.lit(2.0), 1.0 / F.col("rate")).alias("rate")
    )
    mixture = sp.replicate_by_rate(in_budget, up, ["lang"], "doc_id")
    print("after upsampling:", mixture.count())

    # -- 5. deterministic global shuffle + sequence packing -------------
    ordered = sp.shuffle_rank(
        mixture.select("doc_id", "lang", "text").dropDuplicates(["doc_id"]),
        "doc_id",
        n_shards=8,
    )
    packed = pack_sequences(
        ordered, "doc_id", "lang", ta.token_count(F.col("text")), budget=512
    )
    n_seqs = packed.agg(F.countDistinct("seq_id")).collect()[0][0]
    print("packed sequences:", n_seqs)

    # -- 6. the SFT-shaped alternative: boundary-respecting FFD bins ----
    # concat-then-chunk wastes zero tokens but splits documents across
    # sequence edges; pack_bins keeps every document whole and reports
    # the padding waste that contract costs
    bins = pack_bins(
        ordered, "doc_id", "lang", ta.token_count(F.col("text")), budget=512
    )
    for r in packing_waste(bins, 512).orderBy("stream").collect():
        print(
            f"ffd bins [{r['stream']}]: {r['n_bins']} bins, "
            f"waste {r['waste_frac']:.1%}, "
            f"{r['n_oversize_dropped']} oversize routed to chunking"
        )


if __name__ == "__main__":
    main()
