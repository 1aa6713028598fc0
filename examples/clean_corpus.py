"""End-to-end example: training-corpus cleaning with the §2.9 operators.

Run: python examples/clean_corpus.py   (reads testdata, prints a report)

Chains: WARC container ingest (the format crawl corpora actually land
in — record framing parse) → HTML boilerplate extraction (tag strip +
C4 line gate) → Gopher-rule gate (well-formedness + the §A1.1
repetition suite) → normalization → bigram-LM quality floor → exact
dedup → MinHash-LSH near-dup clustering (bands picked by lsh_plan,
keep-best canonicalization) → benchmark decontamination → CCNet
perplexity gate (reference-trained trigram LM, keep head+middle) →
DSIR importance selection (target-distribution resampling) → DoReMi
domain reweighting (EG round over the same LM's losses) → temperature
mixture sampling — the pipeline a 100 TB pretraining corpus runs, here
on the sf0.001 documents table.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators import (
    decontaminate as dc,
)
from architrave_project_apache_nifi_spark.operators import dedup as dd
from architrave_project_apache_nifi_spark.operators import html as html_ops
from architrave_project_apache_nifi_spark.operators import lm as lmod
from architrave_project_apache_nifi_spark.operators import sampling as sp
from architrave_project_apache_nifi_spark.operators import selection as sel
from architrave_project_apache_nifi_spark.operators import textanalysis as ta
from architrave_project_apache_nifi_spark.operators.cluster import (
    canonical_docs_best,
)
from architrave_project_apache_nifi_spark.session import get_spark
from architrave_project_apache_nifi_spark.sources import warc as wc


def main() -> None:
    spark = get_spark("example-clean", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    # 1000 docs: 32 shuffle partitions would spread every one of this
    # pipeline's ~dozen aggregations over mostly-empty tasks
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n0 = docs.count()

    # 0a. WARC container ingest — crawl corpora land as WARC files
    # (CommonCrawl), not one-page-per-parquet-row. The example
    # synthesizes that landed form: each doc becomes an HTTP response
    # wrapped in a crawl-shaped markup shell (nav list, script, style,
    # comment, entity-bearing footer) inside a WARC/1.0 response
    # record; 20 records concatenate into one blob standing in for a
    # landed .warc file; the PRODUCTION framing parser
    # (warc_records_from_binary — the same mapInPandas path
    # read_warc_records drives from a binaryFile scan) splits them
    # back into (target_uri, html) pages.
    did = F.col("doc_id").cast("string")
    shell = F.concat(
        F.lit(
            "<html><head><script>var nav = 1 < 2;</script>"
            "<style>li { color: blue; }</style></head>"
            "<body><!-- header --><ul><li>Home</li><li>About</li></ul><p>"
        ),
        F.col("text"),
        F.lit("</p><div>&copy; 2026</div></body></html>"),
    )
    rec = wc.warc_response_record_col(
        did, F.concat(F.lit("http://crawl.example/doc/"), did), shell
    )
    blobs = wc.warc_blobs(docs, "doc_id", rec, 50, path_prefix="mem://part-")
    pages = (
        wc.warc_records_from_binary(blobs)
        .filter("parse_error IS NULL AND http_status = 200")
        .select(
            F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
            .cast("long")
            .alias("doc_id"),
            F.col("text").alias("html"),
        )
        # crawl metadata the corpus tables carry (lang, source,
        # n_chars) rides back in by doc key; on a real crawl these are
        # derived from the record itself post-parse
        .join(docs.drop("text"), "doc_id")
    )

    # 0b. HTML boilerplate extraction — recover the body with the
    # tag-strip chain plus the line-level boilerplate gate. The gate
    # runs with require_terminal_punct=False because the synthetic
    # word-soup body has no sentence punctuation (a real crawl corpus
    # keeps the default C4 rule); the short nav/footer lines (<3
    # words) drop out. Dropping them is not cosmetic: a shell line
    # surviving into every document would hand all 1000 docs shared
    # shingles and densify the near-dup candidate graph toward n^2 —
    # boilerplate removal is exactly what keeps LSH-based dedup
    # near-linear on crawl corpora.
    extracted = html_ops.extract_html_text(pages, "html", c4_filter=False)
    per_page = extracted.withColumn(
        "text",
        html_ops.c4_keep_lines(
            F.col("text"), min_words=3, require_terminal_punct=False
        ),
    )
    # cross-document pass: any line shared by >3 docs is boilerplate
    # the per-page heuristics missed (here: none — the shell lines are
    # already gone — but exact-duplicate doc bodies in >3 copies drop
    # too, which is why it runs BEFORE near-dup: shared lines would
    # densify the LSH candidate graph)
    docs = html_ops.drop_boilerplate_lines(
        per_page, "text", "doc_id", max_docs=3
    ).localCheckpoint(eager=True)
    # localCheckpoint, NOT persist: a persist caches EXECUTION but the
    # logical plan still carries the ~20-step regexp chain, which
    # Catalyst re-inlines into every downstream expression referencing
    # `text` (the gram builders mention it dozens of times) and then
    # re-analyzes per action — measured 30x driver-side planning
    # overhead on the dedup stage. The checkpoint truncates the plan
    # itself; at 100 TB the extracted corpus lands to parquet, which is
    # the same barrier.

    # 1. heuristic gate + normalization (map-only, composes with the
    # scan), then the repetition half of the Gopher gate and a
    # bigram-LM floor (drop the least-predictable 10%). The absolute
    # Table-A1 conjunction (repetition_keep) is calibrated for natural
    # language; this synthetic word-soup corpus duplicates nearly every
    # 5-gram, so the example gates corpus-adaptively instead: drop the
    # most-repetitive decile by duplicated-5-gram character coverage.
    gated = docs.filter(ta.gopher_keep(F.col("text"))).withColumn(
        "text", ta.normalize_text(F.col("text"))
    )
    # rep and lm are each consumed TWICE (percentile agg + join-back);
    # without a persist the explode/agg pipelines replay through
    # lineage for every consumer — measured 40% of the example's wall
    rep = ta.repetition_features(
        gated, "text", "doc_id", line_delim=r"\s+"
    ).persist()
    rep_ceiling = rep.agg(
        F.expr("percentile(dup_5gram_char_frac, 0.90)").alias("c")
    )
    rep_keep = (
        rep.join(F.broadcast(rep_ceiling))
        .filter(F.col("dup_5gram_char_frac") <= F.col("c"))
        .select("doc_id")
    )
    gated = gated.join(rep_keep, "doc_id", "left_semi")
    lm = ta.bigram_logprob(gated, "text", "doc_id").persist()
    floor = lm.agg(F.expr("percentile(mean_logprob, 0.10)").alias("f"))
    lm_keep = (
        lm.join(F.broadcast(floor))
        .filter(F.col("mean_logprob") >= F.col("f"))
        .select("doc_id")
    )
    gated = gated.join(lm_keep, "doc_id", "left_semi").localCheckpoint(
        eager=True
    )
    rep.unpersist()
    lm.unpersist()
    # barrier: the two quality gates are AGGREGATIONS (gram counts, LM
    # tables), and every downstream stage (minhash, verify, decontam)
    # would replay them through lineage — and, worse, re-ANALYZE their
    # gram-explosion expression trees on every action (the same
    # planning-overhead trap as the extraction stage above, measured
    # there at ~30x). Truncate the plan once. At 100 TB this is a
    # parquet checkpoint, not a cache.
    n1 = gated.count()

    # 2. exact dedup (keep the smallest id per identical text)
    keep_ids = gated.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    deduped = gated.join(keep_ids.select("doc_id"), "doc_id", "left_semi")
    n2 = deduped.count()

    # 3. near-dup clustering: LSH candidates (band count from the
    # S-curve tuner) → exact verify → components → keep the BEST copy
    # per component (longest doc), not the smallest id
    bands, rows, est = dd.lsh_plan(64, 0.2)
    print(f"lsh plan     {bands} bands x {rows} rows (knee ~{est:.2f})")
    cands = dd.minhash_lsh_candidates(deduped, "doc_id", "text", 64, bands, 2)
    pairs = dd.verify_candidate_pairs(deduped, cands, "doc_id", "text", 0.2, 2)
    decisions = canonical_docs_best(deduped, pairs, "doc_id", "n_chars")
    survivors = deduped.join(
        decisions.filter(F.col("is_kept") == 1).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    n3 = survivors.count()

    # 4. benchmark decontamination (docs sharing a 5-gram with the bench)
    bench = docs.filter(F.col("doc_id") % 10 == 7)
    corpus = survivors.filter(F.col("doc_id") % 10 != 7)
    flags = dc.ngram_decontaminate(corpus, bench, "doc_id", "text", 5)
    clean = corpus.join(
        flags.filter(F.col("is_contaminated") == 0).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    n4 = clean.count()

    # 5. DSIR importance selection (Xie et al. 2023): keep the docs
    # that LOOK LIKE the target distribution (here: the 'en' slice
    # stands in for a curated target) — the "is it the KIND of text
    # we want" step between the absolute quality gates above and the
    # composition control below. Two bounded broadcast log-prob
    # tables; Gumbel top-k keeps 80% of survivors.
    # Barrier first: dsir_logweights runs bounded stat jobs of its
    # own, and without a plan truncation each would replay the whole
    # LSH/verify/decontaminate lineage above (the same trap the two
    # earlier checkpoints document). (dsir_resample additionally
    # checkpoints its SCORED weights internally since r12, so the
    # explode+joins+agg lineage pays once regardless of the caller.)
    clean = clean.localCheckpoint(eager=True)
    target = clean.filter(F.col("lang") == "en").select("doc_id", "text")

    # 4b. CCNet perplexity gate (Wenzek et al. 2019): trigram LM
    # trained on the reference slice scores every survivor; keep
    # head+middle per language (the LLaMA recipe). ONE scoring pass
    # carries both lang (for the bucket) and source (reused by the
    # DoReMi round below); the approx-percentile bucketer is the
    # production path — no global sort.
    ppl_scores = lmod.trigram_nll(
        clean, "text", "doc_id", target, carry_cols=("lang", "source")
    )
    bucketed = lmod.ppl_bucket_approx(ppl_scores, "nll", ("lang",))
    kept_scores = bucketed.filter(F.col("ppl_bucket") != "tail")
    clean = clean.join(
        kept_scores.select("doc_id"), "doc_id", "left_semi"
    )
    n4b = clean.count()

    weights = sel.dsir_logweights(clean, target, "doc_id", "text")
    picked = sel.dsir_resample(
        weights, "doc_id", k=max(1, int(n4 * 0.8))
    )
    clean = clean.join(
        picked.filter(F.col("selected") == 1).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    n5 = clean.count()

    # 6. DoReMi domain weights (Xie et al. 2023): one EG round over
    # the SAME LM scores computed in 4b — domains the reference model
    # finds lossy tilt up; feed these into weighted/budgeted sampling
    # when the mixture is specified by domain.
    dw = sel.doremi_domain_weights(
        kept_scores.join(clean.select("doc_id"), "doc_id", "left_semi"),
        "source",
    )

    # 7. temperature mixture (α=0.5) across languages
    rates = sp.temperature_rates(clean, ["lang"], alpha=0.5)
    final = sp.stratified_sample(clean, rates.select("lang", "rate"), ["lang"], "doc_id")
    n6 = final.count()

    print(f"input        {n0}")
    print(f"gated        {n1}")
    print(f"exact-dedup  {n2}")
    print(f"near-dedup   {n3}")
    print(f"decontam     {n4}")
    print(f"ppl-gate     {n4b}")
    print(f"dsir-select  {n5}")
    print(f"sampled      {n6}")
    print("doremi domain weights (top 5):")
    dw.orderBy(F.desc("weight")).show(5)
    final.groupBy("lang").count().orderBy("lang").show()


if __name__ == "__main__":
    main()
