"""Text analysis operators (driver-mandated extension, SURVEY.md §2.9):
language ID, quality scoring, token counting, document fingerprinting.

All pure Column expressions (codegen-friendly, no UDFs); every formula
is deliberately ANSI-SQL-expressible so the DuckDB oracle can replicate
it exactly (queries.py pairs each with its oracle SQL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import shingles, tokens

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
# Order matters: ties resolve to the earlier language.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "is", "in"),
    "es": ("el", "la", "de", "y", "que", "los", "un"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "de", "un", "est"),
}

EN_STOPWORDS = LANG_STOPWORDS["en"]

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 31


def token_count(text: Column) -> Column:
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


# GPT-2-style pre-tokenizer simplification: letter runs, single digits,
# and lone punctuation each count as one token — the standard cheap
# proxy for BPE token budgets (digits split per-char like modern BPE
# vocabularies; punctuation never merges into words). Shared
# Java-regex/RE2 syntax so the DuckDB oracle runs the same pattern.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def subword_token_count(text: Column) -> Column:
    """BPE-ish token count via the pre-tokenizer regex (vs the plain
    whitespace ``token_count``); used for sequence-budget estimates
    where whitespace counts undershoot punctuation/digit-heavy text."""
    return F.size(F.regexp_extract_all(text, F.lit(f"({BPE_ISH_PATTERN})"), F.lit(1)))


def _stop_hits(text: Column, words: tuple[str, ...]) -> Column:
    toks = tokens(text)
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def language_scores(text: Column) -> dict[str, Column]:
    """Stopword-hit count per candidate language."""
    return {lang: _stop_hits(text, words) for lang, words in LANG_STOPWORDS.items()}


def language_id(text: Column) -> Column:
    """Argmax of stopword hits; 'und' (undetermined) when all zero.
    First language in table order wins ties — deterministic, and the
    same CASE cascade is emitted in the oracle SQL."""
    scores = language_scores(text)
    langs = list(scores)
    best = F.greatest(*[scores[lang] for lang in langs])
    out = F.lit("und")
    for lang in reversed(langs):
        out = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(out)
    return out


def quality_features(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-doc quality + repetition features and a composite score.

    score = 0.4·min(n_tokens/100,1) + 0.3·type_token_ratio
          + 0.3·stopword_ratio-capped — a simple, monotone, fully
    SQL-portable stand-in for perplexity-style quality filters.

    Repetition/boilerplate signals (the standard cheap detectors for
    machine-generated or templated text):
    - ``dup_bigram_ratio``: fraction of word bigrams that repeat an
      earlier bigram in the same doc (0 = no repetition).
    - ``top_token_ratio``: frequency of the single most common token
      over doc length (concentration; near 1 = one word spammed),
      computed as the longest equal-run in the SORTED token array —
      one O(n log n) sort + O(n) fold per doc, equal by construction
      to the naive per-distinct-token count (property-tested in
      test_textanalysis.py) without its O(distinct·len) blowup.

    The token and bigram arrays are materialized once behind an
    exchange barrier (same trap as dedup._shingle_sets: projection
    collapse would re-evaluate the split/slice/concat tree once per
    consuming expression — six times here); every feature then reads a
    row field. The barrier moves one row per doc."""
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    arrays = (
        df.select(F.col(id_col), F.col(text_col).alias("__text"))
        .repartition(n_parts, F.col(id_col))
        .select(
            F.col(id_col),
            tokens(F.col("__text")).alias("__t"),
            shingles(F.col("__text"), 2).alias("__bi"),
        )
        .repartition(n_parts, F.xxhash64(F.col(id_col)))
    )
    t = F.col("__t")
    bi = F.col("__bi")
    n_tok = F.size(t)
    n_distinct = F.size(F.array_distinct(t))
    stop_list = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    stop_hits = F.size(F.filter(t, lambda x: F.array_contains(stop_list, x)))
    ttr = n_distinct.cast("double") / n_tok
    stop_ratio = stop_hits.cast("double") / n_tok
    score = (
        F.lit(0.4) * F.least(n_tok.cast("double") / 100.0, F.lit(1.0))
        + F.lit(0.3) * ttr
        + F.lit(0.3) * F.least(stop_ratio * 4.0, F.lit(1.0))
    )
    dup_bi = F.lit(1.0) - F.size(F.array_distinct(bi)).cast("double") / F.size(bi)
    acc0 = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def _run_step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    top_tok = (
        F.aggregate(F.array_sort(t), acc0, _run_step)["best"].cast("double") / n_tok
    )
    # RAW doubles, deliberately un-rounded: both engines compute these
    # bit-identically (same left-to-right IEEE arithmetic), and the
    # compare's 9-sig-fig normalization absorbs representation noise —
    # whereas round(x, 6) DIVERGES on exact decimal halves (Spark
    # rounds the binary value, DuckDB the shortest decimal repr:
    # 0.4294374999..97 prints as "0.4294375" and rounds UP there) —
    # observed at sf1, doc 15174. Callers round for display only.
    return arrays.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        ttr.alias("type_token_ratio"),
        stop_ratio.alias("stopword_ratio"),
        dup_bi.alias("dup_bigram_ratio"),
        top_tok.alias("top_token_ratio"),
        score.alias("quality_score"),
    )


# Gopher/C4-style rule thresholds (shared with the oracle SQL in
# queries.py so both engines evaluate the identical rule set).
GOPHER_MIN_WORDS = 5
GOPHER_MAX_WORDS = 10_000
GOPHER_MIN_MEAN_WORD_LEN = 2.0
GOPHER_MAX_MEAN_WORD_LEN = 12.0
GOPHER_MIN_ALPHA_FRAC = 0.7
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3
GOPHER_MIN_STOPWORDS = 1


def gopher_keep(text: Column) -> Column:
    """The Gopher/C4 rule conjunction as ONE Column expression — the
    zero-shuffle form for inlining into a pipeline filter
    (``df.filter(gopher_keep(col("text")))`` composes with the scan;
    no join-back of a flags table). Same rules as :func:`gopher_rules`.
    """
    t = tokens(text)
    n = token_count(text)
    nd = n.cast("double")
    safe_n = F.when(n == 0, F.lit(1.0)).otherwise(nd)
    mean_len = (
        F.aggregate(
            F.transform(t, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
        ).cast("double")
        / safe_n
    )
    alpha_frac = (
        F.size(F.filter(t, lambda x: x.rlike("[a-z]"))).cast("double") / safe_n
    )
    symbol_ratio = (
        F.size(F.regexp_extract_all(text, F.lit("([#…])"), F.lit(1))).cast(
            "double"
        )
        / safe_n
    )
    lines = F.split(text, "\n")
    n_lines = F.size(lines).cast("double")
    bullet_frac = (
        F.size(F.filter(lines, lambda x: x.rlike(r"^\s*[-*•]"))).cast("double")
        / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda x: x.rlike(r"(\.\.\.|…)\s*$"))).cast(
            "double"
        )
        / n_lines
    )
    n_stop = _stop_hits(text, EN_STOPWORDS)
    return (
        (n >= GOPHER_MIN_WORDS)
        & (n <= GOPHER_MAX_WORDS)
        & (mean_len >= GOPHER_MIN_MEAN_WORD_LEN)
        & (mean_len <= GOPHER_MAX_MEAN_WORD_LEN)
        & (alpha_frac >= GOPHER_MIN_ALPHA_FRAC)
        & (symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO)
        & (bullet_frac <= GOPHER_MAX_BULLET_FRAC)
        & (ellipsis_frac <= GOPHER_MAX_ELLIPSIS_FRAC)
        & (n_stop >= GOPHER_MIN_STOPWORDS)
    )


def gopher_rules(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Rule-based document filter in the Gopher / C4 style: the cheap
    heuristic gate a training-data pipeline runs BEFORE any model-based
    quality scoring. Pure Column expressions (one map-only pass, rules
    evaluated inside codegen, composes with any scan); every rule is
    replicated exactly in the DuckDB oracle (queries.py).

    Per-doc outputs: the raw signals, one boolean per rule, and the
    conjunction ``keep``. Rules (thresholds above):
    - word count within [min, max] (empty/whitespace docs fail);
    - mean word length within [min, max] (OCR garbage / char soup);
    - fraction of words containing a letter ≥ min (number/symbol soup);
    - symbol-to-word ratio (# and … occurrences) ≤ max (scraped
      boilerplate);
    - fraction of bullet-started lines ≤ max and ellipsis-ended lines
      ≤ max (navigation/listing pages);
    - ≥ min stopword hits (non-linguistic content; English list — at
      scale, pick the list by ``language_id``)."""
    t = tokens(F.col(text_col))
    n = token_count(F.col(text_col))
    nd = n.cast("double")
    safe_n = F.when(n == 0, F.lit(1.0)).otherwise(nd)
    mean_len = (
        F.aggregate(
            F.transform(t, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
        ).cast("double")
        / safe_n
    )
    alpha_frac = (
        F.size(F.filter(t, lambda x: x.rlike("[a-z]"))).cast("double") / safe_n
    )
    symbol_ratio = (
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit("([#…])"), F.lit(1))
        ).cast("double")
        / safe_n
    )
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines).cast("double")
    bullet_frac = (
        F.size(F.filter(lines, lambda x: x.rlike(r"^\s*[-*•]"))).cast("double")
        / n_lines
    )
    ellipsis_frac = (
        F.size(
            F.filter(lines, lambda x: x.rlike(r"(\.\.\.|…)\s*$"))
        ).cast("double")
        / n_lines
    )
    n_stop = _stop_hits(F.col(text_col), EN_STOPWORDS)

    ok_words = (n >= GOPHER_MIN_WORDS) & (n <= GOPHER_MAX_WORDS)
    ok_mean = (mean_len >= GOPHER_MIN_MEAN_WORD_LEN) & (
        mean_len <= GOPHER_MAX_MEAN_WORD_LEN
    )
    ok_alpha = alpha_frac >= GOPHER_MIN_ALPHA_FRAC
    ok_symbol = symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO
    ok_bullet = bullet_frac <= GOPHER_MAX_BULLET_FRAC
    ok_ellipsis = ellipsis_frac <= GOPHER_MAX_ELLIPSIS_FRAC
    ok_stop = n_stop >= GOPHER_MIN_STOPWORDS
    return df.select(
        F.col(id_col),
        n.alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_frac, 6).alias("bullet_line_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_line_frac"),
        n_stop.alias("n_stopwords"),
        ok_words.alias("ok_words"),
        ok_mean.alias("ok_mean_word_len"),
        ok_alpha.alias("ok_alpha"),
        ok_symbol.alias("ok_symbol"),
        ok_bullet.alias("ok_bullet"),
        ok_ellipsis.alias("ok_ellipsis"),
        ok_stop.alias("ok_stopwords"),
        (
            ok_words & ok_mean & ok_alpha & ok_symbol & ok_bullet
            & ok_ellipsis & ok_stop
        ).alias("keep"),
    )


# Normalization patterns — shared Java-regex/RE2 syntax so the DuckDB
# oracle can run the identical chain (same constraint as pii.py).
URL_PATTERN = r"(https?://\S+|www\.\S+)"
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
CTRL_PATTERN = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def normalize_text(text: Column) -> Column:
    """Scrape-cleaning normalization, the stage run before tokenizing
    or fingerprinting: strip URLs, e-mail addresses, and control
    characters (each replaced by a space so word boundaries survive),
    then collapse whitespace runs and trim. An ordered
    ``regexp_replace`` chain — map-only, codegen, streams through the
    scan; contrast with pii.redact_pii, which MASKS (preserves
    placeholders for audit) where this REMOVES."""
    out = F.regexp_replace(text, URL_PATTERN, " ")
    out = F.regexp_replace(out, EMAIL_PATTERN, " ")
    out = F.regexp_replace(out, CTRL_PATTERN, " ")
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Polynomial rolling hash over characters:
    ``fp = fold(chars, (acc, c) -> (acc*31 + ascii(c)) mod 1e9+7)``.
    Stays in bigint range (acc < 1e9, ·31 + 127 < 2^35); identical
    arithmetic is expressible in DuckDB ``list_reduce`` — exact oracle
    parity, unlike xxhash/md5-based prints."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(text)),
        lambda i: F.ascii(F.substring(text, i, F.lit(1))),
    )
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * FINGERPRINT_BASE + c) % FINGERPRINT_MOD,
    )


def adaptive_percentile_filter(
    df: DataFrame,
    id_col: str,
    metric,
    p: float = 0.25,
) -> DataFrame:
    """Corpus-adaptive quality cut: keep rows whose ``metric`` is at or
    above the corpus-wide exact ``p``-quantile of that metric — the
    threshold adapts to the corpus instead of being hand-tuned (the
    practical form of "drop the worst quartile").

    Returns (``id``, ``metric``, ``threshold``, ``is_kept``). The
    threshold is computed with the exact ``percentile`` aggregate
    (linear interpolation at rank p·(n−1) — the same definition DuckDB's
    ``quantile_cont`` uses, so the oracle reproduces it bit-for-bit on
    integer metrics, where the interpolation arithmetic is exact).

    Scale: one aggregation to a single scalar (exact percentile is a
    sort-based agg — at 100 TB swap in ``approx_percentile`` with a
    documented error bound; the plan shape is identical), broadcast
    back via a literal-free cross join of a 1-row DataFrame; the corpus
    itself is filtered map-only, no shuffle.
    """
    m = F.col(metric) if isinstance(metric, str) else metric
    scored = df.select(F.col(id_col), m.cast("bigint").alias("metric"))
    thr = scored.agg(
        F.expr(f"percentile(metric, {p})").alias("threshold")
    )
    return (
        scored.join(F.broadcast(thr))
        .select(
            id_col,
            "metric",
            F.round("threshold", 6).alias("threshold"),
            (F.col("metric") >= F.col("threshold")).cast("int").alias("is_kept"),
        )
    )


# Gopher repetition-rule thresholds (Rae et al. 2021, "Scaling Language
# Models: ... Gopher", Table A1). A document is kept only if every
# fraction is at or below its ceiling. The line/paragraph pair shares
# one implementation: paragraphs are lines with ``line_delim="\n\n"``.
GOPHER_MAX_DUP_LINE_FRAC = 0.30
GOPHER_MAX_DUP_LINE_CHAR_FRAC = 0.20
GOPHER_MAX_TOP_NGRAM_CHAR_FRAC = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_MAX_DUP_NGRAM_CHAR_FRAC = {
    5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10,
}

# Sentinel n for line-level units in the shared (id, n, gram) relation:
# token n-grams start at n=2, so n=1 is free.
_LINE_N = 1


def _gram_structs(toks: Column, n: int) -> Column:
    """All word n-grams of ``toks`` as ``struct<n:int, gram:string>``.

    Unlike :func:`~..dedup.shingles` there is NO short-doc fallback: a
    document with fewer than ``n`` tokens has zero n-grams (the Gopher
    fractions are 0 there, not a truncated-gram artifact)."""
    empty = F.array().cast("array<struct<n:int,gram:string>>")
    return F.when(F.size(toks) < n, empty).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(" ", F.slice(toks, i + 1, n)).alias("gram"),
            ),
        )
    )


def repetition_features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
    line_delim: str = "\n",
) -> DataFrame:
    """Gopher repetition rules (Rae et al. 2021 §A1.1) — the other half
    of the Gopher gate next to :func:`gopher_rules`: documents whose
    content is mostly REPEATED content (boilerplate, templated spam,
    scraper loops) are scored and gated on

    - ``dup_line_frac`` / ``dup_line_char_frac``: the fraction of line
      occurrences (and of line characters) belonging to lines that
      appear more than once in the document; pass ``line_delim="\\n\\n"``
      for the paragraph variants.
    - ``top_{n}gram_char_frac`` (n in ``top_ns``): characters covered
      by the single most frequent word n-gram, counting every
      occurrence, over the document's whitespace-normalized character
      count. The most frequent gram is picked deterministically and
      order-independently as ``max(struct(count, char_len))``.
    - ``dup_{n}gram_char_frac`` (n in ``dup_ns``): characters covered
      by ALL n-grams occurring more than once, occurrences summed
      without overlap-deduplication (the standard streaming-friendly
      approximation of Gopher's position-coverage count: exact interval
      union needs per-position state; the occurrence sum is a
      deterministic upper bound and is what public reimplementations
      gate on). Can exceed 1.0 on extreme repetition by construction.
    - ``repetition_keep``: the Table-A1 conjunction at the thresholds
      above (restricted to the requested n values).

    Distribution: per-unit counting is one explode over the gram
    positions and two hash aggregations keyed by (doc, n, gram) then
    (doc, n) — sharded BY CONSTRUCTION (the key includes the doc id, so
    a hot key cannot exist across docs; the per-task state is bounded
    by the longest single document, the same bound every per-doc
    operator in this engine carries). Documents themselves never
    shuffle: the feature table joins back on the id. No Python runs
    anywhere — the gram builder is ``transform(sequence(...))`` inside
    codegen, exactly the :func:`~..dedup.shingles` shape.

    Denominator ``doc_chars`` = length of the single-space-joined token
    array (whitespace-normalized), so the fractions are invariant to
    the source document's whitespace style. Every count is integer and
    every output is a single scalar division — bit-exact against the
    DuckDB oracle with no rounding (queries.py ``text_gopher_repetition``).
    """
    ns = sorted(set(top_ns) | set(dup_ns))
    if any(n < 2 for n in ns):
        # n=1 is the _LINE_N sentinel: a token-unigram request would
        # silently merge with the line units in the shared relation
        raise ValueError(f"n-gram sizes must be >= 2, got {ns}")
    text = F.col(text_col)
    toks = F.filter(tokens(text), lambda x: x != "")
    # Full-whitespace trim (NOT F.trim, which strips only ASCII spaces
    # and would let trailing \t/\r survive into line grams — and whose
    # bare reference would also hit the transform() (element, index)
    # two-parameter trap). Matches python str.strip() and the DuckDB
    # oracle's regexp_replace on CRLF/tab corpora.
    lines = F.filter(
        F.transform(
            F.split(text, line_delim),
            lambda x: F.regexp_replace(x, r"^\s+|\s+$", ""),
        ),
        lambda x: x != "",
    )
    line_structs = F.transform(
        lines,
        lambda l: F.struct(F.lit(_LINE_N).alias("n"), l.alias("gram")),
    )
    units = F.concat(line_structs, *[_gram_structs(toks, n) for n in ns])

    base = df.select(
        F.col(id_col),
        F.length(F.array_join(toks, " ")).alias("__doc_chars"),
        units.alias("__units"),
    )
    ex = base.select(id_col, F.explode_outer("__units").alias("s")).select(
        id_col, F.col("s.n").alias("n"), F.col("s.gram").alias("gram")
    )
    cnt = (
        ex.filter(F.col("n").isNotNull())
        .groupBy(id_col, "n", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("gl", F.length("gram"))
    )
    dup_c = F.when(F.col("c") >= 2, F.col("c")).otherwise(F.lit(0))
    dup_chars = F.when(F.col("c") >= 2, F.col("c") * F.col("gl")).otherwise(
        F.lit(0)
    )
    per_n = cnt.groupBy(id_col, "n").agg(
        F.sum("c").alias("occ"),
        F.sum(F.col("c") * F.col("gl")).alias("occ_chars"),
        F.sum(dup_c).alias("dup_occ"),
        F.sum(dup_chars).alias("dup_chars"),
        F.max(F.struct("c", "gl")).alias("top"),
    )

    def pick(n: int, col: Column) -> Column:
        return F.max(F.when(F.col("n") == n, col))

    aggs = [
        pick(_LINE_N, F.col("dup_occ").cast("double") / F.col("occ")).alias(
            "dup_line_frac"
        ),
        pick(
            _LINE_N, F.col("dup_chars").cast("double") / F.col("occ_chars")
        ).alias("dup_line_char_frac"),
    ]
    for n in top_ns:
        aggs.append(
            pick(n, (F.col("top.c") * F.col("top.gl")).cast("double")).alias(
                f"__top_chars_{n}"
            )
        )
    for n in dup_ns:
        aggs.append(
            pick(n, F.col("dup_chars").cast("double")).alias(f"__dup_chars_{n}")
        )
    feats = per_n.groupBy(id_col).agg(*aggs)

    safe_chars = F.when(F.col("__doc_chars") == 0, F.lit(1.0)).otherwise(
        F.col("__doc_chars").cast("double")
    )
    out_cols = [
        F.col(id_col),
        F.coalesce("dup_line_frac", F.lit(0.0)).alias("dup_line_frac"),
        F.coalesce("dup_line_char_frac", F.lit(0.0)).alias(
            "dup_line_char_frac"
        ),
    ]
    keeps = [
        F.coalesce("dup_line_frac", F.lit(0.0)) <= GOPHER_MAX_DUP_LINE_FRAC,
        F.coalesce("dup_line_char_frac", F.lit(0.0))
        <= GOPHER_MAX_DUP_LINE_CHAR_FRAC,
    ]
    for n in top_ns:
        frac = F.coalesce(F.col(f"__top_chars_{n}") / safe_chars, F.lit(0.0))
        out_cols.append(frac.alias(f"top_{n}gram_char_frac"))
        if n in GOPHER_MAX_TOP_NGRAM_CHAR_FRAC:
            keeps.append(frac <= GOPHER_MAX_TOP_NGRAM_CHAR_FRAC[n])
    for n in dup_ns:
        frac = F.coalesce(F.col(f"__dup_chars_{n}") / safe_chars, F.lit(0.0))
        out_cols.append(frac.alias(f"dup_{n}gram_char_frac"))
        if n in GOPHER_MAX_DUP_NGRAM_CHAR_FRAC:
            keeps.append(frac <= GOPHER_MAX_DUP_NGRAM_CHAR_FRAC[n])
    keep = keeps[0]
    for k in keeps[1:]:
        keep = keep & k
    out_cols.append(keep.alias("repetition_keep"))

    joined = base.select(id_col, "__doc_chars").join(feats, id_col, "left")
    return joined.select(*out_cols)


def bigram_logprob(
    df: DataFrame,
    text_col: str,
    id_col: str,
    lam: float = 0.75,
) -> DataFrame:
    """Interpolated bigram language-model score per document — the
    next rung above the unigram mean-logprob stand-in (queries.py
    ``text_unigram_logprob``) on the ladder toward a real perplexity
    filter: score every token by its corpus-trained conditional
    probability ``P(b|a) = lam * c(a,b)/c(a) + (1-lam) * c(b)/T``
    (Jelinek–Mercer interpolation with the unigram distribution; the
    unigram back-off term keeps P strictly positive for any pair seen
    in training, and every scored pair IS in training because train
    and apply share the corpus).

    Returns (id, ``n_bigrams``, ``mean_logprob``) for every document
    with at least two tokens; ``mean_logprob`` is rounded to 6 decimals
    so the value hash is stable across summation orders (the same
    discipline as the unigram entry).

    Distribution — the train/apply split every corpus-derived filter
    follows: the bigram and unigram count tables aggregate once at
    vocabulary size; documents explode to (doc, a, b) positions and
    join the counts by key. The count-table joins are vocab-sized (AQE
    broadcasts them when small; at 100 TB: cap to the top-K vocabulary
    plus a default count, still a broadcast — exactly the documented
    unigram plan). Documents themselves never shuffle; the one
    doc-keyed aggregation is the final mean.
    """
    text = F.col(text_col)
    toks = F.filter(tokens(text), lambda x: x != "")
    base = df.select(F.col(id_col), toks.alias("__toks"))

    # localCheckpoint (r12 optimization — the lm_counts lesson): uni is
    # vocabulary-sized but referenced THREE times below (ua, ub, total)
    # and bi once more; un-truncated lineage re-ran the corpus
    # tokenize+explode+aggregate for every reference — the initial plan
    # carried five full document scans, no exchange reuse.
    uni = (
        base.select(F.explode("__toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    total = uni.agg(F.sum("c").cast("double").alias("t"))

    empty = F.array().cast("array<struct<a:string,b:string>>")
    pair_arr = F.when(F.size("__toks") < 2, empty).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size("__toks") - 2),
            lambda i: F.struct(
                F.get("__toks", i).alias("a"),
                F.get("__toks", i + 1).alias("b"),
            ),
        )
    )
    pairs = base.select(id_col, F.explode(pair_arr).alias("p")).select(
        id_col, F.col("p.a").alias("a"), F.col("p.b").alias("b")
    )
    bi = (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c2"))
        .localCheckpoint(eager=True)
    )

    ua = uni.select(F.col("tok").alias("a"), F.col("c").alias("ca"))
    ub = uni.select(F.col("tok").alias("b"), F.col("c").alias("cb"))
    p = F.lit(lam) * (F.col("c2").cast("double") / F.col("ca")) + F.lit(
        1.0 - lam
    ) * (F.col("cb").cast("double") / F.col("t"))
    return (
        pairs.join(bi, ["a", "b"])
        .join(ua, "a")
        .join(ub, "b")
        .join(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(F.log(p)), 6).alias("mean_logprob"),
        )
    )
