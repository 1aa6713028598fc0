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
