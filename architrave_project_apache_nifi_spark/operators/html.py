"""HTML boilerplate / tag extraction (driver-mandated extension,
SURVEY.md §2.9; VERDICT r9 "What's missing"): the stage every public
corpus pipeline this engine mirrors (C4 — Raffel et al. 2020 §2.2,
CCNet, Gopher, RefinedWeb) runs BEFORE the quality/repetition gates the
engine already has — crawl corpora arrive as HTML/WET, not clean text.

Everything here is an ordered ``regexp_replace`` chain plus array-of-
lines ops — pure Column expressions, map-only, codegen, streaming
through the scan with zero shuffles and zero Python. Each pattern is
written in the Java-regex/RE2 shared dialect so the DuckDB oracle runs
the SAME chain verbatim (queries.py ``text_html_extract``).

Scope contract (documented, not accidental): this is the scalable
regex extractor for machine-generated/benign HTML — the 95% path. It
does NOT implement an HTML5 tree parser: a ``>`` inside a quoted
attribute value ends the tag early, CDATA is not special-cased, and
only the common named entities (+ ``&#39;``) are decoded. Adversarial
or deeply-malformed markup should route to a real parser
(lxml/BeautifulSoup behind ``mapInPandas``) the same way PNG decode
documents PIL as its production integration point — the Spark-side
plumbing (schema, line semantics, gate composition) is identical
either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tags whose END (or, for void tags, presence) terminates a visual
# line/paragraph — replaced by newline so the Gopher/C4 LINE rules see
# the same units a browser would render.
_BLOCK_CLOSE = (
    "p", "div", "li", "ul", "ol", "h[1-6]", "tr", "table",
    "blockquote", "pre", "section", "article", "header", "footer",
)
BLOCK_BREAK_PATTERN = (
    r"(?i)<(?:br|hr)\s*/?\s*>|</(?:" + "|".join(_BLOCK_CLOSE) + r")\s*>"
)
# Table cells separate horizontally, not vertically.
CELL_BREAK_PATTERN = r"(?i)</t[dh]\s*>"
SCRIPT_PATTERN = r"(?is)<script\b.*?</script\s*>"
STYLE_PATTERN = r"(?is)<style\b.*?</style\s*>"
COMMENT_PATTERN = r"(?s)<!--.*?-->"
TAG_PATTERN = r"(?s)<[^>]*>"

# Decode order matters: &amp; LAST, so "&amp;lt;" decodes to the
# literal text "&lt;" (one level), never to "<" (double decode).
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#34;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)

# The ONE chain definition, shared verbatim by the Spark operator and
# the DuckDB oracle (queries._html_extract_oracle imports it) — parity
# is structural, not maintained by hand. Residual (inline) tags strip
# to EMPTY, matching renderer semantics: <b>/</a> never split a word
# ("link</a>." must yield "link.", not "link ."); script/style/comment
# bodies strip to a space so their removal can't fuse neighbours.
HTML_CHAIN: tuple[tuple[str, str], ...] = (
    (SCRIPT_PATTERN, " "),
    (STYLE_PATTERN, " "),
    (COMMENT_PATTERN, " "),
    (BLOCK_BREAK_PATTERN, "\n"),
    (CELL_BREAK_PATTERN, " "),
    (TAG_PATTERN, ""),
    *HTML_ENTITIES,
    (r"[ \t\f\r]+", " "),
    (r" ?\n ?", "\n"),
    # LINE granularity, by contract: adjacent block closes (</li></ul>,
    # </p><p>) are indistinguishable from an intended paragraph break
    # once tags are gone, so newline runs collapse to one line break —
    # every rendered block is exactly one line, blank lines never
    # survive. Paragraph-level dup analysis over extracted text should
    # therefore use line_delim='\n' (each block IS a paragraph).
    (r"\n{2,}", "\n"),
    (r"^\s+|\s+$", ""),
)


def html_to_text(html: Column) -> Column:
    """Strip an HTML document to renderable text, preserving line
    structure: drop ``<script>``/``<style>`` blocks and comments
    wholesale, turn block-tag boundaries into newlines and cell
    boundaries into spaces, strip every remaining (inline) tag to
    nothing, decode the common entities, then normalize whitespace
    (within-line runs → one space, newline runs → one line break,
    outer trim — line granularity; see :data:`HTML_CHAIN`).

    One chained map-only expression: at 100 TB this runs inside
    whole-stage codegen next to the parquet scan — no shuffle, no
    Python, and column pruning still reaches the scan because the
    chain consumes exactly one input column."""
    out = html
    for pat, rep in HTML_CHAIN:
        out = F.regexp_replace(out, pat, rep)
    return out


def c4_keep_lines(
    text: Column,
    min_words: int = 3,
    require_terminal_punct: bool = True,
    drop_markers: tuple[str, ...] = ("javascript", "lorem ipsum", "cookie"),
) -> Column:
    """C4-style line-level boilerplate filter (Raffel et al. 2020
    §2.2) over already-extracted text: keep only lines with at least
    ``min_words`` whitespace-separated words, (optionally) ending in a
    terminal punctuation mark, containing no ``{``/``}`` and none of
    the lowercase ``drop_markers`` — nav bars, cookie banners and
    leaked code fall out, prose survives. Returns the kept lines
    re-joined with newlines (empty string if nothing survives).

    Array ops over one split — still map-only / codegen; composes with
    :func:`html_to_text` and the Gopher gates as one fused map stage."""
    lines = F.split(text, "\n")

    def keep(l: Column) -> Column:
        words = F.size(F.filter(F.split(l, " "), lambda w: w != ""))
        cond = words >= F.lit(min_words)
        if require_terminal_punct:
            cond = cond & l.rlike(r'[.!?"]$')
        cond = cond & ~l.contains("{") & ~l.contains("}")
        low = F.lower(l)
        for m in drop_markers:
            cond = cond & ~low.contains(m)
        return cond

    return F.array_join(F.filter(lines, keep), "\n")


# Sentence terminators: a run of .!? followed by whitespace or end of
# string. No lookaround (RE2 parity — the match consuming the trailing
# whitespace is harmless for COUNTING).
SENTENCE_END_PATTERN = r"[.!?]+(\s+|$)"


def sentence_count(text: Column) -> Column:
    """Cheap sentence count: terminator runs followed by whitespace or
    EOL. The C4 page rule's denominator — not a linguistic segmenter
    (abbreviations over-count), which is exactly the approximation the
    public pipelines gate on."""
    return F.size(
        F.regexp_extract_all(text, F.lit(SENTENCE_END_PATTERN), F.lit(0))
    )


def c4_page_keep(
    text: Column,
    min_sentences: int = 3,
    drop_markers: tuple[str, ...] = ("lorem ipsum",),
    forbid_braces: bool = True,
) -> Column:
    """C4 PAGE-level gate (Raffel et al. 2020 §2.2), the document-
    granularity sibling of :func:`c4_keep_lines`: keep pages with at
    least ``min_sentences`` sentences, none of the lowercase
    ``drop_markers`` (placeholder text), and — optionally — no curly
    braces (leaked code/templates). Boolean Column; compose with
    ``gopher_rules``/``repetition_features`` as one fused map stage."""
    keep = sentence_count(text) >= F.lit(min_sentences)
    low = F.lower(text)
    for m in drop_markers:
        keep = keep & ~low.contains(m)
    if forbid_braces:
        keep = keep & ~text.contains("{") & ~text.contains("}")
    return keep


def drop_boilerplate_lines(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_docs: int = 1,
    delim: str = "\n",
) -> DataFrame:
    """CORPUS-frequency boilerplate removal (the CCNet/RefinedWeb step
    after per-page extraction): a line whose trimmed form appears in
    more than ``max_docs`` DISTINCT documents is boilerplate (cookie
    banners, nav rows, license footers survive per-page heuristics
    because they look like prose) and is dropped from EVERY document;
    document-unique lines keep their original order. Returns the df
    with ``text_col`` rewritten (empty string if nothing survives).

    This is the cross-document complement of :func:`c4_keep_lines`
    (per-line shape) and the line-granular sibling of the span-dedup
    rewrite family. Beyond cleanliness it protects the dedup stage: a
    boilerplate line shared corpus-wide hands every document pair
    common shingles and densifies the LSH candidate graph toward n².

    Scale: one posexplode, one count-distinct agg keyed by the LINE
    text (sharded by content — no doc-level hot key can exist), one
    broadcast-or-hash join back on that key, and one per-doc
    ``collect_list`` regroup whose size is bounded by the longest
    single document (the bound every per-doc operator in this engine
    carries). countDistinct on a hot line key partial-aggregates
    map-side because the group key IS the line."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), delim)).alias("__pos", "__line"),
    ).withColumn("__key", F.regexp_replace("__line", r"^\s+|\s+$", ""))
    common = (
        lines.filter(F.col("__key") != "")
        .groupBy("__key")
        .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
        .filter(F.col("__nd") > max_docs)
        .select("__key", F.lit(1).alias("__drop"))
    )
    kept = (
        lines.join(common, "__key", "left")
        .filter(F.col("__drop").isNull() & (F.col("__key") != ""))
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos", "__line"))
                    ),
                    lambda s: s["__line"],
                ),
                delim,
            ).alias("__clean")
        )
    )
    keep_cols = [c for c in df.columns if c != text_col]
    return (
        df.select(*keep_cols)
        .join(kept, id_col, "left")
        .select(
            *keep_cols, F.coalesce("__clean", F.lit("")).alias(text_col)
        )
    )


def extract_html_text(
    df: DataFrame,
    html_col: str,
    *,
    out_col: str = "text",
    c4_filter: bool = False,
    min_words: int = 3,
) -> DataFrame:
    """DataFrame form: replace ``html_col`` with its extracted text in
    ``out_col`` (other columns pass through untouched). With
    ``c4_filter=True`` the C4 line gate runs fused into the same map
    stage. The pre-gate stage of examples/clean_corpus.py.

    Pipeline note: land the extracted corpus (parquet write, or
    ``localCheckpoint`` in a single job) before feeding it to
    expression-heavy per-doc analysis (repetition grams, minhash
    shingles). Those operators reference the text column dozens of
    times, and without a plan barrier Catalyst inlines this chain's
    ~20 nested regexp_replace calls into every reference, then
    re-analyzes the blown-up plan on each action — measured ~30×
    driver-side planning overhead on the clean_corpus dedup stage.
    A ``persist()`` is NOT enough: it caches execution, not the
    logical plan."""
    extracted = html_to_text(F.col(html_col))
    if c4_filter:
        extracted = c4_keep_lines(extracted, min_words=min_words)
    keep_cols = [c for c in df.columns if c != html_col and c != out_col]
    return df.select(*keep_cols, extracted.alias(out_col))
