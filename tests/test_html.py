"""HTML boilerplate/tag extraction semantics (operators/html.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.html import (
    c4_keep_lines,
    extract_html_text,
    html_to_text,
)


def _extract(spark, html: str) -> str:
    df = spark.createDataFrame([(1, html)], "id long, html string")
    return df.select(html_to_text(F.col("html")).alias("t")).collect()[0]["t"]


def test_strips_script_style_comments_wholesale(spark):
    html = (
        "<html><head><style>body { margin: 0; }</style>"
        "<script>if (1 < 2 && 3 > 2) { alert('x'); }</script></head>"
        "<body><!-- hidden\nnote --><p>Visible text.</p></body></html>"
    )
    assert _extract(spark, html) == "Visible text."


def test_block_tags_become_lines_inline_tags_do_not(spark):
    html = (
        "<p>First para.</p><p>Second <b>bold</b> and <a href='x'>link</a>."
        "</p><ul><li>item one</li><li>item two</li></ul>Line<br>break"
    )
    out = _extract(spark, html)
    assert out.split("\n") == [
        "First para.",
        "Second bold and link.",
        "item one",
        "item two",
        "Line",
        "break",
    ]


def test_entity_decode_common_and_single_level(spark):
    html = "<p>a &lt;b&gt; &quot;c&quot; &#39;d&#39; e&nbsp;f &amp;lt; &amp; g</p>"
    # &amp;lt; decodes ONE level to the literal text "&lt;" — never to <
    assert _extract(spark, html) == "a <b> \"c\" 'd' e f &lt; & g"


def test_whitespace_normalization(spark):
    html = "<div>a   b\t c </div><div></div><div> </div><div>d</div>"
    # line granularity: empty/whitespace-only blocks vanish, newline
    # runs collapse to one break, blank lines never survive
    assert _extract(spark, html) == "a b c\nd"


def test_c4_line_filter_keeps_prose_drops_boilerplate(spark):
    text = "\n".join(
        [
            "This is a complete sentence with enough words.",
            "Home",  # < 3 words
            "Accept all cookies to continue browsing now.",  # marker
            "No terminal punctuation here at all",
            "function() { return 1; }.",  # braces
            "Another proper sentence stays in the corpus.",
        ]
    )
    df = spark.createDataFrame([(1, text)], "id long, t string")
    out = df.select(c4_keep_lines(F.col("t")).alias("k")).collect()[0]["k"]
    assert out.split("\n") == [
        "This is a complete sentence with enough words.",
        "Another proper sentence stays in the corpus.",
    ]


def test_extract_html_text_dataframe_form(spark):
    df = spark.createDataFrame(
        [(1, "<p>Real prose sentence, kept intact.</p><nav>Home</nav>")],
        "doc_id long, html string",
    )
    out = extract_html_text(df, "html", c4_filter=True).collect()[0]
    assert out["doc_id"] == 1
    assert out["text"] == "Real prose sentence, kept intact."
    assert "html" not in out.asDict()


def test_gates_compose_html_to_gopher_keep(spark):
    """End-to-end: HTML in → extract → C4 line gate → Gopher gates out.
    A prose page survives every gate; a templated spam page (repeated
    n-grams) is extracted fine but rejected by the repetition gate —
    the composition C4/CCNet/RefinedWeb run, in one engine."""
    from architrave_project_apache_nifi_spark.operators.textanalysis import (
        repetition_features,
    )

    # every token unique across the page -> no repeated grams anywhere
    prose = (
        "<html><body>"
        + "".join(
            f"<p>Alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}.</p>"
            for i in range(12)
        )
        + "</body></html>"
    )
    spam_line = "Buy cheap widgets now at widget store online."
    spam = "<html><body>" + "".join(f"<p>{spam_line}</p>" for _ in range(20)) + "</body></html>"
    df = spark.createDataFrame(
        [(1, prose), (2, spam)], "doc_id long, html string"
    )
    cleaned = extract_html_text(df, "html", c4_filter=True)
    feats = {
        r["doc_id"]: r
        for r in repetition_features(cleaned, "text", "doc_id").collect()
    }
    assert feats[1]["repetition_keep"]
    assert feats[2]["dup_line_frac"] == 1.0
    assert not feats[2]["repetition_keep"]


def test_attribute_gt_limitation_is_documented_shape(spark):
    # scope contract: '>' inside a quoted attribute ends the tag early —
    # the regex extractor's documented non-goal (route adversarial HTML
    # to a real parser); pin the behavior so a change is deliberate
    out = _extract(spark, '<a href="a>b">link</a> tail.')
    assert "link" in out and "tail." in out


def test_drop_boilerplate_lines_semantics(spark):
    from architrave_project_apache_nifi_spark.operators.html import (
        drop_boilerplate_lines,
    )

    nav = "Accept cookies to continue"
    df = spark.createDataFrame(
        [
            (1, f"{nav}\nUnique first body line.\nAnother unique line."),
            (2, f"{nav}\nCompletely different body."),
            # whitespace variant of the nav line still matches (trimmed key);
            # the duplicated body line appears in docs 3 and 4 -> dropped
            (3, f"  {nav}\t\nShared body line here.\nDoc three extra."),
            (4, f"{nav}\nShared body line here."),
            (5, "No boilerplate at all in this one."),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in drop_boilerplate_lines(df, "text", "doc_id").collect()
    }
    assert out[1] == "Unique first body line.\nAnother unique line."
    assert out[2] == "Completely different body."
    assert out[3] == "Doc three extra."
    assert out[4] == ""  # everything it had was corpus-duplicated
    assert out[5] == "No boilerplate at all in this one."


def test_drop_boilerplate_lines_keeps_order_and_intra_doc_dups(spark):
    from architrave_project_apache_nifi_spark.operators.html import (
        drop_boilerplate_lines,
    )

    # a line repeated WITHIN one doc is not corpus boilerplate
    # (count_distinct docs == 1) and keeps both copies in order
    df = spark.createDataFrame(
        [(1, "alpha\nbeta\nalpha\ngamma"), (2, "delta only")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in drop_boilerplate_lines(df, "text", "doc_id").collect()
    }
    assert out[1] == "alpha\nbeta\nalpha\ngamma"


def test_drop_boilerplate_lines_max_docs_threshold(spark):
    from architrave_project_apache_nifi_spark.operators.html import (
        drop_boilerplate_lines,
    )

    df = spark.createDataFrame(
        [(i, "shared pair line\nbody %d" % i) for i in (1, 2)]
        + [(3, "tolerated\nbody 3")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in drop_boilerplate_lines(
            df, "text", "doc_id", max_docs=2
        ).collect()
    }
    # appears in exactly 2 docs, max_docs=2 -> tolerated, kept
    assert out[1] == "shared pair line\nbody 1"
    assert out[2] == "shared pair line\nbody 2"
    assert out[3] == "tolerated\nbody 3"


def test_sentence_count_and_c4_page_keep(spark):
    from architrave_project_apache_nifi_spark.operators.html import (
        c4_page_keep,
        sentence_count,
    )

    df = spark.createDataFrame(
        [
            (1, "One. Two! Three?"),  # 3 sentences -> keep
            (2, "Only one sentence here."),
            (3, "First. Second. Third. But lorem ipsum appears."),
            (4, "First. Second. Third. With code { x }."),
            (5, "Ellipsis... still one!? Terminator runs count once. ok."),
            (6, "no terminators at all"),
        ],
        "id long, t string",
    )
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            sentence_count(F.col("t")).alias("n"),
            c4_page_keep(F.col("t")).alias("keep"),
        ).collect()
    }
    assert rows[1]["n"] == 3 and rows[1]["keep"]
    assert rows[2]["n"] == 1 and not rows[2]["keep"]
    assert rows[3]["n"] == 4 and not rows[3]["keep"]  # marker
    assert rows[4]["n"] == 4 and not rows[4]["keep"]  # braces
    # "..." one run, "!?" one run, "." x2 -> 4; keeps
    assert rows[5]["n"] == 4 and rows[5]["keep"]
    assert rows[6]["n"] == 0 and not rows[6]["keep"]
