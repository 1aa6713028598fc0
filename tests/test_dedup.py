"""Property tests for the dedup family (SURVEY.md §2.9).

The approximate operators (minhash-LSH, simhash) have no SQL oracle —
these tests pin their contracts instead: LSH candidates must cover the
high-Jaccard pairs found by the exact operator, identical docs must
always collide, and unrelated docs must not.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators import dedup as dd

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_dedup_exact_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y z")], "doc_id LONG, text STRING"
    )
    rows = {r.keep_id: r.n_copies for r in dd.dedup_exact(df, "text", "doc_id").collect()}
    assert rows == {1: 2, 3: 1}


def test_shingles_short_text_falls_back_to_whole_text(spark):
    df = spark.createDataFrame([(1, "one"), (2, "")], "doc_id LONG, text STRING")
    out = df.select(dd.shingles(F.col("text"), 3).alias("s")).collect()
    assert out[0].s == ["one"]
    assert out[1].s == [""]


def test_minhash_identical_docs_always_collide(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "completely different words entirely here now")],
        "doc_id LONG, text STRING",
    )
    pairs = {(r.id_a, r.id_b) for r in
             dd.minhash_lsh_candidates(df, "doc_id", "text", 64, 16, 2).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_minhash_lsh_covers_exact_high_jaccard_pairs(spark):
    """Recall contract: with 16 bands of 4 rows, a pair at J≥0.8 has
    collision probability 1-(1-J^4)^16 ≥ 0.9998 — on the test corpus
    every exact pair at that threshold must be a candidate."""
    docs = _docs(spark)
    exact = {
        (r.id_a, r.id_b)
        for r in dd.ngram_jaccard_pairs(docs, "doc_id", "text", 0.8, 2).collect()
    }
    cand = {
        (r.id_a, r.id_b)
        for r in dd.minhash_lsh_candidates(docs, "doc_id", "text", 64, 16, 2).collect()
    }
    assert exact <= cand, f"missed pairs: {exact - cand}"


def test_ngram_jaccard_values_and_ordering(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "p q r s")], "doc_id LONG, text STRING"
    )
    # bigrams: doc1 {ab,bc,cd}, doc2 {ab,bc,ce}: |∩|=2, |∪|=4 → J=0.5
    rows = dd.ngram_jaccard_pairs(df, "doc_id", "text", 0.1, 2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert abs(r.jaccard - 0.5) < 1e-9


def test_simhash_identical_text_same_fingerprint(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta epsilon zeta")],
        "doc_id LONG, text STRING",
    )
    fp = {r.doc_id: r.simhash for r in dd.simhash(df, "doc_id", "text").collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]
    groups = dd.simhash_dup_groups(df, "doc_id", "text").collect()
    assert len(groups) == 1 and groups[0].n_docs == 2 and groups[0].keep_id == 1


def test_embedding_neardup_matches_manual_cosine(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [1.0, 0.1], 0),
            (3, [0.0, 1.0], 0),
            (4, [1.0, 0.0], 1),  # other block — never paired with 1
        ],
        "vec_id LONG, embedding ARRAY<FLOAT>, label INT",
    )
    rows = {
        (r.id_a, r.id_b): r.cosine
        for r in dd.embedding_neardup_pairs(df, "vec_id", "embedding", 0.9, "label").collect()
    }
    assert set(rows) == {(1, 2)}
    import math

    expected = 1.0 / math.sqrt(1.01)
    assert abs(rows[(1, 2)] - round(expected, 6)) < 1e-9

def test_embedding_neardup_unblocked_guard(spark):
    """block_col=None over a big input must raise (one O(n²) gram
    matrix on one executor), small inputs still work, and an explicit
    bound override disarms the guard."""
    import pytest

    big = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="block_col"):
        dd.embedding_neardup_pairs(
            big, "vec_id", "embedding", 0.9, max_unblocked_rows=10
        )
    small = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.1])],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    assert (
        len(dd.embedding_neardup_pairs(small, "vec_id", "embedding", 0.9).collect())
        == 1
    )
    # explicit override runs the unblocked path on the "big" input
    assert (
        dd.embedding_neardup_pairs(
            big, "vec_id", "embedding", 0.9, max_unblocked_rows=100
        ).count()
        > 0
    )


# ---------------------------------------------------------------------------
# Hot-band salting (VERDICT r4 #3): a near-identical doc family must not
# resurrect the quadratic pair blowup as one skewed join task.


def test_salt_hot_bands_bounds_group_sizes(spark):
    """10k rows in ONE (band, hash) bucket with cap=100 must split into
    ~100 salt groups none of which exceeds ~2× the cap (hash-mod
    unevenness allows slack, not blowup); rows in small buckets keep
    salt 0 untouched."""
    from architrave_project_apache_nifi_spark.operators.dedup import (
        _salt_hot_bands,
    )

    hot_rows = [(i, 0, 42) for i in range(10_000)]
    cold_rows = [(i, 1, 7) for i in range(50)]
    banded = spark.createDataFrame(
        hot_rows + cold_rows, "doc_id LONG, band INT, band_hash LONG"
    )
    salted = _salt_hot_bands(banded, "doc_id", 100)
    groups = (
        salted.groupBy("band", "band_hash", "__salt")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    hot_groups = [g for g in groups if g.band == 0]
    cold_groups = [g for g in groups if g.band == 1]
    assert all(g["__salt"] == 0 for g in cold_groups)
    assert len(cold_groups) == 1 and cold_groups[0].n == 50
    assert len(hot_groups) >= 80  # ceil(10000/100) = 100 salt values
    assert max(g.n for g in hot_groups) <= 250  # ~100 expected, 2.5x slack
    assert sum(g.n for g in hot_groups) == 10_000  # no row lost


def test_lsh_salting_keeps_family_connected_and_cold_path_identical(spark):
    """A 400-identical-doc family with cap=40: direct pair recall inside
    the bucket drops (the documented trade) but per-band salt draws are
    independent, so the family stays ONE connected component — transitive
    consumers (cluster canonicalization) still collapse it. On a corpus
    with no oversized bucket, the salted path returns the identical
    candidate set as max_band_bucket=None."""
    from architrave_project_apache_nifi_spark.operators.cluster import (
        connected_components,
    )

    family = [(i, "the same exact document body repeated verbatim "
                  "across the whole family of near identical rows")
              for i in range(400)]
    uniq = [(1000 + i, f"unique document number {i} with body tok{i} "
                       f"tail{i * 7} filler{i * 13}") for i in range(30)]
    df = spark.createDataFrame(family + uniq, "doc_id LONG, text STRING")

    salted = dd.minhash_lsh_candidates(
        df, "doc_id", "text", 64, 16, 2, max_band_bucket=40
    )
    comp = connected_components(salted, src="id_a", dst="id_b")
    fam_comps = {
        r.comp for r in comp.filter(F.col("id") < 400).collect()
    }
    n_fam_nodes = comp.filter(F.col("id") < 400).count()
    assert n_fam_nodes == 400, "salting lost family members entirely"
    assert len(fam_comps) == 1, f"family split into {len(fam_comps)} components"
    # contract pin (ADVICE r5): salting is OPT-IN — the default drops
    # nothing, ever; a non-transitive consumer of the default call
    # gets the full candidate set
    import inspect

    assert (
        inspect.signature(dd.minhash_lsh_candidates)
        .parameters["max_band_bucket"].default is None
    )
    # cold path: an explicit cap that no bucket on this corpus exceeds
    # yields candidates identical to salting disabled
    base = {
        (r.id_a, r.id_b)
        for r in dd.minhash_lsh_candidates(
            df, "doc_id", "text", 64, 16, 2, max_band_bucket=None
        ).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in dd.minhash_lsh_candidates(
            df, "doc_id", "text", 64, 16, 2, max_band_bucket=10_000
        ).collect()
    }
    assert base == capped


def test_dedup_spans_rewrite_semantics(spark):
    """Lee-et-al-style span removal: a copied 8-token span loses its
    tokens at every occurrence AFTER the global first — cross-doc copy,
    intra-doc self-repetition — while first occurrences, short docs and
    empty docs pass through (whitespace-canonicalized)."""
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h tail one"),
            (2, "x y a b c d e f g h z"),          # cross-doc copy
            (3, "p q r s t u v w p q r s t u v w"),  # self-repetition
            (4, "short doc"),
            (5, "   "),
        ],
        "doc_id LONG, text STRING",
    )
    out = {
        r.doc_id: (r.text, r.n_tokens, r.n_removed)
        for r in dd.dedup_spans_rewrite(df, "doc_id", "text", span_n=8).collect()
    }
    assert out[1] == ("a b c d e f g h tail one", 10, 0)
    assert out[2] == ("x y z", 11, 8)
    assert out[3] == ("p q r s t u v w", 16, 8)
    assert out[4] == ("short doc", 2, 0)
    assert out[5] == ("", 0, 0)


def test_dedup_spans_rewrite_overlapping_spans_merge(spark):
    """Overlapping duplicate windows merge into one removal interval —
    a 10-token copy inside a later doc removes all 10 tokens (3
    overlapping 8-windows), not 8."""
    ten = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
    df = spark.createDataFrame(
        [(1, ten + " uniq1 uniq2"), (2, "pre1 pre2 " + ten + " post")],
        "doc_id LONG, text STRING",
    )
    out = {
        r.doc_id: (r.text, r.n_removed)
        for r in dd.dedup_spans_rewrite(df, "doc_id", "text", span_n=8).collect()
    }
    assert out[1] == (ten + " uniq1 uniq2", 0)
    assert out[2] == ("pre1 pre2 post", 10)


def test_dedup_spans_rewrite_idempotent(spark):
    """Re-applying the rewrite to its own output changes nothing: the
    surviving text contains each span's first occurrence only."""
    docs = _docs(spark).select("doc_id", "text").limit(300)
    once = dd.dedup_spans_rewrite(docs, "doc_id", "text", span_n=8)
    twice = dd.dedup_spans_rewrite(
        once.select("doc_id", "text"), "doc_id", "text", span_n=8
    )
    a = {(r.doc_id, r.text) for r in once.collect()}
    b = {(r.doc_id, r.text) for r in twice.collect()}
    assert a == b


def _spans_rewrite_reference(docs, n):
    """Pure-Python reference for dedup_spans_rewrite: global
    first-occurrence span survival over (id, pos) order."""
    toks = {i: (t.split() if t.strip() else []) for i, t in docs}
    first = {}
    for i in sorted(toks):
        tl = toks[i]
        for p in range(len(tl) - n + 1):
            sp = " ".join(tl[p : p + n])
            first.setdefault(sp, (i, p))
    out = {}
    for i in sorted(toks):
        tl = toks[i]
        covered = [False] * len(tl)
        for p in range(len(tl) - n + 1):
            sp = " ".join(tl[p : p + n])
            if first[sp] != (i, p):
                for j in range(p, p + n):
                    covered[j] = True
        kept = [t for t, c in zip(tl, covered) if not c]
        out[i] = (" ".join(kept), len(tl), len(tl) - len(kept))
    return out


def test_dedup_spans_rewrite_property_vs_reference(spark):
    """Randomized cross-check (code-review hardening): a tiny token
    alphabet forces dense span collisions — intra-doc repeats,
    cross-doc copies, overlapping windows — and the Spark pipeline
    must match the brute-force reference on every doc."""
    import random

    rng = random.Random(20260815)
    for trial in range(3):
        docs = []
        for i in range(40):
            L = rng.randrange(0, 30)
            docs.append(
                (i, " ".join(rng.choice("abcdefg") for _ in range(L)))
            )
        expect = _spans_rewrite_reference(docs, 5)
        got = {
            r.doc_id: (r.text, r.n_tokens, r.n_removed)
            for r in dd.dedup_spans_rewrite(
                spark.createDataFrame(docs, "doc_id LONG, text STRING"),
                "doc_id", "text", span_n=5,
            ).collect()
        }
        assert got == expect, {
            k: (got[k], expect[k]) for k in expect if got[k] != expect[k]
        }


def test_arrow_band_path(spark):
    """The Arrow/numpy band stage (r8, VERDICT r7 #6) is a BIT-EXACT
    drop-in for the band expression: same xxhash64 fold semantics
    (long/int short paths, null arguments skipped), same band keys,
    same candidate pairs — including the degenerate docs (empty text,
    null text, sub-shingle text) whose mins are NULL."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    extra = spark.createDataFrame(
        [(900001, ""), (900002, None), (900003, "one"),
         (900004, "a b c d e f g")],
        "doc_id LONG, text STRING",
    )
    docs = docs.union(extra)

    # band-key level: every (doc, band) key identical
    shs = dd._shingle_sets(docs, "doc_id", "text", 3)
    rows_per_band = 4
    band_arr = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda b: F.aggregate(
            F.transform(
                F.sequence(b * rows_per_band, (b + 1) * rows_per_band - 1),
                lambda i: F.array_min(
                    F.transform(F.col("__shs"), lambda h: F.xxhash64(h, i))
                ),
            ),
            F.lit(0).cast("long"),
            lambda acc, m: F.xxhash64(acc, m),
        ),
    )
    expr = {
        r[0]: list(r[1])
        for r in shs.select(F.col("__id"), band_arr.alias("b")).collect()
    }
    arrow = {
        r[0]: list(r[1])
        for r in dd._arrow_bands(shs, "doc_id", 64, 16).collect()
    }
    assert expr == arrow

    # pair level: identical candidate sets through the full pipeline
    pa = sorted(map(tuple, dd.minhash_lsh_candidates(
        docs, "doc_id", "text", 64, 16, 3, band_impl="expr"
    ).collect()))
    pb = sorted(map(tuple, dd.minhash_lsh_candidates(
        docs, "doc_id", "text", 64, 16, 3, band_impl="arrow"
    ).collect()))
    assert pa == pb and len(pa) > 0

    import pytest

    with pytest.raises(ValueError, match="band_impl"):
        dd.minhash_lsh_candidates(
            docs, "doc_id", "text", 64, 16, 3, band_impl="numpy"
        )


def test_auto_band_impl_scale_switch(spark):
    """band_impl='auto' (r8): provably-small parquet corpora keep the
    expression plan (no mapInPandas stage — the sf0.1-measured 1.7x
    fixed-cost loss); over the measured ~26k-doc crossover the
    vectorized Arrow stage is picked; unknowable inputs (local
    relations) stay expr."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    assert dd._auto_band_impl(docs) == "expr"
    assert dd._auto_band_impl(docs, threshold=10) == "arrow"
    local = spark.createDataFrame([(1, "a b c d")], "doc_id LONG, text STRING")
    assert dd._auto_band_impl(local) == "expr"

    # the auto default reaches the plan: small corpus -> no Arrow eval
    # node; forced arrow -> one
    from architrave_project_apache_nifi_spark.plans.inspect import formatted_plan

    plan_auto = formatted_plan(
        dd.minhash_lsh_candidates(docs, "doc_id", "text", 64, 16, 3)
    )
    plan_arrow = formatted_plan(
        dd.minhash_lsh_candidates(
            docs, "doc_id", "text", 64, 16, 3, band_impl="arrow"
        )
    )
    assert "ArrowEvalPython" not in plan_auto and "MapInPandas" not in plan_auto
    assert "MapInPandas" in plan_arrow


from hypothesis import HealthCheck as _HC  # noqa: E402
from hypothesis import given as _given, settings as _settings  # noqa: E402
from hypothesis import strategies as _st  # noqa: E402

_I64 = _st.integers(min_value=-(2**63), max_value=2**63 - 1)


@_settings(
    max_examples=10, deadline=None,
    suppress_health_check=[_HC.too_slow, _HC.function_scoped_fixture],
)
@_given(
    cells=_st.lists(
        _st.one_of(
            _st.none(),
            _st.lists(
                _st.one_of(
                    _I64,
                    _st.sampled_from(
                        [0, 1, -1, 2**63 - 1, -(2**63), 42, -42]
                    ),
                ),
                min_size=0, max_size=12,
            ),
        ),
        min_size=1, max_size=8,
    ),
)
def test_arrow_band_keys_fuzz_bit_exact(spark, cells):
    """PROPERTY: the numpy XXH64 replication equals Spark's band
    expression for ARBITRARY int64 shingle arrays — boundary values
    (INT64_MIN/MAX, the 42 seed itself), duplicates, empty arrays and
    NULL cells. The text never reaches the arrow stage (_shingle_sets
    hashes it first), so this fuzz over raw arrays covers the whole
    input space the stage can see."""
    rows = [(i, c) for i, c in enumerate(cells)]
    shs = spark.createDataFrame(
        rows, "__id LONG, __shs ARRAY<BIGINT>"
    )
    rows_per_band = 4
    band_arr = F.transform(
        F.sequence(F.lit(0), F.lit(3)),
        lambda b: F.aggregate(
            F.transform(
                F.sequence(b * rows_per_band, (b + 1) * rows_per_band - 1),
                lambda i: F.array_min(
                    F.transform(F.col("__shs"), lambda h: F.xxhash64(h, i))
                ),
            ),
            F.lit(0).cast("long"),
            lambda acc, m: F.xxhash64(acc, m),
        ),
    )
    expr = {
        r[0]: list(r[1])
        for r in shs.select("__id", band_arr.alias("b")).collect()
    }
    arrow = {
        r[0]: list(r[1])
        for r in dd._arrow_bands(shs, "__id", 16, 4).collect()
    }
    assert expr == arrow


def test_arrow_band_null_fill_overflowing_config(spark):
    """Regression (code-review r8): with rows_per_band=8 (128 hashes /
    16 bands) the null-doc band accumulator exceeds int64 max, which
    numpy>=2 refuses to convert via np.int64(acc) — the fill must stay
    uint64 end-to-end and reinterpret (.view), bit-exact vs the Spark
    band expression, and raise no numpy warnings."""
    import warnings

    shs = spark.createDataFrame(
        [(1, None), (2, []), (3, [7, -7])], "__id LONG, __shs ARRAY<BIGINT>"
    )
    rows_per_band = 8
    band_arr = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda b: F.aggregate(
            F.transform(
                F.sequence(b * rows_per_band, (b + 1) * rows_per_band - 1),
                lambda i: F.array_min(
                    F.transform(F.col("__shs"), lambda h: F.xxhash64(h, i))
                ),
            ),
            F.lit(0).cast("long"),
            lambda acc, m: F.xxhash64(acc, m),
        ),
    )
    expr = {
        r[0]: list(r[1])
        for r in shs.select("__id", band_arr.alias("b")).collect()
    }
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        _good, _sig, band = dd._np_band_keys(
            [None, [], [7, -7]], 128, 16
        )
    arrow = {i + 1: list(band[i]) for i in range(3)}
    assert expr == arrow


def test_lsh_plan_and_probability():
    from architrave_project_apache_nifi_spark.operators.dedup import (
        lsh_candidate_probability,
        lsh_plan,
    )

    # classic MMDS example: 16 bands x 8 rows has its knee near 0.707
    assert abs((1 / 16) ** (1 / 8) - 0.7071) < 1e-3
    b, r, est = lsh_plan(128, 0.7)
    assert b * r == 128
    assert abs(est - 0.7) == min(
        abs((128 // rr) ** (-1.0 / rr) - 0.7)
        for rr in range(1, 129)
        if 128 % rr == 0
    )
    # S-curve is monotone in s and steep around the estimated threshold
    lo = lsh_candidate_probability(est - 0.2, b, r)
    hi = lsh_candidate_probability(est + 0.2, b, r)
    assert lo < 0.5 < hi
    probs = [lsh_candidate_probability(s / 100, b, r) for s in range(101)]
    assert all(x <= y + 1e-12 for x, y in zip(probs, probs[1:]))
    # the repo's gate configuration: 64 hashes targeting ~0.8
    b64, r64, est64 = lsh_plan(64, 0.8)
    assert b64 * r64 == 64 and 0.6 < est64 < 0.95


def test_lsh_candidates_threshold_derives_bands(spark):
    import pytest

    from architrave_project_apache_nifi_spark.operators.dedup import (
        lsh_plan,
        minhash_lsh_candidates,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i % 4} a b c d e f g h {i % 3}") for i in range(40)],
        "doc_id long, text string",
    )
    b, _r, _e = lsh_plan(64, 0.2)
    explicit = sorted(
        map(
            tuple,
            minhash_lsh_candidates(docs, "doc_id", "text", 64, b, 2).collect(),
        )
    )
    derived = sorted(
        map(
            tuple,
            minhash_lsh_candidates(
                docs, "doc_id", "text", 64, None, 2, threshold=0.2
            ).collect(),
        )
    )
    assert explicit == derived
    with pytest.raises(ValueError, match="bands explicitly or a threshold"):
        minhash_lsh_candidates(docs, "doc_id", "text", 64, None, 2)
