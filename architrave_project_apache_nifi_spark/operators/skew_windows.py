"""Skew-resilient per-key WINDOW operators (round 5).

AQE splits skewed shuffle partitions for JOINS, not for windows
(measured: BASELINE.md §Skewed-key stress — a key holding 30% of the
stream keeps 9.9× the median rows in one window task). The remedy that
:func:`~..operators.scd2.scd2_build_skewed` pioneered generalizes to
every cumulative/lag window in the engine:

1. ``hot_ts_buckets`` — detect hot keys from a deterministic row-hash
   sample and split their rows into time-range buckets via per-key
   ``percentile_approx`` edges (monotone in ts; equal timestamps stay
   together, so tie order never straddles a boundary). Cold keys ride
   bucket 0, so a window over ``(key, bucket)`` is IDENTICAL to one
   over ``(key)`` for them — one code path.
2. The main window runs over ``(key, bucket)`` — the hot key spreads
   over ``n_ts_buckets`` tasks.
3. Cross-bucket state (running offsets, previous bucket's last value /
   max timestamp) comes from a per-``(key, bucket)`` algebraic summary
   (≤ keys × buckets rows) windowed over buckets and joined back — the
   sharded-prefix-sum pattern ``operators/packing.py`` uses for
   sequence packing, applied to window state.

Exactness: integer outputs (session ids, row numbers, ntiles) are
bit-identical to the plain window; floating running sums reassociate
(local + offset instead of strictly sequential) — differences are at
the 1-ulp-per-bucket level, far inside the oracle compare's %.9g.

The explicit ``repartition(keys, bucket)`` before each main window is
load-bearing: ``hashpartitioning(keys)`` from an upstream join
SATISFIES ``ClusteredDistribution([keys, bucket])`` (subset rule) and
Spark would silently reuse the skewed exchange (measured in r5 —
see scd2_build_skewed).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..tables import local_df

BUCKET = "__b"


def _as_list(cols: str | Sequence[str]) -> list[str]:
    return [cols] if isinstance(cols, str) else list(cols)


def _ts_num(df: DataFrame, ts_col: str):
    """Monotone numeric image of the event-time column (timestamp and
    timestamp_ntz via unix_micros — session tz is pinned UTC, so the
    ntz reinterpretation is monotone; numerics cast straight)."""
    dtype = dict(df.dtypes)[ts_col]
    if dtype.startswith("timestamp") or dtype == "date":
        def num(c: Column) -> Column:
            return F.unix_micros(c.cast("timestamp")).cast("double")
    else:
        def num(c: Column) -> Column:
            return c.cast("double")
    return num


def order_bucketable(df: DataFrame, col: str) -> bool:
    """Whether ``col`` can drive the time-range buckets: the edges are
    ``percentile_approx`` values over a numeric image (:func:`_ts_num`),
    so strings/binaries — which cast to NULL — would put every row in
    bucket 0 and the twin would degenerate to the plain window plus
    dead machinery. Auto gates on generic order columns (sequences,
    token budgets) check this and silently keep the plain plan."""
    dtype = dict(df.dtypes)[col]
    return (
        dtype.startswith("timestamp")
        or dtype.startswith("decimal")
        or dtype in {
            "date", "tinyint", "smallint", "int", "bigint",
            "float", "double",
        }
    )


# Optimized-plan nodes through which a row-count upper bound survives:
# every node here emits no more rows than the SUM of its children (the
# unary ones emit no more than their one child; Union emits exactly the
# sum — the as-of auto gate probes the union of both sides'
# projections). Anything else — Join, Generate/explode, Aggregate
# (1 row from 0 on global aggs), LogicalRDD (createDataFrame: unknown
# count) — voids the bound.
_BOUND_SAFE_UNARY = frozenset({
    "Project", "Filter", "Sort", "GlobalLimit", "LocalLimit",
    "Repartition", "RepartitionByExpression", "Sample", "Deduplicate",
    "Window", "SubqueryAlias", "Union",
})
_BOUND_FILE_LEAVES = frozenset({
    "LogicalRelation", "Relation", "DataSourceV2Relation",
    "DataSourceV2ScanRelation",
})
# Driver-side footer budget: past this many files the input is a real
# multi-file dataset whose size almost certainly exceeds any sane
# hot_key_rows anyway — run the probe instead of stat-ing footers.
_MAX_FOOTER_FILES = 256


def row_count_upper_bound(df: DataFrame, stop_at: int) -> int | None:
    """Driver-side (zero Spark jobs) upper bound on ``df``'s row count
    from parquet footer metadata, or ``None`` when no safe bound
    exists.

    VERDICT r7 #1: the ``skew_protection="auto"`` gate charged its
    fixed probe job to every protected entry point — ~0.2-0.35 s on
    sub-second sf0.1 queries (window_running_spend 2.02× its recorded
    baseline) spent proving that a 100 k-row scan holds no 5 M-row hot
    key. The proof is free: when the analyzed plan is a tree of
    non-row-increasing nodes over parquet scans
    (:data:`_BOUND_SAFE_UNARY` — the shape of every plain entry-point
    input), the scans' footer ``num_rows`` bounds every downstream
    count, and parquet footers are driver-readable in ~5 ms.

    Multiple scan leaves (Union branches): ``inputFiles()`` is the
    DISTINCT file set across leaves, so two branches over one file
    dedupe to it once and a plain sum would UNDERCOUNT — the bound is
    therefore footer-total × n_leaves (every leaf reads a subset of
    the distinct set, so the product dominates the sum over leaves).

    ``stop_at`` caps the driver work: footer summation early-exits the
    moment the running bound reaches it — the caller only needs
    "provably below stop_at", so a 100 TB dataset costs one or two
    footer reads (or none: > :data:`_MAX_FOOTER_FILES` files bails
    outright) before falling back to the sampled probe.

    CONTRACT (r9, code-review): a return value < ``stop_at`` is a true
    upper bound on the row count; a return value == ``stop_at`` is the
    early-exit SENTINEL meaning only "not provably below stop_at" —
    it is NOT a row estimate (the summation stopped at a partial
    total). ``None`` means no safe bound exists (unwhitelisted plan
    shape, non-parquet/many-file input). Callers must only ever
    compare the result against ``stop_at``."""
    n_leaves = 0
    try:
        # analyzed, NOT optimized: the walk only needs node names, and
        # the optimizer pass costs 30-400 ms per fresh DataFrame on the
        # driver (measured) vs ~10 ms for analysis — which the query
        # pays anyway. Analysis-time shapes are a superset (uncollapsed
        # Projects), all whitelisted; anything the optimizer could
        # remove but we can't classify just falls back to the probe.
        stack = [df._jdf.queryExecution().analyzed()]
        while stack:
            node = stack.pop()
            children = node.children()
            n = children.size()
            name = node.nodeName()
            if n == 0:
                if name not in _BOUND_FILE_LEAVES:
                    return None
                n_leaves += 1
            elif name not in _BOUND_SAFE_UNARY:
                return None
            for i in range(n):
                stack.append(children.apply(i))
        files = df.inputFiles()
    except Exception:  # py4j shape drift / non-classic session → probe
        return None
    if not files or len(files) > _MAX_FOOTER_FILES or n_leaves == 0:
        return None
    import pyarrow.parquet as pq

    total = 0
    for f in files:
        if not f.endswith(".parquet"):
            return None
        path = f[7:] if f.startswith("file://") else f
        try:
            total += pq.ParquetFile(path).metadata.num_rows
        except Exception:
            return None
        if total * n_leaves >= stop_at:
            # sentinel, not an estimate: the partial sum already proves
            # "not below stop_at", and a partial total is NOT an upper
            # bound on the true count
            return stop_at
    return total * n_leaves


def _provably_no_hot_key(df: DataFrame, hot_key_rows: int) -> bool:
    """True when the TOTAL row count is bounded by ``hot_key_rows`` —
    then no single key can exceed it and the sampled probe's exact
    answer is knowable without running it. Strictly stronger than the
    probe (exact bound vs ×100 sample estimate), so the skip can never
    disagree with what exact counting would decide."""
    bound = row_count_upper_bound(df, hot_key_rows + 1)
    return bound is not None and bound <= hot_key_rows


def _detection_sample(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    denom: int,
    sample_salt_cols: Sequence[str],
) -> DataFrame:
    """Deterministic 1/``denom`` row-hash sample used for hot-key
    detection (shared by :func:`hot_ts_buckets` and
    :func:`has_hot_keys`). The hash is over (keys, ts[, salts]) — see
    the sampling-limitation note on :func:`hot_ts_buckets`."""
    if denom <= 1:
        return df
    return df.filter(
        F.pmod(
            F.xxhash64(
                *[F.col(k) for k in keys],
                F.col(ts_col),
                *[F.col(c) for c in sample_salt_cols],
            ),
            denom,
        )
        == 0
    )


def has_hot_keys(
    df: DataFrame,
    key_cols: str | Sequence[str],
    ts_col: str,
    hot_key_rows: int = 5_000_000,
    n_ts_buckets: int = 32,
    sample_salt_cols: Sequence[str] = (),
) -> bool:
    """ONE bounded detection job: does any key's estimated row count
    exceed ``hot_key_rows``?

    This is the runtime gate behind ``skew_protection="auto"`` on the
    plain entry points (scd2_build / sessionize / running_window): the
    same deterministic 1% row-hash sample :func:`hot_ts_buckets` uses,
    aggregated map-side to per-key counts, ``limit(1)`` on the
    over-threshold set — the job ships at most one row to the driver
    and scans only the key/ts(/salt) columns (Catalyst prunes the
    rest). Same precedent as scd2_apply's measured broadcast sizing:
    one cheap eager job buys the plan the data actually needs.

    The denom rule mirrors hot_ts_buckets so auto-detection agrees
    with what the bucketing itself would detect.

    Provably-small inputs (footer row bound ≤ ``hot_key_rows``, see
    :func:`row_count_upper_bound`) short-circuit to False with ZERO
    jobs — VERDICT r7 #1."""
    if _provably_no_hot_key(df, hot_key_rows):
        return False
    keys = _as_list(key_cols)
    denom = 100 if hot_key_rows >= 100 * n_ts_buckets else 1
    sampled = _detection_sample(df, keys, ts_col, denom, sample_salt_cols)
    hot = (
        sampled.groupBy(*keys)
        .agg((F.count(F.lit(1)) * denom).alias("__n"))
        .filter(F.col("__n") > hot_key_rows)
    )
    return len(hot.limit(1).take(1)) > 0


def engage_skew_protection(
    df: DataFrame,
    key_cols: str | Sequence[str],
    ts_col: str,
    skew_protection: bool | str,
    hot_key_rows: int,
    n_ts_buckets: int,
    sample_salt_cols: Sequence[str] = (),
) -> bool:
    """Resolve a ``skew_protection`` mode to a concrete decision.

    ``True``/``False`` are forced (False = today's single-window plan,
    zero extra jobs — the right call for bounded micro-batches or
    expensive un-cached lineage, since "auto" re-reads the input
    lineage once). ``"auto"`` (the default on the plain entry points
    since r7) runs :func:`has_hot_keys`: cold corpora keep the exact
    pre-r7 plan; a corpus with a hot key is routed through the
    bucketed twin instead of stranding 30% of the stream in one
    window task (BASELINE.md §Skewed-key stress)."""
    if skew_protection is True:
        return True
    if not skew_protection:
        return False
    if skew_protection != "auto":
        raise ValueError(
            f"skew_protection must be True, False or 'auto', got "
            f"{skew_protection!r}"
        )
    return has_hot_keys(
        df, key_cols, ts_col, hot_key_rows, n_ts_buckets, sample_salt_cols
    )


def resolve_skew_protection(
    df: DataFrame,
    key_cols: str | Sequence[str],
    ts_col: str,
    skew_protection: bool | str,
    hot_key_rows: int,
    n_ts_buckets: int,
    sample_salt_cols: Sequence[str] = (),
) -> tuple[bool, DataFrame | None]:
    """:func:`engage_skew_protection` that also returns the harvested
    hot edges (``detect_hot_edges``) so the routed twin skips its
    in-plan re-detection — the auto entry points' gate since r7's
    code review. ``True`` still means "forced, detect lazily in-plan"
    (no eager job by contract).

    Two-phase on "auto" (bench-measured): the COLD path — the common
    case — pays only the cheap count-only probe (:func:`has_hot_keys`:
    map-side counts, limit 1); the per-key percentile-sketch harvest
    runs as a second job ONLY when a hot key exists (one sketch per
    key is what made a single-phase gate cost ~0.2-0.35 s per cold
    call at sf0.1). The sample hash is deterministic, so the two
    phases see the same counts and cannot disagree."""
    if skew_protection is True:
        return True, None
    if not skew_protection:
        return False, None
    if skew_protection != "auto":
        raise ValueError(
            f"skew_protection must be True, False or 'auto', got "
            f"{skew_protection!r}"
        )
    if not has_hot_keys(
        df, key_cols, ts_col, hot_key_rows, n_ts_buckets, sample_salt_cols
    ):
        return False, None
    return detect_hot_edges(
        df, key_cols, ts_col, hot_key_rows, n_ts_buckets, sample_salt_cols
    )


def _hot_edges_agg(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    hot_key_rows: int,
    n_ts_buckets: int,
    sample_salt_cols: Sequence[str],
) -> DataFrame:
    """The detection aggregate: one row per HOT key carrying its n-1
    percentile edges as scalar columns ``__e0..`` (cold keys filtered
    out). Shared by the lazy in-plan path (:func:`hot_ts_buckets`) and
    the eager auto-gate (:func:`detect_hot_edges`) so both see the
    same sample, threshold and edge arithmetic."""
    num = _ts_num(df, ts_col)
    denom = 100 if hot_key_rows >= 100 * n_ts_buckets else 1
    sampled = _detection_sample(df, keys, ts_col, denom, sample_salt_cols)
    qs = [i / n_ts_buckets for i in range(1, n_ts_buckets)]
    edge_cols = [f"__e{i}" for i in range(n_ts_buckets - 1)]
    return (
        sampled.groupBy(*keys)
        .agg(
            (F.count(F.lit(1)) * denom).alias("__n"),
            F.percentile_approx(num(F.col(ts_col)), qs).alias("__edges"),
        )
        .filter(F.col("__n") > hot_key_rows)
        .select(
            *keys,
            *[F.col("__edges")[i].alias(c) for i, c in enumerate(edge_cols)],
        )
    )


def detect_hot_edges(
    df: DataFrame,
    key_cols: str | Sequence[str],
    ts_col: str,
    hot_key_rows: int = 5_000_000,
    n_ts_buckets: int = 32,
    sample_salt_cols: Sequence[str] = (),
    max_hot_keys: int = 100_000,
) -> tuple[bool, DataFrame | None]:
    """EAGER hot-key detection that also HARVESTS the percentile edges
    in the same single job (code-review r7: the auto gate used to
    detect eagerly and then let the routed twin re-run the identical
    sampled scan inside its plan — one redundant pass over un-cached
    lineage, on exactly the hot corpora where it costs most).

    Returns ``(engaged, edges)``: ``(False, None)`` — no hot key, stay
    on the plain plan; ``(True, local_edges_df)`` — hot, with the
    collected edges rebuilt as a local DataFrame the twin joins
    instead of re-detecting (≤ ``max_hot_keys`` rows × n_ts_buckets
    doubles — bounded by construction at |rows|/hot_key_rows hot
    keys); ``(True, None)`` — hot set larger than ``max_hot_keys``
    (adversarial: millions of barely-hot keys), fall back to the lazy
    in-plan detection rather than ship an unbounded block through the
    driver."""
    keys = _as_list(key_cols)
    agg = _hot_edges_agg(
        df, keys, ts_col, hot_key_rows, n_ts_buckets, sample_salt_cols
    )
    rows = agg.limit(max_hot_keys + 1).collect()
    if not rows:
        return False, None
    if len(rows) > max_hot_keys:
        return True, None
    spark = df.sparkSession
    # broadcast hint, NOT left to AQE: this local relation has unknown
    # stats (assumed huge), so without the hint the static planner can
    # pick the OTHER side of a twin's edges join as the build side when
    # its scan estimate sits under autoBroadcastJoinThreshold — measured
    # r7: a 20M-row pruned events scan got BroadcastExchange'd (~500 MB
    # through the driver) against this ≤100k-row table. The hint is
    # size-safe by construction: max_hot_keys × n_ts_buckets doubles.
    # local_df (r12): Arrow LocalTableScan — the Python-RDD form ran a
    # Python-worker stage per twin evaluation just to unpickle the
    # bounded hot-key block
    return True, F.broadcast(local_df(spark, rows, agg.schema))


def _bucket_rows(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    edges: DataFrame,
    how: str,
) -> DataFrame:
    """Join the per-hot-key edge columns and derive ``__b``. ``how``
    picks the population: ``"left"`` buckets every row (cold keys ride
    bucket 0 off their NULL edges); ``"inner"`` keeps HOT keys' rows
    only — the twins' cross-bucket summary pipeline runs on that
    bounded subset (one inner join against ≤ |rows|/hot_key_rows keys)
    instead of streaming every cold row through aggregates whose
    contribution is identity. No join hint: AQE sizes the edge side.

    Deliberately NOT expressed as a ``__hot`` filter on the shared
    left-joined stream: pushing ``isnotnull(__e0)`` through the left
    join rewrites that branch's join to inner and the subtree no
    longer matches the main branch's, so AQE stage reuse dies and the
    whole scan+bucket+exchange lineage re-executes per branch
    (measured r7: 98 s vs 17 s on the 20M-row hot corpus)."""
    edge_cols = [c for c in edges.columns if c.startswith("__e")]
    num = _ts_num(df, ts_col)
    merged = df.join(edges, list(keys), how)
    tsn = num(F.col(ts_col))
    bucket = sum(
        (F.when(F.col(c) < tsn, 1).otherwise(0) for c in edge_cols),
        F.lit(0),
    )
    return merged.withColumn(BUCKET, bucket).drop(*edge_cols)


def hot_ts_buckets(
    df: DataFrame,
    key_cols: str | Sequence[str],
    ts_col: str,
    hot_key_rows: int = 5_000_000,
    n_ts_buckets: int = 32,
    sample_salt_cols: Sequence[str] = (),
    hot_edges: DataFrame | None = None,
) -> DataFrame:
    """Append the time-range bucket column ``__b``: 0 for cold keys,
    ``|{percentile edge < ts}|`` for keys whose estimated row count
    exceeds ``hot_key_rows``.

    Detection + edges come from ONE aggregate over a deterministic 1%
    row-hash sample when the threshold is large enough to concentrate
    (``hot_key_rows ≥ 100 × n_ts_buckets``), else exact. Edges land as
    n-1 SCALAR columns and the bucket is a chain of codegen'd
    comparisons — the array higher-order ``filter()`` form runs
    interpreted per element (measured 20× slower over a 20M-row fact).
    NULL edges (cold key) and NULL ts both compare false → bucket 0.

    Sampling limitation: the hash is over ``(keys, ts)``, so all rows
    sharing one ``(key, ts)`` are sampled all-or-nothing. For hot keys
    whose timestamps are coarse (many ties per value) the row-count
    estimate has tie-group-sized variance and can under-detect —
    a perf-only miss (the key falls back to the single plain-window
    task), never a correctness one. Callers with a finer-grained
    column available (e.g. a sequence id, or the raw microsecond ts
    when bucketing on a truncated copy) should pass it via
    ``sample_salt_cols``: it is mixed into the sampling hash only —
    never into the bucket edges — making the sample per-row.

    ``hot_edges``: a pre-detected edges DataFrame (the
    :func:`detect_hot_edges` harvest) — skips the in-plan detection
    aggregate entirely, so an auto-gated call pays detection ONCE."""
    keys = _as_list(key_cols)
    if hot_edges is None:
        hot_edges = _hot_edges_agg(
            df, keys, ts_col, hot_key_rows, n_ts_buckets, sample_salt_cols
        )
    return _bucket_rows(df, keys, ts_col, hot_edges, "left")


def _bucketed_exchange(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """The load-bearing explicit (keys, __b) repartition — see module
    docstring (hashpartitioning(keys) would otherwise satisfy the
    window's clustering requirement and resurrect the straggler)."""
    return df.repartition(*[F.col(k) for k in keys], F.col(BUCKET))


def sessionize_skewed(
    df: DataFrame,
    key_cols: str | Sequence[str],
    ts_col: str,
    gap_s: float,
    order_cols: Sequence[str] = (),
    hot_key_rows: int = 5_000_000,
    n_ts_buckets: int = 32,
    hot_edges: DataFrame | None = None,
) -> DataFrame:
    """:func:`~.temporal.sessionize` (gap-based session ids, 1-based
    dense per key), bit-identical output, hot keys spread over time
    buckets.

    Cross-bucket state: a bucket-first row's previous event time is the
    previous bucket's MAX ts (buckets are time-disjoint); its session
    counter offset is the running sum of new-session flags over all
    preceding buckets. With harvested ``hot_edges`` (the auto gate's
    path) both are computed on a SEPARATE hot-keys-only pipeline (r7):
    a column-pruned scan inner-joined to the bounded broadcast edge
    set, so the summary passes read |hot rows| instead of |all rows|
    and the main stream pays ONE window pass (measured: twin overhead
    1.67× → 1.06× on the 20M-row hot corpus). Lazily detected edges
    keep the summaries on the shared all-keys stream — see the mode
    comment inside."""
    keys = _as_list(key_cols)
    gap_us = int(gap_s * 1_000_000)
    harvested = hot_edges is not None
    if not harvested:
        hot_edges = _hot_edges_agg(
            df, keys, ts_col, hot_key_rows, n_ts_buckets, ()
        )
    bucketed = _bucketed_exchange(
        _bucket_rows(df, keys, ts_col, hot_edges, "left"), keys
    )

    w = Window.partitionBy(*keys, BUCKET).orderBy(
        F.col(ts_col).asc(), *[F.col(c).asc() for c in order_cols]
    )
    wk = Window.partitionBy(*keys).orderBy(BUCKET)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))

    def new_session_flag() -> Column:
        # same expression on both pipelines: hot rows see identical
        # (prev-in-bucket, prev-bucket-max) inputs either way, so the
        # hot pipeline's flag totals equal the main stream's exactly
        prev = F.coalesce(F.lag(ts_us).over(w), F.col("__prev_max_us"))
        return (prev.isNull() | (ts_us - prev > F.lit(gap_us))).cast("int")

    # Summary source: per-(key, bucket) max ts and new-session-flag
    # totals. HARVESTED mode (the auto gate — bounded, broadcast-hinted
    # edges): hot keys' rows only, from a separate column-pruned
    # inner-join pipeline (see _bucket_rows on why this is an inner
    # join, not a filter on `bucketed`) — cold keys' summary rows are
    # identity (NULL prev-max, 0 offset) and the left join-backs below
    # synthesize exactly those via coalesce, so the summary windows
    # read |hot rows| instead of |all rows| (measured r7: twin
    # overhead 1.67× → 1.06× on the 20M-row hot corpus). LAZY mode
    # (forced skew_protection=True / >max_hot_keys fallback): the edge
    # set is unbounded, a broadcast can't be assumed and a merge-hinted
    # inner join re-shuffles the full table on the skewed bare key
    # (measured 2-4× worse) — summaries run over `bucketed` itself,
    # whose identical subtree AQE stage-reuses; cold keys' summary rows
    # then JOIN to the same identity values the coalesces synthesize,
    # so both modes share every expression below.
    # (shape note, r7: the sequences twin's semi-join-above-the-shared-
    # exchange was measured HERE too and lost — 1.46x vs this pruned
    # pipeline's 1.12x — because sessionize consumes hot_rows twice,
    # summ agg + flag window, and the semi hands both branches
    # full-width rows where this pipeline hands them three columns)
    hot_cols = list(dict.fromkeys([*keys, ts_col, *order_cols]))
    hot_rows = _bucketed_exchange(
        _bucket_rows(df.select(*hot_cols), keys, ts_col, hot_edges, "inner"),
        keys,
    ) if harvested else bucketed
    summ = (
        hot_rows.groupBy(*keys, BUCKET)
        .agg(F.max(ts_us).alias("__max_us"))
        .withColumn("__prev_max_us", F.lag("__max_us").over(wk))
        .select(*keys, BUCKET, "__prev_max_us")
    )
    # integer prefix over buckets: each bucket's session offset is the
    # flag total of all preceding buckets of its key
    offsets = (
        hot_rows.join(summ, [*keys, BUCKET], "left")
        .withColumn("__new", new_session_flag())
        .groupBy(*keys, BUCKET)
        .agg(F.sum("__new").alias("__flags"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__flags").over(
                    wk.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select(*keys, BUCKET, "__off")
    )

    # MAIN stream: one window pass; cold rows draw NULL __prev_max_us
    # (no previous bucket) and 0 offset from the hot-only join-backs
    flagged = bucketed.join(summ, [*keys, BUCKET], "left").withColumn(
        "__new", new_session_flag()
    )
    local_sess = F.sum("__new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        flagged.withColumn("__local_sess", local_sess)
        .join(offsets, [*keys, BUCKET], "left")
        .withColumn(
            "session_id",
            (F.col("__local_sess") + F.coalesce(F.col("__off"), F.lit(0)))
            .cast("long"),
        )
        .drop(BUCKET, "__prev_max_us", "__new", "__local_sess", "__off")
    )


def running_window_skewed(
    df: DataFrame,
    key_cols: str | Sequence[str],
    ts_col: str,
    value_col: str,
    order_cols: Sequence[str] = (),
    n_tiles: int = 4,
    hot_key_rows: int = 5_000_000,
    n_ts_buckets: int = 32,
    hot_edges: DataFrame | None = None,
) -> DataFrame:
    """The ``window_running_spend`` trio — cumulative sum, lag delta,
    ntile — over a (key, time-bucket) window with sharded-prefix
    cross-bucket state, so one hot key cannot serialize the sort.

    Adds columns ``running_sum`` (double; reassociated at bucket
    boundaries — 1-ulp-class differences vs the sequential window),
    ``delta_vs_prev`` (exact: previous value is carried, not summed)
    and ``tile`` (exact: ntile arithmetic over the two-phase global row
    number and the per-key total)."""
    keys = _as_list(key_cols)
    harvested = hot_edges is not None
    if not harvested:
        hot_edges = _hot_edges_agg(
            df, keys, ts_col, hot_key_rows, n_ts_buckets, ()
        )
    bucketed = _bucketed_exchange(
        _bucket_rows(df, keys, ts_col, hot_edges, "left"), keys
    )
    order = [F.col(ts_col).asc(), *[F.col(c).asc() for c in order_cols]]
    w = Window.partitionBy(*keys, BUCKET).orderBy(*order)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    # ONE summary row per (key, bucket): row count, value total, and
    # the bucket's last value in (ts, order) order (max_by — algebraic).
    # HARVESTED mode: HOT keys only, from a separate column-pruned
    # inner-join pipeline — pure hash-agg (map-side partial, no
    # exchange needed); cold rows draw identity offsets (0/NULL) from
    # the left join + coalesces below, except __n for ntile, where the
    # cold fallback is the plain per-(key,bucket) ntile — exact, since
    # a cold key IS one bucket. LAZY mode: summaries over `bucketed`
    # itself (unbounded edge set — see the sessionize_skewed comment);
    # its cold summary rows join to the same identity values, so every
    # expression below is mode-independent.
    hot_cols = list(dict.fromkeys([*keys, ts_col, value_col, *order_cols]))
    summ_src = _bucket_rows(
        df.select(*hot_cols), keys, ts_col, hot_edges, "inner"
    ) if harvested else bucketed
    summ = summ_src.groupBy(*keys, BUCKET).agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum(value_col).alias("__vsum"),
        F.count(value_col).alias("__nn"),  # non-NULL values (sum skips)
        F.max_by(
            F.col(value_col),
            F.struct(F.col(ts_col), *[F.col(c) for c in order_cols]),
        ).alias("__last_val"),
    )
    wk = Window.partitionBy(*keys).orderBy(BUCKET)
    prefix = (
        summ.withColumn(
            "__row_off",
            F.coalesce(
                F.sum("__cnt").over(
                    wk.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            "__val_off",
            F.coalesce(
                F.sum("__vsum").over(
                    wk.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0.0),
            ),
        )
        .withColumn(
            "__nn_off",
            F.coalesce(
                F.sum("__nn").over(
                    wk.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn("__prev_last", F.lag("__last_val").over(wk))
        .withColumn(
            "__n",
            F.sum("__cnt").over(
                wk.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        .select(
            *keys, BUCKET, "__row_off", "__val_off", "__nn_off",
            "__prev_last", "__n",
        )
    )
    joined = bucketed.join(prefix, [*keys, BUCKET], "left")
    rn = (
        F.row_number().over(w) + F.coalesce(F.col("__row_off"), F.lit(0))
    ).cast("long")
    # NULL semantics must mirror the plain window exactly (code-review
    # r5): sum() skips NULL values, so the running sum is NULL only
    # while the ENTIRE prefix (local + prior buckets) has zero non-NULL
    # values; and a NULL lag(value) means 'previous value is NULL' when
    # a previous row exists — only a true bucket-first row may take the
    # previous bucket's last value.
    nn_total = F.count(value_col).over(wcum) + F.coalesce(
        F.col("__nn_off"), F.lit(0)
    )
    running = F.when(nn_total == 0, F.lit(None).cast("double")).otherwise(
        F.coalesce(F.sum(value_col).over(wcum), F.lit(0.0))
        + F.coalesce(F.col("__val_off"), F.lit(0.0))
    )
    prev_exists = F.lag(F.lit(1)).over(w)
    prev_val = F.when(
        prev_exists.isNull(), F.col("__prev_last")
    ).otherwise(F.lag(value_col).over(w))
    # ntile(t): the first n % t tiles get ceil(n/t) rows
    n = F.col("__n")
    base = (n / n_tiles).cast("long")
    rem = n - base * n_tiles
    big = (base + 1) * rem  # rows covered by the oversized tiles
    tile = (
        # cold key (absent from the hot-only prefix): one bucket ==
        # the whole key, so the plain per-(key,bucket) ntile is exact
        F.when(n.isNull(), F.ntile(n_tiles).over(w))
        .when(rn <= big, (((rn - 1) / (base + 1)).cast("long") + 1).cast("int"))
        .otherwise(
            (
                rem
                + ((rn - big - 1) / F.greatest(base, F.lit(1))).cast("long")
                + 1
            ).cast("int")
        )
    )
    return (
        joined.withColumn("running_sum", running)
        .withColumn("delta_vs_prev", F.col(value_col) - prev_val)
        .withColumn("tile", tile)
        .drop(
            BUCKET, "__row_off", "__val_off", "__nn_off",
            "__prev_last", "__n",
        )
    )


def _detect_hot_keys(
    df: DataFrame,
    keys: Sequence[str],
    salt_cols: Sequence[str],
    hot_key_rows: int,
    n_salts: int,
    max_hot_keys: int = 100_000,
) -> tuple[bool, DataFrame | None]:
    """ONE-job gate + harvest for :func:`topk_per_key`'s conditional
    salting — :func:`detect_hot_edges` minus the percentile sketch
    (rank salting needs the key SET, not time edges). The hot-key
    aggregate IS :func:`has_hot_keys`' count probe plus a key
    projection, so running it once replaces probe-then-harvest (two
    scans) with a single scan whose EMPTY result means "cold".
    Returns ``(engaged, hot_keys)``: ``(False, None)`` cold;
    ``(True, df)`` with a broadcast-hinted local DataFrame of the
    ≤ ``max_hot_keys`` hot keys; ``(True, None)`` when the set is
    adversarially large (salt everything instead — bounded
    degradation, never an unbounded driver block). Shares
    :func:`has_hot_keys`' provably-small short-circuit (zero jobs on
    a footer-bounded input)."""
    if _provably_no_hot_key(df, hot_key_rows):
        return False, None
    denom = 100 if hot_key_rows >= 100 * n_salts else 1
    sampled = _detection_sample(df, keys, salt_cols[0], denom, salt_cols[1:])
    agg = (
        sampled.groupBy(*keys)
        .agg((F.count(F.lit(1)) * denom).alias("__n"))
        .filter(F.col("__n") > hot_key_rows)
        .select(*keys)
    )
    rows = agg.limit(max_hot_keys + 1).collect()
    if not rows:
        return False, None
    if len(rows) > max_hot_keys:
        return True, None
    spark = df.sparkSession
    # local_df (r12): Arrow LocalTableScan — the Python-RDD form ran a
    # Python-worker stage per twin evaluation just to unpickle the
    # bounded hot-key block
    return True, F.broadcast(local_df(spark, rows, agg.schema))


def topk_per_key(
    df: DataFrame,
    key_cols: str | Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rank",
    salt_cols: Sequence[str] | None = None,
    skew_protection: bool | str = "auto",
    hot_key_rows: int = 5_000_000,
    n_salts: int = 32,
    probe: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` rows per key under ``order_by`` (a total order — pass
    a tiebreak column, exactly as a plain ``row_number`` would need),
    with ``rank_col`` attached (1-based).

    The plain form is one ``row_number`` window — and therefore the
    sessionize straggler when one key holds an outsized share of rows
    (AQE never splits a skewed window partition). The protected form is
    the classic two-phase rank: a deterministic row-hash salt splits
    each key into ≤ ``n_salts`` shards, phase 1 keeps each shard's
    local top-k (the global top-k is a subset of the union by a
    pigeonhole argument: a row outside its own shard's top-k has k
    better rows in its shard alone), phase 2 ranks the ≤ n_salts × k
    survivors per key — bounded state regardless of key skew. A
    surviving row with true global rank r ≤ k has all r-1 better rows
    surviving too, so phase 2's row_number equals the plain rank
    exactly.

    ``salt_cols`` drive the deterministic shard hash (default: every
    non-key column). ``skew_protection`` follows the engine contract:
    ``"auto"`` (default) pays one bounded sampled count probe and
    salts only when a key exceeds ``hot_key_rows``; ``False`` is the
    plain single-window plan; ``True`` forces salting.

    ``probe``: optional CHEAPER stand-in for the auto gate's count
    probe — the probe action executes ``df``'s (possibly expensive,
    un-cached) lineage once, so a caller holding an upstream frame
    whose per-key row counts UPPER-BOUND ``df``'s (e.g. the
    pre-aggregation fact rows) can gate on that instead. The probe
    only picks the plan; over-detection engages salting harmlessly and
    correctness never depends on it. Callers whose input lineage is
    itself a heavy join should pass ``skew_protection=True`` outright —
    forced salting costs one extra bounded window, cheaper than any
    probe re-execution (code-review r7)."""
    keys = _as_list(key_cols)
    if salt_cols is None:
        salt_cols = [c for c in df.columns if c not in keys]
    if not salt_cols:
        raise ValueError(
            "topk_per_key: salt_cols must name at least one non-key column"
        )
    gate_df = probe if probe is not None else df
    gate_salts = [c for c in salt_cols if c in gate_df.columns]
    if not gate_salts:
        gate_salts = [c for c in gate_df.columns if c not in keys]
    # Auto runs ONE eager job that both gates and harvests the hot-key
    # set, and salts HOT keys only (code-review r7 follow-up): salting
    # a cold key defeats phase 1 entirely — a key with fewer than
    # n_salts × k rows keeps ~every row through the per-shard top-k, so
    # phase 2 re-ranks nearly the whole input (measured 2.8× the plain
    # wall on the mostly-cold hot corpus). Cold keys take salt 0: their
    # phase-1 window IS the exact per-key top-k (≤ k survivors) and
    # phase 2 re-derives the same ranks over ≤ k rows per key. Forced
    # ``True`` keeps salt-everything (no detection job by contract, and
    # the >max_hot_keys auto fallback lands here too).
    hot_keys = None
    if skew_protection == "auto":
        engaged, hot_keys = _detect_hot_keys(
            gate_df, keys, gate_salts, hot_key_rows, n_salts
        )
    else:
        engaged = engage_skew_protection(
            gate_df, keys, gate_salts[0], skew_protection, hot_key_rows,
            n_salts, sample_salt_cols=gate_salts[1:],
        )
    if not engaged:
        w = Window.partitionBy(*keys).orderBy(*order_by)
        return df.withColumn(rank_col, F.row_number().over(w)).filter(
            F.col(rank_col) <= k
        )
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salts)
    )
    if hot_keys is not None:
        salted = (
            df.join(hot_keys.withColumn("__is_hot", F.lit(1)), keys, "left")
            .withColumn(
                "__salt",
                F.when(F.col("__is_hot").isNotNull(), salt).otherwise(
                    F.lit(0)
                ),
            )
            .drop("__is_hot")
        )
    else:
        salted = df.withColumn("__salt", salt)
    w1 = Window.partitionBy(*keys, "__salt").orderBy(*order_by)
    pruned = (
        salted
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .drop("__salt", "__r1")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order_by)
    return pruned.withColumn(rank_col, F.row_number().over(w2)).filter(
        F.col(rank_col) <= k
    )


def running_window(
    df: DataFrame,
    key_cols: str | Sequence[str],
    ts_col: str,
    value_col: str,
    order_cols: Sequence[str] = (),
    n_tiles: int = 4,
    skew_protection: bool | str = "auto",
    hot_key_rows: int = 5_000_000,
    n_ts_buckets: int = 32,
) -> DataFrame:
    """Cumulative sum + lag delta + ntile per key — the plain
    single-window form of :func:`running_window_skewed`, with
    ``skew_protection="auto"`` (r7): one bounded sampled detection job
    decides at runtime whether any key exceeds ``hot_key_rows``; cold
    corpora get exactly the one-shuffle one-sort plan below, a hot
    corpus is routed through the bucketed twin instead of serializing
    the sort in one task. Adds ``running_sum`` (double),
    ``delta_vs_prev`` and ``tile`` — same columns either way."""
    engaged, edges = resolve_skew_protection(
        df, key_cols, ts_col, skew_protection, hot_key_rows, n_ts_buckets,
        sample_salt_cols=order_cols,  # per-row sample despite coarse ts
    )
    if engaged:
        return running_window_skewed(
            df, key_cols, ts_col, value_col, order_cols, n_tiles,
            hot_key_rows, n_ts_buckets, hot_edges=edges,
        )
    keys = _as_list(key_cols)
    order = [F.col(ts_col).asc(), *[F.col(c).asc() for c in order_cols]]
    w = Window.partitionBy(*keys).orderBy(*order)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        df.withColumn(
            "running_sum", F.sum(value_col).over(wcum).cast("double")
        )
        .withColumn(
            "delta_vs_prev", F.col(value_col) - F.lag(value_col).over(w)
        )
        .withColumn("tile", F.ntile(n_tiles).over(w))
    )


def trailing_range_window(
    df: DataFrame,
    key_cols: str | Sequence[str],
    ts_col: str,
    value_col: str,
    window_s: int = 86_400,
    skew_protection: bool | str = "auto",
    hot_key_rows: int = 5_000_000,
    n_ts_buckets: int = 32,
) -> DataFrame:
    """Trailing time-range aggregates (``RANGE BETWEEN window_s
    PRECEDING AND CURRENT ROW`` over epoch seconds) — the plain
    single-window form of :func:`trailing_range_window_skewed`, with
    the same ``skew_protection="auto"`` contract as
    :func:`running_window`. Adds ``trail_sum`` and ``trail_cnt``.

    The auto probe runs on the EPOCH-SECOND image of ``ts_col`` (the
    twin buckets on seconds — RANGE ties share a frame), salted with
    the raw ts so coarse-second tie groups stay per-row in the sample;
    harvested edges are therefore directly injectable into the twin."""
    keys = _as_list(key_cols)
    sec = F.col(ts_col).cast("timestamp").cast("long")
    if skew_protection:
        probe = df.select(
            *[F.col(k) for k in keys], sec.alias("__sec"), F.col(ts_col)
        )
        engaged, edges = resolve_skew_protection(
            probe, keys, "__sec", skew_protection, hot_key_rows,
            n_ts_buckets, sample_salt_cols=(ts_col,),
        )
        if engaged:
            return trailing_range_window_skewed(
                df, keys, ts_col, value_col, window_s,
                hot_key_rows, n_ts_buckets, hot_edges=edges,
            )
    w = (
        Window.partitionBy(*keys)
        .orderBy(sec)
        .rangeBetween(-int(window_s), Window.currentRow)
    )
    # one projection → one Window node (both frames share the spec)
    return df.select(
        "*",
        F.sum(value_col).over(w).alias("trail_sum"),
        F.count(F.lit(1)).over(w).alias("trail_cnt"),
    )


def _asof_join_skewed_directional(
    left: DataFrame,
    right: DataFrame,
    key_cols: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str],
    right_order_cols: Sequence[str],
    prefix: str,
    hot_key_rows: int,
    n_ts_buckets: int,
    forward: bool,
    hot_edges: DataFrame | None = None,
) -> DataFrame:
    """Shared union + scan + bucket-carry skeleton for both as-of
    directions. ``forward`` flips exactly four things: the scan order
    (ts/order DESC instead of ASC), the bucket summary (``min_by``
    instead of ``max_by``), the carry direction (inherited from HIGHER
    buckets), and nothing else — a change to the skeleton lands in both
    directions by construction (code-review r5: the two public
    functions used to be hand-mirrored copies)."""
    keys = _as_list(key_cols)
    rv = F.struct(*[F.col(c) for c in right_value_cols])
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        *[F.col(c) for c in right_order_cols],
        rv.alias("__rv"),
    ).withColumn("__is_left", F.lit(0))
    l = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__is_left", F.lit(1))
    )
    merged = l.unionByName(r, allowMissingColumns=True)
    bucketed = _bucketed_exchange(
        hot_ts_buckets(
            merged, keys, "__ts", hot_key_rows, n_ts_buckets,
            hot_edges=hot_edges,
        ),
        keys,
    )

    def scan_dir(c: Column) -> Column:
        return c.desc() if forward else c.asc()

    order = [scan_dir(F.col("__ts")), F.col("__is_left").asc()]
    order += [scan_dir(F.col(c)) for c in right_order_cols]
    w = (
        Window.partitionBy(*keys, BUCKET)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # bucket carry: the last RIGHT row's value in scan order — left
    # rows contribute a NULL ordering key, which max_by/min_by skip.
    # Harvested edges (r7): the carry is identity for cold keys (one
    # bucket — the in-window `last` covers it and their carry join-miss
    # NULL equals the lag-NULL the all-keys summary produced), so a
    # broadcast SEMI against the bounded edge keys ABOVE the shared
    # exchange cuts the summary agg to hot rows. Single consumer and a
    # pure agg, so neither measured counter-case applies (sessionize's
    # double consumption, the filter-pushdown subtree trap); crucially
    # it also never re-executes the union lineage — this path runs
    # inside trailing_range_window over the derived cumulative table.
    right_ord = F.when(
        F.col("__is_left") == 0,
        F.struct(F.col("__ts"), *[F.col(c) for c in right_order_cols]),
    )
    pick_last = F.min_by if forward else F.max_by
    summ_src = (
        bucketed.join(hot_edges.select(*keys), keys, "semi")
        if hot_edges is not None else bucketed
    )
    summ = summ_src.groupBy(*keys, BUCKET).agg(
        pick_last(F.col("__rv"), right_ord).alias("__bucket_last")
    )
    wk = Window.partitionBy(*keys).orderBy(scan_dir(F.col(BUCKET)))
    carry = summ.withColumn(
        "__carry",
        F.last("__bucket_last", ignorenulls=True).over(
            wk.rowsBetween(Window.unboundedPreceding, -1)
        ),
    ).select(*keys, BUCKET, "__carry")

    out = (
        bucketed.join(carry, [*keys, BUCKET], "left")
        .withColumn(
            "__last_rv",
            F.coalesce(
                F.last("__rv", ignorenulls=True).over(w), F.col("__carry")
            ),
        )
        .filter(F.col("__is_left") == 1)
        .drop(
            BUCKET, "__carry", "__rv", "__ts", "__is_left",
            *[c for c in right_order_cols if c not in left.columns],
        )
    )
    for c in right_value_cols:
        out = out.withColumn(f"{prefix}{c}", F.col("__last_rv").getField(c))
    return out.drop("__last_rv")


def asof_join_skewed(
    left: DataFrame,
    right: DataFrame,
    key_cols: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str],
    right_order_cols: Sequence[str] = (),
    prefix: str = "asof_",
    hot_key_rows: int = 5_000_000,
    n_ts_buckets: int = 32,
    hot_edges: DataFrame | None = None,
) -> DataFrame:
    """:func:`~.temporal.asof_join` (backward inclusive: each left row
    takes the latest right row with ``right_ts <= left_ts`` per key;
    ties resolve to the greatest ``right_order_cols``), bit-identical
    output, hot keys spread over time buckets.

    Same union + fill-forward formulation; the scan window runs over
    ``(key, bucket)`` and the cross-bucket carry is each bucket's last
    right-side value in scan order — ``max_by`` over the bucket with a
    NULL ordering key for left rows (max_by ignores NULL keys) —
    fill-forwarded over the per-key bucket summary, so a bucket with
    no rights inherits the nearest earlier bucket's carry."""
    return _asof_join_skewed_directional(
        left, right, key_cols, left_ts, right_ts, right_value_cols,
        right_order_cols, prefix, hot_key_rows, n_ts_buckets,
        forward=False, hot_edges=hot_edges,
    )


def asof_join_forward_skewed(
    left: DataFrame,
    right: DataFrame,
    key_cols: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str],
    right_order_cols: Sequence[str] = (),
    prefix: str = "next_",
    hot_key_rows: int = 5_000_000,
    n_ts_buckets: int = 32,
    hot_edges: DataFrame | None = None,
) -> DataFrame:
    """:func:`~.temporal.asof_join_forward` (each left row takes the
    EARLIEST right with ``right_ts >= left_ts``; ties resolve to the
    smallest ``right_order_cols``), bit-identical, hot keys spread over
    time buckets — the descending-scan mirror of
    :func:`asof_join_skewed`: the scan runs time-DESC within
    (key, bucket); a bucket's carry is its last right in that scan
    order, i.e. its MIN (ts, order) right (``min_by``), inherited from
    HIGHER buckets (``last`` over buckets ordered descending)."""
    return _asof_join_skewed_directional(
        left, right, key_cols, left_ts, right_ts, right_value_cols,
        right_order_cols, prefix, hot_key_rows, n_ts_buckets,
        forward=True, hot_edges=hot_edges,
    )


def trailing_range_window_skewed(
    df: DataFrame,
    key_cols: str | Sequence[str],
    ts_col: str,
    value_col: str,
    window_s: int = 86_400,
    hot_key_rows: int = 5_000_000,
    n_ts_buckets: int = 32,
    hot_edges: DataFrame | None = None,
) -> DataFrame:
    """Trailing TIME-RANGE aggregates per key (``RANGE BETWEEN
    window_s PRECEDING AND CURRENT ROW`` over epoch seconds) — the
    skew-resilient form of ``window_trailing_24h_spend``. Adds
    ``trail_sum`` and ``trail_cnt``; NULL semantics mirror the plain
    frame exactly (sum is NULL iff the frame holds zero non-NULL
    values; count counts rows).

    Formulation: a trailing range sum is the DIFFERENCE OF TWO PREFIX
    READS — cum(t) − cum(t − window_s − 1) — so it composes from the
    toolkit's two primitives instead of needing range-frame-specific
    bucket machinery: (1) the inclusive cumulative (local RANGE window
    inside each time bucket plus the per-bucket offsets), and (2) a
    backward as-of read of the per-second cumulative table at the
    shifted timestamp, which is exactly :func:`asof_join_skewed` and is
    itself hot-key-safe. The RANGE frame ties on EPOCH SECONDS, so the
    buckets must be a function of the epoch second too — bucketing on
    the raw (microsecond) ts would let a percentile edge fall inside a
    second and split a tie group across buckets, silently undercutting
    the earlier rows' cumulative (ADVICE r5, reproduced with 100 ms
    spacing). Hence ``__sec`` is computed FIRST and is the bucketing
    column; the raw ts is mixed into the detection sample hash only
    (``sample_salt_cols``) so coarse-second ties don't inflate the
    sample variance. Tie rows (same epoch second) then share one
    bucket, one frame and one cumulative value, and the per-second
    table collapses ties with a plain max."""
    keys = _as_list(key_cols)
    sec = F.col(ts_col).cast("timestamp").cast("long")
    bucketed = _bucketed_exchange(
        hot_ts_buckets(
            df.withColumn("__sec", sec),
            keys,
            "__sec",
            hot_key_rows,
            n_ts_buckets,
            sample_salt_cols=(ts_col,),
            hot_edges=hot_edges,
        ),
        keys,
    )
    wr = (
        Window.partitionBy(*keys, BUCKET)
        .orderBy("__sec")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wk = Window.partitionBy(*keys).orderBy(BUCKET)
    summ = bucketed.groupBy(*keys, BUCKET).agg(
        F.sum(value_col).alias("__vsum"),
        F.count(F.lit(1)).alias("__cnt"),
        F.count(value_col).alias("__nn"),
    )
    prefix = summ.select(
        *keys,
        BUCKET,
        F.coalesce(
            F.sum("__vsum").over(wk.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0.0),
        ).alias("__voff"),
        F.coalesce(
            F.sum("__cnt").over(wk.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__coff"),
        F.coalesce(
            F.sum("__nn").over(wk.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__nnoff"),
    )
    cum = (
        bucketed.join(prefix, [*keys, BUCKET], "left")
        .withColumn(
            "__cumv",
            F.coalesce(F.sum(value_col).over(wr), F.lit(0.0)) + F.col("__voff"),
        )
        .withColumn("__cumc", F.count(F.lit(1)).over(wr) + F.col("__coff"))
        .withColumn("__cumn", F.count(value_col).over(wr) + F.col("__nnoff"))
        .drop(BUCKET, "__voff", "__coff", "__nnoff")
    )
    # per-second cumulative table: ties share one frame, hence one value
    per_sec = cum.groupBy(*keys, "__sec").agg(
        F.max("__cumv").alias("__pv"),
        F.max("__cumc").alias("__pc"),
        F.max("__cumn").alias("__pn"),
    )
    # hot_edges flow through to the internal as-of (r7): bucketing is
    # correct under ANY per-key monotone split of the ts domain — the
    # edges only steer balance — and the as-of's union ts lives in the
    # same epoch-second domain (shifted by window_s on the probe side),
    # so the outer harvest balances it too. Without this the as-of
    # re-detects in-plan over the union of `cum` and `per_sec`, i.e.
    # re-executes the 20M-row cumulative-window lineage once more just
    # to find the same hot keys (measured: ~30% of the twin's wall).
    probed = asof_join_skewed(
        cum.withColumn("__lookup", F.col("__sec") - F.lit(window_s + 1)),
        per_sec,
        keys,
        "__lookup",
        "__sec",
        right_value_cols=("__pv", "__pc", "__pn"),
        prefix="__at_",
        hot_key_rows=hot_key_rows,
        n_ts_buckets=n_ts_buckets,
        hot_edges=hot_edges,
    )
    nn24 = F.col("__cumn") - F.coalesce(F.col("__at___pn"), F.lit(0))
    return (
        probed.withColumn(
            "trail_sum",
            F.when(nn24 == 0, F.lit(None).cast("double")).otherwise(
                F.col("__cumv") - F.coalesce(F.col("__at___pv"), F.lit(0.0))
            ),
        )
        .withColumn(
            "trail_cnt",
            (F.col("__cumc") - F.coalesce(F.col("__at___pc"), F.lit(0))).cast(
                "long"
            ),
        )
        .drop(
            "__sec", "__lookup", "__cumv", "__cumc", "__cumn",
            "__at___pv", "__at___pc", "__at___pn",
        )
    )
