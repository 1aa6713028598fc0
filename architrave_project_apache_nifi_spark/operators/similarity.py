"""Similarity search over embedding columns (driver-mandated extension,
SURVEY.md §2.9).

Baseline: brute-force cosine top-k — exact, one broadcast of the query
set, no shuffle of the corpus. Scale path: LSH (random-hyperplane)
bucketing — the corpus is hashed once into buckets; queries probe only
their bucket (+ optional multi-probe neighbors), turning a full scan
into a pruned one. Deterministic: projection vectors derive from a
seeded hash, not runtime randomness.

Scoring paths: brute force uses Arrow-batched numpy (BLAS matmul per
corpus partition — dense pairwise vector math is where row-at-a-time
Column expressions lose); the LSH variant keeps ``aggregate``/
``zip_with`` Column expressions to demonstrate the pure-JVM path on
the pruned candidate set.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _unit(vec: Column) -> Column:
    """L2-normalized double vector (spherical-k-means input). A
    zero-norm vector (padding row, failed upstream encoder) stays the
    zero vector instead of NaN-poisoning k-means training/assignment."""
    v = _as_double(vec)
    n = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    safe = F.when(n == 0.0, F.lit(1.0)).otherwise(n)
    return F.transform(v, lambda x: x / safe)


def _collect_block(
    df: DataFrame, cols: list[str], max_rows: int, fn: str, param: str,
) -> list:
    """Driver-side collect of a query/anchor block with a hard ceiling.

    These blocks are broadcast to every task AND materialized on the
    driver; an unbounded collect OOMs the driver with no error naming
    the cause (VERDICT r4). ``limit(max_rows + 1)`` bounds the collect
    itself (the guard cannot OOM while checking), and overflow raises a
    ValueError naming the knob and the scalable alternatives."""
    rows = df.select(*cols).limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"{fn}: the block exceeds {param}={max_rows} rows; it is "
            "collected on the driver and shipped to every task, so an "
            "unbounded set OOMs the driver. Either raise "
            f"{param} explicitly (driver memory permitting), chunk the "
            "set and union the per-chunk results, or use the indexed "
            "path (ivf_topk over a persisted ivf_build index) for "
            "corpus-sized query/anchor sets."
        )
    return rows


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold — deterministic double summation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    metric: str = "cosine",
    max_query_rows: int = 100_000,
) -> DataFrame:
    """Exact top-k by similarity: the query set (small — it is shipped
    to every task; ``max_query_rows`` guards the driver collect) scores
    against each corpus partition as one Arrow
    batch (numpy/BLAS matmul), each task keeps only its local top-k per
    query under the GLOBAL total order (score desc, id asc — so the
    partial top-k provably contains the global one), and a final window
    row_number merges the ≤ k·n_queries·n_partitions survivors.

    ``metric``: ``cosine`` (angle), ``dot`` (inner product — the MIPS
    ranking recommendation models use), or ``l2`` (ranked by NEGATED
    euclidean distance so 'higher is closer' holds for the shared
    top-k machinery). All three are one BLAS matmul per batch; the
    output score column is named ``cosine`` for schema compatibility
    and carries the chosen metric's value.

    At 100 TB: corpus stays partitioned, the scan is embarrassingly
    parallel, and the only shuffle is the tiny survivor set."""
    import numpy as np
    import pandas as pd

    if metric not in ("cosine", "dot", "l2"):
        raise ValueError(f"metric must be cosine|dot|l2, got {metric!r}")
    q_rows = _collect_block(
        queries, [query_id_col, vec_col], max_query_rows,
        "brute_force_topk", "max_query_rows",
    )
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    q_nrm = np.sqrt((Q * Q).sum(axis=1))

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            G = X @ Q.T
            if metric == "cosine":
                nrm = np.sqrt((X * X).sum(axis=1))
                S = G / np.outer(nrm, q_nrm)
            elif metric == "dot":
                S = G
            else:  # l2, negated: ||x-q||² = ||x||² - 2x·q + ||q||²
                S = -np.sqrt(
                    np.maximum(
                        (X * X).sum(axis=1)[:, None] - 2 * G + (q_nrm**2)[None, :],
                        0.0,
                    )
                )
            out_q, out_n, out_c = [], [], []
            for j, qid in enumerate(q_ids):
                mask = ids != qid
                cand_ids, cand_s = ids[mask], S[mask, j]
                # exact local total order: cosine desc, id asc
                order = np.lexsort((cand_ids, -cand_s))[:k]
                out_q.append(np.full(len(order), qid))
                out_n.append(cand_ids[order])
                out_c.append(cand_s[order])
            yield pd.DataFrame(
                {
                    query_id_col: np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "cosine": np.concatenate(out_c),
                }
            )

    from ..tables import spread

    scored = spread(corpus.select(id_col, vec_col), id_col).mapInPandas(
        score, f"{query_id_col} long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )


def lsh_bucket(
    df: DataFrame,
    vec_col: str,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    out_col: str = "bucket",
) -> DataFrame:
    """Random-hyperplane LSH bucket id (sign pattern over ``n_planes``
    projections). Plane components are deterministic pseudo-randoms
    derived from ``xxhash64(seed, plane, dim_index)`` mapped to [-1, 1] —
    reproducible across runs/systems, no runtime RNG state."""
    v = _as_double(F.col(vec_col))

    def plane_component(p: int, i: Column) -> Column:
        h = F.xxhash64(F.lit(seed), F.lit(p), i)
        return (h % 20001).cast("double") / 10000.0  # [-1, 1], deterministic

    def sign_bit(p: int) -> Column:
        idx = F.sequence(F.lit(0), F.lit(dim - 1))
        proj = F.aggregate(
            F.zip_with(v, idx, lambda x, i: x * plane_component(p, i)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(proj >= 0, F.shiftleft(F.lit(1), p)).otherwise(F.lit(0))

    bucket = F.lit(0)
    for p in range(n_planes):
        bucket = bucket.bitwiseOR(sign_bit(p))
    return df.withColumn(out_col, bucket)


def ivf_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    nlist: int = 16,
    seed: int = 42,
    max_iter: int = 5,
):
    """Train the IVF coarse quantizer: JVM-side distributed k-means
    (``pyspark.ml.clustering.KMeans``) over the corpus vectors. Returns
    the nlist×dim centroid matrix as a plain list-of-lists (small —
    nlist is O(sqrt(N)) even at 100 TB, it rides in a broadcast) plus
    the fitted model for corpus-side list assignment.

    The quantizer is SPHERICAL: vectors are L2-normalized before
    training and assignment, because the search metric is cosine —
    on the unit sphere, nearest-centroid-by-L2 orders identically to
    cosine, while raw-vector L2 cells split by norm and tank recall
    (measured: 0.5 vs 0.95+ at the same nprobe/nlist on the test
    corpus).

    Deterministic for a fixed (data, seed, nlist)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(
        array_to_vector(_unit(F.col(vec_col))).alias("features")
    )
    model = KMeans(k=nlist, seed=seed, maxIter=max_iter, initMode="k-means||").fit(
        train
    )
    return [list(map(float, c)) for c in model.clusterCenters()], model


@dataclass
class IvfIndex:
    """A built IVF index: the (tiny, nlist×dim) centroid matrix plus the
    list-assigned corpus — the reusable artifact the probe path reads.
    ``assigned`` columns: (id_col, list_id, __cv array<double>, __cn)."""

    centroids: list[list[float]]
    assigned: DataFrame
    id_col: str
    nlist: int


def ivf_build(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 32,
    seed: int = 42,
    max_iter: int = 5,
    materialize: bool = True,
) -> IvfIndex:
    """Build the IVF index ONCE, separate from any query: train the
    coarse quantizer (distributed k-means), assign every corpus vector
    to its nearest centroid's inverted list, and materialize the result
    (``persist`` + count) so probes never re-trigger training.

    At 100 TB the index is a persisted table, not a cached DataFrame —
    ``ivf_save``/``ivf_load`` write/read exactly this shape
    (lists partitioned by ``list_id`` so a probe's cell filter becomes
    partition pruning). nlist should grow ~√N so cells stay bounded.

    Storage: ``persist()`` uses the Spark 3+ default
    (MEMORY_AND_DISK_DESER), so memory-pressure eviction degrades to a
    disk read — never a silent k-means rebuild; the centroids live
    driver-side in the returned IvfIndex (adjudicated r10,
    BASELINE.md "r9→r10 drift adjudication")."""
    from pyspark.ml.functions import array_to_vector

    cents, model = ivf_centroids(corpus, vec_col, nlist, seed, max_iter)
    assigned = (
        model.transform(
            corpus.select(
                id_col, vec_col,
                array_to_vector(_unit(F.col(vec_col))).alias("features"),
            )
        )
        .select(
            F.col(id_col),
            F.col("prediction").alias("list_id"),
            _as_double(F.col(vec_col)).alias("__cv"),
        )
        .withColumn("__cn", l2_norm(F.col("__cv")))
    )
    if materialize:
        assigned = assigned.persist()
        assigned.count()
    return IvfIndex(centroids=cents, assigned=assigned, id_col=id_col, nlist=nlist)


def ivf_save(index: IvfIndex, path: str) -> None:
    """Persist the index as the on-disk artifact: inverted lists as
    parquet partitioned by ``list_id`` (probe-time cell filters prune
    whole directories), centroids as a single-row parquet sidecar."""
    index.assigned.write.partitionBy("list_id").mode("overwrite").parquet(
        f"{path}/lists"
    )
    spark = index.assigned.sparkSession
    spark.createDataFrame(
        [(index.id_col, index.nlist, index.centroids)],
        "id_col string, nlist int, centroids array<array<double>>",
    ).write.mode("overwrite").parquet(f"{path}/meta")


def ivf_assign(
    index: IvfIndex,
    vectors: DataFrame,
    id_col: str | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign vectors to the index's EXISTING cells (no retraining):
    nearest centroid of the L2-normalized vector — the same spherical
    rule the quantizer was trained under, evaluated per Arrow batch
    against the broadcast nlist×dim centroid matrix. Returns rows in
    the inverted-list layout (id, list_id, __cv, __cn)."""
    import numpy as np
    import pandas as pd

    id_col = id_col or index.id_col
    C = np.array(index.centroids, dtype=np.float64)

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["__cv"].to_numpy()).astype(np.float64)
            nrm = np.sqrt((X * X).sum(1))
            Xn = X / np.where(nrm == 0, 1.0, nrm)[:, None]
            d2 = (Xn * Xn).sum(1)[:, None] - 2 * Xn @ C.T + (C * C).sum(1)[None, :]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "list_id": np.argmin(d2, axis=1).astype(np.int32),
                    "__cv": pdf["__cv"],
                    "__cn": nrm,
                }
            )

    prepped = vectors.select(
        id_col, _as_double(F.col(vec_col)).alias("__cv")
    )
    return prepped.mapInPandas(
        assign, f"{id_col} long, list_id int, __cv array<double>, __cn double"
    )


def ivf_append(spark, path: str, vectors: DataFrame, vec_col: str = "embedding") -> int:
    """Incrementally extend a SAVED index (ivf_save layout) with new
    vectors — the serving-path update that avoids retraining: vectors
    are assigned to existing cells (``ivf_assign``) and appended as
    new parquet files under their ``list_id=`` partitions, so the next
    ``ivf_load`` + probe sees them behind the same partition pruning.
    Returns the number of vectors appended.

    The coarse quantizer drifts as the corpus grows — rebuild
    (``ivf_build``/``ivf_save``) when cell sizes skew (the same
    rebucketing judgement as the SCD2 store's ``rebucket``)."""
    index = ivf_load(spark, path)
    assigned = ivf_assign(index, vectors, vec_col=vec_col)
    n = assigned.count()
    assigned.write.partitionBy("list_id").mode("append").parquet(f"{path}/lists")
    return n


def ivf_load(spark, path: str) -> IvfIndex:
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    assigned = spark.read.parquet(f"{path}/lists")
    return IvfIndex(
        centroids=[list(c) for c in meta.centroids],
        assigned=assigned,
        id_col=meta.id_col,
        nlist=meta.nlist,
    )


def ivf_probe(
    index: IvfIndex,
    queries: DataFrame,
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    nprobe: int = 4,
    max_query_rows: int = 10_000,
) -> DataFrame:
    """Probe an already-built IVF index: each query scores only its
    ``nprobe`` nearest cells — a ~nprobe/nlist fraction of the corpus
    instead of 100%, with NO training on the query path.

    The query block (id + full float64 vector) is collected on the
    driver through ``_collect_block`` — an unbounded query set carries
    ~8 × dim × nprobe bytes per row once exploded, so a corpus-sized
    set OOMs the driver; ``max_query_rows`` (default 10k, well below
    brute-force's cap because of the vector payload) bounds it with an
    error naming the knob. Cell assignment then runs driver-side in
    one numpy matmul (centroids are already local — no Spark job), and
    the probed cell set is pushed as an ``isin`` filter BEFORE the
    join, so a disk-resident index (ivf_load of list_id-partitioned
    parquet) scans only the probed partitions; the exploded query side
    broadcasts, the corpus never shuffles — same scale shape as
    ``lsh_topk`` but with data-adaptive cells."""
    import numpy as np

    from ..tables import local_df

    id_col = index.id_col
    C = np.array(index.centroids, dtype=np.float64)
    nprobe = min(nprobe, index.nlist)

    probe_schema = f"{query_id_col} long, probe int, __qv array<double>"
    qrows = _collect_block(
        queries.select(query_id_col, _as_double(F.col(vec_col)).alias("__qv")),
        [query_id_col, "__qv"],
        max_query_rows,
        "ivf_probe",
        "max_query_rows",
    )
    probed_rows: list[tuple] = []
    if qrows:
        Q = np.array([list(r["__qv"]) for r in qrows], dtype=np.float64)
        # centroids live on the unit sphere (spherical quantizer):
        # rank cells by L2 of the NORMALIZED query — identical order
        # to cosine against the centroids. Zero-norm queries stay
        # zero (deterministic cells) instead of NaN-ing the row.
        nrm = np.sqrt((Q * Q).sum(1))
        Qn = Q / np.where(nrm == 0, 1.0, nrm)[:, None]
        d2 = (Qn * Qn).sum(1)[:, None] - 2 * Qn @ C.T + (C * C).sum(1)[None, :]
        near = np.argsort(d2, axis=1, kind="stable")[:, :nprobe]
        probed_rows = [
            (r[query_id_col], int(cell), v.tolist())
            for r, v, cells in zip(qrows, Q, near)
            for cell in cells
        ]
    spark = index.assigned.sparkSession
    # local_df (r12): Arrow-backed LocalTableScan — the probe table
    # used to be a Python RDD, costing a stage of Python-worker tasks
    # on every probe evaluation just to unpickle ~nq·nprobe rows
    qprobes = local_df(spark, probed_rows, probe_schema).withColumn(
        "__qn", l2_norm(F.col("__qv"))
    )
    probed_cells = sorted({cell for _, cell, _ in probed_rows})

    pruned = index.assigned.filter(F.col("list_id").isin(probed_cells))
    scored = pruned.join(
        F.broadcast(qprobes),
        (pruned.list_id == qprobes.probe)
        & (F.col(id_col) != F.col(query_id_col)),
    ).withColumn(
        "cosine",
        # try_divide: a zero-norm vector yields NULL cosine (ranked
        # last under desc) instead of an ANSI DIVIDE_BY_ZERO error
        F.try_divide(
            dot(F.col("__cv"), F.col("__qv")), F.col("__cn") * F.col("__qn")
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, F.col(id_col).alias("neighbor_id"), "cosine", "rank")
    )


_IVF_INDEX_CACHE: dict[tuple, IvfIndex] = {}


def ivf_index_for(
    corpus: DataFrame,
    cache_key: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 32,
    seed: int = 42,
) -> IvfIndex:
    """Memoized ``ivf_build`` — the 'index is a separate persisted
    artifact' contract for callers that address corpora by path
    (e.g. the query registry keyed by sf_dir): first call builds and
    persists, every later call reuses the cached index.

    The cache holds ``persist()``-ed DataFrames for the process
    lifetime; a long-lived driver cycling through many corpora must
    evict finished indexes (``ivf_evict`` / ``ivf_evict_all``) or the
    executors accumulate storage memory."""
    key = (cache_key, id_col, vec_col, nlist, seed)
    if key not in _IVF_INDEX_CACHE:
        _IVF_INDEX_CACHE[key] = ivf_build(
            corpus, id_col, vec_col, nlist=nlist, seed=seed
        )
    return _IVF_INDEX_CACHE[key]


def ivf_evict(cache_key: str) -> int:
    """Drop every memoized index built under ``cache_key`` and
    ``unpersist`` its inverted lists (frees executor storage memory).
    Returns the number of evicted indexes."""
    victims = [k for k in _IVF_INDEX_CACHE if k[0] == cache_key]
    for k in victims:
        _IVF_INDEX_CACHE.pop(k).assigned.unpersist()
    return len(victims)


def ivf_evict_all() -> int:
    """Evict the whole memo cache (e.g. at the end of a bench run or a
    tenant's session). Returns the number of evicted indexes."""
    n = 0
    for k in list(_IVF_INDEX_CACHE):
        _IVF_INDEX_CACHE.pop(k).assigned.unpersist()
        n += 1
    return n


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    nlist: int = 32,
    nprobe: int = 4,
    seed: int = 42,
    max_iter: int = 5,
    max_query_rows: int = 10_000,
) -> DataFrame:
    """Build-then-probe convenience wrapper (one-shot use; repeated
    querying should ``ivf_build``/``ivf_save`` once and probe many)."""
    index = ivf_build(
        corpus, id_col, vec_col, nlist=nlist, seed=seed, max_iter=max_iter,
        materialize=False,
    )
    return ivf_probe(
        index, queries, vec_col, query_id_col, k=k, nprobe=nprobe,
        max_query_rows=max_query_rows,
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    n_planes: int = 6,
    dim: int = 64,
    multi_probe: int = 1,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH
    bucket, plus **multi-probe** neighbor buckets (all buckets within
    Hamming distance ``multi_probe`` of the query's — flip-1 covers the
    most likely miss, a single disagreeing hyperplane) — recall rises
    steeply for one extra probe join fan-out of ``n_planes``. Recall is
    measured against brute force in tests/test_similarity.py."""
    cb = lsh_bucket(
        corpus.select(id_col, vec_col), vec_col, n_planes, dim
    ).select(
        F.col(id_col), F.col("bucket"), _as_double(F.col(vec_col)).alias("__cv")
    ).withColumn("__cn", l2_norm(F.col("__cv")))
    probes = [F.col("bucket")]
    if multi_probe >= 1:
        probes += [
            F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)
        ]
    qb = (
        lsh_bucket(queries.select(query_id_col, vec_col), vec_col, n_planes, dim)
        .select(
            F.col(query_id_col),
            F.explode(F.array(*probes)).alias("probe"),
            _as_double(F.col(vec_col)).alias("__qv"),
        )
        .withColumn("__qn", l2_norm(F.col("__qv")))
    )
    scored = cb.join(
        F.broadcast(qb), (cb.bucket == qb.probe) & (F.col(id_col) != F.col(query_id_col))
    ).withColumn(
        "cosine",
        # try_divide: a zero-norm vector yields NULL cosine (ranked
        # last under desc) instead of an ANSI DIVIDE_BY_ZERO error
        F.try_divide(
            dot(F.col("__cv"), F.col("__qv")), F.col("__cn") * F.col("__qn")
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, F.col(id_col).alias("neighbor_id"), "cosine", "rank")
    )


def hard_negatives(
    corpus: DataFrame,
    anchors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    anchor_id_col: str = "anchor_id",
    k: int = 10,
    max_anchors: int = 100_000,
) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the
    k most cosine-similar corpus items with a DIFFERENT label — the
    standard "closest wrong answers" curriculum (vs
    ``sampling.negative_pairs``' uniform negatives).

    Same distributed shape as ``brute_force_topk``: the anchor block
    (ids + labels + unit vectors) ships to every task, each corpus
    partition scores one BLAS matmul, keeps its local top-k per anchor
    under the global total order WITH the label exclusion applied
    before truncation, and a final window merges the survivor sets —
    the corpus never shuffles.

    ``anchors`` must carry (anchor_id_col, vec_col, label_col).

    ``max_anchors`` guards the driver collect: contrastive pipelines
    routinely run this with anchors ≈ corpus, which would OOM the
    driver silently — the guard raises a ValueError naming the chunked
    / indexed alternatives instead."""
    import numpy as np
    import pandas as pd

    a_rows = _collect_block(
        anchors, [anchor_id_col, vec_col, label_col], max_anchors,
        "hard_negatives", "max_anchors",
    )
    if not a_rows:
        raise ValueError("hard_negatives: empty anchor set")
    a_ids = np.array([r[anchor_id_col] for r in a_rows], dtype=np.int64)
    a_lab = np.array([r[label_col] for r in a_rows])
    Q = np.array([list(r[vec_col]) for r in a_rows], dtype=np.float64)
    q_nrm = np.maximum(np.sqrt((Q * Q).sum(axis=1)), 1e-300)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            labs = pdf[label_col].to_numpy()
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            nrm = np.maximum(np.sqrt((X * X).sum(axis=1)), 1e-300)
            S = (X @ Q.T) / np.outer(nrm, q_nrm)
            out_q, out_n, out_c = [], [], []
            for j in range(len(a_ids)):
                mask = labs != a_lab[j]
                cand_ids, cand_s = ids[mask], S[mask, j]
                order = np.lexsort((cand_ids, -cand_s))[:k]
                out_q.append(np.full(len(order), a_ids[j]))
                out_n.append(cand_ids[order])
                out_c.append(cand_s[order])
            yield pd.DataFrame(
                {
                    anchor_id_col: np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "cosine": np.concatenate(out_c),
                }
            )

    from ..tables import spread

    scored = spread(corpus.select(id_col, vec_col, label_col), id_col).mapInPandas(
        score, f"{anchor_id_col} long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy(anchor_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(anchor_id_col, "neighbor_id", "cosine", F.col("rank").cast("long"))
    )


def rerank_exact(
    candidates: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact re-rank of an ANN candidate list — the second stage of
    the standard two-stage serving pattern (Jégou et al. 2011 §V;
    every production IVFADC deployment): the compressed index
    (``ivfpq_topk``/``pq_topk``/``lsh_topk`` with k = R ≈ 5-10×k)
    GENERATES candidates cheaply; this stage re-scores only those R
    rows against the float vectors and keeps the true top-k. ADC codes
    resolve clusters, not near-tie orderings within one (an m-byte
    code's score error floor exceeds intra-cluster cosine gaps —
    measured in BASELINE.md §PQ recall: rerank lifts recall@10 from
    ~0.10 to 1.0 on the 64-cluster corpus at R=150/nprobe=2, 3.5%
    scan), so the split is load-bearing, not an optimization. Size R
    past the expected cell occupancy (n/nlist) at small nprobe, or
    candidate GENERATION truncates the cluster before re-ranking sees
    it.

    Scale shape: ``candidates`` is nq×R rows — tiny — and BROADCASTS
    into a hash join against the corpus (the 100 TB side never
    shuffles; only the ≤ nq×R matching float rows leave the scan);
    queries broadcast the same way; the exact cosine is codegen
    (zip_with/aggregate) and one window keeps k of R per query."""
    cand = candidates.select(
        F.col(query_id_col), F.col("neighbor_id")
    )
    # join the RAW vectors against the broadcast candidate list FIRST,
    # then unit-normalize only the ≤ nq×R survivors — Catalyst never
    # hoists a projection above a join, so normalizing before the join
    # would pay the O(d) float pass on every corpus row, the full-scan
    # work the two-stage split exists to avoid
    vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nv")
    )
    qvecs = queries.select(
        F.col(query_id_col), _unit(F.col(query_vec_col)).alias("__qu")
    )
    scored = (
        vecs.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(qvecs), query_id_col)
        .select(
            query_id_col,
            "neighbor_id",
            dot(F.col("__qu"), _unit(F.col("__nv"))).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
            F.col("rank").cast("long"),
        )
    )
