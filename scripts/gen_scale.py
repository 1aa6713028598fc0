#!/usr/bin/env python
"""Generate a larger scale factor from the driver's sf0.1 parquet tables.

Usage: python scripts/gen_scale.py [K] [OUT_DIR]
    K       integer tiling factor (default 10 -> "sf1")
    OUT_DIR default /root/repo/.localdata/sf1

Method (deterministic, seed=42):

- Relational tables (customer supplier part orders lineitem events) are
  TILED K times with disjoint key offsets per copy -- the same shape real
  TPC-H scaling has: fixed dimension tables (region/nation), fixed date
  ranges with K-fold row density, per-key fan-in preserved (each copy's
  FKs point only at that copy's PKs), join selectivities identical.
  Key-embedded name strings (Customer#/Supplier#) are re-derived from the
  offset key so uniqueness invariants survive.

- documents and embeddings are REGENERATED, not tiled: tiling text would
  make every doc an exact/near duplicate of its 9 copies and corrupt the
  dedup/ANN workloads this scale run exists to measure.  Instead we fit
  the sf0.1 distributions (word vocab, uniform length 10..100, lang and
  source mixes; per-label embedding centroids + within-label std) and
  sample fresh rows.  embeddings grow 4x per decade (500 @ sf0.01 ->
  2000 @ sf0.1 -> 8000 @ sf1), matching the driver's sublinear policy
  for the quadratic-leaning workloads.

Output is written OUTSIDE git (default .localdata/, gitignored);
only this script is committed.
"""
from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

SRC = "/root/testdata/sf0.1"
SEED = 42

# Per-copy key offsets = sf0.1 table sizes (keys are dense 0..N-1).
OFF = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "lineitem_order": 150_000,
    "events": 100_000,
    "users": 1_500,
}


def tile_relational(con: duckdb.DuckDBPyConnection, out: str, k: int) -> None:
    copies = ", ".join(str(c) for c in range(k))
    for tbl in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{tbl}.parquet') TO '{out}/{tbl}.parquet' (FORMAT PARQUET)"
        )
        print(f"  {tbl}: copied unchanged")
    plans = {
        "customer": f"""
            SELECT c_custkey + c*{OFF['customer']} AS c_custkey,
                   printf('Customer#%09d', c_custkey + c*{OFF['customer']}) AS c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM '{SRC}/customer.parquet', (SELECT unnest([{copies}]) AS c)""",
        "supplier": f"""
            SELECT s_suppkey + c*{OFF['supplier']} AS s_suppkey,
                   printf('Supplier#%09d', s_suppkey + c*{OFF['supplier']}) AS s_name,
                   s_nationkey, s_acctbal
            FROM '{SRC}/supplier.parquet', (SELECT unnest([{copies}]) AS c)""",
        "part": f"""
            SELECT p_partkey + c*{OFF['part']} AS p_partkey,
                   p_name, p_brand, p_type, p_size, p_retailprice
            FROM '{SRC}/part.parquet', (SELECT unnest([{copies}]) AS c)""",
        "orders": f"""
            SELECT o_orderkey + c*{OFF['orders']} AS o_orderkey,
                   o_custkey + c*{OFF['customer']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM '{SRC}/orders.parquet', (SELECT unnest([{copies}]) AS c)""",
        "lineitem": f"""
            SELECT l_orderkey + c*{OFF['lineitem_order']} AS l_orderkey,
                   l_partkey + c*{OFF['part']} AS l_partkey,
                   l_suppkey + c*{OFF['supplier']} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM '{SRC}/lineitem.parquet', (SELECT unnest([{copies}]) AS c)""",
        "events": f"""
            SELECT event_id + c*{OFF['events']} AS event_id, ts,
                   user_id + c*{OFF['users']} AS user_id,
                   event_type, value, props
            FROM '{SRC}/events.parquet', (SELECT unnest([{copies}]) AS c)""",
    }
    for tbl, q in plans.items():
        con.execute(f"COPY ({q}) TO '{out}/{tbl}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}/{tbl}.parquet'").fetchone()[0]
        print(f"  {tbl}: {n:,} rows")


def gen_documents(con: duckdb.DuckDBPyConnection, out: str, k: int) -> None:
    rng = np.random.default_rng(SEED)
    vocab = [
        r[0]
        for r in con.execute(
            f"SELECT DISTINCT unnest(string_split(text,' ')) AS w "
            f"FROM '{SRC}/documents.parquet' ORDER BY w"
        ).fetchall()
    ]
    langs, lang_w = zip(
        *con.execute(
            f"SELECT lang, count(*) FROM '{SRC}/documents.parquet' GROUP BY 1 ORDER BY 1"
        ).fetchall()
    )
    n_src = con.execute(
        f"SELECT count(DISTINCT source) FROM '{SRC}/documents.parquet'"
    ).fetchone()[0]
    n = 5_000 * k
    lens = rng.integers(10, 101, size=n)
    word_ids = rng.integers(0, len(vocab), size=int(lens.sum()))
    texts, pos = [], 0
    for ln in lens:
        texts.append(" ".join(vocab[w] for w in word_ids[pos : pos + ln]))
        pos += ln
    p = np.asarray(lang_w, dtype=float) / sum(lang_w)
    lang_col = rng.choice(list(langs), size=n, p=p)
    src_col = [f"src{i % n_src}" for i in range(n)]
    import pyarrow as pa
    import pyarrow.parquet as pq

    tab = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(lang_col.tolist()),
            "source": pa.array(src_col),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tab, f"{out}/documents.parquet")
    print(f"  documents: {n:,} rows (regenerated)")


def gen_embeddings(con: duckdb.DuckDBPyConnection, out: str, k: int) -> None:
    rng = np.random.default_rng(SEED + 1)
    rows = con.execute(
        f"SELECT label, embedding FROM '{SRC}/embeddings.parquet'"
    ).fetchall()
    X = np.array([r[1] for r in rows], dtype=np.float32)
    y = np.array([r[0] for r in rows])
    labels = sorted(set(y.tolist()))
    cents = np.stack([X[y == l].mean(0) for l in labels])
    stds = np.stack([X[y == l].std(0) for l in labels])
    # 4x per decade of SF: 2000 @ sf0.1 * 4^(log10 k)
    n = int(2000 * 4 ** np.log10(k))
    lab = rng.integers(0, len(labels), size=n)
    E = (cents[lab] + rng.standard_normal((n, X.shape[1])) * stds[lab]).astype(
        np.float32
    )
    import pyarrow as pa
    import pyarrow.parquet as pq

    tab = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [e.tolist() for e in E], pa.list_(pa.float32())
            ),
            "label": pa.array([labels[i] for i in lab], pa.int32()),
        }
    )
    pq.write_table(tab, f"{out}/embeddings.parquet")
    print(f"  embeddings: {n:,} rows (regenerated, {X.shape[1]}-dim)")


def gen_hot_events(
    con: duckdb.DuckDBPyConnection, out: str, mult: int = 20
) -> None:
    """events_hot.parquet — the tiled events, further tiled ×``mult``
    (disjoint event_id ranges), with ONE user (id 0) deterministically
    remapped onto ~30% of all rows (hash of event_id, stable across
    runs). The skewed-key stress corpus for scripts/measure_skew.py /
    tests/test_skew_core.py: a key this hot turns any per-key window
    shuffle into a single straggler task. ``mult`` exists because at
    1M rows the fixed per-task cost masks the skew as time — ~20M rows
    make the sort/window stage row-bound, as it is at 100 TB."""
    copies = ", ".join(str(c) for c in range(mult))
    q = f"""
        SELECT event_id * {mult} + c AS event_id, ts,
               CASE WHEN hash(event_id * {mult} + c) % 10 < 3 THEN 0
                    ELSE user_id END AS user_id,
               event_type, value, props
        FROM '{out}/events.parquet', (SELECT unnest([{copies}]) AS c)"""
    con.execute(f"COPY ({q}) TO '{out}/events_hot.parquet' (FORMAT PARQUET)")
    n, hot = con.execute(
        f"SELECT count(*), sum(CASE WHEN user_id=0 THEN 1 ELSE 0 END)"
        f" FROM '{out}/events_hot.parquet'"
    ).fetchone()
    print(f"  events_hot: {n:,} rows, hot key carries {hot/n:.1%}")


def gen_clustered_embeddings(out: str, n: int = 8000, dim: int = 64,
                             n_clusters: int = 64) -> None:
    """embeddings_clustered.parquet — mixture-of-Gaussians embeddings
    (the shape real encoders produce; the regular embeddings table is
    isotropic by design, on which ANY space-partitioning ANN index
    degenerates to recall ≈ scan fraction). Used by
    scripts/measure_ivf_recall.py and the clustered recall floor in
    tests/test_similarity.py."""
    rng = np.random.default_rng(SEED)
    cents = rng.normal(size=(n_clusters, dim)) * 10.0
    labels = rng.integers(0, n_clusters, size=n)
    pts = cents[labels] + rng.normal(size=(n, dim))
    import pyarrow as pa
    import pyarrow.parquet as pq
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "label": pa.array(labels.tolist(), pa.int32()),
        "embedding": pa.array(
            [[float(x) for x in v] for v in pts], pa.list_(pa.float64())
        ),
    })
    pq.write_table(tbl, f"{out}/embeddings_clustered.parquet")
    print(f"  embeddings_clustered: {n:,} rows, {n_clusters} clusters, dim {dim}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "clustered":
        out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.localdata/sf1"
        gen_clustered_embeddings(out)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "hot":
        out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.localdata/sf1"
        mult = int(sys.argv[3]) if len(sys.argv) > 3 else 20
        gen_hot_events(duckdb.connect(), out, mult)
        return
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.localdata/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    print(f"Tiling {SRC} x{k} -> {out}")
    tile_relational(con, out, k)
    gen_documents(con, out, k)
    gen_embeddings(con, out, k)
    gen_hot_events(con, out)
    gen_clustered_embeddings(out)
    print("done")


if __name__ == "__main__":
    main()
