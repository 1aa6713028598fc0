"""Local emulation of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at a
given SF, compare row count, sorted column names, and sorted values.

The compare logic lives in ``compare_one`` so tests/test_oracles.py can
enforce the entries the driver's 50-entry window does NOT reach (the
overflow set) on every pytest run.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return repr(v)


def duckdb_con(sf_dir: str):
    from architrave_project_apache_nifi_spark.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare_one(spark, con, sf_dir: str, name: str, fn, oracle: str | None):
    """Run one (spark_fn, oracle_sql) pair; returns None if they match
    (or the entry is rows-only and runs), else a failure message."""
    try:
        sdf = fn(spark, sf_dir)
        scols = sorted(sdf.columns)
        srows = sorted(
            tuple(norm(v) for v in (row[c] for c in scols))
            for row in sdf.collect()
        )
    except Exception as exc:  # noqa: BLE001
        return f"{name}: spark error: {exc}"
    if oracle is None:
        return None  # rows-only entry: executing without error is the check
    try:
        cur = con.execute(oracle)
        ocols_raw = [d[0] for d in cur.description]
        orows_raw = cur.fetchall()
    except Exception as exc:  # noqa: BLE001
        return f"{name}: duckdb error: {exc}"
    ocols = sorted(ocols_raw)
    order = [ocols_raw.index(c) for c in ocols]
    orows = sorted(tuple(norm(r[i]) for i in order) for r in orows_raw)
    if scols != ocols:
        return f"{name}: columns spark={scols} duckdb={ocols}"
    if len(srows) != len(orows):
        return f"{name}: rowcount spark={len(srows)} duckdb={len(orows)}"
    if srows != orows:
        bad = [(s, o) for s, o in zip(srows, orows) if s != o][:3]
        return f"{name}: value mismatch, first diffs: {bad}"
    return None


def main() -> int:
    from architrave_project_apache_nifi_spark.session import get_spark
    import __spark_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]  # LIST, order-preserving: args run in the order given
    spark = get_spark("oracle-check", master="local[8]")
    con = duckdb_con(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    names = [n for n in only if n in qs] if only else list(qs)
    import time as _time

    for name in names:
        t0 = _time.perf_counter()
        err = compare_one(spark, con, sf_dir, name, qs[name], oracles.get(name))
        dt = f"{_time.perf_counter() - t0:.1f}s"
        if err:
            print(f"FAIL {err}", flush=True)
            failures += 1
        elif name in oracles:
            print(f"ok   {name}: rows match ({dt})", flush=True)
        else:
            print(f"ok   {name}: rows-only ({dt})", flush=True)
    print(f"\n{failures} failures / {len(names)} checked")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
