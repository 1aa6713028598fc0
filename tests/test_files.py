from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from architrave_project_apache_nifi_spark.sources.files import (
    read_csv_table,
    read_jsonl_table,
    write_csv,
    write_jsonl,
    write_partitioned_parquet,
)

SCHEMA = StructType(
    [
        StructField("id", IntegerType()),
        StructField("name", StringType()),
        StructField("price", DoubleType()),
    ]
)


def test_csv_round_trip_with_corrupt_side_channel(spark, tmp_path):
    p = str(tmp_path / "in.csv")
    with open(p, "w") as f:
        f.write("id,name,price\n")
        f.write("1,widget,9.99\n")
        f.write("2,gadget,19.5\n")
        f.write("oops,not-a-row,xx\n")  # id/price fail coercion
    good, bad = read_csv_table(spark, p, SCHEMA)
    rows = {r["id"]: (r["name"], r["price"]) for r in good.collect()}
    assert rows == {1: ("widget", 9.99), 2: ("gadget", 19.5)}
    bad_rows = bad.collect()
    assert len(bad_rows) == 1
    assert "oops" in bad_rows[0]["raw_line"]
    assert bad_rows[0]["source_file"].endswith("in.csv")


def test_jsonl_round_trip_with_corrupt_side_channel(spark, tmp_path):
    p = str(tmp_path / "in.jsonl")
    with open(p, "w") as f:
        f.write('{"id": 1, "name": "a", "price": 1.5}\n')
        f.write("this is not json\n")
        f.write('{"id": "NaN-ish", "name": "b", "price": "x"}\n')
    good, bad = read_jsonl_table(spark, p, SCHEMA)
    assert [r["id"] for r in good.collect()] == [1]
    assert bad.count() == 2


def test_write_read_csv_identity(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id int, name string, price double"
    )
    out = str(tmp_path / "out_csv")
    write_csv(df, out)
    good, bad = read_csv_table(spark, out, SCHEMA)
    assert bad.count() == 0
    assert sorted((r["id"], r["name"], r["price"]) for r in good.collect()) == [
        (1, "a", 1.0),
        (2, "b", 2.0),
    ]


def test_write_jsonl_identity(spark, tmp_path):
    df = spark.createDataFrame([(5, "x", 0.5)], "id int, name string, price double")
    out = str(tmp_path / "out_jsonl")
    write_jsonl(df, out)
    good, bad = read_jsonl_table(spark, out, SCHEMA)
    assert bad.count() == 0 and good.collect()[0]["id"] == 5


def test_partitioned_parquet_layout_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "de", float(i)) for i in range(10)],
        "id int, lang string, v double",
    )
    out = str(tmp_path / "part")
    write_partitioned_parquet(df, out, ["lang"])
    assert os.path.isdir(os.path.join(out, "lang=en"))
    back = spark.read.parquet(out).filter(F.col("lang") == "en")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert back.count() == 5
    # partition filter must prune at the scan, not post-filter
    assert "PartitionFilters: [isnotnull(lang" in plan or "lang#" in plan


def test_orc_round_trip_and_pushdown(spark, tmp_path):
    from pyspark.sql import functions as F

    from architrave_project_apache_nifi_spark.sources.files import (
        read_orc_table,
        write_orc,
    )

    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 7).alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("s"),
    )
    path = str(tmp_path / "orc_tbl")
    write_orc(df, path)
    back = read_orc_table(spark, path, df.schema)
    assert back.count() == 1000
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    # filter + projection reach the ORC scan (pushdown/pruning intact)
    plan = (
        back.filter(F.col("k") == 3)
        .select("id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(k), EqualTo(k,3)]" in plan, plan


def test_jsonl_gzip_landing(spark, tmp_path):
    """Compressed JSONL drops land through the same reader: spark.read
    .text decompresses .gz transparently. Caveat pinned here: gzip is
    NOT byte-range splittable — one .gz file = one input task, so
    producers must land many files for parallelism (unlike the
    uncompressed path, where one huge file still fans out)."""
    import gzip

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from architrave_project_apache_nifi_spark.sources.files import (
        read_jsonl_table,
    )

    d = tmp_path / "gz"
    d.mkdir()
    with gzip.open(d / "part-0.jsonl.gz", "wt") as fh:
        fh.write('{"id": 1, "s": "a"}\n{"id": 2, "s": "b"}\n')
        fh.write("not json at all\n")
    with gzip.open(d / "part-1.jsonl.gz", "wt") as fh:
        fh.write('{"id": 3, "s": "c"}\n')
    schema = StructType(
        [StructField("id", LongType()), StructField("s", StringType())]
    )
    good, bad = read_jsonl_table(spark, str(d), schema)
    assert sorted((r["id"], r["s"]) for r in good.collect()) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
    ]
    bad_rows = bad.collect()
    assert len(bad_rows) == 1 and "not json" in bad_rows[0]["raw_line"]
