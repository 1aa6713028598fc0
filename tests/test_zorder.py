from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.zorder import (
    morton_interleave,
    quantize_minmax,
    with_zorder_code,
    write_zorder,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_morton_interleave_known_values(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    out = df.select(
        morton_interleave(F.col("a"), F.col("b"), 3).alias("z")
    ).collect()[0]["z"]
    # a bits (1,0,1) at even positions, b bits (0,1,1) at odd:
    # pos0=a0=1 pos1=b0=1 pos2=a1=0 pos3=b1=1 pos4=a2=1 pos5=b2=0
    assert out == 0b011011


def test_quantize_bounds_and_constant_column(spark):
    df = spark.createDataFrame([(0.0,), (5.0,), (10.0,)], "x double")
    q = df.select(
        quantize_minmax(F.col("x"), F.lit(0.0), F.lit(10.0), 4).alias("q")
    ).collect()
    assert [r["q"] for r in q] == [0, 7, 15]  # hi clamps to top cell
    const = df.select(
        quantize_minmax(F.col("x"), F.lit(3.0), F.lit(3.0), 4).alias("q")
    ).collect()
    assert all(r["q"] == 0 for r in const)


def test_zorder_code_is_deterministic_and_bounded(spark, events):
    coded = with_zorder_code(events, "user_id", "value", bits=8)
    stats = coded.agg(F.min("zcode"), F.max("zcode")).collect()[0]
    assert 0 <= stats[0] and stats[1] < (1 << 16)
    again = with_zorder_code(events, "user_id", "value", bits=8)
    assert coded.select("event_id", "zcode").exceptAll(
        again.select("event_id", "zcode")
    ).count() == 0


def _file_boxes(path, col_a, col_b):
    boxes = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.read_metadata(f)
        names = md.schema.names
        ia, ib = names.index(col_a), names.index(col_b)
        alo = aho = blo = bho = None
        for rg in range(md.num_row_groups):
            sa = md.row_group(rg).column(ia).statistics
            sb = md.row_group(rg).column(ib).statistics
            alo = sa.min if alo is None else min(alo, sa.min)
            aho = sa.max if aho is None else max(aho, sa.max)
            blo = sb.min if blo is None else min(blo, sb.min)
            bho = sb.max if bho is None else max(bho, sb.max)
        boxes.append(((alo, aho), (blo, bho)))
    return boxes


def test_zorder_layout_shrinks_bounding_boxes(spark, events, tmp_path):
    """The point of the layout: per-file (user_id × value) bounding
    boxes must be much smaller than an unordered write's, so point/
    range predicates on EITHER column skip most files via footer
    stats."""
    zpath = str(tmp_path / "z")
    npath = str(tmp_path / "naive")
    write_zorder(events, zpath, "user_id", "value", bits=8, n_files=8)
    events.repartition(8).write.mode("overwrite").parquet(npath)

    tot = events.agg(
        (F.max("user_id") - F.min("user_id")).alias("ua"),
        (F.max("value") - F.min("value")).alias("va"),
    ).collect()[0]
    full_area = float(tot["ua"]) * float(tot["va"])

    def mean_area(path):
        boxes = _file_boxes(path, "user_id", "value")
        return sum(
            (a[1] - a[0]) * (b[1] - b[0]) for a, b in boxes
        ) / len(boxes)

    z_area = mean_area(zpath)
    n_area = mean_area(npath)
    # unordered files each span ~the whole space; z-ordered files must
    # cover a small fraction of it
    assert n_area > 0.5 * full_area
    assert z_area < 0.5 * n_area, f"z={z_area} naive={n_area}"


def test_zorder_write_round_trips_rows(spark, events, tmp_path):
    p = str(tmp_path / "zrt")
    write_zorder(events, p, "user_id", "value", n_files=4)
    back = spark.read.parquet(p)
    assert back.count() == events.count()
    assert back.select(sorted(back.columns)).exceptAll(
        events.select(sorted(events.columns))
    ).count() == 0


def test_three_column_interleave_and_budget(spark, events):
    from architrave_project_apache_nifi_spark.operators.zorder import (
        morton_interleave_n,
        with_zorder_code_n,
    )
    import pytest as _pytest

    df = spark.createDataFrame([(0b1, 0b1, 0b1)], "a long, b long, c long")
    z = df.select(
        morton_interleave_n([F.col("a"), F.col("b"), F.col("c")], 2).alias("z")
    ).collect()[0]["z"]
    assert z == 0b111  # bit 0 of each key at positions 0,1,2

    coded = with_zorder_code_n(events, ["user_id", "value", "event_id"], bits=8)
    stats = coded.agg(F.min("zcode"), F.max("zcode")).collect()[0]
    assert 0 <= stats[0] and stats[1] < (1 << 24)

    with _pytest.raises(ValueError, match="62-bit"):
        morton_interleave_n([F.col("a")] * 4, 16)


def test_three_column_write_shrinks_all_boxes(spark, events, tmp_path):
    from architrave_project_apache_nifi_spark.operators.zorder import write_zorder_n

    p = str(tmp_path / "z3")
    write_zorder_n(events, p, ["user_id", "value", "event_id"], bits=8, n_files=8)
    back = spark.read.parquet(p)
    assert back.count() == events.count()
