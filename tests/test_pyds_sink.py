"""Custom Python DataSource writer (sources/pyds_sink.py): two-phase
commit — temps invisible until commit, manifest-gated reads, append and
overwrite modes, abort cleanup."""

from __future__ import annotations

import json
import os

import pytest

from architrave_project_apache_nifi_spark.sources import pyds_sink


@pytest.fixture()
def registered(spark):
    pyds_sink.register(spark)
    return spark


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS doubled")


def test_write_commit_manifest_roundtrip(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "audit")
    _df(spark, 0, 10).repartition(3).write.format("json_audit").option(
        "path", out
    ).mode("append").save()

    names = sorted(os.listdir(out))
    assert pyds_sink.MANIFEST in names
    assert not [n for n in names if n.endswith(".tmp")]  # temps all renamed
    manifest = json.load(open(os.path.join(out, pyds_sink.MANIFEST)))
    assert sum(e["n_rows"] for e in manifest["files"]) == 10

    back = pyds_sink.read_committed(spark, out)
    assert sorted((r.id, r.doubled) for r in back.collect()) == [
        (i, 2 * i) for i in range(10)
    ]


def test_append_accumulates_overwrite_replaces(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "audit")
    for lo, hi in ((0, 5), (5, 8)):
        _df(spark, lo, hi).write.format("json_audit").option("path", out).mode(
            "append"
        ).save()
    assert pyds_sink.read_committed(spark, out).count() == 8

    _df(spark, 100, 102).write.format("json_audit").option("path", out).mode(
        "overwrite"
    ).save()
    back = pyds_sink.read_committed(spark, out)
    assert sorted(r.id for r in back.collect()) == [100, 101]
    # overwrite manifest references only surviving files
    manifest = json.load(open(os.path.join(out, pyds_sink.MANIFEST)))
    assert sum(e["n_rows"] for e in manifest["files"]) == 2


def test_stray_tmp_invisible_to_committed_reads(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "audit")
    _df(spark, 0, 3).write.format("json_audit").option("path", out).mode(
        "append"
    ).save()
    # simulate a crashed task's leftover temp
    with open(os.path.join(out, "part-99999-dead.json.tmp"), "w") as fh:
        fh.write(json.dumps({"id": 999, "doubled": 1998}) + "\n")
    assert pyds_sink.read_committed(spark, out).count() == 3


def test_abort_removes_temps(registered, tmp_path):
    out = str(tmp_path / "audit")
    os.makedirs(out)
    w = pyds_sink._AuditWriter(out, overwrite=False)
    tmp = os.path.join(out, "part-00000-x.json.tmp")
    open(tmp, "w").write("{}\n")
    w.abort([pyds_sink._FileCommit("part-00000-x.json.tmp", "part-00000-x.json", 1), None])
    assert not os.path.exists(tmp)
