"""Sink tests (sources/sinks.py): JDBC append + stage-and-merge UPDATE
run against the embedded Derby that ships in Spark's jars (in-memory DB,
shared across local-mode executor threads); failure side-channel and
bounded retry are covered without a database."""

from __future__ import annotations

import pytest

from architrave_project_apache_nifi_spark.sources import sinks

DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def _url(name: str) -> str:
    return f"jdbc:derby:memory:{name};create=true"


def test_jdbc_append_roundtrip(spark):
    url = _url("appenddb")
    sinks.execute_sql(
        spark, url, "CREATE TABLE hist (pid INT, price DOUBLE, flag VARCHAR(1))"
    )
    df = spark.createDataFrame(
        [(1, 10.0, "Y"), (2, 20.0, "Y")], "pid INT, price DOUBLE, flag STRING"
    )
    sinks.jdbc_append(df, url, "hist", DERBY_PROPS, batchsize=1)
    back = spark.read.jdbc(url, "hist", properties=DERBY_PROPS)
    assert sorted((r.PID, r.PRICE, r.FLAG) for r in back.collect()) == [
        (1, 10.0, "Y"),
        (2, 20.0, "Y"),
    ]


def test_jdbc_update_stage_and_merge(spark):
    """The PutDatabaseRecord-UPDATE equivalent: only the keyed rows
    change, others are untouched — including a second history row for
    the same ProductID (the reference's Bug 1 scenario)."""
    url = _url("updatedb")
    sinks.execute_sql(
        spark,
        url,
        "CREATE TABLE hist (pid INT, vfrom INT, price DOUBLE, flag VARCHAR(1))",
    )
    seed = spark.createDataFrame(
        [(1, 100, 10.0, "N"), (1, 200, 12.0, "Y"), (2, 100, 20.0, "Y")],
        "pid INT, vfrom INT, price DOUBLE, flag STRING",
    )
    sinks.jdbc_append(seed, url, "hist", DERBY_PROPS)

    changes = spark.createDataFrame(
        [(99.0, "N", 1, 200)], "price DOUBLE, flag STRING, pid INT, vfrom INT"
    )
    n = sinks.jdbc_update(
        changes, url, "hist",
        key_cols=("pid", "vfrom"), set_cols=("price", "flag"),
        properties=DERBY_PROPS,
    )
    assert n == 1
    back = {
        (r.PID, r.VFROM): (r.PRICE, r.FLAG)
        for r in spark.read.jdbc(url, "hist", properties=DERBY_PROPS).collect()
    }
    assert back[(1, 200)] == (99.0, "N")  # updated
    assert back[(1, 100)] == (10.0, "N")  # same pid, other version: untouched
    assert back[(2, 100)] == (20.0, "Y")  # other key untouched
    # staging table dropped
    with pytest.raises(Exception, match="HIST_STAGE|not exist|does not exist"):
        spark.read.jdbc(url, "hist_stage", properties=DERBY_PROPS).collect()


def test_jdbc_update_key_unique_staging_contract(spark):
    """ADVICE r5: with duplicate staging keys the dialects used to
    diverge (Derby's correlated subquery raises mid-statement, MySQL's
    UPDATE…JOIN silently applies an arbitrary row). The contract is now
    enforced in jdbc_update before either statement runs: exact
    duplicates dedupe harmlessly, conflicting duplicates raise."""
    url = _url("updatedupdb")
    sinks.execute_sql(
        spark, url, "CREATE TABLE hist (pid INT, price DOUBLE, flag VARCHAR(1))"
    )
    seed = spark.createDataFrame(
        [(1, 10.0, "Y"), (2, 20.0, "Y")], "pid INT, price DOUBLE, flag STRING"
    )
    sinks.jdbc_append(seed, url, "hist", DERBY_PROPS)

    # conflicting duplicates: same key, different values → ValueError
    # BEFORE any SQL executes, on either dialect path
    conflicting = spark.createDataFrame(
        [(99.0, "N", 1), (88.0, "N", 1)], "price DOUBLE, flag STRING, pid INT"
    )
    with pytest.raises(ValueError, match="conflicting staging rows"):
        sinks.jdbc_update(
            conflicting, url, "hist",
            key_cols=("pid",), set_cols=("price", "flag"),
            properties=DERBY_PROPS,
        )
    # target untouched by the refused update
    back = {
        r.PID: r.PRICE
        for r in spark.read.jdbc(url, "hist", properties=DERBY_PROPS).collect()
    }
    assert back == {1: 10.0, 2: 20.0}

    # exact duplicates: identical rows dedupe and the update applies
    exact_dup = spark.createDataFrame(
        [(99.0, "N", 1), (99.0, "N", 1)], "price DOUBLE, flag STRING, pid INT"
    )
    n = sinks.jdbc_update(
        exact_dup, url, "hist",
        key_cols=("pid",), set_cols=("price", "flag"),
        properties=DERBY_PROPS,
    )
    assert n == 1
    back = {
        r.PID: (r.PRICE, r.FLAG)
        for r in spark.read.jdbc(url, "hist", properties=DERBY_PROPS).collect()
    }
    assert back[1] == (99.0, "N")
    assert back[2] == (20.0, "Y")


def test_jdbc_append_transactional_all_or_nothing(spark):
    """The fragmented-transactions guarantee: a job that dies after
    staging (before the finalize statement) leaves the TARGET untouched;
    the finalize is one atomic INSERT..SELECT. Simulated by staging the
    batch without finalizing (what a crash between the phases leaves
    behind), asserting the target is empty, then running the full
    two-phase append and asserting every row landed exactly once."""
    url = _url("txnappenddb")
    sinks.execute_sql(
        spark, url, "CREATE TABLE hist (pid INT, price DOUBLE, flag VARCHAR(1))"
    )
    df = spark.createDataFrame(
        [(1, 10.0, "Y"), (2, 20.0, "Y"), (3, 30.0, "N")],
        "pid INT, price DOUBLE, flag STRING",
    )

    # phase 1 only — the post-crash state: staging written, target clean
    df.write.mode("overwrite").jdbc(url, "hist_stage_append", properties=DERBY_PROPS)
    assert spark.read.jdbc(url, "hist", properties=DERBY_PROPS).count() == 0

    # a retried job re-runs both phases; staging overwrite absorbs the orphan
    n = sinks.jdbc_append_transactional(df, url, "hist", DERBY_PROPS)
    assert n == 3
    back = spark.read.jdbc(url, "hist", properties=DERBY_PROPS)
    assert sorted((r.PID, r.PRICE, r.FLAG) for r in back.collect()) == [
        (1, 10.0, "Y"),
        (2, 20.0, "Y"),
        (3, 30.0, "N"),
    ]
    # staging dropped after finalize
    with pytest.raises(Exception, match="(?i)not exist|does not exist"):
        spark.read.jdbc(url, "hist_stage_append", properties=DERBY_PROPS).collect()


def test_write_failures_side_channel(spark, tmp_path):
    bad = spark.createDataFrame([(7, "boom")], "ProductID INT, payload STRING")
    sinks.write_failures(bad, str(tmp_path / "failures"), reason="sink_error")
    back = spark.read.parquet(str(tmp_path / "failures")).collect()
    assert len(back) == 1
    assert back[0].ProductID == 7
    assert back[0].failure_reason == "sink_error"
    assert back[0].failed_at is not None


def test_with_retry_bounded(spark):
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")

    sinks.with_retry(flaky, attempts=3, backoff_s=0.01)
    assert calls["n"] == 3

    def always_fails():
        raise RuntimeError("poison batch")

    with pytest.raises(RuntimeError, match="poison batch"):
        sinks.with_retry(always_fails, attempts=2, backoff_s=0.01)


def test_history_current_read_prunes_partitions(spark, tmp_path):
    """write_history partitions by is_current, so the hot 'give me
    current rows' read (the reference's Is_current='Y' lookup subquery,
    FT:1439) must plan as a partition-pruned scan, not a full scan +
    filter."""
    from pyspark.sql import functions as F

    from architrave_project_apache_nifi_spark.plans.inspect import formatted_plan

    df = spark.createDataFrame(
        [(1, 10.0, "Y"), (1, 9.0, "N"), (2, 20.0, "Y")],
        "pid INT, price DOUBLE, is_current STRING",
    )
    path = str(tmp_path / "hist")
    sinks.write_history(df, path)
    current = sinks.read_history(spark, path).filter(F.col("is_current") == "Y")
    plan = formatted_plan(current)
    assert "PartitionFilters: [isnotnull(is_current" in plan, plan
    assert current.count() == 2


def test_jdbc_append_transactional_batch_id_exactly_once(spark):
    """batch_id makes the append exactly-once across retries: the
    finalize and the commit-marker insert share one JDBC transaction, so
    replaying a committed batch is a no-op and a NEW batch id appends."""
    url = _url("txnappendoncedb")
    sinks.execute_sql(
        spark, url, "CREATE TABLE hist (pid INT, price DOUBLE, flag VARCHAR(1))"
    )
    df = spark.createDataFrame(
        [(1, 10.0, "Y"), (2, 20.0, "Y")], "pid INT, price DOUBLE, flag STRING"
    )

    assert sinks.jdbc_append_transactional(df, url, "hist", DERBY_PROPS, batch_id=7) == 2
    # the retry of a crashed-after-commit job replays the same batch id
    assert sinks.jdbc_append_transactional(df, url, "hist", DERBY_PROPS, batch_id=7) == 0
    assert spark.read.jdbc(url, "hist", properties=DERBY_PROPS).count() == 2

    # a genuinely new batch still appends
    df2 = spark.createDataFrame([(3, 30.0, "N")], "pid INT, price DOUBLE, flag STRING")
    assert sinks.jdbc_append_transactional(df2, url, "hist", DERBY_PROPS, batch_id=8) == 1
    assert spark.read.jdbc(url, "hist", properties=DERBY_PROPS).count() == 3


def test_jdbc_scd2_commit_atomic_two_sink(spark):
    """The reference's two racing sinks (expire-UPDATE + version-INSERT)
    as one transaction: correct multi-update chaining, exactly-once
    replay via batch_id, and all-or-nothing rollback when the insert
    half fails."""
    from pyspark.sql import functions as F

    url = _url("scd2commitdb")
    sinks.execute_sql(
        spark, url,
        "CREATE TABLE hist (pid INT, price DOUBLE, ts TIMESTAMP, "
        "valid_from TIMESTAMP, valid_until TIMESTAMP, is_current VARCHAR(1), "
        "PRIMARY KEY (pid, valid_from))",
    )

    def _df(rows):
        return spark.createDataFrame(
            rows, "pid INT, price DOUBLE, ts STRING"
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    # snapshot: 2 products inserted as initial current rows
    from architrave_project_apache_nifi_spark.operators.scd2 import scd2_build

    seed = scd2_build(
        _df([(9012, 106.0, "2023-09-27 10:01:00"),
             (9014, 56.0, "2023-09-27 10:03:00")]),
        "pid", "ts",
    )
    sinks.jdbc_append(seed, url, "hist", DERBY_PROPS)

    # one batch with TWO updates to 9014 (the reference's Bug 1 case)
    batch = _df([(9014, 100.0, "2023-09-27 10:04:00"),
                 (9014, 120.0, "2023-09-27 10:05:00")])
    n_exp, n_ins = sinks.jdbc_scd2_commit(
        batch, url, "hist", "pid", "ts", DERBY_PROPS, batch_id=1
    )
    assert (n_exp, n_ins) == (1, 2)

    def _hist():
        rows = spark.read.jdbc(url, "hist", properties=DERBY_PROPS).collect()
        return sorted(
            ((r.PID, r.PRICE, str(r.VALID_UNTIL), r.IS_CURRENT) for r in rows)
        )

    after = _hist()
    v9014 = [r for r in after if r[0] == 9014]
    assert [r[1] for r in v9014] == [56.0, 100.0, 120.0]
    assert [r[3] for r in v9014] == ["N", "N", "Y"]
    # old current row expired at the batch's FIRST change ts, only once
    assert v9014[0][2].startswith("2023-09-27 10:04:00")
    # untouched key still current
    assert [r for r in after if r[0] == 9012][0][3] == "Y"

    # replayed batch_id: exact no-op
    assert sinks.jdbc_scd2_commit(
        batch, url, "hist", "pid", "ts", DERBY_PROPS, batch_id=1
    ) == (0, 0)
    assert _hist() == after

    # all-or-nothing: re-running WITHOUT batch_id hits the (pid,
    # valid_from) PRIMARY KEY on the insert half -> the whole txn
    # (including the expire UPDATE) must roll back
    import pytest

    with pytest.raises(Exception, match="(?i)duplicate|constraint"):
        sinks.jdbc_scd2_commit(batch, url, "hist", "pid", "ts", DERBY_PROPS)
    assert _hist() == after


def test_streaming_scd2_to_jdbc_exactly_once(spark, tmp_path):
    """The reference's real topology — CDC stream into a live JDBC
    history table — via run_scd2_stream_to_jdbc: golden scenario over
    two micro-batches (an update in batch 2 must expire a row inserted
    by batch 1), each batch one atomic transaction with its batch id
    as commit marker; a re-run over the same checkpoint adds nothing."""
    from architrave_project_apache_nifi_spark.sources import cdc
    from architrave_project_apache_nifi_spark.streaming.scd2_stream import (
        run_scd2_stream_to_jdbc,
    )

    url = _url("streamjdbcdb")
    sinks.execute_sql(
        spark, url,
        "CREATE TABLE hist (ProductID INT, ProductName VARCHAR(200), "
        "ProductBrand VARCHAR(200), Target_Gender VARCHAR(50), "
        "Price DOUBLE, Currency VARCHAR(20), Description VARCHAR(500), "
        "Launch_date DATE, Loaded_at DATE, cdc_sequence_id BIGINT, "
        "change_ts TIMESTAMP, valid_from TIMESTAMP, valid_until TIMESTAMP, "
        "is_current VARCHAR(1))",
    )
    src = str(tmp_path / "in")
    cdc.write_golden_scenario(src, files=2)
    ckpt = str(tmp_path / "ckpt")

    def _run():
        stream = cdc.read_envelope_stream(spark, src, max_files_per_trigger=1)
        q = run_scd2_stream_to_jdbc(
            spark, stream, url, "hist", ckpt, properties=DERBY_PROPS,
        )
        q.awaitTermination(120)

    _run()

    def _rows():
        return sorted(
            (r.PRODUCTID, r.PRICE, r.IS_CURRENT, str(r.VALID_UNTIL))
            for r in spark.read.jdbc(url, "hist", properties=DERBY_PROPS).collect()
        )

    rows = _rows()
    assert len(rows) == 5
    v9014 = [r for r in rows if r[0] == 9014]
    assert [(r[1], r[2]) for r in v9014] == [
        (56.0, "N"), (100.0, "N"), (120.0, "Y"),
    ]
    # batch-2 expire stamped the batch's first change ts onto batch-1's row
    assert v9014[1][3].startswith("2023-09-27")
    # replay over the same checkpoint: no new batches, no duplicates
    _run()
    assert _rows() == rows


def test_jdbc_scd2_commit_equals_rebuild_property(spark):
    """Merge-equals-rebuild, through the database: committing a random
    event stream in arbitrary batch splits (each batch one atomic
    two-sink transaction) must leave the JDBC table equal to
    scd2_build over the whole stream — the same invariant the parquet
    merge path holds (test_scd2_properties), now for the JDBC sink."""
    import itertools

    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    from architrave_project_apache_nifi_spark.operators.scd2 import scd2_build

    ids = itertools.count()

    @settings(max_examples=5, deadline=None)
    @given(
        data=st.lists(
            st.tuples(st.integers(1, 3), st.floats(1, 100, allow_nan=False)),
            min_size=1,
            max_size=10,
        ),
        split=st.integers(1, 9),
    )
    def run(data, split):
        tbl = f"prop_hist_{next(ids)}"
        url = _url(f"propdb_{tbl}")
        sinks.execute_sql(
            spark, url,
            f"CREATE TABLE {tbl} (pid INT, price DOUBLE, ts TIMESTAMP, "
            "valid_from TIMESTAMP, valid_until TIMESTAMP, is_current VARCHAR(1))",
        )
        rows = [
            (pid, round(price, 2), f"2024-01-01 00:{i:02d}:00")
            for i, (pid, price) in enumerate(data)
        ]

        def _df(rs):
            return spark.createDataFrame(
                rs, "pid INT, price DOUBLE, ts STRING"
            ).withColumn("ts", F.col("ts").cast("timestamp"))

        cut = min(split, len(rows))
        for bid, chunk in enumerate([rows[:cut], rows[cut:]]):
            if chunk:
                sinks.jdbc_scd2_commit(
                    _df(chunk), url, tbl, "pid", "ts", DERBY_PROPS, batch_id=bid
                )

        got = sorted(
            (r.PID, r.PRICE, str(r.VALID_FROM), str(r.VALID_UNTIL), r.IS_CURRENT)
            for r in spark.read.jdbc(url, tbl, properties=DERBY_PROPS).collect()
        )
        want = sorted(
            (r.pid, r.price, str(r.valid_from), str(r.valid_until), r.is_current)
            for r in scd2_build(_df(rows), "pid", "ts").select(
                "pid", "price", "valid_from", "valid_until", "is_current"
            ).collect()
        )
        assert got == want

    run()
