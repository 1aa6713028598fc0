from __future__ import annotations

import pytest
from pyspark.sql.types import (
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from architrave_project_apache_nifi_spark.operators.align import (
    assert_compatible,
    schema_compat,
)


def _s(*fields):
    return StructType([StructField(n, t) for n, t in fields])


def test_identical_schemas_compatible():
    s = _s(("a", IntegerType()), ("b", StringType()))
    rep = schema_compat(s, s)
    assert not rep["breaking"]
    assert rep["added"] == rep["dropped"] == rep["widened"] == []


def test_added_column_non_breaking():
    old = _s(("a", IntegerType()))
    new = _s(("a", IntegerType()), ("b", StringType()))
    rep = schema_compat(old, new)
    assert rep["added"] == ["b"] and not rep["breaking"]


def test_widenings_non_breaking():
    old = _s(("n", IntegerType()), ("d", DateType()))
    new = _s(("n", LongType()), ("d", TimestampType()))
    rep = schema_compat(old, new)
    assert rep["widened"] == ["d", "n"] and not rep["breaking"]


def test_drop_and_narrow_breaking():
    old = _s(("a", DoubleType()), ("b", StringType()))
    new = _s(("a", IntegerType()))
    rep = schema_compat(old, new)
    assert rep["dropped"] == ["b"]
    assert rep["narrowed_or_changed"] == ["a"]
    assert rep["breaking"]
    with pytest.raises(ValueError, match="breaking"):
        assert_compatible(old, new)


def test_case_insensitive_matching():
    old = _s(("ProductID", IntegerType()))
    new = _s(("productid", LongType()))
    rep = schema_compat(old, new)
    assert rep["widened"] == ["productid"] and not rep["breaking"]


def test_type_flip_breaking():
    old = _s(("x", StringType()))
    new = _s(("x", IntegerType()))
    assert schema_compat(old, new)["breaking"]
