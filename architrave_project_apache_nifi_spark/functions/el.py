"""NiFi Expression Language (EL) equivalents.

The reference's entire scalar-function surface is four EL functions
plus attribute interpolation (SURVEY.md §2.3 table):

| EL                                    | here            | reference cite (final_template.xml) |
|---------------------------------------|-----------------|--------------------------------------|
| ``now()``                             | ``now()``       | :2408, :2538, :5291                  |
| ``:toNumber()`` (date → epoch millis) | ``to_number()`` | :2538, :5291                         |
| ``:format('yyyy-MM-dd HH:mm:ss')``    | ``format()``    | :2408                                |
| ``:equals('x')``                      | ``equals()``    | :1950, :1954                         |
| ``${attr}`` interpolation             | ``interpolate()``| :3551, :4079                        |

All are thin wrappers over built-in functions — they exist to make the
parity with the reference auditable, and they stay inside whole-stage
codegen (no Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# NiFi EL date-format patterns are java.text.SimpleDateFormat, the same
# pattern language Spark's date_format uses — passthrough.
EL_DEFAULT_FORMAT = "yyyy-MM-dd HH:mm:ss"


def now() -> Column:
    """``${now()}`` — processing-time timestamp."""
    return F.current_timestamp()


def to_number(ts: Column) -> Column:
    """``:toNumber()`` on a date — epoch **milliseconds** (NiFi
    semantics; the reference writes valid_from this way, FT:5291)."""
    return F.unix_millis(ts)


def from_number(millis: Column) -> Column:
    """Inverse: epoch millis → timestamp (reading reference-shaped data)."""
    return F.timestamp_millis(millis)


def format(ts: Column, pattern: str = EL_DEFAULT_FORMAT) -> Column:  # noqa: A001
    """``:format('yyyy-MM-dd HH:mm:ss')`` (FT:2408)."""
    return F.date_format(ts, pattern)


def equals(col: Column, value) -> Column:
    """``:equals('insert')`` (FT:1950)."""
    return col == F.lit(value)


def interpolate(template: str, **attrs: Column) -> Column:
    """``${attr}`` interpolation into a message/transform value, e.g. the
    LogMessage text referencing ``${productID}`` (FT:4079).

    ``interpolate("product ${id} failed", id=col("ProductID"))``
    """
    parts: list[Column] = []
    rest = template
    while "${" in rest:
        pre, _, tail = rest.partition("${")
        name, _, rest = tail.partition("}")
        if pre:
            parts.append(F.lit(pre))
        parts.append(attrs[name].cast("string"))
    if rest:
        parts.append(F.lit(rest))
    return F.concat(*parts) if parts else F.lit(template)
