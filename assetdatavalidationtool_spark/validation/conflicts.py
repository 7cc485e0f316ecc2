"""Conflicts over common columns (Validator.cs:93-142) + the first-row-
wins dedup it depends on (ReportGenerator.cs:150-156).

Contract pinned from the reference:

* per source, the row for a key is the FIRST row whose normalized key
  matches (first-occurrence-wins — Validator.cs:102 / ReportGenerator.cs:155);
* common columns = intersection of all sources' headers, case-insensitive
  (Validator.cs:108), minus any column used as a PK (Validator.cs:110-117);
* values are trimmed, null → "" (Validator.cs:124);
* a (key, column) is a conflict iff the key is present in >= 2 sources
  and the normalized values are not all equal (Validator.cs:119-131) —
  i.e. count(distinct norm_value) > 1 among the sources holding the key.

Distributed note on "first": row order is undefined in a distributed
table, so callers pass ``order_col`` (an event id, file offset, load
timestamp) and we take min-by-order via one window; this is the
documented deviation from the reference's implicit file order
(SURVEY.md §7.3).

Scale shape: dedup is one window shuffle per source on the key; the
melt (wide → long) is a narrow ``explode``; the conflict test is one
groupBy((key, column)) aggregate. Column count is schema-bounded, so
the melt fan-out is a constant factor, not a join explosion.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..normalize import norm_key, norm_value

Sources = dict[str, tuple[DataFrame, str]]


def first_row_per_key(df: DataFrame, key_col: str, order_col: str) -> DataFrame:
    """First-occurrence-wins dedup (ReportGenerator.cs:150-156): keep the
    row with the smallest ``order_col`` per normalized key; drop blank keys."""
    w = Window.partitionBy(norm_key(F.col(key_col))).orderBy(F.col(order_col))
    return (
        df.where(
            F.col(key_col).isNotNull() & (F.trim(F.col(key_col).cast("string")) != "")
        )
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def melt(df: DataFrame, key_col: str, value_cols: list[str], source: str) -> DataFrame:
    """Wide → long: (key, source, column, value). Narrow transformation
    (explode of a struct array) — no shuffle."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(c).cast("string").alias("value"),
            )
            for c in value_cols
        ]
    )
    return df.select(
        norm_key(F.col(key_col)).alias("key"),
        F.lit(source).alias("source"),
        F.explode(pairs).alias("kv"),
    ).select("key", "source", F.col("kv.column").alias("column"), F.col("kv.value").alias("value"))


def common_columns(sources: Sources) -> list[str]:
    """Case-insensitive header intersection minus PK columns
    (Validator.cs:108-117). Driver-side — schemas are metadata."""
    sets = []
    for _, (df, _k) in sources.items():
        sets.append({c.lower(): c for c in df.columns})
    common = reduce(lambda a, b: {k: a[k] for k in a.keys() & b.keys()}, sets)
    pks = {k.lower() for _, (_df, k) in sources.items()}
    first_df = next(iter(sources.values()))[0]
    ordered = [c for c in first_df.columns if c.lower() in common and c.lower() not in pks]
    return ordered


def conflicts(sources: Sources, order_col: str, columns: list[str] | None = None) -> DataFrame:
    """Conflict rows ``(key, column, n_sources, n_distinct_values)`` for
    keys present in >= 2 sources whose per-source values disagree."""
    cols = columns or common_columns(sources)
    melted = []
    for name, (df, key_col) in sources.items():
        deduped = first_row_per_key(df, key_col, order_col)
        melted.append(melt(deduped, key_col, cols, name))
    long_df = reduce(DataFrame.unionByName, melted)
    return (
        long_df.groupBy("key", "column")
        .agg(
            F.countDistinct("source").alias("n_sources"),
            F.countDistinct(norm_value(F.col("value"))).alias("n_distinct_values"),
        )
        .where((F.col("n_sources") >= 2) & (F.col("n_distinct_values") > 1))
    )
