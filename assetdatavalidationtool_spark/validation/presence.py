"""Presence matrix / MatchesAll / MissingByFile (Validator.cs:39-91).

Sources are ``{display_name: (DataFrame, key_col)}``. Keys are
normalized (trim + case-fold) and blanks dropped, mirroring the
reference's OrdinalIgnoreCase HashSets (Validator.cs:59-64).

Scale shape: each function is ONE shuffle on the normalized key.
The presence matrix is union → groupBy(key).pivot(source) — the pivot
value list is the (tiny, driver-known) source list, so no extra pass to
discover pivot values. MatchesAll avoids a chain of N joins: it's the
same single aggregate filtered to count == N. MissingByFile reuses the
aggregate instead of N anti-joins.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..normalize import norm_key

Sources = dict[str, tuple[DataFrame, str]]


def source_keys(df: DataFrame, key_col: str) -> DataFrame:
    """Distinct normalized non-blank keys of one source → column ``key``."""
    return (
        df.select(norm_key(F.col(key_col)).alias("key"))
        .where(F.col("key").isNotNull() & (F.col("key") != ""))
        .distinct()
    )


def _tagged_union(sources: Sources) -> DataFrame:
    """Non-distinct tagged key union: the downstream groupBy dedupes
    with map-side partial aggregation, so a per-source ``.distinct()``
    here would only add one extra exchange per source."""
    parts = []
    for name, (df, key) in sources.items():
        parts.append(
            df.select(norm_key(F.col(key)).alias("key"))
            .where(F.col("key").isNotNull() & (F.col("key") != ""))
            .withColumn("source", F.lit(name))
        )
    return reduce(DataFrame.unionByName, parts)


def key_presence(sources: Sources) -> DataFrame:
    """One row per key in the union of key sets; boolean ``present_<src>``
    per source (KeyPresence, Validator.cs:67-79)."""
    tagged = _tagged_union(sources)
    names = list(sources)
    pivoted = (
        tagged.groupBy("key")
        .pivot("source", names)
        .agg(F.first(F.lit(True)))
    )
    return pivoted.select(
        "key",
        *[
            F.coalesce(F.col(n), F.lit(False)).alias(f"present_{n}")
            for n in names
        ],
    )


def matches_all(sources: Sources) -> DataFrame:
    """Keys present in every source (Validator.cs:81-84) — one aggregate,
    not an N-way join chain."""
    n = len(sources)
    return (
        _tagged_union(sources)
        .groupBy("key")
        .agg(F.countDistinct("source").alias("n_sources"))
        .where(F.col("n_sources") == n)
        .select("key")
    )


def missing_by_file(sources: Sources) -> DataFrame:
    """(source, key) pairs where the key exists elsewhere but not in
    ``source`` (Validator.cs:86-91). Derived from the same single
    aggregate as the presence matrix."""
    names = list(sources)
    per_key = (
        _tagged_union(sources)
        .groupBy("key")
        .agg(F.collect_set("source").alias("present_in"))
    )
    all_names = F.array(*[F.lit(n) for n in names])
    return (
        per_key.select(
            "key",
            F.explode(F.array_except(all_names, F.col("present_in"))).alias("source"),
        )
        .select("source", "key")
    )
