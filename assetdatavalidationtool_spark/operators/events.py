"""Event-stream operators: gap sessionization and as-of join.

Both are single-shuffle patterns: partition by the entity key, sort by
time within the partition, and express the semantics with window
functions — the scalable shape for 10^12-event streams (no self-join,
no per-row Python, one exchange on the key that any downstream
per-entity work reuses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    order_col: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization → one row per (user, session):
    (user_id, session_seq, n_events, session_start, session_end).

    A new session starts when the gap to the previous event of the same
    user exceeds ``gap_minutes``. session_seq is the 1-based session
    index per user (cumulative sum of session-start flags — the classic
    two-window formulation). Gap arithmetic is in integer MICROSECONDS
    (``unix_micros``) so every engine computes the identical boundary;
    ``order_col`` breaks timestamp ties deterministically.

    One shuffle (by user), two windows over the same sort — Spark
    evaluates both in a single sort pass.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    # TZ-free epoch for TIMESTAMP_NTZ (the parquet type): unix_micros
    # rejects NTZ, and CAST(ntz AS timestamp) routes through the
    # session timezone — under a non-UTC session two events straddling
    # a DST transition would get gap arithmetic off by the offset jump.
    # Field arithmetic (unix_date + time-of-day) maps the naive value
    # to micros identically in every session timezone.
    ts_us_expr = F.expr(
        f"unix_date(cast({ts_col} as date)) * 86400000000"
        f" + cast(hour({ts_col}) * 3600 + minute({ts_col}) * 60"
        f"        as bigint) * 1000000"
        f" + cast(date_part('SECOND', {ts_col}) * 1000000 as bigint)"
    )
    # stage the epoch-micros arithmetic once per row (r6): inlining it
    # into lag() and the gap predicate evaluated the five-function
    # date tree three times per row
    ts_us = F.col("_ts_us")
    prev_us = F.lag(ts_us).over(w)
    is_new = F.when(
        prev_us.isNull() | ((ts_us - prev_us) > gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    # pin the window exchange's partition count (r6): session rows are
    # narrow, so AQE's size-based coalescing collapses the per-user
    # window sort to one task at bench scale; the pinned count derives
    # from the cluster's core count. The windows and the session
    # aggregate all cluster on the same key, so this is still the only
    # exchange in the plan.
    par = df.sparkSession.sparkContext.defaultParallelism * 2
    return (
        df.repartition(par, user_col)
        .withColumn("_ts_us", ts_us_expr)
        .withColumn("_new", is_new)
        .withColumn("session_seq", F.sum("_new").over(wcum))
        .groupBy(F.col(user_col).alias("user_id"), "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """As-of (point-in-time) join: for each left row, attach the payload
    of the LATEST right row with the same key and ``right_ts`` <=
    ``left_ts`` (inclusive); nulls when no prior right row exists. The
    operator Spark's DataFrame API lacks natively (pandas-on-Spark's
    merge_asof shuffles per call; DuckDB/kdb have it built in).

    Distributed shape: union both sides tagged (right=0, left=1), one
    window per key ordered by (ts, side), and ``last(payload,
    ignorenulls)`` over UNBOUNDED PRECEDING..CURRENT — the right row's
    own payload fills forward to every later left row. ONE shuffle on
    the key, no range self-join, no per-key collect: at 10^12 rows this
    is a sort within each key partition, and skewed keys are bounded by
    the same AQE/salting story as any single-key window.

    Requirement: right must be unique per (key, right_ts) — dedupe
    first (equal-ts right duplicates would make "latest" ambiguous on
    every engine). At equal left/right timestamps the right row wins
    (inclusive semantics), matching DuckDB ``ASOF JOIN ... ON l.ts >=
    r.ts``.
    """
    pstruct = F.struct(*[F.col(c) for c in payload]).alias("_p")
    r2 = right.select(
        *[F.col(c) for c in on], F.col(right_ts).alias("_ats"), pstruct
    ).withColumn("_side", F.lit(0))
    left_cols = left.columns
    l2 = left.select(
        *left_cols, F.col(left_ts).alias("_ats")
    ).withColumn("_side", F.lit(1)).withColumn(
        "_p", F.lit(None).cast(r2.schema["_p"].dataType)
    )
    for c in left_cols:
        if c not in r2.columns:
            r2 = r2.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    cols = left_cols + ["_ats", "_side", "_p"]
    union = l2.select(*cols).unionByName(r2.select(*cols))

    w = (
        Window.partitionBy(*on)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = union.withColumn("_m", F.last("_p", ignorenulls=True).over(w))
    return filled.where(F.col("_side") == 1).select(
        *left_cols,
        *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in payload],
    )
