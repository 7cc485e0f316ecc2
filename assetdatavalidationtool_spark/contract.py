"""Driver-contract query registry.

One entry per implemented operator family (SURVEY.md §2), exercised on
the driver's TPC-H-ish parquet tables. Each entry carries BOTH the
Spark dataflow (built on the engine's public modules) and the
equivalent ANSI SQL for the DuckDB oracle. Column names and float
rounding are aligned on both sides because the driver's comparator
hashes values after sorting columns by name.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .normalize import norm_key, norm_value, normalize_ipv4, normalize_serial
from .validation import (
    column_overlap,
    conflicts,
    field_mapping_scores,
    key_presence,
    matches_all,
    missing_by_file,
)
from .validation.conflicts import first_row_per_key


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@dataclass
class ContractQuery:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # None → non-SQL-expressible, driver does rows-only


QUERIES: dict[str, ContractQuery] = {}


def register(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = ContractQuery(fn=fn, sql=sql)
        return fn

    return deco


# ---------------------------------------------------------------------------
# J1 — N-way full-outer presence join (Validator.cs:67-79)
# ---------------------------------------------------------------------------
@register(
    "presence_matrix",
    """
    WITH ck AS (SELECT DISTINCT upper(trim(CAST(c_custkey AS VARCHAR))) AS key
                FROM customer WHERE trim(CAST(c_custkey AS VARCHAR)) <> ''),
         ok AS (SELECT DISTINCT upper(trim(CAST(o_custkey AS VARCHAR))) AS key
                FROM orders WHERE trim(CAST(o_custkey AS VARCHAR)) <> '')
    SELECT coalesce(ck.key, ok.key) AS key,
           ck.key IS NOT NULL AS present_customer,
           ok.key IS NOT NULL AS present_orders
    FROM ck FULL OUTER JOIN ok ON ck.key = ok.key
    """,
)
def q_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    return key_presence(
        {
            "customer": (_t(spark, sf_dir, "customer"), "c_custkey"),
            "orders": (_t(spark, sf_dir, "orders"), "o_custkey"),
        }
    )


# ---------------------------------------------------------------------------
# J2 — N-way inner presence / MatchesAll (Validator.cs:81-84)
# ---------------------------------------------------------------------------
@register(
    "matches_all",
    """
    SELECT upper(trim(CAST(c_custkey AS VARCHAR))) AS key FROM customer
    INTERSECT
    SELECT upper(trim(CAST(o_custkey AS VARCHAR))) AS key FROM orders
    """,
)
def q_matches_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return matches_all(
        {
            "customer": (_t(spark, sf_dir, "customer"), "c_custkey"),
            "orders": (_t(spark, sf_dir, "orders"), "o_custkey"),
        }
    )


# ---------------------------------------------------------------------------
# J3 — anti join / MissingByFile (Validator.cs:86-91)
# ---------------------------------------------------------------------------
@register(
    "missing_by_file",
    """
    WITH ck AS (SELECT DISTINCT upper(trim(CAST(c_custkey AS VARCHAR))) AS key FROM customer),
         ok AS (SELECT DISTINCT upper(trim(CAST(o_custkey AS VARCHAR))) AS key FROM orders)
    SELECT 'customer' AS source, key FROM ok WHERE key NOT IN (SELECT key FROM ck)
    UNION ALL
    SELECT 'orders' AS source, key FROM ck WHERE key NOT IN (SELECT key FROM ok)
    """,
)
def q_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return missing_by_file(
        {
            "customer": (_t(spark, sf_dir, "customer"), "c_custkey"),
            "orders": (_t(spark, sf_dir, "orders"), "o_custkey"),
        }
    )


# ---------------------------------------------------------------------------
# J4/J5 — first-row-wins keyed conflict detection (Validator.cs:93-142)
# two "sources" = signup vs error event streams keyed by user_id
# ---------------------------------------------------------------------------
_CONFLICTS_SQL = """
    WITH src AS (
      SELECT 'signup' AS source, user_id, event_id, value, props
      FROM events WHERE event_type = 'signup'
      UNION ALL
      SELECT 'error' AS source, user_id, event_id, value, props
      FROM events WHERE event_type = 'error'
    ), dedup AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY source, upper(trim(CAST(user_id AS VARCHAR)))
          ORDER BY event_id) AS rn
        FROM src
        WHERE trim(CAST(user_id AS VARCHAR)) <> ''
      ) WHERE rn = 1
    ), melted AS (
      SELECT source, upper(trim(CAST(user_id AS VARCHAR))) AS key,
             'value' AS "column", CAST(value AS VARCHAR) AS v FROM dedup
      UNION ALL
      SELECT source, upper(trim(CAST(user_id AS VARCHAR))) AS key,
             'props' AS "column", props AS v FROM dedup
    )
    SELECT key, "column",
           count(DISTINCT source) AS n_sources,
           count(DISTINCT upper(trim(coalesce(v, '')))) AS n_distinct_values
    FROM melted
    GROUP BY key, "column"
    HAVING count(DISTINCT source) >= 2
       AND count(DISTINCT upper(trim(coalesce(v, '')))) > 1
"""


@register("conflicts_first_row_wins", _CONFLICTS_SQL)
def q_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return conflicts(
        {
            "signup": (ev.where(F.col("event_type") == "signup"), "user_id"),
            "error": (ev.where(F.col("event_type") == "error"), "user_id"),
        },
        order_col="event_id",
        columns=["value", "props"],
    )


# ---------------------------------------------------------------------------
# A7 — uniqueness / duplicate-key detection (ReportGenerator.cs:150-156)
# ---------------------------------------------------------------------------
@register(
    "uniqueness_dups",
    """
    SELECT CAST(o_custkey AS VARCHAR) AS key, count(*) AS cnt
    FROM orders GROUP BY o_custkey HAVING count(*) > 1
    """,
)
def q_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") > 1)
        .select(F.col("o_custkey").cast("string").alias("key"), "cnt")
    )


# ---------------------------------------------------------------------------
# A7/windows — first event per user (first-occurrence-wins dedup)
# ---------------------------------------------------------------------------
@register(
    "first_event_per_user",
    """
    SELECT user_id, event_id AS first_event_id, event_type AS first_type
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY upper(trim(CAST(user_id AS VARCHAR))) ORDER BY event_id) AS rn
      FROM events WHERE trim(CAST(user_id AS VARCHAR)) <> ''
    ) WHERE rn = 1
    """,
)
def q_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return first_row_per_key(ev, "user_id", "event_id").select(
        "user_id",
        F.col("event_id").alias("first_event_id"),
        F.col("event_type").alias("first_type"),
    )


# ---------------------------------------------------------------------------
# A2/A5 — aggregation: TPC-H Q1 pricing summary (per-partition verdict
# counts analog: groupBy + partial/final agg)
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# joins + top-k (O5/O7): revenue by customer within a segment, top 20
# ---------------------------------------------------------------------------
@register(
    "top_revenue_customers",
    """
    SELECT c.c_custkey AS custkey, c.c_name AS name,
           round(sum(o.o_totalprice), 2) AS revenue,
           count(*) AS n_orders
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, custkey ASC
    LIMIT 20
    """,
)
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    # dimension side is small → broadcast (no shuffle of orders on key)
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            "revenue",
            "n_orders",
        )
        .orderBy(F.desc("revenue"), F.asc("custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# A4 sketches — per-column stats (exact variants for oracle comparability;
# the engine's StatsRule uses approx_count_distinct at scale)
# ---------------------------------------------------------------------------
@register(
    "column_stats",
    """
    SELECT 'l_quantity' AS "column", count(l_quantity) AS cnt,
           round(min(l_quantity), 4) AS min_v, round(max(l_quantity), 4) AS max_v,
           round(avg(l_quantity), 4) AS avg_v, count(DISTINCT l_quantity) AS n_distinct
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', count(l_extendedprice),
           round(min(l_extendedprice), 4), round(max(l_extendedprice), 4),
           round(avg(l_extendedprice), 4), count(DISTINCT l_extendedprice)
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', count(l_returnflag), NULL, NULL, NULL,
           count(DISTINCT l_returnflag)
    FROM lineitem
    """,
)
def q_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    parts = []
    for c, numeric in [("l_quantity", True), ("l_extendedprice", True), ("l_returnflag", False)]:
        parts.append(
            li.agg(
                F.lit(c).alias("column"),
                F.count(c).alias("cnt"),
                (F.round(F.min(c), 4) if numeric else F.lit(None)).cast("double").alias("min_v"),
                (F.round(F.max(c), 4) if numeric else F.lit(None)).cast("double").alias("max_v"),
                (F.round(F.avg(c), 4) if numeric else F.lit(None)).cast("double").alias("avg_v"),
                F.countDistinct(c).alias("n_distinct"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# F4-F7 — normalization classes (ValueNormalizer.cs:15-54) applied in-plane
# ---------------------------------------------------------------------------
@register(
    "normalize_values",
    """
    SELECT CAST(c_custkey AS VARCHAR) AS key,
           upper(regexp_replace(
             regexp_replace(regexp_replace(trim(c_name), '\\s+', ' ', 'g'),
                            '^[.\\-_]+|[.\\-_]+$', '', 'g'),
             '[\\s\\-]', '', 'g')) AS serial_norm,
           CAST(CAST(c_nationkey AS INT) AS VARCHAR) || '.' ||
           CAST(CAST(c_nationkey % 10 AS INT) AS VARCHAR) || '.0.' ||
           CAST(CAST(c_custkey % 256 AS INT) AS VARCHAR) AS ip_norm
    FROM customer
    """,
)
def q_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    # build a zero-padded dotted quad, then normalize it (octet de-zero-pad)
    quad = F.format_string(
        "%03d.%02d.000.%d",
        F.col("c_nationkey").cast("int"),
        (F.col("c_nationkey") % 10).cast("int"),
        (F.col("c_custkey") % 256).cast("int"),
    )
    return c.select(
        F.col("c_custkey").cast("string").alias("key"),
        normalize_serial(F.col("c_name")).alias("serial_norm"),
        normalize_ipv4(quad).alias("ip_norm"),
    )


# ---------------------------------------------------------------------------
# drift histograms — numeric bucket histogram of two periods side by side
# (DriftRule's aggregate; KS/PSI scalar math runs on this driver-side)
# ---------------------------------------------------------------------------
@register(
    "drift_histogram",
    """
    WITH binned AS (
      SELECT CASE WHEN l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
                  THEN 'a' ELSE 'b' END AS period,
             least(greatest(CAST(floor(l_extendedprice / 5000) AS BIGINT), 0), 19) AS bin
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    )
    SELECT bin,
           sum(CASE WHEN period = 'a' THEN 1 ELSE 0 END) AS cnt_a,
           sum(CASE WHEN period = 'b' THEN 1 ELSE 0 END) AS cnt_b
    FROM binned GROUP BY bin
    """,
)
def q_drift_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_extendedprice").isNotNull())
    bin_col = F.least(
        F.greatest(F.floor(F.col("l_extendedprice") / 5000), F.lit(0)), F.lit(19)
    ).alias("bin")
    period = F.when(
        F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"), "a"
    ).otherwise("b")
    return (
        li.select(bin_col, period.alias("period"))
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("period") == "a", 1).otherwise(0)).alias("cnt_a"),
            F.sum(F.when(F.col("period") == "b", 1).otherwise(0)).alias("cnt_b"),
        )
    )


# ---------------------------------------------------------------------------
# A3 — field-mapping match scores (ReportGenerator.cs:170-205): baseline =
# customer, other = renamed/perturbed projection of customer
# ---------------------------------------------------------------------------
_FIELD_MAPPING_SQL = """
    WITH b AS (
      SELECT upper(trim(CAST(c_custkey AS VARCHAR))) AS key,
             c_name, CAST(c_acctbal AS VARCHAR) AS c_acctbal, c_mktsegment
      FROM (SELECT *, row_number() OVER (
              PARTITION BY upper(trim(CAST(c_custkey AS VARCHAR)))
              ORDER BY c_custkey) rn FROM customer) WHERE rn = 1
    ), o AS (
      SELECT upper(trim(CAST(c_custkey AS VARCHAR))) AS key,
             c_name AS cust_label,
             CASE WHEN c_custkey % 3 = 0 THEN '-1.0'
                  ELSE CAST(c_acctbal AS VARCHAR) END AS balance,
             CASE WHEN c_custkey % 4 = 0 THEN 'OTHER' ELSE c_mktsegment END AS segment
      FROM (SELECT *, row_number() OVER (
              PARTITION BY upper(trim(CAST(c_custkey AS VARCHAR)))
              ORDER BY c_custkey) rn FROM customer) WHERE rn = 1
    ), b_long AS (
      SELECT key, 'c_name' AS b_col, c_name AS b_val FROM b
      UNION ALL SELECT key, 'c_acctbal', c_acctbal FROM b
      UNION ALL SELECT key, 'c_mktsegment', c_mktsegment FROM b
    ), o_long AS (
      SELECT key, 'cust_label' AS o_col, cust_label AS o_val FROM o
      UNION ALL SELECT key, 'balance', balance FROM o
      UNION ALL SELECT key, 'segment', segment FROM o
    ), pairs AS (
      SELECT b_col, o_col,
        sum(CASE WHEN NOT (upper(trim(coalesce(b_val,''))) = '' AND upper(trim(coalesce(o_val,''))) = '')
                  AND upper(trim(coalesce(b_val,''))) = upper(trim(coalesce(o_val,'')))
                 THEN 1 ELSE 0 END) AS same,
        sum(CASE WHEN NOT (upper(trim(coalesce(b_val,''))) = '' AND upper(trim(coalesce(o_val,''))) = '')
                 THEN 1 ELSE 0 END) AS total
      FROM b_long JOIN o_long USING (key)
      GROUP BY b_col, o_col
    )
    SELECT b_col, o_col, same, total, round(same * 1.0 / total, 4) AS score
    FROM pairs WHERE total > 0 AND same * 1.0 / total >= 0.6
"""


@register("field_mapping_scores", _FIELD_MAPPING_SQL)
def q_field_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    baseline = c.select(
        "c_custkey",
        "c_name",
        F.col("c_acctbal").cast("string").alias("c_acctbal"),
        "c_mktsegment",
    ).withColumn("_ord", F.col("c_custkey"))
    other = c.select(
        "c_custkey",
        F.col("c_name").alias("cust_label"),
        F.when(F.col("c_custkey") % 3 == 0, F.lit("-1.0"))
        .otherwise(F.col("c_acctbal").cast("string"))
        .alias("balance"),
        F.when(F.col("c_custkey") % 4 == 0, F.lit("OTHER"))
        .otherwise(F.col("c_mktsegment"))
        .alias("segment"),
    ).withColumn("_ord", F.col("c_custkey"))
    scores = field_mapping_scores(
        baseline, "c_custkey", other, "c_custkey", order_col="_ord"
    )
    return (
        scores.where(~F.col("b_col").isin("c_custkey"))
        .where(~F.col("o_col").isin("c_custkey"))
        .select("b_col", "o_col", "same", "total", F.round("score", 4).alias("score"))
    )


# ---------------------------------------------------------------------------
# J6/A4 — column-overlap suggestions (ColumnOverlapMapper.cs:10-55)
# ---------------------------------------------------------------------------
_OVERLAP_SQL = """
    WITH melted AS (
      SELECT DISTINCT 'customer' AS source, 'c_nationkey' AS "column",
             upper(trim(CAST(c_nationkey AS VARCHAR))) AS value FROM customer
      UNION SELECT DISTINCT 'customer', 'c_mktsegment', upper(trim(c_mktsegment)) FROM customer
      UNION SELECT DISTINCT 'supplier', 's_nationkey',
             upper(trim(CAST(s_nationkey AS VARCHAR))) FROM supplier
      UNION SELECT DISTINCT 'supplier', 's_name', upper(trim(s_name)) FROM supplier
    ), clean AS (
      SELECT * FROM melted WHERE value IS NOT NULL AND trim(value) <> ''
    ), sizes AS (
      SELECT source, "column", count(*) AS n FROM clean GROUP BY source, "column"
    ), pairs AS (
      SELECT a.source AS source_a, a."column" AS column_a,
             b.source AS source_b, b."column" AS column_b, count(*) AS overlap
      FROM clean a JOIN clean b ON a.value = b.value AND a.source < b.source
      GROUP BY 1, 2, 3, 4
    )
    SELECT p.source_a, p.column_a, p.source_b, p.column_b, p.overlap,
           round(p.overlap * 1.0 / greatest(sa.n, sb.n), 4) AS ratio
    FROM pairs p
    JOIN sizes sa ON sa.source = p.source_a AND sa."column" = p.column_a
    JOIN sizes sb ON sb.source = p.source_b AND sb."column" = p.column_b
    WHERE p.overlap >= 5 AND p.overlap * 1.0 / greatest(sa.n, sb.n) >= 0.05
"""


@register("column_overlap", _OVERLAP_SQL)
def q_column_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment")
    s = _t(spark, sf_dir, "supplier").select("s_nationkey", "s_name")
    return column_overlap(
        {"customer": c, "supplier": s}, use_header_normalizer=False
    )
