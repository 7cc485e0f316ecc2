"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the engine spine (uniqueness + referential rules
→ per-bucket verdicts) on sf0.001. ``queries()``/``oracle_sql()`` come
from the registry in ``assetdatavalidationtool_spark.contract`` — one
entry per operator family from SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from assetdatavalidationtool_spark.contract import QUERIES
from assetdatavalidationtool_spark.rules import (
    ReferentialRule,
    RuleContext,
    RuleSet,
    UniquenessRule,
)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the validation-engine spine (scan → rules → per-bucket
    verdicts) applied to the orders/lineitem key relationship."""
    orders = spark.read.parquet(f"{SF0001}/orders.parquet").select(
        F.col("o_orderkey").cast("string").alias("image_id"),
        F.col("o_totalprice").alias("w"),
    )
    lineitem = spark.read.parquet(f"{SF0001}/lineitem.parquet").select(
        F.col("l_orderkey").cast("string").alias("image_id")
    )
    ctx = RuleContext(
        spark=spark, images=orders, captions=lineitem, num_buckets=16,
        run_id="entry_smoke",
    )
    rs = RuleSet([UniquenessRule(["image_id"]), ReferentialRule()])
    return rs.run(ctx)["verdicts"]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: cq.fn for name, cq in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: cq.sql for name, cq in QUERIES.items() if cq.sql is not None}
