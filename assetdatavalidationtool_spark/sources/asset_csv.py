"""CSV asset-table scan with the reference's semantics, Spark-first.

Reference behavior being matched (NOT its implementation):

* header = first line; values are text (ExcelReader.cs:24-30,100-117)
* ragged rows: missing trailing cells back-filled with ""
  (ExcelReader.cs:110-114,164-166)
* trailing blank header cells trimmed (ExcelReader.cs:43-52)
* all cells kept as strings; typed semantics come later from
  normalization classes (SURVEY.md §1.2)

Differences (improvements, documented): we use Spark's CSV reader, so
quoting/escaping is handled correctly — the reference's naive
``line.Split(',')`` breaks on quoted commas; matching that bug would be
wrong. ``mode=PERMISSIVE`` + explicit all-string schema reproduces the
padding behavior distributedly (scales to any file size, splittable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_headers(spark: SparkSession, path: str) -> list[str]:
    """Schema discovery as a first-class pre-query step
    (MainForm.cs:346-359 → ExcelReader.ReadHeaders): first row, trimmed,
    trailing blanks dropped."""
    first = spark.read.text(path).limit(1).collect()
    if not first:
        return []
    cells = [c.strip() for c in first[0]["value"].split(",")]
    while cells and cells[-1] == "":
        cells.pop()
    return cells


def read_asset_table(
    spark: SparkSession, path: str, order_column: str = "_ord"
) -> DataFrame:
    """All-string asset table with reference padding semantics plus an
    explicit order column (file position) so first-row-wins dedup is
    well-defined in a distributed read (SURVEY.md §7.3)."""
    headers = read_headers(spark, path)
    schema = T.StructType([T.StructField(h, T.StringType(), True) for h in headers])
    df = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .schema(schema)
        .csv(path)
    )
    # ragged-row padding: PERMISSIVE already yields null for missing
    # trailing cells; the reference pads with "" — match it.
    padded = df.select(
        *[F.coalesce(F.col(h), F.lit("")).alias(h) for h in headers]
    )
    return padded.withColumn(order_column, F.monotonically_increasing_id())
