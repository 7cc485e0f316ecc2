"""Bucketed corpus layout: pay the shuffle ONCE at write time.

Writing both sides of the image+caption corpus bucketed by the join
key (``bucketBy(N, "image_id")``) makes every subsequent key-grained
operation exchange-free: the referential containment join, uniqueness
aggregation, conflicts/deltas equi-joins, and per-key window rules all
read pre-clustered files whose layout already satisfies the required
hash distribution — Spark plans them with ZERO Exchange nodes (gated
in tests/test_plans.py).

At 10^12 rows this is the difference between re-shuffling ~petabytes
per validation run and shuffling once per ingest: the reference
rebuilds its key index per run (Validator.cs builds per-source
HashSets in memory); a bucketed table IS that index, persisted. The
bucket count must match on both sides (Spark only co-locates
equal-count layouts) — size it to ~128 MB–1 GB per bucket file at the
target scale. Iceberg's ``bucket(N, col)`` partition transform is the
same contract; this parquet+metastore form is what local Spark can
express without extension jars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    keys: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> str:
    """Persist ``df`` as an external parquet table bucketed by ``keys``
    (optionally sorted within buckets — sorted buckets additionally
    drop the Sort from sort-merge joins). Returns the table name; read
    it back with ``spark.table(table)`` (a plain ``read.parquet`` loses
    the bucket metadata — the metastore carries the layout contract).
    """
    w = (
        df.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, *keys)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
    return table


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Metastore-aware read: the only way the optimizer sees (and
    exploits) the bucketed layout."""
    return spark.table(table)
