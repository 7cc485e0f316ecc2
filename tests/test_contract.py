"""Local mirror of the driver's correctness gate: run every registry
query on Spark and its oracle SQL on DuckDB over the same parquet,
compare row count + schema (column names) + order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod
from assetdatavalidationtool_spark.contract import QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def canon(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, bool):
                vals.append(str(v).lower())
            elif isinstance(v, float):
                vals.append("nan" if math.isnan(v) else f"{v:.6g}")
            elif v is None:
                vals.append("")
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


@pytest.mark.parametrize("name", list(QUERIES))
def test_query_matches_oracle(name, spark, con):
    cq = QUERIES[name]
    sdf = cq.fn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    if cq.sql is None:
        assert len(spark_rows) >= 0  # rows-only check
        return
    res = con.execute(cq.sql)
    oracle_cols = [d[0] for d in res.description]
    oracle_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(oracle_cols), (
        f"{name}: column mismatch {spark_cols} vs {oracle_cols}"
    )
    assert len(spark_rows) == len(oracle_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(oracle_rows)}"
    )
    a = canon(spark_rows, spark_cols)
    b = canon(oracle_rows, oracle_cols)
    mism = [(x, y) for x, y in zip(a, b) if x != y][:5]
    assert a == b, f"{name}: value mismatch, first diffs: {mism}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "run_id", "rule", "bucket", "rows_scanned", "violation_count", "pass"
    }
    names = set(entrymod.queries())
    assert set(entrymod.oracle_sql()) <= names
