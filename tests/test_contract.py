"""Local mirror of the driver's correctness gate: run every registry
query on Spark and its oracle SQL on DuckDB over the same parquet,
compare row count + schema (column names) + order-insensitive values.

Both sides are materialized THROUGH PANDAS (sdf.toPandas() /
res.df()) and every value is canonicalized with a dtype TAG, because
that is the path the driver hashes: DuckDB HUGEINT (an uncast sum())
comes back float64 ('f:666') while Spark's BIGINT is int64 ('i:666')
— a divergence the previous fetchall()+str() canon silently masked
(round-1 shipped 2 red rows the local gate called green)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
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


def _canon_value(v):
    """Type-tagged canonical string: int 666 and float 666.0 MUST differ
    (that is exactly the HUGEINT-vs-BIGINT class the driver catches)."""
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return ""
    if isinstance(v, (bool, np.bool_)):
        return f"b:{str(bool(v)).lower()}"
    if isinstance(v, (np.integer, int)):
        return f"i:{int(v)}"
    if isinstance(v, (np.floating, float)):
        return "f:nan" if math.isnan(float(v)) else f"f:{float(v):.6g}"
    return f"s:{v}"


def canon(pdf: pd.DataFrame):
    cols = sorted(pdf.columns)
    out = []
    for row in pdf[cols].itertuples(index=False, name=None):
        out.append("|".join(_canon_value(v) for v in row))
    return sorted(out)


@pytest.mark.parametrize("name", list(QUERIES))
def test_query_matches_oracle(name, spark, con):
    cq = QUERIES[name]
    sdf = cq.fn(spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    if cq.sql is None:
        assert len(spark_pdf) >= 0  # rows-only check
        return
    oracle_pdf = con.execute(cq.sql).df()
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {list(spark_pdf.columns)} vs {list(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    )
    a = canon(spark_pdf)
    b = canon(oracle_pdf)
    mism = [(x, y) for x, y in zip(a, b) if x != y][:5]
    assert a == b, f"{name}: value mismatch, first diffs: {mism}"


def test_canon_catches_hugeint_vs_bigint(con):
    """An uncast DuckDB sum() (HUGEINT → pandas float64) must NOT canon
    equal to a BIGINT — the exact divergence that shipped red in r01."""
    hug = con.execute("SELECT sum(x) AS n FROM (VALUES (333),(333)) t(x)").df()
    big = con.execute(
        "SELECT CAST(sum(x) AS BIGINT) AS n FROM (VALUES (333),(333)) t(x)"
    ).df()
    assert canon(hug) != canon(big)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "run_id", "rule", "bucket", "rows_scanned", "violation_count", "pass"
    }
    names = set(entrymod.queries())
    assert set(entrymod.oracle_sql()) <= names
