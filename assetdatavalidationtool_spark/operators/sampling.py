"""Deterministic hash sampling for training-data pipelines.

Reproducible sampling is a first-class corpus operation: train/holdout
splits and ablation subsets must be STABLE across re-runs, engine
versions, and partitioning — which rules out ``df.sample`` (seeded
per-partition RNG: the same row can flip in/out when the scan splits
differently). Hash sampling decides membership from the row's own key:
``md5(salt ':' id)`` → first 8 hex chars as an integer → modulo. The
same row lands on the same side of the split on any engine (the DuckDB
oracles compute the identical hash), any partitioning, any run.

Scale: membership is a pure Column expression on the key — no shuffle,
no state, pushes through the scan like any filter. Stratified rates are
one CASE over the stratum column, still a single narrow projection.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, functions as F


def _hash_bucket(id_col: Column, salt: str, buckets: int) -> Column:
    """Deterministic bucket in [0, buckets): first 8 hex chars of
    md5("<salt>:<id>") read as an integer, mod buckets. Portable — the
    SQL mirror is ``('0x' || substr(md5(...), 1, 8))::BIGINT % buckets``."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), id_col.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return h % buckets


def hash_sample(
    df: DataFrame,
    id_col: str,
    keep_one_in: int = 20,
    salt: str = "sample",
) -> DataFrame:
    """Keep ~1/``keep_one_in`` of rows, decided by a stable hash of
    ``id_col`` — reproducible across runs/engines/partitionings."""
    return df.where(_hash_bucket(F.col(id_col), salt, keep_one_in) == 0)


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: Mapping[str, int],
    default_one_in: int | None = None,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum hash sampling: keep ~1/``rates[stratum]`` of each
    stratum's rows (e.g. downsample dominant languages harder). A
    stratum absent from ``rates`` — including a NULL stratum — keeps
    1/``default_one_in`` rows, or ALL rows when ``default_one_in`` is
    None.

    One CASE expression over the stratum column — membership is still a
    narrow per-row predicate; no shuffle, no per-stratum pass.
    """
    bucket = lambda n: _hash_bucket(F.col(id_col), salt, n)  # noqa: E731
    keep: Column | None = None
    for stratum, one_in in rates.items():
        cond = (F.col(stratum_col) == stratum) & (bucket(one_in) == 0)
        keep = cond if keep is None else keep | cond
    # NULL stratum must take the default branch, not vanish: a bare
    # NOT IN evaluates to NULL for NULL and where() drops the row —
    # silent corpus loss no rate configuration could express
    others = F.col(stratum_col).isNull()
    if rates:
        others = others | ~F.col(stratum_col).isin(*rates.keys())
    if default_one_in is None:
        default_keep = others
    else:
        default_keep = others & (bucket(default_one_in) == 0)
    keep = default_keep if keep is None else keep | default_keep
    return df.where(keep)


def assign_split(
    df: DataFrame,
    id_col: str,
    fractions: Mapping[str, float] | None = None,
    salt: str = "split",
    buckets: int = 10000,
) -> DataFrame:
    """Add a ``split`` column assigning every row to exactly one named
    split (train/val/test by default) from a stable hash of ``id_col``.

    Assignment is by cumulative integer thresholds over ``buckets``
    hash buckets (round(cum_fraction * buckets) — round, not floor:
    float accumulation leaves sums like 0.01+0.06 at 699.999…, and
    truncation would shift the boundary bucket), so the split is exact
    to 1/buckets, deterministic, partition-invariant, and portable (the
    SQL mirror computes the identical bucket). The LAST split absorbs
    any rounding remainder so every row is assigned. A row's split
    never changes when other splits' fractions are re-balanced only if
    its own cumulative interval is unchanged — the standard contract of
    range-based hash splitting.

    One narrow CASE projection: no shuffle, pushes through the scan.
    """
    fractions = dict(fractions or {"train": 0.9, "val": 0.05, "test": 0.05})
    if not fractions or any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-negative and non-empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1 (got {total})")
    b = _hash_bucket(F.col(id_col), salt, buckets)
    names = list(fractions)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += fractions[name]
        thresh = round(cum * buckets)
        branch = F.when(b < thresh, F.lit(name))
        expr = branch if expr is None else expr.when(b < thresh, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)
