"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exact baseline: dot products via
``aggregate``/``zip_with`` (JVM-side, no UDF), a broadcast of the query
block, and a per-query top-k window. The scale path is LSH bucketing:
deterministic random-hyperplane signs → candidates only within a
bucket, turning the O(N·Q) scan into a bucket-local join.

At 10^12 rows brute force is only for a bounded query block (the
corpus side streams once per query block, queries broadcast); the
LSH/IVF variant is the default. Both avoid Python entirely.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _dvec(a: F.Column) -> F.Column:
    """float[] → double[] before any arithmetic: keeps accumulation in
    double on every engine (float accumulation diverges across engines
    at the 4th decimal, breaking oracle comparison)."""
    return F.transform(a, lambda x: x.cast("double"))


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(_dvec(a), _dvec(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(_dvec(a), F.lit(0.0), lambda acc, v: acc + v * v))


def embedding_norms(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, dim, l2_norm) — per-vector diagnostics / stats rule input."""
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.size(F.col(vec_col)).alias("dim"),
        F.round(_norm(F.col(vec_col)), 4).alias("l2_norm"),
    )


def brute_force_cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k for each query id →
    (query_id, neighbor_id, cosine, rank). Self-matches excluded.

    The query block is broadcast (bounded, driver-chosen); the corpus is
    scanned once; ties break on neighbor_id for determinism.
    """
    corpus = df.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v")
    )
    queries = df.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q")
    )
    sims = (
        corpus.crossJoin(F.broadcast(queries))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("q"), F.col("v")) / (_norm(F.col("q")) * _norm(F.col("v")))).alias(
                "_cos"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("_cos", 4).alias("cosine"), "rank")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (seeded; reproducible anywhere,
    including inside an oracle SQL literal)."""
    rng = np.random.RandomState(seed)
    return [[round(float(x), 6) for x in rng.randn(dim)] for _ in range(n_planes)]


def _bucket_expr(vec_col: str, planes: list[list[float]]) -> F.Column:
    bucket = None
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(F.col(vec_col), lit_plane) > 0, F.lit(2 ** p)).otherwise(
            F.lit(0)
        )
        bucket = bit if bucket is None else (bucket + bit)
    return bucket.cast("long")


def lsh_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: list[list[float]],
) -> DataFrame:
    """Sign-bucket each vector: bucket = bits of sign(v · h_p) →
    (vec_id, bucket). Vectors in the same bucket are ANN candidates;
    a per-bucket brute-force pass (or a bucket equi-join) refines.
    All arithmetic is built-in array ops — no UDF, no shuffle here."""
    return df.select(
        F.col(id_col).alias("vec_id"), _bucket_expr(vec_col, planes).alias("bucket")
    )


def lsh_ann_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: list[list[float]],
    k: int = 5,
) -> DataFrame:
    """ANN top-k within LSH buckets → (query_id, neighbor_id, cosine,
    rank). Recall < 1 by construction; the scale path for 10^12 rows
    (bucket-local joins instead of a full cross product)."""
    with_b = df.select(
        F.col(id_col).alias("_vid"),
        F.col(vec_col).alias("_vec"),
        _bucket_expr(vec_col, planes).alias("bucket"),
    )
    a = with_b.select(
        F.col("_vid").alias("query_id"), F.col("_vec").alias("q"), "bucket"
    )
    b = with_b.select(
        F.col("_vid").alias("neighbor_id"), F.col("_vec").alias("v"), "bucket"
    )
    sims = (
        a.join(b, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("q"), F.col("v")) / (_norm(F.col("q")) * _norm(F.col("v")))).alias(
                "_cos"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("_cos", 4).alias("cosine"), "rank")
    )


def ivf_centroids(dim: int, n_cells: int, seed: int = 42) -> list[list[float]]:
    """Deterministic coarse-quantizer centroids (seeded Gaussian,
    L2-normalized). Production swaps in trained k-means centroids; the
    assignment/search dataflow is identical."""
    rng = np.random.RandomState(seed)
    cents = rng.randn(n_cells, dim)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    return [[round(float(x), 6) for x in c] for c in cents]


def ivf_assign(
    df: DataFrame, id_col: str, vec_col: str, centroids: list[list[float]]
) -> DataFrame:
    """(vec_id, cell) — assign each vector to its nearest centroid by
    cosine (argmax over dot products with unit centroids; norm of the
    vector is constant across cells so plain dot suffices). Built-in
    array ops only; a narrow scan-stage transformation."""
    return df.select(
        F.col(id_col).alias("vec_id"),
        _cell_expr(vec_col, centroids).alias("cell"),
    )


def _cell_expr(vec_col: str, centroids: list[list[float]]) -> F.Column:
    dots = [
        _dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in c]))
        for c in centroids
    ]
    best = F.greatest(*dots)
    # first cell achieving the max wins ties — explicit, SQL-mirrorable
    expr = F.when(dots[0] == best, F.lit(0))
    for i in range(1, len(centroids)):
        expr = expr.when(dots[i] == best, F.lit(i))
    return expr.cast("int")


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    k: int = 5,
) -> DataFrame:
    """IVF ANN top-k: brute-force cosine only WITHIN each coarse cell →
    (query_id, neighbor_id, cosine, rank). The 10^12-row scale path:
    the pair join is cell-local (inverted-file pruning), so cost drops
    from O(N²) to Σ|cell|². Recall improves with multi-probe (search
    the P nearest cells) — same dataflow, larger candidate set."""
    assigned = df.select(
        F.col(id_col).alias("_vid"),
        F.col(vec_col).alias("_vec"),
        _cell_expr(vec_col, centroids).alias("cell"),
    )
    a = assigned.select(
        F.col("_vid").alias("query_id"), F.col("_vec").alias("q"), "cell"
    )
    b = assigned.select(
        F.col("_vid").alias("neighbor_id"), F.col("_vec").alias("v"), "cell"
    )
    sims = (
        a.join(b, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("q"), F.col("v")) / (_norm(F.col("q")) * _norm(F.col("v")))).alias(
                "_cos"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("_cos", 4).alias("cosine"), "rank")
    )
