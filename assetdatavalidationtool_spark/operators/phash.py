"""Perceptual-hash (pHash) near-duplicate detection for image corpora.

The reference's uniqueness semantics are exact-key only
(`src/Services/Validator.cs:39-42` — case-insensitive set membership on
the primary key). At 10^12-image scale the interesting duplicates are
NEAR-duplicates: re-encoded / resized copies whose 64-bit perceptual
hashes differ in a handful of bits. BASELINE.json's north star names
"uniqueness on image_id/phash" and "salted aggregation for phash/fmt
skew" explicitly — this module is that operator.

Algorithm: **bit-band LSH with a pigeonhole exactness guarantee.**
Split the 64-bit hash into ``bands`` contiguous bit-bands. Two hashes
within Hamming distance ``max_hamming`` differ in at most
``max_hamming`` bit positions, so when ``max_hamming < bands`` at least
one band is bit-identical (pigeonhole). Equi-joining on
``(band_index, band_value)`` therefore finds EVERY pair within the
radius — this is not an approximation like MinHash banding; the final
``bit_count(a XOR b) <= max_hamming`` filter only removes false
candidates, never true pairs.

Scale design (what matters at 10^12 rows):

* The only shuffle is the band-bucket exchange — ``bands`` rows per
  image (tiny ints, the image bytes never enter this plan).
* Hot buckets: real pHash corpora cluster (flat-color images, test
  cards share hashes; our synthetic table clusters the top byte by
  fmt/size on purpose). A bucket of b rows emits b² candidate pairs, so
  buckets above ``max_bucket_size`` are dropped via a broadcast
  anti-join BEFORE the pair join — the same mega-bucket guard as
  MinHash LSH (`dedup.py::minhash_lsh_candidates`). Dropped buckets are
  near-certain exact-duplicate clusters; route those through the O(n)
  exact uniqueness rule (`rules/uniqueness.py`) instead of the O(b²)
  pair join.
* Everything is built-in Column expressions (shift/mask/xor/bit_count)
  — JVM codegen, no Python, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import spread_small_scan


def phash_bands(
    df: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    bands: int = 4,
) -> DataFrame:
    """Explode each hash into ``bands`` (band, bval) rows.

    64 must divide evenly; band b holds bits [16*b, 16*b+15] for the
    default 4 bands. shiftrightunsigned keeps the top band correct for
    negative (sign-bit-set) hashes.
    """
    if 64 % bands != 0:
        raise ValueError(f"bands={bands} must divide 64")
    width = 64 // bands
    mask = (1 << width) - 1
    df = spread_small_scan(df)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col(phash_col), b * width)
            .bitwiseAND(F.lit(mask))
            .alias("bval"),
        )
        for b in range(bands)
    ]
    return df.select(
        F.col(id_col),
        F.col(phash_col),
        F.explode(F.array(*band_structs)).alias("bk"),
    ).select(
        id_col, phash_col, F.col("bk.band").alias("band"), F.col("bk.bval").alias("bval")
    )


def phash_neardup_pairs(
    df: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket_size: int | None = 200,
) -> DataFrame:
    """All image pairs within ``max_hamming`` bits →
    ``(image_a, image_b, hamming)``, exact under the pigeonhole
    guarantee (requires ``max_hamming < bands``), modulo pairs inside
    dropped mega-buckets (see module docstring).
    """
    if max_hamming >= bands:
        raise ValueError(
            f"pigeonhole exactness needs max_hamming < bands "
            f"(got hamming {max_hamming}, bands {bands})"
        )
    banded = phash_bands(df, id_col, phash_col, bands)

    if max_bucket_size is not None:
        hot = (
            banded.groupBy("band", "bval")
            .count()
            .where(F.col("count") > max_bucket_size)
            .select("band", "bval")
        )
        banded = banded.join(F.broadcast(hot), ["band", "bval"], "left_anti")

    a = banded.alias("a")
    b = banded.alias("b")
    ham = F.bit_count(
        F.col(f"a.{phash_col}").bitwiseXOR(F.col(f"b.{phash_col}"))
    )
    return (
        a.join(b, ["band", "bval"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .where(ham <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("image_a"),
            F.col(f"b.{id_col}").alias("image_b"),
            ham.cast("int").alias("hamming"),
        )
        .distinct()
    )
