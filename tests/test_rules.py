"""End-to-end rule engine tests with exactly-counted injected faults
(FIXTURES.md §3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from assetdatavalidationtool_spark.datagen import generate_captions, generate_images
from assetdatavalidationtool_spark.rules import (
    DriftRule,
    ReferentialRule,
    RowInvariantRule,
    RuleContext,
    RuleSet,
    SchemaRule,
    StatsRule,
    UniquenessRule,
)
from assetdatavalidationtool_spark.rules.drift import snapshot_reference
from assetdatavalidationtool_spark.rules.schema import ColumnSpec

N = 200
DUPS = 3
BAD_PIXELS = 4
NULL_DIMS = 2
DROPPED = 5
ALIENS = 4
MUTATED = 6


@pytest.fixture(scope="module")
def ctx(spark):
    images = generate_images(
        spark, N, partitions=4, dup_ids=DUPS, bad_pixel_ids=BAD_PIXELS,
        null_dim_ids=NULL_DIMS,
    ).cache()
    captions = generate_captions(
        spark, N, partitions=4, drop_ids=DROPPED, alien_ids=ALIENS,
        mutate_ids=MUTATED,
    ).cache()
    images.count(), captions.count()
    return RuleContext(spark=spark, images=images, captions=captions, num_buckets=16)


def schema_specs():
    return [
        ColumnSpec("image_id", "string", nullable=False),
        ColumnSpec("bytes", "binary", nullable=False),
        ColumnSpec("w", "int", nullable=False, domain=(F.col("w") > 0) & (F.col("w") <= 4096)),
        ColumnSpec("h", "int", nullable=False),
        ColumnSpec("fmt", "string", nullable=False,
                   domain=F.col("fmt").isin("png", "jpeg", "webp")),
        ColumnSpec("caption", "string", nullable=False),
        ColumnSpec("phash", "bigint", nullable=False),
    ]


def test_uniqueness_counts_duplicates(ctx):
    vio = UniquenessRule(["image_id"]).violations(ctx)
    rows = vio.collect()
    assert len(rows) == DUPS
    assert all(r["detail"] == "duplicate count=2" for r in rows)


def test_uniqueness_salted_matches_unsalted(ctx):
    a = UniquenessRule(["image_id"]).violations(ctx).select("key").collect()
    b = UniquenessRule(["image_id"], salted=True).violations(ctx).select("key").collect()
    assert sorted(r["key"] for r in a) == sorted(r["key"] for r in b)


def test_schema_null_dims(ctx):
    vio = SchemaRule(schema_specs()).violations(ctx)
    nulls = vio.where(F.col("detail") == "null value").collect()
    # null w + null h per faulted row; duplicated faulted rows count double
    expected = 2 * (NULL_DIMS + min(NULL_DIMS, DUPS))
    assert len(nulls) == expected
    assert vio.where(F.col("detail") == "missing column").count() == 0


def test_referential_both_directions(ctx):
    vio = ReferentialRule().violations(ctx)
    missing_caption = vio.where(F.col("detail") == "missing caption row")
    missing_image = vio.where(F.col("detail") == "missing image row")
    # dropped caption rows: ids [N-DROPPED, N); duplicated image ids are
    # low indices so they don't overlap — each dropped id appears once
    # per image row occurrence
    assert missing_caption.count() == DROPPED
    assert missing_image.count() == ALIENS
    assert missing_image.select("key").distinct().count() == ALIENS


def test_row_invariant_pixels_and_captions(ctx):
    rule = RowInvariantRule()
    vio = rule.violations(ctx).cache()
    pix = vio.where(F.col("column") == "bytes")
    # bad-pixel rows [0, BAD_PIXELS) + their duplicate re-emits [0, DUPS)
    assert pix.count() == BAD_PIXELS + min(BAD_PIXELS, DUPS)
    # caption column in images is generated correct, so no caption violations
    assert vio.where(F.col("column") == "caption").count() == 0
    checks = rule.checks(ctx)
    ok = checks.where(F.col("pixel_ok") & F.col("caption_ok"))
    assert ok.count() == (N + DUPS) - (BAD_PIXELS + min(BAD_PIXELS, DUPS))


def test_stats_metrics_and_bounds(ctx):
    rule = StatsRule(columns=["w", "h", "fmt", "phash"], bounds={"w": (1, 512)})
    m = {(r["column"], r["metric"]): r["value"] for r in rule.metrics(ctx).collect()}
    assert m[("fmt", "approx_distinct")] == pytest.approx(3, abs=1)
    assert m[("w", "min")] >= 64 and m[("w", "max")] <= 512
    assert 0 < m[("w", "null_frac")] < 0.1
    assert rule.violations(ctx).count() == 0


def test_drift_fires_on_shifted_distribution(ctx, spark):
    ref = snapshot_reference(ctx.images, "fmt", "categorical")
    same = DriftRule(column="fmt", kind="categorical", reference=ref)
    assert same.violations(ctx).count() == 0
    shifted = {"png": 0.05, "jpeg": 0.05, "webp": 0.9}
    drifted = DriftRule(column="fmt", kind="categorical", reference=shifted)
    assert drifted.violations(ctx).count() > 0


def test_ruleset_verdicts(ctx):
    rs = RuleSet(
        [
            SchemaRule(schema_specs()),
            UniquenessRule(["image_id"]),
            ReferentialRule(),
            RowInvariantRule(),
        ]
    )
    out = rs.run(ctx)
    verdicts = out["verdicts"].cache()
    # every (rule, bucket) pair present
    n_buckets = verdicts.select("bucket").distinct().count()
    assert verdicts.count() == 4 * n_buckets
    total_vio = verdicts.agg(F.sum("violation_count")).collect()[0][0]
    assert total_vio == out["violations"].count()
    # pass flag consistent
    bad = verdicts.where((F.col("violation_count") == 0) != F.col("pass")).count()
    assert bad == 0
    # rows_scanned sums to table size
    per_rule_rows = (
        verdicts.groupBy("rule").agg(F.sum("rows_scanned").alias("s")).collect()
    )
    assert all(r["s"] == N + DUPS for r in per_rule_rows)


def test_row_invariant_one_violation_per_failed_check(spark):
    """A row failing BOTH pixel and caption checks emits TWO violation
    rows (bytes + caption), and a decoded-shape mismatch records the
    -1.0 psnr sentinel (NOT the 999.0 exact-match sentinel)."""
    import numpy as np

    from assetdatavalidationtool_spark.codecs import encode_image
    from assetdatavalidationtool_spark.datagen import IMAGES_SCHEMA, make_row, row_params

    good = make_row(1)
    both_bad = make_row(2, corrupt_pixels=True)
    both_bad["caption"] = "WRONG caption"
    shape_bad = row_params(3)
    shape_bad["bytes"] = encode_image(
        np.zeros((8, 8, 3), dtype=np.uint8), shape_bad["fmt"]
    )
    images = spark.createDataFrame([good, both_bad, shape_bad], IMAGES_SCHEMA)
    ctx = RuleContext(spark=spark, images=images, captions=None, num_buckets=8)

    rule = RowInvariantRule()
    vio = rule.violations(ctx).collect()
    by_key = {}
    for r in vio:
        by_key.setdefault(r["key"], set()).add(r["column"])
    assert by_key[both_bad["image_id"]] == {"bytes", "caption"}
    assert by_key[shape_bad["image_id"]] == {"bytes"}
    assert good["image_id"] not in by_key

    checks = {r["image_id"]: r for r in rule.checks(ctx).collect()}
    assert checks[shape_bad["image_id"]]["psnr_db"] == -1.0
    assert checks[good["image_id"]]["psnr_db"] in (999.0,) or checks[good["image_id"]]["psnr_db"] >= 40.0


def test_audio_invariant_rule_counts(spark):
    """AudioInvariantRule over a faulted clips table: closed-form
    violation counts. n=40 with 3 corrupt (decode), 4 clipped (ref
    mismatch AND clipping -> 2 each), 5 wrong-meta (metadata) ->
    3 + 8 + 5 = 16 violations; verdict sums match."""
    from assetdatavalidationtool_spark.datagen import generate_clips
    from assetdatavalidationtool_spark.rules import (
        AudioInvariantRule,
        RuleContext,
        RuleSet,
    )

    clips = generate_clips(
        spark, 40, partitions=2, n_samples=2000,
        corrupt_ids=3, clipped_ids=4, wrong_meta_ids=5,
    ).cache()
    ctx = RuleContext(spark=spark, images=clips, num_buckets=8, key_col="clip_id")
    res = RuleSet([AudioInvariantRule()]).run(ctx)
    vio = res["violations"].collect()
    def count(prefix):
        return sum(1 for r in vio if r["detail"].startswith(prefix))

    assert count("audio decode failed") == 3
    assert count("sample mismatch vs reference") == 4
    assert count("clipping frac=") == 4
    assert count("declared metadata != decoded") == 5
    assert len(vio) == 16
    total = sum(r["violation_count"] for r in res["verdicts"].collect())
    assert total == 16
    res["violations"].unpersist()


def test_video_invariant_rule_counts(spark):
    """VideoInvariantRule over a faulted videos table: closed-form
    counts. n=24 with 2 corrupt (decode), 3 wrong-content (frame
    mismatch), 4 wrong-meta (metadata) -> 9 violations; clean rows
    pass the C444 round-trip PSNR gate."""
    from assetdatavalidationtool_spark.datagen import generate_videos
    from assetdatavalidationtool_spark.rules import (
        RuleContext,
        RuleSet,
        VideoInvariantRule,
    )

    vids = generate_videos(
        spark, 24, partitions=2,
        corrupt_ids=2, wrong_content_ids=3, wrong_meta_ids=4,
    ).cache()
    ctx = RuleContext(spark=spark, images=vids, num_buckets=8, key_col="video_id")
    res = RuleSet([VideoInvariantRule(check_every_n=3)]).run(ctx)
    vio = res["violations"].collect()

    def count(prefix):
        return sum(1 for r in vio if r["detail"].startswith(prefix))

    assert count("video decode failed") == 2
    assert count("frame mismatch min_psnr=") == 3
    assert count("declared metadata != decoded") == 4
    assert len(vio) == 9
    total = sum(r["violation_count"] for r in res["verdicts"].collect())
    assert total == 9
    res["violations"].unpersist()


def test_audio_video_bad_id_degrades_per_row(spark):
    """A decodable row whose id lacks the numeric suffix the reference
    renderer expects must emit a per-row reference violation, not fail
    the Spark task (ADVICE r03: id parse was outside the per-row try)."""
    from pyspark.sql import functions as F

    from assetdatavalidationtool_spark.datagen import generate_clips, generate_videos
    from assetdatavalidationtool_spark.rules import (
        AudioInvariantRule,
        RuleContext,
        RuleSet,
        VideoInvariantRule,
    )

    clips = generate_clips(spark, 6, partitions=1, n_samples=500).withColumn(
        "clip_id",
        F.when(F.col("clip_id") == "clip_000000002", "clip_renamed").otherwise(
            F.col("clip_id")
        ),
    )
    ctx = RuleContext(spark=spark, images=clips, num_buckets=4, key_col="clip_id")
    vio = RuleSet([AudioInvariantRule()]).run(ctx, persist=False)["violations"].collect()
    assert [(r["key"], r["detail"]) for r in vio] == [
        ("clip_renamed", "sample mismatch vs reference")
    ]

    vids = generate_videos(spark, 4, partitions=1, n_frames=4, w=16, h=12).withColumn(
        "video_id",
        F.when(F.col("video_id") == "video_000000001", "video_renamed").otherwise(
            F.col("video_id")
        ),
    )
    vctx = RuleContext(spark=spark, images=vids, num_buckets=4, key_col="video_id")
    vvio = RuleSet([VideoInvariantRule()]).run(vctx, persist=False)["violations"].collect()
    assert [(r["key"], r["detail"][:20]) for r in vvio] == [
        ("video_renamed", "frame mismatch min_p")
    ]


def test_neardup_rule_counts(spark):
    """near_phash_ids planted pairs: each planted near row pairs with
    its base (Hamming 3), two violation rows per pair (one per member);
    the clean remainder stays silent."""
    from assetdatavalidationtool_spark.rules import NearDuplicateRule, RuleContext

    images = generate_images(spark, 300, near_phash_ids=4)
    ctx = RuleContext(spark=spark, images=images, captions=None, num_buckets=8)
    vio = NearDuplicateRule().violations(ctx).collect()
    assert len(vio) == 8  # 4 pairs x 2 members
    keys = sorted(r["key"] for r in vio)
    assert keys == sorted(
        [f"img_{i:012d}" for i in range(4)] + [f"near_{i:012d}" for i in range(4)]
    )
    assert all("hamming=3" in r["detail"] for r in vio)
    assert all(r["rule"] == "neardup(phash)" for r in vio)
    # verdicts integrate through the standard spine
    from assetdatavalidationtool_spark.rules import RuleSet

    res = RuleSet([NearDuplicateRule()]).run(ctx)
    total = res["verdicts"].agg(F.sum("violation_count")).first()[0]
    res["violations"].unpersist()
    assert total == 8


def test_neardup_reemits_stay_pixel_clean_with_overlapping_faults(spark):
    """near_phash_ids and bad_pixel_ids ranges overlap at the low
    indices — the near re-emits must still be pixel-clean (the
    documented guarantee), so RowInvariantRule flags ONLY the base
    rows' corrupted bytes, never the near twins."""
    from assetdatavalidationtool_spark.rules import RowInvariantRule, RuleContext

    images = generate_images(spark, 60, bad_pixel_ids=3, near_phash_ids=3)
    ctx = RuleContext(spark=spark, images=images, captions=None, num_buckets=4)
    vio = RowInvariantRule().violations(ctx).collect()
    keys = sorted(r["key"] for r in vio)
    assert keys == [f"img_{i:012d}" for i in range(3)], keys


def test_neardup_rule_ignores_exact_dup_reemits(spark):
    """dup_ids re-emits share the SAME image_id — uniqueness territory,
    not near-dup pairs (the strict id ordering excludes self-pairs)."""
    from assetdatavalidationtool_spark.rules import NearDuplicateRule, RuleContext

    images = generate_images(spark, 200, dup_ids=5)
    ctx = RuleContext(spark=spark, images=images, captions=None, num_buckets=8)
    assert NearDuplicateRule().violations(ctx).count() == 0


def test_neardup_rule_not_bucket_aligned(spark):
    """Cross-bucket pairs mean a bucket-grain resume must re-run the
    whole rule — the manifest must classify it global."""
    from assetdatavalidationtool_spark.manifest import rule_is_bucket_aligned
    from assetdatavalidationtool_spark.rules import NearDuplicateRule, RuleContext

    ctx = RuleContext(spark=spark, images=None, captions=None)
    assert not rule_is_bucket_aligned(NearDuplicateRule(), ctx)


def test_metadata_gate_rule_flags_and_maps_columns(spark):
    from assetdatavalidationtool_spark.rules import MetadataGateRule, RuleContext

    images = spark.createDataFrame(
        [
            ("ok", 512, 512, "png", 5000),
            ("nul", None, 512, "png", 5000),
            ("sm", 16, 512, "png", 5000),
            ("fmtx", 512, 512, "tiff", 5000),
            ("tiny", 512, 512, "png", 8),
        ],
        "image_id string, w int, h int, fmt string, n_bytes long",
    )
    ctx = RuleContext(spark=spark, images=images, captions=None, num_buckets=8)
    got = {r["key"]: r for r in MetadataGateRule(min_bytes=128).violations(ctx).collect()}
    assert set(got) == {"nul", "sm", "fmtx", "tiny"}
    assert got["nul"]["column"] == "w,h" and "null_dims" in got["nul"]["detail"]
    assert got["sm"]["detail"] == "gated: too_small"
    assert got["fmtx"]["column"] == "fmt"
    assert got["tiny"]["column"] == "bytes"
    assert all(r["rule"] == "gate" and r["bucket"] is not None for r in got.values())


def test_metadata_gate_rule_payload_gate_needs_column(spark):
    """min_bytes set but no n_bytes column → the payload gate silently
    disables itself instead of scanning the binary bytes column."""
    from assetdatavalidationtool_spark.rules import MetadataGateRule, RuleContext

    images = spark.createDataFrame(
        [("a", 512, 512, "png")], "image_id string, w int, h int, fmt string"
    )
    ctx = RuleContext(spark=spark, images=images, captions=None, num_buckets=8)
    assert MetadataGateRule(min_bytes=128).violations(ctx).count() == 0


def test_metadata_gate_rule_is_bucket_aligned(spark):
    from assetdatavalidationtool_spark.manifest import rule_is_bucket_aligned
    from assetdatavalidationtool_spark.rules import MetadataGateRule, RuleContext

    ctx = RuleContext(spark=spark, images=None, captions=None)
    assert rule_is_bucket_aligned(MetadataGateRule(), ctx)


def test_metadata_gate_rule_compression_bounds(spark):
    """Optional milli-bpp bounds flag starved (truncated) and bloated
    payloads against the bytes column; the defaults leave them off."""
    from assetdatavalidationtool_spark.rules import MetadataGateRule, RuleContext

    images = spark.createDataFrame(
        [
            ("ok", 100, 100, "png", 1000),       # 100 milli-bpp
            ("starved", 100, 100, "png", 200),   # 20 — below low=50
            ("bloated", 100, 100, "png", 60000), # 6000 — above high=2000
        ],
        "image_id string, w int, h int, fmt string, n_bytes long",
    )
    ctx = RuleContext(spark=spark, images=images, captions=None, num_buckets=8)
    got = {
        r["key"]: r
        for r in MetadataGateRule(milli_bpp_bounds=(50, 2000))
        .violations(ctx)
        .collect()
    }
    assert set(got) == {"starved", "bloated"}
    assert got["starved"]["detail"] == "gated: starved_payload"
    assert got["bloated"]["detail"] == "gated: bloated_payload"
    assert all(r["column"] == "bytes" for r in got.values())
    # defaults: bounds off → no violations from these rows
    assert MetadataGateRule().violations(ctx).count() == 0


def test_split_clean_quarantine_partitions_input(ctx):
    """clean ∪ quarantine must partition the input with multiplicity:
    every copy of a duplicated key quarantines (the KEEP decision is a
    separate dedup step), missing-caption keys quarantine via
    referential, and alien captions (no image row) must NOT leak in."""
    from assetdatavalidationtool_spark.rules import split_violations

    rs = RuleSet([UniquenessRule(["image_id"]), ReferentialRule()])
    res = rs.run(ctx)
    parts = split_violations(ctx, res["violations"])
    n_in = ctx.images.count()
    q = parts["quarantine"].cache()
    n_q = q.count()
    assert parts["clean"].count() + n_q == n_in
    # 3 dup keys x 2 copies + 5 dropped-caption keys
    assert n_q == 2 * DUPS + DROPPED
    dup_rows = q.where(F.col("rules_hit").contains("uniqueness")).count()
    ref_rows = q.where(F.col("rules_hit") == "referential").count()
    assert dup_rows == 2 * DUPS
    assert ref_rows == DROPPED
    assert q.where(F.col("n_violations") < 1).count() == 0
    # alien caption keys have no image row — absent from both sides
    assert q.where(F.col("image_id").startswith("alien_")).count() == 0
    assert parts["clean"].where(F.col("image_id").startswith("alien_")).count() == 0
    # clean side exposes EXACTLY the input columns (no tag residue)
    assert parts["clean"].columns == ctx.images.columns
    q.unpersist()
    res["violations"].unpersist()


def test_write_split_one_scan_two_sinks(ctx, tmp_path):
    """write_split materializes both sinks from one job: partitioned
    status=clean/ and status=quarantine/ dirs whose row counts
    reconcile with the input."""
    from assetdatavalidationtool_spark.rules import split_violations, write_split

    rs = RuleSet([UniquenessRule(["image_id"]), ReferentialRule()])
    res = rs.run(ctx)
    parts = split_violations(ctx, res["violations"])
    out = str(tmp_path / "split")
    write_split(parts["tagged"], out)
    res["violations"].unpersist()
    spark = ctx.spark
    clean = spark.read.parquet(f"{out}/status=clean")
    quar = spark.read.parquet(f"{out}/status=quarantine")
    assert clean.count() + quar.count() == ctx.images.count()
    assert quar.count() == 2 * DUPS + DROPPED
    assert "rules_hit" in quar.columns and "n_violations" in quar.columns


def test_neardup_rule_casts_key_to_string(spark):
    """VIOLATIONS_SCHEMA says key is string: a bigint id column must be
    cast explicitly by the rule, not rely on union-time promotion."""
    from assetdatavalidationtool_spark.rules import NearDuplicateRule, RuleContext

    imgs = generate_images(spark, 120, near_phash_ids=2).withColumn(
        "image_id",
        F.coalesce(
            F.regexp_extract("image_id", r"(\d+)$", 1).cast("long")
            # near_* rows re-use base ids; offset keeps them distinct
            + F.when(F.col("image_id").startswith("near_"), 1000000).otherwise(0),
            F.lit(0),
        ),
    )
    ctx = RuleContext(spark=spark, images=imgs, captions=None, num_buckets=8)
    vio = NearDuplicateRule().violations(ctx)
    assert dict(vio.dtypes)["key"] == "string"
    assert vio.count() == 4  # 2 planted pairs x 2 members


def test_header_consistency_rule_flags_and_maps_columns(spark):
    """HeaderConsistencyRule over real datagen payloads: tampered
    metadata columns surface as violations mapped to the offending
    column; clean rows stay silent; the rule is bucket-aligned so a
    resume re-scans only missing buckets."""
    from assetdatavalidationtool_spark.datagen import generate_images
    from assetdatavalidationtool_spark.manifest import rule_is_bucket_aligned
    from assetdatavalidationtool_spark.rules import RuleContext
    from assetdatavalidationtool_spark.rules.header import HeaderConsistencyRule

    images = generate_images(spark, 40)
    # tamper the METADATA (payload headers stay true): every 7th id
    # gets a wrong width, every 11th a wrong format label
    k = F.regexp_extract("image_id", r"(\d+)$", 1).cast("long")
    tampered = images.withColumn(
        "w", F.when(k % 7 == 3, F.col("w") + 5).otherwise(F.col("w"))
    ).withColumn(
        "fmt",
        F.when(k % 11 == 4, F.lit("tiff")).otherwise(F.col("fmt")),
    )
    ctx = RuleContext(spark=spark, images=tampered, captions=None, num_buckets=8)
    rule = HeaderConsistencyRule()
    assert rule_is_bucket_aligned(rule, ctx)
    got = {r["key"]: r for r in rule.violations(ctx).collect()}
    expected_dims = {f"img_{i:012d}" for i in range(40) if i % 7 == 3 and i % 11 != 4}
    expected_fmt = {f"img_{i:012d}" for i in range(40) if i % 11 == 4}
    assert set(got) == expected_dims | expected_fmt
    for key in expected_fmt:
        assert got[key]["column"] == "fmt"
        assert got[key]["detail"] == "header: format_mismatch"
    for key in expected_dims:
        assert got[key]["column"] == "w,h"
        assert got[key]["detail"] == "header: dims_mismatch"
    assert all(r["rule"] == "header_consistency" and r["bucket"] is not None
               for r in got.values())
