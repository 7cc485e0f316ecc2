#!/usr/bin/env python3
"""spark-submit entry point for a resumable validation run.

    zip -r engine.zip assetdatavalidationtool_spark
    spark-submit --py-files engine.zip run_validation.py \
        --images s3://bucket/images --captions s3://bucket/captions \
        --output s3://bucket/validation_out --run-id 2026-08-16 \
        --num-buckets 4096

Re-running the same command after a failure resumes from the manifest
(completed buckets are skipped; partial partitions are overwritten
idempotently). On this sandbox, point --images/--captions at parquet
dirs produced by ``assetdatavalidationtool_spark.datagen``.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import functions as F

from assetdatavalidationtool_spark.manifest import ValidationRun
from assetdatavalidationtool_spark.rules import (
    AudioInvariantRule,
    DriftRule,
    HeaderConsistencyRule,
    ReferentialRule,
    RowInvariantRule,
    SchemaRule,
    MetadataGateRule,
    NearDuplicateRule,
    StatsRule,
    UniquenessRule,
    VideoInvariantRule,
)
from assetdatavalidationtool_spark.rules.schema import ColumnSpec
from assetdatavalidationtool_spark.session import get_spark


def default_rules(fmt_reference: dict[str, float]) -> list:
    return [
        SchemaRule(
            [
                ColumnSpec("image_id", "string", nullable=False),
                ColumnSpec("bytes", "binary", nullable=False),
                ColumnSpec("w", "int", nullable=False,
                           domain=(F.col("w") > 0) & (F.col("w") <= 4096)),
                ColumnSpec("h", "int", nullable=False,
                           domain=(F.col("h") > 0) & (F.col("h") <= 4096)),
                ColumnSpec("fmt", "string", nullable=False,
                           domain=F.col("fmt").isin("png", "jpeg", "webp")),
                ColumnSpec("caption", "string", nullable=False),
                ColumnSpec("phash", "bigint", nullable=False),
            ]
        ),
        MetadataGateRule(max_side=4096),
        # decode-free payload<->metadata screen: runs before any pixel
        # is decompressed, so a mislabeled/truncated payload is caught
        # at scan speed rather than as a decoder crash downstream
        HeaderConsistencyRule(),
        UniquenessRule(["image_id"]),
        UniquenessRule(["phash"], salted=True),
        NearDuplicateRule(),
        ReferentialRule(),
        RowInvariantRule(),
        StatsRule(columns=["w", "h", "fmt", "phash"]),
        DriftRule(column="fmt", kind="categorical", reference=fmt_reference),
    ]


def audio_rules() -> list:
    """Rule set for a WAV-clips table (clip_id, bytes, sample_rate,
    n_samples) — run with --modality audio --key-col clip_id."""
    return [
        SchemaRule(
            [
                ColumnSpec("clip_id", "string", nullable=False),
                ColumnSpec("bytes", "binary", nullable=False),
                ColumnSpec("sample_rate", "int", nullable=False,
                           domain=F.col("sample_rate").isin(8000, 16000, 22050, 44100, 48000)),
                ColumnSpec("n_samples", "int", nullable=False,
                           domain=F.col("n_samples") > 0),
            ]
        ),
        UniquenessRule(["clip_id"]),
        AudioInvariantRule(),
        StatsRule(columns=["sample_rate", "n_samples"]),
    ]


def video_rules() -> list:
    """Rule set for a Y4M-videos table (video_id, bytes, n_frames,
    fps) — run with --modality video --key-col video_id."""
    return [
        SchemaRule(
            [
                ColumnSpec("video_id", "string", nullable=False),
                ColumnSpec("bytes", "binary", nullable=False),
                ColumnSpec("n_frames", "int", nullable=False,
                           domain=F.col("n_frames") > 0),
                ColumnSpec("fps", "int", nullable=False,
                           domain=(F.col("fps") > 0) & (F.col("fps") <= 240)),
            ]
        ),
        UniquenessRule(["video_id"]),
        VideoInvariantRule(),
        StatsRule(columns=["n_frames", "fps"]),
    ]


def connector_sources(spark, cfg: dict) -> dict:
    """Build the {label: (DataFrame, key_col)} mapping from a
    --validate-connectors config: each source entry names a type
    (servicenow | graph | csv | parquet), its key column, and either
    live connection params or a ``replay`` file of recorded pages
    (sources/connectors.replay_transport) for offline re-validation."""
    from assetdatavalidationtool_spark.sources.asset_csv import read_asset_table
    from assetdatavalidationtool_spark.sources.connectors import (
        GraphConnector,
        ServiceNowConnector,
        replay_transport,
    )

    sources: dict = {}
    for s in cfg["sources"]:
        label, typ, key = s["label"], s["type"], s["key"]
        transport = replay_transport(s["replay"]) if s.get("replay") else None
        if typ == "servicenow":
            df = ServiceNowConnector(
                s["base_url"], s["table"], auth_token=s.get("auth_token"),
                page_size=s.get("page_size", 500), query=s.get("query"),
                fields=s.get("fields"), transport=transport,
            ).to_df(spark, label)
        elif typ == "graph":
            df = GraphConnector(
                s["base_url"], auth_token=s.get("auth_token"),
                select=s.get("select"), filter=s.get("filter"),
                page_size=s.get("page_size", 500), transport=transport,
            ).to_df(spark, label)
        elif typ == "csv":
            df = read_asset_table(spark, s["path"], order_column="_row")
        elif typ == "parquet":
            # physical file position, NOT monotonically_increasing_id():
            # the mono id numbers rows by partition layout, so a
            # re-read with different splits would pick a DIFFERENT
            # first-occurrence winner for duplicated keys between two
            # identical validations. (file_path, row_index) is the
            # same row forever.
            df = spark.read.parquet(s["path"]).withColumn(
                "_row",
                F.format_string(
                    "%s#%012d",
                    F.col("_metadata.file_path"),
                    F.col("_metadata.row_index"),
                ),
            )
        else:
            raise ValueError(f"unknown source type {typ!r} for {label!r}")
        sources[label] = (df, key)
    return sources


def run_connector_validation(args) -> None:
    """The MainForm workflow as a CLI mode: labeled sources (connectors
    and/or files) -> presence/conflicts suite -> report tables."""
    from assetdatavalidationtool_spark.validation import validate_sources

    with open(args.validate_connectors) as f:
        cfg = json.load(f)
    spark = get_spark(cores=args.cores, app_name="connector_validation")
    sources = connector_sources(spark, cfg)
    counts = validate_sources(
        spark, sources, args.output,
        order_col=cfg.get("order_col", "_row"),
        preview_limit=cfg.get("preview_limit", 100),
    )
    print(json.dumps({
        "mode": "validate_connectors",
        "sources": list(sources),
        **counts,
        "output": args.output,
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=False, default=None)
    ap.add_argument("--captions", default=None)
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", default="run_0")
    ap.add_argument("--num-buckets", type=int, default=256)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--fmt-reference", default='{"png":0.5,"jpeg":0.4,"webp":0.1}')
    ap.add_argument("--modality", choices=["image", "audio", "video"],
                    default="image",
                    help="table shape: image+caption (default), WAV clips, "
                    "or Y4M videos — picks the matching rule set")
    ap.add_argument("--key-col", default=None,
                    help="primary key column (defaults per modality)")
    ap.add_argument("--snapshot", default=None, metavar="COL:KIND[,COL:KIND...]",
                    help="after the run, record distribution snapshots of "
                    "these columns into this run's metrics layout (kinds: "
                    "numeric|categorical|phash_prefix) for future "
                    "--drift-from runs")
    ap.add_argument("--drift-from", default=None,
                    metavar="RUN_ID[:COL[:KIND]]",
                    help="use the snapshot of COL (default fmt) recorded by "
                    "that run in the same --output as the drift reference "
                    "(validate-against-last-known-good); binning spec is "
                    "read from the snapshot's metadata — KIND is only "
                    "needed (and required) for legacy snapshots that "
                    "predate the metadata rows")
    ap.add_argument("--canary", type=int, default=None, metavar="K",
                    help="canary pre-flight: run bucket-aligned rules on "
                    "buckets [0, K) only and defer global rules — a "
                    "K/num-buckets-cost check for systematic breakage; "
                    "the follow-up full run under the same --run-id "
                    "resumes past the canary's completed buckets")
    ap.add_argument("--incremental-from", default=None, metavar="RUN_ID",
                    help="incremental re-validation: compare per-bucket "
                    "input fingerprints against that base run (same "
                    "--output) and inherit its materialized violations/"
                    "verdicts for every unchanged bucket (manifest status "
                    "'inherited'); only changed buckets pay the full rule "
                    "pass. This run records its own fingerprints, so "
                    "incremental runs chain")
    ap.add_argument("--fingerprint", action="store_true",
                    help="record per-bucket input fingerprints for this "
                    "run so a later run can --incremental-from it "
                    "(implied by --incremental-from)")
    ap.add_argument("--fingerprint-no-bytes", action="store_true",
                    help="fingerprint only the metadata columns (a ~1000x "
                    "narrower scan that trusts payload edits to surface "
                    "in w/h/fmt/phash); base and incremental runs must "
                    "use the same mode")
    ap.add_argument("--compare-to", default=None, metavar="RUN_ID",
                    help="after the run, diff this run's per-(rule,bucket) "
                    "verdicts against that baseline run in the same "
                    "--output (regressed/improved/unchanged per "
                    "partition — no data rows re-read); the diff table "
                    "is written under OUTPUT/regressions/ and the "
                    "status counts are reported in the summary JSON")
    ap.add_argument("--split", action="store_true",
                    help="after the rule run, write the clean/quarantine "
                    "row split under OUTPUT/split/run_id=RUN_ID/ (one "
                    "scan, partitioned by status; no rule re-execution)")
    ap.add_argument("--expire-keep-last", type=int, default=None, metavar="N",
                    help="after the run, expire every run in OUTPUT except "
                    "the N most recent (tombstones their manifest entries, "
                    "deletes their data partitions; this run always "
                    "survives — it is the newest)")
    ap.add_argument("--validate-connectors", default=None, metavar="CONFIG.json",
                    help="run the cross-source asset-validation suite "
                    "(KeyPresence/MatchesAll/MissingByFile/Conflicts) over "
                    "the labeled sources in CONFIG instead of the "
                    "image-table rule set; sources may be REST connectors "
                    "(live or --replay page recordings), CSV, or parquet")
    args = ap.parse_args()

    if args.validate_connectors:
        run_connector_validation(args)
        return
    if not args.images:
        ap.error("--images is required (unless --validate-connectors)")

    spark = get_spark(cores=args.cores, app_name=f"validation_{args.run_id}")
    images = spark.read.parquet(args.images)
    captions = spark.read.parquet(args.captions) if args.captions else None

    if args.modality == "audio":
        rules, key_col = audio_rules(), args.key_col or "clip_id"
    elif args.modality == "video":
        rules, key_col = video_rules(), args.key_col or "video_id"
    else:
        extra_drift = None
        if args.drift_from:
            from assetdatavalidationtool_spark.rules.drift import (
                DriftRule,
                load_snapshot_spec,
            )

            parts = args.drift_from.split(":")
            run_ref = parts[0]
            drift_col = parts[1] if len(parts) > 1 and parts[1] else "fmt"
            legacy_kind = parts[2] if len(parts) > 2 and parts[2] else None
            ref, kind, lo, hi, bins = load_snapshot_spec(
                spark, args.output, run_ref, drift_col,
                legacy_kind=legacy_kind,
            )
            if drift_col == "fmt":
                fmt_ref = ref
            else:
                # non-fmt reference: keep the stock fmt drift rule and
                # ADD a drift check binned exactly like the snapshot
                fmt_ref = json.loads(args.fmt_reference)
                extra_drift = DriftRule(
                    column=drift_col, kind=kind, reference=ref,
                    lo=lo, hi=hi, bins=bins,
                )
        else:
            fmt_ref = json.loads(args.fmt_reference)
        rules = default_rules(fmt_ref)
        if extra_drift is not None:
            rules.append(extra_drift)
        key_col = args.key_col or "image_id"

    run = ValidationRun(
        spark, args.output, rules,
        num_buckets=args.num_buckets, run_id=args.run_id, key_col=key_col,
    )
    summary = run.run(
        images, captions, sample_buckets=args.canary,
        incremental_from=args.incremental_from,
        record_fingerprints=args.fingerprint,
        fingerprint_bytes=not args.fingerprint_no_bytes,
    )

    if args.snapshot:
        from assetdatavalidationtool_spark.rules.drift import (
            persist_snapshot,
            snapshot_reference,
        )

        for spec in args.snapshot.split(","):
            col, kind = spec.split(":")
            persist_snapshot(
                spark, snapshot_reference(images, col, kind),
                args.output, args.run_id, col, kind=kind,
            )

    split_path = run.split(images) if args.split else None

    expire_summary = None
    if args.expire_keep_last is not None:
        from assetdatavalidationtool_spark.manifest import expire_runs

        expire_summary = expire_runs(
            spark, args.output,
            keep_last=args.expire_keep_last,
            keep_run_ids=[args.run_id],
        )

    regression_counts = None
    if args.compare_to:
        from assetdatavalidationtool_spark.manifest import compare_runs

        diff = compare_runs(spark, args.output, args.compare_to, args.run_id)
        diff.write.mode("overwrite").parquet(
            f"{args.output.rstrip('/')}/regressions/"
            f"run_id={args.run_id}/vs={args.compare_to}"
        )
        regression_counts = {
            r["status"]: r["n"]
            for r in diff.groupBy("status").agg(F.count("*").alias("n")).collect()
        }

    verdicts = run.verdicts()
    failed = verdicts.where(~(F.col("violation_count") == 0)).count()
    total_vio = verdicts.agg(F.sum("violation_count")).collect()[0][0]
    out = {
        "run_id": args.run_id,
        **summary,
        "failed_partitions": failed,
        "total_violations": int(total_vio or 0),
        "output": args.output,
    }
    if split_path is not None:
        out["split"] = split_path
    if expire_summary is not None:
        out["expired_runs"] = expire_summary["expired"]
    if regression_counts is not None:
        out["regression_vs"] = args.compare_to
        out["regression_counts"] = regression_counts
    print(json.dumps(out))


if __name__ == "__main__":
    main()
