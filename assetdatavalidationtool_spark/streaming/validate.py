"""Incremental validation over a file stream of image rows.

Shape: ``readStream`` (file source, schema pinned — no inference race)
→ ``foreachBatch`` running the *same* Rule objects as the batch engine
on each micro-batch → violations/verdicts parquet partitioned by
batch_id. foreachBatch itself is at-least-once (a crash between the
sink write and the checkpoint commit replays the batch on restart);
end-to-end effectively-once comes from making the batch write
IDEMPOTENT: each batch dynamically overwrites ONLY its own
``batch_id=N`` partition, so a replay rewrites the same rows instead
of appending duplicates.

Only bucket-aligned row-local rules belong here (schema, row-invariant,
per-batch uniqueness): global rules (drift, cross-table referential)
need either the batch engine or stateful streaming aggregation —
``windowed_event_counts`` shows the watermark + tumbling-window shape
used for streaming violation-rate monitoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datagen import IMAGES_SCHEMA
from ..rules.base import Rule, RuleContext


def stream_validate(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    rules: list[Rule],
    checkpoint_dir: str,
    num_buckets: int = 64,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Start (and by default drain) a validation stream over parquet
    files landing in ``input_dir``. Returns the StreamingQuery."""
    reader = spark.readStream.schema(IMAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        ctx = RuleContext(
            spark=spark,
            images=batch_df,
            captions=None,
            num_buckets=num_buckets,
            run_id=f"stream_batch_{batch_id}",
        )
        vio = None
        for rule in rules:
            v = rule.violations(ctx)
            vio = v if vio is None else vio.unionByName(v)
        if vio is None:
            return
        vio = vio.withColumn("batch_id", F.lit(batch_id)).persist()
        # idempotent replay: overwrite exactly this batch's partition
        (
            vio.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{output_dir}/violations")
        )
        verd = (
            ctx.with_bucket(batch_df.select(ctx.key_col))
            .groupBy("bucket")
            .agg(F.count("*").alias("rows_scanned"))
            .join(
                vio.groupBy(F.coalesce("bucket", F.lit(-1)).alias("bucket")).agg(
                    F.count("*").alias("violation_count")
                ),
                "bucket",
                "left_outer",
            )
            .select(
                F.lit(batch_id).alias("batch_id"),
                "bucket",
                "rows_scanned",
                F.coalesce("violation_count", F.lit(0)).alias("violation_count"),
                (F.coalesce("violation_count", F.lit(0)) == 0).alias("pass"),
            )
        )
        (
            verd.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{output_dir}/verdicts")
        )
        vio.unpersist()

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_col: str | None = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window aggregation — the standard late-data
    shape (readStream → withWatermark → window groupBy). Works on both
    a streaming and a batch DataFrame (used by tests and the batch
    oracle: ``event_hourly_windows``)."""
    df = events
    if df.isStreaming:
        # watermarks need TIMESTAMP (with tz); parquet often carries NTZ
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        df = df.withWatermark(ts_col, watermark)
    keys = [F.window(F.col(ts_col), window).alias("win")]
    if group_col:
        keys.append(F.col(group_col))
    return (
        df.groupBy(*keys)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            *([group_col] if group_col else []),
            "n_events",
            "total_value",
        )
    )
