"""Streaming validation: incremental file-source micro-batches with
exactly-once resume from the streaming checkpoint."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from assetdatavalidationtool_spark.datagen import generate_images
from assetdatavalidationtool_spark.rules import RowInvariantRule, UniquenessRule
from assetdatavalidationtool_spark.streaming import (
    stream_validate,
    windowed_event_counts,
)

N1, N2, BAD = 60, 40, 5


def test_stream_validate_incremental(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    inp, out, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")

    # chunk 1 lands: 60 images, 5 with corrupt pixels
    generate_images(spark, N1, partitions=2, bad_pixel_ids=BAD).write.mode(
        "append"
    ).parquet(inp)
    stream_validate(spark, inp, out, [RowInvariantRule()], ckpt, num_buckets=8)
    vio1 = spark.read.parquet(f"{out}/violations")
    assert vio1.count() == BAD

    # re-run with NO new data: checkpoint prevents re-processing
    stream_validate(spark, inp, out, [RowInvariantRule()], ckpt, num_buckets=8)
    assert spark.read.parquet(f"{out}/violations").count() == BAD

    # chunk 2 lands: 40 clean images (ids shifted → no new violations)
    generate_images(spark, N2, partitions=2).withColumn(
        "image_id", F.concat(F.lit("b_"), F.col("image_id"))
    ).write.mode("append").parquet(inp)
    stream_validate(spark, inp, out, [RowInvariantRule()], ckpt, num_buckets=8)
    vio2 = spark.read.parquet(f"{out}/violations")
    # the b_ prefix breaks id→render regeneration? No: row_invariant
    # parses the trailing int; prefix keeps the index digits intact.
    assert vio2.count() == BAD  # no duplicates, no new violations

    verd = spark.read.parquet(f"{out}/verdicts")
    rows = verd.agg(F.sum("rows_scanned")).collect()[0][0]
    assert rows == N1 + N2


def test_windowed_event_counts_batch_parity(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = windowed_event_counts(ev, window="1 hour")
    exp = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0


def test_windowed_streaming_mode(spark, tmp_path_factory):
    """Drive the same aggregation through an actual streaming query
    (memory sink, availableNow)."""
    src = str(tmp_path_factory.mktemp("evstream"))
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    agg = windowed_event_counts(stream, window="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("winagg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT count(*) FROM winagg").collect()[0][0]
    exp = windowed_event_counts(ev, window="1 hour").count()
    assert got == exp


def test_stream_replay_is_idempotent(spark, tmp_path_factory):
    """foreachBatch is at-least-once: a crash between the sink write and
    the checkpoint commit re-runs the same batch_id on restart. The sink
    write is a dynamic overwrite of that batch's partition, so a replay
    rewrites rather than duplicates — simulated here by re-processing
    identical input under a fresh checkpoint (same batch_id 0)."""
    base = tmp_path_factory.mktemp("replay")
    inp, out = str(base / "in"), str(base / "out")
    generate_images(spark, 30, partitions=2, bad_pixel_ids=4).write.mode(
        "append"
    ).parquet(inp)

    stream_validate(spark, inp, out, [RowInvariantRule()], str(base / "ck1"), num_buckets=8)
    first_vio = spark.read.parquet(f"{out}/violations").count()
    first_scanned = (
        spark.read.parquet(f"{out}/verdicts").agg(F.sum("rows_scanned")).collect()[0][0]
    )
    assert first_vio == 4

    # replay of batch 0 (lost checkpoint): partitions overwritten in place
    stream_validate(spark, inp, out, [RowInvariantRule()], str(base / "ck2"), num_buckets=8)
    assert spark.read.parquet(f"{out}/violations").count() == first_vio
    assert (
        spark.read.parquet(f"{out}/verdicts").agg(F.sum("rows_scanned")).collect()[0][0]
        == first_scanned
    )
