"""VideoInvariantRule — per-row video invariant (the Y4M analog of
RowInvariantRule's pixel check, completing the multimodal rule triad:
pixels / audio samples / video frames).

Validates a videos table ``(video_id, bytes, n_frames, fps)``: decode
the Y4M container per row in an Arrow batch, check declared metadata
against the parsed header, and compare SAMPLED frames against the
deterministic reference rendering (``datagen.render_video`` is a pure
function of video_id, regenerated on the executor). Frame comparison
gates at PSNR >= 25 dB (``PSNR_GATE_DB``), NOT the 40 dB gate the
input_hint prescribes for lossy *images* (that gate lives in
RowInvariantRule): the C444 round trip is ±1/channel (>50 dB), but
C420 chroma subsampling is legitimate encoding loss that lands
~30-40 dB on smooth content and can dip below 40 on sharp edges,
while a corrupted or wrong-content frame falls far below 25. Sampling every
``check_every_n``-th frame keeps per-row cost bounded — at 10^12 rows
nobody re-verifies every frame of every clip; the invariant is a
statistical gate, and the stride is deterministic so violations are
reproducible.

Execution shape: ``mapInPandas`` in the scan stage — video bytes are
decoded where they are read and never enter a shuffle; the UDF output
is a few flags per row. Run with ``RuleContext(images=videos_df,
key_col="video_id")``.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .base import Rule, RuleContext

VIDEO_CHECK_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("meta_ok", T.BooleanType(), True),
        T.StructField("frames_ok", T.BooleanType(), True),
        T.StructField("min_psnr_db", T.DoubleType(), True),
    ]
)

# Sampled-frame gate. Deliberately below the 40 dB image gate
# (row_invariant.py): C420 chroma averaging is legitimate encoding
# loss on video frames; 25 dB separates encoding loss from corruption.
PSNR_GATE_DB = 25.0


def _video_check_batches(check_every_n: int):
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from assetdatavalidationtool_spark.codecs import decode_y4m
        from assetdatavalidationtool_spark.datagen import render_video

        for pdf in it:
            n = len(pdf)
            ids = pdf["video_id"].tolist()
            decode_ok = np.zeros(n, dtype=bool)
            meta_ok = np.zeros(n, dtype=object)
            frames_ok = np.zeros(n, dtype=object)
            min_psnr = np.full(n, np.nan)
            for j in range(n):
                try:
                    frames, fps = decode_y4m(bytes(pdf["bytes"].iat[j]))
                    decode_ok[j] = True
                except Exception:
                    meta_ok[j] = None
                    frames_ok[j] = None
                    continue
                meta_ok[j] = bool(
                    len(frames) == pdf["n_frames"].iat[j]
                    and fps == pdf["fps"].iat[j]
                )
                if not frames:
                    frames_ok[j] = False
                    continue
                try:
                    # render_video parses the numeric suffix of
                    # video_id; a decodable row with an unexpected id
                    # must degrade to a per-row violation, not fail
                    # the Spark task.
                    h, w = frames[0].shape[:2]
                    ref = render_video(ids[j], len(frames), w, h).astype(
                        np.float64
                    )
                    worst = float("inf")
                    for idx in range(0, len(frames), check_every_n):
                        got = frames[idx].astype(np.float64)
                        if got.shape != ref[idx].shape:
                            worst = -1.0
                            break
                        mse = ((got - ref[idx]) ** 2).mean()
                        p = (
                            999.0
                            if mse == 0
                            else 10 * np.log10(255.0**2 / mse)
                        )
                        worst = min(worst, p)
                    min_psnr[j] = (
                        -1.0 if worst == float("inf") else round(worst, 2)
                    )
                    frames_ok[j] = bool(worst >= PSNR_GATE_DB)
                except Exception:
                    frames_ok[j] = False
            yield pd.DataFrame(
                {
                    "video_id": ids,
                    "decode_ok": decode_ok,
                    "meta_ok": meta_ok,
                    "frames_ok": frames_ok,
                    "min_psnr_db": min_psnr,
                }
            )

    return batches


@dataclass
class VideoInvariantRule(Rule):
    check_every_n: int = 4
    name: str = "video_invariant"

    def checks(self, ctx: RuleContext) -> DataFrame:
        cols = ["video_id", "bytes", "n_frames", "fps"]
        return ctx.images.select(*cols).mapInPandas(
            _video_check_batches(self.check_every_n), VIDEO_CHECK_SCHEMA
        )

    def violations(self, ctx: RuleContext) -> DataFrame:
        checks = self.checks(ctx)
        fails = F.array_compact(
            F.array(
                F.when(
                    ~F.col("decode_ok"),
                    F.struct(
                        F.lit("bytes").alias("column"),
                        F.lit("video decode failed").alias("detail"),
                    ),
                ),
                F.when(
                    F.col("decode_ok") & ~F.col("meta_ok"),
                    F.struct(
                        F.lit("n_frames,fps").alias("column"),
                        F.lit("declared metadata != decoded").alias("detail"),
                    ),
                ),
                F.when(
                    F.col("decode_ok") & ~F.col("frames_ok"),
                    F.struct(
                        F.lit("bytes").alias("column"),
                        F.concat(
                            F.lit("frame mismatch min_psnr="),
                            # null when the reference render itself
                            # failed (e.g. unparseable video_id)
                            F.coalesce(
                                F.col("min_psnr_db").cast("string"),
                                F.lit("n/a"),
                            ),
                        ).alias("detail"),
                    ),
                ),
            )
        )
        return checks.select(F.col("video_id"), F.explode(fails).alias("f")).select(
            F.lit(self.name).alias("rule"),
            F.col("video_id").alias("key"),
            F.col("f.column").alias("column"),
            F.col("f.detail").alias("detail"),
            ctx.bucket_of(F.col("video_id")).alias("bucket"),
        )
