"""Multimodal column operators: images/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing is real and tested: schemas, Arrow-batched
``mapInPandas`` signatures, partitioning/projection discipline (bytes
never cross a shuffle — derive features in the scan stage, project the
binary column away immediately after).

Codec reality in this container: pure-stdlib codecs throughout — PNG
(real), deterministic stub lossy (JPEG/WebP shape), WAV/PCM16 (real),
Y4M raw video (real). Formats that require native libraries (true
JPEG/WebP, mp3/flac, h264/vp9) degrade per row to ``decode_ok=false``
behind the same batch interface, so swapping in Pillow/libjpeg/ffmpeg
changes one function, not the dataflow.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("decoded_w", T.IntegerType(), True),
        T.StructField("decoded_h", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
        T.StructField("contrast", T.DoubleType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def _image_feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from assetdatavalidationtool_spark.codecs import decode_image

    for pdf in batches:
        out = []
        for image_id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
            try:
                img = decode_image(bytes(data), fmt).astype(np.float64)
                h, w = img.shape[:2]
                means = img.mean(axis=(0, 1))
                out.append(
                    {
                        "image_id": image_id,
                        "decoded_w": w,
                        "decoded_h": h,
                        "mean_r": float(means[0]),
                        "mean_g": float(means[1]),
                        "mean_b": float(means[2]),
                        "contrast": float(img.std()),
                        "decode_ok": True,
                    }
                )
            except Exception:
                out.append(
                    {
                        "image_id": image_id,
                        "decoded_w": None,
                        "decoded_h": None,
                        "mean_r": None,
                        "mean_g": None,
                        "mean_b": None,
                        "contrast": None,
                        "decode_ok": False,
                    }
                )
        yield pd.DataFrame(out, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])


def image_features(images: DataFrame) -> DataFrame:
    """Decode + feature-extract per image, Arrow-batched; bytes consumed
    in the scan stage and never shuffled."""
    return images.select("image_id", "bytes", "fmt").mapInPandas(
        _image_feature_batches, IMAGE_FEATURES_SCHEMA
    )


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize (real, numpy strided sampling) →
    (image_id, bytes) re-encoded in the original format. Demonstrates a
    bytes-in/bytes-out map stage; a production kernel (bilinear/lanczos)
    plugs into the same batch function."""
    from pyspark.sql import types as TT

    schema = TT.StructType(
        [
            TT.StructField("image_id", TT.StringType(), False),
            TT.StructField("bytes", TT.BinaryType(), True),
            TT.StructField("fmt", TT.StringType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from assetdatavalidationtool_spark.codecs import decode_image, encode_image

        for pdf in it:
            rows = []
            for image_id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    img = decode_image(bytes(data), fmt)
                    h, w = img.shape[:2]
                    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                    resized = img[yi][:, xi]
                    rows.append(
                        {"image_id": image_id, "bytes": encode_image(resized, fmt), "fmt": fmt}
                    )
                except Exception:
                    rows.append({"image_id": image_id, "bytes": None, "fmt": fmt})
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "fmt"])

    return images.select("image_id", "bytes", "fmt").mapInPandas(batches, schema)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_sec", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("peak", T.IntegerType(), True),
        T.StructField("zero_cross_rate", T.DoubleType(), True),
        T.StructField("clip_frac", T.DoubleType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def _audio_feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from assetdatavalidationtool_spark.codecs import decode_wav

    cols = [f.name for f in AUDIO_FEATURES_SCHEMA.fields]
    for pdf in batches:
        out = []
        for clip_id, data in zip(pdf["clip_id"], pdf["bytes"]):
            try:
                samples, sr = decode_wav(bytes(data))
                mono = samples.mean(axis=1) if samples.shape[1] > 1 else samples[:, 0].astype(np.float64)
                n = len(mono)
                rms = float(np.sqrt(np.mean(mono.astype(np.float64) ** 2))) if n else 0.0
                zc = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
                # abs on widened int32: np.abs(int16 -32768) wraps back to
                # -32768, hiding negative-rail clipping and corrupting peak.
                abs_samples = np.abs(samples.astype(np.int32))
                clip_frac = float(np.mean(abs_samples >= 32767)) if n else 0.0
                out.append(
                    {
                        "clip_id": clip_id,
                        "sample_rate": sr,
                        "n_samples": n,
                        "duration_sec": round(n / sr, 6) if sr else None,
                        "rms": round(rms, 4),
                        "peak": int(abs_samples.max()) if n else 0,
                        "zero_cross_rate": round(zc, 6),
                        "clip_frac": round(clip_frac, 6),
                        "decode_ok": True,
                    }
                )
            except Exception:
                out.append(
                    {
                        "clip_id": clip_id, "sample_rate": None, "n_samples": None,
                        "duration_sec": None, "rms": None, "peak": None,
                        "zero_cross_rate": None, "clip_frac": None, "decode_ok": False,
                    }
                )
        yield pd.DataFrame(out, columns=cols)


def audio_features(clips: DataFrame, id_col: str = "clip_id", bytes_col: str = "bytes") -> DataFrame:
    """REAL audio decode + features for WAV (RIFF PCM16 — pure-stdlib
    codec, ``codecs.decode_wav``): sample counts, duration, RMS, peak,
    zero-crossing rate, clipping fraction. Arrow-batched; bytes consumed
    in the scan stage, never shuffled (same discipline as
    ``image_features``). Non-WAV payloads (mp3/flac/ogg need codec
    libraries absent from this container) come back ``decode_ok=False``
    per row — wire soundfile/ffmpeg into ``_audio_feature_batches`` to
    extend coverage without touching the dataflow."""
    return clips.select(
        F.col(id_col).alias("clip_id"), F.col(bytes_col).alias("bytes")
    ).mapInPandas(_audio_feature_batches, AUDIO_FEATURES_SCHEMA)


VIDEO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("fps", T.IntegerType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def _video_frame_batches(every_n: int):
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from assetdatavalidationtool_spark.codecs import decode_y4m, encode_png

        cols = [f.name for f in VIDEO_FRAMES_SCHEMA.fields]
        for pdf in it:
            rows = []
            for video_id, data in zip(pdf["video_id"], pdf["bytes"]):
                try:
                    frames, fps = decode_y4m(bytes(data))
                    for idx in range(0, len(frames), every_n):
                        rows.append(
                            {
                                "video_id": video_id,
                                "frame_idx": idx,
                                "frame_bytes": encode_png(frames[idx]),
                                "n_frames": len(frames),
                                "fps": fps,
                                "decode_ok": True,
                            }
                        )
                except Exception:
                    # compressed codecs (h264/vp9 need ffmpeg, absent
                    # here) and corrupt payloads degrade PER ROW — one
                    # sentinel row, job keeps running (same discipline
                    # as audio_features)
                    rows.append(
                        {
                            "video_id": video_id, "frame_idx": -1,
                            "frame_bytes": None, "n_frames": None,
                            "fps": None, "decode_ok": False,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return batches


def sample_video_frames(videos: DataFrame, every_n: int = 30) -> DataFrame:
    """REAL frame sampling for Y4M (YUV4MPEG2 — pure-stdlib codec,
    ``codecs.decode_y4m``, C444/C420): every ``every_n``-th frame
    re-encoded as PNG → (video_id, frame_idx, frame_bytes, n_frames,
    fps, decode_ok). Arrow-batched ``mapInPandas``; video bytes are
    consumed in the scan stage and never shuffled — only the (much
    smaller) sampled frames flow downstream, where ``image_features``
    / pixel rules consume them. Compressed containers degrade
    ``decode_ok=false`` per row; wire ffmpeg into
    ``_video_frame_batches`` to extend coverage without touching the
    dataflow."""
    return videos.select("video_id", "bytes").mapInPandas(
        _video_frame_batches(every_n), VIDEO_FRAMES_SCHEMA
    )
