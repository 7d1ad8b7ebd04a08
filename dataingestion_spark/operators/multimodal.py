"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs over
mapInPandas.

The Spark-side machinery - schemas, batch iteration, partition sizing, UDF
signatures - is real and tested; the actual media decoding is STUBBED
(`NotImplementedError` behind `decoder=`) because no image/audio libraries
ship in this container. Swap `fake_image_decoder` for a real one (PIL,
torchaudio, pyav...) without touching any Spark code.

Scale notes: mapInPandas streams Arrow record batches - memory is bounded
by spark.sql.execution.arrow.maxRecordsPerBatch regardless of blob sizes;
binary payloads never pass through Python row objects. Repartition by a
size-aware key before heavy decodes so one task doesn't collect all large
blobs.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def real_image_decoder(content: bytes) -> np.ndarray:  # pragma: no cover
    """Real decoder behind a guarded optional import: when Pillow is
    installed this decodes for real (a user with media libs gets working
    decode with zero code change); otherwise it raises the documented
    NotImplementedError. Not exercisable in this container (no media
    libs) - the pipeline wiring is exercised with fake_image_decoder."""
    try:
        from PIL import Image  # optional dependency, absent here
    except ImportError:
        raise NotImplementedError(
            "media decoding libraries are not installed in this "
            "environment; install Pillow to enable real_image_decoder "
            "(or inject your own decoder callable)"
        ) from None
    import io

    img = Image.open(io.BytesIO(content))
    return np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0


def fake_image_decoder(content: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: derives a fixed-shape float array
    from the bytes so the full Arrow/mapInPandas path is testable."""
    arr = np.frombuffer(content[:64].ljust(64, b"\0"), dtype=np.uint8)
    return (arr.astype(np.float32) / 255.0).reshape(8, 8)


def extract_features(
    df: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = real_image_decoder,
    feature_dim: int = 16,
) -> DataFrame:
    """Decode + pool each blob into a fixed-size feature vector via
    mapInPandas (Arrow batches; bytes never cross as Python rows).
    fan_out guards scan parallelism: decode is the CPU-dense step, and a
    one-file corpus would otherwise decode on a single core."""
    from dataingestion_spark.operators.parallel import fan_out

    df = fan_out(df)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for content in pdf["content"]:
                if content is None:
                    feats.append(None)
                    continue
                img = decoder(bytes(content))
                flat = img.reshape(-1)
                pooled = np.resize(flat, feature_dim).astype(np.float32)
                feats.append(pooled.tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "feature": feats,
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def media_stats(df: DataFrame) -> DataFrame:
    """Pure-column metadata aggregation (no decode): per kind/mime counts,
    byte volume, avg dimensions - the triage query before scheduling
    expensive decodes."""
    return df.groupBy("kind", "mime").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("content")).alias("total_bytes"),
        F.avg("width").alias("avg_width"),
        F.avg("height").alias("avg_height"),
        F.avg("duration_ms").alias("avg_duration_ms"),
    )


def gen_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (binary payload derived from the
    id) for tests/benches - no external data.

    ``kind`` and ``content`` are derived through md5 (not engine-private
    hashes) so any SQL engine can replay them - that is what lets the
    driver's DuckDB oracle verify the mapInPandas feature path end-to-end
    (__spark_entry__.oracle_sql()['media_features'])."""
    kind_hash = F.conv(
        F.substring(F.md5(F.format_string("kind:%d:%d", F.lit(seed), F.col("id"))), 1, 15),
        16,
        10,
    ).cast("long")
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(kind_hash, F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.to_binary(
            F.repeat(F.md5(F.concat(F.lit("blob"), F.col("id"))), 4), F.lit("hex")
        ).alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        (F.pmod(F.xxhash64("id", F.lit(seed), F.lit(1)), F.lit(1920)) + 1)
        .cast("int")
        .alias("width"),
        (F.pmod(F.xxhash64("id", F.lit(seed), F.lit(2)), F.lit(1080)) + 1)
        .cast("int")
        .alias("height"),
        F.pmod(F.xxhash64("id", F.lit(seed), F.lit(3)), F.lit(60000)).alias(
            "duration_ms"
        ),
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("pixels", T.ArrayType(T.FloatType())),
    ]
)


def resize_images(
    df: DataFrame,
    out_h: int = 4,
    out_w: int = 4,
    decoder: Callable[[bytes], np.ndarray] = real_image_decoder,
) -> DataFrame:
    """Decode + nearest-neighbor resize to (out_h, out_w), emitting the
    resized pixel grid as a flat float array - the thumbnail/normalize
    step before a vision model. The RESIZE MATH IS REAL (index-sampling
    nearest neighbor over whatever array the decoder returns); only the
    decode behind ``decoder`` is environment-dependent, same contract as
    extract_features. Arrow-batched mapInPandas; blobs never cross as
    Python rows."""
    from dataingestion_spark.operators.parallel import fan_out

    df = fan_out(df)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for content in pdf["content"]:
                if content is None:
                    out.append(None)
                    continue
                img = decoder(bytes(content))
                h, w = img.shape[:2]
                rows = (np.arange(out_h) * h) // out_h
                cols = (np.arange(out_w) * w) // out_w
                out.append(
                    img[np.ix_(rows, cols)].astype(np.float32).reshape(-1).tolist()
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_h": out_h,
                    "out_w": out_w,
                    "pixels": out,
                }
            )

    return df.mapInPandas(batches, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def fake_frame_extractor(content: bytes, idx: int) -> bytes:
    """Deterministic stand-in for a video frame grab: a 16-byte window
    into the blob at a stride-8 offset (wrapping). Lets the 1->N Arrow
    fan-out be tested and SQL-replayed without a video decoder."""
    if not content:
        return b""
    off = (idx * 8) % len(content)
    window = (content * 2)[off:off + 16]
    return bytes(window)


def sample_frames(
    df: DataFrame,
    frame_ms: int = 1000,
    max_frames: int = 32,
    extractor: Callable[[bytes, int], bytes] = fake_frame_extractor,
) -> DataFrame:
    """Sample frames from video rows at a fixed cadence: one output row
    per (media, frame) with its timestamp - the 1->N explode shape a
    video ingest needs (a real deployment injects a pyav/ffmpeg-backed
    ``extractor``; the Spark plumbing is identical). Non-video rows are
    filtered out; a video emits ceil(duration_ms / frame_ms) frames,
    capped at ``max_frames``, minimum 1. Arrow-batched mapInPandas with
    a variable-length output batch per input batch."""
    from dataingestion_spark.operators.parallel import fan_out

    df = fan_out(df.filter(F.col("kind") == "video"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, tss, frames = [], [], [], []
            for mid, content, dur in zip(
                pdf["media_id"], pdf["content"], pdf["duration_ms"]
            ):
                if content is None:
                    continue
                dur = int(dur) if dur is not None and not pd.isna(dur) else 0
                n = min(max(-(-dur // frame_ms), 1), max_frames)
                for f in range(n):
                    ids.append(mid)
                    idxs.append(f)
                    tss.append(f * frame_ms)
                    frames.append(extractor(bytes(content), f))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "ts_ms": tss, "frame": frames}
            )

    return df.mapInPandas(batches, FRAME_SCHEMA)
