"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata.

The Spark-side contract is real and tested — schema, Arrow batch shape,
partition sizing, UDF signatures; the actual media decoding is stubbed
behind ``DECODERS`` (the image/audio libraries are not available in this
environment) with a deterministic fake so the plumbing is verifiable
end-to-end. Swap a real decoder in by registering into ``DECODERS``.

Design rules for 100 TB of media:
- media bytes ride in a ``binary`` column next to typed metadata; never
  as millions of small files driven from the driver;
- ONLY the decode crosses into Python, as an Arrow-batched pandas UDF
  sized by ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a batch
  of decoded frames fits executor memory; everything the JVM can compute
  (byte length, content hash) stays in WholeStageCodegen;
- derived features (embeddings, thumbnails, frame samples) come back as
  ordinary columns so everything downstream is plain DataFrame code.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from etl_developstoday_test_spark.functions import fan_out

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("content_sha256", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def _fake_decode_features(content: bytes) -> list[float]:
    """Deterministic stand-in for a real decode→feature-extract step.

    Derives FEATURE_DIM floats in [0, 1) from the sha256 of the bytes —
    stable across processes/engines so tests can assert exact values.
    Replace with a real decoder (PIL/torchaudio/ffmpeg) via DECODERS.
    """
    digest = hashlib.sha256(content).digest()
    return [digest[i] / 256.0 for i in range(FEATURE_DIM)]


def _unavailable(kind: str) -> Callable[[bytes], list[float]]:
    def decode(content: bytes) -> list[float]:
        raise NotImplementedError(
            f"real {kind} decoding requires media libraries not present in "
            "this environment; register a decoder in multimodal.DECODERS"
        )

    return decode


# Media-type → decoder. The deterministic fake is the default so the
# distributed plumbing is exercised; real deployments override these.
DECODERS: dict[str, Callable[[bytes], list[float]]] = {
    "image": _fake_decode_features,
    "audio": _fake_decode_features,
    "video": _fake_decode_features,
    "image/real": _unavailable("image"),
    "audio/real": _unavailable("audio"),
    "video/real": _unavailable("video"),
}


def extract_features(media: DataFrame) -> DataFrame:
    """Decode + featurize every media row. Columns the JVM can compute
    stay in codegen (``F.length``, ``F.sha2`` — no Python); ONLY the
    decode itself crosses into Python, as an Arrow-batched pandas UDF
    whose per-row work is the decoder call (unavoidable for codecs).
    """

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def decode(media_type: pd.Series, content: pd.Series) -> pd.Series:
        return pd.Series(
            [
                DECODERS[mt](b if b is not None else b"")
                for mt, b in zip(media_type, content)
            ]
        )

    content = F.coalesce(F.col("content"), F.lit(b""))
    # cap=16: each partition spawns a Python worker (interpreter + pandas
    # import); for small batches worker startup dominates, and at real
    # scale the input is already wide so the cap never binds.
    return fan_out(media, cap=16).select(
        "media_id",
        "media_type",
        F.length(content).cast("long").alias("n_bytes"),
        F.sha2(content, 256).alias("content_sha256"),
        decode("media_type", "content").alias("feature"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Plan frame-sampling for video rows: one output row per sampled
    timestamp (the decode of the actual frame is the stubbed step).
    Pure DataFrame code — the expensive explode happens before decode so
    Spark parallelizes at frame granularity, not file granularity."""
    video = media.filter(F.col("media_type") == "video")
    n_frames = F.greatest(
        F.lit(1), (F.col("meta.duration_ms") / every_ms).cast("int")
    )
    return video.select(
        "media_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_"),
    ).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * every_ms).alias("frame_ts_ms"),
    )


def audio_window_plan(
    media: DataFrame, win_ms: int = 400, hop_ms: int = 200
) -> DataFrame:
    """Overlapping analysis-window plan for audio rows — the STFT
    framing geometry (librosa/torchaudio convention): windows of
    ``win_ms`` every ``hop_ms``; n = 1 + floor((dur − win)/hop) when
    the clip covers a full window, else one truncated window. The
    explode happens BEFORE decode so Spark parallelizes at window
    granularity, not clip granularity (same reasoning as
    frame_sample_plan — a 3-hour clip becomes ~54k parallel rows, not
    one straggler task).

    ``window_sha256`` (content + window bounds) is the deterministic
    JVM stand-in for the decoded-PCM window energy, exactly as
    resize_plan's thumb digest stands in for pixels; the real decoder
    plugs in through DECODERS over (content, start_ms, end_ms). Narrow
    map + in-row explode, zero shuffles."""
    audio = media.filter(F.col("media_type") == "audio")
    dur = F.col("meta.duration_ms")
    n = F.when(
        dur >= win_ms, ((dur - win_ms) / hop_ms).cast("int") + 1
    ).otherwise(F.lit(1))
    exploded = audio.select(
        "media_id",
        "content",
        dur.cast("long").alias("_dur"),
        F.posexplode(F.sequence(F.lit(0), n - 1)).alias("window_idx", "_"),
    )
    start = (F.col("window_idx") * hop_ms).cast("long")
    end = F.least(start + win_ms, F.col("_dur"))
    tag = F.concat_ws(":", start.cast("string"), end.cast("string"))
    return exploded.select(
        "media_id",
        F.col("window_idx").cast("long").alias("window_idx"),
        start.alias("start_ms"),
        end.alias("end_ms"),
        F.sha2(
            F.concat(F.col("content"), F.encode(tag, "UTF-8")), 256
        ).alias("window_sha256"),
    )


def resize_plan(media: DataFrame, max_w: int = 64, max_h: int = 64) -> DataFrame:
    """Thumbnail/resize planning for image rows: aspect-preserving fit
    of (meta.width, meta.height) into a max_w×max_h box.

    Everything *plannable* is JVM codegen — the target geometry
    (scale, thumb_w, thumb_h) and the deterministic thumb digest
    (sha256 of content + target dims, standing in for real pixels the
    same way extract_features' fake decoder does). The actual pixel
    resample is the one step that needs an image library: it plugs in
    through the same ``DECODERS``-style registry as decode, as an
    Arrow-batched ``mapInPandas`` over (content, thumb_w, thumb_h) —
    NOT implemented here because the environment has no codecs, and a
    fake would add nothing the digest doesn't already verify.

    Narrow map, zero shuffles; scales with the scan.
    """
    w = F.col("meta.width").cast("double")
    h = F.col("meta.height").cast("double")
    scale = F.least(F.lit(float(max_w)) / w, F.lit(float(max_h)) / h, F.lit(1.0))
    thumb_w = F.greatest(F.lit(1), F.floor(w * scale)).cast("int")
    thumb_h = F.greatest(F.lit(1), F.floor(h * scale)).cast("int")
    dims_tag = F.concat_ws(
        "x", thumb_w.cast("string"), thumb_h.cast("string")
    )
    return media.filter(F.col("media_type") == "image").select(
        "media_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        thumb_w.alias("thumb_w"),
        thumb_h.alias("thumb_h"),
        F.sha2(F.concat(F.col("content"), F.encode(dims_tag, "UTF-8")), 256).alias(
            "thumb_sha256"
        ),
    )


def frame_phash_dedup(
    media: DataFrame, every_ms: int = 1000, bucket_ms: int = 2000
) -> DataFrame:
    """Frame-level perceptual-hash dedup for video: sample frames
    (``frame_sample_plan``), decode each and compute a 60-bit
    perceptual hash in ONE Arrow-batched pandas UDF pass, then dedup
    frames by exact pHash — the standard near-dup collapse for video
    training data (consecutive/static frames and re-encoded copies
    share a pHash; one representative frame survives per hash).

    The decode+phash is the stubbed step (same contract as
    ``DECODERS``): the deterministic stand-in hashes
    sha256(content ‖ frame_ts_ms // bucket_ms), which makes adjacent
    frames inside one ``bucket_ms`` window collide exactly — a
    faithful stand-in for the temporal redundancy a real pHash
    collapses, and exactly replayable by a SQL oracle. A real
    deployment swaps in decode→DCT-pHash with the identical UDF
    signature (bytes, ts) → int64.

    Scale shape: the explode happens BEFORE Python so Spark
    parallelizes at frame granularity; the JVM keeps everything but the
    per-frame hash; dedup is one groupBy on (phash). Returns per-video
    (media_id, n_frames, n_distinct_frames, n_dup_frames).
    """
    video = media.filter(F.col("media_type") == "video")
    n_frames = F.greatest(
        F.lit(1), (F.col("meta.duration_ms") / every_ms).cast("int")
    )
    frames = video.select(
        "media_id",
        F.coalesce(F.col("content"), F.lit(b"")).alias("content"),
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias(
            "frame_idx", "_"
        ),
    ).select(
        "media_id",
        "content",
        (F.col("frame_idx") * every_ms).alias("frame_ts_ms"),
    )

    @F.pandas_udf(T.LongType())
    def phash(content: pd.Series, ts_bucket: pd.Series) -> pd.Series:
        return pd.Series(
            [
                int(
                    hashlib.sha256(
                        (b if b is not None else b"") + str(tb).encode()
                    ).hexdigest()[:15],
                    16,
                )
                for b, tb in zip(content, ts_bucket)
            ]
        )

    hashed = frames.select(
        "media_id",
        phash(
            "content", (F.col("frame_ts_ms") / bucket_ms).cast("long")
        ).alias("phash"),
    )
    return hashed.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.count_distinct("phash").alias("n_distinct_frames"),
        (F.count(F.lit(1)) - F.count_distinct("phash")).alias("n_dup_frames"),
    )
