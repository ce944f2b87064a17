"""[EXTENSION] Multimodal column plumbing: image/audio/video as opaque
``binary`` columns with typed metadata.

The Spark-side machinery — schema, partition-preserving mapInPandas, Arrow
batch shape, deterministic outputs — is real and tested. The actual codec
work is STUBBED: the container has no image/audio libraries, so decode
functions run a clearly-marked deterministic fake unless PIL/soundfile import
succeeds (import-try gate). Swap the inner function for a real decoder on a
cluster with the libs installed; the Spark plumbing does not change.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image|audio|video
    T.StructField("content", T.BinaryType(), True),       # opaque bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])

_FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, sha bigint, "
    "feature array<float>, decoded boolean"
)


def _crc32(content: bytes) -> int:
    """Deterministic content id (Python hash() is salted per process)."""
    import zlib

    return zlib.crc32(content) & 0x7FFFFFFF


def _try_real_image_decode(content: bytes):
    """Real decode when PIL exists; None otherwise (import-try gate)."""
    try:
        import io

        from PIL import Image  # noqa: F401

        return Image.open(io.BytesIO(content))
    except Exception:
        return None


def _fake_feature(content: bytes, dims: int = 8) -> list[float]:
    """DETERMINISTIC FAKE feature vector (stub for a real extractor): byte
    histogram moments seeded by content. Stable across runs and partitions."""
    if not content:
        return [0.0] * dims
    acc = []
    n = len(content)
    for d in range(dims):
        s = sum(content[d::dims][:256]) if n > d else 0
        acc.append(float(s % 997) / 997.0)
    return acc


def synthetic_media(spark, n: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic fake media table for tests (no codec libs in env)."""
    rows = []
    for i in range(n):
        content = bytes((i * 31 + j * 7) % 256 for j in range(128 + i))
        rows.append((i, kind, content, f"{kind}/fake", 64, 64, 1000 + i))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode + featurize media via mapInPandas (Arrow-batched; one Python
    worker pass per partition — the pattern a real decoder would use).

    The decode step is STUBBED with a deterministic fake when codec libs are
    absent; the schema contract and batch shape are production-real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["content"].map(
                    lambda b: len(b) if b is not None else 0
                ),
                "sha": pdf["content"].map(
                    lambda b: _crc32(bytes(b)) if b is not None else 0
                ),
                "feature": pdf["content"].map(
                    lambda b: _fake_feature(bytes(b)) if b is not None else []
                ),
                "decoded": pdf["content"].map(
                    lambda b: _try_real_image_decode(bytes(b)) is not None
                    if b is not None else False
                ),
            })
            yield out

    return df.mapInPandas(run, schema=_FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stub: real implementation requires PIL (NotImplementedError
    raised lazily per-batch when absent). Plumbing (schema/partitioning) is
    the production shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if _try_real_image_decode(b"") is None and len(pdf):
                raise NotImplementedError(
                    "image resize requires PIL; not available in this "
                    "container — plumbing tested via extract_features"
                )
            yield pdf.assign(width=width, height=height)

    return df.mapInPandas(run, schema=df.schema)


def tile_images(df: DataFrame, tile: int = 32) -> DataFrame:
    """Image tiling plumbing: emit (media_id, tile_x, tile_y, x0, y0, x1, y1)
    per tile from width/height metadata — the coordinate plan a real
    patch-extraction UDF consumes. Pure sequence+explode; no Python."""
    nx = F.expr(f"CAST(ceil(width / {tile}.0) AS INT)")
    ny = F.expr(f"CAST(ceil(height / {tile}.0) AS INT)")
    return (
        df.where(F.col("kind") == "image")
        .select(
            "media_id", "width", "height",
            F.explode(F.expr(
                f"flatten(transform(sequence(0, CAST(ceil(width / {tile}.0) AS INT) - 1),"
                f" tx -> transform(sequence(0, CAST(ceil(height / {tile}.0) AS INT) - 1),"
                f" ty -> named_struct('tx', tx, 'ty', ty))))"
            )).alias("t"),
        )
        .select(
            "media_id",
            F.col("t.tx").alias("tile_x"),
            F.col("t.ty").alias("tile_y"),
            (F.col("t.tx") * tile).alias("x0"),
            (F.col("t.ty") * tile).alias("y0"),
            F.least(F.col("t.tx") * tile + tile, F.col("width")).alias("x1"),
            F.least(F.col("t.ty") * tile + tile, F.col("height")).alias("y1"),
        )
    )


def chunk_audio(df: DataFrame, chunk_ms: int = 500,
                overlap_ms: int = 100) -> DataFrame:
    """Audio chunking plumbing: overlapping (start_ms, end_ms) windows from
    duration metadata — the segment plan a real resampler/AST model batch
    consumes. Stride = chunk - overlap; final partial chunk kept."""
    stride = chunk_ms - overlap_ms
    assert stride > 0, "overlap must be smaller than chunk"
    return (
        df.where(F.col("kind") == "audio")
        .select(
            "media_id", "duration_ms",
            F.explode(F.expr(
                f"sequence(0L, greatest(duration_ms - 1, 0L), {stride}L)"
            )).alias("start_ms"),
        )
        .select(
            "media_id", "start_ms",
            F.least(F.col("start_ms") + chunk_ms,
                    F.col("duration_ms")).alias("end_ms"),
        )
    )


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: emits (media_id, frame_ts_ms)
    per sampled frame, computed from duration metadata — the real decoder
    would additionally attach frame bytes. JVM-side explode; no Python."""
    return (
        df.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.expr(f"sequence(0L, duration_ms, {int(every_ms)}L)")
            ).alias("frame_ts_ms"),
        )
    )
