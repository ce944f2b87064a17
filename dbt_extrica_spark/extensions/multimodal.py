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


def synthetic_media_rows(n: int = 64, kind: str = "image",
                         near_dups: int = 0) -> list:
    """Deterministic fake media rows (closed formula — the same generator
    feeds the Spark table and the local ground-truth oracles). With
    ``near_dups`` > 0, the first ``near_dups`` rows get a near-duplicate
    twin at media_id + 1000 whose content differs in exactly one byte —
    planted positives for perceptual dedup."""
    rows = []
    for i in range(n):
        content = bytes((i * 31 + j * 7) % 256 for j in range(128 + i))
        rows.append((i, kind, content, f"{kind}/fake", 64, 64, 1000 + i))
    for i in range(min(near_dups, n)):
        content = bytearray(rows[i][2])
        content[0] = (content[0] + 1) % 256
        rows.append((i + 1000, kind, bytes(content), f"{kind}/fake",
                     64, 64, 1000 + i))
    return rows


def synthetic_media(spark, n: int = 64, kind: str = "image",
                    near_dups: int = 0) -> DataFrame:
    """Deterministic fake media table for tests (no codec libs in env)."""
    return spark.createDataFrame(
        synthetic_media_rows(n, kind, near_dups), MEDIA_SCHEMA)


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


# --------------------------------------------------------------------------
# Perceptual-hash (pHash) image dedup
# --------------------------------------------------------------------------

_PHASH_SIDE = 32     # decoded grayscale side before DCT
_PHASH_BLOCK = 8     # low-frequency block -> 64-bit hash


def _decode_gray(content: bytes, side: int = _PHASH_SIDE):
    """Grayscale pixel grid for hashing. Real path: PIL decode + resize
    (import-try gated). Stub path: the deterministic byte->pixel map —
    pixels read the content bytes cyclically, so a small byte edit moves
    few pixels and a near-duplicate stays perceptually near. Returns a
    float64 (side, side) array in [0, 1]."""
    import numpy as np

    img = _try_real_image_decode(content)
    if img is not None:
        img = img.convert("L").resize((side, side))
        return np.asarray(img, dtype=np.float64) / 255.0
    if not content:
        return np.zeros((side, side), dtype=np.float64)
    buf = np.frombuffer(content, dtype=np.uint8)
    idx = np.arange(side * side) % len(buf)
    return (buf[idx].astype(np.float64) / 255.0).reshape(side, side)


def _dct_matrix(side: int = _PHASH_SIDE):
    """Orthonormal DCT-II basis (the pHash transform), pure numpy."""
    import numpy as np

    k = np.arange(side)[:, None]
    n = np.arange(side)[None, :]
    d = np.cos(np.pi * k * (2 * n + 1) / (2 * side))
    d[0, :] *= np.sqrt(1.0 / side)
    d[1:, :] *= np.sqrt(2.0 / side)
    return d


def phash64(content: bytes) -> int:
    """Classic 64-bit perceptual hash: decode to grayscale, 2-D DCT, keep
    the top-left 8x8 low-frequency block, threshold each coefficient
    against the median of the 63 non-DC coefficients (strict >). The
    median of an odd count is an order statistic — no float averaging —
    so the hash is bit-deterministic wherever numpy is. Returns a SIGNED
    64-bit int (Spark BIGINT range)."""
    import numpy as np

    d = _dct_matrix()
    coefs = d @ _decode_gray(content) @ d.T
    block = coefs[:_PHASH_BLOCK, :_PHASH_BLOCK].reshape(-1)
    med = float(np.median(block[1:]))  # 63 values -> sorted[31], exact
    sig = 0
    for i, c in enumerate(block):
        if float(c) > med:
            sig |= 1 << i
    if sig >= 1 << 63:
        sig -= 1 << 64
    return sig


def phash_signatures(df: DataFrame) -> DataFrame:
    """Per-image perceptual hash via mapInPandas (Arrow-batched numpy —
    the same distribution shape as extract_features). Returns
    (media_id, phash bigint)."""

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "phash": pdf["content"].map(
                    lambda b: phash64(bytes(b)) if b is not None else 0
                ).astype("int64"),
            })

    return (
        df.where(F.col("kind") == "image")
        .select("media_id", "content")
        .mapInPandas(run, schema="media_id bigint, phash bigint")
    )


def phash_pairs(df: DataFrame, max_hamming: int = 6,
                chunks: int = 8) -> DataFrame:
    """Near-duplicate image pairs: perceptual hashes + the pigeonhole
    chunk-banding join shared with simhash (dedup.hamming_sig_pairs) —
    every pair within ``max_hamming`` shares one of ``chunks`` equal
    hash chunks, so candidates come from bucket joins, never all pairs.
    Returns (id_a, id_b, hamming). The 100 TB shape: one decode+hash scan,
    then banding on 64-bit keys — identical scaling to text simhash."""
    from . import dedup

    sigs = phash_signatures(df).select(
        F.col("media_id").alias("id"), F.col("phash").alias("sig"))
    return dedup.hamming_sig_pairs(sigs, max_hamming=max_hamming,
                                   chunks=chunks)
