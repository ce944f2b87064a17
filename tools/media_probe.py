"""Multimodal decode throughput probe: how fast do the pure-numpy
decoders move real bytes through mapInPandas at local[32]?

Generates N real encoded blobs per format (PPM / BMP / PNG / JPEG gray /
JPEG 4:2:0 color), runs decode_stats end-to-end (Arrow batches -> decode
-> pixel stats), and reports blobs/sec + MB/sec per format. The point is
scale posture, not micro-optimization: decode parallelizes per
partition, so cluster throughput = per-core rate x cores — these numbers
make that rate concrete.

Usage: python tools/media_probe.py [n_blobs] [side]
Defaults: 4000 blobs of 64x64.

`python tools/media_probe.py --chain [n] [side]` instead runs the
PRODUCTION SHAPE over a MIXED-format corpus: extract_features ->
resize_images -> phash_signatures chained, at 1x and 10x blob count,
plus 3 repeated 1x runs — the evidence that per-partition decode scales
flat with corpus size and that the stateless mapInPandas chain
accumulates nothing driver-side across repeats.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--chain"]
    chain = "--chain" in sys.argv[1:]
    n = int(argv[0]) if argv else (2_000 if chain else 4_000)
    side = int(argv[1]) if len(argv) > 1 else 64

    import numpy as np

    from dbt_extrica_spark.extensions import multimodal as mm
    from dbt_extrica_spark.extensions.gif import encode_gif
    from dbt_extrica_spark.extensions.jpeg import (
        encode_jpeg_blockmean, encode_jpeg_progressive_blockmean)
    from dbt_extrica_spark.session import get_spark

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    def pixels(i: int):
        y = np.arange(side)[:, None]
        x = np.arange(side)[None, :]
        r = (((x * 73) ^ (y * 151)) + i * 97) % 256
        g = (((x * 29) ^ (y * 47)) + i * 31) % 256
        b = (((x * 11) ^ (y * 199)) + i * 7) % 256
        return np.stack([r, g, b], axis=2).astype(np.uint8)

    def block16(i: int):
        g = side // 16
        y = np.arange(g)[:, None]
        x = np.arange(g)[None, :]
        px = np.stack([(((x * 73) ^ (y * 151)) + i * 97) % 256,
                       (((x * 29) ^ (y * 47)) + i * 31) % 256,
                       (((x * 11) ^ (y * 199)) + i * 7) % 256],
                      axis=2).astype(np.uint8)
        return np.repeat(np.repeat(px, 16, axis=0), 16, axis=1)

    def gif_px(i: int):
        # <=256 distinct colors: quantize the textured pattern to a
        # 6x6x6 color cube so any side stays palette-exact
        px = pixels(i)
        return (px // 43 * 43).astype(np.uint8)

    encoders = {
        "ppm": lambda i: mm.encode_ppm(pixels(i)),
        "png": lambda i: mm.encode_png(pixels(i)),
        "jpeg_gray": lambda i: encode_jpeg_blockmean(
            block16(i)[:, :, 0]),
        "jpeg_420": lambda i: encode_jpeg_blockmean(
            block16(i), subsample="420"),
        "gif": lambda i: encode_gif(gif_px(i)),
        "tiff_packbits": lambda i: mm.encode_tiff(
            pixels(i), packbits=True, rows_per_strip=8),
        "jpeg_prog_gray": lambda i: encode_jpeg_progressive_blockmean(
            block16(i)[:, :, 0]),
        "jpeg_prog_420": lambda i: encode_jpeg_progressive_blockmean(
            block16(i), subsample="420"),
    }

    if chain:
        _run_chain(spark, mm, encoders, n, side)
        spark.stop()
        return

    out = {"n_blobs": n, "side": side,
           "loadavg_start": os.getloadavg()[0], "formats": {}}
    for fmt, enc in encoders.items():
        # distinct contents (i varies) so nothing is cached anywhere
        blobs = [(i, enc(i)) for i in range(64)]
        total_bytes = sum(len(b) for _, b in blobs) * (n // 64)
        rows = [(int(i), "image", blobs[i % 64][1], f"image/{fmt}",
                 side, side, 0) for i in range(n)]
        df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA).repartition(32)
        df.persist().count()  # isolate decode cost from data shipping
        t0 = time.time()
        stats = mm.decode_stats(df)
        n_ok = stats.where("decoded").count()
        dt = time.time() - t0
        df.unpersist()
        assert n_ok == n, (fmt, n_ok)
        out["formats"][fmt] = {
            "sec": round(dt, 2),
            "blobs_per_sec": round(n / dt),
            "mb_per_sec": round(total_bytes / dt / 1e6, 1),
        }
        print(f"# {fmt}: {out['formats'][fmt]}", file=sys.stderr)
    out["loadavg_end"] = os.getloadavg()[0]
    print(json.dumps(out))
    spark.stop()


def _run_chain(spark, mm, encoders, n: int, side: int) -> None:
    """The production media-pipeline shape over a MIXED-format corpus:
    extract_features -> resize_images -> phash_signatures, executed at
    1x and 10x blob count and 3x repeated at 1x. At 100 TB every stage
    is a stateless Arrow mapInPandas over its own partition, so the
    evidence sought is (a) ~linear wall growth with corpus size and
    (b) flat repeat times (nothing accumulates driver- or
    executor-side across runs)."""
    import time as _time

    fmts = list(encoders)
    pool = {f: [encoders[f](i) for i in range(32)] for f in fmts}

    def mixed_df(count: int):
        rows = [(int(i), "image",
                 pool[fmts[i % len(fmts)]][(i // len(fmts)) % 32],
                 f"image/{fmts[i % len(fmts)]}", side, side, 0)
                for i in range(count)]
        df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA).repartition(32)
        df.persist().count()
        return df

    def run_once(df, count: int) -> dict:
        t0 = _time.time()
        n_feat = mm.extract_features(df).where("decoded").count()
        t1 = _time.time()
        # persist the resized frame so the phash stage reads cached
        # resized bytes instead of re-running decode+resize through the
        # lineage — without this, phash_sec double-counts the resize
        # stage and the per-stage breakdown lies
        resized = mm.resize_images(df, side // 2, side // 2).persist()
        n_res = resized.where("decoded").count()
        t2 = _time.time()
        n_sig = mm.phash_signatures(
            resized.where("decoded").drop("decoded")).count()
        t3 = _time.time()
        resized.unpersist()
        assert n_feat == n_res == n_sig == count, (n_feat, n_res, n_sig)
        return {"features_sec": round(t1 - t0, 2),
                "resize_sec": round(t2 - t1, 2),
                "phash_sec": round(t3 - t2, 2),
                "total_sec": round(t3 - t0, 2),
                "blobs_per_sec": round(count / (t3 - t0))}

    out = {"mode": "chain", "side": side, "formats": fmts,
           "loadavg_start": os.getloadavg()[0]}
    df1 = mixed_df(n)
    runs = []
    for r in range(3):
        res = run_once(df1, n)
        runs.append(res)
        print(f"# chain 1x run{r + 1}: {res}", file=sys.stderr)
    df1.unpersist()
    out["x1_blobs"] = n
    out["x1_runs"] = runs
    df10 = mixed_df(10 * n)
    res10 = run_once(df10, 10 * n)
    df10.unpersist()
    print(f"# chain 10x: {res10}", file=sys.stderr)
    out["x10_blobs"] = 10 * n
    out["x10"] = res10
    out["x10_wall_ratio"] = round(
        res10["total_sec"] / min(r["total_sec"] for r in runs), 2)
    out["loadavg_end"] = os.getloadavg()[0]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
