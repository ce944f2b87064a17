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
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    import numpy as np

    from dbt_extrica_spark.extensions import multimodal as mm
    from dbt_extrica_spark.extensions.gif import encode_gif
    from dbt_extrica_spark.extensions.jpeg import encode_jpeg_blockmean
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
    }

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


if __name__ == "__main__":
    main()
