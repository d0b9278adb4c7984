#!/usr/bin/env python
"""Mixed-format image-corpus decode example: the classify-and-decode
pass a multimodal training pipeline runs first.

Builds a corpus of REAL encoded payloads with the in-repo fixture
encoders (no image libraries in the container): netpbm, BMP, PNG,
baseline JPEG (incl. 4:2:0 + restart markers), progressive JPEG
(spectral selection + successive approximation), plus deliberately
broken members (truncated entropy data, an unsupported codec), then runs
``decode_images`` — one Arrow-batched ``mapInPandas`` pass that decodes
what it can and classifies the rest ``ok=false`` — and reports the
per-kind corpus ok-rate, the visibility metric a real corpus job watches
(a silent coverage gap shows up here, not as a crash).

Run: python examples/multimodal_decode.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from tdataframe_spark import get_spark
from tdataframe_spark.ops.multimodal import decode_images
from tools.jpeg_codec import encode_baseline_jpeg, encode_progressive_jpeg


def _png(arr: np.ndarray) -> bytes:
    import struct
    import zlib

    h, w, c = arr.shape
    ctype = {1: 0, 3: 2}[c]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(typ, data):
        body = typ + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def main() -> None:
    spark = get_spark("multimodal-decode-example", cpus=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.RandomState(3)

    gray = (np.add.outer(np.arange(33) * 3, np.arange(41) * 5) % 256).astype(
        np.uint8
    )
    rgb = rng.randint(0, 256, (32, 40, 3)).astype(np.uint8)
    ppm = b"P6\n40 32\n255\n" + rgb.tobytes()
    rows, mid = [], 0
    for kind, payload in [
        ("image/x-portable-pixmap", ppm),
        ("image/png", _png(rgb)),
        ("image/jpeg;baseline", encode_baseline_jpeg(gray)),
        ("image/jpeg;baseline-420",
         encode_baseline_jpeg(rgb, subsample=True, restart_interval=2)),
        ("image/jpeg;progressive", encode_progressive_jpeg(gray)),
        ("image/jpeg;progressive-420",
         encode_progressive_jpeg(rgb, subsample=True)),
        ("image/jpeg;truncated", encode_progressive_jpeg(gray)[:64]),
        ("image/webp;unsupported", b"RIFF\x00\x00\x00\x00WEBPVP8 "),
    ]:
        for _ in range(4):
            mid += 1
            rows.append((mid, kind, bytearray(payload)))
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )

    decoded = decode_images(media, resize_to=16)
    report = (
        decoded.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("ok").cast("int")).alias("n_ok"),
            F.round(F.avg(F.col("ok").cast("double")), 3).alias("ok_rate"),
        )
        .orderBy("kind")
    )
    print("== per-kind decode coverage (corpus ok-rate) ==")
    report.show(20, truncate=False)
    total = decoded.agg(
        F.round(F.avg(F.col("ok").cast("double")), 3).alias("ok_rate")
    ).first()["ok_rate"]
    print(f"overall corpus ok-rate: {total}")
    spark.stop()


if __name__ == "__main__":
    main()
