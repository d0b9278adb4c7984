#!/usr/bin/env python
"""Round-8 multimodal tour: the video/audio half of a training-data
pipeline, end to end and REAL (no media libraries in the container —
every decoder is the repo's pure-numpy implementation, every fixture
comes from the in-repo writers).

1. Build a corpus of MJPEG/raw AVIs (tools/avi_codec), animated GIFs
   (tools/gif_codec), and WAV clips — including one video with a hard
   scene cut and one planted near-duplicate image pair.
2. probe_metadata  — real header parsing (width/height/frames/rate).
3. sample_frames   — real container walks fan videos out to frames.
4. shot_boundaries — per-frame perceptual hash + windowed Hamming
   distance finds the planted cut.
5. phash_images + hamming_pairs — the image near-dup join flags the
   planted re-encode pair and nothing else.
6. audio_features  — STFT + MFCC features per clip.

Run: python examples/video_audio_tour.py
"""

from __future__ import annotations

import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tdataframe_spark import get_spark
from tdataframe_spark.ops.dedup import hamming_pairs
from tdataframe_spark.ops.multimodal import (
    audio_features,
    phash_images,
    probe_metadata,
    sample_frames,
    shot_boundaries,
)
from tools.avi_codec import encode_avi
from tools.jpeg_codec import encode_baseline_jpeg


def wav_bytes(samples: np.ndarray, rate: int) -> bytes:
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def main() -> None:
    spark = get_spark(app_name="video-audio-tour")
    h, w = 32, 48
    yy, xx = np.mgrid[0:h, 0:w]

    def gradient(k, f=0):
        # STATIC texture + brightness-only drift: pattern edges must not
        # move with f (a sweeping edge is a structural change pHash
        # rightly flags), and the texture must be strong — on a nearly
        # flat ramp the AC coefficients sit at ~0 and JPEG re-encode
        # rounding flips their signs frame to frame
        tex = ((yy // 4 * (5 + k) + xx // 4 * 3) % 8) * 28
        g = np.clip(tex + f * 2, 0, 255)
        return np.stack([g, 255 - g, np.clip(g // 2 + 60, 0, 255)],
                        axis=2).astype(np.uint8)

    def scene_b(f):
        g = np.clip(((yy * 9 + xx * 5) % 64) * 4 + f, 0, 255)
        return np.stack([255 - g, g, g], axis=2).astype(np.uint8)

    # --- corpus ---------------------------------------------------------
    cut_video = [gradient(1, f) for f in range(4)] + [scene_b(f) for f in range(4)]
    smooth_video = [gradient(2, f) for f in range(6)]
    rate = 8000
    t = np.arange(rate, dtype=np.float64)
    rows = [
        (1, "video/avi", bytearray(encode_avi(cut_video, codec="MJPG"))),
        (2, "video/avi", bytearray(encode_avi(smooth_video, codec="DIB "))),
        (3, "audio/wav", bytearray(wav_bytes(
            np.sin(2 * np.pi * 440 * t / rate) * 20000, rate))),
        (4, "audio/wav", bytearray(wav_bytes(
            np.sign(np.sin(2 * np.pi * 220 * t / rate)) * 15000, rate))),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )

    print("== probe_metadata (real headers) ==")
    probe_metadata(media).select(
        "media_id", "kind", "width", "height", "n_frames", "sample_rate"
    ).show()

    print("== sample_frames fan-out ==")
    frames = sample_frames(media.filter("kind like 'video%'"), every_n=2,
                           decode_stub=False)
    frames.groupBy("media_id").count().show()

    print("== shot_boundaries (planted cut in video 1 at frame 4) ==")
    shot_boundaries(
        media.filter("kind like 'video%'"), every_n=1
    ).orderBy("media_id", "frame_idx").show()

    print("== image near-dup: planted JPEG re-encode pair ==")
    base = gradient(7)
    imgs = spark.createDataFrame(
        [
            (10, "image/ppm", bytearray(
                f"P6\n{w} {h}\n255\n".encode() + base.tobytes())),
            (11, "image/jpeg", bytearray(encode_baseline_jpeg(base))),
            (12, "image/ppm", bytearray(
                f"P6\n{w} {h}\n255\n".encode() + gradient(9).tobytes())),
        ],
        "media_id long, kind string, payload binary",
    )
    hamming_pairs(
        phash_images(imgs).filter("ok"), "media_id", "phash",
        max_distance=10, n_bits=63,
    ).show()

    print("== audio_features (STFT + 13 MFCCs) ==")
    audio_features(
        media.filter("kind like 'audio%'"), n_mfcc=13
    ).select(
        "media_id", "sample_rate", "rms", "dominant_hz", "centroid_hz"
    ).show()

    spark.stop()


if __name__ == "__main__":
    main()
