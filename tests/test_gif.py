"""Real GIF decode (ops/gif.py) against the in-repo fixture encoder
(tools/gif_codec.py) — the multi-frame container that makes
sample_frames' video path genuinely real in this sandbox."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from tdataframe_spark.ops.gif import decode_gif, gif_first_frame
from tools.gif_codec import encode_gif

PAL = np.array(
    [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255], [200, 100, 50]],
    np.uint8,
)

# the famous 43-byte 1x1 transparent GIF (public constant): white GCT
# entry 0 as background, one fully-transparent pixel → white canvas
ONE_PX = (
    b"GIF89a\x01\x00\x01\x00\x80\x00\x00\xff\xff\xff\x00\x00\x00!\xf9\x04"
    b"\x01\x00\x00\x00\x00,\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02\x02D"
    b"\x01\x00;"
)


def test_gif_roundtrips_exact():
    """Encode→decode is pixel-exact across palette sizes (LZW width
    growth through 12 bits + mid-stream CLEAR), interlace, and local
    color tables; the canonical 1x1 transparent GIF literal decodes."""
    rng = np.random.RandomState(7)
    img = PAL[rng.randint(0, 5, (9, 13))]
    assert np.array_equal(decode_gif(encode_gif([img]))[0][1], img)
    assert np.array_equal(
        decode_gif(encode_gif([img], interlace=True))[0][1], img
    )
    assert np.array_equal(
        decode_gif(encode_gif([img], local_tables=True))[0][1], img
    )
    pal256 = np.array(
        [[i, (i * 3) % 256, (i * 11) % 256] for i in range(256)], np.uint8
    )
    big = pal256[rng.randint(0, 256, (120, 200))]
    assert np.array_equal(decode_gif(encode_gif([big]))[0][1], big)

    frame = decode_gif(ONE_PX)
    assert len(frame) == 1
    assert frame[0][1].tolist() == [[[255, 255, 255]]]

    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"JFIF whatever")
    assert gif_first_frame(b"\x89PNG....") is None


def test_gif_animation_compositing_disposal_transparency():
    """Multi-frame semantics: sub-rectangle frames composite onto the
    canvas; disposal 2 restores the background region, disposal 3
    restores the previous content; transparent pixels never overwrite;
    per-frame delays ride through."""
    canvas = PAL[np.zeros((8, 8), int)]
    patch = PAL[np.full((3, 3), 1)]
    buf = encode_gif(
        [canvas, patch, patch],
        delays=[10, 20, 30],
        disposals=[1, 2, 3],
        transparency=[None, (0, 0, 0), None],
        offsets=[(0, 0), (2, 2), (5, 5)],
        bg_color=(0, 0, 0),
    )
    frames = decode_gif(buf)
    assert [d for d, _ in frames] == [10, 20, 30]
    exp1 = canvas.copy()
    exp1[2:5, 2:5] = [255, 0, 0]
    assert np.array_equal(frames[1][1], exp1)
    # frame 1's region was background-restored before frame 2 drew at (5,5)
    exp2 = canvas.copy()
    exp2[5:8, 5:8] = [255, 0, 0]
    assert np.array_equal(frames[2][1], exp2)

    # a genuinely transparent patch leaves the underlying pixels intact
    mixed = PAL[np.array([[1, 0], [0, 1]])]  # red/black checker
    buf = encode_gif(
        [canvas, mixed],
        transparency=[None, (0, 0, 0)],
        offsets=[(0, 0), (3, 3)],
        bg_color=(0, 0, 0),
    )
    out = decode_gif(buf)[1][1]
    assert out[3, 3].tolist() == [255, 0, 0]  # drawn
    assert out[3, 4].tolist() == [0, 0, 0]  # transparent → canvas kept


def test_sample_frames_real_gif_end_to_end(spark):
    """sample_frames on an animated-GIF video payload is REAL: it emits
    every_n-th composited frame as a netpbm payload that decode_images
    parses (ok=true, right dims, right mean) — the sample→decode chain
    with no stub in the loop. Corrupt GIFs fall back to the stub rather
    than failing the batch."""
    from tdataframe_spark.ops.multimodal import decode_images, sample_frames

    rng = np.random.RandomState(3)
    frames = [PAL[rng.randint(0, 5, (6, 10))] for _ in range(7)]
    payload = encode_gif(frames)
    media = spark.createDataFrame(
        [
            Row(media_id=1, kind="video/gif", payload=bytearray(payload)),
            Row(media_id=2, kind="video/fake", payload=bytearray(b"zz" * 40)),
        ]
    )
    out = sample_frames(media, every_n=3).collect()
    gif_rows = sorted(
        (r for r in out if r["media_id"] == 1), key=lambda r: r["frame_idx"]
    )
    assert [r["frame_idx"] for r in gif_rows] == [0, 3, 6]
    for r in gif_rows:
        assert bytes(r["frame_payload"]).startswith(b"P6\n10 6\n255\n")
    # the stub path still serves non-GIF video payloads
    assert any(r["media_id"] == 2 for r in out)

    # frame payloads feed decode_images directly — and the decoded means
    # equal the source frames' means exactly
    fdf = spark.createDataFrame(
        [
            Row(media_id=int(r["frame_idx"]), kind="image/ppm",
                payload=r["frame_payload"])
            for r in gif_rows
        ]
    )
    dec = {r["media_id"]: r for r in decode_images(fdf).collect()}
    for idx in (0, 3, 6):
        r = dec[idx]
        assert r["ok"] and (r["width"], r["height"]) == (10, 6)
        want = frames[idx].astype(np.float64).mean(axis=(0, 1)) / 255.0
        assert np.allclose(r["mean_channel"], want, atol=1e-12)


def test_decode_images_parses_gif_payloads(spark):
    """decode_images classifies+decodes GIF alongside the other real
    formats (first composited frame); corrupt GIF bytes come back
    ok=false instead of raising."""
    from tdataframe_spark.ops.multimodal import decode_images

    rng = np.random.RandomState(5)
    img = PAL[rng.randint(0, 5, (7, 11))]
    good = encode_gif([img], interlace=True)
    media = spark.createDataFrame(
        [
            Row(media_id=1, kind="image/gif", payload=bytearray(good)),
            Row(media_id=2, kind="image/gif",
                payload=bytearray(good[:20])),  # truncated
        ]
    )
    out = {r["media_id"]: r for r in decode_images(media).collect()}
    assert out[1]["ok"] and (out[1]["width"], out[1]["height"]) == (11, 7)
    want = img.astype(np.float64).mean(axis=(0, 1)) / 255.0
    assert np.allclose(out[1]["mean_channel"], want, atol=1e-12)
    assert out[2]["ok"] is False


def test_probe_metadata_reports_real_gif_frame_count(spark):
    """probe_metadata's n_frames is REAL for GIF video payloads (block
    walk counting image descriptors — consistent with sample_frames'
    fan-out) and stays the deterministic stub for other codecs."""
    from tdataframe_spark.ops.multimodal import probe_metadata, sample_frames

    frames = [PAL[np.full((4, 5), i % 5)] for i in range(9)]
    payload = encode_gif(frames)
    media = spark.createDataFrame(
        [
            Row(media_id=1, kind="video/gif", payload=bytearray(payload)),
            Row(media_id=2, kind="video/fake", payload=bytearray(b"q" * 50)),
        ]
    )
    meta = {r["media_id"]: r for r in probe_metadata(media).collect()}
    assert meta[1]["n_frames"] == 9
    assert (meta[1]["width"], meta[1]["height"]) == (5, 4)
    assert meta[2]["n_frames"] is not None  # stub still serves non-GIF
    # consistency: the sampler's fan-out count matches the probed count
    n = sum(
        1 for r in sample_frames(media, every_n=2).collect()
        if r["media_id"] == 1
    )
    assert n == (9 + 1) // 2
