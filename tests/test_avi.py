"""Real AVI container decode (ops/avi.py) through the multimodal
pipeline: MJPG chunks are standalone baseline JPEGs handed to the real
pure-numpy JPEG decoder; BI_RGB ("DIB ") chunks roundtrip pixel-exact.
Fixtures come from the in-repo writer (tools/avi_codec.py) so the
parser is tested against a structurally honest RIFF tree (hdrl, movi,
idx1, pad bytes), entirely in-sandbox."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tdataframe_spark.ops.avi import dib_to_rgb, is_avi, parse_avi
from tools.avi_codec import encode_avi


def _frames(n=5, h=16, w=24, seed=3):
    """Deterministic blocky frames: flat 8x8 tiles so all-ones-quant
    JPEG roundtrips exactly."""
    pal = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255], [200, 100, 50]],
        np.uint8,
    )
    out = []
    for f in range(n):
        tiles = (seed + 7 * f + np.arange((h // 8) * (w // 8))) % 5
        img = pal[tiles].reshape(h // 8, w // 8, 3)
        out.append(np.repeat(np.repeat(img, 8, 0), 8, 1))
    return out


def test_parse_avi_dib_roundtrips_pixel_exact():
    frames = _frames()
    buf = encode_avi(frames, codec="DIB ", fps=12)
    assert is_avi(buf)
    info = parse_avi(buf)
    assert info is not None
    assert (info.width, info.height) == (24, 16)
    assert info.n_frames == 5 and len(info.frames) == 5
    assert info.fourcc == "DIB " and info.fps == 12.0
    for want, chunk in zip(frames, info.frames):
        got = dib_to_rgb(chunk, info.width, info.height)
        assert np.array_equal(got, want)


def test_parse_avi_mjpg_chunks_are_decodable_jpegs():
    from tools.jpeg_codec import encode_baseline_jpeg

    frames = _frames()
    buf = encode_avi(frames, codec="MJPG", fps=10)
    info = parse_avi(buf)
    assert info is not None and info.fourcc == "MJPG"
    # frame chunks are byte-identical to the standalone encoder output
    assert [bytes(c) for c in info.frames] == [
        encode_baseline_jpeg(f) for f in frames
    ]


def test_parse_avi_rejects_garbage_and_truncation():
    frames = _frames(n=3)
    buf = encode_avi(frames, codec="DIB ")
    assert parse_avi(b"RIFF\x00\x00") is None
    assert parse_avi(b"not an avi at all") is None
    assert parse_avi(buf[:11]) is None
    # cut inside the movi list: complete leading chunks still parse
    cut = parse_avi(buf[: len(buf) // 2])
    assert cut is None or len(cut.frames) < 3
    # corrupt DIB frame shorter than geometry -> None from dib_to_rgb
    assert dib_to_rgb(b"\x01\x02", 24, 16) is None


def test_sample_frames_real_avi_paths(spark):
    """sample_frames: MJPG payloads fan out to real JPEG frame payloads
    that decode_images decodes to the ORIGINAL pixels (all-ones quant,
    flat tiles: exact); DIB payloads fan out to P6 with exact pixels;
    every_n subsampling honored; decode_stub=False no longer raises for
    AVI (it is a real path now)."""
    from tdataframe_spark.ops.multimodal import decode_images, sample_frames

    frames = _frames(n=6)
    media = spark.createDataFrame(
        [
            (1, "video/avi", bytearray(encode_avi(frames, codec="MJPG"))),
            (2, "video/avi", bytearray(encode_avi(frames, codec="DIB "))),
        ],
        "media_id long, kind string, payload binary",
    )
    out = sample_frames(media, every_n=2, decode_stub=False)
    pdf = out.toPandas().sort_values(["media_id", "frame_idx"])
    assert list(pdf["frame_idx"]) == [0, 2, 4, 0, 2, 4]

    decoded = decode_images(
        out.select(
            (F.col("media_id") * 10 + F.col("frame_idx")).alias("media_id"),
            F.when(F.col("media_id") == 1, "image/jpeg")
            .otherwise("image/ppm")
            .alias("kind"),
            F.col("frame_payload").alias("payload"),
        )
    )
    rows = {r["media_id"]: r for r in decoded.collect()}
    assert len(rows) == 6 and all(r["ok"] for r in rows.values())
    for mid in (1, 2):
        for idx in (0, 2, 4):
            r = rows[mid * 10 + idx]
            assert (r["width"], r["height"]) == (24, 16)
            want = frames[idx].reshape(-1, 3).mean(axis=0) / 255.0
            got = [r["mean_channel"][c] for c in range(3)]
            assert got == pytest.approx(list(want), abs=1e-9)


def test_sample_frames_non_avi_video_still_stubs_or_raises(spark):
    from tdataframe_spark.ops.multimodal import sample_frames

    media = spark.createDataFrame(
        [(1, "video/mp4", bytearray(b"\x00\x00\x00\x18ftypmp42data"))],
        "media_id long, kind string, payload binary",
    )
    assert sample_frames(media, every_n=4).count() > 0  # stub fan-out
    with pytest.raises(Exception, match="ffmpeg-like"):
        sample_frames(media, every_n=4, decode_stub=False).collect()


def test_probe_metadata_real_avi_header(spark):
    from tdataframe_spark.ops.multimodal import probe_metadata

    frames = _frames(n=7)
    media = spark.createDataFrame(
        [(1, "video/avi", bytearray(encode_avi(frames, codec="MJPG")))],
        "media_id long, kind string, payload binary",
    )
    r = probe_metadata(media).collect()[0]
    assert (r["width"], r["height"], r["n_frames"]) == (24, 16, 7)


def _wav_bytes(samples, rate, n_ch=1, bits=16, fmt_code=1):
    import struct

    data = samples.tobytes()
    fmt = struct.pack(
        "<HHIIHH", fmt_code, n_ch, rate, rate * n_ch * bits // 8,
        n_ch * bits // 8, bits,
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_audio_features_real_stft(spark):
    """audio_features: a pure sine placed EXACTLY on an rfft bin comes
    back with dominant_hz equal to that bin's frequency, rms == A/sqrt(2),
    zcr == 2f/rate, centroid near the tone; the band holding the tone is
    the loudest; junk payloads classify ok=false; outputs are invariant
    under repartitioning (per-row pure function)."""
    from tdataframe_spark.ops.multimodal import audio_features

    rate, n_fft = 8000, 256
    f0 = 14 * rate / n_fft  # 437.5 Hz: exactly bin 14
    t = np.arange(rate, dtype=np.float64)
    amp = 30000 / 32768.0
    sine = (np.sin(2 * np.pi * f0 * t / rate) * 30000).astype("<i2")
    media = spark.createDataFrame(
        [
            (0, "audio/wav", bytearray(_wav_bytes(sine, rate))),
            (1, "audio/mp3", bytearray(b"ID3 not a wav")),
        ],
        "media_id long, kind string, payload binary",
    )
    out = {r["media_id"]: r for r in audio_features(media, n_fft=n_fft).collect()}
    r = out[0]
    assert r["ok"] and r["sample_rate"] == rate
    assert r["dominant_hz"] == pytest.approx(f0, abs=1e-9)
    assert r["rms"] == pytest.approx(amp / np.sqrt(2), rel=1e-3)
    # zcr from the actual samples: the tone hits exact zeros every 64
    # samples (sin(k*pi) quantizes to 0), which are not sign CHANGES
    xs = sine.astype(np.float64) / 32768.0
    exp_zcr = float((xs[:-1] * xs[1:] < 0).sum() / (len(xs) - 1))
    assert r["zcr"] == pytest.approx(exp_zcr, abs=1e-9)
    assert exp_zcr == pytest.approx(2 * f0 / rate, rel=0.2)  # sanity
    assert r["centroid_hz"] == pytest.approx(f0, rel=0.05)
    bands = list(r["band_db"])
    n_bins = n_fft // 2 + 1
    edges = np.linspace(1, n_bins, 8 + 1).astype(int)
    tone_band = int(np.searchsorted(edges, 14, side="right") - 1)
    assert bands.index(max(bands)) == tone_band
    assert not out[1]["ok"]

    many = spark.createDataFrame(
        [(i, "audio/wav", bytearray(_wav_bytes(
            (np.sin(2 * np.pi * (200 + 50 * i) * t / rate) * 20000
             ).astype("<i2"), rate)))
         for i in range(12)],
        "media_id long, kind string, payload binary",
    )
    a = sorted(map(tuple, audio_features(many).collect()))
    b = sorted(map(tuple, audio_features(many.repartition(7)).collect()))
    assert a == b

    with pytest.raises(ValueError, match="n_bands"):
        audio_features(media, n_fft=64, n_bands=64)


def test_audio_features_caps_analysis_window(spark):
    """max_seconds caps the analyzed span: a long payload's features
    equal the features of its truncated prefix (cost must not scale
    with duration), and a shorter-than-n_fft payload zero-pads."""
    from tdataframe_spark.ops.multimodal import audio_features

    rate = 8000
    t = np.arange(4 * rate, dtype=np.float64)
    x = (np.sin(2 * np.pi * 500 * t / rate) * 25000).astype("<i2")
    media = spark.createDataFrame(
        [
            (0, "audio/wav", bytearray(_wav_bytes(x, rate))),
            (1, "audio/wav", bytearray(_wav_bytes(x[: rate], rate))),
            (2, "audio/wav", bytearray(_wav_bytes(x[:100], rate))),
        ],
        "media_id long, kind string, payload binary",
    )
    out = {
        r["media_id"]: r
        for r in audio_features(media, max_seconds=1.0).collect()
    }
    full, pref = out[0], out[1]
    assert full["n_frames"] == pref["n_frames"]
    assert full["rms"] == pref["rms"] and full["band_db"] == pref["band_db"]
    assert out[2]["ok"] and out[2]["n_frames"] == 1


def test_parse_avi_audio_first_interleave():
    """Review r8: the video stream's chunk id comes from its strl
    POSITION — an audio-first AVI (video chunks '01dc') must parse, not
    come back frameless."""
    frames = _frames(n=4)
    buf = encode_avi(frames, codec="DIB ", audio_first=True)
    info = parse_avi(buf)
    assert info is not None and info.fourcc == "DIB "
    assert len(info.frames) == 4
    assert np.array_equal(
        dib_to_rgb(info.frames[2], info.width, info.height), frames[2]
    )


def test_parse_avi_list_nesting_bomb_returns_none():
    """Review r8: a crafted payload nesting thousands of LISTs must
    return None (bounded depth), not blow the executor stack."""
    import struct as _s

    depth = 5000
    inner = b""
    for _ in range(depth):
        inner = b"LIST" + _s.pack("<I", 4 + len(inner)) + b"movi" + inner
    bomb = b"RIFF" + _s.pack("<I", 4 + len(inner)) + b"AVI " + inner
    assert parse_avi(bomb) is None


def test_parse_avi_unsupported_fourcc_metadata_only():
    """Review r8: an undecodable codec still yields real header metadata
    (probe_metadata path) but NO copied frame chunks, and sample_frames
    routes it to the stub/raise contract."""
    from tdataframe_spark.ops.avi import DECODABLE_FOURCCS

    buf = encode_avi(_frames(n=3), codec="MJPG")
    h264 = buf[:300].replace(b"MJPG", b"H264") + buf[300:]
    info = parse_avi(h264)
    assert info is not None and info.fourcc == "H264"
    assert info.fourcc not in DECODABLE_FOURCCS
    assert info.frames == []  # no eager copy of undecodable chunks
    assert (info.width, info.height, info.n_frames) == (24, 16, 3)


def test_parse_wav_caps_before_float_conversion():
    """Review r8: max_seconds truncates at the raw-byte level — the
    returned sample array length reflects the cap (a multi-GB payload
    must never fully materialize as float64)."""
    from tdataframe_spark.ops.multimodal import _parse_wav

    rate = 8000
    x = (np.zeros(10 * rate)).astype("<i2")
    wav = _wav_bytes(x, rate)
    rate_, n_ch, n, arr = _parse_wav(wav, max_seconds=1.0, min_frames=256)
    assert n == rate and len(arr) == rate
    # min_frames floor wins for sub-second caps
    _, _, n2, _ = _parse_wav(wav, max_seconds=0.001, min_frames=256)
    assert n2 == 256
    # no cap: full clip
    assert _parse_wav(wav)[2] == 10 * rate


def test_audio_features_mfcc(spark):
    """n_mfcc adds orthonormal-DCT MFCCs over an HTK-mel filterbank:
    right length, deterministic across partitionings, scale behaves
    (doubling amplitude shifts ONLY c0 — log energy — by a constant,
    sqrt(1/26)*2ln2 per DCT row 0, leaving higher coefficients
    bit-unchanged), and different tones yield different cepstra."""
    from tdataframe_spark.ops.multimodal import audio_features

    rate = 8000
    t = np.arange(rate, dtype=np.float64)

    # broadband multi-tone so EVERY mel filter carries real energy (the
    # log epsilon floor would otherwise freeze silent filters and break
    # the uniform-shift algebra below)
    dense = sum(
        np.sin(2 * np.pi * (100.0 * k) * t / rate + k) for k in range(1, 40)
    )
    x1 = (dense / np.abs(dense).max() * 12000).astype("<i2")
    x2 = (x1.astype(np.int32) * 2).astype("<i2")  # EXACTLY doubled
    other = (np.sign(np.sin(2 * np.pi * 300 * t / rate)) * 12000).astype(
        "<i2"
    )  # square wave: different spectral envelope
    media = spark.createDataFrame(
        [
            (0, "audio/wav", bytearray(_wav_bytes(x1, rate))),
            (1, "audio/wav", bytearray(_wav_bytes(x2, rate))),
            (2, "audio/wav", bytearray(_wav_bytes(other, rate))),
            (3, "audio/ogg", bytearray(b"OggS nope")),
        ],
        "media_id long, kind string, payload binary",
    )
    out = {
        r["media_id"]: r
        for r in audio_features(media, n_mfcc=13).collect()
    }
    assert len(out[0]["mfcc"]) == 13
    assert out[3]["mfcc"] is None and not out[3]["ok"]
    # exactly-doubled samples: power *4 => every log-mel +2ln2 => only
    # c0 (the orthonormal-DCT DC row, sqrt(1/26)*sum) moves, by
    # sqrt(1/26)*26*2ln2 = sqrt(26)*2ln2
    shift = np.sqrt(26.0) * 2.0 * np.log(2.0)
    assert out[1]["mfcc"][0] - out[0]["mfcc"][0] == pytest.approx(
        shift, abs=1e-6
    )
    for c_a, c_b in zip(out[0]["mfcc"][1:], out[1]["mfcc"][1:]):
        assert c_a == pytest.approx(c_b, abs=1e-6)
    assert out[0]["mfcc"][1:] != out[2]["mfcc"][1:]  # different timbre
    # partitioning invariance
    a = sorted(map(tuple, audio_features(media, n_mfcc=13).collect()))
    b = sorted(
        map(tuple, audio_features(media.repartition(3), n_mfcc=13).collect())
    )
    assert a == b
    with pytest.raises(ValueError, match="n_mfcc"):
        audio_features(media, n_mfcc=99)
    # n_mfcc=0 keeps the original schema (no mfcc column)
    assert "mfcc" not in audio_features(media).columns


def test_phash_near_dup_images(spark):
    """phash_images + hamming_pairs: re-encodes (JPEG of the same
    pixels) and mild brightness shifts land at small Hamming distance;
    unrelated images do not pair; junk payloads classify ok=false; the
    hash is partition-invariant."""
    from tools.jpeg_codec import encode_baseline_jpeg

    from tdataframe_spark.ops.dedup import hamming_pairs
    from tdataframe_spark.ops.multimodal import phash_images

    h, w = 48, 64
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx * 255 / (w - 1)),
            (yy * 255 / (h - 1)),
            ((xx + yy) % 97 * 2.6),
        ],
        axis=2,
    ).astype(np.uint8)
    bright = np.clip(base.astype(np.int16) + 8, 0, 255).astype(np.uint8)
    ch = ((xx * 7 + yy * 13) % 256).astype(np.uint8)
    other = np.stack([ch, ch[::-1], ch[:, ::-1]], axis=2)

    def p6(a):
        return bytearray(f"P6\n{a.shape[1]} {a.shape[0]}\n255\n".encode()
                         + a.tobytes())

    media = spark.createDataFrame(
        [
            (0, "image/ppm", p6(base)),
            (1, "image/jpeg", bytearray(encode_baseline_jpeg(base))),
            (2, "image/ppm", p6(bright)),
            (3, "image/ppm", p6(other)),
            (4, "image/webp", bytearray(b"RIFFxxxxWEBP")),
        ],
        "media_id long, kind string, payload binary",
    )
    sigs = phash_images(media)
    rows = {r["media_id"]: r for r in sigs.collect()}
    assert rows[4]["ok"] is False and rows[4]["phash"] is None
    assert all(rows[i]["ok"] for i in range(4))

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_pairs(
            sigs.filter("ok"), "media_id", "phash",
            max_distance=10, n_bits=63,
        ).collect()
    }
    assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs
    assert not any(3 in p for p in pairs)

    a = sorted(map(tuple, phash_images(media).collect()))
    b = sorted(map(tuple, phash_images(media.repartition(3)).collect()))
    assert a == b
    import pytest as _pytest
    with _pytest.raises(ValueError, match="block"):
        phash_images(media, resize=8, block=16)


def test_shot_boundaries_detects_planted_cut(spark):
    """shot_boundaries: a real MJPEG AVI whose frames drift gently for
    4 frames then hard-cut to a different scene — exactly one is_cut at
    the planted boundary; the smooth transitions stay below threshold;
    per-video windows keep videos independent."""
    from tdataframe_spark.ops.multimodal import shot_boundaries

    h, w = 32, 48
    yy, xx = np.mgrid[0:h, 0:w]

    def scene_a(f):
        # slow drift: brightness creeps a little per frame
        g = ((xx * 255 / (w - 1)) + f * 2) % 256
        return np.stack([g, g, g], axis=2).astype(np.uint8)

    def scene_b(f):
        g0 = ((yy * 11 + xx * 3) % 64) * 4
        g = np.clip(g0 + f * 2, 0, 255)  # gentle drift, no mod wrap
        return np.stack(
            [255 - g, g, np.clip(g0 + 128 + f, 0, 255)], axis=2
        ).astype(np.uint8)

    frames = [scene_a(f) for f in range(4)] + [scene_b(f) for f in range(4)]
    media = spark.createDataFrame(
        [
            (7, "video/avi", bytearray(encode_avi(frames, codec="MJPG"))),
            (8, "video/avi",
             bytearray(encode_avi([scene_a(f) for f in range(5)],
                                  codec="DIB "))),
        ],
        "media_id long, kind string, payload binary",
    )
    out = shot_boundaries(media, every_n=1, cut_distance=12).collect()
    cuts = {(r["media_id"], r["frame_idx"]) for r in out if r["is_cut"]}
    assert cuts == {(7, 4)}  # exactly the planted boundary
    v7 = sorted(r["frame_idx"] for r in out if r["media_id"] == 7)
    assert v7 == [1, 2, 3, 4, 5, 6, 7]
    assert all(not r["is_cut"] for r in out if r["media_id"] == 8)


def test_phash_flat_images_differ_by_luminance(spark):
    """Review r8: median-of-AC alone hashes every uniform image to the
    same value — the thermometer-coded luminance bits must separate
    solid black from solid white (16 bits apart) while a mild
    brightness shift moves at most ~1 bit."""
    from tdataframe_spark.ops.dedup import hamming_pairs
    from tdataframe_spark.ops.multimodal import phash_images

    def flat(v):
        a = np.full((16, 16, 3), v, np.uint8)
        return bytearray(b"P6\n16 16\n255\n" + a.tobytes())

    media = spark.createDataFrame(
        [(0, "image/ppm", flat(0)), (1, "image/ppm", flat(255)),
         (2, "image/ppm", flat(4))],
        "media_id long, kind string, payload binary",
    )
    sigs = phash_images(media)
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_pairs(
            sigs, "media_id", "phash", max_distance=63, n_bits=63
        ).collect()
    }
    assert pairs[(0, 1)] == 16  # black vs white: all luminance bits
    assert pairs[(0, 2)] <= 1   # tiny brightness shift: ~one level


def test_shot_boundaries_surfaces_unhashable_videos(spark):
    """Review r8: a stub-codec video must yield pair rows with NULL
    hamming/is_cut, not vanish — callers can tell 'no cuts' from
    'codec unsupported'. Also: negative and huge media ids are safe
    (frame_idx rides as a passthrough column, no id packing)."""
    from tdataframe_spark.ops.multimodal import shot_boundaries

    frames = _frames(n=4)
    media = spark.createDataFrame(
        [
            (-3, "video/avi", bytearray(encode_avi(frames, codec="DIB "))),
            (1 << 52, "video/avi",
             bytearray(encode_avi(frames, codec="MJPG"))),
            (5, "video/mp4", bytearray(b"\x00\x00\x00\x18ftypmp42data")),
        ],
        "media_id long, kind string, payload binary",
    )
    out = shot_boundaries(media, every_n=1).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    assert set(by_id) == {-3, 1 << 52, 5}
    for vid in (-3, 1 << 52):
        assert all(r["hamming"] is not None for r in by_id[vid])
        assert sorted(r["frame_idx"] for r in by_id[vid]) == [1, 2, 3]
    assert all(
        r["hamming"] is None and r["is_cut"] is None for r in by_id[5]
    )


def test_phash_index_incremental_match(spark, tmp_path):
    """Incremental image near-dup: build the pHash index once, match a
    new batch against it — results equal the full pairwise op over the
    union RESTRICTED to new-vs-corpus pairs (the minhash-index
    contract); appending folds the batch in for the next round."""
    from tools.jpeg_codec import encode_baseline_jpeg

    from tdataframe_spark.ops.dedup import hamming_pairs
    from tdataframe_spark.ops.multimodal import (
        append_phash_index,
        build_phash_index,
        match_phash_index,
        phash_images,
    )

    h, w = 48, 64
    yy, xx = np.mgrid[0:h, 0:w]

    def img(k):
        return np.stack(
            [(xx * (k * 13 % 200 + 5)) % 256, (yy * (k + 3) * 7) % 256,
             ((xx + yy * k) % 97 * 2.6)],
            axis=2,
        ).astype(np.uint8)

    def p6(a):
        return bytearray(f"P6\n{w} {h}\n255\n".encode() + a.tobytes())

    corpus = spark.createDataFrame(
        [(k, "image/ppm", p6(img(k))) for k in range(8)],
        "media_id long, kind string, payload binary",
    )
    idx = str(tmp_path / "phidx")
    build_phash_index(corpus, idx)

    batch = spark.createDataFrame(
        [
            (100, "image/jpeg", bytearray(encode_baseline_jpeg(img(2)))),
            (101, "image/ppm", p6(np.clip(
                img(5).astype(np.int16) + 8, 0, 255).astype(np.uint8))),
            (102, "image/ppm", p6(img(77))),  # novel
            (103, "image/webp", bytearray(b"RIFFxxxxWEBP")),  # undecodable
        ],
        "media_id long, kind string, payload binary",
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in match_phash_index(batch, idx).collect()
    }
    # contract: equals the full self-join over the union, restricted to
    # new-vs-corpus pairs
    union_sigs = phash_images(
        corpus.unionByName(batch)
    ).filter("ok")
    full = {
        (r["id_b"], r["id_a"]): r["hamming"]
        for r in hamming_pairs(
            union_sigs, "media_id", "phash", max_distance=10, n_bits=63
        ).collect()
        if r["id_b"] >= 100 and r["id_a"] < 100
    }
    assert got == full
    assert (100, 2) in got and (101, 5) in got
    assert not any(a == 102 for a, _ in got)

    # append the batch: a replica of 102 now matches next round
    append_phash_index(batch, idx)
    probe = spark.createDataFrame(
        [(200, "image/ppm", p6(img(77)))],
        "media_id long, kind string, payload binary",
    )
    nxt = {(r["id_a"], r["id_b"]) for r in match_phash_index(probe, idx).collect()}
    assert (200, 102) in nxt


def test_match_after_append_returns_no_self_pairs(spark, tmp_path):
    """r8-ADVICE: re-matching a batch whose ids were already folded into
    the index via append_phash_index must not return trivial
    (id, id, hamming=0) self-pairs; genuine cross-duplicates still pair."""
    from tdataframe_spark.ops.multimodal import (
        append_phash_index,
        build_phash_index,
        match_phash_index,
    )

    h, w = 48, 64
    yy, xx = np.mgrid[0:h, 0:w]

    def img(k):
        return np.stack(
            [(xx * (k * 13 % 200 + 5)) % 256, (yy * (k + 3) * 7) % 256,
             ((xx + yy * k) % 97 * 2.6)],
            axis=2,
        ).astype(np.uint8)

    def p6(a):
        return bytearray(f"P6\n{w} {h}\n255\n".encode() + a.tobytes())

    corpus = spark.createDataFrame(
        [(k, "image/ppm", p6(img(k))) for k in range(4)],
        "media_id long, kind string, payload binary",
    )
    idx = str(tmp_path / "phidx")
    build_phash_index(corpus, idx)
    batch = spark.createDataFrame(
        [
            (10, "image/ppm", p6(np.clip(  # near-dup of corpus 2
                img(2).astype(np.int16) + 6, 0, 255).astype(np.uint8))),
            (11, "image/ppm", p6(img(55))),  # novel
        ],
        "media_id long, kind string, payload binary",
    )
    append_phash_index(batch, idx)
    again = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in match_phash_index(batch, idx).collect()
    }
    # identical signatures now in the index, yet no (10,10)/(11,11) rows
    assert not any(a == b for a, b in again)
    assert (10, 2) in again  # the genuine near-dup still pairs


# ---------------------------------------------------------------------------
# audio fingerprints + video signatures (round 9)


def _tone_clip(k, rate=8000, n_fft=256, seconds=1.2, t_segments=9):
    """Per-segment tone sequence parameterized by k: each of the clip's
    time segments carries a different exact-bin tone, so the T x B
    fingerprint grid has genuine time-frequency structure and two
    different k never share a tone schedule."""
    n = int(rate * seconds)
    t = np.arange(n, dtype=np.float64)
    seg = np.minimum((t / n * t_segments).astype(int), t_segments - 1)
    # k rides the stride too: distinct k diverge segment-dependently (a
    # k-independent stride left some pairs a constant few bins apart —
    # same band every segment, near-identical fingerprint)
    b = 6 + ((k * 17 + seg * (29 + 7 * k)) % 110)
    return 0.55 * np.sin(2 * np.pi * b * t / n_fft)


def _wav16(x, rate=8000):
    return bytearray(_wav_bytes((x * 32767).astype("<i2"), rate))


def test_audio_fingerprint_families_pair(spark):
    """audio_fingerprints + hamming_pairs: re-encode (8-bit, float32)
    and gain-shift copies of a clip pair with it; unrelated clips never
    pair — the WAV analogue of the JPEG re-encode family phash pins."""
    from tdataframe_spark.ops.dedup import hamming_pairs
    from tdataframe_spark.ops.multimodal import audio_fingerprints

    rate = 8000
    rows = []
    for k in range(6):
        x = _tone_clip(k)
        rows.append((k, "audio/wav", _wav16(x, rate)))
        if k < 2:
            u8 = ((x * 127) + 128).clip(0, 255).astype(np.uint8)
            rows.append((k + 100, "audio/wav",
                         bytearray(_wav_bytes(u8, rate, bits=8))))
            rows.append((k + 200, "audio/wav",
                         bytearray(_wav_bytes(x.astype("<f4"), rate,
                                              bits=32, fmt_code=3))))
            rows.append((k + 300, "audio/wav", _wav16(x * 0.5, rate)))
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    sigs = audio_fingerprints(media)
    assert all(r["ok"] for r in sigs.collect())
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_pairs(
            sigs, "media_id", "afp", max_distance=8, n_bits=63
        ).collect()
    }
    import itertools

    want = set()
    for k in range(2):
        fam = [k, k + 100, k + 200, k + 300]
        want |= set(itertools.combinations(fam, 2))
    assert set(pairs) == want


def test_audio_fingerprint_gain_invariant_and_deterministic(spark):
    """A pure gain change shifts every log cell and the median equally —
    the fingerprint is bit-identical; and the per-row pure function is
    partition-invariant. Garbage payloads classify ok=false with a NULL
    (never float64-rounded) fingerprint."""
    from tdataframe_spark.ops.multimodal import audio_fingerprints

    x = _tone_clip(3)
    media = spark.createDataFrame(
        [
            (1, "audio/wav", _wav16(x)),
            (2, "audio/wav", _wav16(x * 0.5)),
            (3, "audio/wav", _wav16(x * 0.1)),
            (4, "audio/wav", bytearray(b"not a wav")),
        ],
        "media_id long, kind string, payload binary",
    )
    got = {r["media_id"]: (r["ok"], r["afp"])
           for r in audio_fingerprints(media).collect()}
    assert got[1][0] and got[1][1] == got[2][1] == got[3][1]
    assert got[4] == (False, None)
    again = {r["media_id"]: r["afp"]
             for r in audio_fingerprints(media.repartition(7)).collect()}
    assert {k: v[1] for k, v in got.items()} == again


def test_afp_index_incremental_match(spark, tmp_path):
    """Incremental audio near-dup: build the fingerprint index once,
    match a new batch against it — results equal the full pairwise op
    restricted to new-vs-corpus pairs; appending folds the batch in and
    re-matching it yields no trivial self-pairs (the phash index
    contract, audio twin)."""
    from tdataframe_spark.ops.dedup import hamming_pairs
    from tdataframe_spark.ops.multimodal import (
        append_afp_index,
        audio_fingerprints,
        build_afp_index,
        match_afp_index,
    )

    corpus = spark.createDataFrame(
        [(k, "audio/wav", _wav16(_tone_clip(k))) for k in range(5)],
        "media_id long, kind string, payload binary",
    )
    idx = str(tmp_path / "afpidx")
    build_afp_index(corpus, idx)
    batch = spark.createDataFrame(
        [
            (100, "audio/wav", _wav16(_tone_clip(2) * 0.5)),  # gain copy of 2
            (101, "audio/wav",
             bytearray(_wav_bytes(_tone_clip(4).astype("<f4"), 8000,
                                  bits=32, fmt_code=3))),  # re-encode of 4
            (102, "audio/wav", _wav16(_tone_clip(50))),  # novel
        ],
        "media_id long, kind string, payload binary",
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in match_afp_index(batch, idx).collect()
    }
    union_sigs = audio_fingerprints(corpus.unionByName(batch)).filter("ok")
    full = {
        (r["id_b"], r["id_a"]): r["hamming"]
        for r in hamming_pairs(
            union_sigs, "media_id", "afp", max_distance=8, n_bits=63
        ).collect()
        if r["id_b"] >= 100 and r["id_a"] < 100
    }
    assert got == full
    assert (100, 2) in got and (101, 4) in got
    assert not any(a == 102 for a, _ in got)
    append_afp_index(batch, idx)
    again = {(r["id_a"], r["id_b"]) for r in match_afp_index(batch, idx).collect()}
    assert not any(a == b for a, b in again)
    assert (100, 2) in again


def test_video_signatures_pair_reencodes(spark):
    """video_signatures: the same frame sequence re-encoded across
    containers/codecs (MJPEG-AVI, raw-DIB AVI, GIF, lossy-quant MJPEG)
    pools to near-identical majority signatures; a different video does
    not pair; unhashable videos and sub-min_frames videos have no row."""
    from tdataframe_spark.ops.dedup import hamming_pairs
    from tdataframe_spark.ops.multimodal import video_signatures
    from tools.gif_codec import encode_gif

    pal = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255], [200, 100, 50]],
        np.uint8,
    )

    def frames(vid):
        out = []
        for f in range(6):
            tiles = (vid * 7 + 3 * f + np.arange(2 * 3)) % 5
            img = pal[tiles].reshape(2, 3, 3)
            out.append(np.repeat(np.repeat(img, 8, 0), 8, 1))
        return out

    fa = frames(1)
    yy, xx = np.mgrid[0:16, 0:24]
    fb = [
        np.stack(
            [(xx * 11 + f * 5) % 256, (yy * 23) % 256, (xx + yy * 7) % 256],
            axis=2,
        ).astype(np.uint8)
        for f in range(6)
    ]
    lossy = np.full((8, 8), 2, np.int64)
    media = spark.createDataFrame(
        [
            (1, "video/avi", bytearray(encode_avi(fa, codec="MJPG"))),
            (2, "video/avi", bytearray(encode_avi(fa, codec="DIB "))),
            (3, "video/gif", bytearray(encode_gif(fa))),
            (5, "video/avi", bytearray(encode_avi(fa, quant=lossy))),
            (4, "video/avi", bytearray(encode_avi(fb, codec="MJPG"))),
            (9, "video/mp4", bytearray(b"\x00\x00\x00\x18ftypmp42")),
        ],
        "media_id long, kind string, payload binary",
    )
    sigs = video_signatures(media)
    rows = {r["media_id"]: r for r in sigs.collect()}
    assert set(rows) == {1, 2, 3, 4, 5}  # mp4: unhashable -> no row
    assert all(r["n_frames_hashed"] == 6 for r in rows.values())
    # exact container swaps pool to the identical signature
    assert rows[1]["vsig"] == rows[2]["vsig"] == rows[3]["vsig"]
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_pairs(
            sigs, "media_id", "vsig", max_distance=8, n_bits=63
        ).collect()
    }
    assert set(pairs) == {(1, 2), (1, 3), (2, 3), (1, 5), (2, 5), (3, 5)}
    # min_frames drops videos with too few hashed frames
    few = video_signatures(media, min_frames=7)
    assert few.count() == 0


def test_audio_fingerprint_band_edges_guarded(spark):
    """review-r9: a sample rate too high for the absolute-Hz band grid
    (fewer non-DC bins under fmax than bands) classifies ok=false
    instead of silently fingerprinting over an unrelated range; an
    n_fft too small for f_bands raises at construction."""
    from tdataframe_spark.ops.multimodal import audio_fingerprints

    x = _tone_clip(1, rate=192000, seconds=0.05)
    media = spark.createDataFrame(
        [(1, "audio/wav", _wav16(x, 192000))],
        "media_id long, kind string, payload binary",
    )
    r = audio_fingerprints(media).collect()[0]
    assert (r["ok"], r["afp"]) == (False, None)
    with pytest.raises(ValueError, match="non-DC bins"):
        audio_fingerprints(media, n_fft=8, f_bands=7)


def test_index_writers_are_txn_aware(spark, tmp_path):
    """review-r9: build/append against a TRANSACTIONAL index (one a
    stream maintains) must commit through the manifest — a plain
    parquet append used to drop invisible loose files."""
    from tdataframe_spark.ops.multimodal import (
        append_phash_index,
        match_phash_index,
        phash_images,
    )
    from tdataframe_spark.sources.txn import txn_read, txn_write

    h, w = 48, 64
    yy, xx = np.mgrid[0:h, 0:w]

    def img(k):
        return np.stack(
            [(xx * (k * 13 % 200 + 5)) % 256, (yy * (k + 3) * 7) % 256,
             ((xx + yy * k) % 97 * 2.6)],
            axis=2,
        ).astype(np.uint8)

    def p6(a):
        return bytearray(f"P6\n{w} {h}\n255\n".encode() + a.tobytes())

    corpus = spark.createDataFrame(
        [(k, "image/ppm", p6(img(k))) for k in range(3)],
        "media_id long, kind string, payload binary",
    )
    idx = str(tmp_path / "txnidx")
    # seed the index AS a txn table (what the streaming sink creates)
    txn_write(
        phash_images(corpus).filter("ok").select("media_id", "phash"),
        idx, mode="overwrite",
    )
    batch = spark.createDataFrame(
        [(50, "image/ppm", p6(img(77)))],
        "media_id long, kind string, payload binary",
    )
    append_phash_index(batch, idx)
    assert txn_read(spark, idx).count() == 4  # visible through the manifest
    probe = spark.createDataFrame(
        [(500, "image/ppm", p6(np.clip(
            img(77).astype(np.int16) + 6, 0, 255).astype(np.uint8)))],
        "media_id long, kind string, payload binary",
    )
    got = {(r["id_a"], r["id_b"])
           for r in match_phash_index(probe, idx).collect()}
    assert (500, 50) in got


def _note_clip(k, rate=8000, n_fft=256, seconds=2.4, segments=18):
    """Audio fixture with ENERGY STRUCTURE: per-segment notes with an
    attack-decay envelope (peak at each segment start), tone bins
    parameterized by k as in _tone_clip — landmarks anchor at the
    attacks."""
    n = int(rate * seconds)
    t = np.arange(n, dtype=np.float64)
    seg = np.minimum((t / n * segments).astype(int), segments - 1)
    pos = t - seg * (n / segments)
    env = np.exp(-pos / (n / segments / 3.0))
    # per-segment note amplitude TOO: without it consecutive landmark
    # windows hash within a couple bits of each other and a shifted
    # alignment ties the true one in the vote
    amp = 0.25 + 0.6 * (((k * 7 + seg * 11) % 5) / 4.0)
    b = 6 + ((k * 17 + seg * (29 + 7 * k)) % 110)
    return amp * env * np.sin(2 * np.pi * b * t / n_fft)


def test_audio_landmarks_trim_robust_pairing(spark):
    """audio_landmarks + audio_landmark_pairs: a TRIMMED copy (the case
    the clip-level grid fingerprint cannot catch — its time segments are
    clip-relative) pairs with its original at the correct frame offset;
    a gain-shifted trim pairs too; unrelated clips never pair; output is
    partition-invariant."""
    from tdataframe_spark.ops.multimodal import (
        audio_landmark_pairs,
        audio_landmarks,
    )

    hop = 128
    rows = []
    for k in range(4):
        x = _note_clip(k)
        rows.append((k, "audio/wav", _wav16(x)))
    x1 = _note_clip(1)
    rows.append((401, "audio/wav", _wav16(x1[38 * hop:])))        # trim
    rows.append((402, "audio/wav", _wav16(x1[38 * hop:] * 0.7)))  # trim+gain
    rows.append((500, "audio/wav", _wav16(_note_clip(50))))       # novel
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    lms = audio_landmarks(media)
    per_clip = {r["media_id"]: r["n"] for r in
                lms.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    # trimmed clips are shorter and the amplitude NMS keeps only the
    # locally-strongest attacks
    assert all(v >= 3 for v in per_clip.values()), per_clip
    pairs = {
        (r["id_a"], r["id_b"]): (r["matches"], r["offset_frames"])
        for r in audio_landmark_pairs(lms).collect()
    }
    assert (1, 401) in pairs and pairs[(1, 401)][1] == 38
    assert (1, 402) in pairs and pairs[(1, 402)][1] == 38
    assert (401, 402) in pairs and pairs[(401, 402)][1] == 0
    assert not any(500 in p for p in pairs)
    assert not any(set(p) <= {0, 1, 2, 3} for p in pairs)
    # per-row pure function: identical under repartitioning
    again = {
        (r["id_a"], r["id_b"]): (r["matches"], r["offset_frames"])
        for r in audio_landmark_pairs(
            audio_landmarks(media.repartition(7))
        ).collect()
    }
    assert again == pairs


def test_video_frame_landmarks_trim_robust_pairing(spark):
    """video_frame_landmarks + landmark_pairs: a 3-frame-trimmed MJPEG
    copy pairs with its original at exactly offset 3; a trimmed LOSSY
    re-encode pairs too (and with the trim at 0); unrelated videos never
    pair; output is partition-invariant."""
    from tdataframe_spark.ops.multimodal import (
        landmark_pairs,
        video_frame_landmarks,
    )
    from tdataframe_spark.queries import _rand_field_frames

    lossy = np.full((8, 8), 2, np.int64)
    rows = []
    for vid in range(4):
        fs = _rand_field_frames(vid)
        rows.append((vid, "video/avi", bytearray(encode_avi(fs,
                                                            codec="MJPG"))))
    f1 = _rand_field_frames(1)
    rows.append((401, "video/avi",
                 bytearray(encode_avi(f1[3:], codec="MJPG"))))
    rows.append((501, "video/avi",
                 bytearray(encode_avi(f1[3:], quant=lossy))))
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    lms = video_frame_landmarks(media)
    per_vid = {r["media_id"]: r["n"] for r in
               lms.groupBy("media_id").agg(F.count("*").alias("n"))
               .collect()}
    # panning content changes every frame: every frame is a run start
    assert per_vid == {0: 10, 1: 10, 2: 10, 3: 10, 401: 7, 501: 7}
    pairs = {
        (r["id_a"], r["id_b"]): (r["matches"], r["offset_frames"])
        for r in landmark_pairs(lms, max_distance=8, n_bits=63).collect()
    }
    assert (1, 401) in pairs and pairs[(1, 401)] == (7, 3)
    assert (1, 501) in pairs and pairs[(1, 501)] == (7, 3)
    assert (401, 501) in pairs and pairs[(401, 501)] == (7, 0)
    assert not any(set(p) <= {0, 1, 2, 3} for p in pairs)
    # per-row pure function + per-video windows: identical under
    # repartitioning
    again = {
        (r["id_a"], r["id_b"]): (r["matches"], r["offset_frames"])
        for r in landmark_pairs(
            video_frame_landmarks(media.repartition(7)),
            max_distance=8, n_bits=63,
        ).collect()
    }
    assert again == pairs


def test_video_frame_landmarks_run_start_reduction(spark):
    """Static scenes collapse to ONE landmark (the run start) — the
    guard against k x k banded-join blowup per still scene — and a
    mid-video scene change anchors a new landmark at its frame."""
    from tdataframe_spark.ops.multimodal import video_frame_landmarks
    from tdataframe_spark.queries import _rand_field_frames

    a = _rand_field_frames(2, n=1)[0]
    b = _rand_field_frames(3, n=1)[0]
    frames = [a] * 4 + [b] * 4  # two still scenes, cut at frame 4
    media = spark.createDataFrame(
        [(9, "video/avi", bytearray(encode_avi(frames, codec="MJPG")))],
        "media_id long, kind string, payload binary",
    )
    lms = sorted(
        (r["frame_off"], r["lhash"])
        for r in video_frame_landmarks(media).collect()
    )
    assert [t for t, _ in lms] == [0, 4]
    assert lms[0][1] != lms[1][1]


def test_landmark_index_incremental_match(spark, tmp_path):
    """Trim-robust incremental near-dup: index the corpus's audio
    landmarks once, match a new batch's landmarks against it — a
    TRIMMED (+gain) copy pairs with its corpus original at the exact
    offset; novel clips do not; after appending the batch, re-matching
    yields no same-id pairs."""
    from tdataframe_spark.ops.multimodal import (
        append_landmark_index,
        audio_landmarks,
        build_landmark_index,
        match_landmark_index,
    )

    hop = 128
    corpus = spark.createDataFrame(
        [(k, "audio/wav", _wav16(_note_clip(k))) for k in range(4)],
        "media_id long, kind string, payload binary",
    )
    idx = str(tmp_path / "lmidx")
    build_landmark_index(audio_landmarks(corpus, hop=hop), idx)
    x1 = _note_clip(1)
    batch = spark.createDataFrame(
        [
            (100, "audio/wav", _wav16(x1[38 * hop:] * 0.7)),  # trim+gain of 1
            (101, "audio/wav", _wav16(_note_clip(50))),       # novel
        ],
        "media_id long, kind string, payload binary",
    )
    blms = audio_landmarks(batch, hop=hop)
    got = {
        (r["id_a"], r["id_b"]): (r["matches"], r["offset_frames"])
        for r in match_landmark_index(blms, idx, n_bits=56).collect()
    }
    assert (100, 1) in got and got[(100, 1)][1] == -38  # batch trimmed BY 38
    assert not any(a == 101 for a, _ in got)
    append_landmark_index(blms, idx)
    again = {
        (r["id_a"], r["id_b"])
        for r in match_landmark_index(blms, idx, n_bits=56).collect()
    }
    assert not any(a == b for a, b in again)
    assert (100, 1) in again


def test_landmark_index_stream_is_exactly_once(spark, tmp_path):
    """Streaming maintenance of the VIDEO landmark index: per-batch
    atomic fenced appends; a replayed batch neither double-appends nor
    commits; matching a trimmed probe against the txn index recovers
    the offset."""
    from tdataframe_spark.ops.multimodal import (
        match_landmark_index,
        video_frame_landmarks,
    )
    from tdataframe_spark.queries import _rand_field_frames
    from tdataframe_spark.sources.txn import txn_latest, txn_read
    from tdataframe_spark.streaming import (
        stream_from_files,
        stream_media_to_landmark_index,
    )
    from tests.test_exactly_once import _crash_before_checkpoint_commit

    src = str(tmp_path / "src")
    media = spark.createDataFrame(
        [(k, "video/avi",
          bytearray(encode_avi(_rand_field_frames(k), codec="MJPG")))
         for k in range(3)],
        "media_id long, kind string, payload binary",
    )
    media.repartition(3).write.parquet(src)
    batch_view = spark.read.parquet(src)
    idx, ckpt = str(tmp_path / "idx"), str(tmp_path / "ckpt")

    def run():
        stream = stream_from_files(
            spark, src, batch_view.schema, max_files_per_trigger=1
        )
        stream_media_to_landmark_index(
            stream, idx, ckpt, video_frame_landmarks
        )

    run()

    def index_rows():
        return sorted(tuple(r) for r in txn_read(spark, idx).collect())

    oneshot = sorted(
        tuple(r) for r in video_frame_landmarks(batch_view).collect()
    )
    assert index_rows() == oneshot
    v_before, m_before = txn_latest(idx)
    replayed = _crash_before_checkpoint_commit(ckpt)
    assert m_before["meta"]["batch_id"] == replayed
    run()  # restart: the commit-meta fence must skip the replayed batch
    assert index_rows() == oneshot, "replayed batch double-appended"
    assert txn_latest(idx)[0] == v_before, "replay must not commit"
    probe = spark.createDataFrame(
        [(500, "video/avi",
          bytearray(encode_avi(_rand_field_frames(2)[3:], codec="MJPG")))],
        "media_id long, kind string, payload binary",
    )
    got = {
        (r["id_a"], r["id_b"]): r["offset_frames"]
        for r in match_landmark_index(
            video_frame_landmarks(probe), idx, max_distance=8, n_bits=63
        ).collect()
    }
    assert got == {(500, 2): -3}  # probe trimmed BY 3 relative to corpus


def test_phash_canonical_dihedral_invariance(spark):
    """canonical=True pHash: all 8 dihedral transforms of a 32x32 image
    (tie-free sampling) hash BIT-IDENTICALLY; the plain hash of a
    mirror sits far away (the family it structurally misses); a
    mirrored lossless re-encode pairs; distinct images stay distant."""
    from tdataframe_spark.ops.multimodal import phash_images
    from tdataframe_spark.queries import _rand_field_frames

    base = _rand_field_frames(7, n=1, h=32, w=32)[0]
    other = _rand_field_frames(8, n=1, h=32, w=32)[0]

    def p6(a):
        a = np.ascontiguousarray(a)
        return bytearray(
            f"P6\n{a.shape[1]} {a.shape[0]}\n255\n".encode() + a.tobytes()
        )

    orbit = []
    for b in (base, base[:, ::-1]):
        for k in range(4):
            orbit.append(np.rot90(b, k))
    rows = [(i, "image/ppm", p6(t)) for i, t in enumerate(orbit)]
    rows.append((100, "image/ppm", p6(other)))
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    canon = {r["media_id"]: r["phash"]
             for r in phash_images(media, canonical=True).collect()}
    assert len({canon[i] for i in range(8)}) == 1  # bit-identical orbit
    assert canon[100] != canon[0]
    d_other = bin(canon[100] ^ canon[0]).count("1")
    assert d_other > 10, d_other
    plain = {r["media_id"]: r["phash"]
             for r in phash_images(media).collect()}
    d_mirror_plain = bin(plain[0] ^ plain[4]).count("1")
    assert d_mirror_plain > 10, d_mirror_plain  # plain pHash misses mirrors


def test_phash_trim_borders_letterbox_robust(spark):
    """trim_borders=True: letterboxed / pillarboxed / solid-padded
    copies hash BIT-IDENTICALLY to the unpadded original (the content
    pixels are identical after the deterministic peel); plain mode
    puts the letterbox far away; a near-uniform image keeps hashing
    as itself (the <8px trim guard)."""
    from tdataframe_spark.ops.multimodal import phash_images
    from tdataframe_spark.queries import _rand_field_frames

    base = _rand_field_frames(11, n=1, h=32, w=48)[0]

    def p6(a):
        a = np.ascontiguousarray(a.astype(np.uint8))
        return bytearray(
            f"P6\n{a.shape[1]} {a.shape[0]}\n255\n".encode() + a.tobytes()
        )

    letter = np.zeros((48, 48, 3), np.uint8)          # top/bottom bars
    letter[8:40] = base
    pillar = np.full((32, 72, 3), 255, np.uint8)      # white side bars
    pillar[:, 12:60] = base
    both = np.zeros((64, 80, 3), np.uint8)
    both[16:48, 16:64] = base
    flat = np.full((32, 48, 3), 128, np.uint8)
    media = spark.createDataFrame(
        [
            (0, "image/ppm", p6(base)),
            (1, "image/ppm", p6(letter)),
            (2, "image/ppm", p6(pillar)),
            (3, "image/ppm", p6(both)),
            (9, "image/ppm", p6(flat)),
        ],
        "media_id long, kind string, payload binary",
    )
    trimmed = {r["media_id"]: r["phash"]
               for r in phash_images(media, trim_borders=True).collect()}
    assert trimmed[0] == trimmed[1] == trimmed[2] == trimmed[3]
    assert trimmed[9] is not None  # flat image survives the guard
    plain = {r["media_id"]: r["phash"]
             for r in phash_images(media).collect()}
    assert bin(plain[0] ^ plain[1]).count("1") > 10  # plain misses bars
