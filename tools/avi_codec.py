"""Test-fixture AVI (RIFF) writer — pure stdlib/numpy, no media
libraries (the video-container counterpart of ``tools/gif_codec.py`` /
``tools/jpeg_codec.py``): lets the test suite and registry queries
verify the real AVI container parser
(``tdataframe_spark/ops/avi.py``) with exact roundtrips, entirely
in-sandbox.

Writes a single-video-stream AVI with either codec the parser
supports:

- ``codec="DIB "`` — uncompressed BI_RGB frames: bottom-up BGR rows,
  each row zero-padded to a 4-byte boundary (the Windows DIB layout).
- ``codec="MJPG"`` — Motion-JPEG: every frame chunk is a standalone
  baseline JPEG produced by ``tools/jpeg_codec.encode_baseline_jpeg``
  (full DHT/DQT tables in every frame, so each chunk is independently
  decodable — the spec-conformant MJPEG flavor).

The layout is the canonical RIFF tree
(``RIFF(AVI  LIST(hdrl avih LIST(strl strh strf)) LIST(movi 00db/00dc...)
idx1)``) including the optional ``idx1`` index and odd-chunk pad bytes,
so the parser's chunk walk is exercised against a structurally honest
file, not a minimal happy path.
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(listtype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", listtype + payload)


def _dib_frame(frame: np.ndarray) -> bytes:
    """HxWx3 RGB uint8 -> bottom-up BGR rows, 4-byte-aligned."""
    h, w = frame.shape[:2]
    bgr = frame[::-1, :, ::-1]  # bottom-up, RGB->BGR
    stride = (w * 3 + 3) & ~3
    out = np.zeros((h, stride), np.uint8)
    out[:, : w * 3] = bgr.reshape(h, w * 3)
    return out.tobytes()


def encode_avi(
    frames: list[np.ndarray],
    codec: str = "MJPG",
    fps: int = 10,
    quant: np.ndarray | None = None,
    audio_first: bool = False,
) -> bytes:
    """Encode HxWx3 RGB uint8 ``frames`` as an AVI.

    ``codec``: ``"MJPG"`` (baseline-JPEG chunks, ``00dc``) or
    ``"DIB "`` (raw BI_RGB chunks, ``00db``). ``quant`` is forwarded to
    the JPEG encoder (default all-ones — flat blocks roundtrip
    exactly). ``audio_first`` prepends a silent PCM audio stream so the
    VIDEO stream is stream 1 (chunk ids ``01db``/``01dc``) — the common
    interleaved-capture layout a parser hardcoding stream 0 gets wrong."""
    if codec not in ("MJPG", "DIB "):
        raise ValueError(f"codec must be 'MJPG' or 'DIB ', got {codec!r}")
    frames = [np.asarray(f, np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    if any(f.shape != frames[0].shape for f in frames):
        raise ValueError("all frames must share one shape")
    vstream = 1 if audio_first else 0
    if codec == "MJPG":
        from tools.jpeg_codec import encode_baseline_jpeg

        payloads = [encode_baseline_jpeg(f, quant=quant) for f in frames]
        ckid, compression = b"%02ddc" % vstream, b"MJPG"
        size_image = max(len(p) for p in payloads)
    else:
        payloads = [_dib_frame(f) for f in frames]
        ckid = b"%02ddb" % vstream
        compression = struct.pack("<I", 0)  # BI_RGB
        size_image = ((w * 3 + 3) & ~3) * h

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        size_image * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        len(frames),  # dwTotalFrames
        0,  # dwInitialFrames
        2 if audio_first else 1,  # dwStreams
        size_image,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + (b"MJPG" if codec == "MJPG" else b"DIB ")
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1, fps,  # dwScale, dwRate -> rate/scale = fps
            0,  # dwStart
            len(frames),  # dwLength
            size_image,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (-1: default)
            0,  # dwSampleSize (0: one sample per chunk)
            0, 0, w, h,  # rcFrame
        )
    )
    strf = struct.pack("<IiiHH", 40, w, h, 1, 24) + compression + struct.pack(
        "<IiiII", size_image, 0, 0, 0, 0
    )
    strls = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    if audio_first:
        astrh = (
            b"auds"
            + b"\x00" * 4
            + struct.pack(
                "<IHHIIIIIIII4H",
                0, 0, 0, 0, 1, 8000, 0, 0, 0, 0xFFFFFFFF, 1, 0, 0, 0, 0,
            )
        )
        # WAVEFORMATEX: PCM mono 8 kHz 16-bit
        astrf = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        strls = (
            _list(b"strl", _chunk(b"strh", astrh) + _chunk(b"strf", astrf))
            + strls
        )
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strls)
    movi_chunks = [_chunk(ckid, p) for p in payloads]
    movi = _list(b"movi", b"".join(movi_chunks))
    # idx1 offsets are relative to the start of the movi list's data
    # (i.e. position of the 'movi' fourcc), per the de-facto convention
    idx_entries, off = [], 4
    for p in payloads:
        idx_entries.append(
            ckid + struct.pack("<III", 0x10, off, len(p))  # AVIIF_KEYFRAME
        )
        off += 8 + len(p) + (len(p) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
