"""Real AVI (RIFF) container parsing — pure stdlib/numpy.

The reference engine treats media as opaque columns and leaves decode
to user code (SURVEY §2: multimodal is a task-sheet extension, not a
reference operator); here the CONTAINER walk is real so
``sample_frames``/``probe_metadata`` stop stubbing video for the two
codecs a sandbox without ffmpeg can honestly handle:

- **MJPG** (Motion-JPEG): every ``00dc`` chunk is a standalone baseline
  JPEG — the frame payload is handed to the existing pure-numpy JPEG
  decoder (``ops/multimodal.decode_images``), so sample→decode→
  featurize is real end to end. (MJPEG-without-DHT — the ``AVI1``
  variant that strips Huffman tables and expects the player to inject
  defaults — is NOT reconstructed; those frames fail JPEG decode
  loudly rather than silently producing wrong pixels.)
- **BI_RGB / "DIB "** (uncompressed): bottom-up BGR rows padded to
  4-byte boundaries, converted to top-down RGB arrays.

Anything else (H.264, VP9, ...) needs codec libraries the sandbox
lacks and stays on the documented stub/raise path in ``sample_frames``.

Parsing is defensive: any structural violation returns ``None`` (the
callers fall back to their stub/raise contract) instead of raising —
corrupt bytes at 100 TB are data, not exceptions.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class AviInfo:
    width: int
    height: int
    n_frames: int
    fps: float
    fourcc: str  # "MJPG" or "DIB " (BI_RGB); others parse but don't decode
    frames: list[bytes]  # raw per-frame chunk payloads, stream 0 order


def is_avi(buf: bytes) -> bool:
    return len(buf) >= 12 and buf[:4] == b"RIFF" and buf[8:12] == b"AVI "


def _walk(buf: bytes, pos: int, end: int):
    """Yield (fourcc, listtype_or_None, data_start, data_end) for each
    chunk in [pos, end); word-aligned per RIFF."""
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        data_start = pos + 8
        data_end = data_start + size
        if data_end > end:
            return  # truncated chunk: stop at the last complete one
        if fourcc == b"LIST" and size >= 4:
            yield fourcc, buf[data_start : data_start + 4], data_start + 4, data_end
        else:
            yield fourcc, None, data_start, data_end
        pos = data_end + (size % 2)


DECODABLE_FOURCCS = ("MJPG", "DIB ")

_MAX_LIST_DEPTH = 16  # legit AVI trees are ~3 deep; a crafted payload
# nesting thousands of LISTs must not blow the executor's stack


def parse_avi(buf: bytes) -> AviInfo | None:
    """Parse an AVI payload into first-video-stream metadata + raw frame
    chunk payloads. Returns ``None`` for non-AVI or structurally broken
    input (bounded recursion — corrupt bytes at 100 TB are data, not
    exceptions). Frames are in file order; ``rec `` grouping lists
    inside ``movi`` are descended into (the interleaved-capture layout).
    The video stream's chunk id is derived from its strl POSITION, so an
    audio-first interleave (``01dc`` video chunks) parses too.

    Frame payloads are only collected for the fourccs the pipeline can
    actually decode (:data:`DECODABLE_FOURCCS`); for any other codec the
    header metadata still comes back real (``frames`` empty) without
    copying megabytes of undecodable chunk data."""
    buf = bytes(buf)
    if not is_avi(buf):
        return None
    try:
        width = height = n_frames = 0
        scale = rate = 0
        fourcc = None
        vid_stream = None  # strl ordinal of the first 'vids' stream
        frames: list[bytes] = []
        stream_ord = 0
        in_strl_video = False

        def scan(pos: int, end: int, ctx: bytes, depth: int) -> None:
            nonlocal width, height, n_frames, scale, rate, fourcc
            nonlocal vid_stream, stream_ord, in_strl_video
            if depth > _MAX_LIST_DEPTH:
                raise IndexError("LIST nesting bomb")
            vid_ck = (
                b"%02d" % vid_stream if vid_stream is not None else None
            )
            collect = fourcc in DECODABLE_FOURCCS
            for cc, listtype, ds, de in _walk(buf, pos, end):
                if cc == b"LIST":
                    if listtype in (b"hdrl", b"strl", b"movi", b"rec "):
                        scan(ds, de, listtype, depth + 1)
                        # hdrl precedes movi: stream id / fourcc may
                        # have just been learned
                        vid_ck = (
                            b"%02d" % vid_stream
                            if vid_stream is not None
                            else None
                        )
                        collect = fourcc in DECODABLE_FOURCCS
                elif cc == b"avih" and de - ds >= 40:
                    usec, _, _, _, total, _, _, _, w, h = struct.unpack_from(
                        "<10I", buf, ds
                    )
                    width, height, n_frames = w, h, total
                elif cc == b"strh" and ctx == b"strl" and de - ds >= 36:
                    # only the FIRST video stream drives the decode
                    if buf[ds : ds + 4] == b"vids" and fourcc is None:
                        in_strl_video = True
                        vid_stream = stream_ord
                        fcc = buf[ds + 4 : ds + 8]
                        scale, rate = struct.unpack_from("<II", buf, ds + 20)
                        fourcc = fcc.decode("latin1")
                    else:
                        in_strl_video = False
                    stream_ord += 1
                elif cc == b"strf" and ctx == b"strl" and in_strl_video:
                    if de - ds >= 20:
                        comp = buf[ds + 16 : ds + 20]
                        if comp == b"\x00\x00\x00\x00":
                            fourcc = "DIB "
                        else:
                            fourcc = comp.decode("latin1")
                elif (
                    collect
                    and ctx in (b"movi", b"rec ")
                    and cc[2:4] in (b"db", b"dc")
                    and cc[:2] == vid_ck
                ):
                    frames.append(buf[ds:de])

        (size,) = struct.unpack_from("<I", buf, 4)
        scan(12, min(len(buf), 8 + size), b"", 0)
        if fourcc is None or width <= 0 or height <= 0:
            return None
        if fourcc in DECODABLE_FOURCCS and not frames:
            return None  # decodable codec but no usable chunks: corrupt
        fps = (rate / scale) if scale else 0.0
        return AviInfo(width, height, n_frames or len(frames), fps,
                       fourcc, frames)
    except (struct.error, IndexError, UnicodeDecodeError, RecursionError):
        return None


def dib_to_rgb(payload: bytes, width: int, height: int) -> np.ndarray | None:
    """BI_RGB frame chunk -> HxWx3 top-down RGB uint8, or None if the
    chunk is smaller than the declared geometry (corrupt frame)."""
    stride = (width * 3 + 3) & ~3
    if len(payload) < stride * height:
        return None
    rows = np.frombuffer(payload[: stride * height], np.uint8).reshape(
        height, stride
    )
    bgr = rows[:, : width * 3].reshape(height, width, 3)
    return bgr[::-1, :, ::-1].copy()  # bottom-up -> top-down, BGR -> RGB
