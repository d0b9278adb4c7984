"""Pure-stdlib/numpy GIF decode (GIF87a/GIF89a) — no image libraries.

Why it lives here: the multimodal family's contract is REAL decode
wherever the sandboxed toolchain allows (``ops/multimodal.py`` decodes
netpbm/BMP/PNG/JPEG and WAV the same way). Animated GIF is the one
sandbox-decodable ANIMATION container, so it also backs the real path
of ``sample_frames`` — per-frame extraction from an actual multi-frame
byte stream (LZW decompress, frame compositing with disposal methods),
not a payload-slice stub.

Implements, per the public GIF89a specification: logical screen
descriptor, global/local color tables, interlaced row ordering (the
8/8/4/2 four-pass scheme), graphic control extensions (frame delay,
transparency index, disposal methods 1 ``keep``/2 ``restore
background``/3 ``restore previous``), sub-block chains, and the
variable-width LZW decompressor (code widths 3..12, CLEAR/EOI codes,
deferred-clear dictionary freeze at 4096 entries).

Everything is per-payload, driver-free, and deterministic — callers run
it inside Arrow ``mapInPandas`` batches.
"""

from __future__ import annotations

import numpy as np


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF variable-width LZW: codes are packed LSB-first; the width
    grows when the next dictionary slot would not fit the current width
    and freezes at 12 bits until a CLEAR code (deferred clear)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = {i: (i,) for i in range(clear)}
    table = dict(base)
    next_code = eoi + 1
    code_size = min_code_size + 1
    out: list[int] = []
    prev: tuple | None = None
    acc = accbits = 0
    idx = 0
    n = len(data)
    while True:
        while accbits < code_size and idx < n:
            acc |= data[idx] << accbits
            accbits += 8
            idx += 1
        if accbits < code_size:
            break  # stream ended without EOI: emit what we have
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        accbits -= code_size
        if code == clear:
            table = dict(base)
            next_code = eoi + 1
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + (prev[0],)  # the KwKwK case
        else:
            raise ValueError(f"corrupt LZW stream: code {code} undefined")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return out


def _sub_blocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a GIF sub-block chain starting at ``pos``; returns
    (payload, position after the 0x00 terminator)."""
    parts = []
    while True:
        n = buf[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        parts.append(buf[pos:pos + n])
        pos += n


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif(
    buf: bytes, max_frames: int | None = None
) -> list[tuple[int, np.ndarray]]:
    """Decode the frames of a GIF payload (all, or the first
    ``max_frames`` — compositing only ever needs EARLIER frames, so the
    early exit skips the remaining LZW work entirely). Returns
    ``[(delay_centiseconds, canvas_HxWx3_uint8), ...]`` — each array is
    the FULL logical canvas after compositing that frame (what a viewer
    shows), so consumers get ready-to-use RGB frames regardless of
    per-frame sub-rectangles, transparency, or disposal methods.
    Raises ``ValueError`` on a non-GIF or structurally corrupt payload
    (truncations and undefined LZW codes are normalized to ValueError —
    callers need one except clause, per the docstring contract).
    """
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    try:
        return _decode_gif_checked(buf, max_frames)
    except ValueError:
        raise
    except (IndexError, KeyError) as e:
        # truncated headers / descriptors / undefined first codes all
        # surface as index/lookup errors from the byte walk — normalize
        raise ValueError(f"corrupt GIF payload: {e!r}") from e


def _decode_gif_checked(
    buf: bytes, max_frames: int | None
) -> list[tuple[int, np.ndarray]]:
    w = int.from_bytes(buf[6:8], "little")
    h = int.from_bytes(buf[8:10], "little")
    flags = buf[10]
    bg_index = buf[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(buf[pos:pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    bg = (
        gct[bg_index].astype(np.uint8)
        if gct is not None and bg_index < len(gct)
        else np.zeros(3, np.uint8)
    )
    canvas = np.tile(bg, (h, w, 1))
    frames: list[tuple[int, np.ndarray]] = []
    delay, transparent, disposal = 0, None, 0
    while pos < len(buf):
        block = buf[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = buf[pos]
            pos += 1
            payload, pos = _sub_blocks(buf, pos)
            if label == 0xF9 and len(payload) >= 4:  # graphic control
                gflags = payload[0]
                disposal = (gflags >> 2) & 0x07
                delay = int.from_bytes(payload[1:3], "little")
                transparent = payload[3] if gflags & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        # image descriptor
        left = int.from_bytes(buf[pos:pos + 2], "little")
        top = int.from_bytes(buf[pos + 2:pos + 4], "little")
        fw = int.from_bytes(buf[pos + 4:pos + 6], "little")
        fh = int.from_bytes(buf[pos + 6:pos + 8], "little")
        iflags = buf[pos + 8]
        pos += 9
        table = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(buf[pos:pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF frame has neither local nor global palette")
        min_code = buf[pos]
        pos += 1
        data, pos = _sub_blocks(buf, pos)
        indices = _lzw_decode(data, min_code)
        if len(indices) < fw * fh:
            raise ValueError("GIF frame pixel data truncated")
        idx = np.asarray(indices[: fw * fh], np.int32).reshape(fh, fw)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        region = canvas[top:top + fh, left:left + fw]
        saved = region.copy() if disposal == 3 else None
        rgb = table[np.clip(idx, 0, len(table) - 1)]
        if transparent is not None:
            mask = (idx != transparent)[..., None]
            region[...] = np.where(mask, rgb, region)
        else:
            region[...] = rgb
        frames.append((delay, canvas.copy()))
        if max_frames is not None and len(frames) >= max_frames:
            return frames
        if disposal == 2:  # restore background color in the frame region
            canvas[top:top + fh, left:left + fw] = bg
        elif disposal == 3 and saved is not None:  # restore previous
            canvas[top:top + fh, left:left + fw] = saved
        delay, transparent, disposal = 0, None, 0
    if not frames:
        raise ValueError("GIF payload contains no image frames")
    return frames


def gif_first_frame(buf: bytes) -> np.ndarray | None:
    """First composited frame as float HxWx3 in [0,1] (the
    ``decode_images`` parser contract), or None for non-GIF payloads."""
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    return decode_gif(buf, max_frames=1)[0][1].astype(np.float64) / 255.0
