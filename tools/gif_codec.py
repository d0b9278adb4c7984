"""Test-fixture GIF89a encoder — pure stdlib/numpy, no image libraries
(the GIF counterpart of ``tools/jpeg_codec.py``): lets the test suite
verify the real GIF decoder (``tdataframe_spark/ops/gif.py``) with
exact roundtrips and animation/disposal/transparency/interlace cases,
entirely in-sandbox.

Encodes: a global palette built from the frames' distinct colors
(≤256), variable-width LZW per the GIF89a spec (CLEAR emitted first,
width grows in lockstep with the decoder's dictionary, 12-bit freeze
with an explicit CLEAR on overflow), optional interlaced row order,
per-frame graphic control extensions (delay, disposal method,
transparency index), optional per-frame local color tables, and
sub-block chunking.
"""

from __future__ import annotations

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_encode(indices, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    base = {(i,): i for i in range(clear)}
    table = dict(base)
    next_code = eoi + 1
    code_size = min_code_size + 1

    out = bytearray()
    acc = accbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += width
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    emit(clear, code_size)
    w: tuple = ()
    for k in indices:
        wk = w + (int(k),)
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        table[wk] = next_code
        next_code += 1
        # the encoder's dictionary runs ONE entry ahead of the decoder's
        # (the decoder reconstructs each entry only after reading the
        # next code), so the width grows one assignment later than the
        # decoder's next_code == 2^width rule; at 4096 emit CLEAR and
        # reset both sides (never rely on deferred clear)
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        elif next_code == 4096:
            emit(clear, code_size)
            table = dict(base)
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = (int(k),)
    if w:
        emit(table[w], code_size)
    emit(eoi, code_size)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _chunks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        part = data[i:i + 255]
        out.append(len(part))
        out.extend(part)
    out.append(0)
    return bytes(out)


def _palette(frames) -> tuple[np.ndarray, dict]:
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames], axis=0), axis=0
    )
    if len(colors) > 256:
        raise ValueError(f"fixture encoder supports <=256 colors, got {len(colors)}")
    lut = {tuple(int(x) for x in c): i for i, c in enumerate(colors)}
    return colors, lut


def _table_bytes(colors: np.ndarray) -> tuple[bytes, int]:
    """Palette padded to a power-of-two size >= 2; returns (bytes, size_bits)."""
    n = 2
    bits = 0
    while n < max(2, len(colors)):
        n *= 2
        bits += 1
    pad = np.zeros((n, 3), np.uint8)
    pad[: len(colors)] = colors
    return pad.tobytes(), bits


def encode_gif(
    frames,
    delays=None,
    disposals=None,
    transparency=None,
    interlace: bool = False,
    local_tables: bool = False,
    bg_color=None,
    offsets=None,
) -> bytes:
    """Encode HxWx3 uint8 ``frames`` (all canvas-sized unless ``offsets``
    gives (left, top) per frame, in which case each frame array is its
    sub-rectangle) into an animated GIF89a byte payload.

    ``transparency``: optional per-frame RGB tuple rendered transparent
    (must be a palette color). ``disposals``: per-frame 0-3.
    ``bg_color``: background RGB (defaults to palette entry 0)."""
    frames = [np.asarray(f, np.uint8) for f in frames]
    k = len(frames)
    delays = list(delays or [0] * k)
    disposals = list(disposals or [0] * k)
    transparency = list(transparency or [None] * k)
    offsets = list(offsets or [(0, 0)] * k)
    canvas_h, canvas_w = frames[0].shape[:2]
    if offsets[0] != (0, 0):
        raise ValueError("first frame must cover the canvas at (0, 0)")

    colors, lut = _palette(frames)
    if bg_color is not None and tuple(bg_color) not in lut:
        raise ValueError("bg_color must be one of the frames' colors")
    bg_index = lut[tuple(bg_color)] if bg_color is not None else 0

    out = bytearray(b"GIF89a")
    out += canvas_w.to_bytes(2, "little") + canvas_h.to_bytes(2, "little")
    gct_bytes, gct_bits = _table_bytes(colors)
    if local_tables:
        out.append(0x00)  # no global table
        out += bytes([bg_index, 0])
    else:
        out.append(0x80 | gct_bits)
        out += bytes([bg_index, 0])
        out += gct_bytes

    for f, delay, disp, trans, (left, top) in zip(
        frames, delays, disposals, transparency, offsets
    ):
        tidx = lut[tuple(trans)] if trans is not None else None
        gflags = ((disp & 0x07) << 2) | (1 if tidx is not None else 0)
        out += bytes([0x21, 0xF9, 4, gflags])
        out += int(delay).to_bytes(2, "little")
        out += bytes([tidx if tidx is not None else 0, 0])

        fh, fw = f.shape[:2]
        out.append(0x2C)
        out += left.to_bytes(2, "little") + top.to_bytes(2, "little")
        out += fw.to_bytes(2, "little") + fh.to_bytes(2, "little")
        iflag = 0x40 if interlace else 0x00
        if local_tables:
            out.append(iflag | 0x80 | gct_bits)
            out += gct_bytes
        else:
            out.append(iflag)

        idx = np.empty((fh, fw), np.int32)
        flat = f.reshape(-1, 3)
        idx.reshape(-1)[:] = [lut[tuple(int(x) for x in px)] for px in flat]
        if interlace:
            order = [
                y
                for start, step in _INTERLACE_PASSES
                for y in range(start, fh, step)
            ]
            idx = idx[order]
        min_code = max(2, gct_bits + 1)
        out.append(min_code)
        out += _chunks(_lzw_encode(idx.reshape(-1).tolist(), min_code))
    out.append(0x3B)
    return bytes(out)
