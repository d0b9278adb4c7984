"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` payloads plus typed metadata (SURVEY.md §2.2
north star). The Spark-side machinery — schema, Arrow-batched
``mapInPandas`` pipelines, partition sizing — is real and tested. Decode:
``decode_images`` REALLY decodes netpbm (PPM/PGM), uncompressed BMP,
8-bit PNG, baseline AND progressive DCT JPEG, and GIF (pure
numpy/stdlib — header walk, canonical Huffman, IDCT, LZW; no media
libraries needed); ``decode_audio``/``audio_features`` REALLY decode
RIFF/WAV PCM (+ STFT/MFCC features); ``sample_frames`` REALLY walks
animated GIF and AVI (MJPEG / raw BI_RGB) containers (``ops/gif.py``,
``ops/avi.py``); ``phash_images`` computes DCT perceptual hashes for
image near-dup joins. The remaining stubs are ffmpeg-class compressed
video/audio codecs (`decode_stub=True` produces deterministic fake
features; `False` raises NotImplementedError). Swapping a stub for
PIL/ffmpeg is a one-function change; nothing else moves.

Scale notes: payloads never pass through the driver; ``mapInPandas``
streams Arrow batches, and ``spark.sql.files.maxPartitionBytes`` (not row
count) governs partition sizing for large binaries.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "width int, height int, n_frames int, sample_rate int"
)

FEATURE_SCHEMA = "media_id bigint, kind string, n_bytes long, feature array<double>"


def attach_payload(
    df: DataFrame, id_col: str, content_col: str, kind: str
) -> DataFrame:
    """Wrap arbitrary string/binary content as a typed media-payload frame
    (demo path: real pipelines read payload files via
    ``spark.read.format('binaryFile')``)."""
    from tdataframe_spark.core.partitioning import ensure_min_partitions

    df = ensure_min_partitions(df)
    payload = F.col(content_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def extract_features(
    media: DataFrame, dim: int = 16, decode_stub: bool = True
) -> DataFrame:
    """Decode + feature-extract media payloads via Arrow-batched
    ``mapInPandas``. With ``decode_stub=False`` this is where a real codec
    (PIL / torchaudio / ffmpeg) plugs in.

    The mapped closure is deliberately self-contained (stdlib-only, no
    module-global references) so cloudpickle ships it by value — workers
    need no importable copy of this package on their PYTHONPATH.
    """
    if not decode_stub:
        raise NotImplementedError(
            "real media decoding requires image/audio libraries not present "
            "in this environment; use decode_stub=True"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def fake_feature(payload, n):
            # deterministic stand-in feature: repeated sha256 bytes in [0,1)
            out: list[float] = []
            h = payload or b"\x00"
            while len(out) < n:
                h = hashlib.sha256(h).digest()
                out.extend(b / 256.0 for b in h)
            return out[:n]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": [fake_feature(p, dim) for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


DECODED_SCHEMA = (
    "media_id bigint, kind string, ok boolean, width int, height int, "
    "channels int, mean_channel array<double>"
)


def _image_parser():
    """Build the real image-decode dispatcher (numpy-only nested
    closures: netpbm/BMP/PNG/baseline+progressive JPEG/GIF). Shared by
    :func:`decode_images` and :func:`phash_images` — returns a
    ``parse_image(buf) -> HxWxC float array in [0,1] | None``."""
    import numpy as np

    def parse_netpbm(buf):
        # returns (arr HxWxC float in [0,1]) or None
        try:
            if buf is None or len(buf) < 10 or buf[:1] != b"P":
                return None
            magic = buf[:2]
            if magic not in (b"P5", b"P6"):
                return None
            # header = magic + 3 ints (w, h, maxval) separated by
            # whitespace/comments, then ONE whitespace byte, then raster
            pos, vals = 2, []
            while len(vals) < 3:
                while pos < len(buf) and buf[pos : pos + 1].isspace():
                    pos += 1
                if buf[pos : pos + 1] == b"#":  # comment to EOL
                    while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                        pos += 1
                    continue
                start = pos
                while pos < len(buf) and not buf[pos : pos + 1].isspace():
                    pos += 1
                vals.append(int(buf[start:pos]))
            pos += 1  # the single whitespace after maxval
            w, h, maxval = vals
            ch = 3 if magic == b"P6" else 1
            if not (0 < w and 0 < h and 0 < maxval < 65536):
                return None
            dtype = np.uint8 if maxval < 256 else ">u2"
            need = w * h * ch * (1 if maxval < 256 else 2)
            raster = buf[pos : pos + need]
            if len(raster) != need:
                return None
            arr = np.frombuffer(raster, dtype=dtype).reshape(h, w, ch)
            return arr.astype(np.float64) / maxval
        except Exception:
            return None

    def parse_bmp(buf):
        # uncompressed BI_RGB 24/32-bit BMP → HxWx3 float in [0,1]
        try:
            if buf is None or len(buf) < 54 or buf[:2] != b"BM":
                return None
            data_off = int.from_bytes(buf[10:14], "little")
            w = int.from_bytes(buf[18:22], "little", signed=True)
            h = int.from_bytes(buf[22:26], "little", signed=True)
            bits = int.from_bytes(buf[28:30], "little")
            compression = int.from_bytes(buf[30:34], "little")
            if compression != 0 or bits not in (24, 32) or w <= 0 or h == 0:
                return None
            top_down, h_abs = h < 0, abs(h)
            bpp = bits // 8
            stride = (w * bpp + 3) & ~3  # rows pad to 4 bytes
            need = stride * h_abs
            raster = buf[data_off : data_off + need]
            if len(raster) != need:
                return None
            rows_ = np.frombuffer(raster, dtype=np.uint8).reshape(h_abs, stride)
            px = rows_[:, : w * bpp].reshape(h_abs, w, bpp)
            if not top_down:
                px = px[::-1]  # BMP stores bottom-up by default
            rgb = px[:, :, 2::-1]  # BGR(A) → RGB
            return rgb.astype(np.float64) / 255.0
        except Exception:
            return None

    def parse_png(buf):
        # real PNG decode: stdlib zlib + scanline unfiltering. 8-bit
        # non-interlaced gray/gray+alpha/RGB/RGBA (the overwhelmingly
        # common cases); anything else classifies ok=false.
        try:
            import zlib

            if buf is None or buf[:8] != b"\x89PNG\r\n\x1a\n":
                return None
            pos, ihdr, idat = 8, None, b""
            while pos + 8 <= len(buf):
                ln = int.from_bytes(buf[pos : pos + 4], "big")
                typ = buf[pos + 4 : pos + 8]
                data = buf[pos + 8 : pos + 8 + ln]
                if typ == b"IHDR":
                    ihdr = data
                elif typ == b"IDAT":
                    idat += data
                elif typ == b"IEND":
                    break
                pos += 12 + ln  # len + type + data + crc
            if ihdr is None or not idat:
                return None
            w = int.from_bytes(ihdr[0:4], "big")
            h = int.from_bytes(ihdr[4:8], "big")
            depth, ctype, comp, filt, interlace = ihdr[8:13]
            ch = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
            if depth != 8 or ch is None or comp or filt or interlace:
                return None
            raw = zlib.decompress(idat)
            stride = w * ch
            if len(raw) != h * (stride + 1):
                return None
            out = np.zeros((h, stride), dtype=np.uint8)
            for y in range(h):
                f = raw[y * (stride + 1)]
                line = bytearray(
                    raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
                )
                prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
                if f == 0:
                    pass
                elif f == 2:  # Up
                    line = bytearray(
                        (np.frombuffer(bytes(line), np.uint8) + prev).astype(
                            np.uint8
                        ).tobytes()
                    )
                else:  # Sub/Average/Paeth need the prior pixel: per byte
                    for i in range(stride):
                        a = line[i - ch] if i >= ch else 0
                        b = int(prev[i])
                        c = int(prev[i - ch]) if i >= ch else 0
                        if f == 1:
                            line[i] = (line[i] + a) & 0xFF
                        elif f == 3:
                            line[i] = (line[i] + (a + b) // 2) & 0xFF
                        elif f == 4:
                            p = a + b - c
                            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                            line[i] = (line[i] + pred) & 0xFF
                        else:
                            return None
                out[y] = np.frombuffer(bytes(line), np.uint8)
            return out.reshape(h, w, ch).astype(np.float64) / 255.0
        except Exception:
            return None

    def parse_jpeg(buf):
        # real baseline-DCT AND progressive-DCT JPEG decode in pure
        # numpy/stdlib: marker walk (DQT/SOF0-2/DHT/DRI/SOS),
        # canonical Huffman, restart segments, progressive spectral
        # selection + successive approximation (DC/AC first + refine
        # scans with EOB runs, T.81 G.1.2 / the libjpeg jdphuff
        # algorithms), dequant + dezigzag + 8x8 IDCT, chroma
        # upsample, YCbCr→RGB. Arithmetic-coded, 12-bit, hierarchical
        # and CMYK payloads return None (→ ok=false) — honest partial
        # coverage; baseline + progressive cover the web corpus.
        # Correctness-first (python per-coefficient bit loop):
        # production swaps in libjpeg via PIL, one function change.
        try:
            if buf is None or buf[:2] != b"\xff\xd8":
                return None
            ZZ = [
                0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
                12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14,
                21, 28, 35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23,
                30, 37, 44, 51, 58, 59, 52, 45, 38, 31, 39, 46, 53, 60,
                61, 54, 47, 55, 62, 63,
            ]

            def split_entropy(start):
                """Unstuff FF00 and split at restart markers from
                ``start``; returns (segments, position of the next
                marker)."""
                segments, cur, i = [], bytearray(), start
                while i < len(buf):
                    b = buf[i]
                    if b == 0xFF:
                        nb = buf[i + 1] if i + 1 < len(buf) else 0xD9
                        if nb == 0x00:
                            cur.append(0xFF)
                            i += 2
                            continue
                        if 0xD0 <= nb <= 0xD7:
                            segments.append(bytes(cur))
                            cur = bytearray()
                            i += 2
                            continue
                        break  # EOI / next marker
                    cur.append(b)
                    i += 1
                segments.append(bytes(cur))
                return segments, i

            qt, huff, comps, sel = {}, {}, None, None
            w = h = dri = 0
            progressive = False
            prog_scans = []
            scan = None
            pos = 2
            while pos + 4 <= len(buf):
                if buf[pos] != 0xFF:
                    pos += 1
                    continue
                while pos + 1 < len(buf) and buf[pos + 1] == 0xFF:
                    pos += 1  # fill bytes
                marker = buf[pos + 1]
                if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
                    pos += 2
                    continue
                if marker == 0xD9:  # EOI
                    break
                seg_len = int.from_bytes(buf[pos + 2:pos + 4], "big")
                data = buf[pos + 4:pos + 2 + seg_len]
                if marker == 0xDB:  # DQT (possibly several tables)
                    i = 0
                    while i < len(data):
                        pq, tq = data[i] >> 4, data[i] & 15
                        i += 1
                        if pq == 0:
                            tbl = np.frombuffer(
                                data[i:i + 64], np.uint8
                            ).astype(np.int64)
                            i += 64
                        else:
                            tbl = np.frombuffer(
                                data[i:i + 128], ">u2"
                            ).astype(np.int64)
                            i += 128
                        if len(tbl) != 64:
                            return None
                        qt[tq] = tbl
                elif marker == 0xC2:  # progressive DCT
                    progressive = True
                    if data[0] != 8:
                        return None  # 12-bit precision unsupported
                    h = int.from_bytes(data[1:3], "big")
                    w = int.from_bytes(data[3:5], "big")
                    nc = data[5]
                    if nc not in (1, 3) or w == 0 or h == 0:
                        return None
                    comps = [
                        {
                            "id": data[6 + 3 * ci],
                            "h": data[7 + 3 * ci] >> 4,
                            "v": data[7 + 3 * ci] & 15,
                            "tq": data[8 + 3 * ci],
                        }
                        for ci in range(nc)
                    ]
                    if any(
                        c["h"] not in (1, 2, 4) or c["v"] not in (1, 2, 4)
                        for c in comps
                    ):
                        return None
                elif marker in (0xC0, 0xC1):  # baseline/ext sequential
                    if data[0] != 8:
                        return None  # 12-bit precision unsupported
                    h = int.from_bytes(data[1:3], "big")
                    w = int.from_bytes(data[3:5], "big")
                    nc = data[5]
                    if nc not in (1, 3) or w == 0 or h == 0:
                        return None
                    comps = [
                        {
                            "id": data[6 + 3 * ci],
                            "h": data[7 + 3 * ci] >> 4,
                            "v": data[7 + 3 * ci] & 15,
                            "tq": data[8 + 3 * ci],
                        }
                        for ci in range(nc)
                    ]
                    if any(
                        c["h"] not in (1, 2, 4) or c["v"] not in (1, 2, 4)
                        for c in comps
                    ):
                        return None
                elif marker == 0xC4:  # DHT (possibly several tables)
                    i = 0
                    while i + 17 <= len(data):
                        tc, th = data[i] >> 4, data[i] & 15
                        counts = list(data[i + 1:i + 17])
                        i += 17
                        n = sum(counts)
                        vals = data[i:i + n]
                        i += n
                        code, k, table = 0, 0, {}
                        for ln in range(1, 17):
                            for _ in range(counts[ln - 1]):
                                table[(ln, code)] = vals[k]
                                k += 1
                                code += 1
                            code <<= 1
                        huff[(tc, th)] = table
                elif marker == 0xDD:
                    dri = int.from_bytes(data[0:2], "big")
                elif marker == 0xDA:  # SOS
                    ns = data[0]
                    sel = [
                        (data[1 + 2 * i], data[2 + 2 * i] >> 4,
                         data[2 + 2 * i] & 15)
                        for i in range(ns)
                    ]
                    if progressive:
                        ss, se = data[1 + 2 * ns], data[2 + 2 * ns]
                        ahal = data[3 + 2 * ns]
                        segments, nxt = split_entropy(pos + 2 + seg_len)
                        # Huffman tables and DRI may be redefined
                        # between scans — snapshot them per scan
                        prog_scans.append(
                            (sel, ss, se, ahal >> 4, ahal & 15,
                             segments, dict(huff), dri)
                        )
                        pos = nxt
                        continue
                    scan, _ = split_entropy(pos + 2 + seg_len)
                    break
                elif 0xC0 <= marker <= 0xCF:  # arithmetic/hierarchical
                    return None
                pos += 2 + seg_len
            class Rd:
                __slots__ = ("d", "p")

                def __init__(self, d):
                    self.d, self.p = d, 0

                def bit(self):
                    p = self.p
                    self.p = p + 1
                    return (self.d[p >> 3] >> (7 - (p & 7))) & 1

                def bits(self, n):
                    v = 0
                    for _ in range(n):
                        v = (v << 1) | self.bit()
                    return v

                def symbol(self, table):
                    code = 0
                    for ln in range(1, 17):
                        code = (code << 1) | self.bit()
                        s = table.get((ln, code))
                        if s is not None:
                            return s
                    raise ValueError("bad huffman code")

            def extend(v, s):
                return v - ((1 << s) - 1) if v < (1 << (s - 1)) else v

            u8 = np.arange(8)
            A = np.cos(
                (2 * u8[None, :] + 1) * u8[:, None] * np.pi / 16
            ) * np.where(u8[:, None] == 0, (1 / 8) ** 0.5, 0.5)
            zz_idx = np.array(ZZ)

            def read_block(rd, dctab, actab, q, pred):
                """One entropy-coded 8x8 data unit → (pixel block,
                new DC predictor)."""
                zz = np.zeros(64, np.int64)
                s = rd.symbol(dctab)
                diff = extend(rd.bits(s), s) if s else 0
                pred += diff
                zz[0] = pred
                k = 1
                while k < 64:
                    rs = rd.symbol(actab)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("AC overrun")
                    zz[k] = extend(rd.bits(s), s)
                    k += 1
                nat = np.zeros(64, np.float64)
                nat[zz_idx] = zz * q
                return A.T @ nat.reshape(8, 8) @ A + 128.0, pred

            def finish(full):
                if len(full) == 1:
                    out = full[0][:, :, None]
                else:
                    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
                    out = np.stack(
                        [
                            y + 1.402 * cr,
                            y - 0.344136 * cb - 0.714136 * cr,
                            y + 1.772 * cb,
                        ],
                        axis=2,
                    )
                return np.clip(np.round(out), 0, 255) / 255.0

            def decode_progressive():
                # T.81 G.1.2 / libjpeg jdphuff: coefficients accumulate
                # across scans (spectral selection Ss..Se, successive
                # approximation Ah/Al with EOB runs), then one final
                # dequant + IDCT pass per component
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                coef = [
                    np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int64)
                    for c in comps
                ]
                rd = None
                preds = [0] * len(comps)
                eobrun = 0

                def decode_unit(blk, ci, td, ta, dc_scan, ss, se, ah, al, htab):
                    nonlocal eobrun
                    p1 = 1 << al
                    if dc_scan:
                        if ah == 0:  # DC first
                            s = rd.symbol(htab[(0, td)])
                            diff = extend(rd.bits(s), s) if s else 0
                            preds[ci] += diff
                            blk[0] = preds[ci] << al
                        elif rd.bit():  # DC refine: append one bit
                            blk[0] = int(blk[0]) | p1
                        return
                    actab = htab[(1, ta)]
                    if ah == 0:  # AC first
                        if eobrun > 0:
                            eobrun -= 1
                            return
                        k = ss
                        while k <= se:
                            rs = rd.symbol(actab)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += rd.bits(r)
                                return
                            k += r
                            if k > se:
                                raise ValueError("AC overrun")
                            blk[k] = extend(rd.bits(s), s) * p1
                            k += 1
                        return
                    # AC refine: new ±1-at-this-precision coefficients
                    # interleave with correction bits for coefficients
                    # that are already nonzero (the jdphuff loop)
                    m1 = -p1
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = rd.symbol(actab)
                            r, s = rs >> 4, rs & 15
                            val = 0
                            if s == 0:
                                if r < 15:  # EOBn — note: unlike the
                                    # first-scan case there is no -1
                                    # here; the current block's tail
                                    # still consumes one decrement
                                    # below (jdphuff semantics)
                                    eobrun = 1 << r
                                    if r:
                                        eobrun += rd.bits(r)
                                    break
                                # r == 15: skip 16 zero-history coefs
                            else:
                                if s != 1:
                                    raise ValueError("bad refine symbol")
                                val = p1 if rd.bit() else m1
                            while k <= se:
                                if blk[k] != 0:
                                    if rd.bit() and (int(blk[k]) & p1) == 0:
                                        blk[k] += p1 if blk[k] >= 0 else m1
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if val and k <= se:
                                blk[k] = val
                            k += 1
                    if eobrun > 0:
                        # EOB region: correction bits only
                        while k <= se:
                            if blk[k] != 0:
                                if rd.bit() and (int(blk[k]) & p1) == 0:
                                    blk[k] += p1 if blk[k] >= 0 else m1
                            k += 1
                        eobrun -= 1

                for sel_s, ss, se, ah, al, segs, htab, dri_s in prog_scans:
                    order_s = []
                    for cs, td, ta in sel_s:
                        ci = next(
                            (i for i, c in enumerate(comps)
                             if c["id"] == cs),
                            None,
                        )
                        if ci is None:
                            raise ValueError("unknown scan component")
                        order_s.append((ci, td, ta))
                    dc_scan = ss == 0
                    if dc_scan and se != 0:
                        raise ValueError("DC scan must have Se=0")
                    if not dc_scan and len(order_s) != 1:
                        raise ValueError("AC scans are single-component")
                    rd = Rd(segs[0])
                    seg_idx = 0
                    preds = [0] * len(comps)
                    eobrun = 0

                    def restart(m):
                        nonlocal rd, seg_idx, preds, eobrun
                        if dri_s and m and m % dri_s == 0:
                            seg_idx += 1
                            rd = Rd(segs[seg_idx])
                            preds = [0] * len(comps)
                            eobrun = 0

                    if len(order_s) > 1:  # interleaved (DC scans only)
                        for m in range(mcux * mcuy):
                            restart(m)
                            my, mx = divmod(m, mcux)
                            for ci, td, ta in order_s:
                                c = comps[ci]
                                for by in range(c["v"]):
                                    for bx in range(c["h"]):
                                        decode_unit(
                                            coef[ci][my * c["v"] + by,
                                                     mx * c["h"] + bx],
                                            ci, td, ta, dc_scan,
                                            ss, se, ah, al, htab,
                                        )
                    else:
                        # non-interleaved: the component's TRUE block
                        # grid (ceil(comp_dim/8)), not the MCU-padded
                        # one — padding blocks are never coded
                        ci, td, ta = order_s[0]
                        c = comps[ci]
                        cw = -(-(w * c["h"]) // hmax)
                        ch_ = -(-(h * c["v"]) // vmax)
                        bw_, bh_ = -(-cw // 8), -(-ch_ // 8)
                        for m in range(bw_ * bh_):
                            restart(m)
                            by, bx = divmod(m, bw_)
                            decode_unit(
                                coef[ci][by, bx], ci, td, ta, dc_scan,
                                ss, se, ah, al, htab,
                            )

                full = []
                for ci, c in enumerate(comps):
                    bh_p, bw_p = coef[ci].shape[:2]
                    nat = np.zeros((bh_p, bw_p, 64), np.float64)
                    nat[:, :, zz_idx] = coef[ci] * qt[c["tq"]]
                    blocks = nat.reshape(bh_p, bw_p, 8, 8)
                    pix = np.einsum(
                        "ij,abjk,kl->abil", A.T, blocks, A
                    ) + 128.0
                    plane = pix.transpose(0, 2, 1, 3).reshape(
                        bh_p * 8, bw_p * 8
                    )
                    full.append(
                        np.repeat(
                            np.repeat(plane, vmax // c["v"], axis=0),
                            hmax // c["h"],
                            axis=1,
                        )[:h, :w]
                    )
                return finish(full)

            if progressive:
                if comps is None or not qt or not prog_scans:
                    return None
                return decode_progressive()
            if scan is None or comps is None or not qt or sel is None:
                return None
            if len(sel) != len(comps):
                return None  # multi-scan: not baseline
            order = []
            for cs, td, ta in sel:
                c = next((c for c in comps if c["id"] == cs), None)
                if c is None or c["tq"] not in qt:
                    return None
                if (0, td) not in huff or (1, ta) not in huff:
                    return None
                order.append((c, td, ta))
            segments = scan  # already unstuffed + restart-split

            if len(order) == 1:
                # T.81 A.2: a single-component scan is NON-interleaved
                # — the MCU is ONE 8x8 data unit and the declared
                # sampling factors are ignored (a grayscale file
                # declaring 2x2 factors still lays out ceil(w/8) x
                # ceil(h/8) blocks; treating it as interleaved would
                # desync the bitstream)
                c, td, ta = order[0]
                dctab, actab = huff[(0, td)], huff[(1, ta)]
                q = qt[c["tq"]]
                bw, bh = -(-w // 8), -(-h // 8)
                plane = np.zeros((bh * 8, bw * 8), np.float64)
                rd = Rd(segments[0])
                seg_idx, pred = 0, 0
                for m in range(bw * bh):
                    if dri and m and m % dri == 0:
                        seg_idx += 1
                        rd = Rd(segments[seg_idx])
                        pred = 0
                    my, mx = divmod(m, bw)
                    pix, pred = read_block(rd, dctab, actab, q, pred)
                    plane[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = pix
                full = [plane[:h, :w]]
            else:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                planes = [
                    np.zeros(
                        (mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64
                    )
                    for c in comps
                ]
                rd = Rd(segments[0])
                seg_idx = 0
                preds = [0] * len(comps)
                for m in range(mcux * mcuy):
                    if dri and m and m % dri == 0:
                        seg_idx += 1
                        rd = Rd(segments[seg_idx])
                        preds = [0] * len(comps)
                    my, mx = divmod(m, mcux)
                    for ci, (c, td, ta) in enumerate(order):
                        dctab, actab = huff[(0, td)], huff[(1, ta)]
                        q = qt[c["tq"]]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                pix, preds[ci] = read_block(
                                    rd, dctab, actab, q, preds[ci]
                                )
                                y0 = (my * c["v"] + by) * 8
                                x0 = (mx * c["h"] + bx) * 8
                                planes[ci][y0:y0 + 8, x0:x0 + 8] = pix
                full = []
                for ci, c in enumerate(comps):
                    p = np.repeat(
                        np.repeat(planes[ci], vmax // c["v"], axis=0),
                        hmax // c["h"],
                        axis=1,
                    )[:h, :w]
                    full.append(p)
            return finish(full)
        except Exception:
            return None

    def parse_gif(buf):
        # shared with sample_frames' real path; imported inside the
        # closure so the pickled closure itself stays self-contained
        from tdataframe_spark.ops.gif import gif_first_frame

        try:
            return gif_first_frame(bytes(buf))
        except Exception:
            return None  # corrupt GIF: classify ok=false, don't raise

    def parse_image(buf):
        for p in (parse_netpbm, parse_bmp, parse_png, parse_jpeg, parse_gif):
            arr = p(buf)
            if arr is not None:
                return arr
        return None

    return parse_image


def decode_images(media: DataFrame, resize_to: int | None = None) -> DataFrame:
    """REAL image decode, pure numpy/stdlib, no media libraries: netpbm
    (PPM ``P6`` / PGM ``P5``), uncompressed 24/32-bit BI_RGB BMP
    (bottom-up or top-down, BGR(A)→RGB, 4-byte row padding), 8-bit
    non-interlaced PNG (zlib + scanline unfiltering), both baseline
    AND progressive DCT JPEG (marker walk, canonical Huffman, spectral
    selection + successive approximation with EOB runs, dequant + IDCT,
    4:2:0/4:2:2 chroma upsample, restart markers, YCbCr→RGB), and
    GIF87a/89a (LZW, interlace, transparency — first composited frame;
    ``ops/gif.py``, also the real path of :func:`sample_frames`). This
    is the non-stub counterpart of ``extract_features``: for payloads in
    a format the sandbox can parse, the decode→resize→feature path is
    fully real; remaining formats (arithmetic/12-bit/hierarchical JPEG,
    WebP/...) come back ``ok=false`` rather than raising, so one pass
    classifies and decodes a mixed corpus.

    ``resize_to``: optional square nearest-neighbour downsample applied
    before feature computation (numpy index slicing — the shape of a real
    resize stage without an interpolation library).

    Output per payload: parsed (width, height, channels) and the per-channel
    pixel mean in [0,1] — a real, deterministic image statistic usable as a
    trivial embedding. Arrow-batched ``mapInPandas``; the decoder lives in
    the module-level :func:`_image_parser` (shared with phash_images), so
    executors import this package — the same requirement sample_frames'
    GIF/AVI paths already have.
    """

    def run(batches):
        import numpy as np
        import pandas as pd

        parse_image = _image_parser()


        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                arr = parse_image(r["payload"])
                if arr is None:
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "kind": r["kind"],
                            "ok": False,
                            "width": None,
                            "height": None,
                            "channels": None,
                            "mean_channel": None,
                        }
                    )
                    continue
                h0, w0 = arr.shape[0], arr.shape[1]
                if resize_to is not None:
                    yi = np.linspace(0, h0 - 1, resize_to).round().astype(int)
                    xi = np.linspace(0, w0 - 1, resize_to).round().astype(int)
                    arr = arr[yi][:, xi]
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "kind": r["kind"],
                        "ok": True,
                        "width": w0,
                        "height": h0,
                        "channels": arr.shape[2],
                        "mean_channel": [float(x) for x in arr.mean(axis=(0, 1))],
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, DECODED_SCHEMA)


_PHASH_LUM_BITS = 16  # thermometer-coded global luminance bits


def phash_images(
    media: DataFrame,
    resize: int = 32,
    block: int = 8,
    passthrough: tuple = (),
    canonical: bool = False,
    trim_borders: bool = False,
) -> DataFrame:
    """DCT perceptual hash (pHash) per image payload — the multimodal
    near-dup key: decode (real, :func:`_image_parser`), grayscale,
    deterministic ``resize``×``resize`` downsample, orthonormal 2-D
    DCT-II, keep the ``block``×``block`` low-frequency corner, threshold
    each AC coefficient against their median. The low 47 bits are those
    AC signs; the top 16 are THERMOMETER-CODED global luminance
    (17 levels — level k sets the lowest k of them), so two FLAT images
    of different shade still differ proportionally to their brightness
    gap (median-of-AC alone hashes every uniform image to the same
    value, merging black with white and hiding solid-frame scene cuts).
    The thermometer code makes luminance Hamming distance monotone in
    the level gap; a mild brightness shift crosses at most one level
    (one bit). 63 bits total — fits a signed long.

    Re-encodes, mild brightness/contrast shifts, and small crops move
    few bits, so near-duplicate images sit at small Hamming distance;
    pair them with :func:`tdataframe_spark.ops.dedup.hamming_pairs`
    (banded pigeonhole join — never all-pairs).

    ``canonical=True`` makes the hash DIHEDRAL-INVARIANT: it is the
    minimum over the 8 flip/rotation transforms of the downsampled
    grayscale (the luminance thermometer is transform-invariant
    already — the mean doesn't move), so a mirrored or 90°/180°/270°-
    rotated re-post hashes IDENTICALLY to its original and a mirrored
    re-encode still lands within the banded join's radius. Cost: 8
    tiny ``resize``×``resize`` DCTs per image instead of 1 — noise
    next to the decode. Plain and canonical hashes live in different
    spaces; never mix them in one index.

    ``trim_borders=True`` strips uniform margins (letterbox/pillarbox
    bars, solid padding, watermark strips on flat bands) BEFORE the
    downsample: border rows/cols whose max-min grayscale spread stays
    within a small tolerance peel off deterministically, so a padded
    re-post hashes like its unpadded original (bit-identical when the
    recovered content is pixel-identical). A trim that would leave
    less than 8px on either axis is rejected wholesale (near-uniform
    images must keep hashing as themselves). Same different-space
    caveat as ``canonical`` — index and probe must agree on the flag.

    ``passthrough``: input columns copied verbatim to the output (e.g.
    a frame index riding next to media_id — safer than packing two ids
    into one long, which breaks on negative/large ids).

    Per-row pure function of the payload bytes → bit-deterministic
    under any partitioning. Undecodable payloads come back ``ok=false``
    with a NULL hash. Arrow-batched ``mapInPandas``."""
    if block < 2 or resize < block:
        raise ValueError(f"need 2<=block<=resize, got {block}/{resize}")
    n_ac = min(block * block - 1, 63 - _PHASH_LUM_BITS)

    extra = ", ".join(
        f"{c} {media.schema[c].dataType.simpleString()}" for c in passthrough
    )
    schema = "media_id bigint, kind string, ok boolean, phash long" + (
        f", {extra}" if extra else ""
    )

    def run(batches):
        import numpy as np
        import pandas as pd

        parse_image = _image_parser()
        n = resize
        # orthonormal DCT-II matrix: D = C @ g @ C.T
        C = np.cos(
            np.pi / n * (np.arange(n)[None, :] + 0.5) * np.arange(n)[:, None]
        ) * np.sqrt(2.0 / n)
        C[0] *= np.sqrt(0.5)
        levels = _PHASH_LUM_BITS + 1

        def hash_gray(gs):
            d = C @ gs @ C.T
            # 9-dp quantization before the median threshold: BLAS dgemm
            # blocking can differ ulps across worker processes, and two
            # near-equal coefficients straddling the median RANK would
            # otherwise swap identities and flip their bits (observed)
            vals = np.round(
                d[:block, :block].flatten()[1 : 1 + n_ac], 9
            )  # drop DC, keep the lowest-frequency AC block
            med = np.median(vals)
            h = 0
            for i, v in enumerate(vals):
                if v > med:
                    h |= 1 << i
            lum = min(
                int(round(float(gs.mean()), 9) * levels), levels - 1
            )
            h |= ((1 << lum) - 1) << n_ac  # thermometer code
            return h

        def trim(g, tol=2.0 / 255.0):
            # peel border rows/cols whose grayscale spread is within
            # tol (uniform bars; JPEG ringing stays under ~2 of 255
            # levels on flat bands — the decoder normalizes to [0, 1]).
            # Pure per-line max-min: deterministic.
            t, b = 0, g.shape[0]
            while t < b and np.ptp(g[t]) <= tol:
                t += 1
            while b > t and np.ptp(g[b - 1]) <= tol:
                b -= 1
            if b - t < 8:
                return g  # near-uniform image: keep hashing as itself
            l, r = 0, g.shape[1]
            while l < r and np.ptp(g[t:b, l]) <= tol:
                l += 1
            while r > l and np.ptp(g[t:b, r - 1]) <= tol:
                r -= 1
            if r - l < 8:
                return g
            return g[t:b, l:r]

        def phash(buf):
            arr = parse_image(buf)
            if arr is None:
                return None
            g = arr.mean(axis=2) if arr.ndim == 3 else arr
            if trim_borders:
                g = trim(g)
            yi = np.linspace(0, g.shape[0] - 1, n).round().astype(int)
            xi = np.linspace(0, g.shape[1] - 1, n).round().astype(int)
            gs = g[yi][:, xi]
            if not canonical:
                return hash_gray(gs)
            # min over the dihedral group D4: identity/rot90/180/270 ×
            # {unflipped, mirrored} — the same set for every member of
            # an orbit, so the min is orbit-invariant by construction
            return min(
                hash_gray(t)
                for base in (gs, gs[:, ::-1])
                for t in (base, np.rot90(base, 1), np.rot90(base, 2),
                          np.rot90(base, 3))
            )

        for pdf in batches:
            hashes = [phash(p) for p in pdf["payload"]]
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "ok": [h is not None for h in hashes],
                # nullable Int64, NOT a plain object/int column: a
                # batch mixing None (undecodable) with large hashes
                # would promote to float64 and round away low bits
                # (observed: ...784 -> ...272, partition-dependent)
                "phash": pd.array(hashes, dtype="Int64"),
            }
            for c in passthrough:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema)


def _write_sig_index(sigs: DataFrame, index_path: str, mode: str) -> None:
    """Write/extend a signature index. On a TRANSACTIONAL index (one a
    ``stream_media_to_*_index`` stream maintains) this commits through
    the manifest — a plain ``.parquet(path)`` append there would drop
    loose part files txn_read never lists (silently invisible to every
    matcher), and a plain overwrite would destroy the manifest dir."""
    from tdataframe_spark.sources.txn import is_txn_table, txn_write

    if is_txn_table(index_path):
        txn_write(sigs, index_path, mode=mode)
    else:
        sigs.write.mode(mode).parquet(index_path)


def _read_sig_index(spark, index_path: str, sig_col: str) -> DataFrame:
    """Read a signature index written either as plain parquet
    (build_*/append_* one-shot jobs) or as the transactional table a
    ``stream_media_to_*_index`` stream maintains (snapshot-isolated
    against in-flight appends)."""
    from tdataframe_spark.sources.txn import is_txn_table, txn_read

    if is_txn_table(index_path):
        return txn_read(spark, index_path).select("media_id", sig_col)
    return spark.read.schema(f"media_id bigint, {sig_col} bigint").parquet(
        index_path
    )


def build_phash_index(
    media: DataFrame, index_path: str, resize: int = 32, block: int = 8
) -> None:
    """Persist the corpus's perceptual-hash signatures as the IMAGE
    near-dup index: one decode+hash pass, one small parquet of
    (media_id, phash). New batches then match via
    :func:`match_phash_index` without re-hashing (or re-reading) the
    corpus — the incremental-index twin the text family already has
    (build_minhash_index / semdedup_build / ivf_build)."""
    _write_sig_index(
        phash_images(media, resize=resize, block=block).filter("ok").select(
            "media_id", "phash"
        ),
        index_path, "overwrite",
    )


def append_phash_index(
    media: DataFrame, index_path: str, resize: int = 32, block: int = 8
) -> None:
    """Fold a new batch's signatures into the persisted index (append —
    signatures are immutable per payload)."""
    _write_sig_index(
        phash_images(media, resize=resize, block=block).filter("ok").select(
            "media_id", "phash"
        ),
        index_path, "append",
    )


def match_phash_index(
    new_media: DataFrame,
    index_path: str,
    max_distance: int = 10,
    resize: int = 32,
    block: int = 8,
) -> DataFrame:
    """Match a NEW batch of images against the persisted pHash index:
    hash only the batch, then the cross-set banded Hamming join
    (``hamming_pairs(other=...)`` — the batch takes the expanded-key
    side, so join fan-out scales with the batch, never the corpus).
    Returns (id_a = batch id, id_b = corpus id, hamming). The streaming
    ingestion shape for image dedup at 100 TB: index once, match every
    arriving batch — and when the index is the TRANSACTIONAL table a
    ``stream_media_to_phash_index`` stream maintains, the read is
    snapshot-isolated against in-flight appends."""
    from tdataframe_spark.ops.dedup import hamming_pairs

    spark = new_media.sparkSession
    idx = _read_sig_index(spark, index_path, "phash")
    new_sigs = phash_images(new_media, resize=resize, block=block).filter(
        "ok"
    ).select("media_id", "phash")
    return hamming_pairs(
        idx, "media_id", "phash",
        max_distance=max_distance, n_bits=63, other=new_sigs,
    )


def shot_boundaries(
    media: DataFrame,
    every_n: int = 1,
    cut_distance: int = 12,
    decode_stub: bool = True,
) -> DataFrame:
    """Scene-cut detection over video payloads: REAL frame fan-out
    (:func:`sample_frames` — GIF / MJPEG-AVI / raw-AVI), per-frame
    perceptual hash (:func:`phash_images` with ``frame_idx`` riding as a
    passthrough column — no id packing, so negative/large video ids and
    arbitrarily long videos are safe), then the Hamming distance between
    CONSECUTIVE sampled frames computed JVM-side (``bit_count(xor)``
    over a per-video window — never global). A frame whose hash sits ≥
    ``cut_distance`` bits from its predecessor starts a new shot;
    gradual motion moves few pHash bits, a cut moves many.

    Returns one row per consecutive frame pair: ``media_id, frame_idx,
    prev_idx, hamming, is_cut``. Frames that do not hash (stub-codec
    slices, corrupt frames) are NOT silently dropped: their pairs come
    back with NULL hamming / NULL is_cut, so a mixed corpus can tell
    "no cuts" from "codec unsupported" (the module's classify-don't-
    vanish contract). The shuffle key is the video id and window state
    is one video's sampled frames — at 100 TB the heavy work (decode +
    hash) is embarrassingly per-frame and the window never exceeds
    frames-per-video."""
    frames = sample_frames(media, every_n=every_n, decode_stub=decode_stub)
    sigs = phash_images(
        frames.select(
            "media_id",
            # MJPG frames are JPEGs, GIF/DIB frames are P6 — the decoder
            # dispatches on magic bytes, the kind string is informational
            F.lit("image/frame").alias("kind"),
            F.col("frame_payload").alias("payload"),
            "frame_idx",
        ),
        passthrough=("frame_idx",),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("media_id").orderBy("frame_idx")
    return (
        sigs.withColumn("prev_idx", F.lag("frame_idx").over(w))
        .withColumn("__prev", F.lag("phash").over(w))
        .filter(F.col("prev_idx").isNotNull())
        .select(
            "media_id",
            "frame_idx",
            "prev_idx",
            # NULL-safe: either side unhashed -> NULL hamming/is_cut
            F.expr("bit_count(phash ^ __prev)").cast("int").alias("hamming"),
        )
        .withColumn("is_cut", F.col("hamming") >= F.lit(cut_distance))
    )


def video_signatures(
    media: DataFrame,
    every_n: int = 1,
    min_frames: int = 1,
    decode_stub: bool = True,
) -> DataFrame:
    """Corpus-level VIDEO near-dup signature: temporal-MAJORITY pooling
    of the per-frame perceptual hashes into one packed bigint per video
    — bit j of ``vsig`` is set iff MORE than half the hashed frames set
    bit j of their pHash. Two re-encodes of the same video (JPEG
    quality change, GIF↔MJPEG container swap) have near-identical
    per-frame hashes, so their pooled signatures sit a few Hamming bits
    apart; distinct videos pool to unrelated signatures. Feed the
    result to :func:`tdataframe_spark.ops.dedup.hamming_pairs` — the
    corpus-vs-corpus join :func:`shot_boundaries` (cuts WITHIN a video)
    deliberately does not do. Majority pooling also tolerates trims and
    frame-rate decimation better than any single reference frame: a
    dropped prefix only moves bits whose frame-majority was marginal.

    Videos with fewer than ``min_frames`` hashed frames are dropped
    (their majority would be noise); videos whose codec cannot be
    hashed simply have no row — match the classify-don't-vanish needs
    of a mixed corpus by joining back on media_id.

    Scale shape: decode+hash is embarrassingly per-frame
    (:func:`sample_frames` → :func:`phash_images`); pooling keys the BIT
    next to the video id — two small hash aggregates whose first stage
    map-side combines to at most 63 count rows per video per task, so
    state per video is 63 small integers — never a frame list. (The
    one-aggregate formulation with 63 separate conditional-sum columns
    plus a 63-term packing projection produced identical integers but
    compiled a ~64-buffer codegen unit per fresh plan — about 2 s of
    pure driver/codegen time per run, dwarfing the aggregation itself.)
    Returns (media_id, vsig, n_frames_hashed).
    """
    frames = sample_frames(media, every_n=every_n, decode_stub=decode_stub)
    # no frame_idx passthrough: majority pooling is order-free (unlike
    # shot_boundaries' consecutive-frame windows), so the index column
    # would only widen the Arrow fan-out for nothing
    sigs = phash_images(
        frames.select(
            "media_id",
            F.lit("image/frame").alias("kind"),
            F.col("frame_payload").alias("payload"),
        ),
    ).filter(F.col("ok"))
    # one row per (frame, bit): ×63 fan-out of 3 small ints — the same
    # shuffle bytes as the wide 64-column row, integer-exact majorities
    bits = sigs.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.lit(62))).alias("__j"),
        "phash",
    ).select(
        "media_id",
        "__j",
        F.expr("shiftrightunsigned(phash, CAST(__j AS INT))")
        .bitwiseAND(F.lit(1).cast("long"))
        .alias("__b"),
    )
    per_bit = bits.groupBy("media_id", "__j").agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__b").alias("__s")
    )
    # every bit of a video sees the same frame count; max() just picks it
    pooled = per_bit.groupBy("media_id").agg(
        F.max("__n").alias("n_frames_hashed"),
        F.sum(
            F.when(
                F.col("__s") * 2 > F.col("__n"),
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__j AS INT))"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("vsig"),
    )
    return pooled.filter(F.col("n_frames_hashed") >= min_frames).select(
        "media_id", "vsig", "n_frames_hashed"
    )


AUDIO_SCHEMA = (
    "media_id bigint, kind string, ok boolean, sample_rate int, "
    "n_channels int, n_samples bigint, duration_s double, "
    "mean_abs double, peak_abs double"
)


def _parse_wav(buf, max_seconds=None, min_frames=0):
    """RIFF/WAV PCM chunk walk + sample parse, pure numpy. Returns
    ``(rate, n_channels, n_frames, interleaved_float64_in_[-1,1])`` or
    ``None`` for non-WAV/non-PCM/corrupt payloads. Shared by
    :func:`decode_audio` and :func:`audio_features`.

    ``max_seconds`` truncates at the RAW BYTE level, before any float64
    conversion — capping a multi-GB payload must not first materialize
    the whole clip as doubles (~8x the payload per channel)."""
    import numpy as np

    try:
        if buf is None or len(buf) < 44 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
            return None
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(buf):
            cid = buf[pos : pos + 4]
            size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
            body = buf[pos + 8 : pos + 8 + size]
            if cid == b"fmt ":
                fmt = body
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        if fmt is None or data is None or len(fmt) < 16:
            return None
        audio_format = int.from_bytes(fmt[0:2], "little")
        n_ch = int.from_bytes(fmt[2:4], "little")
        rate = int.from_bytes(fmt[4:8], "little")
        bits = int.from_bytes(fmt[14:16], "little")
        if n_ch < 1 or rate < 1:
            return None
        if audio_format == 1:  # integer PCM
            dt = {8: np.uint8, 16: "<i2", 32: "<i4"}.get(bits)
            scale = {8: 128.0, 16: 32768.0, 32: 2147483648.0}.get(bits)
        elif audio_format == 3:  # float PCM
            dt = {32: "<f4", 64: "<f8"}.get(bits)
            scale = 1.0
        else:
            return None
        if dt is None:
            return None
        width = bits // 8
        n = len(data) // (width * n_ch)
        if n == 0:
            return None
        if max_seconds is not None:
            n = min(n, max(int(min_frames), int(max_seconds * rate)))
        x = np.frombuffer(data[: n * width * n_ch], dtype=dt).astype(np.float64)
        if audio_format == 1 and bits == 8:
            x = x - 128.0  # 8-bit WAV is unsigned
        x = x / scale
        return rate, n_ch, n, x
    except Exception:
        return None


def decode_audio(media: DataFrame) -> DataFrame:
    """REAL audio decode for WAV (RIFF) PCM payloads — chunk walk + sample
    parse in pure numpy, no audio libraries needed. The audio counterpart
    of :func:`decode_images`: 8/16/32-bit integer and 32/64-bit float PCM
    come back with format fields and amplitude statistics (normalized to
    [-1, 1]); any other payload classifies ``ok=false`` in the same pass.

    Arrow-batched ``mapInPandas``.
    """

    def run(batches):
        import numpy as np
        import pandas as pd

        parse_wav = _parse_wav

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                parsed = parse_wav(r["payload"])
                if parsed is None:
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "kind": r["kind"],
                            "ok": False,
                            "sample_rate": None,
                            "n_channels": None,
                            "n_samples": None,
                            "duration_s": None,
                            "mean_abs": None,
                            "peak_abs": None,
                        }
                    )
                    continue
                rate, n_ch, n, x = parsed
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "kind": r["kind"],
                        "ok": True,
                        "sample_rate": rate,
                        "n_channels": n_ch,
                        "n_samples": n,
                        "duration_s": n / rate,
                        "mean_abs": float(np.abs(x).mean()),
                        "peak_abs": float(np.abs(x).max()),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, AUDIO_SCHEMA)


def audio_features(
    media: DataFrame,
    n_fft: int = 256,
    hop: int = 128,
    n_bands: int = 8,
    max_seconds: float = 30.0,
    n_mfcc: int = 0,
) -> DataFrame:
    """REAL spectral feature extraction for WAV PCM payloads — STFT in
    pure numpy (Hann window, rfft magnitude), the featurize stage a
    training pipeline runs after :func:`decode_audio`'s probe. Per
    payload:

    - ``rms`` / ``zcr`` — time-domain level and zero-crossing rate;
    - ``dominant_hz`` — frequency of the strongest non-DC bin of the
      frame-averaged power spectrum;
    - ``centroid_hz`` — spectral centroid (power-weighted mean bin
      frequency);
    - ``band_db`` — ``n_bands`` equal-width log-power bands over the
      rfft bins (a coarse log-spectrogram signature, 9-dp rounded);
    - ``mfcc`` (when ``n_mfcc > 0``) — the first ``n_mfcc`` MFCCs:
      HTK-mel triangular filterbank (26 filters over 0..rate/2) on the
      frame-averaged power spectrum, log, orthonormal DCT-II — the
      standard compact audio embedding for clustering/dedup/classifier
      features.

    Analysis is capped at ``max_seconds`` of (channel-averaged mono)
    audio so cost never scales with payload duration — the 100 TB knob,
    same contract as lang_id's prefix cap. Features are per-row pure
    functions of the payload bytes → bit-deterministic under any
    partitioning. Non-WAV/corrupt payloads come back ``ok=false`` in
    the same pass. Arrow-batched ``mapInPandas``.
    """
    _N_MELS = 26
    if n_fft < 8 or hop < 1 or n_bands < 1 or n_bands > n_fft // 2:
        raise ValueError(
            f"need n_fft>=8, hop>=1, 1<=n_bands<=n_fft//2; got "
            f"n_fft={n_fft}, hop={hop}, n_bands={n_bands}"
        )
    if n_mfcc < 0 or n_mfcc > _N_MELS:
        raise ValueError(f"need 0<=n_mfcc<={_N_MELS}, got {n_mfcc}")

    schema = (
        "media_id bigint, kind string, ok boolean, sample_rate int, "
        "n_frames int, rms double, zcr double, dominant_hz double, "
        "centroid_hz double, band_db array<double>"
    )
    if n_mfcc:
        schema += ", mfcc array<double>"

    def run(batches):
        import numpy as np
        import pandas as pd

        win = np.hanning(n_fft)
        n_bins = n_fft // 2 + 1
        # n_bands equal-width groups over the non-DC bins
        edges = np.linspace(1, n_bins, n_bands + 1).astype(int)
        fb_cache: dict = {}
        if n_mfcc:
            # orthonormal DCT-II rows (type-2, norm='ortho')
            dct = np.cos(
                np.pi
                / _N_MELS
                * (np.arange(_N_MELS) + 0.5)[None, :]
                * np.arange(n_mfcc)[:, None]
            ) * np.sqrt(2.0 / _N_MELS)
            dct[0] *= np.sqrt(0.5)

        def mel_fb(rate):
            """HTK-mel triangular filterbank over the rfft bins."""
            def mel(f):
                return 2595.0 * np.log10(1.0 + f / 700.0)

            pts = 700.0 * (
                10.0 ** (np.linspace(mel(0.0), mel(rate / 2.0), _N_MELS + 2)
                         / 2595.0) - 1.0
            )
            bins = np.minimum(
                np.floor((n_fft + 1) * pts / rate).astype(int), n_bins - 1
            )
            fb = np.zeros((_N_MELS, n_bins))
            for i in range(_N_MELS):
                a, b, c = bins[i], bins[i + 1], bins[i + 2]
                if b > a:
                    fb[i, a:b] = (np.arange(a, b) - a) / (b - a)
                if c > b:
                    fb[i, b:c] = (c - np.arange(b, c)) / (c - b)
            return fb

        def feats(buf):
            # the cap is applied inside the parse, at the raw-byte
            # level — a multi-hour payload never materializes as float64
            parsed = _parse_wav(buf, max_seconds=max_seconds,
                                min_frames=n_fft)
            if parsed is None:
                return None
            rate, n_ch, n, x = parsed
            mono = x.reshape(n, n_ch).mean(axis=1)
            if len(mono) < n_fft:
                mono = np.pad(mono, (0, n_fft - len(mono)))
            n_frames = 1 + (len(mono) - n_fft) // hop
            idx = (
                np.arange(n_fft)[None, :]
                + hop * np.arange(n_frames)[:, None]
            )
            spec = np.abs(np.fft.rfft(mono[idx] * win, axis=1)) ** 2
            power = spec.mean(axis=0)  # frame-averaged power spectrum
            freqs = np.arange(n_bins) * (rate / n_fft)
            nz = power[1:]  # skip DC for the dominant bin
            dominant = freqs[1 + int(np.argmax(nz))] if nz.any() else 0.0
            tot = power.sum()
            centroid = float((freqs * power).sum() / tot) if tot > 0 else 0.0
            bands = [
                round(
                    10.0 * np.log10(power[a:b].mean() + 1e-12), 9
                )
                for a, b in zip(edges[:-1], edges[1:])
            ]
            rms = float(np.sqrt((mono**2).mean()))
            zcr = (
                float((mono[:-1] * mono[1:] < 0).sum() / (len(mono) - 1))
                if len(mono) > 1
                else 0.0
            )
            mfcc = None
            if n_mfcc:
                fb = fb_cache.get(rate)
                if fb is None:
                    fb = fb_cache[rate] = mel_fb(rate)
                logm = np.log(fb @ power + 1e-12)
                mfcc = [round(float(v), 9) for v in dct @ logm]
            return (rate, n_frames, rms, zcr, float(dominant), centroid,
                    bands, mfcc)

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                f = feats(r["payload"])
                if f is None:
                    row = {
                        "media_id": r["media_id"],
                        "kind": r["kind"],
                        "ok": False,
                        "sample_rate": None,
                        "n_frames": None,
                        "rms": None,
                        "zcr": None,
                        "dominant_hz": None,
                        "centroid_hz": None,
                        "band_db": None,
                    }
                    if n_mfcc:
                        row["mfcc"] = None
                    rows.append(row)
                    continue
                rate, n_frames, rms, zcr, dom, cen, bands, mfcc = f
                row = {
                    "media_id": r["media_id"],
                    "kind": r["kind"],
                    "ok": True,
                    "sample_rate": rate,
                    "n_frames": n_frames,
                    "rms": round(rms, 9),
                    "zcr": round(zcr, 9),
                    "dominant_hz": round(dom, 9),
                    "centroid_hz": round(cen, 9),
                    "band_db": bands,
                }
                if n_mfcc:
                    row["mfcc"] = mfcc
                rows.append(row)
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema)


def audio_fingerprints(
    media: DataFrame,
    n_fft: int = 256,
    hop: int = 128,
    t_segments: int = 9,
    f_bands: int = 7,
    fmax: float = 4000.0,
    max_seconds: float = 30.0,
) -> DataFrame:
    """Perceptual AUDIO fingerprint — the audio analogue of
    :func:`phash_images`: a ``t_segments x f_bands`` grid of log band
    energies over the clip's STFT, each cell thresholded against the
    clip-wide median and packed into one bigint (``afp``,
    t_segments·f_bands <= 63 bits). Feed :func:`tdataframe_spark.ops.
    dedup.hamming_pairs` for the banded near-dup join, or the
    build/append/match index trio below for the incremental shape.

    Robustness by construction: a GAIN change multiplies every cell's
    power equally, shifting all log cells AND their median by the same
    constant — bits unchanged (up to the 1e-12 silence floor, which
    freezes near-silent cells; same caveat as the MFCC log floor). A
    RE-ENCODE (bit-depth change, int↔float PCM) perturbs cells by
    quantization noise only, moving a few marginal bits. Frequency
    bands are ABSOLUTE Hz (equal widths over 0..``fmax``), so a
    resampled copy lands in the same bands; time segments are equal
    fractions of the (``max_seconds``-capped) clip. Cells are 9-dp
    rounded before the median comparison (the BLAS-ulp rank-swap trap).

    Per-row pure function of the payload bytes → bit-deterministic
    under any partitioning; cost is capped at ``max_seconds`` of audio
    regardless of payload size (raw-byte-level truncation inside the
    WAV parse). Non-WAV/corrupt payloads classify ``ok=false`` in the
    same pass. Arrow-batched ``mapInPandas``; the fingerprint column is
    nullable Int64 (a plain object column mixing None with 63-bit ints
    would promote to float64 and round low bits away).
    """
    n_cells = t_segments * f_bands
    if t_segments < 2 or f_bands < 1 or n_cells > 63:
        raise ValueError(
            f"need t_segments>=2, f_bands>=1, t_segments*f_bands<=63; "
            f"got {t_segments}x{f_bands}={n_cells}"
        )
    if n_fft < 8 or hop < 1 or fmax <= 0:
        raise ValueError(
            f"need n_fft>=8, hop>=1, fmax>0; got n_fft={n_fft}, "
            f"hop={hop}, fmax={fmax}"
        )
    if n_fft // 2 < f_bands:
        # every frequency band needs at least one non-DC rfft bin, or
        # empty slices NaN the grid and every clip fingerprints to 0
        raise ValueError(
            f"n_fft={n_fft} gives only {n_fft // 2} non-DC bins for "
            f"{f_bands} bands; raise n_fft or lower f_bands"
        )

    schema = "media_id bigint, kind string, ok boolean, afp bigint"

    def run(batches):
        import numpy as np
        import pandas as pd

        win = np.hanning(n_fft)
        n_bins = n_fft // 2 + 1
        # enough samples that every time segment holds >= 1 frame
        min_len = n_fft + (t_segments - 1) * hop

        def fingerprint(buf):
            parsed = _parse_wav(buf, max_seconds=max_seconds,
                                min_frames=min_len)
            if parsed is None:
                return None
            rate, n_ch, n, x = parsed
            mono = x.reshape(n, n_ch).mean(axis=1)
            if len(mono) < min_len:
                mono = np.pad(mono, (0, min_len - len(mono)))
            n_frames = 1 + (len(mono) - n_fft) // hop
            idx = (
                np.arange(n_fft)[None, :]
                + hop * np.arange(n_frames)[:, None]
            )
            spec = np.abs(np.fft.rfft(mono[idx] * win, axis=1)) ** 2
            # absolute-Hz bands: a resampled copy maps into the same
            # bands (bin spacing is rate/n_fft, so the bin covering
            # fmax moves with the rate)
            bin_hi = min(n_bins, int(fmax * n_fft / rate) + 1)
            if bin_hi < f_bands + 1:
                # a VERY high sample rate (rate > fmax*n_fft/(f_bands+1),
                # ~128 kHz at the defaults) leaves fewer non-DC bins
                # under fmax than bands. Falling back to the full
                # spectrum would silently break the absolute-Hz
                # invariance (a 44.1 kHz original and its 192 kHz
                # re-encode would fingerprint over unrelated ranges and
                # never pair) — classify unhashable instead, loudly
                # NULL, and let the caller raise n_fft for such corpora
                return None
            fedges = np.linspace(1, bin_hi, f_bands + 1).astype(int)
            tedges = np.linspace(0, n_frames, t_segments + 1).astype(int)
            cells = np.empty((t_segments, f_bands))
            for s in range(t_segments):
                seg = spec[tedges[s]:tedges[s + 1]]
                for b in range(f_bands):
                    cells[s, b] = seg[:, fedges[b]:fedges[b + 1]].mean()
            logc = np.round(10.0 * np.log10(cells.ravel() + 1e-12), 9)
            med = np.median(logc)
            h = 0
            for i, v in enumerate(logc):
                if v > med:
                    h |= 1 << i
            return h

        for pdf in batches:
            fps = [fingerprint(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "ok": [f is not None for f in fps],
                    "afp": pd.array(fps, dtype="Int64"),
                }
            )

    return media.mapInPandas(run, schema)


def audio_landmarks(
    media: DataFrame,
    n_fft: int = 256,
    hop: int = 128,
    f_bands: int = 7,
    t_slices: int = 8,
    window_frames: int = 16,
    max_landmarks: int = 32,
    min_sep: int = 8,
    fmax: float = 4000.0,
    max_seconds: float = 30.0,
) -> DataFrame:
    """TRIM-ROBUST audio fingerprinting (the Shazam-landmark idea,
    deterministic): anchor hashes at the clip's energy PEAKS instead of
    at clip-relative positions, so a trimmed copy — whose interior
    content is untouched — still produces the same landmark hashes at
    the same content positions. :func:`audio_fingerprints` is the
    clip-LEVEL signature (gain/re-encode robust, trim-sensitive); this
    is the segment-level complement, the audio analogue of the text
    family's span-level ``dup_spans``.

    Per clip: STFT → per-frame energy envelope (9-dp rounded) → local
    maxima over a ±``min_sep``-frame neighborhood, greedily kept by
    (energy desc, frame asc) with ``min_sep`` spacing (deterministic
    NMS), capped at ``max_landmarks``; each surviving landmark hashes
    the ``window_frames`` frames that FOLLOW it as a ``t_slices x
    f_bands`` log-band grid thresholded against the window median
    (gain-invariant, same construction as the clip-level grid; absolute-
    Hz bands as there). Returns one row per landmark: ``(media_id,
    frame_off, lhash)`` — feed :func:`audio_landmark_pairs`.

    Scale shape: per-row pure numpy (byte-capped parse, bounded
    landmark count), one Arrow fan-out of ≤ max_landmarks rows per
    clip; matching joins landmark tables, never clips x clips.
    Undecodable / too-short / band-starved payloads simply emit no
    rows (join back on media_id to classify).
    """
    n_cells = t_slices * f_bands
    if t_slices < 2 or f_bands < 1 or n_cells > 63:
        raise ValueError(
            f"need t_slices>=2, f_bands>=1, t_slices*f_bands<=63; got "
            f"{t_slices}x{f_bands}={n_cells}"
        )
    if n_fft < 8 or hop < 1 or fmax <= 0 or n_fft // 2 < f_bands:
        raise ValueError(
            f"need n_fft>=8 with n_fft//2>={f_bands} non-DC bins, hop>=1, "
            f"fmax>0; got n_fft={n_fft}, hop={hop}, fmax={fmax}"
        )
    if window_frames < t_slices or min_sep < 1 or max_landmarks < 1:
        raise ValueError(
            "need window_frames>=t_slices, min_sep>=1, max_landmarks>=1"
        )

    schema = "media_id bigint, frame_off int, lhash bigint"

    def run(batches):
        import numpy as np
        import pandas as pd

        win = np.hanning(n_fft)
        n_bins = n_fft // 2 + 1

        def landmarks(buf):
            parsed = _parse_wav(buf, max_seconds=max_seconds,
                                min_frames=n_fft)
            if parsed is None:
                return []
            rate, n_ch, n, x = parsed
            mono = x.reshape(n, n_ch).mean(axis=1)
            need = n_fft + (window_frames + 1) * hop
            if len(mono) < need:
                return []  # too short to hold even one landmark window
            n_frames = 1 + (len(mono) - n_fft) // hop
            idx = (
                np.arange(n_fft)[None, :]
                + hop * np.arange(n_frames)[:, None]
            )
            spec = np.abs(np.fft.rfft(mono[idx] * win, axis=1)) ** 2
            bin_hi = min(n_bins, int(fmax * n_fft / rate) + 1)
            if bin_hi < f_bands + 1:
                return []  # rate too high for the band grid (see afp)
            env = np.round(spec.sum(axis=1), 9)
            # candidate peaks: the earliest frame attaining the local
            # max of its +-min_sep neighborhood
            cands = []
            for t in range(n_frames - window_frames):
                lo, hi = max(0, t - min_sep), min(n_frames, t + min_sep + 1)
                seg = env[lo:hi]
                if env[t] == seg.max() and (lo + int(seg.argmax())) == t:
                    cands.append(t)
            # deterministic NMS: keep by (energy desc, frame asc) with
            # min_sep spacing, cap at max_landmarks, emit in time order
            cands.sort(key=lambda t: (-env[t], t))
            kept = []
            for t in cands:
                if all(abs(t - k) >= min_sep for k in kept):
                    kept.append(t)
                    if len(kept) == max_landmarks:
                        break
            fedges = np.linspace(1, bin_hi, f_bands + 1).astype(int)
            tedges = np.linspace(0, window_frames, t_slices + 1).astype(int)
            out = []
            for t in sorted(kept):
                w = spec[t:t + window_frames]
                cells = np.empty((t_slices, f_bands))
                for s in range(t_slices):
                    seg = w[tedges[s]:tedges[s + 1]]
                    for b in range(f_bands):
                        cells[s, b] = seg[:, fedges[b]:fedges[b + 1]].mean()
                logc = np.round(10.0 * np.log10(cells.ravel() + 1e-12), 9)
                med = np.median(logc)
                h = 0
                for i, v in enumerate(logc):
                    if v > med:
                        h |= 1 << i
                out.append((t, h))
            return out

        for pdf in batches:
            ids, offs, hashes = [], [], []
            for _, r in pdf.iterrows():
                for t, h in landmarks(r["payload"]):
                    ids.append(r["media_id"])
                    offs.append(t)
                    hashes.append(h)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="Int64"),
                    "frame_off": pd.array(offs, dtype="Int32"),
                    "lhash": pd.array(hashes, dtype="Int64"),
                }
            )

    return media.mapInPandas(run, schema)


def landmark_pairs(
    lms: DataFrame,
    min_matches: int = 3,
    max_distance: int = 4,
    n_bits: int = 56,
    other: DataFrame | None = None,
) -> DataFrame:
    """Pair media that share ALIGNED landmark hashes — the generic
    trim-robust near-dup join over any ``(media_id, frame_off, lhash)``
    landmark table (:func:`audio_landmarks` for audio,
    :func:`video_frame_landmarks` for video). Landmark hashes meet
    through the banded Hamming join (pigeonhole over the packed
    signature — never all-pairs); cross-media hash matches then VOTE
    on their frame offset delta (Shazam's time-alignment filter:
    genuine copies agree on one delta, chance collisions scatter), and
    a pair survives with its best-aligned vote count >= ``min_matches``.
    Returns (id_a, id_b, matches, offset_frames) with id_a < id_b;
    offset_frames = frame_off(a) - frame_off(b) at the winning
    alignment (how far b is trimmed relative to a, in the landmark
    table's frame unit — STFT hops for audio, sampled frames for
    video).

    Scale shape: the join is landmark-table x landmark-table through
    bands (fan-out bounded by landmarks per media item), the vote is
    one hash aggregate on (pair, delta), the winner one per-pair max —
    state per pair is its delta histogram, bounded by the per-item
    landmark count."""
    from tdataframe_spark.ops.dedup import hamming_pairs

    def keyed(df):
        return df.select(
            F.struct(
                F.col("media_id").alias("m"), F.col("frame_off").alias("t")
            ).alias("lm_id"),
            "lhash",
        )

    if other is None:
        raw = hamming_pairs(
            keyed(lms), "lm_id", "lhash",
            max_distance=max_distance, n_bits=n_bits,
        )
        oriented = raw.filter(F.col("id_a.m") != F.col("id_b.m")).select(
            # canonical orientation: struct ordering already gives
            # id_a < id_b, but two landmarks of the SAME clip pair can
            # arrive in either orientation — normalize on the media id
            F.when(F.col("id_a.m") < F.col("id_b.m"), F.col("id_a.m"))
            .otherwise(F.col("id_b.m")).alias("id_a"),
            F.when(F.col("id_a.m") < F.col("id_b.m"), F.col("id_b.m"))
            .otherwise(F.col("id_a.m")).alias("id_b"),
            F.when(
                F.col("id_a.m") < F.col("id_b.m"),
                F.col("id_a.t") - F.col("id_b.t"),
            ).otherwise(F.col("id_b.t") - F.col("id_a.t")).alias("delta"),
        )
    else:
        # CROSS-SET: other = the NEW batch's landmark table (takes the
        # expanded band side — fan-out scales with the batch), lms = the
        # persisted index. Orientation is fixed (id_a = batch media,
        # id_b = corpus media) — no id-ordering normalization, so a
        # batch item pairs with a SMALLER corpus id too. include_self
        # skips hamming_pairs' struct-equality filter (same media id is
        # dropped on m below, covering the re-match-after-append case
        # landmark-by-landmark).
        raw = hamming_pairs(
            keyed(lms), "lm_id", "lhash",
            max_distance=max_distance, n_bits=n_bits,
            other=keyed(other), include_self=True,
        )
        oriented = raw.filter(F.col("id_a.m") != F.col("id_b.m")).select(
            F.col("id_a.m").alias("id_a"),
            F.col("id_b.m").alias("id_b"),
            (F.col("id_a.t") - F.col("id_b.t")).alias("delta"),
        )
    votes = (
        oriented
        .groupBy("id_a", "id_b", "delta")
        .agg(F.count(F.lit(1)).alias("matches"))
    )
    best = votes.groupBy("id_a", "id_b").agg(
        F.max(F.struct("matches", (-F.col("delta")).alias("nd"))).alias("__w")
    )
    return best.select(
        "id_a",
        "id_b",
        F.col("__w.matches").alias("matches"),
        (-F.col("__w.nd")).cast("int").alias("offset_frames"),
    ).filter(F.col("matches") >= min_matches)


def audio_landmark_pairs(
    lms: DataFrame,
    min_matches: int = 3,
    max_distance: int = 4,
    n_bits: int = 56,
) -> DataFrame:
    """Trim-robust AUDIO near-dup join over :func:`audio_landmarks`
    output — :func:`landmark_pairs` with the audio grid's 56-bit
    default. Kept as a named entry point so the audio and video
    pipelines read symmetrically."""
    return landmark_pairs(
        lms, min_matches=min_matches, max_distance=max_distance,
        n_bits=n_bits,
    )


def video_frame_landmarks(
    media: DataFrame,
    every_n: int = 1,
    decode_stub: bool = True,
) -> DataFrame:
    """TRIM-ROBUST video landmarks: per-frame perceptual hashes keyed
    by frame position, reduced to RUN-START frames (the first frame of
    each maximal run of identical consecutive pHashes). The video
    analogue of :func:`audio_landmarks`: :func:`video_signatures`
    pools a whole video into one majority signature (re-encode robust,
    but a hard trim shifts marginal bits), while these landmarks are
    anchored at content positions — a trimmed copy's untouched
    interior produces the SAME hashes at the same content-relative
    spacing, so :func:`landmark_pairs`' delta vote recovers both the
    pairing and the trim offset in sampled frames.

    Run-start reduction matters twice: static scenes would otherwise
    emit one landmark per frame with IDENTICAL hashes, blowing the
    banded join up k×k per still scene; and it is itself
    trim-tolerant — a cut mid-run only perturbs the first run's start,
    every later run boundary stays at the same content position.

    Returns ``(media_id, frame_off, lhash)`` — feed
    :func:`landmark_pairs` with ``n_bits=63`` (pHash width). Scale
    shape: decode+hash embarrassingly per-frame (:func:`sample_frames`
    → :func:`phash_images`), run detection one per-video lag window
    (state = one video's sampled hashes, same shape as
    :func:`shot_boundaries`); landmarks per video ≤ sampled frames,
    dialed by ``every_n``. Unhashable frames drop here (they cannot
    anchor); fully-unhashable videos have no row — classify by joining
    back on media_id."""
    from pyspark.sql import Window

    frames = sample_frames(media, every_n=every_n, decode_stub=decode_stub)
    sigs = phash_images(
        frames.select(
            "media_id",
            F.lit("image/frame").alias("kind"),
            F.col("frame_payload").alias("payload"),
            "frame_idx",
        ),
        passthrough=("frame_idx",),
    ).filter(F.col("ok"))
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    return (
        sigs.withColumn("__prev", F.lag("phash").over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col("phash")))
        .select(
            "media_id",
            F.col("frame_idx").cast("int").alias("frame_off"),
            F.col("phash").alias("lhash"),
        )
    )


_LANDMARK_SCHEMA = "media_id bigint, frame_off int, lhash bigint"


def _read_landmark_index(spark, index_path: str) -> DataFrame:
    """Read a persisted landmark table — plain parquet or the
    transactional table a streaming maintainer appends to
    (snapshot-isolated against in-flight appends), mirroring
    :func:`_read_sig_index` for the 3-column landmark shape."""
    from tdataframe_spark.sources.txn import is_txn_table, txn_read

    if is_txn_table(index_path):
        return txn_read(spark, index_path).select(
            "media_id", "frame_off", "lhash"
        )
    return spark.read.schema(_LANDMARK_SCHEMA).parquet(index_path)


def build_landmark_index(lms: DataFrame, index_path: str) -> None:
    """Persist a landmark table (:func:`audio_landmarks` /
    :func:`video_frame_landmarks` output) as the TRIM-ROBUST near-dup
    index: one decode+landmark pass, one small parquet of (media_id,
    frame_off, lhash) — the segment-level twin of the clip/frame-level
    build_phash_index / build_afp_index. New batches then match via
    :func:`match_landmark_index` without re-decoding the corpus."""
    _write_sig_index(
        lms.select("media_id", "frame_off", "lhash"), index_path, "overwrite"
    )


def append_landmark_index(lms: DataFrame, index_path: str) -> None:
    """Fold a new batch's landmarks into the persisted index (append —
    landmarks are a pure function of the payload)."""
    _write_sig_index(
        lms.select("media_id", "frame_off", "lhash"), index_path, "append"
    )


def match_landmark_index(
    new_lms: DataFrame,
    index_path: str,
    n_bits: int,
    min_matches: int = 3,
    max_distance: int = 4,
) -> DataFrame:
    """Match a NEW batch's landmark table against the persisted index:
    the cross-set :func:`landmark_pairs` join — batch landmarks take the
    expanded band side, so fan-out scales with the batch, never the
    corpus — then the same offset-alignment vote. Returns (id_a = batch
    media, id_b = corpus media, matches, offset_frames): the streaming
    ingestion shape for TRIMMED/re-encoded copy detection at 100 TB —
    index once, match every arriving batch, recover the trim offset.

    ``n_bits`` is REQUIRED (56 for the audio landmark grid, 63 for
    video pHash landmarks) because a persisted index does not record
    its hash width and a wrong guess degrades SILENTLY: too narrow and
    pairs differing only in the uncovered top bits never meet in any
    band (lost recall, no error); too wide and a constant top band
    becomes an all-pairs bucket (quadratic blowup)."""
    spark = new_lms.sparkSession
    idx = _read_landmark_index(spark, index_path)
    return landmark_pairs(
        idx, min_matches=min_matches, max_distance=max_distance,
        n_bits=n_bits, other=new_lms,
    )


def build_afp_index(media: DataFrame, index_path: str, **fp_kwargs) -> None:
    """Persist the corpus's audio fingerprints as the AUDIO near-dup
    index — one decode+fingerprint pass, one small parquet of
    (media_id, afp). The audio twin of :func:`build_phash_index`; new
    batches then match via :func:`match_afp_index` without re-reading
    the corpus."""
    _write_sig_index(
        audio_fingerprints(media, **fp_kwargs).filter("ok").select(
            "media_id", "afp"
        ),
        index_path, "overwrite",
    )


def append_afp_index(media: DataFrame, index_path: str, **fp_kwargs) -> None:
    """Fold a new batch's audio fingerprints into the persisted index
    (append — fingerprints are immutable per payload)."""
    _write_sig_index(
        audio_fingerprints(media, **fp_kwargs).filter("ok").select(
            "media_id", "afp"
        ),
        index_path, "append",
    )


def match_afp_index(
    new_media: DataFrame,
    index_path: str,
    max_distance: int = 8,
    t_segments: int = 9,
    f_bands: int = 7,
    **fp_kwargs,
) -> DataFrame:
    """Match a NEW batch of audio clips against the persisted
    fingerprint index: fingerprint only the batch, then the cross-set
    banded Hamming join (``hamming_pairs(other=...)`` — the batch takes
    the expanded-key side, so join fan-out scales with the batch, never
    the corpus; trivial self-pairs from an already-appended batch are
    dropped). Returns (id_a = batch id, id_b = corpus id, hamming).
    Accepts a plain-parquet index (build/append_afp_index) or the
    transactional one a ``stream_media_to_afp_index`` stream maintains."""
    from tdataframe_spark.ops.dedup import hamming_pairs

    spark = new_media.sparkSession
    idx = _read_sig_index(spark, index_path, "afp")
    new_sigs = audio_fingerprints(
        new_media, t_segments=t_segments, f_bands=f_bands, **fp_kwargs
    ).filter("ok").select("media_id", "afp")
    return hamming_pairs(
        idx, "media_id", "afp",
        max_distance=max_distance, n_bits=t_segments * f_bands,
        other=new_sigs,
    )


def probe_metadata(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Populate the typed media metadata columns (width/height for images,
    n_frames for video, sample_rate for audio) from the payload headers —
    the ffprobe step of a real pipeline. REAL header parsing for the
    formats whose containers are pure byte layouts (PNG IHDR, JPEG SOFn
    marker scan, GIF logical screen descriptor, BMP info header, netpbm,
    RIFF/WAV fmt chunk, RIFF/AVI header tree — width/height/n_frames
    from ``avih``); payloads in any other format fall back to
    deterministic digest-derived fake values (kept so mixed corpora still
    produce the full typed schema; real probing of compressed video needs
    libraries not in this container).

    Returns media columns + width, height, n_frames, sample_rate (typed
    ints, NULL where the kind has no such dimension).
    """
    if not decode_stub:
        raise NotImplementedError(
            "real header probing beyond PNG/JPEG/GIF/BMP/netpbm/WAV "
            "requires media libraries not present in this environment; "
            "use decode_stub=True"
        )

    schema = (
        "media_id bigint, kind string, payload binary, n_bytes bigint, "
        "width int, height int, n_frames int, sample_rate int"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tdataframe_spark.ops.avi import is_avi, parse_avi

        def image_dims(p):
            """(w, h) from real headers, or None."""
            try:
                if p[:8] == b"\x89PNG\r\n\x1a\n" and p[12:16] == b"IHDR":
                    return (
                        int.from_bytes(p[16:20], "big"),
                        int.from_bytes(p[20:24], "big"),
                    )
                if p[:3] == b"GIF" and len(p) >= 10:
                    return (
                        int.from_bytes(p[6:8], "little"),
                        int.from_bytes(p[8:10], "little"),
                    )
                if p[:2] == b"BM" and len(p) >= 26:
                    return (
                        int.from_bytes(p[18:22], "little", signed=True),
                        abs(int.from_bytes(p[22:26], "little", signed=True)),
                    )
                if p[:2] in (b"P5", b"P6"):
                    vals, pos = [], 2
                    while len(vals) < 2 and pos < len(p):
                        while pos < len(p) and p[pos : pos + 1].isspace():
                            pos += 1
                        if p[pos : pos + 1] == b"#":
                            while pos < len(p) and p[pos : pos + 1] != b"\n":
                                pos += 1
                            continue
                        start = pos
                        while pos < len(p) and not p[pos : pos + 1].isspace():
                            pos += 1
                        vals.append(int(p[start:pos]))
                    return (vals[0], vals[1]) if len(vals) == 2 else None
                if p[:2] == b"\xff\xd8":  # JPEG: scan markers for SOFn
                    pos = 2
                    while pos + 9 < len(p):
                        if p[pos] != 0xFF:
                            pos += 1
                            continue
                        # 0xFF fill/padding bytes may precede a marker;
                        # treating one as the marker itself would read two
                        # junk bytes as a segment length and jump past the
                        # real SOF
                        while pos + 9 < len(p) and p[pos + 1] == 0xFF:
                            pos += 1
                        marker = p[pos + 1]
                        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                            pos += 2
                            continue
                        seg = int.from_bytes(p[pos + 2 : pos + 4], "big")
                        if 0xC0 <= marker <= 0xCF and marker not in (
                            0xC4,
                            0xC8,
                            0xCC,
                        ):
                            return (
                                int.from_bytes(p[pos + 7 : pos + 9], "big"),
                                int.from_bytes(p[pos + 5 : pos + 7], "big"),
                            )
                        pos += 2 + seg
            except Exception:
                return None
            return None

        def wav_rate(p):
            try:
                if p[:4] != b"RIFF" or p[8:12] != b"WAVE":
                    return None
                pos = 12
                while pos + 8 <= len(p):
                    cid = p[pos : pos + 4]
                    ln = int.from_bytes(p[pos + 4 : pos + 8], "little")
                    if cid == b"fmt ":
                        return int.from_bytes(p[pos + 12 : pos + 16], "little")
                    pos += 8 + ln + (ln & 1)
            except Exception:
                return None
            return None

        def gif_frame_count(p):
            """REAL frame count for GIF payloads: one quick block walk
            counting image descriptors (no LZW decode) — keeps
            probe_metadata consistent with sample_frames' real GIF
            fan-out. None for non-GIF/corrupt payloads."""
            if p[:6] not in (b"GIF87a", b"GIF89a"):
                return None
            try:
                pos, flags = 13, p[10]
                if flags & 0x80:
                    pos += 3 * (2 << (flags & 0x07))
                n = 0
                while pos < len(p):
                    block = p[pos]
                    pos += 1
                    if block == 0x3B:
                        break
                    if block == 0x21:
                        pos += 1
                    elif block == 0x2C:
                        iflags = p[pos + 8]
                        pos += 9
                        if iflags & 0x80:
                            pos += 3 * (2 << (iflags & 0x07))
                        pos += 1  # LZW min code size
                        n += 1
                    else:
                        return None
                    while p[pos]:  # sub-block chain
                        pos += 1 + p[pos]
                    pos += 1
                return n or None
            except IndexError:
                return None

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                p = bytes(r["payload"] or b"\x00")
                h = hashlib.sha256(p).digest()
                kind = r["kind"]
                is_img = kind.startswith("image")
                is_vid = kind.startswith("video")
                is_aud = kind.startswith("audio")
                dims = image_dims(p) if (is_img or is_vid) else None
                rate = wav_rate(p) if is_aud else None
                gif_frames = gif_frame_count(p) if is_vid else None
                if is_vid and gif_frames is None and is_avi(p):
                    info = parse_avi(p)
                    if info is not None:
                        dims = (info.width, info.height)
                        gif_frames = info.n_frames
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "kind": kind,
                        "payload": r["payload"],
                        "n_bytes": len(p),
                        "width": dims[0] if dims else (
                            64 + h[0] % 192 if (is_img or is_vid) else None
                        ),
                        "height": dims[1] if dims else (
                            64 + h[1] % 192 if (is_img or is_vid) else None
                        ),
                        "n_frames": gif_frames if gif_frames else (
                            1 + h[2] % 64 if is_vid else None
                        ),
                        "sample_rate": rate if rate else (
                            8000 * (1 + h[3] % 6) if is_aud else None
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema)


def sample_frames(
    media: DataFrame, every_n: int = 8, decode_stub: bool = True
) -> DataFrame:
    """Explode video payloads into sampled frames: one output row per kept
    frame (media_id, frame_idx, frame_payload) — the fan-out stage of a
    video featurization pipeline.

    REAL decode for the multi-frame containers the sandbox can parse:

    - animated GIF (``ops/gif.py``: LZW decompress, per-frame
      compositing with disposal/transparency) — every ``every_n``-th
      composited frame is re-encoded as a netpbm P6 payload, which
      :func:`decode_images` parses directly;
    - AVI (``ops/avi.py``: real RIFF chunk walk) — MJPG frame chunks
      are emitted AS the standalone baseline JPEGs they are (the
      pure-numpy JPEG decoder downstream handles them), and
      uncompressed BI_RGB ("DIB ") chunks are converted to P6.

    So the sample→decode→featurize chain is real end to end for
    GIF/MJPEG-AVI/raw-AVI. Other video codecs (H.264/VP9/...) need
    ffmpeg-class libraries the sandbox lacks: with ``decode_stub=True``
    they fall back to deterministic payload slices (the 1→N Arrow
    fan-out, frame indexing, and partition behavior stay the real
    contract); with ``decode_stub=False`` such a payload raises
    instead. Non-video rows pass through with a single frame 0.
    """

    schema = "media_id bigint, kind string, frame_idx int, frame_payload binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tdataframe_spark.ops.avi import (
            DECODABLE_FOURCCS,
            dib_to_rgb,
            is_avi,
            parse_avi,
        )
        from tdataframe_spark.ops.gif import decode_gif

        def p6(arr):
            return (
                f"P6\n{arr.shape[1]} {arr.shape[0]}\n255\n"
            ).encode() + arr.tobytes()

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                p = bytes(r["payload"] or b"\x00")  # ONE copy per row
                kind = r["kind"]
                if kind.startswith("video"):
                    frames = None
                    if p[:6] in (b"GIF87a", b"GIF89a"):
                        try:
                            frames = decode_gif(p)
                        except Exception:
                            frames = None  # corrupt GIF → stub/raise below
                    if frames is not None:
                        for idx in range(0, len(frames), every_n):
                            rows.append(
                                {
                                    "media_id": r["media_id"],
                                    "kind": kind,
                                    "frame_idx": idx,
                                    "frame_payload": p6(frames[idx][1]),
                                }
                            )
                        continue
                    info = parse_avi(p) if is_avi(p) else None
                    if info is not None and info.fourcc in DECODABLE_FOURCCS:
                        for idx in range(0, len(info.frames), every_n):
                            chunk = info.frames[idx]
                            if info.fourcc == "MJPG":
                                payload = chunk  # a standalone JPEG
                            else:
                                arr = dib_to_rgb(
                                    chunk, info.width, info.height
                                )
                                if arr is None:
                                    continue  # corrupt frame: skip, loud
                                payload = p6(arr)
                            rows.append(
                                {
                                    "media_id": r["media_id"],
                                    "kind": kind,
                                    "frame_idx": idx,
                                    "frame_payload": payload,
                                }
                            )
                        continue
                    if not decode_stub:
                        raise NotImplementedError(
                            "real frame extraction beyond GIF/MJPEG-AVI/"
                            "raw-AVI requires ffmpeg-like libraries not "
                            "present in this environment; use "
                            "decode_stub=True"
                        )
                    h = hashlib.sha256(p).digest()
                    n_frames = 1 + h[2] % 64  # matches probe_metadata's stub
                    for idx in range(0, n_frames, every_n):
                        lo = (idx * 31) % max(1, len(p))
                        rows.append(
                            {
                                "media_id": r["media_id"],
                                "kind": kind,
                                "frame_idx": idx,
                                "frame_payload": p[lo : lo + 16],
                            }
                        )
                else:
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "kind": kind,
                            "frame_idx": 0,
                            "frame_payload": p[:16],
                        }
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema)
