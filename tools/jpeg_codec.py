"""Minimal baseline-DCT JPEG ENCODER — test-fixture generator only.

Produces spec-conformant single-scan baseline JPEGs (SOI / DQT / SOF0 /
DHT / [DRI] / SOS / EOI) so the pure-numpy decoder in
``tdataframe_spark.ops.multimodal.decode_images`` can be roundtrip-tested
without any image library in the container. Supports 8-bit grayscale and
RGB (YCbCr, optional 2x2 luma subsampling = 4:2:0), arbitrary quant
tables, and restart intervals. Not product code: the engine's sink
surface has no image writer and does not need one.

The Huffman tables are the JPEG Annex-K typical tables; correctness does
not hinge on them being byte-identical to the standard — any VALID
canonical table works because the decoder reads the tables from the
stream — but using the standard ones also makes the fixtures decodable
by any external tool.
"""

from __future__ import annotations

import numpy as np

ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14,
    21, 28, 35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23,
    30, 37, 44, 51, 58, 59, 52, 45, 38, 31, 39, 46, 53, 60,
    61, 54, 47, 55, 62, 63,
]

# Annex K typical tables: (bits[16], values)
DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _codes(bits, values):
    """Canonical Huffman: symbol -> (code, length)."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[values[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return out


_u = np.arange(8)
_A = np.cos((2 * _u[None, :] + 1) * _u[:, None] * np.pi / 16) * np.where(
    _u[:, None] == 0, (1 / 8) ** 0.5, 0.5
)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def pad(self):
        while self.n:
            self.put(1, 1)  # pad with 1s to byte boundary


def _category(v):
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(bw, block, quant_nat, pred, dc_codes, ac_codes):
    coef = _A @ (block.astype(np.float64) - 128.0) @ _A.T
    qz = np.round(coef / quant_nat).astype(np.int64)
    zz = qz.reshape(64)[ZZ]
    diff = int(zz[0]) - pred
    s = _category(diff)
    c, ln = dc_codes[s]
    bw.put(c, ln)
    if s:
        bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            bw.put(c, ln)  # ZRL
            run -= 16
        s = _category(v)
        c, ln = ac_codes[(run << 4) | s]
        bw.put(c, ln)
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        c, ln = ac_codes[0x00]
        bw.put(c, ln)  # EOB
    return int(zz[0])


def _seg(marker, payload):
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def encode_baseline_jpeg(
    img: np.ndarray,
    quant: np.ndarray | None = None,
    subsample: bool = False,
    restart_interval: int = 0,
    gray_declared_factors: tuple[int, int] | None = None,
) -> bytes:
    """Encode a HxW (grayscale) or HxWx3 (RGB) uint8 array as a baseline
    JPEG. ``quant``: 8x8 natural-order quant table (default all-ones —
    near-lossless, flat blocks roundtrip exactly). ``subsample``: 4:2:0
    (2x2 luma sampling, averaged chroma); RGB only.

    ``gray_declared_factors``: grayscale only — DECLARE these sampling
    factors in the SOF while still emitting the spec-correct
    non-interleaved block layout (T.81 A.2: a single-component scan's
    MCU is one 8x8 data unit; the factors are semantically ignored).
    Real encoders emit e.g. 2x2 here; the fixture reproduces them so the
    decoder's non-interleaved path is testable."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    quant_nat = (
        np.ones((8, 8), np.int64) if quant is None else np.asarray(quant, np.int64)
    )
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # pad to even dims then 2x2-average the chroma
            he, we = (h + 1) & ~1, (w + 1) & ~1
            def pad_even(p):
                return np.pad(p, ((0, he - h), (0, we - w)), mode="edge")
            cb = pad_even(cb).reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            cr = pad_even(cr).reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        ph, pw = mcuy * sv * 8, mcux * sh * 8
        padded.append(
            np.pad(
                p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
            )
        )

    dc_codes, ac_codes = _codes(*DC_LUM), _codes(*AC_LUM)

    head = bytearray(b"\xff\xd8")
    qz = quant_nat.reshape(64)[ZZ]
    head += _seg(0xDB, bytes([0x00]) + bytes(int(x) for x in qz))
    nf = 1 if gray else 3
    declared = list(samp)
    if gray and gray_declared_factors is not None:
        declared = [tuple(gray_declared_factors)]
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nf])
    for ci in range(nf):
        sof += bytes([ci + 1, (declared[ci][0] << 4) | declared[ci][1], 0])
    head += _seg(0xC0, sof)
    dht = bytes([0x00]) + bytes(DC_LUM[0]) + bytes(DC_LUM[1])
    dht += bytes([0x10]) + bytes(AC_LUM[0]) + bytes(AC_LUM[1])
    head += _seg(0xC4, dht)
    if restart_interval:
        head += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([nf])
    for ci in range(nf):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    head += _seg(0xDA, sos)

    bw = _BitWriter()
    preds = [0] * nf
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.pad()
            bw.out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            preds = [0] * nf
        my, mx = divmod(m, mcux)
        for ci in range(nf):
            sh, sv = samp[ci]
            for by in range(sv):
                for bx in range(sh):
                    y0 = (my * sv + by) * 8
                    x0 = (mx * sh + bx) * 8
                    block = padded[ci][y0:y0 + 8, x0:x0 + 8]
                    preds[ci] = _encode_block(
                        bw, block, quant_nat, preds[ci], dc_codes, ac_codes
                    )
    bw.pad()
    return bytes(head) + bytes(bw.out) + b"\xff\xd9"


# a "universal" canonical Huffman table carrying EVERY possible symbol
# (0..254 at 9 bits, 255 at 10): progressive scans emit EOBn symbols
# (0x10..0xE0) that the Annex-K tables do not contain, and building
# frequency-optimal tables is encoder tuning the fixtures don't need —
# the decoder reads whatever canonical table the stream declares.
UNIV = (
    [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0],
    list(range(255)) + [255],
)


def encode_progressive_jpeg(
    img: np.ndarray,
    quant: np.ndarray | None = None,
    subsample: bool = False,
) -> bytes:
    """Encode a HxW (grayscale) or HxWx3 (RGB) uint8 array as a
    PROGRESSIVE (SOF2) JPEG with a libjpeg-like scan script:

    1. DC first  (Al=1)         — interleaved when nf>1
    2. AC first  Ss=1..5,  Al=2 — per component (spec: AC scans are
    3. AC first  Ss=6..63, Al=2   single-component / non-interleaved)
    4. AC refine Ah=2, Al=1     — per component
    5. AC refine Ah=1, Al=0     — per component
    6. DC refine Ah=1, Al=0     — interleaved when nf>1

    exercising spectral selection, successive approximation (DC and AC
    first+refine), and EOB-run coding. Same coefficient pipeline as the
    baseline encoder, so the progressive decode of an image must equal
    the baseline decode of the same image EXACTLY — the cross-format
    fixture equivalence the tests pin. Follows the jcphuff.c emission
    algorithms (EOBRUN accumulation, buffered correction bits, ZRL
    folding)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    quant_nat = (
        np.ones((8, 8), np.int64) if quant is None else np.asarray(quant, np.int64)
    )
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            he, we = (h + 1) & ~1, (w + 1) & ~1

            def pad_even(p):
                return np.pad(p, ((0, he - h), (0, we - w)), mode="edge")

            cb = pad_even(cb).reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            cr = pad_even(cr).reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1)] * 3
        planes = [y, cb, cr]
    nf = len(planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # quantized zigzag coefficients over each component's MCU-padded grid
    qz = quant_nat.reshape(64)[ZZ]
    coefs = []
    for p, (sh, sv) in zip(planes, samp):
        ph, pw = mcuy * sv * 8, mcux * sh * 8
        pp = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
        bh_, bw_ = ph // 8, pw // 8
        grid = np.zeros((bh_, bw_, 64), np.int64)
        for by in range(bh_):
            for bx in range(bw_):
                block = pp[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                coef = _A @ (block - 128.0) @ _A.T
                grid[by, bx] = np.round(coef / quant_nat).astype(np.int64).reshape(64)[ZZ]
        coefs.append(grid)

    codes = _codes(*UNIV)

    head = bytearray(b"\xff\xd8")
    head += _seg(0xDB, bytes([0x00]) + bytes(int(x) for x in qz))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nf])
    for ci in range(nf):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0])
    head += _seg(0xC2, sof)
    dht = bytes([0x00]) + bytes(UNIV[0]) + bytes(UNIV[1])
    dht += bytes([0x10]) + bytes(UNIV[0]) + bytes(UNIV[1])
    head += _seg(0xC4, dht)
    out = bytearray(head)

    def sos_header(comp_ids, ss, se, ah, al):
        sos = bytes([len(comp_ids)])
        for cid in comp_ids:
            sos += bytes([cid, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, sos)

    def put_val(bw_, v, s):
        bw_.put(v if v >= 0 else v + (1 << s) - 1, s)

    def comp_true_blocks(ci):
        cw = -(-(w * samp[ci][0]) // hmax)
        ch_ = -(-(h * samp[ci][1]) // vmax)
        return -(-ch_ // 8), -(-cw // 8)

    def dc_first_scan(al):
        bw_ = _BitWriter()
        preds = [0] * nf
        if nf > 1:  # interleaved MCU order
            for m in range(mcux * mcuy):
                my, mx = divmod(m, mcux)
                for ci in range(nf):
                    sh, sv = samp[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            v = int(coefs[ci][my * sv + by, mx * sh + bx, 0]) >> al
                            diff = v - preds[ci]
                            preds[ci] = v
                            s = _category(diff)
                            c, ln = codes[s]
                            bw_.put(c, ln)
                            if s:
                                put_val(bw_, diff, s)
        else:
            bh_, bw_b = comp_true_blocks(0)
            for m in range(bh_ * bw_b):
                by, bx = divmod(m, bw_b)
                v = int(coefs[0][by, bx, 0]) >> al
                diff = v - preds[0]
                preds[0] = v
                s = _category(diff)
                c, ln = codes[s]
                bw_.put(c, ln)
                if s:
                    put_val(bw_, diff, s)
        bw_.pad()
        return sos_header(list(range(1, nf + 1)), 0, 0, 0, al) + bytes(bw_.out)

    def dc_refine_scan(ah, al):
        bw_ = _BitWriter()
        if nf > 1:
            for m in range(mcux * mcuy):
                my, mx = divmod(m, mcux)
                for ci in range(nf):
                    sh, sv = samp[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            v = int(coefs[ci][my * sv + by, mx * sh + bx, 0])
                            bw_.put((v >> al) & 1, 1)
        else:
            bh_, bw_b = comp_true_blocks(0)
            for m in range(bh_ * bw_b):
                by, bx = divmod(m, bw_b)
                bw_.put((int(coefs[0][by, bx, 0]) >> al) & 1, 1)
        bw_.pad()
        return sos_header(list(range(1, nf + 1)), 0, 0, ah, al) + bytes(bw_.out)

    def ac_first_scan(ci, ss, se, al):
        bw_ = _BitWriter()
        eobrun = 0

        def emit_eobrun():
            nonlocal eobrun
            if eobrun > 0:
                nbits = eobrun.bit_length() - 1
                c, ln = codes[nbits << 4]
                bw_.put(c, ln)
                if nbits:
                    bw_.put(eobrun & ((1 << nbits) - 1), nbits)
                eobrun = 0

        bh_, bw_b = comp_true_blocks(ci)
        for m in range(bh_ * bw_b):
            by, bx = divmod(m, bw_b)
            zz_ = coefs[ci][by, bx]
            r = 0
            for k in range(ss, se + 1):
                v = int(zz_[k])
                t = abs(v) >> al
                if t == 0:
                    r += 1
                    continue
                emit_eobrun()
                while r > 15:
                    c, ln = codes[0xF0]
                    bw_.put(c, ln)
                    r -= 16
                s = t.bit_length()
                c, ln = codes[(r << 4) | s]
                bw_.put(c, ln)
                put_val(bw_, t if v >= 0 else -t, s)
                r = 0
            if r > 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    emit_eobrun()
        emit_eobrun()
        bw_.pad()
        return sos_header([ci + 1], ss, se, 0, al) + bytes(bw_.out)

    def ac_refine_scan(ci, ss, se, ah, al):
        bw_ = _BitWriter()
        eobrun = 0
        pend: list[int] = []  # correction bits riding the next EOBRUN flush

        def emit_eobrun():
            nonlocal eobrun, pend
            if eobrun > 0:
                nbits = eobrun.bit_length() - 1
                c, ln = codes[nbits << 4]
                bw_.put(c, ln)
                if nbits:
                    bw_.put(eobrun & ((1 << nbits) - 1), nbits)
                eobrun = 0
            for b in pend:
                bw_.put(b, 1)
            pend = []

        bh_, bw_b = comp_true_blocks(ci)
        for m in range(bh_ * bw_b):
            by, bx = divmod(m, bw_b)
            zz_ = coefs[ci][by, bx]
            absv = [abs(int(zz_[k])) >> al for k in range(ss, se + 1)]
            eob = 0  # band index AFTER which only zeros/corrections remain
            for i, t in enumerate(absv):
                if t == 1:
                    eob = i + 1
            r = 0
            br: list[int] = []  # this block's buffered correction bits
            for i, t in enumerate(absv):
                if t == 0:
                    r += 1
                    continue
                while r > 15 and i < eob:
                    emit_eobrun()
                    c, ln = codes[0xF0]
                    bw_.put(c, ln)
                    r -= 16
                    for b in br:
                        bw_.put(b, 1)
                    br = []
                if t > 1:
                    br.append(t & 1)
                    continue
                emit_eobrun()
                c, ln = codes[(r << 4) | 1]
                bw_.put(c, ln)
                bw_.put(1 if int(zz_[ss + i]) >= 0 else 0, 1)
                for b in br:
                    bw_.put(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                eobrun += 1
                pend.extend(br)
                if eobrun == 0x7FFF:
                    emit_eobrun()
        emit_eobrun()
        bw_.pad()
        return sos_header([ci + 1], ss, se, ah, al) + bytes(bw_.out)

    out += dc_first_scan(1)
    for ci in range(nf):
        out += ac_first_scan(ci, 1, 5, 2)
        out += ac_first_scan(ci, 6, 63, 2)
    for ci in range(nf):
        out += ac_refine_scan(ci, 1, 63, 2, 1)
        out += ac_refine_scan(ci, 1, 63, 1, 0)
    out += dc_refine_scan(1, 0)
    return bytes(out) + b"\xff\xd9"
