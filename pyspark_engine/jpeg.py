"""REAL baseline JPEG (ITU-T T.81) codec with numpy + the stdlib only —
the last reachable image container: unlike PPM (raw) and PNG (zlib), JPEG
needs an entropy coder and a transform, both implemented here from the
spec.  Scope: baseline sequential DCT, 8-bit, 3-component YCbCr, in the
4:4:4, 4:2:0, 4:2:2 and 4:1:1 chroma layouts (SAMP_FACTORS; the 4:2:0
interleaved-MCU form is what cameras and the web actually emit), with the
Annex K quantization/Huffman tables.  Progressive/arithmetic streams and
other sampling ratios raise a descriptive error (library territory:
llmops.decode_image_batches).

JPEG is LOSSY (DCT-coefficient quantization + YCbCr rounding), so unlike
q158/q164 an oracle cannot recompute decoded bytes from synthesis
parameters; the query contract (q168) is dimensions/marker structure
exact + reconstruction-error BOUNDS (the contract-oracle pattern used for
sketches, q105/q149).  The codec pair is NOT self-certifying either way:
tests pin the forward DCT and the Huffman tables against independent
spec-text reimplementations, and the decoder walks real marker syntax
(lengths, table ids, byte stuffing) that a matched-bug pair cannot fake.

Reference parity note: the reference (kafka-stream-net) has no multimodal
surface at all (Kafka-only connector scope, feature.md:6); this module is
part of the LLM-pipeline extension brief.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------- tables

# ITU-T T.81 Annex K.1 — luminance/chrominance quantization (quality 50)
QL = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QC = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# zig-zag order (T.81 Figure 5): index i of the scan -> natural position
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3 typical Huffman tables: (BITS counts per code length 1..16, HUFFVAL)
DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
        list(range(12)))
DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
        list(range(12)))
AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _huff_codes(bits, vals):
    """T.81 Annex C code generation: canonical codes by ascending length.
    Returns {value: (code, length)}."""
    out = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _huff_decoder(bits, vals):
    """Decode table: {(length, code): value}."""
    out = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return out


def _dct_matrix():
    """Orthonormal 8-point DCT-II basis matrix (T.81 A.3.3): row u, col x =
    c(u)/2 · cos((2x+1)uπ/16)."""
    import numpy as np

    x = np.arange(8)
    u = x[:, None]
    m = 0.5 * np.cos((2 * x[None, :] + 1) * u * np.pi / 16)
    m[0, :] *= 1 / np.sqrt(2)
    return m


# ----------------------------------------------------------------- encode

def _rgb_to_ycbcr(img):
    """BT.601 full-range (JFIF) color transform, float."""
    import numpy as np

    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc):
    import numpy as np

    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype("uint8")


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 B.1.1.5)
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _magnitude(v: int) -> tuple[int, int]:
    """T.81 F.1.2.1: (category, offset bits) for a signed coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _pad_edge(plane, ph: int, pw: int):
    """Pad a 2-D plane to (ph, pw) by replicating the last row/column (the
    standard encoder convention for partial edge blocks/MCUs)."""
    import numpy as np

    h, w = plane.shape
    out = np.zeros((ph, pw))
    out[:h, :w] = plane
    if h < ph:
        out[h:, :w] = plane[h - 1 : h, :]
    if w < pw:
        out[:, w:] = out[:, w - 1 : w]
    return out


def _encode_block(bw_, blk, tq, comp, prev_dc, m, q, enc_dc, enc_ac) -> None:
    """FDCT + quantize + zigzag + DC-differential/AC-run-length Huffman emit
    for one 8×8 spatial block of component ``comp``."""
    import numpy as np

    coef = m @ blk @ m.T
    quant = np.round(coef / q[tq]).astype(np.int64)
    zz = quant.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - prev_dc[comp]
    prev_dc[comp] = int(zz[0])
    cat, bits = _magnitude(diff)
    code, ln = enc_dc[tq][cat]
    bw_.put(code, ln)
    if cat:
        bw_.put(bits, cat)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            if run == 16:
                code, ln = enc_ac[tq][0xF0]  # ZRL
                bw_.put(code, ln)
                run = 0
            continue
        cat, bits = _magnitude(v)
        code, ln = enc_ac[tq][(run << 4) | cat]
        bw_.put(code, ln)
        bw_.put(bits, cat)
        run = 0
    if last_nz < 63:
        code, ln = enc_ac[tq][0x00]  # EOB
        bw_.put(code, ln)


# sampling modes: name → luma (horizontal, vertical) factors relative to the
# single chroma block per MCU (T.81 A.1.1).  False/True kept as aliases for
# the original two-mode API (4:4:4 / 4:2:0).
SAMP_FACTORS = {
    False: (1, 1), "444": (1, 1),
    True: (2, 2), "420": (2, 2),
    "422": (2, 1),   # horizontal-only chroma halving (broadcast/video stills)
    "411": (4, 1),   # 4× horizontal chroma (DV-era layout)
}


def jpeg_encode(img, subsample=False) -> bytes:
    """8-bit RGB ndarray[h, w, 3] → baseline JFIF bytes (Annex K tables).
    ``subsample`` picks the chroma layout — False/"444", True/"420", "422",
    "411" (SAMP_FACTORS).  One MCU covers 8·sh × 8·sv pixels as sh·sv Y
    blocks (row-major) plus one (sv×sh)-mean-downsampled Cb and Cr block,
    interleaved per T.81 A.2.3; 4:4:4 degenerates to Y Cb Cr per 8×8 block.
    Dimensions need not be multiples of the MCU size — edges replicate."""
    import numpy as np

    if subsample not in SAMP_FACTORS:
        raise ValueError(f"unsupported sampling mode {subsample!r} (one of {sorted(str(k) for k in SAMP_FACTORS)})")
    sh, sv = SAMP_FACTORS[subsample]
    h, w, _ = img.shape
    ycc = _rgb_to_ycbcr(img) - 128.0
    m = _dct_matrix()
    q = {0: np.array(QL, dtype=np.float64).reshape(8, 8),
         1: np.array(QC, dtype=np.float64).reshape(8, 8)}
    enc_dc = {0: _huff_codes(*DC_L), 1: _huff_codes(*DC_C)}
    enc_ac = {0: _huff_codes(*AC_L), 1: _huff_codes(*AC_C)}

    bw_ = _BitWriter()
    prev_dc = [0, 0, 0]
    mh, mw = -(-h // (8 * sv)), -(-w // (8 * sh))
    y_p = _pad_edge(ycc[..., 0], mh * 8 * sv, mw * 8 * sh)
    # chroma: sv×sh mean over the padded plane, one sample per tile
    cbcr = []
    for c in (1, 2):
        p = _pad_edge(ycc[..., c], mh * 8 * sv, mw * 8 * sh)
        cbcr.append(p.reshape(mh * 8, sv, mw * 8, sh).mean(axis=(1, 3)))
    for my in range(mh):
        for mx in range(mw):
            for dy in range(sv):
                for dx in range(sh):
                    blk = y_p[(my * sv + dy) * 8 : (my * sv + dy) * 8 + 8,
                              (mx * sh + dx) * 8 : (mx * sh + dx) * 8 + 8]
                    _encode_block(bw_, blk, 0, 0, prev_dc, m, q, enc_dc, enc_ac)
            for ci, plane in enumerate(cbcr):
                blk = plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                _encode_block(bw_, blk, 1, ci + 1, prev_dc, m, q, enc_dc, enc_ac)
    samp = [(sh << 4) | sv, 0x11, 0x11]
    bw_.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dqt(tid: int, table) -> bytes:
        zz = bytes(int(table[ZIGZAG[i] // 8][ZIGZAG[i] % 8]) for i in range(64))
        return seg(0xFFDB, bytes([tid]) + zz)

    def dht(tc: int, th: int, bits, vals) -> bytes:
        return seg(0xFFC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3)
              + bytes([1, samp[0], 0, 2, samp[1], 1, 3, samp[2], 1]))
    sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return (
        b"\xff\xd8"  # SOI
        + dqt(0, q[0]) + dqt(1, q[1])
        + sof
        + dht(0, 0, *DC_L) + dht(0, 1, *DC_C)
        + dht(1, 0, *AC_L) + dht(1, 1, *AC_C)
        + sos
        + bytes(bw_.out)
        + b"\xff\xd9"  # EOI
    )


# ----------------------------------------------------------------- decode

class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream exhausted")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(f"unexpected marker 0xFF{nxt:02X} in entropy stream")
            self.acc = byte
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _extend(bits: int, cat: int) -> int:
    """T.81 F.2.2.1 EXTEND: magnitude bits → signed value."""
    if cat == 0:
        return 0
    return bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1


def _read_huff(r: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid JPEG Huffman code")


def jpeg_decode(raw: bytes):
    """Baseline JFIF bytes → (width, height, n_components, ndarray[h,w,3]).
    Real marker walk (segment lengths, table ids, byte stuffing), Huffman
    entropy decode, dequantize, IDCT, color transform.  Raises on
    progressive (SOF2), arithmetic (SOF9+), non-3-component, or
    unsupported-sampling streams — the supported subset is exactly what
    jpeg_encode writes, and anything else is decode-library territory."""
    import numpy as np

    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, object] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    dims = None
    comp_spec = None  # [(cid, tq)] in SOF order
    sampling = None  # [samp_byte] in SOF order
    scan_spec = None  # [(cid, td, ta)]
    data = None
    while pos < len(raw):
        if raw[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = raw[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > len(raw):
            raise ValueError("truncated JPEG: marker segment length cut off")
        (ln,) = struct.unpack(">H", raw[pos : pos + 2])
        if pos + ln > len(raw):
            raise ValueError("truncated JPEG: segment payload cut off")
        payload = raw[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(payload):
                pq, tid = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported (baseline)")
                if p + 65 > len(payload):
                    raise ValueError("truncated JPEG: DQT table cut off")
                tbl = np.zeros(64)
                for i in range(64):
                    tbl[ZIGZAG[i]] = payload[p + 1 + i]
                qt[tid] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8 or nc != 3:
                raise ValueError("only 8-bit 3-component baseline JPEG decodes here")
            comp_spec = []
            samps = []
            for i in range(nc):
                cid, samp, tq = payload[6 + 3 * i : 9 + 3 * i]
                samps.append(samp)
                comp_spec.append((cid, tq))
            if samps[1:] != [0x11, 0x11] or (samps[0] >> 4, samps[0] & 0xF) not in (
                (1, 1), (2, 2), (2, 1), (4, 1)
            ):
                raise ValueError(
                    "unsupported chroma subsampling (4:4:4, 4:2:0, 4:2:2, 4:1:1 "
                    "only; see llmops.decode_image_batches for library formats)"
                )
            sampling = samps
            dims = (w, h)
        elif marker in (0xC2,):
            raise ValueError("progressive JPEG (SOF2) unsupported (baseline only)")
        elif marker in (0xC1, 0xC3) or 0xC5 <= marker <= 0xCF and marker != 0xC8:
            if marker != 0xC4:
                raise ValueError(f"unsupported SOF marker 0xFF{marker:02X}")
        if marker == 0xC4:  # DHT (possibly several tables per segment)
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                if p + 17 + nv > len(payload) or len(bits) < 16:
                    raise ValueError("truncated JPEG: DHT table cut off")
                vals = list(payload[p + 17 : p + 17 + nv])
                (dc_tables if tc == 0 else ac_tables)[th] = _huff_decoder(bits, vals)
                p += 17 + nv
        if marker == 0xDA:  # SOS — entropy data follows
            ns = payload[0]
            scan_spec = [
                (payload[1 + 2 * i], payload[2 + 2 * i] >> 4, payload[2 + 2 * i] & 0xF)
                for i in range(ns)
            ]
            data = raw[pos + ln :]
            break
        pos += ln
    if dims is None or data is None or comp_spec is None:
        raise ValueError("JPEG missing SOF/SOS")
    w, h = dims
    # strip the EOI off the entropy segment (scan until 0xFFD9)
    end = data.rfind(b"\xff\xd9")
    if end >= 0:
        data = data[:end]
    r = _BitReader(data)
    m = _dct_matrix()
    prev_dc = [0, 0, 0]
    tq_of = {cid: tq for cid, tq in comp_spec}

    def decode_block(ci: int, cid: int, td: int, ta: int):
        zz = np.zeros(64, dtype=np.int64)
        cat = _read_huff(r, dc_tables[td])
        diff = _extend(r.bits(cat), cat) if cat else 0
        prev_dc[ci] += diff
        zz[0] = prev_dc[ci]
        k = 1
        while k < 64:
            rs = _read_huff(r, ac_tables[ta])
            run, cat = rs >> 4, rs & 0xF
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            k += run
            if k > 63:
                raise ValueError("AC coefficient index overflow")
            zz[k] = _extend(r.bits(cat), cat)
            k += 1
        blk = np.zeros(64)
        blk[ZIGZAG] = zz
        coef = blk.reshape(8, 8) * qt[tq_of[cid]]
        return m.T @ coef @ m

    # generic MCU walk over luma factors (sh, sv); (1,1) degenerates to the
    # per-8×8-block Y Cb Cr interleave of 4:4:4 (A.2.3)
    sh, sv = sampling[0] >> 4, sampling[0] & 0xF
    mh, mw = -(-h // (8 * sv)), -(-w // (8 * sh))
    y_p = np.zeros((mh * 8 * sv, mw * 8 * sh))
    cb = np.zeros((mh * 8, mw * 8))
    cr = np.zeros((mh * 8, mw * 8))
    (ycid, ytd, yta), (bcid, btd, bta), (rcid, rtd, rta) = scan_spec
    for my in range(mh):
        for mx in range(mw):
            for dy in range(sv):
                for dx in range(sh):
                    y_p[(my * sv + dy) * 8 : (my * sv + dy) * 8 + 8,
                        (mx * sh + dx) * 8 : (mx * sh + dx) * 8 + 8] = decode_block(
                        0, ycid, ytd, yta
                    )
            cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = decode_block(
                1, bcid, btd, bta
            )
            cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = decode_block(
                2, rcid, rtd, rta
            )
    # nearest-neighbor chroma upsample back to luma resolution
    cb_up = np.repeat(np.repeat(cb, sv, axis=0), sh, axis=1)
    cr_up = np.repeat(np.repeat(cr, sv, axis=0), sh, axis=1)
    ycc = np.stack([y_p, cb_up, cr_up], axis=-1)[:h, :w]
    img = _ycbcr_to_rgb(ycc + 128.0)
    return w, h, 3, img
