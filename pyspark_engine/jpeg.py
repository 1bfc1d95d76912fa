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


# r13 (guide §4.5): every table the codec needs is a pure function of small
# tuples, but the original built them per call — 4 Huffman dicts + the DCT
# basis per ENCODED IMAGE, and a decode dict per DHT segment per DECODED
# image.  At 5k tiny images per query that construction dominated.  One
# process-wide memo (keyed by the table bytes, so non-standard streams still
# work) builds each exactly once per worker.
_TABLE_CACHE: dict = {}


def _cached_dct():
    m = _TABLE_CACHE.get("dct")
    if m is None:
        m = _TABLE_CACHE["dct"] = _dct_matrix()
    return m


def _enc_arrays(bits, vals):
    """Encode tables as arrays: (codes uint32[256], lengths int64[256])
    indexed by symbol value — the vectorized encoder gathers whole symbol
    streams from these with one fancy-index."""
    key = ("enc", tuple(bits), tuple(vals))
    t = _TABLE_CACHE.get(key)
    if t is None:
        import numpy as np

        codes = np.zeros(256, dtype=np.int64)
        # -1 marks symbols ABSENT from the table: encoding one must fail
        # fast (the scalar reference raised KeyError), not silently emit
        # zero bits and corrupt the stream.  Unreachable for 8-bit baseline
        # input with the Annex K tables, but cheap to keep honest.
        lens = np.full(256, -1, dtype=np.int64)
        for v, (code, ln) in _huff_codes(bits, vals).items():
            codes[v] = code
            lens[v] = ln
        t = _TABLE_CACHE[key] = (codes, lens)
    return t


def _dec_lut(bits, vals):
    """Decode table as a 16-bit-prefix LUT: (value, code_length) plain
    Python lists of length 65536.  A canonical code of length L owns the
    2^(16−L) table slots whose top L bits equal the code, so one indexed
    read replaces the per-bit tree walk (length 0 marks an invalid
    prefix)."""
    key = ("dec", tuple(bits), tuple(vals))
    t = _TABLE_CACHE.get(key)
    if t is None:
        import numpy as np

        val = np.zeros(65536, dtype=np.int64)
        ln_ = np.zeros(65536, dtype=np.int64)
        code = 0
        i = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                lo = code << (16 - length)
                hi = lo + (1 << (16 - length))
                val[lo:hi] = vals[i]
                ln_[lo:hi] = length
                code += 1
                i += 1
            code <<= 1
        t = _TABLE_CACHE[key] = (val.tolist(), ln_.tolist())
    return t


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


def _cat_mag_vec(v, np):
    """Vector T.81 F.1.2.1: (category, magnitude-offset bits) arrays."""
    a = np.abs(v)
    cat = np.where(a == 0, 0, np.frexp(a.astype(np.float64))[1]).astype(np.int64)
    mag = np.where(v > 0, v, v + (np.int64(1) << cat) - 1).astype(np.int64)
    return cat, np.where(cat == 0, 0, mag)


def _const_segments(subsample):
    """The byte-constant container pieces for a sampling mode: everything
    except the per-image SOF dims (cached; one image differs from the next
    only in w/h and entropy data)."""
    key = ("seg", SAMP_FACTORS[subsample])
    t = _TABLE_CACHE.get(key)
    if t is None:
        sh, sv = SAMP_FACTORS[subsample]

        def seg(marker: int, payload: bytes) -> bytes:
            return struct.pack(">HH", marker, len(payload) + 2) + payload

        def dqt(tid: int, table) -> bytes:
            zz = bytes(int(table[ZIGZAG[i]]) for i in range(64))
            return seg(0xFFDB, bytes([tid]) + zz)

        def dht(tc: int, th: int, bits, vals) -> bytes:
            return seg(0xFFC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

        head = b"\xff\xd8" + dqt(0, QL) + dqt(1, QC)
        samp = [(sh << 4) | sv, 0x11, 0x11]
        sof_tail = bytes([1, samp[0], 0, 2, samp[1], 1, 3, samp[2], 1])
        mid = (
            dht(0, 0, *DC_L) + dht(0, 1, *DC_C)
            + dht(1, 0, *AC_L) + dht(1, 1, *AC_C)
            + seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
        )
        t = _TABLE_CACHE[key] = (head, sof_tail, mid)
    return t


def jpeg_encode_batch(imgs, subsample=False) -> list:
    """Encode a BATCH of 8-bit RGB ndarrays[h, w, 3] → list of baseline
    JFIF bytes (Annex K tables), each byte-identical to the scalar
    single-image walk.  ``subsample`` picks the chroma layout — False/"444",
    True/"420", "422", "411" (SAMP_FACTORS).  One MCU covers 8·sh × 8·sv
    pixels as sh·sv Y blocks (row-major) plus one (sv×sh)-mean-downsampled
    Cb and Cr block, interleaved per T.81 A.2.3; 4:4:4 degenerates to
    Y Cb Cr per 8×8 block.  Dimensions need not be multiples of the MCU
    size — edges replicate.

    r13 vectorized encode (guide §4.2): the scalar reference walked the
    MCUs block by block (_encode_block) — FDCT, quantize, zigzag, and the
    bit emission all per 8×8 block in interpreted Python, and rebuilt the
    Huffman/DCT tables per image.  This implementation gathers every block
    of EVERY image in the batch (the suite's images are tiny, so
    per-image fixed cost is what dominates), runs FDCT/quantize/zigzag as
    three array ops over the whole batch, derives the full
    (code, length, magnitude) symbol sequence with numpy (run lengths,
    ZRL splits, EOB), bit-packs one global stream, and splits/stuffs it
    per image.  Byte output is IDENTICAL to the scalar walk (pinned by
    tests/test_jpeg_vectorized.py)."""
    import numpy as np

    if subsample not in SAMP_FACTORS:
        raise ValueError(f"unsupported sampling mode {subsample!r} (one of {sorted(str(k) for k in SAMP_FACTORS)})")
    if not imgs:
        return []
    sh, sv = SAMP_FACTORS[subsample]
    svsh = sv * sh
    m = _cached_dct()
    q = _TABLE_CACHE.get("qstack")
    if q is None:
        q = _TABLE_CACHE["qstack"] = np.stack(
            [np.array(QL, dtype=np.float64).reshape(8, 8),
             np.array(QC, dtype=np.float64).reshape(8, 8)]
        )
    pat_key = ("pattern", sh, sv)
    pat = _TABLE_CACHE.get(pat_key)
    if pat is None:
        pat = _TABLE_CACHE[pat_key] = (
            np.array([0] * svsh + [1, 1], dtype=np.int64),
            np.array([0] * svsh + [1, 2], dtype=np.int64),
        )
    tq_pat, comp_pat = pat

    # ---- gather every image's blocks in MCU walk order
    parts = []
    dims = []
    for img in imgs:
        h, w, _ = img.shape
        ycc = _rgb_to_ycbcr(img) - 128.0
        mh, mw = -(-h // (8 * sv)), -(-w // (8 * sh))
        y_p = _pad_edge(ycc[..., 0], mh * 8 * sv, mw * 8 * sh)
        nmcu = mh * mw
        yb = (
            y_p.reshape(mh, sv, 8, mw, sh, 8)
            .transpose(0, 3, 1, 4, 2, 5)
            .reshape(nmcu, svsh, 8, 8)
        )
        mcu = [yb]
        for c in (1, 2):
            p = _pad_edge(ycc[..., c], mh * 8 * sv, mw * 8 * sh)
            # chroma: sv×sh mean over the padded plane, one sample per tile
            ds = p.reshape(mh * 8, sv, mw * 8, sh).mean(axis=(1, 3))
            mcu.append(ds.reshape(mh, 8, mw, 8).transpose(0, 2, 1, 3).reshape(nmcu, 1, 8, 8))
        parts.append(np.concatenate(mcu, axis=1).reshape(nmcu * (svsh + 2), 8, 8))
        dims.append((w, h, nmcu))

    counts = np.array([p.shape[0] for p in parts], dtype=np.int64)
    blocks = np.concatenate(parts) if len(parts) > 1 else parts[0]
    n_blk = blocks.shape[0]
    nimg = len(imgs)
    img_of = np.repeat(np.arange(nimg, dtype=np.int64), counts)
    tq_blk = np.tile(tq_pat, n_blk // (svsh + 2))
    comp_blk = np.tile(comp_pat, n_blk // (svsh + 2))

    coef = np.matmul(np.matmul(m, blocks), m.T)  # m @ blk @ m.T, batched (BLAS)
    quant = np.round(coef / q[tq_blk]).astype(np.int64)
    zz = quant.reshape(n_blk, 64)[:, ZIGZAG]

    # ---- DC differentials per (image, component), in block-sequence order
    dc = zz[:, 0]
    diffs = np.empty(n_blk, dtype=np.int64)
    for c in range(3):
        idx = np.nonzero(comp_blk == c)[0]
        d = dc[idx]
        im = img_of[idx]
        prev = np.empty_like(d)
        prev[0] = 0
        prev[1:] = d[:-1]
        if idx.size > 1:
            prev[1:][im[1:] != im[:-1]] = 0  # DC predictor resets per image
        diffs[idx] = d - prev

    dct0, dcl0 = _enc_arrays(*DC_L)
    dct1, dcl1 = _enc_arrays(*DC_C)
    act0, acl0 = _enc_arrays(*AC_L)
    act1, acl1 = _enc_arrays(*AC_C)
    dc_codes = np.stack([dct0, dct1])   # (2, 256)
    dc_lens = np.stack([dcl0, dcl1])
    ac_codes = np.stack([act0, act1])
    ac_lens = np.stack([acl0, acl1])

    # ---- DC records: one per block (key (block, k=0, sub=0))
    dcat, dmag = _cat_mag_vec(diffs, np)
    r_blk = [np.arange(n_blk, dtype=np.int64)]
    r_k = [np.zeros(n_blk, dtype=np.int64)]
    r_sub = [np.zeros(n_blk, dtype=np.int64)]
    r_code = [dc_codes[tq_blk, dcat]]
    r_clen = [dc_lens[tq_blk, dcat]]
    r_mag = [dmag]
    r_mlen = [dcat]

    # ---- AC records from the nonzero coefficients (row-major nonzero scan
    # == ascending (block, k), exactly the scalar emission order)
    rows, kpos = np.nonzero(zz[:, 1:])
    kpos = kpos + 1
    if rows.size:
        vals = zz[rows, kpos]
        first = np.empty(rows.size, dtype=bool)
        first[0] = True
        first[1:] = rows[1:] != rows[:-1]
        prevk = np.empty_like(kpos)
        prevk[0] = 0
        prevk[1:] = kpos[:-1]
        prevk[first] = 0
        gap = kpos - prevk - 1
        nzrl = gap >> 4          # ZRL symbols emitted before this coefficient
        run = gap & 15
        acat, amag = _cat_mag_vec(vals, np)
        rs = (run << 4) | acat
        tq_nz = tq_blk[rows]
        r_blk.append(rows.astype(np.int64))
        r_k.append(kpos.astype(np.int64))
        r_sub.append(nzrl)       # after its ZRLs (their sub = 0..nzrl-1)
        r_code.append(ac_codes[tq_nz, rs])
        r_clen.append(ac_lens[tq_nz, rs])
        r_mag.append(amag)
        r_mlen.append(acat)
        tot_zrl = int(nzrl.sum())
        if tot_zrl:
            zrl_rows = np.repeat(rows, nzrl).astype(np.int64)
            zrl_k = np.repeat(kpos, nzrl).astype(np.int64)
            off = np.cumsum(nzrl) - nzrl
            zrl_sub = np.arange(tot_zrl, dtype=np.int64) - np.repeat(off, nzrl)
            zrl_tq = tq_blk[zrl_rows]
            r_blk.append(zrl_rows)
            r_k.append(zrl_k)
            r_sub.append(zrl_sub)
            r_code.append(ac_codes[zrl_tq, 0xF0])
            r_clen.append(ac_lens[zrl_tq, 0xF0])
            r_mag.append(np.zeros(tot_zrl, dtype=np.int64))
            r_mlen.append(np.zeros(tot_zrl, dtype=np.int64))

    # ---- EOB records for blocks whose last nonzero AC index < 63
    last_nz = np.zeros(n_blk, dtype=np.int64)
    if rows.size:
        last_nz[rows] = kpos     # row-major scan: final write per block is max
    eob = np.nonzero(last_nz < 63)[0]
    if eob.size:
        eob_tq = tq_blk[eob]
        r_blk.append(eob.astype(np.int64))
        r_k.append(np.full(eob.size, 64, dtype=np.int64))
        r_sub.append(np.zeros(eob.size, dtype=np.int64))
        r_code.append(ac_codes[eob_tq, 0x00])
        r_clen.append(ac_lens[eob_tq, 0x00])
        r_mag.append(np.zeros(eob.size, dtype=np.int64))
        r_mlen.append(np.zeros(eob.size, dtype=np.int64))

    blk_a = np.concatenate(r_blk)
    k_a = np.concatenate(r_k)
    sub_a = np.concatenate(r_sub)
    code_a = np.concatenate(r_code)
    clen_a = np.concatenate(r_clen)
    if clen_a.size and int(clen_a.min()) < 1:
        # a gathered length of -1 means the symbol is absent from the
        # Huffman table — preserve the scalar encoder's fail-fast KeyError
        raise KeyError("symbol not present in Huffman table")
    mag_a = np.concatenate(r_mag)
    mlen_a = np.concatenate(r_mlen)
    # blocks are numbered in image order, so sorting by block also groups
    # the stream image-contiguously
    order = np.lexsort((sub_a, k_a, blk_a))

    # each record is (huffman code ‖ magnitude bits); expand the whole
    # batch's bit stream at once, then split/pad/stuff per image
    val_a = (code_a[order] << mlen_a[order]) | mag_a[order]
    tot_a = clen_a[order] + mlen_a[order]       # ≤ 16 + 11 bits
    width = int(tot_a.max())
    j = np.arange(width, dtype=np.int64)
    shift = np.maximum(tot_a[:, None] - 1 - j, 0)
    bits_mat = (val_a[:, None] >> shift) & 1
    bit_stream = bits_mat[j < tot_a[:, None]].astype(np.uint8)
    rec_img = img_of[blk_a[order]]
    img_bits = np.bincount(rec_img, weights=tot_a, minlength=nimg).astype(np.int64)
    bounds = np.concatenate([[0], np.cumsum(img_bits)])

    head, sof_tail, mid = _const_segments(subsample)
    out = []
    ones = np.ones(7, dtype=np.uint8)
    for i, (w, h, _nmcu) in enumerate(dims):
        seg_bits = bit_stream[bounds[i] : bounds[i + 1]]
        pad = (-seg_bits.size) % 8
        if pad:  # pad with 1-bits per spec
            seg_bits = np.concatenate([seg_bits, ones[:pad]])
        packed = np.packbits(seg_bits)
        ffpos = np.nonzero(packed == 0xFF)[0]
        if ffpos.size:  # byte stuffing (T.81 B.1.1.5)
            packed = np.insert(packed, ffpos + 1, 0)
        sof = struct.pack(">HHBHHB", 0xFFC0, 6 + len(sof_tail) + 2, 8, h, w, 3) + sof_tail
        out.append(head + sof + mid + packed.tobytes() + b"\xff\xd9")
    return out


def jpeg_encode(img, subsample=False) -> bytes:
    """Single-image wrapper over jpeg_encode_batch (same bytes)."""
    return jpeg_encode_batch([img], subsample=subsample)[0]


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


def _parse_jpeg(raw: bytes):
    """The real marker walk (segment lengths, table ids), unchanged from the
    scalar decoder: returns (w, h, sampling, scan_spec, tq_of, qt,
    dc_tables, ac_tables, entropy_data)."""
    import numpy as np

    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, object] = {}
    dc_tables: dict[int, tuple] = {}
    ac_tables: dict[int, tuple] = {}
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
                tbl[ZIGZAG] = np.frombuffer(payload, dtype=np.uint8, count=64, offset=p + 1)
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
                # r13: 16-bit-prefix LUT (memoized) instead of the per-bit
                # dict walk — one indexed read per symbol
                (dc_tables if tc == 0 else ac_tables)[th] = _dec_lut(bits, vals)
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
    # strip the EOI off the entropy segment (scan until 0xFFD9)
    end = data.rfind(b"\xff\xd9")
    if end >= 0:
        data = data[:end]
    w, h = dims
    tq_of = {cid: tq for cid, tq in comp_spec}
    return w, h, sampling, scan_spec, tq_of, qt, dc_tables, ac_tables, data


# peak-memory bounds for the vectorized decode (r14, ADVICE item): the
# per-bit look-ahead list costs ~36 bytes per BIT of entropy data (one boxed
# int + list slot), so an unchunked 10k-row Arrow batch of real-sized JPEGs
# would cost gigabytes per task.  Sub-chunking by summed compressed bytes
# caps the transient at ~75 MB per chunk regardless of batch size; a single
# image bigger than the tolist cap falls back to indexing the uint32 window
# array directly (4 bytes/bit, slower per symbol, unbounded-safe).
_DECODE_CHUNK_BYTES = 1 << 18
_TOLIST_BITS_CAP = 1 << 22


def jpeg_decode_batch(raws) -> list:
    """Decode a BATCH of baseline JFIF byte strings → list of
    (width, height, n_components, ndarray[h,w,3]).  Processes the batch in
    sub-chunks of ~_DECODE_CHUNK_BYTES compressed bytes so peak temporaries
    stay bounded by the chunk, not the Arrow batch (worker memory contract).
    """
    if not raws:
        return []
    out: list = []
    cur: list = []
    cur_bytes = 0
    for raw in raws:
        cur.append(raw)
        cur_bytes += len(raw)
        if cur_bytes >= _DECODE_CHUNK_BYTES:
            out.extend(_jpeg_decode_chunk(cur))
            cur, cur_bytes = [], 0
    if cur:
        out.extend(_jpeg_decode_chunk(cur))
    return out


def _jpeg_decode_chunk(raws) -> list:
    """Decode one bounded chunk — see jpeg_decode_batch.  Real marker walk
    per image (segment lengths, table ids, byte stuffing), then the heavy
    phases run batched.  Raises on progressive (SOF2), arithmetic (SOF9+),
    non-3-component, or unsupported-sampling streams — the supported subset
    is exactly what jpeg_encode writes.

    r13 vectorized decode (guide §4.2): the scalar reference pulled the
    entropy stream bit by bit through dict probes (_BitReader/_read_huff)
    and ran one IDCT + two allocations per 8×8 block, per image.  This
    implementation un-stuffs each stream with one array pass, precomputes a
    16-bit look-ahead window per bit position over the CONCATENATED batch
    stream, decodes each Huffman symbol with ONE LUT read (plus one shift
    for its magnitude bits), collects every image's coefficients into a
    single matrix, and batches dequantize + IDCT across the whole batch.
    A symbol's LUT slot is determined by its own first L bits alone
    (canonical prefix code), so the cross-image look-ahead bits cannot
    change any decode inside an image's own bit budget.  Decoded pixels
    are identical to the scalar walk (tests/test_jpeg_vectorized.py)."""
    import numpy as np

    if not raws:
        return []
    m = _cached_dct()
    parsed = [_parse_jpeg(raw) for raw in raws]

    # ---- per-image destuff + validation, then one global bit window.
    # Validity of the whole stream: every 0xFF must begin a (non-
    # overlapping) stuffed 0xFF 0x00 pair, so count equality is the test —
    # the slow scan runs only to produce the error detail.
    cleaned = []
    for _w, _h, _samp, _scan, _tqof, _qt, _dct, _act, data in parsed:
        n_ff = data.count(b"\xff")
        if n_ff:
            if data.endswith(b"\xff"):
                raise ValueError("JPEG entropy stream exhausted")
            if data.count(b"\xff\x00") != n_ff:
                i = 0
                while True:
                    i = data.index(b"\xff", i)
                    if data[i + 1] != 0x00:
                        raise ValueError(
                            f"unexpected marker 0xFF{data[i + 1]:02X} in entropy stream"
                        )
                    i += 2
            data = data.replace(b"\xff\x00", b"\xff")
        cleaned.append(np.frombuffer(data, dtype=np.uint8))
    sizes = np.array([c.size for c in cleaned], dtype=np.int64)
    bounds = np.concatenate([[0], np.cumsum(sizes)]) * 8
    allbytes = np.concatenate(cleaned) if len(cleaned) > 1 else cleaned[0]
    bits_a = np.unpackbits(allbytes)
    tbits = int(bits_a.size)
    padded = np.concatenate([bits_a.astype(np.uint32), np.zeros(16, dtype=np.uint32)])
    w16 = np.zeros(tbits, dtype=np.uint32)
    for jj in range(16):
        w16 |= padded[jj : jj + tbits] << (15 - jj)
    # tolist() trades 4 B/bit (uint32 array) for ~36 B/bit of boxed ints in
    # exchange for much faster per-symbol reads; past the cap (one giant
    # image can exceed any chunking) read through a memoryview instead —
    # same plain-int semantics at every use site, 4 B/bit resident
    wl = w16.tolist() if tbits <= _TOLIST_BITS_CAP else memoryview(w16)

    # ---- entropy decode every image's coefficients into one flat list
    img_meta = []  # (w, h, sh, sv, mh, mw, nmcu, block_base)
    qparts = []
    total_blocks = 0
    for i, (w, h, sampling, scan_spec, tq_of, qt, dc_tables, ac_tables, _d) in enumerate(parsed):
        sh, sv = sampling[0] >> 4, sampling[0] & 0xF
        svsh = sh * sv
        mh, mw = -(-h // (8 * sv)), -(-w // (8 * sh))
        nmcu = mh * mw
        img_meta.append((w, h, sh, sv, mh, mw, nmcu, total_blocks))
        total_blocks += nmcu * (svsh + 2)
        qpat = np.stack(
            [qt[tq_of[scan_spec[0][0]]]] * svsh
            + [qt[tq_of[scan_spec[1][0]]], qt[tq_of[scan_spec[2][0]]]]
        )
        qparts.append(np.tile(qpat, (nmcu, 1, 1)))
    flat = [0] * (total_blocks * 64)
    for i, (w, h, sampling, scan_spec, tq_of, qt, dc_tables, ac_tables, _d) in enumerate(parsed):
        _w, _h, sh, sv, mh, mw, nmcu, block_base = img_meta[i]
        svsh = sh * sv
        # per-MCU component layout: (ci, dc LUT pair, ac LUT pair)
        layout = []
        for ci, (cid, td, ta) in enumerate(scan_spec):
            reps = svsh if ci == 0 else 1
            dcv, dcn = dc_tables[td]
            acv, acn = ac_tables[ta]
            layout.extend([(ci, dcv, dcn, acv, acn)] * reps)
        pos = int(bounds[i])
        nbits = int(bounds[i + 1])
        prev = [0, 0, 0]
        bi = block_base
        for _mcu in range(nmcu):
            for ci, dcv, dcn, acv, acn in layout:
                wv = wl[pos] if pos < nbits else 0
                ln = dcn[wv]
                if ln == 0:
                    raise ValueError("invalid JPEG Huffman code")
                pos += ln
                if pos > nbits:
                    raise ValueError("JPEG entropy stream exhausted")
                cat = dcv[wv]
                if cat:
                    mag = (wl[pos] >> (16 - cat)) if pos < nbits else 0
                    pos += cat
                    if pos > nbits:
                        raise ValueError("JPEG entropy stream exhausted")
                    diff = mag if mag >= (1 << (cat - 1)) else mag - (1 << cat) + 1
                else:
                    diff = 0
                prev[ci] += diff
                base = bi * 64
                flat[base] = prev[ci]
                k = 1
                while k < 64:
                    wv = wl[pos] if pos < nbits else 0
                    ln = acn[wv]
                    if ln == 0:
                        raise ValueError("invalid JPEG Huffman code")
                    pos += ln
                    if pos > nbits:
                        raise ValueError("JPEG entropy stream exhausted")
                    rs = acv[wv]
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += rs >> 4
                    cat = rs & 0xF
                    if k > 63:
                        raise ValueError("AC coefficient index overflow")
                    if cat:
                        mag = (wl[pos] >> (16 - cat)) if pos < nbits else 0
                        pos += cat
                        if pos > nbits:
                            raise ValueError("JPEG entropy stream exhausted")
                        flat[base + k] = (
                            mag if mag >= (1 << (cat - 1)) else mag - (1 << cat) + 1
                        )
                    k += 1
                bi += 1

    # ---- batched dequantize + IDCT over every block of every image
    zzm = np.array(flat, dtype=np.int64).reshape(total_blocks, 64)
    nat = np.zeros((total_blocks, 64))
    nat[:, ZIGZAG] = zzm
    qall = np.concatenate(qparts) if len(qparts) > 1 else qparts[0]
    deq = nat.reshape(total_blocks, 8, 8) * qall
    rec = np.matmul(np.matmul(m.T, deq), m)  # m.T @ coef @ m, batched (BLAS)

    # ---- per-image plane assembly + color transform
    out = []
    for i, (w, h, sh, sv, mh, mw, nmcu, block_base) in enumerate(img_meta):
        svsh = sh * sv
        r = rec[block_base : block_base + nmcu * (svsh + 2)].reshape(
            nmcu, svsh + 2, 8, 8
        )
        y_p = (
            r[:, :svsh]
            .reshape(mh, mw, sv, sh, 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(mh * sv * 8, mw * sh * 8)
        )
        cb = r[:, svsh].reshape(mh, mw, 8, 8).transpose(0, 2, 1, 3).reshape(mh * 8, mw * 8)
        cr = (
            r[:, svsh + 1]
            .reshape(mh, mw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(mh * 8, mw * 8)
        )
        # nearest-neighbor chroma upsample back to luma resolution
        cb_up = np.repeat(np.repeat(cb, sv, axis=0), sh, axis=1)
        cr_up = np.repeat(np.repeat(cr, sv, axis=0), sh, axis=1)
        ycc = np.stack([y_p, cb_up, cr_up], axis=-1)[:h, :w]
        out.append((w, h, 3, _ycbcr_to_rgb(ycc + 128.0)))
    return out


def jpeg_decode(raw: bytes):
    """Baseline JFIF bytes → (width, height, n_components, ndarray[h,w,3]).
    Single-image wrapper over jpeg_decode_batch (same pixels)."""
    return jpeg_decode_batch([raw])[0]
