"""Differential tests for the r13 vectorized JPEG codec paths.

The r13 optimization round rewrote jpeg.jpeg_encode's per-block scalar walk
(FDCT → quantize → zigzag → Huffman emit, one 8×8 block at a time through
_encode_block/_BitWriter) as whole-image array ops + one vectorized bit
pack, and jpeg_decode's per-bit _BitReader/_read_huff walk as a 16-bit-LUT
symbol loop + batched IDCT.  Both scalar reference paths are still in the
module; these tests pin BYTE-identical encode output and PIXEL-identical
decode output across the full sampling-mode space, edge-padded sizes,
noise (byte stuffing), and a crafted high-frequency block that forces the
ZRL (16-zero-run) path.
"""

import numpy as np
import pytest

from pyspark_engine import jpeg as J
from pyspark_engine.llmops import _jpeg_ramp


def scalar_encode(img, subsample=False) -> bytes:
    """The pre-r13 scalar encoder, reassembled from the module's reference
    pieces (_encode_block, _BitWriter) — byte-for-byte the old emission."""
    sh, sv = J.SAMP_FACTORS[subsample]
    h, w, _ = img.shape
    ycc = J._rgb_to_ycbcr(img) - 128.0
    m = J._dct_matrix()
    q = {0: np.array(J.QL, dtype=np.float64).reshape(8, 8),
         1: np.array(J.QC, dtype=np.float64).reshape(8, 8)}
    enc_dc = {0: J._huff_codes(*J.DC_L), 1: J._huff_codes(*J.DC_C)}
    enc_ac = {0: J._huff_codes(*J.AC_L), 1: J._huff_codes(*J.AC_C)}
    bw_ = J._BitWriter()
    prev_dc = [0, 0, 0]
    mh, mw = -(-h // (8 * sv)), -(-w // (8 * sh))
    y_p = J._pad_edge(ycc[..., 0], mh * 8 * sv, mw * 8 * sh)
    cbcr = []
    for c in (1, 2):
        p = J._pad_edge(ycc[..., c], mh * 8 * sv, mw * 8 * sh)
        cbcr.append(p.reshape(mh * 8, sv, mw * 8, sh).mean(axis=(1, 3)))
    for my in range(mh):
        for mx in range(mw):
            for dy in range(sv):
                for dx in range(sh):
                    blk = y_p[(my * sv + dy) * 8 : (my * sv + dy) * 8 + 8,
                              (mx * sh + dx) * 8 : (mx * sh + dx) * 8 + 8]
                    J._encode_block(bw_, blk, 0, 0, prev_dc, m, q, enc_dc, enc_ac)
            for ci, plane in enumerate(cbcr):
                blk = plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                J._encode_block(bw_, blk, 1, ci + 1, prev_dc, m, q, enc_dc, enc_ac)
    bw_.flush()
    return bytes(bw_.out)


def scalar_decode_pixels(raw: bytes):
    """The pre-r13 scalar entropy decode + per-block IDCT, driven off the
    header fields that the (unchanged) marker walk exposes.  Re-parses the
    markers minimally: quant tables, SOF dims/sampling, SOS, entropy data."""
    import struct

    pos = 2
    qt = {}
    dc_t = {}
    ac_t = {}
    dims = sampling = scan_spec = data = comp_spec = None
    while pos < len(raw):
        marker = raw[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", raw[pos : pos + 2])
        payload = raw[pos + 2 : pos + ln]
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                tid = payload[p] & 0xF
                tbl = np.zeros(64)
                for i in range(64):
                    tbl[J.ZIGZAG[i]] = payload[p + 1 + i]
                qt[tid] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC0:
            _, h, w, nc = struct.unpack(">BHHB", payload[:6])
            comp_spec = []
            samps = []
            for i in range(nc):
                cid, samp, tq = payload[6 + 3 * i : 9 + 3 * i]
                samps.append(samp)
                comp_spec.append((cid, tq))
            sampling = samps
            dims = (w, h)
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nv])
                (dc_t if tc == 0 else ac_t)[th] = J._huff_decoder(bits, vals)
                p += 17 + nv
        elif marker == 0xDA:
            ns = payload[0]
            scan_spec = [
                (payload[1 + 2 * i], payload[2 + 2 * i] >> 4, payload[2 + 2 * i] & 0xF)
                for i in range(ns)
            ]
            data = raw[pos + ln :]
            break
        pos += ln
    w, h = dims
    end = data.rfind(b"\xff\xd9")
    if end >= 0:
        data = data[:end]
    r = J._BitReader(data)
    m = J._dct_matrix()
    prev_dc = [0, 0, 0]
    tq_of = {cid: tq for cid, tq in comp_spec}

    def decode_block(ci, cid, td, ta):
        zz = np.zeros(64, dtype=np.int64)
        cat = J._read_huff(r, dc_t[td])
        diff = J._extend(r.bits(cat), cat) if cat else 0
        prev_dc[ci] += diff
        zz[0] = prev_dc[ci]
        k = 1
        while k < 64:
            rs = J._read_huff(r, ac_t[ta])
            run, cat = rs >> 4, rs & 0xF
            if rs == 0x00:
                break
            if rs == 0xF0:
                k += 16
                continue
            k += run
            zz[k] = J._extend(r.bits(cat), cat)
            k += 1
        blk = np.zeros(64)
        blk[J.ZIGZAG] = zz
        coef = blk.reshape(8, 8) * qt[tq_of[cid]]
        return m.T @ coef @ m

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
            cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = decode_block(1, bcid, btd, bta)
            cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = decode_block(2, rcid, rtd, rta)
    cb_up = np.repeat(np.repeat(cb, sv, axis=0), sh, axis=1)
    cr_up = np.repeat(np.repeat(cr, sv, axis=0), sh, axis=1)
    ycc = np.stack([y_p, cb_up, cr_up], axis=-1)[:h, :w]
    return J._ycbcr_to_rgb(ycc + 128.0)


def _zrl_image():
    """An 8×8 image whose quantized Y block has an isolated high-scan-index
    AC coefficient — a >16 zero gap that forces the ZRL emission path."""
    m = J._dct_matrix()
    coef = np.zeros((8, 8))
    coef[5, 5] = 900.0  # survives the /104 quantization at (5,5)
    blk = m.T @ coef @ m + 128.0
    plane = np.clip(np.round(blk), 0, 255).astype(np.uint8)
    return np.stack([plane] * 3, axis=-1)


CASES = [
    ("ramp-17x13", _jpeg_ramp(17, 13, 1, 2, 50)),
    ("ramp-24x18", _jpeg_ramp(24, 18, 2, 2, 40)),
    ("ramp-33x20", _jpeg_ramp(33, 20, 2, 1, 40)),  # partial edge MCUs
    ("ramp-8x8", _jpeg_ramp(8, 8, 0, 0, 115)),
    ("noise-16", np.random.default_rng(0).integers(0, 256, (16, 16, 3), dtype=np.uint8)),
    ("noise-31x22", np.random.default_rng(9).integers(0, 256, (31, 22, 3), dtype=np.uint8)),
    ("zrl", _zrl_image()),
]
MODES = [False, True, "422", "411"]


@pytest.mark.parametrize("mode", MODES, ids=["444", "420", "422", "411"])
def test_jpeg_vectorized_encoder_matches_scalar(mode):
    for name, img in CASES:
        got = J.jpeg_encode(img, subsample=mode)
        i = got.find(b"\xff\xda")
        entropy = got[i + 2 + int.from_bytes(got[i + 2 : i + 4], "big") :]
        want = scalar_encode(img, subsample=mode) + b"\xff\xd9"
        assert entropy == want, f"entropy stream diverged for {name}/{mode}"


def test_zrl_case_actually_emits_zrl():
    """Guard that the crafted case exercises the 16-zero-run branch: its
    quantized Y block must have a >16 gap before a nonzero AC coefficient."""
    img = _zrl_image()
    m = J._dct_matrix()
    q = np.array(J.QL, dtype=np.float64).reshape(8, 8)
    ycc = J._rgb_to_ycbcr(img) - 128.0
    coef = m @ ycc[..., 0] @ m.T
    zz = np.round(coef / q).astype(np.int64).reshape(-1)[J.ZIGZAG]
    nz = np.nonzero(zz[1:])[0] + 1
    assert nz.size and (np.diff(np.concatenate([[0], nz])) - 1 >= 16).any()


@pytest.mark.parametrize("mode", MODES, ids=["444", "420", "422", "411"])
def test_jpeg_vectorized_decoder_matches_scalar(mode):
    for name, img in CASES:
        raw = J.jpeg_encode(img, subsample=mode)
        w, h, nc, got = J.jpeg_decode(raw)
        want = scalar_decode_pixels(raw)
        assert (w, h, nc) == (img.shape[1], img.shape[0], 3)
        assert np.array_equal(got, want), f"decoded pixels diverged for {name}/{mode}"


@pytest.mark.parametrize("mode", MODES, ids=["444", "420", "422", "411"])
def test_batch_equals_per_image(mode):
    """The Arrow workers feed WHOLE batches to jpeg_encode_batch /
    jpeg_decode_batch; mixed sizes in one batch must produce exactly the
    bytes/pixels of one-image-at-a-time calls (DC predictor and bit
    padding reset per image)."""
    imgs = [img for _, img in CASES]
    raws = J.jpeg_encode_batch(imgs, subsample=mode)
    assert raws == [J.jpeg_encode(img, subsample=mode) for img in imgs]
    got = J.jpeg_decode_batch(raws)
    for (w, h, nc, pix), raw in zip(got, raws):
        sw, sh_, sn, spix = J.jpeg_decode(raw)
        assert (w, h, nc) == (sw, sh_, sn)
        assert np.array_equal(pix, spix)


def test_decoder_error_paths_still_raise():
    raw = J.jpeg_encode(_jpeg_ramp(17, 13, 1, 2, 50))
    with pytest.raises(ValueError, match="SOI"):
        J.jpeg_decode(b"\x00\x00" + raw[2:])
    with pytest.raises(ValueError):
        J.jpeg_decode(raw[: len(raw) // 2])  # truncated
    # a non-stuffed marker byte inside the entropy stream must still raise
    i = raw.find(b"\xff\xda")
    body = bytearray(raw)
    body[i + 14] = 0xFF
    body[i + 15] = 0xD7  # looks like an RST marker mid-stream
    with pytest.raises(ValueError, match="entropy stream|Huffman|exhausted"):
        J.jpeg_decode(bytes(body))


def test_decode_batch_chunking_identical(monkeypatch):
    """r14 memory-bound decode (ADVICE): forcing a tiny chunk threshold must
    split the batch into many sub-chunks with pixel-identical output, and
    the over-cap memoryview fallback (no tolist) must decode identically
    too — the paths differ only in how the bit window is read."""
    imgs = [_jpeg_ramp(16 + (i % 3) * 8, 12 + (i % 2) * 8, i % 3, (i + 1) % 3, 40 + i) for i in range(9)]
    raws = [J.jpeg_encode(im, subsample=(i % 2 == 0)) for i, im in enumerate(imgs)]
    want = J.jpeg_decode_batch(raws)
    monkeypatch.setattr(J, "_DECODE_CHUNK_BYTES", 1)  # one image per chunk
    got_chunked = J.jpeg_decode_batch(raws)
    monkeypatch.setattr(J, "_TOLIST_BITS_CAP", 0)  # force memoryview path
    got_mv = J.jpeg_decode_batch(raws)
    for a, b, c in zip(want, got_chunked, got_mv):
        assert a[:3] == b[:3] == c[:3]
        np.testing.assert_array_equal(a[3], b[3])
        np.testing.assert_array_equal(a[3], c[3])


def test_encode_absent_symbol_fails_fast():
    """r14 (ADVICE): an out-of-table symbol must raise (the scalar path's
    KeyError), never emit zero bits and corrupt the stream.  Reach it by
    poisoning the cached encode table for an in-range symbol."""
    img = _jpeg_ramp(16, 16, 1, 2, 50)
    key = ("enc", tuple(J.DC_L[0]), tuple(J.DC_L[1]))
    J._enc_arrays(*J.DC_L)  # populate cache
    codes, lens = J._TABLE_CACHE[key]
    saved = lens.copy()
    try:
        lens[:] = -1  # every DC-luma symbol now "absent"
        with pytest.raises(KeyError):
            J.jpeg_encode_batch([img])
    finally:
        lens[:] = saved
