"""Vendored baseline JPEG (ITU-T T.81) decoder -- the container-constraint
pixel tier for the dominant web image format, sibling of the pure-stdlib
PNG unfilter in ``ops.multimodal``.

Scope (deliberate, documented):

* baseline sequential DCT (SOF0), 8-bit precision, grayscale or YCbCr;
* one interleaved scan covering all components (plus the grayscale
  single-component scan) -- the layout virtually every camera/encoder
  emits; progressive (SOF2), arithmetic coding, hierarchical and
  multi-scan baseline raise ``ValueError`` and take the header-dims tier
  upstream (``decoder='header:jpeg'``);
* the luma plane ONLY: the perceptual-hash consumers need Y, and JPEG
  stores Y as its own component, so chroma blocks are entropy-SKIPPED
  (their coefficient lengths must be parsed to advance the bit stream)
  but never dequantized/IDCT'd -- roughly a 1.5-2x decode saving at
  4:2:0;
* Y must be stored at full resolution (``h_y == Hmax and v_y == Vmax``,
  true for all standard subsampling layouts 4:4:4 / 4:2:2 / 4:2:0).

Exactness: a general JPEG's decoded pixels are IDCT-implementation-
defined (T.81 only bounds the error), so unlike PNG there is no
bit-exact cross-decoder contract for arbitrary payloads.  The oracle
strategy therefore uses DC-ONLY images (every 8x8 block constant): for
those, any compliant IDCT reproduces the block value EXACTLY (the DC
basis function is flat), so a closed-form SQL oracle can recompute
hashes without touching JPEG bytes, and a PIL/libjpeg parity test is
exact as well (``tests/test_images.py``; gated on PIL availability).
The numpy matrix IDCT here keeps float error ~1e-13 on DC-only blocks
-- far below the round-to-nearest threshold.

Throughput: the entropy loop is pure Python (same vendored-tier
trade as the PNG unfilter, measured and documented in
BENCH/BASELINE.md); production swaps in the ``decode_image_real`` PIL
seam via ``image_hashes(use_native=True)``.

Public-spec provenance: marker structure, zigzag order, canonical
Huffman construction (F.2.2.3 MINCODE/MAXCODE/VALPTR) and the Annex K
example Huffman tables are all from the public ITU-T T.81 standard.  No
reference-repo counterpart (NReadability has no image pipeline).
"""

from __future__ import annotations

import struct

# zigzag index -> linear (row*8 + col), generated from the diagonal rule
ZIGZAG: list[int] = []
for _s in range(15):
    _rng = range(max(0, _s - 7), min(_s, 7) + 1)
    for _r in (_rng if _s % 2 else reversed(_rng)):
        ZIGZAG.append(_r * 8 + (_s - _r))

# ITU-T T.81 Annex K.3 example Huffman tables (the de-facto standard set)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
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
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


class _HuffTable:
    """Canonical Huffman decode arrays (T.81 F.2.2.3: MINCODE / MAXCODE /
    VALPTR per code length) + an encode map for the synthetic encoder."""

    def __init__(self, bits: list[int], vals: list[int]):
        if len(bits) != 16 or sum(bits) != len(vals):
            raise ValueError("malformed Huffman table")
        self.counts = list(bits)
        self.vals = list(vals)
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        self.encode: dict[int, tuple[int, int]] = {}
        for length in range(1, 17):
            self.mincode[length] = code
            self.valptr[length] = k
            for _ in range(bits[length - 1]):
                self.encode[vals[k]] = (code, length)
                code += 1
                k += 1
            self.maxcode[length] = code - 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over de-stuffed entropy bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("entropy stream exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _decode_symbol(r: _BitReader, t: _HuffTable) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        # the zero-count guard matters on corrupt streams: a length with
        # no codes has maxcode = mincode-1, and a garbage accumulated
        # code below mincode would otherwise index vals negatively
        if t.counts[length - 1] and t.mincode[length] <= code <= t.maxcode[length]:
            return t.vals[t.valptr[length] + code - t.mincode[length]]
    raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map an s-bit magnitude to its signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _idct_blocks(blocks):
    """Vectorized 2-D type-III DCT (the JPEG IDCT) over an (n, 8, 8)
    float array of dequantized coefficients, orthonormal scaling."""
    import numpy as np

    global _IDCT_M
    try:
        M = _IDCT_M
    except NameError:
        x = np.arange(8)
        M = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) * np.sqrt(
            2.0 / 8
        )
        M[0, :] = np.sqrt(1.0 / 8)
        _IDCT_M = M
    # f = M^T F M  (per block)
    return np.einsum("ur,nuv,vc->nrc", M, blocks, M, optimize=True)


def _split_entropy(raw: bytes, start: int) -> tuple[list[bytes], int]:
    """De-stuff the entropy-coded segment beginning at ``start`` into
    restart-delimited chunks.  Returns (chunks, index_after_segment)."""
    chunks: list[bytearray] = [bytearray()]
    i = start
    n = len(raw)
    while i < n:
        b = raw[i]
        if b != 0xFF:
            chunks[-1].append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = raw[i + 1]
        if m == 0x00:  # stuffed 0xFF data byte
            chunks[-1].append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn: new chunk, reader realigns
            chunks.append(bytearray())
            i += 2
        else:  # real marker (EOI or next header) ends the segment
            break
    return [bytes(c) for c in chunks], i


def decode_jpeg_luma_milli(raw: bytes, max_pixels: int | None = None):
    """Decode a baseline JPEG's LUMA plane: ``(w, h, lumas)`` with
    ``lumas`` a row-major list of ``Y*1000`` integers -- the same
    scale-1000 convention as :func:`~nreadspark.ops.multimodal.
    png_luma_milli` (and the identical quantity: JPEG's Y IS the ITU-R
    601 luma).  ``ValueError`` on anything outside the documented
    baseline scope -- the caller's containment tier."""
    import numpy as np

    if len(raw) < 4 or raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qtables: dict[int, list[int]] = {}
    dc_tables: dict[int, _HuffTable] = {}
    ac_tables: dict[int, _HuffTable] = {}
    frame = None  # (w, h, components)
    restart_interval = 0
    i = 2
    n = len(raw)
    while i + 4 <= n:
        if raw[i] != 0xFF:
            raise ValueError("marker expected")
        marker = raw[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = int.from_bytes(raw[i + 2 : i + 4], "big")
        body = raw[i + 4 : i + 2 + seg_len]
        if len(body) != seg_len - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0xF
                j += 1
                if pq == 0:
                    q = list(body[j : j + 64])
                    j += 64
                else:
                    q = [
                        int.from_bytes(body[j + 2 * k : j + 2 * k + 2], "big")
                        for k in range(64)
                    ]
                    j += 128
                if len(q) != 64 or not q[-1:]:
                    raise ValueError("truncated DQT")
                qtables[tq] = q
        elif marker == 0xC4:  # DHT
            j = 0
            while j + 17 <= len(body):
                tc, th = body[j] >> 4, body[j] & 0xF
                bits = list(body[j + 1 : j + 17])
                cnt = sum(bits)
                vals = list(body[j + 17 : j + 17 + cnt])
                if len(vals) != cnt:
                    raise ValueError("truncated DHT")
                (dc_tables if tc == 0 else ac_tables)[th] = _HuffTable(bits, vals)
                j += 17 + cnt
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1: baseline-decodable
            prec = body[0]
            h, w = struct.unpack(">HH", body[1:5])
            nc = body[5]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/arithmetic/hierarchical)")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            w, h, comps = frame
            if max_pixels is not None and w * h > max_pixels:
                raise ValueError("image exceeds max_pixels")
            ns = body[0]
            if ns != len(comps):
                raise ValueError("multi-scan baseline unsupported")
            scan_sel = {}
            for s in range(ns):
                cs, tables = body[1 + 2 * s], body[2 + 2 * s]
                scan_sel[cs] = (tables >> 4, tables & 0xF)
            chunks, _ = _split_entropy(raw, i + 2 + seg_len)
            return _decode_scan(
                np, w, h, comps, scan_sel, qtables, dc_tables, ac_tables,
                chunks, restart_interval,
            )
        i += 2 + seg_len
    raise ValueError("no SOS segment")


def _decode_scan(
    np, w, h, comps, scan_sel, qtables, dc_tables, ac_tables, chunks,
    restart_interval,
):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if comps[0][1] != hmax or comps[0][2] != vmax:
        raise ValueError("luma not stored at full resolution")
    if len(comps) == 1:
        # non-interleaved single-component scan: MCU is ONE block
        mcus_x = (w + 7) // 8
        mcus_y = (h + 7) // 8
        hmax = vmax = 1
        comps = [(comps[0][0], 1, 1, comps[0][3])]
    else:
        mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
        mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    luma_id = comps[0][0]
    for cid, _, _, tq in comps:
        if tq not in qtables:
            raise ValueError("missing quantization table")
        if cid not in scan_sel:
            raise ValueError("scan omits a frame component")
        td, ta = scan_sel[cid]
        if td not in dc_tables or ta not in ac_tables:
            raise ValueError("missing Huffman table")
    yq = np.array(
        [qtables[comps[0][3]][k] for k in range(64)], dtype=np.float64
    )
    # zigzag -> linear permutation applied once per stored block
    zz = np.array(ZIGZAG, dtype=np.int64)

    hy, vy = comps[0][1], comps[0][2]
    blocks_per_mcu_y = hy * vy
    y_blocks = np.zeros((mcus_x * mcus_y * blocks_per_mcu_y, 64), dtype=np.float64)

    n_mcus = mcus_x * mcus_y
    mcu_index = 0
    chunk_iter = iter(chunks)
    reader = _BitReader(next(chunk_iter))
    preds = {cid: 0 for cid, *_ in comps}
    interval = restart_interval if restart_interval else n_mcus
    stored = 0
    while mcu_index < n_mcus:
        if mcu_index and restart_interval and mcu_index % interval == 0:
            # restart: next chunk, byte-aligned, predictors reset
            try:
                reader = _BitReader(next(chunk_iter))
            except StopIteration:
                raise ValueError("missing restart marker") from None
            preds = {cid: 0 for cid, *_ in comps}
        for cid, ch, cv, _tq in comps:
            td, ta = scan_sel[cid]
            dct, act = dc_tables[td], ac_tables[ta]
            for _b in range(ch * cv):
                is_luma = cid == luma_id
                coeffs = y_blocks[stored] if is_luma else None
                # DC
                s = _decode_symbol(reader, dct)
                diff = _extend(reader.receive(s), s) if s else 0
                preds[cid] += diff
                if is_luma:
                    coeffs[0] = preds[cid]
                # AC run-length
                k = 1
                while k < 64:
                    rs = _decode_symbol(reader, act)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("AC run past block end")
                    v = _extend(reader.receive(s), s)
                    if is_luma:
                        coeffs[k] = v
                    k += 1
                if is_luma:
                    stored += 1
        mcu_index += 1

    # dequant + de-zigzag + IDCT, vectorized over every luma block
    deq = np.zeros_like(y_blocks)
    deq[:, zz] = y_blocks * yq[None, :]
    pix = _idct_blocks(deq.reshape(-1, 8, 8))
    pix = np.clip(np.floor(pix + 128.5), 0, 255).astype(np.int64)

    # assemble the luma plane from per-MCU block order, crop to (w, h)
    plane_w, plane_h = mcus_x * hy * 8, mcus_y * vy * 8
    plane = np.zeros((plane_h, plane_w), dtype=np.int64)
    b = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(vy):
                for bx in range(hy):
                    y0 = (my * vy + by) * 8
                    x0 = (mx * hy + bx) * 8
                    plane[y0 : y0 + 8, x0 : x0 + 8] = pix[b]
                    b += 1
    plane = plane[:h, :w] * 1000
    return w, h, plane.reshape(-1).tolist()


# ---------------------------------------------------------------------------
# synthetic encoders (tests + oracles) -- real, spec-conformant output


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            # pad with 1-bits per spec
            self.acc = (self.acc << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def _write_coeff_bits(wtr: _BitWriter, v: int, s: int) -> None:
    if s == 0:
        return
    wtr.write(v if v >= 0 else v + (1 << s) - 1, s)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _encode_block(wtr, coeffs, pred, dct: _HuffTable, act: _HuffTable) -> int:
    """Entropy-encode one 64-coeff zigzag block; returns the new DC pred."""
    dc = coeffs[0]
    diff = dc - pred
    s = _category(diff)
    code, length = dct.encode[s]
    wtr.write(code, length)
    _write_coeff_bits(wtr, diff, s)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coeffs[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        if coeffs[k] == 0:
            run += 1
            continue
        while run > 15:
            code, length = act.encode[0xF0]  # ZRL
            wtr.write(code, length)
            run -= 16
        s = _category(coeffs[k])
        code, length = act.encode[(run << 4) | s]
        wtr.write(code, length)
        _write_coeff_bits(wtr, coeffs[k], s)
        run = 0
    if last_nz < 63:
        code, length = act.encode[0x00]  # EOB
        wtr.write(code, length)
    return dc


def _forward_dct_blocks(blocks):
    import numpy as np

    x = np.arange(8)
    M = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) * np.sqrt(2.0 / 8)
    M[0, :] = np.sqrt(1.0 / 8)
    # F = M f M^T (the exact transpose-inverse of _idct_blocks' f = M^T F M)
    return np.einsum("ur,nrc,vc->nuv", M, blocks, M, optimize=True)


def encode_gray_jpeg(
    w: int,
    h: int,
    pixels: bytes,
    quant: int = 1,
    restart_interval: int = 0,
) -> bytes:
    """Real baseline grayscale JPEG encoder (forward float DCT, uniform
    quantizer ``quant``, Annex K Huffman tables, optional restart
    markers) -- exercises the decoder's AC/run-length/restart paths in
    tests.  Lossless only in the DC-only constant-block case; general
    images round-trip within IDCT tolerance."""
    import numpy as np

    if len(pixels) != w * h:
        raise ValueError("pixel buffer does not match dimensions")
    dct = _HuffTable(DC_LUMA_BITS, DC_LUMA_VALS)
    act = _HuffTable(AC_LUMA_BITS, AC_LUMA_VALS)
    bw, bh = (w + 7) // 8, (h + 7) // 8
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w).astype(np.float64)
    # edge-replicate padding keeps block stats sane
    img = np.pad(img, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge") - 128.0
    blocks = (
        img.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    coeffs = _forward_dct_blocks(blocks)
    zz = ZIGZAG
    q = np.full(64, quant, dtype=np.float64)
    quantized = np.round(coeffs.reshape(-1, 64)[:, zz] / q[None, :]).astype(int)
    # the Annex K AC table tops out at category 10 (|v| <= 1023); only a
    # near-checkerboard extreme can exceed it -- clamp ACs, never the DC
    quantized[:, 1:] = np.clip(quantized[:, 1:], -1023, 1023)

    wtr = _BitWriter()
    pred = 0
    body = bytearray()
    interval = restart_interval if restart_interval else bw * bh
    rst = 0
    for i in range(bw * bh):
        if i and restart_interval and i % interval == 0:
            body += wtr.flush()
            body += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            wtr = _BitWriter()
            pred = 0
        pred = _encode_block(wtr, quantized[i].tolist(), pred, dct, act)
    body += wtr.flush()

    qz = bytes([quant] * 64)
    out = b"\xff\xd8"
    out += _seg(0xDB, bytes([0x00]) + qz)
    out += _seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    out += _seg(0xC4, bytes([0x00] + DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    out += _seg(0xC4, bytes([0x10] + AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bytes(body)
    out += b"\xff\xd9"
    return out


def encode_blocky_jpeg(
    w_blocks: int,
    h_blocks: int,
    block_vals: list[int],
    color_420: bool = False,
) -> bytes:
    """DC-only JPEG whose 8x8 blocks are CONSTANT ``block_vals`` (row
    major) -- the exact-decode construction: any compliant IDCT
    reproduces a flat block bit-for-bit, so hashes computed from the
    decode equal hashes computed from the block formula, for OUR decoder
    and for PIL/libjpeg alike.  ``color_420=True`` wraps the same luma
    in a 3-component YCbCr 4:2:0 frame with flat gray chroma, exercising
    the interleaved/subsampled/chroma-skip decode paths."""
    dct = _HuffTable(DC_LUMA_BITS, DC_LUMA_VALS)
    act = _HuffTable(AC_LUMA_BITS, AC_LUMA_VALS)
    if len(block_vals) != w_blocks * h_blocks:
        raise ValueError("block_vals does not match grid")
    w, h = 8 * w_blocks, 8 * h_blocks
    wtr = _BitWriter()

    def dc_block(v_shifted: int, pred: int) -> int:
        # constant block: DC = 8 * (v - 128), all AC zero
        return _encode_block(wtr, [8 * v_shifted] + [0] * 63, pred, dct, act)

    if not color_420:
        pred = 0
        for v in block_vals:
            pred = dc_block(v - 128, pred)
    else:
        if w_blocks % 2 or h_blocks % 2:
            raise ValueError("4:2:0 grid needs even block dimensions")
        preds = {1: 0, 2: 0, 3: 0}
        for my in range(h_blocks // 2):
            for mx in range(w_blocks // 2):
                for by in range(2):
                    for bx in range(2):
                        v = block_vals[(my * 2 + by) * w_blocks + mx * 2 + bx]
                        preds[1] = dc_block(v - 128, preds[1])
                preds[2] = dc_block(0, preds[2])  # flat Cb = 128
                preds[3] = dc_block(0, preds[3])  # flat Cr = 128
    body = wtr.flush()

    out = b"\xff\xd8"
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    if not color_420:
        sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
        sos = bytes([1, 1, 0x00, 0, 63, 0])
    else:
        sof = (
            bytes([8])
            + struct.pack(">HH", h, w)
            + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])
        )
        sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00] + DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    out += _seg(0xC4, bytes([0x10] + AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    out += _seg(0xDA, sos)
    out += body
    out += b"\xff\xd9"
    return out
