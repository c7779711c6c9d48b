"""Pure-Python baseline JPEG (ITU-T T.81) codec — stdlib + numpy only.

Round 10 companion to the PNG codec (multimodal.py::_decode_png): the
container has no image libraries, but baseline sequential JPEG is a public
byte format whose every stage is implementable from the spec — marker
segments, stream-defined canonical Huffman tables, zigzag, dequantization,
the type-II DCT (the orthonormal 8-point DCT matrix reproduces the spec's
1/4·C(u)C(v)·ΣΣ definition exactly), and YCbCr↔RGB (JFIF). The decoder is
spec-correct for real-world baseline files: it builds Huffman tables FROM
THE STREAM (no Annex-K assumptions), handles general sampling factors
(4:4:4, 4:2:2, 4:2:0 via per-component planes + replication upsampling),
restart markers, and byte unstuffing. Progressive (SOF2), arithmetic
coding, and 12-bit precision raise loudly — honest seam, not silent
garbage.

The encoder is deterministic and self-contained: flat quantization
tables, per-image canonical Huffman tables built from fixed-length code
budgets (12 DC symbols at 4 bits, 162 AC symbols at 8 bits — valid Kraft
sums, written into DHT so the decoder never needs shared constants), 1×1
sampling, grayscale or 3-component 4:4:4. Compression is modest by
design; correctness and determinism are the contract.

Exactness contract (tests/test_multimodal.py): JPEG is lossy, but the
LOSS IS DEFINED — quantize(DCT(block)) then dequantize+IDCT is a pure
function. The pin recomputes that reconstruction independently in numpy
and requires the decoder's pixel output to match EXACTLY, not "close".
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

#: Zigzag scan order, GENERATED from the anti-diagonal rule (T.81 fig. 5)
#: rather than transcribed: even-sum diagonals run bottom-left→top-right.


def _zigzag_pairs() -> list[tuple[int, int]]:
    out = []
    for s in range(15):
        diag = [(i, s - i) for i in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 0:
            diag = diag[::-1]
        out.extend(diag)
    return out


_ZZ = _zigzag_pairs()
_ZZ_FLAT = np.array([r * 8 + c for r, c in _ZZ], dtype=np.int64)

#: Orthonormal 8-point DCT-II matrix — equals the spec's forward DCT
#: (1/4·C(u)C(v)·ΣΣ cos·cos) when applied as T @ B @ T.T; its transpose
#: inverts it (T.T @ S @ T), which is the spec IDCT.
_T = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _T[_k, _n] = (np.sqrt(1 / 8) if _k == 0 else 0.5) * np.cos(
            (2 * _n + 1) * _k * np.pi / 16
        )

#: Flat quantization tables (any 1..255 values are valid per spec; flat
#: keeps the defined-loss pin simple and the quality decent).
_QT_LUMA = np.full(64, 8, dtype=np.int64)
_QT_CHROMA = np.full(64, 16, dtype=np.int64)


def _huff_canonical(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol map from the DHT BITS/HUFFVAL arrays —
    the canonical assignment of T.81 Annex C."""
    table = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_encode_map(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (length, code), inverse of _huff_canonical."""
    return {v: lc for lc, v in _huff_canonical(bits, vals).items()}


#: Encoder-side table specs: fixed-length canonical tables covering every
#: symbol the encoder can emit. DC: 12 size categories at 4 bits
#: (Kraft 12/16 < 1). AC: all 162 (run,size) symbols at 8 bits
#: (162/256 < 1). Written into DHT, so decode needs no shared constants.
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = list(range(12))
_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_BITS = [0] * 7 + [len(_AC_VALS)] + [0] * 8


class _BitWriter:
    """MSB-first writer with 0xFF stuffing. Bits accumulate in one big
    int and drain to bytes in chunks (r15 perf: one to_bytes + replace
    per ~4 KiB instead of a Python loop per bit — same output bytes:
    MSB-first order, 0x00 after every 0xFF, 1-padded flush)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, length: int) -> None:
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._n += length
        if self._n >= 32768:
            self._drain()

    def _drain(self) -> None:
        rem = self._n % 8
        nbytes = self._n // 8
        if nbytes:
            data = (self._acc >> rem).to_bytes(nbytes, "big")
            self.out += data.replace(b"\xff", b"\xff\x00")  # byte stuffing
            self._acc &= (1 << rem) - 1
            self._n = rem

    def flush(self) -> None:
        pad = -self._n % 8
        if pad:
            self._acc = (self._acc << pad) | ((1 << pad) - 1)  # 1-bits per spec
            self._n += pad
        self._drain()


def _amplitude(v: int) -> tuple[int, int]:
    """(size, raw bits) for a DC diff / AC coefficient value."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, v if v >= 0 else v + (1 << size) - 1


def _encode_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(n_blocks_y, n_blocks_x, 64) quantized zigzagged coefficients."""
    h, w = plane.shape
    by, bx = h // 8, w // 8
    out = np.empty((by, bx, 64), dtype=np.int64)
    shifted = plane.astype(np.float64) - 128.0
    for r in range(by):
        for c in range(bx):
            block = shifted[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8]
            coef = _T @ block @ _T.T
            out[r, c] = np.round(coef.reshape(64)[_ZZ_FLAT] / qt).astype(np.int64)
    return out


def _pad_to_8(px: np.ndarray) -> np.ndarray:
    h, w = px.shape[:2]
    ph, pw = (-h) % 8, (-w) % 8
    return np.pad(px, [(0, ph), (0, pw)] + [(0, 0)] * (px.ndim - 2), mode="edge")


def encode_jpeg_pixels(px: np.ndarray, restart_interval: int = 0) -> bytes:
    """Baseline JFIF bytes from an (h, w) grayscale or (h, w, 3) RGB uint8
    array: 1×1 sampling, flat quant tables, per-spec canonical Huffman
    tables emitted in DHT. Deterministic. ``restart_interval`` > 0 emits
    a DRI segment and RSTn markers every N MCUs (DC predictors reset,
    1-padded byte alignment before each marker, n cycling 0–7 per
    T.81 §B.2.1.2) — used to exercise the decoder's restart path."""
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [_pad_to_8(px).astype(np.float64)]
        qts = [_QT_LUMA]
        qids = [0]
    else:
        rgb = _pad_to_8(px).astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [np.clip(p, 0, 255) for p in (y, cb, cr)]
        qts = [_QT_LUMA, _QT_CHROMA, _QT_CHROMA]
        qids = [0, 1, 1]

    dc_map = _huff_encode_map(_DC_BITS, _DC_VALS)
    ac_map = _huff_encode_map(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    coefs = [_encode_blocks(p, q) for p, q in zip(planes, qts)]
    by, bx = coefs[0].shape[:2]
    prev_dc = [0] * len(planes)
    mcu = 0
    for r in range(by):
        for c in range(bx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                bw.out += struct.pack(
                    ">H", 0xFFD0 + (mcu // restart_interval - 1) % 8
                )
                prev_dc = [0] * len(planes)
            mcu += 1
            for ci, zz in enumerate(coefs):
                blk = zz[r, c]
                diff = int(blk[0]) - prev_dc[ci]
                prev_dc[ci] = int(blk[0])
                size, amp = _amplitude(diff)
                ln, code = dc_map[size]
                bw.write(code, ln)
                if size:
                    bw.write(amp, size)
                run = 0
                nz = np.nonzero(blk[1:])[0]
                last = nz[-1] + 1 if len(nz) else 0
                for i in range(1, last + 1):
                    v = int(blk[i])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, code = ac_map[0xF0]
                        bw.write(code, ln)
                        run -= 16
                    size, amp = _amplitude(v)
                    ln, code = ac_map[(run << 4) | size]
                    bw.write(code, ln)
                    bw.write(amp, size)
                    run = 0
                if last < 63:
                    ln, code = ac_map[0x00]  # EOB
                    bw.write(code, ln)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0]) + bytes(_QT_LUMA[_ZZ_FLAT].tolist()))
    if not gray:
        out += seg(0xFFDB, bytes([1]) + bytes(_QT_CHROMA[_ZZ_FLAT].tolist()))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, qids[ci]])
    out += seg(0xFFC0, sof)
    out += seg(0xFFC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += seg(0xFFC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0 / AC table 0 for all
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg(width: int, height: int, seed: bytes, gray: bool = False) -> bytes:
    """Deterministic md5-seeded JPEG payload (RGB by default), matching
    the encode_bmp/encode_png/encode_wav synthesis convention."""
    import hashlib

    rng = np.random.RandomState(
        int.from_bytes(hashlib.md5(seed).digest()[:4], "little")
    )
    shape = (height, width) if gray else (height, width, 3)
    return encode_jpeg_pixels(rng.randint(0, 256, size=shape, dtype=np.uint8))


# ---------------------------------------------------------------- decode


class _BitReader:
    """MSB-first reader over the entropy-coded segment with 0xFF00
    unstuffing; RSTn markers surface as events the MCU loop consumes.

    Buffered (r15 perf): the accumulator holds up to ~3 buffered bytes
    so ``bits(n)`` is one shift/mask instead of n single-bit calls, and
    ``peek16``/``drop`` give the Huffman LUT its window. Refill is
    strictly on demand and markers NEVER enter the buffer (``peek16``
    restores ``pos`` when a refill hits one), so byte-consumption
    positions — and therefore every marker/truncation error — are
    identical to the old bit-at-a-time reader."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _next_byte(self) -> int:
        d = self.data
        while True:
            if self.pos >= len(d):
                raise ValueError("truncated JPEG entropy stream")
            b = d[self.pos]
            self.pos += 1
            if b != 0xFF:
                return b
            if self.pos >= len(d):
                raise ValueError("truncated JPEG entropy stream")
            nxt = d[self.pos]
            if nxt == 0x00:
                self.pos += 1
                return 0xFF
            raise _MarkerHit(0xFF00 | nxt)

    def bit(self) -> int:
        return self.bits(1)

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self._n < n:
            self._acc = (self._acc << 8) | self._next_byte()
            self._n += 8
        self._n -= n
        v = (self._acc >> self._n) & ((1 << n) - 1)
        self._acc &= (1 << self._n) - 1
        return v

    def peek16(self) -> tuple[int, int]:
        """(window, avail): up to 16 buffered bits left-aligned into a
        16-bit window (zero-padded past stream edges/markers), without
        consuming anything and without consuming a marker."""
        while self._n < 16:
            save = self.pos
            try:
                b = self._next_byte()
            except (_MarkerHit, ValueError):
                self.pos = save
                break
            self._acc = (self._acc << 8) | b
            self._n += 8
        if self._n >= 16:
            return (self._acc >> (self._n - 16)) & 0xFFFF, 16
        return (self._acc << (16 - self._n)) & 0xFFFF, self._n

    def drop(self, n: int) -> None:
        """Consume n already-buffered bits (peek16 guaranteed them)."""
        self._n -= n
        self._acc &= (1 << self._n) - 1

    def align(self) -> None:
        # drop only the partial-byte remainder: whole buffered bytes are
        # pure data (markers never enter the buffer) and stay readable
        self._n -= self._n % 8
        self._acc &= (1 << self._n) - 1

    def peek_marker(self) -> int | None:
        """Marker at the current byte-aligned position, else None."""
        if self._n >= 8:
            # next logical byte is already buffered ⇒ it is data, not a
            # marker (refill stops at markers without consuming them)
            return None
        if self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt != 0x00:
                return 0xFF00 | nxt
        return None


class _MarkerHit(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


#: (sorted table items) → (sym, code_len) flat 2^16 lists. The synth
#: encoder emits the fixed spec tables, so in practice this builds once
#: per table kind and every subsequent image hits the cache.
_LUT_CACHE: dict[tuple, tuple[list, list]] = {}


#: id(table) → (strong table ref, luts): skips the sorted-items key
#: build on the per-block hot path. The strong ref pins the dict so its
#: id is never reused while the entry lives; capped to stay bounded.
_LUT_BY_ID: dict[int, tuple[dict, tuple[list, list]]] = {}


def _huff_lut(table: dict[tuple[int, int], int]) -> tuple[list, list]:
    by_id = _LUT_BY_ID.get(id(table))
    if by_id is not None and by_id[0] is table:
        return by_id[1]
    key = tuple(sorted(table.items()))
    hit = _LUT_CACHE.get(key)
    if hit is None and len(_LUT_CACHE) > 64:
        # externally-produced JPEGs carry per-image optimized tables —
        # without a cap a long decode job retains 2×65536 lists per
        # distinct table forever (review r15)
        _LUT_CACHE.clear()
    if hit is not None:
        if len(_LUT_BY_ID) > 64:
            _LUT_BY_ID.clear()
        _LUT_BY_ID[id(table)] = (table, hit)
        return hit
    sym = np.zeros(1 << 16, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.int16)
    for (length, code), s in table.items():
        lo = code << (16 - length)
        hi = lo + (1 << (16 - length))
        sym[lo:hi] = s
        ln[lo:hi] = length
    out = (sym.tolist(), ln.tolist())
    _LUT_CACHE[key] = out
    if len(_LUT_BY_ID) > 64:
        _LUT_BY_ID.clear()
    _LUT_BY_ID[id(table)] = (table, out)
    return out


def _huff_read_slow(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _huff_read(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    window, avail = br.peek16()
    sym_l, len_l = _huff_lut(table)
    ln = len_l[window]
    if 0 < ln <= avail:
        br.drop(ln)
        return sym_l[window]
    if avail == 16:
        raise ValueError("invalid JPEG Huffman code")
    # stream edge (marker/truncation inside the 16-bit window): replay
    # bit-by-bit so the error surfaces at exactly the old position
    return _huff_read_slow(br, table)


def _extend(v: int, size: int) -> int:
    return v if size == 0 or v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg_pixels(payload: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes to an (h, w) grayscale or (h, w, 3) RGB
    uint8 array. Spec subset: baseline sequential (SOF0), 8-bit, stream
    Huffman tables, sampling factors ≤ 2 (444/422/420 via replication
    upsampling), restart markers. Progressive/arithmetic/12-bit raise."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before the
        # marker byte — skip them so the length read lands on the real
        # segment header.
        while payload[pos + 1] == 0xFF:
            pos += 1
            if pos + 4 > len(payload):
                raise ValueError("truncated JPEG (fill bytes run off end)")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI with no scan
            raise ValueError("JPEG has no scan data")
        (ln,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT (possibly multiple tables per segment)
            b = body
            while b:
                prec, tid = b[0] >> 4, b[0] & 0x0F
                if prec != 0:
                    raise ValueError("16-bit quant tables not supported")
                zz = np.frombuffer(b[1:65], dtype=np.uint8).astype(np.int64)
                qt = np.empty(64, dtype=np.int64)
                qt[_ZZ_FLAT] = zz
                qts[tid] = qt
                b = b[65:]
        elif marker == 0xC4:  # DHT
            b = body
            while b:
                tclass, tid = b[0] >> 4, b[0] & 0x0F
                bits = list(b[1:17])
                n = sum(bits)
                vals = list(b[17 : 17 + n])
                huff[(tclass, tid)] = _huff_canonical(bits, vals)
                b = b[17 + n :]
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for ci in range(ncomp):
                cid, samp, qid = body[6 + ci * 3 : 9 + ci * 3]
                comps.append((cid, samp >> 4, samp & 0x0F, qid))
            sof = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                        0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG (SOF0/1) supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan_tables = []
            for ci in range(ns):
                cid, tsel = body[1 + ci * 2 : 3 + ci * 2]
                scan_tables.append((cid, tsel >> 4, tsel & 0x0F))
            return _decode_scan(
                payload, pos + 2 + ln, sof, qts, huff, scan_tables,
                restart_interval,
            )
        pos += 2 + ln
    raise ValueError("JPEG missing SOS")


def _decode_scan(payload, pos, sof, qts, huff, scan_tables, restart_interval):
    h, w, comps = sof
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    planes = {}
    for cid, ch, cv, _ in comps:
        planes[cid] = np.zeros((mcus_y * cv * 8, mcus_x * ch * 8), dtype=np.float64)
    sel = {cid: (dc, ac) for cid, dc, ac in scan_tables}
    br = _BitReader(payload, pos)
    prev_dc = {cid: 0 for cid, *_ in comps}
    try:
        _decode_mcus(
            br, comps, sel, huff, qts, planes, prev_dc,
            mcus_x, mcus_y, restart_interval,
        )
    except _MarkerHit as exc:
        # Corruption-honesty contract: decoders raise ValueError, never an
        # internal exception type (r10 advice). A marker mid-entropy-stream
        # outside an expected RST position means a truncated/corrupt scan.
        raise ValueError(
            f"unexpected marker 0x{exc.marker:04x} in JPEG entropy stream"
        ) from None
    out_planes = []
    for cid, ch, cv, _ in comps:
        p = planes[cid]
        if ch != max_h or cv != max_v:
            p = np.repeat(np.repeat(p, max_v // cv, axis=0), max_h // ch, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_mcus(br, comps, sel, huff, qts, planes, prev_dc,
                 mcus_x, mcus_y, restart_interval):
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.align()
                m = br.peek_marker()
                if m is not None and 0xFFD0 <= m <= 0xFFD7:
                    br.pos += 2
                    prev_dc = {cid: 0 for cid in prev_dc}
            for cid, ch, cv, qid in comps:
                dct, act = huff[(0, sel[cid][0])], huff[(1, sel[cid][1])]
                qt = qts[qid]
                for v in range(cv):
                    for hh in range(ch):
                        blk = np.zeros(64, dtype=np.int64)
                        s = _huff_read(br, dct)
                        diff = _extend(br.bits(s), s) if s else 0
                        prev_dc[cid] += diff
                        blk[0] = prev_dc[cid]
                        i = 1
                        while i < 64:
                            sym = _huff_read(br, act)
                            if sym == 0x00:
                                break
                            if sym == 0xF0:
                                i += 16
                                continue
                            run, size = sym >> 4, sym & 0x0F
                            i += run
                            if i > 63:
                                raise ValueError("JPEG AC run past block end")
                            blk[i] = _extend(br.bits(size), size)
                            i += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[_ZZ_FLAT] = blk * qt
                        block = _T.T @ coef.reshape(8, 8) @ _T + 128.0
                        y0 = (my * cv + v) * 8
                        x0 = (mx * ch + hh) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu += 1


def decode_jpeg(payload: bytes) -> dict:
    """Feature-frame decode matching the BMP/PPM/PNG convention:
    (n_bytes, format, width, height, mean_luma) with Rec.601 luma over
    the reconstructed pixels."""
    px = decode_jpeg_pixels(payload)
    if px.ndim == 2:
        luma = px.astype(np.float64)
    else:
        p = px.astype(np.float64)
        luma = 0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]
    return {
        "n_bytes": len(payload),
        "format": "jpeg",
        "width": int(px.shape[1]),
        "height": int(px.shape[0]),
        "mean_luma": round(float(luma.mean()) / 255.0, 4),
    }
