"""JPEG (ITU-T T.81) codec — pure python + numpy, baseline AND progressive.

The biggest real-crawl image format, implemented from the public spec so
`kgspark.multimodal` can feature-extract and resize actual web images
with no PIL/libjpeg dependency:

- **decode** (`decode_jpeg_rgb`): marker walk (SOI/APPn/COM/DQT/DHT/
  SOF0/SOF1/SOF2/DRI/SOS/EOI), Huffman tables read from the FILE's own
  DHT segments (so any real-world JPEG decodes, not just ours), 8/16-bit
  DQT, byte unstuffing, restart markers, arbitrary sampling factors
  (4:4:4, 4:2:2, 4:2:0, grayscale). Coefficients accumulate across
  scans, which makes PROGRESSIVE (SOF2) a first-class path: spectral
  selection, successive approximation (DC bit refinement, AC refinement
  with correction bits), EOB runs, interleaved DC / non-interleaved AC
  scans. Reconstruction is one vectorized dequant -> dezigzag -> 8x8
  IDCT pass (einsum over all blocks) -> chroma replication -> YCbCr->RGB.
  Lossless/arithmetic/hierarchical SOFs raise at the disclosed seam.
- **encode** (`encode_jpeg`, `encode_jpeg_progressive`): 4:4:4/4:2:2/
  4:2:0/gray baseline and 4:4:4/gray progressive, with per-image
  OPTIMIZED Huffman tables (two-pass: symbol frequencies -> canonical
  length-limited code, the libjpeg "optimize coding" path — no Annex K
  tables hardcoded anywhere), quality-scaled quantization (quality=100
  -> all-ones tables, where DCT round-trip error is <=1/pixel and flat
  blocks are EXACT). The progressive encoder emits token streams that
  mirror the decoder's exact consumption order, so every progressive
  decode path has in-repo test vectors. Invariant pinned by tests:
  progressive and baseline encode the SAME coefficients, so their
  decodes are bit-identical at equal quality.

The encoders exist for fixtures and the resize re-encode path; the
decoder is the production surface. Scale shape: both run inside
Arrow-batched kernels (`multimodal.extract_features` / `resize_images`)
— per-payload work, partition-parallel, no shuffle implications.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: zigzag_index[k] = position in the 8x8 block (row*8+col)
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Orthonormal 8-point DCT-II basis: F = T @ B @ T.T ; B = T.T @ F @ T
_T = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        c = np.sqrt(0.125) if _u == 0 else 0.5
        _T[_u, _x] = c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

# ISO/IEC 10918-1 Annex K.1 example quantization tables (the de-facto
# standard base tables every quality scale derives from)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-compatible quality scaling of the Annex K base tables;
    quality=100 gives all-ones (near-lossless DCT round-trip)."""
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((QUANT_LUMA * scale + 50) // 100, 1, 255)
    qc = np.clip((QUANT_CHROMA * scale + 50) // 100, 1, 255)
    return ql.astype(np.int64), qc.astype(np.int64)


# ---------------------------------------------------------------------------
# Huffman (JPEG flavor: BITS[1..16] counts + HUFFVAL symbol list)


def build_huffman_spec(freqs: dict[int, int]) -> tuple[list[int], list[int]]:
    """(bits, huffval) from symbol frequencies — the optimize-coding path.

    A pseudo-symbol with frequency 1 is included so no REAL symbol is
    assigned the all-ones code (T.81 reserves it), then lengths beyond 16
    are folded down with the Annex K.3 Adjust_BITS procedure."""
    import heapq

    counts = dict(freqs)
    PSEUDO = 256
    counts[PSEUDO] = 1
    heap = [(f, s, (s,)) for s, f in counts.items()]
    heapq.heapify(heap)
    if len(heap) == 1:
        lengths = {next(iter(counts)): 1}
    else:
        depth: dict[int, int] = {s: 0 for s in counts}
        while len(heap) > 1:
            f1, t1, g1 = heapq.heappop(heap)
            f2, t2, g2 = heapq.heappop(heap)
            for s in g1 + g2:
                depth[s] += 1
            heapq.heappush(heap, (f1 + f2, min(t1, t2), g1 + g2))
        lengths = depth
    bits = [0] * 33
    for s, l in lengths.items():
        bits[min(l, 32)] += 1
    # Adjust_BITS: fold lengths > 16 down (take two codes from the longest
    # length, move one up — standard K.3)
    i = 32
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    # assign the adjusted length multiset to symbols in (orig length,
    # symbol) order, with the pseudo symbol FORCED LAST so the deepest
    # code — the canonical all-ones one — always lands on it and is then
    # dropped (swapping two symbols' lengths keeps the multiset, hence
    # Kraft validity)
    symlen = sorted((l, s) for s, l in lengths.items() if s != PSEUDO)
    symlen.append((lengths[PSEUDO], PSEUDO))
    flat: list[int] = []
    for l in range(1, 17):
        flat.extend([l] * bits[l])
    out_bits = [0] * 17
    huffval: list[int] = []
    for (_orig_l, s), l in zip(symlen, flat):
        if s == PSEUDO:
            continue  # its (all-ones) code is never emitted
        out_bits[l] += 1
        huffval.append(s)
    return out_bits[1:], huffval


def huffman_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 C.2 canonical code generation."""
    codes = {}
    code, k = 0, 0
    for l in range(1, 17):
        for _ in range(bits[l - 1]):
            codes[huffval[k]] = (code, l)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Canonical table-walk decoder built from (bits, huffval)."""

    __slots__ = ("min_code", "max_code", "val_idx", "huffval")

    def __init__(self, bits: list[int], huffval: list[int]) -> None:
        self.huffval = huffval
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_idx = [0] * 17
        code, k = 0, 0
        for l in range(1, 17):
            if bits[l - 1]:
                self.val_idx[l] = k
                self.min_code[l] = code
                code += bits[l - 1]
                k += bits[l - 1]
                self.max_code[l] = code - 1
            else:
                self.max_code[l] = -1
            code <<= 1

    def decode(self, br: "_BitReader") -> int:
        code, l = 0, 0
        while True:
            code = (code << 1) | br.read_bit()
            l += 1
            if l > 16:
                raise ValueError("corrupt JPEG: huffman code > 16 bits")
            if self.max_code[l] >= code >= self.min_code[l]:
                return self.huffval[self.val_idx[l] + code - self.min_code[l]]


class _BitReader:
    """Entropy-coded segment bit reader: 0xFF00 unstuffing, stops at
    markers (restart markers handled by the MCU loop)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    # marker reached — T.81 pads with 1-bits
                    self.pos -= 1
                    return 1
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> None:
        self.nbits = 0

    def at_marker(self) -> int | None:
        """Return the marker byte if positioned at an 0xFFxx marker."""
        p = self.pos
        while p + 1 < len(self.data) and self.data[p] == 0xFF:
            if self.data[p + 1] != 0x00:
                return self.data[p + 1]
            return None
        return None


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map `size`-bit magnitude to signed amplitude."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------------------------
# Decoder


class _ScanState:
    """Mutable entropy-decode state shared across one scan's blocks."""

    __slots__ = ("pred", "eobrun")

    def __init__(self, n: int) -> None:
        self.pred = [0] * n
        self.eobrun = 0

    def reset(self) -> None:  # restart-marker semantics
        self.pred = [0] * len(self.pred)
        self.eobrun = 0


def _decode_block(
    br: "_BitReader",
    coefs: np.ndarray,
    st: _ScanState,
    ci: int,
    dc: "_HuffDecoder | None",
    ac: "_HuffDecoder | None",
    ss: int,
    se: int,
    ah: int,
    al: int,
) -> None:
    """Decode one block's contribution of one scan into its zigzag-order
    coefficient vector — baseline (ss=0, se=63, ah=al=0) and all four
    progressive scan kinds (T.81 G.2)."""
    if ss == 0 and ah == 0:  # DC first (or baseline start)
        size = dc.decode(br)
        diff = _extend(br.receive(size), size) if size else 0
        st.pred[ci] += diff
        coefs[0] = st.pred[ci] << al
        k = 1
    elif ss == 0:  # DC refinement: one raw bit
        if br.read_bit():
            coefs[0] |= 1 << al
        return
    else:
        k = ss
    if se == 0:
        return  # DC-only scan

    if ah == 0:  # first scan of this band (baseline AC is the al=0 case)
        if st.eobrun > 0:
            st.eobrun -= 1
            return
        while k <= se:
            rs = ac.decode(br)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16  # ZRL
                    continue
                if r:  # EOBn: run of end-of-bands (progressive only)
                    st.eobrun = (1 << r) - 1 + br.receive(r)
                break  # EOB
            k += r
            if k > se:
                raise ValueError("corrupt JPEG: AC overrun")
            coefs[k] = _extend(br.receive(s), s) << al
            k += 1
        return

    # AC refinement (ah > 0): correction bits for known coefficients,
    # +-1<<al for newly significant ones, EOB runs carry correction bits.
    p1, m1 = 1 << al, -1 << al

    def correct(kk: int) -> None:
        if br.read_bit() and (abs(int(coefs[kk])) & p1) == 0:
            coefs[kk] += p1 if coefs[kk] >= 0 else m1

    if st.eobrun == 0:
        while k <= se:
            rs = ac.decode(br)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if r != 15:
                    st.eobrun = (1 << r) + (br.receive(r) if r else 0)
                    break
                # ZRL: advance over 16 zero-history coefficients
            else:
                newval = p1 if br.read_bit() else m1
            while k <= se:
                if coefs[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                coefs[k] = newval
            k += 1
    if st.eobrun > 0:
        while k <= se:
            if coefs[k] != 0:
                correct(k)
            k += 1
        st.eobrun -= 1


def decode_jpeg_rgb(p: bytes) -> np.ndarray:
    """JPEG bytes -> (h, w, 3) uint8 RGB — baseline (SOF0/1) AND
    progressive (SOF2: spectral selection + successive approximation,
    interleaved DC scans, non-interleaved AC scans, EOB runs, refinement
    correction bits, restart markers). Coefficients accumulate across
    scans; dequant + IDCT run once at the end."""
    if p[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    coefs: list[np.ndarray] | None = None
    hmax = vmax = mcux = mcuy = 0

    while pos < len(p):
        if p[pos] != 0xFF:
            pos += 1
            continue
        marker = p[pos + 1]
        if marker == 0xFF:  # fill byte before a marker (T.81 B.1.1.2)
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", p[pos : pos + 2])
        seg = p[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT — multiple tables per segment
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0xF
                sp += 1
                if pq:  # 16-bit entries
                    tbl = np.frombuffer(seg, dtype=">u2", count=64, offset=sp)
                    sp += 128
                else:
                    tbl = np.frombuffer(seg, dtype=np.uint8, count=64, offset=sp)
                    sp += 64
                z = np.zeros(64, dtype=np.int64)
                z[ZIGZAG] = tbl.astype(np.int64)
                qt[tq] = z.reshape(8, 8)
        elif marker == 0xC4:  # DHT — multiple tables per segment
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0xF
                bits = list(seg[sp + 1 : sp + 17])
                n = sum(bits)
                huffval = list(seg[sp + 17 : sp + 17 + n])
                dec = _HuffDecoder(bits, huffval)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
                sp += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for i in range(nc):
                cid, sf, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "hs": sf >> 4, "vs": sf & 0xF, "tq": tq})
            hmax = max(c["hs"] for c in comps)
            vmax = max(c["vs"] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            coefs = [
                np.zeros((mcuy * c["vs"], mcux * c["hs"], 64), dtype=np.int64)
                for c in comps
            ]
        elif marker in (0xC3,) or 0xC5 <= marker <= 0xCF and marker != 0xC8:
            raise NotImplementedError(
                f"JPEG SOF marker 0x{marker:02x} (lossless/arithmetic/"
                "hierarchical) is not decoded without libjpeg"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy-decode this scan
            if coefs is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            ns = seg[0]
            scan_map = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i : 3 + 2 * i]
                ci = next(j for j, c in enumerate(comps) if c["id"] == cs)
                scan_map.append((ci, tt >> 4, tt & 0xF))
            ss, se, a = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = a >> 4, a & 0xF
            br = _BitReader(p, pos + seglen)
            st = _ScanState(len(comps))

            def maybe_restart(unit: int) -> None:
                if restart_interval and unit and unit % restart_interval == 0:
                    br.align_to_marker()
                    m = br.at_marker()
                    if m is not None and 0xD0 <= m <= 0xD7:
                        br.pos += 2
                        st.reset()

            if len(scan_map) > 1:  # interleaved (baseline full / prog DC)
                for mcu in range(mcuy * mcux):
                    maybe_restart(mcu)
                    my, mx = divmod(mcu, mcux)
                    for (ci, dc_id, ac_id) in scan_map:
                        c = comps[ci]
                        for by in range(c["vs"]):
                            for bx in range(c["hs"]):
                                _decode_block(
                                    br,
                                    coefs[ci][my * c["vs"] + by, mx * c["hs"] + bx],
                                    st, ci,
                                    huff_dc.get(dc_id), huff_ac.get(ac_id),
                                    ss, se, ah, al,
                                )
            else:  # non-interleaved: the component's own block grid
                ci, dc_id, ac_id = scan_map[0]
                c = comps[ci]
                cw = (w * c["hs"] + 8 * hmax - 1) // (8 * hmax)
                ch_ = (h * c["vs"] + 8 * vmax - 1) // (8 * vmax)
                for blk in range(ch_ * cw):
                    maybe_restart(blk)
                    by, bx = divmod(blk, cw)
                    _decode_block(
                        br, coefs[ci][by, bx], st, ci,
                        huff_dc.get(dc_id), huff_ac.get(ac_id),
                        ss, se, ah, al,
                    )
            br.align_to_marker()
            pos = br.pos
            continue
        pos += seglen
    if coefs is None:
        raise ValueError("corrupt JPEG: no frame")

    # reconstruct: dequant + dezigzag + IDCT per block, batched in numpy
    planes = []
    for c, cf in zip(comps, coefs):
        q = qt[c["tq"]].reshape(64)[ZIGZAG]  # quant in zigzag order
        rows, cols = cf.shape[:2]
        blk = np.zeros((rows, cols, 64), dtype=np.float64)
        blk[:, :, ZIGZAG] = cf * q  # dezigzag + dequant in one shot
        B = blk.reshape(rows, cols, 8, 8)
        pix = np.einsum("ux,rcxy,yv->rcuv", _T.T, B, _T) + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(rows * 8, cols * 8)
        planes.append(plane)

    full = []
    for c, plane in zip(comps, planes):
        ry, rx = vmax // c["vs"], hmax // c["hs"]
        up = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(up[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    Y, Cb, Cr = full[0], full[1] - 128.0, full[2] - 128.0
    R = Y + 1.402 * Cr
    G = Y - 0.344136 * Cb - 0.714136 * Cr
    B = Y + 1.772 * Cb
    return np.clip(
        np.round(np.stack([R, G, B], axis=2)), 0, 255
    ).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (4:4:4 baseline, optimized Huffman tables)


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _csize(v: int) -> int:
    """Bit category of an amplitude (0 for 0)."""
    return int(abs(v)).bit_length()


def _block_symbols(zz: np.ndarray, prev_dc: int) -> tuple[list, int]:
    """Entropy symbols of one zigzagged quantized block:
    [('dc', size, amp)] + [('ac', rs, amp) ...]."""
    syms: list = []
    diff = int(zz[0]) - prev_dc
    syms.append(("dc", _csize(diff), diff))
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if zz[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            syms.append(("ac", 0xF0, 0))  # ZRL
            run -= 16
        syms.append(("ac", (run << 4) | _csize(v), v))
        run = 0
    if last_nz < 63:
        syms.append(("ac", 0x00, 0))  # EOB
    return syms, int(zz[0])


def encode_jpeg(
    rgb: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) or (h, w) uint8 -> baseline JPEG (4:4:4, 4:2:2, 4:2:0,
    or grayscale) with per-image optimized Huffman tables (two-pass) —
    no external tables, fully deterministic. Subsampled paths box-average
    chroma and interleave MCUs exactly as the decoder's sampling-factor
    loop expects; ``restart_interval`` > 0 emits DRI + RSTn markers
    every that many MCUs (byte-aligned, DC predictors reset)."""
    factors = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}
    if subsampling not in factors:
        raise ValueError(f"unknown subsampling {subsampling!r}")
    if rgb.ndim == 2:
        return _encode_jpeg_components(
            [(rgb.astype(np.float64), 0, 1, 1)],
            rgb.shape[0], rgb.shape[1], quality, restart_interval,
        )
    h, w = rgb.shape[:2]
    x = rgb.astype(np.float64)
    R, G, B = x[:, :, 0], x[:, :, 1], x[:, :, 2]
    Y = 0.299 * R + 0.587 * G + 0.114 * B
    Cb = -0.168736 * R - 0.331264 * G + 0.5 * B + 128.0
    Cr = 0.5 * R - 0.418688 * G - 0.081312 * B + 128.0

    hs, vs = factors[subsampling]  # luma sampling factors
    mcu_w, mcu_h = 8 * hs, 8 * vs
    mh = (h + mcu_h - 1) // mcu_h
    mw = (w + mcu_w - 1) // mcu_w

    def pad_to(plane: np.ndarray, th: int, tw: int) -> np.ndarray:
        return np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )

    Yp = pad_to(Y, mh * mcu_h, mw * mcu_w)
    Cbp = pad_to(Cb, mh * mcu_h, mw * mcu_w)
    Crp = pad_to(Cr, mh * mcu_h, mw * mcu_w)
    if (hs, vs) != (1, 1):  # box-average chroma down to one 8x8 per MCU
        Cbp = Cbp.reshape(mh * 8, vs, mw * 8, hs).mean(axis=(1, 3))
        Crp = Crp.reshape(mh * 8, vs, mw * 8, hs).mean(axis=(1, 3))

    return _encode_jpeg_components(
        [(Yp, 0, hs, vs), (Cbp, 1, 1, 1), (Crp, 1, 1, 1)],
        h, w, quality, restart_interval,
    )


def _encode_jpeg_components(
    comps: list[tuple[np.ndarray, int, int, int]],
    h: int,
    w: int,
    quality: int,
    restart_interval: int,
) -> bytes:
    """Shared entropy-coding back half: `comps` is [(padded plane,
    huff/quant table id, hs, vs)] in component order; table id 0 = luma
    tables, 1 = chroma."""
    ql, qc = quality_tables(quality)
    qts = {0: ql, 1: qc}
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mh = comps[0][0].shape[0] // (8 * comps[0][3]) if comps else 0
    mw = comps[0][0].shape[1] // (8 * comps[0][2]) if comps else 0
    # (for the single-component case the plane may not be MCU-padded yet)
    if comps[0][0].shape[0] % (8 * comps[0][3]) or comps[0][0].shape[1] % (
        8 * comps[0][2]
    ):
        plane, tbl, hs, vs = comps[0]
        ph = ((plane.shape[0] + 8 * vs - 1) // (8 * vs)) * 8 * vs
        pw = ((plane.shape[1] + 8 * hs - 1) // (8 * hs)) * 8 * hs
        plane = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )
        comps = [(plane, tbl, hs, vs)] + list(comps[1:])
        mh, mw = ph // (8 * vs), pw // (8 * hs)

    def quantized_block(plane, q, by, bx):
        blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
        F = _T @ blk @ _T.T
        return np.round(F / q).astype(np.int64).reshape(64)[ZIGZAG]

    n = len(comps)
    blocks: list[list[np.ndarray]] = [[] for _ in range(n)]
    freq_dc: dict[int, dict] = {}
    freq_ac: dict[int, dict] = {}
    prev = [0] * n

    # pass 1: quantize + frequencies (restart resets DC prediction too)
    for my in range(mh):
        for mx in range(mw):
            mcu = my * mw + mx
            if restart_interval and mcu and mcu % restart_interval == 0:
                prev = [0] * n
            for ci, (plane, tbl, hs, vs) in enumerate(comps):
                for by in range(vs):
                    for bx in range(hs):
                        zz = quantized_block(
                            plane, qts[tbl], my * vs + by, mx * hs + bx
                        )
                        syms, prev[ci] = _block_symbols(zz, prev[ci])
                        for kind, s, _amp in syms:
                            d = freq_dc if kind == "dc" else freq_ac
                            d.setdefault(tbl, {})
                            d[tbl][s] = d[tbl].get(s, 0) + 1
                        blocks[ci].append(zz)

    tables = sorted({c[1] for c in comps})
    specs = {}
    for tbl in tables:
        specs[("dc", tbl)] = build_huffman_spec(freq_dc[tbl])
        specs[("ac", tbl)] = build_huffman_spec(freq_ac[tbl])
    codes = {k: huffman_codes(*v) for k, v in specs.items()}

    # pass 2: emit, with RSTn every restart_interval MCUs
    bw = _BitWriter()
    prev = [0] * n
    idx = [0] * n
    rst = 0
    out_chunks: list[bytes] = []
    for my in range(mh):
        for mx in range(mw):
            mcu = my * mw + mx
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                out_chunks.append(bytes(bw.out))
                out_chunks.append(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) & 7
                bw = _BitWriter()
                prev = [0] * n
            for ci, (_plane, tbl, hs, vs) in enumerate(comps):
                for _ in range(hs * vs):
                    zz = blocks[ci][idx[ci]]
                    idx[ci] += 1
                    syms, prev[ci] = _block_symbols(zz, prev[ci])
                    for kind, s, amp in syms:
                        code, ln = codes[(kind, tbl)][s]
                        bw.write(code, ln)
                        size = (s & 0xF) if kind == "ac" else s
                        if size:
                            a = amp if amp > 0 else amp + (1 << size) - 1
                            bw.write(a, size)
    bw.flush()
    out_chunks.append(bytes(bw.out))

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def dqt(tq: int, q: np.ndarray) -> bytes:
        return seg(
            0xDB, bytes([tq]) + bytes(int(v) for v in q.reshape(64)[ZIGZAG])
        )

    def dht(tc: int, th: int, spec: tuple[list[int], list[int]]) -> bytes:
        bits, huffval = spec
        return seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(huffval))

    sof_body = struct.pack(">BHHB", 8, h, w, n)
    sos_body = bytes([n])
    for ci, (_p, tbl, hs, vs) in enumerate(comps):
        sof_body += bytes([ci + 1, (hs << 4) | vs, tbl])
        sos_body += bytes([ci + 1, (tbl << 4) | tbl])
    sos_body += bytes([0, 63, 0])

    out = b"\xff\xd8"
    for tbl in tables:
        out += dqt(tbl, qts[tbl])
    out += seg(0xC0, sof_body)
    for tbl in tables:
        out += dht(0, tbl, specs[("dc", tbl)]) + dht(1, tbl, specs[("ac", tbl)])
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, sos_body)
    return out + b"".join(out_chunks) + b"\xff\xd9"


# ---------------------------------------------------------------------------
# Progressive encoder (4:4:4 / grayscale) — spectral selection + successive
# approximation, used as the test-vector source for the progressive decoder
# (no external JPEGs in the sandbox). Token streams are generated by
# MIRRORING the decoder's walk exactly (symbol, then sign bit, then the
# correction bits of nonzero-history coefficients crossed), so the pair is
# self-consistent by construction and the decoder paths (EOB runs, ZRL in
# refinement, interleaved correction bits) all get exercised.


def _tokens_dc_first(zz0: int, pred: int, al: int) -> tuple[list, int]:
    v = zz0 >> al  # arithmetic shift: T.81 DC point transform
    diff = v - pred
    s = _csize(diff)
    toks = [("sym", s)]
    if s:
        a = diff if diff > 0 else diff + (1 << s) - 1
        toks.append(("bits", a, s))
    return toks, v


def _tokens_ac_first(band: np.ndarray, ss: int, al: int) -> list:
    toks = []
    r = 0
    for k in range(len(band)):
        t = int(band[k])
        mag = abs(t) >> al
        if mag == 0:
            r += 1
            continue
        while r > 15:
            toks.append(("sym", 0xF0))
            r -= 16
        s = mag.bit_length()
        toks.append(("sym", (r << 4) | s))
        amp = mag if t > 0 else -mag
        a = amp if amp > 0 else amp + (1 << s) - 1
        toks.append(("bits", a, s))
        r = 0
    if r > 0:
        toks.append(("sym", 0x00))  # EOB (run length 1, no extra bits)
    return toks


def _tokens_ac_refine(band: np.ndarray, al: int) -> list:
    """Refinement tokens in the decoder's exact consumption order."""
    absv = [abs(int(t)) >> al for t in band]
    n = len(band)
    toks = []
    k = 0
    while k < n:
        j, r, nxt = k, 0, None
        while j < n:
            if absv[j] == 1:
                nxt = j
                break
            if absv[j] == 0:
                r += 1
            j += 1
        if nxt is None:
            if k < n:  # trailing positions -> EOB(1) + their corrections
                toks.append(("sym", 0x00))
                for q in range(k, n):
                    if absv[q] > 1:
                        toks.append(("bits", absv[q] & 1, 1))
            break
        while r > 15:  # ZRL: decoder skips 16 zero-history positions
            toks.append(("sym", 0xF0))
            skipped = 0
            while skipped < 16:
                if absv[k] == 0:
                    skipped += 1
                elif absv[k] > 1:
                    toks.append(("bits", absv[k] & 1, 1))
                k += 1
            r -= 16
        toks.append(("sym", (r << 4) | 1))
        toks.append(("bits", 1 if band[nxt] > 0 else 0, 1))
        while k < nxt:
            if absv[k] > 1:
                toks.append(("bits", absv[k] & 1, 1))
            k += 1
        k = nxt + 1
    return toks


def encode_jpeg_progressive(
    rgb: np.ndarray, quality: int = 90, al: int = 1
) -> bytes:
    """(h, w, 3) or (h, w) uint8 -> progressive JPEG (SOF2), 4:4:4:
    interleaved DC-first scan at Al=`al` + DC refinement bits, then per
    component AC spectral bands (1-5, 6-63) at Al=`al` followed by the
    matching refinement scans down to Al=0."""
    gray = rgb.ndim == 2
    h, w = rgb.shape[:2]
    ql, qc = quality_tables(quality)
    if gray:
        planes = [rgb.astype(np.float64)]
        tbls = [0]
    else:
        x = rgb.astype(np.float64)
        R, G, B = x[:, :, 0], x[:, :, 1], x[:, :, 2]
        planes = [
            0.299 * R + 0.587 * G + 0.114 * B,
            -0.168736 * R - 0.331264 * G + 0.5 * B + 128.0,
            0.5 * R - 0.418688 * G - 0.081312 * B + 128.0,
        ]
        tbls = [0, 1, 1]
    qts = {0: ql, 1: qc}
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    bh, bw = ph // 8, pw // 8
    coefs = []
    for plane, tbl in zip(planes, tbls):
        pad = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
        cc = np.zeros((bh, bw, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw):
                blk = pad[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                F = _T @ blk @ _T.T
                cc[by, bx] = np.round(F / qts[tbl]).astype(np.int64).reshape(
                    64
                )[ZIGZAG]
        coefs.append(cc)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def dqt(tq: int, q: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tq]) + bytes(int(v) for v in q.reshape(64)[ZIGZAG]))

    def write_scan(comps_in_scan, ss, se, ah, al_, token_fn) -> bytes:
        """Two passes over the scan's tokens: huffman spec, then bytes.
        token_fn(ci) yields the component's token list in scan order."""
        all_toks = [(ci, token_fn(ci)) for ci in comps_in_scan]
        freqs: dict[int, int] = {}
        for _ci, toks in all_toks:
            for t in toks:
                if t[0] == "sym":
                    freqs[t[1]] = freqs.get(t[1], 0) + 1
        out = b""
        table_id = 0
        need_table = bool(freqs)
        if need_table:
            spec = build_huffman_spec(freqs)
            codes = huffman_codes(*spec)
            tc = 0 if ss == 0 and ah == 0 else 1
            out += seg(0xC4, bytes([tc << 4 | table_id]) + bytes(spec[0]) + bytes(spec[1]))
        bwr = _BitWriter()
        for _ci, toks in all_toks:
            for t in toks:
                if t[0] == "sym":
                    code, ln = codes[t[1]]
                    bwr.write(code, ln)
                else:
                    bwr.write(t[1], t[2])
        bwr.flush()
        body = bytes([len(comps_in_scan)])
        for ci in comps_in_scan:
            td = table_id if (ss == 0 and ah == 0) else 0
            ta = table_id if ss > 0 else 0
            body += bytes([ci + 1, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al_])
        return out + seg(0xDA, body) + bytes(bwr.out)

    n = len(planes)
    out = b"\xff\xd8" + dqt(0, ql)
    if not gray:
        out += dqt(1, qc)
    sof_body = struct.pack(">BHHB", 8, h, w, n)
    for ci, tbl in enumerate(tbls):
        sof_body += bytes([ci + 1, 0x11, tbl])
    out += seg(0xC2, sof_body)

    # scan 1: interleaved DC first at Al=al
    preds = [0] * n

    def dc_first_tokens(_all=None):
        toks = []
        for by in range(bh):
            for bx in range(bw):
                for ci in range(n):
                    t, preds[ci] = _tokens_dc_first(
                        int(coefs[ci][by, bx, 0]), preds[ci], al
                    )
                    toks.extend(t)
        return toks

    # interleaved scan: tokens for ALL components ride one stream — feed
    # write_scan a single pseudo-component
    dc_toks = dc_first_tokens()
    out += write_scan(
        list(range(n)), 0, 0, 0, al,
        lambda ci: dc_toks if ci == 0 else [],
    )
    # AC first scans per component, two spectral bands, at Al=al
    for ci in range(n):
        for (ss, se) in ((1, 5), (6, 63)):
            out += write_scan(
                [ci], ss, se, 0, al,
                lambda c, ss=ss, se=se: [
                    t
                    for by in range(bh)
                    for bx in range(bw)
                    for t in _tokens_ac_first(coefs[c][by, bx, ss : se + 1], ss, al)
                ],
            )
    # successive approximation refinements down to Al=0
    for a_hi in range(al, 0, -1):
        a_lo = a_hi - 1
        # DC refinement: raw bit per block, interleaved
        dc_bits = [
            ("bits", (int(coefs[ci][by, bx, 0]) >> a_lo) & 1, 1)
            for by in range(bh)
            for bx in range(bw)
            for ci in range(n)
        ]
        out += write_scan(
            list(range(n)), 0, 0, a_hi, a_lo,
            lambda ci, bits=dc_bits: bits if ci == 0 else [],
        )
        # AC refinement per component per band
        for ci in range(n):
            for (ss, se) in ((1, 5), (6, 63)):
                out += write_scan(
                    [ci], ss, se, a_hi, a_lo,
                    lambda c, ss=ss, se=se, a=a_lo: [
                        t
                        for by in range(bh)
                        for bx in range(bw)
                        for t in _tokens_ac_refine(coefs[c][by, bx, ss : se + 1], a)
                    ],
                )
    return out + b"\xff\xd9"
