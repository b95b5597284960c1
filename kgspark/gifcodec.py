"""GIF87a/89a codec — pure python + numpy (LZW from the GIF spec).

Completes the web-image trio (JPEG/PNG/GIF cover essentially every
lossless-or-lossy image a crawl yields). GIF is LOSSLESS for images with
<= 256 distinct colors, so — unlike JPEG — the whole container round-trip
is oracle-pinnable on the synthetic gradient images.

Decode: header + logical screen descriptor, global/local color tables,
extension blocks skipped by sub-block walking (graphic control's
transparency is ignored — the decode target is RGB stats), FIRST image
frame only (animation = later frames skipped), both row orders (normal
and 4-pass interlace), variable-width LSB-first LZW with clear/EOI codes
and the 12-bit table cap. Encode: single frame, global color table built
from the image's distinct colors (raises above 256 — palette
quantization is out of scope), standard LZW with width bumps and table
reset at 4096.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------------------
# LZW


def lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-flavor LZW: LSB-first bit packing, clear = 2^min, eoi = clear+1,
    code width grows at table sizes 2^w, capped at 12 bits."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out: list[int] = []
    acc = nbits = 0
    prev: bytes | None = None
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                return out
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("corrupt GIF: LZW code out of range")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    return out


def lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    cur = b""
    for idx in indices:
        nxt = cur + bytes([idx])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
        cur = bytes([idx])
    if cur:
        emit(table[cur], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Container

INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif_rgb(p: bytes) -> np.ndarray:
    """First frame of a GIF -> (h, w, 3) uint8 RGB."""
    if p[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", p[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(p, dtype=np.uint8, count=3 * n, offset=pos).reshape(
            n, 3
        )
        pos += 3 * n
    while pos < len(p):
        b = p[pos]
        if b == 0x21:  # extension: label + sub-block chain
            pos += 2
            while p[pos] != 0:
                pos += 1 + p[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            _lx, _ty, iw, ih, ipk = struct.unpack("<HHHHB", p[pos + 1 : pos + 10])
            pos += 10
            ct = gct
            if ipk & 0x80:
                n = 2 << (ipk & 0x07)
                ct = np.frombuffer(
                    p, dtype=np.uint8, count=3 * n, offset=pos
                ).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF frame without a color table")
            min_code = p[pos]
            pos += 1
            data = bytearray()
            while p[pos] != 0:
                ln = p[pos]
                data += p[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = lzw_decode(bytes(data), min_code)
            if len(idx) < iw * ih:
                raise ValueError("corrupt GIF: short pixel data")
            grid = np.asarray(idx[: iw * ih], dtype=np.int64).reshape(ih, iw)
            if ipk & 0x40:  # 4-pass interlace
                de = np.zeros_like(grid)
                r = 0
                for start, step in INTERLACE_PASSES:
                    rows = range(start, ih, step)
                    for y in rows:
                        de[y] = grid[r]
                        r += 1
                grid = de
            return ct[np.clip(grid, 0, len(ct) - 1)]
        elif b == 0x3B:  # trailer
            break
        else:
            pos += 1
    raise ValueError("GIF contains no image frame")


def encode_gif(rgb: np.ndarray, interlace: bool = False) -> bytes:
    """(h, w, 3) uint8 with <= 256 distinct colors -> single-frame GIF89a
    (lossless; palette built from the distinct colors in first-seen
    order). Raises on richer images — palette quantization is a lossy
    design decision this codec intentionally leaves out."""
    h, w = rgb.shape[:2]
    flat = rgb.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(
            f"GIF encode needs <= 256 distinct colors, got {len(colors)}"
        )
    # pad palette to a power of two >= 2
    bits = max(1, int(len(colors) - 1).bit_length())
    n_pal = 1 << bits
    pal = np.zeros((n_pal, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    grid = idx.reshape(h, w)
    if interlace:
        rows = []
        for start, step in INTERLACE_PASSES:
            rows.extend(range(start, h, step))
        grid = grid[rows]
    min_code = max(2, bits)
    stream = lzw_encode([int(v) for v in grid.reshape(-1)], min_code)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7), 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
    )
    out += bytes([min_code])
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
