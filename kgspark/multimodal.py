"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extract / frame-sample run as
Arrow-batched ``mapInPandas`` kernels so payload bytes never round-trip
through Python row objects. Two decode modes:

- ``decode_mode="fake"``: deterministic md5-derived feature vector with the
  real batch shape; the media table is derived from ``documents`` with pure
  arithmetic, so DuckDB recomputes both bit-identically
  (``kgspark.oracles.q_media_features``).
- ``decode_mode="real"``: pure-numpy container decoders for RIFF/WAVE PCM16
  audio, BMP (24-bit uncompressed) and PPM (P6) images — no external codec
  libraries. Features are integer statistics (dims, channel sums, extrema)
  exact in float32, and the synth encoder builds payloads from doc_id
  arithmetic, so the DuckDB oracle re-derives every feature from the same
  formulas WITHOUT touching bytes: a green hash proves decode inverts
  encode (``media_features_real``). Real containers covered pure-python:
  WAV (PCM 8/16/24/32 + IEEE float + EXTENSIBLE), 24bpp BMP, P6 PPM,
  PNG (stdlib zlib inflate + all five scanline filters, every legal bit
  depth 1/2/4/8/16, gray/RGB/palette/RGBA, null + Adam7 interlace),
  baseline JPEG (``kgspark.jpegcodec`` — T.81 sequential DCT, the
  file's own Huffman/quant tables, 4:4:4/4:2:2/4:2:0/gray, restart
  markers, and progressive SOF2 with spectral selection + successive
  approximation), GIF87a/89a (``kgspark.gifcodec`` — LZW, interlace,
  palettes), and AVI/MJPEG video (``kgspark.avicodec``). The remaining
  seams — formats genuinely needing ffmpeg-class entropy coders
  (mp4/mp3/webp) — still raise NotImplementedError.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_ts_ms", T.LongType(), False),
        T.StructField("frame_feature", T.ArrayType(T.FloatType()), True),
    ]
)


def media_table(
    docs: DataFrame, n: int = 48, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic media table derived from the documents table.

    Pure column expressions — payload is the UTF-8 bytes of ``text`` and
    every metadata field is arithmetic on the id — so the DuckDB oracle
    recomputes identical rows straight from the ``documents`` view. kind
    cycles image/audio/video by ``id % 3``; only images carry dimensions,
    only audio/video a duration.
    """
    mid = F.col(id_col).cast("long")
    kind = (
        F.when(mid % 3 == 0, "image").when(mid % 3 == 1, "audio").otherwise("video")
    )
    return docs.filter(mid < n).select(
        mid.alias("media_id"),
        F.concat(F.lit("https://example.org/media/"), mid.cast("string")).alias("url"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.when(mid % 3 == 0, (16 + (mid * 37) % 240).cast("int")).alias("width"),
        F.when(mid % 3 == 0, (16 + (mid * 53) % 240).cast("int")).alias("height"),
        F.when(mid % 3 != 0, 1000 + (mid * 7919) % 59000).alias("duration_ms"),
    )


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Standalone fixture: same shape/arithmetic as ``media_table`` over a
    synthetic id range (payload = utf-8 of a seeded marker string)."""
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(f"media-{seed}-"), F.col("id").cast("string")).alias("text"),
    )
    return media_table(base, n=n)


def _codec_rgb(mid: int, flat: bool = False) -> np.ndarray:
    """Deterministic (h, w, 3) image from the id: w = 4 + id%4,
    h = 3 + id%3, pixel (x, y) = ((id*7 + y*13 + x*5) + 11*c) % 256 for
    channel c in (R,G,B) — pure arithmetic the oracle re-derives in SQL.
    ``flat=True`` drops the spatial terms (one color per image): the
    shape on which LOSSY containers (JPEG at quality 100) decode
    bit-exact, so the oracle contract extends to them."""
    w, h = 4 + mid % 4, 3 + mid % 3
    y, x = np.mgrid[0:h, 0:w]
    spatial = np.zeros_like(y) if flat else y * 13 + x * 5
    base = (mid * 7 + spatial)[:, :, None] + np.array([0, 11, 22])
    return (base % 256).astype(np.uint8)


def _codec_samples(mid: int) -> np.ndarray:
    """Deterministic PCM16 samples: n = 64 + id%64,
    s[i] = ((id*31 + i*17) % 2003) - 1001."""
    i = np.arange(64 + mid % 64, dtype=np.int64)
    return ((mid * 31 + i * 17) % 2003) - 1001


def codec_media_table(
    docs: DataFrame,
    n: int = 48,
    id_col: str = "doc_id",
    image_formats: tuple[str, str] = ("bmp", "ppm"),
    flat: bool = False,
) -> DataFrame:
    """Media table with REAL encoded payloads (WAV + two image container
    slots), content derived from the id by pure arithmetic. kind cycles
    by id % 3: 0 -> image_formats[0], 1 -> WAV audio,
    2 -> image_formats[1] (formats: "bmp", "ppm", "png"). Because the
    payload content is a closed-form function of the id, the DuckDB
    oracle can recompute every decoded feature from the formulas alone —
    a green value-hash is a proof that ``decode_mode="real"`` inverts the
    encoder on real container bytes."""
    def _enc_jpeg(rgb: np.ndarray) -> bytes:
        from kgspark.jpegcodec import encode_jpeg

        return encode_jpeg(rgb, quality=100)

    def _enc_jpeg_prog(rgb: np.ndarray) -> bytes:
        from kgspark.jpegcodec import encode_jpeg_progressive

        return encode_jpeg_progressive(rgb, quality=100)

    def _enc_gif(rgb: np.ndarray) -> bytes:
        from kgspark.gifcodec import encode_gif

        return encode_gif(rgb)

    encoders = {
        "bmp": encode_bmp24,
        "ppm": encode_ppm,
        "png": encode_png,
        "jpeg": _enc_jpeg,
        "jpeg_progressive": _enc_jpeg_prog,
        "gif": _enc_gif,
    }
    enc0, enc2 = encoders[image_formats[0]], encoders[image_formats[1]]
    base = docs.filter(F.col(id_col).cast("long") < n).select(
        F.col(id_col).cast("long").alias("media_id")
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "url": [], "kind": [], "payload": [],
                    "width": [], "height": [], "duration_ms": []}
            for mid in pdf["media_id"]:
                mid = int(mid)
                if mid % 3 == 1:
                    s = _codec_samples(mid)
                    payload, kind = encode_wav_pcm16(s), "audio"
                    w = h = None
                    dur = len(s) * 1000 // 8000
                else:
                    rgb = _codec_rgb(mid, flat=flat)
                    payload = (enc0 if mid % 3 == 0 else enc2)(rgb)
                    kind, dur = "image", None
                    h, w = rgb.shape[:2]
                rows["media_id"].append(mid)
                rows["url"].append(f"https://example.org/media/{mid}")
                rows["kind"].append(kind)
                rows["payload"].append(payload)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["duration_ms"].append(dur)
            yield pd.DataFrame(rows)

    return base.mapInPandas(kernel, MEDIA_SCHEMA)


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-content embedding: md5 digest
    bytes scaled to [0,1]. Mirrored in SQL via substr(md5(text), ...)"""
    digest = hashlib.md5(payload).digest()
    return [digest[i % 16] / 255.0 for i in range(dim)]


def _fake_frame_feature(payload: bytes, ts_ms: int, dim: int = 8) -> list[float]:
    """Per-frame variant: md5(md5_hex(payload) || '-' || ts) — string-level
    composition so the oracle can rebuild it without binary concatenation."""
    digest = hashlib.md5(
        (hashlib.md5(payload).hexdigest() + "-" + str(ts_ms)).encode("ascii")
    ).digest()
    return [digest[i % 16] / 255.0 for i in range(dim)]


def feature_sig(col, dim: int = 8):
    """Exact integer rendering of a fake feature vector (digest bytes,
    pipe-joined) — the value-hash-stable projection used by the oracle
    gate; float formatting never enters the comparison."""
    return F.array_join(
        F.transform(col, lambda x: F.round(x * 255).cast("int").cast("string")), "|"
    )


# --------------------------------------------------------------------------
# real codecs (pure numpy/struct — no PIL/ffmpeg). Encoders live here too:
# the synth media table is built by encoding doc_id-derived arithmetic, so
# the oracle proves round-trip correctness by recomputing features from the
# same formulas without ever seeing the bytes.

def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Minimal canonical RIFF/WAVE, PCM16 mono."""
    data = samples.astype("<i2").tobytes()
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav(p: bytes) -> list[float]:
    """RIFF chunk walk (handles extra chunks + odd-size padding). Sample
    formats: PCM 8-bit unsigned (rebased to signed), 16/24/32-bit signed,
    IEEE float32/64 (scaled to the 16-bit range and truncated so the
    stats stay integer), plus WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapping
    either. Feature: [1, sample_rate, n_frames, sum, sum_abs, max, min,
    channels] — integer stats, exact in float32."""
    if not (p[:4] == b"RIFF" and p[8:12] == b"WAVE"):
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data, ext_guid = 12, None, None, None
    while pos + 8 <= len(p):
        cid = p[pos : pos + 4]
        size = struct.unpack("<I", p[pos + 4 : pos + 8])[0]
        body = p[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
            if fmt[0] == 0xFFFE and size >= 40:  # EXTENSIBLE: real fmt in GUID
                ext_guid = body[24:26]
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, sr, _, _, bits = fmt
    if audio_fmt == 0xFFFE and ext_guid is not None:
        (audio_fmt,) = struct.unpack("<H", ext_guid)
    if audio_fmt == 1:  # integer PCM
        if bits == 8:  # unsigned by convention
            s = np.frombuffer(data, dtype=np.uint8).astype(np.int64) - 128
        elif bits == 16:
            s = np.frombuffer(data, dtype="<i2").astype(np.int64)
        elif bits == 24:
            b = np.frombuffer(data, dtype=np.uint8)
            b = b[: (len(b) // 3) * 3].reshape(-1, 3).astype(np.int64)
            s = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            s -= (s >> 23) << 24  # sign-extend
        elif bits == 32:
            s = np.frombuffer(data, dtype="<i4").astype(np.int64)
        else:
            raise NotImplementedError(f"PCM bit depth {bits} is not decoded")
    elif audio_fmt == 3:  # IEEE float: scale to 16-bit range, truncate
        dt = "<f4" if bits == 32 else "<f8"
        f = np.frombuffer(data, dtype=dt).astype(np.float64)
        s = np.trunc(f * 32767.0).astype(np.int64)
    else:
        raise NotImplementedError(
            f"WAV format tag {audio_fmt} needs ffmpeg (ADPCM/mu-law/...)"
        )
    return [
        1.0, float(sr), float(len(s) // channels), float(s.sum()),
        float(np.abs(s).sum()), float(s.max()), float(s.min()), float(channels),
    ]


def encode_bmp24(rgb: np.ndarray) -> bytes:
    """24-bit uncompressed BMP, bottom-up rows, 4-byte row padding.
    ``rgb``: (h, w, 3) uint8 in RGB order (stored as BGR per the format)."""
    h, w, _ = rgb.shape
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = rgb[y, :, ::-1].tobytes()  # RGB -> BGR
        rows += row + b"\x00" * (stride - len(row))
    size = 54 + len(rows)
    return (
        b"BM" + struct.pack("<IHHI", size, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
        + bytes(rows)
    )


def _bmp_rgb(p: bytes) -> np.ndarray:
    """BITMAPINFOHEADER 24bpp pixel decode (bottom-up and top-down,
    padded strides) -> (h, w, 3) uint8 RGB."""
    if p[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack("<I", p[10:14])[0]
    w, h_raw = struct.unpack("<ii", p[18:26])
    bpp = struct.unpack("<H", p[28:30])[0]
    comp = struct.unpack("<I", p[30:34])[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only 24bpp uncompressed BMP is decoded without PIL")
    top_down, h = h_raw < 0, abs(h_raw)
    stride = (w * 3 + 3) & ~3
    rows = []
    for yy in range(h):
        src_y = yy if top_down else h - 1 - yy
        rows.append(
            np.frombuffer(p, dtype=np.uint8, count=w * 3, offset=off + src_y * stride)
            .reshape(w, 3)[:, ::-1]  # BGR -> RGB
        )
    return np.stack(rows)


def decode_bmp(p: bytes) -> list[float]:
    """BMP feature: [2, w, h, sum_r, sum_g, sum_b, max, min]."""
    rgb = _bmp_rgb(p).astype(np.int64)  # (h, w, 3)
    h, w = rgb.shape[:2]
    return [
        2.0, float(w), float(h), float(rgb[:, :, 0].sum()),
        float(rgb[:, :, 1].sum()), float(rgb[:, :, 2].sum()),
        float(rgb.max()), float(rgb.min()),
    ]


def encode_ppm(rgb: np.ndarray) -> bytes:
    h, w, _ = rgb.shape
    return f"P6\n{w} {h}\n255\n".encode("ascii") + rgb.astype(np.uint8).tobytes()


def _ppm_rgb(p: bytes) -> np.ndarray:
    """P6 binary PPM pixel decode (comment-tolerant header) ->
    (h, w, 3) uint8 RGB."""
    if p[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header tokens: P6, width, height, maxval — '#' comments legal
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(p) and p[pos : pos + 1].isspace():
            pos += 1
        if p[pos : pos + 1] == b"#":
            while pos < len(p) and p[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(p) and not p[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(p[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise NotImplementedError("only maxval=255 PPM is decoded")
    return np.frombuffer(p, dtype=np.uint8, count=w * h * 3, offset=pos).reshape(
        h, w, 3
    )


def decode_ppm(p: bytes) -> list[float]:
    """PPM feature layout mirrors BMP with code 3."""
    rgb = _ppm_rgb(p).astype(np.int64)
    h, w = rgb.shape[:2]
    return [
        3.0, float(w), float(h), float(rgb[:, :, 0].sum()),
        float(rgb[:, :, 1].sum()), float(rgb[:, :, 2].sum()),
        float(rgb.max()), float(rgb.min()),
    ]


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def encode_png(rgb: np.ndarray) -> bytes:
    """8-bit truecolor (color type 2) PNG: filter 0 on every scanline,
    one IDAT, zlib level 9 — all choices fixed so the emitted container
    bytes are a deterministic function of the pixels."""
    import zlib

    h, w, _ = rgb.shape
    raw = b"".join(
        b"\x00" + rgb[y].astype(np.uint8).tobytes() for y in range(h)
    )

    def chunk(typ: bytes, data: bytes) -> bytes:
        body = typ + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


def _png_rgb(p: bytes) -> np.ndarray:
    """PNG pixel decode -> (h, w, 3) uint8 RGB. Pure python + numpy +
    stdlib zlib: all five scanline filters (None/Sub/Up/Average/Paeth),
    every legal bit depth (1/2/4 gray+palette, 8 everywhere, 16 via the
    network-order high byte), color types 0 (gray), 2 (RGB),
    3 (palette), 6 (RGBA — alpha dropped), both interlace methods (null
    and Adam7)."""
    import zlib

    if p[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, idat, plte = 8, b"", None
    w = h = depth = ctype = interlace = None
    while pos < len(p):
        (ln,) = struct.unpack(">I", p[pos : pos + 4])
        typ = p[pos + 4 : pos + 8]
        data = p[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + type + data + crc
        if typ == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if depth not in (1, 2, 4, 8, 16):
        raise NotImplementedError(f"PNG bit depth {depth} is not decoded")
    if ctype not in (0, 2, 3, 6):
        raise NotImplementedError(f"PNG color type {ctype} is not decoded")
    if depth < 8 and ctype not in (0, 3):
        raise ValueError("sub-byte PNG depth is only legal for gray/palette")
    ch = {0: 1, 2: 3, 3: 1, 6: 4}[ctype]
    # filters operate on the raw byte stream: bpp = bytes per pixel for
    # the left-neighbor offset (1 for sub-byte depths, per the spec)
    bpp = max(1, (ch * depth) // 8)
    raw = zlib.decompress(idat)

    def unfilter(data: bytes, rows: int, width: int) -> np.ndarray:
        """De-filter `rows` scanlines of `width` pixels; returns the raw
        (rows, stride) recon BYTES (not yet sample-unpacked)."""
        stride = (width * ch * depth + 7) // 8
        out = np.zeros((rows, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.int32)
        for y in range(rows):
            ft = data[y * (stride + 1)]
            cur = np.frombuffer(
                data, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
            ).astype(np.int32)
            if ft == 0:
                rec = cur
            elif ft == 1:  # Sub: per-byte-lane cumsum over x (mod 256)
                rec = (
                    cur.reshape(stride // bpp, bpp).cumsum(axis=0).reshape(stride)
                    & 0xFF
                    if stride % bpp == 0
                    else _sub_seq(cur, bpp)
                )
            elif ft == 2:  # Up: fully vectorized
                rec = (cur + prev) & 0xFF
            else:  # Average / Paeth need the sequential left neighbor
                rec = np.zeros(stride, dtype=np.int32)
                for x in range(stride):
                    a = rec[x - bpp] if x >= bpp else 0
                    b = prev[x]
                    if ft == 3:
                        rec[x] = (cur[x] + ((a + b) >> 1)) & 0xFF
                    else:  # Paeth
                        c = prev[x - bpp] if x >= bpp else 0
                        pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                        pred = (
                            a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                        )
                        rec[x] = (cur[x] + pred) & 0xFF
            out[y] = rec
            prev = rec.astype(np.int32)
        return out

    def _sub_seq(cur: np.ndarray, bpp_: int) -> np.ndarray:
        rec = cur.copy()
        for x in range(bpp_, len(rec)):
            rec[x] = (rec[x] + rec[x - bpp_]) & 0xFF
        return rec

    def unpack(rowbytes: np.ndarray, rows: int, width: int) -> np.ndarray:
        """Recon bytes -> (rows, width, ch) 8-bit samples."""
        if depth == 8:
            return rowbytes.reshape(rows, width, ch)
        if depth == 16:  # network order: the high byte IS the 8-bit sample
            return rowbytes.reshape(rows, width, ch, 2)[:, :, :, 0]
        # depth 1/2/4, single channel: MSB-first bit groups
        bits = np.unpackbits(rowbytes, axis=1)
        per = depth
        vals = bits[:, : (width * per)].reshape(rows, width, per)
        weights = 1 << np.arange(per - 1, -1, -1)
        v = (vals * weights).sum(axis=2).astype(np.uint8)
        if ctype == 0:  # gray: scale to full 8-bit range
            v = (v.astype(np.int64) * 255 // ((1 << per) - 1)).astype(np.uint8)
        return v[:, :, None]

    if interlace == 0:
        px = unpack(unfilter(raw, h, w), h, w)
    else:  # Adam7: seven sub-images, each filtered independently
        # (x_start, y_start, x_step, y_step) per pass
        ADAM7 = (
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        )
        px = np.zeros((h, w, ch), dtype=np.uint8)
        off = 0
        for (x0, y0, dx, dy) in ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            stride = (pw * ch * depth + 7) // 8
            nbytes = ph * (stride + 1)
            sub = unpack(unfilter(raw[off : off + nbytes], ph, pw), ph, pw)
            px[y0::dy, x0::dx] = sub
            off += nbytes
    if ctype == 2:
        return px
    if ctype == 6:
        return px[:, :, :3]  # alpha dropped (decode target is RGB stats)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        return plte[px[:, :, 0]]
    return np.repeat(px, 3, axis=2)  # gray -> RGB


def decode_png(p: bytes) -> list[float]:
    """PNG feature layout mirrors BMP/PPM with code 4."""
    rgb = _png_rgb(p).astype(np.int64)
    h, w = rgb.shape[:2]
    return [
        4.0, float(w), float(h), float(rgb[:, :, 0].sum()),
        float(rgb[:, :, 1].sum()), float(rgb[:, :, 2].sum()),
        float(rgb.max()), float(rgb.min()),
    ]


def decode_jpeg(p: bytes) -> list[float]:
    """JPEG feature layout mirrors BMP/PPM/PNG with code 5."""
    from kgspark.jpegcodec import decode_jpeg_rgb

    rgb = decode_jpeg_rgb(p).astype(np.int64)
    h, w = rgb.shape[:2]
    return [
        5.0, float(w), float(h), float(rgb[:, :, 0].sum()),
        float(rgb[:, :, 1].sum()), float(rgb[:, :, 2].sum()),
        float(rgb.max()), float(rgb.min()),
    ]


def decode_gif(p: bytes) -> list[float]:
    """GIF feature layout mirrors the other images with code 6."""
    from kgspark.gifcodec import decode_gif_rgb

    rgb = decode_gif_rgb(p).astype(np.int64)
    h, w = rgb.shape[:2]
    return [
        6.0, float(w), float(h), float(rgb[:, :, 0].sum()),
        float(rgb[:, :, 1].sum()), float(rgb[:, :, 2].sum()),
        float(rgb.max()), float(rgb.min()),
    ]


def decode_rgb(p: bytes) -> np.ndarray:
    """Magic-byte dispatch to a pixel decoder (images only)."""
    if p[:2] == b"BM":
        return _bmp_rgb(p)
    if p[:2] == b"P6":
        return _ppm_rgb(p)
    if p[:8] == PNG_MAGIC:
        return _png_rgb(p)
    if p[:2] == b"\xff\xd8":
        from kgspark.jpegcodec import decode_jpeg_rgb

        return decode_jpeg_rgb(p)
    if p[:6] in (b"GIF87a", b"GIF89a"):
        from kgspark.gifcodec import decode_gif_rgb

        return decode_gif_rgb(p)
    raise NotImplementedError(
        f"no pure-python pixel decoder for payload magic {p[:8]!r} — "
        "webp requires PIL; plug the codec in here"
    )


def nn_resize(rgb: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize with pixel-center sampling: source index
    sx = floor((x + 0.5) * w / W) = ((2x + 1) * w) // (2W) — pure integer
    arithmetic, so the DuckDB oracle re-derives the exact pixels."""
    h, w = rgb.shape[:2]
    sx = ((2 * np.arange(width) + 1) * w) // (2 * width)
    sy = ((2 * np.arange(height) + 1) * h) // (2 * height)
    return rgb[sy][:, sx]


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    on_unsupported: str = "passthrough",
) -> DataFrame:
    """Resize every image payload to (width, height), re-encoded in its
    original container (BMP stays BMP, PPM stays PPM).

    The standard multimodal pre-training normalization step, with the
    production batch shape: mapInPandas over Arrow batches, pure-numpy
    decode -> nearest-neighbor resample -> re-encode; no Python
    per-pixel loops. Non-image rows (and image formats without a
    pure-python codec when ``on_unsupported="passthrough"``) pass
    through untouched so mixed media tables survive;
    ``on_unsupported="raise"`` surfaces them instead.
    """
    if on_unsupported not in ("passthrough", "raise"):
        raise ValueError(f"unknown on_unsupported {on_unsupported!r}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # zip over plain column arrays, not pdf.iterrows(): iterrows
            # constructs a pandas Series per row, which dominates the
            # per-record overhead. The per-payload codec work is
            # inherently per-record; the row walk need not be.
            payloads, widths, heights = [], [], []
            for kind, p, w_in, h_in in zip(
                pdf["kind"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                w_out, h_out = w_in, h_in
                if kind == "image" and p is not None:
                    try:
                        pb = bytes(p)
                        rgb = nn_resize(decode_rgb(pb), width, height)
                        if pb[:2] == b"BM":
                            p = encode_bmp24(rgb)
                        elif pb[:8] == PNG_MAGIC:
                            p = encode_png(rgb)
                        elif pb[:2] == b"\xff\xd8":
                            from kgspark.jpegcodec import encode_jpeg

                            # quality 100 / 4:4:4: deterministic and
                            # near-lossless for the normalization step
                            p = encode_jpeg(rgb, quality=100)
                        elif pb[:6] in (b"GIF87a", b"GIF89a"):
                            from kgspark.gifcodec import encode_gif

                            p = encode_gif(rgb)
                        else:
                            p = encode_ppm(rgb)
                        w_out, h_out = width, height
                    except NotImplementedError:
                        if on_unsupported == "raise":
                            raise
                payloads.append(p)
                widths.append(w_out)
                heights.append(h_out)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "url": pdf["url"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "payload": payloads,
                    "width": widths,
                    "height": heights,
                    "duration_ms": pdf["duration_ms"].to_numpy(),
                }
            )

    return media.mapInPandas(kernel, MEDIA_SCHEMA)


def decode_payload(p: bytes) -> list[float]:
    """Magic-byte dispatch to a real decoder. Containers that genuinely
    need ffmpeg/PIL (mp4, jpeg, mp3, ...) raise at this seam."""
    if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        return decode_wav(p)
    if p[:2] == b"BM":
        return decode_bmp(p)
    if p[:2] == b"P6":
        return decode_ppm(p)
    if p[:8] == PNG_MAGIC:
        return decode_png(p)
    if p[:2] == b"\xff\xd8":
        return decode_jpeg(p)
    if p[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(p)
    raise NotImplementedError(
        f"no pure-python decoder for payload magic {p[:8]!r} — this format "
        "requires ffmpeg/PIL; plug the codec in here"
    )


def extract_features(
    media: DataFrame, decode_mode: str = "fake", feature_dim: int = 8
) -> DataFrame:
    """mapInPandas feature extraction with the production batch shape."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_mode == "real":
                feats = [
                    None if p is None else decode_payload(bytes(p))
                    for p in pdf["payload"]
                ]
            else:
                feats = [
                    None if p is None else _fake_feature(bytes(p), feature_dim)
                    for p in pdf["payload"]
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(kernel, FEATURES_SCHEMA)


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, decode_mode: str = "fake"
) -> DataFrame:
    """Frame sampling: one output row per sampled timestamp.

    The fan-out happens Spark-side (``explode(sequence(...))``) so the
    kernel sees one already-exploded row per frame and stays a flat
    column-parallel pass — no per-row iteration, no Python-side loops over
    timestamps. ``decode_mode="real"`` decodes AVI/MJPEG containers
    natively (``kgspark.avicodec`` RIFF walk + the JPEG codec per frame)
    and emits the frame's pixel stats as [7, w, h, sum_r, sum_g, sum_b,
    max, min]; mp4/webm payloads raise at the ffmpeg seam.
    """
    frames = media.filter(
        (F.col("kind") == "video") & F.col("duration_ms").isNotNull()
    ).select(
        "media_id",
        "payload",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("duration_ms") - 1, F.lit(every_ms).cast("long"))
        ).alias("frame_ts_ms"),
    )

    def _real_frame_feature(p: bytes, ts: int) -> list[float]:
        from kgspark.avicodec import decode_avi_frame_rgb

        if p[:4] != b"RIFF" or p[8:12] != b"AVI ":
            raise NotImplementedError(
                "only AVI/MJPEG video decodes without ffmpeg "
                f"(payload magic {p[:8]!r})"
            )
        rgb = decode_avi_frame_rgb(p, ts).astype(np.int64)
        h, w = rgb.shape[:2]
        return [
            7.0, float(w), float(h), float(rgb[:, :, 0].sum()),
            float(rgb[:, :, 1].sum()), float(rgb[:, :, 2].sum()),
            float(rgb.max()), float(rgb.min()),
        ]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        feat = _real_frame_feature if decode_mode == "real" else _fake_frame_feature
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_ts_ms": pdf["frame_ts_ms"],
                    "frame_feature": [
                        feat(bytes(p), int(ts))
                        for p, ts in zip(pdf["payload"], pdf["frame_ts_ms"])
                    ],
                }
            )

    return frames.mapInPandas(kernel, FRAMES_SCHEMA)


def avi_media_table(
    docs: DataFrame, n: int = 48, id_col: str = "doc_id"
) -> DataFrame:
    """Media table of REAL AVI/MJPEG videos, closed-form in the id:
    2 + id%4 flat-color frames (frame i channel c = (id*7 + i*31 + 11c)
    % 256, the q100 bit-exact shape), 5 fps (200 ms per frame) — the
    DuckDB oracle re-derives every sampled frame's stats from the
    formulas alone."""
    base = docs.filter(F.col(id_col).cast("long") < n).select(
        F.col(id_col).cast("long").alias("media_id")
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from kgspark.avicodec import encode_avi_mjpeg

        for pdf in batches:
            rows = {"media_id": [], "url": [], "kind": [], "payload": [],
                    "width": [], "height": [], "duration_ms": []}
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h = 4 + mid % 4, 3 + mid % 3
                n_frames = 2 + mid % 4
                frames = []
                for i in range(n_frames):
                    px = np.zeros((h, w, 3), dtype=np.uint8)
                    for c, off in enumerate((0, 11, 22)):
                        px[:, :, c] = (mid * 7 + i * 31 + off) % 256
                    frames.append(px)
                rows["media_id"].append(mid)
                rows["url"].append(f"https://example.org/media/{mid}.avi")
                rows["kind"].append("video")
                rows["payload"].append(
                    encode_avi_mjpeg(frames, us_per_frame=200_000)
                )
                rows["width"].append(w)
                rows["height"].append(h)
                rows["duration_ms"].append(n_frames * 200)
            yield pd.DataFrame(rows)

    return base.mapInPandas(kernel, MEDIA_SCHEMA)
