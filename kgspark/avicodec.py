"""AVI/MJPEG container codec — pure python, frames are JPEGs.

Turns the video path from "typed plumbing with a fake decoder" into a
REAL decode: an AVI (RIFF 'AVI ') with an MJPEG video stream is just a
chunk walk whose '00dc' payloads are ordinary JPEG images — which
``kgspark.jpegcodec`` already decodes. Writer emits the minimal
canonical layout (hdrl/avih + strl/strh/strf, movi with one '00dc' per
frame); reader walks any AVI tolerant of extra chunks/LISTs and returns
the frame timing plus raw JPEG bytes per frame. mp4/webm stay at the
ffmpeg seam — their codecs (h264/vp9) genuinely need a video decoder.
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(
    frames: list[np.ndarray], us_per_frame: int = 200_000, quality: int = 100
) -> bytes:
    """RGB frames -> single-stream MJPEG AVI (each frame a quality-`q`
    baseline JPEG)."""
    from kgspark.jpegcodec import encode_jpeg

    if not frames:
        raise ValueError("AVI needs at least one frame")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    n = len(jpegs)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        us_per_frame, 0, 0, 0x10, n, 0, 1, max(map(len, jpegs)), w, h,
        0, 0, 0, 0,
    )
    # strh: fccType + fccHandler + flags, prio, lang, initial, scale,
    # rate (rate/scale = fps), start, length, bufsize, quality,
    # sample_size, rcFrame — 56 bytes
    strh = b"vidsMJPG" + struct.pack(
        "<IHHIIIIIIiI4H",
        0, 0, 0, 0,
        us_per_frame, 1_000_000,  # scale, rate
        0, n, max(map(len, jpegs)), -1, 0,
        0, 0, w, h,
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3,
                       0, 0, 0, 0)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(p: bytes) -> tuple[int, list[bytes]]:
    """AVI bytes -> (us_per_frame, [jpeg bytes per video frame]).

    Tolerant RIFF walk: LISTs are recursed, unknown chunks skipped,
    '00dc'/'00db' chunks collected in order."""
    if p[:4] != b"RIFF" or p[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    us_per_frame = 0
    frames: list[bytes] = []

    def walk(lo: int, hi: int) -> None:
        nonlocal us_per_frame
        pos = lo
        while pos + 8 <= hi:
            fourcc = p[pos : pos + 4]
            (size,) = struct.unpack("<I", p[pos + 4 : pos + 8])
            body_lo = pos + 8
            if fourcc == b"LIST":
                walk(body_lo + 4, body_lo + size)  # skip the list type
            elif fourcc == b"avih":
                (us_per_frame,) = struct.unpack("<I", p[body_lo : body_lo + 4])
            elif fourcc[2:] in (b"dc", b"db"):
                frames.append(p[body_lo : body_lo + size])
            pos = body_lo + size + (size & 1)

    walk(12, 8 + struct.unpack("<I", p[4:8])[0])
    if not frames:
        raise ValueError("AVI contains no video frames")
    return us_per_frame, frames


def decode_avi_frame_rgb(p: bytes, ts_ms: int) -> "np.ndarray":
    """The frame covering timestamp `ts_ms`, decoded to (h, w, 3) RGB."""
    from kgspark.jpegcodec import decode_jpeg_rgb

    us_per_frame, frames = decode_avi(p)
    idx = min(ts_ms * 1000 // max(us_per_frame, 1), len(frames) - 1)
    return decode_jpeg_rgb(frames[idx])
