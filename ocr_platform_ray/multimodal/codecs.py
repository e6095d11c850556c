"""Vendored pure-python image/audio codecs (public file formats, no
external libs): PNG (RFC 2083 / ISO 15948 — zlib IDAT, filters 0-4,
8-bit gray/gray+alpha/RGB/RGBA) and WAV (RIFF PCM 8/16-bit).

These make the multimodal decode stages compute REAL pixels/samples in
this container (PIL/cv2/soundfile are absent); payloads in any other
format still route to the documented stub/strict path."""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------
def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w) gray, (h, w, 3) RGB or (h, w, 4) RGBA uint8 -> PNG bytes
    (filter 0 rows, one zlib IDAT)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        color_type, channels = 0, 1
        px = px[:, :, None]
    elif px.shape[2] == 3:
        color_type, channels = 2, 3
    elif px.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError(f"png: unsupported channel count {px.shape}")
    h, w = px.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = bytearray()
    for r in range(h):
        raw.append(0)  # filter type None
        raw += px[r].tobytes()
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8 RGB (gray replicated, alpha dropped).
    Supports 8-bit depth, color types 0/2/4/6, filters 0-4, non-interlaced."""
    if not data.startswith(PNG_MAGIC):
        raise ValueError("png: bad magic")
    i = len(PNG_MAGIC)
    width = height = None
    color_type = depth = None
    idat = bytearray()
    n = len(data)
    while i + 8 <= n:
        (length,) = struct.unpack(">I", data[i : i + 4])
        tag = data[i + 4 : i + 8]
        body = data[i + 8 : i + 8 + length]
        i += 12 + length  # skip CRC
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"png: unsupported bit depth {depth}")
            if interlace:
                raise ValueError("png: interlaced not supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("png: missing IHDR")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"png: unsupported color type {color_type}")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) < height * (stride + 1):
        raise ValueError("png: truncated pixel data")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for r in range(height):
        ft = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += stride + 1
        if ft == 0:
            pass
        elif ft == 2:  # Up (vectorized)
            row += prev
        elif ft == 1:  # Sub
            for k in range(channels, stride):
                row[k] = (int(row[k]) + int(row[k - channels])) & 0xFF
        elif ft == 3:  # Average
            for k in range(stride):
                left = int(row[k - channels]) if k >= channels else 0
                row[k] = (int(row[k]) + (left + int(prev[k])) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for k in range(stride):
                a = int(row[k - channels]) if k >= channels else 0
                c = int(prev[k - channels]) if k >= channels else 0
                row[k] = (int(row[k]) + _paeth(a, int(prev[k]), c)) & 0xFF
        else:
            raise ValueError(f"png: bad filter {ft}")
        out[r] = row
        prev = row
    px = out.reshape(height, width, channels)
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    if channels == 2:  # gray + alpha -> replicate gray
        return np.repeat(px[:, :, :1], 3, axis=2)
    if channels == 4:
        return np.ascontiguousarray(px[:, :, :3])
    return px


# ---------------------------------------------------------------------------
# PNG-sequence "video" container (length-prefixed frames)
# ---------------------------------------------------------------------------
# This container stands in for real video formats (no ffmpeg in this
# environment): magic + frame count + [uint32 length | PNG bytes]*.  The
# frame decode is the REAL PNG codec above; only the container is local.
PNGSEQ_MAGIC = b"PNGSEQ1\x00"


def encode_png_seq(frames: list[np.ndarray]) -> bytes:
    out = bytearray(PNGSEQ_MAGIC)
    out += struct.pack("<I", len(frames))
    for f in frames:
        png = encode_png(f)
        out += struct.pack("<I", len(png)) + png
    return bytes(out)


def decode_png_seq_frame(data: bytes, idx: int) -> np.ndarray:
    """Random-access decode of frame ``idx`` (skips other frames by their
    length prefixes — frame sampling never inflates unsampled frames)."""
    if data[: len(PNGSEQ_MAGIC)] != PNGSEQ_MAGIC:
        raise ValueError("pngseq: bad magic")
    (n,) = struct.unpack_from("<I", data, len(PNGSEQ_MAGIC))
    if not 0 <= idx < n:
        raise ValueError(f"pngseq: frame {idx} out of range (n={n})")
    pos = len(PNGSEQ_MAGIC) + 4
    for i in range(n):
        (ln,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if i == idx:
            return decode_png(data[pos : pos + ln])
        pos += ln
    raise ValueError("pngseq: truncated")


def png_seq_frame_count(data: bytes) -> int:
    if data[: len(PNGSEQ_MAGIC)] != PNGSEQ_MAGIC:
        raise ValueError("pngseq: bad magic")
    (n,) = struct.unpack_from("<I", data, len(PNGSEQ_MAGIC))
    return n


# ---------------------------------------------------------------------------
# WAV (RIFF PCM)
# ---------------------------------------------------------------------------
def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """float array in [-1, 1] (mono or (n, ch)) -> 16-bit PCM WAV bytes."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    n_ch = x.shape[1]
    data = pcm.tobytes()
    byte_rate = sample_rate * n_ch * 2
    fmt = struct.pack("<HHIIHH", 1, n_ch, sample_rate, byte_rate, n_ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float64 mono samples in [-1, 1], sample_rate).
    PCM 8/16-bit, multi-channel averaged to mono."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("wav: bad RIFF header")
    i = 12
    n = len(data)
    fmt = None
    pcm = None
    while i + 8 <= n:
        tag = data[i : i + 4]
        (length,) = struct.unpack("<I", data[i + 4 : i + 8])
        body = data[i + 8 : i + 8 + length]
        i += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            pcm = body
    if fmt is None or pcm is None:
        raise ValueError("wav: missing fmt/data chunk")
    audio_format, n_ch, sample_rate, _, _, bits = fmt
    if audio_format != 1:
        raise ValueError(f"wav: unsupported format {audio_format}")
    if bits == 16:
        x = np.frombuffer(pcm, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(pcm, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"wav: unsupported bit depth {bits}")
    if n_ch > 1:
        x = x[: (len(x) // n_ch) * n_ch].reshape(-1, n_ch).mean(axis=1)
    return x, sample_rate
