"""Pure-stdlib/NumPy media codecs for the multimodal operators.

The container ships no image/audio libraries (no Pillow, no
soundfile), but two formats are fully decodable from their public
specs with ``zlib``/``wave`` + NumPy:

* PNG (RFC 2083): chunk walk → zlib inflate → per-scanline unfilter
  (filter types 0-4) → HxWxC uint8 array. 8-bit depth, color types
  0/2/3/4/6, non-interlaced (the overwhelmingly common case; Adam7
  raises).
* WAV (RIFF): stdlib ``wave`` → int PCM samples + rate.

A matching minimal PNG encoder (filter 0, fixed zlib level) makes
resize pipelines and round-trip tests self-contained. Baseline JPEG
decode/encode lives in the sibling ``jpeg.py`` (pure-NumPy T.81
implementation); MP4 frame decode remains out of scope — a real
deployment drops in ffmpeg behind the same function signatures.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

__all__ = ["decode_png", "encode_png", "decode_wav", "encode_wav", "resize_block_mean"]

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel (before palette expansion)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array of shape (H, W, C); C = 1, 2, 3 or 4
    (palette images expand to RGB)."""
    if not data.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # skip CRC
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth} (8 only)")
    if interlace:
        raise ValueError("interlaced (Adam7) PNG not supported")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    expected = height * (stride + 1)
    if len(raw) < expected:
        raise ValueError("PNG pixel data truncated")
    # unfilter: each scanline is [filter_byte][stride bytes]
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).copy()
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub — prefix sum per channel, mod 256
            line = (
                np.cumsum(line.reshape(width, ch).astype(np.int64), axis=0) % 256
            ).astype(np.uint8).reshape(stride)
        elif ftype == 2:  # Up
            line = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(line[x - ch]) if x >= ch else 0
                line[x] = (int(line[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = line
        prev = line
    img = out.reshape(height, width, ch)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        img = palette[img[:, :, 0]]
    return img


def encode_png(img: np.ndarray) -> bytes:
    """uint8 (H, W) or (H, W, C) array → PNG bytes (filter 0, no
    interlace). C ∈ {1, 2, 3, 4}."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].astype(np.uint8).tobytes() for y in range(h))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (samples as (n_frames, channels) int array, rate)."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        n = wf.getnframes()
        width = wf.getsampwidth()
        channels = wf.getnchannels()
        rate = wf.getframerate()
        frames = wf.readframes(n)
    if width == 1:
        arr = np.frombuffer(frames, dtype=np.uint8).astype(np.int16) - 128
    elif width == 2:
        arr = np.frombuffer(frames, dtype="<i2")
    elif width == 4:
        arr = np.frombuffer(frames, dtype="<i4")
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    return arr.reshape(-1, channels), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n_frames, channels) int16 array → WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def resize_block_mean(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Axis-wise resize (uint8 in/out): block means when shrinking an
    axis (box filter, exact for integer ratios), nearest-source
    replication when growing it. Handles up/down/mixed — a pure
    target-cell binning would leave zero-filled (black) cells on any
    upscale, since most output cells receive no source pixel."""

    def one_axis(arr: np.ndarray, out_n: int, axis: int) -> np.ndarray:
        in_n = arr.shape[axis]
        if out_n >= in_n:
            idx = (np.arange(out_n) * in_n) // out_n
            return np.take(arr, idx, axis=axis)
        bins = (np.arange(in_n) * out_n) // in_n
        shape = list(arr.shape)
        shape[axis] = out_n
        acc = np.zeros(shape, dtype=np.float64)
        sl = [slice(None)] * arr.ndim
        sl[axis] = bins
        np.add.at(acc, tuple(sl), arr.astype(np.float64))
        cnt_shape = [1] * arr.ndim
        cnt_shape[axis] = out_n
        counts = np.bincount(bins, minlength=out_n).astype(np.float64)
        return acc / np.maximum(counts.reshape(cnt_shape), 1)

    if img.ndim == 2:
        img = img[:, :, None]
    out = one_axis(img, out_h, 0)
    out = one_axis(out, out_w, 1)
    return np.clip(out, 0, 255).astype(np.uint8)
