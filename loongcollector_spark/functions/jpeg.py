"""Pure-NumPy baseline JPEG codec (ITU-T T.81, public spec).

The container ships no image libraries, but baseline sequential JPEG
is fully decodable from the public spec with stdlib + NumPy:

* ``decode_jpeg``: marker walk (DQT/DHT/SOF0/DRI/SOS) → Huffman
  entropy decode with byte-unstuffing and restart-marker handling →
  dequantize → 8x8 IDCT (one orthonormal-matrix multiply per block) →
  chroma upsample by sampling factors → YCbCr→RGB (BT.601) →
  HxWx3 uint8.  Baseline DCT (SOF0) only; progressive (SOF2) and
  arithmetic coding raise ``NotImplementedError`` — a real deployment
  drops in Pillow behind the same signature.
* ``decode_jpeg_dc``: DC-coefficient-only decode → 1/8-scale RGB
  thumbnail (one pixel per block), including **progressive (SOF2)**
  files — DC-first + DC-refinement scans decoded, AC scans skipped;
  no IDCT needed (a DC-only block is uniform).
* ``encode_jpeg``: minimal 4:4:4 baseline encoder (Annex K quant +
  Huffman tables, quality-scaled) so round-trip tests are
  self-contained without any golden binary.

Perf note: entropy decode is a per-block Python loop — this path
exists to make the multimodal feature pipeline REAL for jpg rows
(it runs inside Arrow-batched ``mapInPandas`` over typically small
thumbnails), not to be a throughput codec.
"""

from __future__ import annotations

import functools
import struct

import numpy as np

__all__ = [
    "decode_jpeg",
    "decode_jpeg_any",
    "decode_jpeg_dc",
    "encode_jpeg",
    "jpeg_dimensions",
]

# zigzag position -> row-major index in an 8x8 block (T.81 Figure 5)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 quantization tables (luminance / chrominance)
QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
assert sum(AC_LUM_BITS) == len(AC_LUM_VALS) == 162
assert sum(AC_CHROM_BITS) == len(AC_CHROM_VALS) == 162

# orthonormal 8-point DCT-II matrix: T[u, x] = c(u) cos((2x+1)uπ/16)
_X = np.arange(8)
_DCT_T = np.cos((2 * _X[None, :] + 1) * _X[:, None] * np.pi / 16) * np.sqrt(2 / 8)
_DCT_T[0, :] = np.sqrt(1 / 8)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _DCT_T.T @ block @ _DCT_T


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _DCT_T @ block @ _DCT_T.T


def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman: {symbol: (code, length)}."""
    out = {}
    for (length, code), sym in _build_decode_table(bits, vals).items():
        out[sym] = (code, length)
    return out


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed byte
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise _SegmentEnd()
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_to_restart(self) -> None:
        """Consume a pending restart marker and reset bit state."""
        self.bitbuf = 0
        self.nbits = 0
        # reader.pos sits ON the 0xFF of the restart marker
        self.pos += 2

    def decode_symbol(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


class _SegmentEnd(Exception):
    pass


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _parse_dqt(body: bytes, quant: dict) -> None:
    """DQT segment body → quant[tid] (8- or 16-bit precision)."""
    j = 0
    while j < len(body):
        prec, tid = body[j] >> 4, body[j] & 0x0F
        j += 1
        if prec == 0:
            quant[tid] = np.frombuffer(body[j : j + 64], dtype=np.uint8).astype(
                np.int64
            )
            j += 64
        else:
            quant[tid] = np.frombuffer(body[j : j + 128], dtype=">u2").astype(
                np.int64
            )
            j += 128


def _parse_dht(body: bytes, huff_dc: dict, huff_ac: dict) -> None:
    """DHT segment body → decode tables (tables may be redefined per scan)."""
    j = 0
    while j < len(body):
        cls, tid = body[j] >> 4, body[j] & 0x0F
        bits = list(body[j + 1 : j + 17])
        nv = sum(bits)
        vals = list(body[j + 17 : j + 17 + nv])
        (huff_dc if cls == 0 else huff_ac)[tid] = _build_decode_table(bits, vals)
        j += 17 + nv


def _next_restart(data: bytes, p: int) -> int:
    """Position just past the next byte-aligned restart marker at or
    after *p* (spec: restart markers are byte-aligned). ValueError on a
    truncated entropy stream instead of running off the buffer."""
    n = len(data)
    while p + 1 < n:
        if data[p] == 0xFF and 0xD0 <= data[p + 1] <= 0xD7:
            return p + 2
        p += 1
    raise ValueError("truncated JPEG: expected restart marker")


def _planes_to_rgb(full: list) -> np.ndarray:
    """Cropped component planes → HxWx3 uint8 RGB (grayscale JPEGs are
    replicated to 3 channels; 3-component via BT.601)."""
    if len(full) == 1:
        y = np.clip(full[0], 0, 255)
        return np.dstack([y, y, y]).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.dstack([r, g, b]), 0, 255).astype(np.uint8)


def _malformed_as_value_error(fn):
    """Public-API guard: truncated/corrupt input surfaces as ValueError
    (like every other malformed-input path), never as a raw IndexError
    or a private _RestartMarker/_SegmentEnd escaping the module.
    NotImplementedError (unsupported-but-valid frames) passes through."""

    @functools.wraps(fn)
    def wrapped(data: bytes) -> np.ndarray:
        try:
            return fn(data)
        except (IndexError, struct.error) as e:
            raise ValueError(f"truncated or malformed JPEG: {e!r}") from e
        except (_RestartMarker, _SegmentEnd) as e:
            raise ValueError(
                "malformed JPEG: unexpected marker in entropy stream"
            ) from e

    return wrapped


def jpeg_dimensions(data: bytes) -> tuple[int, int] | None:
    """(height, width) from the first SOF0..SOF15 frame header, or None."""
    i = 2
    n = len(data)
    while i + 3 < n:
        if data[i] != 0xFF:
            return None
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", data[i + 5 : i + 9])
            return h, w
        i += 2 + seg_len
    return None


@_malformed_as_value_error
def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline sequential JPEG → HxWx3 uint8 RGB (grayscale JPEGs are
    replicated to 3 channels)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    i = 2
    while True:
        if data[i] != 0xFF:
            raise ValueError(f"marker expected at {i}")
        marker = data[i + 1]
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before SOS")
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        body = data[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            _parse_dqt(body, quant)
        elif marker == 0xC4:  # DHT
            _parse_dht(body, huff_dc, huff_ac)
        elif marker == 0xC0:  # SOF0 baseline
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline DCT (SOF0) is supported, got SOF marker "
                f"0x{marker:02X}"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            scan = {}
            for c in range(ns):
                cid, tables = body[1 + 2 * c], body[2 + 2 * c]
                scan[cid] = (tables >> 4, tables & 0x0F)
            return _decode_scan(
                data, i + 2 + seg_len, frame, scan, quant, huff_dc, huff_ac,
                restart_interval,
            )
        # APPn/COM/other: skip
        i += 2 + seg_len


def _decode_scan(data, pos, frame, scan, quant, huff_dc, huff_ac,
                 restart_interval) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_cols = -(-w // (8 * hmax))
    mcu_rows = -(-h // (8 * vmax))
    planes = {
        c["id"]: np.zeros(
            (mcu_rows * 8 * c["v"], mcu_cols * 8 * c["h"]), dtype=np.float64
        )
        for c in comps
    }
    reader = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # entropy segment boundary: marker may surface either as
                # a pending _RestartMarker during the previous block's
                # trailing read or sit unread in the stream here
                if reader.nbits == 0 and reader.data[reader.pos] == 0xFF and (
                    0xD0 <= reader.data[reader.pos + 1] <= 0xD7
                ):
                    reader.sync_to_restart()
                else:
                    reader.bitbuf = 0
                    reader.nbits = 0
                    reader.pos = _next_restart(data, reader.pos)
                pred = {c["id"]: 0 for c in comps}
            for c in comps:
                dc_tbl = huff_dc[scan[c["id"]][0]]
                ac_tbl = huff_ac[scan[c["id"]][1]]
                q = quant[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = reader.decode_symbol(dc_tbl)
                        diff = _extend(reader.read_bits(t), t)
                        pred[c["id"]] += diff
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(ac_tbl)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = zz * q
                        spatial = _idct2(block.reshape(8, 8)) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu_count += 1
    # upsample to full resolution and crop
    full = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    return _planes_to_rgb(full)


def _skip_entropy(data: bytes, p: int) -> int:
    """Position of the next real marker (not a stuffed 0xFF00, not a
    restart) at or after *p* — how to step over an entropy-coded
    segment without decoding it."""
    n = len(data)
    while p + 1 < n:
        if data[p] == 0xFF and data[p + 1] != 0x00 and not (
            0xD0 <= data[p + 1] <= 0xD7
        ):
            return p
        p += 1
    return n


def _dc_scan_units(frame, scan_ids):
    """Block iteration order for a DC scan (T.81 §A.2): MCU-interleaved
    when the scan holds >1 component, the component's own ceil-block
    grid when non-interleaved. Yields units of (comp, plane_index);
    the restart interval counts units. plane_index addresses the
    MCU-padded plane (width mcu_cols·h_c blocks)."""
    comps = [c for c in frame["comps"] if c["id"] in scan_ids]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcu_cols = -(-frame["w"] // (8 * hmax))
    mcu_rows = -(-frame["h"] // (8 * vmax))
    if len(comps) > 1:
        for my in range(mcu_rows):
            for mx in range(mcu_cols):
                unit = []
                for c in comps:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            unit.append(
                                (
                                    c,
                                    (my * c["v"] + by) * (mcu_cols * c["h"])
                                    + mx * c["h"]
                                    + bx,
                                )
                            )
                yield unit
    else:
        c = comps[0]
        comp_w = -(-frame["w"] * c["h"] // hmax)
        comp_h = -(-frame["h"] * c["v"] // vmax)
        bw = -(-comp_w // 8)
        bh = -(-comp_h // 8)
        for r in range(bh):
            for col in range(bw):
                yield [(c, r * (mcu_cols * c["h"]) + col)]


@_malformed_as_value_error
def decode_jpeg_dc(data: bytes) -> np.ndarray:
    """DC-only decode → 1/8-scale RGB thumbnail (one pixel per 8×8
    block, the block's mean color): ``ceil(h/8) × ceil(w/8) × 3``
    uint8.

    Works for BOTH baseline (SOF0/SOF1) and **progressive (SOF2)**
    Huffman JPEGs — the progressive path the full ``decode_jpeg``
    cannot take. A DC pass needs no IDCT (a DC-only block is uniform
    ``dc·q₀/8 + 128``) and no AC table state: progressive DC-first
    scans decode exactly like baseline DC (diff Huffman, point
    transform ``<< Al``), DC-refinement scans contribute one raw bit
    per block at position ``Al``, and AC scans are skipped outright
    (byte-scan to the next marker). Baseline files take the same path
    with the AC coefficients Huffman-skipped. Arithmetic-coded and
    lossless frames still raise ``NotImplementedError``.
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    progressive = False
    restart_interval = 0
    dcs: dict[int, np.ndarray] = {}
    mcu_cols = mcu_rows = 0
    i = 2
    n = len(data)
    while i + 1 < n:
        if data[i] != 0xFF:
            raise ValueError(f"marker expected at {i}")
        marker = data[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        body = data[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            _parse_dqt(body, quant)
        elif marker == 0xC4:  # DHT (tables may be redefined per scan)
            _parse_dht(body, huff_dc, huff_ac)
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline/ext-seq/progressive
            progressive = marker == 0xC2
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcu_cols = -(-w // (8 * hmax))
            mcu_rows = -(-h // (8 * vmax))
            dcs = {
                c["id"]: np.zeros(
                    mcu_rows * c["v"] * mcu_cols * c["h"], dtype=np.int64
                )
                for c in comps
            }
        elif 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            raise NotImplementedError(
                f"only Huffman DCT frames are supported, got SOF marker "
                f"0x{marker:02X}"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_tbl = {}
            for c in range(ns):
                cid, tables = body[1 + 2 * c], body[2 + 2 * c]
                scan_tbl[cid] = (tables >> 4, tables & 0x0F)
            ss = body[1 + 2 * ns]
            ah_al = body[3 + 2 * ns]
            ah, al = ah_al >> 4, ah_al & 0x0F
            pos = i + 2 + seg_len
            if ss == 0:  # scan carries DC (progressive DC or baseline)
                reader = _BitReader(data, pos)
                pred = {cid: 0 for cid in scan_tbl}
                unit_no = 0
                for unit in _dc_scan_units(frame, set(scan_tbl)):
                    if (
                        restart_interval
                        and unit_no
                        and unit_no % restart_interval == 0
                    ):
                        reader.bitbuf = 0
                        reader.nbits = 0
                        reader.pos = _next_restart(data, reader.pos)
                        pred = {cid: 0 for cid in scan_tbl}
                    for c, idx in unit:
                        cid = c["id"]
                        if progressive and ah:  # DC refinement: 1 raw bit
                            if reader.read_bit():
                                dcs[cid][idx] |= 1 << al
                            continue
                        t = reader.decode_symbol(huff_dc[scan_tbl[cid][0]])
                        diff = _extend(reader.read_bits(t), t)
                        pred[cid] += diff
                        dcs[cid][idx] = pred[cid] << al
                        if not progressive:  # baseline: Huffman-skip AC
                            ac_tbl = huff_ac[scan_tbl[cid][1]]
                            k = 1
                            while k < 64:
                                rs = reader.decode_symbol(ac_tbl)
                                r, s = rs >> 4, rs & 0x0F
                                if s == 0:
                                    if r == 15:
                                        k += 16
                                        continue
                                    break
                                k += r
                                reader.read_bits(s)
                                k += 1
                    unit_no += 1
                pos = reader.pos
            i = _skip_entropy(data, pos)
            continue
        i += 2 + seg_len
    if frame is None or not dcs:
        raise ValueError("no decodable frame")
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    th = -(-frame["h"] // 8)
    tw = -(-frame["w"] // 8)
    full = []
    for c in comps:
        q0 = int(quant[c["tq"]][0])
        plane = dcs[c["id"]].astype(np.float64).reshape(
            mcu_rows * c["v"], mcu_cols * c["h"]
        )
        pix = plane * q0 / 8.0 + 128.0  # uniform value of a DC-only block
        pix = np.repeat(
            np.repeat(pix, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        full.append(pix[:th, :tw])
    return _planes_to_rgb(full)


def decode_jpeg_any(data: bytes) -> np.ndarray:
    """Best-available pixel decode: the full baseline decoder when the
    frame supports it, else the DC-only 1/8-scale thumbnail (the
    progressive-JPEG path). This is the codec-selection policy for
    callers that want *some* real pixels from any Huffman-DCT JPEG —
    e.g. feature extraction and block-mean resize in
    operators/multimodal.py. Arithmetic-coded and lossless frames
    still raise ``NotImplementedError``."""
    try:
        return decode_jpeg(data)
    except NotImplementedError:
        return decode_jpeg_dc(data)


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of an Annex K table (public formula)."""
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((tbl * scale + 50) // 100, 1, 255)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nacc += length
        while self.nacc >= 8:
            self.nacc -= 8
            b = (self.acc >> self.nacc) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nacc:
            pad = 8 - self.nacc
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Minimal baseline encoder (Annex K tables, quality-scaled).
    Accepts HxWx3 uint8 RGB or HxW grayscale; ``subsampling`` is
    ``'444'`` or ``'420'`` (2x2 box-mean chroma); ``restart_interval``
    emits RSTn markers every N MCUs (0 = none)."""
    if img.ndim == 2:
        img = np.dstack([img, img, img])
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = img.shape[:2]
    rgb = img.astype(np.float64)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2] + 128
    cr = 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2] + 128
    qlum = _quality_scale(QUANT_LUM, quality)
    qchr = _quality_scale(QUANT_CHROM, quality)
    hs = vs = 2 if subsampling == "420" else 1  # luma sampling factors

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(qlum[ZIGZAG].astype(np.uint8)))
    out += seg(0xDB, bytes([1]) + bytes(qchr[ZIGZAG].astype(np.uint8)))
    out += seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, (hs << 4) | vs, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    for cls, tid, bits, vals in (
        (0, 0, DC_LUM_BITS, DC_LUM_VALS),
        (1, 0, AC_LUM_BITS, AC_LUM_VALS),
        (0, 1, DC_CHROM_BITS, DC_CHROM_VALS),
        (1, 1, AC_CHROM_BITS, AC_CHROM_VALS),
    ):
        out += seg(0xC4, bytes([(cls << 4) | tid] + bits + vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    enc_dc = {0: _build_encode_table(DC_LUM_BITS, DC_LUM_VALS),
              1: _build_encode_table(DC_CHROM_BITS, DC_CHROM_VALS)}
    enc_ac = {0: _build_encode_table(AC_LUM_BITS, AC_LUM_VALS),
              1: _build_encode_table(AC_CHROM_BITS, AC_CHROM_VALS)}

    # per-component planes padded to whole MCUs
    mcu_cols = -(-w // (8 * hs))
    mcu_rows = -(-h // (8 * vs))

    def pad_to(plane: np.ndarray, rows: int, cols: int) -> np.ndarray:
        return np.pad(
            plane,
            ((0, rows - plane.shape[0]), (0, cols - plane.shape[1])),
            mode="edge",
        )

    y_p = pad_to(y, mcu_rows * 8 * vs, mcu_cols * 8 * hs)
    if subsampling == "420":
        # 2x2 box mean on even-padded chroma
        cb_e = pad_to(cb, -(-h // 2) * 2, -(-w // 2) * 2)
        cr_e = pad_to(cr, -(-h // 2) * 2, -(-w // 2) * 2)
        cb_s = cb_e.reshape(cb_e.shape[0] // 2, 2, cb_e.shape[1] // 2, 2).mean((1, 3))
        cr_s = cr_e.reshape(cr_e.shape[0] // 2, 2, cr_e.shape[1] // 2, 2).mean((1, 3))
    else:
        cb_s, cr_s = cb, cr
    cb_p = pad_to(cb_s, mcu_rows * 8, mcu_cols * 8)
    cr_p = pad_to(cr_s, mcu_rows * 8, mcu_cols * 8)

    bw = _BitWriter()
    pred = [0, 0, 0]

    def emit_magnitude(v: int) -> tuple[int, int]:
        """(category, magnitude bits) per T.81 F.1.2.1."""
        t = int(v).bit_length() if v > 0 else int(-v).bit_length()
        bits = v if v >= 0 else v + (1 << t) - 1
        return t, bits

    def emit_block(plane: np.ndarray, y0: int, x0: int, ci: int) -> None:
        tid = 0 if ci == 0 else 1
        q = qlum if ci == 0 else qchr
        block = plane[y0 : y0 + 8, x0 : x0 + 8] - 128.0
        coef = _fdct2(block)
        zz = np.round(coef.reshape(-1)[ZIGZAG] / q[ZIGZAG]).astype(np.int64)
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        t, bits = emit_magnitude(diff)
        code, ln = enc_dc[tid][t]
        bw.write(code, ln)
        if t:
            bw.write(bits, t)
        run = 0
        last_nz = np.nonzero(zz[1:])[0]
        last = last_nz[-1] + 1 if len(last_nz) else 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = enc_ac[tid][0xF0]
                bw.write(code, ln)
                run -= 16
            t, bits = emit_magnitude(v)
            code, ln = enc_ac[tid][(run << 4) | t]
            bw.write(code, ln)
            bw.write(bits, t)
            run = 0
        if last < 63:
            code, ln = enc_ac[tid][0x00]
            bw.write(code, ln)

    mcu_count = 0
    rst = 0
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0, 0, 0]
            for by in range(vs):
                for bx in range(hs):
                    emit_block(
                        y_p, (my * vs + by) * 8, (mx * hs + bx) * 8, 0
                    )
            emit_block(cb_p, my * 8, mx * 8, 1)
            emit_block(cr_p, my * 8, mx * 8, 2)
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
