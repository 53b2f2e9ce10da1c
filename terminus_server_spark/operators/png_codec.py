"""Pure-stdlib PNG decode/encode — the REAL-decode backend that can
run in this container (SURVEY §2.6 row 56; r8 verdict task 4).

The multimodal seam resolves decoders per worker: explicit callable >
PIL (absent here) > THIS module for PNG payloads > the deterministic
stub.  Everything below is the public PNG specification (RFC 2083 /
W3C PNG): chunk framing with CRC-32, zlib-inflated scanlines, and the
five per-row filters (None/Sub/Up/Average/Paeth) reconstructed
exactly.  stdlib only — ``zlib``, ``struct`` — so the real-decode
branch is CI-exercisable without any codec library.

Scope: 8-bit, non-interlaced, color types 0 (gray), 2 (RGB),
4 (gray+alpha), 6 (RGBA) — the shapes a training-data pipeline meets
after normalization.  Anything else raises ``ValueError`` (decode
errors must surface, not mis-decode).

This codec runs INSIDE the mapInPandas batch loop (one Python worker
per partition, Arrow batches) — the Spark-side plumbing is identical
to the PIL and stub branches, which is the point of the seam.
"""

from __future__ import annotations

import struct
import zlib

_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(payload: bytes) -> bool:
    return payload[:8] == _MAGIC


def _chunks(payload: bytes):
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("png: truncated chunk")
        crc_raw = payload[pos + 8 + length : pos + 12 + length]
        if len(crc_raw) != 4:
            raise ValueError("png: truncated chunk crc")
        # per-chunk CRC-32 over type+data (module contract: decode
        # errors must SURFACE — a bit-flipped IDAT that still
        # inflates would otherwise mis-decode silently)
        (crc,) = struct.unpack(">I", crc_raw)
        if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            raise ValueError(
                f"png: crc mismatch in {ctype.decode('latin1')} chunk"
            )
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return
    raise ValueError("png: missing IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(payload: bytes) -> tuple[int, int, int, list[bytearray]]:
    """(width, height, channels, rows) — full pixel reconstruction:
    inflate + per-row filter reversal.  Raises ValueError on any
    malformed or out-of-scope input."""
    if not is_png(payload):
        raise ValueError("png: bad magic")
    width = height = None
    color_type = bit_depth = None
    idat = bytearray()
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if bit_depth != 8 or comp != 0 or filt != 0 or interlace != 0:
                raise ValueError(
                    f"png: unsupported (depth={bit_depth}, interlace={interlace})"
                )
            if color_type not in _CHANNELS:
                raise ValueError(f"png: unsupported color type {color_type}")
        elif ctype == b"IDAT":
            idat.extend(data)
    if width is None:
        raise ValueError("png: no IHDR")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        raise ValueError("png: scanline size mismatch")
    rows: list[bytearray] = []
    prev = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"png: bad filter {ftype}")
        rows.append(line)
        prev = line
    return width, height, ch, rows


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def png_encode(
    width: int, height: int, channels: int, rows: list[bytearray]
) -> bytes:
    """Re-encode reconstructed pixels as a valid PNG (filter 0 rows,
    one zlib stream) — enough for the resize path to emit payloads
    any standard decoder accepts."""
    color_type = {1: 0, 3: 2, 2: 4, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(r) for r in rows)
    return (
        _MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def png_resize_nearest(payload: bytes, target: int) -> bytes:
    """Nearest-neighbor resample to target×target, re-encoded as PNG —
    the stdlib analogue of the PIL resize branch."""
    w, h, ch, rows = png_decode(payload)
    out: list[bytearray] = []
    for ty in range(target):
        src = rows[ty * h // target]
        line = bytearray(target * ch)
        for tx in range(target):
            sx = tx * w // target
            line[tx * ch : (tx + 1) * ch] = src[sx * ch : (sx + 1) * ch]
        out.append(line)
    return png_encode(target, target, ch, out)
