"""Pure-stdlib/numpy media codecs for the multimodal operators.

This container has no PIL/ffmpeg, but PNG (zlib + numpy unfiltering), BMP
(BI_RGB 24-bit), and WAV (stdlib ``wave``) need neither — so the
image/audio half of the multimodal pipeline is REAL here: decode, metadata
extraction, nearest-neighbor resize, and PNG re-encode all run on actual
bytes.  Video containers (mp4 etc.) still require ffmpeg and stay stubbed
at the ``decode_media`` level.

All functions are plain bytes/ndarray transforms so they run unchanged
inside ``mapInPandas`` workers (Arrow batch → numpy, no Spark imports).
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color_type -> channels


class CodecError(ValueError):
    pass


def sniff_format(data: bytes) -> str | None:
    if data[:8] == PNG_SIG:
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if len(data) > 11 and data[4:8] == b"ftyp":
        return "mp4"
    return None


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG (gray/gray+alpha/RGB/RGBA) into a
    (h, w, channels) uint8 array.  Filters 0-2 unapply vectorized; the
    left-dependent filters (avg/paeth) fall back to a per-pixel loop."""
    if data[:8] != PNG_SIG:
        raise CodecError("not a PNG")
    pos = 8
    width = height = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None:
        raise CodecError("PNG missing IHDR")
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise CodecError(
            f"unsupported PNG (bit_depth={bit_depth}, color_type={color_type}, "
            f"interlace={interlace})"
        )
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise CodecError("PNG data length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(height):
        f = raw[r * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).copy()
        if f == 0:
            cur = row
        elif f == 1:  # sub: cumulative per channel lane
            cur = row.reshape(width, ch).cumsum(axis=0, dtype=np.uint32)
            cur = (cur & 0xFF).astype(np.uint8).reshape(stride)
        elif f == 2:  # up
            cur = row + prev
        elif f in (3, 4):  # average / paeth: left-dependent, scalar loop
            cur = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(cur[i - ch]) if i >= ch else 0
                up = int(prev[i])
                ul = int(prev[i - ch]) if i >= ch else 0
                base = (left + up) // 2 if f == 3 else _paeth(left, up, ul)
                cur[i] = (int(row[i]) + base) & 0xFF
        else:
            raise CodecError(f"bad PNG filter {f}")
        out[r] = cur
        prev = out[r]
    return out.reshape(height, width, ch)


def encode_png(arr: np.ndarray) -> bytes:
    """Encode a (h, w[, channels]) uint8 array as PNG (filter 0)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = b"".join(b"\x00" + arr[r].tobytes() for r in range(h))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# BMP (BI_RGB 24-bit)
# ---------------------------------------------------------------------------


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP into (h, w, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise CodecError("not a BMP")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    width, height = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (comp,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or comp != 0:
        raise CodecError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    flip = height > 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3  # 4-byte padded
    img = np.zeros((height, width, 3), dtype=np.uint8)
    for r in range(height):
        off = pix_off + r * row_bytes
        row = np.frombuffer(data, np.uint8, count=width * 3, offset=off).reshape(
            width, 3
        )
        img[height - 1 - r if flip else r] = row[:, ::-1]  # BGR -> RGB
    return img


def encode_bmp(arr: np.ndarray) -> bytes:
    h, w, ch = arr.shape
    if ch != 3:
        raise CodecError("BMP encoder expects RGB")
    row_bytes = (w * 3 + 3) & ~3
    body = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        row = arr[r, :, ::-1].tobytes()  # RGB -> BGR
        body += row + b"\x00" * (row_bytes - len(row))
    pix_off = 54
    hdr = (
        b"BM"
        + struct.pack("<IHHI", pix_off + len(body), 0, 0, pix_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    return bytes(hdr) + bytes(body)


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def decode_wav(data: bytes) -> dict:
    """WAV metadata + int16 samples via the stdlib ``wave`` module."""
    import wave

    with wave.open(io.BytesIO(data)) as w:
        n = w.getnframes()
        rate = w.getframerate()
        ch = w.getnchannels()
        width = w.getsampwidth()
        frames = w.readframes(n)
    samples = None
    if width == 2:
        samples = np.frombuffer(frames, dtype="<i2").reshape(-1, ch)
    return {
        "sample_rate": rate,
        "channels": ch,
        "n_frames": n,
        "duration_ms": int(round(n * 1000 / rate)) if rate else None,
        "samples": samples,
    }


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    import wave

    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via pure numpy indexing."""
    h, w = arr.shape[:2]
    rows = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    cols = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return arr[rows[:, None], cols[None, :]]


def decode_image(data: bytes) -> np.ndarray:
    fmt = sniff_format(data)
    if fmt == "png":
        return decode_png(data)
    if fmt == "bmp":
        return decode_bmp(data)
    raise CodecError(f"unsupported image format {fmt!r}")


# ---------------------------------------------------------------------------
# MP4 (ISO BMFF) metadata — a pure box parse, no ffmpeg needed.  Frame
# DECODE still requires a real codec and stays stubbed at sample_frames.
# ---------------------------------------------------------------------------


def _iter_boxes(data, start: int, end: int):
    """Yield (box_type, payload_start, payload_end) for sibling boxes in
    data[start:end] (ISO 14496-12 §4.2: 4B BE size + 4B type; size==1 →
    64-bit largesize follows; size==0 → box extends to end)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        btype = bytes(data[pos + 4 : pos + 8])
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise CodecError("truncated mp4 largesize box")
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise CodecError(f"bad mp4 box size {size} at {pos}")
        yield btype, pos + hdr, pos + size
        pos += size


def _find_box(data, btype: bytes, start: int, end: int):
    for t, s, e in _iter_boxes(data, start, end):
        if t == btype:
            return s, e
    return None


def parse_mp4_meta(data: bytes) -> dict:
    """moov/mvhd → duration_ms, first trak/tkhd with nonzero dims → w/h.

    Malformed containers (truncated/mutated box sizes or payloads) always
    raise :class:`CodecError` — never an unstructured struct/IndexError —
    so a poisoned payload can't crash a mapInPandas batch unhandled."""

    def _need(payload_end: int, upto: int) -> None:
        if upto > payload_end:
            raise CodecError("mp4 box payload shorter than its declared fields")

    moov = _find_box(data, b"moov", 0, len(data))
    if moov is None:
        raise CodecError("mp4 missing moov box")
    duration_ms = width = height = None
    for t, s, e in _iter_boxes(data, *moov):
        if t == b"mvhd":
            _need(e, s + 1)
            ver = data[s]
            if ver == 1:
                _need(e, s + 4 + 28)
                timescale = struct.unpack_from(">I", data, s + 4 + 16)[0]
                duration = struct.unpack_from(">Q", data, s + 4 + 20)[0]
            else:
                _need(e, s + 4 + 16)
                timescale = struct.unpack_from(">I", data, s + 4 + 8)[0]
                duration = struct.unpack_from(">I", data, s + 4 + 12)[0]
            if timescale:
                duration_ms = duration * 1000 // timescale
        elif t == b"trak" and width is None:
            tkhd = _find_box(data, b"tkhd", s, e)
            if tkhd is None:
                continue
            ts, te = tkhd
            _need(te, ts + 1)
            ver = data[ts]
            # after version/flags: v0 = c4 m4 id4 r4 dur4; v1 = c8 m8 id4 r4 dur8
            fixed = ts + 4 + (32 if ver == 1 else 20)
            # layer2 alt2 volume2 reserved2 matrix36 → width/height 16.16
            _need(te, fixed + 8 + 2 + 2 + 2 + 2 + 36 + 8)
            w16, h16 = struct.unpack_from(">II", data, fixed + 8 + 2 + 2 + 2 + 2 + 36)
            if w16 and h16:
                width, height = w16 >> 16, h16 >> 16
    return {"width": width, "height": height, "duration_ms": duration_ms}


_MP4_MATRIX = struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)


def encode_mp4_meta(width: int, height: int, duration_ms: int) -> bytes:
    """Minimal valid metadata-only mp4 skeleton: ftyp + moov(mvhd, trak
    (tkhd)).  No media data — enough for parse_mp4_meta / a metadata
    pipeline to round-trip, and for workers to synthesize test payloads."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    timescale = 1000
    mvhd = box(
        b"mvhd",
        bytes(4)  # version 0 + flags
        + struct.pack(">IIII", 0, 0, timescale, duration_ms)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)  # volume 1.0
        + bytes(2 + 8)  # reserved
        + _MP4_MATRIX
        + bytes(24)  # pre_defined
        + struct.pack(">I", 2),  # next_track_id
    )
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x07"  # version 0, flags: enabled|in-movie|in-preview
        + struct.pack(">IIII", 0, 0, 1, 0)  # created, modified, track_id, reserved
        + struct.pack(">I", duration_ms)
        + bytes(8)  # reserved
        + struct.pack(">hhHH", 0, 0, 0, 0)  # layer, alt_group, volume, reserved
        + _MP4_MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    return ftyp + moov


def media_meta(data: bytes) -> dict:
    """Real metadata extraction for sniffable formats."""
    fmt = sniff_format(data)
    meta = {
        "byte_len": len(data),
        "width": None,
        "height": None,
        "duration_ms": None,
        "format": fmt,
    }
    if fmt in ("png", "bmp"):
        img = decode_image(data)
        meta["height"], meta["width"] = int(img.shape[0]), int(img.shape[1])
    elif fmt == "wav":
        meta["duration_ms"] = decode_wav(data)["duration_ms"]
    elif fmt == "mp4":
        # box parse only (moov/mvhd/tkhd) — frame decode still needs ffmpeg
        meta.update(parse_mp4_meta(data))
    else:
        raise CodecError("unrecognized media payload")
    return meta
