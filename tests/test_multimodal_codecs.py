"""Real media codecs (operators/codecs.py): PNG/BMP/WAV round-trips,
unfiltering paths, resize, and the Spark-side real decode/resize flows."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from myzql_binlog_connector_spark.operators.codecs import (
    CodecError,
    PNG_SIG,
    decode_bmp,
    decode_image,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
    media_meta,
    resize_nearest,
    sniff_format,
)


def _img(h, w, ch, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)


def _png_with_filters(rows_filtered: list[tuple[int, bytes]], w, h, color_type):
    """Hand-build a PNG whose rows use explicit filter types."""
    raw = b"".join(bytes([f]) + body for f, body in rows_filtered)

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


class TestPng:
    @pytest.mark.parametrize("ch", [1, 2, 3, 4])
    def test_roundtrip(self, ch):
        img = _img(13, 7, ch, seed=ch)
        out = decode_png(encode_png(img))
        assert out.shape == img.shape
        assert (out == img).all()

    def test_all_filter_types_unapply(self):
        # 3x3 RGB, one row per filter family; expected image is fixed, rows
        # are filtered by hand using the PNG spec definitions
        want = _img(4, 3, 3, seed=9).astype(np.int32)
        rows = []
        # row 0: filter 1 (sub)
        r = want[0].reshape(-1)
        f1 = [int(r[i]) - (int(r[i - 3]) if i >= 3 else 0) & 0xFF for i in range(len(r))]
        f1 = [(int(r[i]) - (int(r[i - 3]) if i >= 3 else 0)) & 0xFF for i in range(len(r))]
        rows.append((1, bytes(f1)))
        # row 1: filter 2 (up)
        r0, r1 = want[0].reshape(-1), want[1].reshape(-1)
        rows.append((2, bytes([(int(b) - int(a)) & 0xFF for a, b in zip(r0, r1)])))
        # row 2: filter 3 (average)
        r2 = want[2].reshape(-1)
        f3 = []
        for i in range(len(r2)):
            left = int(r2[i - 3]) if i >= 3 else 0
            up = int(r1[i])
            f3.append((int(r2[i]) - (left + up) // 2) & 0xFF)
        rows.append((3, bytes(f3)))
        # row 3: filter 4 (paeth)
        r3 = want[3].reshape(-1)

        def paeth(a, b, c):
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

        f4 = []
        for i in range(len(r3)):
            left = int(r3[i - 3]) if i >= 3 else 0
            up = int(r2[i])
            ul = int(r2[i - 3]) if i >= 3 else 0
            f4.append((int(r3[i]) - paeth(left, up, ul)) & 0xFF)
        rows.append((4, bytes(f4)))

        png = _png_with_filters(rows, 3, 4, color_type=2)
        out = decode_png(png)
        assert (out == want.astype(np.uint8)).all()

    def test_unsupported_bit_depth_raises(self):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)

        def chunk(ctype, body):
            return (
                struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
            )

        bad = PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
        with pytest.raises(CodecError, match="unsupported"):
            decode_png(bad)


class TestBmpWav:
    def test_bmp_roundtrip(self):
        img = _img(5, 7, 3, seed=2)  # odd width exercises row padding
        out = decode_bmp(encode_bmp(img))
        assert (out == img).all()

    def test_wav_meta_and_samples(self):
        t = np.arange(16000, dtype=np.float64)
        samples = (np.sin(t * 0.05) * 20000).astype(np.int16)
        data = encode_wav(samples, sample_rate=16000)
        meta = decode_wav(data)
        assert meta["sample_rate"] == 16000
        assert meta["n_frames"] == 16000
        assert meta["duration_ms"] == 1000
        assert (meta["samples"][:, 0] == samples).all()

    def test_sniff(self):
        assert sniff_format(encode_png(_img(2, 2, 3))) == "png"
        assert sniff_format(encode_bmp(_img(2, 2, 3))) == "bmp"
        assert sniff_format(encode_wav(np.zeros(10, np.int16))) == "wav"
        assert sniff_format(b"\x00\x00\x00\x18ftypmp42xxxx") == "mp4"

    def test_media_meta(self):
        img = _img(30, 20, 3)
        m = media_meta(encode_png(img))
        assert (m["width"], m["height"], m["format"]) == (20, 30, "png")
        m = media_meta(encode_wav(np.zeros(8000, np.int16), 16000))
        assert (m["duration_ms"], m["format"]) == (500, "wav")
        # mp4 metadata is a real box parse now; a moov-less payload is a
        # codec error, not an unimplemented format
        with pytest.raises(CodecError, match="moov"):
            media_meta(b"\x00\x00\x00\x18ftypmp42" + b"x" * 16)


class TestResize:
    def test_nearest_downsample(self):
        img = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
        out = resize_nearest(img, 2, 2)
        assert out.reshape(2, 2).tolist() == [[0, 2], [8, 10]]

    def test_upsample_shape(self):
        img = _img(3, 5, 3)
        assert resize_nearest(img, 10, 6).shape == (6, 10, 3)


class TestSparkFlows:
    def test_real_decode_media(self, spark):
        from myzql_binlog_connector_spark.operators.multimodal import decode_media

        rows = [
            (1, "image", bytearray(encode_png(_img(12, 8, 3, seed=1)))),
            (2, "image", bytearray(encode_bmp(_img(6, 9, 3, seed=2)))),
            (3, "audio", bytearray(encode_wav(np.zeros(4000, np.int16), 8000))),
            (4, "image", None),
        ]
        df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
        got = {r.media_id: r for r in decode_media(df, fake=False).collect()}
        assert (got[1].width, got[1].height, got[1].format) == (8, 12, "png")
        assert (got[2].width, got[2].height, got[2].format) == (9, 6, "bmp")
        assert (got[3].duration_ms, got[3].format) == (500, "wav")
        assert got[4].format is None

    def test_resize_images_flow(self, spark):
        from myzql_binlog_connector_spark.operators.multimodal import resize_images

        rows = [
            (1, "image", bytearray(encode_png(_img(32, 16, 3, seed=3)))),
            (2, "image", bytearray(b"not media")),
        ]
        df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
        out = resize_images(df, out_w=8, out_h=8).collect()
        assert len(out) == 1  # undecodable dropped
        img = decode_image(bytes(out[0].payload))
        assert img.shape == (8, 8, 3)


class TestMp4Metadata:
    def test_roundtrip_meta(self):
        from myzql_binlog_connector_spark.operators.codecs import (
            encode_mp4_meta,
            media_meta,
            parse_mp4_meta,
            sniff_format,
        )

        data = encode_mp4_meta(640, 360, 12_500)
        assert sniff_format(data) == "mp4"
        got = parse_mp4_meta(data)
        assert got == {"width": 640, "height": 360, "duration_ms": 12_500}
        m = media_meta(data)
        assert m["format"] == "mp4" and m["width"] == 640
        assert m["duration_ms"] == 12_500 and m["byte_len"] == len(data)

    def test_v1_boxes_and_largesize(self):
        import struct

        from myzql_binlog_connector_spark.operators.codecs import parse_mp4_meta

        def box(t, body):
            return struct.pack(">I", 8 + len(body)) + t + body

        matrix = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        mvhd = box(
            b"mvhd",
            b"\x01\x00\x00\x00"
            + struct.pack(">QQIQ", 0, 0, 90_000, 90_000 * 7)
            + struct.pack(">I", 0x10000) + struct.pack(">H", 0x100)
            + bytes(10) + matrix + bytes(24) + struct.pack(">I", 2),
        )
        tkhd = box(
            b"tkhd",
            b"\x01\x00\x00\x07"
            + struct.pack(">QQII", 0, 0, 1, 0) + struct.pack(">Q", 0)
            + bytes(8) + struct.pack(">hhHH", 0, 0, 0, 0) + matrix
            + struct.pack(">II", 1920 << 16, 1080 << 16),
        )
        moov_body = mvhd + box(b"trak", tkhd)
        # largesize (size==1) framing on moov
        moov = struct.pack(">I", 1) + b"moov" + struct.pack(">Q", 16 + len(moov_body)) + moov_body
        data = box(b"ftyp", b"isom" + bytes(4)) + moov
        got = parse_mp4_meta(data)
        assert got == {"width": 1920, "height": 1080, "duration_ms": 7000}

    def test_missing_moov_raises(self):
        import pytest as _pytest

        from myzql_binlog_connector_spark.operators.codecs import (
            CodecError,
            parse_mp4_meta,
        )

        with _pytest.raises(CodecError, match="moov"):
            parse_mp4_meta(b"\x00\x00\x00\x10ftypisom\x00\x00\x00\x00")


class TestMp4Fuzz:
    def test_arbitrary_bytes_never_hang_or_crash(self):
        """Malformed containers must raise CodecError (or parse), never
        loop forever or throw anything unstructured."""
        from hypothesis import given, settings, strategies as st

        from myzql_binlog_connector_spark.operators.codecs import (
            CodecError,
            parse_mp4_meta,
        )

        @settings(max_examples=200, deadline=None)
        @given(st.binary(min_size=0, max_size=256))
        def run(data):
            try:
                parse_mp4_meta(data)
            except CodecError:
                pass

        run()

    def test_truncated_valid_container_raises_cleanly(self):
        from myzql_binlog_connector_spark.operators.codecs import (
            CodecError,
            encode_mp4_meta,
            parse_mp4_meta,
        )

        data = encode_mp4_meta(320, 240, 5000)
        for cut in (9, 17, 33, len(data) // 2, len(data) - 3):
            try:
                parse_mp4_meta(data[:cut])
            except CodecError:
                pass  # clean structured failure

    def test_mutated_box_sizes_raise_cleanly(self):
        from hypothesis import given, settings, strategies as st

        from myzql_binlog_connector_spark.operators.codecs import (
            CodecError,
            encode_mp4_meta,
            parse_mp4_meta,
        )

        base = encode_mp4_meta(320, 240, 5000)

        @settings(max_examples=150, deadline=None)
        @given(
            st.integers(min_value=0, max_value=len(base) - 1),
            st.integers(min_value=0, max_value=255),
        )
        def run(pos, val):
            data = base[:pos] + bytes([val]) + base[pos + 1:]
            try:
                parse_mp4_meta(data)
            except CodecError:
                pass  # the only acceptable failure mode

        run()
