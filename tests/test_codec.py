"""Unit tests for the binlog wire codecs.

Covers the reference's richest-tested modules (decimal, json) with its
golden vectors (SURVEY.md §5.1), plus the temporal/lenenc paths the
reference leaves untested (§5.1 'untested in reference' gap).
"""

from __future__ import annotations

import pytest

from myzql_binlog_connector_spark.binlog import wire
from myzql_binlog_connector_spark.binlog.mysql_decimal import (
    decode_decimal,
    encode_decimal,
    storage_size,
)
from myzql_binlog_connector_spark.binlog.mysql_json import (
    decode_json,
    decode_json_value,
    encode_json_value,
)


class TestLenenc:
    @pytest.mark.parametrize("n", [0, 1, 250, 251, 65535, 65536, 1 << 23, 1 << 24, 1 << 40])
    def test_roundtrip(self, n):
        buf = memoryview(wire.write_lenenc(n))
        val, pos = wire.read_lenenc(buf, 0)
        assert val == n
        assert pos == len(buf)

    def test_boundaries(self):
        assert wire.write_lenenc(250) == bytes([250])
        assert wire.write_lenenc(251)[0] == 0xFC
        assert wire.write_lenenc(65536)[0] == 0xFD
        assert wire.write_lenenc(1 << 24)[0] == 0xFE


class TestHeader:
    def test_roundtrip(self):
        raw = wire.pack_header(1_700_000_000, 30, 7, 123, 4567, flags=1)
        h = wire.parse_header(memoryview(raw))
        assert (h.timestamp, h.event_type, h.server_id, h.event_size, h.log_pos, h.flags) == (
            1_700_000_000, 30, 7, 123, 4567, 1,
        )

    def test_frame_crc(self):
        body = wire.pack_header(1, 30, 1, 23, 23) + b"payl"
        pkt = wire.frame_packet(body)
        assert pkt[0] == 0
        assert wire.verify_crc(pkt)
        corrupted = pkt[:-1] + bytes([pkt[-1] ^ 0xFF])
        assert not wire.verify_crc(corrupted)


class TestDecimal:
    def test_golden_reference_vector(self):
        # decimal_parser.zig:320-332 — DECIMAL(21,4) 1340.4000
        assert encode_decimal("1340.4000", 21, 4).hex() == "800000000000053c0fa0"
        assert decode_decimal(bytes.fromhex("800000000000053c0fa0"), 21, 4) == "1340.4000"

    @pytest.mark.parametrize(
        "value,p,s",
        [
            ("123.45", 5, 2),
            ("-123.45", 5, 2),
            ("0", 10, 0),
            ("0.0001", 10, 4),
            ("-0.0001", 10, 4),
            ("9999999999", 10, 0),
            ("-9999999999", 10, 0),
            ("12345678901234567890123456789012345.123456789012345678901234567890", 65, 30),
            ("-12345678901234567890123456789012345.123456789012345678901234567890", 65, 30),
            ("1.5", 38, 10),
        ],
    )
    def test_roundtrip(self, value, p, s):
        got = decode_decimal(encode_decimal(value, p, s), p, s)
        # normalize the expected padding to scale digits
        if "." in value:
            i_, f_ = value.lstrip("-").split(".")
        else:
            i_, f_ = value.lstrip("-"), ""
        want = (i_.lstrip("0") or "0") + (("." + f_.ljust(s, "0")) if s else "")
        if value.startswith("-") and want != "0" and set(want) - {"0", "."}:
            want = "-" + want
        assert got == want

    def test_storage_sizes(self):
        assert storage_size(21, 4) == 10
        assert storage_size(5, 2) == 3
        assert storage_size(65, 30) == 29 + 1  # 35 int digits + 30 frac digits


class TestJson:
    @pytest.mark.parametrize(
        "val",
        [
            None, True, False, 0, 42, -42, 30000, -30000, 70000, 3.5,
            "hello", "ünïcödé 😀", "",
            {"a": 1}, {"a": 1, "b": [1, 2, "x"], "c": {"d": None}},
            [1, "two", {"three": 3}], [], {},
            {"big": 1 << 40, "neg": -(1 << 40)},
        ],
    )
    def test_roundtrip(self, val):
        assert decode_json_value(encode_json_value(val)) == val

    def test_mariadb_plain_passthrough(self):
        # first byte > 0x0f → plain UTF-8 (json_decoder.zig:198-202 analogue)
        raw = b'{"x": 1}'
        assert decode_json(raw) == '{"x": 1}'

    def test_empty_blob_is_null(self):
        assert decode_json(b"") is None


class TestTemporal:
    def test_timestamp2_roundtrip(self):
        us = 1_700_000_000_123_456
        for fsp in (0, 3, 6):
            enc = wire.encode_timestamp2(us, fsp)
            got, pos = wire.decode_timestamp2(memoryview(enc), 0, fsp)
            scale = 10 ** (6 - fsp)
            assert got == (us // scale) * scale
            assert pos == len(enc)

    def test_datetime2_roundtrip(self):
        parts = (2024, 2, 29, 23, 59, 58, 999999)
        for fsp in (0, 3, 6):
            enc = wire.encode_datetime2(*parts, fsp=fsp)
            got, _ = wire.decode_datetime2(memoryview(enc), 0, fsp)
            scale = 10 ** (6 - fsp)
            want = parts[:6] + ((parts[6] // scale) * scale,)
            assert got == want

    def test_datetime2_zero_date_is_none(self):
        enc = wire.encode_datetime2(0, 0, 0, 0, 0, 0, 0, fsp=0)
        got, _ = wire.decode_datetime2(memoryview(enc), 0, 0)
        assert got is None

    def test_time2_negative(self):
        enc = wire.encode_time2(5, 30, 15, 500000, True, fsp=6)
        (neg, h, m, s, us), _ = wire.decode_time2(memoryview(enc), 0, 6)
        assert (neg, h, m, s, us) == (True, 5, 30, 15, 500000)

    def test_time2_positive_zero_fsp(self):
        enc = wire.encode_time2(838, 59, 59, 0, False, fsp=0)
        (neg, h, m, s, us), _ = wire.decode_time2(memoryview(enc), 0, 0)
        assert (neg, h, m, s, us) == (False, 838, 59, 59, 0)

    def test_date_roundtrip_and_zero(self):
        got, _ = wire.decode_date(memoryview(wire.encode_date(2023, 11, 14)), 0)
        assert got == (2023, 11, 14)
        got, _ = wire.decode_date(memoryview(wire.encode_date(0, 0, 0)), 0)
        assert got is None

    def test_datetime_old_roundtrip(self):
        enc = wire.encode_datetime_old(1999, 12, 31, 23, 59, 59)
        got, _ = wire.decode_datetime_old(memoryview(enc), 0)
        assert got == (1999, 12, 31, 23, 59, 59, 0)
