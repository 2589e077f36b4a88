"""Stdout value-format parity with the reference renderer.

Golden strings below are hand-derived from /root/reference/src/output.zig
``formatRowValue`` (25-118) and ``printRowEvent`` (154-203): quoted
strings/decimals, bare temporals with ``.%06d`` only when non-zero, the
date-only DATETIME form, duration day-splitting, and the 256-byte blob
hex/preview rule.
"""

from __future__ import annotations

import json

from myzql_binlog_connector_spark.binlog.constants import ColumnType
from myzql_binlog_connector_spark.functions.render import (
    format_value,
    render_row_event,
    type_name,
)

from test_decode_matrix import ROW, TORTURE, _decode_rows  # noqa: F401
from myzql_binlog_connector_spark.binlog.encoder import EventWriter


class TestFormatValue:
    def test_null(self):
        assert format_value(None, ColumnType.LONG) == "NULL"

    def test_ints(self):
        assert format_value(-128, ColumnType.TINY) == "-128"
        assert format_value(-(1 << 62), ColumnType.LONGLONG) == str(-(1 << 62))
        assert format_value(2024, ColumnType.YEAR) == "2024"
        assert format_value(341, ColumnType.BIT) == "341"

    def test_floats_zig_d_format(self):
        # Zig {d}: shortest decimal, no trailing .0
        assert format_value(1.5, ColumnType.FLOAT) == "1.5"
        assert format_value(3.0, ColumnType.DOUBLE) == "3"
        assert format_value(3.141592653589793, ColumnType.DOUBLE) == "3.141592653589793"

    def test_strings_and_decimals_quoted(self):
        # output.zig:93,115 — both print \"{s}\"
        assert format_value("abc", ColumnType.VARCHAR) == '"abc"'
        assert format_value("char-val", ColumnType.STRING) == '"char-val"'
        assert format_value("1340.4000", ColumnType.NEWDECIMAL) == '"1340.4000"'

    def test_enum_set_behind_string_meta(self):
        enum_meta = (ColumnType.ENUM << 8) | 1
        set_meta = (ColumnType.SET << 8) | 2
        assert format_value(3, ColumnType.STRING, enum_meta) == "3"
        assert format_value(0b1010, ColumnType.STRING, set_meta) == "10"
        assert type_name(ColumnType.STRING, enum_meta) == "ENUM"
        assert type_name(ColumnType.STRING, set_meta) == "SET"

    def test_blob_small_full_hex(self):
        # ≤256 bytes: full hex with 0x prefix (output.zig:97-101)
        assert format_value("0x0001feff", ColumnType.BLOB) == "0x0001feff"
        v = bytes(range(256))
        assert format_value("0x" + v.hex(), ColumnType.BLOB) == "0x" + v.hex()

    def test_blob_large_preview(self):
        # >256 bytes: "<blob N bytes: 0x{first 32B}...>" (output.zig:102-113)
        v = bytes(i & 0xFF for i in range(300))
        got = format_value("0x" + v.hex(), ColumnType.LONG_BLOB)
        assert got == f"<blob 300 bytes: 0x{v[:32].hex()}...>"

    def test_datetime_fraction_suppression(self):
        # .%06d only when non-zero — both sides agree; pass-through
        assert (
            format_value("2024-02-29 23:59:58.123456", ColumnType.DATETIME2)
            == "2024-02-29 23:59:58.123456"
        )
        assert (
            format_value("1999-12-31 23:59:59", ColumnType.DATETIME)
            == "1999-12-31 23:59:59"
        )

    def test_datetime_date_only_form(self):
        # time part all zero → date only (output.zig:38-39); DATETIME only
        assert format_value("2023-11-14 00:00:00", ColumnType.DATETIME2) == "2023-11-14"
        # TIMESTAMP always prints the time part (output.zig:74-82)
        assert (
            format_value("2023-11-14 00:00:00", ColumnType.TIMESTAMP2)
            == "2023-11-14 00:00:00"
        )

    def test_zero_date_is_null_documented_divergence(self):
        # this engine canonicalizes 0000-00-00 to NULL at decode
        # (decoder.py:103); render cannot resurrect it
        assert format_value(None, ColumnType.DATETIME2) == "NULL"

    def test_duration_forms(self):
        assert format_value("13:45:30", ColumnType.TIME) == "13:45:30"
        assert format_value("-05:30:15.250000", ColumnType.TIME2) == "-05:30:15.250000"
        # day overflow splits: 26h → "1 days 02:..." (output.zig:86)
        assert format_value("26:30:05", ColumnType.TIME2) == "1 days 02:30:05"
        assert (
            format_value("-50:00:01.500000", ColumnType.TIME2)
            == "-2 days 02:00:01.500000"
        )

    def test_json_bare(self):
        assert format_value('{"k": 1}', ColumnType.JSON) == '{"k": 1}'
        assert format_value({"k": [1, None]}, ColumnType.JSON) == '{"k": [1, null]}'


class TestRenderRowEventGolden:
    def test_torture_insert_block(self):
        """Full printRowEvent block over the 25-column torture event."""
        w = EventWriter(server_id=77)
        w.format_description()
        w.table_map(9, TORTURE)
        w.write_rows(9, TORTURE, [ROW])
        rec = _decode_rows(w, 1)[0]
        lines = render_row_event(rec)

        assert lines[0] == "=== DML Event (INSERT) ==="
        assert lines[1] == "Table:     t.torture"
        assert lines[2] == "DML:       INSERT"
        assert lines[3].startswith("Timestamp: ") and "(Unix timestamp)" in lines[3]
        assert lines[4] == "Server ID: 77"
        assert lines[5].startswith("Log Pos:   ")
        assert lines[6] == "Columns:   25"
        assert lines[7] == (
            "Column Types: TINYINT, SMALLINT, UNKNOWN, INT, BIGINT, FLOAT, "
            "DOUBLE, YEAR, DATE, DATETIME, TIMESTAMP, TIME, VARCHAR, VARCHAR, "
            "CHAR, ENUM, SET, BLOB, BIT, DECIMAL, DECIMAL, JSON, DATETIME, "
            "TIMESTAMP, TIME"
        )
        assert lines[8] == ""
        assert lines[9] == "After Values (25 columns):"
        values = lines[10:35]
        assert values == [
            "  [0] -128",
            "  [1] -32768",
            f"  [2] {-(1 << 23)}",
            "  [3] -2147483648",
            f"  [4] {-(1 << 62)}",
            "  [5] 1.5",
            "  [6] 3.141592653589793",
            "  [7] 2024",
            "  [8] 2023-11-14",
            "  [9] 2024-02-29 23:59:58.123456",
            "  [10] 2023-11-14 22:13:20.123000",
            "  [11] -05:30:15.250000",
            '  [12] "short-varchar"',
            f'  [13] "{"x" * 300}"',
            '  [14] "char-val"',
            "  [15] 3",
            "  [16] 10",
            "  [17] 0x0001feff",
            "  [18] 341",
            '  [19] "1340.4000"',
            '  [20] "12345678901234567890123456789012345.'
            '123456789012345678901234567890"',
            '  [21] {"k": [1, "two", null]}',
            "  [22] 1999-12-31 23:59:59",
            "  [23] 2023-11-14 22:13:20",
            "  [24] 13:45:30",
        ]
        assert lines[-2] == "=========================="

    def test_update_has_before_and_after(self):
        w = EventWriter(server_id=1)
        w.format_description()
        w.table_map(9, TORTURE)
        before = ROW
        after = ROW[:12] + ("updated!",) + ROW[13:]
        w.update_rows(9, TORTURE, [(before, after)])
        rec = _decode_rows(w, 1)[0]
        lines = render_row_event(rec)
        assert lines[0] == "=== DML Event (UPDATE) ==="
        assert "Before Values (25 columns):" in lines
        assert "After Values (25 columns):" in lines
        assert '  [12] "short-varchar"' in lines
        assert '  [12] "updated!"' in lines

    def test_delete_only_before(self):
        w = EventWriter(server_id=1)
        w.format_description()
        w.table_map(9, TORTURE)
        w.delete_rows(9, TORTURE, [ROW])
        rec = _decode_rows(w, 1)[0]
        lines = render_row_event(rec)
        assert lines[0] == "=== DML Event (DELETE) ==="
        assert "Before Values (25 columns):" in lines
        assert "After Values (25 columns):" not in lines

    def test_null_row_renders_nulls(self):
        w = EventWriter(server_id=1)
        w.format_description()
        w.table_map(9, TORTURE)
        w.write_rows(9, TORTURE, [tuple(None for _ in TORTURE.columns)])
        rec = _decode_rows(w, 1)[0]
        lines = render_row_event(rec)
        assert "  [0] NULL" in lines and "  [24] NULL" in lines


class TestRenderEnvelopeSpark:
    def test_stdout_sink_shape(self, spark):
        """render_envelope over a decoded envelope DataFrame (the S5 sink
        body): bounded collect, one block per change row."""
        from myzql_binlog_connector_spark.functions.decode import decode_changes
        from myzql_binlog_connector_spark.functions.render import render_envelope
        from myzql_binlog_connector_spark.harness import _events_df_from_writer

        w = EventWriter(server_id=1)
        w.format_description()
        w.table_map(9, TORTURE)
        w.write_rows(9, TORTURE, [ROW, ROW])
        env = decode_changes(_events_df_from_writer(spark, [w]))
        text = render_envelope(env, limit=10)
        assert text.count("=== DML Event (INSERT) ===") == 2
        assert '"short-varchar"' in text and "0x0001feff" in text
