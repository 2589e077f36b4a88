"""Binlog wire-format constants.

Event-type and column-type code tables for the MySQL binary-log format,
matching the subset processed by the reference connector
(/root/reference/src/event_parser.zig:40-79 for event codes,
:870-1039 for column-type dispatch).  All values are public MySQL
protocol constants.
"""

from __future__ import annotations

from enum import IntEnum


class EventType(IntEnum):
    UNKNOWN = 0
    QUERY = 2
    STOP = 3
    ROTATE = 4
    FORMAT_DESCRIPTION = 15
    XID = 16
    TABLE_MAP = 19
    WRITE_ROWS_V0 = 23
    UPDATE_ROWS_V0 = 24
    DELETE_ROWS_V0 = 25
    WRITE_ROWS_V1 = 30
    UPDATE_ROWS_V1 = 31
    DELETE_ROWS_V1 = 32
    GTID = 33
    ANONYMOUS_GTID = 34
    PREVIOUS_GTIDS = 35
    WRITE_ROWS_V2 = 30  # alias used by MySQL 5.6+ numbering below
    # MySQL 5.6+ v2 codes:
    # WRITE_ROWS_EVENT = 30, UPDATE_ROWS_EVENT = 31, DELETE_ROWS_EVENT = 32
    PARTIAL_UPDATE_ROWS = 39


# The reference processes exactly these (event_parser.zig:1156-1171).
PROCESSED_EVENT_TYPES = frozenset(
    {4, 15, 19, 23, 24, 25, 30, 31, 32, 39}
)

ROWS_EVENT_TYPES = frozenset({23, 24, 25, 30, 31, 32, 39})
WRITE_ROWS_TYPES = frozenset({23, 30})
UPDATE_ROWS_TYPES = frozenset({24, 31, 39})
DELETE_ROWS_TYPES = frozenset({25, 32})
# v2 rows events carry a 2-byte extra-data length after (table_id, flags)
ROWS_V2_TYPES = frozenset({30, 31, 32, 39})


class ColumnType(IntEnum):
    """MySQL column type codes as they appear in TABLE_MAP metadata."""

    DECIMAL = 0
    TINY = 1
    SHORT = 2
    LONG = 3
    FLOAT = 4
    DOUBLE = 5
    NULL = 6
    TIMESTAMP = 7
    LONGLONG = 8
    INT24 = 9
    DATE = 10
    TIME = 11
    DATETIME = 12
    YEAR = 13
    VARCHAR = 15
    BIT = 16
    TIMESTAMP2 = 17
    DATETIME2 = 18
    TIME2 = 19
    JSON = 245
    NEWDECIMAL = 246
    ENUM = 247
    SET = 248
    TINY_BLOB = 249
    MEDIUM_BLOB = 250
    LONG_BLOB = 251
    BLOB = 252
    VAR_STRING = 253
    STRING = 254
    GEOMETRY = 255


BLOB_TYPES = frozenset(
    {
        ColumnType.TINY_BLOB,
        ColumnType.MEDIUM_BLOB,
        ColumnType.LONG_BLOB,
        ColumnType.BLOB,
        ColumnType.GEOMETRY,
    }
)

# 19-byte event header layout (reference README.md:512-523):
# timestamp u32 LE | type u8 | server_id u32 LE | event_size u32 LE |
# log_pos u32 LE | flags u16 LE
HEADER_LEN = 19
CRC_LEN = 4
# First 4 bytes of every binlog file: magic 0xfe 'b' 'i' 'n'. Segment blobs in
# our synthetic store carry per-event packets instead (OK byte framing), so the
# magic only appears when we write whole-file images.
BINLOG_MAGIC = b"\xfebin"

DML_INSERT = "INSERT"
DML_UPDATE = "UPDATE"
DML_DELETE = "DELETE"
