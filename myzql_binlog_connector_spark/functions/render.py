"""Reference-parity stdout rendering of decoded row events.

Matches the reference's human-readable output format
(/root/reference/src/output.zig:25-118 ``formatRowValue``, 154-203
``printRowEvent``) so a user tailing the stdout sink sees the same value
rendering they see today:

  NULL            for SQL NULL
  {d}             ints, YEAR, BIT, ENUM index, SET bitmask
  {d}             floats (no trailing ``.0`` — Zig's ``{d}``)
  "s"             strings and DECIMAL (both quoted, output.zig:93,115)
  bare            DATETIME/TIMESTAMP/TIME/JSON (unquoted)
  0xABCD...       blobs ≤256 bytes, full hex (output.zig:94-101)
  <blob N bytes: 0x{32B}...>   blobs >256 bytes (output.zig:102-113)
  D days HH:MM:SS[.ffffff]     durations with day overflow (output.zig:84-91)

Fractional seconds print ``.%06d`` only when non-zero — both the
reference's temporal formatters and this engine's decode strings already
agree on that, so DATETIME/TIMESTAMP pass through except for the
reference's date-only form (time components all zero → ``YYYY-MM-DD``,
output.zig:38-39), applied here at render time.

Known divergence, by design: this engine canonicalizes zero-dates
(``0000-00-00``) to NULL at decode (decoder.py:103, the Debezium-style
convention every downstream Spark type can hold); the reference's decoder
keeps the zero components and its stdout prints ``0000-00-00``.  Render
cannot reconstruct what decode erased, so zero-dates print NULL here.
"""

from __future__ import annotations

import json

from ..binlog.constants import ColumnType

# reference ColumnType.name() (event_parser.zig:143-170)
_TYPE_NAMES = {
    ColumnType.TINY: "TINYINT",
    ColumnType.SHORT: "SMALLINT",
    ColumnType.INT24: "UNKNOWN",  # reference has no INT24 arm → "UNKNOWN"
    ColumnType.LONG: "INT",
    ColumnType.LONGLONG: "BIGINT",
    ColumnType.FLOAT: "FLOAT",
    ColumnType.DOUBLE: "DOUBLE",
    ColumnType.DECIMAL: "DECIMAL",
    ColumnType.NEWDECIMAL: "DECIMAL",
    ColumnType.DATE: "DATE",
    ColumnType.TIME: "TIME",
    ColumnType.TIME2: "TIME",
    ColumnType.DATETIME: "DATETIME",
    ColumnType.DATETIME2: "DATETIME",
    ColumnType.TIMESTAMP: "TIMESTAMP",
    ColumnType.TIMESTAMP2: "TIMESTAMP",
    ColumnType.YEAR: "YEAR",
    ColumnType.VARCHAR: "VARCHAR",
    ColumnType.VAR_STRING: "VARCHAR",
    ColumnType.STRING: "CHAR",
    ColumnType.BLOB: "BLOB",
    ColumnType.TINY_BLOB: "TINYBLOB",
    ColumnType.MEDIUM_BLOB: "MEDIUMBLOB",
    ColumnType.LONG_BLOB: "LONGBLOB",
    ColumnType.JSON: "JSON",
    ColumnType.ENUM: "ENUM",
    ColumnType.SET: "SET",
    ColumnType.BIT: "BIT",
    ColumnType.GEOMETRY: "GEOMETRY",
}

_BLOBS = frozenset({
    ColumnType.BLOB, ColumnType.TINY_BLOB, ColumnType.MEDIUM_BLOB,
    ColumnType.LONG_BLOB, ColumnType.GEOMETRY,
})
_DATETIMES = frozenset({ColumnType.DATETIME, ColumnType.DATETIME2})
_TIMES = frozenset({ColumnType.TIME, ColumnType.TIME2})
_QUOTED = frozenset({
    ColumnType.VARCHAR, ColumnType.VAR_STRING, ColumnType.STRING,
    ColumnType.NEWDECIMAL, ColumnType.DECIMAL,
})


def type_name(code: int, meta: int = 0) -> str:
    if code == ColumnType.STRING and (meta >> 8) in (247, 248):
        # ENUM/SET hide behind STRING with the real type in meta
        return _TYPE_NAMES[ColumnType(meta >> 8)]
    return _TYPE_NAMES.get(code, "UNKNOWN")


def _fmt_float(v: float) -> str:
    # Zig's {d} prints the shortest decimal without a trailing ".0"
    s = repr(float(v))
    return s[:-2] if s.endswith(".0") else s


def _fmt_blob_hex(hex_str: str) -> str:
    """Envelope blobs arrive as '0x<hex>'; apply the reference's 256-byte
    full-hex / preview split (output.zig:94-113)."""
    digits = hex_str[2:]
    n = len(digits) // 2
    if n <= 256:
        return "0x" + digits
    return f"<blob {n} bytes: 0x{digits[:64]}...>"


def _fmt_duration(s: str) -> str:
    """'[-]HH:MM:SS[.ffffff]' (hours unbounded) → the reference's
    '[-][D days ]HH:MM:SS[.ffffff]' (output.zig:84-91)."""
    sign = ""
    if s.startswith("-"):
        sign, s = "-", s[1:]
    hms, _, frac = s.partition(".")
    h, m, sec = hms.split(":")
    days, hours = divmod(int(h), 24)
    out = sign
    if days > 0:
        out += f"{days} days "
    out += f"{hours:02d}:{m}:{sec}"
    if frac:
        out += f".{frac}"
    return out


def format_value(v, type_code: int, meta: int = 0) -> str:
    """One value, rendered exactly as the reference's ``formatRowValue``."""
    if v is None:
        return "NULL"
    code = type_code
    if code == ColumnType.STRING and (meta >> 8) in (247, 248):
        return str(int(v))  # ENUM index / SET bitmask print as ints
    if code in _BLOBS and isinstance(v, str) and v.startswith("0x"):
        return _fmt_blob_hex(v)
    if isinstance(v, (bytes, bytearray, memoryview)):
        return _fmt_blob_hex("0x" + bytes(v).hex())
    if code in (ColumnType.FLOAT, ColumnType.DOUBLE):
        return _fmt_float(v)
    if code in _DATETIMES and isinstance(v, str):
        # reference date-only form when the time part is all zero
        return v[:10] if v.endswith(" 00:00:00") else v
    if code in _TIMES and isinstance(v, str):
        return _fmt_duration(v)
    if code in _QUOTED:
        return f'"{v}"'
    if code == ColumnType.JSON:
        # JSON prints bare, already-formatted (output.zig:116)
        return v if isinstance(v, str) else json.dumps(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def render_row_event(row) -> list[str]:
    """One decoded envelope row → the reference's ``printRowEvent`` block
    (output.zig:154-203).  Fields the JSON envelope does not carry —
    event Flags and raw Data Size — are omitted; everything else matches
    line for line."""
    desc = json.loads(row["payload_schema"]) if row["payload_schema"] else []
    lines = [
        f"=== DML Event ({row['dml_type']}) ===",
        f"Table:     {row['database']}.{row['table_name']}",
        f"DML:       {row['dml_type']}",
        f"Timestamp: {row['timestamp']} (Unix timestamp)",
        f"Server ID: {row['server_id']}",
        f"Log Pos:   {row['log_pos']}",
        f"Columns:   {len(desc)}",
        "Column Types: " + ", ".join(type_name(c, m) for c, m, _n in desc),
    ]
    for label, key in (("Before", "before_values"), ("After", "after_values")):
        blob = row[key]
        if blob is None:
            continue
        vals = json.loads(blob)
        lines.append("")
        lines.append(f"{label} Values ({len(desc)} columns):")
        for i in range(len(desc)):
            code, meta, _nullable = desc[i]
            lines.append(
                f"  [{i}] " + format_value(vals.get(f"c{i}"), code, meta)
            )
    lines.append("==========================")
    lines.append("")
    return lines


def render_envelope(env_df, limit: int = 50) -> str:
    """Bounded stdout rendering of a decoded envelope DataFrame — the S5
    stdout sink body.  ``limit`` caps the driver-side collect (debug sink,
    never a data path)."""
    rows = env_df.limit(limit).collect()
    out: list[str] = []
    for r in rows:
        out.extend(render_row_event(r.asDict()))
    return "\n".join(out)
