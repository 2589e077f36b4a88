"""Per-schema code-generated row-image parsers (the decode hot path).

The generic decoder (``decoder.parse_rows_event``) dispatches per value
through per-column closures — ~6.5 µs/row of pure interpreter overhead on
the transcripts schema.  This module removes that overhead the same way the
reference removes it with comptime specialization
(/root/reference/src/event_parser.zig:870-1039 — a type switch the compiler
flattens per call site): for each (schema, present-bitmap, event-kind) we
*generate Python source* with every column's decode fully inlined — no
per-value function calls, no per-row dicts — and ``exec`` it once.  The
compiled parsers are cached process-wide, so long-lived executor workers
compile each TABLE_MAP variant exactly once.

Two output modes:

``env``    appends the reference's positional-JSON envelope strings
           (``{"c0": ..., "c1": ...}``, row_json_serializer.zig:54-89)
           directly to before/after output lists.
``typed``  appends python values straight into per-column Arrow builder
           lists (the zero-shuffle typed fast path), including the
           ``_deleted`` flag; UPDATE events whose key columns change emit a
           tombstone row for the before-image key followed by the upsert —
           without this, a PK-changing UPDATE would leave the old-key row
           live forever (reference applies full before/after images, so a
           downstream consumer sees both keys; our merge needs the explicit
           tombstone).

Correctness sits on the generic path: equality with
``decoder.parse_rows_event`` over the full type matrix is pinned by
``tests/test_rowcodec.py``.
"""

from __future__ import annotations

import struct

from .constants import (
    BLOB_TYPES,
    ColumnType,
    DML_DELETE,
    DML_INSERT,
    DML_UPDATE,
)
from .mysql_decimal import decode_decimal, storage_size
from .mysql_json import decode_json

# value-decode output python type per column type (static knowledge used to
# pick coercions at generation time, not per row)
_INT_OUT = frozenset(
    {
        ColumnType.TINY,
        ColumnType.SHORT,
        ColumnType.INT24,
        ColumnType.LONG,
        ColumnType.LONGLONG,
        ColumnType.YEAR,
        ColumnType.BIT,
    }
)
_FLOAT_OUT = frozenset({ColumnType.FLOAT, ColumnType.DOUBLE})

_TS2_FRAC_BYTES = (0, 1, 1, 2, 2, 3, 3)


def _out_kind(spec) -> str:
    """'i' int, 'f' float, 'b' bytes, 's' str — after inline decode."""
    t = spec.type_code
    if t in _INT_OUT:
        return "i"
    if t in _FLOAT_OUT:
        return "f"
    if t in BLOB_TYPES:
        return "b"
    if t == ColumnType.STRING:
        real = spec.meta >> 8
        return "i" if real in (ColumnType.ENUM, ColumnType.SET) else "s"
    return "s"


def _emit_decode(lines, ind, i, spec, env):
    """Append source lines decoding column ``i`` into ``v{i}`` and advancing
    ``pos``.  Falls back to a per-column closure for cold types."""
    t = spec.type_code
    meta = spec.meta
    a = lines.append
    if t in (ColumnType.VARCHAR, ColumnType.VAR_STRING):
        if meta < 256:
            a(f"{ind}_l = buf[pos]; pos += 1; _e = pos + _l")
        else:
            a(f"{ind}_l = buf[pos] | (buf[pos + 1] << 8); pos += 2; _e = pos + _l")
        a(f"{ind}v{i} = str(buf[pos:_e], 'utf-8', 'replace'); pos = _e")
    elif t == ColumnType.LONG:
        env.setdefault("I4", struct.Struct("<i").unpack_from)
        a(f"{ind}v{i} = I4(buf, pos)[0]; pos += 4")
    elif t == ColumnType.LONGLONG:
        env.setdefault("Q8", struct.Struct("<q").unpack_from)
        a(f"{ind}v{i} = Q8(buf, pos)[0]; pos += 8")
    elif t == ColumnType.SHORT:
        env.setdefault("H2", struct.Struct("<h").unpack_from)
        a(f"{ind}v{i} = H2(buf, pos)[0]; pos += 2")
    elif t == ColumnType.TINY:
        a(f"{ind}v{i} = buf[pos] - 256 if buf[pos] > 127 else buf[pos]; pos += 1")
    elif t == ColumnType.INT24:
        a(f"{ind}v{i} = ifb(buf[pos:pos + 3], 'little'); pos += 3")
        a(f"{ind}if v{i} & 0x800000: v{i} -= 0x1000000")
    elif t == ColumnType.FLOAT:
        env.setdefault("F4", struct.Struct("<f").unpack_from)
        a(f"{ind}v{i} = F4(buf, pos)[0]; pos += 4")
    elif t == ColumnType.DOUBLE:
        env.setdefault("D8", struct.Struct("<d").unpack_from)
        a(f"{ind}v{i} = D8(buf, pos)[0]; pos += 8")
    elif t == ColumnType.YEAR:
        a(f"{ind}v{i} = 1900 + buf[pos]; pos += 1")
    elif t == ColumnType.TIMESTAMP:
        env.setdefault("U4", struct.Struct("<I").unpack_from)
        a(f"{ind}v{i} = fts(U4(buf, pos)[0], 0); pos += 4")
    elif t == ColumnType.TIMESTAMP2:
        env.setdefault("BI4", struct.Struct(">I").unpack_from)
        nb = _TS2_FRAC_BYTES[meta]
        if nb:
            # 2-digit units per storage byte (see wire._FRAC_UNIT)
            scale = (0, 10_000, 10_000, 100, 100, 1, 1)[meta]
            mul = "" if scale == 1 else f" * {scale}"
            a(
                f"{ind}v{i} = fts(BI4(buf, pos)[0],"
                f" ifb(buf[pos + 4:pos + {4 + nb}], 'big'){mul}); pos += {4 + nb}"
            )
        else:
            a(f"{ind}v{i} = fts(BI4(buf, pos)[0], 0); pos += 4")
    elif t in BLOB_TYPES:
        nb = meta or 4
        if nb == 1:
            a(f"{ind}_l = buf[pos]; pos += 1; _e = pos + _l")
        else:
            a(f"{ind}_l = ifb(buf[pos:pos + {nb}], 'little'); pos += {nb}; _e = pos + _l")
        a(f"{ind}v{i} = bytes(buf[pos:_e]); pos = _e")
    else:
        # cold types (JSON, DECIMAL, DATE/TIME/DATETIME, STRING/ENUM/SET,
        # BIT) go through the generic per-column closure
        env[f"dv{i}"] = _cold_decoder(spec)
        a(f"{ind}v{i}, pos = dv{i}(buf, pos)")


def _cold_decoder(spec):
    from .decoder import decode_value

    def d(buf, pos, _spec=spec):
        return decode_value(_spec, buf, pos)

    return d


def _emit_image(lines, ind, schema, present, env, hex_bytes=True):
    """Null-bitmap read + per-column decode for one row image.  Columns not
    in ``present`` never get a ``v{i}`` binding — emitters must treat them
    as None.

    Generates TWO decode bodies: a straight-line one for the common
    all-columns-present case (nm == 0 — no per-column bit tests), and the
    bit-tested general one.  The null bitmap is per ROW, so this is a
    runtime branch, not a cache key."""
    nbn = (len(present) + 7) // 8
    if nbn == 1:
        lines.append(f"{ind}nm = buf[pos]; pos += 1")
    else:
        lines.append(f"{ind}nm = ifb(buf[pos:pos + {nbn}], 'little'); pos += {nbn}")
    if not present:
        # empty present bitmap (e.g. minimal before-image): nothing to
        # decode after the null-bitmap read — emitting the two-branch form
        # would produce empty suites (SyntaxError at compile time)
        return
    lines.append(f"{ind}if nm == 0:")
    for i in present:
        spec = schema.columns[i]
        _emit_decode(lines, ind + "    ", i, spec, env)
        if hex_bytes and _out_kind(spec) == "b":
            lines.append(f"{ind}    v{i} = '0x' + v{i}.hex()")
    lines.append(f"{ind}else:")
    for j, i in enumerate(present):
        spec = schema.columns[i]
        test = "nm & 1" if j == 0 else f"nm >> {j} & 1"
        lines.append(f"{ind}    if {test}:")
        lines.append(f"{ind}        v{i} = None")
        lines.append(f"{ind}    else:")
        _emit_decode(lines, ind + "        ", i, spec, env)
        if hex_bytes and _out_kind(spec) == "b":
            lines.append(f"{ind}        v{i} = '0x' + v{i}.hex()")


def _env_literal(n_cols, present) -> str:
    pset = set(present)
    parts = [f'"c{i}": v{i}' if i in pset else f'"c{i}": None' for i in range(n_cols)]
    return "{" + ", ".join(parts) + "}"


def _compile(src: str, env: dict, name: str):
    code = compile(src, f"<rowcodec:{name}>", "exec")
    ns = dict(env)
    exec(code, ns)
    return ns[name]


_CACHE: dict = {}


def get_env_parser(schema, desc_key: str, present1, present2, dml: str):
    """Parser for one ROWS event body (after the prelude): appends the
    positional-JSON image strings via ``b_app``/``a_app``; returns the row
    count.  Signature: ``P(buf, pos, end, b_app, a_app) -> k``."""
    key = ("env", desc_key, bytes(present1), bytes(present2), dml)
    fn = _CACHE.get(key)
    if fn is not None:
        return fn

    from .decoder import _fmt_ts, _dumps

    env = {"ifb": int.from_bytes, "fts": _fmt_ts, "J": _dumps}
    n_cols = len(schema.columns)
    L = ["def P(buf, pos, end, b_app, a_app):", "    k = 0", "    while pos < end:"]
    ind = "        "
    if dml in (DML_UPDATE, DML_DELETE):
        _emit_image(L, ind, schema, present1, env)
        L.append(f"{ind}b_app(J({_env_literal(n_cols, present1)}))")
    if dml in (DML_UPDATE, DML_INSERT):
        p = present2 if dml == DML_UPDATE else present1
        _emit_image(L, ind, schema, p, env)
        L.append(f"{ind}a_app(J({_env_literal(n_cols, p)}))")
    # truncated/corrupt bodies must not decode silently as garbage (Python
    # slices clamp): a row that read past the body is a structural error
    L.append(f"{ind}if pos > end: raise ValueError('row image overran event body')")
    L.append(f"{ind}k += 1")
    L.append("    return k")
    fn = _compile("\n".join(L), env, "P")
    _CACHE[key] = fn
    return fn


def _typed_emit(lines, ind, schema, present, kinds, n_payload, value_for):
    """Append one output row: ``_a{i}(coerced v{i})`` per payload position.
    ``value_for(i)`` returns the source expression for position i or None
    when the position must emit None."""
    n_cols = len(schema.columns)
    pset = set(present)
    for i in range(n_payload):
        expr = value_for(i) if (i < n_cols and i in pset) else None
        if expr is None:
            lines.append(f"{ind}_a{i}(None)")
            continue
        out = _out_kind(schema.columns[i])
        kind = kinds[i] if i < len(kinds) else "s"
        if kind == "s" and out in ("i", "f"):
            lines.append(f"{ind}_a{i}(None if {expr} is None else str({expr}))")
        else:
            # out 'b' was hex-rendered to str at decode time; 'i' into
            # float64 builders is fine (pyarrow upcasts)
            lines.append(f"{ind}_a{i}({expr})")


def get_typed_parser(
    schema,
    desc_key: str,
    present1,
    present2,
    dml: str,
    kinds: tuple,
    key_positions: tuple,
    n_payload: int,
):
    """Typed-path parser: appends payload values + the ``_deleted`` flag.
    Signature: ``P(buf, pos, end, apps, d_app) -> k`` where ``apps`` is the
    tuple of per-payload-column ``list.append`` bound methods.

    DELETE rows materialize only the key positions (before image), matching
    ``TranscriptsApplier.typed_changes``.  UPDATE rows whose before/after
    keys differ emit (tombstone@old_key, upsert@new_key) — 2 output rows.
    """
    key = (
        "typed",
        desc_key,
        bytes(present1),
        bytes(present2),
        dml,
        tuple(kinds),
        tuple(key_positions),
        n_payload,
    )
    fn = _CACHE.get(key)
    if fn is not None:
        return fn

    from .decoder import _fmt_ts

    env = {"ifb": int.from_bytes, "fts": _fmt_ts}
    keyset = set(key_positions)
    L = ["def P(buf, pos, end, apps, d_app):"]
    for i in range(n_payload):
        L.append(f"    _a{i} = apps[{i}]")
    L += ["    k = 0", "    while pos < end:"]
    ind = "        "

    if dml == DML_INSERT:
        _emit_image(L, ind, schema, present1, env)
        _typed_emit(L, ind, schema, present1, kinds, n_payload, lambda i: f"v{i}")
        L.append(f"{ind}d_app(False)")
        L.append(f"{ind}k += 1")
    elif dml == DML_DELETE:
        _emit_image(L, ind, schema, present1, env)
        _typed_emit(
            L, ind, schema, present1, kinds, n_payload,
            lambda i: f"v{i}" if i in keyset else None,
        )
        L.append(f"{ind}d_app(True)")
        L.append(f"{ind}k += 1")
    else:  # UPDATE: before image (keys only) then after image
        _emit_image(L, ind, schema, present1, env)
        kp = [i for i in key_positions if i < len(schema.columns) and i in set(present1)]
        for i in kp:
            L.append(f"{ind}_bk{i} = v{i}")
        _emit_image(L, ind, schema, present2, env)
        if kp:
            cond = " or ".join(f"_bk{i} != v{i}" for i in kp)
            L.append(f"{ind}if {cond}:")
            _typed_emit(
                L, ind + "    ", schema, present1, kinds, n_payload,
                lambda i: f"_bk{i}" if i in set(kp) else None,
            )
            L.append(f"{ind}    d_app(True)")
            L.append(f"{ind}    k += 1")
        _typed_emit(L, ind, schema, present2, kinds, n_payload, lambda i: f"v{i}")
        L.append(f"{ind}d_app(False)")
        L.append(f"{ind}k += 1")
    # same structural check as the env parser: clamped slices must not
    # turn a truncated body into silent garbage rows
    L.append(f"{ind}if pos > end: raise ValueError('row image overran event body')")
    L.append("    return k")
    fn = _compile("\n".join(L), env, "P")
    _CACHE[key] = fn
    return fn
