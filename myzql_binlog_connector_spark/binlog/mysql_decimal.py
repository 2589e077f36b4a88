"""MySQL NEWDECIMAL binary codec.

Packed base-10^9 groups, big-endian within each group, sign carried in the
MSB of byte 0 (1 = non-negative), negative values stored with every bit
inverted.  Semantics match the reference decoder
(/root/reference/src/decimal_parser.zig:20-270); golden vectors from its unit
tests (:303-396) pin byte-level compatibility, e.g. DECIMAL(21,4) 1340.4000 ==
0x800000000000053c0fa0.
"""

from __future__ import annotations

# bytes needed to store N leftover decimal digits (N in 0..9)
_DIG2BYTES = [0, 1, 1, 2, 2, 3, 3, 4, 4, 4]
_DIGITS_PER_GROUP = 9


def storage_size(precision: int, scale: int) -> int:
    intg = precision - scale
    intg_full, intg_rem = divmod(intg, _DIGITS_PER_GROUP)
    frac_full, frac_rem = divmod(scale, _DIGITS_PER_GROUP)
    return (
        intg_full * 4
        + _DIG2BYTES[intg_rem]
        + frac_full * 4
        + _DIG2BYTES[frac_rem]
    )


def _split_groups_int(digits: str, rem_first: bool) -> list[tuple[int, int]]:
    """Split a digit string into (value, n_digits) groups of 9; when
    rem_first, the partial group leads (integer part), else trails (fraction)."""
    groups: list[tuple[int, int]] = []
    if rem_first:
        rem = len(digits) % _DIGITS_PER_GROUP
        if rem:
            groups.append((int(digits[:rem]), rem))
            digits = digits[rem:]
        for i in range(0, len(digits), _DIGITS_PER_GROUP):
            groups.append((int(digits[i : i + _DIGITS_PER_GROUP]), _DIGITS_PER_GROUP))
    else:
        n_full = len(digits) // _DIGITS_PER_GROUP
        for i in range(0, n_full * _DIGITS_PER_GROUP, _DIGITS_PER_GROUP):
            groups.append((int(digits[i : i + _DIGITS_PER_GROUP]), _DIGITS_PER_GROUP))
        rem = len(digits) % _DIGITS_PER_GROUP
        if rem:
            groups.append((int(digits[n_full * _DIGITS_PER_GROUP :]), rem))
    return groups


def encode_decimal(value: str, precision: int, scale: int) -> bytes:
    """Encode a decimal string (e.g. ``-123.45``) into NEWDECIMAL bytes."""
    negative = value.startswith("-")
    if value and value[0] in "+-":
        value = value[1:]
    if "." in value:
        int_part, frac_part = value.split(".", 1)
    else:
        int_part, frac_part = value, ""
    int_digits = precision - scale
    int_part = int_part.lstrip("0").rjust(int_digits, "0") if int_digits else ""
    frac_part = frac_part[:scale].ljust(scale, "0")

    out = bytearray()
    for gval, ndig in _split_groups_int(int_part, rem_first=True):
        out += gval.to_bytes(_DIG2BYTES[ndig], "big")
    for gval, ndig in _split_groups_int(frac_part, rem_first=False):
        out += gval.to_bytes(_DIG2BYTES[ndig], "big")
    if not out:
        out = bytearray(1)
    out[0] ^= 0x80  # flip sign bit: 1 = non-negative
    if negative:
        for i in range(len(out)):
            out[i] ^= 0xFF
    expect = storage_size(precision, scale)
    if len(out) != expect:
        raise ValueError(f"encoded {len(out)}B, expected {expect}B for ({precision},{scale})")
    return bytes(out)


def decode_decimal(buf: bytes | memoryview, precision: int, scale: int) -> str:
    """Decode NEWDECIMAL bytes into an exact decimal string.

    Output formatting matches the reference (decimal_parser.zig:240-270):
    fraction padded to ``scale`` digits, no leading '+', ``0`` for zero-int
    part, e.g. ``1340.4000``, ``-123.45``, ``0.0001``.
    """
    size = storage_size(precision, scale)
    raw = bytearray(bytes(buf[:size]))
    negative = not (raw[0] & 0x80)
    if negative:
        for i in range(len(raw)):
            raw[i] ^= 0xFF
    raw[0] ^= 0x80

    intg = precision - scale
    pos = 0
    int_digits = ""
    intg_full, intg_rem = divmod(intg, _DIGITS_PER_GROUP)
    if intg_rem:
        nb = _DIG2BYTES[intg_rem]
        int_digits += str(int.from_bytes(raw[pos : pos + nb], "big")).rjust(intg_rem, "0")
        pos += nb
    for _ in range(intg_full):
        int_digits += str(int.from_bytes(raw[pos : pos + 4], "big")).rjust(9, "0")
        pos += 4

    frac_digits = ""
    frac_full, frac_rem = divmod(scale, _DIGITS_PER_GROUP)
    for _ in range(frac_full):
        frac_digits += str(int.from_bytes(raw[pos : pos + 4], "big")).rjust(9, "0")
        pos += 4
    if frac_rem:
        nb = _DIG2BYTES[frac_rem]
        frac_digits += str(int.from_bytes(raw[pos : pos + nb], "big")).rjust(frac_rem, "0")
        pos += nb

    int_str = int_digits.lstrip("0") or "0"
    out = int_str
    if scale:
        out += "." + frac_digits
    if negative and (int_str != "0" or (frac_digits and int(frac_digits) != 0)):
        out = "-" + out
    return out
