"""GTID sets: the ``Executed_Gtid_Set`` surface (resume + dedup contract).

Covers the public MySQL formats:

* text form — ``uuid:1-5:7,uuid2:1-3`` (SHOW MASTER STATUS /
  ``COM_BINLOG_DUMP_GTID`` request payloads);
* binary form — the PREVIOUS_GTIDS_LOG_EVENT (type 35) payload:
  ``n_sids u64 LE`` then per sid ``16B uuid + n_intervals u64 LE +
  (start u64, end u64)`` with **end exclusive** on the wire, inclusive in
  text.

The engine consumes these for GTID-based resume (docs/CAPTURE.md §4): a
capture process restarting with ``COM_BINLOG_DUMP_GTID`` sends the set of
transactions already in the store; the applier side can equivalently use
``contains`` to drop redelivered transactions when positions are not
comparable across a failover (new primary = new binlog file numbering,
but GTIDs survive).

Note: the reference's event enum labels codes 36-38 as the GTID events;
the public MySQL codes are 33-35 (used here).
"""

from __future__ import annotations

import uuid as _uuid
from dataclasses import dataclass, field


def _normalize(intervals: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Sort + coalesce inclusive intervals."""
    out: list[tuple[int, int]] = []
    for s, e in sorted(intervals):
        if s > e:
            raise ValueError(f"bad GTID interval {s}-{e}")
        if out and s <= out[-1][1] + 1:
            out[-1] = (out[-1][0], max(out[-1][1], e))
        else:
            out.append((s, e))
    return out


@dataclass
class GtidSet:
    """Mapping of source-server UUID → inclusive gno intervals."""

    sids: dict[str, list[tuple[int, int]]] = field(default_factory=dict)

    # -- construction -----------------------------------------------------

    @classmethod
    def from_text(cls, text: str) -> "GtidSet":
        sids: dict[str, list[tuple[int, int]]] = {}
        text = text.strip()
        if not text:
            return cls(sids)
        for part in text.replace("\n", "").split(","):
            bits = part.strip().split(":")
            sid = str(_uuid.UUID(bits[0]))
            ivals = sids.setdefault(sid, [])
            for rng in bits[1:]:
                if "-" in rng:
                    a, b = rng.split("-")
                    ivals.append((int(a), int(b)))
                else:
                    ivals.append((int(rng), int(rng)))
        return cls({sid: _normalize(iv) for sid, iv in sids.items()})

    @classmethod
    def from_payload(cls, payload: bytes | memoryview) -> "GtidSet":
        """Decode a PREVIOUS_GTIDS_LOG_EVENT payload (end-exclusive wire
        intervals → inclusive)."""
        mv = memoryview(payload)
        n_sids = int.from_bytes(mv[0:8], "little")
        pos = 8
        sids: dict[str, list[tuple[int, int]]] = {}
        for _ in range(n_sids):
            sid = str(_uuid.UUID(bytes=bytes(mv[pos : pos + 16])))
            pos += 16
            n_iv = int.from_bytes(mv[pos : pos + 8], "little")
            pos += 8
            ivals = []
            for _ in range(n_iv):
                start = int.from_bytes(mv[pos : pos + 8], "little")
                end = int.from_bytes(mv[pos + 8 : pos + 16], "little")
                pos += 16
                ivals.append((start, end - 1))
            sids[sid] = _normalize(sids.get(sid, []) + ivals)
        return cls(sids)

    def to_payload(self) -> bytes:
        out = bytearray(len(self.sids).to_bytes(8, "little"))
        for sid in sorted(self.sids):
            out += _uuid.UUID(sid).bytes
            ivals = self.sids[sid]
            out += len(ivals).to_bytes(8, "little")
            for s, e in ivals:
                out += s.to_bytes(8, "little") + (e + 1).to_bytes(8, "little")
        return bytes(out)

    # -- set algebra --------------------------------------------------------

    def contains(self, sid: str, gno: int) -> bool:
        sid = str(_uuid.UUID(sid))
        for s, e in self.sids.get(sid, []):
            if s <= gno <= e:
                return True
        return False

    def add(self, sid: str, gno: int) -> None:
        sid = str(_uuid.UUID(sid))
        self.sids[sid] = _normalize(self.sids.get(sid, []) + [(gno, gno)])

    def union(self, other: "GtidSet") -> "GtidSet":
        sids = {sid: list(iv) for sid, iv in self.sids.items()}
        for sid, iv in other.sids.items():
            sids[sid] = _normalize(sids.get(sid, []) + list(iv))
        return GtidSet(sids)

    def subtract(self, other: "GtidSet") -> "GtidSet":
        """Transactions in self not covered by other (the resume gap)."""
        out: dict[str, list[tuple[int, int]]] = {}
        for sid, ivals in self.sids.items():
            rem = list(ivals)
            for os_, oe in other.sids.get(sid, []):
                nxt: list[tuple[int, int]] = []
                for s, e in rem:
                    if oe < s or os_ > e:
                        nxt.append((s, e))
                        continue
                    if s < os_:
                        nxt.append((s, os_ - 1))
                    if e > oe:
                        nxt.append((oe + 1, e))
                rem = nxt
            if rem:
                out[sid] = _normalize(rem)
        return GtidSet(out)

    def __str__(self) -> str:
        parts = []
        for sid in sorted(self.sids):
            rngs = ":".join(
                f"{s}-{e}" if s != e else f"{s}" for s, e in self.sids[sid]
            )
            parts.append(f"{sid}:{rngs}")
        return ",".join(parts)

    def __eq__(self, other) -> bool:
        return isinstance(other, GtidSet) and self.sids == other.sids
