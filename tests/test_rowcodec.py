"""Parity tests: code-generated parsers (binlog/rowcodec.py) vs the generic
per-value decoder over the full type matrix, nulls, updates, and schema
evolution.  The generic path is the reference-shaped implementation
(event_parser.zig:870-1039); the generated path must be bit-identical."""

from __future__ import annotations

import json

from myzql_binlog_connector_spark.binlog.decoder import (
    BinlogSession,
    EnvelopeBatch,
)
from myzql_binlog_connector_spark.binlog.encoder import EventWriter, TRANSCRIPTS_SCHEMA
from myzql_binlog_connector_spark.genlog import generate_ops, encode_stream

from test_decode_matrix import TORTURE, ROW


def _envelope_dicts(packets):
    sess = BinlogSession()
    out = []
    for fs, g, es, pkt in packets:
        out.extend(sess.process_packet(pkt, file_seq=fs, gtid=g, event_seq=es))
    return out


def _envelope_columnar(packets):
    sess = BinlogSession()
    out = EnvelopeBatch()
    for fs, g, es, pkt in packets:
        sess.process_packet_columnar(pkt, fs, g, es, out)
    return out


def _assert_env_parity(packets):
    olds = _envelope_dicts(packets)
    out = _envelope_columnar(packets)
    assert len(olds) == len(out)
    cols = out.columns()
    for ci, name in enumerate(EnvelopeBatch.__slots__):
        for r, old in enumerate(olds):
            assert old[name] == cols[ci][r], (name, r, old[name], cols[ci][r])


def _torture_packets(rows_builder):
    w = EventWriter()
    w.format_description()
    w.table_map(9, TORTURE)
    rows_builder(w)
    return [(1, i + 1, i + 1, pkt) for i, (_, pkt) in enumerate(w.events)]


class TestEnvelopeParity:
    def test_torture_write(self):
        _assert_env_parity(_torture_packets(lambda w: w.write_rows(9, TORTURE, [ROW])))

    def test_torture_all_nulls(self):
        _assert_env_parity(
            _torture_packets(
                lambda w: w.write_rows(9, TORTURE, [tuple(None for _ in ROW)])
            )
        )

    def test_torture_staggered_nulls_multirow(self):
        rows = [
            tuple(v if (i + k) % 3 else None for i, v in enumerate(ROW))
            for k in range(7)
        ]
        _assert_env_parity(_torture_packets(lambda w: w.write_rows(9, TORTURE, rows)))

    def test_torture_update_delete(self):
        def build(w):
            after = ROW[:12] + ("changed",) + ROW[13:]
            w.update_rows(9, TORTURE, [(ROW, after)])
            w.delete_rows(9, TORTURE, [ROW])

        _assert_env_parity(_torture_packets(build))

    def test_generated_stream_with_evolution(self):
        ops = generate_ops(seed=7, n_convs=60)
        stream = encode_stream(ops, n_segments=3, seed=7, evolve_at=0.5)
        packets = [
            (fs, g, es, blob)
            for fs, rows in stream.segments
            for (_off, g, es, blob) in rows
        ]
        _assert_env_parity(packets)


class TestTypedParser:
    KINDS = ("s", "i", "s", "s", "s", "s")
    NAMES = ("conv_id", "turn_idx", "role", "text", "tool", "ts")

    def _typed_rows(self, packets, n_payload=6, kinds=None, keys=(0, 1)):
        sess = BinlogSession()
        cols = [[] for _ in range(n_payload + 6)]
        apps = tuple(c.append for c in cols[: n_payload + 1])
        meta = cols[n_payload + 1 :]
        for fs, g, es, pkt in packets:
            sess.process_packet_typed(
                pkt, fs, g, es, apps, meta, kinds or self.KINDS, keys, n_payload
            )
        return cols

    def test_matches_envelope_projection(self):
        ops = generate_ops(seed=11, n_convs=50)
        stream = encode_stream(ops, n_segments=2, seed=11)
        packets = [
            (fs, g, es, blob)
            for fs, rows in stream.segments
            for (_off, g, es, blob) in rows
        ]
        env = _envelope_dicts(packets)
        cols = self._typed_rows(packets)
        assert len(cols[0]) == len(env)
        for r, rec in enumerate(env):
            img = json.loads(
                rec["after_values"]
                if rec["dml_type"] != "DELETE"
                else rec["before_values"]
            )
            deleted = rec["dml_type"] == "DELETE"
            for i in range(6):
                want = img.get(f"c{i}")
                if deleted and i not in (0, 1):
                    want = None
                assert cols[i][r] == want, (r, i, cols[i][r], want)
            assert cols[6][r] is deleted
            assert cols[7][r] == rec["gtid"]
            assert cols[11][r] == rec["log_pos"]

    def test_pk_change_update_emits_tombstone(self):
        w = EventWriter()
        w.format_description()
        w.table_map(5, TRANSCRIPTS_SCHEMA)
        before = ("conv-a", 1, "user", "hello", None, 1_700_000_000_000_000)
        after = ("conv-b", 1, "user", "hello", None, 1_700_000_000_000_000)
        w.update_rows(5, TRANSCRIPTS_SCHEMA, [(before, after)])
        packets = [(1, 1, i + 1, pkt) for i, (_, pkt) in enumerate(w.events)]
        cols = self._typed_rows(packets)
        # tombstone for the old key first, then the upsert at the new key
        assert cols[0] == ["conv-a", "conv-b"]
        assert cols[6] == [True, False]  # _deleted
        assert cols[3] == [None, "hello"]  # non-key cols absent on tombstone
        # ordering: tombstone sorts before upsert within the event
        assert cols[9] == [1, 2]  # _event_row_index

    def test_same_key_update_single_row(self):
        w = EventWriter()
        w.format_description()
        w.table_map(5, TRANSCRIPTS_SCHEMA)
        before = ("conv-a", 1, "user", "hello", None, 1_700_000_000_000_000)
        after = ("conv-a", 1, "user", "edited", None, 1_700_000_000_500_000)
        w.update_rows(5, TRANSCRIPTS_SCHEMA, [(before, after)])
        packets = [(1, 1, i + 1, pkt) for i, (_, pkt) in enumerate(w.events)]
        cols = self._typed_rows(packets)
        assert cols[0] == ["conv-a"]
        assert cols[3] == ["edited"]
        assert cols[6] == [False]


class TestRowsV1Framing:
    """v1 vs v2 ROWS framing is announced by FORMAT_DESCRIPTION
    post_header_len (8 vs 10), not the event code — a v1 stream using type
    30-32 must decode identically (cf. event_parser.zig:69-71)."""

    def _stream(self, rows_v2: bool):
        from myzql_binlog_connector_spark.binlog.encoder import (
            EventWriter,
            TRANSCRIPTS_SCHEMA,
        )

        w = EventWriter(rows_v2=rows_v2)
        w.format_description()
        w.table_map(5, TRANSCRIPTS_SCHEMA)
        rows = [
            (f"conv-{i}", i, "user", f"text {i}", None, 1_700_000_000_000_000 + i)
            for i in range(5)
        ]
        w.write_rows(5, TRANSCRIPTS_SCHEMA, rows)
        w.update_rows(5, TRANSCRIPTS_SCHEMA, [(rows[0], rows[1])])
        w.delete_rows(5, TRANSCRIPTS_SCHEMA, [rows[2]])
        return [(1, i + 1, i + 1, pkt) for i, (_, pkt) in enumerate(w.events)]

    def test_v1_equals_v2_generic_and_columnar(self):
        outs = {}
        for v2 in (True, False):
            packets = self._stream(v2)
            outs[(v2, "generic")] = _envelope_dicts(packets)
            cb = _envelope_columnar(packets)
            outs[(v2, "columnar")] = [
                {n: cb.columns()[ci][r] for ci, n in enumerate(EnvelopeBatch.__slots__)}
                for r in range(len(cb))
            ]
        # payload-visible fields identical across framings and paths
        keys = ("database", "table_name", "dml_type", "before_values",
                "after_values", "event_row_index")
        base = [{k: r[k] for k in keys} for r in outs[(True, "generic")]]
        for variant in outs.values():
            assert [{k: r[k] for k in keys} for r in variant] == base
        assert len(base) == 7  # 5 inserts + 1 update + 1 delete


class TestCrcVerification:
    def test_corrupt_packet_detected(self):
        w = EventWriter()
        w.format_description()
        w.table_map(5, TRANSCRIPTS_SCHEMA)
        w.write_rows(5, TRANSCRIPTS_SCHEMA,
                     [("c", 0, "user", "x", None, 1_700_000_000_000_000)])
        packets = [pkt for _, pkt in w.events]
        # flip a payload byte of the ROWS packet, keep the old CRC
        bad = bytearray(packets[-1])
        bad[25] ^= 0xFF
        sess = BinlogSession(verify_crc=True)
        for pkt in packets[:-1]:
            list(sess.process_packet(pkt, file_seq=1))
        import pytest as _pytest

        with _pytest.raises(ValueError, match="CRC32 mismatch"):
            list(sess.process_packet(bytes(bad), file_seq=1))

    def test_corrupt_fast_skipped_packet_detected(self):
        # XID (16) is a kind _pre_rows fast-skips when no stop bound is
        # set; verify_crc must still catch corruption in it
        w = EventWriter()
        w.format_description()
        w._emit(16, (1234).to_bytes(8, "little"))  # XID event
        packets = [pkt for _, pkt in w.events]
        sess = BinlogSession(verify_crc=True)
        list(sess.process_packet(packets[0], file_seq=1))
        bad = bytearray(packets[1])
        bad[-6] ^= 0xFF  # corrupt payload, keep the old CRC
        import pytest as _pytest

        with _pytest.raises(ValueError, match="CRC32 mismatch"):
            list(sess.process_packet(bytes(bad), file_seq=1))

    def test_clean_stream_passes(self):
        w = EventWriter()
        w.format_description()
        w.table_map(5, TRANSCRIPTS_SCHEMA)
        w.write_rows(5, TRANSCRIPTS_SCHEMA,
                     [("c", 0, "user", "x", None, 1_700_000_000_000_000)])
        sess = BinlogSession(verify_crc=True)
        rows = []
        for _, pkt in w.events:
            rows.extend(sess.process_packet(pkt, file_seq=1))
        assert len(rows) == 1


class TestEmptyPresentBitmap:
    def test_empty_present_compiles_and_parses(self):
        """An empty present bitmap must not generate empty if/else suites
        (SyntaxError at compile time — round-3 ADVICE).  A zero-present
        image is zero bytes, so the parser sees pos == end and returns 0."""
        from myzql_binlog_connector_spark.binlog.rowcodec import (
            get_env_parser,
            get_typed_parser,
        )

        for dml in ("INSERT", "DELETE", "UPDATE"):
            p = get_env_parser(
                TRANSCRIPTS_SCHEMA, f"ep-{dml}", b"", b"", dml
            )
            b, a = [], []
            assert p(b"", 0, 0, b.append, a.append) == 0
            assert b == [] and a == []
        t = get_typed_parser(
            TRANSCRIPTS_SCHEMA, "ep-t", b"", b"", "DELETE",
            ("s", "i", "s", "s", "s", "s"), (0, 1), 6,
        )
        cols = [[] for _ in range(7)]
        assert t(b"", 0, 0, tuple(c.append for c in cols[:6]), cols[6].append) == 0


class TestBlobViews:
    def test_zero_copy_views_match_pylist_including_high_bytes(self):
        """pyarrow Buffer memoryviews export format 'b' (signed); the cast
        to 'B' must make indexing return unsigned ints — a blob byte >0x7f
        read as negative broke varlen length fields (round-3 regression)."""
        import pyarrow as pa

        from myzql_binlog_connector_spark.functions.decode import _blob_views

        blobs = [bytes([0xFF, 0x80, 0x01]), b"", b"plain", bytes(range(256))]
        arr = pa.array(blobs, pa.binary())
        for a in (arr, arr.slice(1, 3), pa.chunked_array([arr, arr])):
            views = _blob_views(a)
            assert [bytes(v) for v in views] == a.to_pylist()
            for v in views:
                if len(v):
                    assert v[0] >= 0  # unsigned indexing
