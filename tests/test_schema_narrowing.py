"""Schema narrowing (``ALTER TABLE ... DROP COLUMN``) handling.

The binlog row format without ``binlog_row_metadata=FULL`` carries no
column names (reference parses TABLE_MAP purely positionally:
/root/reference/src/event_parser.zig TableMap), so a TABLE_MAP that
announces FEWER columns than configured is positionally ambiguous —
naively mapping the narrower row onto the configured name list shifts
every value after the dropped position into the wrong column.  The
engine must (a) fail loud by default, and (b) decode correctly when the
user declares the surviving columns via ``narrowed_names``.
"""

import glob

import pytest

from myzql_binlog_connector_spark.binlog.encoder import (
    EventWriter,
    TRANSCRIPTS_SCHEMA,
    TableSchema,
    long_col,
    timestamp2,
    varchar,
)
from myzql_binlog_connector_spark.functions.decode import decode_changes
from myzql_binlog_connector_spark.genlog import GeneratedStream, write_segments_parquet
from myzql_binlog_connector_spark.plans.apply import (
    SchemaNarrowingError,
    TranscriptsApplier,
)
from myzql_binlog_connector_spark.plans.lake import BucketedLakeTable

# TRANSCRIPTS_SCHEMA minus `tool` (position 4 dropped)
NARROW = TableSchema(
    "chat",
    "transcripts",
    (
        varchar(64, nullable=False),  # conv_id
        long_col(nullable=False),     # turn_idx
        varchar(16),                  # role
        varchar(16384),               # text
        timestamp2(6),                # ts
    ),
)

TS0 = 1_700_000_000_000_000
SURVIVORS = ["conv_id", "turn_idx", "role", "text", "ts"]


def _dropped_stream(tmp_path, corrupt_last_rows_event=False):
    """One segment: two rows under the full 6-col map, then the column
    drop, then an insert / update / delete under the 5-col map.  With
    ``corrupt_last_rows_event``, one extra post-drop insert is appended
    and its packet truncated mid-body (undecodable → quarantine food)."""
    w = EventWriter()
    w.format_description()
    w.table_map(5, TRANSCRIPTS_SCHEMA)
    w.write_rows(
        5,
        TRANSCRIPTS_SCHEMA,
        [
            ("c1", 0, "user", "hello", "search", TS0),
            ("c2", 0, "user", "hey", None, TS0 + 1_000_000),
        ],
    )
    # ALTER TABLE chat.transcripts DROP COLUMN tool
    w.table_map(5, NARROW)
    w.write_rows(5, NARROW, [("c1", 1, "assistant", "hi there", TS0 + 2_000_000)])
    w.update_rows(
        5,
        NARROW,
        [(
            ("c1", 0, "user", "hello", TS0),
            ("c1", 0, "user", "hello again", TS0 + 3_000_000),
        )],
    )
    w.delete_rows(5, NARROW, [("c2", 0, "user", "hey", TS0 + 1_000_000)])
    if corrupt_last_rows_event:
        w.write_rows(5, NARROW, [("c9", 9, "user", "doomed", TS0 + 4_000_000)])
        off, pkt = w.events[-1]
        w.events[-1] = (off, pkt[: len(pkt) // 2])
    w.rotate("binlog.000002")
    stream = GeneratedStream(
        segments=[(1, [(off, i, i, pkt) for i, (off, pkt) in enumerate(w.events)])]
    )
    write_segments_parquet(stream, str(tmp_path / "seg"))
    return stream


EXPECTED = {
    # (conv_id, turn_idx): (role, text, tool, ts is not null)
    ("c1", 0): ("user", "hello again", None, True),  # narrowed UPDATE wins
    ("c1", 1): ("assistant", "hi there", None, True),  # narrowed INSERT
    # ("c2", 0) deleted under the narrowed map
}


def _state(table):
    return {
        (r.conv_id, r.turn_idx): (r.role, r.text, r.tool, r.ts is not None)
        for r in table.read().collect()
    }


class TestFailLoud:
    def test_envelope_path_raises_without_declaration(self, spark, tmp_path):
        _dropped_stream(tmp_path)
        events = spark.read.parquet(str(tmp_path / "seg"))
        table = BucketedLakeTable(
            spark, str(tmp_path / "t"), ["conv_id", "turn_idx"], n_buckets=2
        )
        applier = TranscriptsApplier(spark, table)
        with pytest.raises(SchemaNarrowingError, match="5 columns but 6"):
            applier.apply_batch(decode_changes(events), batch_id=0)

    def test_typed_path_raises_without_declaration(self, spark, tmp_path):
        _dropped_stream(tmp_path)
        paths = sorted(glob.glob(str(tmp_path / "seg" / "*.parquet")))
        table = BucketedLakeTable(
            spark, str(tmp_path / "t"), ["conv_id", "turn_idx"], n_buckets=2
        )
        applier = TranscriptsApplier(spark, table)
        with pytest.raises(SchemaNarrowingError, match="positionally\\s+ambiguous"):
            applier.apply_files(paths, batch_id=0)

    def test_declaration_validation(self, spark, tmp_path):
        table = BucketedLakeTable(
            spark, str(tmp_path / "t"), ["conv_id", "turn_idx"], n_buckets=2
        )

        def applier(nn):
            return TranscriptsApplier(spark, table, narrowed_names={5: nn})

        with pytest.raises(ValueError, match="need exactly 5"):
            applier(["conv_id", "turn_idx", "role"])._names_for_count(5)
        with pytest.raises(ValueError, match="not in the configured"):
            applier(
                ["conv_id", "turn_idx", "role", "text", "bogus"]
            )._names_for_count(5)
        with pytest.raises(ValueError, match="configured column\\s+order"):
            applier(
                ["conv_id", "turn_idx", "role", "ts", "text"]
            )._names_for_count(5)
        with pytest.raises(ValueError, match="key column"):
            applier(
                ["conv_id", "role", "text", "tool", "ts"]
            )._names_for_count(5)
        assert applier(SURVIVORS)._names_for_count(5) == SURVIVORS
        # add-column direction is unaffected
        assert applier(SURVIVORS)._names_for_count(7)[-1] == "score"


class TestNarrowedDecode:
    def test_envelope_path_remaps_correctly(self, spark, tmp_path):
        """Post-drop values must land in their own columns (ts stays ts,
        tool reads NULL) — the exact corruption the guard exists for."""
        _dropped_stream(tmp_path)
        events = spark.read.parquet(str(tmp_path / "seg"))
        table = BucketedLakeTable(
            spark, str(tmp_path / "te"), ["conv_id", "turn_idx"], n_buckets=2
        )
        applier = TranscriptsApplier(spark, table, narrowed_names={5: SURVIVORS})
        applier.apply_batch(decode_changes(events), batch_id=0)
        assert _state(table) == EXPECTED
        # the pre-drop tool value survives on no row (both pre-drop rows
        # were overwritten/deleted) but the column itself still exists
        assert "tool" in table.read().columns

    def test_apply_files_routes_through_envelope_path(self, spark, tmp_path):
        _dropped_stream(tmp_path)
        paths = sorted(glob.glob(str(tmp_path / "seg" / "*.parquet")))
        table = BucketedLakeTable(
            spark, str(tmp_path / "tf"), ["conv_id", "turn_idx"], n_buckets=2
        )
        applier = TranscriptsApplier(spark, table, narrowed_names={5: SURVIVORS})
        rec = applier.apply_files(paths, batch_id=0)
        assert rec.get("narrowed_route") is True
        assert _state(table) == EXPECTED
        # idempotence holds across the route switch
        rec2 = applier.apply_files(paths, batch_id=1)
        assert rec2.get("skipped") is True or rec2.get("input_rows", 1) == 0

    def test_pre_drop_only_rows_keep_tool_values(self, spark, tmp_path):
        """A key last written BEFORE the drop keeps its tool value."""
        w = EventWriter()
        w.format_description()
        w.table_map(5, TRANSCRIPTS_SCHEMA)
        w.write_rows(5, TRANSCRIPTS_SCHEMA, [("a", 0, "user", "x", "calc", TS0)])
        w.table_map(5, NARROW)
        w.write_rows(5, NARROW, [("b", 0, "user", "y", TS0 + 1_000_000)])
        w.rotate("binlog.000002")
        stream = GeneratedStream(
            segments=[(1, [(o, i, i, p) for i, (o, p) in enumerate(w.events)])]
        )
        write_segments_parquet(stream, str(tmp_path / "seg"))
        events = spark.read.parquet(str(tmp_path / "seg"))
        table = BucketedLakeTable(
            spark, str(tmp_path / "t"), ["conv_id", "turn_idx"], n_buckets=2
        )
        TranscriptsApplier(
            spark, table, narrowed_names={5: SURVIVORS}
        ).apply_batch(decode_changes(events), batch_id=0)
        got = _state(table)
        assert got[("a", 0)] == ("user", "x", "calc", True)
        assert got[("b", 0)] == ("user", "y", None, True)

    def test_narrowed_only_batch_merges_into_existing_table(self, spark, tmp_path):
        """Batch 1 all pre-drop, batch 2 all post-drop: the second batch's
        frame lacks `tool` entirely and the merge must null-pad it."""
        w1 = EventWriter()
        w1.format_description()
        w1.table_map(5, TRANSCRIPTS_SCHEMA)
        w1.write_rows(5, TRANSCRIPTS_SCHEMA, [("a", 0, "user", "x", "calc", TS0)])
        w1.rotate("binlog.000002")
        w2 = EventWriter()
        w2.format_description()
        w2.table_map(5, NARROW)
        w2.write_rows(5, NARROW, [("a", 1, "assistant", "y", TS0 + 1_000_000)])
        w2.rotate("binlog.000003")
        for seq, w in ((1, w1), (2, w2)):
            stream = GeneratedStream(
                segments=[(seq, [(o, i, i, p) for i, (o, p) in enumerate(w.events)])]
            )
            write_segments_parquet(stream, str(tmp_path / f"seg{seq}"))
        table = BucketedLakeTable(
            spark, str(tmp_path / "t"), ["conv_id", "turn_idx"], n_buckets=2
        )
        applier = TranscriptsApplier(spark, table, narrowed_names={5: SURVIVORS})
        for seq in (1, 2):
            events = spark.read.parquet(str(tmp_path / f"seg{seq}"))
            applier.apply_batch(decode_changes(events), batch_id=seq)
        got = _state(table)
        assert got[("a", 0)] == ("user", "x", "calc", True)
        assert got[("a", 1)] == ("assistant", "y", None, True)


class TestNarrowedQuarantine:
    """Round-6 ADVICE: the narrowed route must have the SAME dead-letter
    contract as the typed path — corrupt events in a narrowing batch land
    in {table}/_quarantine/batch-{id}/ with quarantined_rows counted,
    never silently filtered by typed_changes."""

    def test_corrupt_event_in_narrowing_batch_reaches_dlq(self, spark, tmp_path):
        import json

        _dropped_stream(tmp_path, corrupt_last_rows_event=True)
        paths = sorted(glob.glob(str(tmp_path / "seg" / "*.parquet")))
        table = BucketedLakeTable(
            spark, str(tmp_path / "tq"), ["conv_id", "turn_idx"], n_buckets=2
        )
        applier = TranscriptsApplier(spark, table, narrowed_names={5: SURVIVORS})
        rec = applier.apply_files(paths, batch_id=0, on_error="quarantine")
        assert rec.get("narrowed_route") is True
        assert rec.get("quarantined_rows") == 1
        # good rows merged exactly as the clean-stream narrowing test
        assert _state(table) == EXPECTED
        # DLQ sidecar: same dir layout and column shape as the typed path
        dead = spark.read.parquet(str(tmp_path / "tq" / "_quarantine" / "batch-0"))
        assert set(dead.columns) == {
            "_file_seq", "_gtid", "_event_seq", "_log_pos", "_corrupt"
        }
        rows = dead.collect()
        assert len(rows) == 1
        info = json.loads(rows[0]._corrupt)
        assert "error" in info and info["blob_prefix"]

    def test_clean_narrowing_batch_counts_zero(self, spark, tmp_path):
        import os

        _dropped_stream(tmp_path)
        paths = sorted(glob.glob(str(tmp_path / "seg" / "*.parquet")))
        table = BucketedLakeTable(
            spark, str(tmp_path / "tq0"), ["conv_id", "turn_idx"], n_buckets=2
        )
        applier = TranscriptsApplier(spark, table, narrowed_names={5: SURVIVORS})
        rec = applier.apply_files(paths, batch_id=0, on_error="quarantine")
        assert rec.get("narrowed_route") is True
        assert rec.get("quarantined_rows") == 0
        assert not os.path.exists(str(tmp_path / "tq0" / "_quarantine"))
        assert _state(table) == EXPECTED
