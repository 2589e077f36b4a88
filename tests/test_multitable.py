"""MultiTableApplier: one change stream fans out into per-(db, table)
lake tables with independent schemas, keys, and watermarks."""

from __future__ import annotations

import pytest

from myzql_binlog_connector_spark.binlog.constants import ColumnType
from myzql_binlog_connector_spark.binlog.encoder import (
    ColumnSpec,
    EventWriter,
    TableSchema,
    TRANSCRIPTS_SCHEMA,
)
from myzql_binlog_connector_spark.functions.decode import decode_changes
from myzql_binlog_connector_spark.harness import _events_df_from_writer
from myzql_binlog_connector_spark.plans.apply import MultiTableApplier

TS = 1_700_000_000_000_000

USERS_SCHEMA = TableSchema(
    database="app",
    table="users",
    columns=(
        ColumnSpec(ColumnType.LONGLONG, 0, False),
        ColumnSpec(ColumnType.VARCHAR, 64),
    ),
    column_names=("user_id", "name"),
)


def _two_table_stream():
    w = EventWriter(server_id=1)
    w.format_description()
    w.table_map(5, TRANSCRIPTS_SCHEMA)
    w.table_map(6, USERS_SCHEMA)
    w.write_rows(5, TRANSCRIPTS_SCHEMA,
                 [("conv-a", 0, "user", "hello", None, TS),
                  ("conv-a", 1, "assistant", "hi", None, TS + 1)])
    w.write_rows(6, USERS_SCHEMA, [(1, "ada"), (2, "grace")])
    w.update_rows(6, USERS_SCHEMA, [((1, "ada"), (1, "ada lovelace"))])
    w.delete_rows(5, TRANSCRIPTS_SCHEMA,
                  [("conv-a", 1, "assistant", "hi", None, TS + 1)])
    w.rotate("binlog.000002")
    return w


def test_fan_out_two_tables(spark, tmp_path):
    env = decode_changes(_events_df_from_writer(spark, [_two_table_stream()]))
    mt = MultiTableApplier(
        spark,
        str(tmp_path / "lake"),
        table_specs={
            ("chat", "transcripts"): {
                "column_names": ["conv_id", "turn_idx", "role", "text", "tool", "ts"],
                "key_positions": (0, 1),
                "n_buckets": 4,
            },
            ("app", "users"): {
                "column_names": ["user_id", "name"],
                "key_positions": (0,),
                "n_buckets": 4,
            },
        },
    )
    records = mt.apply_batch(env, batch_id=0)
    assert set(records) == {("chat", "transcripts"), ("app", "users")}

    tr = mt.table_for("chat", "transcripts").read()
    assert {(r.conv_id, r.turn_idx, r.text) for r in tr.collect()} == {
        ("conv-a", 0, "hello")
    }
    us = mt.table_for("app", "users").read()
    assert {(r.user_id, r.name) for r in us.collect()} == {
        (1, "ada lovelace"), (2, "grace")
    }

    # redelivery of the same batch is a no-op per table
    records2 = mt.apply_batch(env, batch_id=1)
    assert all(r.get("skipped") for r in records2.values())
    assert mt.table_for("app", "users").read().count() == 2


def test_unregistered_table_defaults(spark, tmp_path):
    """A table with no spec lands with positional column names keyed on c0."""
    w = EventWriter(server_id=1)
    w.format_description()
    w.table_map(9, USERS_SCHEMA)
    w.write_rows(9, USERS_SCHEMA, [(7, "x"), (8, "y")])
    w.rotate("binlog.000002")
    env = decode_changes(_events_df_from_writer(spark, [w]))
    mt = MultiTableApplier(spark, str(tmp_path / "lake"), n_buckets=4)
    mt.apply_batch(env, batch_id=0)
    df = mt.table_for("app", "users").read()
    assert set(df.columns) == {"c0", "c1"}
    assert df.count() == 2


def test_streaming_replay_with_multitable(spark, tmp_path):
    """BinlogReplayStream duck-types over any applier with apply_batch:
    fan-out apply works per micro-batch with checkpointing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from myzql_binlog_connector_spark.streaming.replay import BinlogReplayStream

    w = _two_table_stream()
    seg = tmp_path / "seg"
    seg.mkdir()
    rows = [(1, off, i + 1, i + 1, pkt[5], pkt) for i, (off, pkt) in enumerate(w.events)]
    pq.write_table(
        pa.table({
            "file_seq": pa.array([r[0] for r in rows], pa.int32()),
            "offset": pa.array([r[1] for r in rows], pa.int64()),
            "gtid": pa.array([r[2] for r in rows], pa.int64()),
            "event_seq": pa.array([r[3] for r in rows], pa.int64()),
            "event_type": pa.array([r[4] for r in rows], pa.int8()),
            "event_blob": pa.array([r[5] for r in rows], pa.binary()),
        }),
        str(seg / "segment-000001.parquet"),
    )
    mt = MultiTableApplier(
        spark, str(tmp_path / "lake"),
        table_specs={
            ("chat", "transcripts"): {
                "column_names": ["conv_id", "turn_idx", "role", "text", "tool", "ts"],
                "key_positions": (0, 1), "n_buckets": 4,
            },
            ("app", "users"): {
                "column_names": ["user_id", "name"],
                "key_positions": (0,), "n_buckets": 4,
            },
        },
    )
    BinlogReplayStream(
        spark, str(seg), mt, checkpoint_dir=str(tmp_path / "ckpt")
    ).run_to_completion()
    assert mt.table_for("app", "users").read().count() == 2
    assert mt.table_for("chat", "transcripts").read().count() == 1


def _six_table_stream():
    """Six distinct user-style tables so the thread pool (4 workers) has
    more tables than workers — exercises queueing and reuse."""
    w = EventWriter(server_id=1)
    w.format_description()
    schemas = []
    for i in range(6):
        s = TableSchema(
            database="app",
            table=f"t{i}",
            columns=(
                ColumnSpec(ColumnType.LONGLONG, 0, False),
                ColumnSpec(ColumnType.VARCHAR, 64),
            ),
            column_names=("id", "val"),
        )
        schemas.append(s)
        w.table_map(20 + i, s)
    for i, s in enumerate(schemas):
        w.write_rows(20 + i, s, [(n, f"t{i}-{n}") for n in range(5)])
        w.update_rows(20 + i, s, [((0, f"t{i}-0"), (0, f"t{i}-0v2"))])
    w.rotate("binlog.000002")
    return w


def test_parallel_apply_matches_sequential(spark, tmp_path):
    """apply_batch(parallelism=4) over 6 tables commits the same state the
    sequential loop (parallelism=1) does — per-table merges are independent
    jobs over the shared persisted envelope."""
    env = decode_changes(_events_df_from_writer(spark, [_six_table_stream()]))
    specs = {
        ("app", f"t{i}"): {
            "column_names": ["id", "val"], "key_positions": (0,), "n_buckets": 4,
        }
        for i in range(6)
    }
    seq = MultiTableApplier(spark, str(tmp_path / "seq"), table_specs=specs)
    par = MultiTableApplier(spark, str(tmp_path / "par"), table_specs=specs)
    rec_seq = seq.apply_batch(env, batch_id=0, parallelism=1)
    rec_par = par.apply_batch(env, batch_id=0, parallelism=4)
    assert set(rec_seq) == set(rec_par) == {("app", f"t{i}") for i in range(6)}
    for i in range(6):
        a = {(r.id, r.val) for r in seq.table_for("app", f"t{i}").read().collect()}
        b = {(r.id, r.val) for r in par.table_for("app", f"t{i}").read().collect()}
        assert a == b
        assert (0, f"t{i}-0v2") in a and len(a) == 5
    # redelivery through the parallel path is a per-table no-op too
    rec2 = par.apply_batch(env, batch_id=1, parallelism=4)
    assert all(r.get("skipped") for r in rec2.values())
