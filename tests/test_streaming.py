"""Structured-Streaming replay: micro-batching, checkpoint resume,
redelivery idempotence (SURVEY.md §2.6 T1/T5/T6; §5.2 item 3)."""

from __future__ import annotations

import pytest

from myzql_binlog_connector_spark.genlog import generate_stream, write_segments_parquet
from myzql_binlog_connector_spark.plans.apply import TranscriptsApplier
from myzql_binlog_connector_spark.plans.lake import BucketedLakeTable
from myzql_binlog_connector_spark.streaming.replay import BinlogReplayStream


def _state_dict(df):
    return {(r["conv_id"], r["turn_idx"]): r["text"] for r in df.collect()}


def _truth_dict(stream):
    return {k: v[3] for k, v in stream.truth.items()}


@pytest.fixture(scope="module")
def gen(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("stream")
    stream = generate_stream(seed=99, n_convs=30, n_segments=4)
    write_segments_parquet(stream, str(tmp / "seg"))
    return stream, tmp


class TestStreamingReplay:
    def test_available_now_drains_and_matches(self, spark, gen):
        stream, tmp = gen
        table = BucketedLakeTable(spark, str(tmp / "t1"), ["conv_id", "turn_idx"], n_buckets=4)
        replay = BinlogReplayStream(
            spark,
            str(tmp / "seg"),
            TranscriptsApplier(spark, table),
            checkpoint_dir=str(tmp / "ckpt1"),
            max_files_per_trigger=1,
        )
        records = replay.run_to_completion(timeout_sec=300)
        # one micro-batch per segment file
        assert len(records) == 4
        assert _state_dict(table.read()) == _truth_dict(stream)
        # lineage rows persisted in the table manifest
        assert len(table.lineage()) >= 1
        assert all("wall_ms" in r for r in table.lineage() if "compaction" not in r)

    def test_restart_from_checkpoint_is_exactly_once(self, spark, gen):
        """Drain two micro-batches, 'crash', restart with the same
        checkpoint: the stream resumes where it left off and the final state
        matches; then a full second run is a complete no-op."""
        stream, tmp = gen
        table = BucketedLakeTable(spark, str(tmp / "t2"), ["conv_id", "turn_idx"], n_buckets=4)
        applier = TranscriptsApplier(spark, table)
        ckpt = str(tmp / "ckpt2")

        # phase 1: process only the first 2 micro-batches, then stop (crash)
        replay1 = BinlogReplayStream(spark, str(tmp / "seg"), applier, ckpt)
        seen = []
        orig = replay1._process_batch

        def crashing(batch_df, batch_id):
            if len(seen) >= 2:
                raise RuntimeError("injected crash")
            orig(batch_df, batch_id)
            seen.append(batch_id)

        replay1._process_batch = crashing
        q = replay1.start(available_now=True)
        with pytest.raises(Exception):
            q.awaitTermination(300)
        assert len(seen) == 2

        # phase 2: restart with same checkpoint → finishes the tail
        replay2 = BinlogReplayStream(spark, str(tmp / "seg"), applier, ckpt)
        replay2.run_to_completion(timeout_sec=300)
        assert _state_dict(table.read()) == _truth_dict(stream)

        # phase 3: brand-new checkpoint, full redelivery → watermarks make
        # every batch a no-op
        v_before = table.snapshot_manifest()["version"]
        replay3 = BinlogReplayStream(spark, str(tmp / "seg"), applier, str(tmp / "ckpt3"))
        records = replay3.run_to_completion(timeout_sec=300)
        assert all(r.get("skipped") for r in records)
        assert table.snapshot_manifest()["version"] == v_before
        assert _state_dict(table.read()) == _truth_dict(stream)
