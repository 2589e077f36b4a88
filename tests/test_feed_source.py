"""Structured Streaming source over the lake change feed
(streaming/feed.py, format "lake_changes").

Contract under test: the stream delivers exactly the rows
``read_changes`` serves, offsets are manifest versions (durable,
exactly-once across checkpoint restarts), rate limiting bounds versions
per micro-batch, and the vacuum-retention semantics match the batch API
(RetentionOverrunError / allowGaps)."""

from __future__ import annotations

import pytest


def _chg(spark, rows):
    """rows: list of (conv_id, turn_idx, text, gtid, deleted)."""
    return spark.createDataFrame(
        [(c, t, x, bool(d), g, g, 1) for (c, t, x, g, d) in rows],
        "conv_id string, turn_idx bigint, text string, _deleted boolean, "
        "_gtid bigint, _event_seq bigint, _event_row_index bigint",
    )


@pytest.fixture()
def table(spark, tmp_path):
    from myzql_binlog_connector_spark.plans.lake import BucketedLakeTable

    return BucketedLakeTable(
        spark, str(tmp_path / "t"), ["conv_id", "turn_idx"], n_buckets=4
    )


@pytest.fixture()
def registered(spark):
    from myzql_binlog_connector_spark.streaming.feed import (
        LakeChangesDataSource,
    )

    # re-registering the same name is an idempotent replace in Spark 4
    spark.dataSource.register(LakeChangesDataSource)
    return LakeChangesDataSource


def _feed_rows(spark, name):
    return {
        (r.conv_id, r.turn_idx, r.text, r._deleted, r._commit_version)
        for r in spark.sql(f"select * from {name}").collect()
    }


def _start(spark, path, name, checkpoint=None, **opts):
    reader = spark.readStream.format("lake_changes").option("path", path)
    for k, v in opts.items():
        reader = reader.option(k, v)
    w = reader.load().writeStream.format("memory").queryName(name)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    return w.start()


class TestFeedMatchesBatchApi:
    def test_feed_equals_read_changes(self, spark, table, registered):
        table.merge(
            _chg(spark, [(f"c{i}", 0, f"v{i}", 1, False) for i in range(10)]),
            batch_id=0,
        )
        table.merge(
            _chg(spark, [("c3", 0, "v3b", 2, False), ("c4", 0, None, 3, True)]),
            batch_id=1,
        )
        q = _start(spark, table.path, "feed_eq")
        try:
            q.processAllAvailable()
            want = {
                (r.conv_id, r.turn_idx, r.text, r._deleted, r._commit_version)
                for r in table.read_changes(from_version=1).collect()
            }
            assert _feed_rows(spark, "feed_eq") == want and len(want) == 12
        finally:
            q.stop()

    def test_live_tail_and_commit_versions(self, spark, table, registered):
        table.merge(_chg(spark, [("a", 0, "x", 1, False)]), batch_id=0)
        q = _start(spark, table.path, "feed_tail")
        try:
            q.processAllAvailable()
            table.merge(_chg(spark, [("b", 0, "y", 2, False)]), batch_id=1)
            table.merge(_chg(spark, [("c", 0, "z", 3, False)]), batch_id=2)
            q.processAllAvailable()
            got = _feed_rows(spark, "feed_tail")
            assert {(r[0], r[4]) for r in got} == {("a", 1), ("b", 2), ("c", 3)}
        finally:
            q.stop()

    def test_compaction_and_rebucket_emit_nothing(
        self, spark, table, registered
    ):
        """Maintenance commits move no change data — the feed must skip
        them, exactly like read_changes."""
        table.merge(
            _chg(spark, [(f"c{i}", 0, "x", 1, False) for i in range(8)]),
            batch_id=0,
        )
        table.merge(_chg(spark, [("c1", 0, "x2", 2, False)]), batch_id=1)
        table.compact()
        table.rebucket(8)
        q = _start(spark, table.path, "feed_maint")
        try:
            q.processAllAvailable()
            got = _feed_rows(spark, "feed_maint")
            assert {r[4] for r in got} == {1, 2} and len(got) == 9
        finally:
            q.stop()


class TestOffsets:
    def test_checkpoint_restart_is_exactly_once(
        self, spark, table, registered, tmp_path
    ):
        """Offsets are durable manifest versions: after a stop, offline
        commits, and a restart from the same checkpoint, the (recoverable)
        file sink holds every version exactly once — nothing replayed,
        nothing skipped.  (The memory sink can't recover a checkpoint, so
        this test sinks to parquet.)"""
        ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

        def run_until_idle():
            q = (
                spark.readStream.format("lake_changes")
                .option("path", table.path)
                .load()
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()

        table.merge(_chg(spark, [("a", 0, "x", 1, False)]), batch_id=0)
        run_until_idle()
        # offline commits while no query runs
        table.merge(_chg(spark, [("b", 0, "y", 2, False)]), batch_id=1)
        table.merge(_chg(spark, [("c", 0, "z", 3, False)]), batch_id=2)
        run_until_idle()
        got = [
            (r.conv_id, r._commit_version)
            for r in spark.read.parquet(out).collect()
        ]
        assert sorted(got) == [("a", 1), ("b", 2), ("c", 3)]  # exactly once

    def test_starting_version_latest_skips_history(
        self, spark, table, registered
    ):
        table.merge(_chg(spark, [("old", 0, "x", 1, False)]), batch_id=0)
        q = _start(
            spark, table.path, "feed_latest", startingVersion="latest"
        )
        try:
            q.processAllAvailable()
            assert _feed_rows(spark, "feed_latest") == set()
            table.merge(_chg(spark, [("new", 0, "y", 2, False)]), batch_id=1)
            q.processAllAvailable()
            assert {r[0] for r in _feed_rows(spark, "feed_latest")} == {"new"}
        finally:
            q.stop()

    def test_max_versions_per_batch_bounds_microbatches(
        self, spark, table, registered
    ):
        for g in range(4):
            table.merge(
                _chg(spark, [(f"c{g}", 0, f"v{g}", g + 1, False)]), batch_id=g
            )
        q = _start(
            spark, table.path, "feed_rate", maxVersionsPerBatch="1"
        )
        try:
            q.processAllAvailable()
            got = _feed_rows(spark, "feed_rate")
            assert {r[4] for r in got} == {1, 2, 3, 4}
            # one committed version per micro-batch, from the FIRST batch
            batches = [
                p["numInputRows"]
                for p in (q.recentProgress or [])
                if p["numInputRows"] > 0
            ]
            assert batches == [1, 1, 1, 1]
        finally:
            q.stop()


class TestRetention:
    def test_vacuumed_resume_raises(self, spark, table, registered):
        from pyspark.errors.exceptions.captured import StreamingQueryException

        for g in range(6):
            table.merge(
                _chg(spark, [(f"c{g}", 0, "x", g + 1, False)]), batch_id=g
            )
        table.vacuum(retain_last=2, orphan_grace_s=0)
        q = _start(spark, table.path, "feed_gap")
        try:
            with pytest.raises(StreamingQueryException) as ei:
                q.processAllAvailable()
            assert "RetentionOverrunError" in str(ei.value) or "precedes" in str(
                ei.value
            )
        finally:
            q.stop()

    def test_allow_gaps_floors_at_oldest(self, spark, table, registered):
        for g in range(6):
            table.merge(
                _chg(spark, [(f"c{g}", 0, "x", g + 1, False)]), batch_id=g
            )
        table.vacuum(retain_last=2, orphan_grace_s=0)
        q = _start(spark, table.path, "feed_floor", allowGaps="true")
        try:
            q.processAllAvailable()
            got = _feed_rows(spark, "feed_floor")
            assert {r[4] for r in got} == {5, 6}
        finally:
            q.stop()


class TestBatchReader:
    def test_batch_read_matches_read_changes(self, spark, table, registered):
        table.merge(
            _chg(spark, [(f"c{i}", 0, f"v{i}", 1, False) for i in range(6)]),
            batch_id=0,
        )
        table.merge(_chg(spark, [("c1", 0, "v1b", 2, False)]), batch_id=1)
        table.merge(_chg(spark, [("c2", 0, None, 3, True)]), batch_id=2)
        got = (
            spark.read.format("lake_changes")
            .option("path", table.path)
            .load()
        )
        want = table.read_changes(from_version=1)
        key = lambda r: (
            r.conv_id, r.turn_idx, r.text or "", r._deleted, r._commit_version
        )
        assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))

    def test_version_bounds_and_retention(self, spark, table, registered):
        from myzql_binlog_connector_spark.plans.lake import (
            RetentionOverrunError,
        )

        for g in range(5):
            table.merge(
                _chg(spark, [(f"c{g}", 0, "x", g + 1, False)]), batch_id=g
            )
        df = (
            spark.read.format("lake_changes")
            .option("path", table.path)
            .option("startingVersion", "2")
            .option("endingVersion", "4")
            .load()
        )
        assert {r._commit_version for r in df.collect()} == {2, 3, 4}
        table.vacuum(retain_last=2, orphan_grace_s=0)
        with pytest.raises(Exception) as ei:  # surfaced through the scan plan
            (
                spark.read.format("lake_changes")
                .option("path", table.path)
                .load()
                .collect()
            )
        assert "RetentionOverrunError" in str(ei.value) or "precedes" in str(
            ei.value
        )
        floored = (
            spark.read.format("lake_changes")
            .option("path", table.path)
            .option("allowGaps", "true")
            .load()
        )
        assert {r._commit_version for r in floored.collect()} == {4, 5}


class TestSchemaEvolution:
    def test_pre_evolution_files_null_pad(self, spark, table, registered):
        """Feed pinned at the latest schema: files committed before an ADD
        COLUMN lack the field and must read as NULL, same as _read_files'
        schema-on-read."""
        table.merge(_chg(spark, [("a", 0, "x", 1, False)]), batch_id=0)
        evolved = _chg(spark, [("b", 0, "y", 2, False)]).withColumn(
            "lang", __import__("pyspark.sql.functions", fromlist=["lit"]).lit("en")
        )
        table.merge(evolved, batch_id=1)
        q = _start(spark, table.path, "feed_evo")
        try:
            q.processAllAvailable()
            rows = {
                (r.conv_id, r.lang, r._commit_version)
                for r in spark.sql("select * from feed_evo").collect()
            }
            assert rows == {("a", None, 1), ("b", "en", 2)}
        finally:
            q.stop()

    def test_add_column_mid_stream_fails_loud(self, spark, table, registered):
        """ADD COLUMN landing AFTER the query pinned its schema must stop
        the stream (FeedSchemaChangedError through the planner), never
        project the new column's values away — a silently-diverging
        replica is the failure mode this gate exists for (round-6 ADVICE;
        Delta CDF fails loud here too)."""
        from pyspark.errors.exceptions.base import PySparkException
        from pyspark.sql import functions as F

        table.merge(_chg(spark, [("a", 0, "x", 1, False)]), batch_id=0)
        q = _start(spark, table.path, "feed_evo_loud")
        try:
            q.processAllAvailable()  # pins the pre-evolution schema
            evolved = _chg(spark, [("b", 0, "y", 2, False)]).withColumn(
                "lang", F.lit("en")
            )
            table.merge(evolved, batch_id=1)
            with pytest.raises(
                (PySparkException, Exception), match="schema evolved"
            ):
                q.processAllAvailable()
                # some engines surface planner errors via awaitTermination
                q.awaitTermination(30)
        finally:
            q.stop()
        # restart re-resolves schema from the head manifest: the SAME
        # checkpoint-free restart here re-reads everything and carries
        # the added column — no change data was lost to the stop
        q2 = _start(spark, table.path, "feed_evo_loud2")
        try:
            q2.processAllAvailable()
            rows = {
                (r.conv_id, r.lang, r._commit_version)
                for r in spark.sql("select * from feed_evo_loud2").collect()
            }
            assert rows == {("a", None, 1), ("b", "en", 2)}
        finally:
            q2.stop()

    def test_batch_read_past_add_column_fails_loud(
        self, spark, table, registered
    ):
        """The one-shot reader shares the gate: endingVersion past an ADD
        COLUMN with a stale pinned schema must raise, not null-project."""
        from myzql_binlog_connector_spark.streaming.feed import (
            FeedSchemaChangedError, LakeChangesBatchReader,
        )

        table.merge(_chg(spark, [("a", 0, "x", 1, False)]), batch_id=0)
        stale = (
            spark.read.format("lake_changes")
            .option("path", table.path)
            .load()
            .schema
        )
        from pyspark.sql import functions as F

        evolved = _chg(spark, [("b", 0, "y", 2, False)]).withColumn(
            "lang", F.lit("en")
        )
        table.merge(evolved, batch_id=1)
        rdr = LakeChangesBatchReader({"path": table.path}, stale)
        with pytest.raises(FeedSchemaChangedError, match="lang"):
            rdr.partitions()


class TestLineageWindowOverrun:
    def test_stream_serves_versions_below_lineage_window(
        self, spark, tmp_path, registered
    ):
        """A subscriber that starts (or resumes) further behind than the
        head manifest's lineage window still receives every commit —
        per-version manifests fill the gap."""
        from myzql_binlog_connector_spark.plans.lake import BucketedLakeTable

        t = BucketedLakeTable(
            spark, str(tmp_path / "t"), ["conv_id", "turn_idx"],
            n_buckets=4, lineage_keep=2,
        )
        for g in range(5):
            t.merge(
                _chg(spark, [(f"c{g}", 0, f"v{g}", g + 1, False)]), batch_id=g
            )
        q = _start(spark, t.path, "feed_window")
        try:
            q.processAllAvailable()
            got = {(r[0], r[4]) for r in _feed_rows(spark, "feed_window")}
            assert got == {(f"c{g}", g + 1) for g in range(5)}
        finally:
            q.stop()


class TestEmptyRange:
    def test_batch_read_of_empty_version_range(self, spark, table, registered):
        """A range holding no change-data commits (startingVersion beyond
        head, or only maintenance commits) is an empty DataFrame, not an
        error — Spark calls read(None) when partitions() is empty."""
        table.merge(_chg(spark, [("a", 0, "x", 1, False)]), batch_id=0)
        df = (
            spark.read.format("lake_changes")
            .option("path", table.path)
            .option("startingVersion", "5")
            .load()
        )
        assert df.count() == 0 and "_commit_version" in df.columns
        table.compact()  # v2: maintenance only
        df2 = (
            spark.read.format("lake_changes")
            .option("path", table.path)
            .option("startingVersion", "2")
            .load()
        )
        assert df2.count() == 0
