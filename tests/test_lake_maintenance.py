"""Lake-table maintenance: compaction, tombstone GC, watermarks, lineage."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from myzql_binlog_connector_spark.plans.lake import BucketedLakeTable


@pytest.fixture()
def table(spark, tmp_path):
    t = BucketedLakeTable(spark, str(tmp_path / "t"), ["k"], n_buckets=4)
    df = spark.createDataFrame(
        [(i, f"v{i}", i % 2 == 0, i, 0, 1) for i in range(20)],
        "k bigint, val string, _deleted boolean, _gtid bigint, _event_seq bigint, _event_row_index bigint",
    )
    t.merge(df, batch_id=0)
    return t


class TestMaintenance:
    def test_tombstones_retained_then_gced(self, spark, table):
        live = table.read()
        assert live.count() == 10  # odd keys only (evens are tombstones)
        with_tombs = table.read(include_tombstones=True, include_meta=True)
        assert with_tombs.count() == 20

        table.compact(drop_tombstones_below=(100,))  # all tombstones < gtid 100
        after = table.read(include_tombstones=True, include_meta=True)
        # live rows kept, tombstones dropped
        assert after.filter(~F.col("_deleted")).count() == 10
        assert after.filter(F.col("_deleted")).count() == 0
        assert table.read().count() == 10

    def test_compaction_preserves_state_and_bumps_version(self, spark, table):
        before = {(r.k, r.val) for r in table.read().collect()}
        v0 = table.snapshot_manifest()["version"]
        table.compact()
        assert table.snapshot_manifest()["version"] == v0 + 1
        assert {(r.k, r.val) for r in table.read().collect()} == before

    def test_lineage_records_commits(self, spark, table):
        lin = table.lineage()
        assert lin and lin[-1]["version"] == table.snapshot_manifest()["version"]
        assert "bytes_written" in lin[-1] and lin[-1]["input_rows"] == 20

    def test_watermark_roundtrip(self, spark, table):
        table.set_watermarks({"1": {"log_pos": 500, "event_row_index": 3, "gtid": 42}})
        wms = table.watermarks()
        assert wms["1"]["log_pos"] == 500
        # new merge preserves existing watermarks
        df = spark.createDataFrame(
            [(100, "x", False, 99, 0, 1)],
            "k bigint, val string, _deleted boolean, _gtid bigint, _event_seq bigint, _event_row_index bigint",
        )
        table.merge(df, batch_id=1, extra_lineage={"watermarks": {"2": {"log_pos": 9, "event_row_index": 1, "gtid": 50}}})
        wms = table.watermarks()
        assert wms["1"]["log_pos"] == 500 and wms["2"]["gtid"] == 50

    def test_metrics_table(self, spark, table):
        df = spark.createDataFrame(
            [(50, "y", False, 200, 0, 1)],
            "k bigint, val string, _deleted boolean, _gtid bigint, _event_seq bigint, _event_row_index bigint",
        )
        table.merge(df, batch_id=7)
        m = table.metrics()
        rows = {r["version"]: r for r in m.collect()}
        assert len(rows) >= 2  # fixture commit + this one
        latest = rows[max(rows)]
        assert latest["batch_id"] == 7
        assert latest["input_rows"] == 1
        assert latest["wall_ms"] > 0

    def test_merge_only_rewrites_dirty_buckets(self, spark, table):
        files_before = dict(table.snapshot_manifest()["files"])
        # touch exactly one key → at most one dirty bucket
        df = spark.createDataFrame(
            [(1, "updated", False, 1000, 0, 1)],
            "k bigint, val string, _deleted boolean, _gtid bigint, _event_seq bigint, _event_row_index bigint",
        )
        rec = table.merge(df, batch_id=2)
        assert len(rec["dirty_buckets"]) == 1
        files_after = table.snapshot_manifest()["files"]
        dirty = str(rec["dirty_buckets"][0])
        for b, paths in files_before.items():
            if b != dirty:
                assert files_after[b] == paths  # untouched buckets carried over
        assert files_after[dirty] != files_before.get(dirty)
        got = {r.k: r.val for r in table.read().collect()}
        assert got[1] == "updated"
