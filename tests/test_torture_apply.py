"""Full column-type matrix through the typed fast path: encode → apply_files
→ typed lake state.  Exercises decimal/json/blob/temporal extraction and
LWW update/delete semantics on every decoder type at once."""

from __future__ import annotations

import glob
import json

import pytest

from myzql_binlog_connector_spark.binlog.constants import ColumnType
from myzql_binlog_connector_spark.binlog.encoder import (
    ColumnSpec,
    EventWriter,
    TableSchema,
)
from myzql_binlog_connector_spark.genlog import GeneratedStream, write_segments_parquet
from myzql_binlog_connector_spark.plans.apply import TranscriptsApplier
from myzql_binlog_connector_spark.plans.lake import BucketedLakeTable

from tests.test_decode_matrix import TORTURE, ROW

ID_TORTURE = TableSchema(
    database="t",
    table="torture",
    columns=(ColumnSpec(ColumnType.LONGLONG, 0, False),) + TORTURE.columns,
)

NAMES = ["id"] + [f"v{i}" for i in range(len(TORTURE.columns))]


def _write_stream(tmp_path):
    w = EventWriter()
    w.format_description()
    w.table_map(3, ID_TORTURE)
    # three keyed rows
    w.write_rows(3, ID_TORTURE, [(k,) + ROW for k in (1, 2, 3)])
    # update row 2's varchar + decimal
    before = (2,) + ROW
    after_row = list(ROW)
    after_row[12] = "updated-varchar"
    after_row[19] = "-123.4500"[:9]  # DECIMAL(21,4): -123.4500
    after_row[19] = "-123.45"
    w.update_rows(3, ID_TORTURE, [(before, (2,) + tuple(after_row))])
    # delete row 3
    w.delete_rows(3, ID_TORTURE, [(3,) + ROW])
    w.rotate("binlog.000002")
    stream = GeneratedStream(
        segments=[(1, [(off, i + 1, i + 1, pkt) for i, (off, pkt) in enumerate(w.events)])]
    )
    write_segments_parquet(stream, str(tmp_path / "seg"))
    return sorted(glob.glob(str(tmp_path / "seg" / "*.parquet")))


class TestTortureApply:
    def test_all_types_through_apply(self, spark, tmp_path):
        paths = _write_stream(tmp_path)
        table = BucketedLakeTable(spark, str(tmp_path / "t"), ["id"], n_buckets=2)
        applier = TranscriptsApplier(
            spark, table, column_names=NAMES, extra_names=(), key_positions=(0,)
        )
        applier.apply_files(paths, batch_id=0)
        state = {r["id"]: r for r in table.read().collect()}

        assert set(state) == {1, 2}  # row 3 deleted
        r1 = state[1]
        # spot-check every category (positions offset by 1 for the id col)
        assert r1["v0"] == -128 and r1["v4"] == -(1 << 62)
        assert r1["v5"] == 1.5 and abs(r1["v6"] - 3.141592653589793) < 1e-15
        assert r1["v8"] is not None          # DATE
        assert r1["v12"] == "short-varchar"
        assert r1["v15"] == 3 and r1["v16"] == 0b1010  # ENUM / SET
        assert str(r1["v19"]) in ("1340.4000", "1340.40")  # DECIMAL(21,4)
        assert json.loads(r1["v21"]) == {"k": [1, "two", None]}
        assert r1["v17"].startswith("0x")    # blob hex

        r2 = state[2]
        assert r2["v12"] == "updated-varchar"
        assert str(r2["v19"]) in ("-123.4500", "-123.45")

        # typed schema landed: decimal/timestamp/date types preserved
        dt = dict(table.read().dtypes)
        assert dt["v19"] == "decimal(21,4)"
        assert dt["v9"].startswith("timestamp")   # DATETIME2
        assert dt["v8"] == "date"
        assert dt["v4"] == "bigint" and dt["v5"] == "float"

    def test_idempotent_redelivery(self, spark, tmp_path):
        paths = _write_stream(tmp_path)
        table = BucketedLakeTable(spark, str(tmp_path / "t2"), ["id"], n_buckets=2)
        applier = TranscriptsApplier(
            spark, table, column_names=NAMES, extra_names=(), key_positions=(0,)
        )
        applier.apply_files(paths, batch_id=0)
        rec = applier.apply_files(paths, batch_id=1)
        assert rec.get("skipped") is True
        assert table.read().count() == 2
