"""Position predicates and binlog file-name helpers (pure Python parts)."""

from __future__ import annotations

import pytest

from myzql_binlog_connector_spark.functions.position import (
    file_seq_of,
    position_range_sql,
)


class TestFileSeq:
    @pytest.mark.parametrize(
        "name,seq",
        [("binlog.000001", 1), ("mysql-bin.042", 42), ("a.b.000900", 900)],
    )
    def test_numeric_suffix(self, name, seq):
        assert file_seq_of(name) == seq

    @pytest.mark.parametrize("bad", ["binlog", "binlog.", "binlog.abc", ""])
    def test_invalid_names_rejected(self, bad):
        with pytest.raises(ValueError):
            file_seq_of(bad)


class TestRangeSql:
    def test_bounds_rendered(self):
        sql = position_range_sql("f", "p", (1, 4), (3, 120))
        assert "f > 1 OR (f = 1 AND p >= 4)" in sql
        assert "f < 3 OR (f = 3 AND p < 120)" in sql

    def test_no_bounds_is_true(self):
        assert position_range_sql() == "TRUE"
