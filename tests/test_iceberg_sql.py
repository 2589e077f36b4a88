"""Golden tests pinning the IcebergApplier's generated SQL (no Iceberg
runtime in the sandbox — these prevent MERGE/ALTER text bit-rot; the
statements use only public Iceberg-Spark SQL syntax)."""

from __future__ import annotations

from myzql_binlog_connector_spark.plans.iceberg import IcebergApplier

COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts",
        "_deleted", "_gtid", "_event_seq", "_event_row_index", "_file_seq", "_log_pos"]


def _applier():
    return IcebergApplier(None, "cat.db.transcripts", ["conv_id", "turn_idx"])


class TestIcebergSql:
    def test_merge_sql_golden(self):
        sql = _applier().merge_sql(COLS)
        assert sql == (
            "MERGE INTO cat.db.transcripts t\n"
            "USING _changes_batch s\n"
            "ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx\n"
            "WHEN MATCHED AND s._deleted AND (s._gtid, s._event_seq, s._event_row_index)"
            " > (t._gtid, t._event_seq, t._event_row_index) THEN DELETE\n"
            "WHEN MATCHED AND NOT s._deleted AND (s._gtid, s._event_seq, s._event_row_index)"
            " > (t._gtid, t._event_seq, t._event_row_index) THEN UPDATE SET "
            "t.conv_id = s.conv_id, t.turn_idx = s.turn_idx, t.role = s.role, "
            "t.text = s.text, t.tool = s.tool, t.ts = s.ts, "
            "t._gtid = s._gtid, t._event_seq = s._event_seq, "
            "t._event_row_index = s._event_row_index\n"
            "WHEN NOT MATCHED AND NOT s._deleted THEN INSERT "
            "(conv_id, turn_idx, role, text, tool, ts, _gtid, _event_seq, _event_row_index) "
            "VALUES (s.conv_id, s.turn_idx, s.role, s.text, s.tool, s.ts, "
            "s._gtid, s._event_seq, s._event_row_index)"
        )

    def test_wm_sql_golden(self):
        a = _applier()
        assert a.wm_table() == "cat.db.transcripts_wm"
        assert a.wm_create_sql() == (
            "CREATE TABLE IF NOT EXISTS cat.db.transcripts_wm "
            "(file_seq int, log_pos bigint, event_row_index bigint) USING iceberg"
        )
        assert a.wm_merge_sql() == (
            "MERGE INTO cat.db.transcripts_wm t\n"
            "USING _wm_batch s\n"
            "ON t.file_seq = s.file_seq\n"
            "WHEN MATCHED AND (s.log_pos, s.event_row_index) > "
            "(t.log_pos, t.event_row_index) "
            "THEN UPDATE SET t.log_pos = s.log_pos, t.event_row_index = s.event_row_index\n"
            "WHEN NOT MATCHED THEN INSERT (file_seq, log_pos, event_row_index) "
            "VALUES (s.file_seq, s.log_pos, s.event_row_index)"
        )

    def test_merge_sql_parses_as_spark_sql(self, spark):
        """The MERGE text must at least be syntactically valid Spark SQL —
        parse it with the session parser (no execution, no catalog)."""
        sql = _applier().merge_sql(COLS)
        jspark = spark._jsparkSession
        jspark.sessionState().sqlParser().parsePlan(sql)
        jspark.sessionState().sqlParser().parsePlan(_applier().wm_merge_sql())
        jspark.sessionState().sqlParser().parsePlan(_applier().wm_create_sql())
