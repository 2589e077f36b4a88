"""Table include/exclude filter — mirrors the reference's 23-case suite
(/root/reference/src/table_filter.zig:297-500; FIXTURES.md F5)."""

from __future__ import annotations

import pytest

from myzql_binlog_connector_spark.functions.table_filter import (
    FilterRuleError,
    TableFilter,
)


class TestDefaults:
    def test_no_rules_includes_everything(self):
        f = TableFilter()
        assert f.matches("any", "thing")

    def test_any_include_flips_default_to_exclude(self):
        f = TableFilter(include=["db.t"])
        assert f.matches("db", "t")
        assert not f.matches("db", "other")
        assert not f.matches("other", "t2")

    def test_exclude_only_keeps_default_include(self):
        f = TableFilter(exclude=["db.bad"])
        assert not f.matches("db", "bad")
        assert f.matches("db", "good")
        assert f.matches("other", "bad2")


class TestSpecificity:
    def test_exact_beats_table_wildcard(self):
        f = TableFilter(include=["db.t"], exclude=["*.t"])
        assert f.matches("db", "t")        # exact include wins
        assert not f.matches("other", "t")  # *.t exclude applies

    def test_exact_beats_schema_wildcard(self):
        f = TableFilter(exclude=["db.t"], include=["db.*"])
        assert not f.matches("db", "t")
        assert f.matches("db", "other")

    def test_table_wildcard_beats_schema_wildcard(self):
        f = TableFilter(include=["*.t"], exclude=["db.*"])
        assert f.matches("db", "t")       # *.t (spec 2) beats db.* (spec 1)
        assert not f.matches("db", "x")
        assert f.matches("other", "t")

    def test_schema_wildcard_beats_default(self):
        f = TableFilter(include=["db.*"])
        assert f.matches("db", "anything")
        assert not f.matches("other", "x")

    def test_exclude_exact_inside_included_schema(self):
        f = TableFilter(include=["db.*"], exclude=["db.secret"])
        assert f.matches("db", "ok")
        assert not f.matches("db", "secret")


class TestConflicts:
    def test_same_pattern_both_ways(self):
        with pytest.raises(FilterRuleError):
            TableFilter(include=["a.b"], exclude=["a.b"])

    def test_same_wildcard_both_ways(self):
        with pytest.raises(FilterRuleError):
            TableFilter(include=["*.t"], exclude=["*.t"])


class TestValidation:
    @pytest.mark.parametrize(
        "bad", ["nodot", "*.*", ".table", "schema.", "my*db.table", "a.b.c", "."]
    )
    def test_invalid_patterns(self, bad):
        with pytest.raises(FilterRuleError):
            TableFilter(include=[bad])

    @pytest.mark.parametrize("ok", ["a.b", "*.b", "a.*", "my_db.my_table"])
    def test_valid_patterns(self, ok):
        TableFilter(include=[ok])


class TestMixed:
    def test_whitelist_with_schema_carveout(self):
        f = TableFilter(include=["app.*", "logs.events"], exclude=["app.tmp"])
        assert f.matches("app", "users")
        assert not f.matches("app", "tmp")
        assert f.matches("logs", "events")
        assert not f.matches("logs", "other")
        assert not f.matches("misc", "x")

    def test_blacklist_with_table_wildcard(self):
        f = TableFilter(exclude=["*.scratch", "tmp.*"])
        assert not f.matches("db", "scratch")
        assert not f.matches("tmp", "x")
        assert f.matches("db", "real")


class TestCompiledForms:
    """The Column/SQL forms must agree with the Python evaluator."""

    CASES = [
        ({}, None),
        ({"include": ["chat.transcripts"]}, None),
        ({"exclude": ["chat.tmp"]}, None),
        ({"include": ["chat.*"], "exclude": ["chat.tmp"]}, None),
        ({"include": ["*.transcripts"], "exclude": ["scratch.*"]}, None),
    ]

    PROBES = [
        ("chat", "transcripts"),
        ("chat", "tmp"),
        ("scratch", "transcripts"),
        ("scratch", "other"),
        ("x", "y"),
    ]

    @pytest.mark.parametrize("kwargs,_", CASES)
    def test_column_matches_python(self, spark, kwargs, _):
        from pyspark.sql import functions as F

        f = TableFilter(**kwargs)
        df = spark.createDataFrame(self.PROBES, "database string, table_name string")
        got = df.withColumn(
            "inc", f.to_column(F.col("database"), F.col("table_name"))
        ).collect()
        for row in got:
            assert row["inc"] == f.matches(row["database"], row["table_name"])

    @pytest.mark.parametrize("kwargs,_", CASES)
    def test_sql_matches_python(self, kwargs, _):
        import duckdb

        f = TableFilter(**kwargs)
        con = duckdb.connect()
        for db, tbl in self.PROBES:
            sql = f.to_sql_case(f"'{db}'", f"'{tbl}'")
            got = con.sql(f"SELECT {sql}").fetchone()[0]
            assert got == f.matches(db, tbl), (kwargs, db, tbl)
