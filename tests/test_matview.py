"""Incremental materialized views (streaming/matview.py): an aggregate
table maintained from the change feed by group-scoped recompute.

The contract under test: at stream quiescence the view equals the full
recompute of the aggregates over the primary's current snapshot — through
inserts, updates, whole-group deletes, checkpoint restarts, and both
refresh strategies (bucket-pruned reads on a group-bucketed source, and
the broadcast semi-join fallback)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.test_replica import _chg, _mk_table


def _aggs():
    return {
        "n_turns": F.count(F.lit(1)),
        "total_chars": F.sum(F.length("text")),
    }


def _mk_view(spark, path, n_buckets=4):
    from myzql_binlog_connector_spark.plans.lake import BucketedLakeTable

    return BucketedLakeTable(spark, path, ["conv_id"], n_buckets=n_buckets)


def _view_state(view):
    return {
        r.conv_id: (r.n_turns, r.total_chars) for r in view.read().collect()
    }


def _expected(source):
    rows = (
        source.read()
        .groupBy("conv_id")
        .agg(*[expr.alias(n) for n, expr in _aggs().items()])
        .collect()
    )
    return {r.conv_id: (r.n_turns, r.total_chars) for r in rows}


class TestMaterialize:
    def test_bootstrap_follow_update_delete_converges(self, spark, tmp_path):
        from myzql_binlog_connector_spark.streaming.matview import materialize

        src = _mk_table(spark, str(tmp_path / "src"))
        view = _mk_view(spark, str(tmp_path / "view"))
        src.merge(
            _chg(spark, [(f"c{i}", j, f"t{i}.{j}", 1, False)
                         for i in range(8) for j in range(3)]),
            batch_id=0,
        )
        q = materialize(
            spark, src.path, view, str(tmp_path / "ckpt"),
            group_cols=["conv_id"], aggs=_aggs(), bootstrap_from=src,
        )
        try:
            q.processAllAvailable()
            assert _view_state(view) == _expected(src)
            # live: new turn, text edit, single-turn delete
            src.merge(_chg(spark, [("c1", 9, "longer-text", 2, False)]), batch_id=1)
            src.merge(_chg(spark, [("c2", 0, "xx", 3, False)]), batch_id=2)
            src.merge(_chg(spark, [("c3", 2, None, 4, True)]), batch_id=3)
            q.processAllAvailable()
            want = _expected(src)
            assert _view_state(view) == want
            assert want["c1"][0] == 4 and want["c3"][0] == 2
            # whole-group delete: the view row must tombstone away
            src.merge(
                _chg(spark, [("c5", j, None, 5, True) for j in range(3)]),
                batch_id=4,
            )
            q.processAllAvailable()
            assert "c5" not in _view_state(view)
            assert _view_state(view) == _expected(src)
        finally:
            q.stop()

    def test_pruned_refresh_on_conv_bucketed_source(self, spark, tmp_path):
        """Source bucketed by the group columns: refreshes take the
        bucket-pruned read path (asserted via view lineage) and stay
        exact."""
        from myzql_binlog_connector_spark.plans.lake import BucketedLakeTable
        from myzql_binlog_connector_spark.streaming.matview import materialize

        src = BucketedLakeTable(
            spark, str(tmp_path / "src"), ["conv_id", "turn_idx"],
            n_buckets=8, bucket_cols=["conv_id"],
        )
        view = _mk_view(spark, str(tmp_path / "view"))
        src.merge(
            _chg(spark, [(f"c{i}", j, f"t{i}.{j}", 1, False)
                         for i in range(12) for j in range(2)]),
            batch_id=0,
        )
        q = materialize(
            spark, src.path, view, str(tmp_path / "ckpt"),
            group_cols=["conv_id"], aggs=_aggs(), bootstrap_from=src,
        )
        try:
            q.processAllAvailable()
            src.merge(_chg(spark, [("c4", 5, "new", 2, False)]), batch_id=1)
            q.processAllAvailable()
            assert _view_state(view) == _expected(src)
            refreshes = [
                r for r in view.lineage() if "refreshed_groups" in r
            ]
            assert refreshes and all(r["pruned_refresh"] for r in refreshes)
            assert refreshes[-1]["refreshed_groups"] == 1  # only c4 moved
        finally:
            q.stop()

    def test_semijoin_fallback_matches(self, spark, tmp_path):
        """max_pruned_groups=0 forces the broadcast semi-join scan — same
        converged state."""
        from myzql_binlog_connector_spark.streaming.matview import materialize

        src = _mk_table(spark, str(tmp_path / "src"))
        view = _mk_view(spark, str(tmp_path / "view"))
        src.merge(
            _chg(spark, [(f"c{i}", j, f"t{i}.{j}", 1, False)
                         for i in range(6) for j in range(2)]),
            batch_id=0,
        )
        q = materialize(
            spark, src.path, view, str(tmp_path / "ckpt"),
            group_cols=["conv_id"], aggs=_aggs(), bootstrap_from=src,
            max_pruned_groups=0,
        )
        try:
            src.merge(_chg(spark, [("c2", 7, "zz", 2, False)]), batch_id=1)
            q.processAllAvailable()
            assert _view_state(view) == _expected(src)
            refreshes = [r for r in view.lineage() if "refreshed_groups" in r]
            assert refreshes and not any(r["pruned_refresh"] for r in refreshes)
        finally:
            q.stop()

    def test_checkpoint_restart_resumes(self, spark, tmp_path):
        from myzql_binlog_connector_spark.streaming.matview import materialize

        src = _mk_table(spark, str(tmp_path / "src"))
        view = _mk_view(spark, str(tmp_path / "view"))
        ckpt = str(tmp_path / "ckpt")
        src.merge(_chg(spark, [("a", 0, "x", 1, False)]), batch_id=0)
        q = materialize(
            spark, src.path, view, ckpt, group_cols=["conv_id"],
            aggs=_aggs(), bootstrap_from=src,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        # offline commits, then resume WITHOUT re-bootstrap
        src.merge(_chg(spark, [("b", 0, "yy", 2, False)]), batch_id=1)
        src.merge(_chg(spark, [("a", 1, "x2", 3, False)]), batch_id=2)
        q = materialize(
            spark, src.path, view, ckpt, group_cols=["conv_id"], aggs=_aggs()
        )
        try:
            q.processAllAvailable()
            assert _view_state(view) == _expected(src) == {
                "a": (2, 3), "b": (1, 2),
            }
        finally:
            q.stop()

    def test_add_column_mid_follow_stops_then_restart_recovers(
        self, spark, tmp_path
    ):
        """Primary ADDs a column mid-follow: the feed fails loud (the
        replica contract), and a restart with the same checkpoint resumes
        with aggregates that may now reference the evolved column."""
        from myzql_binlog_connector_spark.streaming.matview import materialize

        src = _mk_table(spark, str(tmp_path / "src"))
        view = _mk_view(spark, str(tmp_path / "view"))
        ckpt = str(tmp_path / "ckpt")
        src.merge(_chg(spark, [("a", 0, "x", 1, False)]), batch_id=0)
        q = materialize(
            spark, src.path, view, ckpt, group_cols=["conv_id"],
            aggs=_aggs(), bootstrap_from=src,
        )
        try:
            q.processAllAvailable()  # schema pinned pre-evolution
            src.merge(
                _chg(spark, [("b", 0, "yy", 2, False)]).withColumn(
                    "lang", F.lit("en")
                ),
                batch_id=1,
            )
            with pytest.raises(Exception, match="schema evolved"):
                q.processAllAvailable()
        finally:
            q.stop()
        # restart with an agg over the NEW column
        aggs2 = dict(_aggs(), langs=F.count("lang"))
        q2 = materialize(
            spark, src.path, view, ckpt, group_cols=["conv_id"], aggs=aggs2
        )
        try:
            q2.processAllAvailable()
            got = {
                r.conv_id: (r.n_turns, r.total_chars, r.langs)
                for r in view.read().collect()
            }
            # only 'b' moved post-bootstrap, so only its row carries the
            # evolved aggregate; 'a' keeps its bootstrap shape (null lang
            # count until it next changes) — the staleness-not-wrongness
            # contract
            assert got["b"] == (1, 2, 1)
            assert got["a"][:2] == (1, 1)
        finally:
            q2.stop()

    def test_random_ops_converge(self, spark, tmp_path):
        """Randomized op soup: seeded inserts/updates/deletes across
        conversations, drained in irregular chunks (some while commits
        keep landing — exercising the recompute-from-future path); at
        quiescence the view must equal the full recompute."""
        import random

        from myzql_binlog_connector_spark.streaming.matview import materialize

        rng = random.Random(20260818)
        src = _mk_table(spark, str(tmp_path / "src"))
        view = _mk_view(spark, str(tmp_path / "view"))
        convs = [f"c{i}" for i in range(10)]
        live: dict = {}
        gtid = 0

        def commit(batch_id):
            nonlocal gtid
            rows = []
            for _ in range(rng.randint(1, 6)):
                gtid += 1
                c = rng.choice(convs)
                t = rng.randint(0, 3)
                if (c, t) in live and rng.random() < 0.3:
                    rows.append((c, t, None, gtid, True))
                    live.pop((c, t), None)
                else:
                    txt = f"t{gtid}" * rng.randint(1, 3)
                    rows.append((c, t, txt, gtid, False))
                    live[(c, t)] = txt
            src.merge(_chg(spark, rows), batch_id=batch_id)

        commit(0)
        q = materialize(
            spark, src.path, view, str(tmp_path / "ckpt"),
            group_cols=["conv_id"], aggs=_aggs(), bootstrap_from=src,
        )
        try:
            for b in range(1, 12):
                commit(b)
                if b % 3 == 0:  # drain only sometimes: multi-commit batches
                    q.processAllAvailable()
            q.processAllAvailable()
            assert _view_state(view) == _expected(src)
            # python-side oracle agrees too
            want = {}
            for (c, _t), txt in live.items():
                n, ch = want.get(c, (0, 0))
                want[c] = (n + 1, ch + len(txt))
            assert _view_state(view) == want
        finally:
            q.stop()

    def test_validation(self, spark, tmp_path):
        from myzql_binlog_connector_spark.streaming.matview import materialize

        src = _mk_table(spark, str(tmp_path / "src"))
        src.merge(_chg(spark, [("a", 0, "x", 1, False)]), batch_id=0)
        bad_view = _mk_table(spark, str(tmp_path / "v1"))  # keyed by full key
        with pytest.raises(ValueError, match="keyed by group_cols"):
            materialize(
                spark, src.path, bad_view, str(tmp_path / "ck1"),
                group_cols=["conv_id"], aggs=_aggs(), bootstrap_from=src,
            )
        from myzql_binlog_connector_spark.plans.lake import BucketedLakeTable

        text_view = BucketedLakeTable(spark, str(tmp_path / "v2"), ["text"])
        with pytest.raises(ValueError, match="key columns of the source"):
            materialize(
                spark, src.path, text_view, str(tmp_path / "ck2"),
                group_cols=["text"], aggs={"n": F.count(F.lit(1))},
                bootstrap_from=src,
            )
