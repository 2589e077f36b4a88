"""Typed change feed (read_changes_typed): Delta-CDF-parity
insert/update_preimage/update_postimage/delete classification with
preimages computed at read time from pruned time-travel state.

Pinned invariants:

- classification matches a pure-Python model over an op soup (inserts,
  updates, deletes, re-insert-after-delete, redundant deletes);
- replaying the typed ops onto the prior snapshot reproduces the end
  snapshot exactly (the property CDF consumers rely on);
- the pruned-keys path and the join fallback agree;
- preimage reads below the vacuum floor fail loud.
"""

from __future__ import annotations

import pytest

from tests.test_replica import _chg, _mk_table


def _typed_rows(df):
    return {
        (r.conv_id, r.turn_idx, r.text, r._change_type, r._commit_version)
        for r in df.collect()
    }


class TestChangeTypes:
    def _soup(self, spark, path):
        """4 commits exercising every classification edge; returns
        (table, expected typed rows)."""
        t = _mk_table(spark, path)
        # v1: creation — everything insert
        t.merge(
            _chg(spark, [("a", 0, "a0", 1, False), ("b", 0, "b0", 2, False)]),
            batch_id=0,
        )
        # v2: update a, insert c, redundant delete of never-existing x
        t.merge(
            _chg(spark, [("a", 0, "a1", 3, False), ("c", 0, "c0", 4, False),
                         ("x", 9, None, 5, True)]),
            batch_id=1,
        )
        # v3: delete b
        t.merge(_chg(spark, [("b", 0, None, 6, True)]), batch_id=2)
        # v4: re-insert b (after delete -> insert, not update)
        t.merge(_chg(spark, [("b", 0, "b1", 7, False)]), batch_id=3)
        want = {
            ("a", 0, "a0", "insert", 1),
            ("b", 0, "b0", "insert", 1),
            ("a", 0, "a0", "update_preimage", 2),
            ("a", 0, "a1", "update_postimage", 2),
            ("c", 0, "c0", "insert", 2),
            # redundant delete of x: no row
            ("b", 0, "b0", "delete", 3),
            ("b", 0, "b1", "insert", 4),
        }
        return t, want

    def test_classification_matches_model(self, spark, tmp_path):
        t, want = self._soup(spark, str(tmp_path / "t"))
        got = _typed_rows(t.read_changes_typed())
        assert got == want

    def test_join_fallback_agrees(self, spark, tmp_path):
        t, want = self._soup(spark, str(tmp_path / "t"))
        got = _typed_rows(t.read_changes_typed(max_pruned_keys=0))
        assert got == want

    def test_subrange(self, spark, tmp_path):
        t, want = self._soup(spark, str(tmp_path / "t"))
        got = _typed_rows(t.read_changes_typed(from_version=2, to_version=3))
        assert got == {r for r in want if r[4] in (2, 3)}

    def test_replay_reproduces_snapshot(self, spark, tmp_path):
        """Applying the typed ops onto snapshot(v0) == snapshot(head) —
        the consumer contract CDF exists for."""
        t, _ = self._soup(spark, str(tmp_path / "t"))
        head = t.snapshot_manifest()["version"]
        for v0 in range(1, head):
            state = {
                (r.conv_id, r.turn_idx): r.text
                for r in t.read(at_version=v0).collect()
            }
            typed = t.read_changes_typed(from_version=v0 + 1).orderBy(
                "_commit_version"
            )
            for r in typed.collect():
                k = (r.conv_id, r.turn_idx)
                if r._change_type in ("insert", "update_postimage"):
                    state[k] = r.text
                elif r._change_type == "delete":
                    state.pop(k, None)
            end = {
                (r.conv_id, r.turn_idx): r.text for r in t.read().collect()
            }
            assert state == end, f"replay from v{v0} diverged"

    def test_preimage_below_vacuum_floor_fails_loud(self, spark, tmp_path):
        from myzql_binlog_connector_spark.plans.lake import (
            RetentionOverrunError,
        )

        t, _ = self._soup(spark, str(tmp_path / "t"))
        t.vacuum(retain_last=2, orphan_grace_s=0)
        oldest = min(t.versions())
        with pytest.raises(RetentionOverrunError, match="prior state"):
            t.read_changes_typed(from_version=oldest)
        # from oldest+1 the prior state exists: works
        assert t.read_changes_typed(from_version=oldest + 1).count() >= 0

    def test_schema_evolution_nullpads_preimages(self, spark, tmp_path):
        from pyspark.sql import functions as F

        t = _mk_table(spark, str(tmp_path / "t"))
        t.merge(_chg(spark, [("a", 0, "a0", 1, False)]), batch_id=0)
        t.merge(
            _chg(spark, [("a", 0, "a1", 2, False)]).withColumn(
                "lang", F.lit("en")
            ),
            batch_id=1,
        )
        rows = {
            (r._change_type, r.text, r.lang)
            for r in t.read_changes_typed(from_version=2).collect()
        }
        # the preimage predates the lang column: null-padded, never dropped
        assert rows == {
            ("update_preimage", "a0", None),
            ("update_postimage", "a1", "en"),
        }
