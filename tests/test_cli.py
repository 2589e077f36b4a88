"""CLI entry point (python -m myzql_binlog_connector_spark): config-driven
replay, reference-binary UX parity."""

from __future__ import annotations

import json
import subprocess
import sys

from myzql_binlog_connector_spark.genlog import generate_stream, write_segments_parquet


def test_cli_apply_matches_truth(tmp_path):
    stream = generate_stream(seed=3, n_convs=10, n_segments=2)
    write_segments_parquet(stream, str(tmp_path / "seg"))
    cfg = {
        "segments_path": str(tmp_path / "seg"),
        "output_mode": "apply",
        "table_path": str(tmp_path / "t"),
        "n_buckets": 4,
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    r = subprocess.run(
        [
            sys.executable, "-m", "myzql_binlog_connector_spark",
            "--config", str(cfg_path), "--master", "local[4]",
            "--shuffle-partitions", "8",
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-1000:]
    summary = json.loads(
        [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert summary["mode"] == "apply"
    assert summary["final_rows"] == len(stream.truth)
    assert summary["applied_rows"] == len(stream.ops)


class TestDriverContract:
    def test_every_query_has_an_oracle_and_vice_versa(self):
        """47 queries, 47 oracles — every operator claimed as done is
        value-hash-checked against DuckDB (the driver's CORRECTNESS gate);
        drift in either direction is a regression."""
        import __spark_entry__ as e

        q = set(e.queries())
        o = set(e.oracle_sql())
        assert q == o, (sorted(q - o), sorted(o - q))
        assert len(q) >= 47

    def test_entry_returns_rows_with_stable_schema(self, spark):
        import __spark_entry__ as e

        df = e.entry(spark)
        assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
        assert df.count() > 0


class TestLakeMaintainCli:
    """scripts/lake_maintain.py — the scheduled-maintenance half of the
    merge-on-read contract, as a scriptable CLI (one JSON line/action)."""

    def _mk(self, spark, path, n=6):
        from myzql_binlog_connector_spark.plans.lake import BucketedLakeTable

        t = BucketedLakeTable(
            spark, path, ["conv_id", "turn_idx"], n_buckets=4,
            max_files_per_bucket=2, auto_fold=False,
        )
        for g in range(n):
            t.merge(
                spark.createDataFrame(
                    [("k", 0, f"v{g}", False, g + 1, g + 1, 1)],
                    "conv_id string, turn_idx bigint, text string, "
                    "_deleted boolean, _gtid bigint, _event_seq bigint, "
                    "_event_row_index bigint",
                ),
                batch_id=g,
            )
        return t

    def test_status_compact_vacuum_rebucket(self, spark, tmp_path, capsys):
        import json as _json

        from scripts.lake_maintain import main

        path = str(tmp_path / "t")
        t = self._mk(spark, path)
        rc = main([path, "--keys", "conv_id,turn_idx", "--status",
                   "--max-files-per-bucket", "2",
                   "--compact", "--rebucket", "8", "--vacuum", "2"])
        assert rc == 0
        recs = [_json.loads(l) for l in capsys.readouterr().out.splitlines()]
        by = {r["action"]: r for r in recs}
        assert by["status"]["needs_fold"]  # deferred-fold table is over bound
        assert by["compact"]["compacted_buckets"]
        assert by["rebucket"]["rebucket"] == [4, 8]
        assert by["vacuum"]["retained_versions"]
        assert {(r.conv_id, r.text) for r in t.read().collect()} == {("k", "v5")}

    def test_key_mismatch_fails_loud(self, spark, tmp_path):
        import pytest as _pytest

        from scripts.lake_maintain import main

        path = str(tmp_path / "t")
        self._mk(spark, path, n=1)
        with _pytest.raises(ValueError, match="keyed by"):
            main([path, "--keys", "conv_id", "--status"])

    def test_rebucket_bucket_cols_migration(self, spark, tmp_path, capsys):
        """--rebucket N --bucket-cols conv_id migrates the layout; the
        status line and group fetch reflect it."""
        import json as _json

        from scripts.lake_maintain import main

        path = str(tmp_path / "t")
        t = self._mk(spark, path, n=3)
        rc = main([path, "--keys", "conv_id,turn_idx",
                   "--rebucket", "4", "--bucket-cols", "conv_id", "--status"])
        assert rc == 0
        recs = [_json.loads(l) for l in capsys.readouterr().out.splitlines()]
        by = {r["action"]: r for r in recs}
        assert by["rebucket"]["rebucket_cols"] == [
            ["conv_id", "turn_idx"], ["conv_id"]
        ]
        # status ran before rebucket in arg order but reports the handle's
        # post-sync state; re-read the manifest for the committed layout
        assert t.snapshot_manifest()["bucket_cols"] == ["conv_id"]
        grp = t.read(keys={"conv_id": "k"})
        assert grp.count() == 1 and grp.collect()[0].text == "v2"
