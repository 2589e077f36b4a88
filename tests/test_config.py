"""ReplayConfig validation + the config-driven replay entry point."""

from __future__ import annotations

import json

import pytest

from myzql_binlog_connector_spark.config import ConfigError, ReplayConfig, run_replay


class TestValidation:
    def test_defaults_ok(self):
        ReplayConfig(segments_path="/x", table_path="/t")

    def test_bad_output_mode(self):
        with pytest.raises(ConfigError):
            ReplayConfig(segments_path="/x", table_path="/t", output_mode="yaml")

    def test_range_ordering(self):
        with pytest.raises(ConfigError):
            ReplayConfig(
                segments_path="/x", table_path="/t",
                from_position=(2, 100), to_position=(2, 100),
            )

    def test_apply_needs_table_path(self):
        with pytest.raises(ConfigError):
            ReplayConfig(segments_path="/x", output_mode="apply")

    def test_invalid_filter_pattern_rejected(self):
        with pytest.raises(Exception):
            ReplayConfig(segments_path="/x", table_path="/t", include_tables=["*.*"])

    def test_from_json_with_binlog_file_names(self):
        cfg = ReplayConfig.from_json(json.dumps({
            "segments_path": "/x", "table_path": "/t",
            "from_binlog_file": "binlog.000002", "from_binlog_position": 4,
            "to_binlog_file": "binlog.000005", "to_binlog_position": 1000,
            "exclude_tables": ["scratch.*"],
        }))
        assert cfg.from_position == (2, 4)
        assert cfg.to_position == (5, 1000)
        assert not cfg.table_filter().matches("scratch", "t")

    def test_unknown_keys_rejected(self):
        with pytest.raises(ConfigError):
            ReplayConfig.from_json(json.dumps({"segments_path": "/x", "table_path": "/t", "bogus": 1}))


class TestRunReplay:
    def test_config_driven_apply(self, spark, tmp_path):
        from myzql_binlog_connector_spark.genlog import (
            generate_stream,
            write_segments_parquet,
        )

        stream = generate_stream(seed=31, n_convs=20, n_segments=2)
        write_segments_parquet(stream, str(tmp_path / "seg"))
        cfg = ReplayConfig(
            segments_path=str(tmp_path / "seg"),
            table_path=str(tmp_path / "t"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            n_buckets=4,
        )
        records, state = run_replay(spark, cfg)
        assert len(records) == 2  # one micro-batch per segment
        got = {(r.conv_id, r.turn_idx): r.text for r in state.collect()}
        want = {k: v[3] for k, v in stream.truth.items()}
        assert got == want

    def test_config_driven_envelope(self, spark, tmp_path):
        from myzql_binlog_connector_spark.genlog import (
            generate_stream,
            write_segments_parquet,
        )

        stream = generate_stream(seed=31, n_convs=10, n_segments=2)
        write_segments_parquet(stream, str(tmp_path / "seg"))
        cfg = ReplayConfig(
            segments_path=str(tmp_path / "seg"), output_mode="envelope",
        )
        _, env = run_replay(spark, cfg)
        assert env.count() > 0
        assert "after_values" in env.columns


class TestReferenceConfigVerbatim:
    """Round-5: the reference's own shipped config files load unmodified
    (key spellings from config.zig; /root/reference/config.example.json
    et al).  The connection keys carry through for the capture daemon; the
    replay keys map onto the engine's equivalents."""

    EXAMPLE = {
        "host": "127.0.0.1",
        "port": 3306,
        "user": "repl_user",
        "password": "",
        "database": "mysql",
        "from_binlog_file": "binlog.000001",
        "from_binlog_position": 4,
        "to_binlog_file": "binlog.000002",
        "to_binlog_position": 12345678,
        "exclude": ["excluded_schema.*", "*.excluded_table"],
        "output_mode": "parquet",
        "parquet_output_dir": "./parquet_output",
        "parquet_batch_size": 8192,
    }

    def test_example_config_loads(self):
        import json as _json

        from myzql_binlog_connector_spark.config import ReplayConfig

        cfg = ReplayConfig.from_json(_json.dumps(self.EXAMPLE))
        assert cfg.host == "127.0.0.1" and cfg.user == "repl_user"
        assert cfg.from_position == (1, 4)
        assert cfg.to_position == (2, 12345678)
        assert cfg.exclude_tables == ["excluded_schema.*", "*.excluded_table"]
        assert cfg.output_mode == "envelope"  # reference 'parquet' mode
        assert cfg.arrow_batch_rows == 8192
        assert cfg.parquet_output_dir == "./parquet_output"

    def test_docker_ssl_config_loads(self):
        import json as _json

        from myzql_binlog_connector_spark.config import ReplayConfig

        raw = dict(self.EXAMPLE, ssl=True, log_level="debug",
                   log_file="run.log", port=23306)
        raw.pop("exclude")
        cfg = ReplayConfig.from_json(_json.dumps(raw))
        assert cfg.ssl is True and cfg.port == 23306
        assert cfg.log_level == "debug"

    def test_actual_reference_files_if_present(self):
        import os

        from myzql_binlog_connector_spark.config import ReplayConfig

        ref = "/root/reference"
        if not os.path.isdir(ref):
            import pytest

            pytest.skip("reference checkout not present")
        for name in ("config.example.json", "config.parquet.json",
                     "config.docker-ssl.json"):
            cfg = ReplayConfig.from_json(os.path.join(ref, name))
            assert cfg.host and cfg.output_mode == "envelope"

    def test_sourceless_config_rejected(self):
        import pytest

        from myzql_binlog_connector_spark.config import ConfigError, ReplayConfig

        with pytest.raises(ConfigError, match="source"):
            ReplayConfig(output_mode="envelope")

    def test_run_replay_requires_segment_store(self, spark):
        import json as _json

        import pytest

        from myzql_binlog_connector_spark.config import (
            ConfigError,
            ReplayConfig,
            run_replay,
        )

        cfg = ReplayConfig.from_json(_json.dumps(self.EXAMPLE))
        with pytest.raises(ConfigError, match="segments_path"):
            run_replay(spark, cfg)

    def test_narrowed_names_plumbs_to_applier(self):
        import json as _json

        from myzql_binlog_connector_spark.config import ReplayConfig

        cfg = ReplayConfig.from_json(_json.dumps({
            "segments_path": "/tmp/seg",
            "table_path": "/tmp/t",
            "narrowed_names": {"5": ["conv_id", "turn_idx", "role", "text", "ts"]},
        }))
        assert cfg.narrowed_names == {"5": ["conv_id", "turn_idx", "role", "text", "ts"]}
        # the applier coerces JSON string keys to int and validates on use
        from myzql_binlog_connector_spark.plans.apply import TranscriptsApplier

        class _T:  # no Spark needed for constructor-level checks
            pass

        ap = TranscriptsApplier(None, _T(), narrowed_names=cfg.narrowed_names)
        assert ap._names_for_count(5) == ["conv_id", "turn_idx", "role", "text", "ts"]
