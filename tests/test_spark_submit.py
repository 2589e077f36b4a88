"""The north-rule run mode, actually executed: `spark-submit --py-files
dist/engine.zip scripts/submit_replay.py` in a SUBPROCESS whose working
directory and PYTHONPATH do NOT contain the repo — the engine must reach
the driver and executors only through the zip, exactly as it would on a
yarn/k8s cluster."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_submit_replay_via_pyfiles_zip(tmp_path):
    from myzql_binlog_connector_spark.genlog import (
        generate_stream,
        write_segments_parquet,
    )

    stream = generate_stream(seed=42, n_convs=40, n_segments=4)
    seg_dir = str(tmp_path / "segs")
    write_segments_parquet(stream, seg_dir)

    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_pyfiles.py")],
        check=True, capture_output=True, cwd=REPO,
    )
    zip_path = os.path.join(REPO, "dist", "engine.zip")
    assert os.path.exists(zip_path)

    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)  # the zip must be the only source
    }
    env["PYSPARK_PYTHON"] = sys.executable
    table_dir = str(tmp_path / "table")
    proc = subprocess.run(
        [
            spark_submit, "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "submit_replay.py"),
            seg_dir, table_dir, "4",
        ],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path),  # NOT the repo
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert out["final_rows"] == len(stream.truth)
    assert out["record"]["input_rows"] > 0
