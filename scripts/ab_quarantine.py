"""Same-window alternating A/B: typed-path quarantine scaffolding cost.

Round-7 directive #7.  Round 5's quarantine-parity directive wrapped the
typed fast path's vectorized kernel in try/group-retry scaffolding
(functions/decode.py make_typed_decoder(on_error="quarantine")); its
HAPPY-PATH cost on a clean stream was never measured (the UTF-8 check
got an A/B in round 6; this didn't).  If >2%, the group-retry should be
made lazy.

Method: one JVM, one fixture (the bench CDC segment store, zero corrupt
events), alternating A (on_error='raise', the default) and B
(on_error='quarantine') runs of the zero-shuffle typed decode
(decode_typed_from_files(...).count()) — the flagship bounded-replay
path where the scaffolding sits.

Usage: python scripts/ab_quarantine.py [n_pairs=4]
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

NAMES = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_tag = os.path.basename(
        os.path.normpath(os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    )
    spark = bench.build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from myzql_binlog_connector_spark.functions.decode import (
        _payload_kinds,
        decode_typed_from_files,
        scan_schemas,
    )

    seg_dir, _ = bench.ensure_cdc_fixture(sf_tag)
    paths = sorted(glob.glob(os.path.join(seg_dir, "*.parquet")))
    sidecar = os.path.join(seg_dir, "_schemas.json")
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            descs = [
                e["desc"] if isinstance(e, dict) else e for e in json.load(f)
            ]
    else:
        descs = [
            r["payload_schema"]
            for r in scan_schemas(spark.read.parquet(*paths)).collect()
        ]
    kinds = _payload_kinds(descs)

    def run(on_error: str) -> int:
        return decode_typed_from_files(
            spark, paths, NAMES, kinds, key_positions=(0, 1),
            on_error=on_error,
        ).count()

    n_rows = run("raise")  # warm: workers, codegen, page cache
    run("quarantine")

    times: dict[str, list[float]] = {"A_raise": [], "B_quarantine": []}
    counts = set()
    for _ in range(n_pairs):
        for name, mode in (("A_raise", "raise"), ("B_quarantine", "quarantine")):
            t0 = time.monotonic()
            counts.add(run(mode))
            times[name].append(round(time.monotonic() - t0, 3))
    assert counts == {n_rows}, counts  # clean stream: same rows both arms

    med = {k: statistics.median(v) for k, v in times.items()}
    out = {
        "bench": "typed_quarantine_ab",
        "sf": sf_tag,
        "cpus": cpus,
        "rows": n_rows,
        "trials": times,
        "median": {k: round(v, 3) for k, v in med.items()},
        "best": {k: min(v) for k, v in times.items()},
        "overhead_pct": round(
            100.0 * (med["B_quarantine"] / med["A_raise"] - 1.0), 2
        ),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
