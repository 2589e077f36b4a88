"""Same-window alternating A/B: envelope-path (decode_changes) flush bound.

Round-6 directive #2.  The per-core flush sizing that fixed the TYPED path's
local[32] regression (functions/decode.py:_vec_flush_rows) also changed the
ENVELOPE path's batch size: at 32 cores decode_changes now flushes 32k-row
batches where round 4 used 512k.  The typed path feeds a zero-shuffle count;
the envelope path here feeds a full repartition — more, smaller Arrow
batches may amortize the exchange worse.  Hypothesis to test: the two paths
have different flush optima.

Method: one JVM, one fixture (the bench.py sf0.1 CDC cache), alternating
A (per-core formula, the round-5 default) and B (512k, the round-4 bound)
decode_changes(events).count() runs — alternation inside a single window is
the only design the host's ±15-50% hourly noise can't fool.

Usage: python scripts/ab_envelope_flush.py [n_pairs=4]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench harness: fixture + spark builder)


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_tag = os.path.basename(
        os.path.normpath(os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    )
    spark = bench.build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from myzql_binlog_connector_spark.functions.decode import (
        _vec_flush_rows,
        decode_changes,
    )

    seg_dir, n_ops = bench.ensure_cdc_fixture(sf_tag)
    events = spark.read.parquet(seg_dir)
    decode_changes(events).count()  # warm: workers, codegen, page cache

    variants = {
        "A_percore": str(_vec_flush_rows(spark.sparkContext.defaultParallelism)),
        "B_512k": str(1 << 19),
    }
    times: dict[str, list[float]] = {k: [] for k in variants}
    n_rows = None
    for _ in range(n_pairs):
        for name, flush in variants.items():
            os.environ["SPARK_GRAFT_VEC_FLUSH_ROWS"] = flush
            t0 = time.monotonic()
            n_rows = decode_changes(events).count()
            times[name].append(round(time.monotonic() - t0, 3))
    os.environ.pop("SPARK_GRAFT_VEC_FLUSH_ROWS", None)

    out = {
        "bench": "envelope_flush_ab",
        "sf": sf_tag,
        "cpus": cpus,
        "rows": n_rows,
        "flush_rows": {k: int(v) for k, v in variants.items()},
        "trials": times,
        "median": {k: round(statistics.median(v), 3) for k, v in times.items()},
        "best": {k: min(v) for k, v in times.items()},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
