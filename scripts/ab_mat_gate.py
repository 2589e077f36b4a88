"""Same-window alternating A/B: the `_mat` raggedness-gate cost.

Round-7 directive #1.  Round 6 added an exact raggedness gate to `_mat`
as ``np.fromiter(map(len, v), ...)`` — one Python ``len`` call per row on
every invocation, and ``dot_arrow`` calls `_mat` twice per batch on the
candidate-pair join output, so ``embedding_near_dup`` regressed
1.79s → 5.01s.  Round 7 moves the scalar hot paths to ``arrow_udf``
(pyspark 4.1): the ListArray arrives zero-copy, and the gate becomes ONE
vectorized ``pc.list_value_length`` pass over the list offsets.

Method: one JVM, one fixture (bench.py's embeddings table at bench SF),
alternating A (arrow_udf + offsets gate, the new default) and B (the
round-6 pandas_udf forms with the per-row gate, reconstructed here and
monkeypatched in) runs of the full ``embedding_near_dup`` query —
alternation inside a single window is the only design the host's hourly
drift can't fool (round-6 Appendix G measured +40-48% drift on untouched
queries across a suite window).

Usage: python scripts/ab_mat_gate.py [n_pairs=4]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

import bench  # noqa: E402


def _legacy_udfs():
    """The round-6 pandas_udf forms (per-row `len` gate via `_mat`),
    reconstructed verbatim for the B arm."""
    from pyspark.sql.functions import pandas_udf
    from myzql_binlog_connector_spark.operators.similarity import (
        _mat,
        _seq_rowdot,
        plane_signs,
    )

    def dot_arrow(a, b, dims=64):
        @pandas_udf("double")
        def f(x: pd.Series, y: pd.Series) -> pd.Series:
            return pd.Series(_seq_rowdot(_mat(x, dims), _mat(y, dims)))

        return f(a, b)

    def norm_arrow(a, dims=64):
        @pandas_udf("double")
        def f(x: pd.Series) -> pd.Series:
            A = _mat(x, dims)
            return pd.Series(np.sqrt(_seq_rowdot(A, A)))

        return f(a)

    def lsh_bucket_arrow(vec_col, dims, n_planes=16):
        signs = [plane_signs(j, dims) for j in range(n_planes)]

        @pandas_udf("long")
        def f(v: pd.Series) -> pd.Series:
            S = np.array(signs, dtype=np.float64)
            V = _mat(v, dims)
            proj = np.zeros((V.shape[0], n_planes), dtype=np.float64)
            for j in range(dims):
                proj = proj + V[:, j, None] * S[None, :, j]
            bits = (proj >= 0).astype(np.int64) << np.arange(
                n_planes, dtype=np.int64
            )
            return pd.Series(bits.sum(axis=1))

        return f(vec_col)

    return dot_arrow, norm_arrow, lsh_bucket_arrow


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = bench.build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from myzql_binlog_connector_spark.operators import similarity

    new = (
        similarity.dot_arrow,
        similarity.norm_arrow,
        similarity.lsh_bucket_arrow,
    )
    old = _legacy_udfs()

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    emb.count()  # warm page cache + workers

    def run():
        return similarity.embedding_near_dup_pairs(
            emb, threshold=0.3, dims=64, n_planes=8
        ).count()

    # warm both arms once (codegen, Python worker pools for both UDF evals)
    n_rows = run()
    for fns in (old, new):
        (
            similarity.dot_arrow,
            similarity.norm_arrow,
            similarity.lsh_bucket_arrow,
        ) = fns
        run()

    times: dict[str, list[float]] = {"A_arrow_offsets": [], "B_perrow_len": []}
    counts = set()
    for _ in range(n_pairs):
        for name, fns in (("A_arrow_offsets", new), ("B_perrow_len", old)):
            (
                similarity.dot_arrow,
                similarity.norm_arrow,
                similarity.lsh_bucket_arrow,
            ) = fns
            t0 = time.monotonic()
            counts.add(run())
            times[name].append(round(time.monotonic() - t0, 3))
    (
        similarity.dot_arrow,
        similarity.norm_arrow,
        similarity.lsh_bucket_arrow,
    ) = new

    assert len(counts) == 1, f"arms disagree on pair count: {counts}"
    out = {
        "bench": "mat_gate_ab",
        "query": "embedding_near_dup",
        "sf_dir": sf_dir,
        "cpus": cpus,
        "pairs_found": n_rows,
        "trials": times,
        "median": {k: round(statistics.median(v), 3) for k, v in times.items()},
        "best": {k: min(v) for k, v in times.items()},
        "speedup_median": round(
            statistics.median(times["B_perrow_len"])
            / statistics.median(times["A_arrow_offsets"]),
            3,
        ),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
