"""Z-order effectiveness bench (round-6 directive #5).

The pruning-invariant sweep proves z-order CORRECT; this measures the
IO win it exists for.  In this lake's layout keys hash across buckets,
so every bucket file's (x, y) min/max span the full range — z-order's
skip surface is parquet ROW GROUPS inside each bucket file (the stats
the pushed range predicates consult), not whole files.  Methodology is
the Appendix H point-lookup one, one level down: count row groups whose
recorded [min, max] intersect each query box, z-ordered vs linearly
sorted, over deterministic seeded query workloads.

Three query classes show the full story:
- x-only range: a linear sort BY X is optimal here — z-order pays a
  bounded locality tax on its leading dimension,
- y-only range: the linear sort is blind (scans ~100%), z-order still
  skips — the multi-dimension win,
- (x, y) box: both constrain, z-order's curve locality compounds.

Small row groups (parquet.block.size=512KB) give the bench file the
row-group COUNT a 100 TB bucket file has at the default 128 MB block.

Prints one JSON line for BENCH/BASELINE.md Appendix J.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

N_ROWS = int(os.environ.get("ZORDER_BENCH_ROWS", "4000000"))
N_BUCKETS = 4
DOMAIN = 100_000
N_QUERIES = 40
FRAC = 0.05  # per-dimension query width


def build_table(spark, root: str, mode: str):
    from pyspark.sql import functions as F

    from myzql_binlog_connector_spark.plans.lake import BucketedLakeTable

    t = BucketedLakeTable(
        spark, os.path.join(root, mode), ["conv_id", "turn_idx"],
        n_buckets=N_BUCKETS, stats_cols=["x", "y"],
    )
    df = (
        spark.range(N_ROWS)
        .select(
            F.concat(F.lit("k"), F.col("id")).alias("conv_id"),
            F.lit(0).cast("bigint").alias("turn_idx"),
            F.pmod(F.hash(F.col("id")), F.lit(DOMAIN)).cast("bigint").alias("x"),
            F.pmod(F.hash(F.col("id") * 7 + 1), F.lit(DOMAIN)).cast("bigint").alias("y"),
            F.lit(False).alias("_deleted"),
            F.lit(1).cast("bigint").alias("_gtid"),
            F.col("id").alias("_event_seq"),
            F.lit(1).cast("bigint").alias("_event_row_index"),
        )
    )
    t.merge(df, batch_id=0)
    if mode == "zorder":
        t.compact(zorder_by=["x", "y"], buckets=list(range(N_BUCKETS)))
    else:
        t.compact(sort_by=["x"], buckets=list(range(N_BUCKETS)))
    return t


def rowgroup_stats(t):
    """[(x_min, x_max, y_min, y_max, n_rows)] over every row group of the
    table's current files — the exact stats a pushed predicate consults."""
    import pyarrow.parquet as pq

    m = t.snapshot_manifest()
    out = []
    for fl in m["files"].values():
        for p in fl:
            md = pq.ParquetFile(p).metadata
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                sx = g.column(names["x"]).statistics
                sy = g.column(names["y"]).statistics
                out.append((sx.min, sx.max, sy.min, sy.max, g.num_rows))
    return np.array(out, dtype=np.int64)


def scanned_fraction(rg, boxes):
    """Mean fraction of row groups intersecting each box (None bound =
    unconstrained)."""
    fr = []
    for (xlo, xhi, ylo, yhi) in boxes:
        hit = np.ones(len(rg), dtype=bool)
        if xlo is not None:
            hit &= (rg[:, 1] >= xlo) & (rg[:, 0] <= xhi)
        if ylo is not None:
            hit &= (rg[:, 3] >= ylo) & (rg[:, 2] <= yhi)
        fr.append(hit.mean())
    return round(float(np.mean(fr)), 4)


def timed_counts_alternating(tables: dict, boxes, n_pairs: int = 3):
    """Wall time for the box workload as actual pushed-filter scans —
    ALTERNATING between the tables inside one window (the same A/B
    discipline as scripts/ab_*: sequential blocks let host drift
    masquerade as a difference)."""

    def once(t):
        t0 = time.monotonic()
        n = 0
        for (xlo, xhi, ylo, yhi) in boxes:
            df = t.read(ranges={"x": (xlo, xhi), "y": (ylo, yhi)})
            n += df.count()
        return round(time.monotonic() - t0, 3), n

    counts = set()
    for t in tables.values():  # warm both arms
        _, n = once(t)
        counts.add(n)
    trials: dict[str, list[float]] = {k: [] for k in tables}
    for _ in range(n_pairs):
        for name, t in tables.items():
            sec, n = once(t)
            counts.add(n)
            trials[name].append(sec)
    assert len(counts) == 1, counts  # skipping never changes results
    return trials, counts.pop()


def main() -> None:
    spark = bench.build_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    # small row groups so the bench FILE has the row-group count a 100 TB
    # bucket file has at the default 128 MB block (runtime spark.conf.set
    # does not reach the Hadoop conf — set it on hadoopConfiguration)
    spark.sparkContext._jsc.hadoopConfiguration().set(
        "parquet.block.size", str(512 * 1024)
    )
    root = bench.scratch_dir("zorder_bench_")
    try:
        rs = np.random.RandomState(11)
        width = int(DOMAIN * FRAC)
        los = rs.randint(0, DOMAIN - width, size=(N_QUERIES, 2))
        box = [(int(x), int(x) + width, int(y), int(y) + width) for x, y in los]
        x_only = [(int(x), int(x) + width, None, None) for x, _ in los]
        y_only = [(None, None, int(y), int(y) + width) for _, y in los]

        out = {"bench": "zorder_effectiveness", "rows": N_ROWS,
               "n_buckets": N_BUCKETS, "queries": N_QUERIES,
               "box_frac_per_dim": FRAC}
        tables = {}
        for mode in ("zorder", "linear_x"):
            t = build_table(spark, root, mode)
            rg = rowgroup_stats(t)
            tables[mode] = t
            out[mode] = {
                "row_groups": int(len(rg)),
                "scanned_frac": {
                    "x_only": scanned_fraction(rg, x_only),
                    "y_only": scanned_fraction(rg, y_only),
                    "box": scanned_fraction(rg, box),
                },
            }
        trials, n_matched = timed_counts_alternating(tables, box)
        out["box_scan_sec"] = {
            "zorder": statistics.median(trials["zorder"]),
            "zorder_trials": trials["zorder"],
            "linear_x": statistics.median(trials["linear_x"]),
            "linear_x_trials": trials["linear_x"],
            "rows_matched": n_matched,
        }
        zf = out["zorder"]["scanned_frac"]
        lf = out["linear_x"]["scanned_frac"]
        out["io_ratio_vs_linear"] = {
            k: round(lf[k] / max(1e-9, zf[k]), 2) for k in zf
        }
        print(json.dumps(out))
    finally:
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
