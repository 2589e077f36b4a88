"""CLI entry point — the reference binary's UX, Spark-side.

The reference runs as ``myzql-binlog-connector --config config.json``
(/root/reference/src/main.zig); the engine's equivalent:

    spark-submit --py-files dist/engine.zip -m myzql_binlog_connector_spark \
        --config config.json
    # or locally:
    python -m myzql_binlog_connector_spark --config config.json

Config is the reference's config.json surface re-mapped (config.py):
segment store in, bounded/streaming replay, envelope or apply output.
Prints one JSON summary line on completion.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="myzql_binlog_connector_spark")
    # reference CLI shape: [-v] [--log-file <path>] <config.json>
    ap.add_argument("config_pos", nargs="?", default=None,
                    help="path to config JSON (positional, reference-style)")
    ap.add_argument("--config", default=None, help="path to config JSON")
    ap.add_argument("-v", "--verbose", action="store_true",
                    help="INFO-level Spark logs (default ERROR)")
    ap.add_argument("--log-file", default=None,
                    help="append the run summary (and errors) to this file")
    ap.add_argument("--master", default="local[*]", help="Spark master")
    ap.add_argument(
        "--output",
        default=None,
        help="envelope mode: write the change envelope to this parquet path "
        "(default: count only)",
    )
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args(argv)
    cfg_path = args.config or args.config_pos
    if not cfg_path:
        ap.error("a config JSON path is required (positional or --config)")

    from pyspark.sql import SparkSession

    from .config import ReplayConfig, run_replay

    cfg = ReplayConfig.from_json(cfg_path)
    builder = (
        SparkSession.builder.master(args.master)
        .appName("myzql-binlog-connector-spark")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(cfg.arrow_batch_rows)
        )
    )
    if args.shuffle_partitions:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("INFO" if args.verbose else "ERROR")
    try:
        records, df = run_replay(spark, cfg)
        if cfg.output_mode == "envelope":
            if args.output:
                df.write.mode("overwrite").parquet(args.output)
                n = spark.read.parquet(args.output).count()
            else:
                n = df.count()
            summary = {"mode": "envelope", "change_rows": n, "output": args.output}
        else:
            summary = {
                "mode": "apply",
                "batches": len(records),
                "applied_rows": sum(r.get("input_rows", 0) for r in records),
                "final_rows": df.count(),
                "table_path": cfg.table_path,
            }
        line = json.dumps(summary)
        print(line)
        if args.log_file:
            with open(args.log_file, "a") as f:
                f.write(line + "\n")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
