"""spark-submit job: bounded binlog replay → lake table (north-rule run mode).

Usage:
  python scripts/make_pyfiles.py                       # builds dist/engine.zip
  spark-submit --master local[8] \\
      --py-files dist/engine.zip \\
      scripts/submit_replay.py <segments_dir> <table_dir> [n_buckets]

On a real cluster, swap --master for yarn/k8s and the same zip ships the
engine to executors (no cluster-side install).  Prints one JSON line with
the apply record and final row count.
"""

import glob
import json
import sys

from pyspark.sql import SparkSession


def main():
    segments_dir, table_dir = sys.argv[1], sys.argv[2]
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    spark = (
        SparkSession.builder.appName("binlog-replay")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    # imported from the --py-files zip on executors
    from myzql_binlog_connector_spark.plans.apply import TranscriptsApplier
    from myzql_binlog_connector_spark.plans.lake import BucketedLakeTable

    paths = sorted(glob.glob(f"{segments_dir}/*.parquet"))
    table = BucketedLakeTable(spark, table_dir, ["conv_id", "turn_idx"], n_buckets=n_buckets)
    applier = TranscriptsApplier(spark, table)
    record = applier.apply_files(paths, batch_id=0)
    out = {"record": record, "final_rows": table.read().count()}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
