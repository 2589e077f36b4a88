"""Binlog segment store source (S1/S2 of SURVEY.md §2.1).

The reference tails a TCP replication stream; the engine's equivalent
source is a *segment store*: each binlog file (rotation unit,
binlog_reader.zig:376-393) lands as one parquet file of framed event
packets — FIXTURES.md F2 layout:

    file_seq int32 | offset int64 | gtid int64 | event_seq int64 |
    event_blob binary

Batch reads and Structured-Streaming reads share this schema.  In
streaming, the file boundary IS the rotation boundary, so rotation
handling (S7) is free: ``maxFilesPerTrigger`` bounds a micro-batch to
whole segments and the per-segment decode session sees a complete,
self-describing unit.

At 100 TB the store is tens of thousands of segment files; the file-stream
source tracks per-file offsets in the checkpoint, scan parallelism is one
task per segment (no shuffle to ingest), and bounded replay prunes files via
the ``file_seq``/``offset`` columns pushed into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from pyspark.sql.types import ByteType

EVENTS_SCHEMA = StructType(
    [
        StructField("file_seq", IntegerType(), False),
        StructField("offset", LongType(), False),
        StructField("gtid", LongType(), False),
        StructField("event_seq", LongType(), False),
        StructField("event_type", ByteType(), True),
        StructField("event_blob", BinaryType(), False),
    ]
)


def read_segments(spark: SparkSession, path: str) -> DataFrame:
    """Batch read of the whole segment store (bounded replay)."""
    return spark.read.schema(EVENTS_SCHEMA).parquet(path)


def stream_segments(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Streaming read; one segment file per micro-batch by default —
    the backpressure analogue of the reference's bounded event queue
    (mpsc_queue.zig:57-78 → maxFilesPerTrigger)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)
