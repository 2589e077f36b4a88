"""Custom stateful streaming operator (applyInPandasWithState).

``conversation_progress`` maintains per-conversation running state over the
decoded change stream: turns applied, deletes seen, last binlog position —
the kind of online per-entity aggregate a training-data ingest pipeline
keeps next to the table (freshness/monitoring, conversation completeness
checks) without re-scanning the lake.

Scale shape: state is partitioned by conv_id (Spark state store shards it
per key group), each micro-batch touches only the keys present in the
batch, and the per-key state is O(1) — at 10^9 conversations the state
store is the bound, not the operator.  Idle conversations ARE reaped:
``ProcessingTimeTimeout`` + ``state.setTimeoutDuration(idle_timeout_ms)``
on every update, ``state.remove()`` on timeout — without it the store
grows monotonically over the stream's lifetime.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PROGRESS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turns_applied", LongType(), False),
        StructField("deletes_seen", LongType(), False),
        StructField("max_gtid", LongType(), True),
        StructField("last_file_seq", IntegerType(), True),
        StructField("last_log_pos", LongType(), True),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("turns_applied", LongType()),
        StructField("deletes_seen", LongType()),
        StructField("max_gtid", LongType()),
        StructField("last_file_seq", IntegerType()),
        StructField("last_log_pos", LongType()),
    ]
)


#: default idle-conversation reap horizon (30 min of processing time)
DEFAULT_IDLE_TIMEOUT_MS = 30 * 60 * 1000


def _make_update(idle_timeout_ms: int):
    """Build the state-update fn as a closure so the timeout ships to the
    workers by value (cloudpickle), not via a module global."""

    def _update(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            # idle-conversation reap: drop the per-key state, emit nothing
            state.remove()
            return
        if state.exists:
            turns, deletes, max_gtid, last_fs, last_lp = state.get
        else:
            turns, deletes, max_gtid, last_fs, last_lp = 0, 0, None, None, None
        for pdf in pdfs:
            n = len(pdf)
            is_del = pdf["dml_type"] == "DELETE"
            deletes += int(is_del.sum())
            turns += n - int(is_del.sum())
            g = int(pdf["gtid"].max()) if n else None
            if g is not None and (max_gtid is None or g > max_gtid):
                max_gtid = g
            # last position = max (file_seq, log_pos)
            idx = pdf[["file_seq", "log_pos"]].astype("int64")
            if n:
                top = idx.sort_values(["file_seq", "log_pos"]).iloc[-1]
                cand = (int(top["file_seq"]), int(top["log_pos"]))
                if last_fs is None or cand > (last_fs, last_lp):
                    last_fs, last_lp = cand
        state.update((turns, deletes, max_gtid, last_fs, last_lp))
        if idle_timeout_ms > 0:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "conv_id": [conv_id],
                "turns_applied": [turns],
                "deletes_seen": [deletes],
                "max_gtid": [max_gtid],
                "last_file_seq": [last_fs],
                "last_log_pos": [last_lp],
            }
        )

    return _update


def conversation_progress(
    changes: DataFrame, idle_timeout_ms: int = DEFAULT_IDLE_TIMEOUT_MS
) -> DataFrame:
    """Running per-conversation progress over a *streaming* change frame
    with columns (conv_id, dml_type, gtid, file_seq, log_pos) — e.g. the
    decoded envelope with conv_id extracted from the row image.

    Conversations idle for ``idle_timeout_ms`` of processing time are
    reaped from the state store (pass 0 to keep state forever).  For
    BOUNDED replays (``availableNow`` triggers) pass 0: a pending
    processing-time timeout keeps the micro-batch engine alive waiting to
    fire it, so the query does not terminate when the data is drained —
    reaping is for continuous tails, where unbounded state is the actual
    risk.

    Output mode must be ``update``; pairs with any sink that upserts."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return changes.select(
        "conv_id", "dml_type", "gtid", "file_seq", "log_pos"
    ).groupBy("conv_id").applyInPandasWithState(
        _make_update(idle_timeout_ms),
        outputStructType=PROGRESS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
