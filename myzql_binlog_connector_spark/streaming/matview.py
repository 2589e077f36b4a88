"""Incremental materialized views over the change feed.

The third classic CDC consumer (after stdout and replication): keep an
AGGREGATE table — per-conversation stats, per-role counts — continuously
up to date from the primary's change feed without ever rescanning the
full base table.  Delta calls this pattern "incremental refresh from CDF";
this module packages it as one call::

    from pyspark.sql import functions as F
    from myzql_binlog_connector_spark.streaming.matview import materialize

    q = materialize(
        spark, source_path=src.path, view=view_table, checkpoint=ckpt,
        group_cols=["conv_id"],
        aggs={"n_turns": F.count(F.lit(1)),
              "last_ts": F.max("ts"),
              "total_chars": F.sum(F.length("text"))},
    )
    q.processAllAvailable()   # or leave running for a live view

Refresh algorithm — **group-scoped recompute**, the only maintenance
strategy that is exact for a keyed LWW base without preimages (the feed
ships post-state upserts + tombstones; subtracting an UPDATE's old value
from a SUM would need the preimage Delta CDF materializes at write time —
a merge-on-read primary deliberately never reads old state on the write
path):

1. every change row in a micro-batch names its group (``group_cols`` must
   be key columns, and tombstones carry their keys), so the batch's
   distinct groups are exactly the groups whose aggregate MAY have moved;
2. recompute those groups — and only those — from the base table's
   current snapshot; groups with no surviving rows become tombstones in
   the view;
3. LWW-merge the refreshed rows into the view ordered by the feed commit
   version, so replays and overlapping refreshes resolve newest-wins.

**Scale shape.**  Per-batch cost is O(rows of changed groups), not
O(table): when the base is bucketed by the group columns
(``bucket_cols=group_cols`` — the natural transcripts layout), step 2 is
a bucket-pruned ``read(keys=[{group: ...}])`` that scans only the dirty
groups' buckets; otherwise it falls back to one scan with a broadcast
semi-join on the (batch-bounded) group set.  The driver-side group
collect is capped at ``max_pruned_groups`` — beyond that the refresh
switches to the semi-join scan, which a batch that big amortizes anyway.

**Consistency.**  Step 2 reads the base's CURRENT snapshot, which may
already include commits later than the micro-batch — that refresh is then
"from the future" for this batch, but every group that moved later is by
construction named in a later micro-batch and gets re-refreshed with a
higher version: the view converges to the exact aggregate of the primary
at stream quiescence (the property the tests pin), which is the standard
materialized-view contract (staleness bounded by feed lag, never wrong
at rest).  Crash replays re-run a refresh at the same version with
equal-or-newer input — LWW ties are between identical-or-converging rows.

**Schema evolution**: like ``replicate()``, a mid-stream ADD COLUMN on
the primary stops the query loud (``FeedSchemaChangedError``); re-run
``materialize`` with the same checkpoint to resume — the aggregate
expressions see the evolved schema after restart.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..plans.lake import BucketedLakeTable
from .feed import COMMIT_VERSION_COL, LakeChangesDataSource

#: refreshes with at most this many distinct dirty groups collect them to
#: the driver for a bucket-pruned read; larger sets use a semi-join scan
#: (bounded driver memory, fail-safe — never a silent cap)
MAX_PRUNED_GROUPS = 10_000


def _with_meta(df: DataFrame, version: int) -> DataFrame:
    """Stamp refresh rows with the view's LWW order: the feed commit
    version (bigint, matching the ecosystem's _gtid type)."""
    return (
        df.withColumn("_gtid", F.lit(int(version)).cast("bigint"))
        .withColumn("_event_seq", F.lit(0).cast("bigint"))
        .withColumn("_event_row_index", F.lit(0).cast("bigint"))
    )


def _refresh_groups(
    source: BucketedLakeTable,
    view: BucketedLakeTable,
    groups: DataFrame,
    group_cols: list[str],
    aggs: dict[str, Column],
    version: int,
    batch_id: str,
    max_pruned_groups: int = MAX_PRUNED_GROUPS,
) -> dict:
    """Recompute ``aggs`` for the ``groups`` and LWW-merge into ``view``
    at feed ``version``.  Returns the view's merge record."""
    groups = groups.persist()
    try:
        n_groups = groups.count()
        if n_groups == 0:
            return {"skipped": True, "refreshed_groups": 0}
        pruned = (
            set(source.bucket_cols) <= set(group_cols)
            and n_groups <= max_pruned_groups
        )
        if pruned:
            # bounded collect (<= max_pruned_groups rows of key columns):
            # buys a bucket-pruned read that scans only dirty groups
            keys = [r.asDict() for r in groups.collect()]
            state = source.read(keys=keys)
        else:
            state = source.read().join(
                F.broadcast(groups), on=group_cols, how="leftsemi"
            )
        fresh = state.groupBy(*group_cols).agg(
            *[expr.alias(name) for name, expr in aggs.items()]
        )
        # groups whose last surviving row was deleted produce no aggregate
        # row — they leave the view as tombstones
        gone = groups.join(fresh.select(*group_cols), on=group_cols, how="left_anti")
        for name in aggs:
            gone = gone.withColumn(name, F.lit(None))
        changes = _with_meta(
            fresh.withColumn("_deleted", F.lit(False)).unionByName(
                gone.withColumn("_deleted", F.lit(True))
            ),
            version,
        )
        return view.merge(
            changes,
            batch_id=batch_id,
            extra_lineage={
                "refreshed_groups": n_groups,
                "pruned_refresh": pruned,
                "feed_version": int(version),
            },
        )
    finally:
        groups.unpersist()


def bootstrap(
    source: BucketedLakeTable,
    view: BucketedLakeTable,
    group_cols: list[str],
    aggs: dict[str, Column],
) -> int:
    """Seed ``view`` with the full aggregate of a pinned source snapshot;
    returns the snapshot version (follow the feed from version + 1).
    Snapshot and feed start come from ONE manifest read — the same
    race-free handoff ``replicate()`` uses."""
    snap, version = source.snapshot_with_version()
    fresh = snap.groupBy(*group_cols).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    changes = _with_meta(fresh.withColumn("_deleted", F.lit(False)), version)
    view.merge(changes, batch_id=f"bootstrap-v{version}")
    return version


def materialize(
    spark: SparkSession,
    source_path: str,
    view: BucketedLakeTable,
    checkpoint: str,
    group_cols: list[str],
    aggs: dict[str, Column],
    bootstrap_from: BucketedLakeTable | None = None,
    max_versions_per_batch: int | None = None,
    max_pruned_groups: int = MAX_PRUNED_GROUPS,
):
    """Start (or resume) an incrementally-maintained aggregate view of the
    table at ``source_path``; returns the StreamingQuery.

    ``view`` must be keyed by ``group_cols``.  ``group_cols`` must be key
    columns of the source (tombstones carry keys, so every change row —
    including deletes — names its group; a payload-column grouping would
    need preimages the feed does not ship).  ``aggs``: {output_col:
    aggregate Column over the source's payload rows}.

    ``bootstrap_from``: pass the SOURCE handle on first run to seed the
    view from a pinned snapshot; leave None on checkpoint resume (the
    checkpoint holds the feed position)."""
    if list(view.key_cols) != list(group_cols):
        raise ValueError(
            f"view must be keyed by group_cols {list(group_cols)}, "
            f"got {view.key_cols}"
        )
    refresh_source = bootstrap_from
    start_after = 0
    if bootstrap_from is not None:
        start_after = bootstrap(bootstrap_from, view, group_cols, aggs)
    else:
        # resume: open the source with its committed identity/layout
        probe = BucketedLakeTable(spark, source_path, list(group_cols))
        m = probe._read_manifest()
        refresh_source = BucketedLakeTable(
            spark,
            source_path,
            list(m.get("key_cols") or group_cols),
            n_buckets=int(m.get("n_buckets", 64)),
        )
        refresh_source._sync_layout(m)
    if not set(group_cols) <= set(refresh_source.key_cols):
        raise ValueError(
            f"group_cols {list(group_cols)} must be key columns of the "
            f"source {refresh_source.key_cols} (delete rows carry only keys)"
        )

    spark.dataSource.register(LakeChangesDataSource)
    reader = (
        spark.readStream.format("lake_changes")
        .option("path", source_path)
        .option("startingVersion", start_after + 1)
    )
    if max_versions_per_batch:
        reader = reader.option("maxVersionsPerBatch", max_versions_per_batch)

    def refresh(batch_df, epoch_id: int):
        # persist: the micro-batch feeds two actions (version agg + the
        # group-scoped refresh) — without it each action re-drains the
        # Python data-source read
        batch_df = batch_df.persist()
        try:
            if batch_df.isEmpty():
                return
            version = batch_df.agg(
                F.max(COMMIT_VERSION_COL).alias("v")
            ).collect()[0]["v"]
            groups = batch_df.select(*group_cols).dropDuplicates()
            _refresh_groups(
                refresh_source, view, groups, list(group_cols), aggs,
                int(version), batch_id=f"refresh-v{version}",
                max_pruned_groups=max_pruned_groups,
            )
        finally:
            batch_df.unpersist()

    return (
        reader.load()
        .writeStream.foreachBatch(refresh)
        .option("checkpointLocation", checkpoint)
        .start()
    )
