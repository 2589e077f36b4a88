"""Plan-shape guards: no query may plan an unbounded CartesianProduct —
every similarity/dedup join must stay banded/bucketed/broadcast.  (The IVF
centroid assignment intentionally uses BroadcastNestedLoopJoin with a
K-row build side — that is the algorithm, not an accident — so BNLJ is
allowed only there.)"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

# queries whose plans we pin (the expensive/join-heavy ones)
GUARDED = [
    "minhash_dup_pairs",
    "minhash_dup_clusters",
    "simhash_dup_pairs",
    "ngram_jaccard_pairs",
    "embedding_near_dup",
    "lsh_buckets",
    "ann_cosine_topk",
    "asof_join_events",
    "broadcast_region_rollup",
    "semi_join_big_orders",
    "anti_join_quiet_customers",
    "decontaminate_docs",
    "dedup_survivors",
]

BNLJ_ALLOWED = {"ann_ivf_topk", "ann_cosine_topk"}  # broadcast probe/centroid crosses


@pytest.mark.parametrize("name", GUARDED + ["ann_ivf_topk"])
def test_no_cartesian_product(spark, name):
    import __spark_entry__ as entry

    df = entry.queries()[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, name


# similarity hot paths must stay whole-stage-codegen: Spark higher-order
# functions (aggregate/zip_with/transform lambdas) run interpreted, ~50×
# slower per element — banned from these plans.
HOF_GUARDED = ["ann_cosine_topk", "ann_ivf_topk", "lsh_buckets", "embedding_near_dup"]


@pytest.mark.parametrize("name", HOF_GUARDED)
def test_no_interpreted_hof(spark, name):
    import __spark_entry__ as entry

    df = entry.queries()[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "lambdafunction" not in plan.lower(), name


def test_aligned_merge_subset_bucket_cols_one_shuffle(spark):
    """The aligned-write plan's load-bearing assumption with bucket_cols:
    repartitioning on a SUBSET of the grouping keys must still satisfy the
    LWW aggregate's ClusteredDistribution (equal full key ⇒ equal subset ⇒
    same partition), so the merge keeps exactly ONE exchange.  If a Spark
    upgrade ever stops recognizing subset satisfaction, this pins it."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", 0, "x", False, 1, 1, 1)],
        "conv_id string, turn_idx bigint, text string, _deleted boolean, "
        "_gtid bigint, _event_seq bigint, _event_row_index bigint",
    )
    row = F.struct(*[F.col(c) for c in df.columns])
    ordc = F.struct(
        F.col("_gtid"), F.col("_event_seq"), F.col("_event_row_index")
    )
    plan = (
        df.repartition(8, F.col("conv_id"))
        .groupBy("conv_id", "turn_idx")
        .agg(F.max_by(row, ordc).alias("_row"))
        .select("_row.*")
    )
    s = plan._jdf.queryExecution().executedPlan().toString()
    assert s.count("Exchange") == 1, s
