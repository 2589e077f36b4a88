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
