"""Embedding similarity: brute-force cosine top-k and LSH-bucketed ANN.

Brute force is the correctness baseline (probe × corpus broadcast join —
the probe set is small and broadcast, so the corpus never shuffles).  The
scale path is random-hyperplane LSH: 16 deterministic ±1 sign planes bucket
vectors into 2^16 cells; candidate pairs share a bucket, then exact cosine
verifies.  At 10^9 vectors the bucket join replaces the O(N²) cross join
with an equi-join on ``bucket`` — standard shuffle-hash territory, skew
handled by AQE since bucket cardinality is high.

All arithmetic is double-precision ``F.aggregate``/``F.zip_with`` column
algebra (JVM codegen).  Hyperplane signs are md5-derived constants embedded
as literals, so the DuckDB oracles share them exactly.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window, functions as F


# ---------------------------------------------------------------------------
# deterministic hyperplanes
# ---------------------------------------------------------------------------


def plane_signs(plane: int, dims: int) -> list[int]:
    """±1 signs for one hyperplane, derived from md5 — deterministic and
    engine-independent (shared with the SQL oracle as literals)."""
    out = []
    for d in range(dims):
        h = hashlib.md5(f"plane:{plane}:{d}".encode()).digest()
        out.append(1 if h[0] & 1 else -1)
    return out


# ---------------------------------------------------------------------------
# cosine primitives
# ---------------------------------------------------------------------------


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_sql(a: str, b: str) -> str:
    """DuckDB mirror — explicit double-precision dot/norms (same formula;
    list_cosine_similarity agrees to ~1e-12, we round before comparing)."""
    return (
        f"(list_dot_product({a}::DOUBLE[], {b}::DOUBLE[]) / "
        f"(sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[])) * "
        f"sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[]))))"
    )


# ---------------------------------------------------------------------------
# brute-force top-k (baseline)
# ---------------------------------------------------------------------------


def ann_topk_bruteforce(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast the probe set against the corpus.

    Ranking uses the similarity rounded to 4 decimals with id tie-break, so
    results are stable across engines/floating-point orders."""
    from .fuzzy import _spread

    p = probes.select(
        F.col(id_col).alias(probe_id_col), F.col(vec_col).alias("_pvec")
    )
    joined = _spread(corpus).join(F.broadcast(p), F.col(id_col) != F.col(probe_id_col))
    sim = F.round(cosine(F.col(vec_col), F.col("_pvec")), 4)
    scored = joined.select(
        F.col(probe_id_col),
        F.col(id_col).alias("neighbor_id"),
        sim.alias("sim"),
    )
    w = Window.partitionBy(probe_id_col).orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# LSH bucketing (scale path)
# ---------------------------------------------------------------------------


def lsh_bucket(vec_col: Column, dims: int, n_planes: int = 16) -> Column:
    """Random-hyperplane signature: bit j = (vec · plane_j) >= 0."""
    expr = F.lit(0).cast("long")
    for j in range(n_planes):
        signs = F.array(*[F.lit(float(s)) for s in plane_signs(j, dims)])
        proj = dot(vec_col, signs)
        expr = expr + F.when(proj >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return expr


def lsh_bucket_sql(vec_expr: str, dims: int, n_planes: int = 16) -> str:
    terms = []
    for j in range(n_planes):
        signs = plane_signs(j, dims)
        lst = "[" + ", ".join(f"{float(s)}" for s in signs) + "]"
        proj = f"list_dot_product({vec_expr}::DOUBLE[], {lst}::DOUBLE[])"
        terms.append(f"(CASE WHEN {proj} >= 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    n_planes: int = 8,
) -> DataFrame:
    """Near-duplicate vector pairs: LSH-bucket equi-join → exact cosine ≥
    threshold.  Fewer planes ⇒ higher recall (coarser buckets); at 8 planes
    and 0.95 cosine the candidate loss is negligible while the join touches
    only same-bucket pairs."""
    from .fuzzy import _spread

    df = _spread(df)
    b = df.select(
        F.col(id_col), F.col(vec_col), lsh_bucket(F.col(vec_col), dims, n_planes).alias("bucket")
    )
    left = b.alias("l")
    right = b.alias("r")
    pairs = left.join(right, (F.col("l.bucket") == F.col("r.bucket")) & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
    sim = F.round(cosine(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}")), 4)
    return (
        pairs.select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            sim.alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )
