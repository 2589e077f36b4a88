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
# IVF (inverted-file) ANN — the second scale path
# ---------------------------------------------------------------------------


def ann_topk_ivf(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 3,
    stride: int = 100,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """IVF top-k: partition the corpus into cells around deterministic
    centroids (every ``stride``-th vector — a seeded stand-in for k-means,
    chosen so the DuckDB oracle can share it exactly), search only the
    ``nprobe`` nearest cells per probe.

    Scale shape at 10^9 vectors: centroids are tiny and broadcast; the
    assignment pass is one broadcast join + max_by hash aggregate (one row
    per vector, map-side combinable — never a window over N×K rows); the
    probe search joins only the selected cells (≈ nprobe/K of the corpus).
    Similarities are rounded before ranking with id tie-breaks, so results
    are stable across engines and float summation orders."""
    cents = corpus.filter((F.col(id_col) % stride) == 0).select(
        F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cvec")
    )

    # cell assignment: argmax centroid per vector
    sim_c = F.round(cosine(F.col(vec_col), F.col("_cvec")), 4)
    scored = corpus.join(F.broadcast(cents)).select(
        id_col, vec_col, "_cid", sim_c.alias("_csim")
    )
    row = F.struct(F.col(id_col), F.col(vec_col), F.col("_cid"))
    best = F.max_by(row, F.struct(F.col("_csim"), -F.col("_cid")))
    assigned = scored.groupBy(id_col).agg(best.alias("_r")).select(
        F.col(f"_r.{id_col}").alias(id_col),
        F.col(f"_r.{vec_col}").alias(vec_col),
        F.col("_r._cid").alias("_cell"),
    )

    # nprobe nearest cells per probe
    p = probes.select(F.col(id_col).alias(probe_id_col), F.col(vec_col).alias("_pvec"))
    pc = p.join(F.broadcast(cents)).select(
        probe_id_col, "_pvec", "_cid",
        F.round(cosine(F.col("_pvec"), F.col("_cvec")), 4).alias("_csim"),
    )
    wp = Window.partitionBy(probe_id_col).orderBy(F.desc("_csim"), F.asc("_cid"))
    probe_cells = (
        pc.withColumn("_prn", F.row_number().over(wp))
        .filter(F.col("_prn") <= nprobe)
        .select(probe_id_col, "_pvec", F.col("_cid").alias("_cell"))
    )

    cand = probe_cells.join(assigned, "_cell").filter(
        F.col(id_col) != F.col(probe_id_col)
    )
    sim = F.round(cosine(F.col(vec_col), F.col("_pvec")), 4)
    scored2 = cand.select(
        F.col(probe_id_col), F.col(id_col).alias("neighbor_id"), sim.alias("sim")
    )
    w = Window.partitionBy(probe_id_col).orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored2.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    )


def ann_topk_ivf_sql(
    table: str = "embeddings",
    k: int = 3,
    stride: int = 100,
    nprobe: int = 3,
    probe_pred: str = "vec_id < 10",
) -> str:
    """DuckDB mirror of :func:`ann_topk_ivf`."""
    cos_ec = cosine_sql("e.embedding", "c.cvec")
    cos_pc = cosine_sql("p.embedding", "c.cvec")
    cos_pn = cosine_sql("a.embedding", "pc.pvec")
    return f"""
    WITH cents AS (
      SELECT vec_id AS cid, embedding AS cvec FROM {table} WHERE vec_id % {stride} = 0
    ), assigned AS (
      SELECT vec_id, embedding, cid AS cell FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY round({cos_ec}, 4) DESC, c.cid
               ) AS rn
        FROM {table} e CROSS JOIN cents c
      ) WHERE rn = 1
    ), probe_cells AS (
      SELECT probe_id, pvec, cid AS cell FROM (
        SELECT p.vec_id AS probe_id, p.embedding AS pvec, c.cid,
               row_number() OVER (
                 PARTITION BY p.vec_id
                 ORDER BY round({cos_pc}, 4) DESC, c.cid
               ) AS rn
        FROM {table} p CROSS JOIN cents c WHERE p.{probe_pred}
      ) WHERE rn <= {nprobe}
    )
    SELECT probe_id, neighbor_id, sim, rank FROM (
      SELECT pc.probe_id, a.vec_id AS neighbor_id,
             round({cos_pn}, 4) AS sim,
             CAST(row_number() OVER (
               PARTITION BY pc.probe_id
               ORDER BY round({cos_pn}, 4) DESC, a.vec_id
             ) AS INT) AS rank
      FROM probe_cells pc JOIN assigned a USING (cell)
      WHERE a.vec_id <> pc.probe_id
    ) WHERE rank <= {k}
    """


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
