"""Fuzzy-dedup operators: MinHash+LSH, SimHash, n-gram Jaccard.

All md5-based so the DuckDB oracles compute identical values; all pure
column algebra (explode → hash → groupBy min / bit-vote) — distributed,
JVM-side, shuffle only on the aggregation keys.

Scale shape (10^9 docs):
  * minhash signatures: one explode of distinct shingles (~|doc| rows),
    one groupBy(doc) with n_hashes partial-aggregating mins — map-side
    combine keeps the shuffle at one row per doc.
  * LSH candidate pairs: self-equi-join on (band, minhash) — the classic
    banding join; band buckets are high-cardinality so AQE handles skew.
  * verification: exact Jaccard only on candidates (array_intersect /
    array_union on the two shingle sets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import h60, h60_sql, normalize_sql, shingle_rows, shingle_sets


def _spread(df: DataFrame, *cols: str) -> DataFrame:
    """Ensure enough input partitions for the compute-heavy hash stages: a
    small-file source (1-2 partitions) would serialize the explode+md5 work.
    No-op when the source is already well partitioned (the 100 TB case)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, *[F.col(c) for c in cols]) if cols else df.repartition(target)
    return df


# ---------------------------------------------------------------------------
# MinHash
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    shingle_k: int = 5,
) -> DataFrame:
    """(id, mh_0..mh_{n-1}): min over shingles of the i-th hash.

    Hash i uses half ``i % 2`` (15 hex chars = 60 bits) of
    ``md5(f"{i//2}:" + shingle)`` — truly independent hash functions at
    ceil(n/2) digests per shingle.  (A Kirsch-Mitzenmacher h1+i·h2 scheme
    was tried first: its linear dependence correlates LSH bands, inflating
    the candidate set ~5× and shifting all cost into Jaccard verification.)"""
    exploded = shingle_rows(
        _spread(df.select(id_col, text_col), id_col), text_col, id_col, k=shingle_k
    )
    cols = []
    for seed in range((n_hashes + 1) // 2):
        m = F.md5(F.concat(F.lit(f"{seed}:"), F.col("sh")))
        cols.append(F.conv(F.substring(m, 1, 15), 16, 10).cast("long").alias(f"h_{2*seed}"))
        if 2 * seed + 1 < n_hashes:
            cols.append(
                F.conv(F.substring(m, 16, 15), 16, 10).cast("long").alias(f"h_{2*seed+1}")
            )
    hashed = exploded.select(id_col, *cols)
    aggs = [F.min(F.col(f"h_{i}")).alias(f"mh_{i}") for i in range(n_hashes)]
    return hashed.groupBy(id_col).agg(*aggs)


def minhash_sig_select_sql(n_hashes: int = 8) -> str:
    """``min(...) AS mh_i`` aggregate list over shingled(sh) — DuckDB
    mirror of the split-digest scheme."""
    exprs = []
    for i in range(n_hashes):
        seed, part = i // 2, i % 2
        h = f"md5(concat('{seed}:', sh))"
        exprs.append(
            f"min(CAST(concat('0x', substring({h},{1 + 15 * part},15)) AS BIGINT)) AS mh_{i}"
        )
    return ", ".join(exprs)


def minhash_signature_sql(
    table: str,
    text_expr: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    shingle_k: int = 5,
) -> str:
    """DuckDB mirror of :func:`minhash_signatures`."""
    return f"""
    WITH {shingle_cte_sql(table, text_expr, id_col, shingle_k)}
    SELECT {id_col}, {minhash_sig_select_sql(n_hashes)} FROM shingled GROUP BY {id_col}
    """


def shingle_cte_sql(
    table: str,
    text_expr: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    max_len: int = 100_000,
) -> str:
    """CTE body producing ``shingled(id, sh)`` — distinct char-k-gram
    shingles.  DuckDB's generate_series cannot take lateral column params,
    so positions come from a constant series joined on length."""
    norm = normalize_sql(text_expr)
    return f"""normed AS (
      SELECT {id_col}, {norm} AS n FROM {table}
    ), nums AS (
      SELECT unnest(range(1, {max_len + 1})) AS i
    ), shingled AS (
      SELECT DISTINCT {id_col},
             CASE WHEN length(n) <= {shingle_k} THEN n
                  ELSE substring(n, CAST(i AS INT), {shingle_k}) END AS sh
      FROM normed JOIN nums ON i <= greatest(1, length(n) - {shingle_k} + 1)
    )"""


def minhash_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.6,
    band_rows: int = 2,
) -> DataFrame:
    """Classic b×r LSH banding: signatures split into b = n_hashes/band_rows
    bands of r rows; candidates must agree on ALL r hashes of some band
    (r=1 floods the candidate set on corpora with shared common shingles —
    r≥2 keeps the false-candidate rate quadratic-safe at 10^9 docs), then
    exact shingle-Jaccard ≥ threshold verifies."""
    sh = shingle_sets(_spread(df.select(id_col, text_col), id_col), text_col, id_col, k=shingle_k)
    sigs = minhash_signatures(df, text_col, id_col, n_hashes, shingle_k)
    n_bands = n_hashes // band_rows
    # band key = concat of the band's r minhashes
    bands = sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "_",
                            *[
                                F.col(f"mh_{b * band_rows + j}").cast("string")
                                for j in range(band_rows)
                            ],
                        ).alias("mh"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bm"),
    ).select(id_col, "bm.band", "bm.mh")
    l, r = bands.alias("l"), bands.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.mh") == F.col("r.mh"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    joined = cand.join(a, "id_a").join(b, "id_b")
    jac = F.round(
        F.size(F.array_intersect("sh_a", "sh_b"))
        / F.size(F.array_union("sh_a", "sh_b")),
        4,
    )
    return joined.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= jaccard_threshold
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
) -> DataFrame:
    """(id, simhash): per-token 60-bit hash votes on each of ``bits`` bit
    positions; bit set when the weighted vote is positive."""
    from .text import normalize_text, tokens

    toks = _spread(df.select(id_col, text_col), id_col).select(
        id_col, F.explode(tokens(normalize_text(F.col(text_col)))).alias("tok")
    )
    hashed = toks.withColumn("h", h60(F.col("tok")))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v_{b}")
        for b in range(bits)
    ]
    agg = hashed.groupBy(id_col).agg(*votes)
    sim = None
    for b in range(bits):
        term = F.when(F.col(f"v_{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return agg.select(id_col, sim.cast("long").alias("simhash"))


def simhash_sql(
    table: str,
    text_expr: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
) -> str:
    norm = normalize_sql(text_expr)
    toks = f"CASE WHEN {norm}='' THEN [] ELSE regexp_split_to_array({norm}, '\\s+') END"
    h = h60_sql("tok")
    votes = ", ".join(
        f"sum(CASE WHEN (({h}) >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v_{b}"
        for b in range(bits)
    )
    bitsum = " + ".join(
        f"(CASE WHEN v_{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits)
    )
    return f"""
    WITH toks AS (
      SELECT {id_col}, unnest({toks}) AS tok FROM {table}
    ), votes AS (
      SELECT {id_col}, {votes} FROM toks GROUP BY {id_col}
    )
    SELECT {id_col}, CAST({bitsum} AS BIGINT) AS simhash FROM votes
    """


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, over LSH candidates or a provided pair set)
# ---------------------------------------------------------------------------


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact char-n-gram Jaccard for given candidate pairs (id_a, id_b); if
    ``pairs`` is None, all same-``source`` pairs are compared (bounded
    blocking key for test-scale exactness)."""
    sh = shingle_sets(_spread(df.select(id_col, text_col), id_col), text_col, id_col, k=shingle_k)
    a = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    if pairs is None:
        raise ValueError("provide candidate pairs (e.g. from minhash banding)")
    joined = pairs.join(a, "id_a").join(b, "id_b")
    jac = F.round(
        F.size(F.array_intersect("sh_a", "sh_b"))
        / F.size(F.array_union("sh_a", "sh_b")),
        4,
    )
    return joined.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )
