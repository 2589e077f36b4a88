"""Deterministic dataset splitting for training-data pipelines.

Content-addressed hash splits: a document's split is a pure function of
(seed, id), so the assignment is stable across runs, engines, cluster
sizes, and re-partitioning — the property training pipelines need so that
val/test never leak into train when the corpus is re-processed.  (Spark's
``randomSplit`` is partition-order-dependent and not reproducible across
layouts — unusable for this.)

The bucket is the first 8 hex chars of md5(seed:id) scaled to [0, 1) —
division by 2^32 is exact in binary floating point, so the threshold
comparisons are bit-identical in any engine (DuckDB mirror:
:func:`split_sql`).  Pure codegen column algebra; scales as a map-only
stage (no shuffle)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_SPLITS: tuple[tuple[str, float], ...] = (
    ("train", 0.90),
    ("val", 0.05),
    ("test", 0.05),
)


def split_bucket(id_col: Column, seed: str = "split-v1") -> Column:
    """Uniform [0, 1) bucket from md5(seed:id) — 32 bits / 2^32 (exact)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), id_col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("double")
    return h / F.lit(float(1 << 32))


def split_label(
    id_col: Column,
    splits: tuple[tuple[str, float], ...] = DEFAULT_SPLITS,
    seed: str = "split-v1",
) -> Column:
    """CASE over cumulative split weights; the last split takes the
    remainder (weights needn't sum exactly to 1)."""
    b = split_bucket(id_col, seed)
    expr = None
    acc = 0.0
    for name, w in splits[:-1]:
        acc += w
        cond = b < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = splits[-1][0]
    return (F.lit(last) if expr is None else expr.otherwise(last)).alias("split")


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: tuple[tuple[str, float], ...] = DEFAULT_SPLITS,
    seed: str = "split-v1",
) -> DataFrame:
    """df + a deterministic ``split`` column."""
    return df.withColumn("split", split_label(F.col(id_col), splits, seed))


def split_sql(
    id_expr: str,
    splits: tuple[tuple[str, float], ...] = DEFAULT_SPLITS,
    seed: str = "split-v1",
) -> str:
    """DuckDB mirror of :func:`split_label`."""
    b = (
        f"(CAST(concat('0x', substring(md5(concat('{seed}:', "
        f"CAST({id_expr} AS VARCHAR))), 1, 8)) AS BIGINT) / {float(1 << 32)!r})"
    )
    parts = []
    acc = 0.0
    for name, w in splits[:-1]:
        acc += w
        parts.append(f"WHEN {b} < {acc!r} THEN '{name}'")
    return "CASE " + " ".join(parts) + f" ELSE '{splits[-1][0]}' END"
