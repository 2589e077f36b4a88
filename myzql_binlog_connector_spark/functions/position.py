"""Binlog position predicates (bounded replay) and file-name helpers.

Tuple-comparison predicates over ``(file_seq, log_pos)``, replicating the
reference's bounded-replay semantics: replay covers
``from_position <= (file, pos) < to_position`` and events whose
``log_pos >= to_position`` within the stop file are excluded
(/root/reference/src/binlog_reader.zig:284-305,443-455; config range
validation src/config.zig:217-253).

These compile to plain Column comparisons — Catalyst pushes them into the
parquet scan of the envelope/source tables (min/max row-group pruning), so a
bounded replay over a 100 TB event archive only reads the matching segment
ranges.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F


_FILE_RE = re.compile(r"^(?P<stem>.*)\.(?P<seq>\d+)$")


def file_seq_of(binlog_file: str) -> int:
    """Numeric suffix of a binlog file name (``binlog.000042`` → 42);
    validation mirrors config.zig:76-94."""
    m = _FILE_RE.match(binlog_file)
    if not m:
        raise ValueError(f"binlog file name has no numeric suffix: {binlog_file!r}")
    return int(m.group("seq"))


def position_at_least(file_seq_col: Column, pos_col: Column, file_seq: int, pos: int) -> Column:
    """(file, pos) >= (file_seq, pos) — inclusive lower bound."""
    return (file_seq_col > F.lit(file_seq)) | (
        (file_seq_col == F.lit(file_seq)) & (pos_col >= F.lit(pos))
    )


def position_below(file_seq_col: Column, pos_col: Column, file_seq: int, pos: int) -> Column:
    """(file, pos) < (file_seq, pos) — exclusive upper bound: rows with
    log_pos >= stop position are excluded (binlog_reader.zig:443-455)."""
    return (file_seq_col < F.lit(file_seq)) | (
        (file_seq_col == F.lit(file_seq)) & (pos_col < F.lit(pos))
    )


def position_range(
    file_seq_col: Column,
    pos_col: Column,
    from_position: tuple[int, int] | None = None,
    to_position: tuple[int, int] | None = None,
) -> Column:
    expr = F.lit(True)
    if from_position is not None:
        expr = expr & position_at_least(file_seq_col, pos_col, *from_position)
    if to_position is not None:
        expr = expr & position_below(file_seq_col, pos_col, *to_position)
    return expr


def position_range_sql(
    file_seq_expr: str = "file_seq",
    pos_expr: str = "log_pos",
    from_position: tuple[int, int] | None = None,
    to_position: tuple[int, int] | None = None,
) -> str:
    """ANSI SQL mirror for DuckDB oracles."""
    clauses = []
    if from_position is not None:
        f, p = from_position
        clauses.append(f"({file_seq_expr} > {f} OR ({file_seq_expr} = {f} AND {pos_expr} >= {p}))")
    if to_position is not None:
        f, p = to_position
        clauses.append(f"({file_seq_expr} < {f} OR ({file_seq_expr} = {f} AND {pos_expr} < {p}))")
    return " AND ".join(clauses) or "TRUE"
