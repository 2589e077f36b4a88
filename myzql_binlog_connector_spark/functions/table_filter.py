"""Table include/exclude filter with specificity-based resolution.

Re-expresses the reference's TableFilter
(/root/reference/src/table_filter.zig:110-135 eval, :203-245 parse/validate,
:267-291 conflicts; README.md:263-357) as:

  * a driver-side predicate ``matches(db, table)`` used inside the decode
    session (earliest-possible pushdown: excluded tables are never cached,
    so their ROWS events skip all parsing — binlog_reader.zig:404-417);
  * a compiled Spark ``Column`` boolean expression (JVM-side, codegen-able);
  * an equivalent ANSI-SQL CASE expression for DuckDB oracles.

Pattern grammar: ``schema.table`` | ``*.table`` | ``schema.*``.  Exactly one
dot; ``*`` only as a whole part; ``*.*`` is invalid.  Specificity:
exact(3) > ``*.table``(2) > ``schema.*``(1) > default(0).  If any include
rules exist the default is exclude (whitelist mode), else include.  The same
pattern in both lists is a conflict error.
"""

from __future__ import annotations

from dataclasses import dataclass


class FilterRuleError(ValueError):
    pass


@dataclass(frozen=True)
class _Rule:
    schema: str  # "*" for wildcard
    table: str   # "*" for wildcard
    include: bool

    @property
    def specificity(self) -> int:
        if self.schema != "*" and self.table != "*":
            return 3
        if self.table != "*":
            return 2
        return 1


def _parse_pattern(pattern: str) -> tuple[str, str]:
    if pattern.count(".") != 1:
        raise FilterRuleError(f"pattern must contain exactly one dot: {pattern!r}")
    schema, table = pattern.split(".")
    if not schema or not table:
        raise FilterRuleError(f"empty schema or table part: {pattern!r}")
    for part in (schema, table):
        if "*" in part and part != "*":
            raise FilterRuleError(f"'*' must be a whole part: {pattern!r}")
    if schema == "*" and table == "*":
        raise FilterRuleError("'*.*' is not a valid pattern")
    return schema, table


class TableFilter:
    """Picklable include/exclude evaluator (usable inside Arrow UDFs)."""

    def __init__(self, include: list[str] | None = None, exclude: list[str] | None = None):
        include = include or []
        exclude = exclude or []
        conflicts = set(include) & set(exclude)
        if conflicts:
            raise FilterRuleError(f"pattern(s) in both include and exclude: {sorted(conflicts)}")
        self.rules: list[_Rule] = []
        for p in include:
            s, t = _parse_pattern(p)
            self.rules.append(_Rule(s, t, True))
        for p in exclude:
            s, t = _parse_pattern(p)
            self.rules.append(_Rule(s, t, False))
        # whitelist mode: any include rule flips the default to exclude
        self.default_include = not any(r.include for r in self.rules)
        # most-specific rule wins; ties within a specificity level cannot
        # disagree (same pattern both ways is already rejected above)
        self.rules.sort(key=lambda r: -r.specificity)

    def matches(self, schema: str, table: str) -> bool:
        for r in self.rules:
            if (r.schema == "*" or r.schema == schema) and (r.table == "*" or r.table == table):
                return r.include
        return self.default_include

    __call__ = matches

    # ------------------------------------------------------------------
    # compiled forms
    # ------------------------------------------------------------------

    def to_column(self, schema_col, table_col):
        """Spark Column expression with identical semantics (whole-stage
        codegen; no Python in the hot path)."""
        from pyspark.sql import functions as F

        expr = F.lit(self.default_include)
        # build from least to most specific so the most specific ends up
        # outermost in the when-chain
        for r in sorted(self.rules, key=lambda r: r.specificity):
            cond = F.lit(True)
            if r.schema != "*":
                cond = cond & (schema_col == r.schema)
            if r.table != "*":
                cond = cond & (table_col == r.table)
            expr = F.when(cond, F.lit(r.include)).otherwise(expr)
        return expr

    def to_sql_case(self, schema_expr: str = "database", table_expr: str = "table_name") -> str:
        """ANSI SQL mirror of :meth:`to_column` for DuckDB oracles."""
        sql = "TRUE" if self.default_include else "FALSE"
        for r in sorted(self.rules, key=lambda r: r.specificity):
            conds = []
            if r.schema != "*":
                conds.append(f"{schema_expr} = '{r.schema}'")
            if r.table != "*":
                conds.append(f"{table_expr} = '{r.table}'")
            cond = " AND ".join(conds) or "TRUE"
            sql = f"CASE WHEN {cond} THEN {'TRUE' if r.include else 'FALSE'} ELSE {sql} END"
        return sql
