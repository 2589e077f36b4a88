"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle_sql() side-by-side, compare row count, column names,
and order-insensitive values.  Usage: python scripts/check_contract.py [sf_dir]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")


def canon(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = f"{v:.9g}"
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append((name, f"SPARK ERROR {type(e).__name__}: {str(e)[:300]}"))
            print(f"✗ {name}: spark error: {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"~ {name}: rows-only ({len(srows)} rows) [{time.monotonic()-t0:.1f}s]")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR {type(e).__name__}: {str(e)[:300]}"))
            print(f"✗ {name}: duckdb error: {str(e)[:200]}")
            continue
        dcols = list(ddf.columns)
        if sorted(scols) != sorted(dcols):
            failures.append((name, f"COLS spark={scols} duck={dcols}"))
            print(f"✗ {name}: column mismatch {scols} vs {dcols}")
            continue
        cols = sorted(scols)
        s_canon = canon([r.asDict() for r in srows], cols)
        d_canon = canon(ddf.to_dict("records"), cols)
        if len(s_canon) != len(d_canon):
            failures.append((name, f"ROWS spark={len(s_canon)} duck={len(d_canon)}"))
            print(f"✗ {name}: row count {len(s_canon)} vs {len(d_canon)}")
            continue
        if s_canon != d_canon:
            diffs = [(a, b) for a, b in zip(s_canon, d_canon) if a != b][:3]
            failures.append((name, f"VALUES diff sample={diffs}"))
            print(f"✗ {name}: value mismatch, first diffs: {diffs}")
            continue
        print(f"✓ {name}: {len(s_canon)} rows match [{time.monotonic()-t0:.1f}s]")

    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, msg in failures:
            print(" -", n, msg[:200])
        sys.exit(1)
    print("ALL QUERIES MATCH")


if __name__ == "__main__":
    main()
