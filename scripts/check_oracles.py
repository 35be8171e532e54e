"""Local stand-in for the driver's correctness gate: run every
queries()[name] on Spark and oracle_sql()[name] on DuckDB over the
same sf dir; compare row count, column-name set, and the exact
multiset of values (floats compared exactly AND with tolerance, so
rounding-boundary risks surface before the driver sees them).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from qizner_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if isinstance(v, float):
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bool):
        return int(v)
    return v


def row_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8,
                      extra_conf={"spark.ui.enabled": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        if sql is None:
            print(f"ok   {name}: rows-only ({len(spark_rows)} rows, cols={spark_cols})")
            continue
        try:
            rel = con.sql(sql)
            duck_cols = list(rel.columns)
            duck_rows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {e}")
            continue
        problems = []
        if sorted(spark_cols) != sorted(c.lower() for c in duck_cols) and sorted(
            c.lower() for c in spark_cols
        ) != sorted(c.lower() for c in duck_cols):
            problems.append(f"cols spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
        if not problems:
            ms, md = row_multiset(spark_cols, spark_rows), row_multiset(duck_cols, duck_rows)
            if ms != md:
                diff_s = ms - md
                diff_d = md - ms
                problems.append(
                    f"values differ: {sum(diff_s.values())} spark-only / "
                    f"{sum(diff_d.values())} duck-only; e.g. spark {list(diff_s)[:2]} "
                    f"duck {list(diff_d)[:2]}"
                )
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(spark_rows)} rows match oracle")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
