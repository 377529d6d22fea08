"""Local stand-in for the driver's correctness gate: run every
``__spark_entry__.queries()`` entry and its ``oracle_sql()`` twin on the
same parquet, compare row count + sorted-column value multisets.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from pheknowlator_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            ores = con.sql(oracles[name])
            orows = ores.fetchall()
            ocols = [d[0] for d in ores.description]
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"FAIL  {name}: oracle error {str(e)[:200]}")
            continue
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
            failures.append((name, f"schema {scols} vs {ocols}"))
            print(f"FAIL  {name}: schema {scols} vs {ocols}")
            continue
        s_norm = normalize([tuple(r) for r in srows], scols)
        o_norm = normalize(orows, ocols)
        if len(s_norm) != len(o_norm):
            failures.append((name, f"rowcount {len(s_norm)} vs {len(o_norm)}"))
            print(f"FAIL  {name}: rowcount {len(s_norm)} vs {len(o_norm)}")
            only_s = [r for r in s_norm if r not in set(o_norm)][:3]
            only_o = [r for r in o_norm if r not in set(s_norm)][:3]
            print(f"      spark-only: {only_s}")
            print(f"      oracle-only: {only_o}")
        elif s_norm != o_norm:
            diff_s = [r for r in s_norm if r not in set(o_norm)][:3]
            diff_o = [r for r in o_norm if r not in set(s_norm)][:3]
            failures.append((name, f"values differ: {diff_s} vs {diff_o}"))
            print(f"FAIL  {name}: values differ")
            print(f"      spark-only: {diff_s}")
            print(f"      oracle-only: {diff_o}")
        else:
            print(f"OK    {name}: {len(s_norm)} rows match")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {[f[0] for f in failures]}")
        sys.exit(1)
    print("all queries match their oracles")


if __name__ == "__main__":
    main()
