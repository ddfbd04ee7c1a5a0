"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at the given SF, compares row count, column names, and
order-insensitive values. Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""
from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from ons_utils_spark import get_spark  # noqa: E402


def normalize(rows, columns):
    """Sort columns by name, canonicalize values, sort rows."""
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in idx:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = 'NaN'
                else:
                    v = round(v, 9)
            elif hasattr(v, 'isoformat'):
                v = v.isoformat()
            vals.append(repr(v))
        out.append(tuple(vals))
    return sorted(out), [columns[i] for i in idx]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
    only = set(sys.argv[2:])

    spark = get_spark('correctness', master='local[8]',
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel('ERROR')

    con = duckdb.connect()
    for t in ('region nation customer supplier part orders lineitem'
              ' events documents embeddings').split():
        path = os.path.join(sf_dir, f'{t}.parquet')
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{path}'"
            )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f'FAIL  {name}: spark error: {e}')
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f'rows  {name}: {len(srows)} rows (rows-only check)'
                  f' [{dt:.1f}s]')
            if len(srows) == 0:
                print(f'WARN  {name}: zero rows')
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [d[0] for d in rel.description]
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f'FAIL  {name}: duckdb error: {e}')
            failures.append(name)
            continue
        s_norm, s_cols = normalize(srows, scols)
        o_norm, o_cols = normalize(orows, ocols)
        if s_cols != o_cols:
            print(f'FAIL  {name}: columns {s_cols} != {o_cols}')
            failures.append(name)
        elif len(s_norm) != len(o_norm):
            print(f'FAIL  {name}: rows {len(s_norm)} != {len(o_norm)}')
            failures.append(name)
        elif s_norm != o_norm:
            bad = [
                (a, b) for a, b in zip(s_norm, o_norm) if a != b
            ][:3]
            print(f'FAIL  {name}: value mismatch, e.g. {bad}')
            failures.append(name)
        else:
            print(f'OK    {name}: {len(s_norm)} rows match [{dt:.1f}s]')

    print()
    if failures:
        print(f'{len(failures)} FAILURES: {failures}')
        return 1
    print('all queries match')
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
