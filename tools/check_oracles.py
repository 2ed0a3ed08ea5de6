"""Local emulation of the driver's correctness gate: run each
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet, compare row count, column names, and
order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [only_query_name]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from machine_readability_checker_spark.model import TESTDATA_TABLES  # noqa: E402
from machine_readability_checker_spark.session import get_spark  # noqa: E402


def canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, int):
        return float(v) if not isinstance(v, bool) else v
    return str(v)


def rows_to_set(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(canon(r[i]) for i in order))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2] if len(sys.argv) > 2 else None

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only is not None and only not in qs:
        raise SystemExit(
            f"unknown query {only!r} — nothing would be checked; "
            f"valid names: {', '.join(sorted(qs))}"
        )
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name != only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(s_rows)} rows (no oracle)")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok = True
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL  {name}: columns spark={s_cols} duckdb={d_cols}")
            ok = False
        elif len(s_rows) != len(d_rows):
            print(f"FAIL  {name}: rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
            ok = False
        else:
            sset = rows_to_set(s_rows, s_cols)
            dset = rows_to_set(d_rows, d_cols)
            if sset != dset:
                diffs = [
                    (a, b) for a, b in zip(sset, dset) if a != b
                ][:5]
                print(f"FAIL  {name}: value mismatch, first diffs: {diffs}")
                ok = False
        if ok:
            print(f"PASS  {name}: {len(s_rows)} rows")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
