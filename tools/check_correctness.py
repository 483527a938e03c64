"""Local twin of the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
at the same scale factor, compare row count, column names, and an
order-insensitive value hash.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod
from forest_open_data_pipelines_spark.session import get_spark
from forest_open_data_pipelines_spark.sources.tables import TABLES


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    return str(v)


def frame_signature(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    body = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return sorted(cols), body


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
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
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"{name}: SPARK FAIL {type(e).__name__}: {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"{name}: rows-only rows={len(srows)}")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"{name}: ORACLE FAIL {type(e).__name__}: {str(e)[:300]}")
            continue
        sc, sb = frame_signature(scols, srows)
        oc, ob = frame_signature(ocols, orows)
        if sc != oc:
            failures.append(name)
            print(f"{name}: COLUMN MISMATCH spark={sc} oracle={oc}")
        elif len(sb) != len(ob):
            failures.append(name)
            print(f"{name}: ROWCOUNT MISMATCH spark={len(sb)} oracle={len(ob)}")
        elif sb != ob:
            failures.append(name)
            diffs = [
                (a, b) for a, b in zip(sb, ob) if a != b
            ][:3]
            print(f"{name}: VALUE MISMATCH rows={len(sb)} first_diffs={diffs}")
        else:
            print(f"{name}: MATCH rows={len(sb)}")
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
