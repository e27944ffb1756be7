#!/usr/bin/env python
"""Driver-contract oracle check for a subset of declared queries.

Usage: python scripts/verify_subset.py [name ...]   (default: all 83)

Replicates the round driver's vanilla-session check: build each declared
query at sf0.01 and compare the collected multiset (column-name-sorted,
canonicalized) against the DuckDB oracle. Exit 0 = all green.
"""

from __future__ import annotations

import datetime
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF = "/root/testdata/sf0.01"


def canon(v):
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, list):
        return str([canon(x) for x in v])
    return str(v)


def main() -> None:
    only = set(sys.argv[1:])

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim-subset")
        .getOrCreate()
    )
    import __spark_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    bad = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, SF)
        srows = sdf.collect()
        cols = sdf.columns
        if name not in osql:
            print(name, "rows-only:", len(srows), flush=True)
            continue
        rel = con.sql(osql[name])
        drows = rel.fetchall()
        dcols = rel.columns
        o = sorted(range(len(cols)), key=lambda i: cols[i])
        do = sorted(range(len(dcols)), key=lambda i: dcols[i])
        ss = sorted(tuple(canon(r[i]) for i in o) for r in srows)
        ds = sorted(tuple(canon(r[j]) for j in do) for r in drows)
        ok = ss == ds
        print(name, "OK" if ok else "MISMATCH", len(srows), len(drows),
              flush=True)
        if not ok:
            bad.append(name)
    assert not bad, bad
    print("ALL GREEN")


if __name__ == "__main__":
    main()
