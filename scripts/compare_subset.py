#!/usr/bin/env python
"""Run the driver-sim compare for a subset of registry entries.

Usage: python scripts/compare_subset.py name1 name2 ...  (substring match)
Reuses driver_sim's canonicalizer/hash so a green here predicts the gate.
"""

from __future__ import annotations

import sys
import time
import traceback
from pathlib import Path

import duckdb

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))
sys.path.insert(0, str(_REPO / "scripts"))

from driver_sim import TABLES, _canon, _hash  # noqa: E402


def main() -> None:
    pats = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.01"

    import __spark_entry__ as ent
    from fs2_kafka_streams_spark.session import get_spark

    spark = get_spark(app_name="compare-subset")
    qs = ent.queries()
    oracles = ent.oracle_sql()
    picked = {n: b for n, b in qs.items() if any(p in n for p in pats)}
    if not picked:
        print(f"no entries match {pats}")
        sys.exit(2)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    fails = 0
    for name, build in picked.items():
        t0 = time.perf_counter()
        try:
            sdf = _canon(build(spark, sf_dir).toPandas())
            if name in oracles:
                ddf = _canon(con.sql(oracles[name]).df())
                ok = (
                    len(sdf) == len(ddf)
                    and sorted(sdf.columns) == sorted(ddf.columns)
                    and _hash(sdf) == _hash(ddf)
                )
            else:
                # mirror run_compare's rows-only policy: empty = regression
                ok = len(sdf) > 0
            status = "OK" if ok else "FAIL"
            fails += 0 if ok else 1
            print(f"{status:4s} {name:36s} {time.perf_counter()-t0:6.2f}s "
                  f"rows={len(sdf)}", flush=True)
        except Exception:
            fails += 1
            print(f"ERR  {name}\n{traceback.format_exc()[-1500:]}", flush=True)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
