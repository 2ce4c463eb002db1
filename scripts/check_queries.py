#!/usr/bin/env python
"""Parity-check a subset of registry queries against their DuckDB oracles.

Usage: python scripts/check_queries.py name1 name2 ... [--sf DIR]
Same compare as tests/driver_check.py (rows / sorted cols / value hash),
but only for the named queries — the fast loop while developing one op.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.driver_check import TABLES, value_hash  # noqa: E402


def main():
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.001"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]

    import duckdb

    import __spark_entry__ as entry
    from tests.conftest import make_spark

    qs = entry.queries()
    oracles = entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    spark = make_spark("local[8]")
    bad = 0
    for name in args:
        fn = qs[name]
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"ok   {name}: rows={len(srows)} (rows-only)")
            continue
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems and value_hash(scols, srows) != value_hash(ocols, orows):
            problems.append("value-hash mismatch")
        if problems:
            bad += 1
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"ok   {name}: rows={len(srows)} hash match")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
