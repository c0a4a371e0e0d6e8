"""Run ONE registered query against its oracle at a given sf dir —
the full_sweep compare on a single name, for fast iteration.

Canonicalization and view bootstrap are IMPORTED from full_sweep so the
single-query harness can never drift from the committed-artifact sweep.

Usage: python tools/one_query.py <name> [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.dirname(os.path.abspath(__file__))):
    if p not in sys.path:
        sys.path.insert(0, p)

from full_sweep import _normalize, duck_views  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import duckdb

    import __spark_entry__ as entrymod
    from nyc_taxi_etl_dashboard_spark.session import get_spark

    spark = get_spark(app_name=f"one-query-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    duck_views(con, sf_dir)

    sdf = entrymod.queries()[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        print(f"{name}: rows-only ({len(srows)} spark rows)")
        return
    cur = con.execute(sql)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    ok_rows = len(srows) == len(orows)
    ok_schema = sorted(scols) == sorted(ocols)
    ok_hash = (
        ok_rows and ok_schema and _normalize(srows, scols) == _normalize(orows, ocols)
    )
    print(
        f"{name}: rows {len(srows)}/{len(orows)} match={ok_rows} "
        f"schema={ok_schema} hash={ok_hash}"
    )
    if not ok_schema:
        print("  spark:", sorted(scols), "\n  oracle:", sorted(ocols))
    if ok_rows and ok_schema and not ok_hash:
        a, b = _normalize(srows, scols), _normalize(orows, ocols)
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        for x, y in diffs:
            print("  spark :", x, "\n  oracle:", y)
    sys.exit(0 if ok_hash else 1)


if __name__ == "__main__":
    main()
