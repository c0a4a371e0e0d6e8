"""Run ONE registered query against its oracle at a given sf dir —
the full_sweep compare on a single name, for fast iteration.

Usage: python tools/one_query.py <name> [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return repr(round(v, 9))
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import duckdb

    import __spark_entry__ as entrymod
    from nyc_taxi_etl_dashboard_spark.session import get_spark
    from nyc_taxi_etl_dashboard_spark.sources import TABLE_NAMES

    spark = get_spark(app_name=f"one-query-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

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
    ok_hash = ok_rows and ok_schema and norm(srows, scols) == norm(orows, ocols)
    print(
        f"{name}: rows {len(srows)}/{len(orows)} match={ok_rows} "
        f"schema={ok_schema} hash={ok_hash}"
    )
    if not ok_schema:
        print("  spark:", sorted(scols), "\n  oracle:", sorted(ocols))
    if ok_rows and ok_schema and not ok_hash:
        a, b = norm(srows, scols), norm(orows, ocols)
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        for x, y in diffs:
            print("  spark :", x, "\n  oracle:", y)
    sys.exit(0 if ok_hash else 1)


if __name__ == "__main__":
    main()
