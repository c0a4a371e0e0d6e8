"""Full-registry correctness sweep → a COMMITTED artifact.

The external driver verifies only the first 50 registry entries per
round (CORRECTNESS_r{N}.json); the other ~half of the registry is
covered by earlier-round green rows plus pytest's sf0.001 parity sweep,
but that greenness lived in prose (VERDICT r7 item 4). This tool runs
EVERY ``queries()`` entry against its ``oracle_sql()`` twin at sf0.01 —
the driver's correctness scale — and writes ``CORRECTNESS_local.json``
next to the repo root with the driver's exact row schema
(rows_match / schema_match / hash_match / spark_rows / oracle_rows /
err), so each round commits a machine-checkable 98-row record instead
of a claim.

Comparison mirrors tests/test_oracle_parity.py (the pytest twin of the
external gate): column names compared order-insensitively, values
normalized (floats rounded to 9 dp, None → sentinel), rows sorted —
order-insensitive value equality, which is strictly stronger than a
value hash.

Usage: python tools/full_sweep.py  [env: SPARK_GRAFT_SWEEP_SF_DIR]
"""

from __future__ import annotations

import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def duck_views(con, sf_dir: str) -> None:
    """Register the ten fixture tables as DuckDB views — shared with
    tools/one_query.py so the two harnesses cannot diverge."""
    from nyc_taxi_etl_dashboard_spark.sources import TABLE_NAMES

    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )


def _normalize(rows, colnames):
    """Sort columns by name, stringify cells deterministically (same
    canonicalization as tests/test_oracle_parity.py)."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

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
    sf_dir = os.environ.get("SPARK_GRAFT_SWEEP_SF_DIR", "/root/testdata/sf0.01")

    import duckdb

    import __spark_entry__ as entrymod
    from nyc_taxi_etl_dashboard_spark.session import get_spark

    spark = get_spark(app_name="full-sweep")
    con = duckdb.connect()
    duck_views(con, sf_dir)

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    out: dict = {}
    n_green = 0
    for name, fn in queries.items():
        rec: dict = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
            rec["spark_rows"] = len(srows)
            if name not in oracles:
                rec["err"] = "rows-only: no oracle registered"
            else:
                cur = con.execute(oracles[name])
                ocols = [d[0] for d in cur.description]
                orows = cur.fetchall()
                rec["oracle_rows"] = len(orows)
                rec["rows_match"] = len(srows) == len(orows)
                rec["schema_match"] = sorted(scols) == sorted(ocols)
                rec["hash_match"] = (
                    rec["rows_match"]
                    and rec["schema_match"]
                    and _normalize(srows, scols) == _normalize(orows, ocols)
                )
        except Exception as e:  # noqa: BLE001 — the artifact records failures
            rec["err"] = f"{type(e).__name__}: {e}"[:500]
        out[name] = rec
        green = bool(rec["hash_match"])
        n_green += green
        print(f"{name}: {'green' if green else rec}", flush=True)

    path = os.path.join(REPO, "CORRECTNESS_local.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(f"\n{n_green}/{len(out)} hash-green at {sf_dir} -> {path}")
    if n_green != len(out):
        sys.exit(1)


if __name__ == "__main__":
    main()
