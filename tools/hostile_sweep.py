"""Full-registry sweep under the DRIVER's session, not ours.

``tools/full_sweep.py`` verifies every ``queries()`` entry against its
DuckDB oracle from OUR ``get_spark`` session (UTC, pinned semantics).
The external driver does not use our session: it builds its own —
Spark 4 defaults, which means ANSI mode ON and the machine timezone —
and compares values through a pandas/Arrow fetch, where a column's
PHYSICAL type matters (the rounds-15-17 HUGEINT war: numerically equal
values hash-diverged because DuckDB promoted ``sum()`` to int128 and
the fetch normalized it to float64). Until round 18 the
hostile-session re-run lived as a recipe in the verify skill and was
re-typed by hand each round; this tool is that recipe as one command
producing a committed artifact.

Per query it records the full_sweep row comparison PLUS the fetch-path
type audit: the DuckDB result is fetched as a pandas frame and each
shared column's dtype must agree with the Spark leg's fetched dtype —
the exact surface the driver hashes over.

Usage: ``python tools/hostile_sweep.py [--out HOSTILE_SWEEP.json]``
(env: SPARK_GRAFT_SWEEP_SF_DIR, default /root/testdata/sf0.01).
Exit 1 if any query is red on rows, schema, values, or fetched dtypes.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for _p in (REPO, os.path.join(REPO, "tools")):
    if _p not in sys.path:
        sys.path.insert(0, _p)

from full_sweep import duck_views  # noqa: E402


def _normalize_fetched(rows, colnames):
    """full_sweep's canonicalization, adjusted for the pandas-fetch
    surface: a NULL integer/boolean column arrives as ``None`` from
    Spark's ``toPandas`` but as ``NaN`` from DuckDB's ``.df()`` —
    indistinguishable states on the fetched frame (the driver's own
    hash folds them; x26's nullable booleans are driver-green), so
    every NA-ish cell maps to the same sentinel."""
    import pandas as pd

    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def cell(v):
        if v is None or (not isinstance(v, (str, bytes)) and pd.isna(v)):
            return "∅"
        if isinstance(v, float):
            return repr(round(v, 9))
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def hostile_session():
    """The driver-sim session from the verify-skill recipe: Spark 4
    defaults (ANSI stays ON — we set nothing), a non-UTC timezone, no
    UI. Any green here is green because ``session.pin_session``
    defends the semantics inside each query, not because the session
    was friendly."""
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[32]")
        .appName("hostile-sweep")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SWEEP_SF_DIR", "/root/testdata/sf0.01")
    out_path = os.path.join(REPO, "HOSTILE_SWEEP.json")
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    import duckdb

    import __spark_entry__ as entrymod

    spark = hostile_session()
    con = duckdb.connect()
    duck_views(con, sf_dir)

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if "--only" in sys.argv:  # comma-separated subset for quick re-checks
        keep = set(sys.argv[sys.argv.index("--only") + 1].split(","))
        queries = {k: v for k, v in queries.items() if k in keep}
    out: dict = {}
    n_green = 0
    for name, fn in queries.items():
        rec: dict = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "dtype_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
            rec["spark_rows"] = len(spdf)
            if name not in oracles:
                rec["err"] = "rows-only: no oracle registered"
            else:
                opdf = con.sql(oracles[name]).df()
                rec["oracle_rows"] = len(opdf)
                rec["rows_match"] = len(spdf) == len(opdf)
                rec["schema_match"] = sorted(spdf.columns) == sorted(opdf.columns)
                # the driver's hash surface: fetched dtypes must agree
                # per shared column (HUGEINT→float64/decimal and any
                # future promotion trips HERE, not in the row values)
                mism = [
                    (c, str(spdf[c].dtype), str(opdf[c].dtype))
                    for c in spdf.columns
                    if c in opdf.columns and spdf[c].dtype != opdf[c].dtype
                ]
                rec["dtype_match"] = not mism
                if mism:
                    rec["err"] = f"fetched-dtype mismatch: {mism}"[:500]
                srows = [tuple(r) for r in spdf.itertuples(index=False)]
                orows = [tuple(r) for r in opdf.itertuples(index=False)]
                rec["hash_match"] = (
                    rec["rows_match"]
                    and rec["schema_match"]
                    and bool(rec["dtype_match"])
                    and _normalize_fetched(srows, list(spdf.columns))
                    == _normalize_fetched(orows, list(opdf.columns))
                )
        except Exception as e:  # noqa: BLE001 — the artifact records failures
            rec["err"] = f"{type(e).__name__}: {e}"[:500]
        out[name] = rec
        green = bool(rec["hash_match"])
        n_green += green
        print(f"{name}: {'green' if green else rec}", flush=True)

    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(f"\n{n_green}/{len(out)} hostile-green at {sf_dir} -> {out_path}")
    if n_green != len(out):
        sys.exit(1)


if __name__ == "__main__":
    main()
