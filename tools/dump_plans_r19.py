"""plans/r19 before/after dumps: formatted-mode explain for every query
touched in round 19, 'before' from the round-start worktree
(.ab_<short> of ce93291, created by tools/ab_interleaved.py), 'after'
from the working tree. Also regenerates the x14 dumps in FULL formatted
mode (VERDICT r18 item 7: the r18 simple-mode dumps were truncated).

Usage: python tools/dump_plans_r19.py <base_commit>
"""

from __future__ import annotations

import os
import subprocess
import sys

HEAD_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(HEAD_DIR, "plans", "r19")

TOUCHED = [
    "v12_prod",
    "v18_prod",
    "v20_prod",
    "v18_recall_report",
    "v20_store_health",
    "x26_prod",
    "v4_prod",
    "v6_embedding_dedup",
    "x14_curation_pipeline_v3",
]


def _use(variant_dir: str):
    for name in list(sys.modules):
        if name.startswith("nyc_taxi_etl_dashboard_spark") or name == "__spark_entry__":
            del sys.modules[name]
    sys.path[:] = [p for p in sys.path if not p.startswith(HEAD_DIR)]
    sys.path.insert(0, variant_dir)
    import __spark_entry__ as entry  # noqa: PLC0415
    from nyc_taxi_etl_dashboard_spark.plans.llmops import BENCH_ONLY  # noqa: PLC0415

    return entry.queries(), BENCH_ONLY


def main() -> None:
    commit = sys.argv[1] if len(sys.argv) > 1 else "ce93291"
    short = subprocess.run(
        ["git", "-C", HEAD_DIR, "rev-parse", "--short", commit],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    wt = os.path.join(HEAD_DIR, f".ab_{short}")
    if not os.path.isdir(wt):
        subprocess.run(["git", "-C", HEAD_DIR, "worktree", "add", wt, commit], check=True)
    os.makedirs(OUT, exist_ok=True)

    sys.path.insert(0, HEAD_DIR)
    from nyc_taxi_etl_dashboard_spark.session import get_spark

    spark = get_spark(app_name="dump_plans_r19")

    for variant, vdir, suffix in (("before", wt, "_before"), ("after", HEAD_DIR, "_after")):
        qs, bench_only = _use(vdir)
        spark.catalog.clearCache()
        for name in TOUCHED:
            fn = qs.get(name) or bench_only.get(name)
            if fn is None:
                print(f"skip {name} ({variant}): not present")
                continue
            df = fn(spark, SF_DIR)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            path = os.path.join(OUT, f"{name}{suffix}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"wrote {path} ({len(txt)} chars)")
            spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
