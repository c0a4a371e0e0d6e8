"""Reusable interleaved A/B harness: HEAD vs ANY commit, on ANY set of
registered queries / BENCH_ONLY prod paths / the transform pipelines.

Each round's perf dispute has so far spawned a one-off script
(ab_head_vs_r10.py settled r10→r12, ab_head_vs_r12.py settled
r12→r13). This generalizes them so the NEXT dispute is one command:

    python tools/ab_interleaved.py <commit> [rounds] [q1,q2,...]

- <commit>: any ref; a worktree is created at .ab_<shortsha> (reused
  if present, left in place for re-runs; gitignored via the .ab_*
  convention).
- [rounds]: interleaved rounds (default 7).
- [queries]: comma-separated. Names resolve in order: registered
  queries() entries, then BENCH_ONLY prod paths, then the two
  specials ``pipe_transform_full`` / ``pipe_transform_bronze`` (the
  dual-sink write measured exactly as bench.py does). Default: the
  bench HEADLINE's pipeline trio + the transform pipelines.

Design (the settled pattern): ONE Spark session; each round times every
query once under HEAD and once under the worktree, swapping the library
by purging ``sys.modules``; per-run hygiene matches bench.py's pinned
wrapper (clearCache + clear_nparts_memo, noop sink); variant order
alternates per round so slot bias cancels; every pair is a same-moment
comparison, so shared-box drift inflates both sides together. A paired
single-file read probe runs before each variant's transform so the
io_norm ratio is reproduced per variant.

Emits one JSON line: per-query medians per variant, per-round paired
ratios' median (1.0 = no code effect), and the io_norm pair.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

HEAD_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BRONZE_DIR = os.path.join(HEAD_DIR, "fixtures", "bronze_sf0.1")
SPECIALS = ("pipe_transform_full", "pipe_transform_bronze")
DEFAULT_QUERIES = [
    "pipe_valid_rows",
    "pipe_transform_full",
    "pipe_transform_bronze",
]


#: retention policy (VERDICT r16 item 5): keep at most this many .ab_*
#: base checkouts; older-by-mtime ones are pruned when a new base is
#: created. They are plain git worktrees of this repo's own past
#: commits — reconstructible from git at any time.
AB_WORKTREE_KEEP = 3


#: Never force-remove a worktree whose mtime is within this window —
#: a concurrent A/B run touches its base's mtime on reuse, so a young
#: mtime means "possibly executing right now" (ADVICE r17: the touch
#: narrows but does not close the race; this grace window closes it
#: for any bench that re-touches at least this often).
AB_PRUNE_GRACE_SEC = 600.0


def _mtime_or_zero(path: str) -> float:
    """Tolerant sort key: a dir can vanish between listdir and the
    sort (concurrent prune / manual cleanup) — treat it as oldest
    instead of raising (ADVICE r17)."""
    try:
        return os.path.getmtime(path)
    except OSError:
        return 0.0


def prune_worktrees(keep: int = AB_WORKTREE_KEEP) -> list[str]:
    """Delete the oldest .ab_* worktrees beyond ``keep`` (by mtime —
    mtime is touched on reuse, so recently-used bases survive; dirs
    modified within :data:`AB_PRUNE_GRACE_SEC` are never removed).
    Returns the pruned paths."""
    import shutil
    import time

    dirs = sorted(
        (
            os.path.join(HEAD_DIR, d)
            for d in os.listdir(HEAD_DIR)
            if d.startswith(".ab_") and os.path.isdir(os.path.join(HEAD_DIR, d))
        ),
        key=_mtime_or_zero,
        reverse=True,
    )
    now = time.time()
    pruned = []
    for wt in dirs[keep:]:
        if now - _mtime_or_zero(wt) < AB_PRUNE_GRACE_SEC:
            continue  # possibly in use by a concurrent bench
        subprocess.run(
            ["git", "-C", HEAD_DIR, "worktree", "remove", "--force", wt],
            check=False,
        )
        if os.path.isdir(wt):  # non-worktree leftovers
            shutil.rmtree(wt, ignore_errors=True)
        pruned.append(wt)
    if pruned:
        subprocess.run(
            ["git", "-C", HEAD_DIR, "worktree", "prune"], check=False
        )
    return pruned


def ensure_worktree(commit: str) -> tuple[str, str]:
    short = subprocess.run(
        ["git", "-C", HEAD_DIR, "rev-parse", "--short", commit],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    wt = os.path.join(HEAD_DIR, f".ab_{short}")
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "-C", HEAD_DIR, "worktree", "add", wt, commit],
            check=True,
        )
    else:
        os.utime(wt)  # mark reuse so retention keeps hot bases
    prune_worktrees()
    return wt, short


def _use(variant_dir: str):
    for name in list(sys.modules):
        if name.startswith("nyc_taxi_etl_dashboard_spark") or name == "__spark_entry__":
            del sys.modules[name]
    sys.path[:] = [p for p in sys.path if not p.startswith(HEAD_DIR)]
    sys.path.insert(0, variant_dir)
    import __spark_entry__ as entry  # noqa: PLC0415
    from nyc_taxi_etl_dashboard_spark.operators import clear_nparts_memo  # noqa: PLC0415
    from nyc_taxi_etl_dashboard_spark.plans.llmops import BENCH_ONLY  # noqa: PLC0415
    from nyc_taxi_etl_dashboard_spark.plans.pipeline import dual_sink_write  # noqa: PLC0415

    return entry.queries(), BENCH_ONLY, dual_sink_write, clear_nparts_memo


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    commit = sys.argv[1]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    wanted = (
        sys.argv[3].split(",") if len(sys.argv) > 3 else list(DEFAULT_QUERIES)
    )
    base_dir, short = ensure_worktree(commit)

    sys.path.insert(0, HEAD_DIR)
    from pyspark.sql import functions as F

    from nyc_taxi_etl_dashboard_spark.session import get_spark

    spark = get_spark(app_name=f"ab_head_vs_{short}")

    import shutil
    import tempfile

    out_dir = tempfile.mkdtemp(prefix="ab_sink_")
    needs_probe = "pipe_transform_full" in wanted
    keys = [*wanted, *(["io_probe"] if needs_probe else [])]
    results: dict[str, dict[str, list[float]]] = {
        q: {"head": [], "base": []} for q in keys
    }

    def io_probe_once() -> float:
        t0 = time.perf_counter()
        (
            spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
            .agg(F.sum("l_quantity").alias("s"))
            .write.format("noop").mode("overwrite").save()
        )
        return time.perf_counter() - t0

    # a query can exist at HEAD but not at the base commit (the
    # adjudicator flags suspects from the previous ARTIFACT, which may
    # postdate the base COMMIT — caught live in round 19 when v16_prod,
    # added after b25999b, was flagged and the whole A/B sys.exit-ed).
    # Skip such queries per-variant and report them as missing instead
    # of killing the run for the queries both variants do have.
    missing_in: dict[str, set[str]] = {}

    def one_pass(variant: str, vdir: str) -> None:
        qs, bench_only, dual_sink_write, clear_nparts_memo = _use(vdir)
        for q in wanted:
            spark.catalog.clearCache()
            clear_nparts_memo()
            if q == "pipe_transform_full":
                if needs_probe:
                    results["io_probe"][variant].append(io_probe_once())
                t0 = time.perf_counter()
                dual_sink_write(spark, SF_DIR, out_dir)
            elif q == "pipe_transform_bronze":
                t0 = time.perf_counter()
                dual_sink_write(spark, BRONZE_DIR, out_dir)
            else:
                fn = qs.get(q) or bench_only.get(q)
                if fn is None:
                    missing_in.setdefault(q, set()).add(variant)
                    continue
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            results[q][variant].append(time.perf_counter() - t0)
        spark.catalog.clearCache()

    # warm up both variants once (codegen), excluded from timings
    one_pass("head", HEAD_DIR)
    one_pass("base", base_dir)
    for q in results:
        results[q] = {"head": [], "base": []}

    for r in range(rounds):
        order = [("head", HEAD_DIR), ("base", base_dir)]
        if r % 2:
            order.reverse()
        for variant, vdir in order:
            one_pass(variant, vdir)

    shutil.rmtree(out_dir, ignore_errors=True)
    report: dict = {}
    for q, r in results.items():
        if q in missing_in or not (r["head"] and r["base"]):
            # per-variant misses: a query absent in BOTH variants must
            # say "both", not whichever pass happened to run last
            miss = missing_in.get(q, {"head", "base"})
            report[q] = {
                "paired_ratio_med": None,
                "missing_in": "both" if len(miss) > 1 else next(iter(miss)),
            }
            continue
        ratios = sorted(h / b for h, b in zip(r["head"], r["base"]))
        report[q] = {
            "head_med": round(statistics.median(r["head"]), 3),
            "base_med": round(statistics.median(r["base"]), 3),
            "head_min": round(min(r["head"]), 3),
            "base_min": round(min(r["base"]), 3),
            "paired_ratio_med": round(statistics.median(ratios), 3),
            "head_runs": [round(x, 3) for x in r["head"]],
            "base_runs": [round(x, 3) for x in r["base"]],
        }
    if needs_probe:
        for variant in ("head", "base"):
            xs = results["pipe_transform_full"][variant]
            ps = results["io_probe"][variant]
            report.setdefault("io_norm", {})[variant] = round(
                statistics.median(sorted(x / p for x, p in zip(xs, ps))), 2
            )
    print(
        json.dumps(
            {"base": short, "rounds": rounds, "sf_dir": SF_DIR, "ab": report}
        )
    )


if __name__ == "__main__":
    main()
