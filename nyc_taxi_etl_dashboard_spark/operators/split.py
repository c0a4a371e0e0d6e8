"""Deterministic dataset splitting — the train/val/test assignment
stage of a training-data pipeline (NEW surface; the reference's only
split-shaped operation is the valid/anomaly classify split,
Scripts_ETL/transform.py, which is predicate-based, not proportional).

Two properties a 100 TB split stage must deliver at once:

- **Exact proportions per stratum.** Hash-threshold splits
  (``pmod(hash(id), 100) < 80``) are map-side but only *approximately*
  proportional — at small strata the binomial error is material, and
  re-balancing after the fact breaks determinism. Training recipes
  that promise "exactly 10% held out per language" need exact cuts.
- **No per-stratum global sort.** The naive exact form —
  ``row_number() OVER (PARTITION BY stratum ORDER BY rank)`` then
  compare against ``ceil(f·n)`` — funnels each stratum through ONE
  reducer; with a handful of languages over 100 TB that is the same
  skew cliff the x10 quota gate closed. The quota kernel
  (:func:`..operators.skew.capped_keep_first`) does NOT transfer: its
  phase-2 bound is ``salt_buckets × quota`` rows, and a proportional
  cut's quota is ``0.8·n`` — corpus-sized, so the bound collapses.

The kernel here is the classic *histogram-cut* (distributed selection
via bucket counting — the SELECT/quantile algorithm of parallel DBs,
e.g. Blanas et al.; DuckDB/Presto use the same shape for exact
percentiles):

1. One map-side-combinable ``(stratum, bucket)`` count, where
   ``bucket = rank DIV bucket_width`` is a monotone coarsening of the
   rank order. The histogram is ``|strata| × n_buckets`` rows —
   driver-bounded by CONFIGURATION (like the x8 mixture planner and
   the kmeans/PQ fits), not by corpus size.
2. Driver-side prefix sums locate, for each cumulative cut
   ``c = ceil(num·n / den)`` (integer math — float fractions round
   differently across engines), the *boundary bucket* that contains
   the c-th row and how many of that bucket's rows fall at-or-before
   the cut.
3. Rows in non-boundary buckets are labeled MAP-SIDE (their bucket is
   strictly before or after every cut). Only the ≤ ``len(cuts)``
   boundary buckets per stratum are windowed — each holds about
   ``n / n_buckets`` rows regardless of how skewed the strata are, so
   the windowed volume is set by the bucket-width choice, never by a
   hot stratum.

Determinism: rank is a caller-supplied portable pseudorandom key (the
x15 Knuth-multiplicative recipe), ties broken by id — re-runs,
retries, and backfills assign byte-identical splits on any engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ceil_cut(n: int, num: int, den: int) -> int:
    """ceil(n·num/den) in exact integer math (cross-engine stable)."""
    return (n * num + den - 1) // den


def exact_proportional_split(
    df: DataFrame,
    stratum_col: str,
    rank_col: str,
    id_col: str,
    cuts: Sequence[tuple[int, int]] = ((8, 10), (9, 10)),
    labels: Sequence[str] = ("train", "val", "test"),
    bucket_width: int = 1 << 40,
    out_col: str = "split",
    persist_input: bool = True,
) -> DataFrame:
    """Assign each row a split label with EXACT per-stratum proportions.

    ``cuts`` are cumulative ``(numerator, denominator)`` fractions in
    increasing order; a stratum of ``n`` rows sends its first
    ``ceil(n·num_i/den_i)`` rows (ordered by ``(rank_col, id_col)``) to
    the labels at-or-before cut ``i``. With the default cuts a stratum
    splits exactly ceil(0.8n) / ceil(0.9n)−ceil(0.8n) / rest.

    ``rank_col`` must be a non-negative integral column (the
    deterministic pseudorandom order); ``id_col`` breaks rank ties.
    Output: ``df``'s columns plus ``out_col``. Exact-equivalence to the
    plain per-stratum window is pinned by
    tests/test_llmops.py::test_exact_split_equals_plain_window.

    Two-pass consistency (ADVICE r13): the input is evaluated once for
    the driver-side histogram and once for labeling; a nondeterministic
    upstream (``sample`` without a seed, repartition-dependent ranks)
    would make the collected cuts inconsistent with the second pass and
    silently skew proportions. ``persist_input=True`` (default) pins
    one materialization across both passes (MEMORY_AND_DISK — the
    standard two-pass shape at scale; callers own cache cleanup, the
    repo-wide convention the driver/bench wrappers honor). Pass
    ``False`` only when the input is provably deterministic (a plain
    parquet scan + narrow ops) and the double-evaluation is cheaper
    than the cache. Rows with NULL ``stratum_col`` raise — a silent
    inner-join drop is not a split.
    """
    if len(labels) != len(cuts) + 1:
        raise ValueError("need len(labels) == len(cuts) + 1")
    fracs = [num / den for num, den in cuts]
    if sorted(fracs) != fracs:
        raise ValueError("cuts must be in increasing cumulative order")

    bucket = (F.col(rank_col) / F.lit(bucket_width)).cast("bigint")
    with_bucket = df.withColumn("__bkt", bucket)
    if persist_input:
        from pyspark import StorageLevel

        from . import scoped_persist

        with_bucket = scoped_persist(with_bucket, StorageLevel.MEMORY_AND_DISK)

    # 1. bounded histogram (map-side partial agg; |strata| × n_buckets rows)
    hist = (
        with_bucket.groupBy(stratum_col, "__bkt")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .collect()
    )
    per_stratum: dict = {}
    for row in hist:
        if row[stratum_col] is None:
            raise ValueError(
                f"exact_proportional_split: {row['__cnt']} rows have NULL "
                f"{stratum_col!r}; assign them a stratum (or filter them) first "
                "— the labeling join would silently drop them"
            )
        per_stratum.setdefault(row[stratum_col], []).append((row["__bkt"], row["__cnt"]))

    # 2. driver prefix sums → per (stratum, cut): boundary bucket + the
    # number of that bucket's rows at-or-before the cut
    spec_rows = []
    for stratum, pairs in per_stratum.items():
        pairs.sort()
        n = sum(c for _, c in pairs)
        for i, (num, den) in enumerate(cuts):
            target = _ceil_cut(n, num, den)
            cum = 0
            for bkt, cnt in pairs:
                if cum + cnt >= target:
                    spec_rows.append((stratum, i, bkt, target - cum))
                    break
                cum += cnt
            else:  # target == 0 (num == 0): cut before everything
                spec_rows.append((stratum, i, -1, 0))
    spark = df.sparkSession
    spec = spark.createDataFrame(
        spec_rows, f"{stratum_col} {df.schema[stratum_col].dataType.simpleString()}, __cut int, __cut_bkt bigint, __cut_k bigint"
    )
    # one row per stratum with per-cut columns, broadcast onto the data
    wide = spec.groupBy(stratum_col).agg(
        *[
            F.max(F.when(F.col("__cut") == i, F.col("__cut_bkt"))).alias(f"__b{i}")
            for i in range(len(cuts))
        ],
        *[
            F.max(F.when(F.col("__cut") == i, F.col("__cut_k"))).alias(f"__k{i}")
            for i in range(len(cuts))
        ],
    )
    joined = with_bucket.join(F.broadcast(wide), stratum_col)

    # 3. windows over boundary buckets only (~n/n_buckets rows each)
    is_boundary = None
    for i in range(len(cuts)):
        cond = F.col("__bkt") == F.col(f"__b{i}")
        is_boundary = cond if is_boundary is None else (is_boundary | cond)
    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col, "__bkt").orderBy(rank_col, id_col)
    boundary = joined.filter(is_boundary).withColumn("__rn", F.row_number().over(w))
    rest = joined.filter(~is_boundary).withColumn("__rn", F.lit(0))
    both = boundary.unionByName(rest)

    # label index = number of cuts the row falls AFTER
    after = [
        (F.col("__bkt") > F.col(f"__b{i}"))
        | ((F.col("__bkt") == F.col(f"__b{i}")) & (F.col("__rn") > F.col(f"__k{i}")))
        for i in range(len(cuts))
    ]
    idx = sum((a.cast("int") for a in after), F.lit(0))
    label_arr = F.array(*[F.lit(lb) for lb in labels])
    out = both.withColumn(out_col, F.element_at(label_arr, idx + 1))
    drop = ["__bkt", "__rn"] + [f"__b{i}" for i in range(len(cuts))] + [
        f"__k{i}" for i in range(len(cuts))
    ]
    return out.drop(*drop)
