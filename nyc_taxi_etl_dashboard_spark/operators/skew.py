"""Skew-mitigation utilities (brief §Partitioning & shuffle: "skewed
keys hurt ... salting for skew").

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on in our session); these
explicit rewrites cover what AQE can't: skewed AGGREGATIONS (AQE only
splits join partitions) and deterministic pre-planned salting when the
hot keys are known.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 groups on (key, salt) — the hot key's rows spread over
    ``salt_buckets`` reducers; phase 2 merges the partials on the key
    alone (tiny input: |distinct keys| × buckets). ``aggs`` maps output
    column -> (input column, fn) with fn ∈ {sum, count, min, max} — the
    decomposable aggregates (avg = sum/count downstream).
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partials = salted.groupBy(*keys, "__salt").agg(
        *[phase1_fn[fn](col).alias(out) for out, (col, fn) in aggs.items()]
    )
    return partials.groupBy(*keys).agg(
        *[merge_fn[fn](out).alias(out) for out, (_, fn) in aggs.items()]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Hot-key equi-join salting: fact rows get a random salt, the dim
    side replicates ``salt_buckets``× with every salt value, and the join
    key becomes (key, salt) — the hot key's fact rows land on
    ``salt_buckets`` different reducers instead of one.

    Use when the dim is too big to broadcast AND AQE's runtime split is
    insufficient (e.g. one pathological key dominating a partition after
    the split cap). Costs a ``salt_buckets``× blow-up of the dim side —
    only worth it for genuinely skewed keys; at 100 TB, restrict the
    salted path to the known-hot keys and union with a normal join for
    the rest.
    """
    salted_fact = fact.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("__salt")
    replicated_dim = dim.select("*", salts)
    return salted_fact.join(replicated_dim, [key, "__salt"]).drop("__salt")
