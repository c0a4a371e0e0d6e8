"""Star-schema warehouse layer (SURVEY §2.3 J1-J5, §2.7 U2, §2.8 D2,
§3.3): dimension builders, surrogate keys, fact resolution.

The reference loads a Postgres star schema (``load.py:19-59``): dims get
``SERIAL`` surrogate keys, are deduped then upserted
(``load.py:114-147``), and the fact resolves FKs via four client-side
pandas inner merges (``load.py:155-172``).

Spark-first design
------------------
- **Surrogate keys**: Postgres SERIAL doesn't distribute. Two minting
  strategies (SURVEY §7.3):
  * ``dense_key`` — ``row_number() OVER (ORDER BY natural key)``:
    deterministic and oracle-comparable, but serializes a global sort —
    fine for dims (small by definition), wrong for facts.
  * ``hash_key`` — ``xxhash64(natural key)``: shuffle-free, stable,
    collision-checked at warehouse scale; default for anything big.
- **Fact resolution**: four *broadcast* hash joins — dims are tiny
  relative to the fact, so no fact shuffle at all; the 100 TB plan is
  scan → 4 BroadcastHashJoins → project, one stage end to end.
- **Inner-join row loss** is semantic parity: fact rows whose decode
  label is NULL (unmapped codes, ``transform.py:99``) silently drop,
  exactly like pandas inner merge (SURVEY §2.3 note).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dense_key(df: DataFrame, order_cols: list[str], key_col: str) -> DataFrame:
    """Deterministic dense surrogate keys: row_number over an explicit
    total ordering (never ``monotonically_increasing_id`` — its values
    depend on partition layout, SURVEY §5.2 determinism hygiene).

    Scale note: the empty-frame window forces a single-partition sort —
    only acceptable when cardinality is genuinely bounded (payment types,
    locations). dim_time's natural key grows linearly with the fact, so
    dense keys are NOT the default anywhere (see ``build_dim``); they
    exist for oracle comparison, where a SQL engine must reproduce the
    key values.
    """
    w = Window.orderBy(*[F.asc(c) for c in order_cols])
    return df.withColumn(key_col, F.row_number().over(w))


def hash_key(*cols: str | Column) -> Column:
    """Distributed surrogate key: xxhash64 of the natural key. O(1),
    shuffle-free, deterministic across runs/cluster layouts."""
    return F.xxhash64(*[F.col(c) if isinstance(c, str) else c for c in cols])


def build_dim(
    df: DataFrame,
    natural_cols: list[str],
    key_col: str,
    attr_cols: list[str] | None = None,
    oracle_mode: bool = False,
) -> DataFrame:
    """D2 + surrogate keys: dedup natural key (+ functionally-dependent
    attributes), then mint surrogate keys.

    Default minting is :func:`hash_key` (xxhash64 of the natural key):
    shuffle-free and layout-independent, so a dim whose natural-key
    cardinality grows with the fact (dim_time's raw pickup timestamp
    does) never serializes through a single-partition sort.
    ``oracle_mode=True`` mints dense row_number keys instead — the
    engine-portable twin a SQL oracle can reproduce (DuckDB has no
    xxhash64); it carries the global-sort cost and exists for
    driver/test comparison only, never as the production default.

    NULL natural keys are excluded: a NULL-keyed dim row can never match
    an inner equi-join (and Spark vs SQL NULL sort order differs, so
    keeping it would also make dense keys engine-dependent).
    """
    dim = df.select(*natural_cols, *(attr_cols or []))
    for c in natural_cols:
        dim = dim.filter(F.col(c).isNotNull())
    dim = dim.distinct()
    if oracle_mode:
        return dense_key(dim, natural_cols, key_col)
    return dim.withColumn(key_col, hash_key(*natural_cols))


def union_distinct_dim(
    df: DataFrame, cols: list[str], out_col: str, key_col: str, oracle_mode: bool = False
) -> DataFrame:
    """U2: one dim from N columns — ``concat + drop_duplicates``
    (``load.py:127-130``) as union + distinct. The distinct's shuffle is
    on the (tiny) dim domain, not the fact."""
    parts = [df.select(F.col(c).alias(out_col)) for c in cols]
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    return build_dim(merged, [out_col], key_col, oracle_mode=oracle_mode)


def upsert_anti_join(new: DataFrame, existing: DataFrame, keys: list[str]) -> DataFrame:
    """J5: ``ON CONFLICT DO NOTHING`` (``load.py:121-123``) — rows of
    ``new`` whose key is absent from ``existing``. Broadcast the existing
    key set when it's small; left-anti is the shuffle-free upsert filter."""
    return new.join(F.broadcast(existing.select(*keys).distinct()), on=keys, how="left_anti")


def resolve_fact(
    fact: DataFrame,
    dims: list[tuple[DataFrame, Column, str]],
    select_cols: list[Column],
) -> DataFrame:
    """J1-J4: resolve surrogate keys via broadcast inner equi-joins.

    ``dims`` is [(dim_df, join_condition, alias)] — the alias handles the
    pandas ``suffixes=('_pu','_do')`` double-join against the same dim
    (J3, ``load.py:163-168``), which Spark expresses with ``.alias()``.
    Inner semantics = reference row-loss parity.
    """
    out = fact
    for dim_df, cond, alias in dims:
        out = out.join(F.broadcast(dim_df.alias(alias)), cond, "inner")
    return out.select(*select_cols)
