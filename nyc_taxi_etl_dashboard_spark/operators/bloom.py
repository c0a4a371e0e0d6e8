"""Bloom-filter membership operators — the 100 TB production form of
n-gram decontamination (t8's broadcast semi-join sibling).

Why a Bloom filter at scale
---------------------------
t8 decontaminates by broadcasting the eval benchmark's DISTINCT shingle
strings and semi-joining the corpus' exploded shingles against them.
That is the right shape while the benchmark set is small, but real
decontamination suites (every published benchmark's every n-gram) reach
tens of millions of strings — a multi-GB broadcast hash table rebuilt
per stage. The Bloom form compresses the entire membership set into an
``m``-bit array (constant size, chosen for the target false-positive
rate), and the probe becomes a map-side, shuffle-free bit test: no join,
no broadcast of strings, no hash table. The one-sided error is in the
SAFE direction for decontamination — a false positive over-removes a
clean document, never trains on a contaminated one — which is exactly
why production pipelines accept it.

Engine-portable by construction: the base hash is the repo's standard
polynomial token fold (``functions.poly_fingerprint``) and the k probe
positions are affine maps of it, so a DuckDB oracle reproduces every bit
decision exactly (see ``plans/llmops.py`` t15) — unlike Spark's own
``bloom_filter_agg``/``might_contain`` runtime filters, whose xxhash
bit layout is engine-private.

Two probe paths, identical decisions (pinned by tests/test_bloom.py):

- **JVM literal path** (default, used by the t15 certification query):
  the bitset folds into a ``array<bigint>`` literal (m/64 words) and the
  probe is ``getbit(element_at(words, pos div 64 + 1), pos % 64)`` —
  whole-stage-codegen'd, zero Python. Right while m is plan-literal
  friendly (≤ ~2^20 bits).
- **Arrow kernel path** (``use_arrow=True``): the bitset rides a numpy
  array inside a pandas UDF closure (task-broadcast once, not per-row)
  for benchmark suites sized m ≥ 2^24, where a multi-MB plan literal
  would bloat task binaries (same finding as v11's ADC LUT —
  plan-literal for certification, Arrow closure for production).
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module-level for pandas_udf type-hint resolution
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import POLY_MOD, poly_fingerprint

#: bits in the filter — 2^18 keeps the certification literal at 4096
#: bigint words (32 KB — far below the plan-literal ceiling v11
#: measured) while holding the per-shingle fp under ~0.1% at the sf0.1
#: eval-set size; production sizes this from |benchmark n-grams| and
#: the target fp rate (m ≈ -n·ln(p)/ln(2)^2) and switches to the Arrow
#: path past ~2^20.
BLOOM_M_BITS = 1 << 18

#: k affine probe hashes pos_i = (a_i * H + b_i) % m over the polynomial
#: base H ∈ [0, POLY_MOD). a_i·H < 43·10^9 — no bigint overflow in
#: either engine.
BLOOM_PARAMS = ((31, 7), (37, 11), (41, 13), (43, 17))


def shingle_hash(sh: Column | str) -> Column:
    """Portable base hash of one shingle string: the polynomial fold of
    its whitespace tokens (identical SQL: split → token_value → fold)."""
    sh = F.col(sh) if isinstance(sh, str) else sh
    return poly_fingerprint(F.split(sh, " "))


def bloom_positions(
    base: Column, m: int = BLOOM_M_BITS, params=BLOOM_PARAMS
) -> list[Column]:
    """The k probe positions for a base hash."""
    return [
        (base * F.lit(a) + F.lit(b)) % F.lit(m) for a, b in params
    ]


def bloom_build(
    member_df: DataFrame,
    col: str,
    m: int = BLOOM_M_BITS,
    params=BLOOM_PARAMS,
) -> np.ndarray:
    """Build the bitset from a membership DataFrame's string column.

    Distributed scan computes each member's k positions; the driver
    collects only the DISTINCT positions — bounded by m (a
    configuration constant, never data size), so this ``collect`` is
    safe by construction. Returns a packed uint64 word array (m/64
    words) suitable for both probe paths.
    """
    base = shingle_hash(F.col(col))
    pos = (
        member_df.select(
            F.explode(F.array(*bloom_positions(base, m, params))).alias("pos")
        )
        .distinct()
    )
    words = np.zeros(m // 64, dtype=np.uint64)
    for row in pos.collect():
        p = int(row["pos"])
        words[p >> 6] |= np.uint64(1) << np.uint64(p & 63)
    return words


def bloom_build_agg(
    member_df: DataFrame,
    col: str,
    m: int = BLOOM_M_BITS,
    params=BLOOM_PARAMS,
) -> np.ndarray:
    """DISTRIBUTED bitset build for production-sized member sets: each
    partition folds its members' probe bits into a local m-bit numpy
    bitmap (vectorized ``np.bitwise_or.at`` over Arrow batches); the
    driver then ORs one bitmap per partition — m/8 bytes each,
    independent of the member COUNT, which is what
    :func:`bloom_build`'s distinct-position collect can't promise once
    4·n approaches m (tens of millions of benchmark n-grams). For
    m ≥ ~2^28, coalesce the member side first so the driver receives
    fewer bitmaps (or tree-reduce on the RDD); at the bench sizes here
    n_partitions × m/8 is a few hundred MB at most.

    Bit-identical to :func:`bloom_build` (pinned by tests)."""
    words = np.zeros(m // 64, dtype=np.uint64)
    for row in _partition_bitmaps(member_df, col, m, params).collect():
        words |= np.frombuffer(row["bits"], dtype=np.uint64)
    return words


def _partition_bitmaps(
    member_df: DataFrame,
    col: str,
    m: int,
    params,
) -> DataFrame:
    """One m-bit local bitmap per partition (binary rows): the shared
    map stage behind :func:`bloom_build_agg` (driver OR) and
    :func:`bloom_build_tree` (executor tree OR). Vectorized
    ``np.bitwise_or.at`` over Arrow batches; emits m/8 bytes per
    partition regardless of member count."""
    k = len(params)
    base = shingle_hash(F.col(col))
    pos_df = member_df.select(
        *[p.alias(f"p{i}") for i, p in enumerate(bloom_positions(base, m, params))]
    )

    def part_bits(batches):
        w = np.zeros(m // 64, dtype=np.uint64)
        for pdf in batches:
            for i in range(k):
                p = pdf[f"p{i}"].to_numpy(dtype=np.int64)
                np.bitwise_or.at(
                    w, p >> 6, np.uint64(1) << (p.astype(np.uint64) & np.uint64(63))
                )
        yield pd.DataFrame({"bits": [w.tobytes()]})

    return pos_df.mapInPandas(part_bits, "bits binary")


def bloom_build_tree(
    member_df: DataFrame,
    col: str,
    m: int = BLOOM_M_BITS,
    params=BLOOM_PARAMS,
    depth: int = 2,
) -> np.ndarray:
    """TREE-REDUCED bitset build — the m ≥ ~2^28 escalation
    :func:`bloom_build_agg`'s docstring promised (VERDICT r13 item 5):
    per-partition bitmaps are OR-ed pairwise on EXECUTORS via RDD
    ``treeReduce``, so the driver receives exactly ONE m/8-byte bitmap
    instead of n_partitions of them. At m = 2^30 (128 MiB bitset) and
    512 partitions, the agg form ships 64 GiB to the driver; this form
    ships 128 MiB — the difference between a config bump and an OOM.

    Cost model: one extra shuffle level per tree layer (``depth`` = 2
    handles thousands of partitions); below ~2^26 the executor-side
    tree costs more than it saves — keep :func:`bloom_build_agg` there
    (measured in SCALE100X.md round-14). Bit-identical to both sibling
    builds (pinned by tests: OR is associative and commutative, so
    reduction order cannot change the bitset)."""
    bitmaps = _partition_bitmaps(member_df, col, m, params)
    words = (
        bitmaps.rdd.map(
            lambda row: np.frombuffer(row["bits"], dtype=np.uint64)
        ).treeReduce(lambda a, b: np.bitwise_or(a, b), depth)
    )
    return np.array(words, dtype=np.uint64)


def bloom_member_expr(
    base: Column,
    words: np.ndarray,
    m: int = BLOOM_M_BITS,
    params=BLOOM_PARAMS,
) -> Column:
    """JVM-side membership test: true iff ALL k probe bits are set.

    The bitset becomes an ``array<bigint>`` plan literal; each probe is
    an ``element_at`` + ``getbit`` — whole-stage codegen, no Python, no
    join, no shuffle. The literal is created from the numpy array
    directly (a single Literal(ArrayData)) — building it as
    ``F.array(4096 × F.lit)`` instead leaves a CreateArray tree that
    costs ~3× at probe time (measured) plus plan-compile seconds.
    """
    words_lit = F.lit(words.view(np.int64))
    probes = []
    for p in bloom_positions(base, m, params):
        word = F.element_at(words_lit, (p / F.lit(64)).cast("int") + F.lit(1))
        probes.append(_getbit(word, p % F.lit(64)))
    out = probes[0]
    for pr in probes[1:]:
        out = out & pr
    return out


def _getbit(word: Column, bit: Column) -> Column:
    """Bit test via arithmetic shift. pyspark's ``F.shiftright`` only
    takes a literal shift amount; the SQL function accepts any int
    expression, so call it directly."""
    from pyspark.sql.functions import call_function

    shifted = call_function("shiftright", word, bit.cast("int"))
    return shifted.bitwiseAND(F.lit(1)) == F.lit(1)


def bloom_member_arrow(
    df: DataFrame,
    base_col: str,
    words: np.ndarray,
    out: str = "bloom_hit",
    m: int = BLOOM_M_BITS,
    params=BLOOM_PARAMS,
) -> DataFrame:
    """Arrow-kernel membership path for production-sized bitsets: the
    packed word array rides the UDF closure (serialized once per task,
    not per row); probes are vectorized numpy gathers over each Arrow
    batch. Decision-identical to :func:`bloom_member_expr` (pinned)."""
    from pyspark.sql.functions import pandas_udf

    w = words.copy()

    @pandas_udf("boolean")
    def probe(base: pd.Series) -> pd.Series:
        h = base.to_numpy(dtype=np.int64)
        hit = np.ones(len(h), dtype=bool)
        for a, b in params:
            pos = (h * a + b) % m
            hit &= (w[pos >> 6] >> (pos.astype(np.uint64) & np.uint64(63))).astype(
                np.int64
            ) & 1 == 1
        return pd.Series(hit)

    return df.withColumn(out, probe(F.col(base_col)))


def doc_hit_counts(
    sh_df: DataFrame,
    words: np.ndarray,
    m: int = BLOOM_M_BITS,
    params=BLOOM_PARAMS,
    id_col: str = "doc_id",
    shingle_col: str = "shingle",
    out: str = "n_bloom_hit",
) -> DataFrame:
    """Per-document Bloom hit counts — THE probe stage every
    decontamination surface shares (t15 cert + prod, x14 stage 2, the
    streaming sink): explode the shingle array, hash, test all k bits
    JVM-side, aggregate per document. One definition so the certified
    query, the production path, and the streaming twin cannot drift."""
    return (
        sh_df.select(id_col, F.explode(shingle_col).alias("__sg"))
        .withColumn("__H", shingle_hash("__sg"))
        .withColumn(
            "__hit",
            bloom_member_expr(F.col("__H"), words, m=m, params=params).cast("int"),
        )
        .groupBy(id_col)
        .agg(F.sum("__hit").alias(out))
    )
