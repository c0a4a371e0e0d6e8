"""Deduplication operators (reference D1-D3 + NEW fuzzy-dedup surface
for training-data pipelines: MinHash+LSH, SimHash, n-gram Jaccard).

Scale design
------------
- Exact dedup is a hash aggregate — one shuffle on the dedup key.
- Pairwise Jaccard is NEVER computed all-pairs: an inverted shingle
  index (explode → self-join on shingle → group by pair) touches only
  pairs sharing ≥1 shingle; candidate count is bounded by shingle
  frequency, so hot shingles are capped (see ``max_shingle_freq``) the
  way web-dedup pipelines drop stop-shingles.
- MinHash LSH: signatures are narrow per-row expressions; banding turns
  near-dup search into an equi-join on (band, band-hash) — the classic
  shuffle-friendly formulation (one shuffle to bucket, one to verify).
- SimHash gives a 1-word sketch per doc; ``simhash_pairs`` finds
  hamming-ball near-dups via banded pigeonhole bucketing (equi-join on
  band bits, exact bit_count verify on collisions — never all-pairs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import POLY_MOD
from . import exact_threshold, scale_out, scoped_persist
from .text import with_shingles

#: deterministic MinHash permutation parameters h_i(x) = (a_i*x + b_i) % P
MINHASH_PRIME = POLY_MOD


def minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    return [(2 * i + 3, 5 * i + 7) for i in range(num_hashes)]


def exact_dedup(df: DataFrame, cols: list[str]) -> DataFrame:
    """D1: ``drop_duplicates(subset=...)`` (``transform.py:171``).
    Arbitrary survivor per key — cheapest form (map-side partial dedup
    then one shuffle)."""
    return df.dropDuplicates(cols)


def dedup_keep_first(df: DataFrame, keys: list[str], order_cols: list[str]) -> DataFrame:
    """D1 deterministic variant: pandas keep='first' needs an explicit
    tiebreaker in a distributed engine (SURVEY §5.3 parity trap) —
    row_number over (key, tiebreaker order), keep rank 1."""
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


#: floor of the corpus-relative df-cap ("auto" mode): never cap below
#: the historical fixed default, so small corpora behave exactly as the
#: certified fixed-cap runs did
AUTO_DF_CAP_MIN = 100
#: corpus-relative df-cap fraction: a shingle is a stop-shingle when it
#: appears in more than this fraction of documents. 0.5% tracks the
#: standard web-dedup heuristic (boilerplate lives in far more docs
#: than any true duplicate group).
AUTO_DF_CAP_EPS = 0.005


def _resolve_df_cap(
    df: DataFrame, max_shingle_freq: int | str | None, id_col: str
) -> int | None:
    """Resolve the stop-shingle document-frequency cap.

    ``"auto"`` = ``max(AUTO_DF_CAP_MIN, ceil(AUTO_DF_CAP_EPS · N))``
    with N the corpus document count — the round-9/10 fix for the dd12
    100× finding: a FIXED cap silently empties the inverted index on
    replica-heavy corpora (every shingle's df exceeds it once the
    replication factor does), collapsing recall to zero exactly on the
    boilerplate-heavy crawls that need containment detection most. A
    corpus-relative cap keeps true duplicate groups (whose size grows
    with replication, i.e. slower than the corpus) under the cap while
    still dropping genuine stop-shingles (df ∝ N).

    Worst-case candidate volume under the cap: Σ df_i² over surviving
    shingles ≤ cap · Σ df_i = cap · (total postings) — linear in corpus
    size times a configuration constant, never quadratic.

    Cost: one count job over the id column (scan-only, no shuffle).
    At bench scales (≤5k docs) auto resolves to the floor (100), so
    certified fixed-cap outputs are unchanged.
    """
    if max_shingle_freq == "auto":
        import math

        from . import memo_count

        n = memo_count(df.select(id_col))
        return max(AUTO_DF_CAP_MIN, int(math.ceil(AUTO_DF_CAP_EPS * n)))
    return max_shingle_freq


def _tv_sql(var: str) -> str:
    """token_value as SQL text (see functions.token_value)."""
    return f"(ascii({var}) * 10007 + ascii(reverse({var})) * 101 + length({var}))"


def minhash_signature(
    num_hashes: int, shingle_col: str = "shingle", portable: bool = True
) -> Column:
    """MinHash signature as an array<bigint> column expression.

    h_i(doc) = min over shingles of (a_i * hash(s) + b_i) % P —
    per-row, shuffle-free, codegen'd. Empty shingle arrays get P (an
    impossible hash) so signatures stay total.

    ``portable=True`` uses the weak-but-engine-portable ``token_value``
    hash (oracle-comparable bit-for-bit; fine for signature parity
    demos). ``portable=False`` uses ``xxhash64`` — the production
    choice: ``token_value``'s tiny codomain (~2k values on a small
    vocabulary) makes unrelated shingles collide, which inflates LSH
    buckets quadratically.
    """
    base = _tv_sql("s") if portable else "xxhash64(s)"
    # hash each shingle ONCE and bind the bigint array via the
    # array-wrap trick (see simhash32): the previous form re-evaluated
    # ``base`` inside every one of the num_hashes transforms — 32×
    # xxhash64 (or 32× ascii+reverse+length) per shingle for identical
    # values (optimization r18, guide §1.2 per-task work). The per-hash
    # arithmetic abs((a·h + b) % P) is unchanged integer math on the
    # same h, so every signature value is bit-identical.
    parts = []
    for a, b in minhash_params(num_hashes):
        parts.append(
            f"coalesce(array_min(transform(hs, h -> abs(({a} * h + {b}) % {MINHASH_PRIME}))), {MINHASH_PRIME})"
        )
    return F.expr(
        f"element_at(transform(array(transform({shingle_col}, s -> {base})), "
        f"hs -> array({', '.join(parts)})), 1)"
    )


def simhash32(text_col: str = "text", sep: str = " ") -> Column:
    """32-bit SimHash sketch: bit b is the sign of the sum over tokens of
    ±1 depending on bit b of a per-token hash. One BIGINT per document.

    Tokens bind once via the array-wrap trick (see ``text.shingles``) —
    a named token column would re-tokenize inside each of the 32 bit
    aggregations."""
    tv = _tv_sql("t")
    # bit b = parity of bit b of (token_value * Knuth's 2654435761): one
    # multiply mixes tv's ~21 bits across the word, so sketch bits are
    # near-independent — the earlier (tv * (2b+1)) % p & 1 scheme left
    # bits correlated ACROSS DOCUMENTS (tiny tv codomain x odd multiplier
    # parity), collapsing the corpus into a narrow hamming ball and making
    # hamming-based pairing quadratic. Still portable: DuckDB reproduces
    # the exact arithmetic (product < 2^53, no overflow either engine).
    # mix each token ONCE (ascii + reverse + length + the Knuth
    # multiply) and bind the bigint array via the same array-wrap
    # trick: the previous form re-evaluated the whole token hash inside
    # every one of the 32 bit aggregations — 32× string reversals per
    # token for identical values (optimization r18, guide §1.2). The
    # per-bit test shiftright(m, b) & 1 and the ±1 sum are unchanged
    # integer math on the same m, so every sketch bit is identical.
    per_bit = (
        "aggregate(mix, 0, (s, m) -> s + "
        "(CASE WHEN (shiftright(m, b) & 1) = 1 THEN 1 ELSE -1 END))"
    )
    return F.expr(
        f"transform(array(transform(split({text_col}, '{sep}'), t -> {tv} * 2654435761)), mix -> "
        "aggregate(sequence(0, 31), cast(0 as bigint), "
        f"(acc, b) -> acc + (CASE WHEN {per_bit} > 0 THEN shiftleft(cast(1 as bigint), b) ELSE cast(0 as bigint) END)))[0]"
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs via banded pigeonhole bucketing (the
    classic web-dedup scheme: Manku/Jain/Sarma WWW'07): any two 32-bit
    sketches within ``max_hamming`` differing bits must agree EXACTLY on
    at least one of ``bands`` equal-width bands whenever
    ``bands > max_hamming`` — so candidates are an equi-join on
    (band_id, band_bits), never all-pairs, and the exact hamming check
    runs only on collisions.

    Scale shape: one narrow explode (``bands`` slim rows per doc carrying
    the 1-word sketch), one shuffle on the band key, pair-dedup, then a
    per-row bit_count verify. Candidate volume is bounded by band-bucket
    occupancy, the same economics as MinHash-LSH banding.
    """
    if bands <= max_hamming:
        raise ValueError("pigeonhole needs bands > max_hamming")
    width = 32 // bands
    sh = scale_out(df.select(id_col, text_col)).withColumn("sh", simhash32(text_col))
    banded = sh.select(
        id_col,
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("sh", b * width)
                        .bitwiseAND(F.lit((1 << width) - 1).cast("bigint"))
                        .alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "sh", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = banded.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"), "band", "key")
    b = banded.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"), "band", "key")
    # hamming BEFORE the pair-dedup shuffle: the verify is a narrow
    # bit_count on columns the collision row already carries, so
    # filtering first shrinks the dropDuplicates shuffle from ALL
    # band collisions (false positives included) to true pairs only —
    # identical output, hamming is a pure function of the pair.
    # coalesce() makes the predicate null-TOLERANT on purpose: a
    # null-intolerant comparison here lets Catalyst infer isnotnull(sh)
    # and push it through the projection into the scan filter, where it
    # RECOMPUTES the whole simhash per document (measured 4x on dd7
    # at sf0.1). Null sh (null text) maps to the sentinel 32 > any
    # max_hamming, so the pair drops either way — same semantics.
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.coalesce(F.col("hamming"), F.lit(32)) <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def _union_find_local(edge_rows: list, spark, id_type: str = "bigint") -> DataFrame:
    """Exact driver-side components for graphs under the local
    threshold: union-find with path compression + union by size, then
    relabel every node to its component MINIMUM (the same contract as
    the distributed path). One pass over the edges, no Spark jobs."""
    parent: dict = {}
    size: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edge_rows:
        for n in (a, b):
            if n not in parent:
                parent[n], size[n] = n, 1
        ra, rb = find(a), find(b)
        if ra != rb:
            if size[ra] < size[rb]:
                ra, rb = rb, ra
            parent[rb] = ra
            size[ra] += size[rb]
    comp_min: dict = {}
    for n in parent:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return spark.createDataFrame(
        [(n, comp_min[find(n)]) for n in parent],
        f"id {id_type}, cluster_id {id_type}",
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
    local_threshold: int = 1_000_000,
) -> DataFrame:
    """Connected components over a near-dup pair list — the step that
    turns pairwise evidence into DEDUP DECISIONS (one cluster id per
    document; keep the minimum id, drop the rest). Returns
    (id, cluster_id) for every node appearing in a pair; cluster_id is
    the component's minimum node id.

    Hybrid execution (the GraphFrames/GraphX pattern): a pair list
    under ``local_threshold`` edges collects to the driver and solves
    EXACTLY with union-find in one pass — per-round Spark job latency
    (3 joins + a checkpoint each) dwarfs the actual work for graphs
    that fit driver-side, and near-dup graphs at moderate corpus size
    do. Above the threshold, the distributed path:

    min-label propagation with POINTER JUMPING: each round every node
    takes the min over its closed neighborhood, then chases its label
    one hop (label ← label(label)), which halves the remaining path to
    the component minimum — O(log diameter) rounds instead of
    O(diameter), so the default ``max_iters`` covers diameters past
    2^20 rather than 20. Scale shape per round: the neighbor join +
    groupBy min, the jump self-join, and ONE job — the convergence
    counter rides the checkpoint job via ``observe`` rather than a
    second compare-join pass. Labels are ``localCheckpoint``-ed each
    round so lineage doesn't deepen with iteration count; the driver
    holds only the convergence counter.

    Raises ``RuntimeError`` if the labels are still moving after
    ``max_iters`` rounds — silently returning unconverged labels would
    corrupt downstream dedup decisions (clusters would split).
    """
    from pyspark.sql import Observation

    undirected = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    if local_threshold:
        # limit(threshold+1): bounds the probe AND the collect — never
        # pulls more than threshold+1 rows even on a huge pair list
        head = undirected.limit(local_threshold + 1).collect()
        if len(head) <= local_threshold:
            return _union_find_local(
                [(r.src, r.dst) for r in head],
                pairs.sparkSession,
                id_type=dict(pairs.dtypes)[id_a],
            )
    edges = undirected
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "label", F.col("id")
    )
    for _ in range(max_iters):
        nbr = (
            edges.join(
                labels.select(F.col("id").alias("dst"), F.col("label").alias("dl")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dl").alias("nbr_label"))
            .select(F.col("src").alias("id"), "nbr_label")
        )
        prop = labels.join(nbr, "id", "left").select(
            "id",
            F.col("label").alias("old"),
            F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias(
                "mid"
            ),
        )
        # pointer jump: labels are node ids, so resolve one more hop
        # through the previous round's label table. Monotone: jl >= the
        # component min and final <= mid <= old, so labels only descend.
        jump = labels.select(F.col("id").alias("mid"), F.col("label").alias("jl"))
        obs = Observation()
        labels = (
            prop.join(jump, "mid", "left")
            .select(
                "id",
                "old",
                F.least(F.col("mid"), F.coalesce("jl", F.col("mid"))).alias("label"),
            )
            .observe(
                obs,
                F.sum((F.col("label") != F.col("old")).cast("long")).alias("changed"),
            )
            .select("id", "label")
            .localCheckpoint(eager=True)
        )
        if not obs.get["changed"]:
            break
    else:
        raise RuntimeError(
            f"connected_components: labels still moving after {max_iters} rounds; "
            "raise max_iters (components deeper than 2^max_iters are implausible "
            "for near-dup graphs — check the pair generator for a degenerate hub)"
        )
    return labels.select(F.col("id"), F.col("label").alias("cluster_id"))


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | str | None = 100,
    unpersist_after: bool = False,
) -> DataFrame:
    """n-gram Jaccard near-dup pairs via an inverted shingle index.

    explode(distinct shingles) → self-equi-join on shingle → per-pair
    common count → jaccard = common / (|A| + |B| - common). Pairs sharing
    no shingle are never materialized. ``max_shingle_freq`` drops
    stop-shingles (document-frequency cap) — without it one shingle
    shared by m docs emits m² candidate rows, the exact quadratic blowup
    the inverted index exists to avoid, so the cap defaults ON (100).

    Recall consequence of the cap: a dropped stop-shingle no longer
    counts toward ``common``, so a pair whose overlap is *mostly*
    stop-shingles can fall below the threshold — the standard web-dedup
    tradeoff (near-dup evidence from ultra-common n-grams is weak
    anyway). ``max_shingle_freq=None`` disables the cap for exhaustive
    runs on small corpora; ``"auto"`` makes it corpus-size-relative
    (:func:`_resolve_df_cap`) — the production setting for corpora whose
    replication factor can exceed any fixed cap.

    Cache ownership (VERDICT r13 item 6): the inverted index persists
    so both self-join sides share one shingling pass; by default the
    CALLER owns cleanup (the driver/bench loops ``clearCache()`` per
    query). Library consumers composing many calls in one session pass
    ``unpersist_after=True``: the slim pair output is materialized
    eagerly (localCheckpoint) and the index unpersisted before
    returning — no cache entry outlives the call.
    """
    max_shingle_freq = _resolve_df_cap(df, max_shingle_freq, id_col)
    sh = with_shingles(scale_out(df.select(id_col, text_col)), text_col, k)
    sh = sh.select(id_col, F.array_size("shingle").alias("n_sh"), "shingle")
    inv = sh.select(id_col, "n_sh", F.explode("shingle").alias("sh"))
    if max_shingle_freq is not None:
        # document-frequency cap as a window count partitioned on the
        # SAME key the self-join below shuffles on: the cached index
        # comes out hash-partitioned by ``sh``, the join reuses that
        # partitioning, and the cap costs no extra shuffle. (The round-2
        # formulation — separate freq agg + broadcast anti-join — added
        # a full second shuffle pass that doubled the query even when
        # zero shingles exceeded the cap.) ``n_sh`` is computed BEFORE
        # the drop, so jaccard denominators still count hot shingles —
        # only ``common`` loses them, the documented recall tradeoff.
        w = Window.partitionBy("sh")
        inv = (
            inv.withColumn("df_", F.count(F.lit(1)).over(w))
            .filter(F.col("df_") <= max_shingle_freq)
            .drop("df_")
        )
    # persist: the self-join consumes the index twice; without this each
    # side re-parses and re-shingles the corpus. Callers own cleanup: the
    # driver/bench loops clearCache() between queries (query-scoped blocks)
    inv = scoped_persist(inv)
    a = inv.select(
        F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"), F.col("sh")
    )
    b = inv.select(
        F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"), F.col("sh")
    )
    pairs = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("common"))
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if unpersist_after:
        pairs = pairs.localCheckpoint(eager=True)
        inv.unpersist()
    return pairs


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    unpersist_after: bool = False,
) -> DataFrame:
    """MinHash + LSH banding + exact verification.
    ``unpersist_after``: see :func:`jaccard_pairs` — same contract on
    the shingle cache.

    1. signature: array<bigint>[num_hashes] per doc (narrow, no shuffle)
    2. banding: explode into ``bands`` rows keyed by (band_id, hash of
       the band's rows); equi-join groups collisions — candidate pairs
       (one shuffle on the band key)
    3. exact verify: recompute true shingle Jaccard on candidates only
       (guards LSH false positives; with 8 bands × 4 rows the miss
       probability at j≥0.9 is <2e-4, and everything is deterministic).

    At 100 TB step 2 is the only wide operation and its key cardinality
    (docs × bands) shards evenly — this is the canonical distributed
    near-dup shape (cf. Spark MLlib MinHashLSH, same strategy).
    """
    rows_per_band = num_hashes // bands
    sh = scoped_persist(with_shingles(scale_out(df.select(id_col, text_col)), text_col, k))
    sig = sh.withColumn("sig", minhash_signature(num_hashes, portable=False))
    # slim band table: (id, band, key) only — never shuffle the shingle
    # arrays with the bucketing join (they'd be duplicated x bands)
    banded = sig.select(
        id_col,
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> "
                f"named_struct('band', b, 'key', hash(slice(sig, b * {rows_per_band} + 1, {rows_per_band}))))"
            )
        ).alias("bk"),
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = banded.select(F.col(id_col).alias("id_a"), "band", "key")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "key")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # fetch shingle arrays only for surviving candidates, then verify
    sh_a = sh.select(F.col(id_col).alias("id_a"), F.col("shingle").alias("sh_a"))
    sh_b = sh.select(F.col(id_col).alias("id_b"), F.col("shingle").alias("sh_b"))
    common = F.array_size(F.array_intersect("sh_a", "sh_b"))
    verified = (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn(
            "jaccard",
            common / (F.array_size("sh_a") + F.array_size("sh_b") - common),
        )
    )
    out = verified.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )
    if unpersist_after:
        out = out.localCheckpoint(eager=True)
        sh.unpersist()
    return out


def minhash_signature_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 8,
    portable: bool = True,
) -> DataFrame:
    """``(id, sig array<bigint>)`` — the persisted warehouse form of a
    corpus's MinHash sketch (NEW vs reference: cross-run incremental
    dedup). Computing it is one map-only pass; once written (parquet /
    ``merge_parquet``), every future increment dedups against the
    corpus from ~16 bytes x num_hashes per doc WITHOUT re-reading or
    re-shingling the historical text — the property that makes
    recurring training-data refreshes O(increment), not O(corpus).

    ``portable=True`` (token_value hash) keeps signatures
    oracle-reproducible; production uses ``portable=False`` (xxhash64)
    for collision resistance — same table schema either way.

    The table schema is FIXED at ``(doc_id, sig)`` regardless of
    ``id_col``: the source id column is aliased to ``doc_id`` on the way
    in, because everything downstream (:func:`_banded`,
    :func:`incremental_dedup`, ``merge_parquet`` keyed on doc_id, the
    bucketed warehouse layout) joins on that name — a per-table id name
    would make signature tables non-interchangeable across runs."""
    sh = with_shingles(df.select(id_col, text_col), text_col, k)
    return sh.select(
        F.col(id_col).alias("doc_id"),
        minhash_signature(num_hashes, portable=portable).alias("sig"),
    )


def _banded(sigs: DataFrame, id_out: str, num_hashes: int, bands: int) -> DataFrame:
    """Explode a signature table into ``bands`` slim rows keyed by the
    band's raw hash slice (array<bigint>). The SLICE ITSELF is the join
    key — engine-portable (no Spark-specific hash()), and Spark
    hash-partitions array columns fine."""
    rows_per_band = num_hashes // bands
    return sigs.select(
        F.col("doc_id").alias(id_out),
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> "
                f"named_struct('band', b, 'key', slice(sig, b * {rows_per_band} + 1, {rows_per_band})))"
            )
        ).alias("bk"),
    ).select(id_out, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def incremental_dedup(
    increment_sigs: DataFrame,
    corpus_sigs: DataFrame,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Dedup a NEW increment against an EXISTING corpus signature table
    (both from :func:`minhash_signature_table`) without ever re-pairing
    the corpus with itself — the every-refresh operation of a recurring
    training-data pipeline.

    Shape: band both sides (slim (id, band, key-slice) rows), equi-join
    on (band, key) — candidates are only (increment x corpus) collisions,
    never corpus x corpus — then score each candidate by MinHash
    agreement (dd9: est = matching components / num_hashes; no text is
    ever fetched). Verdict per increment doc: ``n_corpus_matches``
    (corpus docs with a shared band AND est ≥ threshold), ``best_est_ppm``
    (max est over matches, NULL if none), ``is_dup``. Survivors'
    signatures are what callers append back to the table
    (``merge_parquet``) so the next increment sees them.

    At 100 TB: one shuffle keyed on (band, slice) whose corpus side can
    be bucketed-by-key on disk; the increment side is small by
    definition. Intra-increment dups are dd1/dd8's job — compose before
    or after.

    Replay safety: the ENTIRE increment's doc_ids are excluded from the
    corpus side (broadcast anti-join — the increment is small by
    definition), not merely same-id pairs. Same-id exclusion alone
    closes the self-match hole (a foreachBatch replay after a crash
    between the warehouse merge and the checkpoint commit re-sees its
    own signatures at est 1.0 and would drop the whole batch) but
    leaves a subtler one found while composing the chain sink (round
    14): a replayed batch's doc X can match BATCH-MATE Y's just-merged
    signature (different doc_id) — kept on the first run (Y wasn't in
    the warehouse yet), dropped on replay. Excluding all increment ids
    makes the candidate set (increment × corpus-minus-increment) — the
    same set BOTH runs see — so verdicts are replay-deterministic even
    for batches containing intra-batch near-dups (intra-increment
    dedup remains dd1/dd8's job, unchanged)."""
    inc_b = _banded(increment_sigs, "inc_id", num_hashes, bands)
    history = corpus_sigs.join(
        F.broadcast(increment_sigs.select("doc_id")), "doc_id", "left_anti"
    )
    cor_b = _banded(history, "cor_id", num_hashes, bands)
    cand = (
        inc_b.join(cor_b, ["band", "key"])
        .filter(F.col("inc_id") != F.col("cor_id"))
        .select("inc_id", "cor_id")
        .dropDuplicates(["inc_id", "cor_id"])
    )
    inc_s = increment_sigs.select(F.col("doc_id").alias("inc_id"), F.col("sig").alias("sig_i"))
    cor_s = corpus_sigs.select(F.col("doc_id").alias("cor_id"), F.col("sig").alias("sig_c"))
    agree = F.expr(
        "size(filter(zip_with(sig_i, sig_c, (a, b) -> a = b), x -> x))"
    )
    # SURVEY §8 integer-contract rule (round 17): the agreement estimate
    # is a pure integer ratio (agree/num_hashes) — exact ppm long, and
    # the threshold gate is an integer cross-multiplication. The
    # denominator is bounded at 10**6 so the products stay in int64
    # (ADVICE r17 — a computed float threshold would otherwise wrap).
    thr = exact_threshold(threshold)
    scored = (
        cand.join(inc_s, "inc_id")
        .join(cor_s, "cor_id")
        .withColumn("__agree", agree.cast("long"))
        .withColumn(
            "est_ppm", F.expr(f"(__agree * 1000000) div {num_hashes}")
        )
        .filter(
            F.expr(
                f"__agree * {thr.denominator} >= "
                f"{num_hashes} * {thr.numerator}"
            )
        )
    )
    verdicts = scored.groupBy("inc_id").agg(
        F.count(F.lit(1)).alias("n_corpus_matches"),
        F.max("est_ppm").alias("best_est_ppm"),
    )
    return (
        increment_sigs.select(F.col("doc_id"))
        .join(verdicts, F.col("doc_id") == F.col("inc_id"), "left")
        .select(
            "doc_id",
            F.coalesce("n_corpus_matches", F.lit(0)).alias("n_corpus_matches"),
            "best_est_ppm",
            (F.coalesce("n_corpus_matches", F.lit(0)) > 0).alias("is_dup"),
        )
    )


def doc_segments(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 8,
) -> DataFrame:
    """Split documents into consecutive ``seg_tokens``-token segments
    (last may be partial): one row per (doc_id, seg_idx, seg, occ_key),
    where ``occ_key`` packs (doc_id, seg_idx) into one bigint — the
    portable single-column canonical-occurrence key :func:`line_dedup`
    and the streaming line-dedup sink both order on. Narrow (explode
    only); bounds seg_idx at 1e6 segments per document."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.split(text_col, " ").alias("tok")
    )
    return toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, cast(ceil(size(tok) / {seg_tokens}.0) as int) - 1), "
                f"i -> array_join(slice(tok, i * {seg_tokens} + 1, {seg_tokens}), ' '))"
            )
        ).alias("seg_idx", "seg"),
    ).withColumn("occ_key", F.col("doc_id") * F.lit(1_000_000) + F.col("seg_idx"))


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 8,
) -> DataFrame:
    """SEGMENT-level exact dedup across the corpus — the C4/RefinedWeb
    "line dedup" stage, a different granularity from every doc-level
    operator here: boilerplate SEGMENTS (nav bars, license headers,
    repeated paragraphs) are removed from otherwise-unique documents,
    keeping exactly ONE global occurrence of each segment. Documents
    split into consecutive ``seg_tokens``-token segments (last segment
    may be partial); a segment's canonical occurrence is its lowest
    (doc_id, seg_idx); all other occurrences are dropped and each doc's
    text is rebuilt from its kept segments in order.

    Output: (doc_id, n_segs, n_kept, clean_text) — one row per input
    document (clean_text '' when every segment was dropped).

    Scale shape: the canonical-occurrence computation is a MIN
    aggregation keyed on the segment text — map-side combinable, so a
    boilerplate segment appearing in millions of docs contributes one
    partial row per task, never a hot sort group (deliberately NOT a
    row_number window, which would sort the hottest segment's
    occurrences in one task). Then one equi-join on segment (AQE splits
    residual hot keys) and one per-doc rebuild aggregation. (doc_id,
    seg_idx) packs into one bigint for the min — portable to any
    engine and a single-column agg — which bounds seg_idx at 1e6
    segments per document.
    """
    segs = doc_segments(df, id_col=id_col, text_col=text_col, seg_tokens=seg_tokens)
    canon = segs.groupBy("seg").agg(F.min("occ_key").alias("canon_key"))
    kept = (
        segs.join(canon, "seg")
        .withColumn("is_kept", F.col("occ_key") == F.col("canon_key"))
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segs"),
        F.sum(F.col("is_kept").cast("long")).alias("n_kept"),
        F.array_join(
            F.expr(
                "transform(array_sort(filter(collect_list("
                "CASE WHEN is_kept THEN struct(seg_idx, seg) END), x -> x IS NOT NULL)), "
                "x -> x.seg)"
            ),
            " ",
        ).alias("clean_text"),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_segs", F.lit(0)).alias("n_segs"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.6,
    max_shingle_freq: int | str | None = 100,
    collapse_exact: bool = False,
    unpersist_after: bool = False,
) -> DataFrame:
    """ASYMMETRIC n-gram containment pairs — the subset-duplicate
    detector Jaccard structurally misses: a short document embedded
    verbatim in a much longer one has containment(short→long) ≈ 1 while
    its Jaccard ≈ |short|/|long| ≈ 0 (quote inclusion, boilerplate
    wrappers, articles + their excerpts). Same inverted-shingle-index
    kernel as :func:`jaccard_pairs` (explode → self-equi-join →
    per-pair common count; pairs sharing no shingle never materialize;
    same stop-shingle df-cap and the same recall tradeoff) — only the
    final metric differs: both directional containments are emitted and
    a pair qualifies when EITHER clears ``threshold``.

    Production cap setting is ``"auto"`` (corpus-size-relative,
    :func:`_resolve_df_cap`): the round-8 scale audit found a FIXED cap
    of 100 silently emptied the inverted index at 100× on the
    replica-heavy fixture — every shingle's df exceeded the cap, so
    ``dd12_prod`` returned 0 pairs with bounded wall-time and zero
    recall. The relative cap keeps duplicate-group shingles (df ∝
    replication factor) while dropping true stop-shingles (df ∝ N).

    ``collapse_exact=True`` (the production default's second half,
    round 10) runs an exact-dedup collapse FIRST: verbatim-identical
    texts group to one representative (lowest id) and the inverted
    index runs over representatives only. Rationale, measured at 100×:
    with the recall-correct auto cap, a corpus of 100-way verbatim
    replica groups generates Σ df² ≈ 2.5 B candidate rows whose
    shuffle spill exceeded local disk — the quadratic is per DUPLICATE
    GROUP and no cap may drop it without recall collapse. But verbatim
    duplicates are dd1's finding, not a containment relationship worth
    rediscovering 100² times; every real pipeline (and this repo's
    dd6/x7/x14 compositions) runs exact dedup before fuzzy ops. With
    the collapse, candidate volume is governed by the DISTINCT-text
    corpus, intra-group pairs are (by design) not emitted, and
    cross-group subset pairs survive at representative level. On a
    replica-free corpus the collapse is a no-op passthrough (one
    hash-agg) and the output is identical.

    ``unpersist_after``: see :func:`jaccard_pairs` — same contract on
    the index (and collapse) caches.
    """
    collapsed = None
    if collapse_exact:
        # persist: the auto-cap count and the shingling pass both
        # consume the collapsed corpus — without this the groupBy runs
        # twice. Callers own cleanup (driver/bench clearCache per query).
        df = collapsed = scoped_persist(
            df.select(id_col, text_col)
            .groupBy(text_col)
            .agg(F.min(id_col).alias(id_col))
        )
    max_shingle_freq = _resolve_df_cap(df, max_shingle_freq, id_col)
    sh = with_shingles(scale_out(df.select(id_col, text_col)), text_col, k)
    sh = sh.select(id_col, F.array_size("shingle").alias("n_sh"), "shingle")
    inv = sh.select(id_col, "n_sh", F.explode("shingle").alias("sh"))
    if max_shingle_freq is not None:
        w = Window.partitionBy("sh")
        inv = (
            inv.withColumn("df_", F.count(F.lit(1)).over(w))
            .filter(F.col("df_") <= max_shingle_freq)
            .drop("df_")
        )
    inv = scoped_persist(inv)
    a = inv.select(
        F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"), F.col("sh")
    )
    b = inv.select(
        F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"), F.col("sh")
    )
    # SURVEY §8 integer-contract rule (round 17): containments are pure
    # integer ratios — exact ppm longs, and the threshold gate is an
    # integer cross-multiplication (common·den ≥ n·num), identical in
    # every engine. exact_threshold bounds den at 10**6 so common·den
    # stays in int64 even for computed thresholds (ADVICE r17).
    thr = exact_threshold(threshold)
    t_num, t_den = thr.numerator, thr.denominator
    out = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("common"))
        .withColumn("c_a_in_b_ppm", F.expr("(common * 1000000) div n_a"))
        .withColumn("c_b_in_a_ppm", F.expr("(common * 1000000) div n_b"))
        .filter(
            F.expr(f"common * {t_den} >= n_a * {t_num}")
            | F.expr(f"common * {t_den} >= n_b * {t_num}")
        )
        .select("id_a", "id_b", "c_a_in_b_ppm", "c_b_in_a_ppm")
    )
    if unpersist_after:
        out = out.localCheckpoint(eager=True)
        inv.unpersist()
        if collapsed is not None:
            collapsed.unpersist()
    return out


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_span_tokens: int = 8,
    cross_doc_only: bool = True,
) -> DataFrame:
    """dd14: MAXIMAL duplicated-span detection — the exact-substring
    dedup shape of Lee et al., "Deduplicating Training Data Makes
    Language Models Better" (suffix-array substring dedup), re-expressed
    sub-quadratically in relational form. Where dd13 (:func:`line_dedup`)
    dedups FIXED seg_tokens-aligned segments, this finds every maximal
    run of tokens, at ANY offset, whose every k-token window also occurs
    elsewhere in the corpus — the memorization-prone boilerplate
    (licenses, headers, templated paragraphs) that fixed segmentation
    straddles and misses.

    Relational shape (no suffix array, no UDF):
    1. slide a k-token shingle over every position (narrow posexplode —
       corpus-token-scale rows, same cost class as dd13's segmentation),
    2. mark shingles occurring in >1 document (``cross_doc_only``) or
       >1 position corpus-wide — ONE map-side-combinable count agg; the
       document-frequency count rides a window partitioned on the very
       column the agg shuffles on (the dd2 df-cap pattern: no second
       Exchange),
    3. gaps-and-islands per document: consecutive duplicated positions
       collapse via the ``pos − row_number()`` trick into maximal
       spans; a span of consecutive duplicated k-windows
       [p_start..p_end] covers tokens [p_start, p_end + k − 1].

    A span qualifies when its token length ``(p_end − p_start + k) ≥
    min_span_tokens``. Output: (doc_id, span_start, span_len, span_text)
    — span_start 0-based in tokens. Callers redact/drop spans with a
    slice-rebuild (the dd13 rebuild shape) or count duplicated-token
    mass per doc as a quality signal.

    Scale: the only wide ops are the shingle-keyed count (map-side
    partials bound hot shingles — a boilerplate shingle contributes ONE
    partial row per task) and the per-document window (keyed on doc_id;
    bounded by document length, never corpus size). Nothing is
    all-pairs: unlike the suffix-array formulation this never
    materializes doc×doc matches, only per-position verdicts.
    Oracle: identical CTE chain in ANSI SQL (window count + islands).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.split(text_col, " ").alias("tok")
    )
    # slice-of-ascending-sequence rather than sequence(0, n-k): Spark's
    # sequence() auto-descends when the bound is negative, so a doc
    # shorter than k tokens would yield positions [0, -1] instead of none
    sh = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"slice(transform(sequence(0, size(tok)), "
                f"p -> array_join(slice(tok, p + 1, {k}), ' ')), "
                f"1, greatest(size(tok) - {k} + 1, 0))"
            )
        ).alias("pos", "sh"),
    )
    w_sh = Window.partitionBy("sh")
    if cross_doc_only:
        # ">= 2 distinct docs" as min != max — NOT collect_set, whose
        # per-window set materializes every distinct doc_id of the
        # hottest shingle in one task (a universal boilerplate trigram
        # in 1e9 docs would be an 8 GB set); min/max are constant-space
        # streaming aggregates with the identical boolean
        dup_cond = F.min("doc_id").over(w_sh) != F.max("doc_id").over(w_sh)
    else:
        dup_cond = F.count(F.lit(1)).over(w_sh) > 1
    marked = sh.withColumn("is_dup", dup_cond).filter("is_dup")
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    islands = marked.withColumn(
        "island", F.col("pos") - F.row_number().over(w_doc)
    )
    spans = (
        islands.groupBy("doc_id", "island")
        .agg(F.min("pos").alias("span_start"), F.max("pos").alias("p_end"))
        .withColumn("span_len", F.col("p_end") - F.col("span_start") + F.lit(k))
        .filter(F.col("span_len") >= min_span_tokens)
    )
    return (
        spans.join(toks, "doc_id")
        .select(
            "doc_id",
            "span_start",
            "span_len",
            F.array_join(
                F.expr("slice(tok, span_start + 1, span_len)"), " "
            ).alias("span_text"),
        )
    )


def span_redact(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_span_tokens: int = 8,
) -> DataFrame:
    """dd15: span-level DEDUP — :func:`duplicated_spans` made an actual
    cleaning stage (the full Lee-et-al semantic): every duplicated span
    keeps exactly ONE canonical occurrence corpus-wide (lowest
    (doc_id, span_start) per span text — dd13's first-occurrence rule
    at span granularity) and every other occurrence is REMOVED from its
    document, which is rebuilt from its surviving tokens.

    Output: (doc_id, n_tokens, n_removed, clean_text) — every input doc
    appears once; ``n_removed`` is the duplicated-token mass dropped
    (0 for clean docs; doubles as the quality signal).

    Scale shape: dd14's detection cost plus one slim canonical MIN agg
    over spans (map-side combinable — the dd13 argument: a boilerplate
    span in millions of docs is one partial row per task), one
    doc-keyed range join (tokens × removed ranges of the SAME doc —
    bounded by doc length × spans-per-doc, never corpus), and the
    per-doc rebuild agg. Oracle: identical CTE chain (spans → canonical
    MIN → covered-position anti-join → ordered string_agg)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.split(text_col, " ").alias("tok")
    )
    spans = duplicated_spans(
        df, id_col=id_col, text_col=text_col, k=k,
        min_span_tokens=min_span_tokens,
    )
    canon = spans.groupBy("span_text").agg(
        F.min(F.struct("doc_id", "span_start")).alias("c")
    )
    removed = (
        spans.join(canon, "span_text")
        .filter(
            ~(
                (F.col("doc_id") == F.col("c.doc_id"))
                & (F.col("span_start") == F.col("c.span_start"))
            )
        )
        .select(
            "doc_id",
            F.col("span_start").alias("rm_start"),
            (F.col("span_start") + F.col("span_len")).alias("rm_end"),
        )
    )
    pos_toks = toks.select(
        "doc_id",
        F.array_size("tok").alias("n_tokens"),
        F.posexplode("tok").alias("pos", "t"),
    )
    kept = pos_toks.join(
        removed,
        (pos_toks.doc_id == removed.doc_id)
        & (F.col("pos") >= F.col("rm_start"))
        & (F.col("pos") < F.col("rm_end")),
        "left_anti",
    )
    rebuilt = kept.groupBy("doc_id", "n_tokens").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, t))), x -> x.t)"
            ),
            " ",
        ).alias("clean_text"),
    )
    return (
        toks.select("doc_id", F.array_size("tok").alias("n_tokens"))
        .join(rebuilt.select("doc_id", "n_kept", "clean_text"), "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0)))
            .cast("int")
            .alias("n_removed"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def source_overlap_matrix(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 8,
) -> DataFrame:
    """Corpus-overlap matrix BETWEEN GROUPS (sources, crawls, snapshot
    dates): for every group pair, the MinHash-estimated AND exact
    Jaccard similarity of their shingle SETS. The corpus-level question
    a new-crawl triage asks first — "how much of snapshot B is already
    in corpus A?" — answered from per-group sketches, with the exact
    value riding along so the estimator's error is itself visible
    (dd9's estimate-with-ground-truth pattern at group granularity).

    Scale shape: per-group MinHash components are map-side-combinable
    MIN aggregations over the exploded shingle stream (the agg's own
    shuffle key is the group — no pair space until AFTER reduction to
    one signature row per group), so the sketch path touches the corpus
    once and shuffles |groups| × num_hashes integers. The exact values
    need one shingle-keyed equi-join between group shingle sets —
    quadratic only in |groups|, never in documents; at 100 TB drop the
    exact legs and ship the sketch estimate alone (the same
    sketch-vs-exact split as dd9/t13).

    Returns ``(grp_a, grp_b, est_jaccard_ppm, jaccard_ppm)`` for grp_a < grp_b.
    NEW vs reference (no counterpart)."""
    sets = scoped_persist(
        with_shingles(
            scale_out(df.select(group_col, text_col)), text_col, k
        )
        .select(group_col, F.explode("shingle").alias("sh"))
        .distinct()
    )
    min_cols = [
        F.min(
            F.expr(f"({a} * {_tv_sql('sh')} + {b}) % {MINHASH_PRIME}")
        ).alias(f"h{i}")
        for i, (a, b) in enumerate(minhash_params(num_hashes))
    ]
    sigs = sets.groupBy(group_col).agg(
        *min_cols, F.count(F.lit(1)).alias("n_sh")
    )
    a = sigs.select(
        F.col(group_col).alias("grp_a"),
        F.col("n_sh").alias("n_a"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(num_hashes)],
    )
    b = sigs.select(
        F.col(group_col).alias("grp_b"),
        F.col("n_sh").alias("n_b"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(num_hashes)],
    )
    agree = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(num_hashes)
    )
    est = (
        a.crossJoin(b)
        .filter(F.col("grp_a") < F.col("grp_b"))
        .select(
            "grp_a",
            "grp_b",
            "n_a",
            "n_b",
            agree.cast("long").alias("__agree"),
        )
        .select(
            "grp_a",
            "grp_b",
            "n_a",
            "n_b",
            # SURVEY §8 integer-contract rule (round 17): sketch
            # agreement is an integer ratio (agree/num_hashes) — exact
            # ppm long via floor division.
            F.expr(f"(__agree * 1000000) div {num_hashes}").alias(
                "est_jaccard_ppm"
            ),
        )
    )
    inter = (
        sets.select(F.col(group_col).alias("grp_a"), "sh")
        .join(sets.select(F.col(group_col).alias("grp_b"), "sh"), "sh")
        .filter(F.col("grp_a") < F.col("grp_b"))
        .groupBy("grp_a", "grp_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        est.join(inter, ["grp_a", "grp_b"], "left")
        .withColumn("n_inter", F.coalesce("n_inter", F.lit(0)))
        .select(
            "grp_a",
            "grp_b",
            "est_jaccard_ppm",
            # exact set Jaccard: pure integer ratio — ppm long (the
            # union n_a + n_b - n_inter ≥ 1 whenever the pair exists)
            F.expr(
                "(n_inter * 1000000) div (n_a + n_b - n_inter)"
            ).alias("jaccard_ppm"),
        )
    )
