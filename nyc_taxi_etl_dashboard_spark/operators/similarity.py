"""Similarity search over embedding columns (NEW surface: ANN for
training-data pipelines; embeddings are ``array<float>``).

Design: brute-force cosine top-k is the correctness baseline (broadcast
the query set, fold the dot product JVM-side); the scale path is
random-hyperplane LSH bucketing, which turns top-k into a bucket
equi-join + local top-k. Vector math uses Catalyst higher-order
functions (``zip_with`` + ``aggregate``) — sequential left-folds, so
results are bit-deterministic and oracle-comparable; no Python crosses
the row boundary.
"""

from __future__ import annotations

# module-level so pandas_udf type-hint resolution (typing.get_type_hints
# against function __globals__) can see them — function-local imports
# leave the 'pd.Series' string annotations unresolvable under
# `from __future__ import annotations`
import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import exact_threshold, scoped_persist


def _qident(name: str) -> str:
    """Backtick-quote a column name for interpolation into a SQL expr
    string (ADVICE r9): the rhp_* builders splice ``vec_col`` into
    ``F.expr`` text, so a name needing quoting (dots, spaces, reserved
    words) would break parsing — and an untrusted name would be
    SQL-injectable. Embedded backticks are doubled per Spark's
    identifier-escaping rule, making the result a single identifier
    token no matter the input."""
    return "`" + name.replace("`", "``") + "`"


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ as a sequential double fold (deterministic order)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def dot_arrow(a: Column | str, b: Column | str) -> Column:
    """Arrow-vectorized twin of :func:`dot` — one einsum per batch
    instead of ``dim`` interpreted lambda evals per row.

    MEASURED NEGATIVE AT EVERY DIM — the round-11 "crossover at
    ≥512-d" prediction was tested in round 14 (tools/highdim_ab.py:
    interleaved A/B ×3, 300 k candidate pairs, dims 64/512/1024, same
    session) and REFUTED: HOF min 0.43/2.17/2.40 s vs Arrow min
    0.80/4.13/12.10 s — the gap WIDENS with dim, because the Arrow leg
    ships BOTH vectors of every pair (16·dim bytes) and serialization
    scales with dim exactly like the ~2·dim interpreted evals it
    saves, while the per-row object boxing only adds to it. The HOF
    fold is therefore the default verify kernel at ALL dims
    (:func:`verify_kernel_for_dim` is the policy in code); this kernel
    is retained as the A/B twin and is value-agreement-pinned in
    tests/test_llmops.py. The opposite economics hold for
    :func:`rhp_signature_arrow` (single-vector rows: 1,024 evals per
    16·dim shipped bytes), which stays the production signature path.

    Last-ulp caveat: einsum sums in SIMD order, the HOF fold
    sequentially — values can differ by ~1e-16 relative, so
    hash-certified queries (sequential-fold SQL oracles) must never
    use it."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b

    @F.pandas_udf("double")
    def d(x: pd.Series, y: pd.Series) -> pd.Series:
        if not len(x):
            return pd.Series([], dtype="float64")
        A = np.stack(x.to_numpy()).astype(np.float64, copy=False)
        B = np.stack(y.to_numpy()).astype(np.float64, copy=False)
        return pd.Series(np.einsum("ij,ij->i", A, B))

    return d(ca, cb)


#: round-14 measured A/B (tools/highdim_ab.py): min-of-3 seconds per
#: 300 k-pair verify leg (hof, arrow), interleaved in one session
_VERIFY_AB = {64: (0.43, 0.80), 512: (2.17, 4.13), 1024: (2.40, 12.10)}


def verify_kernel_for_dim(dim: int) -> str:
    """The pair-verify default-kernel POLICY, keyed on embedding dim
    and backed by measurement (round-14 agenda item 3): ``"hof"`` at
    every measured dim. The predicted high-dim crossover to the einsum
    kernel does not exist — Arrow transfer of both pair vectors scales
    with dim exactly like the interpreted evals it replaces, and loses
    harder as dim grows (see :func:`dot_arrow` and SCALE100X.md
    round-14). One place to flip if a future runtime (e.g. columnar
    shuffle that elides the Python transfer) changes the economics."""
    return "hof"


def l2_norm(a: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    sq = F.transform(ca, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Broadcast-nested-loop join (queries are small by construction) +
    ranking window partitioned by query — the fold runs inside the join
    stage, so the corpus is scanned exactly once regardless of |queries|.
    Excludes self-matches. At 100 TB use :func:`rhp_bucket` first and
    brute-force only within buckets.
    """
    # norms hoisted out of the pair loop: HOF folds are CodegenFallback
    # (interpreted), so computing |q| and |c| once per VECTOR instead of
    # once per PAIR cuts per-pair work to one dot fold. Same expressions
    # in the same order => identical bits vs the inline cosine().
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("q_nrm", l2_norm("q_vec"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ).withColumn("c_nrm", l2_norm("c_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine", dot("q_vec", "c_vec") / (F.col("q_nrm") * F.col("c_nrm"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def _murmur3_hash_int32(x: int, seed: int = 42) -> int:
    """Spark's ``hash()`` of one int value (Murmur3_x86_32.hashInt,
    seed 42), as a signed int32. Driver-side scalar — used only to
    derive the tiny (dim × n_planes) hyperplane weight matrix once, so
    the Arrow signature kernel reproduces rhp_signature's hash-derived
    ±1 weights without ever calling into the JVM. Pinned bit-equal to
    ``F.hash`` in tests/test_llmops.py."""
    M = 0xFFFFFFFF
    k1 = ((x & M) * 0xCC9E2D51) & M
    k1 = ((k1 << 15) | (k1 >> 17)) & M
    k1 = (k1 * 0x1B873593) & M
    h1 = (seed ^ k1) & M
    h1 = ((h1 << 13) | (h1 >> 19)) & M
    h1 = (h1 * 5 + 0xE6546B64) & M
    h1 ^= 4  # fmix: fold in the input length (4 bytes)
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & M
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & M
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def rhp_planes(n_planes: int = 16, dim: int = 64) -> "np.ndarray":
    """The (dim × n_planes) ±1 weight matrix :func:`rhp_signature`'s SQL
    derives element-wise: ``H[j, p] = +1 iff hash(p*dim + j) & 1``.
    n_planes·dim driver-side murmur evals (≈1k), computed once per
    kernel construction; the matrix rides the UDF closure."""
    H = np.empty((dim, n_planes), dtype=np.float64)
    for p in range(n_planes):
        for j in range(dim):
            H[j, p] = 1.0 if (_murmur3_hash_int32(p * dim + j) & 1) else -1.0
    return H


def _w_matrix_sql(n_planes: int, dim: int, plus_one) -> str:
    """The (n_planes × dim) ±1 hyperplane weights as ONE array<array
    <double>> SQL literal — ``plus_one(p*dim + j)`` decides the sign of
    weight [p][j]. Optimization r19 (guide §1.2 per-task work, the
    lit_double_matrix pattern): the HOF signature folds re-derived each
    weight PER ROW inside the lambda — n_planes·dim murmur/LCG
    evaluations plus a CASE per vector — because the hash's argument is
    a lambda variable Catalyst cannot constant-fold. Deriving the same
    weights once driver-side and indexing the folded literal keeps every
    product bit-identical (the weights are exactly ±1.0 doubles either
    way; fold order unchanged) while the per-row work drops to two array
    lookups per element. Index math (p·dim + j) is driver-side Python
    over the same non-negative int32 range the SQL form used."""
    return (
        "array("
        + ",".join(
            "array("
            + ",".join(
                "1.0D" if plus_one(p * dim + j) else "-1.0D" for j in range(dim)
            )
            + ")"
            for p in range(n_planes)
        )
        + ")"
    )


def _murmur_plus_one(i: int) -> bool:
    """Sign rule of :func:`rhp_signature`'s weights: bit 0 of Spark's
    ``hash()`` (murmur3 int32, seed 42) — reproduced driver-side by
    :func:`_murmur3_hash_int32`, which is pytest-pinned bit-equal to
    ``F.hash`` over this input range."""
    return bool(_murmur3_hash_int32(i) & 1)


def _lcg_plus_one(i: int) -> bool:
    """Sign rule of :func:`rhp_cell_portable`'s weights: the engine-
    portable LCG ``(i·1103515245 + 12345) mod 2^31 < 2^30``. Python and
    SQL ``%`` agree for the non-negative operands used here."""
    return (i * 1103515245 + 12345) % 2147483648 < 1073741824


def rhp_signature_arrow(
    vec_col: Column | str, n_planes: int = 16, dim: int = 64
) -> Column:
    """Arrow-vectorized twin of :func:`rhp_signature` — identical bits,
    ~10× the throughput (r10 agenda item 1).

    The HOF form evaluates n_planes·dim interpreted lambda calls per
    vector (CodegenFallback — 1,024 µs-scale evals at 16×64), which
    dominated v10_prod at 200 k vectors. Here the hyperplanes become a
    driver-built (dim × n_planes) ±1 matrix (same murmur-derived
    weights, :func:`rhp_planes`) and each Arrow batch is one GEMM
    ``V @ H`` plus a sign-bit pack — BLAS flops, no interpreter.

    Bit-equality caveat: the HOF fold sums sequentially, the GEMM sums
    in BLAS order; a projection within one ulp of 0.0 could flip a
    sign bit between the two. tests/test_llmops.py pins exact
    signature equality on the fixture corpus and on adversarial random
    vectors; the certified HOF twin remains the oracle-comparable form
    (DuckDB reproduces sequential folds, not BLAS order).
    """
    H = rhp_planes(n_planes, dim)
    bit_weights = (1 << np.arange(n_planes, dtype=np.int64))

    @F.pandas_udf("bigint")
    def sig(v: pd.Series) -> pd.Series:
        if not len(v):  # np.stack raises on an empty sequence (ADVICE r13)
            return pd.Series([], dtype="int64")
        V = np.stack(v.to_numpy()).astype(np.float64, copy=False)
        P = V @ H
        return pd.Series((P > 0.0) @ bit_weights)

    return sig(F.col(vec_col) if isinstance(vec_col, str) else vec_col)


def rhp_signature(
    vec_col: str = "embedding_d", n_planes: int = 16, dim: int = 64
) -> Column:
    """Random-hyperplane LSH sketch: bit p = sign(v · h_p), hyperplanes
    derived deterministically from (p, dimension index) via a hash-based
    pseudo-random ±1 weight — no stored model, reproducible cluster-wide.

    ``vec_col`` names the (array<double>) vector column; the default
    matches the in-repo convention of casting to double as
    ``embedding_d`` first. (ADVICE r8: an earlier revision advertised
    the parameter but hardcoded the column — callers now bind it
    explicitly.)

    The ±1 weights ride the plan as ONE folded literal matrix instead
    of a per-row ``hash()`` + CASE per (plane, element) — see
    :func:`_w_matrix_sql`; bit-identity to the hash-in-the-fold form is
    pinned in tests/test_llmops.py.
    """
    W = _w_matrix_sql(n_planes, dim, _murmur_plus_one)
    per_plane = (
        f"aggregate(transform(sequence(0, {dim - 1}), j -> "
        f"cast({_qident(vec_col)}[j] as double) * __w[p][j]), "
        "cast(0.0 as double), (acc, x) -> acc + x)"
    )
    return F.expr(
        f"aggregate(sequence(0, {n_planes - 1}), cast(0 as bigint), (acc, p) -> "
        f"acc + (CASE WHEN {per_plane} > 0 THEN shiftleft(cast(1 as bigint), p) ELSE cast(0 as bigint) END))"
        .replace("__w", W)
    ).alias("rhp_sig")


def rhp_cell_portable(
    vec_col: str = "embedding", n_planes: int = 4, dim: int = 64
) -> Column:
    """ENGINE-PORTABLE random-hyperplane cell id (bigint in
    [0, 2^n_planes)). Same construction as :func:`rhp_signature` but the
    pseudo-random ±1 weight is an LCG over (plane, dim-index) —
    ``((p*dim+j)*1103515245 + 12345) % 2^31 < 2^30`` — instead of
    Spark-private murmur ``hash()``, so a DuckDB oracle reproduces the
    cell of every vector bit-for-bit (integer LCG + an in-order double
    fold both engines evaluate identically). Used where the CELL ID
    itself is part of a certified output (x12 diversity sampling);
    the murmur variant stays the production default for pure bucketing,
    where only collision structure matters.

    The ±1 weights ride the plan as ONE folded literal matrix instead
    of a per-row LCG + CASE per (plane, element) — see
    :func:`_w_matrix_sql`; the oracle SQL keeps its inline LCG form and
    the two stay bit-equal (pinned in tests/test_llmops.py).
    """
    W = _w_matrix_sql(n_planes, dim, _lcg_plus_one)
    per_plane = (
        f"aggregate(transform(sequence(0, {dim - 1}), j -> "
        f"cast({_qident(vec_col)}[j] as double) * __w[p][j]), "
        "cast(0.0 as double), (acc, x) -> acc + x)"
    )
    return F.expr(
        f"aggregate(sequence(0, {n_planes - 1}), cast(0 as bigint), (acc, p) -> "
        f"acc + (CASE WHEN {per_plane} > 0 THEN shiftleft(cast(1 as bigint), p) ELSE cast(0 as bigint) END))"
        .replace("__w", W)
    )


def rhp_projections(
    vec_col: str = "embedding_d", n_planes: int = 16, dim: int = 64
) -> Column:
    """Per-plane signed projections v · h_p (array<double>) for the same
    deterministic hyperplanes :func:`rhp_signature` uses. The sign of
    entry p is bit p of the signature; |entry p| is the margin — how far
    the vector sits from hyperplane p, i.e. how likely that bit is to
    differ for a true near neighbor. Weights ride the plan as one
    folded literal matrix (see :func:`_w_matrix_sql`), bit-identical to
    the hash-in-the-fold form."""
    W = _w_matrix_sql(n_planes, dim, _murmur_plus_one)
    per_plane = (
        f"aggregate(transform(sequence(0, {dim - 1}), j -> "
        f"cast({_qident(vec_col)}[j] as double) * __w[p][j]), "
        "cast(0.0 as double), (acc, x) -> acc + x)"
    )
    return F.expr(
        f"transform(sequence(0, {n_planes - 1}), p -> {per_plane})".replace("__w", W)
    )


def auto_n_planes_topk(
    n: int, target_occupancy: int = 64, floor: int = 4, cap: int = 30
) -> int:
    """Corpus-adaptive plane count for the TOP-K bucketing path
    (:func:`knn_lsh`): ``ceil(log2(n / target_occupancy))``, clamped.
    Different target than :func:`auto_n_planes` (the PAIR-generation
    sizing, occupancy ≈ 1/16): a top-k query needs each probed bucket
    to still CONTAIN candidates (≥ k, with headroom for recall), so
    occupancy is held near ``target_occupancy`` instead of near zero —
    per-query candidate work stays ≈ (1+n_probes)·target_occupancy,
    flat in the corpus, while a FIXED plane count lets it grow
    linearly (n/2^planes per bucket)."""
    import math

    return max(floor, min(cap, math.ceil(math.log2(max(n / target_occupancy, 2)))))


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | str = 8,
    dim: int = 64,
    n_probes: int = 0,
    exhaustive: bool = False,
    kernel: str = "arrow",
) -> DataFrame:
    """ANN scale path: bucket corpus and queries by RHP signature, then
    exact cosine top-k *within* matching buckets.

    ``n_probes`` is the multi-probe recall knob: each query additionally
    probes the ``n_probes`` buckets reached by flipping its
    lowest-|margin| signature bits — the bits most likely to differ for
    a true near neighbor (the vector sits closest to those hyperplanes).
    Cost is linear in probes (the query side explodes to 1+n_probes slim
    signature rows; the corpus is never duplicated), so recall rises at
    a known, bounded price — the standard multi-probe LSH tradeoff.
    Returned neighbors are exact-scored; only candidate generation is
    approximate. A (query, neighbor) pair can match at most one probe
    signature (probes are distinct values), so no candidate dedup is
    needed.

    ``exhaustive=True`` probes ALL ``2**n_planes`` buckets (every XOR
    mask): the candidate set is then the whole corpus, so the result
    PROVABLY equals :func:`knn_bruteforce` — same fold, same window,
    same tiebreak — through the full LSH machinery (signatures, probe
    explode, bucket join, local top-k). That makes the LSH path
    hash-certifiable against a brute-force SQL oracle while the
    approximate configurations stay recall-tested. Query-side rows grow
    to ``2**n_planes`` per query — keep ``n_planes`` small and the query
    set bounded when using it (a certification/debug mode, not the
    production path).

    ``n_planes="auto"`` resolves via :func:`auto_n_planes_topk`
    (occupancy-targeted, one count() pre-pass — round 14): a fixed
    plane count lets per-query candidates grow linearly with the
    corpus (n/2^planes per probed bucket).
    """
    if exhaustive and (n_planes == "auto" or int(n_planes) > 12):
        # exhaustive is a small-plane certification/debug mode: it
        # builds all 2**n_planes probe masks as literal expressions.
        # At auto-resolved plane counts (up to 30 on large corpora)
        # that is millions of Catalyst expressions — a planner/driver
        # killer, never what a cert run wants (ADVICE r14).
        raise ValueError(
            "exhaustive=True requires an explicit n_planes <= 12 "
            f"(got {n_planes!r}); it probes all 2**n_planes buckets "
            "as plan literals and is a certification mode, not the "
            "production path"
        )
    if n_planes == "auto":
        from . import memo_count

        n_planes = auto_n_planes_topk(memo_count(corpus))
    # corpus-side signatures take the kernel knob (the corpus is the
    # scale side; bits pinned equal between kernels, see
    # rhp_signature_arrow). Query-side signatures derive from the
    # projections either way — queries are small by contract.
    sig_fn = rhp_signature_arrow if kernel == "arrow" else rhp_signature
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("embedding_d"),
    ).withColumn("sig", sig_fn(vec_col="embedding_d", n_planes=n_planes, dim=dim))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("embedding_d"),
    ).withColumn("proj", rhp_projections(vec_col="embedding_d", n_planes=n_planes, dim=dim))
    q = q.withColumn(
        "sig",
        F.expr(
            f"aggregate(sequence(0, {n_planes - 1}), cast(0 as bigint), (acc, p) -> "
            "acc + (CASE WHEN proj[p] > 0 THEN shiftleft(cast(1 as bigint), p) ELSE cast(0 as bigint) END))"
        ),
    )
    if exhaustive:
        masks = _probe_masks(n_planes, n_planes)  # all 2**n_planes masks
        q = q.withColumn(
            "sig",
            F.explode(F.array(*[F.col("sig").bitwiseXOR(F.lit(m)) for m in masks])),
        )
    elif n_probes > 0:
        flip_order = (
            f"slice(array_sort(transform(sequence(0, {n_planes - 1}), "
            f"p -> named_struct('m', abs(proj[p]), 'p', p))), 1, {n_probes})"
        )
        q = q.withColumn(
            "sig",
            F.explode(
                F.expr(f"concat(array(sig), transform({flip_order}, s -> sig ^ shiftleft(cast(1 as bigint), s.p)))")
            ),
        )
    # norms once per side row (corpus: per vector; query: per probe row),
    # not per candidate pair — same expressions/order as cosine(),
    # identical bits
    q = q.select(
        "query_id", F.col("embedding_d").alias("q_vec"), F.col("sig").alias("q_sig")
    ).withColumn("q_nrm", l2_norm("q_vec"))
    c = c.select(
        "neighbor_id", F.col("embedding_d").alias("c_vec"), "sig"
    ).withColumn("c_nrm", l2_norm("c_vec"))
    # null-safe equality ON PURPOSE: a null-intolerant join key lets
    # Catalyst infer isnotnull(sig) and push the whole signature fold
    # into the corpus scan filter, computing it twice per vector (the
    # dd7 constraint-pushdown trap). <=> is null-tolerant — no
    # inference — and still plans as a broadcast hash join. Embeddings
    # are non-null by contract, so the match semantics are identical.
    scored = (
        c.join(F.broadcast(q), F.col("sig").eqNullSafe(F.col("q_sig")))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine", dot("q_vec", "c_vec") / (F.col("q_nrm") * F.col("c_nrm"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def centroids_by_label(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """Per-label centroid via posexplode + grouped avg — the standard
    distributed mean-vector shape (shuffle keyed on (label, dim), counts
    bounded by |labels|·dim)."""
    exploded = df.select(
        label_col, F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "val")
    )
    return (
        exploded.groupBy(label_col, "pos")
        .agg(F.avg("val").alias("mean_val"))
        .groupBy(label_col)
        .agg(F.sort_array(F.collect_list(F.struct("pos", "mean_val"))).alias("pairs"))
        .select(
            label_col,
            F.expr("transform(pairs, p -> p.mean_val)").alias("centroid"),
        )
    )


def ivf_ann(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    probe_all: bool = False,
) -> DataFrame:
    """IVF-style ANN with label centroids as the coarse quantizer.

    Production IVF trains cells with k-means; here the per-label
    centroids serve as deterministic 'pretrained' cells. Every vector is
    assigned to its nearest cell (argmax cosine against the broadcast
    centroid table), queries probe their own cell only (nprobe=1) and
    brute-force within it. The centroid table is tiny (cells x dim) —
    collected once, broadcast everywhere; the corpus is scanned once for
    assignment and once per probe join.

    ``probe_all=True`` probes EVERY cell (the v4 exhaustive pattern):
    each corpus vector lives in exactly one cell, so probing all cells
    makes the candidate set the whole corpus and the result PROVABLY
    equals :func:`knn_bruteforce` — same fold, same window, same
    tiebreak — through the full IVF machinery. Certification/debug
    mode; query-side rows grow to |cells| per query.
    """
    cents = centroids_by_label(corpus, label_col=label_col, vec_col=vec_col)
    cells = cents.select(
        F.col(label_col).alias("cell"), F.col("centroid").alias("cell_vec")
    )

    def assign(df: DataFrame, idc: str, out: str) -> DataFrame:
        # vector norm once per row, cell norm once per (row, cell):
        # same value bits as the inline cosine, 1 fold saved per cell
        scored = (
            df.withColumn("v_nrm", l2_norm(vec_col))
            .crossJoin(F.broadcast(cells))
            .withColumn(
                "cell_cos",
                dot(vec_col, "cell_vec") / (F.col("v_nrm") * l2_norm("cell_vec")),
            )
        )
        w = Window.partitionBy(idc).orderBy(F.desc("cell_cos"), F.asc("cell"))
        return (
            scored.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") == 1)
            .select(F.col(idc).alias(out), F.col(vec_col), F.col("cell"))
        )

    c = assign(corpus.select(id_col, vec_col), id_col, "neighbor_id").select(
        "neighbor_id", F.col(vec_col).alias("c_vec"), "cell"
    )
    if probe_all:
        # every query probes every cell; no candidate dedup needed since
        # each corpus vector is assigned to exactly one cell
        q = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        ).crossJoin(F.broadcast(cells.select("cell")))
    else:
        q = assign(queries.select(id_col, vec_col), id_col, "query_id").select(
            "query_id", F.col(vec_col).alias("q_vec"), "cell"
        )
    c = c.withColumn("c_nrm", l2_norm("c_vec"))
    q = q.withColumn("q_nrm", l2_norm("q_vec"))
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine", dot("q_vec", "c_vec") / (F.col("q_nrm") * F.col("c_nrm"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def _assign_kernel(centroids: list[list[float]]):
    """Arrow-vectorized nearest-centroid assignment: ``struct<cell:int,
    d2:double>`` per vector. The k×dim model rides the UDF closure (tiny,
    serialized once per iteration); the distance matrix is one dense
    numpy broadcast-subtract-square per Arrow batch.

    Why a pandas UDF and not Catalyst HOFs: higher-order functions
    (``transform``/``zip_with``/``aggregate``) are CodegenFallback — the
    lambda machinery evaluates interpreted at ~µs per lambda call, and
    the assignment expression costs k·dim lambda evals per row. Measured
    at 2k rows × dim 64 × 8 cells the HOF formulation burned ~8 s per
    Lloyd iteration of pure interpreted eval; the vectorized kernel is
    milliseconds, and the gap only widens with corpus size. This is the
    canonical "built-ins genuinely can't express it fast" crossing:
    dense linear algebra belongs in SIMD, not an expression interpreter.
    """
    C = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf("struct<cell:int,d2:double>")
    def assign(v: pd.Series) -> pd.DataFrame:
        if not len(v):  # np.stack raises on an empty sequence (ADVICE r13)
            return pd.DataFrame(
                {"cell": pd.Series([], dtype="int32"), "d2": pd.Series([], dtype="float64")}
            )
        V = np.stack(v.to_numpy())
        d2 = _d2_matrix(V, C)
        cell = d2.argmin(axis=1)  # first min ⇒ lowest cell id on ties
        return pd.DataFrame(
            {"cell": cell.astype("int32"), "d2": d2[np.arange(len(cell)), cell]}
        )

    return assign


def _d2_matrix(V: "np.ndarray", C: "np.ndarray") -> "np.ndarray":
    """Pairwise squared distances |v−c|² = |v|² − 2 v·c + |c|² as one
    GEMM plus two rank-1 updates. The naive broadcast-subtract form
    materializes an (n × k × dim) temp — 2.3 GB per 10k-row Arrow batch
    at k=448/dim=64, times 32 concurrent tasks — where the decomposed
    form's largest array is the (n × k) result itself and the flops run
    through BLAS. Matters exactly when the cell count scales with the
    corpus (k ≈ √N, the IVF guideline), i.e. on the 100× semantic
    suite. Clamped at 0 (cancellation can produce −1e-16)."""
    d2 = (
        (V * V).sum(axis=1)[:, None]
        - 2.0 * (V @ C.T)
        + (C * C).sum(axis=1)[None, :]
    )
    return np.maximum(d2, 0.0, out=d2)


def nearest_cells(vec_col: str, centroids: list[list[float]], m: int = 1) -> Column:
    """The ``m`` nearest centroid ids (array<int>), nearest first.
    Stable argsort ⇒ ties break on cell id, so assignment is
    deterministic. Same Arrow-vectorized rationale as
    :func:`_assign_kernel`."""
    C = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf("array<int>")
    def probe(v: pd.Series) -> pd.Series:
        if not len(v):  # np.stack raises on an empty sequence (ADVICE r13)
            return pd.Series([], dtype="object")
        V = np.stack(v.to_numpy())
        d2 = _d2_matrix(V, C)
        order = np.argsort(d2, axis=1, kind="stable")[:, :m].astype("int32")
        return pd.Series(list(order))

    return probe(vec_col)


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_limit: int = 100_000,
) -> tuple[list[list[float]], list[float]]:
    """Lloyd's k-means coarse-quantizer trainer, returning (centroids,
    per-iteration inertia history over the training sample).

    Scale shape — train on a sample, assign at scale: a coarse quantizer
    never needs the full corpus to train (the standard IVF guideline is
    tens-to-hundreds of points per centroid; FAISS trains on a bounded
    sample for exactly this reason), so the trainer takes the
    ``sample_limit`` lowest-id vectors — ONE distributed TakeOrdered
    top-k pass, deterministic, never a full sort — and runs Lloyd
    driver-side in numpy. The model (k × dim doubles) is the only thing
    that ever crosses the driver boundary; the data-scale work —
    assigning billions of corpus vectors to cells — stays distributed
    via the Arrow kernel (:func:`_assign_kernel`). The previous
    formulation ran every Lloyd pass as a Spark job; per-iteration job
    overhead (~1 s) dwarfed the actual flops at any training-sample size
    that makes statistical sense, and at 100 TB you'd still train on a
    sample. Init is deterministic: the k lowest-id vectors seed the
    cells. Cells that lose all members keep their previous centroid.
    Memory: the n×k distance matrix is ``sample_limit × k`` doubles —
    bound k·sample_limit accordingly (8 GB at 100k × 10k cells).
    """
    rows = (
        df.select(
            F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
        )
        .orderBy("id")
        .limit(sample_limit)
        .collect()
    )
    X = np.asarray([r.v for r in rows], dtype=np.float64)
    return _kmeans_fit_matrix(X, k=k, n_iters=n_iters)


def _kmeans_fit_matrix(
    X: "np.ndarray", k: int, n_iters: int = 5
) -> tuple[list[list[float]], list[float]]:
    """:func:`kmeans_fit`'s numpy Lloyd body over an in-memory training
    matrix — shared with the IVFADC composition (quantization.ivfadc_topk),
    which collects ONE TakeOrdered sample and trains both the coarse
    quantizer and the PQ codebooks from it (optimization r19: the two
    separate fit paths each paid a full distributed sample pass over the
    same rows — a duplicate corpus scan at 100 TB). Same ops in the same
    order as the previous inline body, so centroids are byte-identical."""
    C = X[:k].copy()
    history: list[float] = []
    for _ in range(n_iters):
        d2 = _d2_matrix(X, C)
        cell = d2.argmin(axis=1)  # first min ⇒ lowest cell id on ties
        history.append(float(d2[np.arange(len(cell)), cell].sum()))
        for c in range(k):
            members = X[cell == c]
            if len(members):
                C[c] = members.mean(axis=0)
    return [[float(x) for x in c] for c in C], history


def ivf_ann_trained(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int | str = 8,
    n_iters: int = 5,
    n_probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF ANN with a *trained* coarse quantizer (k-means cells) and a
    multi-cell probe knob — the production shape :func:`ivf_ann`'s
    label-cell variant stands in for.

    Corpus vectors assign to their single nearest trained cell (narrow
    Arrow-vectorized kernel); each query probes its ``n_probes``
    nearest cells (explode to slim (query, cell) rows — the corpus is
    never duplicated) and brute-forces within them. ``n_probes =
    n_cells`` degrades gracefully to exact brute force (every cell
    probed ⇒ the candidate set is the whole corpus), which the tests pin.
    Pass ``centroids`` to reuse a fitted model across query batches.

    ``n_cells="auto"`` resolves via :func:`auto_n_cells` (≈ sqrt(n),
    one count() pre-pass — round 14): under a FIXED cell count the
    per-query candidate set is n·n_probes/n_cells — linear in the
    corpus, a 25 %-of-corpus scan at the 2-of-8 default, which defeats
    the index at scale; sqrt sizing makes it n_probes·sqrt(n).
    """
    if centroids is None:
        # resolve "auto" only on the fit path (n_cells is consumed
        # solely by kmeans_fit): callers reusing a fitted model across
        # query batches must not pay a corpus count() per batch
        if n_cells == "auto":
            from . import memo_count

            n_cells = auto_n_cells(memo_count(corpus))
        centroids, _ = kmeans_fit(
            corpus, k=n_cells, n_iters=n_iters, id_col=id_col, vec_col=vec_col
        )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
    ).withColumn("cell", nearest_cells("c_vec", centroids, 1).getItem(0))
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("q_vec"),
        )
        .withColumn("cell", F.explode(nearest_cells("q_vec", centroids, n_probes)))
    )
    c = c.withColumn("c_nrm", l2_norm("c_vec"))
    q = q.withColumn("q_nrm", l2_norm("q_vec"))
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine", dot("q_vec", "c_vec") / (F.col("q_nrm") * F.col("c_nrm"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def auto_n_cells(n: int, floor: int = 8, cap: int = 4096) -> int:
    """Corpus-adaptive IVF coarse-cell count: ``round(sqrt(n))``,
    clamped. The v8 lesson (SCALE100X.md round-17) applied to cell
    quantizers: a FIXED cell count means expected cell occupancy n/cells
    grows linearly with the corpus, so any within-cell exact kernel
    (v13's density kNN is corpus×corpus) does n·occupancy·n_probes
    folds — quadratic. At cells ≈ sqrt(n) with a fixed probe count the
    fold total grows as n^1.5 and per-task memory stays bounded; the
    sqrt rule is the standard IVF sizing (FAISS guidelines use
    4·sqrt(n)–16·sqrt(n); the bounded-sample Lloyd fit here prefers the
    low end so the driver-side fit stays cheap)."""
    import math

    return max(floor, min(cap, round(math.sqrt(max(n, 1)))))


def knn_density_outliers(
    corpus: DataFrame,
    k: int = 5,
    decile: float = 0.1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
    n_cells: int | str = 8,
    n_probes: int = 4,
    centroids: list[list[float]] | None = None,
    pa_accuracy: int = 10_000,
) -> DataFrame:
    """kNN-density outlier gate (v13): flag the lowest-density
    ``decile`` of vectors by mean cosine to their ``k`` nearest
    neighbors — the OOD-pruning stage of embedding-based curation.

    ``exact=True`` is the CERTIFICATION shape: brute-force all-pairs
    kNN plus a global ``percent_rank`` window — O(n²) pair folds and a
    single-task global sort; correct at any data distribution, usable
    only at cert scale. Output adds the exact ``pct`` column.

    The default is the PRODUCTION shape (VERDICT r8 item 1):

    - neighbors: EXACT kNN *within trained k-means coarse cells*
      (:func:`ivf_ann_trained` — the quantizer trains on a bounded
      sample, assignment is the Arrow kernel, each query probes its
      ``n_probes`` nearest cells and brute-forces only within them).
      Per-cell work is |cell|·|probed candidates| folds — the cell
      layout bounds the quadratic, and cells shard across executors.
    - gate: a ``percentile_approx`` threshold (t13's certified sketch
      shape) — one aggregation producing a scalar, broadcast back over
      the scores. No global sort, no unpartitioned window, no driver
      loop. ``pa_accuracy=10_000`` holds the rank error under 0.01 %.

    The round-8 measured negative stands: LOW-recall neighbor kernels
    (nprobe=2-of-8 on near-random vectors) scramble the gate, so the
    production path is only meaningful where the embedding space has
    real cluster structure — which the recall floor in
    tests/test_llmops.py measures on a planted-cluster fixture
    (recall@5 ≥ 0.9, outlier-set Jaccard vs exact ≥ 0.9). On
    structure-free fixtures raise ``n_probes`` toward ``n_cells``
    (degrades gracefully to exact, at brute-force cost).

    ``n_cells="auto"`` resolves via :func:`auto_n_cells` (≈ sqrt(n),
    one count() pre-pass — round 14): a fixed cell count makes this
    corpus×corpus kernel quadratic (measured: v13_prod 127 s at 10×
    under 4-of-8 fixed cells, SCALE100X.md round-17), the sqrt sizing
    bounds the fold total at n^1.5 with per-cell work flat.
    """
    if exact:
        dec_f = exact_threshold(decile)
        nn = knn_bruteforce(corpus, corpus, k=k, id_col=id_col, vec_col=vec_col)
        scored = nn.groupBy("query_id").agg(
            F.round(F.avg("cosine"), 6).alias("mean_knn_cos")
        )
        w = Window.orderBy("mean_knn_cos")
        # SURVEY §8 integer-contract rule (round 17): percent_rank is
        # an integer ratio — exact ppm long; the decile gate is the
        # integer cross-multiplication (rank-1)·den ≤ (n-1)·num.
        return (
            scored.withColumn("__rk", F.rank().over(w).cast("long"))
            .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy()))
            .select(
                F.col("query_id").alias(id_col),
                "mean_knn_cos",
                F.when(
                    F.col("__n") > 1,
                    F.expr("((__rk - 1) * 1000000) div (__n - 1)"),
                )
                .otherwise(F.lit(0))
                .cast("long")
                .alias("pct_ppm"),
                F.expr(
                    f"(__rk - 1) * {dec_f.denominator}"
                    f" <= (__n - 1) * {dec_f.numerator}"
                ).alias("is_outlier"),
            )
        )
    nn = ivf_ann_trained(
        corpus,
        corpus,
        k=k,
        n_cells=n_cells,
        n_probes=n_probes,
        id_col=id_col,
        vec_col=vec_col,
        centroids=centroids,
    )
    scored = nn.groupBy("query_id").agg(
        F.round(F.avg("cosine"), 6).alias("mean_knn_cos")
    )
    thr = scored.agg(
        F.percentile_approx("mean_knn_cos", decile, pa_accuracy).alias("__thr")
    )
    return (
        scored.crossJoin(F.broadcast(thr))
        .select(
            F.col("query_id").alias(id_col),
            "mean_knn_cos",
            (F.col("mean_knn_cos") <= F.col("__thr")).alias("is_outlier"),
        )
    )


def index_maintenance_report(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
    skew_factor: float = 2.0,
    dist_factor: float = 1.5,
) -> DataFrame:
    """IVF index-maintenance telemetry (v17) — the operational stage a
    production vector store runs as data arrives against a FITTED
    coarse quantizer: assign each vector to its nearest centroid, then
    report per cell (a) occupancy and share, (b) mean squared
    quantization error, and (c) the refit verdicts — ``high_skew``
    (share > skew_factor/k: the cell absorbed a hot region and should
    split) and ``high_error`` (mean error > dist_factor × the global
    mean: the centroid no longer represents its members — data drift).
    Either flag sets ``refit``; a scheduler watching this table knows
    WHEN re-running ``kmeans_fit`` is worth its cost, instead of
    refitting on a timer.

    ``exact=True`` is the CERTIFICATION shape: assignment distances are
    sequential HOF folds over centroid literals (bit-reproducible in a
    SQL oracle — argmin ties break to the lowest cell via first-min
    semantics in both engines), per-cell means are the v15 fixed-order
    fold (a plain avg is order-dependent in the last ulp), and the
    global mean folds cells in cell order. Keep the centroid list
    small in this mode (k×dim plan literals — the v12 lesson).

    The default is the PRODUCTION shape: the Arrow ``nearest_cells``
    kernel assigns (centroids ride the UDF closure, never the plan),
    and per-cell stats are one map-side-combinable aggregation — a
    single pass over the batch, shuffle bounded by k rows.

    Scale shape: telemetry cost is O(n·k·dim) map-side + a k-row
    aggregate; k comes from the fitted index (``auto_n_cells`` at fit
    time), and the batch is the increment, not the corpus — the same
    bounded-by-the-increment contract as the dd11 signature warehouse.
    """
    k = len(centroids)
    v = F.col(vec_col).cast("array<double>")
    if exact:
        from . import lit_double_matrix

        # transform over the centroid list as ONE literal matrix instead
        # of k unrolled fold expressions (optimization r18): per-centroid
        # fold order and values are bit-identical, only plan-build cost
        # (k x dim F.lit py4j calls) drops.
        dists = F.transform(
            lit_double_matrix(centroids),
            lambda c: F.aggregate(
                F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        assigned = corpus.select(
            F.col(id_col).alias("id"),
            dists.alias("dists"),
        ).select(
            "id",
            (F.expr("array_position(dists, array_min(dists))") - 1)
            .cast("int")
            .alias("cell"),
            F.expr("array_min(dists)").alias("dist2"),
        )
        # per-cell mean via the fixed-order fold (v15 pattern): sum the
        # members' dist2 in id order, divide by the count — bit-equal to
        # the oracle's ORDER BY list_reduce
        per_cell = assigned.groupBy("cell").agg(
            F.count(F.lit(1)).alias("n_vecs"),
            (
                F.aggregate(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("id", "dist2"))),
                        lambda s: s["dist2"],
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                / F.count(F.lit(1))
            ).alias("mean_dist2_raw"),
        )
    else:
        assigned = corpus.select(
            F.col(id_col).alias("id"), v.alias("v")
        ).withColumn("cell", nearest_cells("v", centroids, 1).getItem(0))
        from . import lit_double_matrix

        C = lit_double_matrix(centroids)
        # prod keeps the error fold JVM-side too, but a plain avg is
        # fine (telemetry, not a hash-certified value)
        assigned = assigned.withColumn(
            "dist2",
            F.aggregate(
                F.zip_with(
                    F.col("v"),
                    F.element_at(C, F.col("cell") + 1),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        per_cell = assigned.groupBy("cell").agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.avg("dist2").alias("mean_dist2_raw"),
        )
    total = per_cell.agg(
        F.sum("n_vecs").alias("__n"),
        # global mean of the PER-CELL means, folded in cell order —
        # k values, deterministic either way, but keep the cert habit
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("cell", "mean_dist2_raw"))),
                lambda s: s["mean_dist2_raw"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("__sum_means"),
        F.count(F.lit(1)).alias("__k_seen"),
    )
    return (
        per_cell.crossJoin(F.broadcast(total))
        .select(
            "cell",
            "n_vecs",
            # SURVEY §8 integer-contract rule (round 17): occupancy
            # share is a pure integer ratio — exact ppm long (floor
            # div), not a rounded double.
            F.expr("(n_vecs * 1000000) div __n").alias("share_ppm"),
            F.round("mean_dist2_raw", 6).alias("mean_dist2"),
            (F.col("n_vecs") / F.col("__n") > skew_factor / k).alias("high_skew"),
            (
                F.col("mean_dist2_raw")
                > dist_factor * F.col("__sum_means") / F.col("__k_seen")
            ).alias("high_error"),
        )
        .withColumn("refit", F.col("high_skew") | F.col("high_error"))
    )


def prototype_density_outliers(
    corpus: DataFrame,
    decile: float = 0.1,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
    pa_accuracy: int = 10_000,
    centroids_df: DataFrame | None = None,
) -> DataFrame:
    """LINEAR-time density gate (v16; VERDICT r14 item 2): score every
    vector by cosine to its own group's prototype (mean vector) and
    flag the global bottom ``decile`` as outliers — sparse/OOD vectors
    sit far from every prototype, so low prototype-cosine is the
    linear-cost proxy for the low kNN-density that
    :func:`knn_density_outliers` measures exactly.

    Cost shape: one centroid aggregation (shuffle bounded by
    |groups|·dim), one broadcast join + cosine fold per vector, one
    threshold. Total work is O(n·dim) — the 100 TB path where the
    exact-audit kernel's n^1.5 fold total (its honest floor,
    documented at v13_prod) stops fitting any budget. Grouping comes
    from ``label_col`` (a label, cluster id, domain, language — any
    bounded partition of the corpus); unlabeled corpora should
    pre-assign a FIXED-size prototype set (bounded ``kmeans_fit`` +
    ``nearest_cells``, prototype count a modeling constant, NOT a
    corpus-adaptive bucket — per-vector cost is |prototypes|·dim, so a
    fixed count is exactly what keeps this path linear) and pass it as
    ``centroids_df`` (columns: ``label_col``, ``centroid``).

    ``exact=True`` is the CERTIFICATION shape: deterministic
    fixed-order centroid folds (the v15 cert construction — a plain
    avg is order-dependent in the last ulp) and a global exact
    ``percent_rank`` gate, bit-reproducible in DuckDB. The default is
    the production shape: map-side-combinable avg centroids
    (:func:`centroids_by_label`) and a ``percentile_approx`` scalar
    broadcast back — no global sort."""
    if centroids_df is None:
        if exact:
            exploded = corpus.select(
                label_col,
                id_col,
                F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "val"),
            )
            means = exploded.groupBy(label_col, "pos").agg(
                (
                    F.aggregate(
                        F.transform(
                            F.array_sort(F.collect_list(F.struct(id_col, "val"))),
                            lambda s: s["val"],
                        ),
                        F.lit(0.0),
                        lambda a, x: a + x,
                    )
                    / F.count(F.lit(1))
                ).alias("mean_val")
            )
            centroids_df = means.groupBy(label_col).agg(
                F.expr(
                    "transform(sort_array(collect_list(struct(pos, mean_val))), p -> p.mean_val)"
                ).alias("centroid")
            )
        else:
            centroids_df = centroids_by_label(
                corpus, label_col=label_col, vec_col=vec_col
            )
    scored = corpus.join(F.broadcast(centroids_df), label_col).select(
        id_col,
        F.round(
            cosine(F.col(vec_col).cast("array<double>"), F.col("centroid")), 6
        ).alias("proto_cosine"),
    )
    if exact:
        dec_f = exact_threshold(decile)
        w = Window.orderBy("proto_cosine")
        # SURVEY §8 integer-contract rule (round 17): see
        # knn_density_outliers — same integer rank form.
        return (
            scored.withColumn("__rk", F.rank().over(w).cast("long"))
            .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy()))
            .select(
                id_col,
                "proto_cosine",
                F.when(
                    F.col("__n") > 1,
                    F.expr("((__rk - 1) * 1000000) div (__n - 1)"),
                )
                .otherwise(F.lit(0))
                .cast("long")
                .alias("pct_ppm"),
                F.expr(
                    f"(__rk - 1) * {dec_f.denominator}"
                    f" <= (__n - 1) * {dec_f.numerator}"
                ).alias("is_outlier"),
            )
        )
    thr = scored.agg(
        F.percentile_approx("proto_cosine", decile, pa_accuracy).alias("__thr")
    )
    return scored.crossJoin(F.broadcast(thr)).select(
        id_col,
        "proto_cosine",
        (F.col("proto_cosine") <= F.col("__thr")).alias("is_outlier"),
    )


#: default audit budget for :func:`density_gate` — the max corpus size
#: the n^1.5 exact-audit kernel is allowed: at 1M vectors its fold
#:  total is ~k·n^1.5 ≈ 5e9 dim-folds (minutes on a cluster, the most
#: precision a density gate plausibly justifies); past it the linear
#: prototype proxy is the only shape whose cost a 100 TB corpus fits.
DENSITY_AUDIT_BUDGET = 1_000_000


def density_gate(
    corpus: DataFrame,
    k: int = 5,
    decile: float = 0.1,
    budget: int | None = DENSITY_AUDIT_BUDGET,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probes: int = 4,
    centroids_df: DataFrame | None = None,
    exact: bool = False,
) -> DataFrame:
    """Budget-aware density-gate selector (VERDICT r14 item 2): pick
    the exact-audit kNN-density kernel (:func:`knn_density_outliers`,
    n^1.5 — v13_prod's honest floor) while the corpus fits ``budget``
    rows, and the linear prototype proxy
    (:func:`prototype_density_outliers` — the v15-shaped 100 TB gate)
    beyond it. One count (memoized per plan — the scale_out pattern)
    decides; the outlier sets of the two kernels are
    agreement-pinned on the planted-cluster fixture in
    tests/test_llmops.py.

    Returns a unified schema either way:
    ``(id_col, density_score, is_outlier, method)`` — ``density_score``
    is mean-kNN-cosine under the audit kernel and prototype-cosine
    under the linear one; ``method`` says which ran, so downstream
    curation manifests record the provenance of every gate decision.
    ``budget=None`` forces the audit kernel (cert/debug); ``budget=0``
    forces the linear path. ``exact=True`` selects each branch's
    CERTIFICATION shape (deterministic folds + exact ``percent_rank``
    gate, with the exact ``pct`` column added) — bit-reproducible in a
    SQL oracle."""
    from . import memo_count

    # budget=None forces the audit branch with NO count pre-pass (the
    # result would be unused); otherwise count the FULL corpus frame so
    # the memo key matches the audit branch's own n_cells="auto"
    # resolution inside ivf_ann_trained -- one count job serves both
    # (code-review r15: a select(id_col) projection here split the key
    # and paid a second full scan per timed run).
    if budget is None or memo_count(corpus) <= budget:
        out = knn_density_outliers(
            corpus,
            k=k,
            decile=decile,
            id_col=id_col,
            vec_col=vec_col,
            exact=exact,
            n_cells="auto",
            n_probes=n_probes,
        )
        return out.select(
            id_col,
            F.col("mean_knn_cos").alias("density_score"),
            *(["pct_ppm"] if exact else []),
            "is_outlier",
            F.lit("knn_density_audit").alias("method"),
        )
    out = prototype_density_outliers(
        corpus,
        decile=decile,
        label_col=label_col,
        id_col=id_col,
        vec_col=vec_col,
        exact=exact,
        centroids_df=centroids_df,
    )
    return out.select(
        id_col,
        F.col("proto_cosine").alias("density_score"),
        *(["pct_ppm"] if exact else []),
        "is_outlier",
        F.lit("prototype_linear").alias("method"),
    )


def _probe_masks(n_planes: int, radius: int) -> list[int]:
    """All bitmasks of popcount <= radius over n_planes bits (multi-probe
    expansion set). Tiny by construction: C(n_planes, <=radius)."""
    from itertools import combinations

    masks = [0]
    for r in range(1, radius + 1):
        for bits in combinations(range(n_planes), r):
            m = 0
            for bit in bits:
                m |= 1 << bit
            masks.append(m)
    return masks


def auto_n_planes(n: int, floor: int = 16, cap: int = 30) -> int:
    """Corpus-adaptive RHP plane count: ``ceil(log2 n) + 4``, clamped.
    Keeps expected bucket occupancy n/2^planes ≈ 1/16 as the corpus
    grows, so candidate volume stays ~linear in n instead of growing
    with collision density. Each added plane costs one more probe at
    radius 1 (linear) and halves occupancy (geometric) — the trade is
    one-sided until the recall term bites; see
    :func:`embedding_candidate_pairs` for the measured recall."""
    import math

    return max(floor, min(cap, math.ceil(math.log2(max(n, 2))) + 4))


def embedding_candidate_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | str = 16,
    probe_radius: int = 1,
    kernel: str = "arrow",
    unpersist_after: bool = False,
    dim: int | None = None,
) -> DataFrame:
    """Blocked candidate generation for embedding dedup: distinct
    (id_a < id_b) pairs whose RHP signatures are within ``probe_radius``
    hamming distance.

    One side multi-probes (explodes its signature XOR every mask of
    popcount <= radius — C(n_planes, <=radius) slim (id, sig) rows, no
    vectors), the other side keeps its plain signature; an equi-join on
    the probed signature yields candidates. The only wide ops are the
    equi-join and the pair-dedup — both shuffle id-pairs, never vectors,
    so candidate volume (not corpus size squared) bounds the work.

    ``kernel`` picks the signature producer: ``"arrow"`` (default — the
    GEMM kernel, :func:`rhp_signature_arrow`) or ``"hof"`` (the
    certified Catalyst-HOF twin). Bits are test-pinned equal, so the
    choice is pure throughput; at 200 k vectors the interpreted fold
    dominated v10_prod's wall time (r10 agenda item 1).

    ``n_planes="auto"`` sizes the plane count to the corpus
    (:func:`auto_n_planes`, one count() pre-pass — the dd12 auto-cap
    precedent): a FIXED plane count means bucket occupancy, and with it
    candidate volume per vector, grows linearly with the corpus.
    Recall falls with added planes only for pairs far from cosine 1
    (flip probability per plane is arccos(cos)/π) — near-dup pairs in
    SemDeDup's regime (≥0.99) keep radius-1 collision probability
    ≥0.99 out to 30 planes, while threshold-boundary pairs (≈0.92)
    were already recall-limited at 16 planes. Measured at 200 k
    vectors: see SCALE100X.md round-11.

    Cache ownership (VERDICT r13 item 6): the (id, sig) projection
    persists for the join's two sides; by default the caller owns
    cleanup (driver/bench wrappers ``clearCache()`` per query).
    ``unpersist_after=True`` materializes the slim candidate pairs
    eagerly and unpersists before returning — for library consumers
    composing many calls in one session.

    ``dim`` defaults to a one-row probe of the vector column (round-14
    fix): the signature kernels take an explicit dimension, and leaving
    it at their dim-64 default silently signed only the first 64
    components of wider embeddings (reduced bucket selectivity for the
    HOF fold; a hard shape-mismatch for the GEMM kernel). Pass it
    explicitly to skip the probe job.
    """
    if n_planes == "auto":
        from . import memo_count

        n_planes = auto_n_planes(memo_count(df))
    if dim is None:
        from . import memo_dim

        dim = memo_dim(df, vec_col)
    # persist the slim (id, sig) projection: both join sides consume it,
    # so the signature fold computes ONCE per vector instead of once per
    # side — and the cache boundary stops Catalyst from inferring
    # isnotnull(sig) off the equi-join key and pushing the whole
    # signature recomputation into the parquet scan filter (the dd7
    # constraint-pushdown trap, caught by the round-3 plan audit).
    # Callers own cleanup: driver/bench wrappers clearCache() per query.
    sig_fn = rhp_signature_arrow if kernel == "arrow" else rhp_signature
    sigs = scoped_persist(
        df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("embedding_d"),
        )
        .withColumn("sig", sig_fn(vec_col="embedding_d", n_planes=n_planes, dim=dim))
        .select("id", "sig")
    )
    masks = _probe_masks(n_planes, probe_radius)
    a = sigs.select(
        F.col("id").alias("id_a"),
        F.explode(
            F.array(*[F.col("sig").bitwiseXOR(F.lit(m)) for m in masks])
        ).alias("sig_p"),
    )
    b = sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_p"))
    out = (
        a.join(b, "sig_p")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    if unpersist_after:
        out = out.localCheckpoint(eager=True)
        sigs.unpersist()
    return out


def embedding_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
    n_planes: int | str | None = None,
    probe_radius: int | None = None,
    verify_kernel: str = "hof",
    signature_kernel: str = "hof",
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the semantic-dedup
    primitive): (a < b) pairs with cosine >= threshold. ``dim`` is
    forwarded to the candidate generator (None → one-row probe; see
    :func:`embedding_candidate_pairs`).

    ``signature_kernel`` is forwarded to
    :func:`embedding_candidate_pairs` and defaults to ``"hof"`` — the
    sequential-fold Catalyst twin that DuckDB oracles reproduce — so
    hash-CERTIFIED callers (v6/v10) get oracle-comparable candidate
    generation by default; a BLAS-order sign flip at a near-zero
    projection in the GEMM kernel could otherwise change the candidate
    set under the oracle's feet (ADVICE r13). Production callers
    (v10_prod) opt into ``"arrow"`` for the ~10× signature throughput;
    bits are test-pinned equal on the fixtures either way.

    ``verify_kernel``: ``"hof"`` (default — the measured winner at
    EVERY dim, see :func:`verify_kernel_for_dim`; certified queries
    must keep it anyway, the oracle reproduces sequential folds),
    ``"arrow"`` (the einsum twin, measured slower at all dims —
    retained for A/B), or ``"auto"`` (resolve through the
    dim-keyed policy; probes one row for the dim).

    Default path is BLOCKED: RHP-bucket candidates via
    :func:`embedding_candidate_pairs` (signature equi-join + multi-probe),
    then the exact cosine kernel runs only on candidates — sub-quadratic
    whenever the corpus spreads across buckets. Plane count / probe
    radius default from the threshold: high thresholds mean near-dup
    pairs almost always collide (16 planes, radius 1 is near-lossless at
    >=0.9); lower thresholds get fewer planes and a wider radius, trading
    candidate volume for recall. Recall is approximate below ~0.6 —
    pass ``exact=True`` (all-pairs crossJoin, quadratic) when
    completeness is required at low thresholds, and expect to pay O(n²).
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("n", l2_norm("v"))
    a = base.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na")
    )
    b = base.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb")
    )
    if exact:
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    else:
        if n_planes is None:
            n_planes = 16 if threshold >= 0.9 else (8 if threshold >= 0.7 else 4)
        if probe_radius is None:
            probe_radius = 1 if threshold >= 0.9 else 2
        cand = embedding_candidate_pairs(
            df,
            id_col=id_col,
            vec_col=vec_col,
            n_planes=n_planes,
            probe_radius=probe_radius,
            kernel=signature_kernel,
            dim=dim,
        )
        pairs = cand.join(a, "id_a").join(b, "id_b")
    if verify_kernel == "auto":
        probe = base.select(F.array_size("v").alias("d")).first()
        verify_kernel = verify_kernel_for_dim(probe["d"] if probe else 64)
    dot_fn = dot_arrow if verify_kernel == "arrow" else dot
    return (
        pairs.withColumn("cosine", dot_fn("va", "vb") / (F.col("na") * F.col("nb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
