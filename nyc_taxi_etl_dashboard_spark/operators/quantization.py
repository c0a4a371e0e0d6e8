"""Product quantization (PQ) with asymmetric-distance (ADC) scoring —
the memory-compression tier a 100 TB embedding store actually runs
(NEW surface; no counterpart in the reference, whose only vector-shaped
artifact is the dashboard's aggregate KPIs).

Where v8's scalar quantization compresses 4× (one byte per dimension),
PQ compresses ``dim·4 / m`` bytes per vector: the vector is split into
``m`` subvectors, each subspace gets its own k-means codebook of
``ksub`` centroids, and a vector is stored as ``m`` small codes
(m bytes at ksub=256 — 32× for dim=64 float32). Scoring is ASYMMETRIC:
the query stays full-precision; per query one m×ksub lookup table of
subspace dot products is built, and every corpus vector scores as the
sum of m table lookups — never touching the original vector. This is
the IVFADC decomposition of Jégou/Douze/Schmid, "Product Quantization
for Nearest Neighbor Search" (TPAMI 2011), re-expressed on DataFrames:

- **fit** is the kmeans_fit pattern per subspace (bounded deterministic
  sample, Lloyd driver-side in numpy — a codebook never needs the full
  corpus); the model is m·ksub·dsub doubles and rides the plan as
  literals, exactly like the IVF centroids.
- **encode** is one Arrow-vectorized pass (argmin over ksub per
  subspace — dense linear algebra, the established pandas-UDF
  crossing); codes shuffle instead of vectors from then on.
- **score** is Catalyst-only: the per-query LUT is built once per query
  row from codebook literals, and each candidate costs m interpreted
  lookup-adds instead of a dim-length fold — the 8-vs-64 work ratio
  that makes ADC the scan-speed tier, visible even in interpreted HOF
  evaluation.

Certification follows the v4/v5/v7 precedent: the iterative fit is
never reproduced in SQL; instead the registered query (v11) emits the
SQL-reproducible exact side plus verdict columns proven in-engine and
asserted literally by the oracle — (a) the ADC lookup-sum equals the
dot product against the decoded reconstruction (the LUT factorization
property, the heart of ADC), and (b) the estimate error respects the
Cauchy-Schwarz bound |q·v − q·v̂| ≤ |q|·|v − v̂|. Recall and error
floors are pytest-pinned (tests/test_llmops.py), including the
degenerate ksub ≥ n corpus where reconstruction — and therefore ADC —
is exact.
"""

from __future__ import annotations

# module-level for pandas_udf type-hint resolution (see similarity.py)
import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


#: shared bounded-deterministic-sample size for every PQ/IVFADC fit
#: path (ADVICE r18: ivfadc_topk's sample collect hardcoded 100_000,
#: silently duplicating pq_fit's default — if either drifted, the two
#: fit paths would train on different samples and the documented
#: byte-identical-codebook equivalence would break unnoticed).
PQ_SAMPLE_LIMIT = 100_000


def pq_fit(
    df: DataFrame,
    m: int = 8,
    ksub: int = 16,
    dim: int = 64,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_limit: int = PQ_SAMPLE_LIMIT,
) -> list[list[list[float]]]:
    """Train per-subspace codebooks: ``codebooks[s][c]`` is centroid c of
    subspace s (length dim//m). One bounded deterministic sample (the
    ``sample_limit`` lowest-id vectors via distributed TakeOrdered — the
    kmeans_fit pattern), then independent Lloyd runs per subspace in
    numpy driver-side; the full corpus never participates in training,
    only in encoding. Init: the first ksub sample subvectors seed each
    subspace (deterministic); cells that lose all members keep their
    previous centroid. ksub=16 suits the small fixtures; production is
    ksub=256 (one byte per code) with the standard ≥ ~40·ksub training
    points per subspace."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    rows = (
        df.select(
            F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
        )
        .orderBy("id")
        .limit(sample_limit)
        .collect()
    )
    X = np.asarray([r.v for r in rows], dtype=np.float64)
    return _pq_fit_matrix(X, m=m, ksub=ksub, dim=dim, n_iters=n_iters)


def _pq_fit_matrix(
    X: "np.ndarray", m: int, ksub: int, dim: int, n_iters: int = 5
) -> list[list[list[float]]]:
    """:func:`pq_fit`'s numpy Lloyd body over an in-memory training
    matrix — shared by the DataFrame entry point above and the
    sample-side IVFADC fit (:func:`ivfadc_topk`), so both produce
    byte-identical codebooks from the same matrix."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    codebooks: list[list[list[float]]] = []
    for s in range(m):
        Xs = X[:, s * dsub : (s + 1) * dsub]
        C = Xs[:ksub].copy()
        if len(C) < ksub:
            raise ValueError(f"training sample smaller than ksub ({len(C)} < {ksub})")
        for _ in range(n_iters):
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=-1)
            cell = d2.argmin(axis=1)  # first min ⇒ lowest code on ties
            for c in range(ksub):
                members = Xs[cell == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        codebooks.append([[float(x) for x in c] for c in C])
    return codebooks


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "code",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """``(id, code array<int>[, extra_cols])`` — the stored form of the
    corpus (m small ints per vector; everything downstream joins/scans
    codes, never vectors). Arrow-vectorized: per batch, one dense
    broadcast-subtract-square + argmin per subspace (stable ⇒ lowest
    code on ties, matching the fit's assignment rule). ``extra_cols``
    pass through unchanged (e.g. the IVF cell id in IVFADC)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    CBS = [np.asarray(cb, dtype=np.float64) for cb in codebooks]

    @F.pandas_udf("array<int>")
    def encode(v: pd.Series) -> pd.Series:
        if not len(v):  # np.stack raises on an empty sequence (ADVICE r13)
            return pd.Series([], dtype="object")
        V = np.stack(v.to_numpy()).astype(np.float64)
        codes = np.empty((len(V), m), dtype=np.int32)
        for s in range(m):
            Vs = V[:, s * dsub : (s + 1) * dsub]
            d2 = ((Vs[:, None, :] - CBS[s][None, :, :]) ** 2).sum(axis=-1)
            codes[:, s] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    return df.select(
        F.col(id_col).alias("id"),
        encode(F.col(vec_col).cast("array<double>")).alias(code_col),
        *[F.col(c) for c in (extra_cols or [])],
    )


def _lit_matrix(rows: list[list[float]]) -> Column:
    # one parsed SQL expression instead of rows x cols F.lit py4j round
    # trips (optimization r18: the v11/v12/v19 codebooks cost seconds of
    # driver time per plan build in the unrolled form; Literal values
    # are bit-identical — see operators.lit_double_matrix)
    from . import lit_double_matrix

    return lit_double_matrix(rows)


def pq_reconstruct(code_col: str, codebooks: list[list[list[float]]]) -> Column:
    """Decode ``code`` back to the reconstruction v̂ (array<double>):
    concatenate each subspace's looked-up centroid. Catalyst-only — the
    codebook rides the plan as literals (m·ksub·dsub doubles), so the
    decode is a map-side projection with no model distribution step."""
    parts = [
        F.element_at(_lit_matrix(cb), F.element_at(F.col(code_col), s + 1) + 1)
        for s, cb in enumerate(codebooks)
    ]
    return F.flatten(F.array(*parts))


def pq_lut(qvec_col: str, codebooks: list[list[list[float]]]) -> Column:
    """The per-query ADC lookup table (array<array<double>>, m × ksub):
    entry [s][c] = dot(q_s, codebook_s[c]). Built ONCE per query row
    from literals; every corpus candidate then scores with m lookups
    instead of a dim-length fold."""
    dsub = len(codebooks[0][0])
    tables = []
    for s, cb in enumerate(codebooks):
        q_s = F.slice(F.col(qvec_col), s * dsub + 1, dsub)
        # transform over the codebook as ONE literal matrix instead of
        # ksub unrolled aggregate expressions (optimization r18): each
        # entry still computes aggregate(zip_with(q_s, c, *), 0.0, +) in
        # the same order over the same doubles, so every LUT value is
        # bit-identical to the unrolled form — only the build cost
        # (ksub x dsub py4j literal calls + ksub lambda registrations)
        # and the plan's textual size shrink.
        tables.append(
            F.transform(
                _lit_matrix(cb),
                lambda c: F.aggregate(
                    F.zip_with(q_s, c, lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
            )
        )
    return F.array(*tables)


def pq_adc_dot(lut_col: str, code_col: str, m: int) -> Column:
    """ADC estimate of dot(q, v): Σ_s LUT[s][code_s] — m lookup-adds per
    candidate, the entire per-pair scoring cost."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            F.element_at(F.col(lut_col), s + 1),
            F.element_at(F.col(code_col), s + 1) + 1,
        ),
    )


def pq_adc_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Production ADC top-k: rank the ENCODED corpus (``(id, code)``
    from :func:`pq_encode` — the only corpus-sized input; original
    vectors are never read) by the ADC dot-product estimate against
    each query. Ranking is by estimated DOT PRODUCT — the standard ADC
    regime; normalize embeddings upstream when cosine ranking is
    required (then dot ≡ cosine up to the query's own constant norm,
    which cannot change its ranking).

    Shape: the bounded query batch is collected and its LUTs
    (|queries| × m × ksub doubles) precomputed in numpy — the kmeans
    model pattern: the LUT block rides the Arrow kernel's closure, NOT
    the Catalyst plan (folding m·ksub·dsub literals into expressions is
    the CERTIFICATION path v11 deliberately takes for in-plan
    verifiability; at production it bloats the task binary and costs
    driver plan-compile seconds). Each corpus row is scored ONCE for
    all queries with one numpy gather+sum per batch, posexploded to
    slim (query, score) rows — corpus codes are never duplicated per
    query. Approximate output ⇒ recall-floor pytest, not oracle hash
    (the v4_prod/v7_prod split)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    q_rows = (
        queries.select(F.col(id_col), F.col(vec_col).cast("array<double>"))
        .orderBy(id_col)
        .collect()
    )
    q_ids = [r[0] for r in q_rows]
    CBS = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    LUT = np.stack(
        [
            np.stack(
                [CBS[s] @ np.asarray(r[1][s * dsub : (s + 1) * dsub]) for s in range(m)]
            )
            for r in q_rows
        ]
    )  # |queries| x m x ksub

    @F.pandas_udf("array<double>")
    def adc(codes: pd.Series) -> pd.Series:
        if not len(codes):  # np.stack raises on an empty sequence (ADVICE r13)
            return pd.Series([], dtype="object")
        C = np.stack(codes.to_numpy())  # n x m
        cols = np.arange(m)
        out = np.stack([LUT[qi][cols, C].sum(axis=1) for qi in range(len(q_ids))], axis=1)
        return pd.Series(list(out))  # n rows of |queries| scores

    qmap = F.array(*[F.lit(int(i)) for i in q_ids])
    scored = (
        corpus_codes.select(
            F.col("id").alias("neighbor_id"),
            F.posexplode(adc("code")).alias("qi", "adc_dot"),
        )
        .withColumn("query_id", F.element_at(qmap, F.col("qi") + 1))
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc_dot"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "adc_dot", "rnk")
    )


def _assign_encode_kernel(
    C: "np.ndarray",
    codebooks: list[list[list[float]]],
    by_residual: bool,
):
    """ONE fused Arrow kernel for IVFADC's assign → residual → encode
    (optimization r19, guide §4.1/§4.4): the previous three-kernel chain
    (nearest_cells, the residual subtract, pq_encode) shipped the full
    vector payload across the JVM↔Python boundary twice, and the
    probed-cell isin filter's pushdown DUPLICATED the assignment kernel
    — the r18 plan dump shows two ``probe(v)`` ArrowEvalPython nodes,
    one below the exchange feeding the pushed filter and one above it
    rebuilding the cell column (the guide §4.4 two-BatchEvalPython
    signature). Fused, each corpus vector crosses the boundary ONCE and
    the n_cells×dim assignment GEMM — the dominant per-row flops once
    n_cells scales as sqrt(corpus) — runs once instead of twice; the
    m×ksub×dsub encode now runs on every row rather than only probed
    rows, a strictly smaller add than the removed duplicate assign
    (≈3·ksub·dim vs 2·n_cells·dim flops/row). Marked non-deterministic
    (guide §4.4) so the optimizer may not push the isin filter below it
    and re-duplicate; the filter still prunes before the ADC kernel and
    the rank shuffle. Same numpy ops in the same order as the three
    separate kernels (stack → _d2_matrix → first-min argmin; V − C[cell];
    broadcast-subtract-square → argmin per subspace), so cells and codes
    are bit-identical — pinned against the inlined old chain in
    tests/test_llmops.py and by the probe-all degeneracy test."""
    from .similarity import _d2_matrix

    m = len(codebooks)
    dsub = len(codebooks[0][0])
    CBS_enc = [np.asarray(cb, dtype=np.float64) for cb in codebooks]

    @F.pandas_udf("cell int, code array<int>")
    def _assign_encode(v: pd.Series) -> pd.DataFrame:
        if not len(v):  # np.stack raises on an empty sequence (ADVICE r13)
            return pd.DataFrame(
                {
                    "cell": pd.Series([], dtype="int32"),
                    "code": pd.Series([], dtype="object"),
                }
            )
        V = np.stack(v.to_numpy())
        cells = _d2_matrix(V, C).argmin(axis=1)  # first min ⇒ lowest cell
        E = (V - C[cells]) if by_residual else V.astype(np.float64)
        codes = np.empty((len(E), m), dtype=np.int32)
        for s in range(m):
            Es = E[:, s * dsub : (s + 1) * dsub]
            d2 = ((Es[:, None, :] - CBS_enc[s][None, :, :]) ** 2).sum(axis=-1)
            codes[:, s] = d2.argmin(axis=1)
        return pd.DataFrame(
            {
                "cell": pd.Series(cells.astype("int32")),
                "code": pd.Series(list(codes)),
            }
        )

    return _assign_encode.asNondeterministic()


def ivfadc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int | str = 8,
    n_probes: int = 2,
    m: int = 8,
    ksub: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    by_residual: bool = True,
    centroids: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """IVFADC — the coarse-quantizer + product-quantizer composition of
    Jégou/Douze/Schmid (TPAMI 2011) and the index family behind every
    billion-scale vector store: corpus vectors are assigned to
    ``n_cells`` k-means cells (v7's trained coarse quantizer) and
    stored as ``(id, cell, code)`` PQ rows; each query probes its
    ``n_probes`` nearest cells and ADC-scores ONLY those cells' codes.
    Both halves reuse their certified operators — ``kmeans_fit`` /
    ``nearest_cells`` (v7) and ``pq_fit`` / ``pq_encode`` / the
    numpy-LUT ADC kernel (v11) — so the composition needs no new math,
    only the probe filter.

    ``by_residual=True`` (default — the paper's IVFADC proper) encodes
    the RESIDUAL v − centroid(cell): residual magnitudes are a fraction
    of vector magnitudes, so the same ksub codebook spends its
    resolution on a smaller ball and the estimate tightens; the ADC
    score adds the exact dot(q, centroid(cell)) offset per probed cell
    (dot(q, c + r) = dot(q, c) + dot(q, r) — the offset is free at
    LUT-build time). ``by_residual=False`` composes the raw pieces
    unchanged, and at ``n_probes = n_cells`` PROVABLY equals
    :func:`pq_adc_topk` over the whole corpus (every cell probed ⇒ the
    candidate set is the entire encoded corpus — the v7 probe-all
    precedent, pinned by pytest).

    Scale shape: the stored table is slim codes; at rest it should be
    clustered by ``cell`` (``write_parquet(cluster_by='cell')``) so the
    probe filter prunes row groups at scan — here the filter runs
    before the scoring kernel, so only probed cells' rows are ever
    scored. Queries are a bounded batch (collected once, LUTs in the
    kernel closure — the kmeans model pattern).

    ``n_cells="auto"`` resolves via ``similarity.auto_n_cells``
    (≈ sqrt(n) — round 14): a fixed cell count makes each query's
    probed-candidate set n·n_probes/n_cells, i.e. LINEAR in the corpus
    (a quarter-corpus scan at the 2-of-8 default), which defeats the
    index at scale; sqrt sizing makes it n_probes·sqrt(n)."""
    from .similarity import _d2_matrix, _kmeans_fit_matrix, auto_n_cells

    need_centroid_fit = centroids is None
    need_codebook_fit = codebooks is None
    X = None
    if need_centroid_fit or need_codebook_fit:
        # ONE bounded deterministic TakeOrdered sample feeds BOTH fits
        # (optimization r19, guide §1.2): kmeans_fit and the codebook
        # fit each ran their own distributed sample pass over the same
        # PQ_SAMPLE_LIMIT lowest-id rows — a duplicate full-corpus scan
        # at 100 TB and a duplicate probe job per query at bench scale.
        # Same projection, same order, same limit ⇒ the same training
        # matrix, so both models are byte-identical to the two-pass
        # form. Training still happens on the sample's RAW vectors with
        # the residual math applied driver-side (the r18 rule: never
        # collect THROUGH the corpus-wide Arrow kernels).
        rows = (
            corpus.select(
                F.col(id_col).alias("id"),
                F.col(vec_col).cast("array<double>").alias("v"),
            )
            .orderBy("id")
            .limit(PQ_SAMPLE_LIMIT)
            .collect()
        )
        X = np.asarray([r.v for r in rows], dtype=np.float64)
    if need_centroid_fit:
        # resolve "auto" only on the fit path: callers reusing a fitted
        # model across query batches must not pay a corpus count() per
        # batch
        if n_cells == "auto":
            from . import memo_count

            n_cells = auto_n_cells(memo_count(corpus))
        centroids, _ = _kmeans_fit_matrix(X, k=n_cells)
    C = np.asarray(centroids, dtype=np.float64)
    dsub = dim // m
    if need_codebook_fit:
        Xs = X
        if by_residual:
            cells_s = _d2_matrix(Xs, C).argmin(axis=1)
            Xs = Xs - C[cells_s]
        codebooks = _pq_fit_matrix(Xs, m=m, ksub=ksub, dim=dim)
    _assign_encode = _assign_encode_kernel(C, codebooks, by_residual)
    stored = corpus.select(
        F.col(id_col).alias("id"),
        _assign_encode(F.col(vec_col).cast("array<double>")).alias("ac"),
    ).select("id", F.col("ac.code").alias("code"), F.col("ac.cell").alias("cell"))

    q_rows = (
        queries.select(F.col(id_col), F.col(vec_col).cast("array<double>"))
        .orderBy(id_col)
        .collect()
    )
    q_ids = [r[0] for r in q_rows]
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    CBS = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    LUT = np.stack(
        [np.stack([CBS[s] @ q[s * dsub : (s + 1) * dsub] for s in range(m)]) for q in Q]
    )
    offsets = Q @ C.T if by_residual else np.zeros((len(q_ids), len(C)))
    # each query's probed cells, ordered nearest-first (driver-side —
    # |queries| × n_probes ints)
    d2q = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=-1)
    probes = np.argsort(d2q, axis=1, kind="stable")[:, :n_probes]
    probe_sets = [set(int(x) for x in row) for row in probes]
    all_probed = sorted(set().union(*probe_sets))

    @F.pandas_udf("array<double>")
    def adc(cell: pd.Series, codes: pd.Series) -> pd.Series:
        if not len(codes):  # np.stack raises on an empty sequence (ADVICE r13)
            return pd.Series([], dtype="object")
        Cd = np.stack(codes.to_numpy())
        cells = cell.to_numpy().astype(int)
        cols = np.arange(m)
        out = np.stack(
            [
                np.where(
                    np.isin(cells, list(probe_sets[qi])),
                    offsets[qi, cells] + LUT[qi][cols, Cd].sum(axis=1),
                    -np.inf,  # unprobed cell for this query → never ranks
                )
                for qi in range(len(q_ids))
            ],
            axis=1,
        )
        return pd.Series(list(out))

    qmap = F.array(*[F.lit(int(i)) for i in q_ids])
    scored = (
        stored.filter(F.col("cell").isin(all_probed))  # prune before scoring
        .select(
            F.col("id").alias("neighbor_id"),
            F.posexplode(adc("cell", "code")).alias("qi", "adc_dot"),
        )
        .filter(F.col("adc_dot") != float("-inf"))
        .withColumn("query_id", F.element_at(qmap, F.col("qi") + 1))
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc_dot"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "adc_dot", "rnk")
    )
