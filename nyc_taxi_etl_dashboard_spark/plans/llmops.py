"""LLM-data-pipeline queries (NEW surface, SURVEY §7.1 step 7): text
analysis, exact/fuzzy dedup, similarity search, multimodal plumbing —
over the ``documents`` and ``embeddings`` fixtures.

Oracle notes: signatures/hashes use the portable ``token_value`` hash so
DuckDB can reproduce them bit-for-bat; per-row ratios are IEEE-exact in
both engines; only cross-row double aggregations are rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import POLY_BASE, POLY_MOD, poly_fingerprint, tie_safe_round, token_value
from ..operators import multimodal, scale_out, scoped_persist
from ..operators.dedup import (
    MINHASH_PRIME,
    dedup_keep_first,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_params,
    minhash_signature,
    simhash32,
    simhash_pairs,
)
from ..operators.similarity import centroids_by_label, dot, knn_bruteforce, knn_lsh, l2_norm
from ..operators.text import (
    PII_PATTERNS,
    langid_en_heuristic,
    pii_counts,
    quality_features,
    redact_pii,
    tokens,
    with_shingles,
)
from ..sources import read_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # single-file fixture => scale_out for the CPU-bound text operators
    return scale_out(read_table(spark, sf_dir, "documents"))


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scale_out(read_table(spark, sf_dir, "embeddings"))


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------


def q_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus profile: doc counts, length stats, source
    coverage — the first-look census any corpus pipeline runs."""
    d = _docs(spark, sf_dir)
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.array_size(tokens("text")).cast("long")).alias("__tok"),
            F.sum(F.col("n_chars").cast("long")).alias("__chr"),
            F.countDistinct("source").alias("n_sources"),
        )
        .select(
            "lang",
            "n_docs",
            # SURVEY §8 integer-contract rule (round 17): corpus means
            # of integer counts are integer ratios — exact ppm longs.
            F.expr("(__tok * 1000000) div n_docs").alias("avg_tokens_ppm"),
            F.expr("(__chr * 1000000) div n_docs").alias("avg_chars_ppm"),
            "n_sources",
        )
    )


def q_quality_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality feature bank (length, lexical diversity,
    stopword share, mean token length) — pure row-wise expressions."""
    d = _docs(spark, sf_dir)
    feats = quality_features("text")
    return d.select(
        "doc_id",
        feats["n_tokens"].alias("n_tokens"),
        feats["distinct_ratio"].alias("distinct_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        feats["mean_token_len"].alias("mean_token_len"),
    )


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive document fingerprint (rolling polynomial hash) —
    the cheap exact-dup/content-drift sketch."""
    d = _docs(spark, sf_dir)
    return d.select("doc_id", poly_fingerprint(tokens("text")).alias("fingerprint"))


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID (stopword-share thresholding)."""
    d = _docs(spark, sf_dir)
    return d.select("doc_id", "lang", langid_en_heuristic("text").alias("lang_pred"))


# --------------------------------------------------------------------------
# Dedup
# --------------------------------------------------------------------------


def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 deterministic: one survivor per (lang, source), lowest doc_id
    wins (pandas keep='first' needs an explicit tiebreaker distributed)."""
    d = _docs(spark, sf_dir)
    return dedup_keep_first(d, ["lang", "source"], ["doc_id"]).select(
        "doc_id", "lang", "source"
    )


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram (k=3) Jaccard near-dup pairs ≥0.5 via inverted shingle
    index — never materializes non-overlapping pairs. The stop-shingle
    cap (df<=100) is explicit; it drops nothing at the fixture scales
    (max shingle df: 7 at sf0.01, 25 at sf0.1), so the exhaustive
    oracle still hash-matches, while bounding candidates at corpus
    scale."""
    return jaccard_pairs(_docs(spark, sf_dir), threshold=0.5, max_shingle_freq=100)


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-hash MinHash signature per document (portable permutation
    hashes => oracle-checkable bit-for-bit)."""
    sh = with_shingles(_docs(spark, sf_dir).select("doc_id", "text"))
    sig = sh.withColumn("sig", minhash_signature(8))
    cols = [F.col("sig")[i].alias(f"h{i}") for i in range(8)]
    return sig.select("doc_id", *cols)


def q_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH banding (32 hashes, 8 bands) + exact verification at
    jaccard ≥0.8. Oracle is the exhaustive pair scan — they agree when
    LSH recall is total (deterministic hashes: miss prob <2e-4 at j≥0.9,
    and fixed for a fixed dataset)."""
    return minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.8)


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash sketch per document."""
    d = _docs(spark, sf_dir)
    return d.select("doc_id", simhash32("text").alias("simhash"))


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------


def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norms — the vector-math smoke check (sequential fold ⇒
    bit-deterministic, no rounding needed)."""
    return _embs(spark, sf_dir).select("vec_id", l2_norm("embedding").alias("l2"))


def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for query vectors (vec_id < 3) — brute-force
    baseline: broadcast queries, fold dot products in the scan stage."""
    e = _embs(spark, sf_dir)
    return knn_bruteforce(e, e.filter(F.col("vec_id") < 3), k=5)


def q_centroid_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid norms (posexplode + grouped mean — the
    distributed mean-vector shape). Cross-row double sums => rounded."""
    e = _embs(spark, sf_dir)
    cent = centroids_by_label(e)
    counts = e.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"))
    return (
        cent.join(counts, "label")
        .select("label", "n_vecs", F.round(l2_norm("centroid"), 6).alias("centroid_l2"))
    )


def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path made hash-certifiable (the dd9/v8 reshape): the
    exhaustive-probe LSH top-k — all 2^n_planes buckets probed, so the
    candidate set is PROVABLY the whole corpus and the result equals
    brute force through the full LSH machinery (signatures, probe
    explode, bucket join, in-bucket scoring, local top-k) — plus two
    verdicts proven in-engine and asserted literally by the oracle:
    ``lsh_matches_exact`` (exhaustive LSH ≡ knn_bruteforce, bit-equal
    cosine and same neighbor at every rank) and ``approx_admissible``
    (the DEFAULT bucket-only configuration's rank-r score never exceeds
    the exact rank-r score — candidate subsets are dominated rank-wise).
    The approximate path's recall stays pinned by pytest: the
    multi-probe knob (n_probes lowest-|margin| bit flips) lifts
    recall@4 from 0.60 to 0.94 at 16 planes on a planted near-neighbor
    corpus (test_multiprobe_lsh_recall_floor)."""
    e = _embs(spark, sf_dir)
    qs = e.filter(F.col("vec_id") < 3)
    exact = knn_bruteforce(e, qs, k=5).select(
        "query_id",
        "rnk",
        F.col("neighbor_id").alias("bf_neighbor"),
        F.col("cosine").alias("bf_cosine"),
    )
    exhaustive = knn_lsh(e, qs, k=5, exhaustive=True)
    approx = knn_lsh(e, qs, k=5).select(
        "query_id", "rnk", F.col("cosine").alias("approx_cosine")
    )
    return (
        exhaustive.join(F.broadcast(exact), ["query_id", "rnk"])
        # left join: a bucket-only query may return fewer than k rows
        .join(F.broadcast(approx), ["query_id", "rnk"], "left")
        .select(
            "query_id",
            "rnk",
            "neighbor_id",
            "cosine",
            (
                (F.col("neighbor_id") == F.col("bf_neighbor"))
                & (F.col("cosine") == F.col("bf_cosine"))
            ).alias("lsh_matches_exact"),
            F.coalesce(
                F.col("approx_cosine") <= F.col("bf_cosine"), F.lit(True)
            ).alias("approx_admissible"),
        )
    )


#: v9 guard: eval sets are benchmark suites (thousands of rows); past
#: this the broadcast would copy a corpus-sized frame to every executor
V9_MAX_BROADCAST_EVAL_ROWS = 100_000


def q_embedding_decontam(
    spark: SparkSession,
    sf_dir: str,
    max_eval_rows: int = V9_MAX_BROADCAST_EVAL_ROWS,
) -> DataFrame:
    """v9: embedding-space decontamination — the semantic upgrade of
    t8's n-gram check: flag TRAIN vectors whose cosine against ANY
    eval-set vector clears 0.5 (paraphrased eval leakage that shares no
    shingles). Eval slice = ``vec_id % 20 == 0`` (the x5-style
    deterministic split). Scale shape: eval sets are bounded (benchmark
    suites, thousands of rows), so broadcast eval and fold the cosine in
    the train scan, then a per-vector max — one pass over the corpus, no
    shuffle of train data. A ``limit(n+1).count()`` probe (the dd8
    bounded-probe pattern — never a full count of an unbounded frame)
    REFUSES to broadcast an eval side larger than ``max_eval_rows``
    (VERDICT r6 item 3): route such "eval sets" through the v6
    RHP-blocked kernel (:func:`..operators.similarity.
    embedding_candidate_pairs`), which runs the same cosine on blocked
    candidates only. Exact + deterministic fold ⇒ hash-certifiable
    against the DuckDB twin with no verdict scaffolding."""
    e = _embs(spark, sf_dir)
    # norms once per SIDE, not once per PAIR: higher-order-function
    # folds are CodegenFallback (interpreted), so hoisting the two norm
    # folds out of the |train|x|eval| loop cuts the per-pair work to
    # one dot fold — same value bits (same expressions, same order)
    ev = (
        e.filter(F.col("vec_id") % 20 == 0)
        .select(F.col("vec_id").alias("eval_id"), F.col("embedding").alias("e_vec"))
        .withColumn("e_nrm", l2_norm("e_vec"))
    )
    if ev.limit(max_eval_rows + 1).count() > max_eval_rows:
        raise ValueError(
            f"v9 eval side exceeds {max_eval_rows} rows: broadcasting it "
            "would ship a corpus-sized frame to every executor. Use the "
            "v6 RHP-blocked kernel (operators.similarity."
            "embedding_candidate_pairs) for corpus-vs-corpus "
            "decontamination, or raise max_eval_rows deliberately."
        )
    train = e.filter(F.col("vec_id") % 20 != 0).withColumn(
        "t_nrm", l2_norm("embedding")
    )
    return (
        train.crossJoin(F.broadcast(ev))
        .withColumn(
            "cos", dot("embedding", "e_vec") / (F.col("t_nrm") * F.col("e_nrm"))
        )
        .groupBy("vec_id")
        .agg(F.max("cos").alias("max_eval_cosine"))
        .select(
            "vec_id",
            "max_eval_cosine",
            (F.col("max_eval_cosine") >= 0.5).alias("contaminated"),
        )
    )


# (v9 registered below, after the QUERIES dict literal exists)


def q_knn_lsh_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v4_prod: the PRODUCTION multi-probe LSH path a 100 TB user runs —
    occupancy-targeted bucketing (``n_planes="auto"``, round 14: a
    fixed 8-plane count let per-query candidates grow linearly with
    the corpus — n/256 per probed bucket) plus 2 extra probes,
    exact-scored top-5. No exhaustive reshape, no brute-force leg, no
    verdict joins (those are v4, the certification shape; VERDICT r6
    item 1b split the two so bench measures production cost).
    Bench-only: approximate output is recall-floor-tested in pytest,
    not hash-certified."""
    e = _embs(spark, sf_dir)
    qs = e.filter(F.col("vec_id") < 3)
    return knn_lsh(e, qs, k=5, n_planes="auto", n_probes=2)


def q_ivf_trained_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v7_prod: the PRODUCTION trained-IVF path — bounded-sample k-means
    fit (amortized across query batches in production; included here so
    the number is end-to-end honest) + nprobe=2 probe join. No probe-all
    leg, no verdict joins (those are v7, the certification shape).
    Bench-only; recall and inertia floors pinned in pytest — including
    the auto-cells config itself on the planted-cluster fixture (auto
    resolves to 32 cells there, recall@5 >= 0.9 pinned; on
    structure-free data tune n_probes upward with the cell count, the
    standard IVF knob).

    Cell count is corpus-adaptive (round 14, the v8/v13 sweep): fixed
    8 cells made every query scan n·2/8 = a quarter of the corpus —
    linear per query, defeating the index at scale; ``"auto"``
    (≈ sqrt(n)) bounds it at 2·sqrt(n) candidates per query."""
    from ..operators.similarity import ivf_ann_trained

    e = _embs(spark, sf_dir)
    qs = e.filter(F.col("vec_id") < 3)
    return ivf_ann_trained(e, qs, k=5, n_cells="auto", n_iters=3, n_probes=2)


#: production-path ANN shapes timed by bench.py but NOT registered in
#: QUERIES: their output is approximate (bucket-dependent), so they are
#: recall-tested rather than oracle-hashed — registering them would
#: reintroduce rows-only correctness checks for no evidence gain.
BENCH_ONLY = {
    "v4_prod": q_knn_lsh_prod,
    "v7_prod": q_ivf_trained_prod,
}


# --------------------------------------------------------------------------
# Multimodal plumbing
# --------------------------------------------------------------------------


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction via Arrow-batched mapInPandas
    (decode stubbed — container has no codecs; the Spark plumbing is
    real). Features are deterministic so the oracle reproduces them."""
    d = multimodal.attach_binary_payload(_docs(spark, sf_dir))
    return multimodal.extract_media_features(d)


QUERIES = {
    "t1_lang_profile": q_lang_profile,
    "t2_quality_features": q_quality_features,
    "t3_fingerprints": q_fingerprints,
    "t4_langid": q_langid,
    "dd1_dedup_keep_first": q_dedup_keep_first,
    "dd2_jaccard_pairs": q_jaccard_pairs,
    "dd3_minhash_signatures": q_minhash_signatures,
    "dd4_lsh_pairs": q_lsh_pairs,
    "dd5_simhash": q_simhash,
    "v1_embedding_norms": q_embedding_norms,
    "v2_knn_bruteforce": q_knn_bruteforce,
    "v3_centroid_norms": q_centroid_norms,
    "v4_knn_lsh": q_knn_lsh,
    "mm1_media_features": q_media_features,
}

# -- oracle SQL ------------------------------------------------------------

_TV = "(ascii({v}) * 10007 + ascii(reverse({v})) * 101 + length({v}))"

_SHINGLES_CTE = """
toks AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT doc_id, text, list_distinct(
    CASE WHEN len(t) >= 3 THEN
      list_transform(range(len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
    ELSE [] END) AS shingle
  FROM toks)"""

# CAST ... AS INTEGER: the Spark leg emits int32 signature columns;
# DuckDB's % arithmetic yields BIGINT — same values (< MINHASH_PRIME
# < 2^31), but the pandas-fetch dtype audit (round 18) pins both legs
# to the same physical width so no driver normalization is exercised.
_MINHASH_COLS = ", ".join(
    f"CAST(coalesce(list_min(list_transform(shingle, s -> ({a} * {_TV.format(v='s')} + {b}) % {MINHASH_PRIME})), {MINHASH_PRIME}) AS INTEGER) AS h{i}"
    for i, (a, b) in enumerate(minhash_params(8))
)

_JACCARD_PAIRS = """
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       len(list_intersect(a.shingle, b.shingle)) * 1.0
         / (len(a.shingle) + len(b.shingle) - len(list_intersect(a.shingle, b.shingle))) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.shingle, b.shingle)) * 1.0
        / (len(a.shingle) + len(b.shingle) - len(list_intersect(a.shingle, b.shingle))) >= {thr}"""

_SIMHASH_PER_BIT = (
    "list_reduce(list_prepend(0, list_transform(t, tok -> "
    f"CASE WHEN (({_TV.format(v='tok')} * 2654435761) >> b) & 1 = 1 THEN 1 ELSE -1 END)), "
    "(s, x) -> s + x)"
)

_DOT = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(64), "
    "i -> CAST({a}[i+1] AS DOUBLE) * CAST({b}[i+1] AS DOUBLE))), (acc, x) -> acc + x)"
)

ORACLES = {
    "t1_lang_profile": """
SELECT lang, count(*) AS n_docs,
       CAST((sum(CAST(len(string_split(text, ' ')) AS BIGINT)) * 1000000)
         // count(*) AS BIGINT) AS avg_tokens_ppm,
       CAST((sum(CAST(n_chars AS BIGINT)) * 1000000) // count(*)
         AS BIGINT) AS avg_chars_ppm,
       count(DISTINCT source) AS n_sources
FROM documents GROUP BY lang""",
    "t2_quality_features": """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       CAST(len(toks) AS INTEGER) AS n_tokens,
       len(list_distinct(toks)) * 1.0 / len(toks) AS distinct_ratio,
       len(list_filter(toks, x -> x IN ('the', 'a'))) * 1.0 / len(toks) AS stopword_ratio,
       list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(toks, x -> CAST(length(x) AS BIGINT))), (a, x) -> a + x) * 1.0 / len(toks) AS mean_token_len
FROM t""",
    "t3_fingerprints": f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
         list_transform(toks, tok -> CAST({_TV.format(v='tok')} AS BIGINT))),
         (acc, x) -> (acc * {POLY_BASE} + x) % {POLY_MOD}) AS fingerprint
FROM t""",
    "t4_langid": """
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id, lang,
       CASE WHEN len(list_filter(toks, x -> x IN ('the', 'a'))) * 1.0 / len(toks) >= 0.04
            THEN 'en' ELSE 'other' END AS lang_pred
FROM t""",
    "dd1_dedup_keep_first": """
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
  FROM documents) WHERE rn = 1""",
    "dd2_jaccard_pairs": f"WITH {_SHINGLES_CTE} {_JACCARD_PAIRS.format(thr=0.5)}",
    "dd3_minhash_signatures": f"WITH {_SHINGLES_CTE} SELECT doc_id, {_MINHASH_COLS} FROM sh",
    "dd4_lsh_pairs": f"WITH {_SHINGLES_CTE} {_JACCARD_PAIRS.format(thr=0.8)}",
    "dd5_simhash": f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
SELECT doc_id,
       list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(32),
         b -> CASE WHEN {_SIMHASH_PER_BIT} > 0 THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)),
         (acc, x) -> acc + x) AS simhash
FROM t""",
    "v1_embedding_norms": """
SELECT vec_id,
       sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
         (acc, x) -> acc + x)) AS l2
FROM embeddings""",
    "v2_knn_bruteforce": f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         {_DOT.format(a='qv', b='cv')}
           / (sqrt({_DOT.format(a='qv', b='qv')}) * sqrt({_DOT.format(a='cv', b='cv')})) AS cosine
  FROM c CROSS JOIN q WHERE neighbor_id <> query_id)
SELECT query_id, neighbor_id, cosine, rnk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rnk
  FROM scored) WHERE rnk <= 5""",
    "v3_centroid_norms": """
WITH m AS (
  SELECT label, i, avg(CAST(embedding[i+1] AS DOUBLE)) AS mean_val
  FROM embeddings CROSS JOIN range(64) r(i)
  GROUP BY label, i),
n AS (SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY label)
SELECT m.label, n.n_vecs, round(sqrt(sum(mean_val * mean_val)), 6) AS centroid_l2
FROM m JOIN n ON m.label = n.label
GROUP BY m.label, n.n_vecs""",
    # v4: exhaustive-probe LSH ≡ brute force (same fold, same window,
    # same tiebreak), so the oracle IS the brute-force top-k — and the
    # two in-engine verdict columns are asserted literally TRUE:
    # lsh_matches_exact because exhaustive candidates = whole corpus,
    # approx_admissible because a candidate-subset's rank-r score can
    # never exceed the exact rank-r score. A hash mismatch on either
    # boolean means the LSH machinery broke equivalence/admissibility.
    "v4_knn_lsh": f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         {_DOT.format(a='qv', b='cv')}
           / (sqrt({_DOT.format(a='qv', b='qv')}) * sqrt({_DOT.format(a='cv', b='cv')})) AS cosine
  FROM c CROSS JOIN q WHERE neighbor_id <> query_id)
SELECT query_id, rnk, neighbor_id, cosine,
       TRUE AS lsh_matches_exact, TRUE AS approx_admissible
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rnk
  FROM scored) WHERE rnk <= 5""",
    # v9: exact embedding decontamination — deterministic folds, no
    # approximation anywhere, so the oracle is the same computation
    "v9_embedding_decontam": f"""
WITH ev AS (SELECT vec_id AS eval_id, embedding AS e_vec FROM embeddings WHERE vec_id % 20 = 0),
tr AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 20 <> 0),
sc AS (
  SELECT tr.vec_id,
         {_DOT.format(a='embedding', b='e_vec')}
           / (sqrt({_DOT.format(a='embedding', b='embedding')}) * sqrt({_DOT.format(a='e_vec', b='e_vec')})) AS cos
  FROM tr CROSS JOIN ev),
m AS (SELECT vec_id, max(cos) AS max_eval_cosine FROM sc GROUP BY vec_id)
SELECT vec_id, max_eval_cosine, max_eval_cosine >= 0.5 AS contaminated FROM m""",
    "mm1_media_features": f"""
SELECT doc_id, 'text/plain' AS mime,
       CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS byte_len,
       CAST(ascii(text[1:1]) AS INTEGER) AS first_byte,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
         list_transform(range(least(length(text), 64)), i -> CAST(ascii(text[i+1:i+1]) AS BIGINT))),
         (acc, x) -> (acc * 131 + x) % 1000000007) AS content_hash
FROM documents""",
}


# --------------------------------------------------------------------------
# Composed curation pipeline + extra text/vector coverage
# --------------------------------------------------------------------------


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways (whitespace + regex extraction) and an
    n_chars audit — the tokenizer-agnostic length census."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.array_size(F.split("text", " ")).alias("ws_tokens"),
        F.array_size(F.expr("regexp_extract_all(text, '[a-z]+', 0)")).alias("regex_tokens"),
        (F.col("n_chars") == F.length("text")).alias("chars_match"),
    )


#: stub "pretrained" quality-classifier weights over the t2 feature bank.
#: A real pipeline loads these from a trained fastText/logreg model; the
#:  Spark plumbing — constant-folded weights, map-only sigmoid scoring,
#: no shuffle — is what is real here, and is identical for any weights.
QC_WEIGHTS = {
    "bias": -3.0,  # centers the fixture z distribution (span 2.3-4.2) so the gate splits
    "n_tokens": 0.01,
    "distinct_ratio": 2.0,
    "stopword_ratio": 6.0,
    "mean_token_len": 0.25,
}


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t14: MODEL-based quality scoring (the classifier-filter stage —
    fastText/logreg over engineered features — that modern pipelines run
    AFTER the t7 rule bank: rules catch garbage, the classifier ranks
    the rest). score = sigmoid(w·x) over the t2 feature bank with
    deterministic stub weights (``QC_WEIGHTS``); keep = score >= 0.5.

    Scale shape: weights are literals folded into one codegen'd
    projection — map-only, zero shuffle, the cheapest possible full-pass
    gate; a real model swap changes only the literal vector (or, for a
    text-embedding classifier, moves scoring into the v-family Arrow
    kernels). Float caveat: ``exp`` must agree across engines (same
    1-ulp risk class as t10's ``ln``, which has held green since r3);
    scores rounded to 6dp on both sides, addition order mirrored
    exactly."""
    d = _docs(spark, sf_dir)
    f = quality_features("text")
    z = (
        F.lit(QC_WEIGHTS["bias"])
        + QC_WEIGHTS["n_tokens"] * f["n_tokens"]
        + QC_WEIGHTS["distinct_ratio"] * f["distinct_ratio"]
        + QC_WEIGHTS["stopword_ratio"] * f["stopword_ratio"]
        + QC_WEIGHTS["mean_token_len"] * f["mean_token_len"]
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return d.select(
        "doc_id",
        score.alias("quality_score"),
        (score >= 0.5).alias("keep"),
    )


def q_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level term frequency, top-10 with deterministic tiebreak —
    explode + count, the wordcount shape (partial aggregation collapses
    per-partition counts before the shuffle)."""
    d = _docs(spark, sf_dir)
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(10)
    )


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data curation chain: quality gate (>=20
    tokens) -> exact-dup removal (fingerprint, keep lowest doc_id) ->
    fuzzy dedup (drop the higher id of any pair with jaccard >= 0.8
    among survivors). Returns surviving doc_ids.

    Each stage is the operator tested standalone (t3 fingerprints, dd4
    LSH pairs); this query pins their composition."""
    from ..operators.dedup import dedup_keep_first, minhash_lsh_pairs

    d = _docs(spark, sf_dir)
    quality = d.filter(F.array_size(F.split("text", " ")) >= 20).select("doc_id", "text")
    fp = quality.withColumn("fp", poly_fingerprint(tokens("text")))
    # persist: feeds both the LSH pair generation and the final anti-join
    # (released by the per-query clearCache in the driver/bench loops)
    exact_kept = scoped_persist(
        dedup_keep_first(fp, ["fp"], ["doc_id"]).select("doc_id", "text")
    )
    pairs = minhash_lsh_pairs(exact_kept, threshold=0.8)
    dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return exact_kept.join(dropped, "doc_id", "left_anti").select("doc_id")


def q_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN (label-centroid quantizer) made hash-certifiable —
    the v4 exhaustive reshape: ``probe_all=True`` probes every cell, so
    the candidate set is provably the whole corpus and the result equals
    brute force through the full IVF machinery (centroid build, cell
    assignment, probe join, in-cell scoring, local top-k). Two verdicts
    ride along, asserted literally TRUE by the oracle:
    ``ivf_matches_exact`` (probe-all IVF ≡ knn_bruteforce, bit-equal
    cosine + same neighbor at every rank) and ``nprobe1_admissible``
    (the default single-cell probe's rank-r score never exceeds the
    exact rank-r score — candidate subsets are rank-dominated). The
    booleans are robust to centroid float jitter: exhaustive coverage
    and rank domination hold for ANY cell assignment."""
    from ..operators.similarity import ivf_ann, knn_bruteforce

    e = _embs(spark, sf_dir)
    qs = e.filter(F.col("vec_id") < 3)
    exact = knn_bruteforce(e, qs, k=5).select(
        "query_id",
        "rnk",
        F.col("neighbor_id").alias("bf_neighbor"),
        F.col("cosine").alias("bf_cosine"),
    )
    exhaustive = ivf_ann(e, qs, k=5, probe_all=True)
    approx = ivf_ann(e, qs, k=5).select(
        "query_id", "rnk", F.col("cosine").alias("approx_cosine")
    )
    return (
        exhaustive.join(F.broadcast(exact), ["query_id", "rnk"])
        # left join: a single-cell probe may return fewer than k rows
        .join(F.broadcast(approx), ["query_id", "rnk"], "left")
        .select(
            "query_id",
            "rnk",
            "neighbor_id",
            "cosine",
            (
                (F.col("neighbor_id") == F.col("bf_neighbor"))
                & (F.col("cosine") == F.col("bf_cosine"))
            ).alias("ivf_matches_exact"),
            F.coalesce(
                F.col("approx_cosine") <= F.col("bf_cosine"), F.lit(True)
            ).alias("nprobe1_admissible"),
        )
    )


QUERIES.update(
    {
        "t5_token_counts": q_token_counts,
        "t6_top_tokens": q_top_tokens,
        "dd6_corpus_curation": q_corpus_curation,
        "v5_ivf_ann": q_ivf_ann,
        "v9_embedding_decontam": q_embedding_decontam,
    }
)

_FP_SQL = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    f"list_transform(string_split(text, ' '), tok -> CAST({_TV.format(v='tok')} AS BIGINT))), "
    f"(acc, x) -> (acc * {POLY_BASE} + x) % {POLY_MOD})"
)

ORACLES.update(
    {
        "t5_token_counts": """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+')) AS INTEGER) AS regex_tokens,
       (n_chars = length(text)) AS chars_match
FROM documents""",
        "t6_top_tokens": """
SELECT token, count(*) AS n FROM (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token ORDER BY n DESC, token LIMIT 10""",
        "dd6_corpus_curation": f"""
WITH quality AS (
  SELECT doc_id, text FROM documents WHERE len(string_split(text, ' ')) >= 20),
fp AS (SELECT doc_id, text, {_FP_SQL} AS fp FROM quality),
exact_kept AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM fp) WHERE rn = 1),
toks2 AS (SELECT doc_id, string_split(text, ' ') AS t FROM exact_kept),
sh2 AS (
  SELECT doc_id, list_distinct(
    CASE WHEN len(t) >= 3 THEN
      list_transform(range(len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
    ELSE [] END) AS shingle
  FROM toks2),
dropped AS (
  SELECT DISTINCT b.doc_id FROM sh2 a JOIN sh2 b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.shingle, b.shingle)) * 1.0
          / (len(a.shingle) + len(b.shingle) - len(list_intersect(a.shingle, b.shingle))) >= 0.8)
SELECT doc_id FROM exact_kept WHERE doc_id NOT IN (SELECT doc_id FROM dropped)""",
        # v5/v7: the v4 exhaustive pattern — probe-all IVF ≡ brute force
        # regardless of the quantizer (every corpus vector lives in
        # exactly one cell), so the oracle is the brute-force top-k with
        # the in-engine verdict booleans asserted literally TRUE; the
        # quantizer (label centroids / iterative k-means) never needs a
        # SQL twin. A hash mismatch on a boolean means the IVF machinery
        # broke exhaustive equivalence or rank admissibility.
        "v5_ivf_ann": f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         {_DOT.format(a='qv', b='cv')}
           / (sqrt({_DOT.format(a='qv', b='qv')}) * sqrt({_DOT.format(a='cv', b='cv')})) AS cosine
  FROM c CROSS JOIN q WHERE neighbor_id <> query_id)
SELECT query_id, rnk, neighbor_id, cosine,
       TRUE AS ivf_matches_exact, TRUE AS nprobe1_admissible
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rnk
  FROM scored) WHERE rnk <= 5""",
        "v7_ivf_trained": f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         {_DOT.format(a='qv', b='cv')}
           / (sqrt({_DOT.format(a='qv', b='qv')}) * sqrt({_DOT.format(a='cv', b='cv')})) AS cosine
  FROM c CROSS JOIN q WHERE neighbor_id <> query_id)
SELECT query_id, rnk, neighbor_id, cosine,
       TRUE AS ivf_matches_exact, TRUE AS probe2_admissible
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rnk
  FROM scored) WHERE rnk <= 5""",
    }
)


def q_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (semantic dedup) on the BLOCKED
    default path: RHP-bucket candidates (4 planes, multi-probe radius 2
    at this threshold) + exact in-block cosine. Threshold 0.45 sits just
    under this corpus's max pairwise cosine so the operator has
    non-trivial output; at 0.45 every qualifying pair's signatures
    differ by <=2 bits (measured, deterministic hashes), so blocked ==
    exact here and the exhaustive SQL oracle still hash-matches.
    Production dedup runs at >=0.9 (16 planes, radius 1, near-lossless);
    ``exact=True`` is the quadratic escape hatch for low thresholds."""
    from ..operators.similarity import embedding_dedup_pairs

    return embedding_dedup_pairs(_embs(spark, sf_dir), threshold=0.45)


QUERIES["v6_embedding_dedup"] = q_embedding_dedup
ORACLES["v6_embedding_dedup"] = f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings),
n AS (SELECT vec_id, embedding, sqrt({_DOT.format(a='embedding', b='embedding')}) AS nrm FROM e)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {_DOT.format(a='a.embedding', b='b.embedding')} / (a.nrm * b.nrm) AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE {_DOT.format(a='a.embedding', b='b.embedding')} / (a.nrm * b.nrm) >= 0.45"""


def q_semantic_dedup(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.45,
    verify_kernel: str = "hof",
    n_planes: int | str | None = None,
    signature_kernel: str = "hof",
) -> DataFrame:
    """v10: SEMANTIC dedup keep-list (SemDeDup shape) — the
    embedding-space analogue of dd10's cluster curation: v6's
    RHP-blocked cosine pairs (threshold 0.45, blocked ≡ exact at this
    config — measured, see v6) feed the dd8 connected-components kernel,
    and the decision is keep = vec_id == cluster minimum; singletons
    keep themselves. Where dd10 drops near-dup TEXT (shared shingles),
    this drops near-dup MEANING (paraphrases sharing no n-grams) — the
    two compose: run dd10 first (cheap), v10 on the survivors. Scale
    shape: candidate pairs are RHP-bucketed (never all-pairs), CC is
    O(log diameter) pointer-jumping, and the final keep-list join is on
    the slim (vec_id, cluster_id) frame. Oracle: exhaustive pair list +
    recursive-CTE closure (the dd8 pattern).

    THRESHOLD IS THE SCALE KNOB: 0.45 (this fixture's interesting band)
    maps to 4 planes / radius 2 — probing 11 of 16 buckets, a
    certification-scale config that goes near-quadratic on large
    corpora (measured: >9 min at 50 k vectors with 10-way replica
    clusters). Production semantic dedup runs >=0.9 (SemDeDup's regime:
    copies and true paraphrases), which maps to 16 planes / radius 1 —
    the config benched as ``v10_prod`` at 10x."""
    from ..operators.dedup import connected_components
    from ..operators.similarity import embedding_dedup_pairs

    e = _embs(spark, sf_dir)
    pairs = embedding_dedup_pairs(
        e,
        threshold=threshold,
        verify_kernel=verify_kernel,
        n_planes=n_planes,
        signature_kernel=signature_kernel,
    )
    cc = connected_components(pairs).select(
        F.col("id").alias("vec_id"), "cluster_id"
    )
    return (
        e.select("vec_id")
        .join(cc, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("cluster_id", F.col("vec_id")).alias("cluster_id"),
            (F.coalesce("cluster_id", F.col("vec_id")) == F.col("vec_id")).alias(
                "keep"
            ),
        )
    )


QUERIES["v10_semantic_dedup"] = q_semantic_dedup
BENCH_ONLY["v10_prod"] = lambda spark, sf_dir: q_semantic_dedup(
    spark, sf_dir, threshold=0.92, n_planes="auto", signature_kernel="arrow"
)
ORACLES["v10_semantic_dedup"] = f"""
WITH RECURSIVE
n AS (SELECT vec_id, embedding, sqrt({_DOT.format(a='embedding', b='embedding')}) AS nrm
      FROM embeddings),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM n a JOIN n b ON a.vec_id < b.vec_id
  WHERE {_DOT.format(a='a.embedding', b='b.embedding')} / (a.nrm * b.nrm) >= 0.45),
e AS (SELECT id_a AS src, id_b AS dst FROM p UNION SELECT id_b, id_a FROM p),
reach AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src WHERE e.dst <> r.src),
cl AS (SELECT src AS vec_id, least(src, min(dst)) AS cluster_id FROM reach GROUP BY src)
SELECT em.vec_id, coalesce(cl.cluster_id, em.vec_id) AS cluster_id,
       coalesce(cl.cluster_id, em.vec_id) = em.vec_id AS keep
FROM embeddings em LEFT JOIN cl USING (vec_id)"""


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash hamming-ball near-dup pairs (<=3 differing sketch bits)
    via banded pigeonhole bucketing — candidates are a (band, band-bits)
    equi-join, never all-pairs; the oracle is the exhaustive xor +
    bit_count scan, which agrees because the pigeonhole guarantee is
    exact (not probabilistic) for hamming <= bands - 1."""
    return simhash_pairs(_docs(spark, sf_dir), max_hamming=3)


QUERIES["dd7_simhash_pairs"] = q_simhash_pairs
_SIMHASH_REDUCE = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(32), "
    f"b -> CASE WHEN {_SIMHASH_PER_BIT} > 0 THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)), "
    "(acc, x) -> acc + x)"
)
ORACLES["dd7_simhash_pairs"] = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (SELECT doc_id, {_SIMHASH_REDUCE} AS sh FROM t)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= 3"""


def q_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a k-means-TRAINED coarse quantizer (8 cells, 3 Lloyd
    iterations) — the production upgrade of v5's label cells, made
    hash-certifiable the same way (v4 exhaustive reshape): the oracle
    never reproduces the iterative fit; it asserts the brute-force top-k
    plus literal-true verdicts that hold for ANY trained model —
    ``ivf_matches_exact`` (n_probes = n_cells ⇒ candidate set = whole
    corpus ⇒ bit-equal to knn_bruteforce) and ``probe2_admissible``
    (the production nprobe=2 path's rank-r score never exceeds the
    exact rank-r score). The model is fit ONCE and shared by both
    probe configurations. pytest additionally pins inertia
    monotonicity and recall@5 floors."""
    from ..operators.similarity import ivf_ann_trained, kmeans_fit, knn_bruteforce

    e = _embs(spark, sf_dir)
    qs = e.filter(F.col("vec_id") < 3)
    model, _ = kmeans_fit(e, k=8, n_iters=3)
    exact = knn_bruteforce(e, qs, k=5).select(
        "query_id",
        "rnk",
        F.col("neighbor_id").alias("bf_neighbor"),
        F.col("cosine").alias("bf_cosine"),
    )
    exhaustive = ivf_ann_trained(
        e, qs, k=5, n_cells=8, n_probes=8, centroids=model
    )
    approx = ivf_ann_trained(
        e, qs, k=5, n_cells=8, n_probes=2, centroids=model
    ).select("query_id", "rnk", F.col("cosine").alias("approx_cosine"))
    return (
        exhaustive.join(F.broadcast(exact), ["query_id", "rnk"])
        .join(F.broadcast(approx), ["query_id", "rnk"], "left")
        .select(
            "query_id",
            "rnk",
            "neighbor_id",
            "cosine",
            (
                (F.col("neighbor_id") == F.col("bf_neighbor"))
                & (F.col("cosine") == F.col("bf_cosine"))
            ).alias("ivf_matches_exact"),
            F.coalesce(
                F.col("approx_cosine") <= F.col("bf_cosine"), F.lit(True)
            ).alias("probe2_admissible"),
        )
    )


QUERIES["v7_ivf_trained"] = q_ivf_trained
# v7 oracle: brute-force top-k + literal-true verdicts (defined with the
# v5 oracle in the ORACLES.update above — neither reproduces the quantizer)


#: composed quality gate: (rule name, drop predicate) in first-match
#: order — the Gopher/C4-style rule bank over the t2 feature set.
#: Thresholds sit inside the fixture's feature distributions so every
#: rule fires (75 / 99 / 15 drops, 311 keepers at sf0.01).
#: shared quality-gate thresholds (t7 rule bank = x7/x9 keep-predicate):
#: single source of truth so the gate and every downstream composition
#: (and their oracles) cannot drift apart
GATE_MIN_TOKENS = 25
GATE_MIN_DISTINCT_RATIO = 0.35


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality gate with per-document drop reason: first matching
    rule wins (same first-match contract as the taxi anomaly bank P6) —
    too_short (<25 tokens), low_diversity (distinct ratio <0.35),
    no_stopwords (stopword share = 0). Pure row-wise Catalyst
    expressions; the filter composes with dedup in a curation chain the
    way q_corpus_curation composes its stages."""
    d = _docs(spark, sf_dir)
    feats = quality_features("text")
    n, div, stop = feats["n_tokens"], feats["distinct_ratio"], feats["stopword_ratio"]
    reason = (
        F.when(n < GATE_MIN_TOKENS, "too_short")
        .when(div < GATE_MIN_DISTINCT_RATIO, "low_diversity")
        .when(stop <= 0, "no_stopwords")
    )
    return d.select(
        "doc_id", reason.isNull().alias("keep"), reason.alias("drop_reason")
    )


QUERIES["t7_quality_filter"] = q_quality_filter
ORACLES["t7_quality_filter"] = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
r AS (SELECT doc_id,
        CASE WHEN len(toks) < {GATE_MIN_TOKENS} THEN 'too_short'
             WHEN len(list_distinct(toks)) * 1.0 / len(toks) < {GATE_MIN_DISTINCT_RATIO} THEN 'low_diversity'
             WHEN len(list_filter(toks, x -> x IN ('the', 'a'))) * 1.0 / len(toks) <= 0 THEN 'no_stopwords'
        END AS drop_reason
      FROM t)
SELECT doc_id, drop_reason IS NULL AS keep, drop_reason FROM r"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: for every training document
    (source <> 'src0'), the fraction of its distinct 3-gram shingles that
    appear anywhere in the held-out eval slice (source = 'src0');
    contaminated when >= 10% overlap — the n-gram-collision
    decontamination pass every LLM data pipeline runs before training.

    Scale shape: the eval shingle set is DISTINCT'd then broadcast (eval
    benchmarks are tiny next to the corpus); training shingles stream
    through an explode -> broadcast-semi-join -> per-doc count — one
    narrow pass over the corpus plus a k·|docs|-row aggregation, never a
    doc×doc join. Zero-hit documents survive via the left join with the
    doc spine (explode would silently drop them)."""
    d = _docs(spark, sf_dir)
    sh = with_shingles(d.select("doc_id", "source", "text"))
    eval_sh = (
        sh.filter(F.col("source") == "src0")
        .select(F.explode("shingle").alias("sh"))
        .distinct()
    )
    train = sh.filter(F.col("source") != "src0").select(
        "doc_id", F.array_size("shingle").alias("n_sh"), "shingle"
    )
    hits = (
        train.select("doc_id", F.explode("shingle").alias("sh"))
        .join(F.broadcast(eval_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    score = F.when(
        F.col("n_sh") > 0, F.col("n_hit") / F.col("n_sh")
    ).otherwise(F.lit(0.0))
    return (
        train.select("doc_id", "n_sh")
        .join(hits, "doc_id", "left")
        .withColumn("n_hit", F.coalesce("n_hit", F.lit(0)))
        .withColumn("overlap", score)
        .select(
            "doc_id", "n_hit", "overlap", (F.col("overlap") >= 0.1).alias("contaminated")
        )
    )


QUERIES["t8_decontaminate"] = q_decontaminate
ORACLES["t8_decontaminate"] = f"""
WITH {_SHINGLES_CTE},
s AS (SELECT sh.doc_id, d.source, sh.shingle FROM sh JOIN documents d ON sh.doc_id = d.doc_id),
ev AS (SELECT DISTINCT unnest(shingle) AS s FROM s WHERE source = 'src0'),
train AS (SELECT doc_id, len(shingle) AS n_sh, shingle FROM s WHERE source <> 'src0'),
tr AS (SELECT doc_id, unnest(shingle) AS s FROM train),
hits AS (SELECT doc_id, count(*) AS n_hit FROM tr WHERE s IN (SELECT s FROM ev) GROUP BY doc_id)
SELECT t.doc_id, coalesce(h.n_hit, 0) AS n_hit,
       CASE WHEN t.n_sh > 0 THEN coalesce(h.n_hit, 0) * 1.0 / t.n_sh ELSE 0.0 END AS overlap,
       CASE WHEN t.n_sh > 0 THEN coalesce(h.n_hit, 0) * 1.0 / t.n_sh ELSE 0.0 END >= 0.1 AS contaminated
FROM train t LEFT JOIN hits h ON t.doc_id = h.doc_id"""


def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t15: BLOOM-FILTER decontamination — t8's production form at
    benchmark-suite scale. t8 broadcasts the eval set's distinct shingle
    STRINGS and semi-joins; real decontamination suites (every n-gram of
    every published benchmark) reach tens of millions of strings — a
    multi-GB broadcast hash table. Here the eval membership set is
    compressed into an m-bit Bloom filter and the probe is a map-side
    bit test folded into whole-stage codegen: no join, no string
    broadcast, no shuffle before the per-doc count. The one-sided error
    over-removes (flags a clean doc), never under-removes — the safe
    direction for decontamination, which is why this is the standard
    100 TB shape.

    Certification runs BOTH legs and emits per-doc exact and bloom
    decisions plus ``superset_ok`` (bloom_hits >= exact_hits — the Bloom
    no-false-negative guarantee) asserted row by row; the oracle
    reproduces every bit decision because the base hash is the portable
    polynomial token fold and the k probe positions are affine maps of
    it (operators/bloom.py). ``t15_prod`` (BENCH_ONLY) times the
    bloom-only leg."""
    from ..operators import bloom

    d = _docs(spark, sf_dir)
    # shingled once, persisted: ev's build, the dual-leg probe, and the
    # spine join all read the cached table instead of re-tokenizing the
    # corpus per branch
    sh = scoped_persist(with_shingles(d.select("doc_id", "source", "text")))
    # the cert leg's exact semi-join REQUIRES the distinct (duplicate
    # eval shingles would multiply n_hit); the bitmap build is
    # duplicate-insensitive either way. The prod/x14 builds skip the
    # distinct shuffle entirely.
    ev = (
        sh.filter(F.col("source") == "src0")
        .select(F.explode("shingle").alias("sh"))
        .distinct()
    )
    words = bloom.bloom_build_agg(ev, "sh")
    train = sh.filter(F.col("source") != "src0").select(
        "doc_id", F.array_size("shingle").alias("n_sh"), "shingle"
    )
    # cert-only FUSED probe: bloom bit test and exact semi-join in ONE
    # exploded pass + one agg (the bloom-only surfaces share
    # bloom.doc_hit_counts instead — this block exists because the
    # certification needs both legs per shingle)
    ex = (
        train.select("doc_id", F.explode("shingle").alias("sg"))
        .withColumn("H", bloom.shingle_hash("sg"))
        .withColumn(
            "bloom_hit", bloom.bloom_member_expr(F.col("H"), words).cast("int")
        )
        .join(
            F.broadcast(ev.withColumn("exact_hit", F.lit(1))),
            F.col("sg") == F.col("sh"),
            "left",
        )
        .groupBy("doc_id")
        .agg(
            F.sum("bloom_hit").alias("n_bloom_hit"),
            F.sum(F.coalesce("exact_hit", F.lit(0))).alias("n_hit"),
        )
    )
    ratio = lambda n: F.when(  # noqa: E731
        F.col("n_sh") > 0, F.col(n) / F.col("n_sh")
    ).otherwise(F.lit(0.0))
    return (
        train.select("doc_id", "n_sh")
        .join(ex, "doc_id", "left")
        .withColumn("n_hit", F.coalesce("n_hit", F.lit(0)))
        .withColumn("n_bloom_hit", F.coalesce("n_bloom_hit", F.lit(0)))
        .select(
            "doc_id",
            "n_hit",
            "n_bloom_hit",
            (ratio("n_hit") >= 0.1).alias("contaminated"),
            (ratio("n_bloom_hit") >= 0.1).alias("bloom_contaminated"),
            (F.col("n_bloom_hit") >= F.col("n_hit")).alias("superset_ok"),
        )
    )


def q_bloom_decontaminate_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t15_prod: the bloom-only leg — build the bitset from the eval
    slice, probe the corpus map-side, per-doc contamination verdicts.
    No exact join anywhere (that leg exists only to certify)."""
    from ..operators import bloom

    d = _docs(spark, sf_dir)
    # shingled once, persisted: the eval slice, the probe, and the spine
    # all read the cached table (unpersisted, Spark re-tokenizes the
    # corpus per branch — the same boundary x14 materializes)
    sh = scoped_persist(with_shingles(d.select("doc_id", "source", "text")))
    ev = (
        sh.filter(F.col("source") == "src0")
        .select(F.explode("shingle").alias("sh"))
        # no distinct: bitmap OR is idempotent, and skipping the
        # dedup shuffle halves the build (measured 4.1 -> 1.9 s cold)
    )
    words = bloom.bloom_build_agg(ev, "sh")
    train = sh.filter(F.col("source") != "src0").select(
        "doc_id", F.array_size("shingle").alias("n_sh"), "shingle"
    )
    hits = bloom.doc_hit_counts(train, words)
    return (
        train.select("doc_id", "n_sh")
        .join(hits, "doc_id", "left")
        .withColumn("n_bloom_hit", F.coalesce("n_bloom_hit", F.lit(0)))
        .select(
            "doc_id",
            "n_bloom_hit",
            (
                F.when(F.col("n_sh") > 0, F.col("n_bloom_hit") / F.col("n_sh"))
                .otherwise(F.lit(0.0))
                >= 0.1
            ).alias("bloom_contaminated"),
        )
    )


QUERIES["t15_bloom_decontaminate"] = q_bloom_decontaminate

from ..operators.bloom import BLOOM_M_BITS as _BLOOM_M  # noqa: E402
from ..operators.bloom import BLOOM_PARAMS as _BLOOM_PARAMS  # noqa: E402

#: DuckDB twin of operators/bloom.py's base hash: polynomial token fold
#: of the shingle string (same fold t3's fingerprint oracle uses).
_H_SQL = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split({v}, ' '), tok -> CAST("
    + _TV.format(v="tok")
    + f" AS BIGINT))), (acc, x) -> (acc * {POLY_BASE} + x) % {POLY_MOD})"
)

#: probe-position predicates generated from the SAME constants the Spark
#: side uses (operators/bloom.py) — the GATE_* pattern against drift.
_BLOOM_POS_UNION = "\n      UNION ".join(
    f"SELECT DISTINCT ({a}*H+{b}) % {_BLOOM_M} AS pos FROM evh"
    for a, b in _BLOOM_PARAMS
)
_BLOOM_ALL_SET = "\n                   AND ".join(
    f"({a}*H+{b}) % {_BLOOM_M} IN (SELECT pos FROM B)" for a, b in _BLOOM_PARAMS
)

ORACLES["t15_bloom_decontaminate"] = f"""
WITH {_SHINGLES_CTE},
s AS (SELECT sh.doc_id, d.source, sh.shingle FROM sh JOIN documents d ON sh.doc_id = d.doc_id),
ev AS (SELECT DISTINCT unnest(shingle) AS s FROM s WHERE source = 'src0'),
evh AS (SELECT {_H_SQL.format(v='s')} AS H FROM ev),
B AS ({_BLOOM_POS_UNION}),
train AS (SELECT doc_id, len(shingle) AS n_sh, shingle FROM s WHERE source <> 'src0'),
tr AS (SELECT doc_id, unnest(shingle) AS sg FROM train),
trh AS (SELECT doc_id, sg, {_H_SQL.format(v='sg')} AS H FROM tr),
hits AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN sg IN (SELECT s FROM ev) THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
         CAST(sum(CASE WHEN {_BLOOM_ALL_SET}
             THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hit
  FROM trh GROUP BY doc_id)
SELECT t.doc_id,
       coalesce(h.n_hit, 0) AS n_hit,
       coalesce(h.n_bloom_hit, 0) AS n_bloom_hit,
       CASE WHEN t.n_sh > 0 THEN coalesce(h.n_hit, 0) * 1.0 / t.n_sh ELSE 0.0 END >= 0.1 AS contaminated,
       CASE WHEN t.n_sh > 0 THEN coalesce(h.n_bloom_hit, 0) * 1.0 / t.n_sh ELSE 0.0 END >= 0.1 AS bloom_contaminated,
       coalesce(h.n_bloom_hit, 0) >= coalesce(h.n_hit, 0) AS superset_ok
FROM train t LEFT JOIN hits h ON t.doc_id = h.doc_id"""


BENCH_ONLY["t15_prod"] = q_bloom_decontaminate_prod


#: t16 config: BM25 query terms chosen for df contrast on the fixture
#: ('dup' is rare — df 25/500 at sf0.01 — the others common, so idf
#: genuinely orders the scores); Lucene-standard k1/b.
BM25_QUERY = ("dup", "data", "join")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 25


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t16: BM25 retrieval scoring — rank the corpus against a query
    (the relevance primitive behind retrieval-based curation: scoring
    training docs against eval questions, targeted-domain upsampling,
    and dedup-against-benchmark triage).

    Scale shape: because the query is a compile-time constant, term
    frequencies are per-row ``size(filter(tokens, = term))`` expressions
    — NO explode, NO per-term shuffle, no inverted index. Corpus stats
    (N, avgdl, each term's df) reduce in ONE aggregation pass to a
    single broadcast row; scoring is then a map-side expression and the
    result a TakeOrderedAndProject top-k. Two passes over the corpus
    total, both full-scan-parallel, shuffling only the stats row and
    the top-k. The term-contribution sum is a FIXED-ORDER three-column
    addition (not a float aggregation), so the score is bit-identical
    across engines and partitionings."""
    d = _docs(spark, sf_dir)
    toks = F.split("text", " ")

    def tf_of(term: str):
        # NB: a `lambda x, t=term:` default would make pyspark treat the
        # lambda as the binary (element, index) HOF form and bind the
        # INDEX to t — close over the term instead.
        return F.size(F.filter(toks, lambda x: x == F.lit(term))).cast("double")

    tf_cols = {t: tf_of(t) for t in BM25_QUERY}
    scored = d.select(
        "doc_id",
        F.array_size(toks).cast("double").alias("dl"),
        *[c.alias(f"tf_{t}") for t, c in tf_cols.items()],
    )
    stats = scored.agg(
        F.count(F.lit(1)).cast("double").alias("N"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("double")).alias(f"df_{t}")
            for t in BM25_QUERY
        ],
    )
    withstats = scored.crossJoin(F.broadcast(stats))

    def term_score(t: str):
        idf = F.log(
            (F.col("N") - F.col(f"df_{t}") + F.lit(0.5))
            / (F.col(f"df_{t}") + F.lit(0.5))
            + F.lit(1.0)
        )
        tf = F.col(f"tf_{t}")
        denom = tf + F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.col("avgdl")
        )
        return idf * tf * F.lit(BM25_K1 + 1.0) / denom

    total = term_score(BM25_QUERY[0])
    for t in BM25_QUERY[1:]:
        total = total + term_score(t)
    from pyspark.sql import Window

    # top-k via orderBy+limit => TakeOrderedAndProject (per-partition
    # partial top-k, no global sort task); the rank window then runs
    # over only the k survivors, not the corpus.
    top = (
        withstats.withColumn("bm25", F.round(total, 6))
        .filter(sum((F.col(f"tf_{t}") > 0).cast("int") for t in BM25_QUERY) > 0)
        .select("doc_id", "bm25")
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(BM25_TOP_K)
    )
    return top.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.col("bm25").desc(), F.col("doc_id"))),
    )


QUERIES["t16_bm25_topk"] = q_bm25_topk

_BM25_TF = "CAST(len(list_filter(toks, x -> x = '{t}')) AS DOUBLE)"
_BM25_TERM = (
    "(ln((N - df_{t} + 0.5) / (df_{t} + 0.5) + 1.0) * tf_{t} * {k1_1} "
    "/ (tf_{t} + {k1} * ({one_b} + {b} * dl / avgdl)))"
)
_BM25_SUM = " + ".join(
    _BM25_TERM.format(
        t=t,
        k1=BM25_K1,
        k1_1=BM25_K1 + 1.0,
        one_b=1.0 - BM25_B,
        b=BM25_B,
    )
    for t in BM25_QUERY
)
ORACLES["t16_bm25_topk"] = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sc AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
              {", ".join(f"{_BM25_TF.format(t=t)} AS tf_{t}" for t in BM25_QUERY)}
       FROM t),
st AS (SELECT CAST(count(*) AS DOUBLE) AS N, avg(dl) AS avgdl,
              {", ".join(f"sum(CASE WHEN tf_{t} > 0 THEN 1.0 ELSE 0.0 END) AS df_{t}" for t in BM25_QUERY)}
       FROM sc),
r AS (SELECT doc_id, round({_BM25_SUM}, 6) AS bm25
      FROM sc CROSS JOIN st
      WHERE {" + ".join(f"(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END)" for t in BM25_QUERY)} > 0)
SELECT doc_id, bm25,
       CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INTEGER) AS rnk
FROM r QUALIFY rnk <= {BM25_TOP_K}"""


#: per-language keep percentages for the domain-mixing sampler: the
#: fixture's 'en' slice is ~3x any other language, so the mix flattens
#: it — the standard training-mixture rebalancing move.
STRATA_PCT = {"en": 40, "de": 100, "es": 100, "fr": 100, "zh": 80}


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for domain mixing: each language
    stratum keeps a configured percentage, membership decided by a
    portable key hash (never RNG — re-runs, retries, and other engines
    agree on the exact member set, which training-data lineage requires).
    Strata missing from the mix map are dropped (null pct fails the
    comparison). Narrow per-row filter — no shuffle, no per-stratum
    scan."""
    d = _docs(spark, sf_dir)
    mix = F.create_map(
        *[F.lit(x) for kv in STRATA_PCT.items() for x in kv]
    )
    bucket = (F.col("doc_id") * F.lit(2654435761)) % F.lit(100)
    return d.filter(bucket < F.element_at(mix, F.col("lang"))).select(
        "doc_id", "lang", "source"
    )


QUERIES["x5_stratified_sample"] = q_stratified_sample

#: target corpus mixture by language (sums to 1.0) — the spec a training
#: run hands the pipeline; x8 turns it into per-stratum sampling rates
TARGET_MIX = {"en": 0.4, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15}


def water_fill_plan(counts: DataFrame, mix: dict[str, float]) -> DataFrame:
    """Water-filling mixture planner over a ``(lang, n_docs)`` frame:
    the LARGEST corpus achievable without upsampling any stratum
    (``max_corpus = min over strata of n_l / w_l``) plus each stratum's
    sampling rate / planned rows / achieved share. The binding stratum
    gets rate 1.0; everything else is downsampled so the mixture is
    exact. Cost shape: a broadcast 1-row min joined back to the stratum
    table — no data-sized shuffle for any corpus size or strata count.
    A stratum whose lang is NOT in ``mix`` gets target_share 0 and rate
    0 (excluded), not NULL: ``least(1.0, NULL * ...)`` would skip the
    NULL in both Spark and DuckDB and silently sample off-mix strata at
    full rate (ADVICE r6). Zero-share strata are filtered out of the
    min so the ANSI-mode plan never divides by zero. Property-fuzzed
    against a pure-Python reference (test_property_fuzz, including
    off-mix strata); hash-certified on the fixture via x8."""
    mix_col = F.create_map(*[F.lit(x) for k, v in mix.items() for x in (k, v)])
    counts = counts.withColumn(
        "target_share",
        F.coalesce(F.element_at(mix_col, F.col("lang")), F.lit(0.0)),
    )
    max_corpus = counts.filter(F.col("target_share") > 0).agg(
        F.min(F.col("n_docs") / F.col("target_share")).alias("max_corpus")
    )
    planned = (
        counts.crossJoin(F.broadcast(max_corpus))
        .withColumn("sample_rate", F.when(
            F.col("target_share") > 0,
            tie_safe_round(F.least(F.lit(1.0), F.col("target_share") * F.col("max_corpus") / F.col("n_docs")), 6),
        ).otherwise(F.lit(0.0)))
        .withColumn("planned_docs", F.floor(F.col("target_share") * F.col("max_corpus")))
    )
    from pyspark.sql import Window

    total = Window.partitionBy()  # |strata|-row frame: the plan table
    return planned.select(
        "lang",
        "n_docs",
        "target_share",
        tie_safe_round(F.col("max_corpus"), 6).alias("max_corpus"),
        "sample_rate",
        "planned_docs",
        tie_safe_round(
            F.col("planned_docs") / F.sum("planned_docs").over(total), 6
        ).alias("achieved_share"),
    )


def q_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture planner (the step UPSTREAM of x5's stratified
    sample): per-language counts fed to :func:`water_fill_plan` with
    the TARGET_MIX spec. All arithmetic is double with identical
    operation order in the oracle, so results hash-match bit-for-bit."""
    d = _docs(spark, sf_dir)
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    return water_fill_plan(counts, TARGET_MIX)


QUERIES["x8_mixture_plan"] = q_mixture_plan


def q_planned_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x9: the composed corpus-build sampler — quality gate (t7's rule
    bank) → water-fill mixture plan on the SURVIVING population (x8's
    math, recomputed post-gate: gating shifts the language balance, so
    planning on raw counts would miss the target mix) → deterministic
    hash sample at each stratum's PLANNED rate (x5's portable-hash
    membership with a runtime rate instead of a config constant).
    Returns the member set. Scale shape: the plan table is 5 rows
    broadcast into a map-side filter — the full pass over documents
    happens exactly once, gate and sample fused in one codegen stage."""
    d = _docs(spark, sf_dir)
    feats = quality_features("text")
    gated = d.filter(
        (feats["n_tokens"] >= GATE_MIN_TOKENS)
        & (feats["distinct_ratio"] >= GATE_MIN_DISTINCT_RATIO)
        & (feats["stopword_ratio"] > 0)
    ).select("doc_id", "lang")
    mix = F.create_map(*[F.lit(x) for k, v in TARGET_MIX.items() for x in (k, v)])
    counts = (
        gated.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        # off-mix langs: share 0 → rate 0 (excluded), never NULL → rate
        # 1.0 via NULL-skipping least (ADVICE r6); zero shares stay out
        # of the min so ANSI mode never divides by zero
        .withColumn(
            "target_share",
            F.coalesce(F.element_at(mix, F.col("lang")), F.lit(0.0)),
        )
    )
    max_corpus = counts.filter(F.col("target_share") > 0).agg(
        F.min(F.col("n_docs") / F.col("target_share")).alias("max_corpus")
    )
    rates = counts.crossJoin(F.broadcast(max_corpus)).select(
        "lang",
        F.when(
            F.col("target_share") > 0,
            F.least(
                F.lit(1.0),
                F.col("target_share") * F.col("max_corpus") / F.col("n_docs"),
            ),
        ).otherwise(F.lit(0.0)).alias("rate"),
    )
    bucket = (F.col("doc_id") * F.lit(2654435761)) % F.lit(100)
    return (
        gated.join(F.broadcast(rates), "lang")
        .filter(bucket < F.col("rate") * 100)
        .select("doc_id", "lang")
    )


QUERIES["x9_planned_sample"] = q_planned_sample

#: per-source document caps (web pipelines cap crawl domains so no single
#: domain dominates the mix); sources absent from the dict get DEFAULT.
#: Fixture sources hold 25 docs each at sf0.01 (250 at sf0.1), so src0's
#: cap binds at both scales, src1's never does, and the default binds
#: only at sf0.1 — all three quota regimes exercised.
SOURCE_QUOTA = {"src0": 10, "src1": 1_000_000}
SOURCE_QUOTA_DEFAULT = 60


def _quota_expr() -> F.Column:
    """quota(source): broadcast literal map with a default for unlisted
    domains — the per-row Column both quota paths share."""
    quota_map = F.create_map(
        *[F.lit(x) for kv in SOURCE_QUOTA.items() for x in kv]
    )
    return F.coalesce(
        F.element_at(quota_map, F.col("source")), F.lit(SOURCE_QUOTA_DEFAULT)
    )


def q_domain_quota(
    spark: SparkSession, sf_dir: str, skew_safe: bool = True
) -> DataFrame:
    """x10: per-domain quota cap — keep at most quota(source) documents
    per source (deterministic keep-first by doc_id), the domain-balance
    gate web corpora apply so one hot crawl domain cannot dominate
    training mix. Per-source quotas ride a broadcast map with a default
    for unlisted domains.

    Scale shape (VERDICT r7 item 1 closed): the DEFAULT path is the
    skew-safe production form — :func:`..operators.skew.
    capped_keep_first` counts each domain once (map-side partial agg),
    passes at-quota domains straight through map-side, and windows only
    over-quota domains in two salted phases whose per-task load is
    bounded by salt_buckets × quota regardless of corpus size. A crawl
    domain holding 40% of a 100 TB corpus therefore spreads over 32
    tasks instead of funneling into one. ``skew_safe=False`` keeps the
    plain single-window form for A/B (identical keep-set — pinned by
    pytest — and measured on a planted hot domain in SCALE10X.md)."""
    d = _docs(spark, sf_dir)
    slim = d.select("doc_id", "source")
    if skew_safe:
        from ..operators.skew import capped_keep_first

        return capped_keep_first(slim, "source", "doc_id", _quota_expr()).select(
            "doc_id", "source"
        )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("doc_id")
    return (
        slim.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _quota_expr())
        .select("doc_id", "source")
    )


QUERIES["x10_domain_quota"] = q_domain_quota
def q_curation_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x11: the ROUND-7 composed curation pipeline — the second
    end-to-end composition contract next to x7, chaining this round's
    new stages in production order: per-domain quota (x10) → heuristic
    rule gate (t7 constants) → MODEL quality gate (t14's classifier at
    0.5) → exact dedup keep-first on fingerprint (t3/dd1) → 256-token
    sequence packing per source shard (x6). Where x7 pins the
    decontamination arm, x11 pins the domain-balance + classifier arm —
    together the two compositions cover every curation stage boundary
    the engine ships. All stages are map-only or slim-window; the only
    corpus-wide shuffles are the quota/packing windows (partitioned by
    source) and the fingerprint dedup exchange."""
    from ..operators.dedup import dedup_keep_first
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    quota_keep = q_domain_quota(spark, sf_dir).select("doc_id")
    d1 = d.join(quota_keep, "doc_id")
    feats = quality_features("text")
    d2 = d1.filter(
        (feats["n_tokens"] >= GATE_MIN_TOKENS)
        & (feats["distinct_ratio"] >= GATE_MIN_DISTINCT_RATIO)
        & (feats["stopword_ratio"] > 0)
    )
    f = quality_features("text")
    z = (
        F.lit(QC_WEIGHTS["bias"])
        + QC_WEIGHTS["n_tokens"] * f["n_tokens"]
        + QC_WEIGHTS["distinct_ratio"] * f["distinct_ratio"]
        + QC_WEIGHTS["stopword_ratio"] * f["stopword_ratio"]
        + QC_WEIGHTS["mean_token_len"] * f["mean_token_len"]
    )
    d3 = d2.filter(F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6) >= 0.5)
    fp = d3.withColumn("fp", poly_fingerprint(tokens("text")))
    kept = dedup_keep_first(fp, ["fp"], ["doc_id"])
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        kept.select(
            "doc_id", "source", F.array_size(F.split("text", " ")).alias("n_tokens")
        )
        .withColumn(
            "start_offset",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint"),
        )
        .withColumn("bin_id", F.expr("start_offset div 256"))
    )


QUERIES["t14_quality_classifier"] = q_quality_classifier
QUERIES["x11_curation_pipeline_v2"] = q_curation_pipeline_v2
_QUOTA_CASE = (
    "coalesce(CASE source "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in SOURCE_QUOTA.items())
    + f" END, {SOURCE_QUOTA_DEFAULT})"
)
ORACLES["x11_curation_pipeline_v2"] = f"""
WITH q AS (
  SELECT doc_id, source, text FROM (
    SELECT doc_id, source, text,
           row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
    FROM documents)
  WHERE rn <= {_QUOTA_CASE}),
t AS (SELECT doc_id, source, text, string_split(text, ' ') AS toks FROM q),
f AS (SELECT doc_id, source, text, toks,
        CAST(len(toks) AS INTEGER) AS n_tokens,
        len(list_distinct(toks)) * 1.0 / len(toks) AS distinct_ratio,
        len(list_filter(toks, x -> x IN ('the', 'a'))) * 1.0 / len(toks) AS stopword_ratio,
        list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(toks, x -> CAST(length(x) AS BIGINT))), (a, x) -> a + x) * 1.0 / len(toks) AS mean_token_len
      FROM t),
g AS (SELECT * FROM f
      WHERE n_tokens >= {GATE_MIN_TOKENS}
        AND distinct_ratio >= {GATE_MIN_DISTINCT_RATIO}
        AND stopword_ratio > 0),
c AS (SELECT doc_id, source, text, toks, n_tokens FROM g
      WHERE round(1.0 / (1.0 + exp(-({QC_WEIGHTS['bias']} + {QC_WEIGHTS['n_tokens']} * n_tokens
          + {QC_WEIGHTS['distinct_ratio']} * distinct_ratio
          + {QC_WEIGHTS['stopword_ratio']} * stopword_ratio
          + {QC_WEIGHTS['mean_token_len']} * mean_token_len))), 6) >= 0.5),
fp AS (SELECT doc_id, source, n_tokens, {_FP_SQL} AS fp FROM c),
kept AS (
  SELECT doc_id, source, n_tokens FROM (
    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM fp)
  WHERE rn = 1)
SELECT doc_id, source, n_tokens,
       CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset,
       CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) // 256 AS bin_id
FROM kept"""
ORACLES["t14_quality_classifier"] = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
f AS (SELECT doc_id,
        CAST(len(toks) AS INTEGER) AS n_tokens,
        len(list_distinct(toks)) * 1.0 / len(toks) AS distinct_ratio,
        len(list_filter(toks, x -> x IN ('the', 'a'))) * 1.0 / len(toks) AS stopword_ratio,
        list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(toks, x -> CAST(length(x) AS BIGINT))), (a, x) -> a + x) * 1.0 / len(toks) AS mean_token_len
      FROM t),
z AS (SELECT doc_id,
        {QC_WEIGHTS['bias']} + {QC_WEIGHTS['n_tokens']} * n_tokens
          + {QC_WEIGHTS['distinct_ratio']} * distinct_ratio
          + {QC_WEIGHTS['stopword_ratio']} * stopword_ratio
          + {QC_WEIGHTS['mean_token_len']} * mean_token_len AS z
      FROM f)
SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 6) AS quality_score,
       round(1.0 / (1.0 + exp(-z)), 6) >= 0.5 AS keep
FROM z"""
ORACLES["x10_domain_quota"] = f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents)
WHERE rn <= {_QUOTA_CASE}"""
_MIX_CASE = "CASE lang " + " ".join(
    f"WHEN '{k}' THEN CAST({v} AS DOUBLE)" for k, v in TARGET_MIX.items()
) + " END"
ORACLES["x9_planned_sample"] = f"""
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
g AS (SELECT doc_id, lang FROM t
      WHERE len(toks) >= {GATE_MIN_TOKENS}
        AND len(list_distinct(toks)) * 1.0 / len(toks) >= {GATE_MIN_DISTINCT_RATIO}
        AND len(list_filter(toks, x -> x IN ('the', 'a'))) * 1.0 / len(toks) > 0),
c AS (SELECT lang, count(*) AS n_docs FROM g GROUP BY lang),
w AS (SELECT lang, n_docs, coalesce({_MIX_CASE}, 0.0) AS target_share FROM c),
m AS (SELECT min(n_docs / target_share) AS max_corpus FROM w WHERE target_share > 0),
r AS (SELECT lang, CASE WHEN target_share > 0
                        THEN least(1.0, target_share * max_corpus / n_docs)
                        ELSE 0.0 END AS rate
      FROM w CROSS JOIN m)
SELECT g.doc_id, g.lang FROM g JOIN r USING (lang)
WHERE (g.doc_id * 2654435761) % 100 < r.rate * 100"""
ORACLES["x8_mixture_plan"] = f"""
WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
w AS (SELECT lang, n_docs, coalesce({_MIX_CASE}, 0.0) AS target_share FROM c),
m AS (SELECT min(n_docs / target_share) AS max_corpus FROM w WHERE target_share > 0),
p AS (
  SELECT lang, n_docs, target_share, max_corpus,
         CASE WHEN target_share > 0
              THEN CAST(round(CAST(least(1.0, target_share * max_corpus / n_docs) AS DECIMAL(28,12)), 6) AS DOUBLE)
              ELSE 0.0 END AS sample_rate,
         CAST(floor(target_share * max_corpus) AS BIGINT) AS planned_docs
  FROM w CROSS JOIN m)
SELECT lang, n_docs, target_share, CAST(round(CAST(max_corpus AS DECIMAL(28,12)), 6) AS DOUBLE) AS max_corpus,
       sample_rate, planned_docs,
       CAST(round(CAST(planned_docs / sum(planned_docs) OVER () AS DECIMAL(28,12)), 6) AS DOUBLE) AS achieved_share
FROM p"""
_STRATA_CASE = "CASE lang " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in STRATA_PCT.items()
) + " END"
ORACLES["x5_stratified_sample"] = f"""
SELECT doc_id, lang, source FROM documents
WHERE (doc_id * 2654435761) % 100 < {_STRATA_CASE}"""


#: the round-8 samplers' portable priority hash: id → Knuth-multiplied
#: residue, decorrelated from insertion order, identical in both
#: engines. ONE definition generates the Column AND the oracle SQL
#: (the GATE_*/BLOOM_* anti-drift pattern) — x12/x13/x14 all draw from
#: here.
PRIO_MULT = 2654435761
PRIO_MOD = 1_000_003


def _prio(col: F.Column) -> F.Column:
    return (col * F.lit(PRIO_MULT)) % F.lit(PRIO_MOD)


_PRIO_SQL = f"({{v}} * {PRIO_MULT}) % {PRIO_MOD}"


#: x12 config: 4 portable hyperplanes → 16 locality cells (~31
#: vectors/cell at sf0.01, so the cap genuinely bites); keep the 10
#: lowest-priority-hash vectors per cell.
X12_PLANES = 4
X12_CELL_CAP = 10


def q_diversity_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x12: CLUSTER-BALANCED diversity sampling — cap every embedding-
    space locality cell's contribution so dense regions (boilerplate,
    templated text) can't dominate the curated set; the diversity-
    preserving counterpart of v10's SemDeDup (which removes near-dups,
    while this rebalances across the whole space — the DiverseSample /
    cluster-balanced-selection stage of modern curation stacks).

    Cell = portable random-hyperplane signature
    (:func:`..operators.similarity.rhp_cell_portable` — the LCG-weight
    variant, so the oracle reproduces each vector's cell exactly);
    per-cell cap enforced by the SKEW-SAFE quota kernel
    (:func:`..operators.skew.capped_keep_first`, x10's operator —
    count-once + map-side pass-through + salted two-phase window), with
    a decorrelated portable hash of vec_id as the keep priority so the
    sample inside a hot cell is unbiased w.r.t. insertion order.

    Scale shape: one narrow map computes cells (codegen'd fold, no
    Python), the quota kernel shuffles only over-cap cells' slim rows.
    At 100 TB with a trained quantizer, swap ``rhp_cell_portable`` for
    the v7 k-means assignment — the quota machinery is unchanged."""
    from ..operators.similarity import rhp_cell_portable
    from ..operators.skew import capped_keep_first

    e = _embs(spark, sf_dir)
    cells = e.select(
        "vec_id",
        rhp_cell_portable("embedding", n_planes=X12_PLANES).alias("cell"),
        _prio(F.col("vec_id")).alias("prio"),
    ).withColumn("__ord", F.struct("prio", "vec_id"))
    return capped_keep_first(
        cells, "cell", "__ord", F.lit(X12_CELL_CAP)
    ).select("vec_id", "cell", "prio")


QUERIES["x12_diversity_sample"] = q_diversity_sample

#: DuckDB twin of rhp_cell_portable: per-plane signed projection with the
#: same LCG ±1 weights and the same in-order fold (DuckDB arrays are
#: 1-based, hence embedding[j+1]).
_X12_PROJ = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(range(64), j -> CAST(embedding[j+1] AS DOUBLE) * "
    "(CASE WHEN (({p} * 64 + j) * 1103515245 + 12345) % 2147483648 < 1073741824 "
    "THEN 1.0 ELSE -1.0 END))), (a, x) -> a + x)"
)
_X12_CELL = " + ".join(
    f"(CASE WHEN {_X12_PROJ.format(p=p)} > 0 THEN {1 << p} ELSE 0 END)"
    for p in range(X12_PLANES)
)
ORACLES["x12_diversity_sample"] = f"""
WITH c AS (
  SELECT vec_id, CAST({_X12_CELL} AS BIGINT) AS cell,
         {_PRIO_SQL.format(v="vec_id")} AS prio
  FROM embeddings),
r AS (SELECT vec_id, cell, prio,
             row_number() OVER (PARTITION BY cell ORDER BY prio, vec_id) AS rn
      FROM c)
SELECT vec_id, cell, prio FROM r WHERE rn <= {X12_CELL_CAP}"""


#: x13 config: per-language sample size for the weighted (priority)
#: sampler; weight = token count, so long documents are favored
#: proportionally to their training-token contribution.
X13_PER_STRATUM = 30


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x13: WEIGHTED sampling without replacement, deterministic form —
    per language keep the ``X13_PER_STRATUM`` documents with the highest
    Duffield–Lund–Thorup priority ``w / u``, where w = token count (a
    doc's training-token contribution) and u ∈ (0,1) is a portable hash
    of doc_id standing in for the uniform draw. Inclusion probability
    is ∝ min(1, w/τ) — the weighted-reservoir semantics (the
    Efraimidis–Spirakis ``u^(1/w)`` key induces the same order) with
    ZERO transcendental functions: priority = w·K/h is one integer
    multiply and one IEEE-exact divide, so every engine ranks
    identically and re-runs/retries/backfills select the exact same
    docs — the lineage-stability property training pipelines need.

    Selection rides the skew-safe quota kernel (x10's
    ``capped_keep_first``): a stratum with 40% of the corpus spreads
    over the salted two-phase window instead of one task."""
    from ..operators.skew import capped_keep_first

    d = _docs(spark, sf_dir)
    t = d.select(
        "doc_id",
        "lang",
        F.array_size(F.split("text", " ")).cast("bigint").alias("w"),
        (_prio(F.col("doc_id")) + F.lit(1)).alias("h"),
    ).withColumn(
        "priority", F.col("w").cast("double") * F.lit(1000004.0) / F.col("h")
    )
    ranked = t.withColumn("__ord", F.struct((-F.col("priority")).alias("np"), "doc_id"))
    return capped_keep_first(
        ranked, "lang", "__ord", F.lit(X13_PER_STRATUM)
    ).select(
        "doc_id",
        "lang",
        "w",
        # SURVEY §8 integer-contract rule (round 17): priority is the
        # integer ratio (w·1000004)/h — the RANK runs on the raw IEEE
        # double (bit-identical across engines), the emitted contract
        # column is the exact ppm long.
        F.expr("(w * 1000004 * 1000000) div h").alias("priority_ppm"),
    )


QUERIES["x13_weighted_sample"] = q_weighted_sample
ORACLES["x13_weighted_sample"] = f"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
         {_PRIO_SQL.format(v="doc_id")} + 1 AS h
  FROM documents),
k AS (SELECT doc_id, lang, w, h, CAST(w AS DOUBLE) * 1000004.0 / h AS priority FROM t),
r AS (SELECT doc_id, lang, w, h, priority,
             row_number() OVER (PARTITION BY lang ORDER BY priority DESC, doc_id) AS rn
      FROM k)
SELECT doc_id, lang, w,
       (w * 1000004 * 1000000) // h AS priority_ppm
FROM r WHERE rn <= {X13_PER_STRATUM}"""


#: x15 config: shard count for the shuffle-shard layout (8 at fixture
#: scale; production sizes it so corpus/n_shards ≈ one data-loader
#: file, e.g. 1 M docs/shard at 1 B docs → 1 024 shards)
X15_SHARDS = 8


def q_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x15: deterministic SHUFFLE-AND-SHARD — the last layout stage
    before training: assign every document a pseudorandom rank (Knuth
    multiplicative hash of doc_id, the x2 portable recipe — no RNG
    state, reproducible on any engine), derive its shard from the rank,
    and its position within the shard from the rank order. Training
    data loaders then stream shards sequentially and get a globally
    shuffled corpus without ever materializing a global sort.

    Scale shape: ONE shuffle keyed on shard + a per-shard sort — at
    production scale this is exactly
    ``repartition(n_shards, shard).sortWithinPartitions(rank)`` + write
    (position becomes implicit file order); the query form emits the
    position explicitly via a window PARTITIONED BY SHARD (each shard
    sorts independently — n_shards parallel sort tasks, never a global
    order-by). Shard sizes concentrate at corpus/n_shards (multiplied
    hash ranks spread uniformly), so the per-shard sort is bounded by
    the shard-size choice, not the corpus. Ties cannot occur: rank is
    injective on doc_id below the 1000003 modulus at fixture scale, and
    doc_id breaks order ties beyond it."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    ranked = d.select(
        "doc_id",
        "lang",
        ((F.col("doc_id") % 1000003) * F.lit(2654435761)).alias("rank_key"),
    ).withColumn("shard", (F.col("rank_key") % X15_SHARDS).cast("int"))
    w = Window.partitionBy("shard").orderBy("rank_key", "doc_id")
    return ranked.withColumn("pos", F.row_number().over(w))


QUERIES["x15_shuffle_shard"] = q_shuffle_shard
ORACLES["x15_shuffle_shard"] = f"""
WITH t AS (
  SELECT doc_id, lang, (doc_id % 1000003) * 2654435761 AS rank_key
  FROM documents),
s AS (SELECT doc_id, lang, rank_key,
             CAST(rank_key % {X15_SHARDS} AS INTEGER) AS shard FROM t)
SELECT doc_id, lang, rank_key, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY rank_key, doc_id) AS INTEGER) AS pos
FROM s"""


def q_curation_pipeline_v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x16: the FINAL-MILE composition — what runs between a curated
    corpus and the training store, in production order:

    1. dd13 line dedup (boilerplate segments removed globally — BEFORE
       any quality gate, so the gate judges real content, not nav
       bars),
    2. t7's FULL rule bank on the CLEANED text (>= GATE_MIN_TOKENS
       tokens AND distinct-token ratio >= GATE_MIN_DISTINCT_RATIO,
       both recomputed post-cleaning — a doc that was all boilerplate,
       or whose unique remainder is repetition, dies here),
    3. x15 shuffle-and-shard of the survivors (deterministic
       pseudorandom rank → shard + position; the data-loader layout).

    Complements x7 (decontamination arm), x11 (domain balance +
    classifier), x14 (quota → bloom → sampling): none of the three
    cleans INSIDE documents or emits the final shard layout. Scale
    shape: a linear chain (no stage output is consumed twice, so no
    persist boundary is needed) — dd13's MIN agg + equi-join, a
    map-side filter, one shard shuffle with per-shard sorts."""
    from pyspark.sql import Window

    from ..operators.dedup import line_dedup

    cleaned = line_dedup(_docs(spark, sf_dir), seg_tokens=8)
    toks = F.split("clean_text", " ")
    gated = (
        cleaned.withColumn("n_clean_tokens", F.array_size(toks))
        .withColumn(
            "__distinct_ratio",
            F.array_size(F.array_distinct(toks)) / F.array_size(toks),
        )
        .filter(
            (F.col("n_clean_tokens") >= GATE_MIN_TOKENS)
            & (F.col("__distinct_ratio") >= GATE_MIN_DISTINCT_RATIO)
        )
    )
    ranked = gated.select(
        "doc_id",
        "n_clean_tokens",
        ((F.col("doc_id") % 1000003) * F.lit(2654435761)).alias("rank_key"),
    ).withColumn("shard", (F.col("rank_key") % X15_SHARDS).cast("int"))
    w = Window.partitionBy("shard").orderBy("rank_key", "doc_id")
    return ranked.select(
        "doc_id",
        "n_clean_tokens",
        "shard",
        F.row_number().over(w).alias("pos"),
    )


QUERIES["x16_curation_pipeline_v4"] = q_curation_pipeline_v4
ORACLES["x16_curation_pipeline_v4"] = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
ix AS (SELECT doc_id, tok,
              unnest(range(CAST(ceil(len(tok) / 8.0) AS BIGINT))) AS i
       FROM t),
segs AS (SELECT doc_id, CAST(i AS INTEGER) AS seg_idx,
                array_to_string(tok[i*8+1 : i*8+8], ' ') AS seg,
                doc_id * 1000000 + i AS occ_key
         FROM ix),
canon AS (SELECT seg, min(occ_key) AS canon_key FROM segs GROUP BY seg),
kept AS (SELECT doc_id, seg_idx, seg, occ_key = canon_key AS is_kept
         FROM segs JOIN canon USING (seg)),
agg AS (SELECT doc_id,
               coalesce(string_agg(CASE WHEN is_kept THEN seg END, ' ' ORDER BY seg_idx), '') AS clean_text
        FROM kept GROUP BY doc_id),
gated AS (
  SELECT doc_id,
         CAST(len(string_split(clean_text, ' ')) AS INTEGER) AS n_clean_tokens
  FROM agg
  WHERE len(string_split(clean_text, ' ')) >= {GATE_MIN_TOKENS}
    AND len(list_distinct(string_split(clean_text, ' '))) * 1.0
          / len(string_split(clean_text, ' ')) >= {GATE_MIN_DISTINCT_RATIO}),
s AS (SELECT doc_id, n_clean_tokens,
             (doc_id % 1000003) * 2654435761 AS rank_key,
             CAST(((doc_id % 1000003) * 2654435761) % {X15_SHARDS} AS INTEGER) AS shard
      FROM gated)
SELECT doc_id, n_clean_tokens, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY rank_key, doc_id) AS INTEGER) AS pos
FROM s"""


#: x17/x19 split configuration: cumulative ceil-cuts in exact integer
#: fractions (float fractions round differently across engines) —
#: train ≤ ceil(0.8n) < val ≤ ceil(0.9n) < test.
SPLIT_CUTS = ((8, 10), (9, 10))
SPLIT_LABELS = ("train", "val", "test")


def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x17: deterministic EXACT train/val/test split per language — the
    holdout-assignment stage every training pipeline runs between
    curation and the training store. Each stratum sends exactly
    ceil(0.8n)/ceil(0.9n)−ceil(0.8n)/rest docs (ordered by the x15
    portable pseudorandom rank, doc_id tie-break) to train/val/test, so
    the held-out fraction is exact even for tiny strata where a
    hash-threshold split's binomial error is material — and re-runs,
    retries, and backfills assign byte-identical splits on any engine.

    Scale shape (:mod:`..operators.split`): the naive exact form is a
    per-stratum global window — ONE reducer per language at 100 TB.
    The histogram-cut kernel instead takes one map-side-combinable
    (stratum, bucket) count (driver-bounded by the bucket-width
    configuration, the x8-planner pattern), locates each cut's boundary
    bucket driver-side, labels every non-boundary row MAP-SIDE, and
    windows only the ≤2 boundary buckets per stratum (~n/n_buckets rows
    each, skew-independent). Exact-equivalence to the plain window is
    pinned by tests/test_llmops.py; the oracle IS the plain window."""
    from ..operators.split import exact_proportional_split

    d = _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        ((F.col("doc_id") % PRIO_MOD) * F.lit(PRIO_MULT)).alias("rank_key"),
    )
    out = exact_proportional_split(
        d, "lang", "rank_key", "doc_id", cuts=SPLIT_CUTS, labels=SPLIT_LABELS
    )
    return out.select("doc_id", "lang", "split")


QUERIES["x17_split_assign"] = q_split_assign
ORACLES["x17_split_assign"] = f"""
WITH t AS (SELECT doc_id, lang, (doc_id % {PRIO_MOD}) * {PRIO_MULT} AS rank_key
           FROM documents),
r AS (SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY rank_key, doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM t)
SELECT doc_id, lang,
       CASE WHEN rn <= (8 * n + 9) // 10 THEN 'train'
            WHEN rn <= (9 * n + 9) // 10 THEN 'val'
            ELSE 'test' END AS split
FROM r"""


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x19: LEAKAGE-SAFE train/val/test split — the x17 assignment with
    near-duplicate atomicity: a document and its near-dups always land
    in the SAME split. A plain per-document split leaks held-out
    content into training whenever the corpus still carries fuzzy
    duplicates (the classic eval-contamination failure: a val document
    whose 0.9-Jaccard twin trained); splitting by CLUSTER closes it.

    Composition, all certified pieces: dd4's MinHash-LSH pairs at
    jaccard ≥ 0.8 → dd8's connected components → every doc labeled
    with its component id (singletons = own id) → the x17 exact-cut
    kernel assigns splits to CLUSTERS (one global stratum — the unit
    of exact proportion is the cluster, the only unit compatible with
    atomicity) → members inherit by an equi-join on cluster_id.

    Scale shape: an exact-dedup collapse runs FIRST (the dd12 lesson,
    applied here in round 13 after the 100× replica fixture filled
    local disk through this query's LSH pair spill): verbatim-identical
    texts group to their lowest-id representative (map-side-combinable
    MIN agg), LSH + CC run over REPRESENTATIVES only, and members
    inherit their representative's cluster through one equi-join.
    Output is IDENTICAL by construction — verbatim copies are
    Jaccard-1.0 near-dups, so the uncollapsed computation links them
    into the same component anyway, and the component's min-id label is
    unchanged because each representative is already its group's
    minimum. LSH pair generation is banded (dd4), CC is O(log diameter)
    rounds (dd8), the cluster table is one slim row per component, the
    split kernel windows only boundary buckets, and both inherit joins
    are plain shuffle equi-joins (no broadcast of a corpus-sized side).
    Oracle: the dd8 recursive-CTE closure extended with singleton
    labeling + the plain-window cut over clusters."""
    members = _near_dup_cluster_members(_docs(spark, sf_dir))
    assigned = _cluster_atomic_split(members)
    return members.join(
        assigned.select("cluster_id", "split"), "cluster_id"
    ).select("doc_id", "cluster_id", "split")


def _near_dup_cluster_members(d: DataFrame) -> DataFrame:
    """x19's cluster-labeling kernel, shared with x21b: (doc_id,
    cluster_id) where cluster_id is the min-id of the doc's near-dup
    connected component (jaccard ≥ 0.8, MinHash-LSH banded), singletons
    labeled by their own id. Collapse-first (the dd12/round-13 policy):
    verbatim-identical texts collapse to their lowest-id representative
    before LSH/CC, and members inherit through equi-joins."""
    from ..operators.dedup import connected_components, minhash_lsh_pairs

    reps = scoped_persist(
        d.select("doc_id", "text")
        .groupBy("text")
        .agg(F.min("doc_id").alias("rep_id"))
    )
    rep_docs = reps.select(F.col("rep_id").alias("doc_id"), "text")
    pairs = minhash_lsh_pairs(rep_docs, threshold=0.8)
    rep_labels = connected_components(pairs).select(
        F.col("id").alias("rep_id"), "cluster_id"
    )
    rep_members = (
        reps.select("rep_id")
        .join(rep_labels, "rep_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "rep_id"))
    )
    return (
        d.select("doc_id", "text")
        .join(reps, "text")
        .select("doc_id", "rep_id")
        .join(rep_members, "rep_id")
        .select("doc_id", "cluster_id")
    )


def _cluster_atomic_split(members: DataFrame) -> DataFrame:
    """Exact train/val/test cut over CLUSTERS (one global stratum — the
    only unit compatible with near-dup atomicity), x17's histogram-cut
    kernel on the slim (cluster_id) frame. Returns (cluster_id, split)."""
    from ..operators.split import exact_proportional_split

    clusters = (
        members.select("cluster_id")
        .distinct()
        .withColumn("rank_key", (F.col("cluster_id") % PRIO_MOD) * F.lit(PRIO_MULT))
        .withColumn("__stratum", F.lit(0))
    )
    return exact_proportional_split(
        clusters, "__stratum", "rank_key", "cluster_id",
        cuts=SPLIT_CUTS, labels=SPLIT_LABELS,
    )


QUERIES["x19_leakage_safe_split"] = q_leakage_safe_split
ORACLES["x19_leakage_safe_split"] = f"""
WITH RECURSIVE {_SHINGLES_CTE},
p AS ({_JACCARD_PAIRS.format(thr=0.8)}),
e AS (SELECT id_a AS src, id_b AS dst FROM p UNION SELECT id_b, id_a FROM p),
reach AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src WHERE e.dst <> r.src
),
lab AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id FROM reach GROUP BY src),
m AS (SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN lab l USING (doc_id)),
cl AS (SELECT DISTINCT cluster_id FROM m),
r AS (SELECT cluster_id,
             row_number() OVER (ORDER BY (cluster_id % {PRIO_MOD}) * {PRIO_MULT}, cluster_id) AS rn,
             count(*) OVER () AS n
      FROM cl),
s AS (SELECT cluster_id,
             CASE WHEN rn <= (8 * n + 9) // 10 THEN 'train'
                  WHEN rn <= (9 * n + 9) // 10 THEN 'val'
                  ELSE 'test' END AS split
      FROM r)
SELECT m.doc_id, m.cluster_id, s.split FROM m JOIN s USING (cluster_id)"""


#: t18 config: 32-token context windows advancing by 24 (8-token
#: overlap) — the RAG/embedding chunking shape, vs x4's back-to-back
#: 16-token segments.
T18_CHUNK = 32
T18_STRIDE = 24


def q_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t18: OVERLAPPING sliding-window chunking — the RAG/embedding
    ingestion form (fixed-size windows with overlap so no semantic
    boundary is lost at a cut), complementing x4's non-overlapping
    UDTF segmentation. A doc of n tokens yields
    ceil(max(n−CHUNK,0)/STRIDE)+1 chunks; chunk i covers tokens
    [i·STRIDE, i·STRIDE+CHUNK), the last one possibly short.

    Scale shape: pure map-side — split/sequence/explode/slice are all
    codegen'd expressions, no UDF, no shuffle; the explode fan-out is
    bounded by n/STRIDE per doc. Exactly the plan shape a 100 TB
    chunking pass wants: read → explode → write, partition-parallel
    end to end."""
    d = _docs(spark, sf_dir)
    d2 = (
        d.select("doc_id", F.split("text", " ").alias("tok"))
        .withColumn("n_tokens", F.array_size("tok"))
        .withColumn(
            "n_chunks",
            (
                (F.greatest(F.col("n_tokens") - T18_CHUNK, F.lit(0)) + (T18_STRIDE - 1))
                / T18_STRIDE
            ).cast("int")
            + 1,
        )
        .select(
            "doc_id",
            "tok",
            F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_id"),
        )
        .withColumn("start_token", (F.col("chunk_id") * T18_STRIDE).cast("int"))
        .withColumn(
            "chunk", F.slice("tok", F.col("start_token") + F.lit(1), F.lit(T18_CHUNK))
        )
    )
    return d2.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        "start_token",
        F.array_size("chunk").alias("n_chunk_tokens"),
        F.array_join("chunk", " ").alias("chunk_text"),
    )


QUERIES["t18_chunk_overlap"] = q_chunk_overlap
ORACLES["t18_chunk_overlap"] = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
n AS (SELECT doc_id, tok, len(tok) AS n_tokens FROM t),
c AS (SELECT doc_id, tok,
             unnest(range((greatest(n_tokens - {T18_CHUNK}, 0) + {T18_STRIDE - 1}) // {T18_STRIDE} + 1)) AS chunk_id
      FROM n)
SELECT doc_id,
       CAST(chunk_id AS INTEGER) AS chunk_id,
       CAST(chunk_id * {T18_STRIDE} AS INTEGER) AS start_token,
       CAST(len(tok[chunk_id * {T18_STRIDE} + 1 : chunk_id * {T18_STRIDE} + {T18_CHUNK}]) AS INTEGER) AS n_chunk_tokens,
       array_to_string(tok[chunk_id * {T18_STRIDE} + 1 : chunk_id * {T18_STRIDE} + {T18_CHUNK}], ' ') AS chunk_text
FROM c"""


# --------------------------------------------------------------------------
# Registry continuation (VERDICT r15 item 7): the single-file registry
# outgrew review (6,476 lines), so the later accretion waves live in
# llmops_mid.py / llmops_tail.py. They star-import THIS module and
# mutate the same QUERIES/ORACLES/BENCH_ONLY dicts, so importing
# plans.llmops (as every consumer does) registers all entries in the
# ORIGINAL chronological order — the driver window and full-sweep
# ordering are unchanged. The star re-imports expose the later parts'
# public names on this module, preserving the
# ``from plans.llmops import X`` surface; externally-used private
# helpers are re-exported explicitly.
from .llmops_mid import *  # noqa: E402,F401,F403
from .llmops_tail import *  # noqa: E402,F401,F403
from .llmops_mid import (  # noqa: E402,F401 - tests import these
    _sq_dequantized,
    _sq_scored_pairs,
)
from .llmops_tail import _snapshot_churn  # noqa: E402,F401 - tests import it
