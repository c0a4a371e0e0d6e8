"""LLM-ops registry, part 3 of 3 — the chronological continuation of
``plans/llmops.py`` (VERDICT r15 item 7: the single file outgrew
review at 6,476 lines). Import ``plans.llmops``, never this module
directly: it star-imports the core part mid-initialization, which is
only well-defined when ``plans.llmops`` drives the import order. The
parts mutate the SAME ``QUERIES``/``ORACLES``/``BENCH_ONLY`` dicts, so
registration order — and therefore the driver's 50-query window — is
byte-identical to the single-file layout.

Content: x26/x27 curation chains, v17-v19 index telemetry and retrieval,
dd16/dd17 snapshot ledgers, x28/x29 packing, t20-t23 text analysis,
x21/x23/x24/x25 export and DSIR.
"""

from __future__ import annotations

from .llmops import *  # noqa: F401,F403 - the shared registry + public helpers
from .llmops import (  # the private fragments/helpers this part composes
    _DOT,
    _JACCARD_PAIRS,
    _SHINGLES_CTE,
    _TV,
    _X12_CELL,
    _cluster_atomic_split,
    _docs,
    _embs,
    _near_dup_cluster_members,
)



#: x26 diversity cap: max gate-survivors kept per label (the x12
#: cell-balance idea at label granularity, deterministic exact form)
X26_CAP = 25


def q_embedding_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x26: the EMBEDDING-side curation chain — the composition the
    text pipelines (x11/x14/x16) have had since round 8, for the
    vector modality: (1) semantic near-dup collapse (v10's SemDeDup
    keep-list: RHP-blocked cosine pairs → connected components → keep
    cluster minimum), (2) the linear density gate on the SURVIVORS
    (v16's prototype-cosine kernel, exact cert form — centroids are
    computed on survivors, not the raw corpus, so a large dropped
    near-dup cluster cannot drag its label's prototype), (3) a
    per-label diversity cap keeping the X26_CAP LEAST prototypical
    survivors (the v15/Sorscher easy-example-pruning direction: after
    outliers are gone, the diverse tail adds the most information per
    training token). One row per ORIGINAL vector with full provenance:
    ``kept_dedup`` / ``density_score``+``pct``+``is_outlier`` (null for
    dedup-dropped rows) / ``rnk`` (null unless it survived the gate) /
    final ``kept``.

    Scale shape: stage-1 candidates are RHP-bucketed (never
    all-pairs; threshold 0.45 is the certification config — production
    runs ≥0.9 with n_planes="auto", benched as x26_prod), CC is
    O(log diameter) pointer jumping on slim pairs, the gate is one
    broadcast-centroid join, and the cap window partitions by label —
    no corpus-keyed window, no global sort outside the cert-only
    percent_rank."""
    from pyspark.sql import Window

    from ..operators.dedup import connected_components
    from ..operators.similarity import (
        embedding_dedup_pairs,
        prototype_density_outliers,
    )

    from ..operators import scoped_persist

    e = _embs(spark, sf_dir)
    pairs = embedding_dedup_pairs(e, threshold=0.45)
    cc = connected_components(pairs).select(F.col("id").alias("vec_id"), "cluster_id")
    # base and gate are each consumed twice (filter arm + provenance
    # arm); persist the boundaries so the CC join and the exact
    # centroid agg compute once (round-19 interleaved A/B at sf0.1:
    # median paired ratio 0.908 over 4 rounds, value-identical; the
    # v11 scoped_persist precedent — caller/bench owns cache cleanup)
    base = scoped_persist(
        e.select("vec_id", "label")
        .join(cc, "vec_id", "left")
        .select(
            "vec_id",
            "label",
            F.coalesce("cluster_id", F.col("vec_id")).alias("cluster_id"),
            (F.coalesce("cluster_id", F.col("vec_id")) == F.col("vec_id")).alias(
                "kept_dedup"
            ),
        )
    )
    surv = e.join(base.filter(F.col("kept_dedup")).select("vec_id"), "vec_id")
    gate = scoped_persist(
        prototype_density_outliers(surv, decile=0.1, exact=True).select(
            "vec_id",
            F.col("proto_cosine").alias("density_score"),
            "pct_ppm",
            "is_outlier",
        )
    )
    w = Window.partitionBy("label").orderBy(F.asc("density_score"), F.asc("vec_id"))
    ranked = (
        gate.filter(~F.col("is_outlier"))
        .join(e.select("vec_id", "label"), "vec_id")
        .withColumn("rnk", F.row_number().over(w))
        .select("vec_id", "rnk")
    )
    return (
        base.join(gate, "vec_id", "left")
        .join(ranked, "vec_id", "left")
        .select(
            "vec_id",
            "label",
            "cluster_id",
            "kept_dedup",
            "density_score",
            "pct_ppm",
            "is_outlier",
            "rnk",
            F.coalesce(
                F.col("kept_dedup")
                & ~F.col("is_outlier")
                & (F.col("rnk") <= X26_CAP),
                F.lit(False),
            ).alias("kept"),
        )
    )


QUERIES["x26_embedding_curation"] = q_embedding_curation
ORACLES["x26_embedding_curation"] = f"""
WITH RECURSIVE
n AS (SELECT vec_id, embedding, sqrt({_DOT.format(a='embedding', b='embedding')}) AS nrm
      FROM embeddings),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM n a JOIN n b ON a.vec_id < b.vec_id
  WHERE {_DOT.format(a='a.embedding', b='b.embedding')} / (a.nrm * b.nrm) >= 0.45),
ed AS (SELECT id_a AS src, id_b AS dst FROM p UNION SELECT id_b, id_a FROM p),
reach AS (
  SELECT src, dst FROM ed
  UNION
  SELECT r.src, ed.dst FROM reach r JOIN ed ON r.dst = ed.src WHERE ed.dst <> r.src),
cl AS (SELECT src AS vec_id, least(src, min(dst)) AS cluster_id FROM reach GROUP BY src),
base AS (
  SELECT em.vec_id, em.label,
         coalesce(cl.cluster_id, em.vec_id) AS cluster_id,
         coalesce(cl.cluster_id, em.vec_id) = em.vec_id AS kept_dedup
  FROM embeddings em LEFT JOIN cl USING (vec_id)),
surv AS (SELECT em.* FROM embeddings em JOIN base USING (vec_id) WHERE base.kept_dedup),
m AS (
  SELECT label, i AS pos,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list(CAST(embedding[i+1] AS DOUBLE) ORDER BY vec_id)), (a, x) -> a + x)
           / count(*) AS mean_val
  FROM surv CROSS JOIN range(64) r(i)
  GROUP BY label, i),
c AS (SELECT label, list(mean_val ORDER BY pos) AS centroid FROM m GROUP BY label),
s AS (SELECT sv.vec_id, sv.label,
        round({_DOT.format(a='embedding', b='centroid')}
          / (sqrt({_DOT.format(a='embedding', b='embedding')}) * sqrt({_DOT.format(a='centroid', b='centroid')})), 6) AS density_score
      FROM surv sv JOIN c USING (label)),
g AS (SELECT vec_id, label, density_score,
             CAST(rank() OVER (ORDER BY density_score) AS BIGINT) AS rk,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM s),
g2 AS (SELECT vec_id, label, density_score,
              CASE WHEN n > 1 THEN ((rk - 1) * 1000000) // (n - 1) ELSE 0 END AS pct_ppm,
              (rk - 1) * 10 <= (n - 1) AS is_outlier
       FROM g),
r AS (SELECT vec_id,
             CAST(row_number() OVER (PARTITION BY label ORDER BY density_score, vec_id) AS INTEGER) AS rnk
      FROM g2 WHERE NOT is_outlier)
SELECT b.vec_id, b.label, b.cluster_id, b.kept_dedup,
       g2.density_score, g2.pct_ppm,
       g2.is_outlier,
       r.rnk,
       coalesce(b.kept_dedup AND NOT g2.is_outlier AND r.rnk <= {X26_CAP}, FALSE) AS kept
FROM base b LEFT JOIN g2 USING (vec_id) LEFT JOIN r USING (vec_id)"""


def q_embedding_curation_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x26_prod: the production config of the embedding curation chain
    — SemDeDup regime threshold (0.92: copies and true paraphrases),
    corpus-adaptive RHP planes, and the gate in its sketch form
    (percentile_approx scalar, no global percent_rank). Bench-only:
    bucketing makes stage-1 candidates approximate, so this is
    recall/agreement-covered by the v10/v16 pins, not oracle-hashed."""
    from pyspark.sql import Window

    from ..operators.dedup import connected_components
    from ..operators.similarity import (
        embedding_dedup_pairs,
        prototype_density_outliers,
    )

    e = _embs(spark, sf_dir)
    pairs = embedding_dedup_pairs(e, threshold=0.92, n_planes="auto")
    cc = connected_components(pairs).select(F.col("id").alias("vec_id"), "cluster_id")
    base = (
        e.select("vec_id", "label")
        .join(cc, "vec_id", "left")
        .select(
            "vec_id",
            "label",
            (F.coalesce("cluster_id", F.col("vec_id")) == F.col("vec_id")).alias(
                "kept_dedup"
            ),
        )
    )
    surv = e.join(base.filter(F.col("kept_dedup")).select("vec_id"), "vec_id")
    gate = prototype_density_outliers(surv, decile=0.1)
    w = Window.partitionBy("label").orderBy(F.asc("proto_cosine"), F.asc("vec_id"))
    return (
        gate.filter(~F.col("is_outlier"))
        .join(e.select("vec_id", "label"), "vec_id")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= X26_CAP)
        .select("vec_id", "label", "proto_cosine", "rnk")
    )


BENCH_ONLY["x26_prod"] = q_embedding_curation_prod


def q_index_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v17: IVF index-maintenance telemetry — the operational query a
    production vector store runs as batches arrive against a FITTED
    coarse quantizer: per-cell occupancy/share, mean squared
    quantization error, and the refit verdicts (high_skew: cell share
    > 2/k — a hot region outgrew its cell; high_error: mean error >
    1.5× the global mean — centroid drift). A scheduler watching this
    table refits when the index degrades instead of on a timer.

    Certification shape: the quantizer is the DETERMINISTIC stand-in
    fit (the 8 lowest-vec_id vectors as centroids — the kmeans_fit
    init rule, reproducible in SQL; Lloyd iteration itself is never
    reproduced in SQL, the v7/v11 precedent), assignment distances are
    sequential HOF folds (argmin ties to the lowest cell in both
    engines), per-cell means are the v15 fixed-order fold. The
    production shape (trained k-means at auto cells + Arrow
    assignment) is ``v17_prod``."""
    from ..operators.similarity import index_maintenance_report

    e = _embs(spark, sf_dir)
    cent_rows = (
        e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .orderBy("vec_id")
        .limit(8)
        .collect()
    )
    centroids = [list(r.v) for r in cent_rows]
    return index_maintenance_report(e, centroids, exact=True)


QUERIES["v17_index_maintenance"] = q_index_maintenance
_SQDIFF = (
    "(CAST(e.embedding[j+1] AS DOUBLE) - CAST(ct.c[j+1] AS DOUBLE))"
    " * (CAST(e.embedding[j+1] AS DOUBLE) - CAST(ct.c[j+1] AS DOUBLE))"
)
ORACLES["v17_index_maintenance"] = f"""
WITH cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS c
  FROM embeddings ORDER BY vec_id LIMIT 8),
d AS (
  SELECT e.vec_id, ct.cell,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(range(64), j -> {_SQDIFF})), (a, x) -> a + x) AS dist2
  FROM embeddings e CROSS JOIN cents ct),
a AS (SELECT vec_id, cell, dist2,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cell) AS rk
      FROM d),
asg AS (SELECT vec_id, cell, dist2 FROM a WHERE rk = 1),
pc AS (
  SELECT cell, count(*) AS n_vecs,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list(dist2 ORDER BY vec_id)), (a, x) -> a + x) / count(*) AS mean_raw
  FROM asg GROUP BY cell),
tot AS (
  SELECT sum(n_vecs) AS n,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list(mean_raw ORDER BY cell)), (a, x) -> a + x) AS sum_means,
         count(*) AS k_seen
  FROM pc)
SELECT CAST(pc.cell AS INTEGER) AS cell, n_vecs,
       CAST((n_vecs * 1000000) // tot.n AS BIGINT) AS share_ppm,
       round(mean_raw, 6) AS mean_dist2,
       n_vecs * 1.0 / tot.n > 2.0 / 8 AS high_skew,
       mean_raw > 1.5 * tot.sum_means / tot.k_seen AS high_error,
       (n_vecs * 1.0 / tot.n > 2.0 / 8)
         OR (mean_raw > 1.5 * tot.sum_means / tot.k_seen) AS refit
FROM pc CROSS JOIN tot"""


def q_index_maintenance_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v17_prod: the production maintenance pass — a TRAINED quantizer
    (kmeans_fit at corpus-adaptive cells via auto_n_cells(memo_count);
    amortized across batches in production, included for end-to-end
    honesty) and the Arrow nearest_cells assignment (centroids in the
    kernel closure, never the plan — the ADVICE-r14 literal-blowup
    rule). Bench-only: the fit is iterative (never SQL-reproduced);
    telemetry semantics are certified by v17."""
    from ..operators import memo_count
    from ..operators.similarity import (
        auto_n_cells,
        index_maintenance_report,
        kmeans_fit,
    )

    e = _embs(spark, sf_dir)
    n_cells = auto_n_cells(memo_count(e))
    centroids, _ = kmeans_fit(e, k=n_cells)
    return index_maintenance_report(e, centroids, exact=False)


BENCH_ONLY["v17_prod"] = q_index_maintenance_prod


#: x27 density-gate decile: fraction of quality survivors flagged as
#: embedding-space outliers (the v16 convention).
X27_DECILE = 0.1
#: X27_DECILE as an exact integer fraction for the cross-multiplied
#: outlier gate (SURVEY §8 integer-contract rule, round 17)
X27_DECILE_NUM, X27_DECILE_DEN = 1, 10


def _x27_stages(spark: SparkSession, sf_dir: str):
    """x27 stages 1-3 shared by the cert and prod forms: line dedup →
    recomputed quality gate → survivor docs joined to their embeddings.
    Returns ``(docs, quality, survivors)``."""
    from ..operators import scoped_persist
    from ..operators.dedup import line_dedup

    d = _docs(spark, sf_dir)
    e = _embs(spark, sf_dir)
    toks = F.split("clean_text", " ")
    # quality forks the lineage (filter arm + provenance arm); persist
    # the boundary so the segment agg computes once (round-19
    # interleaved A/B at sf0.1: median paired ratio 0.922, 4/4 rounds
    # faster, value-identical — the x26/v11 scoped_persist precedent)
    quality = scoped_persist(
        line_dedup(d, seg_tokens=8).select(
            "doc_id",
            F.array_size(toks).alias("n_clean_tokens"),
            (
                (F.array_size(toks) >= GATE_MIN_TOKENS)
                & (
                    F.array_size(F.array_distinct(toks)) / F.array_size(toks)
                    >= GATE_MIN_DISTINCT_RATIO
                )
            ).alias("passed_quality"),
        )
    )
    # surv feeds the gate twice (centroid agg + scoring join) and, in
    # the prod form, the provenance join as well — persist the boundary
    # so the doc→embedding equi-join executes once (self-review r19:
    # the unpersisted plan scanned documents.parquet 20×)
    surv = scoped_persist(
        quality.filter("passed_quality")
        .select("doc_id")
        .join(d.select("doc_id", "lang"), "doc_id")
        .join(e.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id")
    )
    return d, quality, surv


def q_joint_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x27: the JOINT text+embedding curation chain — the round-19
    agenda item closed ("the embedding gate is a natural fourth stage
    once embeddings ride the pipeline"): x16's text stages with v16's
    linear density gate appended, cross-modal because the TEXT
    metadata (``lang``) groups the VECTOR prototypes:

    1. dd13 line dedup (boilerplate segments removed globally, BEFORE
       any gate — the x16 ordering),
    2. t7's quality gate RECOMPUTED on the cleaned text
       (>= GATE_MIN_TOKENS tokens AND distinct-token ratio >=
       GATE_MIN_DISTINCT_RATIO — the x16 convention),
    3. v16's linear density gate on the survivors' embeddings
       (doc_id = vec_id, the fixture's contract), prototypes per
       LANGUAGE computed on the SURVIVORS only — a dropped boilerplate
       farm cannot drag its language's prototype (the x26 stage-2
       lesson),
    4. final keep + full provenance, one row per ORIGINAL doc
       (``n_clean_tokens`` / ``passed_quality`` always set;
       ``density_score``/``pct``/``is_outlier`` null unless the doc
       reached the gate).

    Scale shape: a linear chain — dd13's MIN agg + equi-join, a
    map-side quality filter, ONE co-partitioned doc→embedding
    equi-join, one broadcast-centroid cosine join (|langs|·dim rows).
    The only global sort is the cert-only exact percent_rank; the
    production form (``x27_prod``) replaces it with v16's
    percentile_approx scalar broadcast. ``quality`` forks the lineage
    (filter arm + provenance arm) — the boundary is scoped_persist-ed
    in ``_x27_stages`` so the segment agg computes once (A/B'd; see
    the comment there)."""
    from ..operators.similarity import prototype_density_outliers

    d, quality, surv = _x27_stages(spark, sf_dir)
    gate = prototype_density_outliers(
        surv,
        decile=X27_DECILE,
        label_col="lang",
        id_col="doc_id",
        exact=True,
    ).select(
        "doc_id",
        F.col("proto_cosine").alias("density_score"),
        "pct_ppm",
        "is_outlier",
    )
    return (
        d.select("doc_id", "lang")
        .join(quality, "doc_id")
        .join(gate, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "n_clean_tokens",
            "passed_quality",
            "density_score",
            "pct_ppm",
            "is_outlier",
            F.coalesce(
                F.col("passed_quality") & ~F.col("is_outlier"), F.lit(False)
            ).alias("kept"),
        )
    )


QUERIES["x27_joint_curation"] = q_joint_curation
ORACLES["x27_joint_curation"] = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
ix AS (SELECT doc_id, tok,
              unnest(range(CAST(ceil(len(tok) / 8.0) AS BIGINT))) AS i
       FROM t),
segs AS (SELECT doc_id, CAST(i AS INTEGER) AS seg_idx,
                array_to_string(tok[i*8+1 : i*8+8], ' ') AS seg,
                doc_id * 1000000 + i AS occ_key
         FROM ix),
canon AS (SELECT seg, min(occ_key) AS canon_key FROM segs GROUP BY seg),
ksegs AS (SELECT doc_id, seg_idx, seg, occ_key = canon_key AS is_kept
          FROM segs JOIN canon USING (seg)),
agg AS (SELECT doc_id,
               coalesce(string_agg(CASE WHEN is_kept THEN seg END, ' ' ORDER BY seg_idx), '') AS clean_text
        FROM ksegs GROUP BY doc_id),
q AS (SELECT doc_id,
             CAST(len(string_split(clean_text, ' ')) AS INTEGER) AS n_clean_tokens,
             len(string_split(clean_text, ' ')) >= {GATE_MIN_TOKENS}
               AND len(list_distinct(string_split(clean_text, ' '))) * 1.0
                     / len(string_split(clean_text, ' ')) >= {GATE_MIN_DISTINCT_RATIO}
               AS passed_quality
      FROM agg),
surv AS (SELECT d.doc_id, d.lang, e.embedding
         FROM documents d JOIN q USING (doc_id)
         JOIN embeddings e ON e.vec_id = d.doc_id
         WHERE q.passed_quality),
m AS (SELECT lang, i AS pos,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list(CAST(embedding[i+1] AS DOUBLE) ORDER BY doc_id)), (a, x) -> a + x)
               / count(*) AS mean_val
      FROM surv CROSS JOIN range(64) r(i)
      GROUP BY lang, i),
c AS (SELECT lang, list(mean_val ORDER BY pos) AS centroid FROM m GROUP BY lang),
s AS (SELECT sv.doc_id,
        round({_DOT.format(a='embedding', b='centroid')}
          / (sqrt({_DOT.format(a='embedding', b='embedding')}) * sqrt({_DOT.format(a='centroid', b='centroid')})), 6) AS density_score
      FROM surv sv JOIN c USING (lang)),
g AS (SELECT doc_id, density_score,
             CAST(rank() OVER (ORDER BY density_score) AS BIGINT) AS rk,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM s),
g2 AS (SELECT doc_id, density_score,
              CASE WHEN n > 1 THEN ((rk - 1) * 1000000) // (n - 1) ELSE 0 END AS pct_ppm,
              (rk - 1) * {X27_DECILE_DEN} <= (n - 1) * {X27_DECILE_NUM} AS is_outlier
       FROM g)
SELECT d.doc_id, d.lang, q.n_clean_tokens, q.passed_quality,
       g2.density_score, g2.pct_ppm,
       g2.is_outlier,
       coalesce(q.passed_quality AND NOT g2.is_outlier, FALSE) AS kept
FROM documents d JOIN q USING (doc_id) LEFT JOIN g2 USING (doc_id)"""


def q_joint_curation_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x27_prod: the production config of the joint chain — identical
    text stages, the density gate in its sketch form (map-side-
    combinable avg centroids + percentile_approx scalar broadcast, no
    global sort). Bench-only: the approx threshold makes the outlier
    CUT approximate; semantics are certified by x27 and the two forms'
    keep decisions are agreement-pinned in tests/test_llmops.py.
    Returns the kept docs only (the shape a training store ingests)."""
    from ..operators.similarity import prototype_density_outliers

    _, _, surv = _x27_stages(spark, sf_dir)
    gate = prototype_density_outliers(
        surv, decile=X27_DECILE, label_col="lang", id_col="doc_id"
    )
    return (
        gate.filter(~F.col("is_outlier"))
        .join(surv.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", F.col("proto_cosine").alias("density_score"))
    )


BENCH_ONLY["x27_prod"] = q_joint_curation_prod


def _snapshot_churn(d: DataFrame, key) -> DataFrame:
    """dd17's kernel over any (doc_id, source, text) frame: per-source
    EXACT content churn between two snapshots (doc_id parity — the
    t20/dd16b convention). ``key`` is the content-identity column: the
    raw text (cert — bit-exact in any engine) or a 64-bit hash of it
    (prod — the slim shuffle). Presence is per DISTINCT content per
    source, so intra-snapshot duplicates count once."""
    pres = d.groupBy("source", key.alias("__k")).agg(
        F.max((F.col("doc_id") % 2 == 0).cast("int")).alias("in_a"),
        F.max((F.col("doc_id") % 2 == 1).cast("int")).alias("in_b"),
    )
    n_a = F.sum(F.col("in_a").cast("long")).alias("n_a")
    n_b = F.sum(F.col("in_b").cast("long")).alias("n_b")
    retained = F.sum(
        ((F.col("in_a") == 1) & (F.col("in_b") == 1)).cast("long")
    ).alias("retained")
    added = F.sum(((F.col("in_b") == 1) & (F.col("in_a") == 0)).cast("long")).alias(
        "added"
    )
    removed = F.sum(
        ((F.col("in_a") == 1) & (F.col("in_b") == 0)).cast("long")
    ).alias("removed")
    return (
        pres.groupBy("source")
        .agg(n_a, n_b, retained, added, removed)
        .withColumn(
            # SURVEY §8 integer-contract rule (round 17): the churn
            # ratio is a pure integer ratio, and BOTH raw-double
            # round(x, 6) and the decimal(18,12) bridge proved
            # engine-environment-dependent at the driver (r15/r16
            # hash-red with rows/schema green, locally unreproducible).
            # Emit it as an exact parts-per-million integer instead:
            # floor division of exact longs is bit-identical in every
            # engine (Spark `div` and DuckDB `//` agree on non-negative
            # operands). Denominator ≥ 1 by construction: a source row
            # exists only because it has ≥ 1 distinct content.
            "churn_ppm",
            F.expr("((added + removed) * 1000000) div (n_a + n_b)"),
        )
    )


def q_snapshot_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dd17: per-source EXACT snapshot churn — the operational diff a
    recurring crawl runs between two corpus versions (doc_id parity
    stands in for two crawl dates, the t20/dd16b convention): distinct
    contents retained / added / removed per source, plus a churn ratio
    ((added+removed)/(n_a+n_b)) emitted as an exact ppm integer. Complements dd16b, which ESTIMATES
    cross-snapshot overlap from MinHash sketches at shingle
    granularity — dd17 is the exact doc-granularity ledger a source
    on-boarding decision reads (a source churning 90 % per crawl is a
    spam signal; one churning 0 % has gone stale).

    Scale shape: ONE map-side-combinable groupBy on (source, content
    key) — presence flags are max-folds, exact in any order — then a
    per-source roll-up of five longs. No join, no window, no explode;
    at 100 TB the only shuffle is keyed by content, and the production
    form (``dd17_prod``) shuffles a 64-bit xxhash64 instead of the
    text (count-equal pinned in tests/test_llmops.py; a collision
    would need ~2^32 distinct docs per source)."""
    return _snapshot_churn(_docs(spark, sf_dir), F.col("text"))


QUERIES["dd17_snapshot_churn"] = q_snapshot_churn
ORACLES["dd17_snapshot_churn"] = """
WITH pres AS (
  SELECT source, text,
         max(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS in_b
  FROM documents GROUP BY source, text)
SELECT source,
       CAST(sum(in_a) AS BIGINT) AS n_a,
       CAST(sum(in_b) AS BIGINT) AS n_b,
       CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS retained,
       CAST(sum(CASE WHEN in_b = 1 AND in_a = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS added,
       CAST(sum(CASE WHEN in_a = 1 AND in_b = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS removed,
       CAST(((sum(CASE WHEN in_b = 1 AND in_a = 0 THEN 1 ELSE 0 END)
              + sum(CASE WHEN in_a = 1 AND in_b = 0 THEN 1 ELSE 0 END)) * 1000000)
                // (sum(in_a) + sum(in_b)) AS BIGINT) AS churn_ppm
FROM pres GROUP BY source"""


def q_snapshot_churn_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dd17_prod: the production shape — content identity is
    xxhash64(text), so the presence groupBy shuffles 8 bytes per doc
    instead of the document body. Bench-only: the hash is
    Spark-specific (no DuckDB twin); counts are pinned equal to the
    cert form in tests/test_llmops.py."""
    return _snapshot_churn(_docs(spark, sf_dir), F.xxhash64("text"))


BENCH_ONLY["dd17_prod"] = q_snapshot_churn_prod


#: v18 probe set: the V18_QUERIES lowest vec_ids (the v17 stand-in
#: convention — deterministic, SQL-reproducible) scored at top-V18_K.
V18_K = 5
V18_QUERIES = 8


def q_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v18: ANN recall telemetry — the INDEX-QUALITY twin of v17's
    maintenance report: for a deterministic probe set of query vectors,
    measure the bucket-only ANN's recall@k against exact brute force.
    A vector store runs this after every refit (v17 says WHEN to refit;
    v18 says whether the refit index still FINDS things): per query,
    the bucket's candidate count, how many neighbors the bucket could
    return, and recall@k — falling recall with healthy v17 telemetry
    means the bucketing (not the centroids) degraded.

    Certification shape: the bucketing is :func:`rhp_cell_portable`
    (the x12 engine-portable LCG cell — DuckDB reproduces every cell
    bit-for-bit), both legs rank by (cosine DESC, vec_id) with
    sequential HOF folds, so the ENTIRE report — candidate counts,
    recall fractions — is hash-certified, not verdict-scaffolded. The
    production bucketing (murmur signatures, multi-probe, auto planes)
    is ``v18_prod``, recall-measured against the same exact leg.

    Scale shape: the probe set is bounded (broadcast both legs); the
    exact leg is ONE corpus scan with a per-query top-k window — the
    ground-truth cost is the point of the report, and at 100 TB it
    runs over a corpus SAMPLE (the recall estimate converges at
    thousands of probes regardless of corpus size)."""
    from ..operators.similarity import (
        dot,
        knn_bruteforce,
        l2_norm,
        rhp_cell_portable,
    )
    from pyspark.sql import Window

    e = _embs(spark, sf_dir)
    cells = e.select(
        "vec_id",
        "embedding",
        rhp_cell_portable("embedding", n_planes=X12_PLANES).alias("cell"),
    )
    qs = (
        cells.filter(F.col("vec_id") < V18_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_vec"),
            F.col("cell").alias("q_cell"),
        )
        .withColumn("q_nrm", l2_norm("q_vec"))
    )
    exact = knn_bruteforce(
        e, e.filter(F.col("vec_id") < V18_QUERIES), k=V18_K
    ).select("query_id", "neighbor_id")
    cand = (
        cells.join(
            F.broadcast(qs),
            (F.col("cell") == F.col("q_cell"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn("c_nrm", l2_norm("embedding"))
        .withColumn(
            "cosine", dot("q_vec", "embedding") / (F.col("q_nrm") * F.col("c_nrm"))
        )
    )
    # ONE pass over the candidate leg computes ALL THREE telemetry
    # counts (optimization r19, guide §1.2/§2.4): previously `cand` was
    # consumed by three separate subtrees (rank window → n_returned and
    # the hits join, plus the n_candidates aggregate), so the
    # corpus-scale candidate join — signatures, bucket equi-join,
    # cosine folds — executed three times per run with no
    # ReusedExchange. Now n_candidates rides the rank window's
    # partition as a count-over-window (same partition key ⇒ same one
    # exchange; every query with candidates keeps ≥1 ranked row, so
    # first() is total), and a LEFT join against the exact leg (unique
    # (query_id, neighbor_id) — row_number ≤ k) turns the hits count
    # into a conditional sum over the same rows. Value-identical to the
    # three-subtree form — the oracle keeps its separate-CTE shape and
    # the hash must not move.
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    annk = (
        cand.withColumn(
            "n_candidates", F.count(F.lit(1)).over(Window.partitionBy("query_id"))
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= V18_K)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "n_candidates")
    )
    per_q = (
        annk.join(
            exact.withColumn("__hit", F.lit(1)),
            ["query_id", "neighbor_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.first("n_candidates").alias("n_candidates"),
            F.count(F.lit(1)).alias("n_returned"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("n_hits"),
        )
    )
    # the per-probe frame is bounded by the probe set (8 rows) —
    # broadcast it; without the hint the composed v20 plan pulled it
    # through SortMergeJoin exchanges (round-20 plan pin)
    return (
        qs.select("query_id")
        .join(F.broadcast(per_q), "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
            F.coalesce("n_returned", F.lit(0)).alias("n_returned"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            # SURVEY §8 integer-contract rule (round 17): recall@k is a
            # pure integer ratio (hits/k) — exact ppm long, not a
            # rounded double.
            F.expr(
                f"(coalesce(n_hits, 0) * 1000000) div {V18_K}"
            ).cast("long").alias("recall_ppm"),
        )
    )


QUERIES["v18_recall_report"] = q_recall_report
ORACLES["v18_recall_report"] = f"""
WITH c AS (
  SELECT vec_id, embedding, CAST({_X12_CELL} AS BIGINT) AS cell,
         sqrt({_DOT.format(a='embedding', b='embedding')}) AS nrm
  FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS q_vec, cell AS q_cell, nrm AS q_nrm
      FROM c WHERE vec_id < {V18_QUERIES}),
ex0 AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         {_DOT.format(a='q_vec', b='embedding')} / (q.q_nrm * c.nrm) AS cosine
  FROM q CROSS JOIN c WHERE c.vec_id <> q.query_id),
exk AS (SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id) AS rnk
          FROM ex0) WHERE rnk <= {V18_K}),
cand AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         {_DOT.format(a='q_vec', b='embedding')} / (q.q_nrm * c.nrm) AS cosine
  FROM q JOIN c ON c.cell = q.q_cell AND c.vec_id <> q.query_id),
annk AS (SELECT query_id, neighbor_id FROM (
           SELECT query_id, neighbor_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id) AS rnk
           FROM cand) WHERE rnk <= {V18_K}),
nc AS (SELECT query_id, count(*) AS n_candidates FROM cand GROUP BY query_id),
nr AS (SELECT query_id, count(*) AS n_returned FROM annk GROUP BY query_id),
h AS (SELECT a.query_id, count(*) AS n_hits
      FROM annk a JOIN exk USING (query_id, neighbor_id) GROUP BY a.query_id)
SELECT q.query_id,
       coalesce(nc.n_candidates, 0) AS n_candidates,
       coalesce(nr.n_returned, 0) AS n_returned,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       (CAST(coalesce(h.n_hits, 0) AS BIGINT) * 1000000) // {V18_K} AS recall_ppm
FROM q LEFT JOIN nc USING (query_id) LEFT JOIN nr USING (query_id)
       LEFT JOIN h USING (query_id)"""


def q_recall_report_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v18_prod: recall telemetry over the PRODUCTION bucketing —
    murmur RHP signatures at corpus-adaptive planes with one
    multi-probe flip (the v4_prod configuration), measured against the
    same exact leg. Bench-only: murmur hash() has no DuckDB twin;
    recall semantics are certified by v18 and the production recall
    floor is pinned in tests/test_llmops.py."""
    from ..operators.similarity import knn_bruteforce, knn_lsh

    e = _embs(spark, sf_dir)
    qs = e.filter(F.col("vec_id") < V18_QUERIES)
    exact = knn_bruteforce(e, qs, k=V18_K).select("query_id", "neighbor_id")
    ann = knn_lsh(e, qs, k=V18_K, n_planes="auto", n_probes=1).select(
        "query_id", "neighbor_id"
    )
    # ONE pass over ann computes BOTH telemetry counts (optimization
    # r19, guide §1.2/§2.4): the previous separate hits-join + n_ret
    # aggregation consumed `ann` twice, re-executing the whole LSH
    # pipeline — corpus signatures, bucket join, rank window — per run
    # (no ReusedExchange; the prod plan carried the subtree twice). A
    # LEFT join against the exact leg (unique (query_id, neighbor_id)
    # by construction — row_number ≤ k) preserves every returned row,
    # so count(*) is n_returned and the matched-row count is n_hits:
    # value-identical to the two-subtree form, structurally single-pass.
    # (A scoped_persist was A/B'd first and REJECTED: within the one
    # action both subtrees race to fill the same cached partitions —
    # "Block rdd_N already exists" — and the paired ratio was 1.35.)
    per_q = (
        ann.join(
            exact.withColumn("__hit", F.lit(1)),
            ["query_id", "neighbor_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_returned"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("n_hits"),
        )
    )
    # row-driver is the probe set itself, NOT exact.select(query_id)
    # .distinct() — that form re-executed the entire brute-force
    # ground-truth leg a second time (self-review r19: two BNLJs, zero
    # ReusedExchange in the plan)
    return (
        qs.select(F.col("vec_id").alias("query_id"))
        .join(F.broadcast(per_q), "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_returned", F.lit(0)).alias("n_returned"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.expr(
                f"(coalesce(n_hits, 0) * 1000000) div {V18_K}"
            ).cast("long").alias("recall_ppm"),
        )
    )


BENCH_ONLY["v18_prod"] = q_recall_report_prod


#: v19 two-stage retrieval: ADC shortlist width and final top-k.
V19_M, V19_KSUB, V19_DSUB = 8, 16, 8
V19_SHORTLIST, V19_K = 20, 5


def q_rerank_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v19: the TWO-STAGE retrieval stack — ADC shortlist, exact rerank
    (the standard billion-scale recipe: quantized scores cut the corpus
    to a shortlist a rerank can afford; v11 certifies the ADC estimate,
    v12 the IVF composition, v19 certifies the HANDOFF — that the final
    ranking is exact-scored and the shortlist cut is deterministic).

    Certification shape — a FULL value-hash oracle, strictly stronger
    than v11's verdict scaffolding: the codebook is the deterministic
    stand-in fit (subvectors of the V19_KSUB lowest-vec_id vectors —
    the kmeans init rule, the v17 precedent), and the ENCODE ITSELF
    runs as sequential Catalyst HOF folds (per subspace: 16 in-order
    squared-distance folds, first-min argmin via array_position), so
    DuckDB reproduces every code, reconstruction, ADC score, shortlist
    cut, and rerank rank bit-for-bit. ADC is scored as dot(q, recon) —
    mathematically the m-lookup LUT sum, expressed as one sequential
    64-fold so both engines agree to the last ulp. The production
    shape (trained codebooks, numpy encode, Arrow LUT scoring) is
    ``v19_prod``.

    Scale shape: the corpus is scanned once to encode (map-side; the
    codebook rides the plan as 1,024 literal doubles — the v11 cert
    convention), queries broadcast, the shortlist window sorts slim
    (query, adc) rows, and the rerank touches V19_SHORTLIST rows per
    query."""
    from ..operators.similarity import dot, l2_norm
    from pyspark.sql import Window

    e = _embs(spark, sf_dir)
    rows16 = (
        e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .orderBy("vec_id")
        .limit(V19_KSUB)
        .collect()
    )
    cb = [
        [list(r.v[s * V19_DSUB : (s + 1) * V19_DSUB]) for r in rows16]
        for s in range(V19_M)
    ]
    # one parsed literal matrix per subspace instead of ksub x dsub
    # F.lit py4j calls each (optimization r18; bit-identical Literals —
    # operators.lit_double_matrix)
    from ..operators import lit_double_matrix

    mats = [lit_double_matrix(cb_s) for cb_s in cb]
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("c_vec"),
    )
    def _make_term(s, j):
        # pyspark HOF callbacks must take exactly (acc, i) — bind the
        # subspace and code indices via this factory, not default args
        def term(acc, i):
            diff = F.element_at(
                F.col("c_vec"), (F.lit(s * V19_DSUB) + i + 1).cast("int")
            ) - F.element_at(
                F.element_at(mats[s], (j + 1).cast("int")), (i + 1).cast("int")
            )
            return acc + diff * diff

        return term

    def _make_d2(s):
        def _d2(j):
            return F.aggregate(
                F.sequence(F.lit(0), F.lit(V19_DSUB - 1)),
                F.lit(0.0),
                _make_term(s, j),
            )

        return _d2

    for s in range(V19_M):
        dists = F.transform(F.sequence(F.lit(0), F.lit(V19_KSUB - 1)), _make_d2(s))
        c = c.withColumn(
            f"__code_{s}", F.array_position(dists, F.array_min(dists)) - 1
        )
    recon = F.flatten(
        F.array(
            *[
                F.element_at(mats[s], (F.col(f"__code_{s}") + 1).cast("int"))
                for s in range(V19_M)
            ]
        )
    )
    c = c.select("neighbor_id", "c_vec", recon.alias("recon")).withColumn(
        "c_nrm", l2_norm("c_vec")
    )
    q = (
        e.filter(F.col("vec_id") < 3)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("q_vec"),
        )
        .withColumn("q_nrm", l2_norm("q_vec"))
    )
    pairs = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("adc", dot("q_vec", "recon"))
    )
    ws = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("neighbor_id"))
    short = pairs.withColumn("srk", F.row_number().over(ws)).filter(
        F.col("srk") <= V19_SHORTLIST
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        short.withColumn(
            "cosine", dot("q_vec", "c_vec") / (F.col("q_nrm") * F.col("c_nrm"))
        )
        .withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= V19_K)
        .select("query_id", F.col("rnk").cast("int").alias("rnk"), "neighbor_id", "adc", "cosine")
    )


QUERIES["v19_rerank_stack"] = q_rerank_stack
_V19_D2 = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range({dsub}), "
    "i -> (c.v[s.s*{dsub} + i + 1] - cb.v[s.s*{dsub} + i + 1]) "
    "* (c.v[s.s*{dsub} + i + 1] - cb.v[s.s*{dsub} + i + 1]))), (a, x) -> a + x)"
).format(dsub=V19_DSUB)
ORACLES["v19_rerank_stack"] = f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, v
       FROM e ORDER BY vec_id LIMIT {V19_KSUB}),
enc AS (
  SELECT c.vec_id, s.s, cb.j, {_V19_D2} AS d2
  FROM e c CROSS JOIN range({V19_M}) s(s) CROSS JOIN cb),
codep AS (SELECT vec_id, s, j,
                 row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, j) AS rk
          FROM enc),
recon AS (
  SELECT cd.vec_id,
         flatten(list(cb.v[cd.s*{V19_DSUB}+1 : cd.s*{V19_DSUB}+{V19_DSUB}]
                      ORDER BY cd.s)) AS recon
  FROM codep cd JOIN cb ON cb.j = cd.j
  WHERE cd.rk = 1 GROUP BY cd.vec_id),
q AS (SELECT vec_id AS query_id, v AS qv,
             sqrt({_DOT.format(a='v', b='v')}) AS q_nrm
      FROM e WHERE vec_id < 3),
sc AS (SELECT q.query_id, r.vec_id AS neighbor_id,
              {_DOT.format(a='qv', b='recon')} AS adc
       FROM recon r CROSS JOIN q WHERE r.vec_id <> q.query_id),
short AS (SELECT query_id, neighbor_id, adc FROM (
            SELECT query_id, neighbor_id, adc,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY adc DESC, neighbor_id) AS srk
            FROM sc) WHERE srk <= {V19_SHORTLIST}),
rr AS (SELECT s.query_id, s.neighbor_id, s.adc,
              {_DOT.format(a='qv', b='v')}
                / (q.q_nrm * sqrt({_DOT.format(a='v', b='v')})) AS cosine
       FROM short s JOIN e c ON c.vec_id = s.neighbor_id
            JOIN q ON q.query_id = s.query_id)
SELECT query_id,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rnk,
       neighbor_id, adc, cosine
FROM rr
QUALIFY rnk <= {V19_K}"""


def q_rerank_stack_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v19_prod: the production two-stage path — trained codebooks
    (pq_fit), numpy encode, Arrow LUT shortlist (pq_adc_topk at
    V19_SHORTLIST), then exact rerank of the shortlist only. Bench-only
    (trained fit is never SQL-reproduced); the handoff semantics are
    certified by v19 and the rerank-lifts-recall property is pinned in
    tests/test_llmops.py."""
    from ..operators.quantization import pq_adc_topk, pq_encode, pq_fit
    from ..operators.similarity import dot, l2_norm
    from pyspark.sql import Window

    e = _embs(spark, sf_dir)
    codebooks = pq_fit(e, m=V19_M, ksub=V19_KSUB)
    codes = pq_encode(e, codebooks)
    qs = e.filter(F.col("vec_id") < 3)
    short = pq_adc_topk(codes, qs, codebooks, k=V19_SHORTLIST)
    q = qs.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("q_vec"),
    ).withColumn("q_nrm", l2_norm("q_vec"))
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("c_vec"),
    ).withColumn("c_nrm", l2_norm("c_vec"))
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        short.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .withColumn(
            "cosine", dot("q_vec", "c_vec") / (F.col("q_nrm") * F.col("c_nrm"))
        )
        .withColumn("rrnk", F.row_number().over(wr))
        .filter(F.col("rrnk") <= V19_K)
        .select("query_id", "neighbor_id", "adc_dot", "cosine", "rrnk")
    )


BENCH_ONLY["v19_prod"] = q_rerank_stack_prod


#: x28 context budget (matches x6/mm5's 256-token window).
X28_CAP = 256


def q_greedy_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x28: greedy NON-SPLITTING sequence packing — the other packing
    regime next to x6/mm5's offset-division packing (which concatenates
    with EOS and lets documents span bin boundaries): here attention
    must not cross document boundaries, so a doc that does not fit the
    current bin's remainder closes the bin (wasting its tail) and
    starts the next; docs longer than the cap are truncated and
    flagged. One row per doc with its (bin_id, bin_offset) placement —
    bin utilization / waste / truncation telemetry is a trivial agg
    over this output.

    Execution shape: the bin assignment is a RECURRENCE (each doc's
    bin depends on the previous doc's output fill), so this is the
    documented applyInPandas escape hatch (§2.11, the grouped-EWM
    boundary) — grouped by ``source``, Arrow-batched, sequential only
    WITHIN a group. The DuckDB oracle reproduces the recurrence with a
    recursive CTE (all sources advance in parallel per iteration), so
    the whole placement is hash-certified — the x1_grouped_ewm
    certification pattern (the registry's first recursive-CTE-certified
    applyInPandas op) applied to INTEGER state, where the compare is
    exact with no float-semantics replication needed at all.

    Scale shape: one shuffle on the group key; each group must fit a
    worker — packing runs per shard (the x15 layout), so group size is
    bounded by construction. All-integer arithmetic keeps the oracle
    comparison float-free."""
    from ..operators.pandas_ops import greedy_pack

    d = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        F.array_size(F.split("text", " ")).alias("n_tokens"),
    )
    return greedy_pack(d, cap=X28_CAP)


QUERIES["x28_greedy_pack"] = q_greedy_pack
ORACLES["x28_greedy_pack"] = f"""
WITH RECURSIVE t AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         least(CAST(len(string_split(text, ' ')) AS INTEGER), {X28_CAP}) AS eff,
         CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS rn
  FROM documents),
p AS (
  SELECT doc_id, source, n_tokens, eff, rn,
         CAST(0 AS BIGINT) AS bin_id,
         CAST(0 AS BIGINT) AS bin_offset,
         CAST(eff AS BIGINT) AS fill
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.doc_id, t.source, t.n_tokens, t.eff, t.rn,
         CASE WHEN p.fill + t.eff > {X28_CAP} THEN p.bin_id + 1 ELSE p.bin_id END,
         CASE WHEN p.fill + t.eff > {X28_CAP} THEN CAST(0 AS BIGINT) ELSE p.fill END,
         CASE WHEN p.fill + t.eff > {X28_CAP} THEN CAST(t.eff AS BIGINT)
              ELSE p.fill + t.eff END
  FROM p JOIN t ON t.source = p.source AND t.rn = p.rn + 1)
SELECT doc_id, source, n_tokens,
       CAST(eff AS INTEGER) AS eff_tokens,
       n_tokens > {X28_CAP} AS truncated,
       bin_id, bin_offset
FROM p"""


def q_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x29: packing-efficiency comparison — the round-20 agenda's
    "measured waste-reduction row" as a certified query instead of
    prose: pack every source BOTH ways (x28's streaming-order
    next-fit and first-fit-DECREASING, the classic 11/9·OPT packer
    that trades streaming order for density) and report, per source,
    the bins each uses against the ideal (ceil(total_eff / cap)), the
    tail-waste fraction of each, and the bins saved by FFD. A pipeline
    owner reads one row to decide whether their length distribution
    justifies giving up streaming order. (Next-fit-decreasing —
    sorting WITHOUT reopening bins — was evaluated and rejected: it
    LOSES to streaming next-fit on both the fixture and a bimodal
    planted corpus; see the greedy_pack docstring.)

    Execution shape: two applyInPandas packing passes over the same
    slim (doc_id, source, n_tokens) frame (each a recurrence — the x28
    boundary), then two per-source aggregates and one broadcast-sized
    join on source. All-integer end-to-end: the waste fractions are
    exact ppm longs (SURVEY §8 integer-contract rule). The DuckDB
    oracle reproduces both placements with recursive CTEs — the FFD
    leg carries the OPEN-BIN FILL LIST as recursion state (indexed
    list_transform updates the first fitting bin; the sort key is
    (n_tokens DESC, doc_id), raw tokens not eff, matching the kernel's
    tie-break exactly)."""
    from ..operators.pandas_ops import greedy_pack

    d = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        F.array_size(F.split("text", " ")).alias("n_tokens"),
    )
    stream = greedy_pack(d, cap=X28_CAP)
    packed_ffd = greedy_pack(d, cap=X28_CAP, ffd=True)
    agg_s = stream.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("eff_tokens").alias("total_eff"),
        (F.max("bin_id") + 1).alias("bins_stream"),
    )
    agg_n = packed_ffd.groupBy("source").agg(
        (F.max("bin_id") + 1).alias("bins_ffd")
    )
    return (
        agg_s.join(agg_n, "source")
        .withColumn(
            "ideal_bins", F.expr(f"(total_eff + {X28_CAP - 1}) div {X28_CAP}")
        )
        .select(
            "source",
            "n_docs",
            "total_eff",
            "ideal_bins",
            "bins_stream",
            "bins_ffd",
            # SURVEY §8 integer-contract rule (round 17): the waste
            # fractions are pure integer ratios — 1 - eff/(bins·cap) =
            # (bins·cap - eff)/(bins·cap) — and both the raw-double and
            # decimal-bridged roundings proved driver-environment-
            # dependent (r15/r16 hash-red). Exact ppm integers via
            # floor division; denominators > 0 (bins ≥ 1, cap > 0).
            F.expr(
                f"((bins_stream * {X28_CAP} - total_eff) * 1000000)"
                f" div (bins_stream * {X28_CAP})"
            ).alias("waste_stream_ppm"),
            F.expr(
                f"((bins_ffd * {X28_CAP} - total_eff) * 1000000)"
                f" div (bins_ffd * {X28_CAP})"
            ).alias("waste_ffd_ppm"),
            (F.col("bins_stream") - F.col("bins_ffd")).alias("bins_saved"),
        )
    )


QUERIES["x29_pack_efficiency"] = q_pack_efficiency
#: first fitting open bin, 1-based; 0 = none fits (open a new bin).
#: coalesce: duckdb 1.0.0 returns 0 on no-match but other versions
#: return NULL — pin the branch to be version-independent.
_X29_FIT = (
    "coalesce(list_position("
    "list_transform(p.fills, f -> f + t.eff <= {cap}), true), 0)"
).format(cap=X28_CAP)
ORACLES["x29_pack_efficiency"] = f"""
WITH RECURSIVE base AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         least(CAST(len(string_split(text, ' ')) AS INTEGER), {X28_CAP}) AS eff
  FROM documents),
ts AS (SELECT *, CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
                      AS BIGINT) AS rn FROM base),
tf AS (SELECT *, CAST(row_number() OVER (PARTITION BY source
                                         ORDER BY n_tokens DESC, doc_id)
                      AS BIGINT) AS rn FROM base),
ps AS (
  SELECT doc_id, source, eff, rn,
         CAST(0 AS BIGINT) AS bin_id, CAST(eff AS BIGINT) AS fill
  FROM ts WHERE rn = 1
  UNION ALL
  SELECT t.doc_id, t.source, t.eff, t.rn,
         CASE WHEN p.fill + t.eff > {X28_CAP} THEN p.bin_id + 1 ELSE p.bin_id END,
         CASE WHEN p.fill + t.eff > {X28_CAP} THEN CAST(t.eff AS BIGINT)
              ELSE p.fill + t.eff END
  FROM ps p JOIN ts t ON t.source = p.source AND t.rn = p.rn + 1),
pf AS (
  SELECT doc_id, source, eff, rn,
         CAST(0 AS BIGINT) AS bin_id,
         [CAST(eff AS BIGINT)] AS fills
  FROM tf WHERE rn = 1
  UNION ALL
  SELECT t.doc_id, t.source, t.eff, t.rn,
         CAST(CASE WHEN {_X29_FIT} = 0 THEN len(p.fills)
                   ELSE {_X29_FIT} - 1 END AS BIGINT),
         CASE WHEN {_X29_FIT} = 0
              THEN list_append(p.fills, CAST(t.eff AS BIGINT))
              ELSE list_transform(p.fills, (f, i) ->
                     CASE WHEN i = {_X29_FIT} THEN f + t.eff ELSE f END)
         END
  FROM pf p JOIN tf t ON t.source = p.source AND t.rn = p.rn + 1),
ags AS (SELECT source, count(*) AS n_docs, sum(eff) AS total_eff,
               max(bin_id) + 1 AS bins_stream
        FROM ps GROUP BY source),
agf AS (SELECT source, max(bin_id) + 1 AS bins_ffd FROM pf GROUP BY source)
SELECT ags.source, n_docs, CAST(total_eff AS BIGINT) AS total_eff,
       CAST((total_eff + {X28_CAP - 1}) // {X28_CAP} AS BIGINT) AS ideal_bins,
       bins_stream, bins_ffd,
       CAST(((bins_stream * {X28_CAP} - total_eff) * 1000000)
           // (bins_stream * {X28_CAP}) AS BIGINT) AS waste_stream_ppm,
       CAST(((bins_ffd * {X28_CAP} - total_eff) * 1000000)
           // (bins_ffd * {X28_CAP}) AS BIGINT) AS waste_ffd_ppm,
       bins_stream - bins_ffd AS bins_saved
FROM ags JOIN agf USING (source)"""


def q_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t20: corpus distribution drift — per-language KL divergence of
    unigram token distributions between two snapshots (doc_id parity
    stands in for two crawl dates), with add-one smoothing over the
    union vocabulary. The monitoring stage of a recurring ingestion
    pipeline: a KL spike on a language flags a source change (spam
    flood, encoding regression, topical shift) before it trains in.

    Scale shape: one map-side-combinable (lang, token) count agg —
    integer counts, exact in any order — then a per-language roll-up
    whose payload is the VOCABULARY (Heaps-sublinear in the corpus),
    not the corpus; both KL folds run in FIXED token-sorted order, and
    the result is rounded to 6 decimals because ln itself is not
    correctly rounded (Java Math.log and libm disagree in the last
    ulp — measured here; the fold order is NOT the issue). At 100 TB the per-lang
    vocab array is the only non-scalar state; capping to a top-V
    vocabulary (x3's sketch shape) bounds it if a language's long tail
    ever matters less than its drift signal."""
    return distribution_drift(_docs(spark, sf_dir))


def distribution_drift(d: DataFrame) -> DataFrame:
    """t20's kernel over any (doc_id, lang, text) frame — factored out
    so planted-drift fixtures can drive it directly in pytest."""
    tok = d.select(
        "lang",
        (F.col("doc_id") % 2 == 0).alias("snap_a"),
        F.explode(F.split("text", " ")).alias("token"),
    )
    counts = tok.groupBy("lang", "token").agg(
        F.sum(F.when(F.col("snap_a"), 1).otherwise(0)).alias("cnt_a"),
        F.sum(F.when(~F.col("snap_a"), 1).otherwise(0)).alias("cnt_b"),
    )
    from ..operators.text import kl_report

    return kl_report(counts)


QUERIES["t20_distribution_drift"] = q_distribution_drift
ORACLES["t20_distribution_drift"] = """
WITH tok AS (SELECT lang, doc_id % 2 = 0 AS snap_a,
                    unnest(string_split(text, ' ')) AS token
             FROM documents),
c AS (SELECT lang, token,
             CAST(sum(CASE WHEN snap_a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
             CAST(sum(CASE WHEN snap_a THEN 0 ELSE 1 END) AS BIGINT) AS cnt_b
      FROM tok GROUP BY lang, token),
r AS (SELECT lang,
             list(struct_pack(token := token, cnt_a := cnt_a, cnt_b := cnt_b)
                  ORDER BY token) AS rows_,
             CAST(sum(cnt_a) AS BIGINT) AS n_a,
             CAST(sum(cnt_b) AS BIGINT) AS n_b,
             CAST(count(*) AS INTEGER) AS v
      FROM c GROUP BY lang)
SELECT lang, v AS vocab_size, n_a AS n_tok_a, n_b AS n_tok_b,
       round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         list_transform(rows_, s ->
           ((s.cnt_a + 1) / (n_a + v)) * ln(((s.cnt_a + 1) / (n_a + v)) / ((s.cnt_b + 1) / (n_b + v))))),
         (a, x) -> a + x), 6) AS kl_ab,
       round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         list_transform(rows_, s ->
           ((s.cnt_b + 1) / (n_b + v)) * ln(((s.cnt_b + 1) / (n_b + v)) / ((s.cnt_a + 1) / (n_a + v))))),
         (a, x) -> a + x), 6) AS kl_ba
FROM r"""


def q_export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x21: the TRAINING-STORE EXPORT MANIFEST — the single query a
    pipeline ends with: for every document, the exact layout record a
    data loader consumes. Composes three certified stages in
    production order:

    1. x17's exact per-language train/val/test assignment (histogram-
       cut kernel — boundary buckets windowed, everything else labeled
       map-side),
    2. x15's deterministic shard within (split): the Knuth-
       multiplicative rank spreads each split's docs uniformly over
       shards, so loaders stream shards sequentially and see a global
       shuffle,
    3. mm5's integer packing cumsum within (split, shard): running
       token offset → packed-context bin.

    Output: (doc_id, lang, split, shard, n_tokens, pos, start_offset,
    bin_id) — re-runs and backfills produce byte-identical manifests
    on any engine (every stage is integer arithmetic over portable
    hashes).

    Scale shape: the split kernel's windows touch only boundary
    buckets; then ONE shuffle keyed by (split, shard) — exactly the
    write partitioning the export needs, so at 100 TB this Exchange
    IS the final `repartition(shards).sortWithinPartitions` before the
    store write, not an extra hop — with `pos`/`start_offset`/`bin_id`
    all computed in a single per-(split, shard) Window operator
    (row_number and the running sum share the frame spec's sort).
    Shard sizes concentrate at n_split/n_shards, so per-shard sorts
    are bounded by the shard-count CHOICE, never by corpus size or
    stratum skew."""
    from pyspark.sql import Window

    from ..operators.split import exact_proportional_split

    d = _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        F.array_size(F.split("text", " ")).alias("n_tokens"),
        ((F.col("doc_id") % PRIO_MOD) * F.lit(PRIO_MULT)).alias("rank_key"),
    )
    assigned = exact_proportional_split(
        d, "lang", "rank_key", "doc_id", cuts=SPLIT_CUTS, labels=SPLIT_LABELS
    ).withColumn("shard", (F.col("rank_key") % X15_SHARDS).cast("int"))
    w = Window.partitionBy("split", "shard").orderBy("rank_key", "doc_id")
    return (
        assigned.withColumn("pos", F.row_number().over(w))
        .withColumn(
            "start_offset",
            F.coalesce(
                F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ).cast("bigint"),
        )
        .withColumn("bin_id", F.expr(f"start_offset div {MM5_CTX}"))
        .select(
            "doc_id", "lang", "split", "shard",
            "n_tokens", "pos", "start_offset", "bin_id",
        )
    )


QUERIES["x21_export_manifest"] = q_export_manifest
ORACLES["x21_export_manifest"] = f"""
WITH t AS (SELECT doc_id, lang,
                  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
                  (doc_id % {PRIO_MOD}) * {PRIO_MULT} AS rank_key
           FROM documents),
r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY rank_key, doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM t),
s AS (SELECT doc_id, lang, n_tokens, rank_key,
             CASE WHEN rn <= (8 * n + 9) // 10 THEN 'train'
                  WHEN rn <= (9 * n + 9) // 10 THEN 'val'
                  ELSE 'test' END AS split,
             CAST(rank_key % {X15_SHARDS} AS INTEGER) AS shard
      FROM r),
o AS (SELECT doc_id, lang, split, shard, n_tokens,
             CAST(row_number() OVER (PARTITION BY split, shard ORDER BY rank_key, doc_id) AS INTEGER) AS pos,
             CAST(coalesce(sum(n_tokens) OVER (PARTITION BY split, shard ORDER BY rank_key, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
      FROM s)
SELECT doc_id, lang, split, shard, n_tokens, pos, start_offset,
       start_offset // {MM5_CTX} AS bin_id
FROM o"""


def q_export_manifest_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x21b: the LEAKAGE-SAFE export manifest (round-14 agenda item 1)
    — x21's layout with x19's split: a document and its near-dups land
    in the SAME split (cluster-atomic assignment over MinHash-LSH →
    connected-components clusters, collapse-first), and every document
    still gets the exact (split, shard, pos, start_offset, bin_id)
    layout record a loader consumes. This is the manifest a real
    pretraining export wants: the strict per-language variant (x21)
    quantifies proportions exactly but can strand a val doc's fuzzy
    twin in train; this one trades per-LANGUAGE exactness for
    per-CLUSTER exactness and closes the eval-contamination hole at
    the store boundary.

    Scale shape: x19's kernel (exact-collapse pre-pass → banded LSH
    pairs over representatives → O(log d) pointer-jumping CC → slim
    cluster cut, boundary-bucket windows only) feeds two equi-joins,
    then x21's ONE layout Window on (split, shard) — the Exchange
    feeding it IS the final store-write partitioning. Nothing here is
    all-pairs and no window partitions on a corpus-scale key.
    Plan-pinned alongside x21; 100× measured in SCALE100X.md."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    members = _near_dup_cluster_members(d)
    assigned = _cluster_atomic_split(members)
    docs = d.select(
        "doc_id",
        "lang",
        F.array_size(F.split("text", " ")).alias("n_tokens"),
        ((F.col("doc_id") % PRIO_MOD) * F.lit(PRIO_MULT)).alias("rank_key"),
    )
    labeled = (
        docs.join(members, "doc_id")
        .join(assigned.select("cluster_id", "split"), "cluster_id")
        .withColumn("shard", (F.col("rank_key") % X15_SHARDS).cast("int"))
    )
    w = Window.partitionBy("split", "shard").orderBy("rank_key", "doc_id")
    return (
        labeled.withColumn("pos", F.row_number().over(w))
        .withColumn(
            "start_offset",
            F.coalesce(
                F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ).cast("bigint"),
        )
        .withColumn("bin_id", F.expr(f"start_offset div {MM5_CTX}"))
        .select(
            "doc_id", "lang", "cluster_id", "split", "shard",
            "n_tokens", "pos", "start_offset", "bin_id",
        )
    )


QUERIES["x21b_export_manifest_ls"] = q_export_manifest_leakage_safe
ORACLES["x21b_export_manifest_ls"] = f"""
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
      FROM r),
t AS (SELECT d.doc_id, d.lang, m.cluster_id, s.split,
             CAST(len(string_split(d.text, ' ')) AS INTEGER) AS n_tokens,
             (d.doc_id % {PRIO_MOD}) * {PRIO_MULT} AS rank_key,
             CAST(((d.doc_id % {PRIO_MOD}) * {PRIO_MULT}) % {X15_SHARDS} AS INTEGER) AS shard
      FROM documents d JOIN m USING (doc_id) JOIN s USING (cluster_id)),
o AS (SELECT doc_id, lang, cluster_id, split, shard, n_tokens,
             CAST(row_number() OVER (PARTITION BY split, shard ORDER BY rank_key, doc_id) AS INTEGER) AS pos,
             CAST(coalesce(sum(n_tokens) OVER (PARTITION BY split, shard ORDER BY rank_key, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
      FROM t)
SELECT doc_id, lang, cluster_id, split, shard, n_tokens, pos, start_offset,
       start_offset // {MM5_CTX} AS bin_id
FROM o"""


# --- x23: DSIR importance resampling (round 15) ------------------------------

#: DSIR feature-space size. 512 keeps the fixture's bucket tables dense
#: enough to exercise smoothing; production uses 10k-100k buckets — the
#: tables stay broadcast-bounded either way.
X23_BUCKETS = 512
#: per-language selection width for the deterministic top-k variant
X23_PER_LANG = 25


def q_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x23: DSIR data selection (Xie et al., NeurIPS 2023) — pick the
    candidate documents whose hashed-n-gram distribution best matches a
    TARGET corpus (here the src0 slice, the same target convention as
    t15/t19's eval set). Per doc: ``log_w = Σ_grams ln p_target(bucket)
    − ln p_raw(bucket)`` over add-one-smoothed unigram+bigram bucket
    distributions, then the deterministic top-k-per-language variant
    (rank on the 6dp-rounded weight, doc_id tie-break — DSIR's
    Gumbel-sampled form randomizes exactly this rank).

    Scale shape (operators/text.py:dsir_log_weights): bucket tables are
    ≤ X23_BUCKETS rows REGARDLESS of corpus size, the log-ratio table
    broadcasts into the candidates' gram stream, and the only windows
    run per-language over slim (doc_id, lang, log_w) rows. NEW vs
    reference (no counterpart)."""
    from ..operators.text import dsir_log_weights

    d = _docs(spark, sf_dir)
    cand = d.filter(F.col("source") != "src0")
    target = d.filter(F.col("source") == "src0")
    w = dsir_log_weights(cand, target, n_buckets=X23_BUCKETS).select(
        F.col("id").alias("doc_id"), "log_w"
    )
    from pyspark.sql import Window

    win = Window.partitionBy("lang").orderBy(F.desc("log_w"), F.asc("doc_id"))
    return (
        w.join(d.select("doc_id", "lang"), "doc_id")
        .withColumn("rnk", F.row_number().over(win))
        .select(
            "doc_id",
            "lang",
            "log_w",
            "rnk",
            (F.col("rnk") <= X23_PER_LANG).alias("keep"),
        )
    )


QUERIES["x23_dsir_resample"] = q_dsir_resample

_DSIR_GRAMS = """
      SELECT doc_id, unnest(list_concat(
        list_transform(t, s -> {tv_s}),
        CASE WHEN len(t) >= 2 THEN
          list_transform(range(len(t) - 1), i -> {tv_i} * 131 + {tv_i1})
        ELSE [] END)) AS g
      FROM (SELECT doc_id, string_split(text,' ') AS t FROM {frm}
            WHERE {src})""".format


def _dsir_oracle(prelude: str, frm: str, cand_src: str, tgt_src: str) -> str:
    """x23/x25 share the whole DSIR scoring tail; only the candidate /
    target slices differ. ``prelude`` injects extra CTEs (x25's
    balanced-target row_number table) ahead of the gram CTEs."""
    grams = lambda src: _DSIR_GRAMS(  # noqa: E731
        tv_s=_TV.format(v="s"), tv_i=_TV.format(v="t[i+1]"),
        tv_i1=_TV.format(v="t[i+2]"), frm=frm, src=src,
    )
    return f"""
WITH {prelude}cg AS ({grams(cand_src)}),
tg AS ({grams(tgt_src)}),
cb AS (SELECT doc_id, (g * 2654435761) % {X23_BUCKETS} AS bucket FROM cg),
tb AS (SELECT (g * 2654435761) % {X23_BUCKETS} AS bucket FROM tg),
raw AS (SELECT bucket, count(*) AS cnt_r FROM cb GROUP BY bucket),
tgt AS (SELECT bucket, count(*) AS cnt_t FROM tb GROUP BY bucket),
lr AS (SELECT raw.bucket,
        ln((coalesce(tgt.cnt_t,0)+1) * 1.0 / ((SELECT count(*) FROM tb) + {X23_BUCKETS}))
      - ln((raw.cnt_r+1) * 1.0 / ((SELECT count(*) FROM cb) + {X23_BUCKETS})) AS lr
       FROM raw LEFT JOIN tgt USING (bucket)),
pdb AS (SELECT doc_id, bucket, count(*) AS cnt FROM cb GROUP BY doc_id, bucket),
r AS (SELECT doc_id, list(struct_pack(bucket := pdb.bucket, cnt := cnt, lr := lr)
                          ORDER BY pdb.bucket) AS rows_
      FROM pdb JOIN lr ON pdb.bucket = lr.bucket GROUP BY doc_id),
s AS (SELECT doc_id, round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        list_transform(rows_, x -> x.cnt * x.lr)), (a,x) -> a + x), 6) AS log_w
      FROM r)
SELECT s.doc_id, d.lang, s.log_w,
       CAST(row_number() OVER (PARTITION BY d.lang
            ORDER BY s.log_w DESC, s.doc_id) AS INTEGER) AS rnk,
       CAST(row_number() OVER (PARTITION BY d.lang
            ORDER BY s.log_w DESC, s.doc_id) AS INTEGER) <= {X23_PER_LANG} AS keep
FROM s JOIN documents d USING (doc_id)"""


ORACLES["x23_dsir_resample"] = _dsir_oracle(
    "", "documents", "source <> 'src0'", "source = 'src0'"
)


# --- x25: DSIR with a parameterized (lang-balanced) target --------------------

#: x25's target width: the first X25_TARGET_PER_LANG doc_ids of every
#: language form the target corpus (every fixture language has >= 64
#: docs at sf0.01, so the target is exactly balanced by construction)
X25_TARGET_PER_LANG = 40


def q_dsir_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x25: DSIR against a CALLER-CHOSEN target (VERDICT r12 item 2 —
    the operator always took any target DataFrame; this registers the
    proof). The target here is LANG-BALANCED: the first
    X25_TARGET_PER_LANG doc_ids of every language, the "rebalance my
    pretraining mix toward low-resource languages" use of DSIR (Xie et
    al. §5 run it against Wikipedia; any slice works). Same scoring and
    deterministic top-k-per-language output shape as x23, so the two
    queries A/B the target's steering effect directly:
    ``tests/test_llmops.py::test_dsir_balanced_target_lifts_minority_langs``
    pins that non-English candidates rank strictly higher here than
    under x23's src0 target.

    Scale shape: the target/candidate split ranks SLIM ``(doc_id,
    lang)`` rows only — the text column never rides the lang-partitioned
    window shuffle. The first-cut form did exactly that and measured
    **2.9× slower at 100×** (paired-interleaved ×5, 500 k docs —
    committed table in SCALE100X.md round-16; the counterexample form
    lives in tools/x25_form_ab.py) — and the selected target is ≤
    X25_TARGET_PER_LANG·|langs| ids, so membership joins back into the
    corpus as a BROADCAST hash join / anti-join pair. The scoring core
    is operators/text.py:dsir_log_weights unchanged — bucket tables
    stay ≤ X23_BUCKETS rows regardless of corpus size. NEW vs
    reference."""
    from pyspark.sql import Window

    from ..operators import scoped_persist
    from ..operators.text import dsir_log_weights

    d = _docs(spark, sf_dir)
    rn = F.row_number().over(Window.partitionBy("lang").orderBy("doc_id"))
    # persist: the tiny id list is consumed by both membership joins;
    # without this the slim rank window runs twice
    tgt_ids = scoped_persist(
        d.select("doc_id", "lang")
        .withColumn("rn", rn)
        .filter(F.col("rn") <= X25_TARGET_PER_LANG)
        .select("doc_id")
    )
    target = d.join(F.broadcast(tgt_ids), "doc_id")
    cand = d.join(F.broadcast(tgt_ids), "doc_id", "left_anti")
    w = dsir_log_weights(cand, target, n_buckets=X23_BUCKETS).select(
        F.col("id").alias("doc_id"), "log_w"
    )
    win = Window.partitionBy("lang").orderBy(F.desc("log_w"), F.asc("doc_id"))
    return (
        w.join(d.select("doc_id", "lang"), "doc_id")
        .withColumn("rnk", F.row_number().over(win))
        .select(
            "doc_id",
            "lang",
            "log_w",
            "rnk",
            (F.col("rnk") <= X23_PER_LANG).alias("keep"),
        )
    )


QUERIES["x25_dsir_balanced"] = q_dsir_balanced
ORACLES["x25_dsir_balanced"] = _dsir_oracle(
    "m AS (SELECT doc_id, lang, text, row_number() OVER "
    "(PARTITION BY lang ORDER BY doc_id) AS rn FROM documents), ",
    "m",
    f"rn > {X25_TARGET_PER_LANG}",
    f"rn <= {X25_TARGET_PER_LANG}",
)


# --- dd16: cross-source overlap matrix (round 15) -----------------------------


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dd16: the corpus-overlap triage matrix — MinHash-estimated AND
    exact shingle-set Jaccard between every pair of sources (see
    operators/dedup.py:source_overlap_matrix). The estimate column is
    the 100 TB path (per-source sketches, no document pair space); the
    exact column certifies it on the fixture, dd9's pattern at group
    granularity."""
    from ..operators.dedup import source_overlap_matrix

    return source_overlap_matrix(_docs(spark, sf_dir))


QUERIES["dd16_source_overlap"] = q_source_overlap
def _overlap_oracle(grp_expr: str) -> str:
    """dd16/dd16b share the whole overlap-matrix SQL; only the grouping
    expression differs (source column vs snapshot split)."""
    return f"""
WITH t AS (SELECT {grp_expr} AS source, string_split(text, ' ') AS t FROM documents),
sh AS (SELECT DISTINCT source, unnest(
         CASE WHEN len(t) >= 3 THEN
           list_transform(range(len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
         ELSE [] END) AS sh
       FROM t),
sig AS (SELECT source, count(*) AS n_sh,
        {", ".join(
            f"min(({a} * {_TV.format(v='sh')} + {b}) % {MINHASH_PRIME}) AS h{i}"
            for i, (a, b) in enumerate(minhash_params(8))
        )}
        FROM sh GROUP BY source),
est AS (SELECT a.source AS grp_a, b.source AS grp_b, a.n_sh AS n_a, b.n_sh AS n_b,
        (CAST(({" + ".join(
            f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END" for i in range(8)
        )}) AS BIGINT) * 1000000) // 8 AS est_jaccard_ppm
        FROM sig a JOIN sig b ON a.source < b.source),
inter AS (SELECT a.source AS grp_a, b.source AS grp_b, count(*) AS n_inter
          FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
          GROUP BY a.source, b.source)
SELECT e.grp_a, e.grp_b, e.est_jaccard_ppm,
       (coalesce(i.n_inter, 0) * 1000000)
         // (e.n_a + e.n_b - coalesce(i.n_inter, 0)) AS jaccard_ppm
FROM est e LEFT JOIN inter i ON e.grp_a = i.grp_a AND e.grp_b = i.grp_b"""


ORACLES["dd16_source_overlap"] = _overlap_oracle("source")


def q_source_overlap_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dd16b (VERDICT r12 item 7): the overlap matrix at SNAPSHOT
    granularity — the "how much of crawl B is already in crawl A"
    triage a recurring ingestion runs per date. Same kernel as dd16
    (operators/dedup.py:source_overlap_matrix is group-column
    parametric); the grouping is t20's snapshot convention (doc_id
    parity stands in for two crawl dates). Rotated INTO the driver
    window in round 14 (dd16 moved to the sweep tail) so both kernel
    groupings carry driver-oracle evidence; dd16b has its own green
    r14 row plus a hand-computed pytest fixture."""
    from ..operators.dedup import source_overlap_matrix

    d = _docs(spark, sf_dir).withColumn(
        "snapshot",
        F.when(F.col("doc_id") % 2 == 0, "snap0").otherwise("snap1"),
    )
    return source_overlap_matrix(d, group_col="snapshot")


QUERIES["dd16b_snapshot_overlap"] = q_source_overlap_snapshots
ORACLES["dd16b_snapshot_overlap"] = _overlap_oracle(
    "CASE WHEN doc_id % 2 = 0 THEN 'snap0' ELSE 'snap1' END"
)


# --- t21: n-gram diversity report (round 15) ----------------------------------


def q_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t21: per-language lexical-diversity report — type/token ratios at
    n = 1/2/3 plus unigram entropy, the corpus-health panel that
    detects template farms (low bigram/trigram TTR at normal unigram
    TTR) and mode collapse in synthetic data (low entropy) before any
    pairwise dedup runs.

    Scale shape: ONE gram explode feeds a single per-language agg
    (count + conditional count_distinct per n — map-side combinable);
    the entropy leg reuses t20's fixed-token-order fold over the
    (lang, token) count table (vocabulary-sized, Heaps-sublinear).
    No windows, no joins wider than |langs| rows. NEW vs reference."""
    d = _docs(spark, sf_dir)
    base = d.select("lang", F.split("text", " ").alias("t"))
    grams = base.select(
        "lang",
        F.explode(
            F.expr(
                "concat("
                " transform(t, s -> named_struct('n', 1, 'g', s)),"
                " CASE WHEN size(t) >= 2 THEN transform(sequence(1, size(t) - 1),"
                "   i -> named_struct('n', 2, 'g',"
                "        concat(element_at(t, CAST(i AS INT)), ' ',"
                "               element_at(t, CAST(i AS INT) + 1)))) "
                " ELSE array() END,"
                " CASE WHEN size(t) >= 3 THEN transform(sequence(1, size(t) - 2),"
                "   i -> named_struct('n', 3, 'g',"
                "        concat(element_at(t, CAST(i AS INT)), ' ',"
                "               element_at(t, CAST(i AS INT) + 1), ' ',"
                "               element_at(t, CAST(i AS INT) + 2)))) "
                " ELSE array() END)"
            )
        ).alias("x"),
    ).select("lang", F.col("x.n").alias("n"), F.col("x.g").alias("g"))
    ttr = grams.groupBy("lang").agg(
        F.count(F.when(F.col("n") == 1, 1)).alias("n_tokens"),
        F.count_distinct(F.when(F.col("n") == 1, F.col("g"))).alias(
            "distinct_tokens"
        ),
        F.count(F.when(F.col("n") == 2, 1)).alias("n_bigrams"),
        F.count_distinct(F.when(F.col("n") == 2, F.col("g"))).alias(
            "distinct_bigrams"
        ),
        F.count(F.when(F.col("n") == 3, 1)).alias("n_trigrams"),
        F.count_distinct(F.when(F.col("n") == 3, F.col("g"))).alias(
            "distinct_trigrams"
        ),
    )
    counts = (
        grams.filter(F.col("n") == 1)
        .groupBy("lang", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ent_rows = counts.groupBy("lang").agg(
        F.array_sort(F.collect_list(F.struct("g", "cnt"))).alias("rows"),
        F.sum("cnt").alias("tot"),
    )
    ent_fold = F.aggregate(
        F.transform(
            "rows",
            lambda s: -(s["cnt"] / F.col("tot")) * F.log(s["cnt"] / F.col("tot")),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    entropy = ent_rows.select("lang", F.round(ent_fold, 6).alias("entropy"))
    docs_per_lang = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        docs_per_lang.join(ttr, "lang")
        .join(entropy, "lang")
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            "distinct_tokens",
            # SURVEY §8 integer-contract rule (round 17): type-token
            # ratios are pure integer ratios — exact ppm longs. A lang
            # with zero tokens/bigrams/trigrams yields NULL (mirrored).
            F.when(
                F.col("n_tokens") > 0,
                F.expr("(distinct_tokens * 1000000) div n_tokens"),
            ).alias("ttr_ppm"),
            F.when(
                F.col("n_bigrams") > 0,
                F.expr("(distinct_bigrams * 1000000) div n_bigrams"),
            ).alias("bigram_ttr_ppm"),
            F.when(
                F.col("n_trigrams") > 0,
                F.expr("(distinct_trigrams * 1000000) div n_trigrams"),
            ).alias("trigram_ttr_ppm"),
            "entropy",
        )
    )


QUERIES["t21_ngram_diversity"] = q_ngram_diversity
ORACLES["t21_ngram_diversity"] = """
WITH base AS (SELECT lang, string_split(text, ' ') AS t FROM documents),
g AS (SELECT lang, unnest(list_concat(
        list_transform(t, s -> struct_pack(n := 1, g := s)),
        list_concat(
          CASE WHEN len(t) >= 2 THEN
            list_transform(range(len(t) - 1),
              i -> struct_pack(n := 2, g := t[i+1] || ' ' || t[i+2]))
          ELSE [] END,
          CASE WHEN len(t) >= 3 THEN
            list_transform(range(len(t) - 2),
              i -> struct_pack(n := 3, g := t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))
          ELSE [] END))) AS x
      FROM base),
gg AS (SELECT lang, x.n AS n, x.g AS g FROM g),
ttr AS (SELECT lang,
        CAST(count(CASE WHEN n = 1 THEN 1 END) AS BIGINT) AS n_tokens,
        CAST(count(DISTINCT CASE WHEN n = 1 THEN g END) AS BIGINT) AS distinct_tokens,
        CAST(count(CASE WHEN n = 2 THEN 1 END) AS BIGINT) AS n_bigrams,
        CAST(count(DISTINCT CASE WHEN n = 2 THEN g END) AS BIGINT) AS distinct_bigrams,
        CAST(count(CASE WHEN n = 3 THEN 1 END) AS BIGINT) AS n_trigrams,
        CAST(count(DISTINCT CASE WHEN n = 3 THEN g END) AS BIGINT) AS distinct_trigrams
        FROM gg GROUP BY lang),
c AS (SELECT lang, g, CAST(count(*) AS BIGINT) AS cnt
      FROM gg WHERE n = 1 GROUP BY lang, g),
e AS (SELECT lang,
        list(struct_pack(g := g, cnt := cnt) ORDER BY g) AS rows_,
        CAST(sum(cnt) AS BIGINT) AS tot
      FROM c GROUP BY lang),
ent AS (SELECT lang, round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(rows_, s -> -(s.cnt * 1.0 / tot) * ln(s.cnt * 1.0 / tot))),
          (a, x) -> a + x), 6) AS entropy
        FROM e),
nd AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang)
SELECT nd.lang, nd.n_docs, ttr.n_tokens, ttr.distinct_tokens,
       CASE WHEN ttr.n_tokens > 0
            THEN (ttr.distinct_tokens * 1000000) // ttr.n_tokens END AS ttr_ppm,
       CASE WHEN ttr.n_bigrams > 0
            THEN (ttr.distinct_bigrams * 1000000) // ttr.n_bigrams END AS bigram_ttr_ppm,
       CASE WHEN ttr.n_trigrams > 0
            THEN (ttr.distinct_trigrams * 1000000) // ttr.n_trigrams END AS trigram_ttr_ppm,
       ent.entropy
FROM nd JOIN ttr USING (lang) JOIN ent USING (lang)"""


# --- x24: curriculum schedule (round 15) --------------------------------------

#: number of curriculum stages (quality quartiles)
X24_STAGES = 4


def q_curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x24: CURRICULUM ordering for the training loader — documents
    bucketed into quality quartiles (stage 1 = cleanest first, the
    easy-to-hard pacing curriculum learning uses), deterministically
    interleaved WITHIN each stage (x15's multiplicative-hash key, so
    consecutive loader reads never correlate with ingest order).
    Score = t14's logistic quality probability, rounded to 6 BEFORE the
    rank so stage boundaries tie-break identically across engines.

    Scale shape: both windows run over slim (doc_id, qscore) rows —
    the ntile is ONE range exchange of ids+scores (never documents); at
    100 TB swap it for approx-quantile stage cuts broadcast into a
    filter (the t12 note), keeping the same output contract."""
    from pyspark.sql import Window

    f = quality_features("text")
    z = (
        F.lit(QC_WEIGHTS["bias"])
        + QC_WEIGHTS["n_tokens"] * f["n_tokens"]
        + QC_WEIGHTS["distinct_ratio"] * f["distinct_ratio"]
        + QC_WEIGHTS["stopword_ratio"] * f["stopword_ratio"]
        + QC_WEIGHTS["mean_token_len"] * f["mean_token_len"]
    )
    scored = _docs(spark, sf_dir).select(
        "doc_id",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("qscore"),
        ((F.col("doc_id") % PRIO_MOD) * F.lit(PRIO_MULT)).alias("rank_key"),
    )
    w_stage = Window.orderBy(F.desc("qscore"), F.asc("doc_id"))
    w_pos = Window.partitionBy("stage").orderBy("rank_key", "doc_id")
    return (
        scored.withColumn("stage", F.ntile(X24_STAGES).over(w_stage))
        .withColumn("pos", F.row_number().over(w_pos))
        .select("doc_id", "qscore", "stage", "pos")
    )


QUERIES["x24_curriculum_schedule"] = q_curriculum_schedule
ORACLES["x24_curriculum_schedule"] = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
f AS (SELECT doc_id,
        CAST(len(toks) AS INTEGER) AS n_tokens,
        len(list_distinct(toks)) * 1.0 / len(toks) AS distinct_ratio,
        len(list_filter(toks, x -> x IN ('the', 'a'))) * 1.0 / len(toks) AS stopword_ratio,
        list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(toks, x -> CAST(length(x) AS BIGINT))), (a, x) -> a + x) * 1.0 / len(toks) AS mean_token_len
      FROM t),
s AS (SELECT doc_id,
        round(1.0 / (1.0 + exp(-({QC_WEIGHTS['bias']} + {QC_WEIGHTS['n_tokens']} * n_tokens
          + {QC_WEIGHTS['distinct_ratio']} * distinct_ratio
          + {QC_WEIGHTS['stopword_ratio']} * stopword_ratio
          + {QC_WEIGHTS['mean_token_len']} * mean_token_len))), 6) AS qscore,
        (doc_id % {PRIO_MOD}) * {PRIO_MULT} AS rank_key
      FROM f),
st AS (SELECT doc_id, qscore, rank_key,
        CAST(ntile({X24_STAGES}) OVER (ORDER BY qscore DESC, doc_id) AS INTEGER) AS stage
       FROM s)
SELECT doc_id, qscore, stage,
       CAST(row_number() OVER (PARTITION BY stage ORDER BY rank_key, doc_id) AS INTEGER) AS pos
FROM st"""


def q_dsir_resample_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x23's production twin: the same DSIR weights, but the per-language
    top-k runs through the skew-safe ``capped_keep_first`` kernel (x10's
    three-stage shape) instead of a plain rank window — at 100 TB one
    language can be 40% of the corpus, and the plain window funnels it
    through a single reducer. Output: the kept doc_ids with their
    weights (the keep-list the sampler ships), exact-equal to the cert
    query's ``keep = true`` slice by the kernel's pinned equivalence."""
    from ..operators import scoped_persist
    from ..operators.skew import capped_keep_first
    from ..operators.text import dsir_log_weights

    d = _docs(spark, sf_dir)
    cand = d.filter(F.col("source") != "src0")
    target = d.filter(F.col("source") == "src0")
    w = dsir_log_weights(cand, target, n_buckets=X23_BUCKETS).select(
        F.col("id").alias("doc_id"), "log_w"
    )
    # the quota kernel reads its input 3× (count + under + over
    # branches — the x14 persist-at-the-kernel rule): unpersisted, the
    # whole DSIR weight pipeline (gram explode + bucket aggs + weight
    # fold) re-ran per branch — measured 5.2 s vs 2.7 s for the cert
    # window form at sf0.1 (optimization r18). Persist the slim
    # (doc_id, lang, log_w, __ord) rows so the kernel's three branches
    # share one computation; bench/driver wrappers own cache cleanup.
    slim = scoped_persist(
        w.join(d.select("doc_id", "lang"), "doc_id")
        .withColumn("__ord", F.struct((-F.col("log_w")).alias("nw"), "doc_id"))
    )
    return capped_keep_first(slim, "lang", "__ord", F.lit(X23_PER_LANG)).select(
        "doc_id", "lang", "log_w"
    )


BENCH_ONLY["x23_prod"] = q_dsir_resample_prod


def q_curriculum_schedule_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x24's production twin — the documented 100 TB swap executed: the
    global ntile (ONE SinglePartition sort, measured going serial in the
    last decade of the 100× run: 0.75 → 6.8 s for 10× rows) is replaced
    by approx-quantile stage cuts broadcast into a comparison, so stage
    assignment is map-side and the only windows are the per-stage
    interleave ranks (parallel across stages). Stage populations land
    within percentile_approx's error bound of exact quartiles —
    certified by the pytest bound check, t13's sketch-vs-exact pattern.
    """
    from pyspark.sql import Window

    f = quality_features("text")
    z = (
        F.lit(QC_WEIGHTS["bias"])
        + QC_WEIGHTS["n_tokens"] * f["n_tokens"]
        + QC_WEIGHTS["distinct_ratio"] * f["distinct_ratio"]
        + QC_WEIGHTS["stopword_ratio"] * f["stopword_ratio"]
        + QC_WEIGHTS["mean_token_len"] * f["mean_token_len"]
    )
    scored = _docs(spark, sf_dir).select(
        "doc_id",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("qscore"),
        ((F.col("doc_id") % PRIO_MOD) * F.lit(PRIO_MULT)).alias("rank_key"),
    )
    cuts = scored.agg(
        F.percentile_approx(
            "qscore", [0.25, 0.5, 0.75], 10_000
        ).alias("c")
    )
    w_pos = Window.partitionBy("stage").orderBy("rank_key", "doc_id")
    return (
        scored.crossJoin(F.broadcast(cuts))
        # stage 1 = highest quality (ntile orientation: score DESC)
        .withColumn(
            "stage",
            F.when(F.col("qscore") >= F.col("c")[2], 1)
            .when(F.col("qscore") >= F.col("c")[1], 2)
            .when(F.col("qscore") >= F.col("c")[0], 3)
            .otherwise(4),
        )
        .withColumn("pos", F.row_number().over(w_pos))
        .select("doc_id", "qscore", "stage", "pos")
    )


BENCH_ONLY["x24_prod"] = q_curriculum_schedule_prod


# --- t22: BPE-style pre-tokenizer census (round 15) ---------------------------

#: GPT-2-style pre-tokenizer, lookahead-free so Java regex (Spark) and
#: RE2 (DuckDB) agree: a word run with optional leading space, a digit
#: run, a punctuation run, or a space run. Both engines use ordered
#: (leftmost-first) alternation.
BPE_PRETOKEN_RE = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+| +"


def q_bpe_pretokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t22: subword-budget census — per document, the GPT-2-style
    pre-token count (the unit BPE merges start from, and the practical
    upper bound on BPE token count), category splits (word/number/
    punctuation runs), and chars-per-pretoken (the compression proxy
    token-budget planning uses when the real tokenizer isn't in the
    cluster). Whitespace-token counts (t5) undercount code and
    punctuation-dense text by 2-4×; this is the census an LLM data
    pipeline actually budgets with.

    Scale shape: one regexp_extract_all projection — map-only, no
    shuffle, no UDF; the regex is anchored alternation over character
    classes (no backtracking blowup)."""
    d = _docs(spark, sf_dir)
    toks = F.expr(f"regexp_extract_all(text, '{BPE_PRETOKEN_RE}', 0)")
    wrapped = lambda body: F.expr(  # noqa: E731 - bind toks once
        f"transform(array(regexp_extract_all(text, '{BPE_PRETOKEN_RE}', 0)),"
        f" t -> {body})[0]"
    )
    return d.select(
        "doc_id",
        F.array_size(toks).alias("n_pretokens"),
        wrapped("size(filter(t, x -> x rlike '^ ?[a-zA-Z]+$'))").alias("n_word"),
        wrapped("size(filter(t, x -> x rlike '^ ?[0-9]+$'))").alias("n_num"),
        wrapped(
            "size(filter(t, x -> NOT (x rlike '^ ?[a-zA-Z]+$') "
            "AND NOT (x rlike '^ ?[0-9]+$') AND NOT (x rlike '^ +$')))"
        ).alias("n_punct"),
        # empty/NULL text → 0 pretokens: guard the ratio on BOTH engines
        # (ADVICE r12 — Spark non-ANSI div-0 yields NULL while DuckDB
        # differs, so the contract must not lean on the fixture never
        # containing empty text)
        F.when(
            F.array_size(toks) > 0,
            # SURVEY §8 integer-contract rule (round 17): chars per
            # pretoken is a pure integer ratio — exact ppm long.
            F.expr(
                "(cast(length(text) as bigint) * 1000000)"
                f" div size(regexp_extract_all(text, '{BPE_PRETOKEN_RE}', 0))"
            ),
        ).alias("chars_per_pretoken_ppm"),
    )


QUERIES["t22_bpe_pretokenize"] = q_bpe_pretokenize
ORACLES["t22_bpe_pretokenize"] = f"""
WITH t AS (SELECT doc_id, length(text) AS n_chars,
                  regexp_extract_all(text, '{BPE_PRETOKEN_RE}') AS toks
           FROM documents)
SELECT doc_id,
       CAST(len(toks) AS INTEGER) AS n_pretokens,
       CAST(len(list_filter(toks, x -> regexp_matches(x, '^ ?[a-zA-Z]+$'))) AS INTEGER) AS n_word,
       CAST(len(list_filter(toks, x -> regexp_matches(x, '^ ?[0-9]+$'))) AS INTEGER) AS n_num,
       CAST(len(list_filter(toks, x -> NOT regexp_matches(x, '^ ?[a-zA-Z]+$')
            AND NOT regexp_matches(x, '^ ?[0-9]+$')
            AND NOT regexp_matches(x, '^ +$'))) AS INTEGER) AS n_punct,
       CASE WHEN len(toks) > 0
            THEN (CAST(n_chars AS BIGINT) * 1000000) // len(toks)
       END AS chars_per_pretoken_ppm
FROM t"""


# --- t23: char-trigram language ID (round 15) ---------------------------------

#: Cavnar-Trenkle profile sizes: top-K trigrams per language model,
#: top-K_DOC per document, out-of-place penalty = T23_K
T23_K = 100
T23_K_DOC = 50


def q_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t23: n-gram language-ID proper (Cavnar-Trenkle 1994) — the
    rank-order character-trigram classifier, next to t4's stopword
    heuristic: per language, the top-{T23_K} char trigrams by frequency
    form a ranked profile; each document's top-{T23_K_DOC} trigrams are
    compared by out-of-place distance (|doc_rank − lang_rank|, penalty
    {T23_K} for trigrams outside the profile); prediction = argmin.
    Everything is INTEGER arithmetic — no float folds, so cross-engine
    equality is exact, not rounded.

    Scale shape: language profiles are ≤ {T23_K}·|langs| rows (broadcast
    everywhere); document profiles come from a per-document window
    (parallel across docs, bounded by per-doc distinct trigrams); the
    scoring join is doc-profile × |langs| with the profile broadcast.
    One corpus-scale explode (the trigram pass), everything downstream
    keyed or bounded. Docs shorter than 3 chars have no trigrams and are
    excluded (documented; the fixture has none).

    Fixture honesty note: the synthetic languages share one English-word
    vocabulary, so trigram profiles barely separate — measured accuracy
    0.31 vs 0.20 chance at sf0.01. The certification here is HASH
    EXACTNESS of the rank-order algorithm (pure integer arithmetic);
    on real multilingual text this classifier is the standard ~99%
    heuristic."""
    from pyspark.sql import Window

    # trigram-bearing slice ONLY (ADVICE r12): candidate languages, the
    # truth-lang join, and the profiles must all derive from the same
    # length(text) >= 3 universe the oracle's WHERE clause uses — a
    # language present only via sub-3-char docs must not become a
    # candidate (its all-penalty score could win an argmin tie-break)
    d = _docs(spark, sf_dir).select("doc_id", "lang", "text").filter(
        F.length("text") >= 3
    )
    tg = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "CASE WHEN length(text) >= 3 THEN "
                "transform(sequence(1, length(text) - 2),"
                " i -> substring(text, CAST(i AS INT), 3)) "
                "ELSE array() END"
            )
        ).alias("tg"),
    )
    w_lang = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("tg"))
    lang_prof = (
        tg.groupBy("lang", "tg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("lang_rank", F.row_number().over(w_lang))
        .filter(F.col("lang_rank") <= T23_K)
        .select(F.col("lang").alias("cand"), "tg", "lang_rank")
    )
    w_doc = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("tg"))
    doc_prof = (
        tg.groupBy("doc_id", "tg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("doc_rank", F.row_number().over(w_doc))
        .filter(F.col("doc_rank") <= T23_K_DOC)
        .select("doc_id", "tg", "doc_rank")
    )
    langs = d.select(F.col("lang").alias("cand")).distinct()
    # Measured negative (round 15, interleaved A/B min-of-2 at 1× and
    # 100×): rewriting this to join ONLY profile hits — dist decomposes
    # as n_rows·K + Σ_matched(|Δ|−K) with every matched term strictly
    # negative, so unmatched candidates can never win — is value-
    # identical (oracle hash unchanged) but SLOWER here: naive
    # 2.65/41.5 s vs matched-only 3.22/44.3 s at 1×/100×. On this
    # fixture languages share one vocabulary, so ~every doc trigram
    # matches ~every profile and the penalty stream the rewrite avoids
    # barely exists, while its extra aggs (n_rows, anti-join fallback,
    # union) cost real time. On a real multilingual corpus (sparse
    # matches) the decomposition is the right form — revisit only with
    # a disjoint-alphabet fixture measurement.
    scored = (
        doc_prof.crossJoin(F.broadcast(langs))
        .join(F.broadcast(lang_prof), ["cand", "tg"], "left")
        .groupBy("doc_id", "cand")
        .agg(
            F.sum(
                F.coalesce(
                    F.abs(F.col("doc_rank") - F.col("lang_rank")),
                    F.lit(T23_K),
                )
            ).alias("dist")
        )
    )
    w_best = Window.partitionBy("doc_id").orderBy(F.asc("dist"), F.asc("cand"))
    best = (
        scored.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("cand").alias("lang_pred"), "dist")
    )
    return best.join(d.select("doc_id", "lang"), "doc_id").select(
        "doc_id",
        "lang",
        "lang_pred",
        "dist",
        (F.col("lang") == F.col("lang_pred")).alias("correct"),
    )


QUERIES["t23_langid_ngram"] = q_langid_ngram
ORACLES["t23_langid_ngram"] = f"""
WITH d AS (SELECT doc_id, lang, text FROM documents WHERE length(text) >= 3),
tg AS (SELECT doc_id, lang, unnest(
         list_transform(range(length(text) - 2), i -> text[i+1:i+3])) AS tg
       FROM d),
lp AS (SELECT lang AS cand, tg, lang_rank FROM (
         SELECT lang, tg, CAST(count(*) AS BIGINT) AS cnt,
                row_number() OVER (PARTITION BY lang
                  ORDER BY count(*) DESC, tg) AS lang_rank
         FROM tg GROUP BY lang, tg)
       WHERE lang_rank <= {T23_K}),
dp AS (SELECT doc_id, tg, doc_rank FROM (
         SELECT doc_id, tg, CAST(count(*) AS BIGINT) AS cnt,
                row_number() OVER (PARTITION BY doc_id
                  ORDER BY count(*) DESC, tg) AS doc_rank
         FROM tg GROUP BY doc_id, tg)
       WHERE doc_rank <= {T23_K_DOC}),
langs AS (SELECT DISTINCT lang AS cand FROM d),
sc AS (SELECT dp.doc_id, langs.cand,
              CAST(sum(coalesce(abs(dp.doc_rank - lp.lang_rank), {T23_K})) AS BIGINT) AS dist
       FROM dp CROSS JOIN langs
       LEFT JOIN lp ON lp.cand = langs.cand AND lp.tg = dp.tg
       GROUP BY dp.doc_id, langs.cand),
best AS (SELECT doc_id, cand AS lang_pred, dist FROM (
           SELECT doc_id, cand, dist,
                  row_number() OVER (PARTITION BY doc_id
                    ORDER BY dist, cand) AS rn
           FROM sc)
         WHERE rn = 1)
SELECT b.doc_id, d.lang, b.lang_pred, b.dist,
       d.lang = b.lang_pred AS correct
FROM best b JOIN d USING (doc_id)"""


#: v20 dashboard thresholds: a source churning more than half its
#: distinct contents per crawl is a spam/instability signal (the dd17
#: docstring's on-boarding rule); a bucket-only ANN finding under 60 %
#: of true neighbors has degraded past dashboard-green. Both are kept
#: as exact integer fractions so the alert booleans are integer
#: cross-multiplications — identical in every engine (SURVEY §8
#: integer-contract rule, round 17).
V20_CHURN_ALERT_NUM, V20_CHURN_ALERT_DEN = 1, 2  # churn > 1/2
V20_RECALL_FLOOR_NUM, V20_RECALL_FLOOR_DEN = 3, 5  # mean recall < 3/5


def q_store_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v20: the vector-store operations dashboard (VERDICT r15 item 5)
    — ONE query composing the round-19 telemetry family: dd17's exact
    per-source snapshot churn (ingest health), v17's IVF maintenance
    verdicts (index health), and v18's ANN recall@k (retrieval
    health). Grain is per SOURCE — the operational unit an on-boarding
    decision acts on — with the store-wide index/retrieval KPIs
    attached as columns (two 1-row broadcast frames; the three kernels
    report at different grains — cell, probe query, source — so the
    store-level roll-up is the honest join, not a fabricated
    cell-to-source equi-join). ``healthy`` is the dashboard light:
    no churn alert, no refit due, recall above the floor.

    Certification shape: all three legs are the certified kernels
    verbatim (dd17/v17/v18), so the oracle is the JOIN OF THEIR THREE
    ORACLES wrapped in aggregate CTEs. Every ratio on the contract is
    an exact integer (SURVEY §8 integer-contract rule, round 17):
    ``churn_ppm`` is dd17's ppm long, ``ann_mean_recall_ppm`` is
    hits·10^6 div (probes·k), and the alert booleans are integer
    cross-multiplications against the threshold fractions — no
    rounding anywhere, so no engine can disagree. Production twin:
    ``v20_prod`` composes the three prod kernels (xxhash64 churn keys,
    trained quantizer, production bucketing).

    Scale shape: the churn leg is dd17's one map-side-combinable
    groupBy; the index and retrieval legs collapse to 1-row aggregates
    broadcast onto the per-source frame — no new shuffle beyond what
    the three kernels already do."""
    churn = q_snapshot_churn(spark, sf_dir)
    idx = q_index_maintenance(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("idx_cells"),
        F.sum(F.col("refit").cast("long")).alias("idx_refit_cells"),
        F.max("share_ppm").alias("idx_max_share_ppm"),
        F.max("mean_dist2").alias("idx_max_mean_dist2"),
        F.bool_or("refit").alias("idx_refit_due"),
    )
    ann = (
        q_recall_report(spark, sf_dir)
        .agg(
            F.count(F.lit(1)).alias("ann_probes"),
            F.sum("n_hits").alias("ann_hits_total"),
            F.min("n_hits").alias("ann_min_hits"),
        )
        .withColumn(
            # mean recall = hits_total / (probes·k), exact ppm long
            "ann_mean_recall_ppm",
            F.expr(f"(ann_hits_total * 1000000) div (ann_probes * {V18_K})"),
        )
        .withColumn(
            # mean recall < 3/5  ⇔  hits_total·5 < probes·k·3 (exact)
            "ann_degraded",
            F.expr(
                f"ann_hits_total * {V20_RECALL_FLOOR_DEN} < "
                f"ann_probes * {V18_K} * {V20_RECALL_FLOOR_NUM}"
            ),
        )
    )
    return (
        churn.select(
            "source",
            "n_a",
            "n_b",
            "retained",
            "added",
            "removed",
            "churn_ppm",
            # churn > 1/2  ⇔  (added+removed)·2 > (n_a+n_b) (exact)
            F.expr(
                f"(added + removed) * {V20_CHURN_ALERT_DEN} > "
                f"(n_a + n_b) * {V20_CHURN_ALERT_NUM}"
            ).alias("churn_alert"),
        )
        .crossJoin(F.broadcast(idx))
        .crossJoin(F.broadcast(ann))
        .withColumn(
            "healthy",
            ~(
                F.col("churn_alert")
                | F.col("idx_refit_due")
                | F.col("ann_degraded")
            ),
        )
    )


QUERIES["v20_store_health"] = q_store_health
ORACLES["v20_store_health"] = f"""
WITH churn_leg AS (SELECT * FROM ({ORACLES["dd17_snapshot_churn"]})),
v17_leg AS (SELECT * FROM ({ORACLES["v17_index_maintenance"]})),
v18_leg AS (SELECT * FROM ({ORACLES["v18_recall_report"]})),
idx AS (
  SELECT CAST(count(*) AS BIGINT) AS idx_cells,
         CAST(sum(CASE WHEN refit THEN 1 ELSE 0 END) AS BIGINT) AS idx_refit_cells,
         max(share_ppm) AS idx_max_share_ppm,
         max(mean_dist2) AS idx_max_mean_dist2,
         bool_or(refit) AS idx_refit_due
  FROM v17_leg),
ann AS (
  SELECT CAST(count(*) AS BIGINT) AS ann_probes,
         CAST(sum(n_hits) AS BIGINT) AS ann_hits_total,
         CAST(min(n_hits) AS BIGINT) AS ann_min_hits,
         (CAST(sum(n_hits) AS BIGINT) * 1000000)
           // (count(*) * {V18_K}) AS ann_mean_recall_ppm,
         sum(n_hits) * {V20_RECALL_FLOOR_DEN}
           < count(*) * {V18_K} * {V20_RECALL_FLOOR_NUM} AS ann_degraded
  FROM v18_leg)
SELECT c.source, c.n_a, c.n_b, c.retained, c.added, c.removed, c.churn_ppm,
       (c.added + c.removed) * {V20_CHURN_ALERT_DEN}
         > (c.n_a + c.n_b) * {V20_CHURN_ALERT_NUM} AS churn_alert,
       idx.idx_cells, idx.idx_refit_cells, idx.idx_max_share_ppm,
       idx.idx_max_mean_dist2, idx.idx_refit_due,
       ann.ann_probes, ann.ann_hits_total, ann.ann_min_hits,
       ann.ann_mean_recall_ppm, ann.ann_degraded,
       NOT ((c.added + c.removed) * {V20_CHURN_ALERT_DEN}
              > (c.n_a + c.n_b) * {V20_CHURN_ALERT_NUM}
            OR idx.idx_refit_due OR ann.ann_degraded) AS healthy
FROM churn_leg c CROSS JOIN idx CROSS JOIN ann"""


def q_store_health_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v20_prod: the dashboard over the three PRODUCTION kernels —
    dd17_prod's xxhash64 content keys, v17_prod's trained
    corpus-adaptive quantizer, v18_prod's murmur/multi-probe
    bucketing. Bench-only (each prod kernel is bench-only for its own
    documented reason); composition semantics are certified by v20."""
    churn = q_snapshot_churn_prod(spark, sf_dir)
    idx = q_index_maintenance_prod(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("idx_cells"),
        F.sum(F.col("refit").cast("long")).alias("idx_refit_cells"),
        F.max("share_ppm").alias("idx_max_share_ppm"),
        F.max("mean_dist2").alias("idx_max_mean_dist2"),
        F.bool_or("refit").alias("idx_refit_due"),
    )
    ann = (
        q_recall_report_prod(spark, sf_dir)
        .agg(
            F.count(F.lit(1)).alias("ann_probes"),
            F.sum("n_hits").alias("ann_hits_total"),
            F.min("n_hits").alias("ann_min_hits"),
        )
        .withColumn(
            "ann_mean_recall_ppm",
            F.expr(f"(ann_hits_total * 1000000) div (ann_probes * {V18_K})"),
        )
        .withColumn(
            "ann_degraded",
            F.expr(
                f"ann_hits_total * {V20_RECALL_FLOOR_DEN} < "
                f"ann_probes * {V18_K} * {V20_RECALL_FLOOR_NUM}"
            ),
        )
    )
    return (
        churn.select(
            "source",
            "churn_ppm",
            F.expr(
                f"(added + removed) * {V20_CHURN_ALERT_DEN} > "
                f"(n_a + n_b) * {V20_CHURN_ALERT_NUM}"
            ).alias("churn_alert"),
        )
        .crossJoin(F.broadcast(idx))
        .crossJoin(F.broadcast(ann))
        .withColumn(
            "healthy",
            ~(
                F.col("churn_alert")
                | F.col("idx_refit_due")
                | F.col("ann_degraded")
            ),
        )
    )


BENCH_ONLY["v20_prod"] = q_store_health_prod
