"""Close the t23 scoring-form question (SURVEY §24 item 2): on a
corpus whose languages use DISJOINT alphabets — sparse profile matches,
the regime real multilingual text lives in — does the matched-only
scoring decomposition beat the naive crossJoin-langs form?

Round-15 context: the naive form won the interleaved A/B on the corpus
fixture (2.65/41.5 s vs 3.22/44.3 s at 1×/100×) because its synthetic
languages share one vocabulary, so ~every doc-profile trigram matches
~every language profile and the penalty stream the rewrite avoids
barely exists. This tool synthesizes the opposite fixture — 5 languages
over disjoint 5-letter alphabets, 500 k docs × 40 tokens, deterministic
hash arithmetic — and re-runs the same interleaved min-of-2 A/B.

Usage: python tools/langid_ab.py [n_docs]   (default 500_000)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
FIXTURE = f"/tmp/langid_{N_DOCS}"


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from nyc_taxi_etl_dashboard_spark.operators import clear_nparts_memo
    from nyc_taxi_etl_dashboard_spark.plans.llmops import T23_K, T23_K_DOC
    from nyc_taxi_etl_dashboard_spark.session import get_spark

    spark = get_spark(app_name="langid-ab")
    spark.sparkContext.setLogLevel("ERROR")

    doc_path = os.path.join(FIXTURE, "documents.parquet")
    if not os.path.exists(doc_path):
        # lang i writes 4-char tokens over chars [97+5i .. 97+5i+4]
        # (a-e, f-j, k-o, p-t, u-y): disjoint alphabets, zipfy-enough
        # token mix from xxhash64 arithmetic, fully deterministic
        spark.range(N_DOCS).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("l"), (F.col("id") % 5).cast("string")).alias("lang"),
            F.expr(
                "array_join(transform(sequence(1, 40), t -> "
                " concat_ws('', transform(sequence(1, 4), k -> "
                "  char(97 + (id % 5) * 5 + pmod(xxhash64(id * 997 + t * 31 + k), 5))"
                " ))), ' ')"
            ).alias("text"),
            F.lit("s").alias("source"),
            F.lit(0).cast("bigint").alias("n_chars"),
        ).repartition(32).write.mode("overwrite").parquet(doc_path)

    d = spark.read.parquet(doc_path).select("doc_id", "lang", "text")

    def profiles():
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
        return doc_prof, lang_prof, langs

    def finish(scored):
        w_best = Window.partitionBy("doc_id").orderBy(F.asc("dist"), F.asc("cand"))
        best = (
            scored.withColumn("rn", F.row_number().over(w_best))
            .filter(F.col("rn") == 1)
            .select("doc_id", F.col("cand").alias("lang_pred"), "dist")
        )
        return best.join(d.select("doc_id", "lang"), "doc_id").select(
            "doc_id", "lang", "lang_pred", "dist",
            (F.col("lang") == F.col("lang_pred")).alias("correct"),
        )

    def naive(_spark, _sf):
        doc_prof, lang_prof, langs = profiles()
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
        return finish(scored)

    def matched_only(_spark, _sf):
        doc_prof, lang_prof, langs = profiles()
        nrows = doc_prof.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_rows"))
        m = (
            doc_prof.join(F.broadcast(lang_prof), "tg")
            .groupBy("doc_id", "cand")
            .agg(
                F.sum(
                    F.abs(F.col("doc_rank") - F.col("lang_rank")) - T23_K
                ).alias("adj")
            )
        )
        scored = m.join(nrows, "doc_id").select(
            "doc_id", "cand",
            (F.col("n_rows") * T23_K + F.col("adj")).alias("dist"),
        )
        min_cand = langs.agg(F.min("cand").alias("cand"))
        unmatched = (
            nrows.join(scored.select("doc_id").distinct(), "doc_id", "left_anti")
            .crossJoin(F.broadcast(min_cand))
            .select("doc_id", "cand", (F.col("n_rows") * T23_K).alias("dist"))
        )
        return finish(scored.unionByName(unmatched))

    def timed(fn):
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            clear_nparts_memo()
            t0 = time.perf_counter()
            fn(spark, None).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 2)

    # warm-up
    naive(spark, None).limit(1).collect()

    # the rewrite's equivalence proof, re-checked on THIS fixture
    n_rows = naive(spark, None)
    m_rows = matched_only(spark, None)
    diff = n_rows.exceptAll(m_rows).count() + m_rows.exceptAll(n_rows).count()
    assert diff == 0, f"forms disagree on {diff} rows"

    # interleaved A/B/A/B
    n1 = timed(naive)
    m1 = timed(matched_only)
    n2 = timed(naive)
    m2 = timed(matched_only)

    acc = (
        naive(spark, None)
        .agg(F.avg(F.col("correct").cast("double")))
        .collect()[0][0]
    )
    print(
        f"\nLANGID_AB: docs={N_DOCS} naive={min(n1, n2)} "
        f"matched_only={min(m1, m2)} (runs n:{n1},{n2} m:{m1},{m2}) "
        f"accuracy={round(acc, 4)}"
    )


if __name__ == "__main__":
    main()
