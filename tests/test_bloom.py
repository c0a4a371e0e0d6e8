"""Bloom decontamination (t15) + round-8 sampling operators (x12/x13):
operator-level properties the oracle hash can't see — the Bloom
no-false-negative guarantee under load, probe-path agreement, the
production plan shape, and sampler selection invariants."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from nyc_taxi_etl_dashboard_spark.operators import bloom
from nyc_taxi_etl_dashboard_spark.operators.text import with_shingles


@pytest.fixture(scope="module")
def shingled(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = with_shingles(d.select("doc_id", "source", "text"))
    ev = (
        sh.filter(F.col("source") == "src0")
        .select(F.explode("shingle").alias("sh"))
        .distinct()
        .cache()
    )
    tr = (
        sh.filter(F.col("source") != "src0")
        .select("doc_id", F.explode("shingle").alias("sg"))
        .withColumn("H", bloom.shingle_hash("sg"))
        .cache()
    )
    yield ev, tr
    ev.unpersist()
    tr.unpersist()


def test_superset_no_false_negative(spark, shingled):
    """Every exact eval hit must be a bloom hit — the one-sided-error
    contract, asserted per shingle (not just per doc)."""
    ev, tr = shingled
    words = bloom.bloom_build(ev, "sh")
    flagged = tr.withColumn("hit", bloom.bloom_member_expr(F.col("H"), words))
    misses = (
        flagged.join(F.broadcast(ev), flagged.sg == ev.sh)
        .filter(~F.col("hit"))
        .count()
    )
    assert misses == 0


def test_arrow_path_equals_jvm_path(spark, shingled):
    """The Arrow-kernel probe (production, big-m) and the JVM literal
    probe (certification) must make identical per-row decisions."""
    ev, tr = shingled
    words = bloom.bloom_build(ev, "sh")
    jvm = tr.withColumn("hit", bloom.bloom_member_expr(F.col("H"), words))
    arrow = bloom.bloom_member_arrow(tr, "H", words, out="hit")
    disagree = (
        jvm.select("doc_id", "sg", "hit")
        .join(
            arrow.select("doc_id", "sg", F.col("hit").alias("hit2")),
            ["doc_id", "sg"],
        )
        .filter(F.col("hit") != F.col("hit2"))
        .count()
    )
    assert disagree == 0


def test_superset_holds_under_heavy_load(spark, shingled):
    """At a deliberately undersized m (1024 bits, heavy saturation) the
    fp rate is large but false negatives remain impossible."""
    ev, tr = shingled
    m = 1024
    words = bloom.bloom_build(ev, "sh", m=m)
    flagged = tr.withColumn(
        "hit", bloom.bloom_member_expr(F.col("H"), words, m=m)
    )
    exact = tr.join(F.broadcast(ev), tr.sg == ev.sh).count()
    hits = flagged.filter("hit").count()
    assert hits >= exact  # superset survives saturation
    assert hits > exact  # and saturation demonstrably produces fps


def test_prod_plan_has_no_shingle_join(spark, sf_dir):
    """t8's probe is a broadcast semi-join on shingle STRINGS; t15_prod's
    probe must be join-free — the only join left is the doc-level spine
    join after aggregation. Counting Join operators in the physical
    plan: t8 has 2, t15_prod exactly 1."""
    from nyc_taxi_etl_dashboard_spark.plans.llmops import (
        q_bloom_decontaminate_prod,
        q_decontaminate,
    )

    prod_plan = q_bloom_decontaminate_prod(
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    exact_plan = q_decontaminate(
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert prod_plan.count("Join") < exact_plan.count("Join")
    n_joins = sum(
        1 for line in prod_plan.splitlines() if "BroadcastHashJoin" in line or "SortMergeJoin" in line
    )
    assert n_joins == 1, prod_plan


def test_bitset_bounded_by_m(spark, shingled):
    """bloom_build's driver collect is bounded by m bits regardless of
    member-set size — the scale-safety property."""
    ev, _ = shingled
    m = 256
    words = bloom.bloom_build(ev, "sh", m=m)
    assert words.size == m // 64
    assert sum(bin(int(w)).count("1") for w in words) <= m


def test_x12_equals_plain_window(spark, sf_dir):
    """x12's skew-safe selection must equal the plain per-cell window."""
    from pyspark.sql import Window

    from nyc_taxi_etl_dashboard_spark.operators.similarity import rhp_cell_portable
    from nyc_taxi_etl_dashboard_spark.plans.llmops import (
        X12_CELL_CAP,
        X12_PLANES,
        q_diversity_sample,
    )

    got = {
        (r.vec_id, r.cell)
        for r in q_diversity_sample(spark, sf_dir).collect()
    }
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cells = e.select(
        "vec_id",
        rhp_cell_portable("embedding", n_planes=X12_PLANES).alias("cell"),
        ((F.col("vec_id") * F.lit(2654435761)) % F.lit(1000003)).alias("prio"),
    )
    w = Window.partitionBy("cell").orderBy("prio", "vec_id")
    want = {
        (r.vec_id, r.cell)
        for r in cells.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= X12_CELL_CAP)
        .collect()
    }
    assert got == want
    assert all(0 <= c < (1 << X12_PLANES) for _, c in got)


def test_x13_selects_highest_priorities(spark, sf_dir):
    """Within each language, every kept doc's priority must be >= every
    dropped doc's priority (ties broken by doc_id), and the per-stratum
    count never exceeds the cap."""
    from nyc_taxi_etl_dashboard_spark.plans.llmops import (
        X13_PER_STRATUM,
        q_weighted_sample,
    )

    kept = q_weighted_sample(spark, sf_dir).collect()
    per_lang: dict = {}
    for r in kept:
        per_lang.setdefault(r.lang, []).append(r)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    allrows = d.select(
        "doc_id",
        "lang",
        F.array_size(F.split("text", " ")).cast("bigint").alias("w"),
        (((F.col("doc_id") * F.lit(2654435761)) % F.lit(1000003)) + F.lit(1)).alias(
            "h"
        ),
    ).collect()
    for lang, rows in per_lang.items():
        assert len(rows) <= X13_PER_STRATUM
        kept_ids = {r.doc_id for r in rows}
        pri = {
            r.doc_id: (float(r.w) * 1000004.0 / r.h, r.doc_id)
            for r in allrows
            if r.lang == lang
        }
        dropped = [v for k, v in pri.items() if k not in kept_ids]
        if dropped and len(rows) == X13_PER_STRATUM:
            # kept set = top-N under (priority desc, doc_id asc): the
            # worst kept row still beats the best dropped row
            worst_kept = min((pri[i][0], -i) for i in kept_ids)
            best_drop = max((p, -i) for p, i in dropped)
            assert worst_kept >= best_drop


def test_t16_plan_and_idf_ordering(spark, sf_dir):
    """BM25 must plan as map-side scoring + TakeOrderedAndProject (no
    explode, no global sort), and the rare term must dominate: a doc
    containing 'dup' (df ~5%) outranks any doc with the same tf count
    of common terms only."""
    from nyc_taxi_etl_dashboard_spark.plans.llmops import q_bm25_topk

    df = q_bm25_topk(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Generate" not in plan  # no explode anywhere
    rows = df.collect()
    assert 0 < len(rows) <= 25
    # ranks are 1..n dense and ordered by score desc
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    # the top doc contains the rare query term
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    top_text = d.filter(d.doc_id == rows[0].doc_id).collect()[0].text
    assert "dup" in top_text.split()


def test_build_agg_equals_driver_build(spark, shingled):
    """All THREE bitset builds — driver distinct-collect, per-partition
    agg (driver OR), and executor treeReduce — must produce the exact
    same bitset: OR is associative/commutative, so reduction topology
    cannot change a bit (the treeReduce escalation path must be a pure
    transport change)."""
    ev, _ = shingled
    a = bloom.bloom_build(ev, "sh")
    b = bloom.bloom_build_agg(ev, "sh")
    c = bloom.bloom_build_tree(ev, "sh")
    assert np.array_equal(a, b)
    assert np.array_equal(a, c)
    # and on a repartitioned input (different partition bitmaps, same OR)
    c2 = bloom.bloom_build_tree(ev.repartition(7), "sh", depth=3)
    assert np.array_equal(a, c2)


def test_x14_stage_boundaries(spark, sf_dir):
    """Each x14 stage must actually bite on the fixture, in order:
    quota < corpus(minus eval), decon <= quota, sample <= decon,
    final <= sample and <= 16 cells x cap."""
    from nyc_taxi_etl_dashboard_spark.operators import bloom
    from nyc_taxi_etl_dashboard_spark.operators.skew import capped_keep_first
    from nyc_taxi_etl_dashboard_spark.plans.llmops import (
        X14_CELL_BITS,
        X14_CELL_CAP,
        X14_PER_LANG,
        _quota_expr,
        q_curation_pipeline_v3,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_train = d.filter(F.col("source") != "src0").count()
    quota_keep = capped_keep_first(
        d.select("doc_id", "source"), "source", "doc_id", _quota_expr()
    )
    n_quota = quota_keep.filter(F.col("source") != "src0").count()
    final = q_curation_pipeline_v3(spark, sf_dir).collect()
    assert n_quota <= n_train
    assert len(final) <= min(5 * X14_PER_LANG, (1 << X14_CELL_BITS) * X14_CELL_CAP)
    assert 0 < len(final) <= n_quota
    # no eval docs and no over-cap cell in the output
    srcs = {r.source for r in final}
    assert "src0" not in srcs
    from collections import Counter

    per_cell = Counter(r.cell for r in final)
    assert max(per_cell.values()) <= X14_CELL_CAP
