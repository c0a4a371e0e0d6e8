"""Local mini-driver: run every ``queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB, compare row count + column names +
order-insensitive values. Mirrors the external correctness gate so
mismatches surface in pytest first.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod


def _normalize(rows, colnames):
    """Sort columns by name, stringify cells deterministically."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def cell(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            # canonical repr: collapses 2.0 vs 2 and float32 noise
            return repr(round(v, 9))
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


NAMES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    q = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    sdf = q(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns
    if name not in oracles:
        assert len(srows) >= 0  # rows-only contract
        return
    cur = duck.execute(oracles[name])
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs {len(orows)}"
    snorm = _normalize([tuple(r) for r in srows], scols)
    onorm = _normalize(orows, ocols)
    mismatches = [i for i, (a, b) in enumerate(zip(snorm, onorm)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"spark={snorm[mismatches[0]]} oracle={onorm[mismatches[0]]}"
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert df.columns


def test_hash_sample_agrees_past_int32_keys(spark):
    """x2's deterministic sample must give identical membership in Spark
    and DuckDB for keys FAR past 2^32: the raw Knuth multiply
    (key * 2654435761) overflows int64 at keys ~3.5e9 — non-ANSI Spark
    wraps, DuckDB promotes to HUGEINT, and the engines silently diverge.
    The mod-reduce by HASH_SAMPLE_PRIME keeps the product < 2^63 on both
    sides for any int64 key; this pins the agreement at 2^33..2^62."""
    import duckdb

    from nyc_taxi_etl_dashboard_spark.plans.analytics_ext import HASH_SAMPLE_PRIME

    keys = [
        2**32 + 5,
        2**33 + 123,
        7_000_000_000,
        2**40 + 7,
        2**52 + 99991,
        2**62 + 12345,
        (2**63) - 1,
    ]
    sdf = spark.createDataFrame([(k,) for k in keys], "k long").select(
        "k",
        (((F.col("k") % F.lit(HASH_SAMPLE_PRIME)) * F.lit(2654435761)) % F.lit(100)).alias(
            "bucket"
        ),
    )
    got = {r.k: r.bucket for r in sdf.collect()}
    con = duckdb.connect()
    orows = con.execute(
        "SELECT k, ((k % 1000003) * 2654435761) % 100 AS bucket "
        "FROM (SELECT unnest(?::BIGINT[]) AS k)",
        [keys],
    ).fetchall()
    con.close()
    want = {k: b for k, b in orows}
    assert got == want
    # and pure-python ground truth (int is unbounded — no overflow at all)
    assert got == {k: ((k % HASH_SAMPLE_PRIME) * 2654435761) % 100 for k in keys}


def test_registry_window_membership():
    """The driver verifies only the first CORRECTNESS_WINDOW registry
    entries each round; rotation decisions live in
    ``__spark_entry__.PRIORITY_IN_WINDOW`` / ``PRIORITY_TAIL``. This
    pins the invariant that sat broken for two rounds as comments (the
    x9 off-by-one, fixed r8; VERDICT r8 item 6 asked for this guard):

    - every PRIORITY_IN_WINDOW name actually lands at index < 50
    - every name at index >= 50 is either overflow-prefixed
      (``_is_overflow``) or explicitly listed in PRIORITY_TAIL —
      nothing claimed-in-window can silently spill
    - every oracle-backed query names a registered query and vice versa
    """
    names = list(entrymod.queries().keys())
    idx = {n: i for i, n in enumerate(names)}
    win = entrymod.CORRECTNESS_WINDOW

    missing = [n for n in entrymod.PRIORITY_IN_WINDOW if n not in idx]
    assert not missing, f"priority names not in registry: {missing}"
    spilled = [n for n in entrymod.PRIORITY_IN_WINDOW if idx[n] >= win]
    assert not spilled, (
        f"claimed-in-window queries past index {win - 1}: "
        f"{[(n, idx[n]) for n in spilled]}"
    )
    stray = [
        n
        for n in names[win:]
        if not entrymod._is_overflow(n) and n not in entrymod.PRIORITY_TAIL
    ]
    assert not stray, (
        f"queries silently pushed past the {win}-query window: "
        f"{[(n, idx[n]) for n in stray]}"
    )
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(names), sorted(set(oracles) - set(names))


def test_bench_suites_resolve_in_registry():
    """bench.py's suites are plain name lists; a query rename/removal
    would otherwise surface only when the DRIVER runs the round's bench
    (round 14 — the suites gained mid-run probes and the name lists now
    gate three phases). Pin: every HEADLINE/CURATION name is a
    registered query, and the BENCH_ONLY prod paths never shadow a
    registered name (they are timed with different hygiene and MUST
    stay out of the oracle registry — their outputs are approximate)."""
    import bench

    from nyc_taxi_etl_dashboard_spark.plans.llmops import BENCH_ONLY

    names = set(entrymod.queries().keys())
    missing = [n for n in [*bench.HEADLINE, *bench.CURATION] if n not in names]
    assert not missing, f"bench suite names not in registry: {missing}"
    overlap = set(BENCH_ONLY) & names
    assert not overlap, f"BENCH_ONLY shadows registered queries: {sorted(overlap)}"
    # the transform specials are computed inline by bench.main, never
    # via the suites — keep them out so they aren't double-timed
    assert "pipe_transform_full" not in bench.HEADLINE
    assert "pipe_transform_bronze" not in bench.HEADLINE


def test_tie_safe_round_planted_ties_agree_cross_engine(spark, duck):
    """SURVEY §8 / VERDICT r15 item 1: round(raw-double, 6) of an
    integer ratio is engine-dependent exactly at representational ties
    (k/2^a values whose expansion terminates at digit 7 with a 5 —
    e.g. 1/128 = 0.0078125). The decimal bridge must make BOTH legs
    produce the identical, HALF_UP-quantized double at every planted
    tie, independent of how each engine's raw round() behaves (this
    container's duckdb happens to round half-up too — which is WHY the
    r15 driver reds never reproduced locally; the bridge removes the
    environment dependence rather than matching one environment)."""
    from nyc_taxi_etl_dashboard_spark.functions import tie_safe_round

    ties = [(1, 128), (3, 128), (5, 128), (1, 640), (7, 1280), (129, 2560)]
    sdf = spark.createDataFrame(ties, "num long, den long").select(
        "num",
        "den",
        tie_safe_round(F.col("num") / F.col("den"), 6).alias("bridged"),
    )
    got = {(r.num, r.den): r.bridged for r in sdf.collect()}
    for (num, den), bridged in got.items():
        o = duck.execute(
            f"SELECT CAST(round(CAST({num} * 1.0 / {den} AS DECIMAL(28,12)), 6)"
            " AS DOUBLE)"
        ).fetchone()[0]
        assert repr(bridged) == repr(o), (num, den, bridged, o)
        # HALF_UP at the tie: 1/128 -> 0.007813, never 0.007812
        import decimal

        exact = decimal.Decimal(num) / decimal.Decimal(den)
        expect = float(exact.quantize(decimal.Decimal("0.000001"),
                                      rounding=decimal.ROUND_HALF_UP))
        assert repr(bridged) == repr(expect), (num, den, bridged, expect)


def test_tie_safe_round_bulk_random_ratios_agree_cross_engine(spark, duck):
    """Randomized extension of the planted-ties pin: 400 seeded
    integer ratios (denominators biased toward the 2,5-smooth class
    where ties live) bridged on both engines in bulk must agree
    repr-exactly — catches any residual quantization-class divergence
    the hand-planted six could miss."""
    import random

    from nyc_taxi_etl_dashboard_spark.functions import tie_safe_round

    rng = random.Random(16)
    smooth = [2, 4, 5, 8, 10, 16, 20, 25, 32, 64, 128, 160, 256, 640,
              1280, 2000, 2560, 10000]
    cases = []
    for i in range(400):
        den = rng.choice(smooth) if i % 2 else rng.randint(1, 5000)
        num = rng.randint(0, 4 * den)
        cases.append((num, den))
    sdf = spark.createDataFrame(cases, "num long, den long").select(
        "num", "den", tie_safe_round(F.col("num") / F.col("den"), 6).alias("b")
    )
    got = {(r.num, r.den): repr(r.b) for r in sdf.collect()}
    values = ", ".join(f"({n}, {d})" for n, d in cases)
    orows = duck.execute(
        "SELECT num, den, CAST(round(CAST(num * 1.0 / den AS DECIMAL(28,12)), 6)"
        f" AS DOUBLE) FROM (VALUES {values}) v(num, den)"
    ).fetchall()
    for num, den, o in orows:
        assert got[(num, den)] == repr(o), (num, den, got[(num, den)], o)


# ---------------------------------------------------------------------------
# SURVEY §8 integer-contract pin (round 17, VERDICT r16 item 2)
# ---------------------------------------------------------------------------
# Every DOUBLE column on an oracle-checked contract, classified. The
# forbidden class — a ROUNDED ratio of integer counts cast back to
# double — is empty by construction: those columns are exact ppm longs
# (floor division) since round 17, after the driver environment
# hash-rejected the decimal(18,12) bridge on dd17/x29/v20 two rounds
# running. Safe classes:
#   money      — decimal-bridged money sums/averages or row passthroughs
#                (star.py precedent; 2dp/4dp; 16 rounds driver-green)
#   refparity  — the reference dashboard's own float measures (§2 A/P
#                surface): semantics ARE the reference's float outputs
#   transcend  — ln/exp/pow/stddev outputs: not integer ratios; rounded
#                because libm itself is not correctly rounded
#   cosine     — dot/norm folds (sequential HOF, bit-identical SQL twin)
#   raw_ratio  — UNROUNDED integer ratios: one IEEE division of exact
#                ints is bit-identical in every engine (never round it)
ALLOWED_DOUBLE_CONTRACTS = {
    "a10_daily_avg_revenue": {"daily_avg_revenue": "money"},
    "a11_median_distance": {"median_distance": "refparity"},
    "a12_kpi_ratios": {"utilization_pct": "refparity",
                       "tipping_rate": "refparity",
                       "avg_commercial_speed": "refparity"},
    "a13_revenue_by_payment": {"revenue": "money"},
    "a14_passengers_by_period": {"pct_of_total": "refparity"},
    "a16_revenue_by_location": {"revenue": "money"},
    "a17_calendar_rollup": {"revenue": "money"},
    "a18_cube_status_flag": {"qty": "money"},
    "a22_pivot_status_flag": {"qty_n": "money", "qty_a": "money",
                              "qty_r": "money"},
    "a23_unpivot_amounts": {"amount": "money"},
    "a24_stat_moments": {"sd_qty": "transcend", "var_price": "transcend",
                         "corr_qty_price": "transcend",
                         "cov_disc_tax": "transcend"},
    "a26_mom_growth": {"rev": "money", "growth_pct": "money"},
    "a27_salted_revenue": {"revenue": "money"},
    "a28_cube_qty": {"qty": "money"},
    "a7_total_revenue": {"total_revenue": "money"},
    "a7b_total_revenue_tip": {"total_revenue": "money",
                              "tipping_rate": "refparity"},
    "a8_avg_fare": {"avg_fare": "refparity"},
    "dd2_jaccard_pairs": {"jaccard": "raw_ratio"},
    "dd4_lsh_pairs": {"jaccard": "raw_ratio"},
    "dd9_jaccard_estimate": {"jaccard_est": "raw_ratio",
                             "jaccard": "raw_ratio",
                             "abs_err": "raw_ratio"},
    "e2_tumbling_counts": {"total_value": "money"},
    "e5_hypertable_rollup": {"total_value": "money"},
    "j1_star_flatten_revenue": {"revenue": "money"},
    "j2_asof_join": {"o_totalprice": "money"},
    "j6_salted_join": {"total_price": "money"},
    "o2_top10_orders": {"o_totalprice": "money"},
    "p9_sliced_trips": {"revenue": "money"},
    "pipe_report_stats": {"anomaly_rate_pct": "refparity",
                          "avg_duration_min": "refparity",
                          "avg_speed_val": "refparity",
                          "total_fare": "money"},
    "pipe_valid_rows": {"trip_distance": "money", "fare_amount": "money",
                        "total_amount": "money", "trip_duration": "money",
                        "avg_speed": "raw_ratio"},
    "st4_fact_resolved": {"trip_distance": "money", "fare_amount": "money",
                          "total_amount": "money", "duration_min": "money"},
    "t10_unigram_logprob": {"avg_logprob": "transcend"},
    "t12_lm_percentile_gate": {"avg_logprob": "transcend"},
    "t13_lm_gate_at_scale": {"exact_p10": "transcend"},
    "t14_quality_classifier": {"quality_score": "transcend"},
    "t16_bm25_topk": {"bm25": "transcend"},
    "t17_bigram_logprob": {"avg_bigram_logprob": "transcend"},
    "t19_contamination_audit": {"top_containment": "raw_ratio"},
    "t20_distribution_drift": {"kl_ab": "transcend", "kl_ba": "transcend"},
    "t21_ngram_diversity": {"entropy": "transcend"},
    "t2_quality_features": {"distinct_ratio": "raw_ratio",
                            "stopword_ratio": "raw_ratio",
                            "mean_token_len": "raw_ratio"},
    "t8_decontaminate": {"overlap": "raw_ratio"},
    "t9_repetition": {"top_bigram_frac": "raw_ratio",
                      "dup_bigram_frac": "raw_ratio"},
    "v11_pq_adc": {"cosine": "cosine"},
    "v13_knn_outliers": {"mean_knn_cos": "cosine"},
    "v14_filtered_ann": {"cosine": "cosine"},
    "v15_prototype_prune": {"proto_cosine": "cosine"},
    "v16_density_gate": {"density_score": "cosine"},
    "v17_index_maintenance": {"mean_dist2": "cosine"},
    "v19_rerank_stack": {"adc": "cosine", "cosine": "cosine"},
    "v1_embedding_norms": {"l2": "cosine"},
    "v20_store_health": {"idx_max_mean_dist2": "cosine"},
    "v2_knn_bruteforce": {"cosine": "cosine"},
    "v3_centroid_norms": {"centroid_l2": "cosine"},
    "v4_knn_lsh": {"cosine": "cosine"},
    "v5_ivf_ann": {"cosine": "cosine"},
    "v6_embedding_dedup": {"cosine": "cosine"},
    "v7_ivf_trained": {"cosine": "cosine"},
    "v8_sq_cosine": {"cos_sq": "cosine", "cosine": "cosine",
                     "abs_err": "cosine"},
    "v9_embedding_decontam": {"max_eval_cosine": "cosine"},
    "w1_top3_locations_per_period": {"revenue": "money"},
    "w3_moving_avg": {"rev": "money", "rev_ma7": "money"},
    "w5_lag_lead_delta": {"delta_prev": "money", "delta_next": "money"},
    "w6_cumulative_revenue": {"rev": "money", "cum_rev": "money"},
    "x1_grouped_ewm": {"ewm_value": "transcend"},
    "x20_temperature_mix": {"share_raw": "transcend",
                            "share_temp": "transcend",
                            "sample_rate": "transcend"},
    "x23_dsir_resample": {"log_w": "transcend"},
    "x24_curriculum_schedule": {"qscore": "transcend"},
    "x25_dsir_balanced": {"log_w": "transcend"},
    "x26_embedding_curation": {"density_score": "cosine"},
    "x27_joint_curation": {"density_score": "cosine"},
    "x2_hash_sample": {"o_totalprice": "money"},
    "x8_mixture_plan": {"target_share": "transcend",
                        "max_corpus": "transcend",
                        "sample_rate": "transcend",
                        "achieved_share": "transcend"},
}


def test_double_contract_columns_all_classified(duck):
    """Every DOUBLE column on every oracle-checked contract must carry
    an explicit safe-class entry above. A new rounded-integer-ratio
    double cannot ship without editing this table — and the review that
    edit invites is the point. Schema source: DuckDB LIMIT-0 plan of
    the oracle itself (the driver's own comparison leg)."""
    got = {}
    for name, sql in entrymod.oracle_sql().items():
        rel = duck.sql(f"SELECT * FROM ({sql}) LIMIT 0")
        dbl = [c for c, t in zip(rel.columns, rel.types)
               if str(t) in ("DOUBLE", "FLOAT", "REAL")]
        if dbl:
            got[name] = sorted(dbl)
    want = {k: sorted(v) for k, v in ALLOWED_DOUBLE_CONTRACTS.items()}
    assert got == want, (
        "double contract columns drifted from the classified allowlist:\n"
        f"unclassified: { {k: sorted(set(got.get(k, [])) - set(want.get(k, []))) for k in got if set(got.get(k, [])) - set(want.get(k, []))} }\n"
        f"stale entries: { {k: sorted(set(want.get(k, [])) - set(got.get(k, []))) for k in want if set(want.get(k, [])) - set(got.get(k, []))} }"
    )


def test_no_rounded_percent_rank_in_oracles():
    """No oracle may round a percent_rank — the rounded-window-ratio
    construct from the r15-r16 float-parity war. (Decimal bridges on
    count ratios are covered structurally: the HUGEINT/type-whitelist
    audit below rejects any DECIMAL output column, and
    ``test_double_contract_columns_all_classified`` forces every DOUBLE
    contract through the classified allowlist.)"""
    import re

    bad = []
    for name, sql in entrymod.oracle_sql().items():
        if re.search(r"round\(\s*CAST\(\s*percent_rank", sql, re.I):
            bad.append((name, "rounded percent_rank"))
    assert not bad, bad


#: The only DuckDB output types an oracle may produce. Anything outside
#: this set fetches through pandas/Arrow as a DIFFERENT physical type
#: than the Spark column it must hash-equal — HUGEINT (DuckDB's silent
#: promotion of sum(INT/BIGINT) and large integer products to int128)
#: fetches as float64/decimal128 and was the EXACT root cause of the
#: dd17/v17/x29/v20 driver hash-reds in rounds 15-17 (VERDICT r17 item
#: 1). DECIMAL would be the same hazard tomorrow; neither may appear.
ORACLE_TYPE_WHITELIST = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
    "DOUBLE", "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP",
}


#: The exact Spark-simpleString ↔ DuckDB-type pairs a contract column
#: may use. Audited round 18 across all 628 oracle-checked columns:
#: exactly these five pairs occur — both legs always land on the SAME
#: physical width, so no driver fetch-normalization is ever exercised
#: (the dd3 int32-vs-BIGINT and a25 value-dependent-lit cases were
#: aligned in the same audit).
SPARK_DUCK_TYPE_PAIRS = {
    ("bigint", "BIGINT"),
    ("int", "INTEGER"),
    ("double", "DOUBLE"),
    ("string", "VARCHAR"),
    ("boolean", "BOOLEAN"),
}


def test_oracle_types_map_one_to_one_to_spark_schema(spark, duck, sf_dir):
    """VERDICT r17 item 2 (extended form): for every oracle-checked
    query, each output column's Spark type and DuckDB type must form
    one of the five exact pairs above — same column name, same
    physical width, both legs. This is strictly stronger than the
    HUGEINT whitelist: it catches a Spark-side width drift (e.g. a
    lit() whose type depends on the VALUE, the a25 case) just as it
    catches a DuckDB-side promotion. Cheap by construction: Spark
    schema from plan analysis, DuckDB schema from a LIMIT-0 bind."""
    oracles = entrymod.oracle_sql()
    bad = {}
    for name, q in entrymod.queries().items():
        if name not in oracles:
            continue
        sdf = q(spark, sf_dir)
        stypes = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
        rel = duck.sql(f"SELECT * FROM ({oracles[name]}) LIMIT 0")
        otypes = dict(zip(rel.columns, [str(t) for t in rel.types]))
        for c, st in stypes.items():
            ot = otypes.get(c)
            if ot is not None and (st, ot) not in SPARK_DUCK_TYPE_PAIRS:
                bad.setdefault(name, []).append((c, st, ot))
    assert not bad, f"contract columns with mismatched physical types: {bad}"


def test_oracle_output_types_whitelisted_no_hugeint(duck):
    """Derive every oracle's LIMIT-0 output schema in DuckDB and assert
    every column type is in ORACLE_TYPE_WHITELIST — in particular that
    no column is HUGEINT or DECIMAL. DuckDB promotes ``sum()`` over
    integers to HUGEINT unless the aggregate is explicitly
    ``CAST(... AS BIGINT)``; a HUGEINT column is numerically equal but
    type-diverges under the driver's value-hash normalization. SURVEY
    §8 rule: oracle aggregate/product columns are always explicitly
    CAST to the Spark column's exact type."""
    bad = {}
    for name, sql in entrymod.oracle_sql().items():
        rel = duck.sql(f"SELECT * FROM ({sql}) LIMIT 0")
        exotic = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if str(t) not in ORACLE_TYPE_WHITELIST
        ]
        if exotic:
            bad[name] = exotic
    assert not bad, (
        "oracle columns with non-whitelisted DuckDB types (HUGEINT/"
        f"DECIMAL fetch-normalization hazard — CAST them): {bad}"
    )


def test_ppm_floor_division_agrees_cross_engine_and_with_fractions(spark, duck):
    """SURVEY §8 integer-contract rule (round 17): the ppm form —
    ``(num * 1000000) div den`` in Spark, ``// `` in DuckDB — must be
    (a) identical across the two engines and (b) equal to exact
    rational floor division (math.floor(Fraction)), for 500 seeded
    pairs spanning the denominators the registry actually emits
    (2,5-smooth, primes, corpus-sized counts) plus the tie shapes that
    broke the rounded-double contracts. Also pins the integer
    threshold gate (num·10 >= den, the pr >= 0.1 shape) against the
    exact rational comparison."""
    import random
    from fractions import Fraction

    rng = random.Random(17)
    dens = [1, 2, 3, 5, 7, 8, 10, 16, 64, 128, 640, 2560, 9973, 10000,
            123457, 1000003]
    cases = [(1, 128), (129, 2560), (1, 3), (2, 3), (999999, 1000000)]
    for i in range(495):
        den = rng.choice(dens) if i % 2 else rng.randint(1, 10**6)
        num = rng.randint(0, 2 * den)
        cases.append((num, den))
    sdf = spark.createDataFrame(cases, "num long, den long").select(
        "num",
        "den",
        F.expr("(num * 1000000) div den").alias("ppm"),
        F.expr("num * 10 >= den").alias("gate"),
    )
    got = {(r.num, r.den): (r.ppm, r.gate) for r in sdf.collect()}
    values = ", ".join(f"({n}, {d})" for n, d in cases)
    orows = duck.execute(
        # CAST to BIGINT: VALUES literals are INT32 in DuckDB; registry
        # oracles never hit this (count()/len()/sum() are already
        # BIGINT+), but the fuzz harness must match that width
        "SELECT num, den, (CAST(num AS BIGINT) * 1000000) // den,"
        " num * 10 >= den"
        f" FROM (VALUES {values}) v(num, den)"
    ).fetchall()
    assert len(orows) == len(cases)
    for num, den, oppm, ogate in orows:
        sppm, sgate = got[(num, den)]
        exact = Fraction(num * 1000000, den)
        assert sppm == int(oppm) == exact.numerator // exact.denominator, (
            num, den, sppm, oppm)
        assert sgate == bool(ogate) == (Fraction(num, den) >= Fraction(1, 10)), (
            num, den)
