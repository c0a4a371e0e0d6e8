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
