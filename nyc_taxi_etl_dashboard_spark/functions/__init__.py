"""Scalar expression helpers (SURVEY §2.9 F1-F13 + portable hashes).

Everything here is a pure Column-expression builder — JVM-side, inside
whole-stage codegen, no Python UDFs (the reference needs none either:
SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Time math (F1-F6)
# --------------------------------------------------------------------------


def coerce_timestamp(col: Column | str) -> Column:
    """F1: parse-with-coercion. ``pd.to_datetime(errors='coerce')``
    (``extract.py:44``) maps to ``to_timestamp`` — both yield null on
    unparseable input instead of raising."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_timestamp(c)


def minutes_between(end: Column | str, start: Column | str) -> Column:
    """F3: timestamp difference in minutes (``transform.py:35-37``).

    Double-cast keeps sub-second fidelity (unix_timestamp truncates to
    whole seconds, which would diverge from pandas' total_seconds()/60).
    TIMESTAMP_NTZ (Spark 4's parquet default) can't cast straight to
    double, so route through TIMESTAMP — value-preserving because the
    session timezone is pinned UTC (see session.pin_session).
    """
    e = F.col(end) if isinstance(end, str) else end
    s = F.col(start) if isinstance(start, str) else start
    return (
        e.cast("timestamp").cast("double") - s.cast("timestamp").cast("double")
    ) / F.lit(60.0)


def day_name(col: Column | str) -> Column:
    """F6: English day name ('Monday'...). The reference relies on
    pandas' fixed English ``dt.day_name()`` (``transform.py:78``);
    ``date_format(col,'EEEE')`` is JVM-locale-sensitive, so build the
    name from locale-independent ``dayofweek`` (1=Sunday)."""
    c = F.col(col) if isinstance(col, str) else col
    return decode_map(
        F.dayofweek(c),
        {
            1: "Sunday",
            2: "Monday",
            3: "Tuesday",
            4: "Wednesday",
            5: "Thursday",
            6: "Friday",
            7: "Saturday",
        },
    )


# --------------------------------------------------------------------------
# Buckets and decode maps (F7-F9)
# --------------------------------------------------------------------------


def bucket(col: Column | str, edges: list[tuple[int, int, str]], default: str = "Inconnu") -> Column:
    """F7: n-way range bucketing; mirrors the ``np.select`` hour bucketing
    (``transform.py:80-88``). ``edges`` is [(lo, hi, label)] inclusive."""
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for lo, hi, label in edges:
        cond = c.between(lo, hi)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return expr.otherwise(F.lit(default))


TIME_PERIOD_EDGES = [
    (0, 5, "Nuit"),
    (6, 11, "Matin"),
    (12, 17, "Après-midi"),
    (18, 23, "Soir"),
]

PAYMENT_LABELS = {1: "Carte de crédit", 2: "Espèces", 3: "Gratuit", 4: "Conflit"}
RATECODE_LABELS = {
    1: "Standard",
    2: "JFK",
    3: "Newark",
    4: "LaGuardia",
    5: "Course partagée",
    6: "Location",
}


def decode_map(col: Column | str, mapping: dict) -> Column:
    """F8/F9: dict decode with null-on-miss, matching pandas ``.map()``
    semantics (``transform.py:93-109`` — unmapped codes like payment_type
    5/6 become null, which later drives inner-join row loss, SURVEY §2.3).

    Emitted as a CASE WHEN chain => whole-stage codegen, no shuffle, and
    for a handful of entries cheaper than a broadcast-join lookup dim.
    """
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for k, v in mapping.items():
        expr = F.when(c == F.lit(k), F.lit(v)) if expr is None else expr.when(c == F.lit(k), F.lit(v))
    return expr.otherwise(F.lit(None).cast("string"))


def time_period(hour_col: Column | str) -> Column:
    """The reference's 4-bucket day segmentation (``transform.py:80-88``)."""
    return bucket(hour_col, TIME_PERIOD_EDGES)


# --------------------------------------------------------------------------
# Portable hashes (NEW surface: dedup/fingerprinting, SURVEY §7.1 step 7)
# --------------------------------------------------------------------------

#: large prime modulus keeps the rolling hash inside BIGINT in every engine
POLY_MOD = 1_000_000_007
POLY_BASE = 131


def token_value(tok: Column) -> Column:
    """Deterministic small integer for a token, computable identically in
    ANSI SQL (for DuckDB oracles): first/last code points + length.

    Intentionally NOT xxhash64 — that is Spark-private. Collision-tolerant
    uses only (rolling fingerprints, SimHash bit sampling); for
    collision-sensitive exact dedup use the full string.
    """
    return (
        F.ascii(tok) * F.lit(10007)
        + F.ascii(F.reverse(tok)) * F.lit(101)
        + F.length(tok)
    )


def poly_fingerprint(tokens: Column) -> Column:
    """Rolling polynomial hash over a token array:
    ``fold(tokens, 0, (acc, t) -> (acc*131 + token_value(t)) % POLY_MOD)``.

    Order-sensitive => a document fingerprint (content + order), the NEW
    text-analysis primitive. Runs as a Catalyst higher-order function —
    no shuffle, no Python.
    """
    return F.aggregate(
        F.transform(tokens, token_value),
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * F.lit(POLY_BASE) + x) % F.lit(POLY_MOD),
    )


# --------------------------------------------------------------------------
# Engine-independent quantization (SURVEY §8 float-parity rule)
# --------------------------------------------------------------------------


def tie_safe_round(col: Column, scale: int, dec: str = "decimal(28,12)") -> Column:
    """N-dp quantization of a raw double that is identical across
    engines. ``round(double, N)`` diverges between Spark and DuckDB
    exactly when the value's shortest decimal expansion terminates at
    digit N+1 with a 5: Spark rounds HALF_UP on the shortest decimal
    representation (BigDecimal.valueOf), DuckDB scaled-multiplies the
    binary value and rounds half-even. That shape is reachable by (a)
    ratios of integers whose reduced denominator is 2,5-smooth (count
    ratios, averages over 2^a·5^b-sized groups, percent_rank), and (b)
    sums of money PRODUCTS (this corpus's fare/tip/total carry 4-6
    exact decimal digits — price×discount×tax) rounded to 2. The fix
    is the star.py money precedent: recover the exact decimal first
    (the double is within a half-ulp of it at these magnitudes), round
    in decimal — where both engines round half-away-from-zero — then
    hand back a double. Oracle legs mirror it verbatim:
    ``CAST(round(CAST(x AS DECIMAL(p,s)), N) AS DOUBLE)``.

    ``dec`` defaults to decimal(28,12): 12 fractional digits recover
    any expansion these plans emit (ties beyond digit 12 would need a
    denominator > 10^12), 16 integral digits keep ANSI mode from
    overflowing on 100×-scale money sums."""
    return F.round(col.cast(dec), scale).cast("double")
