"""Unit pins for the sweep tools' canonicalizers (no Spark session).

The two sweep harnesses canonicalize rows differently ON PURPOSE:
``tools/full_sweep.py`` compares ``collect()``/``fetchall()`` rows,
where NULL is always ``None`` on both legs and a float ``nan`` is a
real value — so None and NaN must stay DISTINCT. The hostile sweep
(``tools/hostile_sweep.py``) compares pandas-FETCHED frames, where the
same NULL integer/boolean arrives as ``None`` from Spark's
``toPandas`` but as ``NaN`` from DuckDB's ``.df()`` — so every NA-ish
cell must FOLD to one sentinel (the x26 nullable-boolean case, round
18). These pins keep both rules from drifting into each other.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import numpy as np

from full_sweep import _normalize  # noqa: E402
from hostile_sweep import _normalize_fetched  # noqa: E402


def test_fetched_normalization_folds_every_na_flavor():
    cols = ["a", "b"]
    spark_leg = [(None, 1.5), (np.nan, 2.0)]
    duck_leg = [(float("nan"), 1.5), (None, 2.0)]
    assert _normalize_fetched(spark_leg, cols) == _normalize_fetched(
        duck_leg, cols
    )


def test_fetched_normalization_still_distinguishes_values():
    cols = ["a"]
    assert _normalize_fetched([(1.0,)], cols) != _normalize_fetched(
        [(2.0,)], cols
    )
    assert _normalize_fetched([("x",)], cols) != _normalize_fetched(
        [(None,)], cols
    )


def test_fetched_normalization_rounds_like_full_sweep():
    cols = ["a"]
    assert _normalize_fetched([(1.0000000001,)], cols) == _normalize_fetched(
        [(1.0000000004,)], cols
    )


def test_collect_normalization_keeps_null_and_nan_distinct():
    cols = ["a"]
    assert _normalize([(None,)], cols) != _normalize([(math.nan,)], cols)


def test_both_sort_columns_by_name():
    rows = [(1, "z"), (2, "y")]
    assert _normalize(rows, ["b", "a"]) == sorted(
        [("z", "1"), ("y", "2")]
    )
    assert _normalize_fetched(rows, ["b", "a"]) == sorted(
        [("z", "1"), ("y", "2")]
    )
