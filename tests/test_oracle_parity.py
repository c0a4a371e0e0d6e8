"""Local mini-driver: run every ``queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB, compare row count + column names +
order-insensitive values. Mirrors the external correctness gate so
mismatches surface in pytest first.
"""

from __future__ import annotations

import math

import pytest

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
