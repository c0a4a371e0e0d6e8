"""The Pandas-UDF escape hatch (SURVEY §2.11): for semantics the
built-in operators genuinely can't express (recursive/stateful per-group
math), grouped ``applyInPandas`` with Arrow batching — never
row-at-a-time Python UDFs.

Demonstrator: per-group exponentially-weighted mean over event time.
EWM is a linear recurrence (y_t = α·x_t + (1-α)·y_{t-1}) — not
expressible with SQL window frames (each output depends on the previous
OUTPUT, not a fixed input frame). This is exactly the boundary where
the brief's "drop to applyInPandas" rule applies.

Scale notes: one shuffle on the group key; each group must fit a worker
(pandas materializes per-group). For billions of tiny groups this is
the right shape; for few huge groups pre-split by time range and carry
the seed forward.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

EWM_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
        StructField("ewm_value", DoubleType()),
    ]
)


def grouped_ewm(
    events: DataFrame,
    alpha: float = 0.3,
    group_col: str = "user_id",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    value_col: str = "value",
) -> DataFrame:
    """Per-group EWM of ``value_col`` in event-time order."""

    def _ewm(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order_cols))
        ewm = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return pd.DataFrame(
            {
                "user_id": pdf[group_col],
                "event_id": pdf["event_id"],
                "value": pdf[value_col],
                "ewm_value": ewm,
            }
        )

    return events.groupBy(group_col).applyInPandas(_ewm, EWM_SCHEMA)


RUNNING_STATE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def running_totals_stream(events: DataFrame, timeout_ms: int = 0):
    """Custom stateful streaming operator via ``applyInPandasWithState``
    (SURVEY §2.10 NEW surface): per-user running event count + value sum
    maintained in engine state across micro-batches — the shape for
    streaming features no built-in aggregation covers (e.g. model state,
    decayed counters).

    Returns a streaming DataFrame emitting the updated state row for
    every user touched in a micro-batch.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=RUNNING_STATE_SCHEMA,
        stateStructType="n_events BIGINT, total_value DOUBLE",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cosine_pandas_udf(dim: int = 64):
    """Vectorized (Arrow) cosine against a fixed query vector — the
    pandas_udf alternative to the JVM fold in ``similarity.cosine``.

    Trade-off: the JVM higher-order fold wins at small dim (no
    serialization); the Arrow+NumPy path wins once dim × batch is large
    enough that BLAS beats codegen'd per-element loops (measure at your
    dim — for 64-dim both are fine; at 1536-dim the UDF typically wins).
    Returned factory binds the query vector into the UDF closure.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    def make(query_vec: list[float]):
        q = np.asarray(query_vec, dtype=np.float64)
        qn = np.linalg.norm(q)

        @pandas_udf(DoubleType())
        def _cos(col: pd.Series) -> pd.Series:
            if not len(col):  # np.stack raises on an empty sequence (ADVICE r13)
                return pd.Series([], dtype="float64")
            # promote to float64 BEFORE any reduction: norms on the raw
            # float32 matrix would cap precision at ~1e-7 relative
            m = np.stack(col.to_numpy()).astype(np.float64)  # batch x dim
            dots = m @ q
            norms = np.linalg.norm(m, axis=1)
            return pd.Series(dots / (norms * qn))

        return _cos

    return make


def greedy_pack_schema(group_col: str = "source") -> "StructType":
    """Output schema for :func:`greedy_pack` (group column name is
    caller-chosen, everything else fixed)."""
    from pyspark.sql.types import BooleanType, IntegerType, StringType

    return StructType(
        [
            StructField("doc_id", LongType()),
            StructField(group_col, StringType()),
            StructField("n_tokens", IntegerType()),
            StructField("eff_tokens", IntegerType()),
            StructField("truncated", BooleanType()),
            StructField("bin_id", LongType()),
            StructField("bin_offset", LongType()),
        ]
    )


def greedy_pack(
    docs: DataFrame,
    cap: int = 256,
    group_col: str = "source",
    order_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    ffd: bool = False,
) -> DataFrame:
    """First-fit-SEQUENTIAL packing with NO document splitting: stream
    each group's docs in ``order_col`` order into ``cap``-token bins; a
    doc that does not fit the current bin's remainder CLOSES the bin
    and starts the next (x6/mm5 pack by offset division, so documents
    span bin boundaries — the concat-with-EOS regime; this is the
    OTHER packing regime, where attention must not cross document
    boundaries, so bins waste their tails). Docs longer than ``cap``
    are truncated to ``cap`` and flagged.

    Why applyInPandas: each doc's bin depends on the previous doc's
    OUTPUT (the running bin fill resets on overflow) — a recurrence,
    not a fixed window frame; the same boundary as :func:`grouped_ewm`.
    Scale shape: one shuffle on the group key; each group must fit a
    worker — packing runs per shard (the x15 layout), so group size is
    bounded by construction.

    ``ffd=True`` switches to first-fit-DECREASING (the classic
    waste-bound packer, 11/9·OPT): docs sort (tokens DESC, order_col),
    ALL bins stay open, each doc lands in the FIRST bin with room,
    else opens a new one. Note next-fit-decreasing (sorting alone,
    keeping the close-on-overflow rule) is NOT offered: measured on
    both the corpus fixture and a bimodal planted one it LOSES to
    streaming next-fit (sorted big docs each nearly fill a bin, then
    the close rule forbids back-filling them) — reopening bins is
    where the waste reduction actually comes from. FFD trades away
    streaming order (a shard must materialize before packing) and
    keeps O(open-bins) state per group; x29 measures the waste
    differential per source so the tradeoff is a number, not prose.
    """

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        if ffd:
            pdf = pdf.sort_values(
                [tokens_col, order_col], ascending=[False, True]
            )
        else:
            pdf = pdf.sort_values(order_col)
        bin_ids, offsets, effs, trunc = [], [], [], []
        if ffd:
            fills: list[int] = []
            for n in pdf[tokens_col]:
                eff = min(int(n), cap)
                for b, f in enumerate(fills):
                    if f + eff <= cap:
                        idx = b
                        break
                else:
                    idx = len(fills)
                    fills.append(0)
                bin_ids.append(idx)
                offsets.append(fills[idx])
                effs.append(eff)
                trunc.append(int(n) > cap)
                fills[idx] += eff
        else:
            bin_id, fill = 0, 0
            for n in pdf[tokens_col]:
                eff = min(int(n), cap)
                if fill + eff > cap:
                    bin_id += 1
                    fill = 0
                bin_ids.append(bin_id)
                offsets.append(fill)
                effs.append(eff)
                trunc.append(int(n) > cap)
                fill += eff
        return pd.DataFrame(
            {
                "doc_id": pdf[order_col],
                group_col: pdf[group_col],
                "n_tokens": pdf[tokens_col],
                "eff_tokens": effs,
                "truncated": trunc,
                "bin_id": bin_ids,
                "bin_offset": offsets,
            }
        )

    return docs.groupBy(group_col).applyInPandas(
        _pack, greedy_pack_schema(group_col)
    )
