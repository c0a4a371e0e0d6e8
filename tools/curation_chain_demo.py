"""Runnable demo of the end-to-end streaming curation chain.

Drives ``curation_chain_sink`` through a REAL file-source stream
(``readStream.parquet`` + ``availableNow`` trigger + checkpoint), not a
hand-called foreachBatch — the deployment shape, end to end:

  landing dir (one parquet file per micro-batch)
    → readStream → foreachBatch(curation_chain_sink)
    → corpus / quarantine / 4 state warehouses

The synthesized traffic makes every stage bite at least once:
batch 0 bootstraps, batch 1 carries a warehouse dup + over-quota docs,
batch 2 is a single-token flood (quarantined whole), batch 3 is clean.
The demo prints the per-batch admission ledger and the final state of
every table, then simulates CRASH RECOVERY: it deletes the last batch's
commit marker from the checkpoint and restarts the stream on the same
checkpoint, so Structured Streaming re-delivers that exact batch — and
asserts every table comes out byte-identical. The exactly-once
property, demonstrated through the real recovery machinery rather than
a hand-called sink.

Usage: python tools/curation_chain_demo.py [work_dir]
(default work_dir: a fresh temp directory; pass one to inspect tables
afterwards with spark.read.parquet.)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _mk_text(i: int) -> str:
    # shared unigram skeleton (aligned distributions for the drift
    # gate), per-doc interleave (no accidental near-dup shingles)
    return f"alpha u{i}a beta u{i}b gamma u{i}c delta u{i}d"


def _batches() -> list[list[tuple[int, str, str]]]:
    flood = " ".join(["spam"] * 30 + ["click"] * 5)
    return [
        # batch 0: bootstrap — 4 web + 2 wiki clean docs, 1 gated out
        [(i, "web", _mk_text(i)) for i in range(1, 5)]
        + [(5, "wiki", _mk_text(5)), (6, "wiki", _mk_text(6)),
           (99, "web", "too short")],
        # batch 1: a literal copy of doc 1 (dup vs warehouse) and three
        # wiki docs against a remaining allowance of 1 (quota drops 2)
        [(10, "web", _mk_text(1)), (20, "web", _mk_text(20)),
         (30, "wiki", _mk_text(30)), (31, "wiki", _mk_text(31)),
         (32, "wiki", _mk_text(32))],
        # batch 2: a flood — the drift gate quarantines it whole
        [(50, "web", flood), (51, "web", flood)],
        # batch 3: clean traffic after the flood — admitted normally
        # (the flood contributed nothing to the reference)
        [(60, "web", _mk_text(60)), (61, "web", _mk_text(61))],
    ]


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="chain-demo-")
    os.makedirs(work, exist_ok=True)

    from pyspark.sql import functions as F

    from nyc_taxi_etl_dashboard_spark.session import get_spark
    from nyc_taxi_etl_dashboard_spark.streaming.documents import (
        DOCS_STREAM_SCHEMA,
        curation_chain_sink,
    )

    spark = get_spark(app_name="curation-chain-demo", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    landing = os.path.join(work, "landing")
    tables = {
        k: os.path.join(work, k)
        for k in ("corpus", "quarantine", "sigs", "tokens", "quota", "splits")
    }

    # land one parquet file per micro-batch; maxFilesPerTrigger=1 makes
    # the file boundary the batch boundary
    os.makedirs(landing, exist_ok=True)
    for rows in _batches():
        df = spark.createDataFrame(
            [(i, text, "en", src, len(text), None) for i, src, text in rows],
            DOCS_STREAM_SCHEMA,
        ).withColumn(
            "ingest_ts",
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id")),
        )
        df.coalesce(1).write.mode("append").parquet(landing)

    def run_stream(checkpoint: str) -> list:
        sink, stats = curation_chain_sink(
            tables["corpus"], tables["quarantine"], tables["sigs"],
            tables["tokens"], tables["quota"], tables["splits"],
            min_tokens=5, quota={"wiki": 3}, quota_default=100,
            alert_threshold=0.5,
        )
        q = (
            spark.readStream.schema(DOCS_STREAM_SCHEMA)
            # SOURCE option: one landed file per micro-batch, so the
            # file boundary IS the admission boundary
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(work, checkpoint))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # availableNow self-terminates, but the checkpoint-conflict
        # guard checks the session's active-query registry — make the
        # handoff explicit before a restart reuses the checkpoint
        q.stop()
        import time

        for _ in range(100):
            if all(aq.id != q.id for aq in spark.streams.active):
                break
            time.sleep(0.1)
        return stats["batches"]

    ledger = run_stream("ckpt")
    print("\nper-batch admission ledger (batch, in, gated, dup, quota, quarantined):")
    for b in ledger:
        print("  ", b[:6], "splits:", b[6])

    def table_state(path: str):
        try:
            return sorted(map(tuple, spark.read.parquet(path).collect()))
        except Exception:
            return []

    states = {k: table_state(p) for k, p in tables.items()}
    corpus_ids = sorted(r[0] for r in states["corpus"])
    quarantine_ids = sorted(r[0] for r in states["quarantine"])
    print("\ncorpus doc_ids:   ", corpus_ids)
    print("quarantine doc_ids:", quarantine_ids)
    print("split ledger:")
    for r in spark.read.parquet(tables["splits"]).groupBy("stratum", "split").agg(
        F.sum("cnt").alias("n")
    ).orderBy("stratum", "split").collect():
        print("  ", r.stratum, r.split, r.n)

    # crash-recovery redelivery on the deployment path: drop the LAST
    # batch's commit marker (a crash after that batch's merges landed
    # but before the commit was recorded) and restart on the same
    # checkpoint — the engine re-delivers exactly that batch, and every
    # table must come out byte-identical. NOTE a full-stream rerun from
    # a FRESH checkpoint would legitimately differ: the split stage
    # labels docs at their running per-stratum position, so replaying
    # batch 0 against a warehouse already containing batches 1-3 is a
    # different (still valid) prefix — the contract is redelivery of
    # the uncommitted batch, not time travel.
    commits = os.path.join(work, "ckpt", "commits")
    last = max((f for f in os.listdir(commits) if f.isdigit()), key=int)
    os.remove(os.path.join(commits, last))
    # the local ChecksumFileSystem keeps a sidecar .crc; a stale one
    # makes the recovery's commit rewrite look like a concurrent writer
    crc = os.path.join(commits, f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    replay_ledger = run_stream("ckpt")
    assert [b[:6] for b in replay_ledger] == [ledger[int(last)][:6]], (
        "recovery must re-deliver exactly the uncommitted batch"
    )
    replay_states = {k: table_state(p) for k, p in tables.items()}
    for k in tables:
        assert replay_states[k] == states[k], f"{k} diverged on redelivery"
    print(
        f"\ncrash-recovery redelivery of batch {last}: every table "
        "byte-identical — exactly-once holds"
    )

    if len(sys.argv) <= 1:
        shutil.rmtree(work, ignore_errors=True)
    else:
        print(f"\ntables left under {work}")


if __name__ == "__main__":
    main()
