"""Regenerate PLANS.md: formatted physical plans of representative
queries at sf0.01, each with the plan property it demonstrates. Run
from the repo root: ``python tools/dump_plans.py``.

The plan-quality pytest suite ASSERTS these properties; this artifact
makes them reviewable without running anything.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"

#: query -> the property its plan demonstrates
SHOWCASE = [
    ("pipe_valid_rows", "Broadcast join, pruned scans, pushed join-key null filter — no SortMergeJoin anywhere on the parity pipeline."),
    ("st4_fact_resolved", "Five broadcast hash joins resolve every dim; fact scan stays the only large input."),
    ("a16_revenue_by_location", "Partial (map-side) then final HashAggregate around one hash exchange."),
    ("o2_top10_orders", "Global ORDER BY + LIMIT compiles to TakeOrderedAndProject — never a full sort."),
    ("dd4_lsh_pairs", "MinHash-LSH banding: slim (id, band, key) equi-join for candidates; shingle arrays join back only for surviving pairs."),
    ("t8_decontaminate", "Distinct eval-shingle set broadcast into a semi-join; zero-hit docs restored by a doc-spine left join."),
    ("x6_pack_sequences", "Window partitioned by source shard — running cumsum without a global sort."),
    ("v6_embedding_dedup", "Blocked near-dup path: RHP-signature equi-join generates candidates; the quadratic cosine kernel touches candidates only."),
    ("v4_knn_lsh", "Certification reshape: exact + exhaustive-probe + approx legs all broadcast-shaped — the corpus scan stays the only large input; no SortMergeJoin, no unhinted cartesian."),
    ("dd11_incremental_dedup", "Cross-run incremental dedup: candidates come ONLY from the increment x corpus banded equi-join (no corpus self-join anywhere); signature-agreement scoring joins slim sig arrays, never text."),
    ("x11_curation_pipeline_v2", "Composed curation v2: quota window and packing window both partition by source (no global sort); rule + classifier gates fold into the scan projection; the only other exchange is the fingerprint dedup."),
    ("x10_domain_quota", "Skew-safe quota (round 8): per-domain count broadcast back; at-quota domains pass through map-side; only over-quota rows reach the two salted windows — partition spec (source, __salt) spreads a hot domain over salt_buckets tasks."),
    ("v11_pq_adc", "PQ+ADC certification (round 8): the encoded/reconstructed corpus is persisted (per-vector folds stay per-vector), queries broadcast with their m x ksub lookup tables; no SortMergeJoin, the corpus scan is the only large input."),
    ("t15_bloom_decontaminate", "Bloom decontamination (round 8): the bloom leg is a map-side getbit probe over a single array literal — no join, no string broadcast before the per-doc count; the exact leg (certification only) keeps t8's broadcast semi-join for the superset verdict."),
    ("t16_bm25_topk", "BM25 (round 8): corpus stats reduce to ONE broadcast row; scoring is a map-side projection (term tfs are size(filter(tokens)) expressions — no explode); top-k compiles to TakeOrderedAndProject, and the rank window runs over only the k survivors."),
    # NB: x14 dumps in 'simple' mode — its stage boundaries are persisted,
    # and formatted mode re-prints every InMemoryRelation's child plan at
    # each of the quota kernel's three references (20k lines of duplicated
    # text for a plan that EXECUTES each subtree once from cache).
    ("x14_curation_pipeline_v3", "Composed curation v3 (round 8): quota + weighted-sample + diversity-cap windows all ride the skew-safe kernel (count-broadcast, map-side pass-through, salted two-phase) over PERSISTED slim stage outputs; the bloom probe stage adds zero joins.", "simple"),
    ("dd13_line_dedup", "Segment-level line dedup (round 10): canonical occurrence is a map-side-combinable MIN partial_min/min pair keyed on the segment — a boilerplate segment in millions of docs never becomes a hot sort group (deliberately NOT a row_number window); one equi-join on segment, one per-doc rebuild agg."),
    ("x15_shuffle_shard", "Shuffle-and-shard layout (round 11): ONE Exchange hashpartitioning(shard) with per-shard Sorts under it — a globally shuffled corpus with no Exchange rangepartitioning (global sort) anywhere."),
    ("x16_curation_pipeline_v4", "Final-mile composition (round 11): a linear chain — dd13's MIN-agg + equi-join, the rule-bank gate folded into the rebuild projection (no extra pass over the corpus), then the x15 shard exchange; no persist boundaries because no stage output is consumed twice."),
    ("x17_split_assign", "Exact split assignment (round 12): the cut spec joins as a BroadcastHashJoin; the row_number window partitions on (lang, __bkt) — never the bare stratum — and runs only under the boundary-bucket filter, so a hot stratum's rows label map-side."),
    ("t18_chunk_overlap", "Overlap chunking (round 12): split/sequence/explode/slice as one codegen'd Generate over the scan — zero Exchanges in the whole plan; read → explode → project, partition-parallel end to end."),
    ("v14_filtered_ann", "Metadata-filtered ANN (round 13): the label predicate lands in the corpus FileScan's DataFilters BELOW the broadcast score join — pre-filter semantics as a scan property, prunable by a label-partitioned layout at 100 TB."),
    ("t19_contamination_audit", "Contamination attribution (round 13): eval shingles broadcast into the hit join; the per-eval argmax is a map-side-combinable MAX over a (count, -id) struct — no row_number window, so a widely-leaked eval item never becomes a hot sort group."),
    ("t20_distribution_drift", "Snapshot KL drift (round 13): ONE corpus scan into a map-side (lang, token) count agg; the per-language roll-up payload is the vocabulary, and both KL folds run in fixed token order (cross-engine bit-equality up to the documented ln rounding)."),
    ("x21_export_manifest", "Training-store export manifest (round 13): split kernel boundary windows + ONE layout Window on (split, shard) computing pos/start_offset/bin_id together — the Exchange feeding it IS the final write partitioning, so the manifest costs exactly the store write's repartition+sort."),
    ("dd14_dup_spans", "Maximal duplicated-span detection (round 14): shingle-keyed count + per-document gaps-and-islands window — no pair join, no suffix array, no global sort."),
    ("x22_epoch_expand", "Exact epoch expansion (round 14): 5-row broadcast plan + per-language rank window + narrow epoch explode; realized counts equal the mixing plan exactly."),
    ("x21b_export_manifest_ls", "LEAKAGE-SAFE export manifest (round 14): x19's collapse-first LSH + connected-components cluster stage feeds the same single layout Window on (split, shard); no corpus-keyed window and no global sort anywhere in the composition."),
    ("x23_dsir_resample", "DSIR importance resampling (round 15): bucket-count tables are bounded (≤ n_buckets rows) regardless of corpus size, so every join in the plan is broadcast — the gram explode is the only corpus-scale op, and the per-language rank window sorts slim (doc_id, lang, log_w) rows."),
    ("dd16_source_overlap", "Cross-source overlap matrix (round 15): per-source MinHash components reduce map-side on the agg's own group key — one signature ROW per source before any pair logic; the exact legs' shingle-keyed join is the single (group-granularity) SortMergeJoin, droppable at 100 TB."),
    ("t21_ngram_diversity", "N-gram diversity report (round 15): one gram explode feeds a single per-language agg with conditional count_distincts; the entropy fold rides the vocabulary-sized (lang, token) table — no windows, no range exchange, joins only on |langs| rows."),
    ("x25_dsir_balanced", "DSIR with a caller-chosen lang-balanced target (round 16): the target/candidate split is ONE lang-partitioned row_number over slim (doc_id, lang) rows ahead of x23's unchanged scoring core — bucket tables stay bounded and broadcast, the gram explode stays the only corpus-scale op."),
    ("x26_embedding_curation", "Embedding-side curation chain (round 18): RHP-bucketed dedup pairs feed CC pointer-jumping on slim id frames; the density gate joins survivors to broadcast centroids; the diversity cap windows per label — no global sort outside the cert-only percent_rank."),
    ("v17_index_maintenance", "IVF maintenance telemetry (round 18): assignment folds map-side against centroid literals (cert) or the Arrow closure (prod); per-cell stats are one k-row aggregate — a single pass over the batch, shuffle bounded by k."),
    ("v16_density_gate", "Budget-aware density gate, linear branch (round 18): per-label prototype centroids join back as a broadcast, the decile gate is the cert percent_rank (prod uses a percentile_approx scalar); no SortMergeJoin, no corpus-pair join anywhere — the O(n) shape v13's n^1.5 audit hands off to past the budget."),
    ("x27_joint_curation", "Joint text+embedding curation (round 19): dd13's MIN-agg dedup and the recomputed quality gate feed ONE co-partitioned doc→embedding equi-join; lang-grouped centroids join back broadcast — the cert percent_rank is the only global sort, absent from x27_prod."),
    ("dd17_snapshot_churn", "Exact snapshot churn ledger (round 19): ONE map-side-combinable groupBy on (source, content) with presence max-folds, then a per-source roll-up of five longs — no join, no window, no explode; dd17_prod shuffles an 8-byte hash, never the text."),
    ("v18_recall_report", "ANN recall telemetry (round 19): both legs broadcast-shaped around the bounded probe set — the exact leg is one corpus scan with a per-query top-k window, the bucket leg an equi-join on the portable RHP cell; the corpus is never self-joined."),
    ("v19_rerank_stack", "Two-stage retrieval (round 19): map-side HOF encode against 1,024 plan-literal codebook doubles, broadcast queries, a slim (query, adc) shortlist window, and a rerank that touches 20 rows per query — the corpus is scanned once and never self-joined."),
    ("x29_pack_efficiency", "Packing-efficiency comparison (round 19): two grouped-applyInPandas recurrences over one slim (doc_id, source, n_tokens) frame, two per-source aggregates, one join on |sources| rows — no corpus-scale join or window anywhere."),
    ("v20_store_health", "Store-health dashboard (round 20): the three telemetry kernels compose without a new shuffle — the per-source churn groupBy is the only wide exchange; the v17/v18 KPI legs collapse to 1-row aggregates cross-joined as BroadcastNestedLoopJoin over single rows."),
]


def main() -> None:
    import __spark_entry__ as entrymod
    from nyc_taxi_etl_dashboard_spark.session import get_spark

    spark = entrymod._pin(get_spark(app_name="dump_plans"))
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    out = [
        "# Physical plans (generated by tools/dump_plans.py at sf0.01)",
        "",
        "Each section shows `explain('formatted')` for a representative query and",
        "the plan property it demonstrates; `tests/test_plan_quality.py` asserts",
        "these properties so refactors can't silently regress them.",
        "",
    ]
    import re

    def collapse_literals(plan: str) -> str:
        """Array literals (e.g. t15's 4096-word bitset) print in full in
        formatted plans — collapse runs of >16 comma-separated numbers
        so the showcase stays readable (the plan SHAPE is the point)."""

        def shrink(m: re.Match) -> str:
            n = m.group(0).count(",") + 1
            head = ",".join(re.split(r",\s*", m.group(0))[:4])
            return f"{head}, … <{n} numeric literals collapsed> …"

        num = r"-?\d+(?:\.\d+)?(?:[eE]-?\d+)?"
        plan = re.sub(rf"(?:{num},\s*){{16,}}{num}", shrink, plan)
        # InMemoryRelation nodes re-print their entire child plan inline
        # on one line; the shape is what the showcase documents — cap the
        # detail
        return "\n".join(
            line if len(line) <= 400 else line[:400] + " … <line truncated>"
            for line in plan.splitlines()
        )

    for entry in SHOWCASE:
        name, note = entry[0], entry[1]
        mode = entry[2] if len(entry) > 2 else "formatted"
        df = queries[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode)
        plan_txt = collapse_literals(buf.getvalue().rstrip())
        plan_lines = plan_txt.splitlines()
        if len(plan_lines) > 400:
            # persisted compositions re-print each InMemoryRelation's
            # child plan at every reference; the top of the tree carries
            # the documented shape
            plan_txt = "\n".join(plan_lines[:400]) + (
                f"\n… <{len(plan_lines) - 400} further plan lines truncated: "
                "cached-subtree re-prints, executed once from cache>"
            )
        out += [f"## {name}", "", note, "", "```", plan_txt, "```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote PLANS.md with {len(SHOWCASE)} plans")


if __name__ == "__main__":
    main()
