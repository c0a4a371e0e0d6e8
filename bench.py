"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE compact JSON line with
the verdict-grade numbers ({"metric": ..., "value": total_sec, "unit":
"sec", "queries": {...}, "sf": ...}) and writes the FULL result —
per-query spreads, curation per-query detail — to ``BENCH_local.json``
next to this file. Round-6 lesson: the driver's artifact is a
2,000-char stdout tail; the r6 full-JSON line outgrew it and the
headline total had to be reconstructed, so stdout now carries only what
must survive and the file carries everything.

Comparable (BASELINE.md): the reference's single transform run moves 2M
rows in 6.654 s ≈ 300k rows/s single-threaded pandas; the engine target
is ≥150k rows/s through the full derive+classify+split pipeline at
sf0.1. ``pipe_transform_rps`` in the JSON reports our rows/s on that
exact shape (scan → join → derive → classify → split → both branches
materialized). Since round 14 the FIRST numbers in the JSON are
``pipe_transform_io_norm``(+``_min``) — that transform's seconds as a
multiple of a fixed-work single-file scan probe on the same box at the
same moment — because the raw figure rides a single-row-group scan
whose wall time swings ±30% with shared-box IO; the normalized pair is
the round-over-round comparable, raw rows/s the secondary absolute.

Each query executes to completion via the noop sink (forces full
computation, no collect/IO skew); each timing is the median of
``N_RUNS`` (default 3) full executions after a shared session warm-up,
with per-query [min, median, max] under "spread" in BENCH_local.json.
Alongside each median total, ``value_min``/``curation_min`` sum the
per-query minimums — the plan-cost estimator on a noisy box (ADVICE
r6), keeping round-over-round comparisons honest across the
median-estimator change.

``prod_paths`` times the PRODUCTION shapes (v4_prod multi-probe LSH,
v7_prod trained IVF at nprobe=2, x7_prod sketch-gated corpus pipeline):
the registered v4/v7/x7 queries are the certification shapes
(exhaustive probe / exact percentile cut), which do strictly more work
than any 100 TB user runs — the split keeps CORRECTNESS exhaustive and
BENCH representative (VERDICT r6 items 1b and 4). They are reported
separately and excluded from both totals.

Since round 15 the artifact is SELF-ADJUDICATING (VERDICT r14 item 1):
"suspects" lists queries >2x their previous-artifact value, "settled"
carries each one's verdict — wave_probe_corroborated (the bracketing
fixed-work write probe inflated >2x alongside), wave_ab_exonerated /
code_regression (an automatic tools/ab_interleaved.py run against the
previous round's artifact commit; paired same-moment ratios), or an
unsettled_* reason. Disable with SPARK_GRAFT_BENCH_ADJUDICATE=0.
"""

from __future__ import annotations

import json
import os
import statistics
import time

HEADLINE = [
    # reference-parity pipeline + dashboard
    "pipe_valid_rows",
    "pipe_anomaly_breakdown",
    "pipe_report_stats",
    "a10_daily_avg_revenue",
    "a13_revenue_by_payment",
    "a17_calendar_rollup",
    "w1_top3_locations_per_period",
    "st4_fact_resolved",
    "j1_star_flatten_revenue",
    # events
    "e2_tumbling_counts",
    "e3_sessionize",
    # LLM-pipeline ops
    "t3_fingerprints",
    "dd2_jaccard_pairs",
    "dd4_lsh_pairs",
    "dd5_simhash",
    "v2_knn_bruteforce",
    "j2_asof_join",
    "dd6_corpus_curation",
    "e4_event_type_funnel",
]

#: round-2 curation/ANN additions, timed identically but reported under
#: their own total so headline_queries_total stays comparable round-over-round
CURATION = [
    "t7_quality_filter",
    "t8_decontaminate",
    "t9_repetition",
    "x5_stratified_sample",
    "x6_pack_sequences",
    "dd7_simhash_pairs",
    # NOTE: from round 6 the registered v7 query is the certification
    # reshape (k-means fit + probe-all + nprobe=2 + brute-force verdict
    # joins). Measured impact at sf0.1: ~nothing (median 2.0 s vs 2.3 s
    # before) — the model is fit once and shared, and the verdict legs
    # are k x |queries| broadcast rows. The production operator is
    # ivf_ann_trained called once.
    "v7_ivf_trained",
    # NOTE: from round 7, x7 composes the per-language LM decile gate
    # (VERDICT r6 item 4) — its corpus-wide wordcount join adds ~1.5 s
    # at sf0.1 vs the r6 definition; x7_prod (prod_paths) is the same
    # composition with the sketch-threshold cut
    "x7_corpus_pipeline",
    # joined in round 6 (definition change for curation_total at r6):
    # PII scrub (map-only regex), mixture planner (stratum agg), and
    # the per-language LM percentile gate (wordcount join + lang window)
    "t11_pii_redaction",
    "x8_mixture_plan",
    "t12_lm_percentile_gate",
    "t13_lm_gate_at_scale",
    "v9_embedding_decontam",
    # round-3: the iterative-join dedup path (connected components +
    # cluster-canonical curation) tracked end-to-end
    "dd8_dup_clusters",
    "dd10_cluster_curation",
    # round-7: cross-run incremental dedup (increment vs persisted
    # signature table; banded equi-join + signature-agreement verify),
    # per-domain quota cap, and SemDeDup-style semantic keep-list
    "dd11_incremental_dedup",
    "x10_domain_quota",
    "v10_semantic_dedup",
    "t14_quality_classifier",
    "x11_curation_pipeline_v2",
    # round-8: PQ+ADC certification shape (the production ranking path
    # is benched separately as v11_prod in prod_paths)
    "v11_pq_adc",
    # round-8 second wave: Bloom decontamination (certification runs the
    # exact leg too; the bloom-only probe is t15_prod in prod_paths),
    # cell-balanced diversity sampling, and weighted priority sampling
    "t15_bloom_decontaminate",
    "x12_diversity_sample",
    "x13_weighted_sample",
    "t16_bm25_topk",
    "x14_curation_pipeline_v3",
    "t17_bigram_logprob",
    "v13_knn_outliers",
    # dd12's cert shape (uncapped index) is ~2.7x its capped prod shape
    # (dd12_prod in prod_paths) — benched both ways per standing policy
    "dd12_containment_pairs",
    # round-10: segment-level exact dedup (C4/RefinedWeb line dedup)
    "dd13_line_dedup",
    # round-11: deterministic shuffle-and-shard (the final pre-training
    # layout stage: one shuffle keyed on shard + per-shard sorts) and
    # the final-mile composition (line dedup → clean-text gate → shard)
    "x15_shuffle_shard",
    "x16_curation_pipeline_v4",
    # round-12: exact train/val/test assignment (histogram-cut kernel),
    # its leakage-safe cluster-atomic form (LSH pairs + CC + cluster
    # split inherit), stride-overlap chunking (map-side explode), and
    # audio windowing (Arrow-batch integer frame features)
    "x17_split_assign",
    "x19_leakage_safe_split",
    "t18_chunk_overlap",
    "mm4_audio_windows",
    # round-13: temperature-scaled mixing plan, eval-side contamination
    # attribution, metadata-filtered exact ANN (v14_prod rides the
    # BENCH_ONLY prod_paths), modality-aware packing
    "x20_temperature_mix",
    "t19_contamination_audit",
    "v14_filtered_ann",
    "mm5_interleaved_pack",
    # round-13 second wave: prototype-distance pruning (v15_prod rides
    # prod_paths) and per-language snapshot KL drift
    "v15_prototype_prune",
    "t20_distribution_drift",
    # round-13 third wave: the training-store export manifest (x17
    # split → x15 shard-within-split → mm5 packing, one query)
    "x21_export_manifest",
    # round-14: the leakage-safe manifest variant (cluster-atomic split
    # composed into the same layout window) and span-level
    # exact-substring dedup (detection + canonical-keep redaction)
    "x21b_export_manifest_ls",
    "dd14_dup_spans",
    "dd15_span_redact",
    # round-14: exact epoch expansion (x20's plan executed to integer-
    # exact per-language training-store rows)
    "x22_epoch_expand",
    # round-15: DSIR importance resampling (hashed-ngram weights vs the
    # src0 target), cross-source MinHash overlap matrix, per-language
    # n-gram diversity report, curriculum staging
    "x23_dsir_resample",
    "dd16_source_overlap",
    "t21_ngram_diversity",
    "x24_curriculum_schedule",
    # round-15 second wave: BPE-ish pre-tokenizer census (map-only
    # regex) and rank-order char-trigram language ID (integer-exact)
    "t22_bpe_pretokenize",
    "t23_langid_ngram",
    # round-16: DSIR against a caller-chosen lang-balanced target
    # (VERDICT r12 item 2 — the target-parametric proof query)
    "x25_dsir_balanced",
    # round-18: the budget-aware density gate's linear branch (v16,
    # certified through the selector) and the embedding-side curation
    # chain (x26: SemDeDup collapse → density gate → diversity cap);
    # their production configs ride prod_paths as v16_prod/x26_prod
    "v16_density_gate",
    "x26_embedding_curation",
    # round-18 third wave: IVF index-maintenance telemetry (v17_prod
    # rides prod_paths with the trained auto-cells quantizer)
    "v17_index_maintenance",
    # round-19: the joint text+embedding curation chain (x16's text
    # stages + the v16 density gate as stage 4; x27_prod rides
    # prod_paths with the percentile_approx gate), the dd17 exact
    # snapshot-churn ledger (dd17_prod: xxhash64 content keys), and
    # v18 ANN recall telemetry (v18_prod: production bucketing).
    # NOTE: curation_total grows by THREE entries this round — compare
    # to the prior series minus x27/dd17/v18 (the r6/r18
    # definition-change precedent).
    "x27_joint_curation",
    "dd17_snapshot_churn",
    "v18_recall_report",
    # round-19 second wave: greedy non-splitting packing (the
    # applyInPandas recurrence; no prod twin — the Arrow kernel IS the
    # production shape) and the v19 two-stage retrieval stack
    # (v19_prod rides prod_paths with trained codebooks + Arrow LUT).
    # curation_total grows by FIVE total this round.
    "x28_greedy_pack",
    "v19_rerank_stack",
    # round-19 third wave: the packing-efficiency comparison (both
    # placements in one query; no prod twin — the Arrow kernels ARE
    # the production shapes). curation_total: SIX new entries total.
    "x29_pack_efficiency",
    # round-20: the vector-store operations dashboard (VERDICT r15
    # item 5) — dd17 churn + v17 refit verdicts + v18 recall composed;
    # v20_prod rides prod_paths over the three prod kernels.
    # curation_total grows by ONE entry this round (the r6/r18/r19
    # definition-change precedent: compare to the prior series minus
    # v20).
    "v20_store_health",
]


# --- bench self-adjudication (VERDICT r14 item 1) ---------------------------
#
# Three rounds of judge/builder cycles were spent re-litigating "regressions"
# that PERF_AB_r14.md eventually pinned on shared-disk write-stall waves
# (byte-identical code swinging 3.1x). The instruments that settled those
# disputes — the start/mid/end write-axis probes and tools/ab_interleaved.py —
# now run AUTOMATICALLY: after the suites finish, any query whose median
# exceeds ~2x its previous-artifact value is flagged as a suspect; a suspect
# whose phase-adjacent write probe also inflated >2x vs the same artifact is
# settled in place as a box wave (the probe is fixed work — code cannot slow
# it); the rest get one interleaved HEAD-vs-previous-round A/B run (paired
# same-moment ratios, the PERF_AB_r14 method) and are settled by the paired
# ratio. The artifact carries "suspects"/"settled" so a future dispute is
# answered inside the artifact that raised it.

#: suspect rule: normalized-now > RATIO x normalized-prev (when both
#: artifacts carry CPU calibrations — VERDICT r15 item 4: flagging on
#: raw seconds manufactured 8 suspects on a 2-3.7x-slower box, >=5 of
#: them box), raw inflation as corroboration, AND the absolute raw
#: delta clears a floor (a 0.2 s query doubling is noise; a 5 s query
#: doubling is a finding)
SUSPECT_RATIO = 2.0
SUSPECT_ABS_FLOOR = 0.75
#: raw corroboration for a normalized-flagged suspect: a query whose
#: raw time barely moved is not a regression even if the box sped up
#: around it (normalization alone would flag IO-bound queries every
#: time the CPU probe got faster)
RAW_CORROBORATION_RATIO = 1.3
#: paired A/B ratio above which a suspect is ruled a CODE regression
#: (PERF_AB_r14 measured same-code paired ratios <= 1.10; 1.25 adds margin)
AB_CODE_THRESHOLD = 1.25
#: write-probe inflation that corroborates a wave without burning an A/B
PROBE_WAVE_RATIO = 2.0
#: hard sanity cap on the auto-A/B batch (VERDICT r15 item 3: the old
#: cap of 4 silently dropped real suspects; suspects share one
#: interleaved session, so batching them is cheap — the cap only
#: guards a pathological every-query-flagged run, and any truncation
#: is still loudly recorded per query). Raised 12 → 24 after the
#: round-20 post-close wave flagged 21 suspects and the cap truncated
#: 3: a pathological box is exactly when everything should settle,
#: and 24 suspects cost ~24 x 6 timed runs in the one session — the
#: scaled timeout covers it.
AB_MAX_QUERIES = 24

#: phase -> the write-axis probes that bracket it (start/mid/end), so a
#: suspect is compared against the probe readings taken nearest to WHEN
#: it ran. The prod phase moves with SPARK_GRAFT_PRODS_FIRST (recorded
#: as prods_order in the artifact): prods run either right after the
#: START probes or right before the END ones — see phase_probe_map().
PHASE_PROBES = {
    "headline": ("io_write_calibration_sec", "io_write_calibration_sec_mid"),
    "curation": ("io_write_calibration_sec_mid", "io_write_calibration_sec_end"),
    "prod": ("io_write_calibration_sec_end",),
    "transform": ("io_write_calibration_sec_end",),
}

#: every probe key any phase can reference (for collecting probes_now)
PROBE_KEYS = (
    "io_write_calibration_sec",
    "io_write_calibration_sec_mid",
    "io_write_calibration_sec_end",
)


def phase_probe_map(prods_first: bool) -> dict[str, tuple[str, ...]]:
    """PHASE_PROBES with the prod phase re-bracketed for the actual run
    order: under SPARK_GRAFT_PRODS_FIRST=1 the prod paths execute right
    after the start probes, so corroborating them against the END probe
    (taken up to ~30 min later) would attribute a late wave to an early
    query — or miss an early wave entirely (code-review r15)."""
    if prods_first:
        return {**PHASE_PROBES, "prod": ("io_write_calibration_sec",)}
    return dict(PHASE_PROBES)


def find_suspects(
    now: dict[str, float],
    prev: dict[str, float],
    ratio: float = SUSPECT_RATIO,
    abs_floor: float = SUSPECT_ABS_FLOOR,
    prev_floor: float = 0.05,
    cal_now: float | None = None,
    cal_prev: float | None = None,
) -> dict[str, dict]:
    """Queries whose current median exceeds ``ratio`` x their
    previous-artifact value AND whose absolute inflation clears
    ``abs_floor`` seconds. Pure so tests can pin the rule.

    When BOTH runs carry a CPU calibration (``cal_now``/``cal_prev``,
    each the median of that run's start/mid/end fixed-work probes),
    the ratio test runs on CALIBRATION-NORMALIZED values
    (``v/cal_now`` vs ``p/cal_prev``) so a uniformly slower box stops
    manufacturing suspects; the raw ratio is kept as corroboration —
    a normalized-flagged query must also have inflated
    ``RAW_CORROBORATION_RATIO``x in raw seconds (an IO-bound query
    holding flat while the CPU probe sped up is not a regression).
    Without calibrations the raw rule applies unchanged."""
    out: dict[str, dict] = {}
    use_norm = bool(cal_now and cal_prev) and cal_now > 0 and cal_prev > 0
    scale = (cal_prev / cal_now) if use_norm else 1.0
    raw_bar = RAW_CORROBORATION_RATIO if use_norm else ratio
    for q, v in now.items():
        p = prev.get(q)
        if p is None or p <= prev_floor:
            continue
        norm_ratio = (v / p) * scale
        if norm_ratio > ratio and v > raw_bar * p and (v - p) > abs_floor:
            out[q] = {"prev": p, "now": v, "ratio": round(v / p, 2)}
            if use_norm:
                out[q]["norm_ratio"] = round(norm_ratio, 2)
    return out


def cal_median(art: dict) -> float | None:
    """A run's CPU-speed estimate: the median of its start/mid/end
    fixed-work calibrations (robust to one probe catching a wave —
    r15's start probe read 2.143 s on a box whose mid/end read
    0.63/0.41). None when the artifact carries no calibration."""
    vals = [
        art.get(k)
        for k in ("calibration_sec", "calibration_sec_mid", "calibration_sec_end")
        if art.get(k)
    ]
    return statistics.median(vals) if vals else None


def probe_corroboration(
    phase: str,
    probes_now: dict[str, float],
    probes_prev: dict[str, float],
    phase_probes: dict[str, tuple[str, ...]] | None = None,
) -> float | None:
    """Max inflation ratio of the phase's bracketing write probes vs the
    previous artifact (None when the reference lacks them)."""
    ratios = [
        probes_now[k] / probes_prev[k]
        for k in (phase_probes or PHASE_PROBES).get(phase, ())
        if probes_now.get(k) and probes_prev.get(k)
    ]
    return round(max(ratios), 2) if ratios else None


def _newest_round_artifact(repo_dir: str) -> str | None:
    """Basename of the highest-numbered BENCH_r{N}.json, or None. The
    single copy of the round-artifact discovery rule (code-review r15:
    it was duplicated in _load_reference and _ab_base_commit)."""
    import glob
    import re as _re2

    rounds = []
    for p in glob.glob(os.path.join(repo_dir, "BENCH_r*.json")):
        m = _re2.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            rounds.append((int(m.group(1)), os.path.basename(p)))
    return max(rounds)[1] if rounds else None


def _load_reference(repo_dir: str) -> tuple[dict, str] | tuple[None, str]:
    """Previous-artifact values to adjudicate against: the on-disk
    BENCH_local.json from the LAST completed run (full per-query detail;
    at a round boundary this is the committed previous-round artifact),
    overridable via SPARK_GRAFT_BENCH_REF; falls back to the newest
    BENCH_r{N}.json's parsed summary (headline queries + probes only).
    Committed round artifacts wrap the summary in a 'parsed' envelope —
    unwrapped on every path, including the override (code-review r15:
    pointing the override at BENCH_r14.json silently skipped on a None
    sf before this)."""

    def _unwrap(d: dict) -> dict:
        if "parsed" in d and isinstance(d.get("parsed"), dict):
            return d["parsed"]
        return d

    override = os.environ.get("SPARK_GRAFT_BENCH_REF", "")
    if override:
        with open(override) as f:
            return _unwrap(json.load(f)), override
    local = os.path.join(repo_dir, "BENCH_local.json")
    if os.path.isfile(local):
        with open(local) as f:
            return json.load(f), "BENCH_local.json"
    name = _newest_round_artifact(repo_dir)
    if name:
        with open(os.path.join(repo_dir, name)) as f:
            return _unwrap(json.load(f)), name
    return None, "none"


def _ab_base_commit(repo_dir: str) -> str | None:
    """The commit that last touched the newest round artifact — the code
    state the previous round's numbers measured (artifact commits only
    add artifacts on top of the measured snapshot)."""
    import subprocess

    name = _newest_round_artifact(repo_dir)
    if name is None:
        return None
    try:
        out = subprocess.run(
            ["git", "-C", repo_dir, "log", "-1", "--format=%h", "--", name],
            capture_output=True,
            text=True,
            check=True,
            timeout=30,
        ).stdout.strip()
        return out or None
    except Exception:
        return None


def _run_ab(repo_dir: str, base: str, queries: list[str], ab_rounds: int) -> dict:
    """One interleaved A/B subprocess (tools/ab_interleaved.py) for a
    batch of queries against ``base``; returns the parsed ``ab`` dict.
    Raises on subprocess failure — callers record unsettled_ab_error."""
    import subprocess
    import sys as _sys

    proc = subprocess.run(
        [
            _sys.executable,  # the bench's own interpreter, never bare "python"
            os.path.join(repo_dir, "tools", "ab_interleaved.py"),
            base,
            str(ab_rounds),
            ",".join(queries),
        ],
        capture_output=True,
        text=True,
        # scale with the batch: every suspect adds rounds x 2 timed
        # runs to the one interleaved session
        timeout=int(os.environ.get("SPARK_GRAFT_AB_TIMEOUT", "0"))
        or 1800 + 300 * max(0, len(queries) - 4),
        cwd=repo_dir,
    )
    line = next(
        (ln for ln in reversed(proc.stdout.strip().splitlines()) if ln.startswith("{")),
        None,
    )
    if proc.returncode != 0 or line is None:
        raise RuntimeError(f"ab rc={proc.returncode}: {proc.stderr[-300:]}")
    return json.loads(line)["ab"]


def _base_with_query(repo_dir: str, q: str, default_base: str) -> str | None:
    """A base commit that CONTAINS ``q`` for the A/B (VERDICT r15 item
    3): the default base is the previous round-artifact commit, which
    can predate a query the previous ARTIFACT nonetheless referenced
    (v16_prod/v17 in rounds 19/15). If the default base lacks the
    query, fall back to the commit that introduced its registry name —
    head-vs-introduction still answers 'did my changes since it was
    written slow it down' (the 4582f01 precedent, PERF_AB_r15)."""
    import subprocess

    try:
        hit = subprocess.run(
            ["git", "-C", repo_dir, "grep", "-l", "-F", q, default_base, "--",
             "nyc_taxi_etl_dashboard_spark", "__spark_entry__.py"],
            capture_output=True, text=True, timeout=30,
        )
        if hit.returncode == 0 and hit.stdout.strip():
            return default_base
        intro = subprocess.run(
            ["git", "-C", repo_dir, "log", "--reverse", "--format=%h", "-S", q,
             "--", "nyc_taxi_etl_dashboard_spark", "__spark_entry__.py"],
            capture_output=True, text=True, timeout=60,
        )
        lines = intro.stdout.strip().splitlines()
        return lines[0] if lines else None
    except Exception:
        return None


def _adjudicate(
    repo_dir: str,
    now_by_phase: dict[str, dict[str, float]],
    probes_now: dict[str, float],
    prods_first: bool = False,
    cal_now: float | None = None,
) -> tuple[dict, dict, dict]:
    """Returns (suspects, settled, meta) for the artifact. Runs AFTER all
    measurements (and after spark.stop(), so the A/B subprocess is the
    only JVM). Never raises — adjudication failures are recorded, not
    fatal to the bench."""
    meta: dict = {"ref": "none"}
    ref, ref_name = _load_reference(repo_dir)
    meta["ref"] = ref_name
    if ref is None:
        return {}, {}, meta
    now_all = {q: v for d in now_by_phase.values() for q, v in d.items()}
    phase_of = {q: ph for ph, d in now_by_phase.items() for q in d}
    if str(ref.get("sf")) != str(_sf_of_env()):
        meta["skipped"] = f"reference sf {ref.get('sf')!r} != current"
        return {}, {}, meta
    prev = {
        **(ref.get("queries") or {}),
        **(ref.get("curation_queries") or {}),
        **(ref.get("prod_paths") or {}),
    }
    probes_prev = {k: ref.get(k) for k in PROBE_KEYS}
    probe_map = phase_probe_map(prods_first)
    # normalized-first flagging (VERDICT r15 item 4): both sides' CPU
    # speed as the median of their three fixed-work probes
    cal_prev = cal_median(ref)
    meta["cal_now"], meta["cal_prev"] = cal_now, cal_prev
    suspects = find_suspects(now_all, prev, cal_now=cal_now, cal_prev=cal_prev)
    settled: dict[str, dict] = {}
    to_ab: list[str] = []
    for q, info in suspects.items():
        pr = probe_corroboration(
            phase_of.get(q, "headline"), probes_now, probes_prev, probe_map
        )
        info["write_probe_ratio"] = pr
        if pr is not None and pr > PROBE_WAVE_RATIO:
            settled[q] = {
                "verdict": "wave_probe_corroborated",
                "write_probe_ratio": pr,
            }
        else:
            to_ab.append(q)
    if not to_ab:
        return suspects, settled, meta
    if os.environ.get("SPARK_GRAFT_BENCH_ADJUDICATE", "1") == "0":
        for q in to_ab:
            settled[q] = {"verdict": "unsettled_adjudication_disabled"}
        return suspects, settled, meta
    ranked = sorted(to_ab, key=lambda q: suspects[q]["prev"] - suspects[q]["now"])
    to_ab, truncated = ranked[:AB_MAX_QUERIES], ranked[AB_MAX_QUERIES:]
    for q in truncated:
        # no silent caps: a flagged-but-not-A/B'd suspect gets an
        # explicit verdict so the artifact never shows a suspect with
        # no adjudication outcome (code-review r15)
        settled[q] = {"verdict": "unsettled_truncated_by_ab_cap"}
    base = _ab_base_commit(repo_dir)
    if base is None:
        for q in to_ab:
            settled[q] = {"verdict": "unsettled_no_base_commit"}
        return suspects, settled, meta
    meta["ab_base"] = base
    ab_rounds = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "3"))

    try:
        ab = _run_ab(repo_dir, base, to_ab, ab_rounds)
        retry: dict[str, list[str]] = {}
        for q in to_ab:
            r = ab.get(q, {}).get("paired_ratio_med")
            missing = ab.get(q, {}).get("missing_in")
            if r is None and missing in ("base", "both"):
                # the suspect postdates the base COMMIT (its reference
                # median came from the previous ARTIFACT — v16_prod in
                # round 19): re-A/B against a base that HAS the query
                # instead of leaving it unsettled (VERDICT r15 item 3)
                nb = _base_with_query(repo_dir, q, base)
                if nb and nb != base:
                    retry.setdefault(nb, []).append(q)
                    continue
            settled[q] = {
                "verdict": (
                    f"unsettled_absent_at_base_{missing}"
                    if r is None and missing
                    else "unsettled_ab_missing"
                    if r is None
                    else "code_regression"
                    if r > AB_CODE_THRESHOLD
                    else "wave_ab_exonerated"
                ),
                "paired_ratio_med": r,
            }
        for nb, qs in retry.items():
            meta.setdefault("ab_retry_bases", {})[nb] = qs
            rb = _run_ab(repo_dir, nb, qs, ab_rounds)
            for q in qs:
                r = rb.get(q, {}).get("paired_ratio_med")
                missing = rb.get(q, {}).get("missing_in")
                settled[q] = {
                    "verdict": (
                        f"unsettled_absent_at_base_{missing}"
                        if r is None and missing
                        else "unsettled_ab_missing"
                        if r is None
                        else "code_regression"
                        if r > AB_CODE_THRESHOLD
                        else "wave_ab_exonerated"
                    ),
                    "paired_ratio_med": r,
                    "ab_base": nb,
                }
    except Exception as exc:  # noqa: BLE001 - adjudication must not kill bench
        for q in to_ab:
            if q not in settled:
                settled[q] = {"verdict": "unsettled_ab_error", "error": str(exc)[:200]}
    return suspects, settled, meta


def _sf_of_env() -> float | str:
    label = (
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        .rstrip("/")
        .split("sf")[-1]
    )
    try:
        return float(label)
    except ValueError:
        return label


#: runs per query. Round-5 lesson (third flag): single-run timings on a
#: shared box swing ±50% (dd4 1.30→2.47 s with byte-identical code), so
#: every timing below is the MEDIAN of N_RUNS full executions, with
#: [min, median, max] spread reported per query so a real regression is
#: distinguishable from box noise without burning a judge round.
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def _timed(fn, n: int = 0) -> tuple[float, float, float]:
    """(median, min, max) wall seconds of ``n`` full executions."""
    import statistics

    runs = sorted(_timed_once(fn) for _ in range(n or N_RUNS))
    return statistics.median(runs), runs[0], runs[-1]


def _timed_once(fn) -> float:
    start = time.perf_counter()
    fn()
    return time.perf_counter() - start


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_label = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf: float | str = float(sf_label)
    except ValueError:  # non-numeric dir names (e.g. the 10x rehearsal)
        sf = sf_label

    import __spark_entry__ as entrymod
    from nyc_taxi_etl_dashboard_spark.session import get_spark

    spark = get_spark(app_name="bench")
    queries = entrymod.queries()

    # warm up the JVM/codegen paths once (excluded from timings)
    queries["a6_total_trips"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # fixed-work box calibration: a codegen'd grouped sum over a
    # synthetic range (CPU + one small shuffle, no IO, no fixture) — the
    # same work every round on every box. Cross-round comparisons can
    # divide suite times by (calibration / its historical baseline) to
    # normalize out machine drift (round-8 measured the SAME commit's
    # suite swinging ~15-25% intra-day on this box).
    from pyspark.sql import functions as F  # noqa: PLC0415

    def _calibrate() -> float:
        med, _, _ = _timed(
            lambda: spark.range(200_000_000, numPartitions=32)
            .groupBy((F.col("id") % 4096).alias("g"))
            .agg(F.sum(F.col("id") * 2 + 1).alias("s"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return round(med, 3)

    calibration_sec = _calibrate()

    # fixed-work IO calibration (r11 agenda item 2): a full scan+sum of
    # the RAW single-row-group lineitem fixture — the exact scan-serial
    # shape that bottlenecks pipe_transform_full. Three same-commit
    # runs in round 11 spanned 153-288k rows/s on the raw path while
    # curation totals agreed within 2%: the drift is IO-side, which the
    # CPU calibration (no IO by construction) cannot see. Dividing the
    # raw-path timing by this probe normalizes that axis the same way
    # value_norm normalizes CPU drift.
    def _io_probe_once() -> float:
        t0 = time.perf_counter()
        (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .agg(F.sum("l_quantity").alias("s"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return time.perf_counter() - t0

    def _calibrate_io() -> float:
        med, _, _ = _timed(_io_probe_once)
        return round(med, 3)

    io_calibration_sec = _calibrate_io()

    # fixed-work WRITE probe (round 14, PERF_AB_r14.md): the r13 dispute
    # showed the read probe is largely page-cache-served, so the shared-
    # disk write stalls that hit the transform hardest (its parquet
    # write + shuffle spill) inflate transform seconds ~3x while the
    # read probe moves ~2x — the io_norm ratio is drift-resistant, not
    # drift-proof. This probe writes a fixed 2M-row/3-col parquet
    # (~30 MB, same codec as the suite) and removes it; it is recorded,
    # never used in any headline ratio, so the io_norm series stays
    # comparable while the artifact can say WHICH IO axis moved.
    import shutil as _shutil
    import tempfile as _tempfile

    def _io_write_probe_once() -> float:
        d = _tempfile.mkdtemp(prefix="bench_wprobe_")
        t0 = time.perf_counter()
        (
            spark.range(2_000_000, numPartitions=32)
            .select(
                F.col("id"),
                (F.col("id") * 7 % 9973).alias("a"),
                F.concat(F.lit("w"), F.col("id") % 1000).alias("s"),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(d, "probe.parquet"))
        )
        dt = time.perf_counter() - t0
        _shutil.rmtree(d, ignore_errors=True)
        return dt

    def _calibrate_io_write() -> float:
        med, _, _ = _timed(_io_write_probe_once)
        return round(med, 3)

    io_write_calibration_sec = _calibrate_io_write()

    spread: dict[str, list[float]] = {}

    def run_suite(names: list[str]) -> dict[str, float]:
        out: dict[str, float] = {}
        for name in names:
            med, lo, hi = _timed(
                lambda: queries[name](spark, sf_dir)
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            out[name] = round(med, 3)
            spread[name] = [round(lo, 3), round(med, 3), round(hi, 3)]
        return out

    def run_prods() -> dict[str, float]:
        # production-path shapes (not in QUERIES: v4/v7_prod output is
        # approximate so it is recall-tested, not oracle-hashed;
        # x7_prod's sketch cut is engine-specific — t13's bound verdict
        # certifies it)
        from nyc_taxi_etl_dashboard_spark.operators import clear_nparts_memo
        from nyc_taxi_etl_dashboard_spark.plans.llmops import BENCH_ONLY

        out: dict[str, float] = {}
        for name, fn in BENCH_ONLY.items():
            # registered queries arrive pre-wrapped with a per-call
            # clearCache (__spark_entry__.pinned); BENCH_ONLY functions
            # are raw, so clear here too — otherwise each of the N_RUNS
            # executions of a persist()-ing prod path (t15_prod,
            # v11_prod) stacks a fresh cache entry and the accumulated
            # memory pressure leaks into later timings (ADVICE r8). The
            # partition-count memo drops alongside the cache for full
            # parity with pinned (ADVICE r9).
            def _run(fn=fn):
                spark.catalog.clearCache()
                clear_nparts_memo()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

            med, lo, hi = _timed(_run)
            out[name] = round(med, 3)
            spread[name] = [round(lo, 3), round(med, 3), round(hi, 3)]
        spark.catalog.clearCache()  # last prod path's blocks
        return out

    # session-position knob (r10 agenda item 5): prod_paths normally run
    # LAST, after ~100 query×run timings have aged the session;
    # SPARK_GRAFT_PRODS_FIRST=1 times them FIRST (right after warmup +
    # calibration) so the two orders can be compared once and the
    # session-aging effect sized. The artifact records which order ran.
    prods_first = os.environ.get("SPARK_GRAFT_PRODS_FIRST", "") == "1"
    prod_paths: dict[str, float] = run_prods() if prods_first else {}

    timings = run_suite(HEADLINE)
    # mid-suite drift sentinels (VERDICT r13 item 4): the start-of-run
    # probes cannot see drift (or session aging) that arrives DURING the
    # ~30-min suite — the r13 dispute had a start probe that ran faster
    # than r12's while late-suite queries ran 2-3x slower. Re-running
    # both fixed-work probes between phases gives every future
    # drift-vs-code dispute intra-run evidence: if _mid/_end probes
    # inflate alongside late-suite queries, the box (or the aged
    # session) moved; if probes hold flat while queries inflate, the
    # code (or per-query state) is the suspect.
    calibration_sec_mid = _calibrate()
    io_calibration_sec_mid = _calibrate_io()
    io_write_calibration_sec_mid = _calibrate_io_write()
    curation = run_suite(CURATION)

    if not prods_first:
        prod_paths = run_prods()
    calibration_sec_end = _calibrate()
    io_calibration_sec_end = _calibrate_io()
    io_write_calibration_sec_end = _calibrate_io_write()

    # rows/s through the full transform pipeline INCLUDING the parquet
    # writes of both branches (the reference's 300k rows/s covers load →
    # classify → write, transform.log:1,10): one scan, one partitioned
    # dual-sink write, counts via observe
    import shutil
    import tempfile

    from nyc_taxi_etl_dashboard_spark.plans.pipeline import dual_sink_write

    out_dir = tempfile.mkdtemp(prefix="bench_sink_")
    # The raw fixture files are single-row-group parquet: that scan can
    # never exceed ONE core no matter the cluster size, so the raw
    # number is scan-serial by construction. The engine's answer is a
    # bronze-layer ingest (one-time layout normalization it would own in
    # production). Since round 7 the bronze layout is a DETERMINISTIC
    # ON-DISK fixture (repartition(32), same recipe as the 10x
    # generator), built once and reused across bench runs, so
    # pipe_transform_bronze measures a real multi-file scan from disk —
    # not an ingest that ran seconds earlier in the same JVM.
    # bronze_ingest reports the build cost only on the run that builds.
    bronze_dir = os.environ.get(
        "SPARK_GRAFT_BRONZE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", f"bronze_sf{sf_label}"),
    )
    try:
        obs_box: dict = {}

        def full_pipeline() -> None:
            obs_box.update(dual_sink_write(spark, sf_dir, out_dir))

        # PAIRED measurement for the promoted headline (round 14): the
        # standalone io_calibration runs ~20 min before this point in a
        # full bench, so a transient IO stall can hit one side only and
        # corrupt the ratio (observed: probe 0.215 s at a quiet moment,
        # transform 2.1→4.6 s across its own three runs minutes later).
        # Interleaving probe→transform per run makes each ratio a
        # SAME-MOMENT comparison; the median/min of the ratios is the
        # headline, and the standalone probe stays as a reference point.
        import statistics as _stats

        # one UNTIMED warm-up execution (round 14): every suite query
        # runs after the shared session warm-up, but the transform
        # special's first-ever execution in the session also pays its
        # own codegen + broadcast warm-up — measured 18.6 s cold vs
        # 4.6 s warm on identical 10x data in a fresh session. The
        # suites' medians absorb a cold first run at N_RUNS=3; the
        # paired transform at N_RUNS=2 does not. Recorded in the
        # artifact so the series change is explicit.
        full_pipeline()

        _pair_probe, _pair_xform = [], []
        for _ in range(N_RUNS):
            _pair_probe.append(_io_probe_once())
            _pair_xform.append(_timed_once(full_pipeline))
        _ratios = sorted(x / p for x, p in zip(_pair_xform, _pair_probe))
        io_norm_paired = round(_stats.median(_ratios), 2)
        io_norm_paired_min = round(_ratios[0], 2)
        _xs = sorted(_pair_xform)
        pipeline_sec, p_lo, p_hi = _stats.median(_xs), _xs[0], _xs[-1]
        spread["pipe_transform_full"] = [round(p_lo, 3), round(pipeline_sec, 3), round(p_hi, 3)]
        spread["io_probe_paired"] = [round(x, 3) for x in sorted(_pair_probe)]
        n_rows = obs_box["total"]

        # Staleness guard (ADVICE r7): the persistent fixture is only
        # reusable if it still mirrors the CURRENT source data — if the
        # sf fixture was regenerated, or SPARK_GRAFT_SF_DIR points at
        # different data under the same label, a silently reused bronze
        # layout would make pipe_transform_bronze (and its rps, which
        # divides the RAW path's row count by the bronze timing) measure
        # mismatched data. Row-count equality per table is the
        # fingerprint — cheap (parquet footer metadata, no scan) and it
        # catches every regeneration our generators can produce (replica
        # scale-ups and sf changes all change row counts).
        def _bronze_stale() -> bool:
            for t in ("lineitem", "orders"):
                if not os.path.isdir(f"{bronze_dir}/{t}.parquet"):
                    return True
                if (
                    spark.read.parquet(f"{bronze_dir}/{t}.parquet").count()
                    != spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
                ):
                    return True
            return False

        ingest_sec = 0.0
        if _bronze_stale():
            ingest_start = time.perf_counter()
            for t in ("lineitem", "orders"):
                spark.read.parquet(f"{sf_dir}/{t}.parquet").repartition(32).write.mode(
                    "overwrite"
                ).parquet(f"{bronze_dir}/{t}.parquet")
            ingest_sec = time.perf_counter() - ingest_start
        bronze_sec, b_lo, b_hi = _timed(
            lambda: dual_sink_write(spark, bronze_dir, out_dir)
        )
        spread["pipe_transform_bronze"] = [round(b_lo, 3), round(bronze_sec, 3), round(b_hi, 3)]
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    timings["pipe_transform_full"] = round(pipeline_sec, 3)
    timings["bronze_ingest"] = round(ingest_sec, 3)
    timings["pipe_transform_bronze"] = round(bronze_sec, 3)

    # bronze_ingest is a one-time layout normalization, not a steady-state
    # query: exclude it from the headline total so the series tracks query
    # cost only — but ALSO report the with-ingest total so the series stays
    # continuous across the round-2 definition change: r01's value (30.597)
    # INCLUDED ingest; r02's (23.603) excluded it. Under a single
    # definition the series is r01 30.597 / r02 25.967 with ingest, or
    # r01 26.923 / r02 23.603 without.
    total = round(sum(v for k, v in timings.items() if k != "bronze_ingest"), 3)
    total_with_ingest = round(sum(timings.values()), 3)

    def _suite_min(names: list[str]) -> float:
        return round(sum(spread[n][0] for n in names if n in spread), 3)

    # every per-query value (and therefore the totals) is the MEDIAN of
    # runs_per_query executions; value_min/curation_min sum the per-query
    # MINIMUMS (the plan-cost estimator on a noisy box — ADVICE r6);
    # "spread" in BENCH_local.json carries [min, median, max] per query
    summary = {
        "metric": "headline_queries_total",
        # PROMOTED COMPARABLE (VERDICT r13 item 4): the raw single-file
        # transform scan drifts with box IO (three rounds of judge/
        # builder cycles re-litigated it), so the FIRST numbers here are
        # the IO-normalized transform figure and its min-twin — each a
        # per-run ratio of transform seconds over a fixed-work
        # single-file scan probe run IMMEDIATELY BEFORE it (interleaved
        # pairs, round 14), so a stall inflates numerator and
        # denominator of the same pair together. Raw rows/s stays below
        # as the secondary (absolute) series.
        "pipe_transform_io_norm": io_norm_paired,
        "pipe_transform_io_norm_min": io_norm_paired_min,
        # round 14: the paired transform now runs once untimed first
        # (codegen/broadcast warm-up, the same treatment every suite
        # query gets from the shared warm-up); flagged so artifact
        # series before/after the change are read correctly
        "transform_warmup": True,
        # continuity across the round-14 definition change (the r2
        # value_with_ingest precedent): the pre-pairing definition
        # (median transform / standalone probe) for comparison against
        # BENCH_r≤14 artifacts. The scales differ because the paired
        # probe runs page-cache-warm immediately before its transform;
        # the PAIRED series is the stable one (intra-run ratio spread
        # ~4% vs 2.5× across same-code runs under the old definition).
        "pipe_transform_io_norm_legacy": round(
            pipeline_sec / io_calibration_sec, 2
        ),
        "value": total,
        "value_min": _suite_min([*HEADLINE, "pipe_transform_full", "pipe_transform_bronze"]),
        "value_with_ingest": total_with_ingest,
        "unit": "sec",
        "runs_per_query": N_RUNS,
        "queries": timings,
        "curation_total": round(sum(curation.values()), 3),
        "curation_min": _suite_min(CURATION),
        "prod_paths": prod_paths,
        "prods_order": "first" if prods_first else "last",
        "sf": sf,
        "pipe_transform_rows": n_rows,
        "pipe_transform_rps": round(n_rows / pipeline_sec),
        "pipe_transform_bronze_rps": round(n_rows / bronze_sec),
        # min-based twins (same estimator as value_min/curation_min —
        # the ADVICE-r6 noise-robust plan-cost read on a drifting box;
        # medians above remain the primary series)
        "pipe_transform_rps_min": round(n_rows / spread["pipe_transform_full"][0]),
        "pipe_transform_bronze_rps_min": round(
            n_rows / spread["pipe_transform_bronze"][0]
        ),
        # fixed-work calibration (200M-row codegen'd grouped sum: CPU +
        # one 4096-key shuffle, no IO, no fixture): divide suite times by
        # (calibration_sec / baseline) to normalize box drift across
        # rounds
        "calibration_sec": calibration_sec,
        # IO twin probe backing the promoted io_norm figures above
        "io_calibration_sec": io_calibration_sec,
        # mid-suite and end-of-suite re-runs of the SAME two probes
        # (VERDICT r13 item 4): _mid lands between the headline and
        # curation phases, _end after the prod paths, immediately
        # before the transform pairing — three probe points per run so
        # intra-run drift/aging is measured, not litigated
        "calibration_sec_mid": calibration_sec_mid,
        "io_calibration_sec_mid": io_calibration_sec_mid,
        "calibration_sec_end": calibration_sec_end,
        "io_calibration_sec_end": io_calibration_sec_end,
        # write-axis probes (PERF_AB_r14.md): diagnostic only, never in
        # a headline ratio
        "io_write_calibration_sec": io_write_calibration_sec,
        "io_write_calibration_sec_mid": io_write_calibration_sec_mid,
        "io_write_calibration_sec_end": io_write_calibration_sec_end,
        # drift-normalized twins (VERDICT r8 item 4): suite totals as
        # MULTIPLES OF THE FIXED-WORK CALIBRATION on the same box at the
        # same moment — box drift inflates numerator and denominator
        # together, so these ratios are comparable across rounds even
        # when absolute seconds are not. Per-query ratios are in
        # BENCH_local.json under "queries_norm".
        "value_norm": round(total / calibration_sec, 2),
        "value_min_norm": round(
            _suite_min([*HEADLINE, "pipe_transform_full", "pipe_transform_bronze"])
            / calibration_sec,
            2,
        ),
        "curation_norm": round(sum(curation.values()) / calibration_sec, 2),
        "detail": "BENCH_local.json",
    }
    # self-adjudication (VERDICT r14 item 1): flag >2x anomalies vs the
    # previous artifact, settle them via probe corroboration or an
    # interleaved A/B — AFTER spark.stop() so the A/B subprocess is the
    # only JVM on the box (clean same-moment pairs, no memory contention)
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    now_by_phase = {
        "headline": {q: timings[q] for q in HEADLINE if q in timings},
        "curation": curation,
        "prod": prod_paths,
        "transform": {
            "pipe_transform_full": timings["pipe_transform_full"],
            "pipe_transform_bronze": timings["pipe_transform_bronze"],
        },
    }
    probes_now = {k: summary[k] for k in PROBE_KEYS}
    spark.stop()
    suspects, settled, adj_meta = _adjudicate(
        repo_dir,
        now_by_phase,
        probes_now,
        prods_first=prods_first,
        cal_now=cal_median(summary),
    )
    summary["suspects"] = suspects
    summary["settled"] = settled
    summary["adjudication"] = adj_meta

    full = dict(summary)
    full["curation_queries"] = curation
    full["spread"] = spread
    full["queries_norm"] = {
        # vals is [min, med, max] for suite queries but a raw sorted
        # N_RUNS list for io_probe_paired — index the median position
        # so SPARK_GRAFT_BENCH_RUNS=1 smoke runs don't crash
        name: round(vals[len(vals) // 2] / calibration_sec, 2)
        for name, vals in spread.items()
    }
    local_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_local.json"
    )
    with open(local_path, "w") as f:
        json.dump(full, f, indent=1)
        f.write("\n")
    # stdout stays ONE line, but the driver keeps only a 2,000-char TAIL:
    # r15's line outgrew it (suspects/settled on a noisy box) and the
    # recorded artifact lost metric/value/queries. Emit diagnostics
    # first and the driver-critical keys last so truncation can only
    # ever eat diagnostics.
    tail_critical = (
        "pipe_transform_io_norm",
        "pipe_transform_io_norm_min",
        "value_norm",
        "value_min_norm",
        "curation_norm",
        "pipe_transform_rps",
        "pipe_transform_rps_min",
        "pipe_transform_bronze_rps",
        "pipe_transform_bronze_rps_min",
        "curation_total",
        "prod_paths",
        "metric",
        "value",
        "value_min",
        "unit",
        "runs_per_query",
        "sf",
        "queries",
    )
    emit = {k: v for k, v in summary.items() if k not in tail_critical}
    # stdout-only compaction (full detail stays in BENCH_local.json):
    # verbose suspects/settled blocks are what pushed r15's line past
    # the tail; compact them to {query: ratio} / {query: "verdict:ratio"}
    if emit.get("suspects"):
        emit["suspects"] = {
            q: info.get("ratio") for q, info in emit["suspects"].items()
        }
    if emit.get("settled"):
        emit["settled"] = {
            q: f"{v.get('verdict')}:{v.get('paired_ratio_med')}"
            for q, v in emit["settled"].items()
        }
    emit.update({k: summary[k] for k in tail_critical if k in summary})
    print(json.dumps(emit, separators=(",", ":")))


if __name__ == "__main__":
    main()
