"""Pins for bench.py's self-adjudication rule (VERDICT r14 item 1): the
suspect flagging, probe corroboration, and reference-loading logic are
pure functions so the thresholds that gate an automatic interleaved A/B
are testable without running a bench."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_find_suspects_flags_2x_with_floors():
    prev = {"big": 5.0, "small": 0.2, "tiny": 0.02, "steady": 4.0, "gone": 3.0}
    now = {
        "big": 11.0,  # 2.2x and +6 s -> suspect
        "small": 0.55,  # 2.75x but +0.35 s < abs floor -> not a suspect
        "tiny": 1.0,  # prev below prev_floor -> ignored (no stable base)
        "steady": 4.3,  # inside 2x -> clean
        "new_query": 9.0,  # no reference value -> cannot be a suspect
    }
    suspects = bench.find_suspects(now, prev)
    assert set(suspects) == {"big"}
    assert suspects["big"]["prev"] == 5.0 and suspects["big"]["now"] == 11.0
    assert suspects["big"]["ratio"] == 2.2


def test_find_suspects_tiny_prev_floor_is_tunable():
    # a 0.02 s reference is noise; callers can widen the floor
    assert bench.find_suspects({"q": 1.0}, {"q": 0.02}) == {}
    got = bench.find_suspects({"q": 1.0}, {"q": 0.1}, abs_floor=0.5)
    assert got == {"q": {"prev": 0.1, "now": 1.0, "ratio": 10.0}}


def test_probe_corroboration_uses_phase_bracketing_probes():
    prev = {
        "io_write_calibration_sec": 0.4,
        "io_write_calibration_sec_mid": 0.3,
        "io_write_calibration_sec_end": 0.5,
    }
    # curation phase brackets with the mid+end probes: mid tripled
    now = dict(prev, io_write_calibration_sec_mid=0.9)
    assert bench.probe_corroboration("curation", now, prev) == 3.0
    # headline phase brackets with start+mid: start flat, mid tripled
    assert bench.probe_corroboration("headline", now, prev) == 3.0
    # prod phase only sees the end probe, which held flat
    assert bench.probe_corroboration("prod", now, prev) == 1.0
    # missing reference values -> None, never a divide-by-zero
    assert bench.probe_corroboration("prod", now, {}) is None


def test_load_reference_prefers_local_then_round_artifact(tmp_path):
    # no artifacts at all -> (None, "none")
    ref, name = bench._load_reference(str(tmp_path))
    assert ref is None and name == "none"
    # newest BENCH_r{N}.json's parsed summary is the fallback
    (tmp_path / "BENCH_r09.json").write_text(json.dumps({"parsed": {"sf": 0.1, "queries": {"a": 1}}}))
    (tmp_path / "BENCH_r10.json").write_text(json.dumps({"parsed": {"sf": 0.1, "queries": {"a": 2}}}))
    ref, name = bench._load_reference(str(tmp_path))
    assert name == "BENCH_r10.json" and ref["queries"]["a"] == 2
    # an on-disk BENCH_local.json (full detail) wins over round artifacts
    (tmp_path / "BENCH_local.json").write_text(json.dumps({"sf": 0.1, "queries": {"a": 3}}))
    ref, name = bench._load_reference(str(tmp_path))
    assert name == "BENCH_local.json" and ref["queries"]["a"] == 3


def test_adjudicate_skips_on_sf_mismatch(tmp_path, monkeypatch):
    (tmp_path / "BENCH_local.json").write_text(
        json.dumps({"sf": "10x", "queries": {"a": 1.0}})
    )
    monkeypatch.delenv("SPARK_GRAFT_SF_DIR", raising=False)  # -> sf 0.1
    suspects, settled, meta = bench._adjudicate(
        str(tmp_path), {"headline": {"a": 9.0}}, {}
    )
    assert suspects == {} and settled == {}
    assert "skipped" in meta and meta["ref"] == "BENCH_local.json"


def test_adjudicate_probe_corroborated_wave_needs_no_ab(tmp_path, monkeypatch):
    """A suspect whose bracketing write probe inflated >2x is settled in
    place as a box wave — no subprocess A/B is attempted (the test would
    fail loudly if one were: there is no git repo at tmp_path)."""
    (tmp_path / "BENCH_local.json").write_text(
        json.dumps(
            {
                "sf": 0.1,
                "queries": {"q": 2.0},
                "io_write_calibration_sec": 0.4,
                "io_write_calibration_sec_mid": 0.4,
                "io_write_calibration_sec_end": 0.4,
            }
        )
    )
    monkeypatch.delenv("SPARK_GRAFT_SF_DIR", raising=False)
    probes_now = {
        "io_write_calibration_sec": 1.2,  # 3x the reference probe
        "io_write_calibration_sec_mid": 1.2,
        "io_write_calibration_sec_end": 0.4,
    }
    suspects, settled, meta = bench._adjudicate(
        str(tmp_path), {"headline": {"q": 5.0}}, probes_now
    )
    assert set(suspects) == {"q"}
    assert settled["q"]["verdict"] == "wave_probe_corroborated"
    assert settled["q"]["write_probe_ratio"] == 3.0


def test_adjudicate_disabled_marks_unsettled(tmp_path, monkeypatch):
    (tmp_path / "BENCH_local.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"q": 2.0}, "io_write_calibration_sec": 0.4})
    )
    monkeypatch.delenv("SPARK_GRAFT_SF_DIR", raising=False)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ADJUDICATE", "0")
    # probes flat -> not a corroborated wave -> would A/B, but it's disabled
    probes_now = {"io_write_calibration_sec": 0.4}
    suspects, settled, _ = bench._adjudicate(
        str(tmp_path), {"headline": {"q": 5.0}}, probes_now
    )
    assert settled["q"]["verdict"] == "unsettled_adjudication_disabled"


def test_load_reference_override_unwraps_parsed_envelope(tmp_path, monkeypatch):
    """Pointing SPARK_GRAFT_BENCH_REF at a committed round artifact
    (the {'parsed': {...}} envelope) must unwrap it — before this, the
    override path saw sf=None and silently skipped adjudication."""
    p = tmp_path / "BENCH_r99.json"
    p.write_text(json.dumps({"rc": 0, "parsed": {"sf": 0.1, "queries": {"a": 1}}}))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_REF", str(p))
    ref, name = bench._load_reference(str(tmp_path))
    assert ref["sf"] == 0.1 and ref["queries"]["a"] == 1 and name == str(p)


def test_adjudicate_truncated_suspects_get_explicit_verdict(tmp_path, monkeypatch):
    """Suspects past the AB_MAX_QUERIES cap must carry an explicit
    unsettled verdict — no silent caps (code-review r15)."""
    queries = {f"q{i}": 2.0 for i in range(bench.AB_MAX_QUERIES + 2)}
    (tmp_path / "BENCH_local.json").write_text(
        json.dumps({"sf": 0.1, "queries": queries, "io_write_calibration_sec": 0.4})
    )
    monkeypatch.delenv("SPARK_GRAFT_SF_DIR", raising=False)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ADJUDICATE", "1")
    now = {q: 9.0 for q in queries}  # all suspects, probes flat -> all want A/B
    suspects, settled, _ = bench._adjudicate(
        str(tmp_path), {"headline": now}, {"io_write_calibration_sec": 0.4}
    )
    assert len(suspects) == bench.AB_MAX_QUERIES + 2
    truncated = [q for q, v in settled.items() if v["verdict"] == "unsettled_truncated_by_ab_cap"]
    assert len(truncated) == 2
    # every suspect has SOME settled entry (A/B ones get unsettled_no_base
    # or an error here -- tmp_path has no BENCH_r artifact/git repo)
    assert set(settled) == set(suspects)


def test_phase_probe_map_moves_prod_bracket_with_run_order():
    """Under SPARK_GRAFT_PRODS_FIRST the prod paths run right after the
    START probes; corroborating them against the end probe would
    attribute a late wave to an early query (code-review r15)."""
    assert bench.phase_probe_map(False)["prod"] == ("io_write_calibration_sec_end",)
    assert bench.phase_probe_map(True)["prod"] == ("io_write_calibration_sec",)
    # other phases unchanged either way
    assert bench.phase_probe_map(True)["curation"] == bench.PHASE_PROBES["curation"]


def test_find_suspects_normalized_rule_absorbs_slow_box():
    """VERDICT r15 item 4: flag on calibration-normalized ratios first.
    A box running uniformly 2.5x slower must not manufacture suspects;
    a query that doubled while the calibration held flat must still
    flag (with the normalized ratio recorded); a query holding flat in
    raw seconds must not flag just because the CPU probe sped up
    (raw corroboration)."""
    prev = {"boxed": 4.0, "regressed": 4.0, "io_bound": 4.0}
    # box wave: everything (and the calibration) inflated ~2.5x
    now = {"boxed": 10.0, "regressed": 4.1, "io_bound": 4.0}
    got = bench.find_suspects(now, prev, cal_now=1.5, cal_prev=0.6)
    assert got == {}  # 2.5x raw, but 1.0x normalized -> box, not code
    # same raw numbers WITHOUT calibrations -> the raw rule flags it
    assert set(bench.find_suspects(now, prev)) == {"boxed"}
    # true regression on a steady box: flags, with both ratios recorded
    got = bench.find_suspects({"regressed": 9.0}, prev, cal_now=0.6, cal_prev=0.6)
    assert set(got) == {"regressed"}
    assert got["regressed"]["ratio"] == 2.25
    assert got["regressed"]["norm_ratio"] == 2.25
    # CPU probe sped up 3x while an IO-bound query held flat: the
    # normalized ratio alone clears 2x, but raw corroboration vetoes
    got = bench.find_suspects({"io_bound": 4.2}, prev, cal_now=0.2, cal_prev=0.6)
    assert got == {}


def test_cal_median_is_robust_to_one_probe_wave():
    # r15's real shape: start probe caught a wave, mid/end were clean
    art = {"calibration_sec": 2.143, "calibration_sec_mid": 0.63,
           "calibration_sec_end": 0.409}
    assert bench.cal_median(art) == 0.63
    assert bench.cal_median({"calibration_sec": 0.5}) == 0.5
    assert bench.cal_median({}) is None


def test_adjudicate_batches_all_suspects_no_truncation(tmp_path, monkeypatch):
    """VERDICT r15 item 3: the auto-A/B batches every suspect into the
    one interleaved session — a doctored reference flagging 6 suspects
    must yield 6 explicit verdicts with ZERO truncated (the old cap of
    4 silently dropped v15/t20)."""
    queries = {f"q{i}": 2.0 for i in range(6)}
    (tmp_path / "BENCH_local.json").write_text(
        json.dumps({"sf": 0.1, "queries": queries, "io_write_calibration_sec": 0.4})
    )
    monkeypatch.delenv("SPARK_GRAFT_SF_DIR", raising=False)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ADJUDICATE", "1")
    now = {q: 9.0 for q in queries}  # all suspects, probes flat -> all ride the A/B
    suspects, settled, _ = bench._adjudicate(
        str(tmp_path), {"headline": now}, {"io_write_calibration_sec": 0.4}
    )
    assert len(suspects) == 6
    assert set(settled) == set(suspects)
    assert not [q for q, v in settled.items()
                if v["verdict"] == "unsettled_truncated_by_ab_cap"]
    # no git repo at tmp_path -> every verdict is the explicit no-base one
    assert {v["verdict"] for v in settled.values()} == {"unsettled_no_base_commit"}


def test_adjudicate_truncates_loudly_past_the_sanity_cap(tmp_path, monkeypatch):
    """VERDICT r16 item 4: fe6a0f1 raised AB_MAX_QUERIES 12 -> 24 with
    no test change. A doctored reference flagging MORE suspects than
    the cap must yield explicit verdicts for exactly AB_MAX_QUERIES of
    them and the LOUD unsettled_truncated_by_ab_cap marker — never a
    silent drop — for the rest."""
    n = bench.AB_MAX_QUERIES + 4
    queries = {f"q{i:02d}": 2.0 for i in range(n)}
    (tmp_path / "BENCH_local.json").write_text(
        json.dumps({"sf": 0.1, "queries": queries, "io_write_calibration_sec": 0.4})
    )
    monkeypatch.delenv("SPARK_GRAFT_SF_DIR", raising=False)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ADJUDICATE", "1")
    now = {q: 9.0 for q in queries}  # all suspects, probes flat
    suspects, settled, _ = bench._adjudicate(
        str(tmp_path), {"headline": now}, {"io_write_calibration_sec": 0.4}
    )
    assert len(suspects) == n
    assert set(settled) == set(suspects)  # every suspect gets SOME verdict
    truncated = [q for q, v in settled.items()
                 if v["verdict"] == "unsettled_truncated_by_ab_cap"]
    assert len(truncated) == 4
    assert len(settled) - len(truncated) == bench.AB_MAX_QUERIES


def test_base_with_query_falls_back_to_introducing_commit():
    """The v17 shape: the previous-artifact commit predates the query.
    _base_with_query must return the commit that introduced the
    query's registry name instead (the 4582f01 precedent)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # b25999b is the r14 artifact commit; dd17 postdates it
    got = bench._base_with_query(repo, "dd17_snapshot_churn", "b25999b")
    assert got == "bcba6f1"  # the commit that added dd17
    # a query the default base DOES contain keeps the default base
    got = bench._base_with_query(repo, "pipe_valid_rows", "b25999b")
    assert got == "b25999b"
