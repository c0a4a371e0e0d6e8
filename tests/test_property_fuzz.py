"""Property-based fuzzing (hypothesis) of the custom operators against
independent reference implementations (pandas / pure python).

The oracle-parity suite pins behavior on the fixtures; these pin it on
ADVERSARIAL inputs hypothesis hunts for — boundary timestamps landing
exactly on bucket edges, rule values exactly on thresholds, dedup ties.
``derandomize=True`` keeps the suite deterministic (no flaky driver
runs); each failing example hypothesis finds is then fixed forever as
the shrunk counterexample.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(max_examples=15, deadline=None, derandomize=True)

# small domains force collisions/ties; bounded ints keep math exact
_uids = st.integers(min_value=0, max_value=3)
_ts = st.integers(min_value=0, max_value=500)
_vals = st.integers(min_value=-5, max_value=5)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@settings(**SETTINGS)
@given(
    left=st.lists(st.tuples(_uids, _ts), min_size=1, max_size=12),
    right=st.lists(st.tuples(_uids, _ts, _vals), min_size=1, max_size=12),
)
def test_asof_join_matches_pandas_merge_asof(spark, direction, left, right):
    """asof_join (union-window formulation) ≡ pandas merge_asof in BOTH
    directions, including exact-timestamp ties. Right (uid, ts) pairs
    are deduped: with duplicates the matched row is ambiguous in both
    engines (input-order dependent), so no stable property exists."""
    from nyc_taxi_etl_dashboard_spark.operators.temporal import asof_join

    right = list({(u, t): (u, t, v) for u, t, v in right}.values())
    ldf = spark.createDataFrame(
        [(i, u, t) for i, (u, t) in enumerate(left)], "lid int, uid int, lts long"
    )
    rdf = spark.createDataFrame(right, "uid int, rts long, payload int")
    got = {
        r.lid: r.payload
        for r in asof_join(
            ldf, rdf, by="uid", left_ts="lts", right_ts="rts",
            payload_cols=["payload"], direction=direction,
        ).collect()
    }
    lp = pd.DataFrame([(i, u, t) for i, (u, t) in enumerate(left)], columns=["lid", "uid", "lts"]).sort_values("lts", kind="stable")
    rp = pd.DataFrame(right, columns=["uid", "rts", "payload"]).sort_values("rts", kind="stable")
    want_df = pd.merge_asof(lp, rp, left_on="lts", right_on="rts", by="uid", direction=direction)
    want = {
        int(r.lid): (None if pd.isna(r.payload) else int(r.payload))
        for r in want_df.itertuples()
    }
    assert got == want


_money = st.one_of(
    st.integers(min_value=-2, max_value=3).map(float),
    st.sampled_from([0.0, 0.1, 1.0, 100.0, 100.1, 99.99]),
)


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(_money, _money, _money, st.integers(min_value=-1, max_value=3), _money),
        min_size=1,
        max_size=20,
    )
)
def test_classify_first_match_matches_python_cascade(spark, rows):
    """The CASE-WHEN chain ≡ an independent python first-match loop over
    the same five rules, with hypothesis steering values onto the exact
    rule boundaries (0, 0.1, 1, 100)."""
    from nyc_taxi_etl_dashboard_spark.operators.classify import classify, taxi_rules

    df = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(rows)],
        "rid int, trip_duration double, trip_distance double, fare_amount double,"
        " passenger_count int, avg_speed double",
    )
    got = {r.rid: r.rejection_reason for r in classify(df, taxi_rules()).collect()}

    def expected(dur, dist, fare, pax, spd):
        if dur <= 0:
            return "Durée invalide"
        if not (0.1 <= dist <= 100.0):
            return "Distance hors limites"
        if fare <= 0:
            return "Montant de course invalide"
        if pax <= 0:
            return "Passagers invalides"
        if not (1.0 <= spd <= 100.0):
            return "Vitesse irréaliste"
        return None

    want = {i: expected(*r) for i, r in enumerate(rows)}
    assert got == want


@settings(**SETTINGS)
@given(
    rows=st.lists(st.tuples(_uids, st.integers(0, 100), _vals), min_size=1, max_size=15)
)
def test_dedup_keep_first_matches_pandas(spark, rows):
    """dedup_keep_first ≡ pandas sort + drop_duplicates(keep='first');
    the tiebreaker column is made unique so 'first' is well-defined."""
    from nyc_taxi_etl_dashboard_spark.operators.dedup import dedup_keep_first

    rows = [(u, i, v) for i, (u, _, v) in enumerate(rows)]  # unique tiebreak
    df = spark.createDataFrame(rows, "k int, tb int, v int")
    got = sorted(
        (r.k, r.tb) for r in dedup_keep_first(df, ["k"], ["tb"]).collect()
    )
    p = pd.DataFrame(rows, columns=["k", "tb", "v"]).sort_values("tb", kind="stable")
    want = sorted(
        (int(r.k), int(r.tb)) for r in p.drop_duplicates("k", keep="first").itertuples()
    )
    assert got == want


@settings(**SETTINGS)
@given(
    events=st.lists(st.tuples(st.integers(0, 6), _ts), min_size=1, max_size=12),
    intervals=st.lists(st.tuples(st.integers(0, 6), _ts, _ts), min_size=1, max_size=8),
    bucket=st.sampled_from([7, 64, 128]),
)
def test_range_join_matches_bruteforce(spark, events, intervals, bucket):
    """Bucketized range join ≡ brute-force containment scan — hypothesis
    drives event times onto bucket edges and degenerate (point)
    intervals, where off-by-ones in the bucketization would hide."""
    from nyc_taxi_etl_dashboard_spark.operators.temporal import range_join_intervals

    intervals = [(i, min(s, e), max(s, e)) for i, (_, s, e) in enumerate(intervals)]
    edf = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(events)], "eid int, ts long"
    )
    idf = spark.createDataFrame(intervals, "iid int, start long, stop long")
    got = sorted(
        (r.eid, r.iid)
        for r in range_join_intervals(
            edf, idf, event_ts="ts", start_col="start", end_col="stop",
            bucket_seconds=bucket,
        ).collect()
    )
    want = sorted(
        (ei, ii)
        for ei, (_, t) in enumerate(events)
        for ii, s, e in intervals
        if s <= t <= e
    )
    assert got == want


@settings(**SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)), min_size=1, max_size=25
    )
)
def test_connected_components_matches_union_find_on_random_graphs(spark, edges):
    """BOTH execution paths (driver-local union-find and distributed
    min-label propagation, forced via local_threshold=0) ≡ an
    independent union-find on arbitrary random graphs — hypothesis
    hunts for topologies (self-loops, parallel edges, long chains,
    stars) where propagation could converge early or mislabel."""
    from nyc_taxi_etl_dashboard_spark.operators.dedup import connected_components

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, "id_a int, id_b int")
    got = {r.id: r.cluster_id for r in connected_components(df).collect()}
    got_dist = {
        r.id: r.cluster_id
        for r in connected_components(df, local_threshold=0).collect()
    }
    assert got == got_dist

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    assert got == want


_words = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])


@settings(**SETTINGS)
@given(
    docs=st.lists(st.lists(_words, min_size=0, max_size=8), min_size=2, max_size=8),
    thr=st.sampled_from([0.0, 0.34, 0.5]),
)
def test_jaccard_pairs_matches_bruteforce(spark, docs, thr):
    """Inverted-index Jaccard ≡ brute-force 3-shingle Jaccard on random
    tiny corpora — hypothesis reaches the edges (docs shorter than the
    shingle width, identical docs, zero-overlap pairs) the fixture
    can't."""
    from nyc_taxi_etl_dashboard_spark.operators.dedup import jaccard_pairs

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs(df, threshold=thr, max_shingle_freq=None).collect()
    }

    def sh(toks):
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        } if len(toks) >= 3 else set()

    want = {}
    for i, a in enumerate(docs):
        for j in range(i + 1, len(docs)):
            sa, sb = sh(a), sh(docs[j])
            inter = len(sa & sb)
            if not inter:
                continue  # inverted index never materializes disjoint pairs
            jac = inter / (len(sa) + len(sb) - inter)
            if jac >= thr:
                want[(i, j)] = jac
    assert set(got) == set(want)
    for k, v in got.items():
        assert abs(want[k] - v) < 1e-12


@settings(**SETTINGS)
@given(
    docs=st.lists(st.lists(_words, min_size=1, max_size=6), min_size=2, max_size=10),
    max_h=st.sampled_from([1, 3]),
)
def test_simhash_pairs_matches_bruteforce(spark, docs, max_h):
    """Banded pigeonhole candidate generation is EXACT (every pair
    within the hamming bound surfaces) on arbitrary random corpora —
    including identical docs (hamming 0) and near-misses."""
    from nyc_taxi_etl_dashboard_spark.operators.dedup import simhash32, simhash_pairs

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_pairs(df, max_hamming=max_h).collect()
    }
    sk = {r.doc_id: r.sh for r in df.withColumn("sh", simhash32("text")).collect()}
    want = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            hd = bin((sk[i] ^ sk[j]) & 0xFFFFFFFF).count("1")
            if hd <= max_h:
                want[(i, j)] = hd
    assert got == want


@settings(**SETTINGS)
@given(
    strata=st.dictionaries(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
        st.tuples(
            st.integers(min_value=1, max_value=1000),  # n_docs
            # weight 0 = stratum present in the corpus but ABSENT from the
            # target mix (ADVICE r6: off-mix strata must get rate 0, not
            # the NULL-skipping-least rate of 1.0)
            st.integers(min_value=0, max_value=10),
        ),
        min_size=2,
        max_size=5,
    )
)
def test_water_fill_plan_matches_python(spark, strata):
    """x8's water-filling math vs a pure-Python reference on adversarial
    stratum counts/weights: max_corpus and planned_docs exact, rates
    within float tolerance, nothing upsampled, off-mix strata planned at
    rate 0, and the planner is invariant to which stratum binds."""
    import math

    from hypothesis import assume

    from nyc_taxi_etl_dashboard_spark.plans.llmops import water_fill_plan

    wsum = sum(w for _, w in strata.values())
    assume(wsum > 0)
    mix = {lang: w / wsum for lang, (_, w) in strata.items() if w > 0}
    counts = spark.createDataFrame(
        [(lang, n) for lang, (n, _) in strata.items()], "lang string, n_docs long"
    )
    got = {r.lang: r for r in water_fill_plan(counts, mix).collect()}

    max_corpus = min(n / mix[lang] for lang, (n, _) in strata.items() if lang in mix)
    for lang, (n, _) in strata.items():
        r = got[lang]
        assert r.n_docs == n
        assert abs(r.max_corpus - max_corpus) < 1e-6 * max(1.0, max_corpus)
        share = mix.get(lang, 0.0)
        want_rate = min(1.0, share * max_corpus / n) if share > 0 else 0.0
        assert abs(r.sample_rate - want_rate) < 1e-6
        assert r.planned_docs == math.floor(share * max_corpus)
        assert r.planned_docs <= n  # never upsample


@settings(**SETTINGS)
@given(
    parts=st.lists(
        st.one_of(
            st.text(
                alphabet="abz09._- @", min_size=0, max_size=12
            ),  # adversarial near-miss soup
            st.sampled_from(
                [
                    "a@b.co",
                    "x.y+z@mail.example.org",
                    "10.0.0.1",
                    "1.2.3.4.5",
                    "555-0100",
                    "555-12345",
                    "256.999.1.1",
                    "a@b",
                    "@b.co",
                    "1-2",
                ]
            ),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_pii_redaction_matches_python_re(spark, parts):
    """t11's portability contract fuzzed against a THIRD regex engine:
    Spark's Java scrub must equal the same pattern chain run through
    Python ``re`` on adversarial ASCII soup mixing near-miss and real
    PII shapes (the DuckDB RE2 agreement is pinned by the oracle)."""
    import re

    from nyc_taxi_etl_dashboard_spark.operators.text import PII_PATTERNS, redact_pii

    text = " ".join(parts)
    want = text
    for _, pat, ph in PII_PATTERNS:
        want = re.sub(pat, ph, want)
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(redact_pii("text").alias("red")).collect()[0].red
    assert got == want, (text, got, want)


_words = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=4), min_size=3, max_size=12
)


@settings(**SETTINGS)
@given(member_docs=st.lists(_words, min_size=1, max_size=4),
       probe_docs=st.lists(_words, min_size=1, max_size=4))
def test_bloom_superset_on_adversarial_strings(spark, member_docs, probe_docs):
    """Bloom no-false-negative property on hypothesis-generated token
    soups (tiny alphabet forces token_value collisions — the worst case
    for the polynomial base hash): any probe shingle string-equal to a
    member shingle MUST bloom-hit, at a deliberately tiny m."""
    from nyc_taxi_etl_dashboard_spark.operators import bloom
    from nyc_taxi_etl_dashboard_spark.operators.text import with_shingles

    mem = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(member_docs)],
        "doc_id long, text string",
    )
    prb = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(probe_docs + member_docs)],
        "doc_id long, text string",
    )
    ev = (
        with_shingles(mem.select("doc_id", "text"))
        .select(F.explode("shingle").alias("sh"))
    )
    words = bloom.bloom_build_agg(ev, "sh", m=256)
    probes = (
        with_shingles(prb.select("doc_id", "text"))
        .select(F.explode("shingle").alias("sg"))
        .withColumn("H", bloom.shingle_hash("sg"))
        .withColumn("hit", bloom.bloom_member_expr(F.col("H"), words, m=256))
    )
    misses = (
        probes.join(
            ev.select(F.col("sh").alias("sg")).distinct(), "sg"
        )
        .filter(~F.col("hit"))
        .count()
    )
    assert misses == 0


@settings(**SETTINGS)
@given(rows=st.lists(st.tuples(st.integers(0, 50), st.integers(1, 40)),
                     min_size=1, max_size=20))
def test_dlt_priority_sample_matches_python(spark, rows):
    """x13's DLT selection ≡ an independent pure-python top-N by
    (w·K/h desc, id asc), including hash ties from colliding ids."""
    from nyc_taxi_etl_dashboard_spark.operators.skew import capped_keep_first

    rows = list({i: (i, w) for i, w in rows}.values())  # unique ids
    df = spark.createDataFrame(rows, "doc_id long, w long")
    t = df.withColumn(
        "h", ((F.col("doc_id") * F.lit(2654435761)) % F.lit(1000003)) + F.lit(1)
    ).withColumn(
        "priority", F.col("w").cast("double") * F.lit(1000004.0) / F.col("h")
    ).withColumn(
        "__ord", F.struct((-F.col("priority")).alias("np"), "doc_id")
    )
    n = 5
    got = {
        r.doc_id
        for r in capped_keep_first(
            t.withColumn("g", F.lit(1)), "g", "__ord", F.lit(n)
        ).collect()
    }
    want = {
        i
        for i, _ in sorted(
            ((i, float(w) * 1000004.0 / ((i * 2654435761) % 1000003 + 1)) for i, w in rows),
            key=lambda x: (-x[1], x[0]),
        )[:n]
    }
    assert got == want


def _ref_dup_spans(docs, k, min_span):
    """Pure-python reference for dd14: mark every position whose k-gram
    occurs in >1 distinct doc, merge consecutive marks, filter length."""
    from collections import defaultdict

    sh_docs = defaultdict(set)
    toks_of = {}
    for did, toks in docs:
        toks_of[did] = toks
        for p in range(max(len(toks) - k + 1, 0)):
            sh_docs[" ".join(toks[p : p + k])].add(did)
    out = set()
    for did, toks in docs:
        dup_pos = [
            p
            for p in range(max(len(toks) - k + 1, 0))
            if len(sh_docs[" ".join(toks[p : p + k])]) > 1
        ]
        runs = []
        for p in dup_pos:
            if runs and p == runs[-1][1] + 1:
                runs[-1][1] = p
            else:
                runs.append([p, p])
        for s, e in runs:
            ln = e - s + k
            if ln >= min_span:
                out.add((did, s, ln, " ".join(toks[s : s + ln])))
    return out


_span_doc = st.lists(
    st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=10
)


@settings(**SETTINGS)
@given(texts=st.lists(_span_doc, min_size=2, max_size=5))
def test_duplicated_spans_matches_python_reference(spark, texts):
    """dd14 ≡ brute-force python on adversarial tiny-vocab corpora —
    the 4-token vocabulary forces shared k-grams, island merges, edge
    spans at position 0 and at doc end, and docs shorter than k."""
    from nyc_taxi_etl_dashboard_spark.operators.dedup import duplicated_spans

    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.span_start, r.span_len, r.span_text)
        for r in duplicated_spans(df, k=2, min_span_tokens=3).collect()
    }
    assert got == _ref_dup_spans(docs, k=2, min_span=3)


@settings(**SETTINGS)
@given(texts=st.lists(_span_doc, min_size=2, max_size=5))
def test_span_redact_matches_python_reference(spark, texts):
    """dd15 ≡ brute-force python: canonical (lowest doc_id, span_start)
    occurrence per span text survives, every other occurrence's token
    range is cut, rebuild preserves order — including docs reduced to
    empty text."""
    from nyc_taxi_etl_dashboard_spark.operators.dedup import span_redact

    docs = [(i, t) for i, t in enumerate(texts)]
    spans = _ref_dup_spans(docs, k=2, min_span=3)
    canon = {}
    for did, s, ln, txt in sorted(spans):
        canon.setdefault(txt, (did, s))
    removed = [
        (did, s, s + ln)
        for did, s, ln, txt in spans
        if canon[txt] != (did, s)
    ]
    want = {}
    for did, toks in docs:
        cut = set()
        for rd, s, e in removed:
            if rd == did:
                cut.update(range(s, e))
        kept = [t for p, t in enumerate(toks) if p not in cut]
        want[did] = (len(toks), len(toks) - len(kept), " ".join(kept))
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in span_redact(df, k=2, min_span_tokens=3).collect()
    }
    assert got == want
