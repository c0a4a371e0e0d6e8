"""Text-analysis operators for training-data pipelines (NEW surface,
SURVEY §7.1 step 7 — no counterpart in the reference).

Everything is Catalyst higher-order functions over a token array —
JVM-side, codegen'd, shuffle-free. No Python UDFs: at 100 TB a
row-at-a-time Python tokenizer would dominate the job; these expressions
run inside the scan stage.

Portable-hash note: token/shingle hashes use ``functions.token_value``
(first/last code point + length) rather than xxhash64, so DuckDB oracles
can reproduce signatures exactly. Swap ``token_value`` for ``F.xxhash64``
in production for better dispersion — the operator shapes are identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny English stopword set for the lang-id heuristic; the synthetic
#: corpus vocabulary is English-ish so this is a demonstration contract
EN_STOPWORDS = ("the", "a")


def tokens(text: Column | str, sep: str = " ") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, sep)


def token_count(text: Column | str) -> Column:
    return F.array_size(tokens(text))


def distinct_token_count(text: Column | str) -> Column:
    return F.array_size(F.array_distinct(tokens(text)))


def shingles(text_col: str, k: int = 3, sep: str = " ") -> Column:
    """k-gram shingles (word-level), the MinHash/Jaccard unit.

    ``transform(sequence(0, size-k), i -> tokens[i] .. tokens[i+k-1])``,
    with two non-obvious guards:
    - documents shorter than k yield an empty array explicitly — Spark's
      ``sequence(0, -1)`` would count DOWN, not produce empty;
    - the token array is BOUND ONCE via ``transform(array(split(..)),
      t -> ...)[0]``: naming it with ``withColumn`` instead lets
      CollapseProject inline the ``split`` into every element access of
      the lambda (~3·|shingles| re-tokenizations per row — measured 4×
      the entire query's cost before this fix).
    """
    joined = " || ' ' || ".join(f"t[i + {j}]" for j in range(k))
    return F.expr(
        f"transform(array(split({text_col}, '{sep}')), t -> "
        f"CASE WHEN array_size(t) >= {k} THEN "
        f"transform(sequence(0, array_size(t) - {k}), i -> {joined}) "
        "ELSE array() END)[0]"
    )


def with_shingles(df, text_col: str = "text", k: int = 3, out: str = "shingle"):
    """Attach a distinct-shingle array column."""
    return df.withColumn(out, F.array_distinct(shingles(text_col, k)))


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Share of tokens that are stopwords — the quality/lang-id feature."""
    toks = tokens(text)
    matches = F.filter(toks, lambda t: t.isin(*stopwords))
    return F.array_size(matches) / F.array_size(toks)


def quality_features(text: Column | str) -> dict[str, Column]:
    """Quality-scoring feature bank: length, lexical diversity, stopword
    share, mean token length. Compose into a score downstream; keeping
    them separate makes thresholds tunable without replanning."""
    toks = tokens(text)
    n = F.array_size(toks)
    return {
        "n_tokens": n,
        "distinct_ratio": F.array_size(F.array_distinct(toks)) / n,
        "stopword_ratio": stopword_ratio(text),
        "mean_token_len": F.aggregate(
            F.transform(toks, F.length), F.lit(0).cast("bigint"), lambda a, x: a + x
        )
        / n,
    }


def repetition_features(text_col: str, sep: str = " ") -> Column:
    """Within-document repetition features (the Gopher-style repetition
    gates): bigram count, top-bigram occupancy (share of bigrams taken
    by the most frequent one), and duplicate-bigram fraction (share of
    bigrams occurring more than once). Returns a struct.

    Binding discipline: tokens AND the bigram array each bind exactly
    once via nested ``transform(array(..), x -> ..)[0]`` wrappers —
    naming them with ``withColumn`` would let CollapseProject inline the
    tokenization into every one of the ~3 consumers (see
    :func:`shingles`). Frequency counting is O(|bigrams|·|distinct|)
    per row inside codegen — quadratic in *document* length only, never
    in corpus size."""
    counts = "transform(array_distinct(bg), d -> size(filter(bg, x -> x = d)))"
    dup_sum = (
        f"aggregate({counts}, 0, (a, c) -> a + (CASE WHEN c >= 2 THEN c ELSE 0 END))"
    )
    return F.expr(
        f"transform(array(split({text_col}, '{sep}')), t -> "
        f"transform(array(CASE WHEN array_size(t) >= 2 THEN "
        f"transform(sequence(0, array_size(t) - 2), i -> t[i] || ' ' || t[i + 1]) "
        "ELSE array() END), bg -> named_struct("
        "'n_bigrams', array_size(bg), "
        f"'top_bigram_frac', CASE WHEN array_size(bg) > 0 THEN array_max({counts}) / array_size(bg) ELSE cast(0 as double) END, "
        f"'dup_bigram_frac', CASE WHEN array_size(bg) > 0 THEN {dup_sum} / array_size(bg) ELSE cast(0 as double) END"
        "))[0])[0]"
    )


def langid_en_heuristic(text: Column | str, threshold: float = 0.04) -> Column:
    """n-gram-free lang-id demonstration: English iff the stopword share
    clears a threshold. Real corpora swap in per-language stopword/char
    n-gram profiles scored the same way (argmax over a small map —
    still pure column expressions)."""
    return F.when(stopword_ratio(text) >= threshold, "en").otherwise("other")


#: (category, pattern, placeholder) in REDACTION ORDER (earlier patterns
#: consume their matches before later ones run). Patterns restrict to
#: the regex subset Java (Spark) and RE2 (DuckDB/production scanners)
#: interpret identically — char classes, bounded repeats, (?:) groups,
#: \b anchors; no lookaround, no backrefs — so a DuckDB oracle can
#: verify the scrub cross-engine and a Go/Rust scanner agrees with the
#: Spark job byte-for-byte.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}(?:\.\d{1,3}){3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{4}\b", "<PHONE>"),
)


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-category PII match counts on the UNREDACTED text — the audit
    row a compliance report wants next to the scrub. Pure Catalyst
    (``regexp_count``), runs in the scan stage."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        f"n_{cat}": F.regexp_count(c, F.lit(pat)) for cat, pat, _ in PII_PATTERNS
    }


def redact_pii(text: Column | str) -> Column:
    """Scrub PII spans to typed placeholders: sequential
    ``regexp_replace`` per category in ``PII_PATTERNS`` order (emails
    first — their digits must not be half-eaten by the looser numeric
    patterns). Idempotent: placeholders contain no digits or ``@`` so no
    later (or repeated) pattern can re-match inside one. JVM-side
    expression chain — the whole scrub stays in whole-stage codegen; at
    100 TB this is a map-only stage with zero shuffle."""
    c = F.col(text) if isinstance(text, str) else text
    for _, pat, placeholder in PII_PATTERNS:
        c = F.regexp_replace(c, pat, placeholder)
    return c


def kl_report(counts) -> "DataFrame":  # noqa: F821 - DataFrame at runtime
    """Per-language symmetric KL report from a unigram count frame
    ``(lang, token, cnt_a, cnt_b)`` — the shared kernel behind the t20
    snapshot-drift query and the streaming drift-monitor sink.

    Add-one smoothing over the union vocabulary; both KL folds run in
    FIXED token-sorted order and round to 6 decimals (ln is not
    correctly rounded across engines — the t20 lesson). The per-lang
    roll-up payload is the VOCABULARY (Heaps-sublinear in the corpus),
    never the corpus; the upstream (lang, token) count agg is map-side
    combinable integer arithmetic, exact in any order."""
    rolled = counts.groupBy("lang").agg(
        F.array_sort(F.collect_list(F.struct("token", "cnt_a", "cnt_b"))).alias(
            "rows"
        ),
        F.sum("cnt_a").alias("n_a"),
        F.sum("cnt_b").alias("n_b"),
    )
    sized = rolled.withColumn("vocab_size", F.array_size("rows"))

    def kl(from_cnt: str, from_n: str, to_cnt: str, to_n: str):
        def term(s):
            p = (s[from_cnt] + F.lit(1)) / (F.col(from_n) + F.col("vocab_size"))
            q = (s[to_cnt] + F.lit(1)) / (F.col(to_n) + F.col("vocab_size"))
            return p * F.log(p / q)

        return F.aggregate(F.transform("rows", term), F.lit(0.0), lambda a, x: a + x)

    return sized.select(
        "lang",
        "vocab_size",
        F.col("n_a").alias("n_tok_a"),
        F.col("n_b").alias("n_tok_b"),
        F.round(kl("cnt_a", "n_a", "cnt_b", "n_b"), 6).alias("kl_ab"),
        F.round(kl("cnt_b", "n_b", "cnt_a", "n_a"), 6).alias("kl_ba"),
    )


# ---------------------------------------------------------------------------
# DSIR importance resampling (Xie et al., NeurIPS 2023): select training
# documents whose hashed-n-gram distribution matches a TARGET corpus.
# NEW vs the reference (no counterpart); the data-selection method most
# large-scale pipelines pair with quality gates.

#: Knuth multiplicative constant — the same mixer simhash32 uses; spreads
#: token_value's narrow codomain across the word before the bucket mod.
DSIR_MIX = 2654435761

_TV_SQL = "(ascii({v}) * 10007 + ascii(reverse({v})) * 101 + length({v}))"


def hashed_gram_buckets(
    df, id_col: str = "doc_id", text_col: str = "text", n_buckets: int = 512
):
    """``(id, bucket)`` — one row per word unigram AND bigram occurrence,
    hashed into ``n_buckets`` (the DSIR feature space). Pure projection +
    explode: no shuffle, whole-stage codegen, and the gram values use the
    portable token_value arithmetic so DuckDB reproduces every bucket
    bit-for-bit (products stay under 2^63: tv < 2^22, bigram value
    < 2^30, × DSIR_MIX < 2^62).
    """
    tv_s = _TV_SQL.format(v="s")
    tv_i = _TV_SQL.format(v="element_at(t, CAST(i AS INT))")
    tv_i1 = _TV_SQL.format(v="element_at(t, CAST(i AS INT) + 1)")
    grams = (
        f"concat(transform(t, s -> {tv_s}), "
        f"CASE WHEN size(t) >= 2 THEN "
        f"transform(sequence(1, size(t) - 1), i -> {tv_i} * 131 + {tv_i1}) "
        f"ELSE array() END)"
    )
    return (
        df.select(F.col(id_col).alias("id"), F.split(text_col, " ").alias("t"))
        .select("id", F.explode(F.expr(grams)).alias("g"))
        .select("id", ((F.col("g") * F.lit(DSIR_MIX)) % n_buckets).alias("bucket"))
    )


def dsir_log_weights(
    cand,
    target,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 512,
):
    """Per-candidate DSIR log importance weight:
    ``log_w(doc) = Σ_grams ln p_target(bucket) − ln p_raw(bucket)``
    under add-one-smoothed hashed-n-gram bucket distributions (raw = the
    candidate corpus itself). High log_w = looks like the target.

    Scale shape: two map-side bucket-count aggregations (≤ n_buckets
    rows each — a BOUNDED table no matter the corpus size), the
    log-ratio table broadcast into the candidates' exploded gram stream,
    one per-doc agg. Nothing scales with the corpus except the gram
    explode, which is the tokenizer pass every scorer already pays.
    Per-doc sums fold in FIXED bucket order and round to 6 (ln is not
    correctly rounded across engines — the t20 lesson).

    Returns ``(id, log_w)``.
    """
    from . import scoped_persist

    cb = hashed_gram_buckets(cand, id_col, text_col, n_buckets)
    tb = hashed_gram_buckets(target, id_col, text_col, n_buckets)
    # ONE candidate explode: per-doc bucket counts are the finest
    # aggregate, and the raw bucket table + both totals derive from the
    # already-bounded aggregates instead of re-exploding the corpus
    # (the naive form re-explodes candidates 3x and the target 2x —
    # interleaved A/B at 500k docs, min-of-2: 14.5 -> 10.46 s)
    per_doc_bucket = scoped_persist(
        cb.groupBy("id", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    )
    raw = per_doc_bucket.groupBy("bucket").agg(F.sum("cnt").alias("cnt_r"))
    tgt = tb.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt_t"))
    tot_r = raw.agg(F.sum("cnt_r").alias("tot_r"))
    tot_t = tgt.agg(F.sum("cnt_t").alias("tot_t"))
    # every candidate gram's bucket appears in `raw` by construction, so
    # a left join covers smoothing: absent target buckets get cnt_t=0
    lr = (
        raw.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(tot_r))
        .crossJoin(F.broadcast(tot_t))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce("cnt_t", F.lit(0)) + 1)
                    / (F.col("tot_t") + n_buckets)
                )
                - F.log((F.col("cnt_r") + 1) / (F.col("tot_r") + n_buckets))
            ).alias("lr"),
        )
    )
    rows = (
        per_doc_bucket.join(F.broadcast(lr), "bucket")
        .groupBy("id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("bucket", "cnt", "lr"))
            ).alias("rows")
        )
    )
    fold = F.aggregate(
        F.transform("rows", lambda s: s["cnt"] * s["lr"]),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return rows.select("id", F.round(fold, 6).alias("log_w"))
