"""Streaming corpus curation (the continuous-ingestion twin of
``plans.llmops.q_corpus_curation``): documents arrive as files, pass a
stateless quality gate, and exact-dedup on content fingerprint with
WATERMARK-BOUNDED state — the shape a production corpus pipeline runs
between crawler and training store.

State model: ``dropDuplicatesWithinWatermark`` keys state by
fingerprint and evicts entries once the watermark passes — duplicates
arriving within the horizon are dropped, re-crawls older than it are
accepted again (the honest contract for unbounded streams: exact global
dedup needs unbounded memory; periodic batch dedup over the stored
corpus — dd1/dd8 — closes the gap).

Session contract: like every engine entry point, the sinks here assume
:func:`..session.pin_session` semantics (ANSI off, UTC, AQE) — apply it
to externally-built sessions before starting a stream. Found the hard
way (round 14): the MinHash mixing arithmetic (``a·xxhash64 + b``)
deliberately relies on wrapping int64 multiplication, which an ANSI-on
session turns into ARITHMETIC_OVERFLOW mid-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: streaming documents schema: the batch fixture's columns plus the
#: arrival time the watermark rides on
DOCS_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
        StructField("ingest_ts", TimestampType()),
    ]
)


def read_documents_stream(spark: SparkSession, directory: str) -> DataFrame:
    return spark.readStream.schema(DOCS_STREAM_SCHEMA).parquet(directory)


def _warehouse_exists(spark: SparkSession, path: str) -> bool:
    """Does the sink's state/warehouse table exist yet? Resolved through
    the Hadoop FileSystem API, not ``os.path.exists`` (ADVICE r8): with
    an ``hdfs://`` or ``s3a://`` warehouse a local-only check would
    silently report the history absent — resetting the quota sink's
    running counts and re-admitting semantic/near dups on every batch.
    Scheme-qualified paths resolve through their own scheme's FS;
    scheme-less paths resolve via ``fs.defaultFS`` — which is exactly
    what keeps this check consistent with the ``spark.read.parquet``
    that consumes the warehouse (ADVICE r9 wording fix).

    Under Spark Connect there is no py4j bridge (``spark._jvm`` is
    None), so the check falls back to a read-probe against the same
    reader the warehouse consumer uses — heavier (schema inference) but
    scheme-correct and only ever hit on Connect sessions."""
    jvm = getattr(spark, "_jvm", None)
    jsc = getattr(spark, "_jsc", None)
    if jvm is None or jsc is None:  # Spark Connect: no py4j internals
        try:
            spark.read.parquet(path).schema
            return True
        except Exception:
            return False
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def curate_documents_stream(
    docs: DataFrame, min_tokens: int = 20, watermark: str = "1 hour"
) -> DataFrame:
    """Quality gate (stateless, same rule as the batch chain's first
    stage) → rolling-hash fingerprint (narrow) → fingerprint dedup with
    watermark-bounded state. Output: curated documents + their
    fingerprint (downstream fuzzy dedup reuses it)."""
    from ..functions import poly_fingerprint
    from ..operators.text import tokens

    gated = docs.filter(F.array_size(F.split("text", " ")) >= min_tokens)
    fp = gated.withColumn("fp", poly_fingerprint(tokens("text")))
    return fp.withWatermark("ingest_ts", watermark).dropDuplicatesWithinWatermark(
        ["fp"]
    )


def incremental_dedup_sink(
    table_path: str,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
    portable: bool = False,
):
    """The STREAMING form of dd11 (cross-run incremental dedup): a
    ``foreachBatch`` sink that treats every micro-batch as an increment
    against the persistent MinHash signature warehouse — near-dups of
    anything EVER ingested are dropped (no watermark horizon: signature
    state lives on disk, ~num_hashes longs per doc, not in stream
    state), and survivors' signatures are appended via ``merge_parquet``
    so the very next batch sees them.

    Complements :func:`curate_documents_stream`: that stage drops exact
    re-deliveries within the watermark cheaply in stream state; this
    stage drops NEAR-dups against the full corpus history at a cost
    bounded by the increment (the dd11 shape — the corpus is touched
    only through its banded signature table). foreachBatch batches are
    exactly-once per epoch with checkpointing, and merge_parquet is
    key-idempotent on doc_id, so a replayed batch re-merges the same
    signatures harmlessly. Verdicts are replay-safe too:
    ``incremental_dedup`` excludes same-doc_id candidates, so a batch
    replayed AFTER its own merge landed (crash between merge and
    checkpoint commit) does not match itself in the warehouse and
    reproduces its original verdicts (pinned in
    tests/test_streaming.py). ``stats_box`` is observability,
    not state: a replayed batch appends a second (batch_id, kept,
    dropped) triple — dedupe on batch_id if consuming it as a record.

    Returns ``(sink_fn, stats_box)`` — pass ``sink_fn`` to
    ``foreachBatch``; ``stats_box['batches']`` accumulates one
    ``(batch_id, kept, dropped)`` scalar triple per batch (counts only —
    never a data-sized collect; the kept DOCUMENTS are whatever the
    caller writes downstream, and the kept SIGNATURES live in the
    table)."""
    from ..operators.dedup import incremental_dedup, minhash_signature_table
    from ..sources.writers import merge_parquet

    stats_box: dict = {"batches": []}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        inc_sigs = minhash_signature_table(
            batch_df, num_hashes=num_hashes, portable=portable
        ).localCheckpoint()  # cut the streaming-source lineage: the sigs
        # are consumed by a join, a filtered merge, and two counts
        if _warehouse_exists(spark, table_path):
            corpus = spark.read.parquet(table_path)
            verdicts = incremental_dedup(
                inc_sigs, corpus,
                num_hashes=num_hashes, bands=bands, threshold=threshold,
            )
        else:
            verdicts = inc_sigs.select(
                "doc_id", F.lit(False).alias("is_dup")
            )
        kept_sigs = inc_sigs.join(
            verdicts.filter(~F.col("is_dup")).select("doc_id"), "doc_id"
        ).localCheckpoint()  # merge_parquet rewrites the path it reads
        n_inc = inc_sigs.count()
        n_kept = kept_sigs.count()
        if n_kept:
            merge_parquet(spark, table_path, kept_sigs, ["doc_id"])
        stats_box["batches"].append((batch_id, n_kept, n_inc - n_kept))

    return sink, stats_box


def semantic_dedup_sink(
    table_path: str,
    threshold: float = 0.92,
    n_planes: int = 16,
    probe_radius: int = 1,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kernel: str = "arrow",
):
    """The STREAMING form of v10 (SemDeDup keep-list), built on the dd11
    warehouse pattern (VERDICT r7 item 6): a ``foreachBatch`` sink that
    drops each micro-batch's vectors whose cosine against ANY
    historically-kept vector clears ``threshold`` — continuous semantic
    dedup against the full corpus history, at a per-batch cost bounded
    by the increment.

    Warehouse table: ``(vec_id, embedding_d, sig, nrm)`` — the vector,
    its PERSISTED random-hyperplane signature (the corpus side never
    recomputes signatures, mirroring dd11's signature table), and its
    norm (hoisted once at ingest, never per candidate). Candidate
    generation is the v6 blocked kernel asymmetrically: only the small
    batch side multi-probes (explodes signature XOR every popcount ≤
    ``probe_radius`` mask), the corpus side joins on its stored
    signature — so candidates are (batch × corpus) bucket collisions,
    never corpus × corpus, and the exact cosine verify runs on
    candidates only. A (batch, corpus) pair matches at most one probe
    signature (masks are distinct ⇒ probed signatures are distinct), so
    no candidate dedup is needed.

    Replay safety mirrors dd11's sink: same-vec_id candidates are
    excluded, so a batch replayed after its own merge (crash between
    merge and checkpoint commit) reproduces its original verdicts, and
    ``merge_parquet`` is key-idempotent on vec_id. Intra-batch semantic
    dups are v10's batch job — two mutually-near vectors arriving in
    the SAME micro-batch both survive (and both guard the future).

    At 100 TB: the warehouse buckets on ``sig`` exactly like dd11's
    banded table — zero corpus-side shuffle per refresh, plan-asserted
    in tests/test_streaming.py (the bucketed warehouse scan feeds the
    probe join with no Exchange above it; only the batch side
    shuffles). The stored vectors can further be swapped for v11 PQ
    codes (32× less state) by replacing the exact cosine verify with
    the ADC estimate plus a margin — that part remains
    docstring-level; this sink keeps the exact verify. Returns
    ``(sink_fn, stats_box)`` as the dd11 sink does.

    ``kernel="arrow"`` (default) signs incoming vectors with the GEMM
    kernel instead of the interpreted HOF fold — bits are test-pinned
    equal (see :func:`..operators.similarity.rhp_signature_arrow`), so
    warehouse state written by either kernel joins correctly against
    batches signed by the other. The VERIFY leg stays on the HOF fold
    regardless of ``kernel`` — the einsum alternative measured slower
    at dim 64 (pair rows ship both vectors through Arrow; see
    ``dot_arrow``'s recorded A/B)."""
    from ..operators.similarity import (
        _probe_masks,
        dot,
        l2_norm,
        rhp_signature,
        rhp_signature_arrow,
    )
    from ..sources.writers import merge_parquet

    stats_box: dict = {"batches": []}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        inc = (
            batch_df.select(
                F.col(id_col).alias("vec_id"),
                F.col(vec_col).cast("array<double>").alias("embedding_d"),
            )
            .withColumn(
                "sig",
                (rhp_signature_arrow if kernel == "arrow" else rhp_signature)(
                    vec_col="embedding_d", n_planes=n_planes, dim=dim
                ),
            )
            .withColumn("nrm", l2_norm("embedding_d"))
            .localCheckpoint()  # cut streaming lineage; consumed 3×
        )
        if _warehouse_exists(spark, table_path):
            cor = spark.read.parquet(table_path)
            masks = _probe_masks(n_planes, probe_radius)
            probes = inc.select(
                F.col("vec_id").alias("inc_id"),
                F.col("embedding_d").alias("iv"),
                F.col("nrm").alias("inrm"),
                F.explode(
                    F.array(*[F.col("sig").bitwiseXOR(F.lit(m)) for m in masks])
                ).alias("sig"),
            )
            cand = probes.join(
                cor.select(
                    F.col("vec_id").alias("cor_id"),
                    F.col("embedding_d").alias("cv"),
                    F.col("nrm").alias("cnrm"),
                    "sig",
                ),
                "sig",
            ).filter(F.col("inc_id") != F.col("cor_id"))
            dups = (
                cand.withColumn(
                    "cos", dot("iv", "cv") / (F.col("inrm") * F.col("cnrm"))
                )
                .filter(F.col("cos") >= threshold)
                .select(F.col("inc_id").alias("vec_id"))
                .distinct()
            )
            kept = inc.join(dups, "vec_id", "left_anti").localCheckpoint()
        else:
            kept = inc
        n_inc = inc.count()
        n_kept = kept.count()
        if n_kept:
            merge_parquet(spark, table_path, kept, ["vec_id"])
        stats_box["batches"].append((batch_id, n_kept, n_inc - n_kept))

    return sink, stats_box


def line_dedup_sink(
    table_path: str,
    out_path: str,
    seg_tokens: int = 8,
):
    """The STREAMING form of dd13 (segment-level "line dedup"): a
    ``foreachBatch`` sink that removes boilerplate SEGMENTS against the
    whole stream history — each consecutive ``seg_tokens``-token
    segment is kept exactly once across every batch ever ingested
    (first occurrence wins), and each batch's documents are rebuilt
    from their kept segments and written to
    ``{out_path}/epoch={batch_id}``.

    State model (the dd11 warehouse pattern, at segment granularity):
    a parquet table ``(seg_hash, occ_key)`` — the xxhash64 of the
    segment text plus the packed (doc_id, seg_idx) of its canonical
    occurrence. State is one slim row per DISTINCT segment ever kept,
    never per occurrence — a boilerplate segment seen in millions of
    documents is one warehouse row. Hashing trades exactness for state
    size: two distinct segments colliding in 64 bits (birthday ~N²/2⁶⁴
    — ~3·10⁻⁸ at a billion distinct segments) would drop the later one;
    the batch operator (``line_dedup``) keys on the segment text itself
    and remains the exact form.

    Per-batch plan: segment-split (narrow) → within-batch canonical MIN
    agg on seg_hash (map-side combinable — the dd13 hot-segment
    argument) → ONE equi-join against the warehouse → per-doc rebuild
    agg → epoch write + ``merge_parquet`` of the newly-kept segment
    rows. At 100 TB the warehouse buckets on ``seg_hash`` exactly like
    dd11's signature table: the history join plans with no Exchange
    above the bucketed scan; only the (small) batch side shuffles —
    plan-asserted in tests/test_streaming.py.

    Replay safety: a warehouse match is a drop only when its
    ``occ_key`` differs from the probing occurrence's own — so a batch
    replayed AFTER its own merge landed (crash between merge and
    checkpoint commit) finds its canonical occurrences in the warehouse
    keyed by their own occ_keys, keeps them again, rewrites its epoch
    directory byte-identically, and re-merges the same rows
    (``merge_parquet`` is key-idempotent on seg_hash). Returns
    ``(sink_fn, stats_box)``; stats rows are
    ``(batch_id, n_docs, n_segs, n_kept_segs)``."""
    from ..operators.dedup import doc_segments
    from ..sources.writers import merge_parquet

    stats_box: dict = {"batches": []}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        segs = (
            doc_segments(
                batch_df.select("doc_id", "text"), seg_tokens=seg_tokens
            )
            .withColumn("seg_hash", F.xxhash64("seg"))
            .localCheckpoint()  # cut streaming lineage; consumed 3×
        )
        # within-batch canonical occurrence per segment (MIN agg — the
        # dd13 shape: map-side combinable, no hot sort group)
        canon = segs.groupBy("seg_hash").agg(F.min("occ_key").alias("canon_key"))
        verdict = segs.join(canon, "seg_hash").withColumn(
            "batch_canon", F.col("occ_key") == F.col("canon_key")
        )
        if _warehouse_exists(spark, table_path):
            hist = spark.read.parquet(table_path).select(
                "seg_hash", F.col("occ_key").alias("hist_key")
            )
            verdict = verdict.join(hist, "seg_hash", "left").withColumn(
                "is_kept",
                F.col("batch_canon")
                & (
                    F.col("hist_key").isNull()  # never seen
                    | (F.col("hist_key") == F.col("occ_key"))  # own replay
                ),
            )
        else:
            verdict = verdict.withColumn("is_kept", F.col("batch_canon"))
        verdict = verdict.localCheckpoint()  # consumed by rebuild + merge
        rebuilt = verdict.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_segs"),
            F.sum(F.col("is_kept").cast("long")).alias("n_kept"),
            F.array_join(
                F.expr(
                    "transform(array_sort(filter(collect_list("
                    "CASE WHEN is_kept THEN struct(seg_idx, seg) END), x -> x IS NOT NULL)), "
                    "x -> x.seg)"
                ),
                " ",
            ).alias("clean_text"),
        )
        rebuilt.write.mode("overwrite").parquet(f"{out_path}/epoch={batch_id}")
        new_segs = verdict.filter("is_kept").select("seg_hash", "occ_key")
        n_new = new_segs.count()
        if n_new:
            merge_parquet(spark, table_path, new_segs, ["seg_hash"])
        totals = segs.agg(
            F.count_distinct("doc_id").alias("d"), F.count(F.lit(1)).alias("s")
        ).first()
        stats_box["batches"].append((batch_id, totals.d, totals.s, n_new))

    return sink, stats_box


def compact_every(sink, table_path: str, every: int = 50, target_file_mb: int = 128):
    """Wrap a foreachBatch warehouse sink with PERIODIC STATE
    COMPACTION (r11 agenda item 3): every ``every`` batches, after the
    batch's own merge lands, the state table is rewritten into
    ~``target_file_mb`` files via ``sources.writers.compact_parquet``.

    Why: each ``merge_parquet`` full-table merge rewrites the state
    into one file per shuffle partition (32 here), so a small warehouse
    carries 32 tiny files whose per-file open/footer cost taxes EVERY
    subsequent batch's history join — the classic streaming small-file
    problem Delta's OPTIMIZE exists for.

    Replay-safe because compaction is CONTENT-PRESERVING: a batch
    replayed after its compaction ran (crash between compaction and
    checkpoint commit) re-merges the same rows (key-idempotent) and
    re-compacts — same content, same verdicts, pinned by the
    bit-identical-state test in tests/test_streaming.py. Works on any
    of the warehouse sinks here (dd11 signatures, semantic vectors,
    segment hashes, quota counts) since all share the
    ``sink(batch_df, batch_id)`` contract and a single state path."""
    from ..sources.writers import compact_parquet

    def wrapped(batch_df: DataFrame, batch_id: int) -> None:
        sink(batch_df, batch_id)
        if every and batch_id > 0 and batch_id % every == 0:
            if _warehouse_exists(batch_df.sparkSession, table_path):
                compact_parquet(
                    batch_df.sparkSession, table_path, target_file_mb=target_file_mb
                )

    return wrapped


def bloom_decontaminate_sink(
    eval_docs: DataFrame,
    out_path: str,
    threshold: float = 0.1,
    m: int | None = None,
    shingle_k: int = 3,
):
    """The STREAMING form of t15 (Bloom decontamination): a
    ``foreachBatch`` sink that drops each micro-batch's documents whose
    3-gram overlap with the BENCHMARK set clears ``threshold`` —
    continuous decontamination between crawler and training store.

    The benchmark set is static, so its bitset is built ONCE at sink
    construction (``bloom.bloom_build_agg`` — distributed bitmap fold,
    driver state m/8 bytes) and rides the closure into every batch;
    per-batch work is a map-side probe + one per-doc aggregation — no
    join against benchmark strings, no broadcast rebuilt per epoch, no
    stream state at all (the filter is stateless, which is why this
    stage needs no watermark). The one-sided Bloom error over-removes a
    clean doc at the configured fp rate and never under-removes — the
    safe direction for decontamination.

    Exactly-once: kept documents are written to
    ``{out_path}/epoch={batch_id}`` with per-epoch overwrite, so a
    replayed batch (crash between write and checkpoint commit)
    rewrites its own directory byte-identically — verdicts are a pure
    function of (batch, static bitset). Returns ``(sink_fn,
    stats_box)`` as the other curation sinks do."""
    from ..operators import bloom
    from ..operators.text import with_shingles

    ev = (
        with_shingles(eval_docs.select("doc_id", "text"), k=shingle_k)
        .select(F.explode("shingle").alias("sh"))
        # no distinct: bitmap OR is idempotent; skipping the dedup
        # shuffle halves the build
    )
    m = m or bloom.BLOOM_M_BITS
    words = bloom.bloom_build_agg(ev, "sh", m=m)
    stats_box: dict = {"batches": []}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        sh = with_shingles(
            batch_df.select("doc_id", "text", "lang", "source"), k=shingle_k
        ).localCheckpoint()  # cut streaming lineage; consumed twice
        spine = sh.select(
            "doc_id", "text", "lang", "source", F.array_size("shingle").alias("n_sh")
        )
        hits = bloom.doc_hit_counts(sh, words, m=m, out="n_hit")
        kept = (
            spine.join(hits, "doc_id", "left")
            .withColumn("n_hit", F.coalesce("n_hit", F.lit(0)))
            .filter(
                F.when(F.col("n_sh") > 0, F.col("n_hit") / F.col("n_sh")).otherwise(
                    F.lit(0.0)
                )
                < threshold
            )
            .select("doc_id", "text", "lang", "source")
        )
        n_in = spine.count()
        kept.write.mode("overwrite").parquet(f"{out_path}/epoch={batch_id}")
        n_kept = kept.sparkSession.read.parquet(f"{out_path}/epoch={batch_id}").count()
        stats_box["batches"].append((batch_id, n_kept, n_in - n_kept))

    return sink, stats_box


def domain_quota_sink(
    state_path: str,
    out_path: str,
    quota: dict[str, int],
    quota_default: int = 60,
):
    """The STREAMING form of x10 (per-domain quota): a ``foreachBatch``
    sink that enforces a RUNNING per-source document cap across the
    whole stream history — the continuous domain-balancing stage a
    crawler-fed pipeline needs (one hot domain must not dominate the
    training mix no matter how many batches it spans).

    State model (the dd11 warehouse pattern, for counts): a tiny
    parquet table keyed ``(source, batch_id) → n_kept``; a batch's
    remaining allowance per source is ``quota(source) − Σ n_kept`` over
    all OTHER batches, so state is |sources|·|batches| scalar rows —
    never documents. Selection inside the batch is x10's skew-safe
    kernel (``capped_keep_first``) with the remaining allowance joined
    on as the per-row quota Column.

    Exactly-once by construction: kept docs write to
    ``{out_path}/epoch={batch_id}`` (per-epoch overwrite) and the state
    row upserts via ``merge_parquet`` keyed on (source, batch_id) — a
    REPLAYED batch excludes its own prior state row from the allowance
    sum, recomputes the identical keep-set, rewrites its directory
    byte-identically, and re-upserts the same counts (pinned by an
    explicit replay in the test). Returns ``(sink_fn, stats_box)``."""
    from ..operators.skew import capped_keep_first
    from ..sources.writers import merge_parquet

    stats_box: dict = {"batches": []}

    def _quota_expr() -> F.Column:
        qmap = F.create_map(*[F.lit(x) for kv in quota.items() for x in kv])
        return F.coalesce(
            F.element_at(qmap, F.col("source")), F.lit(quota_default)
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        slim = batch_df.select("doc_id", "text", "lang", "source").localCheckpoint()
        if _warehouse_exists(spark, state_path):
            taken = (
                spark.read.parquet(state_path)
                .filter(F.col("batch_id") != batch_id)  # replay safety
                .groupBy("source")
                .agg(F.sum("n_kept").alias("taken"))
            )
        else:
            taken = None
        with_rem = slim.select("doc_id", "source").withColumn(
            "__q", _quota_expr()
        )
        if taken is not None:
            with_rem = (
                with_rem.join(F.broadcast(taken), "source", "left")
                .withColumn(
                    "__rem",
                    F.greatest(
                        F.col("__q") - F.coalesce("taken", F.lit(0)), F.lit(0)
                    ),
                )
                .drop("taken")
            )
        else:
            with_rem = with_rem.withColumn("__rem", F.col("__q"))
        kept_ids = capped_keep_first(
            with_rem, "source", "doc_id", F.col("__rem")
        ).select("doc_id")
        kept = slim.join(kept_ids, "doc_id").localCheckpoint()
        kept.write.mode("overwrite").parquet(f"{out_path}/epoch={batch_id}")
        counts = (
            kept.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_kept"))
            .withColumn("batch_id", F.lit(batch_id))
        )
        merge_parquet(spark, state_path, counts, ["source", "batch_id"])
        n_in = slim.count()
        n_kept = kept.count()
        stats_box["batches"].append((batch_id, n_kept, n_in - n_kept))

    return sink, stats_box


def drift_monitor_sink(
    state_path: str,
    alert_threshold: float = 0.5,
):
    """The STREAMING form of t20 (snapshot KL drift): a ``foreachBatch``
    sink that scores every incoming batch's per-language unigram
    distribution against the RUNNING distribution of everything
    ingested before it — the continuous monitoring stage that flags a
    source change (spam flood, encoding regression, topical shift)
    while it is arriving, not after it trained in.

    State model (the quota sink's count pattern, at token granularity):
    a parquet table keyed ``(lang, token, batch_id) → cnt`` — one slim
    integer row per distinct token per batch, Heaps-sublinear in the
    stream; the reference distribution is the sum over all OTHER
    batches' rows, so a REPLAYED batch excludes its own prior
    contribution, recomputes the identical report, and re-upserts the
    same count rows (exactly-once by construction, same as the quota
    sink). Wire through :func:`compact_every` to bound the
    per-batch-row fragmentation on long streams.

    Per-batch plan: one map-side (lang, token) count agg over the
    batch, one aggregation over the state table, one
    :func:`..operators.text.kl_report` roll-up whose payload is the
    union VOCABULARY — never documents. Reports land in
    ``stats_box["reports"]`` as ``(batch_id, lang, kl_ab, kl_ba,
    alert)`` with kl_ab = KL(batch‖reference); the first batch has no
    reference and reports nothing.

    Reports are restricted to languages PRESENT IN THE BATCH
    (``n_tok_a > 0`` — ADVICE r13): a reference language absent from
    this batch would otherwise score KL(smoothed-zero‖reference) —
    huge for any Zipfian vocabulary — turning every clean
    single-language batch of a multi-language stream into an alert. A
    language FIRST appearing in a batch still reports (appearing out
    of nowhere IS drift — the fr case in the tests). And when the
    whole self-excluded reference is empty (batch-0 replay after its
    state merge landed), the batch is treated as the bootstrap it is
    and reports nothing."""
    from ..operators.text import kl_report
    from ..sources.writers import merge_parquet

    stats_box: dict = {"batches": [], "reports": []}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_counts = (
            batch_df.select("lang", F.explode(F.split("text", " ")).alias("token"))
            .groupBy("lang", "token")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .localCheckpoint()  # cut streaming lineage; consumed twice
        )
        if _warehouse_exists(spark, state_path):
            reference = (
                spark.read.parquet(state_path)
                .filter(F.col("batch_id") != batch_id)  # replay safety
                .groupBy("lang", "token")
                .agg(F.sum("cnt").alias("ref_cnt"))
            )
            joined = (
                batch_counts.withColumnRenamed("cnt", "cnt_a")
                .join(reference, ["lang", "token"], "full_outer")
                .select(
                    "lang",
                    "token",
                    F.coalesce("cnt_a", F.lit(0)).alias("cnt_a"),
                    F.coalesce("ref_cnt", F.lit(0)).alias("cnt_b"),
                )
            )
            rows = kl_report(joined).collect()
            # all-n_tok_b-zero ⟺ the self-excluded reference is empty
            # (this batch's own replay): bootstrap, nothing to report
            if any(r.n_tok_b > 0 for r in rows):
                for r in rows:
                    if r.n_tok_a == 0:
                        continue  # reference language absent from batch
                    stats_box["reports"].append(
                        (
                            batch_id,
                            r.lang,
                            r.kl_ab,
                            r.kl_ba,
                            bool(r.kl_ab > alert_threshold),
                        )
                    )
        rows = batch_counts.withColumn("batch_id", F.lit(batch_id))
        n_rows = batch_counts.count()
        # batch_id is IN the key, so partitioning on it is stable and a
        # batch's merge writes only its own directory — the token state
        # is vocabulary-scale and a full-table rewrite per batch was the
        # one corpus-growing term (round-14 chain-scale audit); readers
        # aggregate over partitions unchanged, compact_every bounds
        # sprawl. Empty micro-batches merge nothing: an empty PARTITIONED
        # first write leaves a data-less dir no later read can infer a
        # schema from.
        if n_rows:
            merge_parquet(
                spark, state_path, rows, ["lang", "token", "batch_id"],
                partition_by=["batch_id"], stable_partition_keys=True,
            )
        stats_box["batches"].append((batch_id, n_rows))

    return sink, stats_box


def churn_monitor_sink(state_path: str, alert_threshold: float = 0.9):
    """The STREAMING form of dd17 (per-source exact snapshot churn): a
    ``foreachBatch`` sink that scores every incoming batch's per-source
    content novelty against everything ingested before it — the
    continuous form of the source on-boarding ledger (a source whose
    batches are ~all new content every time is a churn/spam signal; one
    recurring ~100 % has gone stale and is re-delivering).

    State model (the drift sink's pattern at content granularity): a
    parquet table keyed ``(source, content_key, batch_id)`` — one slim
    row per DISTINCT content per source per batch, where content_key is
    xxhash64(text) (dd17_prod's slim shuffle; the text never enters
    state). The reference is the union over all OTHER batches' rows, so
    a REPLAYED batch excludes its own prior contribution, recomputes
    the identical report, and re-merges the same key rows (exactly-once
    by construction). Wire through :func:`compact_every` on long
    streams.

    Per-batch plan: one map-side distinct over (source, key), one
    left join against the aggregated reference (both sides slim —
    8-byte keys), one per-source count roll-up. Reports land in
    ``stats_box["reports"]`` as ``(batch_id, source, n_contents,
    n_new, n_recurring, churn, alert)`` with churn = n_new /
    n_contents; the first batch (empty self-excluded reference) is the
    bootstrap and reports nothing."""
    from ..sources.writers import merge_parquet

    stats_box: dict = {"batches": [], "reports": []}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_keys = (
            batch_df.select("source", F.xxhash64("text").alias("content_key"))
            .distinct()
            .localCheckpoint()  # cut streaming lineage; consumed twice
        )
        n_keys = batch_keys.count()
        if _warehouse_exists(spark, state_path):
            reference = (
                spark.read.parquet(state_path)
                .filter(F.col("batch_id") != batch_id)  # replay safety
                .select("source", "content_key")
                .distinct()
                .withColumn("__seen", F.lit(True))
            )
            scored = (
                batch_keys.join(reference, ["source", "content_key"], "left")
                .groupBy("source")
                .agg(
                    F.count(F.lit(1)).alias("n_contents"),
                    F.sum(F.when(F.col("__seen").isNull(), 1).otherwise(0)).alias(
                        "n_new"
                    ),
                    F.sum(F.when(F.col("__seen").isNotNull(), 1).otherwise(0)).alias(
                        "n_recurring"
                    ),
                )
                .collect()
            )
            # every-source-all-new with an existing warehouse can still be
            # a batch-0 replay (self-excluded reference empty): bootstrap.
            # Probe the SAME reference frame, not a rebuilt state scan
            # (self-review r19).
            ref_empty = (
                all(r.n_recurring == 0 for r in scored)
                and reference.limit(1).count() == 0
            )
            # replay idempotence extends to the in-memory telemetry:
            # the parquet state merge is already replay-safe, but a
            # recomputed report must not append a duplicate
            # (batch_id, source) tuple (ADVICE r15)
            reported = {(b, src) for (b, src, *_rest) in stats_box["reports"]}
            if not ref_empty:
                for r in sorted(scored, key=lambda r: r.source):
                    if (batch_id, r.source) in reported:
                        continue
                    churn = r.n_new / r.n_contents
                    stats_box["reports"].append(
                        (
                            batch_id,
                            r.source,
                            r.n_contents,
                            r.n_new,
                            r.n_recurring,
                            round(churn, 6),
                            bool(churn > alert_threshold),
                        )
                    )
        rows = batch_keys.withColumn("batch_id", F.lit(batch_id))
        if n_keys:
            merge_parquet(
                spark,
                state_path,
                rows,
                ["source", "content_key", "batch_id"],
                partition_by=["batch_id"],
                stable_partition_keys=True,
            )
        stats_box["batches"].append((batch_id, n_keys))

    return sink, stats_box


def drift_gated_ingest_sink(
    corpus_path: str,
    state_path: str,
    quarantine_path: str,
    alert_threshold: float = 0.5,
):
    """Drift-GATED ingestion — :func:`drift_monitor_sink` made
    operational: every arriving batch is scored against the running
    reference distribution FIRST, and a batch whose KL(batch‖reference)
    exceeds ``alert_threshold`` in ANY language is routed whole to a
    quarantine table instead of the corpus — a spam flood, encoding
    regression or topical hijack is stopped at the door rather than
    discovered after it trained in.

    The gate is batch-atomic by design: a drifting source pollutes every
    document it ships (the distribution IS the evidence; no per-doc
    attribution exists at this stage), and an operator reviews the
    quarantine table with the per-language report in
    ``stats_box["decisions"]``.

    State/replay model: identical to the monitor's ``(lang, token,
    batch_id) → cnt`` warehouse, with one addition — a QUARANTINED
    batch contributes NOTHING to the token state (a flood must not
    poison the reference the next batch is judged against). Replay is
    deterministic both ways: the reference excludes the batch's own
    prior rows (accepted-batch replay) or never saw them (quarantined-
    batch replay), so the recomputed report and verdict are identical
    and both document merges are keyed upserts. Batch 0 bootstraps the
    reference and is always accepted (documented contract: gating
    starts once a reference exists) — and so does any batch whose
    SELF-EXCLUDED reference is empty (its own replay sees one). Gating
    is further restricted to languages PRESENT in the batch
    (``n_tok_a > 0``): a multi-language reference must not quarantine
    a clean single-language batch over the languages it doesn't
    contain (ADVICE r13). A language FIRST appearing in a batch still
    gates — appearing from nowhere is drift (the monitor's fr case).

    Per-batch plan: the monitor's (one map-side batch count agg, one
    state agg, a vocabulary-sized KL roll-up) plus ONE keyed
    merge_parquet of the documents into a ``batch_id=``-partitioned
    corpus/quarantine table — only this batch's directory is written
    (``stable_partition_keys``: a replay carries the same batch_id),
    so nothing scales with the corpus except the state agg, which is
    Heaps-sublinear in tokens and compactable via
    :func:`compact_every`. Consequence of partition-scoped writes: a
    doc_id re-shipped in a LATER batch lands in both batch partitions
    (the upstream contract is exactly-once per doc_id; content-level
    re-dedup is :func:`incremental_dedup_sink`'s job), while same-batch
    replay stays idempotent."""
    from ..operators.text import kl_report
    from ..sources.writers import merge_parquet

    stats_box: dict = {"batches": [], "decisions": []}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        docs = batch_df.select(
            "doc_id", "lang", "source", "text"
        ).localCheckpoint()  # cut streaming lineage; consumed twice
        batch_counts = (
            docs.select("lang", F.explode(F.split("text", " ")).alias("token"))
            .groupBy("lang", "token")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .localCheckpoint()
        )
        alerts: list = []
        if _warehouse_exists(spark, state_path):
            reference = (
                spark.read.parquet(state_path)
                .filter(F.col("batch_id") != batch_id)  # replay safety
                .groupBy("lang", "token")
                .agg(F.sum("cnt").alias("ref_cnt"))
            )
            joined = (
                batch_counts.withColumnRenamed("cnt", "cnt_a")
                .join(reference, ["lang", "token"], "full_outer")
                .select(
                    "lang",
                    "token",
                    F.coalesce("cnt_a", F.lit(0)).alias("cnt_a"),
                    F.coalesce("ref_cnt", F.lit(0)).alias("cnt_b"),
                )
            )
            # Gate ONLY on languages present in the batch (ADVICE r13):
            # n_tok_a == 0 is a reference language absent from this batch,
            # whose KL vs smoothed-zero would quarantine every clean
            # batch of a multi-language stream. A language FIRST appearing
            # still gates (appearing from nowhere is drift). And when the
            # WHOLE self-excluded reference is empty (batch-0 replay after
            # its state merge landed but before the checkpoint commit) —
            # every n_tok_b == 0 — the replay re-accepts as the bootstrap
            # it is, instead of re-verdicting the already-merged batch
            # into quarantine (docs landing in corpus AND quarantine).
            rows = kl_report(joined).collect()
            if any(r.n_tok_b > 0 for r in rows):
                alerts = [
                    (r.lang, r.kl_ab)
                    for r in rows
                    if r.n_tok_a > 0 and r.kl_ab > alert_threshold
                ]
        quarantined = bool(alerts)
        target = quarantine_path if quarantined else corpus_path
        n_docs = docs.count()
        # batch_id-partitioned keyed merges: stable_partition_keys holds
        # because a replayed batch carries the same batch_id, so only THIS
        # batch's directory is ever rewritten — per-batch cost is O(batch),
        # not O(corpus) (ADVICE r13; the line_dedup_sink epoch pattern).
        # Empty micro-batches merge nothing (an empty PARTITIONED first
        # write leaves a data-less dir no later read can infer a schema
        # from).
        if n_docs:
            merge_parquet(
                spark,
                target,
                docs.withColumn("batch_id", F.lit(batch_id)),
                ["doc_id"],
                partition_by=["batch_id"],
                stable_partition_keys=True,
            )
        if not quarantined and n_docs:
            merge_parquet(
                spark,
                state_path,
                batch_counts.withColumn("batch_id", F.lit(batch_id)),
                ["lang", "token", "batch_id"],
                partition_by=["batch_id"],
                stable_partition_keys=True,
            )
        stats_box["decisions"].append((batch_id, quarantined, sorted(alerts)))
        stats_box["batches"].append((batch_id, n_docs))

    return sink, stats_box


#: streaming split: the x15/x17 portable Knuth rank constants — kept
#: numerically identical to plans.llmops.PRIO_MOD/PRIO_MULT so the
#: within-batch order matches the batch kernels' deterministic order
_SPLIT_RANK_MOD = 1_000_003
_SPLIT_RANK_MULT = 2654435761


def _streaming_split_label(
    slim: DataFrame,
    prior: DataFrame | None,
    cuts,
    labels,
) -> DataFrame:
    """The per-batch labeling kernel of :func:`streaming_split_sink`,
    module-level so tests can plan-assert it: given this batch's slim
    ``(doc_id, stratum, rank_key)`` frame and the (tiny, broadcast)
    per-stratum PRIOR counts, label each doc by the ceil-cut-increment
    rule. One Exchange total on the batch side (the per-stratum window);
    the state joins as a broadcast."""
    from pyspark.sql import Window

    w = Window.partitionBy("stratum").orderBy("rank_key", "doc_id")
    pos = slim.withColumn("__rn", F.row_number().over(w))
    if prior is not None:
        pos = pos.join(F.broadcast(prior), "stratum", "left")
    else:
        pos = pos.withColumn("prior_n", F.lit(None).cast("bigint"))
    pos = pos.withColumn(
        "__i", F.coalesce("prior_n", F.lit(0)) + F.col("__rn") - F.lit(1)
    )
    # label index = number of cuts whose cumulative ceil target does NOT
    # increment from __i to __i+1 items (integer arithmetic only)
    idx = F.lit(0)
    for num, den in cuts:
        t_next = F.expr(f"((__i + 1) * {num} + {den - 1}) div {den}")
        t_here = F.expr(f"(__i * {num} + {den - 1}) div {den}")
        idx = idx + (t_next <= t_here).cast("int")
    label_arr = F.array(*[F.lit(lb) for lb in labels])
    return pos.withColumn("split", F.element_at(label_arr, idx + 1)).select(
        "doc_id", "stratum", "split"
    )


def streaming_split_sink(
    state_path: str,
    out_path: str,
    stratum_col: str = "lang",
    cuts=((8, 10), (9, 10)),
    labels=("train", "val", "test"),
):
    """The STREAMING form of x17 (exact per-stratum train/val/test
    assignment; round-14 agenda item 2): a ``foreachBatch`` sink that
    labels every arriving document with a split consistent with the
    warehouse's RUNNING per-stratum proportions — the assignment stage
    of a continuously-ingesting training pipeline, where a batch
    re-split would reshuffle history and a hash split's binomial error
    never pays down for small strata.

    Assignment rule (prefix-exact): a stratum's docs are numbered in
    stream order (within a batch: by the x15 portable Knuth rank,
    doc_id tie-break — deterministic under replay); the doc at 0-based
    running position i takes the label whose cumulative ceil-cut
    target ``t_k(n) = ceil(n·num_k/den_k)`` increments from i to i+1
    (label index = #cuts that do NOT increment). Consequence, for
    nested same-denominator cuts like the default 8/10 < 9/10: after
    EVERY batch the warehouse's per-stratum split counts are exactly
    x17's counts for that many docs — exact at every moment, not just
    in the limit. (For cuts with incommensurate denominators the ceil
    targets can increment non-nestedly and the guarantee weakens to
    ±1 per cut; the rule stays deterministic.)

    State model (the dd11/domain-quota warehouse pattern): a tiny
    parquet table ``(stratum, split, batch_id) → cnt`` — |strata| ×
    |splits| scalar rows per batch, never documents; the running
    position base is the sum over all OTHER batches' rows, so a
    REPLAYED batch excludes its own prior contribution, recomputes the
    identical labels, rewrites ``{out_path}/epoch={batch_id}``
    byte-identically, and re-upserts the same count rows (exactly-once
    by construction; pinned by an explicit replay in the test).

    Per-batch plan: ONE Exchange on the batch side (the per-stratum
    row_number window); the state aggregate joins as a BROADCAST
    (plan-asserted). At 100 TB/day the shuffle is the batch, never the
    corpus, and the state table stays KB-scale for thousands of
    batches."""
    from ..sources.writers import merge_parquet

    if len(labels) != len(cuts) + 1:
        raise ValueError("need len(labels) == len(cuts) + 1")
    fracs = [num / den for num, den in cuts]
    if sorted(fracs) != fracs:
        raise ValueError("cuts must be in increasing cumulative order")
    stats_box: dict = {"batches": []}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        slim = (
            batch_df.select(
                "doc_id", F.col(stratum_col).alias("stratum")
            )
            .withColumn(
                "rank_key",
                (F.col("doc_id") % _SPLIT_RANK_MOD) * F.lit(_SPLIT_RANK_MULT),
            )
            .localCheckpoint()  # cut streaming lineage; consumed twice
        )
        if _warehouse_exists(spark, state_path):
            prior = (
                spark.read.parquet(state_path)
                .filter(F.col("batch_id") != batch_id)  # replay safety
                .groupBy("stratum")
                .agg(F.sum("cnt").alias("prior_n"))
            )
        else:
            prior = None
        labeled = _streaming_split_label(slim, prior, cuts, labels).localCheckpoint()
        labeled.write.mode("overwrite").parquet(f"{out_path}/epoch={batch_id}")
        counts = (
            labeled.groupBy("stratum", "split")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("batch_id", F.lit(batch_id))
        )
        merge_parquet(
            spark, state_path, counts, ["stratum", "split", "batch_id"]
        )
        stats_box["batches"].append(
            (
                batch_id,
                labeled.count(),
                {(r.stratum, r.split): r.cnt for r in counts.collect()},
            )
        )

    return sink, stats_box


def curation_chain_sink(
    corpus_path: str,
    quarantine_path: str,
    sig_path: str,
    token_state_path: str,
    quota_state_path: str,
    split_state_path: str,
    min_tokens: int = 5,
    num_hashes: int = 8,
    bands: int = 4,
    dedup_threshold: float = 0.5,
    alert_threshold: float = 0.5,
    quota: dict[str, int] | None = None,
    quota_default: int = 60,
    stratum_col: str = "lang",
    cuts=((8, 10), (9, 10)),
    labels=("train", "val", "test"),
):
    """The END-TO-END streaming curation chain — the continuous twin of
    the x14 batch pipeline, composed from the individually-certified
    sink kernels in PRODUCTION admission order, in ONE ``foreachBatch``:

    1. quality gate (stateless token-count filter),
    2. DRIFT GATE on the gated batch (the batch-atomic admission
       decision — a flooding source is turned away before it can touch
       any other state; quarantined batches contribute NOTHING to any
       warehouse, so the gate's reference, the dedup corpus, the quota
       ledger and the split proportions are all flood-proof),
    3. incremental near-dup dedup against the signature warehouse,
    4. running per-source domain quota (skew-safe kernel),
    5. prefix-exact train/val/test labeling at the docs' running
       per-stratum positions,
    6. one batch_id-partitioned corpus merge + the four state merges.

    State model: every table is a keyed warehouse with batch_id in the
    key or self-exclusion in the read (token counts, quota counts,
    split counts exclude their own batch_id; the signature warehouse
    excludes same-doc_id candidates), so a REPLAYED batch recomputes
    every verdict against the same effective state and re-writes
    byte-identical outputs — exactly-once for the chain as a whole,
    not just per stage (pinned by an explicit whole-chain replay in
    tests/test_streaming.py).

    Semantics choices worth naming: the drift reference tracks the
    CORPUS distribution (token counts merged from the docs that
    actually entered, post-dedup/post-quota — arriving batches are
    judged against what trained, not against what arrived); signatures
    merge for KEPT docs only (a quota-dropped doc never entered, so a
    later copy gets its own admission rather than a phantom dup
    verdict); the split labels only what survived every stage, so the
    warehouse proportions are exact over the actual training corpus.

    Per-batch cost: everything scales with the batch (map-side aggs,
    one window, broadcast state joins) except the signature-warehouse
    band join, which is increment-bounded (dd11). Returns
    ``(sink_fn, stats_box)``; stats rows are ``(batch_id, n_in,
    n_gated, n_dup_dropped, n_quota_dropped, quarantined,
    {(stratum, split): n})``."""
    from ..operators.dedup import incremental_dedup, minhash_signature_table
    from ..operators.skew import capped_keep_first
    from ..operators.text import kl_report
    from ..sources.writers import merge_parquet

    quota = quota or {}
    stats_box: dict = {"batches": []}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        docs = batch_df.select("doc_id", "text", "lang", "source").localCheckpoint()
        n_in = docs.count()
        gated = docs.filter(
            F.array_size(F.split("text", " ")) >= min_tokens
        ).localCheckpoint()
        n_gated = gated.count()

        # 2. drift gate (admission) — same rules as drift_gated_ingest_sink
        batch_counts = (
            gated.select("lang", F.explode(F.split("text", " ")).alias("token"))
            .groupBy("lang", "token")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        alerts: list = []
        if _warehouse_exists(spark, token_state_path):
            reference = (
                spark.read.parquet(token_state_path)
                .filter(F.col("batch_id") != batch_id)  # replay safety
                .groupBy("lang", "token")
                .agg(F.sum("cnt").alias("ref_cnt"))
            )
            joined = (
                batch_counts.withColumnRenamed("cnt", "cnt_a")
                .join(reference, ["lang", "token"], "full_outer")
                .select(
                    "lang",
                    "token",
                    F.coalesce("cnt_a", F.lit(0)).alias("cnt_a"),
                    F.coalesce("ref_cnt", F.lit(0)).alias("cnt_b"),
                )
            )
            rows = kl_report(joined).collect()
            if any(r.n_tok_b > 0 for r in rows):
                alerts = [
                    (r.lang, r.kl_ab)
                    for r in rows
                    if r.n_tok_a > 0 and r.kl_ab > alert_threshold
                ]
        if alerts:
            merge_parquet(
                spark,
                quarantine_path,
                docs.withColumn("batch_id", F.lit(batch_id)),
                ["doc_id"],
                partition_by=["batch_id"],
                stable_partition_keys=True,
            )
            stats_box["batches"].append(
                (batch_id, n_in, n_gated, 0, 0, True, {})
            )
            return

        # 3. incremental near-dup dedup vs the signature warehouse
        inc_sigs = minhash_signature_table(
            gated, num_hashes=num_hashes, portable=False
        ).localCheckpoint()
        if _warehouse_exists(spark, sig_path):
            verdicts = incremental_dedup(
                inc_sigs,
                spark.read.parquet(sig_path),
                num_hashes=num_hashes,
                bands=bands,
                threshold=dedup_threshold,
            )
            survivors = gated.join(
                verdicts.filter(~F.col("is_dup")).select("doc_id"), "doc_id"
            )
        else:
            survivors = gated
        survivors = survivors.localCheckpoint()
        n_surv = survivors.count()

        # 4. running per-source quota (allowance = quota − other batches)
        qmap = F.create_map(*[F.lit(x) for kv in quota.items() for x in kv])
        with_rem = survivors.select("doc_id", "source").withColumn(
            "__q", F.coalesce(F.element_at(qmap, F.col("source")), F.lit(quota_default))
        )
        if _warehouse_exists(spark, quota_state_path):
            taken = (
                spark.read.parquet(quota_state_path)
                .filter(F.col("batch_id") != batch_id)  # replay safety
                .groupBy("source")
                .agg(F.sum("n_kept").alias("taken"))
            )
            with_rem = (
                with_rem.join(F.broadcast(taken), "source", "left")
                .withColumn(
                    "__rem",
                    F.greatest(
                        F.col("__q") - F.coalesce("taken", F.lit(0)), F.lit(0)
                    ),
                )
                .drop("taken")
            )
        else:
            with_rem = with_rem.withColumn("__rem", F.col("__q"))
        kept_ids = capped_keep_first(
            with_rem, "source", "doc_id", F.col("__rem")
        ).select("doc_id")
        kept = survivors.join(kept_ids, "doc_id").localCheckpoint()
        n_kept = kept.count()

        # 5. prefix-exact split at the kept docs' running positions
        slim = kept.select(
            "doc_id", F.col(stratum_col).alias("stratum")
        ).withColumn(
            "rank_key",
            (F.col("doc_id") % _SPLIT_RANK_MOD) * F.lit(_SPLIT_RANK_MULT),
        )
        prior = None
        if _warehouse_exists(spark, split_state_path):
            prior = (
                spark.read.parquet(split_state_path)
                .filter(F.col("batch_id") != batch_id)  # replay safety
                .groupBy("stratum")
                .agg(F.sum("cnt").alias("prior_n"))
            )
        labeled = _streaming_split_label(slim, prior, cuts, labels)
        out = (
            kept.join(labeled.select("doc_id", "split"), "doc_id")
            .withColumn("batch_id", F.lit(batch_id))
            .localCheckpoint()
        )

        # 6. corpus write + the four state merges (all keyed, idempotent).
        # Everything below derives from `kept`, so an accepted batch that
        # kept NOTHING (all gated/dup/over-quota) merges nothing: creating
        # a table from an empty frame would leave a data-less directory
        # the NEXT batch's state read cannot infer a schema from.
        if n_kept:
            merge_parquet(
                spark, corpus_path, out, ["doc_id"],
                partition_by=["batch_id"], stable_partition_keys=True,
            )
        # sig warehouse is batch_id-partitioned like the corpus: per-doc
        # rows grow with the corpus, and a full-table keyed merge would
        # make every batch pay an O(corpus) rewrite (measured flat at
        # toy scale only because job overhead dominates there); with the
        # partition, a batch writes its own directory and a replay
        # rewrites the same one (stable: doc_id→batch_id is fixed).
        # Readers are unaffected (incremental_dedup uses doc_id+sig);
        # wire compact_every if file sprawl ever matters.
        kept_sigs = inc_sigs.join(kept.select("doc_id"), "doc_id").withColumn(
            "batch_id", F.lit(batch_id)
        )
        if n_kept:
            merge_parquet(
                spark, sig_path, kept_sigs, ["doc_id"],
                partition_by=["batch_id"], stable_partition_keys=True,
            )
        kept_counts = (
            kept.select("lang", F.explode(F.split("text", " ")).alias("token"))
            .groupBy("lang", "token")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("batch_id", F.lit(batch_id))
        )
        quota_counts = (
            kept.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_kept"))
            .withColumn("batch_id", F.lit(batch_id))
        )
        split_counts = (
            out.groupBy(F.col(stratum_col).alias("stratum"), "split")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("batch_id", F.lit(batch_id))
        )
        if n_kept:
            merge_parquet(
                spark, token_state_path, kept_counts,
                ["lang", "token", "batch_id"],
                partition_by=["batch_id"], stable_partition_keys=True,
            )
            merge_parquet(
                spark, quota_state_path, quota_counts, ["source", "batch_id"]
            )
            merge_parquet(
                spark, split_state_path, split_counts,
                ["stratum", "split", "batch_id"],
            )
        stats_box["batches"].append(
            (
                batch_id,
                n_in,
                n_gated,
                n_gated - n_surv,
                n_surv - n_kept,
                False,
                {(r.stratum, r.split): r.cnt for r in split_counts.collect()},
            )
        )

    return sink, stats_box
