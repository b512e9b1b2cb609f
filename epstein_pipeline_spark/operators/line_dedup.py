"""Cross-corpus line-level dedup (the C4 / CCNet pre-training pass).

C4 (Raffel et al. 2020, §2.2) removes every occurrence but one of any
three-sentence span that repeats anywhere in the corpus; CCNet does the
same at paragraph granularity with hashes. The engine's corpus has no
sentence/newline structure, so the "line" unit here is a fixed-width
token segment (``seg_tokens`` consecutive normalized tokens, default
10) — same rule, deterministic segmentation.

Semantics (matched by the DuckDB oracle in entry_queries):

- segment each doc's normalized token stream into ceil(n/seg) lines;
- a line occurring >= 2 times corpus-wide (any doc, including the same
  doc) keeps ONLY its first occurrence in (doc_id, line_idx) order;
  every later occurrence is removed;
- each doc's cleaned text is its surviving lines re-joined in order
  (empty string when everything was removed — e.g. an exact dup doc).

Scale shape (the part that matters at 10^12 pages): the line-identity
exchange carries ONLY (line_hash: long, doc_id, line_idx) — never
text. The winner per line is ``min(struct(doc_id, line_idx))`` via an
aggregate, NOT a row_number window: partial aggregation (map-side
combine) absorbs hot-line skew — a boilerplate line repeated 10^9
times combines down to one row per map task, where a window would pin
all 10^9 occurrences on one reducer and no AQE split can save it
(windows cannot be split; joins and partial aggs can). The cleaned
text is rebuilt IN PLACE on the scan side by excising removed segment
indices with array expressions, so the join back to documents carries
only (doc_id, array<int>) rows for docs that actually lost lines —
broadcast while that set fits (the gate below, same convention as
dup_spans/decontam), in which case document text crosses ZERO
exchanges; on the shuffled fallback the corpus pays exactly one
id-keyed exchange and the hash-keyed exchanges still carry longs.

Hash note: line identity uses xxhash64 on the segment text. 64-bit is
fine to ~10^9 distinct lines; at true trillion-line scale switch the
key to the 128-bit pair (xxhash64(line), xxhash64(line, seed=1)) —
same plan shape, two longs instead of one.

Reference parity: the reference dedups whole documents
(dedup/minhash.py, dedup/exact.py); line-level is the web-pipeline
extension SURVEY §2.9 calls for (training-data ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from epstein_pipeline_spark.functions.text import normalize_text_expr as _norm

__all__ = ["dedup_lines", "dedup_lines_incremental"]


def dedup_lines(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 10,
    removed_docs_hint: int | None = None,
    broadcast_max_docs: int = 1_000_000,
) -> DataFrame:
    """Remove all-but-first occurrences of corpus-repeated lines.

    Returns (id_col, n_lines, n_removed, cleaned_text) — one row per
    input doc, surviving lines re-joined with single spaces.

    ``removed_docs_hint`` skips the eager broadcast-gate probe on the
    removed-lines side (pass a known bound to stay fully lazy; the
    default path runs one approx_count_distinct job at call time —
    the dup_spans/salted_block_join convention); ``broadcast_max_docs=0``
    forces the shuffled join.
    """
    seg = int(seg_tokens)
    base = _tokenized(docs, id_col, text_col, seg)
    occ = _occurrences(base, id_col, seg)

    # winner per repeated line via partial-aggregating min (skew-safe;
    # see module docstring for why this is not a row_number window)
    winners = (
        occ.groupBy("lh")
        .agg(
            F.min(F.struct(F.col(id_col), F.col("line_idx"))).alias("first_occ"),
            F.count("*").alias("occs"),
        )
        .filter(F.col("occs") >= 2)
        .select("lh", "first_occ")
    )

    removed = (
        occ.join(winners, "lh")
        .filter(F.struct(F.col(id_col), F.col("line_idx")) != F.col("first_occ"))
        .groupBy(id_col)
        .agg(
            F.collect_list("line_idx").alias("removed_idx"),
            F.count("*").alias("n_removed"),
        )
    )

    if broadcast_max_docs > 0:
        n_removed_docs = (
            removed_docs_hint
            if removed_docs_hint is not None
            else removed.agg(F.approx_count_distinct(id_col).alias("n")).collect()[0]["n"]
        )
        if n_removed_docs <= broadcast_max_docs:
            removed = F.broadcast(removed)

    return _rebuild(base, removed, id_col, seg)


def _tokenized(docs: DataFrame, id_col: str, text_col: str, seg: int) -> DataFrame:
    return docs.select(
        F.col(id_col),
        F.split(_norm(text_col), " ").alias("toks"),
    ).withColumn(
        "n_seg",
        F.greatest(
            ((F.size("toks") + F.lit(seg - 1)) / F.lit(seg)).cast("int"), F.lit(1)
        ),
    )


def _occurrences(base: DataFrame, id_col: str, seg: int) -> DataFrame:
    """(id, line_idx, lh) — hashes only, text stays on the scan side."""
    return base.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.col("n_seg") - 1)).alias("line_idx"),
        F.col("toks"),
    ).select(
        F.col(id_col),
        "line_idx",
        F.xxhash64(
            F.concat_ws(" ", F.slice(F.col("toks"), F.col("line_idx") * seg + 1, seg))
        ).alias("lh"),
    )


def _rebuild(base: DataFrame, removed: DataFrame, id_col: str, seg: int) -> DataFrame:
    """Join the per-doc removed-index arrays back and excise those
    segments from the in-place token stream."""
    line_at = lambda i: F.concat_ws(  # noqa: E731 — segment i of the token stream
        " ", F.slice(F.col("toks"), i * seg + 1, seg)
    )
    kept_idx = F.filter(
        F.sequence(F.lit(0), F.col("n_seg") - 1),
        lambda i: ~F.array_contains(F.coalesce(F.col("removed_idx"), F.array()), i),
    )
    cleaned = F.concat_ws(" ", F.transform(kept_idx, line_at))
    return base.join(removed, id_col, "left").select(
        F.col(id_col),
        F.col("n_seg").cast("long").alias("n_lines"),
        F.coalesce(F.col("n_removed"), F.lit(0).cast("long")).alias("n_removed"),
        cleaned.alias("cleaned_text"),
    )


def dedup_lines_incremental(
    store,
    delta: DataFrame,
    *,
    batch_id: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 10,
    seen_stage: str = "line_seen",
    delta_lhs_hint: int | None = None,
    broadcast_max: int = 1_000_000,
) -> DataFrame:
    """Fold a delta batch into persistent seen-line state (CCNet-style
    hash memory) and return the delta's cleaned docs.

    Semantics: keep-first in BATCH-COMMIT order — a line already in
    the ``seen_stage`` state removes every delta occurrence; lines new
    to the corpus keep their min-(id, line_idx) occurrence within the
    delta (so folding batches whose id ranges are increasing equals
    the one-shot ``dedup_lines``; the parity test pins this).

    Crash-rerun idempotency rides the StageStore metadata log: each
    fold appends the delta's new distinct line hashes with the caller's
    ``batch_id`` in the manifest. A rerun of an already-committed batch
    — the latest OR any earlier one (the whole log is scanned, not just
    the head) — is detected there and re-cleans against the PRE-batch
    state via ``read(as_of=parent_snapshot)`` (time-travel) WITHOUT
    appending; otherwise the rerun would see the delta's own lines as
    "seen" and wipe every doc. Detection reads the ORIGINAL fold
    manifest from the log, so it survives compaction rewriting the
    head; if snapshot expiry has deleted the pre-batch files, the
    rerun raises (the expired snapshot is named) rather than silently
    producing a different cleaning than the original fold did.

    Scale shape: the seen state can be enormous (every distinct line
    ever), so the delta never joins it raw — the big side is first
    semi-joined down to the delta's own line-hash set, which is
    BROADCAST while it fits (``broadcast_max``, the run_incremental
    delta-derived-broadcast convention; shuffled fallback past it).
    The state append carries only new int64 hashes.
    """
    spark: SparkSession = delta.sparkSession
    seg = int(seg_tokens)
    base = _tokenized(delta, id_col, text_col, seg)
    occ = _occurrences(base, id_col, seg)

    latest = store.latest(seen_stage)
    # scan the WHOLE metadata log, not just the head: a retried
    # orchestrator may re-submit any earlier committed batch, and
    # treating it as new would mark every one of its lines "seen" and
    # wipe its docs
    folded = next(
        (
            m
            for m in (store.snapshots(seen_stage) if latest is not None else [])
            if m.get("line_batch_id") == batch_id
        ),
        None,
    )
    rerun = folded is not None
    if rerun:
        # `folded` is the ORIGINAL fold manifest from the log (compact
        # rewrites the head but never the log history), so its parent
        # pointer survives compaction; parent None == this was the
        # first fold onto an empty stage. If expire_snapshots has since
        # deleted the pre-batch files, read(as_of) raises with the
        # expired snapshot named — never a silent different cleaning.
        parent = folded.get("parent_snapshot")
        seen = (
            store.read(spark, seen_stage, as_of=parent)
            if parent is not None
            else spark.createDataFrame([], "lh long")
        )
    elif latest is not None:
        seen = store.read(spark, seen_stage)
    else:
        seen = spark.createDataFrame([], "lh long")

    if not rerun:
        # the state append below executes an action over occ before
        # the caller consumes the returned cleaning plan; a lazy local
        # checkpoint makes that first action materialize the delta's
        # tokenize/hash work once instead of twice
        occ = occ.localCheckpoint(eager=False)

    delta_lhs = occ.select("lh").distinct()
    if broadcast_max > 0:
        n_lhs = (
            delta_lhs_hint
            if delta_lhs_hint is not None
            else delta_lhs.agg(F.approx_count_distinct("lh").alias("n")).collect()[0]["n"]
        )
        if n_lhs <= broadcast_max:
            delta_lhs = F.broadcast(delta_lhs)
    seen_touched = seen.join(delta_lhs, "lh", "left_semi")
    if not rerun:
        # the state-append action AND the caller's cleaning action both
        # consume seen_touched and occ_new; lazy local checkpoints make
        # whichever action runs first materialize the seen-state scan +
        # the semi/anti joins ONCE instead of once per action — this
        # duplicated state-side work was the bulk of the fold's fixed
        # per-commit cost (round-5 lo/hi pair eff 0.46-0.55). Blocks
        # are small: touched lines are bounded by the delta's own line
        # set, never the state's size.
        seen_touched = seen_touched.localCheckpoint(eager=False)

    occ_seen = occ.join(seen_touched, "lh", "left_semi")
    occ_new = occ.join(seen_touched, "lh", "left_anti")
    if not rerun:
        occ_new = occ_new.localCheckpoint(eager=False)
    winners_new = (
        occ_new.groupBy("lh")
        .agg(
            F.min(F.struct(F.col(id_col), F.col("line_idx"))).alias("first_occ"),
            F.count("*").alias("occs"),
        )
        .filter(F.col("occs") >= 2)
        .select("lh", "first_occ")
    )
    losers_new = (
        occ_new.join(winners_new, "lh")
        .filter(F.struct(F.col(id_col), F.col("line_idx")) != F.col("first_occ"))
        .select(id_col, "line_idx")
    )
    removed = (
        occ_seen.select(id_col, "line_idx")
        .unionByName(losers_new)
        .groupBy(id_col)
        .agg(
            F.collect_list("line_idx").alias("removed_idx"),
            F.count("*").alias("n_removed"),
        )
    )

    if not rerun:
        # no counters action here: delta_rows in the append manifest
        # already records the new-line count; an extra delta.count()
        # would re-execute the delta scan for a number we have
        store.append(
            seen_stage,
            occ_new.select("lh").distinct(),
            extra={"line_batch_id": batch_id},
        )
    return _rebuild(base, removed, id_col, seg)
