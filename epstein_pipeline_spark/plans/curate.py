"""One-pass training-corpus curation: the round-5 web-text operators
composed in the order a production pipeline runs them (C4 §2.2 /
Gopher §A.1.1 / Dolma conventions):

  1. Gopher quality gates       — drop docs failing any rule
  2. cross-corpus line dedup    — strip repeated lines from survivors,
                                  drop docs wiped to empty
  3. PII redaction              — mask EMAIL/SSN/IPv4/PHONE sentinels
  4. exact content dedup        — keep the min-id copy per normalized
                                  content hash of the final text

Filtering precedes dedup deliberately (the C4 ordering): quality-
rejected docs must not claim keep-first line ownership, and line-level
cleanup changes the content hash the exact pass groups on.

Scale/audit shape: the chain is ONE lazy plan — no stage materializes
mid-pipeline, and per-stage drop counters come from a single aggregate
over an audit frame that tags every input doc with the stage that
dropped it (0 extra scans beyond the final write + one agg; the CLI
localCheckpoints once so write and stats share one execution). At
cluster scale each stage writes to its own table instead — this module
keeps the operators' composition contract in one place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from epstein_pipeline_spark.functions.text import (
    content_hash_expr,
    gopher_gate_exprs,
    normalize_text_expr,
)
from epstein_pipeline_spark.operators.line_dedup import dedup_lines
from epstein_pipeline_spark.operators.pii import PII_PATTERNS, redact_pii

__all__ = ["curate_corpus", "curation_stats"]

_PII_COUNT_COLS = [f"n_{t.lower()}" for t in PII_PATTERNS]


def curate_corpus(
    corpus: DataFrame,
    *,
    id_col: str = "url",
    text_col: str = "text",
    seg_tokens: int = 10,
    removed_docs_hint: int | None = None,
    dup_hashes_hint: int | None = None,
    broadcast_max: int = 1_000_000,
) -> DataFrame:
    """Audit frame: EVERY input doc with a ``drop_stage`` tag
    (null = kept) plus per-stage evidence columns. The curated corpus
    is ``audit.filter("drop_stage IS NULL")`` projected to
    (id, text, lines_removed, pii counts); the CLI does exactly that.

    drop_stage ∈ {gopher, line_wipe, exact_dup, NULL}.
    """
    # gates computed INLINE (one projection, zero joins — gopher_gates
    # as a separate frame would re-join corpus-sized text on id for
    # per-row scalar work); NULL text coalesces to "" so such docs
    # fail the word-count gate and land in dropped_gopher instead of
    # vanishing from the audit frame (NULL comparisons are NULL, which
    # both filter branches would drop)
    pre = corpus.select(
        F.col(id_col), F.coalesce(F.col(text_col), F.lit("")).alias(text_col)
    )
    with_cols = pre.withColumn("__norm", normalize_text_expr(text_col)).withColumn(
        "__toks", F.split(F.col("__norm"), " ")
    )
    gates = gopher_gate_exprs(F.col("__norm"), F.col("__toks"))
    pass_all = None
    for g in gates.values():
        pass_all = g if pass_all is None else (pass_all & g)
    tagged = with_cols.withColumn("pass_all", pass_all).drop("__norm", "__toks")

    survivors = tagged.filter(F.col("pass_all"))
    cleaned = dedup_lines(
        survivors,
        id_col=id_col,
        text_col=text_col,
        seg_tokens=seg_tokens,
        removed_docs_hint=removed_docs_hint,
        broadcast_max_docs=broadcast_max,
    )
    masked = redact_pii(
        cleaned.select(
            id_col,
            F.col("cleaned_text").alias(text_col),
            F.col("n_lines"),
            F.col("n_removed").alias("lines_removed"),
        ),
        id_col=id_col,
        text_col=text_col,
    )
    # exact dedup on the FINAL text: keep the min-id copy per hash.
    # Same skew reasoning as line_dedup: winner-per-hash is a partial-
    # aggregating groupBy (map-side combine absorbs a boilerplate page
    # duplicated 10^9 times), never a window over the hash. Only the
    # DUPLICATED hashes (count >= 2) join back — a small fraction of
    # the corpus, broadcast-gated so the text side crosses no exchange
    # on the common path.
    hashed = masked.withColumn("__h", content_hash_expr(text_col))
    dup_keepers = (
        hashed.groupBy("__h")
        .agg(F.min(id_col).alias("__keep_id"), F.count("*").alias("__c"))
        .filter(F.col("__c") >= 2)
        .drop("__c")
    )
    if broadcast_max > 0:
        n_dup = (
            dup_hashes_hint
            if dup_hashes_hint is not None
            else dup_keepers.agg(F.approx_count_distinct("__h").alias("n")).collect()[0]["n"]
        )
        if n_dup <= broadcast_max:
            dup_keepers = F.broadcast(dup_keepers)
    ranked = hashed.join(dup_keepers, "__h", "left").withColumn(
        "__keep", F.col("__keep_id").isNull() | (F.col(id_col) == F.col("__keep_id"))
    )
    staged = ranked.drop("__keep_id").withColumn(
        "drop_stage",
        F.when(F.col(text_col) == "", F.lit("line_wipe"))
        .when(~F.col("__keep"), F.lit("exact_dup"))
        .otherwise(F.lit(None).cast("string")),
    ).drop("__h", "__keep", "pass_all")

    dropped_gopher = tagged.filter(~F.col("pass_all")).select(
        F.col(id_col),
        F.col(text_col),
        F.lit(None).cast("long").alias("n_lines"),
        F.lit(None).cast("long").alias("lines_removed"),
        *[F.lit(None).cast("int").alias(c) for c in _PII_COUNT_COLS],
        F.lit(None).cast("boolean").alias("any_pii"),
        F.lit("gopher").alias("drop_stage"),
    )
    return staged.unionByName(dropped_gopher)


def curation_stats(audit: DataFrame) -> dict:
    """One aggregate over the audit frame -> per-stage counters."""
    row = audit.agg(
        F.count(F.lit(1)).alias("docs_in"),
        F.sum((F.col("drop_stage") == "gopher").cast("long")).alias("dropped_gopher"),
        F.sum((F.col("drop_stage") == "line_wipe").cast("long")).alias("dropped_line_wipe"),
        F.sum((F.col("drop_stage") == "exact_dup").cast("long")).alias("dropped_exact_dup"),
        F.sum(F.when(F.col("drop_stage").isNull(), F.lit(1)).otherwise(F.lit(0))).alias("docs_out"),
        F.sum("lines_removed").alias("lines_removed"),
        F.sum(F.when(F.col("drop_stage").isNull() & F.col("any_pii"), 1).otherwise(0)).alias("docs_with_pii"),
    ).collect()[0]
    return {k: (int(v) if v is not None else 0) for k, v in row.asDict().items()}
