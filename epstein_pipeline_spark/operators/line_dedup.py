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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dedup_lines"]


def _norm(col):
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.regexp_replace(F.lower(c), r"(?U)\s+", " "), r"^ | $", "")


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
    base = docs.select(
        F.col(id_col),
        F.split(_norm(text_col), " ").alias("toks"),
    ).withColumn(
        "n_seg",
        F.greatest(
            ((F.size("toks") + F.lit(seg - 1)) / F.lit(seg)).cast("int"), F.lit(1)
        ),
    )

    line_at = lambda i: F.concat_ws(  # noqa: E731 — segment i of the token stream
        " ", F.slice(F.col("toks"), i * seg + 1, seg)
    )

    # occurrence table: hashes only, text stays on the scan side
    occ = base.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.col("n_seg") - 1)).alias("line_idx"),
        F.col("toks"),
    ).select(
        F.col(id_col),
        "line_idx",
        F.xxhash64(F.concat_ws(" ", F.slice(F.col("toks"), F.col("line_idx") * seg + 1, seg))).alias("lh"),
    )

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

    kept_idx = F.filter(
        F.sequence(F.lit(0), F.col("n_seg") - 1),
        lambda i: ~F.array_contains(F.coalesce(F.col("removed_idx"), F.array()), i),
    )
    cleaned = F.concat_ws(" ", F.transform(kept_idx, line_at))

    return (
        base.join(removed, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_seg").cast("long").alias("n_lines"),
            F.coalesce(F.col("n_removed"), F.lit(0).cast("long")).alias("n_removed"),
            cleaned.alias("cleaned_text"),
        )
    )
