"""Cross-document repeated-span (exact-substring) deduplication — the
"ExactSubstr" stage of large-LM data curation (Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better"): any
token span of length >= n that occurs more than once in the corpus is
flagged, and every occurrence but one canonical copy is stripped.

The reference verifies near-dup pairs with an in-memory LCS
(`dedup/lcs.py` in the reference repo, mirrored Spark-side by
`operators/lcs.py`); this operator is the corpus-WIDE generalization a
web-text pipeline needs: not "how similar are these two candidate
docs" but "which exact spans are repeated anywhere in 10^12 pages".

Reformulation (exact, not approximate): a maximal repeated substring
of token length L >= n is covered exactly by its L-n+1 constituent
n-grams, each of which repeats; conversely every position covered by
a repeated n-gram lies inside a repeated span of length >= n. So
"tokens inside >= n-token repeated spans" == "tokens covered by
repeated n-grams" — the suffix-array scan of the paper collapses to a
gram count + per-doc interval merge, with no global sort:

- Pass A groups (gram_hash) and keeps count >= min_count, carrying
  ``min(struct(id, pos))`` as the canonical occurrence (the one copy
  Lee et al. keep; deterministic, engine-independent ordering). The
  shuffle carries map-side-combined partial counts per distinct gram
  — boilerplate-heavy hot grams collapse BEFORE the exchange, the
  property a suffix array's global sort lacks.
- Pass B joins positions to the duplicated-gram set (broadcast while
  it fits, gated like ``decontam.flag_contaminated``; shuffled
  fallback beyond the cap), drops each gram's canonical occurrence,
  and merges each doc's hit positions into maximal [start, end]
  token islands with a single ``aggregate`` over the sorted
  positions — O(hits) per doc, no per-token blowup.
- Gram fingerprints are 64-bit polynomial rolling-hash byte-span
  longs (murmur-style finalizer) built per
  ``functions/grams.py`` (Generate-barrier construction — see that
  module for the Catalyst alias-substitution hazard and the
  per-gram string-churn cost it avoids): corpus text never enters
  pass A's exchange, and collision odds at 2^64 are negligible next
  to the pipeline's MinHash error budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from epstein_pipeline_spark.functions.grams import (
    GRAMS_COL,
    N_TOKENS_COL,
    with_gram_hashes,
)
from epstein_pipeline_spark.functions.text import normalize_text_expr


def _positions(corpus: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, n_tokens, gram, pos) — one row per gram occurrence (no
    de-duplication: within-doc repeats are occurrences too). Gram
    fingerprints are the token-fold longs of ``functions/grams.py``;
    a doc shorter than n tokens contributes its whole token span as
    the single gram at pos 1."""
    return (
        with_gram_hashes(corpus, text_col, n, with_pos=True)
        .select(
            F.col(id_col),
            F.col(N_TOKENS_COL).alias("n_tokens"),
            F.explode(GRAMS_COL).alias("g"),
        )
        .select(id_col, "n_tokens", F.col("g.gram").alias("gram"), F.col("g.pos").alias("pos"))
    )


def duplicated_grams(
    positions: DataFrame, id_col: str, min_count: int = 2
) -> DataFrame:
    """(gram, n_occurrences, canon_id, canon_pos) — grams occurring at
    least ``min_count`` times corpus-wide, with the canonical (kept)
    occurrence = min by (id, pos)."""
    return (
        positions.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min(F.struct(F.col(id_col), F.col("pos"))).alias("canon"),
        )
        .filter(F.col("n_occurrences") >= min_count)
        .select(
            "gram",
            "n_occurrences",
            F.col(f"canon.{id_col}").alias("canon_id"),
            F.col("canon.pos").alias("canon_pos"),
        )
    )


def repeated_span_stats(
    corpus: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    n: int = 50,
    min_count: int = 2,
    keep: str = "one",
    dup_grams_hint: int | None = None,
    broadcast_max_grams: int = 5_000_000,
) -> DataFrame:
    """(id, n_tokens, n_dup_positions, dup_tokens, dup_fraction,
    islands) — one row per doc that contains at least one stripped
    repeated-span occurrence. ``islands`` is the merged list of
    [start, end] 1-based token intervals to strip.

    ``keep='one'`` (Lee et al. policy) exempts each duplicated gram's
    canonical occurrence; ``keep='none'`` strips every occurrence.
    ``dup_grams_hint`` skips the eager broadcast-gate probe (pass a
    known bound to stay fully lazy); ``broadcast_max_grams=0`` forces
    the shuffled join."""
    if keep not in ("one", "none"):
        raise ValueError(f"keep must be 'one' or 'none', got {keep!r}")
    pos = _positions(corpus, id_col, text_col, n)
    dup = duplicated_grams(pos, id_col, min_count)
    if broadcast_max_grams > 0:
        n_dup = (
            dup_grams_hint
            if dup_grams_hint is not None
            else dup.agg(F.approx_count_distinct("gram").alias("n")).collect()[0]["n"]
        )
        if n_dup <= broadcast_max_grams:
            dup = F.broadcast(dup)
    hits = pos.join(dup, "gram")
    if keep == "one":
        hits = hits.filter(
            ~((F.col(id_col) == F.col("canon_id")) & (F.col("pos") == F.col("canon_pos")))
        )
    per_doc = hits.groupBy(id_col, "n_tokens").agg(
        F.count(F.lit(1)).alias("n_dup_positions"),
        F.sort_array(F.collect_list("pos")).alias("ps"),
    )
    nt = F.col("n_tokens")
    # Merge sorted gram-start positions into maximal token islands
    # [s, e] (gram i covers [i, min(i+n-1, n_tokens)]; adjacency
    # merges since coverage is contiguous either way). Single O(hits)
    # fold; cs/ce=0 means "no open island".
    empty = F.struct(
        F.expr("CAST(array() AS array<struct<s:int,e:int>>)").alias("isl"),
        F.lit(0).alias("cs"),
        F.lit(0).alias("ce"),
    )

    def step(acc, p):
        end = F.least(p + F.lit(n - 1), nt)
        extend = p <= acc["ce"] + F.lit(1)
        return F.struct(
            F.when(
                (acc["ce"] == 0) | extend, acc["isl"]
            ).otherwise(
                F.concat(
                    acc["isl"],
                    F.array(F.struct(acc["cs"].alias("s"), acc["ce"].alias("e"))),
                )
            ).alias("isl"),
            F.when((acc["ce"] == 0) | ~extend, p).otherwise(acc["cs"]).alias("cs"),
            F.greatest(
                F.when(extend, acc["ce"]).otherwise(F.lit(0)), end
            ).alias("ce"),
        )

    islands = F.aggregate(
        F.col("ps"),
        empty,
        step,
        lambda acc: F.when(acc["ce"] == 0, acc["isl"]).otherwise(
            F.concat(
                acc["isl"],
                F.array(F.struct(acc["cs"].alias("s"), acc["ce"].alias("e"))),
            )
        ),
    )
    dup_tokens = F.aggregate(
        F.col("islands"),
        F.lit(0),
        lambda a, i: a + i["e"] - i["s"] + F.lit(1),
    )
    return (
        per_doc.withColumn("islands", islands)
        .withColumn("dup_tokens", dup_tokens)
        .withColumn(
            "dup_fraction", F.round(F.col("dup_tokens") / nt.cast("double"), 4)
        )
        .select(
            id_col, "n_tokens", "n_dup_positions", "dup_tokens", "dup_fraction", "islands"
        )
    )


def strip_repeated_spans(
    corpus: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    n: int = 50,
    min_count: int = 2,
    keep: str = "one",
    dup_grams_hint: int | None = None,
    broadcast_max_grams: int = 5_000_000,
) -> DataFrame:
    """Corpus with each flagged doc's ``text_col`` rewritten to the
    NORMALIZED text minus the duplicated islands (Lee et al. operate
    on the tokenized stream, so the rewrite is token-joined; docs with
    no duplicated span keep their original bytes untouched), plus
    ``dup_tokens``/``dup_fraction`` columns (0 for clean docs). The
    join ships islands + ids only — untouched corpus text never
    shuffles when the stats side broadcasts."""
    stats = repeated_span_stats(
        corpus, id_col, text_col, n, min_count, keep, dup_grams_hint, broadcast_max_grams
    )
    side = stats.select(id_col, "islands", "dup_tokens", "dup_fraction")
    joined = corpus.join(side, id_col, "left")
    toks = F.split(normalize_text_expr(text_col), " ")
    isl = F.col("islands")
    kept = F.filter(
        F.transform(toks, lambda t, i: F.struct(t.alias("t"), (i + F.lit(1)).alias("p"))),
        lambda s: ~F.exists(
            isl, lambda iv: (s["p"] >= iv["s"]) & (s["p"] <= iv["e"])
        ),
    )
    new_text = F.when(isl.isNull(), F.col(text_col)).otherwise(
        F.concat_ws(" ", F.transform(kept, lambda s: s["t"]))
    )
    return (
        joined.withColumn(text_col, new_text)
        .withColumn("dup_tokens", F.coalesce("dup_tokens", F.lit(0)))
        .withColumn("dup_fraction", F.coalesce("dup_fraction", F.lit(0.0)))
        .drop("islands")
    )
