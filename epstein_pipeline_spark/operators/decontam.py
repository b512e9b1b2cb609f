"""Benchmark decontamination over a pages corpus — the n-gram-overlap
rule large-LM data curation applies before training: any training doc
sharing an n-token gram with an evaluation/benchmark item is flagged
and dropped.

The reference has no analog (its corpus is a closed document dump);
this is one of the training-data-pipeline extensions the engine ships
as a first-class stage. Semantics follow the published convention
(13-gram overlap in the GPT-3/PaLM data cards; the n is a parameter —
the synthetic web corpus's short pages test with n=8).

Scale shape (10^12 training pages, 10^5-10^6 benchmark items):
- Benchmark grams fingerprint to longs JVM-side (polynomial
  rolling-hash byte-span fingerprints with a murmur-style finalizer,
  ``functions/grams.py`` — no text leaves the benchmark scan) and are
  DISTINCT-ed — typically a few million longs, a broadcast-sized set.
- The corpus side explodes its own gram hashes map-side and
  broadcast-joins: corpus text never shuffles; the only wide exchange
  is the per-doc groupBy over HIT rows (overlap is rare, so this is
  tiny).
- The broadcast is GATED the same way as ``salted_block_join``'s
  size table: a known bound (``bench_grams_hint``, e.g. a committed
  manifest row count) skips the probe; otherwise one
  ``approx_count_distinct`` pass decides, and past the cap the join
  degrades to a shuffled semi-equi-join on the gram hash (AQE may
  still runtime-convert it).
- The final drop is a ``left_anti`` on the flagged-id set — at any
  scale the anti-join shuffles ids only, never text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from epstein_pipeline_spark.functions.grams import GRAMS_COL, with_gram_hashes


def benchmark_gram_hashes(
    bench: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """(gram: long) DISTINCT — the benchmark's n-gram fingerprint set
    (token-fold fingerprints per ``functions/grams.py``; a doc shorter
    than n tokens contributes its whole token span as one gram)."""
    return (
        with_gram_hashes(bench, text_col, n, distinct=True)
        .select(F.explode(GRAMS_COL).alias("gram"))
        .distinct()
    )


def flag_contaminated(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    n: int = 8,
    bench_grams_hint: int | None = None,
    broadcast_max_grams: int = 5_000_000,
) -> DataFrame:
    """(id, n_hits, n_grams) — one row per contaminated corpus doc.

    ``bench_grams_hint`` skips the eager gate probe (pass a committed
    row count or a known benchmark size bound to keep the call fully
    lazy); ``broadcast_max_grams=0`` forces the shuffled join."""
    grams = benchmark_gram_hashes(bench, text_col, n)
    if broadcast_max_grams > 0:
        n_grams = (
            bench_grams_hint
            if bench_grams_hint is not None
            else grams.agg(F.approx_count_distinct("gram").alias("n")).collect()[0]["n"]
        )
        if n_grams <= broadcast_max_grams:
            grams = F.broadcast(grams)
    corpus_grams = (
        with_gram_hashes(corpus, text_col, n, distinct=True)
        .select(
            F.col(id_col),
            F.size(GRAMS_COL).alias("n_grams"),
            F.explode(GRAMS_COL).alias("gram"),
        )
    )
    return (
        corpus_grams.join(grams, "gram")
        .groupBy(id_col, "n_grams")
        .agg(F.count(F.lit(1)).alias("n_hits"))  # grams pre-distinct per doc
        .select(id_col, "n_hits", "n_grams")
    )


def decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    n: int = 8,
    bench_grams_hint: int | None = None,
    broadcast_max_grams: int = 5_000_000,
) -> tuple[DataFrame, DataFrame]:
    """(clean_corpus, flagged) — corpus rows minus the contaminated
    set, plus the flagged report. The anti-join carries ids only."""
    flagged = flag_contaminated(
        corpus, bench, id_col, text_col, n, bench_grams_hint, broadcast_max_grams
    )
    clean = corpus.join(flagged.select(id_col), id_col, "left_anti")
    return clean, flagged
