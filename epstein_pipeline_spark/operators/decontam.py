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
- Benchmark grams hash to a long via ``xxhash64`` JVM-side (no text
  leaves the benchmark scan) and are DISTINCT-ed — typically a few
  million longs, a broadcast-sized set.
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

from epstein_pipeline_spark.functions.text import normalize_text_expr


def _gram_hashes(text_col: str, n: int) -> F.Column:
    """array<long>: xxhash64 of each n-token gram of the normalized
    text (a doc shorter than n tokens contributes its whole token
    span as one gram, mirroring the oracle-checked entry query).

    Formulation note (performance contract): the grams are built by
    zipping ``n`` shifted slices of the token array and hashing the
    zipped structs, so the ``transform`` lambda references ONLY its
    own argument. The obvious alternative — ``transform(sequence(...),
    i -> hash(slice(toks, i, n)))`` — embeds ``toks`` in the lambda
    body, and Catalyst's alias substitution (CollapseProject, and
    unconditionally the ``size(..) > 0`` filter InferFiltersFromGenerate
    plants below the explode) inlines ``split(normalize(text))`` there,
    which is then re-evaluated PER GRAM ELEMENT: O(tokens) regex work ×
    O(tokens) grams = a quadratic blowup per doc, observed as minutes
    on a 1 MB corpus. The zip form costs O(n·tokens) per row even when
    fully inlined."""
    toks = F.split(normalize_text_expr(text_col), " ")
    n_grams = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    # k-th shifted slice (k=0..n-1): token k+i of gram i; all slices
    # share length n_grams, arrays_zip null-pads short docs and
    # concat_ws skips nulls -> the whole-span gram falls out for free
    zipped = F.arrays_zip(
        *[F.slice(toks, k + 1, n_grams).alias(f"t{k}") for k in range(n)]
    )
    return F.array_distinct(
        F.transform(
            zipped,
            lambda s: F.xxhash64(F.concat_ws(" ", *[s[f"t{k}"] for k in range(n)])),
        )
    )


def benchmark_gram_hashes(
    bench: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """(gram: long) DISTINCT — the benchmark's n-gram fingerprint set."""
    return (
        bench.select(F.explode(_gram_hashes(text_col, n)).alias("gram")).distinct()
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
        corpus.withColumn("__grams", _gram_hashes(text_col, n))
        .select(
            F.col(id_col),
            F.size("__grams").alias("n_grams"),
            F.explode("__grams").alias("gram"),
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
