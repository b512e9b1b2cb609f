"""Benchmark decontamination operator: planted-overlap flagging, the
clean/flagged partition contract, and the broadcast gate."""

from pyspark.sql import functions as F

from epstein_pipeline_spark.operators.decontam import (
    benchmark_gram_hashes,
    decontaminate,
    flag_contaminated,
)

PHRASE = "alpha bravo charlie delta echo foxtrot golf hotel".split()  # 8 tokens


def _corpus(spark, n=30, quote=()):
    """Docs of 14 globally-unique tokens; docs in ``quote`` carry the
    8-token PHRASE spliced at a doc-dependent offset."""
    rows = []
    for i in range(n):
        toks = [f"t{i}x{j}" for j in range(14)]
        if i in quote:
            off = i % 6
            toks[off : off + 8] = PHRASE
        rows.append((f"d{i:03d}", " ".join(toks)))
    return spark.createDataFrame(rows, "url string, text string")


def test_flags_exactly_the_planted_overlaps(spark):
    corpus = _corpus(spark, quote={3, 7, 15})
    bench = spark.createDataFrame(
        [("b0", " ".join(PHRASE)), ("b1", "wholly unrelated benchmark item text")],
        "bench_id string, text string",
    )
    flagged = flag_contaminated(corpus, bench, n=8).collect()
    got = sorted(r["url"] for r in flagged)
    assert got == ["d003", "d007", "d015"]
    for r in flagged:
        assert 1 <= r["n_hits"] <= r["n_grams"]


def test_clean_plus_flagged_partitions_corpus(spark):
    corpus = _corpus(spark, quote={0, 12, 24})
    bench = spark.createDataFrame(
        [("b0", " ".join(PHRASE))], "bench_id string, text string"
    )
    clean, flagged = decontaminate(corpus, bench, n=8)
    ids_clean = {r["url"] for r in clean.collect()}
    ids_flagged = {r["url"] for r in flagged.collect()}
    assert ids_clean | ids_flagged == {f"d{i:03d}" for i in range(30)}
    assert not (ids_clean & ids_flagged)
    assert ids_flagged == {"d000", "d012", "d024"}


def test_no_overlap_flags_nothing(spark):
    corpus = _corpus(spark)
    bench = spark.createDataFrame(
        [("b0", "totally disjoint benchmark text with no shared grams here at all")],
        "bench_id string, text string",
    )
    clean, flagged = decontaminate(corpus, bench, n=8)
    assert flagged.count() == 0 and clean.count() == 30


def test_short_doc_whole_span_gram(spark):
    """Docs/bench items shorter than n tokens contribute their whole
    token span as one gram — an exact short-quote still matches."""
    corpus = spark.createDataFrame(
        [("a", "tiny quote here"), ("b", "something else entirely")],
        "url string, text string",
    )
    bench = spark.createDataFrame([("b0", "tiny quote here")], "bench_id string, text string")
    flagged = flag_contaminated(corpus, bench, n=8).collect()
    assert [r["url"] for r in flagged] == ["a"]


def test_broadcast_gate(spark):
    """Small benchmark -> gram set broadcast; forced-off gate -> no
    BroadcastExchange on the gram join (the web-scale fallback)."""
    corpus = _corpus(spark)
    bench = spark.createDataFrame(
        [("b0", " ".join(PHRASE))], "bench_id string, text string"
    )
    on = flag_contaminated(corpus, bench, n=8, bench_grams_hint=1)
    assert "BroadcastExchange" in on._jdf.queryExecution().executedPlan().toString()
    off = flag_contaminated(corpus, bench, n=8, broadcast_max_grams=0)
    plan_off = off._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in plan_off
    # both paths agree
    assert sorted(r["url"] for r in on.collect()) == sorted(
        r["url"] for r in off.collect()
    )


def test_benchmark_gram_hashes_distinct(spark):
    bench = spark.createDataFrame(
        [("b0", " ".join(PHRASE) + " extra"), ("b1", " ".join(PHRASE) + " extra")],
        "bench_id string, text string",
    )
    # identical items -> identical grams, distinct-ed once: 2 grams of 8
    assert benchmark_gram_hashes(bench, n=8).count() == 2
