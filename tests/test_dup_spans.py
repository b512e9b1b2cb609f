"""Repeated-span (ExactSubstr) dedup: planted cross-doc spans, the
keep-one canonical policy, interval merging, strip rewrite, and the
broadcast gate."""

from pyspark.sql import functions as F

from epstein_pipeline_spark.operators.dup_spans import (
    repeated_span_stats,
    strip_repeated_spans,
)

SPAN = "alpha bravo charlie delta echo foxtrot".split()  # 6 tokens


def _doc(i: int, length: int = 12, plant: int | None = None) -> tuple[str, str]:
    """A doc of globally-unique tokens; ``plant`` splices the 6-token
    SPAN at that 0-based token offset."""
    toks = [f"d{i}t{j}" for j in range(length)]
    if plant is not None:
        toks[plant : plant + len(SPAN)] = SPAN
    return (f"d{i:02d}", " ".join(toks))


def test_keep_one_strips_all_but_canonical(spark):
    """SPAN in three docs: the (id, pos)-min occurrence survives, the
    other two are flagged with exactly the 6 span tokens covered."""
    corpus = spark.createDataFrame(
        [_doc(0, plant=2), _doc(1, plant=5), _doc(2, plant=0), _doc(3)],
        "url string, text string",
    )
    stats = repeated_span_stats(corpus, n=6).collect()
    got = {r["url"]: r for r in stats}
    # canonical = min (id, pos) = d00 (its single span gram at pos 3)
    assert set(got) == {"d01", "d02"}
    for r in got.values():
        assert r["dup_tokens"] == 6
        assert len(r["islands"]) == 1
    assert got["d01"]["islands"][0].asDict() == {"s": 6, "e": 11}
    assert got["d02"]["islands"][0].asDict() == {"s": 1, "e": 6}


def test_keep_none_strips_every_occurrence(spark):
    corpus = spark.createDataFrame(
        [_doc(0, plant=2), _doc(1, plant=5), _doc(3)], "url string, text string"
    )
    stats = repeated_span_stats(corpus, n=6, keep="none").collect()
    assert sorted(r["url"] for r in stats) == ["d00", "d01"]


def test_long_span_merges_into_one_island(spark):
    """A 10-token repeated span with n=6 yields 5 overlapping gram
    hits that must merge into a single [s, s+9] island, not 5."""
    long_span = [f"s{k}" for k in range(10)]
    rows = []
    for i in (0, 1):
        toks = [f"d{i}u{j}" for j in range(20)]
        toks[4:14] = long_span
        rows.append((f"d{i}", " ".join(toks)))
    corpus = spark.createDataFrame(rows, "url string, text string")
    stats = repeated_span_stats(corpus, n=6).collect()
    assert len(stats) == 1  # d0 canonical, d1 stripped
    (r,) = stats
    assert r["url"] == "d1"
    assert [iv.asDict() for iv in r["islands"]] == [{"s": 5, "e": 14}]
    assert r["dup_tokens"] == 10


def test_two_separate_spans_two_islands(spark):
    a = "one two three four five six".split()
    b = "red orange yellow green blue indigo".split()
    rows = []
    for i in (0, 1):
        toks = [f"d{i}u{j}" for j in range(20)]
        toks[0:6] = a
        toks[13:19] = b
        rows.append((f"d{i}", " ".join(toks)))
    corpus = spark.createDataFrame(rows, "url string, text string")
    (r,) = repeated_span_stats(corpus, n=6).collect()
    assert r["url"] == "d1"
    assert [iv.asDict() for iv in r["islands"]] == [
        {"s": 1, "e": 6},
        {"s": 14, "e": 19},
    ]
    assert r["dup_tokens"] == 12


def test_short_doc_whole_span_gram_clamps_island(spark):
    """Two identical 4-token docs with n=6: the whole-span gram's
    island must clamp at n_tokens, not run to pos+n-1."""
    corpus = spark.createDataFrame(
        [("a", "tiny little doc here"), ("b", "tiny little doc here"), ("c", "unrelated text entirely different")],
        "url string, text string",
    )
    (r,) = repeated_span_stats(corpus, n=6).collect()
    assert r["url"] == "b"  # 'a' is canonical
    assert r["islands"][0].asDict() == {"s": 1, "e": 4}
    assert r["dup_tokens"] == 4 and r["dup_fraction"] == 1.0


def test_within_doc_repeat_counts(spark):
    """The SPAN twice inside ONE doc: second occurrence stripped."""
    toks = [f"u{j}" for j in range(20)]
    toks[0:6] = SPAN
    toks[10:16] = SPAN
    corpus = spark.createDataFrame(
        [("solo", " ".join(toks)), ("other", "completely different words here now")],
        "url string, text string",
    )
    (r,) = repeated_span_stats(corpus, n=6).collect()
    assert r["url"] == "solo"
    assert [iv.asDict() for iv in r["islands"]] == [{"s": 11, "e": 16}]


def test_strip_rewrites_only_flagged_docs(spark):
    corpus = spark.createDataFrame(
        [_doc(0, plant=2), _doc(1, plant=5), _doc(3)], "url string, text string"
    )
    out = {r["url"]: r for r in strip_repeated_spans(corpus, n=6).collect()}
    assert len(out) == 3
    # d00 canonical + d03 clean: original bytes untouched
    assert out["d00"]["text"] == _doc(0, plant=2)[1]
    assert out["d03"]["text"] == _doc(3)[1]
    assert out["d03"]["dup_tokens"] == 0 and out["d03"]["dup_fraction"] == 0.0
    # d01: span tokens removed, unique tokens kept in order
    assert out["d01"]["text"].split() == [f"d1t{j}" for j in (0, 1, 2, 3, 4, 11)]
    assert out["d01"]["dup_tokens"] == 6


def test_broadcast_gate_and_parity(spark):
    corpus = spark.createDataFrame(
        [_doc(0, plant=2), _doc(1, plant=5), _doc(2, plant=0), _doc(3)],
        "url string, text string",
    )
    on = repeated_span_stats(corpus, n=6, dup_grams_hint=1)
    assert "BroadcastExchange" in on._jdf.queryExecution().executedPlan().toString()
    off = repeated_span_stats(corpus, n=6, broadcast_max_grams=0)
    assert (
        "BroadcastExchange"
        not in off._jdf.queryExecution().executedPlan().toString()
    )
    key = lambda r: (r["url"], r["dup_tokens"], [iv.asDict() for iv in r["islands"]])
    assert sorted(map(key, on.collect())) == sorted(map(key, off.collect()))


def test_min_count_threshold(spark):
    """min_count=3: a span occurring twice is below threshold."""
    corpus = spark.createDataFrame(
        [_doc(0, plant=2), _doc(1, plant=5), _doc(3)], "url string, text string"
    )
    assert repeated_span_stats(corpus, n=6, min_count=3).count() == 0
    corpus3 = spark.createDataFrame(
        [_doc(0, plant=2), _doc(1, plant=5), _doc(2, plant=0)],
        "url string, text string",
    )
    assert repeated_span_stats(corpus3, n=6, min_count=3).count() == 2
