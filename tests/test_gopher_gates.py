"""Gopher-rule quality gates: each gate exercised at its boundary on
hand-built docs (word count, mean word length, symbol ratio, alpha
fraction, stopword count)."""

from epstein_pipeline_spark.functions.text import gopher_gates

STOPS = "the be to of and that have with"  # all 8 gate stopwords


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in gopher_gates(df).collect()}


def _doc(n_words: int, *, prefix: str = STOPS, filler: str = "word") -> str:
    """`n_words` total words, opening with `prefix` then filler."""
    pre = prefix.split()
    return " ".join(pre + [filler] * (n_words - len(pre)))


def test_word_count_bounds(spark):
    out = _run(spark, [(1, _doc(49)), (2, _doc(50)), (3, _doc(120))])
    assert not out[1]["pass_word_count"]
    assert out[2]["pass_word_count"] and out[2]["n_words"] == 50
    assert out[3]["pass_all"]


def test_mean_word_length_bounds(spark):
    # 50 two-char words -> mean 2.0 < 3; long filler -> mean > 10
    out = _run(
        spark,
        [
            (1, _doc(50, filler="ab")),
            (2, _doc(50, filler="hendecasyllabically")),
            (3, _doc(50, filler="solid")),
        ],
    )
    assert not out[1]["pass_mean_word_len"] and out[1]["mean_word_len"] < 3
    assert not out[2]["pass_mean_word_len"] and out[2]["mean_word_len"] > 10
    assert out[3]["pass_mean_word_len"]


def test_symbol_ratio_gate(spark):
    # 8 stops + 42 filler; make 6/50 words symbolic (> 0.1)
    words = STOPS.split() + ["x#y"] * 6 + ["word"] * 36
    out = _run(spark, [(1, " ".join(words)), (2, _doc(50))])
    assert not out[1]["pass_symbol_ratio"]
    assert out[2]["pass_symbol_ratio"]


def test_alpha_words_gate(spark):
    # 11/50 pure-numeric words -> alpha_frac 0.78 < 0.8
    words = STOPS.split() + ["123"] * 11 + ["word"] * 31
    out = _run(spark, [(1, " ".join(words)), (2, _doc(50))])
    assert not out[1]["pass_alpha_words"]
    assert out[2]["pass_alpha_words"]


def test_stopword_gate(spark):
    out = _run(
        spark,
        [
            (1, _doc(50, prefix="the")),  # 1 distinct stopword
            (2, _doc(50, prefix="the the the")),  # still 1 distinct
            (3, _doc(50, prefix="the and")),  # 2 distinct -> pass
        ],
    )
    assert not out[1]["pass_stopwords"]
    assert not out[2]["pass_stopwords"]
    assert out[3]["pass_stopwords"]
