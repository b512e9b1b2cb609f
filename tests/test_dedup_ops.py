"""Operator-level dedup semantics, mirroring the reference's
tests/test_dedup.py: exact pair found, near-dup found, NO false
positive on unrelated docs, first-pass-wins merge."""

from pyspark.sql import functions as F

from epstein_pipeline_spark.config import DedupConfig
from epstein_pipeline_spark.operators.exact import exact_all_pairs, exact_pairs
from epstein_pipeline_spark.operators.lcs import lcs_rescue, py_lcs_dp, py_lcs_length
from epstein_pipeline_spark.operators.lsh import minhash_pass
from epstein_pipeline_spark.operators.pairs import canonicalize_pairs, union_first_wins
from epstein_pipeline_spark.operators.simhash_pass import simhash_pass

CFG = DedupConfig(band_bucket_cap=50)

LONG_A = " ".join(f"sentence {i} about the quarterly filing and related disclosures" for i in range(30))
LONG_B = LONG_A.replace("quarterly", "quartrly").replace("sentence 3 ", "sentnce 3 ")
UNRELATED = " ".join(f"totally different material {i*13} regarding maritime law precedents" for i in range(30))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_exact_pair_found_case_whitespace(spark):
    """Reference test_dedup.py:121-143: same normalized content pairs."""
    docs = _docs(spark, [("u1", "Some  Text HERE"), ("u2", "some text here"), ("u3", "other")])
    got = exact_all_pairs(docs).collect()
    assert [(r["url1"], r["url2"], r["score"]) for r in got] == [("u1", "u2", 1.0)]


def test_exact_star_pairs_equivalent_closure(spark):
    docs = _docs(spark, [(f"u{i}", "same content") for i in range(5)])
    star = exact_pairs(docs).collect()
    assert len(star) == 4  # n-1 star edges, same transitive closure as C(5,2)
    assert all(r["url1"] == "u0" for r in star)


def test_minhash_finds_near_duplicate(spark):
    docs = _docs(spark, [("a", LONG_A), ("b", LONG_B), ("c", UNRELATED)])
    got = minhash_pass(docs, CFG).collect()
    assert [(r["url1"], r["url2"]) for r in got] == [("a", "b")]
    assert got[0]["score"] >= CFG.jaccard_threshold


def test_no_false_positive_unrelated(spark):
    """Reference test_dedup.py:53-70: unrelated docs must not pair."""
    import numpy as np

    def rand_doc(i: int) -> str:
        rd = np.random.RandomState(1000 + i)
        return " ".join(
            "".join(chr(97 + c) for c in rd.randint(0, 26, 8)) for _ in range(120)
        )

    docs = _docs(spark, [(f"u{i}", rand_doc(i)) for i in range(10)])
    assert minhash_pass(docs, CFG).count() == 0
    assert simhash_pass(docs, CFG).count() == 0
    assert exact_all_pairs(docs).count() == 0


def test_simhash_finds_reordered(spark):
    sents = [f"clause {i} of the agreement covers topic {i*7%11}." for i in range(40)]
    a = " ".join(sents)
    reordered = sents[:]
    reordered[5], reordered[6] = reordered[6], reordered[5]
    b = " ".join(reordered)
    docs = _docs(spark, [("a", a), ("b", b)])
    got = simhash_pass(docs, CFG).collect()
    assert [(r["url1"], r["url2"]) for r in got] == [("a", "b")]


def test_first_pass_wins(spark):
    exact = spark.createDataFrame([("a", "b", 1.0, "exact")], "url1 string, url2 string, score double, method string")
    mh = spark.createDataFrame([("a", "b", 0.9, "minhash"), ("c", "d", 0.85, "minhash")], "url1 string, url2 string, score double, method string")
    merged = {(r["url1"], r["url2"]): r["method"] for r in union_first_wins(exact, mh).collect()}
    assert merged == {("a", "b"): "exact", ("c", "d"): "minhash"}


def test_unmapped_method_ranks_last(spark):
    """A method string absent from PASS_PRIORITY must LOSE ties, not
    null-sort first and silently outrank 'exact'."""
    exact = spark.createDataFrame(
        [("a", "b", 1.0, "exact")], "url1 string, url2 string, score double, method string"
    )
    mystery = spark.createDataFrame(
        [("a", "b", 1.0, "experimental")], "url1 string, url2 string, score double, method string"
    )
    merged = {(r["url1"], r["url2"]): r["method"] for r in union_first_wins(mystery, exact).collect()}
    assert merged == {("a", "b"): "exact"}


def test_canonicalize(spark):
    p = spark.createDataFrame([("z", "a", 0.9, "minhash"), ("a", "a", 1.0, "exact")], "url1 string, url2 string, score double, method string")
    got = canonicalize_pairs(p).collect()
    assert [(r["url1"], r["url2"]) for r in got] == [("a", "z")]


def test_lcs_matches_dp_oracle():
    import numpy as np

    rng = np.random.RandomState(5)
    alpha = "abcdef "
    for _ in range(20):
        s1 = "".join(alpha[i] for i in rng.randint(0, len(alpha), rng.randint(0, 60)))
        s2 = "".join(alpha[i] for i in rng.randint(0, len(alpha), rng.randint(0, 60)))
        assert py_lcs_length(s1, s2) == py_lcs_dp(s1, s2)


def test_lcs_rescues_boilerplate_wrapped(spark):
    body = LONG_A
    wrapped = "MENU home about contact\n\n" + body + "\n\nCopyright 2031 footer links"
    docs = _docs(spark, [("a", body), ("b", wrapped), ("c", UNRELATED)])
    gray = spark.createDataFrame(
        [("a", "b", 0.7), ("a", "c", 0.7)], "url1 string, url2 string, score double"
    )
    got = lcs_rescue(gray, docs, CFG).collect()
    assert [(r["url1"], r["url2"], r["method"]) for r in got] == [("a", "b", "lcs")]


def test_lcs_verify_suffix_array_kernel_parity(spark):
    """lcs_verify(kernel='suffix_array') — the literal north-rule
    stage-3 form — keeps exactly the same pairs with exactly the same
    ratios as the default rolling-hash kernel."""
    from epstein_pipeline_spark.operators.lcs import lcs_verify

    body = LONG_A
    wrapped = "MENU home about contact\n\n" + body + "\n\nCopyright 2031 footer links"
    docs = _docs(spark, [("a", body), ("b", wrapped), ("c", UNRELATED)])
    pairs = spark.createDataFrame(
        [("a", "b", 0.7, "gray"), ("a", "c", 0.7, "gray"), ("b", "c", 1.0, "exact")],
        "url1 string, url2 string, score double, method string",
    )
    rh = {(r["url1"], r["url2"]): r["lcs_ratio"] for r in lcs_verify(pairs, docs, CFG).collect()}
    sa = {
        (r["url1"], r["url2"]): r["lcs_ratio"]
        for r in lcs_verify(pairs, docs, CFG, kernel="suffix_array").collect()
    }
    assert rh == sa and ("a", "b") in rh and ("a", "c") not in rh


def test_lcs_ratio_bounded_for_multibyte_text(spark):
    """Kernels measure LCS in UTF-8 bytes; the ratio denominator must
    too — a shared accented prefix must never yield lcs_ratio > 1."""
    from epstein_pipeline_spark.operators.lcs import lcs_verify

    shared = "é" * 80
    docs = _docs(spark, [("a", shared + " fin une"), ("b", shared + " autre queue")])
    pairs = spark.createDataFrame(
        [("a", "b", 0.7, "gray")], "url1 string, url2 string, score double, method string"
    )
    got = lcs_verify(pairs, docs, CFG).collect()
    assert got and 0.0 < got[0]["lcs_ratio"] <= 1.0
