"""OCR fallback-chain selection semantics (reference ocr.py:789-827):
first candidate >= threshold wins in chain order; otherwise the best
non-empty candidate with EARLIEST-wins ties; empty text is skipped;
low-confidence flag and 1-indexed low-confidence page list."""

from __future__ import annotations

from pyspark.sql import functions as F

from epstein_pipeline_spark.operators.ocr_chain import (
    low_conf_pages_expr,
    select_ocr_result,
)

SCHEMA = (
    "id string, candidates array<struct<backend:string, text:string,"
    " confidence:double>>"
)


def _run(spark, rows, threshold=0.6):
    df = spark.createDataFrame(rows, SCHEMA)
    out = select_ocr_result(df, threshold=threshold)
    return {
        r["id"]: (
            r["ocr_backend"], r["ocr_text"], r["ocr_confidence"],
            r["low_confidence"],
        )
        for r in out.collect()
    }


def test_first_acceptable_wins_chain_order(spark):
    got = _run(
        spark,
        [(
            "d1",
            [
                ("fast", "low quality", 0.3),
                ("mid", "good text", 0.7),
                ("slow", "better text", 0.99),  # never reached
            ],
        )],
    )
    assert got["d1"] == ("mid", "good text", 0.7, False)


def test_below_threshold_falls_back_to_best(spark):
    got = _run(
        spark,
        [(
            "d2",
            [("a", "t1", 0.3), ("b", "t2", 0.5), ("c", "t3", 0.4)],
        )],
    )
    assert got["d2"] == ("b", "t2", 0.5, True)


def test_tie_goes_to_earliest_candidate(spark):
    # reference keeps the earlier result on equal confidence
    # (strict > comparison, ocr.py:806)
    got = _run(
        spark,
        [("d3", [("a", "t1", 0.5), ("b", "t2", 0.5)])],
    )
    assert got["d3"] == ("a", "t1", 0.5, True)


def test_empty_text_skipped_even_with_high_confidence(spark):
    got = _run(
        spark,
        [(
            "d4",
            [("a", "   ", 0.99), ("b", None, 0.98), ("c", "real", 0.2)],
        )],
    )
    assert got["d4"] == ("c", "real", 0.2, True)


def test_all_empty_yields_empty_text_null_confidence(spark):
    got = _run(spark, [("d5", [("a", "", 0.9), ("b", " ", 0.9)])])
    assert got["d5"] == (None, "", None, False)


def test_low_conf_pages_are_one_indexed(spark):
    df = spark.createDataFrame(
        [("d", [0.9, 0.4, 0.61, 0.1])], "id string, page_confs array<double>"
    )
    out = df.select(low_conf_pages_expr(F.col("page_confs"), 0.6).alias("p"))
    assert out.collect()[0]["p"] == [2, 4]


def test_null_confidence_candidate_never_beats_real_one(spark):
    """A non-empty candidate with NULL confidence must lose the
    best-candidate fallback to any real-confidence candidate (NULL
    comparison previously froze the accumulator on it)."""
    from epstein_pipeline_spark.operators.ocr_chain import select_ocr_result

    df = spark.createDataFrame(
        [("d1", [("b0", "texty", None), ("b1", "better", 0.5)])],
        "id string, cands array<struct<backend:string,text:string,confidence:double>>",
    )
    r = select_ocr_result(df, "cands", threshold=0.6).first()
    assert r["ocr_backend"] == "b1" and r["ocr_confidence"] == 0.5
    assert r["low_confidence"] is True


def test_chosen_null_confidence_is_flagged_low(spark):
    """Missing confidence counts as LOW: when every non-empty candidate
    reports NULL confidence the earliest one is chosen, ocr_confidence
    stays NULL and low_confidence fires (oracle-aligned, r3 advice)."""
    got = _run(
        spark,
        [("d1", [("b0", "", None), ("b1", "texty", None), ("b2", "later", None)])],
    )
    assert got["d1"] == ("b1", "texty", None, True)
