"""P9 entity extractors, J6 fixed-weight Fellegi-Sunter resolution,
A12 temporal-event dedup."""

import duckdb
import pytest
from pyspark.sql import functions as F

from epstein_pipeline_spark.operators.entities import ENTITY_PATTERNS, extract_entities
from epstein_pipeline_spark.operators.resolution import (
    py_jaro_winkler,
    resolve_persons,
    score_person_pairs,
)
from epstein_pipeline_spark.operators.temporal import dedup_events


def test_entity_extract_fixtures(spark):
    """Hand-labeled fixture: each extractor fires on its planted
    mention and nowhere else (reference entities.py:34-63)."""
    docs = spark.createDataFrame(
        [
            (1, "Call (212) 555-0187 or +1 646.555.0123 today."),
            (2, "Mail alice.b+legal@law-firm.example.org please."),
            (3, "Debit account #123456 and acct: 99887."),
            (4, "He lived at 457 Madison Avenue until 2002."),
            (5, "See Case No. 18-CV-00412 and Docket 9:19-B."),
            (6, "Tail N908JE departed; Flight #207 followed."),
            (7, "Paid $1,250,000.00 plus 500 dollars in cash."),
            (8, "Nothing to extract here at all."),
        ],
        "doc_id long, text string",
    )
    got = {}
    for r in extract_entities(docs).collect():
        got.setdefault(r["doc_id"], []).append((r["entity_type"], r["value"]))
    # reference-faithful quirks: \b can't sit between ' ' and '(' so
    # the leading paren / '+' fall outside the match — the reference's
    # own finditer returns exactly these (verified against Python re)
    assert ("PHONE", "212) 555-0187") in got[1]
    assert ("PHONE", "1 646.555.0123") in got[1]
    assert ("EMAIL_ADDR", "alice.b+legal@law-firm.example.org") in got[2]
    assert ("ACCOUNT", "account #123456") in got[3]
    assert ("ACCOUNT", "acct: 99887") in got[3]
    assert ("ADDRESS", "457 Madison Avenue") in got[4]
    assert any(t == "CASE_NUMBER" and v.startswith("Case No. 18-CV-00412") for t, v in got[5])
    assert ("FLIGHT_ID", "N908JE") in got[6]
    assert ("FLIGHT_ID", "Flight #207") in got[6]
    assert ("FINANCIAL_AMOUNT", "$1,250,000.00") in got[7]
    assert ("FINANCIAL_AMOUNT", "500 dollars") in got[7]
    assert 8 not in got


def test_entity_patterns_java_re2_agree(spark):
    """The seven patterns must return IDENTICAL match lists under Java
    regex (Spark) and RE2 (DuckDB) on adversarial text."""
    texts = [
        "Case No. 2015-CV-123. Wired $20,500.00 from account #15042",
        "agent7@mail.example.com met at 44 Cedar Lane after Flight N101JE",
        "No. 123-456: call (305) 555-0100 or 305.555.0100, 1,000 USD",
        "edge: N1A Flt 9 a/c 12345 Cause #  7/A: B 99 Pl",
    ]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    spark_rows = sorted(
        (r["doc_id"], r["entity_type"], r["value"]) for r in extract_entities(docs).collect()
    )
    con = duckdb.connect()
    duck_rows = []
    for i, t in enumerate(texts):
        for etype, pat in ENTITY_PATTERNS.items():
            for v in con.execute("SELECT regexp_extract_all(?, ?)", [t, pat]).fetchone()[0]:
                duck_rows.append((i, etype, v))
    assert spark_rows == sorted(duck_rows)


def test_jaro_winkler_matches_duckdb():
    import random

    con = duckdb.connect()
    rng = random.Random(5)
    cases = [("martha", "marhta"), ("dwayne", "duane"), ("", ""), ("a", ""), ("x", "x")]
    cases += [
        (
            "".join(rng.choice("abcdef gh") for _ in range(rng.randint(0, 12))),
            "".join(rng.choice("abcdef gh") for _ in range(rng.randint(0, 12))),
        )
        for _ in range(400)
    ]
    for a, b in cases:
        d = con.execute("SELECT jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
        assert abs(py_jaro_winkler(a, b) - d) < 1e-9, (a, b)


@pytest.fixture(scope="module")
def persons(spark):
    rows = [
        # planted alias cluster: first-name typos of the same person —
        # reference blocking is name_lower/last_name (entity_resolution
        # .py:189-192), so the shared last name is what makes the typo
        # variants candidates (a last-name typo would never block)
        (1, "jeffrey edwards", "jeffrey", "edwards", "j. edwards", "legal"),
        (2, "jeffery edwards", "jeffery", "edwards", "j. edwards", "legal"),
        (3, "jefrey edwards", "jefrey", "edwards", "j. edwards", "legal"),
        # distinct person sharing the last-name block
        (4, "martin edwards", "martin", "edwards", "m. edwards", "media"),
        # unrelated
        (5, "maria gonzalez", "maria", "gonzalez", "m. gonzalez", "legal"),
    ]
    return spark.createDataFrame(
        rows, "pid long, name string, first_name string, last_name string, aliases string, category string"
    )


def test_fs_scoring_planted_aliases(spark, persons):
    pairs = {(r["pid1"], r["pid2"]): r["match_probability"] for r in score_person_pairs(persons).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.85
    assert (1, 3) in pairs and pairs[(1, 3)] >= 0.85
    assert (1, 4) not in pairs  # same last name, different person
    assert not any(5 in p for p in pairs)


def test_resolution_clusters(spark, persons):
    labels = {r["pid"]: r["canonical_id"] for r in resolve_persons(persons).collect()}
    assert labels["1"] == labels["2"] == labels["3"] == "1"
    assert labels["4"] == "4" and labels["5"] == "5"


def test_temporal_dedup_gate(spark):
    """>80% overlap + same (date, type): higher confidence wins, ties
    break to the lower id; 0.8 exactly is NOT a dup; different date or
    type never dedups (temporal_extractor.py:282-323)."""
    rows = [
        # group A: identical desc -> overlap 1.0; e2 has higher conf
        (1, "2002-11-01", "flight", "depart teterboro to palm beach", 0.6),
        (2, "2002-11-01", "flight", "depart teterboro to palm beach", 0.9),
        # exactly 0.8 overlap (4 of 5 words) -> NOT dropped
        (3, "2002-11-01", "flight", "depart teterboro to palm springs", 0.1),
        # same desc as 1/2 but different date -> kept
        (4, "2002-11-02", "flight", "depart teterboro to palm beach", 0.1),
        # same desc, different type -> kept
        (5, "2002-11-01", "meeting", "depart teterboro to palm beach", 0.1),
        # tie confidence with 2? no — tie with 6/7: equal conf, lower id wins
        (6, "2003-01-01", "deposition", "witness statement under oath", 0.5),
        (7, "2003-01-01", "deposition", "witness statement under oath", 0.5),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, date string, event_type string, description string, confidence double"
    )
    kept = {r["event_id"] for r in dedup_events(ev).collect()}
    assert kept == {2, 3, 4, 5, 6}


def test_temporal_dedup_chain_matches_reference_greedy(spark):
    """Chain A~B~C (A!~C) with descending confidence: the reference
    greedy compares against KEPT events only, so C survives (B was
    replaced by A before C arrives) — a 'dominated by anyone in the
    group' rule would wrongly drop C too."""
    w = [f"w{i}" for i in range(10)]
    a = " ".join(w)                      # w0..w9
    b = " ".join(w[:9] + ["x"])          # overlap with a: 9/10 = 0.9
    c = " ".join(w[:8] + ["x", "y"])     # with b: 9/10 = 0.9; with a: 8/10 = 0.8
    ev = spark.createDataFrame(
        [(1, "2001-01-01", "t", a, 0.9), (2, "2001-01-01", "t", b, 0.5),
         (3, "2001-01-01", "t", c, 0.1)],
        "event_id long, date string, event_type string, description string, confidence double",
    )
    kept = {r["event_id"] for r in dedup_events(ev).collect()}
    assert kept == {1, 3}
