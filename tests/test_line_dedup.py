"""Cross-corpus line dedup (C4/CCNet rule): keep-first semantics,
within-doc repeats, full-doc wipeout, short tail segments, and the
no-text-in-shuffle plan shape."""

from pyspark.sql import functions as F

from epstein_pipeline_spark.operators.line_dedup import dedup_lines

BLOCK = " ".join(f"b{k}" for k in range(10))  # one shared 10-token line


def _uniq(i: int, n: int = 10) -> str:
    return " ".join(f"d{i}t{j}" for j in range(n))


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_keep_first_occurrence_across_docs(spark):
    """BLOCK opens docs 1..3: doc 1 (min doc_id) keeps it, docs 2-3
    lose exactly that line and keep their unique tails."""
    rows = [(i, f"{BLOCK} {_uniq(i)}") for i in (1, 2, 3)] + [(4, _uniq(4, 20))]
    out = {r["doc_id"]: r for r in dedup_lines(_df(spark, rows)).collect()}
    assert out[1]["n_removed"] == 0 and out[1]["cleaned_text"] == f"{BLOCK} {_uniq(1)}"
    for i in (2, 3):
        assert out[i]["n_removed"] == 1
        assert out[i]["cleaned_text"] == _uniq(i)
    assert out[4]["n_removed"] == 0 and out[4]["n_lines"] == 2


def test_within_doc_repeat_is_removed(spark):
    rows = [(1, f"{BLOCK} {BLOCK} {_uniq(1)}")]
    r = dedup_lines(_df(spark, rows)).collect()[0]
    assert r["n_lines"] == 3 and r["n_removed"] == 1
    assert r["cleaned_text"] == f"{BLOCK} {_uniq(1)}"


def test_exact_dup_doc_wipes_to_empty(spark):
    rows = [(1, f"{BLOCK} {_uniq(9)}"), (2, f"{BLOCK} {_uniq(9)}")]
    out = {r["doc_id"]: r for r in dedup_lines(_df(spark, rows)).collect()}
    assert out[1]["n_removed"] == 0
    assert out[2]["n_removed"] == 2 and out[2]["cleaned_text"] == ""


def test_no_dups_roundtrips_normalized_text(spark):
    rows = [(i, _uniq(i, 23)) for i in range(5)]
    for r in dedup_lines(_df(spark, rows)).collect():
        assert r["n_removed"] == 0
        assert r["n_lines"] == 3  # 23 tokens -> 10+10+3
        assert r["cleaned_text"] == _uniq(r["doc_id"], 23)


def test_short_tail_segment_participates(spark):
    """A repeated SHORT tail line (3 tokens) dedups like any other."""
    tail = "x y z"
    rows = [(1, f"{_uniq(1)} {tail}"), (2, f"{_uniq(2)} {tail}")]
    out = {r["doc_id"]: r for r in dedup_lines(_df(spark, rows)).collect()}
    assert out[1]["n_removed"] == 0
    assert out[2]["n_removed"] == 1 and out[2]["cleaned_text"] == _uniq(2)


def test_plan_shuffles_carry_no_text(spark):
    """The scale contract: every Exchange in the physical plan moves
    hashes/ids/index arrays — never toks or cleaned/document text."""
    rows = [(i, _uniq(i, 35)) for i in range(8)]
    plan = dedup_lines(_df(spark, rows))._jdf.queryExecution().executedPlan().toString()
    for frag in plan.split("Exchange")[1:]:
        header = frag.split("\n", 1)[0]
        assert "toks" not in header and "text" not in header, header
