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


def _exchange_sections(df, spark):
    """(kind, input-line) for every Exchange in the formatted plan."""
    qe = df._jdf.queryExecution()
    s = qe.explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    out = []
    for sec in s.split("\n\n"):
        lines = sec.strip().splitlines()
        if lines and "Exchange" in lines[0]:
            kind = "broadcast" if "BroadcastExchange" in lines[0] else "shuffle"
            inp = next((ln for ln in lines if ln.startswith("Input")), "")
            out.append((kind, inp))
    return out


def test_plan_shuffles_carry_no_text(spark):
    """The scale contract, pinned on per-Exchange Input columns from
    the formatted plan: on the broadcast path (hint supplied) document
    text/toks cross ZERO exchanges — every ShuffleExchange moves only
    hashes / ids / index aggregation buffers, and the removed side is
    a BroadcastExchange."""
    rows = [(i, _uniq(i, 35)) for i in range(8)]
    sections = _exchange_sections(
        dedup_lines(_df(spark, rows), removed_docs_hint=10), spark
    )
    assert any(k == "broadcast" for k, _ in sections)
    for kind, inp in sections:
        assert "text" not in inp and "toks" not in inp, (kind, inp)


def test_forced_shuffle_fallback_matches_broadcast_path(spark):
    """broadcast_max_docs=0 (the too-many-removed-docs fallback) must
    produce identical results through the shuffled join, with no
    BroadcastExchange for the removed side."""
    rows = [(i, f"{BLOCK} {_uniq(i)}") for i in (1, 2, 3)] + [(4, _uniq(4, 20))]
    df = _df(spark, rows)
    fast_df = dedup_lines(df, removed_docs_hint=10)
    fast = {tuple(r) for r in fast_df.collect()}
    slow_df = dedup_lines(df, broadcast_max_docs=0)
    assert {tuple(r) for r in slow_df.collect()} == fast
    # the gate's contract is the explicit hint (AQE may still choose a
    # broadcast at this toy scale from real size stats — that's fine)
    assert "ResolvedHint" not in slow_df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" in fast_df._jdf.queryExecution().analyzed().toString()


def test_cli_dedup_lines_roundtrip(spark, tmp_path, capsys):
    """main.py dedup-lines: cleaned corpus written + one-line JSON
    stats (in-process; getOrCreate reuses the test session)."""
    import argparse
    import json

    import main as cli

    rows = [(f"u{i}", f"{BLOCK} {_uniq(i)}") for i in (1, 2, 3)]
    src = str(tmp_path / "pages")
    dst = str(tmp_path / "clean")
    spark.createDataFrame(rows, "url string, text string").write.parquet(src)
    cli.cmd_dedup_lines(
        argparse.Namespace(
            input=src, output=dst, seg_tokens=10, id_col="url", text_col="text",
            store=None, batch_id=None,
        )
    )
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["docs"] == 3 and stats["docs_cleaned"] == 2
    assert stats["lines_removed"] == 2
    out = {r["url"]: r for r in spark.read.parquet(dst).collect()}
    assert out["u2"]["cleaned_text"] == _uniq(2)
