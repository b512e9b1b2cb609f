"""Incremental cross-corpus line dedup: persistent seen-line state in
the StageStore, batch-order keep-first semantics, crash-rerun
idempotency via snapshot time-travel, and state growth bounds."""

import pytest
from pyspark.sql import functions as F

from epstein_pipeline_spark.operators.line_dedup import (
    dedup_lines,
    dedup_lines_incremental,
)
from epstein_pipeline_spark.plans.checkpoint import StageStore

BLOCK = " ".join(f"b{k}" for k in range(10))


def _uniq(i: int, n: int = 10) -> str:
    return " ".join(f"d{i}t{j}" for j in range(n))


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def store(tmp_path):
    return StageStore(tmp_path / "store")


def test_cross_batch_removal_and_parity(spark, store):
    """Folding two id-ordered batches equals one-shot dedup_lines on
    the union (batch order == id order -> keep-first agrees)."""
    b1 = [(1, f"{BLOCK} {_uniq(1)}"), (2, _uniq(2, 20))]
    b2 = [(3, f"{BLOCK} {_uniq(3)}"), (4, f"{_uniq(2, 20)}")]  # doc4 dups doc2 entirely
    out1 = dedup_lines_incremental(store, _df(spark, b1), batch_id="b1").collect()
    out2 = dedup_lines_incremental(store, _df(spark, b2), batch_id="b2").collect()
    got = {r["doc_id"]: r for r in list(out1) + list(out2)}
    ref = {r["doc_id"]: r for r in dedup_lines(_df(spark, b1 + b2)).collect()}
    assert set(got) == set(ref)
    for k in ref:
        assert got[k]["cleaned_text"] == ref[k]["cleaned_text"], k
        assert got[k]["n_removed"] == ref[k]["n_removed"], k
    assert got[3]["n_removed"] == 1          # BLOCK seen in batch 1
    assert got[4]["cleaned_text"] == ""      # full dup of doc 2


def test_within_delta_keep_first(spark, store):
    rows = [(7, f"{BLOCK} {_uniq(7)}"), (8, f"{BLOCK} {_uniq(8)}")]
    out = {r["doc_id"]: r for r in dedup_lines_incremental(
        store, _df(spark, rows), batch_id="only"
    ).collect()}
    assert out[7]["n_removed"] == 0
    assert out[8]["n_removed"] == 1 and out[8]["cleaned_text"] == _uniq(8)


def test_state_grows_by_new_distinct_lines_only(spark, store):
    dedup_lines_incremental(store, _df(spark, [(1, f"{BLOCK} {_uniq(1)}")]), batch_id="a")
    n1 = store.latest("line_seen")["rows"]
    # second batch: one repeated line (BLOCK) + one new line
    dedup_lines_incremental(store, _df(spark, [(2, f"{BLOCK} {_uniq(2)}")]), batch_id="b")
    m = store.latest("line_seen")
    assert n1 == 2                       # BLOCK + uniq(1)
    assert m["rows"] == 3                # + uniq(2) only; BLOCK not re-added
    assert m["delta_rows"] == 1


def test_rerun_same_batch_is_idempotent(spark, store):
    """Crash-after-commit rerun: the same batch_id re-fold must return
    the SAME cleaned output (computed against the pre-batch state via
    time-travel), not wipe the delta against its own lines, and must
    not grow the state again."""
    rows = [(1, f"{BLOCK} {_uniq(1)}")]
    first = {r["doc_id"]: r for r in dedup_lines_incremental(
        store, _df(spark, rows), batch_id="x"
    ).collect()}
    m_before = store.latest("line_seen")
    again = {r["doc_id"]: r for r in dedup_lines_incremental(
        store, _df(spark, rows), batch_id="x"
    ).collect()}
    assert again == first
    assert again[1]["n_removed"] == 0 and again[1]["cleaned_text"] != ""
    assert store.latest("line_seen")["snapshot"] == m_before["snapshot"]


def test_forced_shuffle_seen_path_matches(spark, store, tmp_path):
    """broadcast_max=0 (huge-delta fallback) produces identical output."""
    b1 = [(1, f"{BLOCK} {_uniq(1)}")]
    b2 = [(2, f"{BLOCK} {_uniq(2)}"), (3, _uniq(3, 20))]
    dedup_lines_incremental(store, _df(spark, b1), batch_id="a")
    fast = {tuple(r) for r in dedup_lines_incremental(
        store, _df(spark, b2), batch_id="b"
    ).collect()}
    store2 = StageStore(tmp_path / "store2")
    dedup_lines_incremental(store2, _df(spark, b1), batch_id="a", broadcast_max=0)
    slow = {tuple(r) for r in dedup_lines_incremental(
        store2, _df(spark, b2), batch_id="b", broadcast_max=0
    ).collect()}
    assert fast == slow


def test_cli_incremental_two_batches(spark, store, tmp_path, capsys):
    """main.py dedup-lines --store: state persists across invocations;
    the second batch loses its cross-batch dup line."""
    import argparse
    import json

    import main as cli

    def run(rows, name):
        src = str(tmp_path / name)
        dst = str(tmp_path / f"{name}_out")
        _df(spark, rows).write.parquet(src)
        cli.cmd_dedup_lines(
            argparse.Namespace(
                input=src, output=dst, seg_tokens=10, id_col="doc_id",
                text_col="text", store=str(store.root), batch_id=name,
            )
        )
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    s1 = run([(1, f"{BLOCK} {_uniq(1)}")], "batch1")
    s2 = run([(2, f"{BLOCK} {_uniq(2)}")], "batch2")
    assert s1["lines_removed"] == 0
    assert s2["lines_removed"] == 1


def test_compact_preserves_seen_state(spark, store):
    """StageStore.compact on the append-chained line_seen stage must
    not change the seen-hash set (the next batch behaves identically)."""
    dedup_lines_incremental(store, _df(spark, [(1, f"{BLOCK} {_uniq(1)}")]), batch_id="a")
    dedup_lines_incremental(store, _df(spark, [(2, _uniq(2, 20))]), batch_id="b")
    before = {r["lh"] for r in store.read(spark, "line_seen").collect()}
    store.compact(spark, "line_seen")
    after = {r["lh"] for r in store.read(spark, "line_seen").collect()}
    assert after == before
    out = dedup_lines_incremental(
        store, _df(spark, [(3, f"{BLOCK} {_uniq(3)}")]), batch_id="c"
    ).collect()[0]
    assert out["n_removed"] == 1  # BLOCK still remembered post-compaction


def test_rerun_of_EARLIER_batch_detected(spark, store):
    """An orchestrator retry may re-submit any committed batch, not
    just the latest: the rerun must be detected from the whole
    metadata log and re-cleaned against THAT batch's pre-state —
    never treated as new input (which would see its own lines as
    'seen' and wipe every doc)."""
    a = [(1, f"{BLOCK} {_uniq(1)}")]
    first_a = {r["doc_id"]: r for r in dedup_lines_incremental(
        store, _df(spark, a), batch_id="a"
    ).collect()}
    dedup_lines_incremental(store, _df(spark, [(2, _uniq(2, 20))]), batch_id="b")
    m_before = store.latest("line_seen")
    again_a = {r["doc_id"]: r for r in dedup_lines_incremental(
        store, _df(spark, a), batch_id="a"
    ).collect()}
    assert again_a == first_a
    assert again_a[1]["cleaned_text"] != ""      # NOT wiped
    assert store.latest("line_seen") == m_before  # state untouched
