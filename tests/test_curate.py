"""Curation composition (plans/curate.py): every drop stage exercised
on hand-built docs, stage ordering contracts, stats aggregation, and
the CLI surface."""

from pyspark.sql import functions as F

from epstein_pipeline_spark.plans.curate import curate_corpus, curation_stats

STOPS = "the be to of and that have with"
BLOCK = " ".join(f"b{k}" for k in range(10))


def _good(i: int, n: int = 60) -> str:
    """A doc passing every Gopher gate: 8 stopwords + unique filler."""
    return " ".join(STOPS.split() + [f"u{i}w{j}" for j in range(n - 8)])


def _df(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_every_drop_stage_fires(spark):
    rows = [
        ("u1", _good(1)),                       # kept
        ("u2", "too short"),                    # gopher (word count)
        ("u3", f"{STOPS} {BLOCK} " + " ".join(["wxyz"] * 40)),  # line owner, kept
        ("u4", f"{STOPS} {BLOCK} " + " ".join(["wxyz"] * 40)),  # exact dup of u3 post-clean
        ("u5", _good(5)),                       # kept
    ]
    audit = curate_corpus(_df(spark, rows))
    got = {r["url"]: r.asDict() for r in audit.collect()}
    assert len(got) == 5
    assert got["u2"]["drop_stage"] == "gopher"
    assert got["u1"]["drop_stage"] is None and got["u5"]["drop_stage"] is None
    # u3/u4: identical docs -> u3 keeps BLOCK + its x-line ownership;
    # u4 loses every line to u3 -> wiped empty -> line_wipe
    assert got["u3"]["drop_stage"] is None
    assert got["u4"]["drop_stage"] == "line_wipe"
    assert got["u4"]["text"] == ""


def test_exact_dup_after_pii_convergence(spark):
    """The case the post-mask exact pass exists for: mirror pages that
    differ ONLY in injected PII tokens (session emails) — every line
    is globally unique pre-mask (line dedup removes nothing), but the
    docs converge to identical text after masking. Min-id copy kept,
    the other tagged exact_dup."""

    def mirror(tag: str) -> str:
        # EVERY 10-token line carries a doc-distinct email in slot 9,
        # so no line repeats anywhere pre-mask; line 0 packs the 8
        # stopwords the Gopher gate wants. 60 words total.
        toks = STOPS.split() + ["w0", f"{tag}.0@ex.com"]
        for ln in range(1, 6):
            toks += [f"w{ln}c{j}" for j in range(9)] + [f"{tag}.{ln}@ex.com"]
        return " ".join(toks)

    audit = curate_corpus(_df(spark, [("u1", mirror("alice")), ("u2", mirror("bob"))]))
    got = {r["url"]: r.asDict() for r in audit.collect()}
    assert got["u1"]["drop_stage"] is None
    assert got["u1"]["lines_removed"] == 0 and got["u2"]["lines_removed"] == 0
    assert got["u2"]["drop_stage"] == "exact_dup"
    assert got["u1"]["n_email_address"] == 6


def test_gopher_rejects_do_not_own_lines(spark):
    """Ordering contract: a quality-rejected doc must NOT claim
    keep-first ownership of a line a surviving doc also has."""
    rows = [
        ("u1", f"{BLOCK} junk"),          # fails word count, contains BLOCK
        ("u2", f"{_good(2)} {BLOCK}"),    # survivor with the same line
    ]
    audit = curate_corpus(_df(spark, rows))
    got = {r["url"]: r.asDict() for r in audit.collect()}
    assert got["u1"]["drop_stage"] == "gopher"
    assert got["u2"]["drop_stage"] is None
    assert got["u2"]["lines_removed"] == 0 and BLOCK in got["u2"]["text"]


def test_pii_masked_and_counted(spark):
    doc = _good(9, 59) + " bob@example.com"
    audit = curate_corpus(_df(spark, [("u1", doc)]))
    r = audit.collect()[0]
    assert r["drop_stage"] is None
    assert r["n_email_address"] == 1 and r["any_pii"]
    assert "bob@example.com" not in r["text"] and "|||EMAIL_ADDRESS|||" in r["text"]


def test_stats_roundup(spark):
    rows = [
        ("u1", _good(1)),
        ("u2", "too short"),
        ("u3", f"{STOPS} {BLOCK} " + " ".join(["wxyz"] * 40)),
        ("u4", f"{STOPS} {BLOCK} " + " ".join(["wxyz"] * 40)),
    ]
    stats = curation_stats(curate_corpus(_df(spark, rows)))
    assert stats["docs_in"] == 4
    assert stats["dropped_gopher"] == 1
    assert stats["dropped_line_wipe"] == 1
    assert stats["docs_out"] == 2
    assert stats["docs_in"] == stats["docs_out"] + stats["dropped_gopher"] + stats[
        "dropped_line_wipe"
    ] + stats["dropped_exact_dup"]


def test_cli_curate(spark, tmp_path, capsys):
    import argparse
    import json

    import main as cli

    rows = [("u1", _good(1)), ("u2", "too short"), ("u3", _good(3))]
    src, dst, aud = (str(tmp_path / p) for p in ("pages", "clean", "audit"))
    _df(spark, rows).write.parquet(src)
    cli.cmd_curate(
        argparse.Namespace(
            input=src, output=dst, audit=aud, seg_tokens=10,
            id_col="url", text_col="text",
        )
    )
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["docs_in"] == 3 and stats["docs_out"] == 2
    out = spark.read.parquet(dst)
    assert out.count() == 2 and "drop_stage" not in out.columns
    assert spark.read.parquet(aud).count() == 3


def test_null_text_lands_in_gopher_not_lost(spark):
    """A NULL-text row must appear in the audit frame as a gopher
    drop, not vanish (NULL gate comparisons would fall out of BOTH
    filter branches without the coalesce)."""
    rows = [("u1", _good(1)), ("u2", None)]
    audit = curate_corpus(_df(spark, rows))
    got = {r["url"]: r.asDict() for r in audit.collect()}
    assert set(got) == {"u1", "u2"}
    assert got["u2"]["drop_stage"] == "gopher"
    stats = curation_stats(curate_corpus(_df(spark, rows)))
    assert stats["docs_in"] == 2 and stats["dropped_gopher"] == 1
