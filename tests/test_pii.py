"""PII masking: sentinel rewrite per type, counts, masking order,
and the clean-doc no-op."""

from epstein_pipeline_spark.operators.pii import (
    PII_PATTERNS,
    mask_token,
    redact_pii,
)


def _collect(spark, rows):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    return {r["doc_id"]: r for r in redact_pii(df).collect()}


def test_each_type_masked_and_counted(spark):
    got = _collect(
        spark,
        [
            (1, "mail bob.smith@corp.example.com today"),
            (2, "ssn is 123-45-6789 ok"),
            (3, "host 10.20.30.40 up"),
            (4, "call (212) 555-0187 now"),
        ],
    )
    assert got[1]["text"] == f"mail {mask_token('EMAIL_ADDRESS')} today"
    assert got[1]["n_email_address"] == 1 and got[1]["any_pii"]
    assert got[2]["text"] == f"ssn is {mask_token('SSN')} ok"
    assert got[3]["text"] == f"host {mask_token('IP_ADDRESS')} up"
    assert got[4]["text"] == f"call {mask_token('PHONE_NUMBER')} now"
    for i, col in [(1, "n_email_address"), (2, "n_ssn"), (3, "n_ip_address"), (4, "n_phone_number")]:
        assert got[i][col] == 1


def test_email_wins_over_embedded_phone_shape(spark):
    """A phone-shaped digit run inside an email local part must be
    consumed by the email mask (PII_PATTERNS order contract)."""
    got = _collect(spark, [(1, "x 212.555.0187abc@mail.example.org y")])
    assert got[1]["text"] == f"x {mask_token('EMAIL_ADDRESS')} y"
    assert got[1]["n_email_address"] == 1


def test_ssn_not_eaten_by_phone(spark):
    """3-2-4 is SSN, 3-3-4 is phone; both in one doc."""
    got = _collect(spark, [(1, "a 987-65-4321 b 987-654-3210 c")])
    assert got[1]["text"] == f"a {mask_token('SSN')} b {mask_token('PHONE_NUMBER')} c"
    assert got[1]["n_ssn"] == 1 and got[1]["n_phone_number"] == 1


def test_clean_doc_untouched(spark):
    text = "no personal identifiers in this sentence at all"
    got = _collect(spark, [(1, text)])
    assert got[1]["text"] == text
    assert not got[1]["any_pii"]
    assert all(got[1][f"n_{t.lower()}"] == 0 for t in PII_PATTERNS)


def test_types_subset(spark):
    df = spark.createDataFrame(
        [(1, "mail a@b.example.com ip 10.0.0.1")], "doc_id int, text string"
    )
    (r,) = redact_pii(df, types=["IP_ADDRESS"]).collect()
    assert r["text"] == f"mail a@b.example.com ip {mask_token('IP_ADDRESS')}"
    assert r["n_ip_address"] == 1
    assert "n_email_address" not in r.asDict()


def test_redaction_is_shuffle_free(spark):
    """The whole redact pass is scalar expressions in one projection
    — no Exchange may appear in the physical plan."""
    df = spark.createDataFrame(
        [(1, "mail a@b.example.com now")], "doc_id int, text string"
    )
    plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_multiple_occurrences_counted(spark):
    got = _collect(spark, [(1, "a@x.example.com b@y.example.org 10.0.0.1 10.0.0.2 10.0.0.3")])
    assert got[1]["n_email_address"] == 2
    assert got[1]["n_ip_address"] == 3
