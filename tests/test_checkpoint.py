"""StageStore: atomic snapshot commits, lineage rows, anti-join resume
(reference state.py:15-111 semantics)."""

from pyspark.sql import functions as F

from epstein_pipeline_spark.plans.checkpoint import StageStore, resume_filter


def test_commit_read_roundtrip(spark, tmp_path):
    store = StageStore(tmp_path)
    df = spark.range(100).withColumnRenamed("id", "url")
    m = store.commit("stage_a", df, {"docs_in": 100})
    assert m["rows"] == 100 and m["snapshot"] == 0
    assert store.has("stage_a") and not store.has("stage_b")
    back = store.read(spark, "stage_a")
    assert back.count() == 100


def test_snapshot_increments(spark, tmp_path):
    store = StageStore(tmp_path)
    store.commit("s", spark.range(10))
    m = store.commit("s", spark.range(20))
    assert m["snapshot"] == 1
    assert store.read(spark, "s").count() == 20


def test_lineage_rows(spark, tmp_path):
    store = StageStore(tmp_path)
    store.commit("s1", spark.range(50).repartition(4))
    store.commit("s2", spark.range(10))
    lin = store.lineage(spark)
    stages = {r["stage"] for r in lin.select("stage").distinct().collect()}
    assert stages == {"s1", "s2"}
    total = lin.filter(F.col("stage") == "s1").agg(F.sum("rows_out")).first()[0]
    assert total == 50


def test_resume_filter_anti_join(spark):
    inputs = spark.createDataFrame([(f"u{i}",) for i in range(10)], "url string")
    done = spark.createDataFrame([("u1",), ("u5",)], "url string")
    remaining = {r["url"] for r in resume_filter(inputs, done).collect()}
    assert remaining == {f"u{i}" for i in range(10)} - {"u1", "u5"}


def test_invalidate(spark, tmp_path):
    store = StageStore(tmp_path)
    store.commit("s", spark.range(5))
    store.invalidate("s")
    assert not store.has("s")


def test_shuffle_byte_counters(spark, tmp_path):
    """north rule: lineage counters include shuffle bytes. A commit
    whose plan shuffles records positive shuffle_write_bytes; the
    counters ride in the manifest next to caller-provided ones."""
    store = StageStore(tmp_path)
    shuffled = (
        spark.range(20_000)
        .withColumn("k", F.pmod(F.col("id"), F.lit(64)))
        .repartition(8, "k")  # explicit exchange => shuffle write
        .groupBy("k")
        .count()
    )
    m = store.commit("agg", shuffled, {"docs_in": 20_000})
    c = m["counters"]
    assert c["docs_in"] == 20_000
    assert "shuffle_read_bytes" in c and "shuffle_write_bytes" in c
    assert c["shuffle_write_bytes"] > 0
    # a map-only commit right after must not inherit the agg's bytes:
    # totals are snapshotted around each write action, and the
    # snapshot's listener-bus drain (inside _shuffle_totals) delivers
    # the agg job's async metrics BEFORE the map-only window opens —
    # the == 0 pin relies on that drain, not on luck
    m2 = store.commit("maponly", spark.range(10))
    assert m2["counters"]["shuffle_write_bytes"] == 0
