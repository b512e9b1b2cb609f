"""Packaging: the pipeline ships and runs via spark-submit --py-files
(north_rule packaging requirement). Runs the real binary end-to-end on
a small corpus, then verifies resume on a second submit."""

import json
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

pytestmark = pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)


@pytest.fixture(scope="module")
def zipfile_path():
    out = subprocess.run(
        ["bash", str(REPO / "scripts" / "build_pyfiles.sh")], capture_output=True, text=True
    )
    assert out.returncode == 0, out.stderr
    return REPO / "dist" / "epstein_pipeline_spark.zip"


def _submit(zip_path: Path, *args: str) -> str:
    cmd = [
        "spark-submit",
        "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--py-files", str(zip_path),
        str(REPO / "main.py"),
        *args,
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-3000:]
    return out.stdout


def test_spark_submit_synth_then_dedup(zipfile_path, tmp_path):
    pages = tmp_path / "pages"
    store = tmp_path / "store"
    clusters = tmp_path / "clusters"

    out1 = _submit(zipfile_path, "synth", "--pages", "300", "--output", str(pages))
    stats = json.loads(out1.strip().splitlines()[-1])
    assert stats["n_pages"] == 300

    out2 = _submit(
        zipfile_path, "dedup", "--input", str(pages), "--store", str(store),
        "--output", str(clusters),
    )
    res = json.loads(out2.strip().splitlines()[-1])
    assert res["docs_in"] == 300 and res["clusters_rows"] > 0

    # second submit resumes: all stages skipped
    out3 = _submit(
        zipfile_path, "dedup", "--input", str(pages), "--store", str(store),
        "--output", str(clusters),
    )
    res3 = json.loads(out3.strip().splitlines()[-1])
    assert all(v == 0.0 for v in res3["stage_seconds"].values()), res3["stage_seconds"]
    assert res3["clusters_rows"] == res["clusters_rows"]


def test_spark_submit_resolve_trained(zipfile_path, tmp_path, spark):
    """The resolve subcommand through the real binary: planted
    twins/copies merge under EM-trained weights (references the same
    surface as cli.py:2145 resolve-entities)."""
    sys.path.insert(0, str(REPO / "tests"))
    from test_em_training import _persons

    persons = tmp_path / "persons"
    _persons(spark, n=120).write.mode("overwrite").parquet(str(persons))

    out = _submit(
        zipfile_path, "resolve", "--input", str(persons),
        "--output", str(tmp_path / "resolved"), "--train",
    )
    res = json.loads(out.strip().splitlines()[-1])
    # n=120 -> 20 twins (pid%6==0) + 12 copies (pid%10==0) = 32 merges
    assert res["input_records"] == 152
    assert res["merges"] == 32 and res["trained"] is True
