"""End-to-end test of the north rule's SHIPPING path: the job run via
``spark-submit --py-files trafilatura_spark.zip`` in a fresh JVM, with
the package importable ONLY from the zip (cwd is a scratch dir and
PYTHONPATH is stripped), so zip layout / packaging / import-path bugs
that in-process tests can never see fail here.

One test, one submit (~1 min of JVM+job): extract a 16-doc
spans-parquet input through ``scripts/run_job.py`` and verify the
output and progress tables through a plain parquet reader (duckdb) —
no SparkSession from the host process touches the artifacts.
"""

import os
import pathlib
import shutil
import subprocess
import zipfile

import duckdb
import pytest
from pyspark.sql import functions as F

from trafilatura_spark.sources.corpus import synthesize_documents_df

REPO = pathlib.Path(__file__).resolve().parent.parent

SPARK_SUBMIT = shutil.which("spark-submit") or (
    os.path.join(os.environ["SPARK_HOME"], "bin", "spark-submit")
    if os.environ.get("SPARK_HOME") else None)


def build_zip(dest: pathlib.Path) -> pathlib.Path:
    """Same artifact scripts/build_pyfiles.sh ships (package .py only)."""
    zip_path = dest / "trafilatura_spark.zip"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(REPO.glob("trafilatura_spark/**/*.py")):
            z.write(p, p.relative_to(REPO).as_posix())
    return zip_path


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_extract(spark, sf_dir, tmp_path):
    inp = str(tmp_path / "docs")
    synthesize_documents_df(spark, sf_dir).filter(
        F.col("doc_id").cast("long") < 16).write.parquet(inp)
    out, prog = str(tmp_path / "out"), str(tmp_path / "progress")

    zip_path = build_zip(tmp_path)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    # a scratch cwd keeps the repo checkout off sys.path: run_job.py's
    # own dir (scripts/) is prepended, the repo root is not, so
    # `import trafilatura_spark` can only resolve from the --py-files zip
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.driver.memory=4g",
         "--py-files", str(zip_path),
         str(REPO / "scripts" / "run_job.py"),
         "--input", inp, "--output", out, "--progress", prog,
         "--run-id", "submit-e2e", "--buckets", "2", "--wave-size", "2",
         "--fast", "--no-comments"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600)
    assert proc.returncode == 0, proc.stderr[-4000:]

    ok = duckdb.sql(
        f"select count(*) from read_parquet('{out}/**/*.parquet') "
        "where status = 'ok'").fetchone()[0]
    assert ok > 0
    # every ok doc leads with its extracted title span — proves the zip
    # ran the real cascade, not a degenerate pass-through
    bad = duckdb.sql(
        f"select count(*) from read_parquet('{out}/**/*.parquet') "
        "where status = 'ok' and (spans[1].kind != 'head' "
        "or length(spans[1].text) = 0)").fetchone()[0]
    assert bad == 0
    committed = duckdb.sql(
        f"select count(*) from read_parquet('{prog}/**/*.parquet') "
        "where run_id = 'submit-e2e'").fetchone()[0]
    assert committed > 0
