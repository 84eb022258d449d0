import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from trafilatura_spark.job import make_session
    spark = make_session(app_name="trafilatura-spark-tests", master="local[8]",
                         shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def doc_rows():
    """(doc_id, text, lang, source) rows from the driver testdata."""
    import duckdb
    return duckdb.sql(
        f"select doc_id, text, lang, source from "
        f"read_parquet('{SF_DIR}/documents.parquet') order by doc_id"
    ).fetchall()
