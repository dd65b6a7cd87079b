import os

import pytest

BUILD_DIR = os.path.join(os.path.dirname(__file__), "..", "_build")


@pytest.fixture(scope="session")
def spark():
    from pdf_ocr_engine_spark.plans.pipeline import build_session

    spark = build_session("pdf-ocr-engine-spark-tests", master="local[4]",
                          shuffle_partitions=4)
    spark.sparkContext.setLogLevel("WARN")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def build_dir():
    os.makedirs(BUILD_DIR, exist_ok=True)
    yield os.path.abspath(BUILD_DIR)


@pytest.fixture(scope="session")
def fixture_pages_path(build_dir):
    """Deterministic fixture corpus parquet (write_pages_parquet overwrites
    unconditionally, so no staleness handling is needed)."""
    from pdf_ocr_engine_spark.sources.fixtures import write_pages_parquet

    return write_pages_parquet(
        os.path.join(build_dir, "pages_test.parquet"), n_docs=120)
