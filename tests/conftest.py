import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from declarative_dataflow_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    spark = build_session("tests", master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture()
def engine(spark):
    from declarative_dataflow_spark.engine import Engine

    return Engine(spark)


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def testdata_engine(spark):
    from declarative_dataflow_spark.sources.testdata import load_engine

    return load_engine(spark, SF_DIR)


def rows(df):
    """Result as a sorted list of tuples for exact multiset asserts."""

    return sorted(tuple(r) for r in df.collect())


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "kafka: needs a real Kafka broker + spark-sql-kafka connector "
        "(skipped in the development container)",
    )
