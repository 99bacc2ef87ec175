from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from s3_redshift_backup_tool_spark.session import get_spark
    s = get_spark("tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
                  shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def _rt(spark, sf_dir, name):
    from s3_redshift_backup_tool_spark.sources.readers import read_table
    return read_table(spark, sf_dir, name)


@pytest.fixture(scope="session")
def orders(spark, sf_dir):
    return _rt(spark, sf_dir, "orders")


@pytest.fixture(scope="session")
def events(spark, sf_dir):
    return _rt(spark, sf_dir, "events")


@pytest.fixture(scope="session")
def lineitem(spark, sf_dir):
    return _rt(spark, sf_dir, "lineitem")


@pytest.fixture(scope="session")
def documents(spark, sf_dir):
    return _rt(spark, sf_dir, "documents")


@pytest.fixture(scope="session")
def embeddings(spark, sf_dir):
    return _rt(spark, sf_dir, "embeddings")
