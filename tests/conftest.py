import os

import pytest

from terminus_server_spark.session import get_spark, load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tss-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    return load_tables(spark, SF_DIR)


@pytest.fixture(scope="session")
def store(tables):
    from terminus_server_spark.model.triples import tpch_store

    ts = tpch_store(tables)
    ts.df = ts.df.cache()
    ts.df.count()
    return ts
