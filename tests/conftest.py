import pytest

from modern_search_engines_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("mse-tests", master="local[4]", shuffle_partitions=8,
                  extra_conf={"spark.driver.memory": "4g",
                              "spark.sql.autoBroadcastJoinThreshold": "10m"})
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dirs():
    return {
        "t1": "/root/testdata/sf0.001",
        "t2": "/root/testdata/sf0.01",
        "bench": "/root/testdata/sf0.1",
    }
