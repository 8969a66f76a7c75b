import pytest

from minhash_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "minhash-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "6g"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
