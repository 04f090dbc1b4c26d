import pytest

from impresso_ta.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="impresso_ta-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
