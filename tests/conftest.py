import pytest

from mergeaddressesandbuildings_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[8]", app_name="pytest", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
