import pytest

from tdataframe_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tdataframe-spark-tests", cpus=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
