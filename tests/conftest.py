import pytest

from fbs_data_pipelines_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="fbs-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
