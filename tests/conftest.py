import os
import time

# Pin the TEST PROCESS timezone before any JVM/session starts. ~1100
# tests assert engine logic through raw collect()'d datetimes, and
# PySpark renders TimestampType instants through the Python LOCAL
# zone — on a non-UTC host those assertions would measure the host,
# not the engine. The host-TZ axis itself is covered explicitly:
# tests/test_tz_independence.py flips TZ in-process and runs the
# oracle gate in an America/Bogota subprocess, and the round's
# check_oracle sweeps run under UTC, America/Bogota, and
# Asia/Kathmandu (EVIDENCE_r15 §9).
os.environ["TZ"] = "UTC"
time.tzset()

import pytest

from fbs_data_pipelines_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="fbs-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
