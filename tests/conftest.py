import os

import pytest


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from tl_spark.plans.session import get_spark

    s = get_spark(app_name="tl_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()
