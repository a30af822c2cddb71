import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from enem_spark.session import get_spark

    s = get_spark(
        "enem_spark_tests", cores=4, shuffle_partitions=8, driver_memory="4g"
    )
    yield s
