import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from knowledge_harvest_from_lms_spark.session import get_session

    s = get_session(cpus=8, shuffle_partitions=8, app_name="kg-spark-tests")
    yield s
    s.stop()
