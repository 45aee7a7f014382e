import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Keep test sessions small and fast.
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "4g")


@pytest.fixture(scope="session")
def spark():
    from lovdata_pipeline_spark.session import get_spark

    spark = get_spark("tests", shuffle_partitions=4)
    yield spark
    spark.stop()
