import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    """Shared local SparkSession for Spark-level tests."""
    from indian_address_parser_spark.plans.session import get_spark

    spark = get_spark(app_name="iaps-tests", shuffle_partitions=8)
    yield spark
