import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kgspark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="kgspark-tests",
        master=os.environ.get("KGSPARK_TEST_MASTER", "local[4]"),
        shuffle_partitions=8,
    )
    yield spark
