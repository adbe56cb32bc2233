from __future__ import annotations

import pytest

from tods_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tods_spark_tests", cores=8, shuffle_partitions=8)
    yield s
