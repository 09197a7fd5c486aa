from __future__ import annotations

import pytest

from german_ocr_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores="*", app_name="german-ocr-spark-tests", shuffle_partitions=32)
    yield s
