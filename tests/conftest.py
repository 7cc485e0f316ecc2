from __future__ import annotations

import pytest

from assetdatavalidationtool_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    sp = get_spark(cores=8, app_name="advt_tests", shuffle_partitions=8,
                   driver_memory="8g")
    yield sp
    sp.stop()
