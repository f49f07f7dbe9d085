from __future__ import annotations

import pytest

from sparkcdc.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="sparkcdc-tests", master="local[8]", shuffle_partitions=8, driver_memory="6g")
    s.sparkContext.setLogLevel("ERROR")
    yield s
