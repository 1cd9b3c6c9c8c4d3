from __future__ import annotations

import pytest

from ulp_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ulp_spark-tests", master="local[4]",
                  extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s
