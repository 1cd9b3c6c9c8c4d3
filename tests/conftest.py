from __future__ import annotations

import pytest

from ulp_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    """Module-scoped (NOT session-scoped): a fresh SparkContext per test
    file.  With one shared session the suite degrades superlinearly —
    by mid-suite the 8g driver heap sits at 99% old-gen with millions of
    retained Catalyst tree nodes and the JVM spends its time in
    concurrent GC (measured: the resume file alone 410s -> 900s+ as the
    suite grew).  Per-module isolation caps the snowball at file scope;
    the ~15s restart per file is far cheaper than the GC wall."""
    s = get_spark("ulp_spark-tests", master="local[4]",
                  extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s
    s.stop()
