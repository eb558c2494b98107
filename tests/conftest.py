from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from data_platform_spark.session import get_spark

    s = get_spark(app_name="dps-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def spark_global():
    """Alias fixture for hypothesis-driven tests (function-scoped @given
    can't take a function-scoped fixture; session scope is fine)."""
    from data_platform_spark.session import get_spark

    return get_spark(app_name="dps-tests", shuffle_partitions=8)
