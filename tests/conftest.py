from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from fileverification_spark.session import get_spark

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def pages_small(spark):
    from fileverification_spark.sources import pages as P

    return P.pages_with_derived(spark, SF0001).cache()
