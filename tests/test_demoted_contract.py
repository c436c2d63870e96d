"""Oracle gate for the demoted twin queries.

The driver executes at most ~50 contract queries per round, so twin/
variant queries were moved out of ``queries()`` into
``demoted_queries()`` (VERDICT r02 "Next round" #1). This test keeps
every demoted query under the SAME strict driver-mirror canon
(tools/check_oracle.py: toPandas vs duckdb .df(), name-sorted columns,
all-column row sort, str()-exact value hash) at sf0.001, so demotion
never weakens the correctness evidence — it only frees driver-window
slots for queries that still need first-time driver runs.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tools.check_oracle import check_one, make_oracle_con

SF0001 = "/root/testdata/sf0.001"

_DEMOTED = entrymod.demoted_queries()
_ORACLES = entrymod.demoted_oracle_sql()


@pytest.fixture(scope="module")
def oracle_con():
    con = make_oracle_con(SF0001)
    yield con
    con.close()


def test_demoted_registry_disjoint_from_contract():
    contract = entrymod.queries()
    assert len(contract) <= 50, "driver window is ~50 queries"
    assert not (set(contract) & set(_DEMOTED))
    assert set(_DEMOTED) == set(_ORACLES)


@pytest.mark.parametrize("name", sorted(_DEMOTED))
def test_demoted_query_matches_oracle(spark, oracle_con, name):
    err = check_one(
        spark, oracle_con, SF0001, name, _DEMOTED[name], _ORACLES.get(name)
    )
    assert err is None, f"{name}: {err}"
