"""Oracle gate for the demoted twin queries.

The driver executes at most ~50 contract queries per round, so twin/
variant queries were moved out of ``queries()`` into
``demoted_queries()`` (VERDICT r02 "Next round" #1). This test keeps
every demoted query under the SAME strict driver-mirror canon
(tools/check_oracle.py: toPandas vs duckdb .df(), name-sorted columns,
all-column row sort, str()-exact value hash), so demotion never weakens
the correctness evidence — it only frees driver-window slots for
queries that still need first-time driver runs.

Round-4 hardening (VERDICT r3 "Next round" #2): the gate runs at BOTH
sf0.001 (fast smoke) and sf0.01 — the driver's own scale factor — so a
demoted query has exactly the evidence a contract query gets from the
driver, at the same data scale.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tools.check_oracle import check_one, make_oracle_con

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

_DEMOTED = entrymod.demoted_queries()
_ORACLES = entrymod.demoted_oracle_sql()


@pytest.fixture(scope="module", params=SF_DIRS, ids=["sf0.001", "sf0.01"])
def sf_oracle(request):
    con = make_oracle_con(request.param)
    yield request.param, con
    con.close()


def test_demoted_registry_disjoint_from_contract():
    contract = entrymod.queries()
    assert len(contract) <= 50, "driver window is ~50 queries"
    assert not (set(contract) & set(_DEMOTED))
    assert set(_DEMOTED) == set(_ORACLES)


@pytest.mark.parametrize("name", sorted(_DEMOTED))
def test_demoted_query_matches_oracle(spark, sf_oracle, name):
    sf_dir, oracle_con = sf_oracle
    err = check_one(
        spark, oracle_con, sf_dir, name, _DEMOTED[name], _ORACLES.get(name)
    )
    assert err is None, f"{name}: {err}"
