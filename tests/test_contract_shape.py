"""Driver-contract shape invariants: the driver executes the FIRST 50
queries() entries, so the window must stay exactly 50 (VERDICT r02 #1),
every query must carry an oracle, and demoted names must not shadow
contract names."""

from __future__ import annotations

import __spark_entry__ as E


def test_contract_window_is_50():
    assert len(E.queries()) == 50, (
        "queries() must stay at the 50-query driver window; "
        "add new queries to demoted_queries() instead"
    )


def test_every_query_has_oracle():
    q, o = E.queries(), E.oracle_sql()
    assert set(q) == set(o), set(q) ^ set(o)
    dq, do = E.demoted_queries(), E.demoted_oracle_sql()
    assert set(dq) == set(do), set(dq) ^ set(do)


def test_no_name_collisions():
    both = set(E.queries()) & set(E.demoted_queries())
    assert not both, both


def test_window_carries_never_driver_run_queries():
    """Round-4 rotation (VERDICT r03 "Next round" #1): the 50-query window
    must be spent on queries that have never been driver-executed. Anything
    that already earned a green CORRECTNESS_r03 row belongs in the demoted
    registry — except the two regression canaries kept on purpose."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r03.json")
    r03 = json.load(open(path))
    r03_green = {name for name, row in r03.items()
                 if row.get("rows_match") and row.get("hash_match")}
    canaries = {"pages_derive", "verify_report"}
    stale = (set(E.queries()) & r03_green) - canaries
    assert not stale, (
        "driver-green-in-r03 queries occupying the rotation window", stale)
    assert canaries <= set(E.queries())
