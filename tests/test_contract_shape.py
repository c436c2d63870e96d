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


def test_never_driver_green_queries_lead():
    """The six r01 canon failures + first-time runs must stay inside the
    window (they were ordered first in r3 precisely so the driver
    finally executes them)."""
    order = list(E.queries())
    for name in ("multimodal_features", "windowed_counts", "sessionize",
                 "tpch_pricing", "orders_by_nation", "lineage",
                 "ann_ivf_recall", "geofence_alerts"):
        assert name in order[:20], (name, order.index(name))
