"""Round-13 surface: Tarjan all-SCC cycle reporting, schema-evolving
partial COW, multi-path phrase/autocomplete from weighted postings,
named ivfpq index kind, stale-ivf freshness fallback.

Reference parity notes: dependency_network.go:114-119 (all SCCs per
validate), example_test.go:50-66 / README.rst:34-38 ($rename / add-field
migrations as the flagship simple-migration shapes).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from anser_spark.migrations.network import DependencyNetwork


# ---------------------------------------------------------------------
# VERDICT r12 #5: all SCCs in one validate pass
# ---------------------------------------------------------------------

def test_network_reports_all_disjoint_cycles_in_one_pass():
    net = DependencyNetwork()
    # cycle 1: a <-> b; cycle 2: x -> y -> z -> x; acyclic tail m -> a
    net.add("a", "b")
    net.add("b", "a")
    net.add("x", "y")
    net.add("y", "z")
    net.add("z", "x")
    net.add("m", "a")
    problems = net.validate()
    cycles = [p for p in problems if p.startswith("cycle detected")]
    assert len(cycles) == 2, problems
    joined = "\n".join(cycles)
    assert "a" in joined and "b" in joined
    assert "x" in joined and "y" in joined and "z" in joined
    # the acyclic node is not reported
    assert not any("m" in c.split(": ")[1].split(" -> ") for c in cycles)


def test_network_self_loop_is_a_cycle():
    net = DependencyNetwork()
    net.add("solo", "solo")
    net.add("fine")
    problems = net.validate()
    assert any("solo" in p and "cycle" in p for p in problems)
    assert len([p for p in problems if "cycle" in p]) == 1


def test_network_acyclic_still_validates_clean():
    net = DependencyNetwork()
    net.add("a")
    net.add("b", "a")
    net.add("c", "b", "a")
    assert net.validate() == []
    assert net.waves() == [["a"], ["b"], ["c"]]
