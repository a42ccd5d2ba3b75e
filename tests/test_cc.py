"""Connected components vs networkx ground truth — both the driver
union-find path and the distributed label-propagation path."""

import networkx as nx
import numpy as np
import pytest

from sparkdedup.cc import connected_components


def _check(spark, edge_list, driver_threshold):
    edges = spark.createDataFrame(edge_list, schema="src long, dst long")
    assign, stats = connected_components(edges, driver_threshold=driver_threshold)
    got = {row["id"]: row["component"] for row in assign.collect()}

    g = nx.Graph()
    g.add_edges_from(edge_list)
    want = {}
    for comp in nx.connected_components(g):
        m = min(comp)
        for node in comp:
            want[node] = m
    assert got == want
    assert stats.mode == ("driver" if driver_threshold else "distributed")
    return stats


@pytest.mark.parametrize("thr", [0, 2_000_000], ids=["distributed", "driver"])
def test_cc_simple_star(spark, thr):
    _check(spark, [(2, 1), (3, 1), (5, 4)], thr)


@pytest.mark.parametrize("thr", [0, 2_000_000], ids=["distributed", "driver"])
def test_cc_chain(spark, thr):
    # worst case for naive propagation: a long path
    _check(spark, [(i + 1, i) for i in range(40)], thr)


@pytest.mark.parametrize("thr", [0, 2_000_000], ids=["distributed", "driver"])
def test_cc_random_graph(spark, thr):
    rng = np.random.RandomState(7)
    n = 300
    edge_list = [(int(a), int(b)) for a, b in rng.randint(0, n, size=(400, 2)) if a != b]
    stats = _check(spark, edge_list, thr)
    if thr == 0:
        # pointer jumping => O(log n) rounds even on adversarial shapes
        assert stats.iterations <= 12


@pytest.mark.parametrize("thr", [0, 2_000_000], ids=["distributed", "driver"])
def test_cc_merging_clusters(spark, thr):
    # two stars bridged by one edge
    _check(spark, [(2, 1), (3, 1), (12, 11), (13, 11), (11, 3)], thr)


def test_cc_paths_agree(spark):
    rng = np.random.RandomState(11)
    edge_list = [(int(a), int(b)) for a, b in rng.randint(0, 500, size=(700, 2)) if a != b]
    edges = spark.createDataFrame(edge_list, schema="src long, dst long")
    a1, s1 = connected_components(edges, driver_threshold=0)
    a2, s2 = connected_components(edges, driver_threshold=10**6)
    assert s1.mode == "distributed" and s2.mode == "driver"
    assert {tuple(r) for r in a1.collect()} == {tuple(r) for r in a2.collect()}
