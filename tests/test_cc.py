"""Connected components vs networkx ground truth."""

import networkx as nx
import numpy as np
import pytest

from sparkdedup.cc import connected_components


def _check(spark, edge_list):
    edges = spark.createDataFrame(edge_list, schema="src long, dst long")
    assign, stats = connected_components(edges)
    got = {row["id"]: row["component"] for row in assign.collect()}

    g = nx.Graph()
    g.add_edges_from(edge_list)
    want = {}
    for comp in nx.connected_components(g):
        m = min(comp)
        for node in comp:
            want[node] = m
    assert got == want
    return stats


def test_cc_simple_star(spark):
    _check(spark, [(2, 1), (3, 1), (5, 4)])


def test_cc_chain(spark):
    # worst case for naive propagation: a long path
    _check(spark, [(i + 1, i) for i in range(40)])


def test_cc_random_graph(spark):
    rng = np.random.RandomState(7)
    n = 300
    edge_list = [(int(a), int(b)) for a, b in rng.randint(0, n, size=(400, 2)) if a != b]
    stats = _check(spark, edge_list)
    # pointer jumping => O(log n) rounds even on adversarial shapes
    assert stats.iterations <= 12


def test_cc_merging_clusters(spark):
    # two stars bridged by one edge
    _check(spark, [(2, 1), (3, 1), (12, 11), (13, 11), (11, 3)])
