"""Large-star/small-star CC vs networkx oracle (FIXTURES.md F8)."""

from __future__ import annotations

import random

import networkx as nx
import pytest

from entityblockingbysimilarityjoins_spark.operators.connected_components import (
    connected_components,
)


def _check(spark, edges: list[tuple[int, int]]):
    g = nx.Graph()
    g.add_edges_from(edges)
    want = {}
    for comp in nx.connected_components(g):
        m = min(comp)
        for n in comp:
            want[n] = m
    df = spark.createDataFrame(edges, ["id1", "id2"])
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == want


def test_chain(spark):
    _check(spark, [(i, i + 1) for i in range(30)])


def test_star(spark):
    _check(spark, [(50, i) for i in range(20)])


def test_cliques_and_disjoint_pairs(spark):
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    edges += [(100, 101), (200, 201)]
    _check(spark, edges)


def test_random_graph(spark):
    rng = random.Random(99)
    edges = [(rng.randint(0, 80), rng.randint(0, 80)) for _ in range(120)]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges)


def test_string_ids(spark):
    edges = [("a", "b"), ("b", "c"), ("x", "y")]
    df = spark.createDataFrame(edges, ["id1", "id2"])
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_duplicate_and_reversed_edges(spark):
    _check(spark, [(1, 2), (2, 1), (1, 2), (3, 2)])
