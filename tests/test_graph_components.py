"""large-star/small-star connected components (functions/graph.py) —
the O(log n)-round scale path behind dedup_components' label
propagation (which needs diameter(G) rounds and would be pathological
on chain-shaped components at 100 TB)."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from kinesis_handler_spark.functions.graph import (
    attach_component_sizes,
    star_connected_components,
)


def _components_of(spark, edge_list):
    edges = spark.createDataFrame(edge_list, "u long, v long")
    rows = star_connected_components(edges).collect()
    return {r["doc_id"]: r["component_id"] for r in rows}


def _union_find(edge_list):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edge_list:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical: min node id per component
    comp: dict[int, int] = {}
    for x in parent:
        root = find(x)
        comp[x] = min(comp.get(root, root), x)
    # second pass so every member maps to the component MINIMUM
    mins: dict[int, int] = {}
    for x in parent:
        r = find(x)
        mins[r] = min(mins.get(r, r), x)
    return {x: mins[find(x)] for x in parent}


def test_chain_diameter_over_8_converges(spark):
    # 40-node chain: diameter 39.  Label propagation would need ~20
    # two-hop rounds; the star alternation must finish in O(log n) —
    # well inside the convergence guard — with every node labeled by
    # the chain's minimum.
    chain = [(i, i + 1) for i in range(100, 140)]
    got = _components_of(spark, chain)
    assert got == {i: 100 for i in range(100, 141)}


def test_two_components_and_singleton_edge(spark):
    # self-loop contributes no connectivity but its node still gets a
    # (singleton) component row — "every node appearing in edges"
    edges = [(1, 2), (2, 3), (10, 11), (5, 5)]
    got = _components_of(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 5: 5}


def test_matches_union_find_on_random_graph(spark):
    rng = random.Random(42)
    nodes = list(range(200))
    edge_list = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(300)
    ]
    edge_list = [(u, v) for u, v in edge_list if u != v]
    assert _components_of(spark, edge_list) == _union_find(edge_list)


def test_component_sizes(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "u long, v long")
    out = attach_component_sizes(star_connected_components(edges))
    sizes = {r["doc_id"]: r["n_members"] for r in out.collect()}
    assert sizes == {1: 3, 2: 3, 3: 3, 7: 2, 8: 2}


def test_star_equals_label_propagation_on_jaccard_graph(spark, sf_dir):
    # Interchangeability proof: the scale path produces the exact same
    # clustering as dedup_components' label propagation on the real
    # near-dup pair graph.
    from kinesis_handler_spark.queries.llm import _jaccard_pair_frame
    from kinesis_handler_spark.registry import all_queries

    pairs = _jaccard_pair_frame(spark, sf_dir).select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    )
    star = {
        r["doc_id"]: r["component_id"]
        for r in star_connected_components(pairs).collect()
    }
    lp = {
        r["doc_id"]: r["component_id"]
        for r in all_queries()["dedup_components"](spark, sf_dir).collect()
    }
    assert star == lp
