"""Fixed-point PageRank (queries/graph_q.py): parity with a pure-Python
reference on small graphs, exact symmetry fixpoints, and run-to-run
bit-stability under different partitionings (the property that lets an
iterative algorithm carry a strict DuckDB oracle at all)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_handler_spark.queries.graph_q import (
    _BASE,
    _DAMP_DEN,
    _DAMP_NUM,
    _SCALE,
    pagerank_fixed_point,
)


def _reference(edges: list[tuple[str, str]], iters: int) -> dict[str, int]:
    """Pure-Python twin of the fixed-point iteration."""
    deg: dict[str, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    ranks = {n: _SCALE for n in deg}
    for _ in range(iters):
        contrib: dict[str, int] = {}
        for s, d in edges:
            contrib[d] = contrib.get(d, 0) + ranks[s] // deg[s]
        ranks = {
            n: _BASE + (_DAMP_NUM * contrib.get(n, 0)) // _DAMP_DEN
            for n in deg
        }
    return ranks


def _run(spark, edges: list[tuple[str, str]], iters: int) -> dict[str, int]:
    df = spark.createDataFrame(edges, "src string, dst string")
    out = pagerank_fixed_point(df, iters=iters).collect()
    return {r["node"]: r["rank_fp"] for r in out}


def test_symmetric_pair_is_a_fixpoint(spark):
    # A↔B: each node forwards its whole rank; base + d·scale == scale
    # exactly at this damping, so ranks never move.
    got = _run(spark, [("A", "B"), ("B", "A")], iters=4)
    assert got == {"A": _SCALE, "B": _SCALE}


def test_star_graph_matches_python_reference(spark):
    edges = [("A", "B"), ("B", "A"), ("A", "C"), ("C", "A")]
    for iters in (1, 2, 5):
        assert _run(spark, edges, iters) == _reference(edges, iters)


def test_chain_with_hub_matches_python_reference(spark):
    # 6-node graph with a hub, asymmetric degrees, and a node pair
    # whose integer divisions truncate (deg 3) — exercises the
    # div-vs-floor agreement the oracle depends on.
    pairs = [("H", x) for x in "ABC"] + [("A", "B"), ("B", "C"), ("C", "D")]
    edges = pairs + [(b, a) for a, b in pairs]
    assert _run(spark, edges, 5) == _reference(edges, 5)


def test_rank_mass_and_ordering_sane(spark):
    pairs = [("H", x) for x in "ABCDE"]
    edges = pairs + [(b, a) for a, b in pairs]
    ranks = _run(spark, edges, 5)
    # the hub out-ranks every leaf, leaves tie by symmetry
    leaf = {v for k, v in ranks.items() if k != "H"}
    assert len(leaf) == 1
    assert ranks["H"] > leaf.pop()


def test_bit_stable_across_partitionings(spark):
    from kinesis_handler_spark.queries.graph_q import graph_pagerank

    sf = "/root/testdata/sf0.001"
    a = graph_pagerank(spark, sf).collect()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = graph_pagerank(spark, sf).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 100
    # ordering contract: rank desc, node asc — total, no ties left
    keys = [(-(r["rank_fp"]), r["node"]) for r in a]
    assert keys == sorted(keys)


def test_every_source_node_ranked_and_degree_correct(spark):
    edges = [("A", "B"), ("A", "C"), ("B", "A"), ("C", "A")]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {
        r["node"]: r["out_deg"]
        for r in pagerank_fixed_point(df, iters=1).collect()
    }
    assert out == {"A": 2, "B": 1, "C": 1}
