"""Distributed connected components: large-star/small-star.

The 100 TB fixpoint for component finding over an edge frame (Kiveris
et al., "Connected Components in MapReduce and Beyond", SOCC'14 — the
alternating-star algorithm).  ``dedup_components`` (queries/llm.py)
uses plain min-label propagation, which needs diameter(G) rounds —
fine for near-dup graphs (tiny star/clique components) but pathological
on chain-shaped components: a diameter-10k chain means 10k shuffle
rounds.  Large-star/small-star converges in O(log n) rounds regardless
of diameter, over the same edge frame, with every round expressed as
groupBy-min + join (no collect, no windows over the whole graph).

Round body:

* **large-star**: for every node ``u``, connect each STRICTLY LARGER
  neighbor to ``m(u) = min(N(u) ∪ {u})``.  Shrinks tall structures
  toward local minima; never increases the edge count beyond 2|E|.
* **small-star**: orient every edge toward the smaller endpoint; for
  every node ``u``, connect ``u`` and each of its smaller-or-equal
  neighbors to the minimum of that set.  Flattens what large-star
  grafted into stars.

Fixpoint: the edge set is a union of stars centered at each
component's minimum node; detected by an order-insensitive frame
fingerprint (count + xxhash64 sum) going stable.  Every iteration
materializes via ``lineage.truncate`` — reliable ``checkpoint`` when
the session configured a checkpoint dir, ``localCheckpoint`` otherwise
— so lineage stays O(1) deep; the same per-round truncation
discipline as the label-propagation path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_handler_spark.functions.lineage import truncate_loop


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    """Order-insensitive identity of an edge frame: (count, xor-fold).
    XOR instead of SUM so the fold can't overflow under ANSI mode; the
    frame is distinct, so xor never self-cancels duplicate rows."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u})."""
    bidir = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = bidir.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", F.col("u")).alias("m"))
    return (
        bidir.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient toward the smaller endpoint; connect each node's ≤-neighbors
    (and itself) to the minimum of the set."""
    oriented = edges.select(
        F.greatest("u", "v").alias("a"), F.least("u", "v").alias("b")
    )
    mins = oriented.groupBy("a").agg(F.min("b").alias("m"))
    with_min = oriented.join(mins, "a")
    return (
        with_min.filter(F.col("b") != F.col("m"))
        .select(F.col("b").alias("u"), F.col("m").alias("v"))
        .union(mins.select(F.col("a").alias("u"), F.col("m").alias("v")))
        .distinct()
    )


def star_connected_components(
    edges: DataFrame, max_rounds: int = 50
) -> DataFrame:
    """Connected components of an undirected edge frame.

    ``edges`` must have two numeric columns ``u`` and ``v`` (one row per
    edge, either orientation, self-loops ignored).  Returns
    ``(doc_id, component_id)`` where component_id is the minimum node id
    in the component; every node appearing in ``edges`` gets a row.

    Raises ``RuntimeError`` if the fixpoint is not reached within
    ``max_rounds`` alternations — with O(log n) convergence that bound
    is never the binding constraint on real graphs; hitting it means
    the input violated the schema contract (e.g. NaN ids).
    """
    # Lazy checkpoints throughout: each round's frame is materialized BY
    # the fingerprint collect (one Spark action per round, not two), and
    # later consumers reuse the materialized blocks.
    # ONE materialization of the caller's edge pipeline first: both
    # derived frames below used to truncate the raw ``edges`` lineage
    # independently, so each one's first action replayed the caller's
    # full upstream pipeline — for dedup_pipeline_scale that meant the
    # entire minhash candidate generation ran TWICE per query (guide
    # §5: cut the lineage where a frame has several consumers).
    e0 = edges.select("u", "v").transform(truncate_loop)
    # all_nodes comes from the UNFILTERED input so a node appearing only
    # in self-loop edges still gets its (singleton) component row — the
    # docstring's "every node appearing in edges" promise.
    all_nodes = (
        e0.select(F.col("u").alias("doc_id"))
        .union(e0.select(F.col("v").alias("doc_id")))
        .distinct()
        .transform(truncate_loop)
    )
    cur = (
        e0.filter(F.col("u") != F.col("v"))
        .select("u", "v")
        .distinct()
        .transform(truncate_loop)
    )
    prev_fp = _fingerprint(cur)
    for _ in range(max_rounds):
        nxt = _small_star(_large_star(cur)).transform(truncate_loop)
        fp = _fingerprint(nxt)
        cur = nxt
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(
            f"star_connected_components did not converge in {max_rounds} rounds"
        )
    # Converged: every edge is (node, component-min).  Re-attach roots
    # and any node whose edges were absorbed (isolated after dedup).
    membership = cur.select(F.col("u").alias("doc_id"), F.col("v").alias("cid"))
    return (
        all_nodes.join(membership, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cid", F.col("doc_id")).alias("component_id"),
        )
    )


def attach_component_sizes(components: DataFrame) -> DataFrame:
    """Add ``n_members`` per component via groupBy-count + join — NOT a
    window partitioned by component_id, which would buffer every member
    of a component in one task (this module exists precisely for graphs
    with pathological giant components).  The size frame is O(number of
    components) and joins back on the component key with bounded
    per-key state."""
    sizes = components.groupBy("component_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return components.join(sizes, "component_id").select(
        "doc_id", "component_id", "n_members"
    )
