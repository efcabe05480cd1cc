"""Graph analytics over relational edge lists: fixed-point PageRank.

``dedup_components`` (queries/llm.py) gave the engine its first
iterative graph operator (connected components,
functions/graph.py).  This module adds the second classic: PageRank
by power iteration — link analysis for corpus curation (rank domains
by citation structure before sampling) and entity importance over
relational joins.  The reference library (lib/kinesisHandler.js) has
no graph surface; this is a north-star mandate (SURVEY.md §2.B).

Determinism design (why an ORACLE can exist for an iterative
algorithm): the power iteration runs in FIXED-POINT BIGINT arithmetic
(rank scaled by 10^6) with a FIXED iteration count, so every
intermediate is an exactly-representable integer and both engines
compute bit-identical ranks — no float summation order, no
convergence-threshold races.  The DuckDB oracle unrolls the K=5
rounds as chained CTEs (plain SQL, no recursion needed for fixed K).
All values stay non-negative, so Spark's ``div`` (truncating) and
DuckDB's ``//`` (flooring) agree; magnitudes stay < 2^57 for any
realistic node count (85 × N × 10^6 with N up to 10^9).

Scale design: the edge frame is degree-annotated ONCE and lazily
checkpointed; each round is one node-sized join into the stationary
edge frame plus one partial+final aggregate back to node-sized ranks
— the same bounded-round shuffle discipline as
``star_connected_components``, with lineage truncated per round so
the 5-round plan never nests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_handler_spark.registry import query
from kinesis_handler_spark.tables import table

#: Fixed-point scale for PageRank values (rank 1.0 == 10^6).
_SCALE = 1_000_000

#: Damping numerator/denominator (d = 85/100) and the teleport base
#: (1-d) × scale, all exact integers.
_DAMP_NUM = 85
_DAMP_DEN = 100
_BASE = (_DAMP_DEN - _DAMP_NUM) * _SCALE // _DAMP_DEN

#: Power-iteration rounds.  Fixed (not convergence-tested) so the
#: oracle can unroll the exact same computation.
_ITERS = 5


def pagerank_fixed_point(
    edges: DataFrame, *, iters: int = _ITERS, scale: int = _SCALE
) -> DataFrame:
    """PageRank by power iteration over a directed edge frame.

    ``edges`` must have string columns ``src`` and ``dst`` (one row per
    distinct directed edge).  Every node that appears as a SOURCE gets a
    rank row (a sink-only node receives contributions but has no
    out-degree to redistribute; the callers here build symmetric edge
    frames where the distinction is moot).  Returns
    ``(node, out_deg, rank_fp)`` with ``rank_fp`` the fixed-point rank
    after ``iters`` rounds of

        rank' = (1-d)·scale  +  d · Σ_{src→node} (rank(src) div deg(src))

    in pure BIGINT arithmetic (d = 85/100, integer division).

    Every round joins the node-sized rank frame into the stationary
    degree-annotated edge frame and aggregates contributions back to
    node-sized — shuffle volume per round is O(|E|) with partial
    aggregation, and ``localCheckpoint`` keeps the logical plan O(1)
    deep across rounds (same discipline as
    ``functions/graph.star_connected_components``)."""
    deg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).cast("bigint").alias("out_deg"))
        .localCheckpoint(eager=False)
    )
    e = edges.join(deg, "src").localCheckpoint(eager=False)
    ranks = deg.select(
        "src", F.lit(int(scale)).cast("bigint").alias("r")
    )
    for _ in range(iters):
        contrib = (
            e.join(ranks, "src")
            .select("dst", F.expr("r div out_deg").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").cast("bigint").alias("c"))
            .withColumnRenamed("dst", "src")
        )
        ranks = (
            deg.join(contrib, "src", "left")
            .select(
                "src",
                (
                    F.lit(_BASE)
                    + F.expr(
                        f"({_DAMP_NUM} * coalesce(c, 0L)) div {_DAMP_DEN}"
                    )
                ).cast("bigint").alias("r"),
            )
            .localCheckpoint(eager=False)
        )
    return deg.join(ranks, "src").select(
        F.col("src").alias("node"), "out_deg", F.col("r").alias("rank_fp")
    )


def _pagerank_oracle() -> str:
    """Unroll the K-round fixed-point iteration as chained CTEs."""
    rounds = []
    prev = "r0"
    for k in range(1, _ITERS + 1):
        rounds.append(f"""
    c{k} AS (
      SELECT e.dst AS node, CAST(SUM(r.r // d.out_deg) AS BIGINT) AS c
      FROM edges e
      JOIN deg d ON e.src = d.src
      JOIN {prev} r ON e.src = r.node
      GROUP BY 1
    ),
    r{k} AS (
      SELECT d.src AS node,
             CAST({_BASE} + ({_DAMP_NUM} * COALESCE(c.c, 0)) // {_DAMP_DEN}
                  AS BIGINT) AS r
      FROM deg d LEFT JOIN c{k} c ON d.src = c.node
    )""")
        prev = f"r{k}"
    return f"""
    WITH pairs AS (
      SELECT DISTINCT l_partkey AS p, l_suppkey AS s
      FROM lineitem
      WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
    ),
    edges AS (
      SELECT 'P#' || CAST(p AS VARCHAR) AS src,
             'S#' || CAST(s AS VARCHAR) AS dst
      FROM pairs
      UNION ALL
      SELECT 'S#' || CAST(s AS VARCHAR), 'P#' || CAST(p AS VARCHAR)
      FROM pairs
    ),
    deg AS (
      SELECT src, CAST(COUNT(*) AS BIGINT) AS out_deg
      FROM edges GROUP BY 1
    ),
    r0 AS (
      SELECT src AS node, CAST({_SCALE} AS BIGINT) AS r FROM deg
    ),{",".join(rounds)}
    SELECT d.src AS node, d.out_deg, r.r AS rank_fp
    FROM {prev} r JOIN deg d ON r.node = d.src
    ORDER BY rank_fp DESC, node
    LIMIT 100
    """


@query("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part↔supplier sourcing graph: which parts and
    suppliers sit at the center of the supply network (bipartite link
    analysis — the relational twin of ranking domains by citation
    structure before corpus sampling).

    Nodes are namespaced strings (``P#<partkey>`` / ``S#<suppkey>`` —
    string-rendering instead of integer-packing keys keeps the full
    BIGINT key range legal per the extreme-key rule); edges are both
    orientations of each DISTINCT (part, supplier) sourcing pair, so
    every node has out-degree ≥ 1 and no dangling-mass correction is
    needed.  Five fixed-point rounds (see module docstring), then the
    top 100 nodes by rank with a total (rank, node) tie-break.

    100 TB: the distinct pair projection is one shuffle; each of the 5
    rounds is a node-sized hash join + partial-aggregated shuffle over
    the stationary checkpointed edge frame — no windows over the
    graph, no collect, rounds bounded by the constant K."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey").isNotNull() & F.col("l_suppkey").isNotNull()
    )
    pairs = li.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()
    fwd = pairs.select(
        F.format_string("P#%d", "p").alias("src"),
        F.format_string("S#%d", "s").alias("dst"),
    )
    rev = pairs.select(
        F.format_string("S#%d", "s").alias("src"),
        F.format_string("P#%d", "p").alias("dst"),
    )
    pr = pagerank_fixed_point(fwd.union(rev))
    return pr.orderBy(F.desc("rank_fp"), F.asc("node")).limit(100)
