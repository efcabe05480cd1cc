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

from kinesis_handler_spark.functions.lineage import truncate, truncate_loop
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
    aggregation, and ``lineage.truncate`` (reliable checkpoint when a
    checkpoint dir is set) keeps the logical plan O(1)
    deep across rounds (same discipline as
    ``functions/graph.star_connected_components``)."""
    deg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).cast("bigint").alias("out_deg"))
        .transform(truncate_loop)
    )
    e = edges.join(deg, "src").transform(truncate_loop)
    ranks = deg.select(
        "src", F.lit(int(scale)).cast("bigint").alias("r")
    )
    for _ in range(iters):
        # Each round is ONE edge join + ONE aggregate.  The old shape
        # closed the round with a second, node×node left join back onto
        # ``deg`` (to re-seat nodes with no in-edges); instead a
        # zero-share row per node rides into the same aggregation, so
        # every node surfaces from the groupBy directly and the
        # per-round join (plus its AQE stages and scheduling gap —
        # measured ~0.15-0.2 s/round of pure orchestration at sf0.1)
        # disappears.  Arithmetic is unchanged: Σ shares + 0 = Σ shares,
        # and a no-in-edge node's sum is exactly the old coalesce(c, 0).
        shares = e.join(ranks, "src").select(
            "dst", F.expr("r div out_deg").alias("share")
        )
        zero = ranks.select(
            F.col("src").alias("dst"),
            F.lit(0).cast("bigint").alias("share"),
        )
        ranks = (
            shares.unionByName(zero)
            .groupBy("dst")
            .agg(F.sum("share").cast("bigint").alias("c"))
            .select(
                F.col("dst").alias("src"),
                (
                    F.lit(_BASE)
                    + F.expr(f"({_DAMP_NUM} * c) div {_DAMP_DEN}")
                ).cast("bigint").alias("r"),
            )
            .transform(truncate_loop)
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


_TRIANGLE_ORACLE = """
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p
      FROM lineitem
      WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
    ),
    nxt AS (
      SELECT o, p, LEAD(p) OVER (PARTITION BY o ORDER BY p) AS np
      FROM op
    ),
    und AS (
      SELECT DISTINCT p AS s1, np AS s2 FROM nxt WHERE np IS NOT NULL
    ),
    deg AS (
      SELECT n, CAST(COUNT(*) AS BIGINT) AS deg
      FROM (SELECT s1 AS n FROM und UNION ALL SELECT s2 FROM und)
      GROUP BY 1
    ),
    tri AS (
      SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
      FROM und e1
      JOIN und e2 ON e1.s2 = e2.s1
      JOIN und e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
    ),
    cnt AS (
      SELECT n AS part, CAST(COUNT(*) AS BIGINT) AS triangles
      FROM (SELECT a AS n FROM tri UNION ALL
            SELECT b FROM tri UNION ALL
            SELECT c FROM tri)
      GROUP BY 1
    )
    SELECT c.part, d.deg, c.triangles
    FROM cnt c JOIN deg d ON c.part = d.n
    ORDER BY c.triangles DESC, c.part
    LIMIT 100
    """


@query("graph_triangle_count", oracle=_TRIANGLE_ORACLE)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-node triangle counting over the part-succession graph:
    the third classic graph operator (after components and PageRank) —
    triangle participation measures local clustering, the signal
    community detection and spam/link-farm filters start from.

    The graph: within each order's distinct part basket, an edge joins
    each part to its id-successor (a path per basket, union over
    orders) — linear in lineitems with bounded degree, unlike the
    co-occurrence clique expansion which is quadratic per basket.
    Output: the 100 nodes with the most triangles, with degree, total
    (triangles DESC, part) tie-break.

    The oracle enumerates each triangle once in id order (``a<b<c`` via
    the ``s1<s2`` canonical edge form); Spark enumerates each triangle
    once in DEGREE order.  Both are exact single-count enumerations of
    the same set, so per-node counts agree — the orientation choice is
    a physical-plan decision, not a semantic one.

    100 TB: Spark orients every edge from its (degree, id)-smaller to
    its (degree, id)-larger endpoint, so oriented out-degree is
    O(sqrt(m)) (Schank-Wagner bound) — a celebrity node with 10^6
    neighbors contributes zero candidates from its own adjacency list.
    Closing corners come from intersecting the two endpoints' oriented
    out-neighbor arrays per edge (bounded by the O(sqrt(m)) orientation
    cap), so the O(m^1.5) candidate-path stream of the classic wedge
    join never materializes as rows; all stages are equi-joins +
    partial+final aggregates, no windows over the graph, no collect.

    r12 MEASURED OUT (do not re-try blind): a rewrite that built the
    edge list via per-order sorted collect_set baskets, localCheckpointed
    ``und``/``deg``/``ow``, and replaced the 3-way unionAll corner credit
    with one explode was adjudicated by interleaved same-session A/B with
    per-cycle fixed-work calibration (JVM utime+stime — on local[n] that
    IS total task compute, and it is immune to the wall-clock stalls this
    sandbox shows).  Result: ~2.5× MORE CPU than this shape (med 101-126
    vs 39-45 CPU-s/run at sf0.1) and no wall win.  Why the "redundant
    pass" intuition fails: the unionAll corner branches differ only in
    the final projection, so their broadcast exchanges are REUSED across
    branches (ReusedExchange) and only the cheap probe reruns, while the
    rewrite paid real costs — an ObjectHashAggregate basket build, two
    extra full-width exchanges, and three lazy localCheckpoints whose
    un-materialized blocks get recomputed CONCURRENTLY by the racing
    broadcast-build jobs (checkpoints alone measured ~+40 CPU-s/run).
    The same A/B kept the pagerank zero-share rewrite (mildly better).

    r13 re-adjudicated ONE piece of that bundle in isolation — the
    corner credit.  "Only the cheap probe reruns" understated the
    probe: each unionAll branch re-streamed the wedge hash-probe (the
    O(m^1.5) stage), and the single-explode credit won the interleaved
    calibrated CPU A/B decisively (see the comment at ``cnt``), so
    that piece — and only that piece — is now in."""
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey").isNotNull() & F.col("l_partkey").isNotNull()
    )
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    nxt = op.withColumn(
        "np", F.lead("p").over(Window.partitionBy("o").orderBy("p"))
    )
    und = (
        nxt.where(F.col("np").isNotNull())
        .select(F.col("p").alias("s1"), F.col("np").alias("s2"))
        .distinct()
    )
    deg = (
        und.select(F.col("s1").alias("n"))
        .unionAll(und.select(F.col("s2").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )
    # Orient each edge toward the (deg, id)-larger endpoint.
    d1 = deg.select(F.col("n").alias("s1"), F.col("deg").alias("dg1"))
    d2 = deg.select(F.col("n").alias("s2"), F.col("deg").alias("dg2"))
    fwd = (
        (F.col("dg1") < F.col("dg2"))
        | ((F.col("dg1") == F.col("dg2")) & (F.col("s1") < F.col("s2")))
    )
    ow = (
        und.join(d1, "s1")
        .join(d2, "s2")
        .select(
            F.when(fwd, F.col("s1")).otherwise(F.col("s2")).alias("src"),
            F.when(fwd, F.col("s2")).otherwise(F.col("s1")).alias("dst"),
        )
        .transform(truncate)
    )
    # Adjacency-array intersection instead of a wedge row stream (r13,
    # guide §1.2/§4.1: higher-order array ops replace a join).  The old
    # shape enumerated every oriented 2-path as a ROW (7.3 M wedges at
    # sf0.1) and semi-joined the oriented edge set to keep the 20.6 k
    # that close; this shape attaches both endpoints' oriented
    # out-neighbor arrays to each edge (arrays are O(sqrt(m)) by the
    # orientation bound — max 39 at sf0.1) and emits closing corners
    # straight from `array_intersect`, so the O(m^1.5) candidate stream
    # becomes per-row array intersections and only real triangles ever
    # materialize.  Multiset-identical: orientation is a total order,
    # so each triangle is x→y, x→z, y→z for ordered corners (x,y,z);
    # the old form found it as wedge x→y→z closed by x→z, this form as
    # edge (x,y) with z ∈ N⁺(x)∩N⁺(y) — both exactly once as (x,y,z)
    # (collect_list order is non-deterministic, but array_intersect
    # membership is order-independent).  Joins left UNHINTED: AQE
    # broadcasts adj at bench scale (~5 MB) and degrades to shuffle
    # joins when adjacency outgrows broadcast, where the array payload
    # through the exchange is O(Σdeg²) bytes — the same asymptotics the
    # wedge rows paid, minus the 16×-row materialization.  Interleaved
    # calibrated CPU A/B (6 cycles, unhinted, 100 rows bit-equal
    # first): old 5.1-8.3 vs new 3.8-6.4 CPU-s (median −25%), wall
    # 1.8-3.2 vs 1.0-1.6 s — new wins wall every cycle, CPU 5 of 6.
    adj = ow.groupBy("src").agg(F.collect_list("dst").alias("nbrs"))
    tri = (
        ow.join(
            adj.select(F.col("src").alias("a2"), F.col("nbrs").alias("na")),
            F.col("src") == F.col("a2"),
        )
        .join(
            adj.select(F.col("src").alias("b2"), F.col("nbrs").alias("nb")),
            F.col("dst") == F.col("b2"),
        )
        .select(
            F.col("src").alias("a"),
            F.col("dst").alias("b"),
            F.explode(F.array_intersect("na", "nb")).alias("c"),
        )
    )
    # Corner credit in ONE pass over the enumerated triangles: each
    # (a,b,c) row credits all three corners via explode (multiset-
    # identical to the r12 3-way unionAll).  The unionAll form reused
    # the broadcast EXCHANGES across branches but re-ran the closing
    # probe stream once per branch; r13 interleaved calibrated CPU A/B
    # (5 cycles, result-equality first): union 12.4-20.1 vs explode
    # 9.2-13.4 CPU-s, wall 3.4-4.3 vs 3.0-3.2 s — explode wins every
    # cycle.
    cnt = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("part"))
        .groupBy("part")
        .agg(F.count(F.lit(1)).cast("bigint").alias("triangles"))
    )
    return (
        cnt.join(deg.withColumnRenamed("n", "part"), "part")
        .select("part", "deg", "triangles")
        .orderBy(F.desc("triangles"), F.asc("part"))
        .limit(100)
    )
