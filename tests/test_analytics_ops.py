"""Semantic gates for the round-7 wave-2 analytics operators
(queries/analytics.py + corpus_domain_token_budget in
queries/training.py).  The oracle suite owns cross-engine value
equality; these tests pin the INVARIANTS the values must satisfy —
recursion depth really is floor(log2(key)), time weights really sum to
the span, overlap counting really is symmetric-free and windowed,
skyline points really are mutually non-dominated, and the budget
really apportions to the exact total.
"""

from __future__ import annotations

from kinesis_handler_spark.registry import all_queries
from kinesis_handler_spark.tables import table


def _rows(spark, sf_dir, name):
    return all_queries()[name](spark, sf_dir).collect()


def test_recursive_depth_is_floor_log2(spark, sf_dir):
    # parent(k) = k >> 1 means depth(k) = position of k's highest set
    # bit (0 for k <= 1) — recompute in Python over the real keys and
    # compare the histogram exactly.
    keys = {
        r.p_partkey
        for r in table(spark, sf_dir, "part").select("p_partkey").collect()
        if r.p_partkey is not None
    }
    expect: dict[int, list[int]] = {}
    for k in keys:
        d = 0 if k <= 1 else k.bit_length() - 1
        expect.setdefault(d, []).append(k)
    got = {r.depth: r for r in _rows(spark, sf_dir, "sql_recursive_cte")}
    assert set(got) == set(expect)
    for d, ks in expect.items():
        assert got[d].n_keys == len(ks)
        assert got[d].min_key == min(ks)
        assert got[d].max_key == max(ks)


def test_recursive_plan_uses_native_union_loop(spark, sf_dir):
    # the point of the operator: Spark 4 executes the recursion as ONE
    # plan (UnionLoop), not a driver-side job-per-level loop
    df = all_queries()["sql_recursive_cte"](spark, sf_dir)
    plan = df._jdf.queryExecution().toString()
    assert "UnionLoop" in plan


def test_time_weighted_avg_bounds_and_weights(spark, sf_dir):
    # twa is a convex combination of observed levels => it lies within
    # [min level, max level] per user; zero-span users yield NULL
    from collections import defaultdict

    import pyspark.sql.functions as F

    lvls = defaultdict(list)
    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .groupBy("user_id", "ts")
        .agg(F.sum("value").alias("lvl"))
        .collect()
    )
    for r in e:
        lvls[r.user_id].append((r.ts, r.lvl))
    for r in _rows(spark, sf_dir, "agg_time_weighted_avg"):
        pts = lvls[r.user_id]
        assert r.n_points == len(pts)
        if r.span_us == 0:
            assert r.twa is None
            continue
        vals = [v for _, v in pts if v is not None]
        if r.twa is not None and vals:
            # floor quantization shifts the mean < 1/span below exact
            assert min(vals) - 1.0 <= r.twa <= max(vals) + 1.0


def test_interval_overlap_matches_brute_force(spark, sf_dir):
    from collections import defaultdict

    import pyspark.sql.functions as F

    byc = defaultdict(list)
    for r in (
        table(spark, sf_dir, "orders")
        .filter(
            F.col("o_custkey").isNotNull()
            & F.col("o_orderkey").isNotNull()
            & F.col("o_orderdate").isNotNull()
        )
        .select(
            "o_custkey",
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("us"),
        )
        .collect()
    ):
        byc[r.o_custkey].append((r.o_orderkey, r.us))
    lim = 30 * 24 * 3600 * 1_000_000
    expect = {}
    for c, orders in byc.items():
        n = sum(
            1
            for i, (ka, ua) in enumerate(orders)
            for kb, ub in orders[i + 1 :]
            if ka != kb and abs(ua - ub) < lim
        )
        if n:
            expect[c] = n
    got = {
        r.o_custkey: r.n_overlapping_pairs
        for r in _rows(spark, sf_dir, "join_interval_overlap")
    }
    assert got == expect


def test_skyline_points_are_mutually_non_dominated(spark, sf_dir):
    import pyspark.sql.functions as F

    rows = _rows(spark, sf_dir, "window_skyline_pareto")
    assert rows
    by_brand: dict[str, list] = {}
    for r in rows:
        by_brand.setdefault(r.p_brand, []).append(r)
    # frontier internal consistency: no point dominates another
    for pts in by_brand.values():
        for a in pts:
            for b in pts:
                dominates = (
                    a.p_size >= b.p_size
                    and a.price <= b.price
                    and (a.p_size > b.p_size or a.price < b.price)
                )
                assert not dominates, (a, b)
    # completeness: every non-frontier part is dominated by a frontier pt
    parts = (
        table(spark, sf_dir, "part")
        .filter(
            F.col("p_brand").isNotNull()
            & F.col("p_size").isNotNull()
            & F.col("p_retailprice").isNotNull()
        )
        .select("p_brand", "p_size", "p_retailprice")
        .collect()
    )
    frontier = {(r.p_brand, r.p_size, r.price) for r in rows}
    for p in parts:
        key = (p.p_brand, p.p_size, p.p_retailprice)
        if key in frontier:
            continue
        assert any(
            f.p_size >= p.p_size
            and f.price <= p.p_retailprice
            and (f.p_size > p.p_size or f.price < p.p_retailprice)
            for f in by_brand.get(p.p_brand, ())
        ), f"non-frontier part {key} not dominated"


def test_token_budget_apportions_exactly(spark, sf_dir):
    rows = _rows(spark, sf_dir, "corpus_domain_token_budget")
    assert rows
    budget = 1 << 20
    assert sum(r.alloc for r in rows) == budget
    total = sum(r.n_tok for r in rows)
    for r in rows:
        # largest-remainder allocations differ from the exact
        # proportional quota by strictly less than one whole unit
        exact = r.n_tok * budget / total
        assert exact - 1 < r.alloc < exact + 1, (r, exact)


def test_rfm_scores_partition_population(spark, sf_dir):
    import pyspark.sql.functions as F

    rows = _rows(spark, sf_dir, "agg_rfm_segmentation")
    assert rows
    for r in rows:
        assert 1 <= r.r_score <= 5
        assert 1 <= r.f_score <= 5
        assert 1 <= r.m_score <= 5
        assert r.n_customers >= 1
    # population: every customer with >=1 attributable order is scored
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey").isNotNull())
    c = table(spark, sf_dir, "customer")
    expected = (
        o.select("o_custkey")
        .distinct()
        .join(c, c.c_custkey == F.col("o_custkey"))
        .count()
    )
    assert sum(r.n_customers for r in rows) == expected


def test_abc_classes_respect_share_boundaries(spark, sf_dir):
    from collections import defaultdict

    rows = _rows(spark, sf_dir, "agg_abc_classification")
    assert rows
    brands = defaultdict(dict)
    for r in rows:
        assert r.abc_class in ("A", "B", "C")
        brands[r.p_brand][r.abc_class] = r
    for b, cls in brands.items():
        tot = sum(r.class_revenue for r in cls.values())
        if tot <= 0:
            continue
        # A alone never exceeds half the brand (the defining bound:
        # the last A part still had 2*cum <= tot); one part can
        # straddle, so allow the first B/C part's worth of slack is
        # NOT needed on the A side — the bound is exact by definition.
        if "A" in cls:
            assert cls["A"].class_revenue <= tot / 2 + 1
        if "A" in cls and "B" in cls:
            ab = cls["A"].class_revenue + cls["B"].class_revenue
            assert ab <= 0.8 * tot + 1


def test_benford_shares_sum_to_one(spark, sf_dir):
    rows = _rows(spark, sf_dir, "agg_benford_first_digit")
    assert rows
    assert all(1 <= r.digit <= 9 for r in rows)
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9
    total = sum(r.n_orders for r in rows)
    for r in rows:
        assert abs(r.share - r.n_orders / total) < 1e-12


def test_ewma_matches_python_integer_fold(spark, sf_dir):
    from collections import defaultdict
    from decimal import Decimal

    import pyspark.sql.functions as F

    # recompute the exact integer EWMA for every user from raw events
    lv = defaultdict(dict)
    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .groupBy("user_id", "ts")
        .agg(F.sum(F.col("value").cast("decimal(12,4)")).alias("lvl"))
        .select("user_id", F.unix_micros("ts").alias("us"), "lvl")
        .collect()
    )
    for r in e:
        lv[r.user_id][r.us] = (
            None if r.lvl is None else int(Decimal(r.lvl) * 10000)
        )
    got = _rows(spark, sf_dir, "window_ewma_dyadic")
    by_user = defaultdict(dict)
    for r in got:
        by_user[r.user_id][r.us] = r
    for user, seq in lv.items():
        order = sorted(seq)
        for i, us in enumerate(order):
            expect = 0
            for j in range(16):
                if i - j < 0:
                    break
                v = seq[order[i - j]]
                expect += (v or 0) * (1 << (15 - j))
            row = by_user[user][us]
            assert row.ewma_scaled == expect
            assert row.ewma == expect / 65536.0 / 10000.0


def test_concordance_contexts_reconstruct(spark, sf_dir):
    import pyspark.sql.functions as F

    docs = {
        r.doc_id: r.text.split(" ")
        for r in table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
        .collect()
    }
    rows = _rows(spark, sf_dir, "text_concordance")
    assert rows
    seen = set()
    for r in rows:
        toks = docs[r.doc_id]
        i = r.pos - 1  # 0-based
        assert toks[i] == "join"
        assert r.left_ctx == " ".join(toks[max(0, i - 3):i])
        assert r.right_ctx == " ".join(toks[i + 1:i + 4])
        seen.add((r.doc_id, r.pos))
    # completeness: every occurrence is cited exactly once
    expect = {
        (d, i + 1)
        for d, toks in docs.items()
        for i, t in enumerate(toks)
        if t == "join"
    }
    assert seen == expect


def test_filter_funnel_is_monotone_and_exact(spark, sf_dir):
    import pyspark.sql.functions as F

    rows = {r.stage: r for r in _rows(spark, sf_dir, "pipeline_filter_funnel")}
    assert sorted(rows) == [0, 1, 2, 3, 4]
    for k in range(1, 5):
        assert rows[k].n_docs <= rows[k - 1].n_docs
        assert rows[k].n_tokens <= rows[k - 1].n_tokens
    d = table(spark, sf_dir, "documents")
    assert rows[0].n_docs == d.count()
    # stage 4 = distinct texts among stage-3 survivors
    surv = (
        d.filter(
            F.col("text").isNotNull()
            & F.col("doc_id").isNotNull()
            & F.col("lang").isin("en", "de")
            & (F.size(F.split("text", " ")) >= 20)
        )
    )
    assert rows[3].n_docs == surv.count()
    assert rows[4].n_docs == surv.select("text").distinct().count()
