"""Declared queries — importing this package registers every query.

Module map (mirrors SURVEY.md §2.B sections):

* :mod:`relational`  — scan/filter/project, joins, aggregations
* :mod:`windows`     — window functions, top-k per group, as-of join
* :mod:`setops`      — sorts, limits, set operations, exact dedup
* :mod:`scalars`     — scalar function library (string/date/math/array/json)
* :mod:`stats`      — moment aggregates, percentiles, listagg, unpivot
* :mod:`sources_q`   — CSV/JSON source connectors hash-checked vs parquet
* :mod:`temporal`    — batch twins of the streaming window operators
* :mod:`routing_q`   — batch-checkable projections of the routing engine
* :mod:`llm`         — text analysis, near-dedup, similarity search,
                       multimodal binary columns
* :mod:`llm_scale`   — scale-tier variants (SimHash, LSH/IVF ANN, JL,
                       codec-free decodes)
* :mod:`pipeline`    — corpus-prep compositions, sampling, anomaly/corr
* :mod:`composites`  — TPC-H-shaped composite reports, dedup pipeline
* :mod:`subqueries`  — TPC-H subquery-decorrelation shapes (Q2/Q4/Q11/
                       Q15/Q16/Q17/Q18/Q21) + SQL-entry correlated twin
* :mod:`tpch_tail`   — Q8 market share, Q9 profit, Q20 nested screen
                       (completing all 22 TPC-H patterns)
* :mod:`corpus`      — BPE-ish token accounting, benchmark contamination
* :mod:`extras`      — remaining window/dedup/scalar-subquery shapes
* :mod:`timeseries`  — gap-fill + interpolation, SCD2 intervals,
                       GROUPS-frame window emulation
* :mod:`training`    — training-data assembly: context-window packing,
                       mixture re-weighting, duplicate-span detection
* :mod:`graph_q`     — graph analytics over relational edge lists
                       (fixed-point PageRank)
* :mod:`analytics`   — recursive-CTE hierarchy walk, time-weighted
                       average, interval-overlap join, Pareto skyline,
                       RFM segmentation, ABC classes, Benford audit,
                       exact dyadic EWMA, KWIC concordance
"""

from kinesis_handler_spark.queries import (  # noqa: F401
    analytics,
    composites,
    corpus,
    extras,
    graph_q,
    llm,
    llm_scale,
    pipeline,
    relational,
    routing_q,
    scalars,
    scale_ops,
    setops,
    sources_q,
    stats,
    subqueries,
    temporal,
    timeseries,
    tpch_tail,
    training,
    windows,
)
