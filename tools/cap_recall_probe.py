"""Measure the LSH bucket cap's recall trade-off where it actually
binds (r10 verdict ask #8).

The cap (functions/lsh.py, BUCKET_CAP=64) is proven harmless at clean
test scales (no bucket truncates at sf0.01/0.1 — golden pins are
byte-identical) and is the r10 scale win at sf3.0 (dedup_simhash
93.0 s → 17.2 s).  What was missing is the NUMBER for what the win
costs: on the tiled sf3 corpus, how many verified pairs does the
capped run keep vs the uncapped run?  This probe computes, from the
SAME fingerprint/banding arithmetic the query uses (shared helpers,
not a reimplementation):

* truncated-bucket census — buckets over cap, widest bucket, members
  past the cap (one aggregation over the helper's ``truncated`` frame);
* Hamming-verified FINGERPRINT-pair recall: |capped| / |uncapped|
  (capped banding is a row-subset of uncapped banding, so capped pairs
  ⊆ uncapped pairs and the ratio IS the recall);
* expanded DOC-pair recall for the same two runs (group sizes weight
  the loss) — within-group Hamming-0 pairs are cap-independent and
  counted separately;
* FLAG coverage — the metric a dedup pipeline actually consumes: of
  the fingerprints (and docs) the uncapped run would flag as having a
  near-dup, what fraction does the capped run still flag?  Pair
  enumeration inside a stop-pattern clique is redundant for verdicts
  (any one pair flags both ends, and exact copies flag via the
  uncapped within-group path), so flag coverage is where the cap's
  real cost shows.

Writes one JSON artifact (default CAP_RECALL_r11.json); the SCALE.md
round-11 section records the headline numbers.

Usage: PYTHONPATH=. python tools/cap_recall_probe.py [sf_dir] [out_json]
Needs .fixture_cache/sf3.0 (tools/make_sf1.py .fixture_cache/sf3.0 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from kinesis_handler_spark.functions.lineage import truncate  # noqa: E402
from kinesis_handler_spark.functions.lsh import (  # noqa: E402
    BUCKET_CAP,
    cap_band_buckets,
)
from kinesis_handler_spark.queries.llm_scale import (  # noqa: E402
    simhash_banded,
    simhash_fingerprints,
    simhash_fpairs,
)
from kinesis_handler_spark.session import get_spark  # noqa: E402
from kinesis_handler_spark.tables import table  # noqa: E402


def _doc_pairs(fpairs, fp):
    cross = (
        fpairs.join(
            fp.select(F.col("simhash").alias("fa"), F.col("doc_id").alias("da")),
            "fa",
        )
        .join(
            fp.select(F.col("simhash").alias("fb"), F.col("doc_id").alias("db")),
            "fb",
        )
    )
    return cross.count()


def main(sf_dir: str, out_path: str) -> None:
    spark = get_spark("cap-recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    d = table(spark, sf_dir, "documents")
    fp = simhash_fingerprints(d).transform(truncate)
    dfp = fp.select("simhash").distinct().transform(truncate)
    banded = simhash_banded(dfp).transform(truncate)
    capped, truncated_frame = cap_band_buckets(
        banded, "simhash", ("band", "band_bits")
    )

    census_row = truncated_frame.agg(
        F.count(F.lit(1)).alias("n_buckets_over_cap"),
        F.max("width").alias("max_bucket_width"),
        F.sum(F.col("width") - F.lit(BUCKET_CAP)).alias("members_past_cap"),
    ).collect()[0]
    census = {
        "cap": BUCKET_CAP,
        "n_buckets_over_cap": int(census_row["n_buckets_over_cap"]),
        "max_bucket_width": (
            int(census_row["max_bucket_width"])
            if census_row["max_bucket_width"] is not None
            else 0
        ),
        "members_past_cap": (
            int(census_row["members_past_cap"])
            if census_row["members_past_cap"] is not None
            else 0
        ),
    }

    t0 = time.perf_counter()
    capped_fpairs = simhash_fpairs(capped).transform(truncate)
    n_capped = capped_fpairs.count()
    t_capped = time.perf_counter() - t0

    t0 = time.perf_counter()
    uncapped_fpairs = simhash_fpairs(banded).transform(truncate)
    n_uncapped = uncapped_fpairs.count()
    t_uncapped = time.perf_counter() - t0

    doc_capped = _doc_pairs(capped_fpairs, fp)
    doc_uncapped = _doc_pairs(uncapped_fpairs, fp)

    def _flagged_fps(fpairs):
        return (
            fpairs.select(F.col("fa").alias("f"))
            .unionAll(fpairs.select(F.col("fb").alias("f")))
            .distinct()
        )

    flag_capped = _flagged_fps(capped_fpairs).transform(truncate)
    flag_uncapped = _flagged_fps(uncapped_fpairs).transform(truncate)
    n_flag_capped = flag_capped.count()
    n_flag_uncapped = flag_uncapped.count()
    # doc-level: a doc is flagged iff its fingerprint is cross-group
    # flagged OR it shares its fingerprint with another doc (the
    # within-group Hamming-0 path — never capped)
    multi = (
        fp.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select(F.col("simhash").alias("f"))
    )
    def _flagged_docs(flags):
        return (
            fp.join(
                flags.unionAll(multi).distinct(),
                fp["simhash"] == F.col("f"),
                "left_semi",
            ).count()
        )

    n_doc_flag_capped = _flagged_docs(flag_capped)
    n_doc_flag_uncapped = _flagged_docs(flag_uncapped)

    # The bucket-flag rule (the ops contract the truncated frame
    # exists for): every member of an over-cap bucket is flagged as a
    # suspected stop-pattern dup.  PROVABLY capped-pairs ∪
    # bucket-members ⊇ uncapped flags — an uncapped flag came from a
    # shared bucket that is either ≤cap (both members kept, capped run
    # finds the same pair) or >cap (the member is in a truncated
    # bucket).  Measure the rule's coverage (expected 1.0) and its
    # over-flag cost (members flagged that the uncapped run wouldn't).
    trunc_members = (
        banded.join(
            truncated_frame.select("band", "band_bits"),
            ["band", "band_bits"],
            "left_semi",
        )
        .select(F.col("simhash").alias("f"))
        .distinct()
    )
    rule_flags = flag_capped.unionAll(trunc_members).distinct().transform(
        truncate
    )
    n_rule = rule_flags.count()
    n_rule_hit = (
        rule_flags.alias("r")
        .join(
            flag_uncapped.alias("u"),
            F.col("r.f") == F.col("u.f"),
            "left_semi",
        )
        .count()
    )

    result = {
        "sf_dir": sf_dir,
        "operator": "dedup_simhash",
        "bucket_census": census,
        "fpairs": {
            "capped": n_capped,
            "uncapped": n_uncapped,
            "recall": round(n_capped / n_uncapped, 6) if n_uncapped else 1.0,
            "capped_sec": round(t_capped, 2),
            "uncapped_sec": round(t_uncapped, 2),
        },
        "doc_pairs_cross_group": {
            "capped": doc_capped,
            "uncapped": doc_uncapped,
            "recall": (
                round(doc_capped / doc_uncapped, 6) if doc_uncapped else 1.0
            ),
        },
        "flag_coverage": {
            "fingerprints_flagged_capped": n_flag_capped,
            "fingerprints_flagged_uncapped": n_flag_uncapped,
            "fingerprint_recall": (
                round(n_flag_capped / n_flag_uncapped, 6)
                if n_flag_uncapped
                else 1.0
            ),
            "docs_flagged_capped": n_doc_flag_capped,
            "docs_flagged_uncapped": n_doc_flag_uncapped,
            "doc_recall": (
                round(n_doc_flag_capped / n_doc_flag_uncapped, 6)
                if n_doc_flag_uncapped
                else 1.0
            ),
        },
        "bucket_flag_rule": {
            "fingerprints_flagged": n_rule,
            "of_which_uncapped_would_flag": n_rule_hit,
            "coverage_of_uncapped_flags": (
                round(n_rule_hit / n_flag_uncapped, 6)
                if n_flag_uncapped
                else 1.0
            ),
            "over_flag_rate": (
                round((n_rule - n_rule_hit) / n_rule, 6) if n_rule else 0.0
            ),
        },
        "note": (
            "within-group Hamming-0 pairs are cap-independent and excluded"
            " from both sides; capped banding is a row-subset of uncapped,"
            " so ratios are true recalls"
        ),
    }
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    sf = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(_REPO, ".fixture_cache", "sf3.0")
    )
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        _REPO, "CAP_RECALL_r11.json"
    )
    main(sf, out)
