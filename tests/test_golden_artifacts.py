"""Golden-artifact gate for the deterministic rows-only queries.

text_fingerprint / dedup_simhash / embed_pca / tokenizer_bpe_train have
no SQL oracle (engine-hash / iterative algorithms, ``no_oracle`` by
contract in the driver), but each is bit-stable by construction — so
their sf0.01 output is pinned to a sha256 committed in
``golden_hashes.json`` (r7 verdict item 3: "ran and returned rows"
becomes "returned the pinned bits").

The canonicalization matches the strict oracle gate: sorted column
names + order-insensitive multiset of type-strict rendered rows.  The
pin is regenerated ONLY by an explicit
``PYTHONPATH=. python tools/make_golden.py --write`` — a failure here
means the operator's output drifted without the pin being consciously
updated.
"""

from __future__ import annotations

import json
import os

import pytest

from tools.make_golden import GOLDEN_PATH, golden_queries, golden_record

GOLDEN_QUERIES = golden_queries()


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN_PATH) as fh:
        return json.load(fh)


def test_all_golden_queries_are_pinned(golden):
    # derived from the registry: EVERY rows-only query must carry a pin,
    # so adding one without rerunning make_golden.py --write fails here
    assert sorted(golden["queries"]) == sorted(GOLDEN_QUERIES)
    assert os.path.isdir(golden["sf_dir"])


@pytest.mark.parametrize("name", GOLDEN_QUERIES)
def test_output_matches_pinned_bits(spark, golden, name):
    rec = golden_record(spark, name, golden["sf_dir"])
    pin = golden["queries"][name]
    assert rec["columns"] == pin["columns"], "output schema drifted"
    assert rec["rows"] == pin["rows"], (
        f"row count drifted: {rec['rows']} vs pinned {pin['rows']}"
    )
    assert rec["sha256"] == pin["sha256"], (
        f"{name} bits drifted from the golden pin — if the algorithm "
        "change is intentional, rerun tools/make_golden.py --write"
    )
