"""Lineage-truncation modes (r7 verdict item 4).

``functions/lineage.truncate`` picks reliable ``checkpoint`` when the
SparkContext has a checkpoint dir configured and ``localCheckpoint``
otherwise.  These tests pin:

* mode selection actually follows the checkpoint-dir setting;
* the iterative operators produce IDENTICAL results under both modes
  (reliable mode runs in a SUBPROCESS so the checkpoint-dir setting —
  SparkContext-global and unremovable — can't leak into the rest of
  the suite's session);
* reliable mode really writes checkpoint files to the configured dir
  (proof the fault-tolerant path executed, not a silent fallback).
"""

from __future__ import annotations

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Iterative operators whose rounds truncate lineage: alternating-star
# components, PageRank (stationary edge frame + 5 rounds), BPE train.
_PROBE = """
import sys
from kinesis_handler_spark.session import get_spark
from kinesis_handler_spark.registry import all_queries

sf_dir, ckpt_dir = sys.argv[1], sys.argv[2]
spark = get_spark("ckpt-mode-probe", cpus=4, shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
if ckpt_dir != "-":
    spark.sparkContext.setCheckpointDir(ckpt_dir)
qs = all_queries()
for name in ("dedup_components", "graph_pagerank"):
    rows = sorted(map(tuple, qs[name](spark, sf_dir).collect()))
    print(name, hash(tuple(rows)), len(rows))
"""


def _run_probe(sf_dir: str, ckpt_dir: str) -> list[str]:
    out = subprocess.run(
        [sys.executable, "-c", _PROBE, sf_dir, ckpt_dir],
        capture_output=True,
        text=True,
        env={**os.environ, "PYTHONPATH": _REPO, "PYTHONHASHSEED": "0"},
        cwd=_REPO,
        timeout=600,
        check=True,
    )
    return [
        ln for ln in out.stdout.splitlines()
        if ln.startswith(("dedup_components", "graph_pagerank"))
    ]


def test_truncate_mode_follows_checkpoint_dir(spark, tmp_path):
    # Unit-level: with no checkpoint dir the plan is a LocalRelation-
    # backed localCheckpoint (isLocal lineage); we can't flip the
    # session's dir without leaking it, so assert only the selector
    # logic via the context's current state.
    from kinesis_handler_spark.functions.lineage import truncate

    df = spark.range(10)
    assert spark.sparkContext.getCheckpointDir() is None
    cut = truncate(df, eager=True)
    assert cut.count() == 10  # localCheckpoint path executed


_TIER_PROBE = """
import os, sys
from kinesis_handler_spark.session import get_spark
from kinesis_handler_spark.functions.lineage import truncate, truncate_loop

ckpt = sys.argv[1]
spark = get_spark("ckpt-tier-probe", cpus=2, shuffle_partitions=2)
spark.sparkContext.setLogLevel("ERROR")
spark.sparkContext.setCheckpointDir(ckpt)

def files():
    return sum(len(fs) for _, _, fs in os.walk(ckpt))

one_shot = truncate(spark.range(100), eager=True)
assert one_shot.count() == 100
print("one_shot_files", files())
loop = truncate_loop(spark.range(100), eager=True)
assert loop.count() == 100
print("loop_files", files())
"""


def test_one_shot_truncate_never_pays_a_reliable_write(tmp_path):
    """ADVICE r8: one-shot reuse barriers must stay localCheckpoint even
    when a checkpoint dir is configured — only loop-tier truncations
    (truncate_loop) write durable checkpoint data."""
    out = subprocess.run(
        [sys.executable, "-c", _TIER_PROBE, str(tmp_path / "ck")],
        capture_output=True,
        text=True,
        env={**os.environ, "PYTHONPATH": _REPO},
        cwd=_REPO,
        timeout=300,
        check=True,
    )
    stats = dict(
        ln.split() for ln in out.stdout.splitlines()
        if ln.startswith(("one_shot_files", "loop_files"))
    )
    assert stats["one_shot_files"] == "0", stats
    assert int(stats["loop_files"]) > 0, stats


def test_iterative_results_identical_in_both_modes(sf_dir, tmp_path):
    local_mode = _run_probe(sf_dir, "-")
    ckpt = tmp_path / "reliable_ckpt"
    reliable_mode = _run_probe(sf_dir, str(ckpt))
    assert local_mode == reliable_mode, (
        "iterative operators diverged between localCheckpoint and "
        f"reliable checkpoint modes:\n{local_mode}\nvs\n{reliable_mode}"
    )
    # The reliable run must have actually written checkpoint data.
    written = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(ckpt)
        for f in fs
    ]
    assert written, "reliable mode left no checkpoint files on disk"
