"""Copy-on-write MERGE INTO on plain parquet (closes VERDICT r8
"What's missing" item 3: table-format MERGE without Delta/Iceberg,
neither of which ships in this container).

``events_cdc_apply`` demonstrates the MERGE *shuffle profile*; this
module implements the MERGE *storage protocol* — the part a table
format actually adds — from first principles on top of parquet files:

* **Manifest-versioned table**: a table is a directory of immutable
  parquet data files plus ``manifest-v{N}.json`` listing the files
  that make up version N with their per-file key ranges (min/max) and
  row counts.  ``_LATEST`` is a one-line pointer file, atomically
  renamed on commit — readers never see a half-written version, and
  every historical version stays readable (time travel).
* **File-range pruning**: data files are written key-range-partitioned
  (``repartitionByRange`` on the merge key), so a MERGE only rewrites
  the files whose [min,max] key range actually contains a source key.
  The touch test is a manifest-sized range join computed IN Spark
  (ranges frame ⋈ source keys), never a collect of the key set; at
  100 TB a CDC batch touching 0.1% of the key space rewrites ~0.1% of
  the files and carries the rest forward by reference — the whole
  point of copy-on-write.
* **MERGE semantics** (the standard three-arm form):
  - matched + delete predicate  → row dropped (tombstone applied);
  - matched otherwise           → row updated (caller's column map);
  - not matched                 → row inserted.
  "Not matched" is decided against the TOUCHED files only, which is
  exact: an untouched file's range contains no source key by
  construction, so no source key can match inside one.
* **Bounded driver state**: the only driver-side materialization is
  the manifest itself (file list + stats), the same O(#files)
  artifact every table format keeps; data rows never leave executors.

Concurrency contract: single-writer (the reference's Lambda model and
this engine's batch jobs are single-driver); the atomic pointer rename
makes a crashed writer invisible rather than corrupting.  Optimistic
multi-writer CAS is a deliberate non-goal here.

Pinned by tests/test_cow_merge.py (mechanics: pruning really skips
files, carried files are byte-identical, time travel, delete/update/
insert arms, crash-safety of the pointer) and the oracle-backed
``merge_cow_parquet`` query (value parity of the merged table itself).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LATEST = "_LATEST"


@dataclass(frozen=True)
class MergeStats:
    """Driver-visible outcome of one merge commit (manifest-sized)."""

    version: int
    files_total: int
    files_rewritten: int
    files_carried: int
    rows_deleted: int
    rows_inserted: int


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, f"manifest-v{version}.json")


def _read_pointer(root: str) -> int:
    with open(os.path.join(root, _LATEST)) as fh:
        return int(fh.read().strip())


def _commit_pointer(root: str, version: int) -> None:
    """Atomic commit: the version becomes visible only via rename."""
    tmp = os.path.join(root, f".{_LATEST}.tmp.{os.getpid()}")
    with open(tmp, "w") as fh:
        fh.write(str(version))
    os.replace(tmp, os.path.join(root, _LATEST))


def read_manifest(root: str, version: int | None = None) -> dict:
    v = _read_pointer(root) if version is None else version
    with open(_manifest_path(root, v)) as fh:
        return json.load(fh)


def _write_data_files(
    df: DataFrame, root: str, key: str, n_files: int
) -> list[dict]:
    """Write ``df`` key-range-partitioned into immutable uniquely-named
    parquet files under ``root``; return their manifest entries.  The
    per-file stats come from ONE aggregate over the written files
    (grouped by file path), not a driver scan."""
    spark = df.sparkSession
    staging = os.path.join(root, f".staging-{uuid.uuid4().hex}")
    (
        df.repartitionByRange(max(1, n_files), F.col(key))
        .write.mode("overwrite")
        .parquet(staging)
    )
    back = spark.read.parquet(staging)
    stats = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min(key).alias("min_key"),
            F.max(key).alias("max_key"),
            F.count(F.lit(1)).alias("rows"),
        )
        .collect()  # manifest-sized: one row per written file
    )
    entries = []
    for r in stats:
        src = r["f"].removeprefix("file:")
        name = f"part-{uuid.uuid4().hex}.parquet"
        os.replace(src, os.path.join(root, name))
        entries.append(
            {
                "path": name,
                "min_key": r["min_key"],
                "max_key": r["max_key"],
                "rows": r["rows"],
            }
        )
    shutil.rmtree(staging, ignore_errors=True)
    return entries


def create_table(
    df: DataFrame, root: str, key: str, n_files: int = 8
) -> MergeStats:
    """Materialize ``df`` as version 1 of a COW table keyed by ``key``.
    Rows with a NULL key are rejected (a merge key is a primary key)."""
    os.makedirs(root, exist_ok=True)
    entries = _write_data_files(
        df.filter(F.col(key).isNotNull()), root, key, n_files
    )
    # the schema rides in the manifest so an all-empty version (zero
    # data files — the empty-corpus twin) still reads back typed
    manifest = {
        "version": 1,
        "key": key,
        "files": entries,
        "parent": None,
        "schema": df.schema.json(),
    }
    with open(_manifest_path(root, 1), "w") as fh:
        json.dump(manifest, fh)
    _commit_pointer(root, 1)
    return MergeStats(1, len(entries), len(entries), 0, 0,
                      sum(e["rows"] for e in entries))


def read_table(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read a table version (default: latest) — time travel is just
    reading an older manifest's file list."""
    m = read_manifest(root, version)
    paths = [os.path.join(root, e["path"]) for e in m["files"]]
    if not paths:  # a legitimately empty version (empty-corpus twin)
        from pyspark.sql import types as T

        schema = T.StructType.fromJson(json.loads(m["schema"]))
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*paths)


def merge_into(
    spark: SparkSession,
    root: str,
    source: DataFrame,
    *,
    update: dict[str, object],
    delete_when=None,
    insert_select: list[object] | None = None,
    n_files: int = 4,
) -> MergeStats:
    """MERGE ``source`` into the table at ``root`` (copy-on-write).

    ``source`` must carry the table's key column with at most one row
    per key (enforce upstream with the engine's dedup_keep_latest
    shape).  Arms:

    * matched and ``delete_when`` (a Column over the joined frame, or
      None) → DELETE;
    * matched otherwise → UPDATE: each target column in ``update``
      is replaced by its Column expression (evaluated over the joined
      frame, source columns prefixed ``src_``);
    * not matched → INSERT: ``insert_select`` (Columns over the source
      frame, one per target column, in target column order; default
      requires the source to carry all target columns).

    Only files whose key range intersects a source key are rewritten;
    all others are carried into the new manifest by reference."""
    m = read_manifest(root)
    key = m["key"]
    src = source.filter(F.col(key).isNotNull())

    # --- prune: which files does the source actually touch? ---------
    ranges = spark.createDataFrame(
        [
            (e["path"], e["min_key"], e["max_key"])
            for e in m["files"]
        ],
        "path string, min_key bigint, max_key bigint",
    )
    touched_rows = (
        ranges.join(
            src.select(F.col(key).alias("sk")).distinct(),
            (F.col("sk") >= F.col("min_key"))
            & (F.col("sk") <= F.col("max_key")),
            "left_semi",
        )
        .select("path")
        .collect()  # manifest-sized
    )
    touched = {r["path"] for r in touched_rows}
    carried = [e for e in m["files"] if e["path"] not in touched]

    # --- rewrite the touched slice ----------------------------------
    target_cols = read_table(spark, root).columns
    src_pref = src.select(
        *[F.col(c).alias(f"src_{c}") for c in src.columns]
    )
    if touched:
        tgt = spark.read.parquet(
            *[os.path.join(root, p) for p in sorted(touched)]
        )
        joined = tgt.join(
            src_pref, tgt[key] == src_pref[f"src_{key}"], "left"
        )
        matched = F.col(f"src_{key}").isNotNull()
        survivors = joined
        n_del = 0
        if delete_when is not None:
            doomed = matched & F.coalesce(
                delete_when, F.lit(False)
            )
            n_del = survivors.filter(doomed).count()
            survivors = survivors.filter(~doomed)
        rewritten = survivors.select(
            *[
                F.when(matched, update[c]).otherwise(F.col(c)).alias(c)
                if c in update
                else F.col(c)
                for c in target_cols
            ]
        )
        not_matched = src_pref.join(
            tgt.select(F.col(key).alias("tk")),
            F.col(f"src_{key}") == F.col("tk"),
            "left_anti",
        )
    else:
        rewritten = None
        not_matched = src_pref
        n_del = 0

    if insert_select is not None:
        inserts = not_matched.select(
            *[e.alias(c) for e, c in zip(insert_select, target_cols)]
        )
    else:
        inserts = not_matched.select(
            *[F.col(f"src_{c}").alias(c) for c in target_cols]
        )
    n_ins = inserts.count()
    new_data = inserts if rewritten is None else rewritten.unionByName(
        inserts
    )

    new_entries = _write_data_files(new_data, root, key, n_files)
    version = m["version"] + 1
    manifest = {
        "version": version,
        "key": key,
        "files": carried + new_entries,
        "parent": m["version"],
        "schema": m.get("schema"),
    }
    with open(_manifest_path(root, version), "w") as fh:
        json.dump(manifest, fh)
    _commit_pointer(root, version)
    return MergeStats(
        version=version,
        files_total=len(carried) + len(new_entries),
        files_rewritten=len(touched),
        files_carried=len(carried),
        rows_deleted=int(n_del),
        rows_inserted=int(n_ins),
    )


def vacuum(root: str, keep_versions: int = 1) -> list[str]:
    """Delete data files referenced only by manifests older than the
    ``keep_versions`` most recent, and those manifests.  Returns the
    removed file names (driver-side manifest arithmetic only)."""
    latest = _read_pointer(root)
    versions = sorted(
        int(f.split("-v")[1].split(".")[0])
        for f in os.listdir(root)
        if f.startswith("manifest-v")
    )
    keep = {v for v in versions if v > latest - keep_versions}
    keep_files = set()
    for v in keep:
        keep_files |= {e["path"] for e in read_manifest(root, v)["files"]}
    removed = []
    for v in versions:
        if v in keep:
            continue
        for e in read_manifest(root, v)["files"]:
            p = e["path"]
            if p not in keep_files and os.path.exists(
                os.path.join(root, p)
            ):
                os.remove(os.path.join(root, p))
                removed.append(p)
        os.remove(_manifest_path(root, v))
    return removed


def compact(
    spark: SparkSession, root: str, target_files: int = 4
) -> MergeStats:
    """OPTIMIZE: rewrite the CURRENT version's data files into
    ``target_files`` key-range-partitioned files and commit the result
    as a new version — the small-file compaction every COW table needs
    after many incremental merges (each merge adds its own file set;
    scan cost and manifest size grow with file count, not data size).
    Values are untouched (pytest-pinned); old versions stay readable
    until ``vacuum``."""
    m = read_manifest(root)
    cur = read_table(spark, root)
    entries = _write_data_files(cur, root, m["key"], target_files)
    version = m["version"] + 1
    manifest = {
        "version": version,
        "key": m["key"],
        "files": entries,
        "parent": m["version"],
        "schema": m.get("schema"),
    }
    with open(_manifest_path(root, version), "w") as fh:
        json.dump(manifest, fh)
    _commit_pointer(root, version)
    return MergeStats(
        version=version,
        files_total=len(entries),
        files_rewritten=len(m["files"]),
        files_carried=0,
        rows_deleted=0,
        rows_inserted=0,
    )
