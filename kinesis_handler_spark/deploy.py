"""Ship this package's source to executor Python workers.

Several operators run package code inside Arrow-batched worker stages
(`io/multimodal.py` decoders, the Misra-Gries pass in
`queries/corpus.py`, the `jsonschema` fallback in
`routing/schema_compiler.py`).  cloudpickle serializes a function that
lives in an importable module BY REFERENCE — the executor-side Python
worker must `import kinesis_handler_spark...` to unpickle it.  When the
driver process happens to run from the repo root the workers inherit
that cwd and the import accidentally succeeds; a driver launched from
any other directory (the real deployment shape: `spark-submit` from
anywhere, the external grading driver, a notebook) fails with
`ModuleNotFoundError` the moment the first Python stage runs.

The Spark-idiomatic fix — identical to what `spark-submit --py-files`
does on a 1000-executor cluster — is to ship the package archive with
:meth:`SparkContext.addPyFile`, which distributes it to every executor
and prepends it to the worker `sys.path`.  :func:`ensure_shipped` does
that lazily, once per (process, Spark application): the zip is built on
first use (~150 kB of source) and re-used for the process lifetime.

Called from the package's session-facing entry points (`tables.table`,
the routing engine, the source builders), so any driver — including a
vanilla session that never touches our `session.py` — gets a worker-
importable package without configuration.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()  # application ids already covered in this process


def _source_files() -> list[str]:
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = []
    for root, dirs, files in os.walk(pkg_dir):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for fn in sorted(files):
            if fn.endswith(".py"):
                out.append(os.path.join(root, fn))
    return sorted(out)


def _build_zip() -> str:
    """Zip this package's .py sources and return the archive path.  The
    archive root contains ``kinesis_handler_spark/`` so adding it to
    ``sys.path`` makes the package importable.

    The archive is keyed by a CONTENT hash of the sources, not the pid:
    a pid-keyed name can resolve to a stale zip after pid reuse (long
    uptimes, reboots with a persistent tmpdir), silently shipping old
    code to executors — driver/executor version skew with no error
    (ADVICE r5).  Same sources → same name → reuse is still free."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    files = _source_files()
    h = hashlib.sha256()
    for full in files:
        h.update(os.path.relpath(full, pkg_dir).encode())
        with open(full, "rb") as fh:
            h.update(fh.read())
    zpath = os.path.join(
        tempfile.gettempdir(),
        f"kinesis_handler_spark-{h.hexdigest()[:16]}.zip",
    )
    if os.path.exists(zpath):
        return zpath
    tmp = f"{zpath}.tmp.{os.getpid()}"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for full in files:
            rel = os.path.relpath(full, os.path.dirname(pkg_dir))
            zf.write(full, rel)
    os.replace(tmp, zpath)
    return zpath


def ensure_shipped(spark: SparkSession) -> None:
    """Make ``kinesis_handler_spark`` importable on executor Python
    workers of ``spark``'s application (idempotent, lazy, safe to call
    on every query build)."""
    try:
        sc = spark.sparkContext
        app_id = sc.applicationId
    except Exception:  # noqa: BLE001 - e.g. Spark Connect: no JVM-side sc
        return
    if app_id in _SHIPPED:
        return
    sc.addPyFile(_build_zip())
    _SHIPPED.add(app_id)
