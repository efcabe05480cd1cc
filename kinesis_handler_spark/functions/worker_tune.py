"""Per-task CPU tax removal for reused Python workers.

Measured on this engine (OPTIMIZATION_r12.md "worker tax"): EVERY
Python-boundary task — mapInPandas, applyInPandas, pandas_udf, scalar
udf, even a 1-row identity kernel — costs ~250 ms of CPU inside the
REUSED worker process, uniformly (p10 230 / p90 290 over 240 tasks).
A cProfile of ``pyspark.worker.main`` (captured via a custom daemon
module) attributes it:

* ~85%: ``worker_util.setup_spark_files`` calls
  ``importlib.invalidate_caches()`` on EVERY task, and CPython's
  ``zipimport.zipimporter.invalidate_caches`` re-reads the ENTIRE zip
  central directory each time — pyspark.zip's multi-thousand-entry TOC
  (~45 ms cold, ~12 ms warm, × one zipimporter per cached zip subpath:
  16 re-reads per task) plus the engine's own addPyFile archive.
* ~15%: ``pyspark.daemon`` runs a FULL ``gc.collect()`` after every
  task; the worker heap holds ~90k tracked objects (imports +
  framework), ~35 ms per sweep.

Neither cost does useful work on the steady state the worker actually
sees: Spark re-invalidates caches so that ``sc.addPyFile`` calls made
MID-SESSION become importable, but an unchanged zip re-read proves
nothing addPyFile needs; and the per-task gc sweep re-traces the same
immortal import heap every time.

``tune_python_worker()`` (pid-guarded, idempotent, exception-safe):

1. Wraps ``zipimport.zipimporter.invalidate_caches`` with an
   (st_mtime_ns, st_size) guard: the O(TOC) directory re-read runs
   only when the archive actually changed on disk.  Semantics are
   preserved for every real flow — a NEW zip added by addPyFile gets a
   fresh zipimporter (first read always happens), and an EXISTING zip
   rewritten in place changes mtime/size and is re-read.  This is the
   check the per-task invalidation was standing in for.
2. Runs one ``gc.collect()`` then ``gc.freeze()``: the import heap
   moves to the permanent generation, so the daemon's per-task
   ``gc.collect()`` stops re-tracing it (measured: 35 ms → <0.1 ms on
   an 87k-object worker heap).  Refcounting still frees per-task
   objects immediately; only cycles among objects alive at freeze time
   would be retained, once, per worker.

Call it at the top of a worker-side kernel — or decorate the kernel
with ``tuned`` — and the patch sticks for the life of the reused
worker (``spark.python.worker.reuse`` default), so EVERY later Python
task in that worker, from any query, skips the tax.  At 100 TB this is
not a micro-win: ~250 ms × (tasks per python stage) is pure framework
CPU — a 10k-task stage burns ~42 CPU-minutes re-reading an unchanged
zip TOC.

The driver process is never patched (the guard triggers only inside a
worker via kernel execution; importing this module patches nothing).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable

#: pid that already ran the tune — reused workers skip instantly.
_TUNED_PID: int | None = None


def _patch_zipimport() -> None:
    import zipimport

    cls = zipimport.zipimporter
    if getattr(cls, "_kh_tuned", False):  # another kernel got here first
        return
    orig = cls.invalidate_caches

    def invalidate_caches(self):  # type: ignore[no-untyped-def]
        try:
            st = os.stat(self.archive)
            key = (st.st_mtime_ns, st.st_size)
        except OSError:
            # archive unreadable/vanished: preserve stock behavior
            return orig(self)
        if getattr(self, "_kh_zip_stat", None) == key:
            return None
        out = orig(self)
        self._kh_zip_stat = key
        return out

    invalidate_caches._kh_orig = orig  # type: ignore[attr-defined]
    cls.invalidate_caches = invalidate_caches
    cls._kh_tuned = True


def tune_python_worker() -> None:
    """Apply the worker-side framework-CPU fixes once per process."""
    global _TUNED_PID
    if _TUNED_PID == os.getpid():
        return
    _TUNED_PID = os.getpid()
    try:
        _patch_zipimport()
    except Exception:  # noqa: BLE001 - never fail a task for a tune
        pass
    try:
        import gc

        gc.collect()
        gc.freeze()
    except Exception:  # noqa: BLE001
        pass


def tuned(kernel: Callable[..., Any]) -> Callable[..., Any]:
    """Decorator: run :func:`tune_python_worker` when the kernel is
    invoked (once per task; pid-guarded no-op afterwards).  Works for
    generator kernels too — the tune runs at call time, before the
    framework starts draining the generator.

    The wrapper preserves the kernel's POSITIONAL ARITY, not just its
    metadata: ``applyInPandas``/``pandas_udf`` dispatch on
    ``inspect.getfullargspec(func).args`` (one-argument ``(pdf)`` vs
    two-argument ``(key, pdf)`` grouped kernels), which does not follow
    ``__wrapped__`` — a ``*args`` wrapper raises INVALID_PANDAS_UDF."""
    import inspect

    spec = inspect.getfullargspec(kernel)
    # required positional arity: the framework calls kernels with
    # exactly their required args; defaulted trailing params (e.g. a
    # tuning cap) stay defaulted inside the wrapper.
    n = len(spec.args) - len(spec.defaults or ())
    if n == 1:

        @functools.wraps(kernel)
        def w1(a: Any) -> Any:
            tune_python_worker()
            return kernel(a)

        return w1
    if n == 2:

        @functools.wraps(kernel)
        def w2(a: Any, b: Any) -> Any:
            tune_python_worker()
            return kernel(a, b)

        return w2
    if n == 3:

        @functools.wraps(kernel)
        def w3(a: Any, b: Any, c: Any) -> Any:
            tune_python_worker()
            return kernel(a, b, c)

        return w3

    @functools.wraps(kernel)
    def wrapper(*args: Any, **kwargs: Any) -> Any:
        tune_python_worker()
        return kernel(*args, **kwargs)

    return wrapper
