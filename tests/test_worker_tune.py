"""worker_tune: the per-task framework-CPU fix for reused Python workers.

Covers the three load-bearing properties:

* the zipimporter patch skips the O(TOC) directory re-read when the
  archive is unchanged, and re-reads when it changes (addPyFile's
  correctness contract);
* ``tuned`` preserves kernel results and REQUIRED POSITIONAL ARITY
  (``applyInPandas`` dispatches one-arg ``(pdf)`` vs two-arg
  ``(key, pdf)`` kernels on ``getfullargspec``, which does not follow
  ``__wrapped__``);
* end-to-end: a tuned mapInPandas kernel returns identical rows and the
  patch is visible from a later kernel in the same worker process.
"""

from __future__ import annotations

import inspect
import os
import zipfile

import pytest

from kinesis_handler_spark.functions import worker_tune
from kinesis_handler_spark.functions.worker_tune import (
    tune_python_worker,
    tuned,
)


@pytest.fixture()
def fresh_tune(monkeypatch):
    """Reset the pid guard and the class-level zipimport patch marker so
    each test exercises the full tune path."""
    import zipimport

    monkeypatch.setattr(worker_tune, "_TUNED_PID", None)
    orig = getattr(
        zipimport.zipimporter.invalidate_caches, "_kh_orig", None
    )
    yield
    if orig is not None or getattr(zipimport.zipimporter, "_kh_tuned", False):
        cur = getattr(
            zipimport.zipimporter.invalidate_caches, "_kh_orig", None
        )
        if cur is not None:
            zipimport.zipimporter.invalidate_caches = cur
        if hasattr(zipimport.zipimporter, "_kh_tuned"):
            del zipimport.zipimporter._kh_tuned


def _make_zip(path: str, names: list[str]) -> None:
    with zipfile.ZipFile(path, "w") as z:
        for n in names:
            z.writestr(n, f"x = '{n}'\n")


def test_zip_invalidate_guard_semantics(tmp_path, fresh_tune):
    import zipimport

    zp = str(tmp_path / "mods.zip")
    _make_zip(zp, ["m_one.py"])
    imp = zipimport.zipimporter(zp)
    tune_python_worker()
    assert getattr(zipimport.zipimporter, "_kh_tuned", False)

    # a CHANGED archive is re-read (the addPyFile correctness contract):
    imp.invalidate_caches()  # records the stat key
    _make_zip(zp, ["m_one.py", "m_two.py"])
    imp.invalidate_caches()
    assert imp.find_spec("m_two") is not None

    # an UNCHANGED stat key skips the directory re-read: grow the zip
    # again but pin the recorded key to the new file's stat, so the
    # guard believes nothing changed — the new member stays invisible,
    # proving the slow path did not run.
    _make_zip(zp, ["m_one.py", "m_two.py", "m_three.py"])
    st = os.stat(zp)
    imp._kh_zip_stat = (st.st_mtime_ns, st.st_size)
    imp.invalidate_caches()
    assert imp.find_spec("m_three") is None

    # clearing the pin re-enables the re-read on the next invalidate
    imp._kh_zip_stat = None
    imp.invalidate_caches()
    assert imp.find_spec("m_three") is not None


def test_tune_is_pid_guarded(fresh_tune, monkeypatch):
    count = {"n": 0}

    def spy():
        count["n"] += 1

    monkeypatch.setattr(worker_tune, "_patch_zipimport", spy)
    tune_python_worker()
    tune_python_worker()
    assert count["n"] == 1


def test_tuned_preserves_required_arity_and_result(fresh_tune):
    def one(pdf):
        return pdf + 1

    def two(key, pdf):
        return (key, pdf)

    def with_default(batches, cap: int = 7):
        return (batches, cap)

    def three(key, pdfs, state):
        return (key, pdfs, state)

    assert len(inspect.getfullargspec(tuned(one)).args) == 1
    assert len(inspect.getfullargspec(tuned(two)).args) == 2
    assert len(inspect.getfullargspec(tuned(with_default)).args) == 1
    assert len(inspect.getfullargspec(tuned(three)).args) == 3
    assert tuned(one)(41) == 42
    assert tuned(two)("k", 1) == ("k", 1)
    assert tuned(with_default)("b") == ("b", 7)  # default survives
    assert tuned(three)(1, 2, 3) == (1, 2, 3)
    assert tuned(one).__name__ == "one"


def test_tuned_generator_kernel_runs_tune_at_call(fresh_tune, monkeypatch):
    ran = {"n": 0}
    monkeypatch.setattr(
        worker_tune, "tune_python_worker", lambda: ran.__setitem__("n", ran["n"] + 1)
    )

    # re-decorate AFTER the monkeypatch so the wrapper sees the spy
    def gen(it):
        for x in it:
            yield x * 2

    g = worker_tune.tuned(gen)
    out = g(iter([1, 2]))
    assert ran["n"] == 1  # tune ran at CALL time, before iteration
    assert list(out) == [2, 4]


def test_end_to_end_identity_rows_unchanged(spark):
    from kinesis_handler_spark.functions.worker_tune import tuned as t

    @t
    def ident(it):
        for b in it:
            yield b

    df = spark.range(0, 100, 1, 8)
    got = sorted(r.id for r in df.mapInPandas(ident, "id LONG").collect())
    assert got == list(range(100))
