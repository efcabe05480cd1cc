"""Structural guard for the worker-tune wrapper (r12 VERDICT ask #6).

r12 removed the ~250 ms/task CPU tax in reused Python workers by
wrapping every Python-boundary kernel in ``tuned()`` — but the 40+
call sites were wrapped BY HAND, so nothing stopped a later round from
landing a new ``mapInPandas``/``pandas_udf`` kernel unwrapped and
silently re-paying the tax.  This lint walks the package AST and fails
on any boundary call site whose kernel is not routed through
``tuned`` (call-wrap or decorator form).
"""

from __future__ import annotations

import ast
import pathlib

_PKG = pathlib.Path(__file__).resolve().parents[1] / "kinesis_handler_spark"

#: DataFrame/cogroup methods that ship a Python kernel per partition.
_BOUNDARY_METHODS = {
    "mapInPandas",
    "applyInPandas",
    "mapInArrow",
    "applyInArrow",
}
#: UDF factories (plain call or decorator form).
_UDF_FACTORIES = {"pandas_udf", "udf", "udtf"}

#: Knowingly-exempt sites, as "relpath:lineno" — keep EMPTY unless a
#: kernel must observe pristine worker state (none today).
_ALLOWLIST: set[str] = set()


def _callee_name(func: ast.expr) -> str:
    if isinstance(func, ast.Name):
        return func.id
    if isinstance(func, ast.Attribute):
        return func.attr
    return ""


def _is_tuned_call(node: ast.expr | None) -> bool:
    return isinstance(node, ast.Call) and _callee_name(node.func) == "tuned"


def _violations() -> list[str]:
    bad: list[str] = []
    for path in sorted(_PKG.rglob("*.py")):
        rel = path.relative_to(_PKG).as_posix()
        if rel == "functions/worker_tune.py":
            continue  # the wrapper itself
        tree = ast.parse(path.read_text())
        for node in ast.walk(tree):
            # 1. df.mapInPandas(kernel, ...) and friends
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr in _BOUNDARY_METHODS
            ):
                arg = node.args[0] if node.args else None
                if not _is_tuned_call(arg):
                    bad.append(f"{rel}:{node.lineno} {node.func.attr}")
            # 2. pandas_udf(kernel, "type") with an inline kernel
            if isinstance(node, ast.Call) and _callee_name(
                node.func
            ) in _UDF_FACTORIES:
                arg = node.args[0] if node.args else None
                if isinstance(arg, ast.Lambda) or (
                    isinstance(arg, ast.Call) and not _is_tuned_call(arg)
                ):
                    bad.append(
                        f"{rel}:{node.lineno} {_callee_name(node.func)}"
                    )
            # 3. decorator form: @pandas_udf(...) must stack with @tuned
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                decos = [
                    _callee_name(d.func) if isinstance(d, ast.Call)
                    else _callee_name(d)
                    for d in node.decorator_list
                ]
                if set(decos) & _UDF_FACTORIES and "tuned" not in decos:
                    bad.append(f"{rel}:{node.lineno} @{node.name}")
    return [b for b in bad if b.split(" ")[0] not in _ALLOWLIST]


def test_every_python_boundary_kernel_is_tuned():
    bad = _violations()
    assert not bad, (
        "Python-boundary kernels not routed through tuned() — each "
        "re-pays the ~250 ms/task reused-worker tax (see "
        f"functions/worker_tune.py): {bad}"
    )


def test_lint_actually_detects_an_unwrapped_site(tmp_path, monkeypatch):
    # Prove the lint is live: an unwrapped kernel in a package copy of
    # one module must be flagged.
    probe = _PKG / "streaming" / "__init__.py"
    assert probe.exists()
    src = (
        "def f(df):\n"
        "    return df.mapInPandas(lambda it: it, 'id long')\n"
    )
    d = tmp_path / "kinesis_handler_spark"
    d.mkdir()
    (d / "naked.py").write_text(src)
    import tests.test_worker_tune_lint as me

    monkeypatch.setattr(me, "_PKG", d)
    bad = me._violations()
    assert bad == ["naked.py:2 mapInPandas"], bad
