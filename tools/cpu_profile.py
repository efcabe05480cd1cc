"""Per-query CPU profile: the noise-immune complement to bench.py.

bench.py times wall-clock, which on this sandbox swings 2-10x with
host contention (BASELINE.md, OPTIMIZATION_r12.md §13).  CPU time does
not: on local[n] every task runs inside the one JVM (plus its Python
worker children for Arrow stages), so the utime+stime delta of the JVM
process SUBTREE across a query IS that query's total task compute —
hypervisor stalls and neighbor load add wall, never CPU.  The r12
graph-rewrite adjudication used exactly this statistic ad hoc; this
tool makes it a repeatable artifact.

At 100 TB the cluster bill is total compute, not local wall — a query
that hides 30 CPU-s behind 32 idle cores at sf0.1 is exactly the one
that hurts at scale, and wall-clock ranking cannot see it.

Accounting: for every live process in the JVM's subtree (the JVM,
pyspark.daemon, python workers) sum utime+stime+cutime+cstime from
/proc/<pid>/stat.  cutime/cstime fold in REAPED children, so a worker
that dies between samples is still charged to its parent — the counter
is monotone over the subtree.  Python driver CPU (plan building, py4j)
is reported separately as ``driver_cpu``.

Methodology mirrors bench.py otherwise: same session builder, same
warm-up, noop-sink forced execution, min-of-N (default 2) per query —
run 1 absorbs codegen/JIT for that plan shape, run 2 is the steady
state.  Writes CPU_PROFILE_<tag>.json.

    PYTHONPATH=. python tools/cpu_profile.py [--sf DIR] [--runs N]
        [--tag r12] [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from kinesis_handler_spark.registry import all_queries  # noqa: E402
from kinesis_handler_spark.session import get_spark  # noqa: E402

_TICK = os.sysconf("SC_CLK_TCK")


def _stat_cpu(pid: int) -> tuple[int, float]:
    """(ppid, utime+stime+cutime+cstime seconds) for one pid; (0, 0.0)
    if the process vanished between listing and read."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as f:
            raw = f.read().decode("ascii", "replace")
    except OSError:
        return 0, 0.0
    # comm may contain spaces/parens: fields start after the LAST ')'.
    rest = raw[raw.rindex(")") + 2:].split()
    ppid = int(rest[1])
    # rest[11:15] = utime stime cutime cstime (man proc: fields 14-17).
    return ppid, sum(int(x) for x in rest[11:15]) / _TICK


def _subtree_cpu(root: int) -> float:
    """Total CPU seconds of ``root`` and every live descendant."""
    stats: dict[int, tuple[int, float]] = {}
    for entry in os.listdir("/proc"):
        if entry.isdigit():
            stats[int(entry)] = _stat_cpu(int(entry))
    children: dict[int, list[int]] = {}
    for pid, (ppid, _) in stats.items():
        children.setdefault(ppid, []).append(pid)
    total, stack = 0.0, [root]
    while stack:
        pid = stack.pop()
        if pid in stats:
            total += stats[pid][1]
            stack.extend(children.get(pid, []))
    return total


def _jvm_pid() -> int:
    """The local-mode JVM: the java child of this python process."""
    me = os.getpid()
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        pid = int(entry)
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().split(b"\0")
        except OSError:
            continue
        if cmd and b"java" in os.path.basename(cmd[0]):
            ppid, _ = _stat_cpu(pid)
            if ppid == me:
                return pid
    raise RuntimeError("no java child process found")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="default: every declared query")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--tag", default="r12")
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    spark = get_spark("cpu-profile")
    spark.sparkContext.setLogLevel("ERROR")
    jvm = _jvm_pid()
    qs = all_queries()
    names = args.names or sorted(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # bench.py's warm-up: JVM/parquet footers + Arrow worker pool.
    qs["agg_groupby_pricing"](spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id LONG"
    ).write.format("noop").mode("overwrite").save()

    me = os.getpid()
    prof: dict[str, dict[str, float]] = {}
    errs: dict[str, str] = {}
    for name in names:
        try:
            samples = []
            for _ in range(args.runs):
                # Sample BEFORE query construction, matching bench.py's
                # timed region: lazy localCheckpoints under AQE execute
                # their upstream stages at DataFrame BUILD time
                # (AdaptiveSparkPlanExec materializes on .rdd), so an
                # exec-only window misses the iterative queries' work.
                spark.sparkContext.setJobDescription(f"cpu: {name}")
                c0, d0 = _subtree_cpu(jvm), _subtree_cpu(me) - _subtree_cpu(jvm)
                w0 = time.perf_counter()
                df = qs[name](spark, args.sf)
                df.write.format("noop").mode("overwrite").save()
                wall = time.perf_counter() - w0
                c1, d1 = _subtree_cpu(jvm), _subtree_cpu(me) - _subtree_cpu(jvm)
                samples.append((c1 - c0, d1 - d0, wall))
                spark.sparkContext.setJobDescription(None)
            best = min(samples)
            prof[name] = {
                "cpu": round(best[0], 2),
                "driver_cpu": round(max(best[1], 0.0), 2),
                "wall": round(best[2], 2),
            }
            print(
                f"{prof[name]['cpu']:8.2f} cpu-s  "
                f"{prof[name]['wall']:6.2f} wall-s  {name}",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001 - survey must finish
            errs[name] = f"{type(exc).__name__}: {exc}"[:200]
            print(f"   ERROR  {name}: {errs[name]}", flush=True)

    out = {
        "metric": "per_query_jvm_subtree_cpu_seconds",
        "sf": args.sf,
        "runs": args.runs,
        "clk_tck": _TICK,
        "queries": prof,
        "errors": errs,
        "total_cpu": round(sum(v["cpu"] for v in prof.values()), 1),
    }
    path = os.path.join(_REPO, f"CPU_PROFILE_{args.tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"\nwrote {path}  total_cpu={out['total_cpu']}s")


if __name__ == "__main__":
    main()
