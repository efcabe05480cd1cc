"""Code fingerprint for persisted derived artifacts (VERDICT r12 ask #3).

The ``.fixture_cache/<sf>/<name>`` artifacts (dedup cluster map,
quality scores, minhash band index, IVF index) are DERIVED from engine
code: if a round edits the pipeline that builds one, a stale artifact
keeps feeding its consumers on any machine that has run before, while
the equivalence tests (which rebuild fresh in tmp dirs) stay green —
silent divergence between declared output and recomputed truth.

Fix: the artifact directory name carries a fingerprint of the engine's
query/function source, so ANY code change invalidates every derived
artifact and the next run rebuilds it.  Deliberately coarse — hashing
the precise transitive closure of each builder would itself be a
maintenance hazard (a missed dependency silently re-opens the hole),
while over-invalidation only costs one rebuild per code change per
scale factor, which is exactly the production contract ("artifacts are
rebuilt when the pipeline version changes").

The INPUT-FORMAT fixture caches in ``queries/sources_q.py`` (avro/orc/
csv/COW twins of the parquet fixtures) are NOT fingerprinted: they are
deterministic format conversions of the immutable test data, not
outputs of pipeline code, and the COW roots must keep their committed
history (their tests pin time travel across snapshots).
"""

from __future__ import annotations

import functools
import hashlib
from pathlib import Path

_PKG = Path(__file__).resolve().parents[1]

#: Source roots whose content defines every derived artifact: the query
#: definitions and the shared function layer they compose.
_FP_ROOTS = ("queries", "functions", "tables.py")


@functools.lru_cache(maxsize=1)
def engine_fingerprint() -> str:
    """10-hex digest of the engine's query-defining source files."""
    h = hashlib.sha256()
    for root in _FP_ROOTS:
        p = _PKG / root
        files = sorted(p.rglob("*.py")) if p.is_dir() else [p]
        for f in files:
            h.update(f.relative_to(_PKG).as_posix().encode())
            h.update(b"\0")
            h.update(f.read_bytes())
            h.update(b"\0")
    return h.hexdigest()[:10]


def versioned_artifact_dir(cache_sf_dir: Path, name: str) -> Path:
    """``<cache_sf_dir>/<name>-<fp>`` for the CURRENT engine source,
    removing any stale fingerprint siblings (``<name>`` from the
    pre-r13 unversioned scheme, ``<name>-<otherfp>`` from older code)
    so the cache directory never accumulates dead versions.  In-flight
    tmp dirs (``.<name>.tmp.<pid>``) are untouched."""
    import shutil

    out = cache_sf_dir / f"{name}-{engine_fingerprint()}"
    if cache_sf_dir.is_dir():
        for sib in cache_sf_dir.iterdir():
            if sib == out or not sib.is_dir():
                continue
            if sib.name == name or (
                sib.name.startswith(f"{name}-")
                and len(sib.name) == len(name) + 11
            ):
                shutil.rmtree(str(sib), ignore_errors=True)
    return out
