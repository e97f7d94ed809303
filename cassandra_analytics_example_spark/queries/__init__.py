"""Query registry — the engine's named query surface.

Every implemented operator (SURVEY.md §2 + §7) registers here as a
``QueryDef``: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus, where
SQL-expressible, an ANSI-SQL oracle string DuckDB can run over the same
parquet tables. ``__spark_entry__.py`` re-exports the registry as the driver
contract (``queries()`` / ``oracle_sql()``).

Determinism contract (what makes the oracle hash-match possible):

* money aggregates go through exact DECIMAL (functions/numeric.py);
* hashes are md5-based (functions/text.py), never murmur/xxhash;
* every ranking has a total order (explicit key tie-breaks);
* timestamps surface as integer epoch-µs or ISO strings, never raw
  engine-native timestamps;
* column names are aliased identically on both sides.
"""

from __future__ import annotations

import hashlib
import importlib
import inspect
import json
import re
from collections.abc import Callable
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QueryDef] = {}

_MODULES = (
    "cassandra_analytics_example_spark.queries.reference",
    "cassandra_analytics_example_spark.queries.relational",
    "cassandra_analytics_example_spark.queries.events",
    "cassandra_analytics_example_spark.queries.llm",
    "cassandra_analytics_example_spark.queries.streaming",
)


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


# package imports inside a query fn body (the house style imports its
# operators locally): "from cassandra_analytics_example_spark.X import a, b"
# or the parenthesized multi-line form.
_PKG_IMPORT_RE = re.compile(
    r"from\s+(cassandra_analytics_example_spark[.\w]*)\s+import\s+"
    r"(\([^)]*\)|[^\n(]+)"
)


def _one_hop_sources(src: str, fn: Callable | None = None) -> list[str]:
    """Source text of every package symbol the query fn uses directly —
    the one-hop dependency layer.  A query whose own text is unchanged
    can still change BEHAVIOR when the operator it calls is rewritten
    (round 9's live case: q142's span operator); hashing the used
    operator sources makes the evidence fingerprint sensitive to that
    layer too.  Two resolution paths, both needed (round-9 review):

    * imports written INSIDE the fn body (the common house style) —
      parsed from ``src`` with inline comments stripped first, so a
      ``# noqa`` on an import line cannot silently drop a symbol;
    * package symbols imported at MODULE level and referenced by name in
      ``src`` (e.g. llm.py's top-level ``minhash_lsh_dedup``) — resolved
      through ``fn``'s module namespace, so a module-level-imported
      operator rewrite voids its queries' evidence exactly like a
      fn-local one.

    Plus ONE helper hop (round-10, closing the r9 verdict's two-hop
    blind spot): each resolved operator's own source is scanned for
    package functions/classes bound in the OPERATOR's module namespace
    (same-module privates like ``_bucket_pairs``, or module-level
    imports like ``md5_u60``) and their sources are hashed too — a
    helper rewrite two hops from the query now voids its evidence.  No
    deeper closure, by measurement: hashing whole operator MODULES was
    evaluated for round 10 and rejected — the defining-module blast
    radius on the live registry is 285/322 queries for
    ``queries._tables``, 36 for ``functions.numeric``, 30 for
    ``streaming.windows`` (median 5, mean 15.3 across 37 modules), so a
    one-line edit to a hub module would starve the ~50-slot driver
    window for rounds.  The helper hop voids only queries whose used
    operators actually REFERENCE the edited helper.  Deeper layers
    remain covered by the suite + parity sweep.  Resolution failures are
    skipped (the fingerprint simply omits that symbol) so load_all never
    breaks on a moved import.  ``inspect.getsource`` follows
    ``__wrapped__``, so a decorated operator (e.g. the eager rankstats
    metrics) contributes its own def site, decorator line included.
    Output is de-duplicated and sorted for determinism.

    The fingerprint MUST be a pure function of the tree, independent of
    the process's import state (round-9 second review: ``getattr`` on a
    package resolves a SUBMODULE import like ``from ...sources import
    versioned`` only after something imported it, flipping the
    fingerprint mid-process and breaking the memoized ordering) — so
    unresolved attributes fall back to ``importlib.import_module`` of
    the dotted child, which succeeds deterministically; a submodule hop
    hashes the submodule's whole source.  Comments are stripped from the
    scanned text BEFORE the import regex runs, so a ``)`` inside an
    inline comment cannot truncate a parenthesized symbol list."""
    found: dict[str, str] = {}
    objs: dict[str, object] = {}
    scan = re.sub(r"#[^\n]*", "", src)  # strip comments before matching
    for mod_name, names in _PKG_IMPORT_RE.findall(scan):
        for sym in names.strip("()").replace("\n", " ").split(","):
            sym = sym.strip()
            if not sym or sym == "register":
                continue
            sym = sym.split(" as ")[0].strip()
            try:
                obj = getattr(importlib.import_module(mod_name), sym, None)
                if obj is None:  # submodule not yet imported — resolve it
                    obj = importlib.import_module(f"{mod_name}.{sym}")
                found[f"{mod_name}.{sym}"] = inspect.getsource(obj)
                objs[f"{mod_name}.{sym}"] = obj
            except Exception:  # moved/renamed/C-level — omit, don't break
                continue
    if fn is not None:
        mod = inspect.getmodule(fn)
        for name, obj in list(vars(mod).items() if mod else []):
            if name == "register" or obj is fn:
                continue
            obj_mod = getattr(obj, "__module__", "") or ""
            if not obj_mod.startswith("cassandra_analytics_example_spark"):
                continue
            if not (inspect.isfunction(obj) or inspect.isclass(obj)):
                continue
            if not re.search(rf"\b{re.escape(name)}\b", src):
                continue
            try:
                found[f"{obj_mod}.{name}"] = inspect.getsource(obj)
                objs[f"{obj_mod}.{name}"] = obj
            except Exception:
                continue
    # helper hop: package helpers referenced by the used operators' own
    # source (see docstring — closes the two-hop rewrite blind spot
    # without module-level blast radius)
    for obj in list(objs.values()):
        if not (inspect.isfunction(obj) or inspect.isclass(obj)):
            continue
        try:
            osrc = inspect.getsource(obj)
            omod = inspect.getmodule(obj)
        except Exception:
            continue
        oscan = re.sub(r"#[^\n]*", "", osrc)
        for name, hobj in list(vars(omod).items() if omod else []):
            hmod = getattr(hobj, "__module__", "") or ""
            if not hmod.startswith("cassandra_analytics_example_spark"):
                continue
            if not (inspect.isfunction(hobj) or inspect.isclass(hobj)):
                continue
            if hobj is obj or f"{hmod}.{name}" in found:
                continue
            if not re.search(rf"\b{re.escape(name)}\b", oscan):
                continue
            try:
                found[f"{hmod}.{name}"] = inspect.getsource(hobj)
            except Exception:
                continue
    return [found[k] for k in sorted(found)]


def _fingerprint(qd: QueryDef) -> str:
    """Content fingerprint of a query's checkable surface: the function's
    source text (which, for ``@register``-decorated defs, includes the
    decorator call and therefore the oracle SQL), the oracle string
    explicitly, and the one-hop operator layer (``_one_hop_sources``).
    Driver evidence is evidence FOR this fingerprint — a row recorded
    against different source text proves nothing about the current code,
    so the evidence ordering voids it (see ``_effective_round``).
    Conservative by design: a comment-only edit also re-queues the query,
    which only costs one re-check.  MUST stay in lockstep with the
    inlined extractor in ``tools/stamp_evidence.py``, which replays this
    formula inside historical trees."""
    try:
        src = inspect.getsource(qd.fn)
    except (OSError, TypeError):  # source unavailable (REPL, C callable)
        src = qd.fn.__qualname__
    parts = [src, qd.oracle or ""] + _one_hop_sources(src, qd.fn)
    return hashlib.sha256("\x00".join(parts).encode()).hexdigest()


def _effective_round(
    qd: QueryDef,
    latest: dict[str, tuple[int, dict]],
    snap: dict | None,
) -> int:
    """Evidence rank for the ordering sort — lowest sorts first.

    -2  never driver-green at all (new registrations: they MUST land in
        the next driver window);
    -1  driver-green, but the fn/oracle CHANGED since that row landed
        (``EVIDENCE_FINGERPRINTS.json``, stamped per round by
        ``tools/stamp_evidence.py``, records the as-checked fingerprint;
        a mismatch voids the evidence — round 8's q23 rewrite shipped
        with an r4 driver row, exactly the staleness this closes);
     N  otherwise, the round of the latest green row (stalest first).

    A query absent from the snapshot but with green evidence keeps its
    round rank: the stamp tool covers every green query each time it
    runs, so absence means the tool hasn't seen that round yet — treat
    the evidence as current rather than re-queueing the whole registry.
    """
    r = _verification_round(qd.name, qd.oracle is not None, latest)
    if r == -1:
        return -2
    if snap is not None and snap.get("fingerprint") != _fingerprint(qd):
        return -1
    return r


def _verification_round(
    name: str, has_oracle: bool, records: dict[str, tuple[int, dict]]
) -> int:
    """Latest round in which ``name`` got a driver-green CORRECTNESS row.

    Green = full three-gate pass (rows + schema + hash), or — for queries that
    declare no oracle (streaming, iterative) — the weaker rows-only check the
    driver records for them.  A rows-only row does NOT count for a query that
    currently declares an oracle (e.g. one upgraded from rows-only to
    oracle-checked): it needs a fresh hash-green row.  Returns -1 for
    never-verified.
    """
    rnd, row = records.get(name, (-1, {}))
    if not row:
        return -1
    if row.get("hash_match"):
        return rnd
    if (
        not has_oracle
        and row.get("err") == "no_oracle"
        and row.get("spark_rows") is not None
    ):
        return rnd
    return -1


def _evidence_order(names: list[str]) -> list[str]:
    """Order query names so the driver's bounded CORRECTNESS sample lands on
    the entries that need evidence most.

    The per-round driver checks roughly the first 50 entries of ``queries()``
    in dict order.  We therefore sort by (evidence rank asc, registration
    order): never-verified queries first, then queries whose fn/oracle
    changed since their last driver row (the row is evidence for OLD code —
    see ``_effective_round``), then the stalest evidence.  Computed from the
    ``CORRECTNESS_r*.json`` artifacts plus the ``EVIDENCE_FINGERPRINTS.json``
    snapshot at the repo root, so it self-maintains: whatever a round leaves
    unverified or rewrites floats to the front of the next round's window.
    """
    root = Path(__file__).resolve().parents[2]
    try:
        snapshot = json.loads(
            (root / "EVIDENCE_FINGERPRINTS.json").read_text()
        )
    except (OSError, json.JSONDecodeError):
        snapshot = {}
    latest: dict[str, tuple[int, dict]] = {}
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            rnd = int(path.stem.split("_r")[-1])
            rows = json.loads(path.read_text())
        except (ValueError, OSError, json.JSONDecodeError):
            continue
        for name, row in rows.items():
            # keep the latest round that actually produced a green row so a
            # later red round doesn't mask earlier green evidence
            prev = latest.get(name)
            green = bool(row.get("hash_match")) or (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            )
            if green and (prev is None or rnd > prev[0]):
                latest[name] = (rnd, row)
    pos = {n: i for i, n in enumerate(names)}
    return sorted(
        names,
        key=lambda n: (
            _effective_round(REGISTRY[n], latest, snapshot.get(n)),
            pos[n],
        ),
    )


_LOAD_ALL_CACHE: tuple[tuple, tuple[str, ...]] | None = None


def load_all() -> dict[str, QueryDef]:
    """Registry in evidence order (see ``_evidence_order``).

    The ordering is memoized per process: the fingerprint pass reads ~320
    function sources plus their one-hop imports (~3 s), and the driver
    contract calls ``load_all`` three times per run (entry / queries /
    oracle_sql).  The inputs — committed CORRECTNESS/fingerprint
    artifacts and the registered sources — cannot change within a
    process, so the cache is safe.  Keyed on the identity of every
    registered QueryDef in registration order (not just the registry
    SIZE — a same-size replacement, e.g. a test monkeypatching a
    REGISTRY entry, must invalidate too; round-9 ADVICE)."""
    global _LOAD_ALL_CACHE
    for mod in _MODULES:
        importlib.import_module(mod)
    key = tuple(id(qd) for qd in REGISTRY.values())
    if _LOAD_ALL_CACHE is not None and _LOAD_ALL_CACHE[0] == key:
        return {name: REGISTRY[name] for name in _LOAD_ALL_CACHE[1]}
    ordered = _evidence_order(list(REGISTRY))
    _LOAD_ALL_CACHE = (key, tuple(ordered))
    return {name: REGISTRY[name] for name in ordered}
