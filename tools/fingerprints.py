"""Per-query source fingerprints — the changed-code-stays-in-window gate.

Each registry query gets a fingerprint hashing every piece of source
that determines its result:

- the query function's own source (and, recursively, any queries.py
  module-level helper it references),
- the FULL source of every ``lovdata_pipeline_spark`` module in the
  transitive import closure of the function body (queries import their
  operators locally, so the function AST names its direct deps),
- its DuckDB oracle SQL.

``QUERY_FINGERPRINTS.json`` (committed) records each query's
fingerprint as of its last attestation. The doctrine test
(tests/test_window_doctrine.py) fails when a query's fingerprint
changed but the query is neither in the graded window (first 50 keys —
it will re-attest this round) nor covered by a recorded diffcheck run
carrying the CURRENT fingerprint in BENCH_AUX.json's ``diffcheck``
block (tools/diffcheck.py --record). This makes the r10 failure mode —
late hardening commits touching operator code after the round's grade,
with only a commit-message claim of re-verification — a mechanically
detected violation (r10 VERDICT Next #4/#7).

Usage:
    python tools/fingerprints.py            # print drift vs manifest
    python tools/fingerprints.py --write    # rewrite the manifest
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import json
import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "lovdata_pipeline_spark"
MANIFEST = os.path.join(REPO, "QUERY_FINGERPRINTS.json")


def _module_path(mod: str) -> str | None:
    """Dotted package module name -> source file path (static, no import)."""
    rel = mod.replace(".", os.sep)
    for cand in (
        os.path.join(REPO, rel + ".py"),
        os.path.join(REPO, rel, "__init__.py"),
    ):
        if os.path.exists(cand):
            return cand
    return None


def _imports_of_source(src: str) -> set[str]:
    """Package-internal module names imported anywhere in ``src``."""
    out: set[str] = set()
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name.startswith(PKG):
                    out.add(a.name)
        elif isinstance(node, ast.ImportFrom) and node.module:
            if not node.module.startswith(PKG):
                continue
            # `from pkg.mod import name` -> pkg.mod, unless the imported
            # name is itself a submodule (`from pkg import embedding`)
            if _module_path(node.module) is not None:
                out.add(node.module)
            for a in node.names:
                sub = f"{node.module}.{a.name}"
                if _module_path(sub) is not None:
                    out.add(sub)
    return out


def _closure(mods: set[str], cache: dict[str, set[str]]) -> set[str]:
    """Transitive package-import closure over module names."""
    seen: set[str] = set()
    todo = list(mods)
    while todo:
        m = todo.pop()
        if m in seen:
            continue
        seen.add(m)
        if m not in cache:
            path = _module_path(m)
            cache[m] = (
                _imports_of_source(open(path).read()) if path is not None else set()
            )
        todo.extend(cache[m] - seen)
    return seen


_MISSING = object()


def _constant_assignments(qmod) -> dict[str, str]:
    """queries.py module-level assignment source per target name — the
    raw ``NAME = <expr>`` segment. Feeds the constant leg of
    ``_queries_module_refs``; kept separate so it is computed once per
    manifest run, not once per query."""
    src = inspect.getsource(qmod)
    tree = ast.parse(src)
    out: dict[str, str] = {}

    def names_of(target) -> list[ast.Name]:
        # r12 review: tuple unpacking (`LO, HI = 30, 100000`) and
        # starred targets must not slip through the gate — every Name
        # reachable in the target structure maps to the whole segment
        if isinstance(target, ast.Name):
            return [target]
        if isinstance(target, (ast.Tuple, ast.List)):
            return [n for e in target.elts for n in names_of(e)]
        if isinstance(target, ast.Starred):
            return names_of(target.value)
        return []

    for node in tree.body:
        if isinstance(node, ast.Assign):
            targets = [n for t in node.targets for n in names_of(t)]
        elif isinstance(node, (ast.AnnAssign, ast.AugAssign)):
            targets = names_of(node.target)
        else:
            continue
        seg = ast.get_source_segment(src, node)
        if seg is None:  # pragma: no cover - synthesized source only
            continue
        for t in targets:
            # chained/augmented re-binds: concatenate every assignment
            # touching the name, so `A = B = expr` and a later
            # `A += ...` each contribute (and query_constant_bindings
            # stays name-keyed, not value-keyed)
            out[t.id] = (out[t.id] + "\n" + seg) if t.id in out else seg
    return out


def _queries_module_refs(
    fn_src: str, qmod, const_map: dict[str, str]
) -> tuple[dict[str, str], dict[str, str]]:
    """({helper name: source}, {constant name: assignment source}) of queries.py
    module-level bindings the function references, recursively through
    both helpers and constants — changes to a shared helper OR a
    module-level constant (BM25_TERMS, VALUE_BANDS, SAMPLE_RATES …)
    change query results, so they must move every dependent query's
    fingerprint. The constant leg closes the r11 ADVICE bypass: editing
    a referenced constant used to produce zero fingerprint drift, the
    same hole class as the module-level-import miss."""
    import types

    helpers: dict[str, str] = {}
    consts: dict[str, str] = {}

    def visit(src: str) -> None:
        for node in ast.walk(ast.parse(textwrap.dedent(src))):
            if not isinstance(node, ast.Name):
                continue
            nid = node.id
            if nid in helpers or nid in consts:
                continue
            obj = getattr(qmod, nid, _MISSING)
            if obj is _MISSING:
                continue
            if getattr(obj, "__module__", None) == qmod.__name__ and (
                inspect.isfunction(obj) or inspect.isclass(obj)
            ):
                try:
                    hsrc = inspect.getsource(obj)
                except (OSError, TypeError):  # pragma: no cover
                    continue
                helpers[nid] = hsrc
                visit(hsrc)
            elif nid in const_map and not isinstance(obj, types.ModuleType):
                # module bindings are the _module_level_deps leg; a
                # non-callable, non-module module-level binding is a
                # constant — hash its assignment source
                consts[nid] = const_map[nid]
                visit(const_map[nid])

    visit(fn_src)
    return helpers, consts


def _module_level_deps(src: str, qmod) -> set[str]:
    """Package modules reached through queries.py MODULE-LEVEL bindings
    referenced by ``src`` — e.g. ``dedup.remove_duplicated_spans(...)``
    where queries.py has ``from ...operators import dedup`` at the top.
    The function-body import scan alone misses these (~51 call sites),
    which silently exempted the whole dedup/textstats family from the
    changed-code doctrine gate (r11 review, mutation-confirmed)."""
    import types

    mods: set[str] = set()
    for node in ast.walk(ast.parse(textwrap.dedent(src))):
        if not isinstance(node, ast.Name):
            continue
        obj = getattr(qmod, node.id, None)
        if obj is None:
            continue
        if isinstance(obj, types.ModuleType):
            modname = getattr(obj, "__name__", "")
        else:
            modname = getattr(obj, "__module__", "") or ""
        # queries.py itself is EXCLUDED: its helpers are hashed
        # source-wise by _queries_module_refs, and admitting it here
        # would closure in the whole package (queries.py imports every
        # operator module), collapsing all fingerprints into one
        if modname.startswith(PKG) and modname != qmod.__name__:
            mods.add(modname)
    return mods


def _query_inputs(
    fn_src: str, qmod, const_map: dict[str, str]
) -> tuple[list[str], list[str], set[str]]:
    """(helper sources, constant sources, direct module deps) — the
    three legs every fingerprint hashes, shared by compute_fingerprints
    and the doctrine-test introspection hooks. Sources are returned in
    name-sorted order so the hash is deterministic."""
    hmap, cmap = _queries_module_refs(fn_src, qmod, const_map)
    helpers = [hmap[k] for k in sorted(hmap)]
    consts = [cmap[k] for k in sorted(cmap)]
    mods = _imports_of_source(textwrap.dedent(fn_src))
    mods |= _module_level_deps(fn_src, qmod)
    for s in helpers + consts:
        mods |= _imports_of_source(textwrap.dedent(s))
        mods |= _module_level_deps(s, qmod)
    return helpers, consts, mods


def query_dependency_modules(name: str) -> set[str]:
    """The closed set of package modules a query's fingerprint hashes —
    exposed so the doctrine test can pin the closure's reach (the
    module-level-import hole was invisible until mutation-tested)."""
    import lovdata_pipeline_spark.queries as qmod
    from lovdata_pipeline_spark.queries import QUERIES

    fn_src = inspect.getsource(QUERIES[name])
    _, _, mods = _query_inputs(fn_src, qmod, _constant_assignments(qmod))
    return _closure(mods, {})


def query_constant_bindings(name: str) -> set[str]:
    """Names of queries.py module-level CONSTANTS a query's fingerprint
    hashes — exposed so the doctrine test can pin the constant leg's
    reach (r11 ADVICE: this leg did not exist, so constant edits were
    invisible to the gate)."""
    import lovdata_pipeline_spark.queries as qmod
    from lovdata_pipeline_spark.queries import QUERIES

    const_map = _constant_assignments(qmod)
    fn_src = inspect.getsource(QUERIES[name])
    _, consts = _queries_module_refs(fn_src, qmod, const_map)
    return set(consts)


def compute_fingerprints() -> dict[str, str]:
    import lovdata_pipeline_spark.queries as qmod
    from lovdata_pipeline_spark.oracles import ORACLES
    from lovdata_pipeline_spark.queries import QUERIES

    cache: dict[str, set[str]] = {}
    const_map = _constant_assignments(qmod)
    out: dict[str, str] = {}
    for name, fn in QUERIES.items():
        fn_src = inspect.getsource(fn)
        helpers, consts, mods = _query_inputs(fn_src, qmod, const_map)
        h = hashlib.sha256()
        h.update(fn_src.encode())
        for src in helpers:
            h.update(src.encode())
        for src in consts:
            h.update(src.encode())
        for m in sorted(_closure(mods, cache)):
            path = _module_path(m)
            if path is not None:
                h.update(m.encode())
                h.update(open(path, "rb").read())
        h.update(ORACLES.get(name, "").encode())
        out[name] = h.hexdigest()
    return out


def load_manifest() -> dict[str, str]:
    if not os.path.exists(MANIFEST):
        return {}
    return json.load(open(MANIFEST))


def graded_window() -> set[str]:
    """The driver's graded window: the FIRST 50 registry keys. One
    definition shared by the doctrine test and the --write gate — two
    inline copies could silently diverge (r11 review)."""
    from lovdata_pipeline_spark.queries import QUERIES

    return set(list(QUERIES)[:50])


def load_diffcheck_records() -> dict[str, dict]:
    """BENCH_AUX.json's committed diffcheck records (see
    tools/diffcheck.py --record). Shared by the doctrine test and the
    --write gate."""
    aux_path = os.path.join(REPO, "BENCH_AUX.json")
    if not os.path.exists(aux_path):
        return {}
    return json.load(open(aux_path)).get("diffcheck", {}).get("records", {})


def check_window_doctrine(
    fps_now: dict[str, str],
    manifest: dict[str, str],
    window: set[str],
    diffcheck_records: dict[str, dict],
) -> list[str]:
    """Return doctrine violations: queries whose source fingerprint
    changed since the committed manifest while sitting OUTSIDE the
    graded window, with no recorded diffcheck run attesting the
    current fingerprint. Empty list = compliant tree."""
    violations = []
    for name, fp in fps_now.items():
        if manifest.get(name) == fp:
            continue  # unchanged since last attestation
        if name in window:
            continue  # re-grades this round
        rec = diffcheck_records.get(name)
        if rec and rec.get("fingerprint") == fp and rec.get("pass"):
            continue  # re-verified after the change, record committed
        violations.append(name)
    return violations


def main(argv: list[str]) -> int:
    fps = compute_fingerprints()
    if "--write" in argv:
        # The manifest is the doctrine test's baseline, so rewriting it
        # in the same change that touches an out-of-window query's code
        # would make the gate vacuous (r11 review). Refuse unless every
        # drifted out-of-window query carries a passing diffcheck
        # record at its NEW fingerprint; --force overrides (e.g. for a
        # deliberate re-baseline, which should say so in the commit).
        if "--force" not in argv:
            violations = check_window_doctrine(
                fps, load_manifest(), graded_window(), load_diffcheck_records()
            )
            if violations:
                print(
                    "REFUSING --write: out-of-window queries drifted with no "
                    f"passing diffcheck record at the new fingerprint: {violations}\n"
                    "run `python tools/diffcheck.py --record <sf_dir> <names...>` "
                    "first (or --force for a deliberate re-baseline)"
                )
                return 1
        # atomic: the manifest is the doctrine test's committed
        # baseline — an interrupt mid-write must not truncate it
        # (r11 ADVICE; plain open(,'w') truncates before the dump)
        from tools.gitinfo import atomic_json_dump

        atomic_json_dump(fps, MANIFEST, indent=1, sort_keys=True)
        print(f"wrote {len(fps)} fingerprints to {MANIFEST}")
        return 0
    old = load_manifest()
    drift = [k for k in fps if old.get(k) != fps[k]]
    for k in drift:
        print(f"CHANGED {k}")
    print(f"{len(drift)} changed / {len(fps)} total")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
