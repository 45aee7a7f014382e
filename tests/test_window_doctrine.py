"""The changed-code-stays-in-window doctrine, as a test (r10 VERDICT
Next #7): a query whose source fingerprint changed since the committed
manifest must either sit in the graded window (first 50 registry keys
— it re-attests this round) or carry a recorded diffcheck entry in
BENCH_AUX.json attesting the CURRENT fingerprint. A late hardening
commit that touches an out-of-window query's operator code without a
committed re-verification record now fails the suite instead of riding
on a commit-message claim.

No Spark session needed — fingerprints are static source hashes.
"""

import json
import os

# the window/records definitions are IMPORTED from the tool so the
# doctrine test and fingerprints.py's --write gate enforce with
# mechanically identical inputs (r11 review: two inline copies could
# silently diverge)
from tools.fingerprints import (
    MANIFEST,
    check_window_doctrine,
    compute_fingerprints,
    graded_window as _window,
    load_diffcheck_records as _diffcheck_records,
    load_manifest,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_manifest_exists_and_covers_registry():
    from lovdata_pipeline_spark.queries import QUERIES

    manifest = load_manifest()
    assert os.path.exists(MANIFEST), "QUERY_FINGERPRINTS.json missing"
    missing = set(QUERIES) - set(manifest)
    assert not missing, (
        f"manifest lacks {sorted(missing)} — run "
        "`python tools/fingerprints.py --write` at round end"
    )


def test_changed_code_stays_in_window_or_carries_record():
    fps_now = compute_fingerprints()
    violations = check_window_doctrine(
        fps_now, load_manifest(), _window(), _diffcheck_records()
    )
    assert not violations, (
        "queries whose source changed since the manifest but sit outside "
        f"the graded window with no recorded diffcheck: {violations} — "
        "either put them in the window, or run "
        "`python tools/diffcheck.py --record <sf_dir> <names...>` and "
        "commit BENCH_AUX.json, or (if this IS the round-end tree) "
        "refresh the manifest with `python tools/fingerprints.py --write`"
    )


def test_synthetic_violation_trips_the_checker():
    """The checker itself must catch a fabricated violation — a tail
    query whose fingerprint drifted with no record."""
    fps_now = {"a": "fp1", "b": "fp2", "c": "fp3", "d": "fp4"}
    manifest = {"a": "fp1", "b": "OLD", "c": "OLD", "d": "OLD"}
    window = {"b"}  # b changed but re-grades in-window
    records = {  # c changed but carries a passing record at the new fp
        "c": {"fingerprint": "fp3", "pass": True},
        # d's record is stale (attests a different fingerprint)
        "d": {"fingerprint": "STALE", "pass": True},
    }
    assert check_window_doctrine(fps_now, manifest, window, records) == ["d"]


def test_fingerprint_closure_reaches_module_level_operator_imports():
    """r11 review (mutation-confirmed): queries calling operators via
    queries.py's MODULE-LEVEL imports (``dedup.remove_duplicated_spans``
    with ``from ...operators import dedup`` at the top) were invisible
    to the function-body import scan — a dedup.py edit moved zero
    dedup-family fingerprints and the doctrine gate passed on an
    unverified tree. Pin the closure's reach for one query per import
    style."""
    from tools.fingerprints import query_dependency_modules

    # module-level binding style
    deps = query_dependency_modules("dedup_remove_spans")
    assert "lovdata_pipeline_spark.operators.dedup" in deps
    # function-body import style
    deps = query_dependency_modules("events_asof_join")
    assert "lovdata_pipeline_spark.operators.asof" in deps
    # and the closure must NOT collapse into the whole package via
    # queries.py itself (every fingerprint would move on any edit)
    deps = query_dependency_modules("q1_pricing_summary")
    assert "lovdata_pipeline_spark.operators.dedup" not in deps
    assert "lovdata_pipeline_spark.queries" not in deps


def test_fingerprint_closure_reaches_module_level_constants():
    """r11 ADVICE (the same bypass class as the module-level-import
    hole): queries.py module-level CONSTANTS referenced by query
    functions (BM25_TERMS, VALUE_BANDS, SAMPLE_RATES) determine
    results, so their assignment source must ride in the fingerprint.
    Pin the constant leg's reach for each named constant."""
    from tools.fingerprints import query_constant_bindings

    assert "BM25_TERMS" in query_constant_bindings("text_bm25_search")
    assert "VALUE_BANDS" in query_constant_bindings("events_range_join")
    assert "SAMPLE_RATES" in query_constant_bindings("stratified_sample_orders")
    # and no false positives: a query that references none of them
    assert not query_constant_bindings("q1_pricing_summary") & {
        "BM25_TERMS", "VALUE_BANDS", "SAMPLE_RATES"
    }


def test_constant_mutation_moves_the_fingerprint_inputs(tmp_path):
    """Mutation-style check: editing a module-level constant's VALUE
    changes the hashed inputs (the pre-r12 closure hashed nothing for
    constants, so this exact mutation was invisible to the gate)."""
    import importlib.util
    import inspect as _inspect

    from tools.fingerprints import _constant_assignments, _queries_module_refs

    def inputs(tag: str, thresh: int):
        src = (
            f"THRESH = {thresh}\n"
            "OTHER = 99\n"
            "def helper(x):\n"
            "    return x + THRESH\n"
            "def q(spark, sf):\n"
            "    return helper(1)\n"
        )
        p = tmp_path / f"qmod_{tag}.py"
        p.write_text(src)
        spec = importlib.util.spec_from_file_location(f"qmod_{tag}", p)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        cmap = _constant_assignments(mod)
        return _queries_module_refs(_inspect.getsource(mod.q), mod, cmap)

    helpers_a, consts_a = inputs("a", 3)
    helpers_b, consts_b = inputs("b", 4)
    # the constant is reached THROUGH the helper (recursion), and only
    # the referenced constant is hashed — OTHER stays out
    assert consts_a == {"THRESH": "THRESH = 3"}
    assert consts_b == {"THRESH": "THRESH = 4"}
    assert helpers_a == helpers_b  # helper source itself unchanged
    assert consts_a != consts_b  # the mutation moves the hashed inputs


def test_constant_assignment_edge_forms_are_visible(tmp_path):
    """r12 review: tuple unpacking, chained assignment, and augmented
    re-binds must all reach the gate — each was invisible to the first
    Assign-to-Name-only cut."""
    import importlib.util

    from tools.fingerprints import _constant_assignments

    p = tmp_path / "qmod_edge.py"
    p.write_text(
        "LO, HI = 30, 100000\n"
        "A = B = 7\n"
        "A += 1\n"
    )
    spec = importlib.util.spec_from_file_location("qmod_edge", p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    cmap = _constant_assignments(mod)
    assert cmap["LO"] == cmap["HI"] == "LO, HI = 30, 100000"
    # chained: BOTH names bound; augmented: A carries both segments
    assert cmap["B"] == "A = B = 7"
    assert cmap["A"] == "A = B = 7\nA += 1"


def test_sf1_sweep_evidence_matches_code_and_registry():
    """r12 review: BENCH_AUX carried 'skipped' sf1-sweep records whose
    skip texts had been deleted from SKIP_SF1_ORACLE — committed
    evidence contradicting the source, caught only by round-end
    procedure. Make it mechanical, like the fingerprint gate:

    1. the recorded skip set must equal the code's skip table, byte-
       for-byte (deleting/adding/rewording a skip forces a re-sweep);
    2. every named skip must carry a genuine hash-green @sf0.1 grade
       (the r11 fence rule — no skip without a mid-scale verdict);
    3. every SAMPLED_SF1_RUNNERS name must carry a sampled hash-green
       sf1 record, never a skip;
    4. every registry key must have a sweep record (a new query cannot
       close a round unswept), and no record may name a key the
       registry no longer has.
    """
    from tools.scaling import SAMPLED_SF1_RUNNERS, SKIP_SF1_ORACLE

    from lovdata_pipeline_spark.queries import QUERIES

    with open(os.path.join(REPO, "BENCH_AUX.json")) as fh:
        block = json.load(fh)["scaling_correctness"]
    assert block.get("sf") == "sf1"
    recs = block["queries"]
    base = {k: v for k, v in recs.items() if "@" not in k}

    recorded_skips = {k: v["skipped"] for k, v in base.items() if "skipped" in v}
    assert recorded_skips == dict(SKIP_SF1_ORACLE), (
        "sf1 skip records out of sync with SKIP_SF1_ORACLE — re-run "
        "`python tools/scaling.py --correctness --queries "
        + ",".join(sorted(set(recorded_skips) ^ set(SKIP_SF1_ORACLE)))
        + "` and commit BENCH_AUX.json"
    )
    for name in SKIP_SF1_ORACLE:
        mid = recs.get(f"{name}@sf0.1")
        assert mid and mid.get("hash_match") is True, (
            f"named skip {name} lacks a hash-green @sf0.1 grade"
        )
    for name in SAMPLED_SF1_RUNNERS:
        rec = base.get(name)
        assert rec and rec.get("sampled") and rec.get("hash_match") is True, (
            f"sampled-runner {name} lacks a hash-green sampled sf1 record"
        )
    missing = set(QUERIES) - set(base)
    assert not missing, (
        f"registry keys never swept at sf1: {sorted(missing)} — run "
        "`python tools/scaling.py --correctness --queries "
        + ",".join(sorted(missing)) + "`"
    )
    stale = set(base) - set(QUERIES)
    assert not stale, f"sweep records for removed registry keys: {sorted(stale)}"


def test_synthetic_failed_record_does_not_attest():
    fps_now = {"x": "fp"}
    manifest = {"x": "OLD"}
    records = {"x": {"fingerprint": "fp", "pass": False}}
    assert check_window_doctrine(fps_now, manifest, set(), records) == ["x"]
