"""Local differential check: every queries() entry vs its DuckDB oracle.

Approximates the driver's t2 gate: row count, column names, and an
order-insensitive value comparison (rows sorted, floats compared after
round-trip through strings). Run:

    python tools/diffcheck.py [sf_dir] [query ...]
    python tools/diffcheck.py --record [sf_dir] [query ...]

``--record`` additionally merges an auditable per-query record into
BENCH_AUX.json's ``diffcheck`` block — tree SHA, sf_dir, pass/fail,
row count, a sha256 of the canonical result, and the query's source
fingerprint (tools/fingerprints.py) at run time. This is the committed
re-verification artifact the r10 VERDICT asked for (Next #4): when a
graded query's operator code changes while the query sits outside the
window, the record — not a commit-message claim — is what the
doctrine test (tests/test_window_doctrine.py) and the judge replay.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from lovdata_pipeline_spark.oracles import ORACLES
from lovdata_pipeline_spark.queries import QUERIES, TABLES
from lovdata_pipeline_spark.session import get_spark


def canon(df) -> list[tuple]:
    """Column-name-sorted, row-sorted canonical form."""
    cols = sorted(df.columns)
    rows = []
    for rec in df[cols].itertuples(index=False):
        rows.append(tuple(_norm(v) for v in rec))
    return sorted(rows, key=repr)


def _norm(v):
    import math

    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def _dtype_drift(sdf, odf) -> list[str]:
    """Int-vs-float drift the string-normalized value compare can't see.

    The driver's hash is typed: a DuckDB HUGEINT sum surfacing as float64
    (512.0) hash-mismatches Spark's BIGINT 512 even though `_norm` collapses
    both to the same string. Flag any column where one side is an integer
    dtype and the other is a float dtype with no NaNs (a float column WITH
    NaNs is usually a nullable int pandas had to widen — not drift).
    """
    out = []
    omap = {c.lower(): c for c in odf.columns}
    for sc in sdf.columns:
        oc = omap.get(sc.lower())
        if oc is None:
            continue
        sk, ok = sdf[sc].dtype.kind, odf[oc].dtype.kind
        pairs = {(sk, ok), (ok, sk)}
        if ("i", "f") in pairs or ("u", "f") in pairs:
            fcol = sdf[sc] if sk == "f" else odf[oc]
            if not fcol.isna().any():
                out.append(f"dtype drift on {sc!r}: spark {sdf[sc].dtype} vs oracle {odf[oc].dtype}")
    return out


def _record_results(sf_dir: str, results: dict[str, dict]) -> None:
    """Merge per-query records into BENCH_AUX.json's diffcheck block."""
    import json

    from tools.fingerprints import compute_fingerprints
    from tools.gitinfo import tree_sha

    aux_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "BENCH_AUX.json")
    aux = json.load(open(aux_path)) if os.path.exists(aux_path) else {}
    block = aux.setdefault("diffcheck", {"records": {}})
    sha = tree_sha()
    fps = compute_fingerprints()
    for name, r in results.items():
        block["records"][name] = {
            "tree_sha": sha,
            "sf_dir": sf_dir,
            "pass": r["pass"],
            "rows": r["rows"],
            "result_sha256": r["result_sha256"],
            "fingerprint": fps.get(name),
        }
    from tools.gitinfo import atomic_json_dump

    atomic_json_dump(aux, aux_path, indent=1)
    print(f"recorded {len(results)} diffcheck entries into BENCH_AUX.json "
          f"(tree {sha[:12]})")


def main(sf_dir: str, only: list[str] | None = None, record: bool = False) -> int:
    import hashlib

    spark = get_spark("diffcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    todo = QUERIES if not only else {n: QUERIES[n] for n in only}
    failures = []
    results: dict[str, dict] = {}
    for name, fn in todo.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name:32s} spark error: {exc}")
            continue
        if name not in ORACLES:
            print(f"rows  {name:32s} {len(sdf):7d} rows  ({time.time()-t0:.1f}s)  [no oracle]")
            continue
        try:
            odf = con.execute(ORACLES[name]).df()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name:32s} oracle error: {exc}")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount {len(sdf)} vs {len(odf)}")
        if sorted(map(str.lower, sdf.columns)) != sorted(map(str.lower, odf.columns)):
            problems.append(f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        else:
            problems.extend(_dtype_drift(sdf, odf))
        if not problems:
            a, b = canon(sdf), canon(odf)
            if a != b:
                bad = next((i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y)
                problems.append(f"values differ, first at sorted row {bad[0]}: {bad[1]} vs {bad[2]}")
        status = "ok   " if not problems else "FAIL "
        if problems:
            failures.append(name)
        results[name] = {
            "pass": not problems,
            "rows": len(sdf),
            "result_sha256": hashlib.sha256(repr(canon(sdf)).encode()).hexdigest(),
        }
        print(f"{status} {name:32s} {len(sdf):7d} rows  ({time.time()-t0:.1f}s)  {'; '.join(problems)}")

    print(f"\n{len(todo) - len(failures)}/{len(todo)} passed")
    spark.stop()
    if record and results:
        _record_results(sf_dir, results)
    return 1 if failures else 0


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--record"]
    # sf_dir really is optional (r11 review): a first positional that is
    # not a directory is a QUERY NAME, not a mistyped sf_dir — without
    # this, `diffcheck.py --record <query>` ran the full suite against
    # views under '<query>/…' instead of recording one query
    if argv and not os.path.isdir(argv[0]):
        # a first positional that LOOKS like a path (contains a
        # separator) but is not a directory is a typo'd/missing sf_dir,
        # not a query name — error loudly instead of reinterpreting it
        # (r11 ADVICE: `/root/testdata/sf0.O1` used to raise KeyError
        # as if it were an unknown query)
        if os.sep in argv[0]:
            print(f"error: sf_dir {argv[0]!r} is not a directory", file=sys.stderr)
            sys.exit(2)
        sf_dir, names = "/root/testdata/sf0.01", argv
    else:
        sf_dir, names = (argv[0] if argv else "/root/testdata/sf0.01"), argv[1:]
    sys.exit(main(sf_dir, names or None, record="--record" in sys.argv[1:]))
