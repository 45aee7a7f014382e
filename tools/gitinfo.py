"""Shared provenance stamp for evidence records (r11 review).

One implementation of the source-state stamp that bench.py,
tools/scaling.py and tools/diffcheck.py all write into their records —
the three inline copies had already diverged (the diffcheck copy lost
the '+dirty' marker), and subprocess.run without a returncode check
made the 'unknown' fallback dead code (a non-repo export stamped '').

The stamp is '<HEAD commit sha>[+dirty]'. A pure tree-object hash was
tried and rejected (r11 review): evidence is produced record-then-
commit, so the stamped tree never equals any committed tree (the
commit adds the evidence file itself) and the stamp would be
structurally unverifiable.

r13 (r12 VERDICT Next #7 — clean-stamp discipline): '+dirty' now means
SOURCE dirt only. Evidence is produced record-then-commit, so the
evidence artifacts themselves (BENCH_*.json, SCALING.md,
QUERY_FINGERPRINTS.json — the same allowlist the r12 verdict used to
verify the dirt was harmless) are necessarily modified while the run
is stamping; counting that self-dirt made every round-end stamp
'+dirty' and forced the verifier to argue the ambiguity away each
round. With the exemption, a stamp is '<sha>+dirty' IFF some
non-evidence path differs from HEAD — exactly the condition that would
make the measurement unattributable. All SOURCE commits still land
before the evidence run; fine-grained attribution rests on the
per-query source fingerprints recorded alongside (tools/fingerprints).
"""

from __future__ import annotations

import json
import os
import subprocess
import tempfile

#: the repo THIS file lives in — the stamp must describe the code being
#: measured, not the caller's cwd (r11 review: every tool supports
#: any-cwd invocation, so `cd /tmp && python /root/repo/tools/... `
#: used to stamp 'unknown', or a foreign repo's HEAD)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


#: working-tree paths the stamp treats as self-dirt: the artifacts the
#: evidence run itself writes between 'record' and 'commit'. Anything
#: else differing from HEAD is SOURCE dirt and stamps '+dirty'.
_EVIDENCE_NAMES = {"SCALING.md", "QUERY_FINGERPRINTS.json"}
_EVIDENCE_PREFIXES = ("BENCH_",)


def _is_evidence_path(path: str) -> bool:
    name = os.path.basename(path.strip())
    return name in _EVIDENCE_NAMES or (
        name.startswith(_EVIDENCE_PREFIXES) and name.endswith(".json")
    )


def tree_sha() -> str:
    """'<HEAD commit sha>' plus '+dirty' when the working tree has
    uncommitted NON-EVIDENCE changes (see module docstring — the
    evidence artifacts the run itself writes are exempt, so a
    source-clean round-end run stamps the pre-write HEAD cleanly);
    'unknown' when git is unavailable or the directory is not a
    repository. (Field name kept as tree_sha in the records for
    continuity.)"""
    try:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            capture_output=True, text=True, cwd=_REPO,
        )
        if head.returncode != 0 or not head.stdout.strip():
            return "unknown"
        status = subprocess.run(
            ["git", "status", "--porcelain"],
            capture_output=True, text=True, cwd=_REPO,
        )
        dirty = False
        if status.returncode == 0:
            for line in status.stdout.splitlines():
                if not line.strip():
                    continue
                # porcelain: 'XY path' (renames: 'XY old -> new')
                path = line[3:].split(" -> ")[-1]
                if not _is_evidence_path(path):
                    dirty = True
                    break
        return head.stdout.strip() + ("+dirty" if dirty else "")
    except Exception:  # pragma: no cover - git missing entirely
        return "unknown"


def atomic_json_dump(obj, path: str, indent: int = 2, sort_keys: bool = False) -> None:
    """Write JSON via a same-directory temp file + os.replace — a plain
    open(path, 'w') truncates BEFORE the dump streams, so an interrupt
    mid-write destroys the file. BENCH_AUX.json holds EVERY committed
    evidence record in one file; it must never be half-written
    (r11 review)."""
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as fh:
            json.dump(obj, fh, indent=indent, sort_keys=sort_keys)
            fh.write("\n")
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
