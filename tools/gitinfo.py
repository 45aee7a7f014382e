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
structurally unverifiable. The verification convention instead: all
SOURCE commits land before the evidence run, so a round-end stamp is
'<final source commit>+dirty' where the dirt is the evidence files
being written — checkable by confirming the evidence commit's diff
touches only evidence artifacts (BENCH_*.json, SCALING.md,
QUERY_FINGERPRINTS.json). Fine-grained attribution rests on the
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


def tree_sha() -> str:
    """'<HEAD commit sha>' plus '+dirty' when the working tree has
    uncommitted changes; 'unknown' when git is unavailable or the
    directory is not a repository. (Field name kept as tree_sha in the
    records for continuity; see module docstring for semantics.)"""
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
        dirty = status.returncode == 0 and bool(status.stdout.strip())
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
