"""Shared provenance stamp for evidence records (r11 review).

One implementation of the tree-SHA+dirty stamp that bench.py,
tools/scaling.py and tools/diffcheck.py all write into their records —
the three inline copies had already diverged (the diffcheck copy lost
the '+dirty' marker), and subprocess.run without a returncode check
made the 'unknown' fallback dead code (a non-repo export stamped '').

The stamp is a GENUINE git tree object hash (``git rev-parse
HEAD^{tree}``), matching the "tree_sha" field name the records carry:
two commits with identical source trees stamp the SAME value, which is
exactly the attribution evidence wants (the record is valid for any
commit whose tree matches). Map a stamped tree back to its commits
with ``git log --format='%H %T' | grep <tree>``.
"""

from __future__ import annotations

import subprocess


def tree_sha() -> str:
    """'<HEAD tree object sha>' plus '+dirty' when the working tree has
    uncommitted changes; 'unknown' when git is unavailable or the
    directory is not a repository."""
    try:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD^{tree}"], capture_output=True, text=True
        )
        if head.returncode != 0 or not head.stdout.strip():
            return "unknown"
        status = subprocess.run(
            ["git", "status", "--porcelain"], capture_output=True, text=True
        )
        dirty = status.returncode == 0 and bool(status.stdout.strip())
        return head.stdout.strip() + ("+dirty" if dirty else "")
    except Exception:  # pragma: no cover - git missing entirely
        return "unknown"
