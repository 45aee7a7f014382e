"""Plan-quality regression gate: pushdown, pruning, broadcast, and
no-accidental-cartesian assertions over the whole query registry."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))


def test_all_plans_clean(spark):
    import plancheck

    problems = plancheck.audit(spark, "/root/testdata/sf0.001")
    assert not problems, "\n".join(problems)
