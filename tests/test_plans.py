"""Plan-quality regression gate: pushdown, pruning, broadcast, and
no-accidental-cartesian assertions over the whole query registry."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))


def test_all_plans_clean(spark):
    import plancheck

    problems = plancheck.audit(spark, "/root/testdata/sf0.001")
    assert not problems, "\n".join(problems)


def test_spread_if_narrow_is_conditional(spark):
    """spread_if_narrow must be a no-op (no Exchange) when the input
    already has >= defaultParallelism partitions — the unconditional
    repartition it replaced would full-shuffle a corpus-scale table."""
    from lovdata_pipeline_spark.queries import spread_if_narrow

    wide = spark.range(1000).repartition(spark.sparkContext.defaultParallelism + 4)
    assert spread_if_narrow(wide) is wide  # untouched: no Exchange added

    narrow = spark.range(1000).coalesce(1)
    spread = spread_if_narrow(narrow)
    assert spread is not narrow
    assert spread.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
