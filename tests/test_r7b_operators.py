"""Round-7b pins: the sequential conversion funnel's strict-after
gating, margin-based bitext mining, the exact-count stratified split,
the min-max quality blend, and Kneser-Ney surprisal.

Each class pins the SEMANTICS on hand-built fixtures (the driver's
oracle gate already covers sf0.01 equality); partition-independence is
asserted wherever a ranking or accumulation could leak order.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def _ts(s):
    return datetime.datetime.fromisoformat(s)


class TestFunnelGating:
    def _events(self, spark, rows):
        return spark.createDataFrame(
            [(i, _ts(t), u, e, 0.0, "{}") for i, (u, t, e) in enumerate(rows)],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )

    def test_strict_after_gating(self, spark, tmp_path):
        rows = [
            # user 1: full conversion
            (1, "2024-01-01T00:00:00", "view"),
            (1, "2024-01-01T00:10:00", "click"),
            (1, "2024-01-01T00:20:00", "purchase"),
            # user 2: click BEFORE first view -> must not convert
            (2, "2024-01-01T00:00:00", "click"),
            (2, "2024-01-01T00:10:00", "view"),
            # user 3: purchase without a gated click -> must not convert
            (3, "2024-01-01T00:00:00", "view"),
            (3, "2024-01-01T00:10:00", "purchase"),
            # user 4: click at EXACTLY the view ts -> strict after fails
            (4, "2024-01-01T00:00:00", "view"),
            (4, "2024-01-01T00:00:00", "click"),
            # user 5: never viewed -> outside the funnel entirely
            (5, "2024-01-01T00:00:00", "click"),
            (5, "2024-01-01T00:10:00", "purchase"),
        ]
        ev = self._events(spark, rows)
        out_dir = str(tmp_path / "ev")
        ev.write.parquet(out_dir + "/events.parquet")

        from lovdata_pipeline_spark.queries import events_funnel_counts

        [r] = events_funnel_counts(spark, out_dir).collect()
        assert r.n_view_users == 4
        assert r.n_click_users == 1
        assert r.n_purchase_users == 1
        assert r.conv_view_click == 0.25
        assert r.conv_click_purchase == 1.0
        assert r.conv_view_purchase == 0.25
        assert r.mean_view_to_purchase_s == 1200.0

    def test_zero_denominators_are_null(self, spark, tmp_path):
        ev = self._events(spark, [(1, "2024-01-01T00:00:00", "view")])
        out_dir = str(tmp_path / "ev0")
        ev.write.parquet(out_dir + "/events.parquet")

        from lovdata_pipeline_spark.queries import events_funnel_counts

        [r] = events_funnel_counts(spark, out_dir).collect()
        assert r.n_view_users == 1
        assert r.n_click_users == 0
        assert r.conv_click_purchase is None
        assert r.mean_view_to_purchase_s is None
