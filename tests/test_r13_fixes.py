"""Round-13 ADVICE closures (r12 judge findings).

- z-order: NULL / non-long-castable dimension values fail loud instead
  of flowing to a null zbucket + a poisoned "None" sidecar entry; a
  pre-guard index carrying a null-stats bucket is refused at scan time.
- z-order: bits is validated against the 16-bit spread and n_buckets
  against the 4^bits curve size.
- z-order: the range-overflow guard is subtraction-free across mixed
  signs — lo near -2^62 with a positive hi raises the rescale message
  instead of wrapping negative and slipping past the check.
- HDR: NULL values raise (consistent with the negative-value
  contract) instead of becoming a smallest-sorting null register.
- CLI: non-integer --percents tokens get the friendly exit-2 message,
  not an uncaught ValueError.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F


class TestZorderNullGuard:
    def test_null_dimension_value_raises(self, spark):
        from lovdata_pipeline_spark.operators.layout import zorder_frame

        df = spark.createDataFrame(
            [(0, 1, 1), (1, None, 2)], "id long, x long, y long"
        )
        with pytest.raises(Exception, match="zorder: NULL"):
            zorder_frame(df, "x", "y").collect()

    def test_uncastable_string_dimension_raises(self, spark):
        """A string column that doesn't cast to long fails loud either
        way: under ANSI the cast itself raises CAST_INVALID_INPUT;
        under non-ANSI it becomes NULL and the zorder guard raises."""
        from lovdata_pipeline_spark.operators.layout import zorder_frame

        df = spark.createDataFrame(
            [(0, "12", 1), (1, "not-a-number", 2)], "id long, x string, y long"
        )
        with pytest.raises(Exception, match="zorder: NULL|CAST_INVALID_INPUT"):
            zorder_frame(df, "x", "y").collect()

    def test_null_stats_sidecar_is_refused(self, spark, tmp_path):
        """An index written by a pre-guard build (null-stats 'None'
        bucket) must be refused wholesale, not silently scanned minus
        its invisible rows."""
        from lovdata_pipeline_spark.operators.layout import (
            zorder_box_scan,
            zorder_write_index,
        )

        idx = str(tmp_path / "zidx")
        df = spark.createDataFrame(
            [(i, i % 50, i % 70) for i in range(200)], "id long, x long, y long"
        )
        zorder_write_index(df, idx, "x", "y", n_buckets=16)
        sc_path = f"{idx}/_zorder_params.json"
        with open(sc_path) as fh:
            sc = json.load(fh)
        sc["buckets"]["None"] = {
            "minqx": None, "maxqx": None, "minqy": None, "maxqy": None, "n_rows": 3,
        }
        with open(sc_path, "w") as fh:
            json.dump(sc, fh)
        with pytest.raises(ValueError, match="null stats"):
            zorder_box_scan(spark, idx, 0, 65535, 0, 65535)


class TestZorderParamValidation:
    def _df(self, spark):
        return spark.createDataFrame([(1, 1, 1)], "id long, x long, y long")

    @pytest.mark.parametrize("bits", [0, 17, 32])
    def test_bits_out_of_range_raises(self, spark, bits):
        from lovdata_pipeline_spark.operators.layout import zorder_frame

        with pytest.raises(ValueError, match=r"bits must be in \[1, 16\]"):
            zorder_frame(self._df(spark), "x", "y", bits=bits)

    def test_n_buckets_above_curve_size_raises(self, spark):
        from lovdata_pipeline_spark.operators.layout import zorder_frame

        with pytest.raises(ValueError, match="4\\^bits"):
            zorder_frame(self._df(spark), "x", "y", bits=2, n_buckets=32)

    def test_small_bits_small_buckets_works(self, spark):
        from lovdata_pipeline_spark.operators.layout import zorder_frame

        df = spark.createDataFrame(
            [(i, i % 7, i % 11) for i in range(50)], "id long, x long, y long"
        )
        rows = zorder_frame(df, "x", "y", bits=3, n_buckets=4).collect()
        assert len(rows) == 50
        assert all(0 <= r["zbucket"] < 4 for r in rows)
        assert all(0 <= r["qx"] < 8 and 0 <= r["qy"] < 8 for r in rows)


class TestZorderMixedSignRange:
    def test_mixed_sign_overflow_raises_rescale_message(self, spark):
        """lo ~ -2^62, hi positive: the naive hi - lo wraps negative
        under non-ANSI long arithmetic and would slip past a
        subtraction-based guard — the subtraction-free form raises the
        intended rescale message."""
        from lovdata_pipeline_spark.operators.layout import zorder_frame

        df = spark.createDataFrame(
            [(0, -(1 << 62) + 5, 1), (1, (1 << 61), 2)], "id long, x long, y long"
        )
        with pytest.raises(Exception, match="zorder: dimension range"):
            zorder_frame(df, "x", "y").collect()

    def test_mixed_sign_in_range_quantizes(self, spark):
        """A small range straddling zero is legal and exact."""
        from lovdata_pipeline_spark.operators.layout import zorder_frame

        df = spark.createDataFrame(
            [(i, v, v * 2) for i, v in enumerate(range(-8, 9))],
            "id long, x long, y long",
        )
        rows = {r["x"]: r["qx"] for r in zorder_frame(df, "x", "y").collect()}
        # quantize replay: ((v - lo) * 2^16) // (hi - lo + 1)
        assert rows[-8] == 0
        assert rows[8] == ((8 + 8) * 65536) // 17
        assert all(0 <= q < 65536 for q in rows.values())


class TestHdrNullGuard:
    def test_null_value_raises(self, spark):
        from lovdata_pipeline_spark.operators.sketches import hdr_buckets

        df = spark.createDataFrame(
            [("g", 1), ("g", None)], "g string, v long"
        )
        with pytest.raises(Exception, match="null or negative"):
            hdr_buckets(df, "v", "g").collect()

    def test_uncastable_string_raises(self, spark):
        from lovdata_pipeline_spark.operators.sketches import hdr_buckets

        df = spark.createDataFrame(
            [("g", "12"), ("g", "oops")], "g string, v string"
        )
        with pytest.raises(Exception, match="null or negative|CAST_INVALID_INPUT"):
            hdr_buckets(df, "v", "g").collect()


class TestEvidenceStampExemption:
    def test_evidence_paths_are_exempt_source_paths_are_not(self):
        """r12 VERDICT Next #7: '+dirty' means SOURCE dirt — the
        artifacts the evidence run itself writes (record-then-commit)
        must not mark the stamp dirty, anything else must."""
        from tools.gitinfo import _is_evidence_path

        for p in (
            "BENCH_AUX.json", "BENCH_LOCAL.json", "BENCH_r13.json",
            "SCALING.md", "QUERY_FINGERPRINTS.json",
        ):
            assert _is_evidence_path(p), p
        for p in (
            "lovdata_pipeline_spark/queries.py", "bench.py",
            "tools/scaling.py", "tests/test_r13_fixes.py",
            "BENCH_notes.md", "CORRECTNESS_r12.json",
        ):
            assert not _is_evidence_path(p), p

    def test_stamp_is_clean_when_only_evidence_dirty(self, tmp_path):
        """End-to-end on a scratch repo: evidence-only dirt stamps
        clean, source dirt stamps +dirty."""
        import subprocess
        from unittest import mock

        import tools.gitinfo as gi

        r = str(tmp_path)
        run = lambda *a: subprocess.run(  # noqa: E731
            a, cwd=r, capture_output=True, text=True, check=True
        )
        run("git", "init", "-q")
        run("git", "-c", "user.email=t@t", "-c", "user.name=t",
            "commit", "-q", "--allow-empty", "-m", "x")
        head = run("git", "rev-parse", "HEAD").stdout.strip()
        with mock.patch.object(gi, "_REPO", r):
            assert gi.tree_sha() == head
            (tmp_path / "BENCH_AUX.json").write_text("{}")
            assert gi.tree_sha() == head  # evidence dirt exempt
            (tmp_path / "module.py").write_text("x = 1")
            assert gi.tree_sha() == head + "+dirty"  # source dirt


class TestCliPercentsParse:
    def test_non_integer_percents_token_exits_2(self, spark, tmp_path, capsys):
        from lovdata_pipeline_spark.cli import main

        p = tmp_path / "vals"
        spark.createDataFrame([("a", 1)], "g string, v long").write.parquet(str(p))
        rc = main(
            ["sketch", "--mode", "hdr", "--input", str(p),
             "--value-col", "v", "--percents", "50,p99"]
        )
        assert rc == 2
        assert "must be integers in [1, 100]" in capsys.readouterr().out
