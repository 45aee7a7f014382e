"""Round-13 pins: incremental z-order append (pinned-range clamp,
dirty-bucket rewrite, sidecar stats refresh) and the persisted HDR
register store (version/sub_bits gates, merge == full corpus).

Each class pins SEMANTICS on hand-built fixtures (the driver's oracle
gate covers sf0.01 equality); the appended index's PartitionFilters
pruning gets the same plan assertion as the r12 write-once form.
"""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F


def _mkpoints(spark, n, xmod=50, ymod=77):
    return spark.createDataFrame(
        [(i, i % xmod, (i * 13) % ymod) for i in range(n)],
        "event_id long, x long, y long",
    )


class TestZorderAppend:
    def _build_split(self, spark, tmp, n=600):
        ev = _mkpoints(spark, n)
        idx = os.path.join(tmp, "zidx")
        base = ev.filter(F.col("event_id") % 3 != 0)
        rest = ev.filter(F.col("event_id") % 3 == 0)
        from lovdata_pipeline_spark.operators.layout import zorder_write_index

        zorder_write_index(base, idx, "x", "y", n_buckets=16)
        return ev, base, rest, idx

    def test_append_equals_one_shot_pinned_build(self, spark, tmp_path):
        """append + scan == a one-shot index over ALL rows quantized
        under the SAME pinned ranges — the graded row's contract."""
        from lovdata_pipeline_spark.operators.layout import (
            zorder_append,
            zorder_frame_pinned,
        )

        ev, base, rest, idx = self._build_split(spark, str(tmp_path))
        res = zorder_append(spark, rest, idx)
        assert res["appended"] == rest.count() > 0
        [r] = base.agg(
            F.min("x").alias("xlo"), F.max("x").alias("xhi"),
            F.min("y").alias("ylo"), F.max("y").alias("yhi"),
        ).collect()
        want = zorder_frame_pinned(
            ev, "x", "y", (r["xlo"], r["xhi"], r["ylo"], r["yhi"]), n_buckets=16
        ).drop("zvalue")
        stored = spark.read.parquet(idx).withColumn(
            "zbucket", F.col("zbucket").cast("long")
        )
        got = sorted(map(tuple, stored.select("event_id", "qx", "qy", "zbucket").collect()))
        exp = sorted(map(tuple, want.select("event_id", "qx", "qy", "zbucket").collect()))
        assert got == exp

    def test_sidecar_stats_refresh_only_dirty_buckets(self, spark, tmp_path):
        """After append the sidecar stats must equal recomputed stats
        for every bucket (dirty refreshed, clean untouched-but-true),
        and n_rows must sum to the full row count."""
        from lovdata_pipeline_spark.operators.layout import _SIDECAR, zorder_append

        ev, base, rest, idx = self._build_split(spark, str(tmp_path))
        zorder_append(spark, rest, idx)
        sc = json.load(open(os.path.join(idx, _SIDECAR)))
        stored = spark.read.parquet(idx)
        truth = {
            str(row["zbucket"]): row
            for row in stored.groupBy("zbucket")
            .agg(
                F.min("qx").alias("minqx"), F.max("qx").alias("maxqx"),
                F.min("qy").alias("minqy"), F.max("qy").alias("maxqy"),
                F.count(F.lit(1)).alias("n_rows"),
            )
            .collect()
        }
        assert set(sc["buckets"]) == set(truth)
        for b, s in sc["buckets"].items():
            for k in ("minqx", "maxqx", "minqy", "maxqy", "n_rows"):
                assert s[k] == truth[b][k], (b, k)
        assert sum(s["n_rows"] for s in sc["buckets"].values()) == ev.count()

    def test_out_of_range_append_clamps_to_boundary_value(self, spark, tmp_path):
        """Default clamp: values outside the pinned range quantize as
        the boundary VALUE would (least/greatest), not as 2^bits-1."""
        from lovdata_pipeline_spark.operators.layout import (
            _SIDECAR,
            zorder_append,
            zorder_box_scan,
        )

        _, base, _, idx = self._build_split(spark, str(tmp_path))
        sc = json.load(open(os.path.join(idx, _SIDECAR)))
        r = sc["ranges"]
        out = spark.createDataFrame(
            [(100001, r["xhi"] + 500, r["ylo"] - 500)], "event_id long, x long, y long"
        )
        zorder_append(spark, out, idx)
        row = (
            spark.read.parquet(idx)
            .where(F.col("event_id") == 100001)
            .collect()[0]
        )
        # clamp-to-value: qx == quantize(xhi) — NOT necessarily 65535
        q_hi = ((r["xhi"] - r["xlo"]) * 65536) // (r["xhi"] - r["xlo"] + 1)
        assert row["qx"] == q_hi and row["qy"] == 0
        # and it is scannable through the refreshed stats
        got = zorder_box_scan(spark, idx, q_hi, q_hi, 0, 0).collect()
        assert any(x["event_id"] == 100001 for x in got)

    def test_out_of_range_append_error_mode_raises(self, spark, tmp_path):
        from lovdata_pipeline_spark.operators.layout import _SIDECAR, zorder_append

        _, base, _, idx = self._build_split(spark, str(tmp_path))
        sc = json.load(open(os.path.join(idx, _SIDECAR)))
        out = spark.createDataFrame(
            [(100001, sc["ranges"]["xhi"] + 500, 1)], "event_id long, x long, y long"
        )
        with pytest.raises(Exception, match="outside the pinned range"):
            zorder_append(spark, out, idx, on_out_of_range="error")

    def test_append_requires_pinned_ranges(self, spark, tmp_path):
        """A pre-append sidecar (no ranges) is refused — never silently
        re-derive ranges from data (the wrong-modulus class)."""
        from lovdata_pipeline_spark.operators.layout import (
            _SIDECAR,
            zorder_append,
            zorder_write_index,
        )

        idx = str(tmp_path / "zold")
        zorder_write_index(_mkpoints(spark, 100), idx, "x", "y", n_buckets=8)
        p = os.path.join(idx, _SIDECAR)
        sc = json.load(open(p))
        del sc["ranges"]
        json.dump(sc, open(p, "w"))
        with pytest.raises(ValueError, match="no pinned ranges"):
            zorder_append(spark, _mkpoints(spark, 10), idx)

    def test_append_schema_mismatch_raises(self, spark, tmp_path):
        from lovdata_pipeline_spark.operators.layout import (
            zorder_append,
            zorder_write_index,
        )

        idx = str(tmp_path / "zs")
        zorder_write_index(_mkpoints(spark, 100), idx, "x", "y", n_buckets=8)
        bad = spark.createDataFrame([(1, 2)], "x long, y long")  # missing event_id
        with pytest.raises(ValueError, match="do not match"):
            zorder_append(spark, bad, idx)

    def test_empty_append_is_a_noop(self, spark, tmp_path):
        from lovdata_pipeline_spark.operators.layout import zorder_append

        ev, base, rest, idx = self._build_split(spark, str(tmp_path))
        before = sorted(map(tuple, spark.read.parquet(idx).collect()))
        res = zorder_append(spark, rest.filter(F.lit(False)), idx)
        assert res == {"appended": 0, "dirty_buckets": []}
        assert sorted(map(tuple, spark.read.parquet(idx).collect())) == before

    def test_appended_index_scan_prunes_partitions(self, spark, tmp_path):
        """The graded row's pruning contract: post-append box scans
        still show PartitionFilters on zbucket and the candidate set
        stays a strict minority (z-locality survives the append)."""
        from lovdata_pipeline_spark.operators.layout import (
            _SIDECAR,
            zorder_append,
            zorder_box_scan,
        )

        ev, base, rest, idx = self._build_split(spark, str(tmp_path), n=2000)
        zorder_append(spark, rest, idx)
        b = 1 << 16
        box = (3 * b // 8, 5 * b // 8 - 1, 3 * b // 8, 5 * b // 8 - 1)
        pruned = zorder_box_scan(spark, idx, *box)
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "zbucket" in plan
        sc = json.load(open(os.path.join(idx, _SIDECAR)))
        cands = [
            bk for bk, s in sc["buckets"].items()
            if s["minqx"] <= box[1] and s["maxqx"] >= box[0]
            and s["minqy"] <= box[3] and s["maxqy"] >= box[2]
        ]
        assert 0 < len(cands) < len(sc["buckets"]) / 2

    def test_chained_appends_equal_one_shot(self, spark, tmp_path):
        """TWO successive appends (the nightly shape) must land exactly
        where a single one-shot pinned build would put every row — the
        interval_join-chaining lesson (r11): operators that compose
        with themselves get the composition pinned, not just one hop."""
        from lovdata_pipeline_spark.operators.layout import (
            zorder_append,
            zorder_frame_pinned,
            zorder_write_index,
        )

        ev = _mkpoints(spark, 900)
        base = ev.filter(F.col("event_id") % 3 == 0)
        day1 = ev.filter(F.col("event_id") % 3 == 1)
        day2 = ev.filter(F.col("event_id") % 3 == 2)
        idx = os.path.join(str(tmp_path), "zchain")
        zorder_write_index(base, idx, "x", "y", n_buckets=16)
        zorder_append(spark, day1, idx)
        zorder_append(spark, day2, idx)
        [r] = base.agg(
            F.min("x").alias("xlo"), F.max("x").alias("xhi"),
            F.min("y").alias("ylo"), F.max("y").alias("yhi"),
        ).collect()
        want = zorder_frame_pinned(
            ev, "x", "y", (r["xlo"], r["xhi"], r["ylo"], r["yhi"]), n_buckets=16
        ).drop("zvalue")
        stored = spark.read.parquet(idx).withColumn(
            "zbucket", F.col("zbucket").cast("long")
        )
        got = sorted(map(tuple, stored.select("event_id", "qx", "qy", "zbucket").collect()))
        exp = sorted(map(tuple, want.select("event_id", "qx", "qy", "zbucket").collect()))
        assert got == exp
        # and the sidecar is coherent after the chain
        sc = json.load(open(os.path.join(idx, "_zorder_params.json")))
        assert sum(s["n_rows"] for s in sc["buckets"].values()) == 900

    def test_append_preserves_one_file_per_bucket(self, spark, tmp_path):
        """The indexwrite discipline survives appends: repartition ON
        the partition column before the dynamic overwrite means every
        dirty bucket directory still holds exactly ONE data file —
        no fragment accumulation across nightly appends (the r10
        listing-cost lesson)."""
        import glob

        from lovdata_pipeline_spark.operators.layout import (
            zorder_append,
            zorder_write_index,
        )

        ev = _mkpoints(spark, 600)
        idx = os.path.join(str(tmp_path), "zfiles")
        zorder_write_index(ev.filter(F.col("event_id") % 3 != 0), idx, "x", "y", n_buckets=16)
        zorder_append(spark, ev.filter(F.col("event_id") % 3 == 0), idx)
        for d in glob.glob(os.path.join(idx, "zbucket=*")):
            files = [
                f for f in os.listdir(d)
                if f.endswith(".parquet") and not f.startswith(("_", "."))
            ]
            assert len(files) == 1, (d, files)

    def test_graded_row_is_nonvacuous(self, spark):
        """The sf0.001 graded row: appended rows (event_id % 3 == 0)
        must actually appear in the box result — the append half of the
        grade is exercised, not just the initial build."""
        from lovdata_pipeline_spark.queries import zorder_append_box_scan

        rows = zorder_append_box_scan(spark, "/root/testdata/sf0.001").collect()
        assert rows
        assert any(r["event_id"] % 3 == 0 for r in rows), "no appended row in box"
        assert any(r["event_id"] % 3 != 0 for r in rows), "no base row in box"


class TestBloomPrefilterJoin:
    def test_join_is_lossless(self, spark):
        """Prefiltered join == plain join, row for row — the bloom
        stage changes cost, never semantics (no false negatives; the
        exact join removes the false positives)."""
        from lovdata_pipeline_spark.operators.bloomjoin import (
            bloom_prefilter_join,
        )

        left = spark.createDataFrame(
            [(i, i % 97, f"p{i}") for i in range(2000)], "id long, k long, pay string"
        )
        right = spark.createDataFrame(
            [(k, f"d{k}") for k in range(0, 97, 13)], "k long, dim string"
        )
        got = bloom_prefilter_join(left, right, "k", m_bits=64, k=2)
        want = left.join(right, "k")
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    def test_every_dim_key_passes_its_own_filter(self, spark):
        """The no-false-negative guarantee, directly: every key that
        went INTO the filter passes the prefilter."""
        from lovdata_pipeline_spark.operators.bloomjoin import (
            bloom_from_keys,
            bloom_prefilter,
        )

        keys = spark.createDataFrame([(k,) for k in range(50)], "k long")
        flt = bloom_from_keys(keys, "k", m_bits=128, k=3)
        kept = bloom_prefilter(keys, "k", flt, m_bits=128, k=3)
        assert kept.count() == 50

    def test_null_keys_never_pass(self, spark):
        from lovdata_pipeline_spark.operators.bloomjoin import (
            bloom_from_keys,
            bloom_prefilter,
        )

        right = spark.createDataFrame([(1,), (2,)], "k long")
        left = spark.createDataFrame([(1, 1), (2, None)], "id long, k long")
        flt = bloom_from_keys(right, "k", m_bits=64, k=2)
        kept = bloom_prefilter(left, "k", flt, m_bits=64, k=2)
        assert [r["id"] for r in kept.collect()] == [1]

    def test_graded_row_exercises_real_false_positives(self, spark):
        """At the driver's sf0.01 grade the deliberately small m=256
        filter must keep MORE rows than the exact join passes — the
        prefilter stage of the grade is never vacuous — while
        n_kept_bloom >= n_joined holds per priority (supersets only)."""
        from lovdata_pipeline_spark.queries import bloom_prefilter_join_orders

        rows = bloom_prefilter_join_orders(spark, "/root/testdata/sf0.01").collect()
        assert rows
        assert all(r["n_kept_bloom"] >= r["n_joined"] for r in rows)
        assert sum(r["n_kept_bloom"] for r in rows) > sum(
            r["n_joined"] for r in rows
        ), "no false positives — the prefilter half of the grade is vacuous"


class TestHllPairOverlap:
    def _docs(self, spark, groups):
        rows = []
        for g, words in groups.items():
            rows.append((g, " ".join(words)))
        return spark.createDataFrame(rows, "source string, text string")

    def test_union_registers_equal_concatenated_group(self, spark):
        """The within-table pair union must equal hll_registers of the
        two groups relabeled as one — the merge identity, exactly."""
        from lovdata_pipeline_spark.operators.sketches import (
            hll_pair_overlap,
            hll_registers,
        )
        from pyspark.sql import functions as F

        docs = self._docs(
            spark,
            {"a": [f"w{i}" for i in range(80)], "b": [f"w{i}" for i in range(40, 140)]},
        )
        est = hll_pair_overlap(hll_registers(docs, p=5), p=5).collect()[0]
        both = hll_registers(
            docs.withColumn("source", F.lit("ab")), p=5
        )
        from lovdata_pipeline_spark.operators.sketches import hll_estimate

        [u] = hll_estimate(both, p=5).collect()
        assert est["n_union"] == u["n_est"]

    def test_inclusion_exclusion_arithmetic(self, spark):
        from lovdata_pipeline_spark.operators.sketches import (
            hll_pair_overlap,
            hll_registers,
        )

        docs = self._docs(
            spark,
            {
                "a": [f"x{i}" for i in range(60)],
                "b": [f"x{i}" for i in range(30, 90)],
                "c": [f"y{i}" for i in range(50)],
            },
        )
        rows = hll_pair_overlap(hll_registers(docs, p=5), p=5).collect()
        assert len(rows) == 3
        for r in rows:
            assert r["n_inter"] == round(r["n_a"] + r["n_b"] - r["n_union"], 6)

    def test_identical_groups_intersect_fully(self, spark):
        """A == B: union registers equal each side's, so the estimate
        collapses to n_inter == n_a == n_b == n_union exactly."""
        from lovdata_pipeline_spark.operators.sketches import (
            hll_pair_overlap,
            hll_registers,
        )

        words = [f"t{i}" for i in range(120)]
        docs = self._docs(spark, {"a": words, "b": list(words)})
        [r] = hll_pair_overlap(hll_registers(docs, p=5), p=5).collect()
        assert r["n_a"] == r["n_b"] == r["n_union"]
        assert r["n_inter"] == round(r["n_a"], 6)

    def test_cli_overlap_matrix(self, spark, tmp_path, capsys):
        from lovdata_pipeline_spark.cli import main

        p = tmp_path / "ovl"
        self._docs(
            spark,
            {"a": [f"x{i}" for i in range(60)], "b": [f"x{i}" for i in range(30, 90)]},
        ).write.parquet(str(p))
        rc = main(["sketch", "--mode", "hll", "--input", str(p), "--overlap"])
        assert rc == 0
        [row] = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
        assert row["source_a"] == "a" and row["source_b"] == "b"
        assert row["n_inter"] == round(row["n_a"] + row["n_b"] - row["n_union"], 6)

    def test_graded_row_is_nonvacuous(self, spark):
        """sf0.001: real pairs with nonzero exact intersections and
        genuine estimator error — never a vacuous 0==0 grade."""
        from lovdata_pipeline_spark.queries import hll_vocab_overlap_sources

        rows = hll_vocab_overlap_sources(spark, "/root/testdata/sf0.001").collect()
        assert rows
        assert any(r["n_inter_exact"] > 0 for r in rows)
        assert any(r["rel_err"] is not None and r["rel_err"] != 0 for r in rows), (
            "estimator never approximated — vacuous grade"
        )


class TestHdrStore:
    def _regs(self, spark, vals):
        from lovdata_pipeline_spark.operators.sketches import hdr_buckets

        return hdr_buckets(
            spark.createDataFrame([("g", int(v)) for v in vals], "g string, v long"),
            "v",
            "g",
        )

    def test_store_roundtrip_and_merge_equals_full(self, spark, tmp_path):
        from lovdata_pipeline_spark.operators.sketches import (
            hdr_merge,
            hdr_quantiles,
            hdr_registers_load,
            hdr_registers_write,
        )

        day1 = [3, 900, 900, 2**41, 17]
        day2 = [255, 256, 257, 12345, 2**52 + 5]
        d1, d2 = str(tmp_path / "d1"), str(tmp_path / "d2")
        hdr_registers_write(self._regs(spark, day1), d1, group_col="g")
        hdr_registers_write(self._regs(spark, day2), d2, group_col="g")
        r1, sb1, g1 = hdr_registers_load(spark, d1)
        r2, sb2, _ = hdr_registers_load(spark, d2)
        assert sb1 == sb2 == 8 and g1 == "g"
        merged = hdr_quantiles(hdr_merge([r1, r2], "g"), "g").collect()
        full = hdr_quantiles(self._regs(spark, day1 + day2), "g").collect()
        assert sorted(map(tuple, merged)) == sorted(map(tuple, full))

    def test_version_gate(self, spark, tmp_path):
        from lovdata_pipeline_spark.operators.sketches import (
            hdr_registers_load,
            hdr_registers_write,
        )

        d = str(tmp_path / "dv")
        hdr_registers_write(self._regs(spark, [1, 2, 3]), d, group_col="g")
        p = os.path.join(d, "_hdr_params.json")
        sc = json.load(open(p))
        sc["version"] = "hdr-store-v999"
        json.dump(sc, open(p, "w"))
        with pytest.raises(ValueError, match="version"):
            hdr_registers_load(spark, d)

    def test_cli_hdr_store_write_and_merge(self, spark, tmp_path, capsys):
        """lg sketch --mode hdr --output (store write) then
        --merge-stores (count-sum merge, no corpus re-scan) — merged
        quantiles equal the one-shot run over the concatenation."""
        from lovdata_pipeline_spark.cli import main

        p1, p2 = tmp_path / "v1", tmp_path / "v2"
        spark.createDataFrame(
            [("a", v) for v in (1, 5, 130, 1000)], "g string, v long"
        ).write.parquet(str(p1))
        spark.createDataFrame(
            [("a", v) for v in (12345, 999999)], "g string, v long"
        ).write.parquet(str(p2))
        s1, s2 = str(tmp_path / "s1"), str(tmp_path / "s2")
        for src, st in ((p1, s1), (p2, s2)):
            rc = main(
                ["sketch", "--mode", "hdr", "--input", str(src),
                 "--value-col", "v", "--group-col", "g", "--output", st]
            )
            assert rc == 0
        capsys.readouterr()
        rc = main(["sketch", "--mode", "hdr", "--merge-stores", f"{s1},{s2}"])
        assert rc == 0
        merged = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        pall = tmp_path / "vall"
        spark.createDataFrame(
            [("a", v) for v in (1, 5, 130, 1000, 12345, 999999)], "g string, v long"
        ).write.parquet(str(pall))
        rc = main(
            ["sketch", "--mode", "hdr", "--input", str(pall),
             "--value-col", "v", "--group-col", "g"]
        )
        assert rc == 0
        full = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert merged == full and merged["n"] == 6

    def test_cli_layout_append(self, spark, tmp_path, capsys):
        """lg layout --append: incremental append through the CLI,
        then a box scan over the merged index."""
        from lovdata_pipeline_spark.cli import main

        p1, p2 = tmp_path / "b1", tmp_path / "b2"
        _mkpoints(spark, 300).write.parquet(str(p1))
        _mkpoints(spark, 400).filter("event_id >= 300").write.parquet(str(p2))
        idx = str(tmp_path / "zi")
        rc = main(
            ["layout", "--input", str(p1), "--x-col", "x", "--y-col", "y",
             "--output", idx, "--n-buckets", "16"]
        )
        assert rc == 0
        capsys.readouterr()
        rc = main(
            ["layout", "--input", str(p2), "--append", idx,
             "--box", "0,65535,0,65535"]
        )
        assert rc == 0
        lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
        assert lines[0]["status"] == "appended" and lines[0]["appended"] == 100
        assert lines[1]["rows"] == 400

    def test_graded_row_matches_unsplit_estimates(self, spark):
        """The store-merged graded row must equal the direct in-memory
        estimates — persistence and parity-split change nothing."""
        from lovdata_pipeline_spark.operators.sketches import (
            hdr_buckets,
            hdr_quantiles,
        )
        from lovdata_pipeline_spark.queries import hdr_store_merged_quantiles

        sf = "/root/testdata/sf0.001"
        got = hdr_store_merged_quantiles(spark, sf).collect()
        orders = spark.read.parquet(os.path.join(sf, "orders.parquet")).select(
            "o_orderpriority",
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        want = (
            hdr_quantiles(
                hdr_buckets(orders, "cents", "o_orderpriority"), "o_orderpriority"
            )
            .orderBy("o_orderpriority")
            .collect()
        )
        assert [tuple(r) for r in got] == [tuple(r) for r in want]
