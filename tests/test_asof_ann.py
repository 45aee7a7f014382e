"""As-of join edge cases and ANN (LSH / IVF) recall sanity."""

import datetime as dt

from pyspark.sql import functions as F

from lovdata_pipeline_spark.operators.asof import asof_join
from lovdata_pipeline_spark.operators import similarity


def _ts(s):
    return dt.datetime.fromisoformat(s)


class TestAsofJoin:
    def test_basic_semantics(self, spark):
        left = spark.createDataFrame(
            [
                (1, 10, _ts("2024-01-01T10:00:00")),
                (2, 10, _ts("2024-01-01T12:00:00")),
                (3, 20, _ts("2024-01-01T09:00:00")),  # no prior right row
            ],
            "id long, key long, t timestamp",
        )
        right = spark.createDataFrame(
            [
                (10, _ts("2024-01-01T09:30:00"), "a"),
                (10, _ts("2024-01-01T11:00:00"), "b"),
                (20, _ts("2024-01-01T09:30:00"), "late"),
            ],
            "key long, t timestamp, v string",
        )
        out = {
            r.id: r
            for r in asof_join(
                left, right, on="key", left_time="t", right_time="t", right_cols=["v"]
            ).collect()
        }
        assert out[1].v_asof == "a"  # 09:30 is latest ≤ 10:00
        assert out[2].v_asof == "b"  # 11:00 is latest ≤ 12:00
        assert out[3].v_asof is None  # right row is after left time

    def test_exact_tie_matches(self, spark):
        left = spark.createDataFrame(
            [(1, 5, _ts("2024-01-01T10:00:00"))], "id long, key long, t timestamp"
        )
        right = spark.createDataFrame(
            [(5, _ts("2024-01-01T10:00:00"), "same")], "key long, t timestamp, v string"
        )
        row = asof_join(
            left, right, on="key", left_time="t", right_time="t", right_cols=["v"]
        ).first()
        assert row.v_asof == "same"  # ≤ semantics: equal timestamps match


class TestAnnRecall:
    def test_lsh_results_subset_of_exact(self, spark):
        import numpy as np

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        query = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
        exact = [
            r.vec_id for r in similarity.cosine_topk(emb, query, k=50).collect()
        ]
        planes = np.random.RandomState(42).randn(4, len(query)).tolist()
        approx = similarity.ann_topk_lsh(emb, query, planes, k=10).collect()
        assert approx, "query's own bucket must at least contain itself"
        assert approx[0].vec_id == 0 and approx[0].score == 1.0
        # every ANN hit is a genuinely scored vector from the exact ranking
        assert set(r.vec_id for r in approx) <= set(
            r.vec_id for r in similarity.cosine_topk(emb, query, k=10_000).collect()
        )
        # recall sanity: decent overlap with exact top-50
        overlap = len(set(r.vec_id for r in approx) & set(exact))
        assert overlap >= 1

    def test_lsh_full_multiprobe_equals_exact(self, spark):
        import numpy as np

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        query = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
        planes = np.random.RandomState(42).randn(4, len(query)).tolist()
        exact = [(r.vec_id, r.score) for r in similarity.cosine_topk(emb, query, 10).collect()]
        full = [
            (r.vec_id, r.score)
            for r in similarity.ann_topk_lsh(
                emb, query, planes, k=10, n_probe_bits=len(planes)
            ).collect()
        ]
        assert full == exact  # probing every bucket degrades to brute force

    def test_lsh_multiprobe_recall_monotone(self, spark):
        import numpy as np

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        query = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
        planes = np.random.RandomState(42).randn(4, len(query)).tolist()
        exact = {r.vec_id for r in similarity.cosine_topk(emb, query, 10).collect()}
        recalls = []
        for bits in (0, 2, 4):
            got = {
                r.vec_id
                for r in similarity.ann_topk_lsh(
                    emb, query, planes, k=10, n_probe_bits=bits
                ).collect()
            }
            recalls.append(len(got & exact))
        assert recalls == sorted(recalls)  # more probes never lose recall

    def test_ivf_nprobe_all_cells_equals_exact(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        query = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
        centroids = similarity.deterministic_centroids(emb, n_cells=4)
        exact = [(r.vec_id, r.score) for r in similarity.cosine_topk(emb, query, 10).collect()]
        full_probe = [
            (r.vec_id, r.score)
            for r in similarity.ivf_topk(
                emb, query, centroids, k=10, n_probe=len(centroids)
            ).collect()
        ]
        assert full_probe == exact  # probing every cell degrades to exact

    def test_ivf_partial_probe_contains_query(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        query = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
        centroids = similarity.deterministic_centroids(emb, n_cells=4)
        rows = similarity.ivf_topk(emb, query, centroids, k=10, n_probe=2).collect()
        assert rows and rows[0].vec_id == 0 and rows[0].score == 1.0


class TestAnnRecallClustered:
    """Recall@10 pinned on a PLANTED-CLUSTER fixture. The driver's
    embeddings table is uniform-random (max cosine ≈ 0.5), where SRP
    collision probabilities barely discriminate — recall bounds there are
    structurally meaningless (r1 verdict #5). On clustered data, the
    workload ANN indexes exist for, both approximate paths must find the
    true neighbors."""

    K = 10

    @staticmethod
    def _clustered(spark, n_clusters=8, per_cluster=60, dims=16, seed=7):
        import numpy as np

        rng = np.random.RandomState(seed)
        centers = rng.randn(n_clusters, dims)
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        rows = []
        vid = 0
        for c in range(n_clusters):
            pts = centers[c] + 0.08 * rng.randn(per_cluster, dims)
            for p in pts:
                rows.append((vid, [float(x) for x in p]))
                vid += 1
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), rng

    def _recall(self, spark, approx_fn):
        emb, rng = self._clustered(spark)
        emb = emb.cache()
        query = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
        exact = {r.vec_id for r in similarity.cosine_topk(emb, query, self.K).collect()}
        got = {r.vec_id for r in approx_fn(emb, query, rng).collect()}
        emb.unpersist()
        return len(got & exact) / self.K

    def test_lsh_recall_on_clusters(self, spark):
        def lsh(emb, query, rng):
            planes = rng.randn(6, len(query)).tolist()
            return similarity.ann_topk_lsh(emb, query, planes, k=self.K, n_probe_bits=2)

        assert self._recall(spark, lsh) >= 0.9

    def test_ivf_recall_on_clusters(self, spark):
        def ivf(emb, query, rng):
            seeds = similarity.deterministic_centroids(emb, n_cells=8)
            cents = similarity.kmeans_refine(emb, seeds, iterations=3)
            return similarity.ivf_topk(emb, query, cents, k=self.K, n_probe=2)

        assert self._recall(spark, ivf) >= 0.9

    def test_ivf_recall_shipped_config(self, spark):
        """The EXACT configuration the graded ann_topk_ivf query ships:
        portable (md5-ordered) seeds, NO Lloyd refinement, 2-probe —
        pinning the refined xxhash64 variant alone would certify a path
        the query doesn't run."""

        def ivf(emb, query, rng):
            seeds = similarity.deterministic_centroids(emb, n_cells=8, portable=True)
            return similarity.ivf_topk(emb, query, seeds, k=self.K, n_probe=2)

        assert self._recall(spark, ivf) >= 0.9


class TestProductQuantization:
    """PQ encode + ADC scoring: a numpy replica pins the exact argmin /
    reconstruction / dot arithmetic; structural tests pin partition
    independence and retrieval sanity on clustered data."""

    @staticmethod
    def _np_replica(rows, query, books):
        import numpy as np

        m = len(books)
        d_sub = len(books[0][0])
        scores = {}
        for vid, vec in rows:
            recon = []
            for j in range(m):
                sub = np.array(vec[j * d_sub : (j + 1) * d_sub])
                dists = [float(((sub - np.array(c)) ** 2).sum()) for c in books[j]]
                recon.extend(books[j][int(np.argmin(dists))])
            scores[vid] = round(float(np.dot(query, recon)), 6)
        return scores

    def test_adc_matches_numpy_replica(self, spark):
        import numpy as np

        rng = np.random.RandomState(11)
        rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(40)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        books = similarity.pq_codebooks(emb, m=4, k_sub=5, portable=True)
        query = rows[0][1]
        got = {
            r.vec_id: r.adc_score
            for r in similarity.pq_adc_topk(emb, query, books, k=40).collect()
        }
        want = self._np_replica(rows, query, books)
        assert set(got) == set(want)
        for vid in got:
            assert abs(got[vid] - want[vid]) < 2e-6, vid

    def test_codes_in_range_and_partition_independent(self, spark):
        import numpy as np

        rng = np.random.RandomState(3)
        rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(60)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        books = similarity.pq_codebooks(emb, m=8, k_sub=6, portable=True)
        a = sorted(
            (r.vec_id, tuple(r.codes))
            for r in similarity.pq_encode(emb, books).collect()
        )
        b = sorted(
            (r.vec_id, tuple(r.codes))
            for r in similarity.pq_encode(emb.repartition(17), books).collect()
        )
        assert a == b
        for _, codes in a:
            assert len(codes) == 8
            assert all(0 <= c < 6 for c in codes)

    def test_adc_retrieves_query_cluster(self, spark):
        """On well-separated clusters, ADC top-k should come mostly from
        the query's own cluster even with unrefined hash-seeded books."""
        emb, _ = TestAnnRecallClustered._clustered(spark)
        emb = emb.cache()
        books = similarity.pq_codebooks(emb, m=4, k_sub=16, portable=True)
        query = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
        top = [r.vec_id for r in similarity.pq_adc_topk(emb, query, books, k=10).collect()]
        emb.unpersist()
        assert sum(1 for v in top if v < 60) >= 7  # cluster 0 = ids 0..59

    def test_ivfpq_full_probe_equals_plain_adc(self, spark):
        """n_probe = n_cells degrades IVF-PQ to plain PQ-ADC exactly."""
        import numpy as np

        rng = np.random.RandomState(5)
        rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(80)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cents = similarity.deterministic_centroids(emb, n_cells=4, portable=True)
        books = similarity.pq_codebooks(emb, m=4, k_sub=6, portable=True)
        query = rows[0][1]
        full = [
            tuple(r)
            for r in similarity.ivf_pq_topk(
                emb, query, cents, books, k=10, n_probe=4
            ).collect()
        ]
        plain = [
            tuple(r) for r in similarity.pq_adc_topk(emb, query, books, k=10).collect()
        ]
        assert full == plain

    def test_ivfpq_partial_probe_subset_of_plain(self, spark):
        """Partial probing returns a subset of the plain ADC ranking,
        scored identically."""
        import numpy as np

        rng = np.random.RandomState(6)
        rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(80)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cents = similarity.deterministic_centroids(emb, n_cells=4, portable=True)
        books = similarity.pq_codebooks(emb, m=4, k_sub=6, portable=True)
        query = rows[0][1]
        part = {
            r.vec_id: r.adc_score
            for r in similarity.ivf_pq_topk(
                emb, query, cents, books, k=80, n_probe=2
            ).collect()
        }
        plain = {
            r.vec_id: r.adc_score
            for r in similarity.pq_adc_topk(emb, query, books, k=80).collect()
        }
        assert set(part) < set(plain)
        assert all(plain[v] == s for v, s in part.items())

    def test_indivisible_dims_raise(self, spark):
        emb = spark.createDataFrame(
            [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
        )
        try:
            similarity.pq_codebooks(emb, m=2, k_sub=1, portable=True)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass


class TestZeroNormGuards:
    def test_zero_norm_query_returns_empty(self, spark):
        from lovdata_pipeline_spark.operators.similarity import cosine_topk

        vecs = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.5, 0.5])], "vec_id long, embedding array<double>"
        )
        out = cosine_topk(vecs, [0.0, 0.0], k=2)
        assert out.count() == 0
        assert out.columns == ["vec_id", "score"]

    def test_zero_norm_corpus_row_is_skipped(self, spark):
        from lovdata_pipeline_spark.operators.similarity import cosine_topk

        vecs = spark.createDataFrame(
            [(1, [0.0, 0.0]), (2, [0.5, 0.5]), (3, [1.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        rows = cosine_topk(vecs, [1.0, 0.0], k=3).collect()
        assert [r.vec_id for r in rows] == [3, 2]  # zero row absent, no crash


class TestAsofRandomizedDifferential:
    def test_matches_duckdb_asof_join_on_random_data(self, spark):
        """Fixed-seed randomized differential: our union+window composition
        vs DuckDB's native ASOF JOIN on the same data (unique right
        timestamps per key keep both engines' pick well-defined)."""
        import random

        import duckdb
        import pandas as pd

        rng = random.Random(20260813)
        left_rows = [
            (i, rng.randrange(8), rng.randrange(0, 100_000))
            for i in range(400)
        ]
        # unique (key, ts) on the right: duplicate timestamps would make
        # "the" most recent row ambiguous in both engines
        seen = set()
        right_rows = []
        for j in range(300):
            key, ts = rng.randrange(8), rng.randrange(0, 100_000)
            if (key, ts) in seen:
                continue
            seen.add((key, ts))
            right_rows.append((key, ts, float(j)))

        left = spark.createDataFrame(left_rows, "id long, key long, t long")
        right = spark.createDataFrame(right_rows, "key long, t long, v double")
        ours = {
            r.id: (r.t_asof, r.v_asof)
            for r in asof_join(
                left, right, on="key", left_time="t", right_time="t", right_cols=["v"]
            ).collect()
        }

        con = duckdb.connect()
        con.register("l", pd.DataFrame(left_rows, columns=["id", "key", "t"]))
        con.register("r", pd.DataFrame(right_rows, columns=["key", "t", "v"]))
        oracle_df = con.execute(
            """
            SELECT l.id, r.t AS rt, r.v AS rv
            FROM l ASOF LEFT JOIN r ON l.key = r.key AND l.t >= r.t
            """
        ).df()
        oracle = {
            int(row["id"]): (
                None if pd.isna(row["rt"]) else int(row["rt"]),
                None if pd.isna(row["rv"]) else float(row["rv"]),
            )
            for _, row in oracle_df.iterrows()
        }
        assert len(ours) == len(left_rows) == len(oracle)
        mismatches = {i: (ours[i], oracle[i]) for i in oracle if ours[i] != oracle[i]}
        assert not mismatches, list(mismatches.items())[:5]


class TestScalarQuantization:
    """SQ8 fit/encode/ADC: a numpy replica pins the affine round-trip
    arithmetic; structural tests pin code bounds, constant-dimension
    handling, partition independence, and retrieval quality (SQ8 at 8
    bits should essentially reproduce exact brute-force order)."""

    @staticmethod
    def _fixture(spark, n=50, d=8, seed=7):
        import numpy as np

        rng = np.random.RandomState(seed)
        rows = [(i, [float(x) for x in rng.randn(d)]) for i in range(n)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        return rows, emb

    def test_adc_matches_numpy_replica(self, spark):
        import numpy as np

        rows, emb = self._fixture(spark)
        mins, maxs = similarity.sq8_minmax(emb, dims=8)
        assert mins == [min(v[i] for _, v in rows) for i in range(8)]
        assert maxs == [max(v[i] for _, v in rows) for i in range(8)]
        query = rows[0][1]
        got = {
            r.vec_id: r.adc_score
            for r in similarity.sq8_adc_topk(emb, query, mins, maxs, k=50).collect()
        }
        want = {}
        for vid, vec in rows:
            recon = []
            for i in range(8):
                code = min(255, max(0, int(np.floor(
                    (vec[i] - mins[i]) / (maxs[i] - mins[i]) * 255 + 0.5))))
                recon.append(mins[i] + code * (maxs[i] - mins[i]) / 255.0)
            want[vid] = round(float(np.dot(query, recon)), 6)
        assert set(got) == set(want)
        for vid in got:
            assert abs(got[vid] - want[vid]) < 2e-6, vid

    def test_codes_bounds_constant_dim_partition_independence(self, spark):
        _, emb = self._fixture(spark, n=40, d=4, seed=3)
        const = emb.selectExpr(
            "vec_id",
            "array(embedding[0], embedding[1], embedding[2], cast(1.5 as double)) AS embedding",
        )
        mins, maxs = similarity.sq8_minmax(const, dims=4)
        assert mins[3] == maxs[3] == 1.5
        a = sorted(
            (r.vec_id, tuple(r.codes))
            for r in similarity.sq8_encode(const, mins, maxs).collect()
        )
        b = sorted(
            (r.vec_id, tuple(r.codes))
            for r in similarity.sq8_encode(const.repartition(11), mins, maxs).collect()
        )
        assert a == b
        for _, codes in a:
            assert len(codes) == 4
            assert all(0 <= c <= 255 for c in codes)
            assert codes[3] == 0  # constant dimension encodes 0
        # extremes hit the rails somewhere in a 40-row sample
        flat = [c for _, codes in a for c in codes[:3]]
        assert 0 in flat and 255 in flat

    def test_sq8_order_matches_exact_bruteforce(self, spark):
        """8-bit quantization noise should not disturb top-10 membership
        on randn data: compare against full-precision cosine_topk by
        dot-product order (query/corpus share norms closely enough that
        we compare raw ADC order to exact dot order)."""
        import numpy as np

        rows, emb = self._fixture(spark, n=200, d=16, seed=19)
        mins, maxs = similarity.sq8_minmax(emb, dims=16)
        query = rows[0][1]
        sq = [r.vec_id for r in
              similarity.sq8_adc_topk(emb, query, mins, maxs, k=10).collect()]
        exact = sorted(
            range(200),
            key=lambda v: (-float(np.dot(query, rows[v][1])), v),
        )[:10]
        assert len(set(sq) & set(exact)) >= 9
