"""OpenAI-compatible embedding adapter: offline tests with a stubbed
transport (no network). Mirrors the reference provider's contract
(reference: infrastructure/openai_embedding_provider.py:24-42 — batch
calls, index-ordered vectors, retry/backoff on transient failures)."""

import json
import urllib.error

import pytest

from lovdata_pipeline_spark.embedding import (
    embed_chunks_df,
    mock_hash_provider,
    openai_compatible_provider,
)


def _ok_response(texts, dims=4):
    # deliberately scramble the index order: the adapter must re-sort
    data = [
        {"index": i, "embedding": [float(i)] * dims}
        for i in reversed(range(len(texts)))
    ]
    return json.dumps({"data": data}).encode()


class TestOpenAICompatibleProvider:
    def test_vectors_reordered_by_index(self):
        calls = []

        def transport(url, body, headers):
            calls.append((url, json.loads(body.decode()), headers))
            return _ok_response(json.loads(body.decode())["input"])

        provider = openai_compatible_provider(
            model="test-model", base_url="http://fake/v1", api_key="k", transport=transport
        )
        vecs = provider(["a", "b", "c"])
        assert [v[0] for v in vecs] == [0.0, 1.0, 2.0]  # re-sorted by index
        url, payload, headers = calls[0]
        assert url == "http://fake/v1/embeddings"
        assert payload == {"model": "test-model", "input": ["a", "b", "c"]}
        assert headers["Authorization"] == "Bearer k"

    def test_retries_on_429_then_succeeds(self):
        attempts = []

        def transport(url, body, headers):
            attempts.append(1)
            if len(attempts) < 3:
                raise urllib.error.HTTPError(url, 429, "rate limited", {}, None)
            return _ok_response(json.loads(body.decode())["input"])

        provider = openai_compatible_provider(
            base_url="http://fake/v1", transport=transport, backoff_s=0.001
        )
        assert len(provider(["x"])) == 1
        assert len(attempts) == 3

    def test_non_retryable_4xx_raises_immediately(self):
        def transport(url, body, headers):
            raise urllib.error.HTTPError(url, 401, "unauthorized", {}, None)

        provider = openai_compatible_provider(
            base_url="http://fake/v1", transport=transport, backoff_s=0.001
        )
        with pytest.raises(urllib.error.HTTPError):
            provider(["x"])

    def test_gives_up_after_max_attempts(self):
        def transport(url, body, headers):
            raise urllib.error.URLError("connection refused")

        provider = openai_compatible_provider(
            base_url="http://fake/v1",
            transport=transport,
            max_attempts=2,
            backoff_s=0.001,
        )
        # terminal error names the URL, the attempt count, and the cause
        with pytest.raises(
            RuntimeError, match=r"http://fake/v1/embeddings failed after 2 attempts"
        ):
            provider(["x"])

    def test_retry_after_header_overrides_backoff(self):
        sleeps: list[float] = []
        attempts = []

        def transport(url, body, headers):
            attempts.append(1)
            if len(attempts) < 2:
                raise urllib.error.HTTPError(
                    url, 429, "rate limited", {"Retry-After": "0.005"}, None
                )
            return _ok_response(json.loads(body.decode())["input"])

        import time as _time
        orig = _time.sleep
        _time.sleep = lambda s: (sleeps.append(s), orig(0))[1]
        try:
            provider = openai_compatible_provider(
                base_url="http://fake/v1", transport=transport, backoff_s=99.0
            )
            assert len(provider(["x"])) == 1
        finally:
            _time.sleep = orig
        # the server's 0.005 s Retry-After was used, not the 99 s backoff
        assert sleeps == [0.005]

    def test_vector_count_mismatch_raises(self):
        def transport(url, body, headers):
            return _ok_response(["only-one"])

        provider = openai_compatible_provider(
            base_url="http://fake/v1", transport=transport
        )
        with pytest.raises(ValueError, match="1 vectors for 2 texts"):
            provider(["a", "b"])


class TestProviderInPipeline:
    def test_batch_size_slicing_reaches_provider(self, spark):
        """embed_chunks_df slices Arrow batches into provider batches of
        ``batch_size`` (reference batches 100, embedding_service.py:31-83)."""
        from lovdata_pipeline_spark.chunking import chunk_documents_df
        from lovdata_pipeline_spark.config import ChunkParams
        from lovdata_pipeline_spark.schemas import DOCUMENTS_SCHEMA
        from tests import fixtures

        docs = spark.createDataFrame(
            [(f"d{i}", "ds", f"p/{i}.xml", fixtures.simple_law(), f"h{i}", "added")
             for i in range(6)],
            DOCUMENTS_SCHEMA,
        )
        chunks = chunk_documents_df(docs, ChunkParams(10, 100, 300, 0.15)).filter(
            "error is null"
        )

        # A driver-side spy list never sees worker-subprocess mutations, so
        # enforce the contract IN the provider: raise if any call exceeds
        # batch_size. A regression that ships whole Arrow batches to the
        # provider now fails the job instead of passing silently.
        def strict_provider(texts):
            if len(texts) > 2:
                raise AssertionError(
                    f"provider called with {len(texts)} texts; batch_size=2"
                )
            return mock_hash_provider(8)(texts)

        out = embed_chunks_df(chunks, provider=strict_provider, batch_size=2, dims=8)
        n = out.count()
        assert n > 2  # enough chunks that slicing actually had to happen
        row = out.select("embedding").first()
        assert len(row["embedding"]) == 8


class TestRateLimiter:
    def test_token_bucket_paces_calls(self):
        from lovdata_pipeline_spark.embedding import mock_hash_provider, rate_limited

        t = [0.0]
        slept: list[float] = []

        def clock():
            return t[0]

        def sleep(s):
            slept.append(s)
            t[0] += s

        p = rate_limited(mock_hash_provider(4), requests_per_second=2.0,
                         clock=clock, sleep=sleep)
        p(["a"])               # bucket starts full: no sleep
        assert slept == []
        p(["b"])               # immediate second call: must wait ~0.5s
        assert len(slept) == 1 and abs(slept[0] - 0.5) < 1e-9
        t[0] += 10.0           # long idle refills the bucket (capped at burst)
        p(["c"])
        assert len(slept) == 1  # no extra sleep after idle

    def test_burst_allows_back_to_back(self):
        from lovdata_pipeline_spark.embedding import mock_hash_provider, rate_limited

        t = [0.0]
        slept: list[float] = []
        p = rate_limited(
            mock_hash_provider(4), requests_per_second=1.0, burst=3,
            clock=lambda: t[0], sleep=lambda s: slept.append(s) or t.__setitem__(0, t[0] + s),
        )
        for _ in range(3):
            p(["x"])
        assert slept == []      # burst capacity absorbs the first 3
        p(["y"])
        assert len(slept) == 1  # fourth call is paced

    def test_vectors_pass_through_unchanged(self):
        from lovdata_pipeline_spark.embedding import mock_hash_provider, rate_limited

        base = mock_hash_provider(8)
        limited = rate_limited(base, requests_per_second=1000.0)
        assert limited(["hello", "world"]) == base(["hello", "world"])

    def test_rejects_nonpositive_rate(self):
        from lovdata_pipeline_spark.embedding import mock_hash_provider, rate_limited

        with pytest.raises(ValueError, match="requests_per_second"):
            rate_limited(mock_hash_provider(4), requests_per_second=0.0)

    def test_first_call_initializes_clock_lazily(self):
        """The bucket timestamp must come from the FIRST call's clock, not
        wrap time: the wrapper is pickled to executors whose monotonic
        epoch differs from the driver's — a wrap-time stamp could make the
        first refill delta negative by days and sleep unboundedly."""
        from lovdata_pipeline_spark.embedding import mock_hash_provider, rate_limited

        t = [0.0]
        slept: list[float] = []
        p = rate_limited(
            mock_hash_provider(4), requests_per_second=1.0,
            clock=lambda: t[0], sleep=lambda s: slept.append(s),
        )
        # simulate "other machine": clock jumps far from the wrap-time value
        t[0] = -500_000.0
        p(["a"])
        assert slept == []  # full bucket at first call; no pathological sleep
