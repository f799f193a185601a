"""Embedding-provider client contract: the retry matrix (429 Retry-After /
exponential, 5xx exponential, 4xx no-retry, transport-failure fixed delay,
300 s cap, terminal error mapping), token-aware dynamic batching with the
90 % margin, client-side rate limiting with an injected clock, response
validation, and parity of the default transport with TextEmbedStage."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from code_indexer_ray.text.provider import (
    BACKOFF_CAP_SEC,
    EmbeddingClient,
    ProviderConfig,
    ProviderEmbedStage,
    TransportFailure,
    TransportStatusError,
    hashing_transport,
)


class ScriptedTransport:
    """Raises the scripted exceptions in order, then succeeds."""

    def __init__(self, failures, dim=4):
        self.failures = list(failures)
        self.dim = dim
        self.calls = []

    def __call__(self, texts, model):
        self.calls.append(list(texts))
        if self.failures:
            raise self.failures.pop(0)
        return {"data": [{"embedding": [1.0] * self.dim} for _ in texts]}


def _client(transport, **cfg):
    sleeps = []
    c = EmbeddingClient(
        transport,
        ProviderConfig(**cfg),
        count_tokens=lambda t: len(t.split()),
        sleep=sleeps.append,
        clock=lambda: 0.0,
    )
    return c, sleeps


class TestRetryMatrix:
    def test_429_exponential_backoff(self):
        tr = ScriptedTransport([TransportStatusError(429)] * 3)
        c, sleeps = _client(tr, max_retries=3, retry_delay=1.0)
        assert c.embed("a b") == [1.0] * 4
        assert sleeps == [1.0, 2.0, 4.0]
        assert len(tr.calls) == 4

    def test_429_server_retry_after_wins(self):
        tr = ScriptedTransport([TransportStatusError(429, retry_after=7.5)])
        c, sleeps = _client(tr)
        c.embed("x")
        assert sleeps == [7.5]

    def test_429_exhausted_maps_to_runtime_error(self):
        tr = ScriptedTransport([TransportStatusError(429)] * 5)
        c, _ = _client(tr, max_retries=2)
        with pytest.raises(RuntimeError, match="rate limit"):
            c.embed("x")
        assert len(tr.calls) == 3  # max_retries + 1

    def test_5xx_retries_exponentially(self):
        tr = ScriptedTransport([TransportStatusError(500), TransportStatusError(503)])
        c, sleeps = _client(tr, retry_delay=0.5)
        c.embed("x")
        assert sleeps == [0.5, 1.0]

    def test_4xx_not_retried(self):
        tr = ScriptedTransport([TransportStatusError(400, body="bad request")])
        c, sleeps = _client(tr)
        with pytest.raises(RuntimeError, match="HTTP 400"):
            c.embed("x")
        assert sleeps == [] and len(tr.calls) == 1

    def test_401_maps_to_value_error(self):
        tr = ScriptedTransport([TransportStatusError(401)])
        c, _ = _client(tr)
        with pytest.raises(ValueError, match="API key"):
            c.embed("x")

    def test_transport_failure_fixed_delay_then_connection_error(self):
        tr = ScriptedTransport([TransportFailure("reset")] * 4)
        c, sleeps = _client(tr, max_retries=2, retry_delay=2.0)
        with pytest.raises(ConnectionError):
            c.embed("x")
        assert sleeps == [2.0, 2.0]

    def test_backoff_capped_at_300s(self):
        tr = ScriptedTransport([TransportStatusError(429, retry_after=9999.0)])
        c, sleeps = _client(tr)
        c.embed("x")
        assert sleeps == [BACKOFF_CAP_SEC]

    def test_linear_backoff_when_exponential_off(self):
        tr = ScriptedTransport([TransportStatusError(500)] * 2)
        c, sleeps = _client(tr, retry_delay=1.5, exponential_backoff=False)
        c.embed("x")
        assert sleeps == [1.5, 1.5]


class TestDynamicBatching:
    def test_splits_at_margin(self):
        tr = ScriptedTransport([])
        # limit 10 tokens, margin 0.9 → 9-token budget; 4-token texts pack 2/request
        c, _ = _client(tr, token_limits={"hashing-16": 10}, safety_margin=0.9)
        texts = ["w x y z"] * 5
        out = c.embed_batch(texts)
        assert len(out) == 5
        assert [len(b) for b in tr.calls] == [2, 2, 1]

    def test_oversized_single_text_goes_alone(self):
        tr = ScriptedTransport([])
        c, _ = _client(tr, token_limits={"hashing-16": 4})
        c.embed_batch(["a b c d e f", "g h"])
        assert [len(b) for b in tr.calls] == [1, 1]

    def test_order_preserved_across_requests(self):
        class EchoTransport:
            def __init__(self):
                self.calls = []

            def __call__(self, texts, model):
                self.calls.append(list(texts))
                return {"data": [{"embedding": [float(len(t))]} for t in texts]}

        tr = EchoTransport()
        c = EmbeddingClient(
            tr,
            ProviderConfig(token_limits={"hashing-16": 4}),
            count_tokens=lambda t: len(t.split()),
            sleep=lambda s: None,
        )
        out = c.embed_batch(["a", "bb cc", "ddd eee fff", "g"])
        assert out == [[1.0], [5.0], [11.0], [1.0]]

    def test_empty_input(self):
        c, _ = _client(ScriptedTransport([]))
        assert c.embed_batch([]) == []


class TestValidation:
    def test_none_embedding_rejected(self):
        def tr(texts, model):
            return {"data": [{"embedding": None} for _ in texts]}

        c = EmbeddingClient(tr, ProviderConfig(), sleep=lambda s: None)
        with pytest.raises(RuntimeError, match="None embedding"):
            c.embed("x")

    def test_length_mismatch_rejected(self):
        def tr(texts, model):
            return {"data": []}

        c = EmbeddingClient(tr, ProviderConfig(), sleep=lambda s: None)
        with pytest.raises(RuntimeError, match="0 items"):
            c.embed("x")

    def test_empty_embedding_rejected(self):
        def tr(texts, model):
            return {"data": [{"embedding": []} for _ in texts]}

        c = EmbeddingClient(tr, ProviderConfig(), sleep=lambda s: None)
        with pytest.raises(RuntimeError, match="empty embedding"):
            c.embed("x")


class TestRateLimit:
    def test_window_wait(self):
        clock_now = [0.0]
        sleeps = []

        def sleep(s):
            sleeps.append(s)
            clock_now[0] += s

        tr = ScriptedTransport([])
        c = EmbeddingClient(
            tr,
            ProviderConfig(requests_per_minute=2, token_limits={"hashing-16": 1}),
            count_tokens=lambda t: 1,
            sleep=sleep,
            clock=lambda: clock_now[0],
        )
        # 3 one-text requests at t=0: the third must wait out the window
        c.embed_batch(["a", "b", "c"])
        assert len(tr.calls) == 3
        assert sleeps == [60.0]


class TestHashingParity:
    def test_default_transport_matches_embed_stage(self):
        from code_indexer_ray.text.embed import TextEmbedStage

        texts = ["spark merge query", "", "the quick brown fox", "spark spark"]
        batch = pa.table(
            {
                "doc_id": pa.array(np.arange(4, dtype=np.int64)),
                "text": pa.array(texts, type=pa.string()),
            }
        )
        want = TextEmbedStage(dim=16, output="list")(batch)["embedding"].to_pylist()
        got = ProviderEmbedStage(dim=16)(batch)["embedding"].to_pylist()
        assert got == want

    def test_stage_output_schema(self):
        batch = pa.table(
            {
                "doc_id": pa.array([7], type=pa.int64()),
                "text": pa.array(["hello world"], type=pa.string()),
            }
        )
        out = ProviderEmbedStage(dim=8)(batch)
        assert out.column_names == ["doc_id", "embedding"]
        assert len(out["embedding"].to_pylist()[0]) == 8

    def test_hashing_transport_envelope(self):
        tr = hashing_transport(dim=4)
        res = tr(["a b"], "hashing-16")
        assert set(res) == {"data"} and len(res["data"]) == 1
        assert len(res["data"][0]["embedding"]) == 4
