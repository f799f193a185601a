"""Embedding providers (reference ``services/embedding_provider.py`` /
``voyage_ai.py`` / ``embedding_factory.py``): hash provider ≡ the
data-plane embed stage; VoyageAI client retry/backoff/batching driven
against a LOCAL stdlib server speaking the VoyageAI wire format (this
container has no network — the client machinery is what's under test)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pytest

from code_indexer_ray.text.providers import (
    EmbeddingProviderFactory,
    HashEmbeddingProvider,
    VoyageAIClient,
    VoyageAIConfig,
)


class FakeVoyage:
    """Scriptable VoyageAI-wire-format server.

    ``script`` is a list of response specs consumed per request:
    ``{"status": 200}`` returns embeddings; anything else returns that
    status (with optional ``headers``).  When the script runs out, 200.
    """

    def __init__(self):
        self.script: list[dict] = []
        self.requests: list[dict] = []
        srv = self

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length") or 0)
                body = json.loads(self.rfile.read(n))
                srv.requests.append(
                    {"payload": body, "auth": self.headers.get("Authorization")}
                )
                spec = srv.script.pop(0) if srv.script else {"status": 200}
                status = spec.get("status", 200)
                if status == 200:
                    data = {
                        "object": "list",
                        "data": [
                            {"embedding": [float(len(t)), 1.0], "index": i}
                            for i, t in enumerate(body["input"])
                        ],
                        "model": body["model"],
                    }
                    raw = json.dumps(data).encode()
                else:
                    raw = json.dumps(spec.get("body", {"error": "nope"})).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(raw)))
                for k, v in spec.get("headers", {}).items():
                    self.send_header(k, v)
                self.end_headers()
                self.wfile.write(raw)

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), H)
        self.httpd.daemon_threads = True
        threading.Thread(target=self.httpd.serve_forever, daemon=True).start()
        self.url = f"http://127.0.0.1:{self.httpd.server_address[1]}"

    def stop(self):
        self.httpd.shutdown()
        self.httpd.server_close()


@pytest.fixture()
def fake():
    f = FakeVoyage()
    yield f
    f.stop()


def _client(fake, **cfg):
    sleeps: list[float] = []
    c = VoyageAIClient(
        VoyageAIConfig(api_endpoint=fake.url + "/v1/embeddings", **cfg),
        api_key="test-key",
        sleep_fn=sleeps.append,
    )
    return c, sleeps


class TestHashProvider:
    def test_matches_data_plane_stage(self):
        from code_indexer_ray.text.embed import TextEmbedStage

        p = HashEmbeddingProvider(dim=16)
        texts = ["spark merge window", "batch scan", ""]
        got = p.get_embeddings_batch(texts)
        stage = TextEmbedStage(dim=16, output="list")
        want = stage(
            pa.table({"doc_id": pa.array(range(3)), "text": pa.array(texts)})
        )["embedding"].to_pylist()
        assert got == [list(map(float, v)) for v in want]
        assert p.get_embedding(texts[0]) == got[0]

    def test_metadata_and_info(self):
        p = HashEmbeddingProvider(dim=8)
        r = p.get_embedding_with_metadata("hello world")
        assert r.provider == "hash-local" and r.model == "feature-hash-8"
        assert r.tokens_used == 2
        b = p.get_embeddings_batch_with_metadata(["a b", "c"])
        assert b.total_tokens_used == 3 and len(b.embeddings) == 2
        assert p.health_check() and p.supports_batch_processing()
        assert p.get_model_info()["deterministic"] is True


class TestVoyageClient:
    def test_requires_api_key(self, monkeypatch):
        monkeypatch.delenv("VOYAGE_API_KEY", raising=False)
        with pytest.raises(ValueError, match="VOYAGE_API_KEY"):
            VoyageAIClient()

    def test_success_and_auth_header(self, fake):
        c, _ = _client(fake)
        out = c.get_embeddings_batch(["abc", "de"])
        assert out == [[3.0, 1.0], [2.0, 1.0]]
        assert fake.requests[0]["auth"] == "Bearer test-key"
        assert fake.requests[0]["payload"]["model"] == "voyage-code-3"
        assert c.get_embedding("abcd") == [4.0, 1.0]

    def test_429_honors_retry_after(self, fake):
        fake.script = [{"status": 429, "headers": {"Retry-After": "7"}}]
        c, sleeps = _client(fake)
        assert c.get_embeddings_batch(["x"]) == [[1.0, 1.0]]
        assert sleeps == [7.0]

    def test_429_exponential_backoff_then_exhaust(self, fake):
        fake.script = [{"status": 429}] * 10
        c, sleeps = _client(fake, retry_delay=1.0, max_retries=3)
        with pytest.raises(RuntimeError, match="rate limit"):
            c.get_embeddings_batch(["x"])
        assert sleeps == [1.0, 2.0, 4.0]  # 2**attempt, no sleep after last

    def test_5xx_backoff_then_success(self, fake):
        fake.script = [{"status": 500}, {"status": 503}]
        c, sleeps = _client(fake)
        assert c.get_embeddings_batch(["x"]) == [[1.0, 1.0]]
        assert sleeps == [1.0, 2.0]
        assert len(fake.requests) == 3

    def test_401_maps_to_key_error_no_retry(self, fake):
        fake.script = [{"status": 401}]
        c, sleeps = _client(fake)
        with pytest.raises(ValueError, match="Invalid VoyageAI API key"):
            c.get_embeddings_batch(["x"])
        assert sleeps == [] and len(fake.requests) == 1

    def test_400_no_retry_carries_body(self, fake):
        fake.script = [{"status": 400, "body": {"detail": "bad input"}}]
        c, _ = _client(fake)
        with pytest.raises(RuntimeError, match="bad input"):
            c.get_embeddings_batch(["x"])
        assert len(fake.requests) == 1

    def test_connection_error(self):
        c = VoyageAIClient(
            VoyageAIConfig(
                api_endpoint="http://127.0.0.1:1/v1/embeddings", retry_delay=0.0
            ),
            api_key="k",
            sleep_fn=lambda s: None,
        )
        with pytest.raises(ConnectionError, match="Failed to connect"):
            c.get_embeddings_batch(["x"])

    def test_token_aware_batching(self, fake):
        # token limit 120000 → 90% safety 108000; craft texts so two fit
        # and the third forces a flush
        cfg = dict(token_limits={"voyage-code-3": 10})  # safety = 9 tokens
        c, _ = _client(fake, **cfg)
        texts = ["a b c d", "e f g", "h i j k l"]  # 4 + 3 + 5 BPE-ish tokens
        out = c.get_embeddings_batch(texts)
        assert len(out) == 3
        sizes = [len(r["payload"]["input"]) for r in fake.requests]
        assert sizes == [2, 1]  # first two batched, third flushed alone

    def test_health_check(self, fake):
        c, _ = _client(fake)
        assert c.health_check()
        assert c.health_check(test_api=True)
        fake.script = [{"status": 500}] * 10
        assert not c.health_check(test_api=True)

    def test_model_info(self, fake):
        c, _ = _client(fake)
        info = c.get_model_info()
        assert info == {
            "name": "voyage-code-3",
            "provider": "voyage-ai",
            "token_limit": 120000,
        }


class TestFactory:
    def test_slugs(self):
        f = EmbeddingProviderFactory
        assert f.generate_model_slug("voyage-ai", "voyage-code-3") == (
            "voyage_ai_voyage_code_3"
        )
        assert f.generate_collection_name("voyage-ai", "voyage-2", "proj") == (
            "proj_voyage_ai_voyage_2"
        )

    def test_create(self):
        p = EmbeddingProviderFactory.create("hash", dim=8)
        assert isinstance(p, HashEmbeddingProvider)
        v = EmbeddingProviderFactory.create("voyage-ai", api_key="k")
        assert isinstance(v, VoyageAIClient)
        with pytest.raises(ValueError, match="unknown embedding provider"):
            EmbeddingProviderFactory.create("openai")


class TestReviewRegressions:
    def test_retry_after_http_date_falls_back_to_backoff(self, fake):
        """RFC 7231 allows an HTTP-date Retry-After; it must fall back to
        exponential backoff, not crash with a float() ValueError."""
        fake.script = [
            {"status": 429, "headers": {"Retry-After": "Wed, 21 Oct 2026 07:28:00 GMT"}}
        ]
        c, sleeps = _client(fake)
        assert c.get_embeddings_batch(["x"]) == [[1.0, 1.0]]
        assert sleeps == [1.0]  # base delay * 2**0
