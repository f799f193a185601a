"""Embedding provider interface + clients (reference
``services/embedding_provider.py`` / ``voyage_ai.py`` /
``embedding_factory.py``).

Two providers behind the reference's abstract interface:

- ``HashEmbeddingProvider`` — the engine's deterministic feature-hashing
  embedder (``text/embed.py``) exposed through the provider API.  This is
  the offline default: no key, no network, bit-reproducible (it is what
  every cataloged pipeline uses).
- ``VoyageAIClient`` — the reference's API client shape
  (``services/voyage_ai.py:21-240``) rebuilt on stdlib ``urllib``:
  VOYAGE_API_KEY required at construction, per-request connections, the
  reference's exact retry policy (429 honors the server's Retry-After
  header, else exponential backoff capped at 300 s; 5xx exponential
  backoff; other 4xx never retried; transport errors retried at the base
  delay), the reference's terminal error mapping (401 → ValueError about
  the key, 429 → RuntimeError about rate limits, other HTTP → RuntimeError
  with the response body, transport → ConnectionError), and token-aware
  dynamic batching at a 90 % safety margin of the model's token limit.
  Token counting uses the engine's BPE-ish counter
  (``text/tokencount.BPE_PATTERN``) — the embedded-tokenizer analog of the
  reference's ``embedded_voyage_tokenizer.py`` (which needs a HuggingFace
  download this environment cannot make).

This container has no network, so the live API is unreachable; the client
is tested against a local stdlib HTTP server speaking the VoyageAI wire
format (tests/test_providers.py), which exercises every branch of the
retry/batching machinery for real.  ``time.sleep`` is injectable so backoff
tests don't sleep.
"""

from __future__ import annotations

import json
import os
import re
import time
import urllib.error
import urllib.request
from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import numpy as np
import pyarrow as pa

__all__ = [
    "EmbeddingResult",
    "BatchEmbeddingResult",
    "EmbeddingProvider",
    "HashEmbeddingProvider",
    "VoyageAIConfig",
    "VoyageAIClient",
    "EmbeddingProviderFactory",
]


@dataclass
class EmbeddingResult:
    embedding: list[float]
    model: str
    tokens_used: Optional[int] = None
    provider: Optional[str] = None


@dataclass
class BatchEmbeddingResult:
    embeddings: list[list[float]]
    model: str
    total_tokens_used: Optional[int] = None
    provider: Optional[str] = None


class EmbeddingProvider(ABC):
    """Reference ``services/embedding_provider.py`` interface."""

    @abstractmethod
    def get_embedding(self, text: str, model: Optional[str] = None) -> list[float]:
        ...

    @abstractmethod
    def get_embeddings_batch(
        self, texts: list[str], model: Optional[str] = None
    ) -> list[list[float]]:
        ...

    def get_embedding_with_metadata(
        self, text: str, model: Optional[str] = None
    ) -> EmbeddingResult:
        return EmbeddingResult(
            embedding=self.get_embedding(text, model),
            model=model or self.get_current_model(),
            tokens_used=self._count_tokens(text),
            provider=self.get_provider_name(),
        )

    def get_embeddings_batch_with_metadata(
        self, texts: list[str], model: Optional[str] = None
    ) -> BatchEmbeddingResult:
        return BatchEmbeddingResult(
            embeddings=self.get_embeddings_batch(texts, model),
            model=model or self.get_current_model(),
            total_tokens_used=sum(self._count_tokens(t) for t in texts),
            provider=self.get_provider_name(),
        )

    @abstractmethod
    def health_check(self) -> bool:
        ...

    @abstractmethod
    def get_provider_name(self) -> str:
        ...

    @abstractmethod
    def get_current_model(self) -> str:
        ...

    def get_model_info(self) -> dict[str, Any]:
        return {"name": self.get_current_model(), "provider": self.get_provider_name()}

    def supports_batch_processing(self) -> bool:
        return True

    def _count_tokens(self, text: str) -> int:
        # the engine's BPE-ish counter (RE2 \p classes → pyarrow kernel, the
        # same pattern TokenCountStage ships in the data plane)
        import pyarrow.compute as pc

        from .tokencount import BPE_PATTERN

        return int(
            pc.count_substring_regex(pa.array([text]), pattern=BPE_PATTERN)[0].as_py()
        )


class HashEmbeddingProvider(EmbeddingProvider):
    """The deterministic feature-hashing embedder behind the provider API.

    Exactly the vectors :class:`~code_indexer_ray.text.embed.TextEmbedStage`
    produces with ``output="list"`` (parity-tested), so pipelines and the
    interactive provider agree bit-for-bit.
    """

    def __init__(self, dim: int = 64):
        from .embed import TextEmbedStage

        self.dim = dim
        self._stage = TextEmbedStage(dim=dim, output="list")

    def get_embedding(self, text: str, model: Optional[str] = None) -> list[float]:
        return self.get_embeddings_batch([text], model)[0]

    def get_embeddings_batch(
        self, texts: list[str], model: Optional[str] = None
    ) -> list[list[float]]:
        if not texts:
            return []
        batch = pa.table(
            {"doc_id": pa.array(range(len(texts))), "text": pa.array(texts)}
        )
        out = self._stage(batch)
        return [list(map(float, v)) for v in out["embedding"].to_pylist()]

    def health_check(self) -> bool:
        return True

    def get_provider_name(self) -> str:
        return "hash-local"

    def get_current_model(self) -> str:
        return f"feature-hash-{self.dim}"

    def get_model_info(self) -> dict[str, Any]:
        return {
            "name": self.get_current_model(),
            "provider": self.get_provider_name(),
            "dimensions": self.dim,
            "deterministic": True,
        }


@dataclass
class VoyageAIConfig:
    """Reference ``VoyageAIConfig`` knobs that matter to the client."""

    model: str = "voyage-code-3"
    api_endpoint: str = "https://api.voyageai.com/v1/embeddings"
    timeout: float = 30.0
    max_retries: int = 3
    retry_delay: float = 1.0
    exponential_backoff: bool = True
    # reference data/voyage_models.yaml token limits (public docs values)
    token_limits: dict = field(
        default_factory=lambda: {
            "voyage-code-3": 120000,
            "voyage-large-2": 120000,
            "voyage-2": 320000,
        }
    )


class _HTTPStatusError(Exception):
    def __init__(self, status: int, headers: dict, body: str):
        super().__init__(f"HTTP {status}")
        self.status = status
        self.headers = headers
        self.body = body


class VoyageAIClient(EmbeddingProvider):
    """VoyageAI embeddings API client (reference ``voyage_ai.py``)."""

    def __init__(
        self,
        config: VoyageAIConfig | None = None,
        *,
        api_key: str | None = None,
        sleep_fn: Callable[[float], None] = time.sleep,
    ):
        self.config = config or VoyageAIConfig()
        self.api_key = api_key or os.getenv("VOYAGE_API_KEY")
        if not self.api_key:
            raise ValueError(
                "VOYAGE_API_KEY environment variable is required for VoyageAI. "
                "Set it with: export VOYAGE_API_KEY=your_api_key_here"
            )
        self._sleep = sleep_fn

    # -- plumbing --

    def _get_model_token_limit(self) -> int:
        return int(self.config.token_limits.get(self.config.model, 120000))

    def _post_once(self, payload: dict) -> dict:
        req = urllib.request.Request(
            self.config.api_endpoint,
            data=json.dumps(payload).encode(),
            headers={
                "Authorization": f"Bearer {self.api_key}",
                "Content-Type": "application/json",
            },
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=self.config.timeout) as r:
                return json.loads(r.read())
        except urllib.error.HTTPError as e:
            raise _HTTPStatusError(
                e.code, dict(e.headers), e.read().decode(errors="replace")
            ) from None

    def _make_sync_request(
        self, texts: list[str], model: Optional[str] = None
    ) -> dict:
        """One API call with the reference's retry policy (voyage_ai.py:120-200)."""
        payload = {"input": texts, "model": model or self.config.model}
        last: Exception | None = None
        for attempt in range(self.config.max_retries + 1):
            try:
                result = self._post_once(payload)
                if isinstance(result, dict):
                    return result
                raise ValueError(f"Unexpected response format: {type(result)}")
            except _HTTPStatusError as e:
                last = e
                if e.status == 429:
                    retry_after = e.headers.get("Retry-After") or e.headers.get(
                        "retry-after"
                    )
                    wait = None
                    if retry_after:
                        try:
                            wait = float(retry_after)
                        except ValueError:
                            # RFC 7231 allows an HTTP-date here; fall back to
                            # backoff rather than crash out of the retry loop
                            wait = None
                    if wait is None:
                        wait = self.config.retry_delay * (
                            2**attempt if self.config.exponential_backoff else 1
                        )
                    wait = min(wait, 300.0)
                    if attempt < self.config.max_retries:
                        self._sleep(wait)
                        continue
                elif e.status >= 500:
                    wait = self.config.retry_delay * (
                        2**attempt if self.config.exponential_backoff else 1
                    )
                    if attempt < self.config.max_retries:
                        self._sleep(wait)
                        continue
                else:
                    break  # other client errors: never retried
            except ValueError:
                raise
            except Exception as e:  # transport errors: flat-delay retry
                last = e
                if attempt < self.config.max_retries:
                    self._sleep(self.config.retry_delay)
                    continue
                break
        if isinstance(last, _HTTPStatusError):
            if last.status == 401:
                raise ValueError(
                    "Invalid VoyageAI API key. Check VOYAGE_API_KEY environment variable."
                )
            if last.status == 429:
                raise RuntimeError(
                    "VoyageAI rate limit exceeded. Try reducing parallel_requests"
                    " or requests_per_minute."
                )
            raise RuntimeError(
                f"VoyageAI API error (HTTP {last.status}): {last}. "
                f"Response: {last.body}"
            )
        raise ConnectionError(f"Failed to connect to VoyageAI: {last}")

    # -- provider interface --

    def get_embedding(self, text: str, model: Optional[str] = None) -> list[float]:
        return self.get_embeddings_batch([text], model)[0]

    def get_embeddings_batch(
        self, texts: list[str], model: Optional[str] = None
    ) -> list[list[float]]:
        """Token-aware dynamic batching at a 90 % limit safety margin."""
        if not texts:
            return []
        safety = int(self._get_model_token_limit() * 0.9)
        out: list[list[float]] = []
        batch: list[str] = []
        batch_tokens = 0
        for t in texts:
            n = self._count_tokens(t)
            if batch and batch_tokens + n > safety:
                out.extend(self._flush(batch, model))
                batch, batch_tokens = [], 0
            batch.append(t)
            batch_tokens += n
        if batch:
            out.extend(self._flush(batch, model))
        return out

    def _flush(self, batch: list[str], model: Optional[str]) -> list[list[float]]:
        result = self._make_sync_request(batch, model)
        data = result.get("data")
        if not isinstance(data, list) or len(data) != len(batch):
            raise RuntimeError(f"Malformed VoyageAI response: {result!r:.200}")
        return [row["embedding"] for row in data]

    def health_check(self, test_api: bool = False) -> bool:
        ok = bool(self.api_key and self.config.model and self.config.api_endpoint)
        if not ok:
            return False
        if test_api:
            try:
                self._make_sync_request(["test"])
            except Exception:
                return False
        return True

    def get_provider_name(self) -> str:
        return "voyage-ai"

    def get_current_model(self) -> str:
        return self.config.model

    def get_model_info(self) -> dict[str, Any]:
        return {
            "name": self.config.model,
            "provider": "voyage-ai",
            "token_limit": self._get_model_token_limit(),
        }


class EmbeddingProviderFactory:
    """Reference ``services/embedding_factory.py``: provider construction +
    the slug/collection-name scheme."""

    @staticmethod
    def generate_model_slug(provider_name: str, model_name: str) -> str:
        provider_slug = re.sub(r"[^a-zA-Z0-9_]", "_", provider_name.lower())
        provider_slug = re.sub(r"_+", "_", provider_slug).strip("_")
        model_slug = re.sub(r"[^a-zA-Z0-9_]", "_", model_name.lower())
        model_slug = re.sub(r"_+", "_", model_slug).strip("_")
        return f"{provider_slug}_{model_slug}"

    @classmethod
    def generate_collection_name(
        cls, provider_name: str, model_name: str, project_name: str = "code_index"
    ) -> str:
        return f"{project_name}_{cls.generate_model_slug(provider_name, model_name)}"

    @staticmethod
    def create(provider: str = "hash", **kwargs) -> EmbeddingProvider:
        if provider in ("hash", "hash-local"):
            return HashEmbeddingProvider(**kwargs)
        if provider == "voyage-ai":
            return VoyageAIClient(**kwargs)
        raise ValueError(f"unknown embedding provider {provider!r}")
