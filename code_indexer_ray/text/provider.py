"""Embedding-provider client: retry / backoff / rate-limit / token-aware
batching plumbing, transport-agnostic.

The reference's embedding provider (``services/voyage_ai.py:115-205``,
``:215-260``) is an HTTP client whose *behavior contract* — not its HTTP
code — matters to a pipeline: token-aware dynamic batching with a 90 %
safety margin against the model's token limit, retry with server-driven
(Retry-After) or exponential backoff on 429, exponential backoff on 5xx,
no retry on other 4xx, fixed-delay retry on transport failures, a 300 s
backoff cap, and loud validation of missing/empty embeddings in a
response.  This module re-expresses that contract against an INJECTED
transport callable, because the sandbox has no network: the default
transport is the deterministic hashing embedder (same math as
:class:`~code_indexer_ray.text.embed.TextEmbedStage`, so outputs stay
oracle-anchored), and tests drive the retry matrix with scripted flaky
transports and a fake clock.  A real HTTP transport is a ~15-line drop-in.

Designed for actor pools: ``ProviderEmbedStage`` holds one client per
actor (``__init__``) and embeds Arrow batches (``__call__``), so at scale
each worker keeps its own rate-limiter window and connection state.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

import numpy as np
import pyarrow as pa

#: model → context token limit (public voyage model limits, mirroring the
#: reference's bundled model-spec fallback table)
MODEL_TOKEN_LIMITS = {
    "voyage-code-3": 120_000,
    "voyage-large-2": 120_000,
    "voyage-2": 320_000,
    "hashing-16": 120_000,
}
DEFAULT_TOKEN_LIMIT = 120_000
BACKOFF_CAP_SEC = 300.0


class TransportStatusError(Exception):
    """HTTP-status analog: carries status code and optional Retry-After."""

    def __init__(self, status: int, retry_after: float | None = None, body: str = ""):
        super().__init__(f"status {status}")
        self.status = status
        self.retry_after = retry_after
        self.body = body


class TransportFailure(Exception):
    """Connection-level failure analog (DNS, timeout, reset)."""


@dataclass
class ProviderConfig:
    model: str = "hashing-16"
    max_retries: int = 3
    retry_delay: float = 1.0
    exponential_backoff: bool = True
    safety_margin: float = 0.9
    requests_per_minute: int | None = None
    token_limits: dict[str, int] = field(default_factory=lambda: dict(MODEL_TOKEN_LIMITS))

    def token_limit(self) -> int:
        return self.token_limits.get(self.model, DEFAULT_TOKEN_LIMIT)


def hashing_transport(dim: int = 16) -> Callable[[Sequence[str], str], dict]:
    """Default no-network transport: the deterministic feature-hashing
    embedder, returning the provider-style ``{"data": [{"embedding": ...}]}``
    envelope (vectors identical to :class:`TextEmbedStage` output='list')."""
    from .embed import TextEmbedStage

    stage = TextEmbedStage(dim=dim, output="list")

    def transport(texts: Sequence[str], model: str) -> dict:
        batch = pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(list(texts), type=pa.string()),
            }
        )
        out = stage(batch)
        return {"data": [{"embedding": e} for e in out["embedding"].to_pylist()]}

    return transport


class EmbeddingClient:
    """Transport-agnostic provider client implementing the reference's
    retry/backoff/batching contract (see module docstring).

    ``transport(texts, model) -> {"data": [{"embedding": [...]}, ...]}``;
    raise :class:`TransportStatusError` / :class:`TransportFailure` to
    signal provider/transport failures.  ``sleep`` and ``clock`` are
    injectable so tests assert exact backoff schedules without waiting.
    """

    def __init__(
        self,
        transport: Callable[[Sequence[str], str], dict] | None = None,
        config: ProviderConfig | None = None,
        *,
        count_tokens: Callable[[str], int] | None = None,
        sleep: Callable[[float], None] = time.sleep,
        clock: Callable[[], float] = time.monotonic,
    ):
        self.config = config or ProviderConfig()
        self.transport = transport or hashing_transport()
        self._count_tokens = count_tokens or self._default_count_tokens
        self._sleep = sleep
        self._clock = clock
        self._request_times: list[float] = []  # rate-limiter window
        self.stats = {"requests": 0, "retries": 0, "rate_waits": 0.0, "backoff_waits": 0.0}

    @staticmethod
    def _default_count_tokens(text: str) -> int:
        # the engine's own analyzer tokenization (text/analysis.py), applied
        # to one string — provider batching only needs a consistent count
        from .analysis import tokenize_flat

        toks, _rows = tokenize_flat(pa.array([text], type=pa.string()))
        return len(toks)

    # -- rate limiting -----------------------------------------------------
    def _rate_limit(self) -> None:
        rpm = self.config.requests_per_minute
        if not rpm:
            return
        now = self._clock()
        window = [t for t in self._request_times if now - t < 60.0]
        if len(window) >= rpm:
            wait = 60.0 - (now - window[0])
            if wait > 0:
                self.stats["rate_waits"] += wait
                self._sleep(wait)
                now = self._clock()
        window.append(now)
        self._request_times = window[-rpm:] if rpm else window

    # -- retry matrix --------------------------------------------------------
    def _request_with_retry(self, texts: Sequence[str]) -> dict:
        cfg = self.config
        last: Exception | None = None
        for attempt in range(cfg.max_retries + 1):
            self._rate_limit()
            try:
                self.stats["requests"] += 1
                result = self.transport(texts, cfg.model)
                if not isinstance(result, dict):
                    raise ValueError(f"unexpected response type: {type(result)}")
                return result
            except TransportStatusError as e:
                last = e
                if e.status == 429:  # server-driven wait, else exponential
                    wait = (
                        e.retry_after
                        if e.retry_after is not None
                        else cfg.retry_delay * (2**attempt if cfg.exponential_backoff else 1)
                    )
                    wait = min(wait, BACKOFF_CAP_SEC)
                    if attempt < cfg.max_retries:
                        self.stats["retries"] += 1
                        self.stats["backoff_waits"] += wait
                        self._sleep(wait)
                        continue
                elif e.status >= 500:
                    wait = cfg.retry_delay * (2**attempt if cfg.exponential_backoff else 1)
                    wait = min(wait, BACKOFF_CAP_SEC)
                    if attempt < cfg.max_retries:
                        self.stats["retries"] += 1
                        self.stats["backoff_waits"] += wait
                        self._sleep(wait)
                        continue
                else:
                    break  # other 4xx: not retryable
            except TransportFailure as e:
                last = e
                if attempt < cfg.max_retries:
                    self.stats["retries"] += 1
                    self.stats["backoff_waits"] += cfg.retry_delay
                    self._sleep(cfg.retry_delay)
                    continue
                break
        # exhausted / non-retryable — terminal mapping mirrors the reference
        if isinstance(last, TransportStatusError):
            if last.status == 401:
                raise ValueError("invalid provider API key") from last
            if last.status == 429:
                raise RuntimeError(
                    "provider rate limit exceeded; reduce concurrency or requests_per_minute"
                ) from last
            raise RuntimeError(
                f"provider error (HTTP {last.status}): {last.body or last}"
            ) from last
        raise ConnectionError(f"failed to reach provider: {last}") from last

    # -- token-aware dynamic batching ---------------------------------------
    def embed_batch(self, texts: Sequence[str]) -> list[list[float]]:
        """Embed preserving order, splitting into sub-requests so each stays
        under ``safety_margin × token_limit`` (oversized single texts go
        alone — the provider, not the client, enforces per-item limits)."""
        if not texts:
            return []
        limit = int(self.config.token_limit() * self.config.safety_margin)
        out: list[list[float]] = []
        batch: list[str] = []
        batch_tokens = 0
        for text in texts:
            t = self._count_tokens(text)
            if batch and batch_tokens + t > limit:
                out.extend(self._submit(batch))
                batch, batch_tokens = [], 0
            batch.append(text)
            batch_tokens += t
        if batch:
            out.extend(self._submit(batch))
        return out

    def _submit(self, batch: list[str]) -> list[list[float]]:
        result = self._request_with_retry(batch)
        data = result.get("data")
        if not isinstance(data, list) or len(data) != len(batch):
            raise RuntimeError(
                f"provider returned {len(data) if isinstance(data, list) else type(data)} "
                f"items for a {len(batch)}-text request"
            )
        vectors: list[list[float]] = []
        for idx, item in enumerate(data):
            emb = item.get("embedding") if isinstance(item, dict) else None
            if emb is None:
                raise RuntimeError(f"provider returned None embedding at index {idx}")
            if len(emb) == 0:
                raise RuntimeError(f"provider returned empty embedding at index {idx}")
            vectors.append(list(map(float, emb)))
        return vectors

    def embed(self, text: str) -> list[float]:
        return self.embed_batch([text])[0]


class ProviderEmbedStage:
    """Actor-pool stage wrapping :class:`EmbeddingClient`:
    ``ds.map_batches(ProviderEmbedStage, fn_constructor_kwargs={...},
    concurrency=N, batch_format="pyarrow")``.  One client (rate window,
    transport state) per actor; Arrow batch in, (doc_id, embedding) out."""

    def __init__(
        self,
        dim: int = 16,
        id_col: str = "doc_id",
        text_col: str = "text",
        config: ProviderConfig | None = None,
        transport_factory: Callable[[], Callable[[Sequence[str], str], dict]] | None = None,
    ):
        transport = transport_factory() if transport_factory else hashing_transport(dim)
        self.client = EmbeddingClient(transport, config)
        self.dim = dim
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        vectors = self.client.embed_batch([t or "" for t in texts])
        flat = np.asarray(vectors, dtype=np.float64).reshape(-1)
        return pa.table(
            {
                "doc_id": batch[self.id_col].cast(pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(flat), self.dim
                ).cast(pa.list_(pa.float64())),
            }
        )


def provider_embed(
    ds: Any,
    *,
    dim: int = 16,
    concurrency: int = 4,
    batch_size: int = 256,
    config: ProviderConfig | None = None,
):
    """Provider-backed embedding as a proper actor-pool stage."""
    return ds.map_batches(
        ProviderEmbedStage,
        fn_constructor_kwargs={"dim": dim, "config": config},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
