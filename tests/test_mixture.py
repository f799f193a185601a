"""Target-mixture sampling (`pipelines/ops.py::mixture_sample`)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from code_indexer_ray.pipelines.ops import mixture_sample


def _ds(counts: dict[str, int]):
    import ray.data as rd

    rows = []
    i = 0
    for dom, n in counts.items():
        for _ in range(n):
            rows.append({"doc_id": i, "lang": dom})
            i += 1
    return rd.from_arrow(pa.Table.from_pylist(rows))


def test_bottleneck_quotas_and_exclusion(ray_session):
    ds = _ds({"en": 200, "fr": 50, "es": 80})
    out = mixture_sample(ds, "doc_id", "lang", {"en": 0.5, "fr": 0.5}).take_all()
    by = {}
    for r in out:
        by.setdefault(r["lang"], []).append(r["doc_id"])
    # T = min(200/.5, 50/.5) = 100 -> 50 en + 50 fr, es excluded entirely
    assert sorted(by) == ["en", "fr"]
    assert len(by["en"]) == 50 and len(by["fr"]) == 50


def test_deterministic_and_stable_under_repartition(ray_session):
    ds = _ds({"a": 120, "b": 40})
    w = {"a": 0.6, "b": 0.4}
    first = sorted(r["doc_id"] for r in mixture_sample(ds, "doc_id", "lang", w).take_all())
    again = sorted(
        r["doc_id"]
        for r in mixture_sample(ds.repartition(7), "doc_id", "lang", w).take_all()
    )
    assert first == again and len(first) > 0


def test_exact_composition_matches_weights(ray_session):
    ds = _ds({"a": 1000, "b": 1000, "c": 1000})
    out = mixture_sample(ds, "doc_id", "lang", {"a": 0.5, "b": 0.3, "c": 0.2}).take_all()
    cnt = {d: 0 for d in "abc"}
    for r in out:
        cnt[r["lang"]] += 1
    total = sum(cnt.values())
    # c is the bottleneck: T = 1000/.2 = 5000 capped by a at 2000 -> T=2000
    assert cnt == {"a": 1000, "b": 600, "c": 400}
    assert np.isclose(cnt["a"] / total, 0.5)


def test_no_feasible_domain_returns_empty(ray_session):
    ds = _ds({"x": 10})
    assert mixture_sample(ds, "doc_id", "lang", {"y": 1.0}).count() == 0
