"""Omni-search (reference ``server/omni/``): pattern matcher semantics,
global / per_repo aggregation math, TTL cursor cache, and the live
registry fan-out with error isolation — plus the ``repos omni`` CLI."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.query.omni import (
    OmniCache,
    OmniSearchConfig,
    OmniSearchService,
    RepoPatternMatcher,
    ResultAggregator,
)


class Clock:
    def __init__(self, t=1_000.0):
        self.t = float(t)

    def __call__(self):
        return self.t

    def advance(self, s):
        self.t += s


REPOS = ["web-api-global", "web-ui-global", "data-pipeline-global", "tools-global"]


class TestPatternMatcher:
    def test_exact(self):
        m = RepoPatternMatcher(["web-ui-global"])
        assert m.filter_repos(REPOS) == ["web-ui-global"]
        assert RepoPatternMatcher(["nope"]).filter_repos(REPOS) == []

    def test_wildcard(self):
        assert RepoPatternMatcher(["web-*"]).filter_repos(REPOS) == [
            "web-api-global",
            "web-ui-global",
        ]
        assert RepoPatternMatcher(["*-pipeline-*"]).filter_repos(REPOS) == [
            "data-pipeline-global"
        ]
        assert RepoPatternMatcher(["web-?i-global"]).filter_repos(REPOS) == [
            "web-ui-global"
        ]
        assert RepoPatternMatcher(["[wt]*-global"]).filter_repos(REPOS) == [
            "web-api-global",
            "web-ui-global",
            "tools-global",
        ]

    def test_regex(self):
        assert RepoPatternMatcher(["^web-.*$"]).filter_repos(REPOS) == [
            "web-api-global",
            "web-ui-global",
        ]
        assert RepoPatternMatcher(["api|tools"]).filter_repos(REPOS) == [
            "web-api-global",
            "tools-global",
        ]
        # bad regex silently ignored (reference behavior)
        assert RepoPatternMatcher(["^(("]).filter_repos(REPOS) == []

    def test_union_preserves_input_order(self):
        m = RepoPatternMatcher(["tools-global", "web-*"])
        assert m.filter_repos(REPOS) == [
            "web-api-global",
            "web-ui-global",
            "tools-global",
        ]

    def test_empty_patterns(self):
        assert RepoPatternMatcher([]).filter_repos(REPOS) == []


def _rows(scores):
    return [{"doc_id": i, "score": s} for i, s in enumerate(scores)]


class TestAggregator:
    def test_validation(self):
        with pytest.raises(ValueError, match="aggregation mode"):
            ResultAggregator("bogus", 10)
        with pytest.raises(ValueError, match="non-negative"):
            ResultAggregator("global", -1)

    def test_global_topk(self):
        agg = ResultAggregator("global", 3)
        out = agg.aggregate({"a": _rows([0.9, 0.1]), "b": _rows([0.5, 0.95])})
        assert [(r["repository_alias"], r["score"]) for r in out] == [
            ("b", 0.95),
            ("a", 0.9),
            ("b", 0.5),
        ]

    def test_global_tie_stability(self):
        # equal scores keep repo-dict order then per-repo order (stable sort)
        out = ResultAggregator("global", 4).aggregate(
            {"a": _rows([0.5, 0.5]), "b": _rows([0.5])}
        )
        assert [r["repository_alias"] for r in out] == ["a", "a", "b"]

    def test_limit_zero_and_empty(self):
        assert ResultAggregator("global", 0).aggregate({"a": _rows([1.0])}) == []
        assert ResultAggregator("per_repo", 5).aggregate({"a": []}) == []

    def test_per_repo_proportional_interleave(self):
        # a has 6 results, b has 2; limit 4 → alloc a=ceil(6/8*4)=3, b=1
        out = ResultAggregator("per_repo", 4).aggregate(
            {"a": _rows([0.9, 0.8, 0.7, 0.6, 0.5, 0.4]), "b": _rows([0.3, 0.2])}
        )
        assert len(out) == 4
        assert [r["repository_alias"] for r in out] == ["a", "b", "a", "a"]
        a_scores = [r["score"] for r in out if r["repository_alias"] == "a"]
        assert a_scores == [0.9, 0.8, 0.7]  # per-repo score order kept

    def test_per_repo_trim_loop(self):
        # three repos, limit 2: every repo floors at 1 → trim to the budget
        out = ResultAggregator("per_repo", 2).aggregate(
            {"a": _rows([0.9]), "b": _rows([0.8]), "c": _rows([0.7])}
        )
        assert len(out) == 2

    def test_per_repo_min_one_small_repo(self):
        # tiny repo still gets a slot (floor 1, reference max(1, ...))
        out = ResultAggregator("per_repo", 5).aggregate(
            {"big": _rows([0.9] * 20), "small": _rows([0.1])}
        )
        assert {"big", "small"} == {r["repository_alias"] for r in out}


class TestOmniCache:
    def test_store_page_metadata(self):
        clk = Clock()
        c = OmniCache(ttl_seconds=60, now_fn=clk)
        cur = c.store_results(_rows([0.9, 0.8, 0.7]), {"query": "x"})
        assert c.get_results(cur, offset=0, limit=2) == _rows([0.9, 0.8, 0.7])[:2]
        assert c.get_results(cur, offset=2, limit=2) == [_rows([0.9, 0.8, 0.7])[2]]
        assert c.get_results(cur, offset=99) == []
        meta = c.get_metadata(cur)
        assert meta["total_results"] == 3 and meta["query_params"] == {"query": "x"}

    def test_ttl_expiry(self):
        clk = Clock()
        c = OmniCache(ttl_seconds=60, now_fn=clk)
        cur = c.store_results(_rows([1.0]))
        clk.advance(61)
        assert c.get_results(cur) is None
        assert c.get_metadata(cur) is None

    def test_max_entries_lru(self):
        clk = Clock()
        c = OmniCache(ttl_seconds=1e6, max_entries=2, now_fn=clk)
        c1 = c.store_results(_rows([1.0]))
        clk.advance(1)
        c2 = c.store_results(_rows([2.0]))
        clk.advance(1)
        c.get_results(c1)  # refresh c1 → c2 becomes LRU
        clk.advance(1)
        c3 = c.store_results(_rows([3.0]))
        assert c.get_results(c2) is None
        assert c.get_results(c1) is not None and c.get_results(c3) is not None

    def test_stats(self):
        c = OmniCache()
        cur = c.store_results([])
        c.get_results(cur)
        c.get_results("bogus")
        st = c.get_stats()
        assert st["hit_count"] == 1 and st["miss_count"] == 1 and st["entries"] == 1


# ---------------------------------------------------------------------------
# live registry fan-out
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def omni_registry(ray_session, tmp_path_factory):
    from code_indexer_ray.index.build import build_index
    from code_indexer_ray.repos import GlobalRegistry

    tmp = tmp_path_factory.mktemp("omni")
    rng = np.random.default_rng(5)
    vocab = ["spark", "merge", "window", "batch"]
    reg = GlobalRegistry(str(tmp / "reg"))
    for name in ("web-api", "web-ui", "tools"):
        rows = [
            {
                "doc_id": i,
                "text": " ".join(vocab[j] for j in rng.integers(0, 4, 10)),
                "lang": "en",
                "url": f"{name}/f{i}.py",
            }
            for i in range(30)
        ]
        src = str(tmp / f"{name}.parquet")
        pq.write_table(pa.Table.from_pylist(rows), src)
        idx = str(tmp / f"idx-{name}")
        build_index(src, idx, store_cols=("lang", "url"), num_shards=1, resume=False)
        reg.register(name, f"{name}-global", idx)
    return reg, str(tmp)


@pytest.mark.usefixtures("ray_session")
class TestOmniService:
    def test_pattern_fanout_global(self, omni_registry):
        reg, _ = omni_registry
        svc = OmniSearchService(reg)
        out = svc.search(["web-*"], "spark", limit=6)
        assert out["total_repos_searched"] == 2 and not out["errors"]
        aliases = {r["repository_alias"] for r in out["results"]}
        assert aliases <= {"web-api-global", "web-ui-global"} and aliases
        scores = [r["score"] for r in out["results"]]
        assert scores == sorted(scores, reverse=True)
        # cursor pages the same result set without re-querying
        page = svc.page(out["cursor"], offset=2, limit=2)
        assert page == out["results"][2:4]

    def test_per_repo_mode_and_exact(self, omni_registry):
        reg, _ = omni_registry
        svc = OmniSearchService(reg)
        out = svc.search(
            ["web-api-global", "tools-global"], "merge", limit=6,
            aggregation_mode="per_repo",
        )
        assert {r["repository_alias"] for r in out["results"]} == {
            "web-api-global",
            "tools-global",
        }

    def test_no_match_and_error_isolation(self, omni_registry):
        reg, _ = omni_registry
        svc = OmniSearchService(reg)
        out = svc.search(["nothing-*"], "spark")
        assert out["total_results"] == 0 and out["total_repos_searched"] == 0

        def flaky(alias, q, params):
            if alias == "web-ui-global":
                raise RuntimeError("boom")
            return reg.search(alias, q, params)

        svc2 = OmniSearchService(reg, search_fn=flaky)
        out = svc2.search(["web-*"], "spark", limit=4)
        assert out["errors"] == {"web-ui-global": "boom"}
        assert out["total_repos_searched"] == 1
        assert {r["repository_alias"] for r in out["results"]} == {"web-api-global"}

    def test_cli(self, omni_registry):
        reg, tmp = omni_registry
        r = subprocess.run(
            [
                sys.executable, "-m", "code_indexer_ray", "repos", "omni",
                "--root", os.path.join(tmp, "reg"),
                "--patterns", "web-*", "spark", "--limit", "4",
            ],
            capture_output=True, text=True,
            env={**os.environ, "RAY_ADDRESS": "local"},
        )
        assert r.returncode == 0, r.stderr
        out = json.loads(r.stdout)
        assert out["total_repos_searched"] == 2 and len(out["results"]) <= 4


class TestReviewRegressions:
    """Fixes from the seventh-session code review."""

    def test_cursor_pages_past_first_response(self):
        """The cursor parks the FULL ordered set — page 2 is real data, not
        [] (the reference caches its post-limit list, which makes paging
        inert; we diverge deliberately)."""

        class FakeReg:
            def list_repos(self):
                return [{"alias_name": "a-global"}, {"alias_name": "b-global"}]

            def search(self, alias, q, params):
                base = 0.9 if alias == "a-global" else 0.8
                return [
                    {"doc_id": i, "score": base - i * 0.01} for i in range(20)
                ]

        svc = OmniSearchService(FakeReg())
        out = svc.search(["*-global"], "q", limit=5)
        assert len(out["results"]) == 5 and out["total_results"] == 40
        page2 = svc.page(out["cursor"], offset=5, limit=5)
        assert len(page2) == 5
        assert page2[0]["score"] <= out["results"][-1]["score"]
        # pages concatenate into one consistent ordering
        all_scores = [r["score"] for r in out["results"] + page2]
        assert all_scores == sorted(all_scores, reverse=True)

    def test_hung_repo_bounds_wall_clock(self):
        """One wedged repo must not hang search(): the fan-out waits ONE
        deadline for the whole batch and abandons stragglers."""
        import threading
        import time as _time

        release = threading.Event()

        class FakeReg:
            def list_repos(self):
                return [{"alias_name": "ok-global"}, {"alias_name": "hung-global"}]

            def search(self, alias, q, params):
                if alias == "hung-global":
                    release.wait(timeout=30)
                return [{"doc_id": 1, "score": 0.5}]

        svc = OmniSearchService(
            FakeReg(), OmniSearchConfig(per_repo_timeout_seconds=0.3)
        )
        t0 = _time.monotonic()
        out = svc.search(["*-global"], "q")
        elapsed = _time.monotonic() - t0
        release.set()
        assert elapsed < 5.0
        assert out["total_repos_searched"] == 1
        assert "timeout" in out["errors"]["hung-global"].lower()
        assert {r["repository_alias"] for r in out["results"]} == {"ok-global"}
