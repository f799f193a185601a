"""Temporal indexing (reference ``services/temporal/`` analog): synthesis
spec invariants, time-bucketed build + manifest, bucket routing (a range
opens only its windows), exact (diff-type, day) pre-limit filtering vs a
brute-force scorer, author over-fetch semantics, and resume."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.temporal.history import AUTHORS, change_rows
from code_indexer_ray.temporal.index import build_temporal_index
from code_indexer_ray.temporal.search import TemporalSearcher, _days_between


def _docs_table(n: int = 120, seed: int = 11) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = ["spark", "merge", "window", "batch", "row", "scan"]
    return pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "source": pa.array([f"src{i % 5}" for i in range(n)]),
            "text": pa.array(
                [
                    " ".join(vocab[j] for j in rng.integers(0, 6, int(rng.integers(5, 30))))
                    for _ in range(n)
                ]
            ),
            "lang": pa.array(["en", "de"] * (n // 2)),
        }
    )


class TestHistorySynthesis:
    def test_change_rows_spec(self):
        docs = _docs_table(40)
        chg = change_rows(docs)
        d = chg.to_pylist()
        by_doc: dict[int, list[dict]] = {}
        for r in d:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for doc_id, rows in by_doc.items():
            rows.sort(key=lambda r: r["version"])
            k = 2 + doc_id % 2
            want_n = k + (1 if doc_id % 13 == 5 else 0)
            assert len(rows) == want_n
            assert rows[0]["diff_type"] == "added"
            for r in rows[1:]:
                assert r["diff_type"] == ("deleted" if r["version"] >= k else "modified")
            # commit order == day order, strictly increasing per path
            ts = [r["commit_ts"] for r in rows]
            assert ts == sorted(ts) and len(set(ts)) == len(ts)
            for r in rows:
                assert r["change_id"] == doc_id * 8 + r["version"]
                assert r["author"] == AUTHORS[(doc_id + r["version"]) % 4]
                assert r["tkey"] == f"{r['diff_type']}@{r['commit_day']}"
                assert r["day_idx"] == r["version"] * 3 + doc_id % 3
                if r["diff_type"] == "deleted":
                    assert r["text"] == ""
                elif r["version"] > 0:
                    assert r["text"].endswith(f" rev{r['version']}")

    def test_days_between(self):
        assert _days_between("2025-03-01", "2025-03-03") == [
            "2025-03-01",
            "2025-03-02",
            "2025-03-03",
        ]
        with pytest.raises(ValueError):
            _days_between("2025-03-05", "2025-03-01")


@pytest.fixture(scope="module")
def temporal_idx(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("temporal")
    docs = _docs_table(120)
    src = str(tmp / "docs.parquet")
    pq.write_table(docs, src)
    chg = change_rows(docs)
    chg_path = str(tmp / "changes.parquet")
    pq.write_table(chg, chg_path)
    root = str(tmp / "tidx")
    manifest = build_temporal_index(
        chg_path, root, bucket_days=4, num_shards=2, num_buckets=1
    )
    return root, manifest, chg


class TestBuild:
    def test_manifest_windows(self, temporal_idx):
        _, m, chg = temporal_idx
        assert m["bucket_days"] == 4
        days = chg["day_idx"].to_numpy()
        want_buckets = sorted(set((days // 4).tolist()))
        assert [b["bucket"] for b in m["buckets"]] == want_buckets
        assert sum(b["num_changes"] for b in m["buckets"]) == len(chg)
        for b in m["buckets"]:
            sel = chg.to_pylist()
            rows = [r for r in sel if r["day_idx"] // 4 == b["bucket"]]
            assert b["min_day"] == min(r["commit_day"] for r in rows)
            assert b["max_day"] == max(r["commit_day"] for r in rows)

    def test_resume_short_circuits(self, temporal_idx):
        root, m, _ = temporal_idx
        again = build_temporal_index("/nonexistent", root, bucket_days=4)
        assert again == m  # manifest present → no rebuild, input not touched


class TestSearch:
    def _brute(self, chg: pa.Table, terms: list[str], lo: int, hi: int,
               diff_types=None) -> list[tuple[int, float]]:
        """Independent scorer: stats over the covering-bucket window rows,
        candidates gated to the exact (day, type) filter."""
        from tests.oracle import BruteForceIndex

        rows = [r for r in chg.to_pylist() if lo <= r["day_idx"] <= hi]
        idx = BruteForceIndex({r["change_id"]: r["text"] for r in rows})
        keep = {
            r["change_id"]
            for r in rows
            if diff_types is None or r["diff_type"] in diff_types
        }
        hits = idx.search_groups([[t] for t in terms], limit=10**9)
        return [(d, s) for d, s in hits if d in keep]

    def test_bucket_routing_opens_only_range_windows(self, temporal_idx):
        root, _, _ = temporal_idx
        s = TemporalSearcher(root)
        s.query("spark", start_day="2025-03-01", end_day="2025-03-04", limit=5)
        assert set(s._searchers) == {0}  # days 0..3 → window 0 only
        ents = s.buckets_for("2025-03-05", "2025-03-12")
        assert [e["bucket"] for e in ents] == [1, 2]

    def test_matches_brute_force_aligned_range(self, temporal_idx):
        root, _, chg = temporal_idx
        s = TemporalSearcher(root)
        got = s.query(
            "spark merge", start_day="2025-03-05", end_day="2025-03-12",
            diff_types=["modified"], limit=0,
        )
        want = self._brute(chg, ["spark", "merge"], 4, 11, {"modified"})
        assert [(r["change_id"], round(r["score"], 9)) for r in got] == [
            (d, round(sc, 9))
            for d, sc in sorted(want, key=lambda x: (-round(x[1], 9), x[0]))
        ]
        for r in got:
            assert r["diff_type"] == "modified"
            assert "2025-03-05" <= r["commit_day"] <= "2025-03-12"
            assert r["author"] in AUTHORS and r["commit_ts"] is not None

    def test_unaligned_range_is_day_exact(self, temporal_idx):
        """Days 5..6 cover only part of window 1: stats come from the
        window, but every hit's day must be inside the requested range."""
        root, _, chg = temporal_idx
        s = TemporalSearcher(root)
        got = s.query("spark", start_day="2025-03-06", end_day="2025-03-07", limit=0)
        assert got, "expected hits in the 2-day slice"
        for r in got:
            assert "2025-03-06" <= r["commit_day"] <= "2025-03-07"
        # candidate set == brute-force day filter (scores use window stats)
        rows = [
            r for r in chg.to_pylist() if r["commit_day"] in ("2025-03-06", "2025-03-07")
        ]
        want_ids = {
            r["change_id"] for r in rows if "spark" in r["text"].lower().split()
        }
        assert {r["change_id"] for r in got} == want_ids

    def test_author_overfetch_semantics(self, temporal_idx):
        root, _, _ = temporal_idx
        s = TemporalSearcher(root)
        full = s.query(
            "spark", start_day="2025-03-01", end_day="2025-03-12", limit=0
        )
        lim = 3
        got = s.query(
            "spark", start_day="2025-03-01", end_day="2025-03-12",
            authors=["alice"], limit=lim,
        )
        # reference O1 semantics: top-3·limit of the unfiltered ranking,
        # author-filtered, cut at limit
        over = full[: lim * 3]
        want = [r["change_id"] for r in over if r["author"] == "alice"][:lim]
        assert [r["change_id"] for r in got] == want
        assert all(r["author"] == "alice" for r in got)

    def test_path_filter_and_empty_cases(self, temporal_idx):
        root, _, _ = temporal_idx
        s = TemporalSearcher(root)
        got = s.query(
            "spark", start_day="2025-03-01", end_day="2025-03-12",
            path_filters=["src1/*"], limit=5,
        )
        assert got and all(r["path"].startswith("src1/") for r in got)
        assert s.query("zzzunknown", start_day="2025-03-01", end_day="2025-03-12") == []
        assert s.query("spark", start_day="2031-01-01", end_day="2031-01-02") == []
        assert s.query("", start_day="2025-03-01", end_day="2025-03-12") == []
        with pytest.raises(ValueError):
            s.query("spark", start_day="2025-03-01", end_day="2025-03-12",
                    diff_types=["renamed"])


class TestAppendAndReconstruct:
    def _changes_slice(self, chg: pa.Table, lo: int, hi: int) -> pa.Table:
        days = chg["day_idx"].to_numpy()
        return chg.filter(pa.array((days >= lo) & (days <= hi)))

    @pytest.fixture()
    def split_idx(self, ray_session, tmp_path):
        """Index built from days 0..7 only; days 8..11 held back for append."""
        docs = _docs_table(80, seed=23)
        chg = change_rows(docs)
        base = self._changes_slice(chg, 0, 7)
        tail = self._changes_slice(chg, 8, 11)
        bpath, tpath = str(tmp_path / "base.parquet"), str(tmp_path / "tail.parquet")
        pq.write_table(base, bpath)
        pq.write_table(tail, tpath)
        root = str(tmp_path / "tidx")
        build_temporal_index(bpath, root, bucket_days=4, num_shards=2, num_buckets=1)
        return root, chg, tpath

    def test_append_new_and_hot_windows(self, split_idx):
        from code_indexer_ray.temporal.index import append_changes

        root, chg, tpath = split_idx
        before = TemporalSearcher(root)
        n_before = sum(b["num_changes"] for b in before.manifest["buckets"])
        m = append_changes(tpath, root)
        assert sum(b["num_changes"] for b in m["buckets"]) == len(chg)
        # window 2 (days 8..11) is new; windows 0,1 untouched
        assert [b["bucket"] for b in m["buckets"]] == [0, 1, 2]
        assert n_before == len(chg) - next(
            b["num_changes"] for b in m["buckets"] if b["bucket"] == 2
        )
        # post-append search result == search over a from-scratch build
        s = TemporalSearcher(root)
        got = s.query("spark", start_day="2025-03-01", end_day="2025-03-12", limit=0)
        full_ids = {
            r["change_id"]
            for r in chg.to_pylist()
            if "spark" in r["text"].lower().split()
        }
        assert {r["change_id"] for r in got} == full_ids

    def test_append_hot_window_rebuild_swaps_generation(self, ray_session, tmp_path):
        from code_indexer_ray.temporal.index import append_changes

        docs = _docs_table(60, seed=29)
        chg = change_rows(docs)
        days = chg["day_idx"].to_numpy()
        base = chg.filter(pa.array(days <= 5))   # hot window 1 partially filled
        tail = chg.filter(pa.array((days >= 6) & (days <= 7)))  # same window 1
        bpath, tpath = str(tmp_path / "b.parquet"), str(tmp_path / "t.parquet")
        pq.write_table(base, bpath)
        pq.write_table(tail, tpath)
        root = str(tmp_path / "tidx")
        m0 = build_temporal_index(bpath, root, bucket_days=4, num_shards=2, num_buckets=1)
        hot0 = next(b for b in m0["buckets"] if b["bucket"] == 1)
        m1 = append_changes(tpath, root)
        hot1 = next(b for b in m1["buckets"] if b["bucket"] == 1)
        assert hot1["dir"] != hot0["dir"] and hot1["dir"].endswith("_g1")
        import os

        # current+previous grace: the pre-swap generation survives one
        # rotation so in-flight readers keep resolving
        assert hot1["prev_dir"] == hot0["dir"]
        assert os.path.isdir(os.path.join(root, hot0["dir"]))
        assert hot1["num_changes"] == hot0["num_changes"] + len(tail)
        # window 0 untouched
        assert next(b for b in m1["buckets"] if b["bucket"] == 0) == next(
            b for b in m0["buckets"] if b["bucket"] == 0
        )
        # a SECOND rotation retires the grace generation
        extra = tail.slice(0, 1).to_pylist()[0]
        extra["change_id"] += 4  # unused version slot of the same doc
        extra["commit_ts"] += 1
        p2 = str(root) + "_x2.parquet"
        pq.write_table(pa.Table.from_pylist([extra], schema=tail.schema), p2)
        m2 = append_changes(p2, root)
        hot2 = next(b for b in m2["buckets"] if b["bucket"] == 1)
        assert hot2["dir"].endswith("_g2") and hot2["prev_dir"] == hot1["dir"]
        assert os.path.isdir(os.path.join(root, hot1["dir"]))
        assert not os.path.isdir(os.path.join(root, hot0["dir"]))  # retired now

    def test_empty_append_is_noop(self, split_idx):
        import pyarrow.parquet as pqq

        from code_indexer_ray.temporal.index import append_changes

        root, chg, _ = split_idx
        import tempfile, os
        p = os.path.join(tempfile.mkdtemp(), "empty.parquet")
        pqq.write_table(chg.slice(0, 0), p)
        before = TemporalSearcher(root).manifest
        assert append_changes(p, root) == before

    def test_append_newer_window_leaves_hot_untouched(self, ray_session, tmp_path):
        from code_indexer_ray.temporal.index import append_changes

        docs = _docs_table(50, seed=31)
        chg = change_rows(docs)
        days = chg["day_idx"].to_numpy()
        base = chg.filter(pa.array(days <= 7))    # windows 0, 1 (hot = 1)
        newer = chg.filter(pa.array(days >= 8))   # window 2 only
        bpath, npath = str(tmp_path / "b.parquet"), str(tmp_path / "n.parquet")
        pq.write_table(base, bpath)
        pq.write_table(newer, npath)
        root = str(tmp_path / "tidx")
        m0 = build_temporal_index(bpath, root, bucket_days=4, num_shards=2, num_buckets=1)
        m1 = append_changes(npath, root)
        # hot window 1 NOT rebuilt (same dir, no generation churn)
        assert next(b for b in m1["buckets"] if b["bucket"] == 1) == next(
            b for b in m0["buckets"] if b["bucket"] == 1
        )
        assert any(b["bucket"] == 2 for b in m1["buckets"])

    def test_append_rejects_old_windows(self, split_idx):
        from code_indexer_ray.temporal.index import append_changes

        root, chg, _ = split_idx
        old = self._changes_slice(chg, 0, 2)
        import pyarrow.parquet as pqq, tempfile, os
        p = os.path.join(tempfile.mkdtemp(), "old.parquet")
        pqq.write_table(old, p)
        with pytest.raises(ValueError, match="append-only"):
            append_changes(p, root)

    def test_file_at_reconstruction(self, temporal_idx):
        root, _, chg = temporal_idx
        s = TemporalSearcher(root)
        rows = sorted(chg.to_pylist(), key=lambda r: r["change_id"])
        by_path: dict[str, list[dict]] = {}
        for r in rows:
            by_path.setdefault(r["path"], []).append(r)
        # a path with 3 versions: text follows the latest change ≤ the cut
        p3 = next(p for p, rs in by_path.items() if len(rs) == 3 and rs[-1]["diff_type"] != "deleted")
        rs = by_path[p3]
        for cut_r in rs:
            got = s.file_at(p3, cut_r["commit_day"])
            assert got is not None and got["change_id"] == cut_r["change_id"]
            assert got["text"] == cut_r["text"]
        # before the first change → None
        assert s.file_at(p3, "2025-02-28") is None
        # a deleted path: None after the deletion, content before it
        pd_ = next(p for p, rs in by_path.items() if rs[-1]["diff_type"] == "deleted")
        rs = by_path[pd_]
        assert s.file_at(pd_, rs[-1]["commit_day"]) is None
        assert s.file_at(pd_, rs[-2]["commit_day"])["change_id"] == rs[-2]["change_id"]
        # unknown path
        assert s.file_at("nope/never.txt", "2025-03-12") is None


class TestWindowConcurrency:
    def test_concurrent_build_identical(self, ray_session, tmp_path, temporal_idx):
        """window_concurrency overlaps per-window pipelines; output must be
        deterministic — identical manifests and identical index segment
        bytes vs the serial build."""
        import hashlib
        import os

        serial_root, serial_man, chg = temporal_idx
        chg_path = str(tmp_path / "chg.parquet")
        pq.write_table(chg, chg_path)
        root = str(tmp_path / "tidx_conc")
        man = build_temporal_index(
            chg_path, root, bucket_days=4, num_shards=2, num_buckets=1,
            window_concurrency=3,
        )
        assert [
            {k: b[k] for k in ("bucket", "min_day", "max_day", "num_changes", "dir")}
            for b in man["buckets"]
        ] == [
            {k: b[k] for k in ("bucket", "min_day", "max_day", "num_changes", "dir")}
            for b in serial_man["buckets"]
        ]

        def seg_hashes(r):
            out = {}
            for dp, _dn, fn in sorted(os.walk(r)):
                for f in sorted(fn):
                    if f.endswith(".bin") or (
                        f.endswith(".parquet") and "changes" not in dp
                    ):
                        p = os.path.join(dp, f)
                        out[os.path.relpath(p, r)] = hashlib.md5(
                            open(p, "rb").read()
                        ).hexdigest()
            return out

        assert seg_hashes(root) == seg_hashes(serial_root)

        s1 = TemporalSearcher(serial_root)
        s2 = TemporalSearcher(root)
        a = s1.query("t000007", start_day="2025-03-01", end_day="2025-03-12", limit=10)
        b = s2.query("t000007", start_day="2025-03-01", end_day="2025-03-12", limit=10)
        assert [(h["change_id"], round(h["score"], 9)) for h in a] == [
            (h["change_id"], round(h["score"], 9)) for h in b
        ]


class TestPathStore:
    """Path-routed history store: point-read file_at / history / evolution
    equal the filtered-scan fallback on every probe."""

    @pytest.fixture(scope="class")
    def store_root(self, temporal_idx):
        from code_indexer_ray.temporal.pathstore import build_path_store

        root, _m, chg = temporal_idx
        man = build_path_store(root, num_parts=4)
        return root, man, chg

    def test_manifest_counts(self, store_root):
        root, man, chg = store_root
        assert man["total_rows"] == len(chg)
        assert man["num_parts"] == 4
        # idempotent: a second build with matching params is a no-op
        from code_indexer_ray.temporal.pathstore import build_path_store

        assert build_path_store(root, num_parts=4) == man

    def test_routing_and_sort(self, store_root):
        import pyarrow.parquet as pqq

        from code_indexer_ray.scip.store import fnv64

        root, man, _ = store_root
        import os as _os

        for ent in man["parts"]:
            t = pqq.read_table(
                _os.path.join(root, "pathstore", f"part-{ent['part']:05d}.parquet")
            )
            paths = t["path"].to_pylist()
            ts = t["commit_ts"].to_pylist()
            ids = t["change_id"].to_pylist()
            assert all(fnv64(p) % 4 == ent["part"] for p in set(paths))
            assert sorted(zip(paths, ts, ids)) == list(zip(paths, ts, ids))

    def test_file_at_point_read_equals_scan(self, store_root):
        root, _, chg = store_root
        s_store = TemporalSearcher(root)
        assert s_store._paths is not None
        s_scan = TemporalSearcher(root)
        s_scan._paths = None  # force the filtered-scan fallback
        rows = chg.to_pylist()
        probe_paths = sorted({r["path"] for r in rows})[:12] + ["nope/never.txt"]
        for p in probe_paths:
            for day in ("2025-02-28", "2025-03-02", "2025-03-07", "2025-03-12"):
                a = s_store.file_at(p, day)
                b = s_scan.file_at(p, day)
                assert a == b, (p, day)
                ar = s_store.file_at(p, day, include_removed=True)
                br = s_scan.file_at(p, day, include_removed=True)
                assert ar == br, (p, day)

    def test_include_removed_surfaces_deletion(self, store_root):
        root, _, chg = store_root
        s = TemporalSearcher(root)
        by_path: dict[str, list[dict]] = {}
        for r in sorted(chg.to_pylist(), key=lambda r: r["change_id"]):
            by_path.setdefault(r["path"], []).append(r)
        pd_ = next(p for p, rs in by_path.items() if rs[-1]["diff_type"] == "deleted")
        last = by_path[pd_][-1]
        assert s.file_at(pd_, last["commit_day"]) is None
        got = s.file_at(pd_, last["commit_day"], include_removed=True)
        assert got is not None
        assert got["diff_type"] == "deleted"
        assert got["change_id"] == last["change_id"]
        assert got["text"] == ""

    def test_file_at_commit(self, store_root):
        root, _, chg = store_root
        s = TemporalSearcher(root)
        rows = sorted(chg.to_pylist(), key=lambda r: r["change_id"])
        by_path: dict[str, list[dict]] = {}
        for r in rows:
            by_path.setdefault(r["path"], []).append(r)
        p3, rs = next((p, rs) for p, rs in by_path.items() if len(rs) == 3)
        # as of each of the path's own commits → that version's content
        for r in rs:
            got = s.file_at_commit(p3, r["change_id"])
            if r["diff_type"] == "deleted":
                assert got is None
            else:
                assert got["change_id"] == r["change_id"]
                assert got["text"] == r["text"]
        # as of ANOTHER path's commit: the cut is that commit's timestamp
        other = next(r for r in rows if r["path"] != p3)
        want = [
            r
            for r in rs
            if (r["commit_ts"], r["change_id"])
            <= (other["commit_ts"], other["change_id"])
        ]
        got = s.file_at_commit(p3, other["change_id"])
        if not want:
            assert got is None
        else:
            assert got is not None and got["change_id"] == want[-1]["change_id"]
        import pytest as _pytest

        with _pytest.raises(KeyError):
            s.file_at_commit(p3, 10**9)

    def test_history_chronological(self, store_root):
        root, _, chg = store_root
        s = TemporalSearcher(root)
        s_scan = TemporalSearcher(root)
        s_scan._paths = None
        rows = sorted(chg.to_pylist(), key=lambda r: r["change_id"])
        by_path: dict[str, list[dict]] = {}
        for r in rows:
            by_path.setdefault(r["path"], []).append(r)
        for p, rs in list(by_path.items())[:10]:
            h = s.history(p)
            assert [x["change_id"] for x in h] == [r["change_id"] for r in rs]
            assert [x["commit_ts"] for x in h] == [r["commit_ts"] for r in rs]
            hs = s_scan.history(p)
            assert [x["change_id"] for x in hs] == [r["change_id"] for r in rs]

    def test_query_show_evolution(self, store_root):
        root, _, chg = store_root
        s = TemporalSearcher(root)
        hits = s.query(
            "spark",
            start_day="2025-03-01",
            end_day="2025-03-12",
            limit=5,
            show_evolution=True,
            evolution_limit=2,
        )
        assert hits
        by_path: dict[str, list[dict]] = {}
        for r in sorted(chg.to_pylist(), key=lambda r: r["change_id"]):
            by_path.setdefault(r["path"], []).append(r)
        for h in hits:
            evo = h["evolution"]
            want = by_path[h["path"]][:2]
            assert [e["change_id"] for e in evo] == [r["change_id"] for r in want]
            assert all(
                set(e) == {"commit_ts", "change_id", "diff_type", "commit_day", "author"}
                for e in evo
            )
        # without the flag the key is absent
        plain = s.query("spark", start_day="2025-03-01", end_day="2025-03-12", limit=5)
        assert all("evolution" not in h for h in plain)


class TestChunkType:
    """Message-indexed roots (index_messages=True): doc-id parity is the
    chunk type; reference over-fetch multipliers; diff-root guards."""

    @pytest.fixture(scope="class")
    def msg_root(self, ray_session, temporal_idx, tmp_path_factory):
        root, _m, chg = temporal_idx
        tmp = tmp_path_factory.mktemp("tmsg")
        chg_path = str(tmp / "changes.parquet")
        pq.write_table(chg, chg_path)
        mroot = str(tmp / "tidx_msg")
        man = build_temporal_index(
            chg_path, mroot, bucket_days=4, num_shards=2, num_buckets=1,
            index_messages=True,
        )
        return mroot, man, chg

    def test_corpus_doubles(self, msg_root):
        _root, man, chg = msg_root
        assert man["index_messages"] is True
        assert sum(b["num_changes"] for b in man["buckets"]) == 2 * len(chg)

    def test_chunk_type_filter_and_mapping(self, msg_root):
        mroot, _man, chg = msg_root
        s = TemporalSearcher(mroot)
        # messages all contain their diff_type word; 'added' only matches
        # message docs (change texts never contain it in this vocab)
        hits = s.query(
            "added", start_day="2025-03-01", end_day="2025-03-12",
            chunk_type="commit_message", limit=8,
        )
        assert hits and all(h["chunk_type"] == "commit_message" for h in hits)
        valid_ids = set(chg["change_id"].to_pylist())
        assert all(h["change_id"] in valid_ids for h in hits)
        # diff-chunk search never returns message docs
        dhits = s.query(
            "spark", start_day="2025-03-01", end_day="2025-03-12",
            chunk_type="commit_diff", limit=8,
        )
        assert dhits and all(h["chunk_type"] == "commit_diff" for h in dhits)

    def test_no_filter_returns_both(self, msg_root):
        mroot, _man, _chg = msg_root
        s = TemporalSearcher(mroot)
        # path tokens appear in message docs; 'src0' hits messages
        hits = s.query(
            "src0", start_day="2025-03-01", end_day="2025-03-12", limit=0,
        )
        kinds = {h["chunk_type"] for h in hits}
        assert "commit_message" in kinds

    def test_validation(self, msg_root, temporal_idx):
        mroot, _man, _ = msg_root
        droot, _m2, _ = temporal_idx
        s = TemporalSearcher(mroot)
        with pytest.raises(ValueError, match="chunk_type"):
            s.query("spark", start_day="2025-03-01", end_day="2025-03-12",
                    chunk_type="bogus")
        d = TemporalSearcher(droot)
        with pytest.raises(ValueError, match="message-indexed"):
            d.query("spark", start_day="2025-03-01", end_day="2025-03-12",
                    chunk_type="commit_message")
        for op in ("file_at",):
            with pytest.raises(ValueError, match="not supported"):
                s.file_at("src0/0.txt", "2025-03-12")
        with pytest.raises(ValueError, match="not supported"):
            s.history("src0/0.txt")

    def test_matches_brute_force(self, msg_root):
        """Parity post-filter over the ×40 cut ≡ brute-force BM25 over the
        doubled corpus."""
        import math

        from tests.oracle import BruteForceIndex

        mroot, _man, chg = msg_root
        rows = chg.to_pylist()
        docs = {r["change_id"] * 2: r["text"] for r in rows}
        docs.update(
            {r["change_id"] * 2 + 1: f"{r['diff_type']} {r['path']}" for r in rows}
        )
        idx = BruteForceIndex(docs)
        hits = idx.search_groups([["modified"]], limit=10**9)
        hits = sorted(hits, key=lambda x: (-round(x[1], 9), x[0]))
        cut = [x for x in hits[: 5 * 40] if x[0] % 2 == 1][:5]
        got = TemporalSearcher(mroot).query(
            "modified", start_day="2025-03-01", end_day="2025-03-12",
            chunk_type="commit_message", limit=5,
        )
        assert [(h["change_id"] * 2 + 1) for h in got] == [i for i, _ in cut]
        for h, (_, sc) in zip(got, cut):
            assert math.isclose(h["score"], sc, rel_tol=1e-9)


class TestReviewFixes:
    def test_append_invalidates_and_rebuilds_pathstore(self, ray_session, tmp_path):
        """An append must never leave a stale point-read sidecar (review
        fix): the store is rebuilt over the grown history and file_at
        reflects the appended window."""
        import os

        from code_indexer_ray.temporal.index import append_changes
        from code_indexer_ray.temporal.pathstore import build_path_store

        docs = _docs_table(40)
        chg = change_rows(docs)
        days = chg["day_idx"].to_numpy()
        old = chg.filter(pa.array(days <= 5))
        new = chg.filter(pa.array(days > 5))
        p_old = str(tmp_path / "old.parquet")
        p_new = str(tmp_path / "new.parquet")
        pq.write_table(old, p_old)
        pq.write_table(new, p_new)
        root = str(tmp_path / "tidx")
        build_temporal_index(p_old, root, bucket_days=4, num_shards=1, num_buckets=1)
        man = build_path_store(root, num_parts=2)
        assert man["total_rows"] == len(old)
        append_changes(p_new, root)
        s = TemporalSearcher(root)
        assert s._paths is not None
        assert s._paths.manifest["total_rows"] == len(chg)
        assert s._paths.manifest["num_parts"] == 2  # parameters preserved
        # a path whose latest change arrived in the APPEND is served fresh
        rows = sorted(chg.to_pylist(), key=lambda r: r["change_id"])
        by_path: dict[str, list[dict]] = {}
        for r in rows:
            by_path.setdefault(r["path"], []).append(r)
        p3, rs = next(
            (p, rs) for p, rs in by_path.items()
            if rs[-1]["day_idx"] > 5 and rs[-1]["diff_type"] != "deleted"
        )
        got = s.file_at(p3, "2025-03-12")
        assert got is not None and got["change_id"] == rs[-1]["change_id"]

    def test_chunk_diff_limit1_has_headroom(self, ray_session, tmp_path):
        """int(1·1.5)=1 gave zero over-fetch at limit=1 (review fix): a
        diff-chunk query whose top-ranked candidate is a message doc must
        still return the diff hit one rank deeper."""
        # exactly ONE message doc carries the term ('deleted' appears only
        # in doc 5's deletion message) and it outranks every diff doc
        # (shortest doc, tf 1) — the review's failure shape at limit=1
        docs = pa.table(
            {
                "doc_id": pa.array(range(12), type=pa.int64()),
                "source": pa.array(["src"] * 12),
                "text": pa.array(["deleted zulu " + "pad " * (5 + i) for i in range(12)]),
                "lang": pa.array(["en"] * 12),
            }
        )
        chg_path = str(tmp_path / "chg.parquet")
        pq.write_table(change_rows(docs), chg_path)
        root = str(tmp_path / "tmsg")
        build_temporal_index(
            chg_path, root, bucket_days=4, num_shards=1, num_buckets=1,
            index_messages=True,
        )
        s = TemporalSearcher(root)
        # sanity: the unfiltered top-1 really is the message doc
        top = s.query("deleted", start_day="2025-03-01", end_day="2025-03-12", limit=1)
        assert top and top[0]["chunk_type"] == "commit_message"
        got = s.query(
            "deleted", start_day="2025-03-01", end_day="2025-03-12",
            chunk_type="commit_diff", limit=1,
        )
        assert got and got[0]["chunk_type"] == "commit_diff"

    def test_show_evolution_fails_fast_on_msg_root(self, ray_session, tmp_path):
        docs = _docs_table(20)
        chg_path = str(tmp_path / "chg.parquet")
        pq.write_table(change_rows(docs), chg_path)
        root = str(tmp_path / "tmsg2")
        build_temporal_index(
            chg_path, root, bucket_days=4, num_shards=1, num_buckets=1,
            index_messages=True,
        )
        s = TemporalSearcher(root)
        with pytest.raises(ValueError, match="show_evolution"):
            s.query(
                "spark", start_day="2025-03-01", end_day="2025-03-12",
                show_evolution=True,
            )


class TestTemporalWatch:
    """Temporal watch loop (reference cli_temporal_watch_handler.py):
    bootstrap, incremental ticks, append-only feed contract, and the
    in-flight crash-recovery protocol on both sides of the append."""

    def _feed(self, tmp_path, chg, cuts):
        """Split chg into feed files by day ranges [(lo, hi), ...]."""
        import os

        feed = str(tmp_path / "feed")
        os.makedirs(feed, exist_ok=True)
        days = chg["day_idx"].to_numpy()
        names = []
        for i, (lo, hi) in enumerate(cuts):
            part = chg.filter(pa.array((days >= lo) & (days <= hi)))
            name = f"batch-{i:03d}.parquet"
            pq.write_table(part, str(tmp_path / "feed" / name))
            names.append(name)
        return feed, names

    def test_lifecycle_and_parity(self, ray_session, tmp_path):
        import os

        from code_indexer_ray.temporal.watch import TemporalWatchDriver

        docs = _docs_table(50)
        chg = change_rows(docs)
        feed, _ = self._feed(tmp_path, chg, [(0, 3), (4, 5)])
        root = str(tmp_path / "tidx")
        drv = TemporalWatchDriver.initialize(
            feed, root, bucket_days=4, num_shards=1, num_buckets=1
        )
        assert drv.tick() == {"appended": [], "recovered": None}  # no-op

        # new feed batches arrive → appended oldest-first in one tick
        days = chg["day_idx"].to_numpy()
        pq.write_table(
            chg.filter(pa.array((days >= 6) & (days <= 8))),
            os.path.join(feed, "batch-002.parquet"),
        )
        pq.write_table(
            chg.filter(pa.array(days >= 9)), os.path.join(feed, "batch-003.parquet")
        )
        got = drv.tick()
        assert got["appended"] == ["batch-002.parquet", "batch-003.parquet"]

        # searcher over the watched root ≡ a from-scratch build over ALL rows
        scratch = str(tmp_path / "scratch")
        allp = str(tmp_path / "all.parquet")
        pq.write_table(chg, allp)
        build_temporal_index(allp, scratch, bucket_days=4, num_shards=1, num_buckets=1)
        a = TemporalSearcher(root).query(
            "spark", start_day="2025-03-01", end_day="2025-03-12", limit=0
        )
        b = TemporalSearcher(scratch).query(
            "spark", start_day="2025-03-01", end_day="2025-03-12", limit=0
        )
        assert [(h["change_id"], round(h["score"], 9)) for h in a] == [
            (h["change_id"], round(h["score"], 9)) for h in b
        ]
        # restart: fresh driver instance resumes from persisted state
        drv2 = TemporalWatchDriver(feed, root)
        assert drv2.tick() == {"appended": [], "recovered": None}

    def test_mutated_feed_file_raises(self, ray_session, tmp_path):
        import os

        from code_indexer_ray.temporal.watch import TemporalWatchDriver

        docs = _docs_table(20)
        chg = change_rows(docs)
        feed, names = self._feed(tmp_path, chg, [(0, 5)])
        root = str(tmp_path / "tidx")
        drv = TemporalWatchDriver.initialize(
            feed, root, bucket_days=4, num_shards=1, num_buckets=1
        )
        # rewrite an already-applied batch (append-only violation)
        pq.write_table(chg.slice(0, 5), os.path.join(feed, names[0]))
        with pytest.raises(ValueError, match="append-only"):
            drv.tick()

    def test_recover_both_sides(self, ray_session, tmp_path):
        import json
        import os

        from code_indexer_ray.temporal.pathstore import _count_changes
        from code_indexer_ray.temporal.watch import TemporalWatchDriver, _fingerprint

        docs = _docs_table(40)
        chg = change_rows(docs)
        days = chg["day_idx"].to_numpy()
        feed, _ = self._feed(tmp_path, chg, [(0, 5)])
        root = str(tmp_path / "tidx")
        drv = TemporalWatchDriver.initialize(
            feed, root, bucket_days=4, num_shards=1, num_buckets=1
        )

        # --- crash BEFORE the append landed: in-flight marker persisted,
        # rows unchanged → recover re-appends
        new1 = chg.filter(pa.array((days >= 6) & (days <= 8)))
        p1 = os.path.join(feed, "batch-001.parquet")
        pq.write_table(new1, p1)
        pre = _count_changes(os.path.join(root, "changes"))
        drv._state["in_flight"] = {
            "name": "batch-001.parquet", "fp": _fingerprint(p1),
            "rows": len(new1), "pre_rows": pre,
        }
        drv._save_state()
        drv2 = TemporalWatchDriver(feed, root)  # "restart"
        got = drv2.tick()
        assert got["recovered"] == "reappended"
        assert _count_changes(os.path.join(root, "changes")) == pre + len(new1)

        # --- crash AFTER rows landed but with a stale manifest: recover
        # repairs exactly the disagreeing windows
        with open(os.path.join(root, "temporal.json")) as f:
            stale_manifest = f.read()
        new2 = chg.filter(pa.array(days >= 9))
        p2 = os.path.join(feed, "batch-002.parquet")
        pq.write_table(new2, p2)
        pre2 = _count_changes(os.path.join(root, "changes"))
        from code_indexer_ray.temporal.index import append_changes

        append_changes(p2, root)
        # roll the manifest back to the pre-append generation (simulated
        # crash between the row write and the window swaps)
        with open(os.path.join(root, "temporal.json"), "w") as f:
            f.write(stale_manifest)
        drv3 = TemporalWatchDriver(feed, root)
        drv3._state["in_flight"] = {
            "name": "batch-002.parquet", "fp": _fingerprint(p2),
            "rows": len(new2), "pre_rows": pre2,
        }
        drv3._save_state()
        got = TemporalWatchDriver(feed, root).tick()
        assert got["recovered"] == "repaired"
        # repaired root ≡ scratch build over everything
        scratch = str(tmp_path / "scratch")
        allp = str(tmp_path / "all.parquet")
        pq.write_table(chg, allp)
        build_temporal_index(allp, scratch, bucket_days=4, num_shards=1, num_buckets=1)
        a = TemporalSearcher(root).query(
            "spark", start_day="2025-03-01", end_day="2025-03-12", limit=0
        )
        b = TemporalSearcher(scratch).query(
            "spark", start_day="2025-03-01", end_day="2025-03-12", limit=0
        )
        assert [(h["change_id"], round(h["score"], 9)) for h in a] == [
            (h["change_id"], round(h["score"], 9)) for h in b
        ]

        # --- partial row write: neither pre nor post count → loud failure
        drv4 = TemporalWatchDriver(feed, root)
        drv4._state["in_flight"] = {
            "name": "batch-002.parquet", "fp": _fingerprint(p2),
            "rows": len(new2) + 7, "pre_rows": pre2,
        }
        drv4._save_state()
        with pytest.raises(RuntimeError, match="partial append"):
            TemporalWatchDriver(feed, root).tick()


class TestModelChecks:
    def test_file_at_matches_python_model(self, temporal_idx):
        """Independent model: file_at(path, day) ≡ max-(commit_ts, id) fold
        over the raw change rows — checked for every synthesized path × a
        day grid, both include_removed modes, against the STORE path."""
        from code_indexer_ray.temporal.pathstore import build_path_store

        root, _m, chg = temporal_idx
        build_path_store(root, num_parts=4)  # idempotent with earlier tests
        s = TemporalSearcher(root)
        assert s._paths is not None
        rows = sorted(chg.to_pylist(), key=lambda r: (r["commit_ts"], r["change_id"]))
        by_path: dict[str, list[dict]] = {}
        for r in rows:
            by_path.setdefault(r["path"], []).append(r)
        days = ["2025-02-28", "2025-03-01", "2025-03-04", "2025-03-08", "2025-03-12"]
        for p, hist in list(by_path.items())[:25]:
            for day in days:
                want = [r for r in hist if r["commit_day"] <= day]
                model = want[-1] if want else None
                for inc in (False, True):
                    got = s.file_at(p, day, include_removed=inc)
                    if model is None or (model["diff_type"] == "deleted" and not inc):
                        assert got is None, (p, day, inc)
                    else:
                        assert got is not None, (p, day, inc)
                        assert got["change_id"] == model["change_id"]
                        assert got["text"] == model["text"]
                        assert got["diff_type"] == model["diff_type"]

    def test_warm_opens_covering_windows(self, temporal_idx):
        root, m, _ = temporal_idx
        s = TemporalSearcher(root)
        n = s.warm("2025-03-01", "2025-03-04")
        assert n == 1 and set(s._searchers) == {0}
        n_all = s.warm()
        assert n_all == len(m["buckets"])
        got = s.query("spark", start_day="2025-03-01", end_day="2025-03-12", limit=5)
        assert got  # warm changes latency, never results
