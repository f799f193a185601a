"""Sync tier: data-plane change classification, the reindexing decision
engine (reference server/sync/reindexing_engine.py rule parity), and the
sync orchestrator (full-rebuild vs apply_delta execution)."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.pipelines.sync import (
    ChangeSummary,
    IndexMetrics,
    ReindexingDecisionEngine,
    SyncConfig,
    change_summary,
    classify_changes,
    detect_moves,
    sync_repository,
    _ids_to_ranges,
)


def _corpus_table(rows: list[tuple[int, str, str]]) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "url": pa.array([r[1] for r in rows]),
            "text": pa.array([r[2] for r in rows]),
            "lang": pa.array(["en"] * len(rows)),
        }
    )


OLD_ROWS = [
    (0, "http://a/dir1/p0", "alpha text zero"),
    (1, "http://a/dir1/p1", "alpha text one"),
    (2, "http://a/dir2/p2", "beta text two"),
    (3, "http://a/dir2/p3", "beta text three"),
    (4, "http://a/gone/p4", "gamma text four"),
]
NEW_ROWS = [
    (0, "http://a/dir1/p0", "alpha text zero"),          # unchanged
    (1, "http://a/dir1/p1", "alpha text one UPDATED"),   # modified
    (2, "http://a/dir2/p2", "beta text two"),            # unchanged
    (9, "http://a/dir3/p9", "delta text nine"),          # added (new dir)
    (5, "http://a/moved/p4", "gamma text four"),         # move of p4
]
# p3 and p4 deleted (p4's content reappears at moved/p4)


@pytest.fixture()
def snapshots(ray_session):
    import ray.data as rd

    return (
        rd.from_arrow(_corpus_table(OLD_ROWS)),
        rd.from_arrow(_corpus_table(NEW_ROWS)),
    )


def _changes_df(old, new, **kw) -> pd.DataFrame:
    ds = classify_changes(old, new, **kw)
    df = ds.to_pandas().sort_values("url").reset_index(drop=True)
    return df


class TestClassify:
    def test_classification_matches_brute(self, snapshots):
        old, new = snapshots
        df = _changes_df(old, new)
        got = dict(zip(df.url, df.change))
        assert got == {
            "http://a/dir1/p0": "unchanged",
            "http://a/dir1/p1": "modified",
            "http://a/dir2/p2": "unchanged",
            "http://a/dir2/p3": "deleted",
            "http://a/gone/p4": "deleted",
            "http://a/dir3/p9": "added",
            "http://a/moved/p4": "added",
        }
        # base doc_id is authoritative where the url exists in the base
        ids = dict(zip(df.url, df.doc_id))
        assert ids["http://a/dir1/p1"] == 1 and ids["http://a/gone/p4"] == 4
        assert ids["http://a/moved/p4"] == 5  # new-only url keeps the new id
        # content hash matches md5 of the winning side's text
        h = dict(zip(df.url, df.content_hash))
        assert h["http://a/dir1/p1"] == hashlib.md5(b"alpha text one UPDATED").hexdigest()
        assert h["http://a/dir2/p3"] == hashlib.md5(b"beta text three").hexdigest()

    def test_carry_cols_ride_new_side(self, snapshots):
        old, new = snapshots
        df = _changes_df(old, new, carry_cols=("text", "lang"))
        row = df[df.url == "http://a/dir1/p1"].iloc[0]
        assert row.text == "alpha text one UPDATED" and row.lang == "en"
        # deleted rows have no new side → carry is null
        assert pd.isna(df[df.url == "http://a/gone/p4"].iloc[0].text)

    def test_moves(self, snapshots):
        old, new = snapshots
        changes = classify_changes(old, new)
        n, samples = detect_moves(changes)
        assert n == 1
        assert samples == [("http://a/gone/p4", "http://a/moved/p4")]


class TestSummary:
    def test_counts_and_dirs(self, snapshots):
        old, new = snapshots
        changes = classify_changes(old, new)
        s = change_summary(changes, total_files=5)
        assert (s.n_added, s.n_deleted, s.n_modified) == (2, 2, 1)
        assert s.change_count == 5
        # denominator is the url-union of both snapshots (7: the 5 changes
        # plus the unchanged urls), not the caller's possibly-stale base count
        assert s.total_files == 7
        assert s.percentage_changed == pytest.approx(5 / 7)
        # dirs: dir3 + moved appear only in new; gone only in old; dir2
        # survives (p2 unchanged)
        assert s.n_dirs_added == 2
        assert s.n_dirs_removed == 1
        assert s.n_moves == 1

    def test_config_and_structural_detection(self, ray_session):
        import ray.data as rd

        old = rd.from_arrow(_corpus_table([(0, "http://a/x/keep", "k")]))
        new = rd.from_arrow(
            _corpus_table(
                [
                    (0, "http://a/x/keep", "k"),
                    (1, "http://a/x/package.json", "{}"),
                    (2, "http://a/y/__init__.py", ""),
                    (3, "http://a/z/Makefile", "all:"),
                ]
            )
        )
        s = change_summary(classify_changes(old, new), total_files=1)
        assert s.config_files_changed == [
            "http://a/x/package.json",
            "http://a/z/Makefile",
        ]
        # package.json is both a config file and a structural indicator
        assert s.structural_files_changed == [
            "http://a/x/package.json",
            "http://a/y/__init__.py",
        ]


class TestConfig:
    def test_validation(self):
        with pytest.raises(ValueError, match="Change percentage threshold"):
            SyncConfig(change_percentage_threshold=1.5)
        with pytest.raises(ValueError, match="Accuracy threshold"):
            SyncConfig(accuracy_threshold=-0.1)
        with pytest.raises(ValueError, match="Max index age"):
            SyncConfig(max_index_age_days=-1)

    def test_time_estimate_formula(self):
        c = SyncConfig()
        # max(1000*0.1, 100*2.0)=200 → *0.6=120 → /60*1.2=2.4 → int → 2
        assert c.estimate_reindex_time_minutes(1000) == 2
        assert SyncConfig(parallel_analysis=False).estimate_reindex_time_minutes(10) >= 1


class TestDecisionEngine:
    def _summary(self, **kw) -> ChangeSummary:
        base = dict(total_files=100)
        base.update(kw)
        return ChangeSummary(**base)

    def test_no_trigger_incremental(self):
        d = ReindexingDecisionEngine().should_full_reindex(
            self._summary(n_modified=5), IndexMetrics()
        )
        assert not d.should_reindex
        assert d.recommended_strategy == "incremental"
        assert d.estimated_time_minutes == 0

    def test_user_request(self):
        d = ReindexingDecisionEngine().should_full_reindex(
            self._summary(), IndexMetrics(), force_full_reindex=True
        )
        assert d.should_reindex and d.primary_trigger == "user_requested"
        assert d.confidence_score == 1.0

    def test_corruption(self):
        d = ReindexingDecisionEngine().should_full_reindex(
            self._summary(), IndexMetrics(corruption_detected=True)
        )
        assert d.should_reindex and "corruption_detected" in d.trigger_reasons
        assert d.recommended_strategy == "in_place"
        d2 = ReindexingDecisionEngine(
            SyncConfig(enable_corruption_detection=False)
        ).should_full_reindex(self._summary(), IndexMetrics(corruption_detected=True))
        assert not d2.should_reindex

    def test_config_changes(self):
        d = ReindexingDecisionEngine().should_full_reindex(
            self._summary(config_files_changed=["a/package.json"]), IndexMetrics()
        )
        assert d.should_reindex and d.confidence_score == 0.95

    def test_change_percentage_trigger(self):
        # 40% changed > 30% threshold; the reference's confidence default is
        # 1.0 and the rule takes max(1.0, 0.8 + ...) — single-trigger
        # confidence stays 1.0 (reindexing_engine.py:195-201 semantics)
        d = ReindexingDecisionEngine().should_full_reindex(
            self._summary(n_modified=40), IndexMetrics()
        )
        assert d.should_reindex and d.trigger_reasons == ["change_percentage"]
        assert d.confidence_score == 1.0

    def test_change_percentage_confidence_math_after_config(self):
        # an earlier config trigger pins confidence to 0.95; the change-pct
        # rule's max() then keeps 0.95 (its candidate 0.828 is lower) —
        # observable evidence the rule uses max, not assignment
        d = ReindexingDecisionEngine().should_full_reindex(
            self._summary(n_modified=40, config_files_changed=["p/Makefile"]),
            IndexMetrics(),
        )
        assert set(d.trigger_reasons) == {"config_changes", "change_percentage"}
        assert d.confidence_score == 0.95

    def test_structural_rules(self):
        eng = ReindexingDecisionEngine()
        for kw in (
            {"n_dirs_added": 5},
            {"n_moves": 10},
            {"structural_files_changed": ["x/__init__.py"]},
            {"has_structural_changes": True},
        ):
            d = eng.should_full_reindex(self._summary(**kw), IndexMetrics())
            assert d.should_reindex and d.trigger_reasons == ["structural_changes"], kw
        # below thresholds: no trigger
        d = eng.should_full_reindex(
            self._summary(n_dirs_added=4, n_moves=9), IndexMetrics()
        )
        assert not d.should_reindex
        d = eng.should_full_reindex(
            ChangeSummary(total_files=100, has_structural_changes=True),
            IndexMetrics(),
        )
        assert d.should_reindex
        d2 = ReindexingDecisionEngine(
            SyncConfig(enable_structural_change_detection=False)
        ).should_full_reindex(
            ChangeSummary(total_files=100, has_structural_changes=True),
            IndexMetrics(),
        )
        assert not d2.should_reindex

    def test_accuracy_and_age(self):
        eng = ReindexingDecisionEngine()
        d = eng.should_full_reindex(self._summary(), IndexMetrics(search_accuracy=0.6))
        assert d.trigger_reasons == ["search_accuracy"] and d.should_reindex
        d = eng.should_full_reindex(self._summary(), IndexMetrics(index_age_days=45))
        assert d.trigger_reasons == ["index_age"] and d.should_reindex
        d2 = ReindexingDecisionEngine(
            SyncConfig(enable_periodic_reindex=False)
        ).should_full_reindex(self._summary(), IndexMetrics(index_age_days=45))
        assert not d2.should_reindex

    def test_blue_green_for_large_changes(self):
        d = ReindexingDecisionEngine().should_full_reindex(
            ChangeSummary(total_files=2000, n_modified=1500), IndexMetrics()
        )
        assert d.should_reindex and d.recommended_strategy == "blue_green"

    def test_multi_trigger_confidence(self):
        # corruption + change_percentage both leave confidence at 1.0; the
        # finalize rule folds multi-trigger 1.0 to min(1.0, 0.7 + n*0.1)
        d = ReindexingDecisionEngine().should_full_reindex(
            self._summary(n_modified=40),
            IndexMetrics(corruption_detected=True),
        )
        assert d.trigger_reasons == ["corruption_detected", "change_percentage"]
        assert d.confidence_score == pytest.approx(0.7 + 2 * 0.1)
        # ...but a config trigger's 0.95 assignment escapes the ==1.0 gate
        # (reference _analyze_config_changes assigns, not max)
        d2 = ReindexingDecisionEngine().should_full_reindex(
            self._summary(config_files_changed=["p/Makefile"]),
            IndexMetrics(corruption_detected=True),
            force_full_reindex=True,
        )
        assert len(d2.trigger_reasons) == 3 and d2.confidence_score == 0.95


def test_ids_to_ranges():
    assert _ids_to_ranges(np.array([], np.int64)) == []
    assert _ids_to_ranges(np.array([5], np.int64)) == [(5, 5)]
    assert _ids_to_ranges(np.array([1, 2, 3, 7, 9, 10], np.int64)) == [
        (1, 3),
        (7, 7),
        (9, 10),
    ]


def test_merge_ranges():
    from code_indexer_ray.pipelines.sync import _merge_ranges

    assert _merge_ranges([]) == []
    # adjacent runs from neighbouring sort blocks collapse
    assert _merge_ranges([(1, 3), (4, 6), (9, 9)]) == [(1, 6), (9, 9)]
    # overlap tolerated
    assert _merge_ranges([(1, 5), (3, 7), (20, 22)]) == [(1, 7), (20, 22)]


def test_moves_count_duplicated_boilerplate(ray_session):
    """A mass rename of N identical-content files counts as N moves (the
    reference's file_moves list is per-file), while the emitted pair ROWS
    stay one-per-hash."""
    import ray.data as rd

    old = [(i, f"http://a/old/p{i}", "same boilerplate") for i in range(12)]
    new = [(100 + i, f"http://a/new/p{i}", "same boilerplate") for i in range(12)]
    changes = classify_changes(
        rd.from_arrow(_corpus_table(old)), rd.from_arrow(_corpus_table(new))
    )
    n, samples = detect_moves(changes)
    assert n == 12
    assert samples == [("http://a/old/p0", "http://a/new/p0")]


def _write_corpus(path: str, rows) -> None:
    pq.write_table(_corpus_table(rows), path)


@pytest.fixture()
def base_index(ray_session, tmp_path):
    from code_indexer_ray.index.build import build_index

    src = str(tmp_path / "old.parquet")
    rows = [
        (i, f"http://s/d{i % 4}/p{i}", f"doc p{i:03d} common token{i % 7} body")
        for i in range(60)
    ]
    _write_corpus(src, rows)
    idx = str(tmp_path / "base_idx")
    build_index(
        src,
        idx,
        store_cols=("lang", "url"),
        num_shards=2,
        num_buckets=4,
        doc_id_upper=999,
    )
    return idx, rows


class TestOrchestrator:
    def test_incremental_matches_full_rebuild(self, ray_session, tmp_path, base_index):
        from code_indexer_ray.index.build import build_index
        from code_indexer_ray.query.engine import IndexSearcher

        idx, rows = base_index
        # mutate: modify 3, add 2, delete 2 (7/60 ≈ 12% < 30% threshold)
        new_rows = [r for r in rows if r[0] not in (10, 21)]
        new_rows = [
            (i, u, t + " CHANGED") if i in (3, 4, 5) else (i, u, t)
            for i, u, t in new_rows
        ]
        new_rows += [
            (100, "http://s/d9/p100", "doc p100 fresh common page"),
            (101, "http://s/d9/p101", "doc p101 fresh common page"),
        ]
        new_src = str(tmp_path / "new.parquet")
        _write_corpus(new_src, new_rows)

        out = str(tmp_path / "synced")
        report = sync_repository(idx, new_src, out)
        assert report["executed"] == "incremental"
        assert report["decision"]["should_reindex"] is False
        assert report["changes"] == {
            "total_files": 62,  # url-union of base+snapshot (60 base + 2 added)
            "added": 2,
            "deleted": 2,
            "modified": 3,
            "dirs_added": 1,
            "dirs_removed": 0,
            "moves": 0,
            "config_files_changed": [],
            "structural_files_changed": [],
        }
        assert report["manifest"]["num_docs"] == 60

        rebuild = str(tmp_path / "rebuild")
        build_index(
            new_src,
            rebuild,
            store_cols=("lang", "url"),
            num_shards=2,
            num_buckets=4,
            doc_id_upper=999,
        )
        a, b = IndexSearcher(out), IndexSearcher(rebuild)
        for q in ["common", "CHANGED", "fresh", "p100", "p010", "token3"]:
            ra = [(h["doc_id"], round(h["score"], 9)) for h in a.search(q, limit=0, snippet_lines=0)]
            rb = [(h["doc_id"], round(h["score"], 9)) for h in b.search(q, limit=0, snippet_lines=0)]
            assert ra == rb, q
        assert a.search("p010", snippet_lines=0) == []  # deleted doc gone

    def test_requested_headroom_growth_forces_full(
        self, ray_session, tmp_path, base_index
    ):
        idx, rows = base_index
        new_src = str(tmp_path / "same.parquet")
        _write_corpus(new_src, rows)
        out = str(tmp_path / "grown")
        report = sync_repository(idx, new_src, out, doc_id_upper=50_000)
        assert report["executed"] == "full"
        assert "id_headroom_growth_requested" in report["decision"]["trigger_reasons"]
        from code_indexer_ray.index.manifest import load_manifest

        assert load_manifest(out).doc_id_upper == 50_000
        # a request at or below the base's upper is a no-op (incremental path)
        out2 = str(tmp_path / "same_upper")
        report2 = sync_repository(idx, new_src, out2, doc_id_upper=10)
        assert report2["executed"] == "noop"

    def test_force_full(self, ray_session, tmp_path, base_index):
        idx, rows = base_index
        new_src = str(tmp_path / "same.parquet")
        _write_corpus(new_src, rows)
        out = str(tmp_path / "forced")
        report = sync_repository(idx, new_src, out, force_full=True)
        assert report["executed"] == "full"
        assert report["decision"]["primary_trigger"] == "user_requested"
        assert report["manifest"]["num_docs"] == 60
        assert os.path.exists(os.path.join(out, "manifest.json"))

    def test_threshold_triggers_full(self, ray_session, tmp_path, base_index):
        idx, rows = base_index
        # modify 40% of docs → change_percentage trigger → full rebuild
        new_rows = [
            (i, u, t + " BULK") if i < 24 else (i, u, t) for i, u, t in rows
        ]
        new_src = str(tmp_path / "bulk.parquet")
        _write_corpus(new_src, new_rows)
        report = sync_repository(idx, new_src, str(tmp_path / "bulk_out"))
        assert report["executed"] == "full"
        assert report["decision"]["trigger_reasons"] == ["change_percentage"]

    def test_corruption_triggers_full(self, ray_session, tmp_path, base_index):
        idx, rows = base_index
        # truncate one segment file → shallow verify flags it
        m_dir = None
        for r, _, fs in os.walk(idx):
            for f in fs:
                if f.endswith(".seg") or f.endswith(".parquet"):
                    p = os.path.join(r, f)
                    if "segments" in p or f.endswith(".seg"):
                        m_dir = p
                        break
            if m_dir:
                break
        if m_dir is None:  # fall back: any recorded partition file
            from code_indexer_ray.index.manifest import load_manifest

            man = load_manifest(idx)
            m_dir = os.path.join(idx, next(iter(man.iter_partitions(idx)))["path"])
        with open(m_dir, "r+b") as f:
            f.truncate(max(0, os.path.getsize(m_dir) - 8))
        new_src = str(tmp_path / "same2.parquet")
        _write_corpus(new_src, rows)
        report = sync_repository(
            idx, new_src, str(tmp_path / "fixed"), execute=False
        )
        assert report["decision"]["should_reindex"] is True
        assert "corruption_detected" in report["decision"]["trigger_reasons"]

    def test_noop(self, ray_session, tmp_path, base_index):
        idx, rows = base_index
        new_src = str(tmp_path / "same3.parquet")
        _write_corpus(new_src, rows)
        report = sync_repository(idx, new_src, str(tmp_path / "noop_out"))
        assert report["executed"] == "noop"
        assert report["changes"]["added"] == 0

    def test_dry_run(self, ray_session, tmp_path, base_index):
        idx, rows = base_index
        new_src = str(tmp_path / "same4.parquet")
        _write_corpus(new_src, rows)
        out = str(tmp_path / "dry_out")
        report = sync_repository(idx, new_src, out, execute=False)
        assert report["executed"] is None
        assert not os.path.exists(out)

    def test_url_not_stored_raises(self, ray_session, tmp_path):
        from code_indexer_ray.index.build import build_index

        src = str(tmp_path / "nosurl.parquet")
        _write_corpus(src, [(0, "http://x/p0", "plain doc")])
        idx = str(tmp_path / "nourl_idx")
        build_index(src, idx, store_cols=("lang",), num_shards=1, num_buckets=2,
                    doc_id_upper=9)
        with pytest.raises(ValueError, match="stored columns"):
            sync_repository(idx, src, str(tmp_path / "x_out"))
