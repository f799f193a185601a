#!/usr/bin/env python
"""Headline benchmarks: index-build throughput (docs/s) + BM25 top-10 query
latency over a synthesized Common-Crawl-shaped corpus (BASELINE.md targets).

- plain run: ONE JSON line
  {"metric": ..., "value": <headline seconds>, "unit": "sec",
   "queries": {...per-stage seconds...}, "sf": ..., "num_cpus": N, ...}
- ``--scaling``: runs the same job in two fresh processes at
  RAY_GRAFT_CPUS=8 and =32 on the same input and reports both throughputs +
  scaling efficiency (sandbox stand-in for N vs 4N nodes per BASELINE.json).

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS (default 32),
GRAFT_BENCH_DOCS (default 100000 synthetic pages; --scaling children default 400000 — at 200000 the 32-cpu leg finishes in ~10 s and fixed session costs flatter the small leg; see BASELINE.md round-4 scaling).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("GRAFT_BENCH_DOCS", "100000"))
CORPUS_DIR = f"/tmp/cidx_bench_corpus_{N_DOCS}"


def ensure_corpus() -> str:
    """Generate the deterministic corpus once (untimed), shared across runs."""
    done = os.path.join(CORPUS_DIR, "_SUCCESS")
    if not os.path.exists(done):
        from code_indexer_ray.pipelines.corpus import write_corpus

        shutil.rmtree(CORPUS_DIR, ignore_errors=True)
        write_corpus(CORPUS_DIR, N_DOCS, seed=42)
        with open(done, "w") as f:
            f.write("ok")
    # warm the OS page cache so both parallelism levels measure compute+shuffle
    for name in os.listdir(CORPUS_DIR):
        if name.endswith(".parquet"):
            with open(os.path.join(CORPUS_DIR, name), "rb") as f:
                f.read()
    return CORPUS_DIR


def bench_queries(index_dir: str) -> dict:
    import numpy as np

    from code_indexer_ray.query.engine import IndexSearcher

    t0 = time.perf_counter()
    s = IndexSearcher(index_dir, lang_col="lang", url_col="url")
    s.search("t000042", limit=10, snippet_lines=0)  # bucket-lazy first query
    cold_sec = time.perf_counter() - t0
    # steady-state latency is measured on a WARM cache (daemon behavior);
    # cold_sec above is the honest first-query number
    s.warm()

    rng = np.random.default_rng(7)
    # zipf-spread term mix: heads, torso, tail
    single = [f"t{int(r):06d}" for r in np.concatenate([
        rng.integers(0, 20, 40), rng.integers(20, 2000, 40), rng.integers(2000, 49999, 20),
    ])]
    pairs = [f"{a} {b}" for a, b in zip(single[:30], single[30:60])]
    lat = []
    for q in single + pairs:
        t1 = time.perf_counter()
        s.search(q, limit=10, snippet_lines=0)
        lat.append(time.perf_counter() - t1)
    lat_ms = np.sort(np.array(lat) * 1000)
    fuzzy_t = time.perf_counter()
    for q in ["t00004", "t000x42", "t01234"]:
        s.search(q, edit_distance=1, limit=10, snippet_lines=0)
    fuzzy_sec = (time.perf_counter() - fuzzy_t) / 3
    return {
        "query_cold_sec": round(cold_sec, 4),
        "bm25_p50_ms": round(float(np.percentile(lat_ms, 50)), 3),
        "bm25_p95_ms": round(float(np.percentile(lat_ms, 95)), 3),
        "bm25_qps": round(len(lat) / (sum(lat) or 1e-9), 1),
        "fuzzy_avg_sec": round(fuzzy_sec, 4),
    }


def run() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NCPU,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from code_indexer_ray.index.build import build_index

    corpus = ensure_corpus()
    out = f"/tmp/cidx_bench_idx_{NCPU}"
    shutil.rmtree(out, ignore_errors=True)

    # warm the worker pool (process spin-up is cluster startup, not pipeline
    # throughput) and pin the task decomposition so both scaling legs run the
    # identical job
    os.environ.setdefault("CIDX_READ_BLOCKS", "128")
    import ray.data as _rd

    _rd.range(10_000).map_batches(lambda b: b, batch_format="pyarrow").count()

    # best-of-N (default 2; scaling legs use 3): single-box runs see ±15%
    # noise from co-tenant memory bandwidth; both scaling legs use the
    # identical protocol
    build_secs = []
    for attempt in range(int(os.environ.get("GRAFT_BENCH_REPS", "2"))):
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.perf_counter()
        manifest = build_index(
            corpus,
            out,
            store_cols=("lang", "url"),
            # 16 buckets: head-term groups land in 16×16=256 partitions; the
            # finer grain cuts the encode straggler tail that serialized the
            # 32-cpu leg (interleaved A/B at 200k: 12.8 s vs 14.9 s at 32
            # cpus, neutral at 8 cpus)
            num_buckets=16,
            target_docs_per_shard=max(1000, N_DOCS // 16),
            resume=False,
        )
        build_secs.append(time.perf_counter() - t0)
    build_sec = min(build_secs)

    qstats = bench_queries(out)

    # parallel query throughput: actor-pool serving (ST5 analog) — skipped in
    # scaling mode
    if not os.environ.get("GRAFT_BENCH_FAST"):
        import numpy as np
        import ray.data as _rd2

        from code_indexer_ray.query.serve import evaluate_queries

        rng = np.random.default_rng(11)
        qrows = [
            {"query_id": i, "query_text": f"t{int(r):06d}", "mode": "exact",
             "edit_distance": 0, "limit": 10}
            for i, r in enumerate(rng.integers(0, 49999, 1024))
        ]
        tq = time.perf_counter()
        evaluate_queries(
            _rd2.from_items(qrows), out, concurrency=8, batch_size=16
        ).materialize()
        qstats["parallel_qps"] = round(len(qrows) / (time.perf_counter() - tq), 1)

    # secondary pipelines (skipped in scaling mode — the criterion is the
    # headline build, and these add minutes at the larger scaling corpus)
    minhash_sec = chunk_sec = -1.0
    if not os.environ.get("GRAFT_BENCH_FAST"):
        import ray.data as rd

        from code_indexer_ray.dedup.minhash import minhash_batch_fast
        from code_indexer_ray.text.chunker import chunk_batch

        t2 = time.perf_counter()
        rd.read_parquet(corpus, columns=["doc_id", "text"]).map_batches(
            minhash_batch_fast, batch_format="pyarrow"
        ).count()
        minhash_sec = time.perf_counter() - t2

        t3 = time.perf_counter()
        rd.read_parquet(corpus, columns=["doc_id", "text"]).map_batches(
            chunk_batch, batch_format="pyarrow"
        ).count()
        chunk_sec = time.perf_counter() - t3

        # LSH near-dup candidate discovery over the whole corpus (sig → bands
        # → bucket pairs), and an incremental merge of a 2k-doc delta into the
        # freshly built index (delete-then-add, byte-identical semantics)
        from code_indexer_ray.dedup.minhash import MERSENNE_31, band_batch, candidate_pairs
        from code_indexer_ray.index.build import build_index as _bi
        from code_indexer_ray.index.merge import merge_indexes

        t4 = time.perf_counter()
        bands = rd.read_parquet(corpus, columns=["doc_id", "text"]).map_batches(
            lambda b: band_batch(minhash_batch_fast(b), mod=MERSENNE_31),
            batch_format="pyarrow",
        )
        n_pairs = candidate_pairs(bands).count()
        qstats["near_dup_pairs_sec"] = round(time.perf_counter() - t4, 3)
        qstats["near_dup_candidates"] = int(n_pairs)

        # substring (duplicated-span) dedup over the same corpus — winnowed
        # anchor mode (the 100-TB path): window hash → flag → span merge
        from code_indexer_ray.dedup.substring import removal_spans

        t4b = time.perf_counter()
        spans_ds = removal_spans(
            rd.read_parquet(corpus, columns=["doc_id", "text"]),
            w=8, winnow_k=4, num_partitions=64,
        )
        n_spans = spans_ds.count()
        qstats["substring_dedup_sec"] = round(time.perf_counter() - t4b, 3)
        qstats["substring_spans"] = int(n_spans)

        import glob

        import pyarrow.parquet as _pq

        delta_src = "/tmp/cidx_bench_delta.parquet"
        first = sorted(glob.glob(os.path.join(corpus, "*.parquet")))[0]
        _pq.write_table(_pq.read_table(first).slice(0, 2000), delta_src)
        delta_idx, merged = "/tmp/cidx_bench_delta_idx", "/tmp/cidx_bench_merged"
        shutil.rmtree(delta_idx, ignore_errors=True)
        shutil.rmtree(merged, ignore_errors=True)
        _bi(
            delta_src, delta_idx, store_cols=("lang", "url"),
            num_shards=manifest.num_shards, num_buckets=manifest.num_buckets,
            doc_id_upper=manifest.doc_id_upper, resume=False,
        )
        t5 = time.perf_counter()
        merge_indexes(out, delta_idx, merged)
        qstats["merge_sec"] = round(time.perf_counter() - t5, 3)

        # doc-store compaction (small-file coalescing) on the merged index
        from code_indexer_ray.index.compact import compact_docstore

        t6 = time.perf_counter()
        cstats = compact_docstore(merged)
        qstats["compact_sec"] = round(time.perf_counter() - t6, 3)
        qstats["compact_files"] = f"{cstats['files_before']}->{cstats['files_after']}"

        # positions-enabled build (phrase payload) — round-3 vectorized path
        pos_out = "/tmp/cidx_bench_idx_pos"
        shutil.rmtree(pos_out, ignore_errors=True)
        t6b = time.perf_counter()
        build_index(
            corpus, pos_out, store_cols=("lang", "url"), num_buckets=16,
            target_docs_per_shard=max(1000, N_DOCS // 16),
            index_positions=True, resume=False,
        )
        qstats["positions_build_sec"] = round(time.perf_counter() - t6b, 3)

        # FLAGSHIP input_hint end-to-end (round 3): html pages → keep-latest →
        # extract(title, body) → native two-field build → BM25F top-10
        import pyarrow as pa
        import pyarrow.compute as pc

        from code_indexer_ray.pipelines.ops import keep_latest
        from code_indexer_ray.query.engine import IndexSearcher as _IS0
        from code_indexer_ray.text.extract import extract_text_html

        def to_fields(batch: pa.Table) -> pa.Table:
            html = batch["html"].combine_chunks().cast(pa.string())
            title = pc.struct_field(
                pc.extract_regex(html, r"<title>(?P<t>[^<]*)</title>"), "t"
            )
            return pa.table(
                {
                    "doc_id": batch["doc_id"].cast(pa.int64()),
                    "title": title,
                    "body": extract_text_html(html),
                    "lang": batch["lang"],
                }
            )

        t7a = time.perf_counter()
        wdir, widx = "/tmp/cidx_bench_warc_fields", "/tmp/cidx_bench_warc_idx"
        shutil.rmtree(wdir, ignore_errors=True)
        shutil.rmtree(widx, ignore_errors=True)
        # the bench corpus IS the input_hint pages schema already
        pages = rd.read_parquet(corpus, columns=["doc_id", "url", "warc_ts", "html", "lang"])
        keep_latest(pages, ["url"], "warc_ts").map_batches(
            to_fields, batch_format="pyarrow"
        ).write_parquet(wdir)
        build_index(
            wdir, widx, fields={"title": "title", "body": "body"},
            store_cols=("lang",), num_buckets=16,
            target_docs_per_shard=max(1000, N_DOCS // 16), resume=False,
        )
        sw = _IS0(widx, lang_col="lang", url_col=None)
        hits = sw.search_multifield(
            "t000123 t000456", {"title": 2.0, "body": 1.0}, limit=10, combine="bm25f"
        )
        qstats["warc_e2e_sec"] = round(time.perf_counter() - t7a, 3)
        qstats["warc_e2e_hits"] = len(hits)

        # temporal family (round 3): synthesized commit history → bucketed
        # build → date-range search; cost is windows × per-window build
        from code_indexer_ray.temporal import (
            TemporalSearcher,
            build_temporal_index,
            change_rows,
        )

        t7t = time.perf_counter()
        tchg, tidx = "/tmp/cidx_bench_tchanges", "/tmp/cidx_bench_tidx"
        shutil.rmtree(tchg, ignore_errors=True)
        shutil.rmtree(tidx, ignore_errors=True)
        docs_for_hist = rd.read_parquet(corpus, columns=["doc_id", "url", "text"])

        def as_docs(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": batch["doc_id"].cast(pa.int64()),
                    "source": batch["url"],
                    "text": batch["text"],
                }
            )

        docs_for_hist.map_batches(as_docs, batch_format="pyarrow").map_batches(
            change_rows, batch_format="pyarrow"
        ).write_parquet(tchg)
        qstats["temporal_synth_sec"] = round(time.perf_counter() - t7t, 3)
        t7t = time.perf_counter()
        # window layout measured at 32 cpus on 258k changes (BASELINE.md):
        # buckets carry encode parallelism without widening the query
        # fan-out (bucket-lazy term loads), a couple of shards carry the
        # sort: 51.4 s (16b/1s) → 23.5 s with query p50 at parity
        build_temporal_index(tchg, tidx, bucket_days=4, num_buckets=32,
                             target_docs_per_shard=max(1000, N_DOCS // 2),
                             window_concurrency=4)
        qstats["temporal_build_sec"] = round(time.perf_counter() - t7t, 3)
        ts_ = TemporalSearcher(tidx)
        t7q = time.perf_counter()
        thits = ts_.query(
            "t000123", start_day="2025-03-05", end_day="2025-03-12",
            diff_types=["modified"], limit=10,
        )
        qstats["temporal_query_cold_ms"] = round((time.perf_counter() - t7q) * 1000, 2)
        qstats["temporal_hits"] = len(thits)
        tlat = []
        for qi in range(20):  # unique terms: the result cache must not answer
            t7q = time.perf_counter()
            ts_.query(
                f"t{100 + qi:06d}", start_day="2025-03-05", end_day="2025-03-12",
                diff_types=["modified"], limit=10,
            )
            tlat.append(time.perf_counter() - t7q)
        qstats["temporal_query_p50_ms"] = round(sorted(tlat)[len(tlat) // 2] * 1000, 2)

        # path-history store (fifth session): hash-routed point-read
        # file_at vs the partition-pruned filtered scan fallback
        from code_indexer_ray.temporal.pathstore import build_path_store

        t7p = time.perf_counter()
        build_path_store(tidx)
        qstats["temporal_pathstore_build_sec"] = round(time.perf_counter() - t7p, 3)
        probe = (
            rd.read_parquet(corpus, columns=["doc_id", "url"]).limit(40).to_pandas()
        )
        fpaths = [
            f"{u}/{int(d)}.txt" for d, u in zip(probe["doc_id"], probe["url"])
        ][:20]
        ts_store = TemporalSearcher(tidx)
        ts_scan = TemporalSearcher(tidx)
        ts_scan._paths = None  # force the fallback for the comparison leg
        lat_s, lat_f = [], []
        for p in fpaths:
            t0 = time.perf_counter()
            ts_store.file_at(p, "2025-03-12")
            lat_s.append(time.perf_counter() - t0)
        for p in fpaths:
            t0 = time.perf_counter()
            ts_scan.file_at(p, "2025-03-12")
            lat_f.append(time.perf_counter() - t0)
        qstats["temporal_file_at_p50_ms_store"] = round(
            sorted(lat_s)[len(lat_s) // 2] * 1000, 2
        )
        qstats["temporal_file_at_p50_ms_scan"] = round(
            sorted(lat_f)[len(lat_f) // 2] * 1000, 2
        )

        # KV doc store (round 3): derivation cost + 10-id mget p50, KV vs
        # parquet row-group point reads
        import numpy as np

        from code_indexer_ray.index.kvstore import build_kv_docstore
        from code_indexer_ray.query.engine import IndexSearcher as _IS

        t7 = time.perf_counter()
        build_kv_docstore(out)
        qstats["kv_build_sec"] = round(time.perf_counter() - t7, 3)
        rng2 = np.random.default_rng(3)
        mbatches = [rng2.integers(0, manifest.num_docs, 10).tolist() for _ in range(100)]
        for tag, forced in (("kv", None), ("parquet", False)):
            s_ = _IS(out, lang_col="lang", url_col="url")
            if forced is False:
                s_._kv = False
            s_._fetch_texts(mbatches[0])
            lat = []
            for b in mbatches:
                t_ = time.perf_counter()
                s_._fetch_texts(b)
                lat.append(time.perf_counter() - t_)
            qstats[f"mget10_p50_{tag}_ms"] = round(
                float(np.percentile(np.array(lat) * 1000, 50)), 2
            )

        # SCIP symbol store (round 3): extraction+build cost over the
        # code-synthesized corpus, then point-read and graph-query latency
        from code_indexer_ray.scip.store import SymbolStore, build_symbol_store
        from code_indexer_ray.text.structured import synthesize_calls_batch

        sroot = "/tmp/cidx_bench_symstore"
        shutil.rmtree(sroot, ignore_errors=True)
        code_ds = rd.read_parquet(corpus, columns=["doc_id", "text"]).map_batches(
            synthesize_calls_batch, batch_format="pyarrow"
        )
        t8 = time.perf_counter()
        sman = build_symbol_store(code_ds, sroot, num_parts=16)
        qstats["symstore_build_sec"] = round(time.perf_counter() - t8, 3)
        qstats["symstore_rows"] = sman["total_rows"]
        ss = SymbolStore(sroot)
        ss.references("f3")  # warm (manifest + first part open)
        slat = []
        for qi in range(40):
            t8q = time.perf_counter()
            ss.references(f"f{3 * (qi % 20)}")
            slat.append(time.perf_counter() - t8q)
        qstats["symstore_refs_p50_ms"] = round(
            float(np.percentile(np.array(slat) * 1000, 50)), 2
        )
        t8q = time.perf_counter()
        ss.analyze_impact("f0", max_depth=3)
        qstats["symstore_impact_ms"] = round((time.perf_counter() - t8q) * 1000, 2)

        # Semantic / hybrid serving tier (round 3): actor-pool corpus embed
        # → IVF vector store build → search_mode=semantic|hybrid latency
        # through the same rest_search path the HTTP/MCP daemons use
        from code_indexer_ray.ann.store import build_vector_store
        from code_indexer_ray.query.semantic import SemanticTier, hybrid_hits, semantic_hits
        from code_indexer_ray.text.embed import TextEmbedStage

        vemb = "/tmp/cidx_bench_vemb"
        vstore = "/tmp/cidx_bench_vstore"
        shutil.rmtree(vemb, ignore_errors=True)
        shutil.rmtree(vstore, ignore_errors=True)
        t9 = time.perf_counter()
        (
            rd.read_parquet(corpus, columns=["doc_id", "text"])
            .map_batches(
                TextEmbedStage,
                fn_constructor_kwargs={"dim": 64, "output": "list"},
                # leave CPUs for the read/write operators: an actor pool
                # sized to the whole session deadlocks it (NOTES_r3 gotcha)
                concurrency=max(2, NCPU // 4),
                batch_format="pyarrow",
            )
            .filter(expr="norm > 0")
            .drop_columns(["norm"])
            .write_parquet(vemb)
        )
        qstats["embed_corpus_sec"] = round(time.perf_counter() - t9, 3)
        t9b = time.perf_counter()
        build_vector_store(vemb, vstore, id_col="doc_id", vec_col="embedding",
                           n_centroids=64, resume=False)
        qstats["vector_store_build_sec"] = round(time.perf_counter() - t9b, 3)
        tier = SemanticTier(vstore)
        s9 = _IS(out, lang_col="lang", url_col="url")
        sem_qs = [f"t{int(r):06d} t{int(r2):06d}" for r, r2 in zip(
            rng2.integers(0, 2000, 30), rng2.integers(0, 49999, 30))]
        semantic_hits(s9, tier, sem_qs[0], limit=10)  # warm (centroids+cells)
        lat_s, lat_h = [], []
        for q in sem_qs:
            t_ = time.perf_counter()
            semantic_hits(s9, tier, q, limit=10)
            lat_s.append(time.perf_counter() - t_)
        for q in sem_qs:
            t_ = time.perf_counter()
            hybrid_hits(s9, tier, q, limit=10)
            lat_h.append(time.perf_counter() - t_)
        qstats["semantic_p50_ms"] = round(
            float(np.percentile(np.array(lat_s) * 1000, 50)), 2
        )
        qstats["hybrid_p50_ms"] = round(
            float(np.percentile(np.array(lat_h) * 1000, 50)), 2
        )

    # directory-tree ingestion front door (round 4): walk + distributed read
    # over a synthetic checkout (files cached across runs; ingest timed)
    if not os.environ.get("GRAFT_BENCH_FAST"):
        from code_indexer_ray.pipelines.tree import TreeConfig, ingest_tree

        n_files = int(os.environ.get("GRAFT_BENCH_TREE_FILES", "20000"))
        troot = f"/tmp/cidx_bench_tree_{n_files}"
        tdone = os.path.join(troot, "_FIXTURE_OK")
        if not os.path.exists(tdone):
            shutil.rmtree(troot, ignore_errors=True)
            import numpy as np

            rng = np.random.default_rng(13)
            vocab = [f"w{i:04d}" for i in range(2000)]
            for i in range(n_files):
                d = os.path.join(troot, f"pkg{i % 64:02d}", f"mod{(i // 64) % 16}")
                os.makedirs(d, exist_ok=True)
                body = " ".join(vocab[j] for j in rng.integers(0, 2000, 120))
                with open(os.path.join(d, f"f{i:06d}.py"), "w") as f:
                    f.write(f"def fn{i}():\n    return '{body}'\n")
            # excluded noise the walker must prune cheaply
            os.makedirs(os.path.join(troot, "node_modules", "dep"), exist_ok=True)
            for i in range(500):
                with open(os.path.join(troot, "node_modules", "dep", f"x{i}.js"), "w") as f:
                    f.write("junk")
            with open(tdone, "w") as f:
                f.write("ok")
        tcorp = "/tmp/cidx_bench_tree_corpus"
        shutil.rmtree(tcorp, ignore_errors=True)
        ti = time.perf_counter()
        tds = ingest_tree(troot, tcorp, config=TreeConfig(),
                          concurrency=max(4, NCPU // 4), batch_size=256)
        n_ing = tds.count()
        dt = time.perf_counter() - ti
        qstats["ingest_tree_sec"] = round(dt, 2)
        qstats["ingest_files_per_sec"] = round(n_ing / dt, 1)

    # daemon-path serving (round 4): warm p50 through the unix-socket daemon
    # (socket + JSON framing + replica checkout on top of the engine's p50)
    if not os.environ.get("GRAFT_BENCH_FAST"):
        import numpy as np

        from code_indexer_ray.server.daemon import DaemonClient, DaemonServer

        dsock = f"/tmp/cidx_bench_daemon_{NCPU}.sock"
        try:
            dsrv = DaemonServer(out, socket_path=dsock, pool_size=2)
            dsrv.start()
            with DaemonClient(dsock) as dc:
                dc.request("search", q="t000042", params={"limit": 10})
                dlat = []
                for r in np.random.default_rng(5).integers(0, 49999, 40):
                    t_ = time.perf_counter()
                    dc.request("search", q=f"t{int(r):06d}", params={"limit": 10})
                    dlat.append(time.perf_counter() - t_)
            qstats["daemon_p50_ms"] = round(sorted(dlat)[len(dlat) // 2] * 1000, 2)
            dsrv.shutdown()
        except Exception:  # noqa: BLE001 — serving stage must not sink the bench
            qstats["daemon_p50_ms"] = -1.0

    # big-corpus section (VERDICT r3 #10): the 1M-doc build + serving and the
    # 500k-change temporal + 1M-doc symbol store numbers ride the official
    # per-round JSON so big-corpus regressions are visible, not just sf0.1.
    # One rep each (these exist to catch step-function regressions like the
    # round-2 sort sublinearity, not to win ±10% windows).
    big: dict = {}
    if not os.environ.get("GRAFT_BENCH_FAST") and not os.environ.get("GRAFT_BENCH_NO_BIG"):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from code_indexer_ray.query.engine import IndexSearcher as _ISB

        # -- 1M-doc build + serving (adopted config: auto num_buckets=32
        # above 500k docs, shards = n/16; BASELINE.md 1M record 77.2 s) --
        n_big = int(os.environ.get("GRAFT_BENCH_BIG_DOCS", "1000000"))
        big_corpus = f"/tmp/cidx_bench_corpus_{n_big}"
        bdone = os.path.join(big_corpus, "_SUCCESS")
        if not os.path.exists(bdone):
            from code_indexer_ray.pipelines.corpus import write_corpus as _wc

            shutil.rmtree(big_corpus, ignore_errors=True)
            _wc(big_corpus, n_big, seed=42)
            with open(bdone, "w") as f:
                f.write("ok")
        big_out = f"/tmp/cidx_bench_idx_big_{NCPU}"
        shutil.rmtree(big_out, ignore_errors=True)
        tb = time.perf_counter()
        bman = build_index(
            big_corpus, big_out, store_cols=("lang", "url"),
            target_docs_per_shard=max(1000, n_big // 16), resume=False,
        )
        big["build_1m_sec"] = round(time.perf_counter() - tb, 1)
        big["docs_per_sec_1m"] = round(bman.num_docs / (time.perf_counter() - tb), 1)
        tb = time.perf_counter()
        sb = _ISB(big_out, lang_col="lang", url_col="url")
        sb.search("t000042", limit=10, snippet_lines=0)
        big["query_cold_1m_sec"] = round(time.perf_counter() - tb, 2)
        sb.warm()
        rngb = np.random.default_rng(7)
        blat = []
        for r in np.concatenate([rngb.integers(0, 2000, 16), rngb.integers(2000, 49999, 8)]):
            t_ = time.perf_counter()
            sb.search(f"t{int(r):06d}", limit=10, snippet_lines=0)
            blat.append(time.perf_counter() - t_)
        big["bm25_p50_1m_ms"] = round(sorted(blat)[len(blat) // 2] * 1000, 2)
        del sb

        # -- 1M-doc symbol store (r3: ~2.9M rows/s, BETTER per-row at 10×) --
        from code_indexer_ray.scip.store import SymbolStore as _SSB
        from code_indexer_ray.scip.store import build_symbol_store as _bss
        from code_indexer_ray.text.structured import synthesize_calls_batch as _scb

        sroot_b = "/tmp/cidx_bench_symstore_1m"
        shutil.rmtree(sroot_b, ignore_errors=True)
        code_big = rd.read_parquet(big_corpus, columns=["doc_id", "text"]).map_batches(
            _scb, batch_format="pyarrow"
        )
        tb = time.perf_counter()
        sman_b = _bss(code_big, sroot_b, num_parts=32)
        big["symstore_1m_build_sec"] = round(time.perf_counter() - tb, 1)
        big["symstore_1m_rows"] = sman_b["total_rows"]
        ssb = _SSB(sroot_b)
        ssb.references("f3")
        t_ = time.perf_counter()
        ssb.references("f30")
        big["symstore_1m_refs_ms"] = round((time.perf_counter() - t_) * 1000, 2)

        # -- ~500k-change temporal build (change synthesis over a 200k-doc
        # slice of the big corpus → bucketed sub-indexes) --
        from code_indexer_ray.temporal import (
            TemporalSearcher as _TSB,
            build_temporal_index as _bti,
            change_rows as _crw,
        )

        tchg_b, tidx_b = "/tmp/cidx_bench_tchanges_500k", "/tmp/cidx_bench_tidx_500k"
        shutil.rmtree(tchg_b, ignore_errors=True)
        shutil.rmtree(tidx_b, ignore_errors=True)
        n_tdocs = 200_000

        def _as_docs(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": batch["doc_id"].cast(pa.int64()),
                    "source": batch["url"],
                    "text": batch["text"],
                }
            )

        (
            rd.read_parquet(big_corpus, columns=["doc_id", "url", "text"])
            .limit(n_tdocs)
            .map_batches(_as_docs, batch_format="pyarrow")
            .map_batches(_crw, batch_format="pyarrow")
            .write_parquet(tchg_b)
        )
        tb = time.perf_counter()
        _bti(tchg_b, tidx_b, bucket_days=4, num_buckets=32,
             target_docs_per_shard=max(1000, n_tdocs), window_concurrency=4)
        big["temporal_500k_build_sec"] = round(time.perf_counter() - tb, 1)
        tsb = _TSB(tidx_b)
        t_ = time.perf_counter()
        thits_b = tsb.query("t000123", start_day="2025-03-05", end_day="2025-03-12",
                            diff_types=["modified"], limit=10)
        big["temporal_500k_query_cold_ms"] = round((time.perf_counter() - t_) * 1000, 1)
        big["temporal_500k_hits"] = len(thits_b)

        # reclaim the measured-and-done big intermediates before the xl
        # stage — the 5M corpus+index need the headroom on this 252 GB box
        shutil.rmtree(sroot_b, ignore_errors=True)
        shutil.rmtree(tchg_b, ignore_errors=True)
        shutil.rmtree(tidx_b, ignore_errors=True)

        # -- 5M-doc build + serve probe (VERDICT r4 #7): one more order of
        # magnitude over the 1M canary to keep the sort-group sublinearity
        # fix honest.  Corpus ~34 GB on disk; generated once and cached.
        # GRAFT_BENCH_XL_DOCS=0 skips; insufficient disk skips with the
        # reason recorded (no silent cap). --
        n_xl = int(os.environ.get("GRAFT_BENCH_XL_DOCS", "5000000"))
        if n_xl:
            xl_corpus = f"/tmp/cidx_bench_corpus_{n_xl}"
            xdone = os.path.join(xl_corpus, "_SUCCESS")
            free_gb = shutil.disk_usage("/tmp").free / 1e9
            need_gb = (0 if os.path.exists(xdone) else n_xl * 7e-6) + n_xl * 2e-6
            if free_gb < need_gb + 8:
                big["xl_skipped"] = (
                    f"{free_gb:.0f} GB free < {need_gb + 8:.0f} GB needed for {n_xl} docs"
                )
            else:
                if not os.path.exists(xdone):
                    from code_indexer_ray.pipelines.corpus import write_corpus as _wc2

                    shutil.rmtree(xl_corpus, ignore_errors=True)
                    tb = time.perf_counter()
                    _wc2(xl_corpus, n_xl, seed=42)
                    big["xl_corpus_gen_sec"] = round(time.perf_counter() - tb, 1)
                    with open(xdone, "w") as f:
                        f.write("ok")
                xl_out = f"/tmp/cidx_bench_idx_xl_{NCPU}"
                shutil.rmtree(xl_out, ignore_errors=True)
                tb = time.perf_counter()
                xman = build_index(
                    xl_corpus, xl_out, store_cols=("lang", "url"),
                    target_docs_per_shard=max(1000, n_xl // 32), resume=False,
                )
                xl_sec = time.perf_counter() - tb
                big[f"build_{n_xl // 1_000_000}m_sec"] = round(xl_sec, 1)
                big[f"docs_per_sec_{n_xl // 1_000_000}m"] = round(xman.num_docs / xl_sec, 1)
                tb = time.perf_counter()
                sx = _ISB(xl_out, lang_col="lang", url_col="url")
                sx.search("t000042", limit=10, snippet_lines=0)
                big[f"query_cold_{n_xl // 1_000_000}m_sec"] = round(time.perf_counter() - tb, 2)
                sx.warm()
                rngx = np.random.default_rng(7)
                xlat = []
                for r in np.concatenate([rngx.integers(0, 2000, 16), rngx.integers(2000, 49999, 8)]):
                    t_ = time.perf_counter()
                    sx.search(f"t{int(r):06d}", limit=10, snippet_lines=0)
                    xlat.append(time.perf_counter() - t_)
                big[f"bm25_p50_{n_xl // 1_000_000}m_ms"] = round(
                    sorted(xlat)[len(xlat) // 2] * 1000, 2
                )
                del sx
                shutil.rmtree(xl_out, ignore_errors=True)  # keep /tmp headroom

    result = {
        "metric": "index-build docs/sec + BM25 top-10 p50 over synthetic Common-Crawl corpus",
        "value": round(build_sec, 3),
        "unit": "sec",
        "queries": {
            "index_build": round(build_sec, 3),
            "minhash_signatures": round(minhash_sec, 3),
            "chunking": round(chunk_sec, 3),
            **{k: v for k, v in qstats.items()},
        },
        "big": big,
        "sf": SF_DIR,
        "num_cpus": NCPU,
        "n_docs": manifest.num_docs,
        "total_tokens": manifest.total_tokens,
        "docs_per_sec": round(manifest.num_docs / build_sec, 1),
        "tokens_per_sec": round(manifest.total_tokens / build_sec, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> None:
    def child(ncpu: int, reps: int) -> dict:
        # larger corpus for the scaling comparison so per-stage compute
        # dominates fixed single-node coordination costs (the stand-in for
        # "N vs 4N nodes on a big input"); same input for both legs
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_DOCS=os.environ.get("GRAFT_BENCH_DOCS", "400000"),
            CIDX_READ_BLOCKS=os.environ.get("CIDX_READ_BLOCKS", "128"),
            GRAFT_BENCH_FAST="1",
            GRAFT_BENCH_REPS=str(reps),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo = int(os.environ.get("GRAFT_SCALE_LO", "8"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "32"))
    # INTERLEAVED single-rep children (lo,hi, lo,hi, ...): host co-tenant
    # pressure drifts on a minutes scale, so sequential all-lo-then-all-hi
    # legs can hand one leg an entirely bad window; alternating pairs both
    # legs against the same windows.  Best-of-N per leg as before.
    pairs = int(os.environ.get("GRAFT_SCALE_PAIRS", "3"))
    runs_lo, runs_hi = [], []
    for _ in range(pairs):
        runs_lo.append(child(lo, 1))
        runs_hi.append(child(hi, 1))
    r_lo = min(runs_lo, key=lambda r: r["value"])
    r_hi = min(runs_hi, key=lambda r: r["value"])
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": f"index-build scaling efficiency ({lo} vs {hi} cpus, fresh sessions)",
                f"sec_{lo}": t_lo,
                f"sec_{hi}": t_hi,
                f"docs_per_sec_{lo}": r_lo["docs_per_sec"],
                f"docs_per_sec_{hi}": r_hi["docs_per_sec"],
                "scaling_efficiency": round(eff, 3),
                "n_docs": r_lo["n_docs"],
                "bm25_p50_ms_hi": r_hi["queries"]["bm25_p50_ms"],
                f"runs_{lo}": [r["value"] for r in runs_lo],
                f"runs_{hi}": [r["value"] for r in runs_hi],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run()))
