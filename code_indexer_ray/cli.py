"""CLI entry points — the ``ray job submit`` surface.

    ray job submit -- python -m code_indexer_ray build --input corpus/ --out /data/idx
    python -m code_indexer_ray search --index /data/idx "spark merge" --limit 10
    python -m code_indexer_ray merge --base /data/idx --delta /data/delta --out /data/idx2

The CLI owns the Ray session (``ray.init`` guarded; library code never
initializes Ray).  Mirrors the reference's ``cidx index --fts`` /
``cidx query --fts`` surface (reference ``cli.py:2634``, ``:4330``) with the
flags that survive the web-scale recast.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_init(num_cpus: int | None):
    import os as _os

    import ray

    if not ray.is_initialized():
        # RAY_ADDRESS (set by `ray job submit` / cluster launchers) wins so
        # the same CLI drives a multi-node cluster unchanged; default stays
        # a local session.  num_cpus only applies to a local session — a
        # cluster's size is the cluster's.
        address = _os.environ.get("RAY_ADDRESS") or "local"
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
        if num_cpus and address == "local":
            kwargs["num_cpus"] = num_cpus
        ray.init(address=address, **kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _make_auto_update(args):
    """DirFingerprintFeed + background-polling AutoUpdateService from CLI
    flags, or None when no --update-feed was given."""
    feed_dir = getattr(args, "update_feed", None)
    if not feed_dir:
        return None
    from .server.autoupdate import AutoUpdateService, DirFingerprintFeed, UpdateLock

    svc = AutoUpdateService(
        DirFingerprintFeed(feed_dir, installed=args.installed_version),
        lock=UpdateLock(feed_dir.rstrip("/") + ".update.lock"),
    )
    svc.poll_once()
    svc.start(args.update_interval)
    return svc


def _teach_ai_cmd(args) -> int:
    """teach-ai — validate flags the way the reference does (exactly one
    platform, exactly one scope unless previewing), then run the two-tier
    skills + awareness install."""
    from . import teach

    if args.skills_only:
        res = teach.teach("claude", skills_only=True)
        print(f"skills installed to {res['skills_dir']}")
        for rel in res["skills"]:
            print(f"  - {rel}")
        return 0

    chosen = [pl for pl in teach.PLATFORMS if getattr(args, f"platform_{pl}")]
    if len(chosen) != 1:
        print(
            "exactly one platform flag required: "
            + " ".join(f"--{pl}" for pl in teach.PLATFORMS),
            file=sys.stderr,
        )
        return 1
    platform = chosen[0]

    if args.show_only:
        res = teach.teach(platform, show_only=True)
        print(res["awareness"])
        print("skills files:")
        for rel in res["skills"]:
            print(f"  - {rel}")
        return 0

    scopes = [s for s, on in (("project", args.scope_project), ("global", args.scope_global)) if on]
    if len(scopes) != 1:
        print("exactly one scope flag required: --project or --global", file=sys.stderr)
        return 1
    try:
        res = teach.teach(platform, scopes[0])
    except ValueError as exc:
        print(str(exc), file=sys.stderr)
        return 1
    print(f"{platform} instructions {res['action']} in {res['scope_desc']}")
    print(f"  file: {res['target']}")
    print(f"  skills: {res['skills_dir']} ({len(res['skills'])} files)")
    return 0


def _curate_cmd(args) -> int:
    """curate <op> — the LLM-curation operators as streaming CLI commands:
    pruned-column parquet in, partitioned parquet out (one file per block —
    a failed run can diff finished partitions and resume)."""
    import os

    import ray.data as rd

    # Ray's parquet sink APPENDS new uuid-named files — re-running into a
    # populated directory would silently DUPLICATE rows.  Refuse unless
    # --overwrite cleared it.
    if os.path.isdir(args.out) and os.listdir(args.out):
        if args.overwrite:
            import shutil

            shutil.rmtree(args.out)
        else:
            print(
                f"output dir {args.out!r} is not empty — pass --overwrite to replace it "
                "(a re-run into a populated dir would duplicate rows)",
                file=sys.stderr,
            )
            return 1

    if args.curate_cmd == "exact":
        from .dedup.exact import dedup_exact

        out_ds = dedup_exact(
            rd.read_parquet(args.input),
            id_col=args.id_col, text_col=args.text_col,
        )
    elif args.curate_cmd == "near-pairs":
        from .dedup.minhash import (
            MERSENNE_31,
            band_batch,
            candidate_pairs,
            minhash_batch_fast,
        )

        ds = rd.read_parquet(args.input, columns=[args.id_col, args.text_col])
        bands = ds.map_batches(
            lambda b: band_batch(
                minhash_batch_fast(b, id_col=args.id_col, text_col=args.text_col),
                mod=MERSENNE_31,
            ),
            batch_format="pyarrow",
        )
        out_ds = candidate_pairs(bands)
        if args.verify_tau is not None:
            from .dedup.verify import pair_jaccard_verify, word_shingle_rows

            out_ds = out_ds.groupby(["doc_a", "doc_b"]).map_groups(
                lambda g: g.head(1), batch_format="pandas"
            )
            sh = ds.map_batches(
                lambda b: word_shingle_rows(
                    b, id_col=args.id_col, text_col=args.text_col
                ),
                batch_format="pyarrow",
            )
            out_ds = pair_jaccard_verify(sh, out_ds, tau=args.verify_tau)
    elif args.curate_cmd == "substring":
        from .dedup.substring import clean_documents, removal_spans

        ds = rd.read_parquet(args.input, columns=[args.id_col, args.text_col])
        fn = clean_documents if args.emit == "clean" else removal_spans
        out_ds = fn(
            ds, id_col=args.id_col, text_col=args.text_col, w=args.window,
            winnow_k=args.winnow or None, num_partitions=args.partitions,
        )
    elif args.curate_cmd == "semdedup":
        from .dedup.semdedup import d4_select, semdedup

        ds = rd.read_parquet(args.input)
        if args.d4_keep:
            num, den = (int(x) for x in args.d4_keep.split("/"))
            out_ds = d4_select(
                ds, k=args.k, iters=args.iters, tau=args.tau,
                keep_num=num, keep_den=den,
            )
        else:
            out_ds = semdedup(ds, k=args.k, iters=args.iters, tau=args.tau)
    elif args.curate_cmd == "mixture":
        from .pipelines.ops import mixture_sample

        weights = {}
        for part in args.weights.split(","):
            dom, w = part.split("=")
            weights[dom.strip()] = float(w)
        ds = rd.read_parquet(args.input, columns=[args.id_col, args.domain_col])
        out_ds = mixture_sample(ds, args.id_col, args.domain_col, weights)
    else:  # pragma: no cover - argparse enforces choices
        return 2

    out_ds.write_parquet(args.out)
    n = rd.read_parquet(args.out).count()
    print(json.dumps({"op": args.curate_cmd, "out": args.out, "rows": int(n)}))
    return 0


def _status_cmd(args) -> int:
    """Unified mode-adaptive status (reference ``cidx status``, cli.py
    ``status`` + ``mode_detection/command_mode_detector.py``): detect the
    operating mode from the config found at or above ``--root``, then
    report that mode's health — all Ray-free.

    index mode → manifest summary + component presence + local-daemon
    liveness; proxy → per-repo rows with error isolation; remote → the
    tiered health check (nonzero exit when unhealthy); uninitialized →
    a hint, exit 0 (status on a fresh checkout is not an error)."""
    import os

    from .query.proxy import detect_mode_root

    mode, root = detect_mode_root(args.root)
    out = {"mode": mode, "root": root}
    if mode == "uninitialized":
        out["hint"] = (
            "no index manifest, proxy config, or remote config at or above "
            f"{os.path.abspath(args.root)} — run build/ingest-tree, proxy init, "
            "or remote init first"
        )
        print(json.dumps(out))
        return 0
    if mode == "remote":
        from .query.remote import check_remote_health

        res = check_remote_health(root, timeout=args.timeout)
        out["remote"] = res
        print(json.dumps(out))
        return 0 if res["connection_health"] == "healthy" else 1
    if mode == "proxy":
        from .query.proxy import ProxySearcher

        rows, errs = ProxySearcher(root).status()
        out["repos"], out["errors"] = rows, errs
        print(json.dumps(out))
        return 0 if not errs else 1
    # index mode
    from .index.manifest import load_manifest
    from .server.daemon import daemon_alive, socket_path_for

    try:
        mf = load_manifest(root)
    except Exception as exc:
        out["error"] = f"manifest unreadable: {exc}"
        print(json.dumps(out))
        return 1
    out["index"] = {
        "num_docs": mf.num_docs,
        "total_tokens": mf.total_tokens,
        "avgdl": round(mf.avgdl, 4),
        "num_shards": mf.num_shards,
        "num_buckets": mf.num_buckets,
        "partitions": mf.n_partitions,
    }
    out["components"] = {
        name: os.path.isdir(os.path.join(root, name))
        for name in ("segments", "docstore", "kvstore", "positions")
    }
    sock = socket_path_for(root)
    out["daemon"] = {"running": daemon_alive(sock), "socket": sock}
    print(json.dumps(out))
    return 0


def _daemon_cmd(args) -> int:
    """daemon serve/start/stop/status — Ray-free (the searcher's local query
    path reads parquet/segments directly; remote actor mode is an HTTP-tier
    feature)."""
    from .server.daemon import DaemonClient, DaemonServer, daemon_alive, socket_path_for

    sock = args.socket or socket_path_for(args.index)
    if args.daemon_cmd == "serve":
        srv = DaemonServer(
            args.index,
            socket_path=sock,
            lang_col=args.lang_col,
            url_col=args.url_col,
            pool_size=args.pool_size,
        )
        import os

        print(json.dumps({"serving": sock, "pid": os.getpid()}), flush=True)
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            srv.shutdown()
        return 0
    if args.daemon_cmd == "start":
        import os
        import subprocess
        import time

        if daemon_alive(sock):
            print(json.dumps({"already_running": sock}))
            return 0
        cmd = [
            sys.executable, "-m", "code_indexer_ray", "daemon", "serve",
            "--index", args.index, "--socket", sock,
            "--pool-size", str(args.pool_size),
        ]
        log = sock + ".log"
        with open(log, "ab") as lf:
            subprocess.Popen(
                cmd, stdout=lf, stderr=lf, stdin=subprocess.DEVNULL,
                start_new_session=True, env=dict(os.environ),
            )
        deadline = time.monotonic() + args.timeout
        while time.monotonic() < deadline:
            if daemon_alive(sock):
                print(json.dumps({"started": sock}))
                return 0
            time.sleep(0.1)
        print(json.dumps({"error": f"daemon did not come up within {args.timeout}s", "log": log}), file=sys.stderr)
        return 1
    if args.daemon_cmd == "stop":
        if not daemon_alive(sock):
            print(json.dumps({"not_running": sock}))
            return 0
        with DaemonClient(sock) as c:
            c.request("shutdown")
        print(json.dumps({"stopped": sock}))
        return 0
    if args.daemon_cmd == "status":
        if not daemon_alive(sock):
            print(json.dumps({"running": False, "socket": sock}))
            return 1
        with DaemonClient(sock) as c:
            st = c.request("status")
        print(json.dumps({"running": True, **st}))
        return 0
    return 2


def _daemon_search_fast_path(args) -> int | None:
    """Transparent daemon delegation for `search` (reference
    cli_daemon_fast.py): socket + json imports only — no Ray, no engine.
    Returns None to fall back to the in-process path (no live daemon, or a
    flag combination the daemon surface doesn't carry)."""
    from .server.daemon import DaemonClient, daemon_alive, socket_path_for

    sock = socket_path_for(args.index)
    if not daemon_alive(sock):
        return None
    if args.semantic or args.hybrid or args.vector_store:
        return None  # vector tiers are configured on the server side only
    multi = lambda v: v and "," in v  # noqa: E731
    if any(map(multi, (args.languages, args.exclude_languages, args.path_filters, args.exclude_paths))):
        return None  # REST surface carries single-valued filters
    if args.limit != 0 and not (1 <= args.limit <= 100):
        return None
    params: dict = {"limit": args.limit, "snippet_lines": args.snippet_lines}
    if args.fuzzy:
        params["edit_distance"] = args.fuzzy
    if args.regex:
        params["regex"] = True
    if args.case_sensitive:
        params["case_sensitive"] = True
    if args.min_score is not None:
        params["min_score"] = args.min_score
    if args.accuracy:
        params["accuracy"] = args.accuracy
    for attr, key in (
        ("languages", "language"),
        ("exclude_languages", "exclude_language"),
        ("path_filters", "path_filter"),
        ("exclude_paths", "exclude_path"),
    ):
        v = getattr(args, attr)
        if v:
            params[key] = v
    try:
        with DaemonClient(sock) as c:
            hits = c.request("search", q=args.query, params=params)
    except (ConnectionError, OSError):
        return None  # daemon died between the probe and the call — local path
    for h in hits:
        print(json.dumps(h))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="code_indexer_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the sharded inverted index")
    b.add_argument("--input", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--id-col", default="doc_id")
    b.add_argument("--text-col", default="text")
    b.add_argument("--store-cols", default="lang,url")
    b.add_argument("--num-shards", type=int, default=None)
    b.add_argument("--num-buckets", type=int, default=8)
    b.add_argument("--docs-per-shard", type=int, default=250_000)
    b.add_argument(
        "--doc-id-upper",
        type=int,
        default=None,
        help="reserve doc-id headroom so sync/watch increments keep the shard layout",
    )
    b.add_argument("--no-resume", action="store_true")

    q = sub.add_parser("search", help="BM25 top-k query")
    q.add_argument("--index", required=True)
    q.add_argument("query")
    q.add_argument(
        "--no-daemon",
        action="store_true",
        help="skip the daemon fast path even when a daemon socket is live",
    )
    q.add_argument("--limit", type=int, default=10)
    q.add_argument("--fuzzy", type=int, default=0, help="edit distance 0-3")
    q.add_argument("--regex", action="store_true")
    q.add_argument("--case-sensitive", action="store_true")
    q.add_argument(
        "--case-insensitive",
        dest="case_sensitive",
        action="store_false",
        help="inverse flag (reference CLI naming); the default is already insensitive",
    )
    # search-mode selection (reference CLI: --fts / --semantic flags rather
    # than a --search-mode enum; --hybrid per the REST surface)
    q.add_argument("--fts", action="store_true", help="lexical mode (default)")
    q.add_argument("--semantic", action="store_true", help="vector mode (needs --vector-store)")
    q.add_argument("--hybrid", action="store_true", help="RRF of both legs (needs --vector-store)")
    q.add_argument("--vector-store", default=None, help="IVF vector store dir")
    q.add_argument("--min-score", type=float, default=None)
    q.add_argument("--accuracy", default=None, choices=["fast", "balanced", "high"])
    q.add_argument("--lang-col", default="lang", help="stored language column name")
    q.add_argument("--url-col", default="url", help="stored path/url column name")
    q.add_argument("--languages", default=None, help="comma list")
    q.add_argument("--exclude-languages", default=None)
    q.add_argument("--path-filters", default=None)
    q.add_argument("--exclude-paths", default=None)
    q.add_argument("--snippet-lines", type=int, default=5)

    m = sub.add_parser("merge", help="merge a delta index into a base index")
    m.add_argument("--base", required=True)
    m.add_argument("--delta", required=True)
    m.add_argument("--out", required=True)

    sy = sub.add_parser(
        "sync",
        help="sync an index with a new corpus snapshot: change analysis + "
        "reindexing decision engine, then full rebuild or incremental merge",
    )
    sy.add_argument("--base", required=True, help="existing index directory")
    sy.add_argument("--snapshot", required=True, help="new corpus parquet path/dir")
    sy.add_argument("--out", required=True, help="output index directory")
    sy.add_argument("--url-col", default="url")
    sy.add_argument("--ts-col", default=None, help="keep-latest column for versioned snapshots")
    sy.add_argument("--force-full", action="store_true", help="user-requested full reindex")
    sy.add_argument("--accuracy", type=float, default=1.0, help="measured search accuracy signal")
    sy.add_argument("--dry-run", action="store_true", help="analyze + decide only")

    it = sub.add_parser(
        "ingest-dir",
        help="walk a source tree into the engine's parquet corpus layout "
        "(reference file_finder semantics: allow-list, excludes, gitignore, "
        "overrides, max size, binary sniff)",
    )
    it.add_argument("root", help="directory tree to ingest")
    it.add_argument("--out", required=True, help="output parquet corpus dir")
    it.add_argument("--extensions", default=None,
                    help="comma list replacing the default allow-list")
    it.add_argument("--add-extensions", default=None)
    it.add_argument("--remove-extensions", default=None)
    it.add_argument("--exclude-dirs", default=None,
                    help="comma list replacing the default exclude dirs")
    it.add_argument("--add-exclude-dirs", default=None)
    it.add_argument("--force-include", default=None, help="comma list of gitwildmatch patterns")
    it.add_argument("--force-exclude", default=None)
    it.add_argument("--max-file-size", type=int, default=1_048_576)
    it.add_argument("--no-gitignore", action="store_true")
    it.add_argument("--concurrency", type=int, default=4)
    it.add_argument(
        "--id-map", default=None,
        help="sidecar parquet keeping url->doc_id stable across re-ingests "
        "(required for incremental sync over a mutating tree)",
    )

    g = sub.add_parser("gen-corpus", help="write the deterministic synthetic pages corpus")
    g.add_argument("--out", required=True)
    g.add_argument("--n-docs", type=int, required=True)
    g.add_argument("--seed", type=int, default=42)

    w = sub.add_parser(
        "watch", help="incremental watch loop: delta build + merge per tick"
    )
    w.add_argument("--input", required=True, help="directory of Parquet shards")
    w.add_argument("--index-root", required=True)
    w.add_argument("--interval", type=float, default=5.0)
    w.add_argument("--max-ticks", type=int, default=None)
    w.add_argument("--store-cols", default="lang,url")
    w.add_argument("--compact-every", type=int, default=8)

    c = sub.add_parser("compact", help="coalesce doc-store small files (atomic swap)")
    c.add_argument("--index", required=True)
    c.add_argument("--target-bytes", type=int, default=256 * 1024 * 1024)

    kv = sub.add_parser("kvstore", help="derive the SSTable-style KV doc store (fast point reads)")
    kv.add_argument("index")
    kv.add_argument("--block-docs", type=int, default=16)

    sv = sub.add_parser(
        "serve-http",
        help="HTTP JSON API over a warm index (reference server/app.py analog)",
    )
    sv.add_argument("--index", required=True)
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8765)
    sv.add_argument("--remote", action="store_true", help="shard work in Ray actors")
    sv.add_argument("--shard-group-size", type=int, default=1)
    sv.add_argument("--api-key", default=None)
    sv.add_argument(
        "--pool-size", type=int, default=1,
        help="searcher replicas per process (N overlapping searches)",
    )
    sv.add_argument(
        "--metrics", action="store_true",
        help="expose GET /metrics (Prometheus text): request counters/latency "
        "histograms, job-state gauges, system gauges",
    )
    sv.add_argument(
        "--jobs",
        action="store_true",
        help="enable POST /index background builds publishing generations under --index",
    )
    sv.add_argument(
        "--scip-store",
        default=None,
        help="symbol store dir enabling the /scip/* code-intelligence routes",
    )
    sv.add_argument(
        "--temporal-index",
        default=None,
        help="temporal index root enabling the /temporal/* routes",
    )
    sv.add_argument(
        "--vector-store",
        default=None,
        help="IVF vector store dir enabling search_mode=semantic|hybrid",
    )
    sv.add_argument("--lang-col", default="lang", help="stored language column name")
    sv.add_argument("--url-col", default="url", help="stored path/url column name")
    sv.add_argument(
        "--auth-dir",
        default=None,
        help="enable JWT auth: user store + signing secret live here"
        " (X-API-Key is ignored when set)",
    )
    sv.add_argument(
        "--payload-cache",
        default=None,
        help="dir (or .sqlite path) enabling /mget?truncate=true previews"
        " and /payload paged retrieval",
    )
    sv.add_argument(
        "--repo-name",
        default=None,
        help="registry alias of this index: with --auth-dir, searcher routes"
        " enforce group repo-visibility (admins exempt)",
    )
    sv.add_argument(
        "--update-feed",
        default=None,
        help="release dir whose VERSION file is polled; 'update available'"
        " rides /health (reference server/auto_update analog)",
    )
    sv.add_argument(
        "--installed-version", default="0.0.0",
        help="version this deployment runs (compared against --update-feed)",
    )
    sv.add_argument(
        "--update-interval", type=float, default=300.0,
        help="seconds between release-feed polls",
    )

    us = sub.add_parser(
        "users", help="user store management for --auth-dir servers"
    )
    ussub = us.add_subparsers(dest="users_cmd", required=True)
    usc = ussub.add_parser("create", help="create a user (reads password from stdin)")
    usc.add_argument("--auth-dir", required=True)
    usc.add_argument("--username", required=True)
    usc.add_argument("--role", default="normal_user",
                     choices=["admin", "power_user", "normal_user"])
    usc.add_argument("--password", default=None,
                     help="password (omit to read from stdin)")
    usl = ussub.add_parser("list", help="list users")
    usl.add_argument("--auth-dir", required=True)
    usr = ussub.add_parser("set-role", help="change a user's role")
    usr.add_argument("--auth-dir", required=True)
    usr.add_argument("--username", required=True)
    usr.add_argument("--role", required=True,
                     choices=["admin", "power_user", "normal_user"])
    usd = ussub.add_parser("delete", help="delete a user")
    usd.add_argument("--auth-dir", required=True)
    usd.add_argument("--username", required=True)
    usp = ussub.add_parser("passwd", help="admin password reset")
    usp.add_argument("--auth-dir", required=True)
    usp.add_argument("--username", required=True)
    usp.add_argument("--password", default=None,
                     help="new password (omit to read from stdin)")

    mc = sub.add_parser(
        "serve-mcp",
        help="MCP JSON-RPC server on stdio (reference server/mcp analog)",
    )
    mc.add_argument("--index", required=True)
    mc.add_argument("--remote", action="store_true", help="shard work in Ray actors")
    mc.add_argument("--shard-group-size", type=int, default=1)
    mc.add_argument(
        "--jobs",
        action="store_true",
        help="expose sync_repository/get_job_status tools (background builds)",
    )
    mc.add_argument(
        "--scip-store",
        default=None,
        help="symbol store dir exposing the code-intelligence tools",
    )
    mc.add_argument(
        "--temporal-index",
        default=None,
        help="temporal index root exposing temporal_search/get_file_at tools",
    )
    mc.add_argument(
        "--vector-store",
        default=None,
        help="IVF vector store dir enabling search_mode=semantic|hybrid",
    )
    mc.add_argument("--lang-col", default="lang", help="stored language column name")
    mc.add_argument("--url-col", default="url", help="stored path/url column name")

    vf = sub.add_parser(
        "verify", help="index integrity check (manifest/partitions/docstore; --deep decodes postings)"
    )
    vf.add_argument("--index", required=True)
    vf.add_argument("--deep", action="store_true", help="decode segments and check posting invariants")
    vf.add_argument("--deep-sample", type=int, default=None,
                    help="deep-check only every Nth partition")

    va = sub.add_parser(
        "validate",
        help="tree-vs-index validation (completeness/quality/consistency) "
        "with optional auto-recovery through the sync tier",
    )
    va.add_argument("--tree", required=True, help="source checkout root")
    va.add_argument("--index", required=True)
    va.add_argument("--recover", action="store_true",
                    help="on failure: re-ingest (stable ids) + sync into --out")
    va.add_argument("--out", default=None, help="recovery output index dir")
    va.add_argument("--id-map", default=None)

    dr = sub.add_parser(
        "doctor",
        help="detect (and with --fix repair) stale manifests, dangling current "
        "pointers, orphaned generations/segments, crashed-build debris, stale "
        "build locks (reference services/config_fixer.py analog)",
    )
    dr.add_argument("--index", required=True, help="index root (generations or single index)")
    dr.add_argument("--fix", action="store_true", help="apply the safe repairs")
    dr.add_argument("--prune-generations", action="store_true",
                    help="with --fix: DELETE superseded/abandoned generation dirs")
    dr.add_argument("--deep", action="store_true", help="deep-verify segment decode")
    dr.add_argument("--stale-lock-after", type=float, default=300.0)

    st = sub.add_parser("stats", help="print manifest + per-partition metrics")
    st.add_argument(
        "--progress", action="store_true",
        help="report build progress instead (derived from the build plan, "
        "partition manifests and the heartbeated lock — works mid-build)",
    )
    st.add_argument("--index", required=True)

    sg = sub.add_parser("suggest", help="spell suggestion / prefix completion")
    sg.add_argument("--index", required=True)
    sg.add_argument("word")
    sg.add_argument("--prefix", action="store_true", help="df-ranked completion instead")
    sg.add_argument("--limit", type=int, default=10)

    # temporal group (reference temporal CLI surface: time-bucketed index
    # over a change table, date-range search, as-of file reconstruction)
    tp = sub.add_parser("temporal", help="time-bucketed commit-history index")
    tpsub = tp.add_subparsers(dest="temporal_cmd", required=True)
    tb = tpsub.add_parser("build", help="build the bucketed index from change rows")
    tb.add_argument("--changes", required=True, help="change-row parquet (change_rows schema)")
    tb.add_argument("--out", required=True)
    tb.add_argument("--bucket-days", type=int, default=4)
    tb.add_argument("--num-buckets", type=int, default=None)
    tb.add_argument("--target-docs-per-shard", type=int, default=None)
    tb.add_argument("--window-concurrency", type=int, default=1)
    tb.add_argument(
        "--index-messages", action="store_true",
        help="also index commit messages (enables --chunk-type filtering)",
    )
    tps = tpsub.add_parser(
        "pathstore", help="build the path-history sidecar (point-read file-at/history)"
    )
    tps.add_argument("--index", required=True)
    tps.add_argument("--num-parts", type=int, default=16)
    tq = tpsub.add_parser("search", help="date-range BM25 over the change docs")
    tq.add_argument("--index", required=True)
    tq.add_argument("query")
    tq.add_argument("--start-day", required=True, help="YYYY-MM-DD")
    tq.add_argument("--end-day", required=True)
    tq.add_argument("--diff-types", default=None, help="comma list (added,modified,deleted)")
    tq.add_argument("--author", default=None)
    tq.add_argument("--limit", type=int, default=10)
    tq.add_argument(
        "--chunk-type", default=None, choices=["commit_message", "commit_diff"],
        help="filter message vs diff docs (message-indexed roots)",
    )
    tq.add_argument("--show-evolution", action="store_true")
    tq.add_argument("--evolution-limit", type=int, default=None)
    tf = tpsub.add_parser("file-at", help="content of PATH as of end-of-DAY")
    tf.add_argument("--index", required=True)
    tf.add_argument("path")
    tf.add_argument("day")
    tf.add_argument("--include-removed", action="store_true")
    tac = tpsub.add_parser("at-commit", help="content of PATH as of CHANGE_ID")
    tac.add_argument("--index", required=True)
    tac.add_argument("path")
    tac.add_argument("change_id", type=int)
    tac.add_argument("--include-removed", action="store_true")
    th = tpsub.add_parser("history", help="full change timeline of PATH")
    th.add_argument("--index", required=True)
    th.add_argument("path")
    tw = tpsub.add_parser(
        "watch", help="poll an append-only change feed; append new batches per tick"
    )
    tw.add_argument("--feed", required=True)
    tw.add_argument("--index", required=True)
    tw.add_argument("--bucket-days", type=int, default=4)
    tw.add_argument("--num-buckets", type=int, default=None)
    tw.add_argument("--interval", type=float, default=5.0)
    tw.add_argument("--max-ticks", type=int, default=None)

    # SCIP-analog code-intelligence group (reference cli_scip.py: generate /
    # status / definition / references / dependencies / dependents / impact /
    # callchain / context)
    sc = sub.add_parser("scip", help="symbol store + call-graph queries")
    scsub = sc.add_subparsers(dest="scip_cmd", required=True)
    g = scsub.add_parser("generate", help="build the persisted symbol store")
    g.add_argument("--input", required=True, help="docs parquet (doc_id, text)")
    g.add_argument("--out", required=True)
    g.add_argument("--num-parts", type=int, default=16)
    g.add_argument("--id-col", default="doc_id")
    g.add_argument("--text-col", default="text")
    g.add_argument(
        "--python-ast", action="store_true",
        help="AST-accurate Python extraction (qualified nested defs, "
        "alias-resolved callees) instead of the regex anchors",
    )
    scsub.add_parser("status", help="store manifest summary").add_argument(
        "--store", required=True
    )
    scsub.add_parser("verify", help="store integrity check").add_argument(
        "--store", required=True
    )
    for name, hlp in [
        ("definition", "definition sites of SYMBOL"),
        ("references", "call sites of SYMBOL"),
        ("dependencies", "symbols SYMBOL calls"),
        ("dependents", "symbols calling SYMBOL"),
        ("context", "definition + references + direct graph neighborhood"),
    ]:
        c = scsub.add_parser(name, help=hlp)
        c.add_argument("--store", required=True)
        c.add_argument("symbol")
    ip = scsub.add_parser("impact", help="transitive dependents BFS")
    ip.add_argument("--store", required=True)
    ip.add_argument("symbol")
    ip.add_argument("--depth", type=int, default=3)
    cc = scsub.add_parser("callchain", help="simple call chains FROM -> ... -> TO")
    cc.add_argument("--store", required=True)
    cc.add_argument("from_symbol")
    cc.add_argument("to_symbol")
    cc.add_argument("--depth", type=int, default=3)
    cc.add_argument("--max-chains", type=int, default=None)

    sm = scsub.add_parser(
        "multi",
        help="fan one SCIP query across repos (reference scip_multi_service)",
    )
    sm.add_argument("op", choices=["definition", "references", "dependencies",
                                   "dependents", "callchain"])
    sm.add_argument("--stores", required=True,
                    help="comma list of name=store_root pairs")
    sm.add_argument("--symbol", default=None)
    sm.add_argument("--from-symbol", default=None)
    sm.add_argument("--to-symbol", default=None)
    sm.add_argument("--limit", type=int, default=None)
    sm.add_argument("--depth", type=int, default=None)
    sm.add_argument("--timeout", type=float, default=30.0)

    px = sub.add_parser("proxy", help="multi-repo proxy root (reference proxy mode)")
    pxsub = px.add_subparsers(dest="proxy_cmd", required=True)
    pxi = pxsub.add_parser("init", help="create proxy config, discovering index dirs")
    pxi.add_argument("--root", required=True)
    pxi.add_argument("--force", action="store_true", help="overwrite an existing config")
    pxr = pxsub.add_parser("refresh", help="re-run repository discovery")
    pxr.add_argument("--root", required=True)
    pxa = pxsub.add_parser("add", help="register one repo (root-relative path)")
    pxa.add_argument("--root", required=True)
    pxa.add_argument("repo")
    pxd = pxsub.add_parser("remove", help="unregister one repo")
    pxd.add_argument("--root", required=True)
    pxd.add_argument("repo")
    pxt = pxsub.add_parser("status", help="per-repo manifest stats")
    pxt.add_argument("--root", required=True)
    pxq = pxsub.add_parser(
        "search", help="fan-out BM25 across repos, score-interleaved global top-k"
    )
    pxq.add_argument("--root", required=True)
    pxq.add_argument("query")
    pxq.add_argument("--limit", type=int, default=10)
    pxq.add_argument("--min-score", type=float, default=None)
    pxq.add_argument("--snippet-lines", type=int, default=0)
    pxq.add_argument("--lang-col", default=None)
    pxq.add_argument("--url-col", default=None)

    cl = sub.add_parser(
        "cleanup-service",
        help="privileged path-reaper sidecar (reference docker/cleanup.sh):"
        " POST /cleanup removes paths realpath-contained in --root",
    )
    cl.add_argument("--root", action="append", required=True,
                    help="allowed root (repeatable)")
    cl.add_argument("--host", default="127.0.0.1")
    cl.add_argument("--port", type=int, default=8091)

    mb = sub.add_parser(
        "mcpb",
        help="MCP stdio bridge to a remote server's /mcp endpoint"
        " (reference mcpb bundle analog)",
    )
    mb.add_argument("--server", default=None, help="http(s)://host:port")
    mb.add_argument("--root", default=None,
                    help="use this root's remote config for server/api-key")
    mb.add_argument("--api-key", default=None)
    mb.add_argument("--username", default=None)
    mb.add_argument("--password-env", default="CIDX_PASSWORD",
                    help="env var holding the password for --username auto-login")

    rm = sub.add_parser("remote", help="remote mode: queries execute on a CIDX HTTP server")
    rmsub = rm.add_subparsers(dest="remote_cmd", required=True)
    rmi = rmsub.add_parser("init", help="link this root to a server")
    rmi.add_argument("--root", required=True)
    rmi.add_argument("--server", required=True, help="http(s)://host:port")
    rmi.add_argument("--api-key", default=None)
    rmi.add_argument("--force", action="store_true")
    rms = rmsub.add_parser("status", help="server health + index stats")
    rms.add_argument("--root", required=True)
    rmh = rmsub.add_parser(
        "health",
        help="tiered health check: connectivity -> auth -> repository access"
        " (reference remote/health_checker.py)",
    )
    rmh.add_argument("--root", required=True)
    rmh.add_argument("--timeout", type=float, default=10.0)
    rmu = rmsub.add_parser(
        "uninstall",
        help="unlink from the server: remove remote config + credential side"
        " files only, preserve all project files (reference remote_uninstall.py)",
    )
    rmu.add_argument("--root", required=True)
    rmu.add_argument("--dry-run", action="store_true", help="preview removals")
    rmq = rmsub.add_parser("query", help="run a query on the linked server")
    rmq.add_argument("--root", required=True)
    rmq.add_argument("query")
    rmq.add_argument("--limit", type=int, default=10)
    rmq.add_argument("--language", default=None)
    rmq.add_argument("--min-score", type=float, default=None)
    rmq.add_argument("--snippet-lines", type=int, default=0)

    # global repository registry (reference global_repos/: golden repos
    # behind alias pointer files, rebuild-and-swap refresh, refcount GC)
    rp = sub.add_parser("repos", help="global repository registry (golden repos)")
    rpsub = rp.add_subparsers(dest="repos_cmd", required=True)
    rpr = rpsub.add_parser("register", help="register an existing index dir")
    rpr.add_argument("--root", required=True, help="registry root dir")
    rpr.add_argument("--alias", required=True, help="alias (must end in -global)")
    rpr.add_argument("--index", required=True, help="index root to register")
    rpr.add_argument("--repo-name", default=None)
    rpr.add_argument("--repo-url", default=None)
    rpu = rpsub.add_parser("unregister", help="remove an alias")
    rpu.add_argument("--root", required=True)
    rpu.add_argument("--alias", required=True)
    rpl = rpsub.add_parser("list", help="registered repos + live targets")
    rpl.add_argument("--root", required=True)
    rpf = rpsub.add_parser(
        "refresh", help="rebuild into a fresh generation and swap the alias"
    )
    rpf.add_argument("--root", required=True)
    rpf.add_argument("--alias", required=True)
    rpf.add_argument("--input", required=True, help="parquet corpus to index")
    rpf.add_argument("--id-col", default="doc_id")
    rpf.add_argument("--text-col", default="text")
    rpf.add_argument("--num-shards", type=int, default=4)
    rpf.add_argument("--store-cols", default="lang,url")
    rpg = rpsub.add_parser("gc", help="delete drained retired generations")
    rpg.add_argument("--root", required=True)
    rpt = rpsub.add_parser(
        "tree", help="directory tree over an alias's stored paths"
    )
    rpt.add_argument("--root", required=True)
    rpt.add_argument("--alias", required=True)
    rpt.add_argument("--subdir", default=None)
    rpt.add_argument("--depth", type=int, default=3)
    rpt.add_argument("--cap", type=int, default=50, help="max files shown per dir")
    rpt.add_argument("--include", action="append", default=[])
    rpt.add_argument("--exclude", action="append", default=[])
    rpt.add_argument("--show-stats", action="store_true")
    rpt.add_argument("--url-col", default="url")
    rpdm = rpsub.add_parser(
        "describe",
        help="static repo analysis -> cidx-meta description markdown "
        "(reference repo_analyzer + description_generator)",
    )
    rpdm.add_argument("--tree", required=True, help="checkout to analyze")
    rpdm.add_argument("--meta-dir", required=True, help="description corpus dir")
    rpdm.add_argument("--name", default=None)
    rpdm.add_argument("--url", default="")
    rpq = rpsub.add_parser("search", help="query one alias's current index")
    rpq.add_argument("--root", required=True)
    rpq.add_argument("--alias", required=True)
    rpq.add_argument("query")
    rpq.add_argument("--limit", type=int, default=10)
    rpq.add_argument("--language", default=None)
    rpo = rpsub.add_parser(
        "omni", help="pattern-selected cross-repo search (reference server/omni)"
    )
    rpo.add_argument("--root", required=True)
    rpo.add_argument("query")
    rpo.add_argument(
        "--patterns", required=True,
        help="comma-separated alias patterns (exact, gitwildmatch, or regex)",
    )
    rpo.add_argument("--limit", type=int, default=10)
    rpo.add_argument("--mode", default="global", choices=["global", "per_repo"])
    rpa = rpsub.add_parser(
        "activate", help="per-user activation of a golden repo (branch-scoped)"
    )
    rpa.add_argument("--root", required=True)
    rpa.add_argument("--user", required=True)
    rpa.add_argument("--alias", required=True, help="golden alias to activate")
    rpa.add_argument("--as", dest="user_alias", default=None)
    rpa.add_argument("--branch", default=None)
    rpd = rpsub.add_parser("deactivate", help="drop a user activation")
    rpd.add_argument("--root", required=True)
    rpd.add_argument("--user", required=True)
    rpd.add_argument("--alias", required=True, help="user alias")
    rpb = rpsub.add_parser("switch-branch", help="switch an activation's branch")
    rpb.add_argument("--root", required=True)
    rpb.add_argument("--user", required=True)
    rpb.add_argument("--alias", required=True)
    rpb.add_argument("branch")
    rpb.add_argument("-c", "--create", action="store_true")
    rpy = rpsub.add_parser("my", help="list one user's activations")
    rpy.add_argument("--root", required=True)
    rpy.add_argument("--user", required=True)
    rpqa = rpsub.add_parser("qsearch", help="search through a user activation")
    rpqa.add_argument("--root", required=True)
    rpqa.add_argument("--user", required=True)
    rpqa.add_argument("--alias", required=True)
    rpqa.add_argument("query")
    rpqa.add_argument("--limit", type=int, default=10)

    gr = sub.add_parser(
        "grep", help="index-bypassing regex line scan over a parquet corpus"
    )
    gr.add_argument("pattern")
    gr.add_argument("--input", required=True, help="parquet file/dir of documents")
    gr.add_argument("--id-col", default="doc_id")
    gr.add_argument("--text-col", default="text")
    gr.add_argument("--max-matches", type=int, default=1000)
    gr.add_argument("--context", type=int, choices=(0, 1), default=1)

    # local daemon mode (reference daemon/service.py + cli_daemon_fast.py):
    # persistent unix-socket process with warm searchers; `search` delegates
    # transparently when the socket is live
    dm = sub.add_parser("daemon", help="local unix-socket daemon (warm repeated queries)")
    dmsub = dm.add_subparsers(dest="daemon_cmd", required=True)
    dserve = dmsub.add_parser("serve", help="serve in the foreground (start spawns this)")
    dserve.add_argument("--index", required=True)
    dserve.add_argument("--socket", default=None)
    dserve.add_argument("--pool-size", type=int, default=2)
    dserve.add_argument("--lang-col", default="lang")
    dserve.add_argument("--url-col", default="url")
    dstart = dmsub.add_parser("start", help="spawn a background daemon for an index")
    dstart.add_argument("--index", required=True)
    dstart.add_argument("--socket", default=None)
    dstart.add_argument("--pool-size", type=int, default=2)
    dstart.add_argument("--timeout", type=float, default=30.0)
    for name, hlp in (("stop", "shut the daemon down"), ("status", "ping + stats")):
        dx = dmsub.add_parser(name, help=hlp)
        dx.add_argument("--index", required=True)
        dx.add_argument("--socket", default=None)

    # teach-ai (reference cli.py:5928): install AI-assistant instructions +
    # skills describing this CLI.  Pure file IO — a Ray-free fast path.
    ta = sub.add_parser(
        "teach-ai", help="install AI-platform instructions (CLAUDE.md etc.)"
    )
    for pl in ("claude", "codex", "gemini", "opencode", "q", "junie"):
        ta.add_argument(
            f"--{pl}",
            dest=f"platform_{pl}",
            action="store_true",
            help=f"generate instructions for the {pl} platform",
        )
    ta.add_argument(
        "--project",
        dest="scope_project",
        action="store_true",
        help="install in the project root (./CLAUDE.md)",
    )
    ta.add_argument(
        "--global",
        dest="scope_global",
        action="store_true",
        help="install globally (~/.claude/CLAUDE.md)",
    )
    ta.add_argument(
        "--show-only",
        action="store_true",
        help="preview instruction content without writing files",
    )
    ta.add_argument(
        "--skills-only",
        action="store_true",
        help="install only skills to ~/.claude/skills/cidx-ray/",
    )

    # curation operator family — the LLM-training-data ops as deployable
    # commands (each streams parquet in -> partitioned parquet out)
    cu = sub.add_parser(
        "curate", help="training-data curation ops (dedup / sampling) over parquet"
    )
    cusub = cu.add_subparsers(dest="curate_cmd", required=True)

    def _cu_io(sp, needs_out=True):
        sp.add_argument("--input", required=True, help="parquet file/dir of documents")
        if needs_out:
            sp.add_argument("--out", required=True, help="output parquet directory")
            sp.add_argument(
                "--overwrite", action="store_true",
                help="replace a non-empty output dir (refused otherwise)",
            )
        sp.add_argument("--id-col", default="doc_id")
        sp.add_argument("--text-col", default="text")

    cue = cusub.add_parser("exact", help="exact dedup (content-hash keep-first)")
    _cu_io(cue)
    cun = cusub.add_parser(
        "near-pairs", help="MinHash+LSH candidate pairs (doc_a, doc_b)"
    )
    _cu_io(cun)
    cun.add_argument(
        "--verify-tau", type=float, default=None, metavar="TAU",
        help="also verify candidates by exact shingle-Jaccard >= TAU "
             "(data-plane join; output gains a jaccard_r column)",
    )
    cus = cusub.add_parser(
        "substring", help="duplicated-span dedup (Lee et al. 2022)"
    )
    _cu_io(cus)
    cus.add_argument("--window", type=int, default=8, help="tokens per window")
    cus.add_argument(
        "--winnow", type=int, default=4,
        help="winnowing k (anchor sampling; 0 = every window)",
    )
    cus.add_argument(
        "--emit", choices=("spans", "clean"), default="spans",
        help="spans = removal spans; clean = cleaned text",
    )
    cus.add_argument("--partitions", type=int, default=64)
    cud = cusub.add_parser(
        "semdedup", help="semantic cluster-then-prune dedup (SemDeDup)"
    )
    cud.add_argument("--input", required=True, help="parquet with (vec_id, embedding)")
    cud.add_argument("--out", required=True)
    cud.add_argument(
        "--overwrite", action="store_true",
        help="replace a non-empty output dir (refused otherwise)",
    )
    cud.add_argument("--k", type=int, default=64, help="k-means clusters")
    cud.add_argument("--iters", type=int, default=2)
    cud.add_argument("--tau", type=float, default=0.95)
    cud.add_argument(
        "--d4-keep", default=None, metavar="NUM/DEN",
        help="also apply D4: keep this fraction farthest from each centroid",
    )
    cum = cusub.add_parser(
        "mixture", help="target-mixture sampling (largest slice matching weights)"
    )
    _cu_io(cum)
    cum.add_argument("--domain-col", default="lang")
    cum.add_argument(
        "--weights", required=True,
        help="comma list domain=weight, e.g. en=0.5,fr=0.3,de=0.2",
    )

    # unified mode-adaptive status (reference `cidx status`): detects
    # index/proxy/remote/uninitialized from --root and reports accordingly
    stu = sub.add_parser(
        "status", help="mode-adaptive status (index / proxy / remote / uninitialized)"
    )
    stu.add_argument("--root", default=".", help="path to detect the mode from")
    stu.add_argument("--timeout", type=float, default=5.0, help="remote-mode probe timeout")

    args = p.parse_args(argv)

    # ---- Ray-free fast paths (must not pay ray.init) ----
    if args.cmd == "status":
        return _status_cmd(args)
    if args.cmd == "teach-ai":
        return _teach_ai_cmd(args)
    if args.cmd == "daemon":
        return _daemon_cmd(args)
    if args.cmd == "search" and not args.no_daemon:
        rc = _daemon_search_fast_path(args)
        if rc is not None:
            return rc

    _ray_init(args.num_cpus)
    try:
        if args.cmd == "build":
            from .index.build import build_index
            from .index.buildlock import BuildLock

            # one build per index root at a time (reference indexing_lock)
            with BuildLock(args.out):
                mf = build_index(
                    args.input,
                    args.out,
                    id_col=args.id_col,
                    text_col=args.text_col,
                    store_cols=tuple(c for c in args.store_cols.split(",") if c),
                    num_shards=args.num_shards,
                    num_buckets=args.num_buckets,
                    target_docs_per_shard=args.docs_per_shard,
                    doc_id_upper=args.doc_id_upper,
                    resume=not args.no_resume,
                )
            print(
                json.dumps(
                    {
                        "num_docs": mf.num_docs,
                        "total_tokens": mf.total_tokens,
                        "num_shards": mf.num_shards,
                        "partitions": mf.n_partitions,
                        "out": args.out,
                    }
                )
            )
        elif args.cmd == "search":
            from .query.engine import IndexSearcher
            from .query.proxy import ProxySearcher, detect_mode

            split = lambda v: v.split(",") if v else None  # noqa: E731
            mode = detect_mode(args.index)
            if mode == "remote":
                # transparent remote execution (reference remote mode:
                # identical query syntax, results come from the server)
                from .query.remote import RemoteClient

                def one(v, name):
                    vs = split(v)
                    if vs and len(vs) > 1:
                        raise ValueError(f"remote mode accepts one {name}")
                    return vs[0] if vs else None

                rc = RemoteClient(args.index)
                hits = rc.search(
                    args.query,
                    limit=args.limit,
                    language=one(args.languages, "language"),
                    exclude_language=one(args.exclude_languages, "exclude-language"),
                    path_filter=one(args.path_filters, "path-filter"),
                    exclude_path=one(args.exclude_paths, "exclude-path"),
                    edit_distance=args.fuzzy or None,
                    regex="true" if args.regex else None,
                    case_sensitive="true" if args.case_sensitive else None,
                    min_score=args.min_score,
                    accuracy=args.accuracy,
                    snippet_lines=args.snippet_lines,
                    search_mode="hybrid" if args.hybrid
                    else ("semantic" if args.semantic else "fts"),
                )
                for r in hits:
                    print(json.dumps(r))
                return 0
            if mode == "proxy":
                # transparent proxy routing (reference mode_detection: the
                # same command fans out when pointed at a proxy root)
                if args.semantic or args.hybrid:
                    raise ValueError("vector search modes are not supported in proxy mode")
                ps = ProxySearcher(args.index, lang_col=args.lang_col, url_col=args.url_col)
                hits, perr = ps.search(
                    args.query,
                    case_sensitive=args.case_sensitive,
                    edit_distance=args.fuzzy,
                    use_regex=args.regex,
                    limit=args.limit,
                    min_score=args.min_score,
                    languages=split(args.languages),
                    exclude_languages=split(args.exclude_languages),
                    path_filters=split(args.path_filters),
                    exclude_paths=split(args.exclude_paths),
                    snippet_lines=args.snippet_lines,
                )
                for r in hits:
                    print(json.dumps(r))
                if perr:
                    print(json.dumps({"errors": perr}), file=sys.stderr)
                return 0
            s = IndexSearcher(args.index, lang_col=args.lang_col, url_col=args.url_col)
            from .query.filtercheck import check_filters

            for w in check_filters(
                include_languages=split(args.languages),
                exclude_languages=split(args.exclude_languages),
                include_paths=split(args.path_filters),
                exclude_paths=split(args.exclude_paths),
            ):
                print(f"warning: {w.message}", file=sys.stderr)
            if args.semantic and args.hybrid:
                raise ValueError("pass at most one of --semantic / --hybrid")
            mode = "semantic" if args.semantic else "hybrid" if args.hybrid else "fts"
            if mode != "fts":
                # vector modes go through the SAME surface the daemons serve
                # (rest_search), so CLI/REST/MCP validation rules agree
                from .query.semantic import SemanticTier
                from .server.http import rest_search

                if not args.vector_store:
                    raise ValueError(f"--{mode} requires --vector-store")

                def one(v, name):
                    vals = split(v)
                    if vals and len(vals) > 1:
                        raise ValueError(f"--{name} takes one value with --{mode}")
                    return vals[0] if vals else None

                params = {
                    "search_mode": mode,
                    "limit": args.limit,
                    "snippet_lines": args.snippet_lines,
                    "language": one(args.languages, "languages"),
                    "exclude_language": one(args.exclude_languages, "exclude-languages"),
                    "path_filter": one(args.path_filters, "path-filters"),
                    "exclude_path": one(args.exclude_paths, "exclude-paths"),
                }
                if args.min_score is not None:
                    params["min_score"] = args.min_score
                if args.accuracy is not None:
                    params["accuracy"] = args.accuracy
                if mode == "hybrid":
                    if args.fuzzy:
                        params["edit_distance"] = args.fuzzy
                    if args.case_sensitive:
                        params["case_sensitive"] = True
                res = rest_search(
                    s, args.query, params, semantic=SemanticTier(args.vector_store)
                )
            else:
                fetch = args.limit
                if args.min_score is not None and args.limit > 0:
                    fetch = args.limit * 3  # O1 over-fetch for the post-filter
                res = s.search(
                    args.query,
                    case_sensitive=args.case_sensitive,
                    edit_distance=args.fuzzy,
                    use_regex=args.regex,
                    limit=fetch,
                    languages=split(args.languages),
                    exclude_languages=split(args.exclude_languages),
                    path_filters=split(args.path_filters),
                    exclude_paths=split(args.exclude_paths),
                    snippet_lines=args.snippet_lines,
                )
                if args.min_score is not None:
                    res = [r for r in res if r["score"] >= args.min_score]
                    if args.limit > 0:
                        res = res[: args.limit]
            for r in res:
                print(json.dumps(r))
        elif args.cmd == "merge":
            from .index.merge import merge_indexes

            mf = merge_indexes(args.base, args.delta, args.out)
            print(json.dumps({"num_docs": mf.num_docs, "out": args.out}))
        elif args.cmd == "sync":
            from .index.buildlock import BuildLock
            from .pipelines.sync import sync_repository

            if args.dry_run:
                report = sync_repository(
                    args.base,
                    args.snapshot,
                    args.out,
                    url_col=args.url_col,
                    ts_col=args.ts_col,
                    force_full=args.force_full,
                    search_accuracy=args.accuracy,
                    execute=False,
                )
            else:
                with BuildLock(args.out):
                    report = sync_repository(
                        args.base,
                        args.snapshot,
                        args.out,
                        url_col=args.url_col,
                        ts_col=args.ts_col,
                        force_full=args.force_full,
                        search_accuracy=args.accuracy,
                    )
            print(json.dumps(report))
        elif args.cmd == "ingest-dir":
            from .pipelines.tree import DEFAULT_EXCLUDE_DIRS, DEFAULT_EXTENSIONS, TreeConfig, ingest_tree

            spl = lambda v: tuple(x for x in v.split(",") if x) if v else ()  # noqa: E731
            cfg = TreeConfig(
                file_extensions=spl(args.extensions) or DEFAULT_EXTENSIONS,
                exclude_dirs=spl(args.exclude_dirs) or DEFAULT_EXCLUDE_DIRS,
                max_file_size=args.max_file_size,
                respect_gitignore=not args.no_gitignore,
                force_include_patterns=spl(args.force_include),
                force_exclude_patterns=spl(args.force_exclude),
                add_extensions=spl(args.add_extensions),
                remove_extensions=spl(args.remove_extensions),
                add_exclude_dirs=spl(args.add_exclude_dirs),
            )
            ds = ingest_tree(args.root, args.out, config=cfg,
                             concurrency=args.concurrency, id_map=args.id_map)
            print(json.dumps({"out": args.out, "num_files": ds.count()}))
        elif args.cmd == "gen-corpus":
            from .pipelines.corpus import write_corpus

            write_corpus(args.out, args.n_docs, seed=args.seed)
            print(json.dumps({"out": args.out, "n_docs": args.n_docs}))
        elif args.cmd == "watch":
            from .pipelines.watch import WatchDriver

            d = WatchDriver(
                args.input,
                args.index_root,
                store_cols=tuple(c for c in args.store_cols.split(",") if c),
                compact_every=args.compact_every,
            )
            d.run(interval_s=args.interval, max_ticks=args.max_ticks)
            print(json.dumps({"index": d.current_index()}))
        elif args.cmd == "compact":
            from .index.compact import compact_docstore

            print(json.dumps(compact_docstore(args.index, target_bytes=args.target_bytes)))
        elif args.cmd == "kvstore":
            from .index.kvstore import build_kv_docstore

            meta = build_kv_docstore(args.index, block_docs=args.block_docs)
            print(json.dumps({k: meta[k] for k in ("n_blocks", "n_bytes", "block_docs")}))
        elif args.cmd == "serve-http":
            from .server.http import IndexHTTPServer

            srv = IndexHTTPServer(
                args.index,
                host=args.host,
                port=args.port,
                remote=args.remote,
                shard_group_size=args.shard_group_size,
                api_key=args.api_key,
                lang_col=args.lang_col,
                url_col=args.url_col,
                enable_jobs=args.jobs,
                scip_store=args.scip_store,
                temporal_index=args.temporal_index,
                vector_store=args.vector_store,
                auth_dir=args.auth_dir,
                payload_cache=args.payload_cache,
                pool_size=args.pool_size,
                enable_metrics=args.metrics,
                repo_name=args.repo_name,
                auto_update=_make_auto_update(args),
            )
            print(json.dumps({"listening": f"http://{srv.host}:{srv.port}"}), flush=True)
            try:
                srv.serve_forever()
            except KeyboardInterrupt:
                srv.shutdown()
        elif args.cmd == "serve-mcp":
            from .server.mcp import MCPServer

            srv = MCPServer(
                args.index,
                remote=args.remote,
                shard_group_size=args.shard_group_size,
                lang_col=args.lang_col,
                url_col=args.url_col,
                enable_jobs=args.jobs,
                scip_store=args.scip_store,
                temporal_index=args.temporal_index,
                vector_store=args.vector_store,
            )
            try:
                srv.serve_stdio()
            except KeyboardInterrupt:
                pass
            finally:
                srv.close()
        elif args.cmd == "stats":
            from .index.manifest import load_manifest
            from .query.proxy import ProxySearcher, detect_mode

            if args.progress:
                from .index.progress import build_progress

                print(json.dumps(build_progress(args.index)))
                return 0

            if detect_mode(args.index) == "proxy":
                rows, perr = ProxySearcher(args.index).status()
                print(json.dumps({"repos": rows, "errors": perr}))
                return 0
            mf = load_manifest(args.index)
            print(
                json.dumps(
                    {
                        "num_docs": mf.num_docs,
                        "total_tokens": mf.total_tokens,
                        "avgdl": round(mf.avgdl, 4),
                        "num_shards": mf.num_shards,
                        "num_buckets": mf.num_buckets,
                        "partitions": mf.n_partitions,
                        "n_postings": sum(
                            int(pt.get("n_postings", 0))
                            for pt in mf.iter_partitions(args.index)
                        ),
                    }
                )
            )
        elif args.cmd == "suggest":
            from .query.engine import IndexSearcher

            s = IndexSearcher(args.index)
            if args.prefix:
                for r in s.complete(args.word, limit=args.limit):
                    print(json.dumps(r))
            else:
                out = s.suggest(args.word)
                print(json.dumps(out if out is not None else {}))
        elif args.cmd == "temporal":
            if args.temporal_cmd == "build":
                from .temporal import build_temporal_index

                man = build_temporal_index(
                    args.changes,
                    args.out,
                    bucket_days=args.bucket_days,
                    num_buckets=args.num_buckets,
                    target_docs_per_shard=args.target_docs_per_shard,
                    window_concurrency=args.window_concurrency,
                    index_messages=args.index_messages,
                )
                print(
                    json.dumps(
                        {
                            "out": args.out,
                            "windows": len(man["buckets"]),
                            "num_changes": sum(b["num_changes"] for b in man["buckets"]),
                        }
                    )
                )
            elif args.temporal_cmd == "pathstore":
                from .temporal.pathstore import build_path_store

                man = build_path_store(args.index, num_parts=args.num_parts)
                print(
                    json.dumps(
                        {"index": args.index, "num_parts": man["num_parts"],
                         "rows": man["total_rows"]}
                    )
                )
            elif args.temporal_cmd == "watch":
                import os
                import time as _time

                from .temporal.index import TEMPORAL_MANIFEST
                from .temporal.watch import TemporalWatchDriver

                if not os.path.isfile(os.path.join(args.index, TEMPORAL_MANIFEST)):
                    drv = TemporalWatchDriver.initialize(
                        args.feed, args.index,
                        bucket_days=args.bucket_days, num_buckets=args.num_buckets,
                    )
                    print(json.dumps({"bootstrapped": args.index}))
                else:
                    drv = TemporalWatchDriver(args.feed, args.index)
                n = 0
                while args.max_ticks is None or n < args.max_ticks:
                    print(json.dumps(drv.tick()))
                    n += 1
                    if args.max_ticks is None or n < args.max_ticks:
                        _time.sleep(args.interval)
            else:
                from .temporal import TemporalSearcher

                ts = TemporalSearcher(args.index)
                if args.temporal_cmd == "search":
                    rows = ts.query(
                        args.query,
                        start_day=args.start_day,
                        end_day=args.end_day,
                        diff_types=args.diff_types.split(",") if args.diff_types else None,
                        authors=[args.author] if args.author else None,
                        limit=args.limit,
                        chunk_type=args.chunk_type,
                        show_evolution=args.show_evolution,
                        evolution_limit=args.evolution_limit,
                    )
                    for r in rows:
                        print(json.dumps({k: v for k, v in r.items() if k != "text"}))
                elif args.temporal_cmd == "file-at":
                    hit = ts.file_at(args.path, args.day, include_removed=args.include_removed)
                    print(json.dumps(hit if hit is not None else {}))
                elif args.temporal_cmd == "at-commit":
                    hit = ts.file_at_commit(
                        args.path, args.change_id, include_removed=args.include_removed
                    )
                    print(json.dumps(hit if hit is not None else {}))
                elif args.temporal_cmd == "history":
                    for r in ts.history(args.path):
                        print(json.dumps(r))
        elif args.cmd == "scip":
            if args.scip_cmd == "generate":
                import ray.data as rd

                from .scip.store import build_symbol_store

                man = build_symbol_store(
                    rd.read_parquet(args.input, columns=[args.id_col, args.text_col]),
                    args.out,
                    num_parts=args.num_parts,
                    id_col=args.id_col,
                    text_col=args.text_col,
                    extractor="python_ast" if args.python_ast else "regex",
                )
                print(
                    json.dumps(
                        {
                            "out": args.out,
                            "total_rows": man["total_rows"],
                            "total_defs": man["total_defs"],
                            "num_parts": man["num_parts"],
                        }
                    )
                )
            elif args.scip_cmd == "verify":
                from .scip.store import verify_store

                out = verify_store(args.store)
                print(json.dumps(out))
                return 0 if out["valid"] else 1
            elif args.scip_cmd == "multi":
                from .scip.multi import SCIPMultiService

                stores = dict(
                    pair.split("=", 1) for pair in args.stores.split(",") if pair
                )
                svc = SCIPMultiService(stores, query_timeout_seconds=args.timeout)
                try:
                    if args.op == "callchain":
                        if not (args.from_symbol and args.to_symbol):
                            raise ValueError("callchain needs --from-symbol and --to-symbol")
                        out = svc.callchain(
                            list(stores), args.from_symbol, args.to_symbol,
                            max_depth=args.depth,
                        )
                    else:
                        if not args.symbol:
                            raise ValueError(f"{args.op} needs --symbol")
                        out = getattr(svc, args.op)(
                            list(stores), args.symbol,
                            limit=args.limit, max_depth=args.depth,
                        )
                finally:
                    svc.close()
                print(json.dumps(out))
            else:
                from .scip.store import SymbolStore

                s = SymbolStore(args.store)
                if args.scip_cmd == "status":
                    print(
                        json.dumps(
                            {
                                k: s.manifest[k]
                                for k in ("num_parts", "total_rows", "total_defs")
                            }
                        )
                    )
                elif args.scip_cmd == "definition":
                    for r in s.definitions(args.symbol).to_pylist():
                        print(json.dumps(r))
                elif args.scip_cmd == "references":
                    for r in s.references(args.symbol).to_pylist():
                        print(json.dumps(r))
                elif args.scip_cmd == "dependencies":
                    for r in s.dependencies(args.symbol).to_pylist():
                        print(json.dumps(r))
                elif args.scip_cmd == "dependents":
                    for r in s.dependents(args.symbol).to_pylist():
                        print(json.dumps(r))
                elif args.scip_cmd == "impact":
                    for r in s.analyze_impact(args.symbol, max_depth=args.depth).to_pylist():
                        print(json.dumps(r))
                elif args.scip_cmd == "callchain":
                    t = s.trace_call_chain(
                        args.from_symbol,
                        args.to_symbol,
                        max_depth=args.depth,
                        max_chains=args.max_chains,
                    )
                    for r in t.to_pylist():
                        print(json.dumps(r))
                elif args.scip_cmd == "context":
                    print(
                        json.dumps(
                            {
                                "symbol": args.symbol,
                                "definitions": s.definitions(args.symbol).to_pylist(),
                                "references": s.references(args.symbol).to_pylist(),
                                "dependencies": s.dependencies(args.symbol).to_pylist(),
                                "dependents": s.dependents(args.symbol).to_pylist(),
                            }
                        )
                    )
        elif args.cmd == "proxy":
            from .query import proxy as proxymod

            if args.proxy_cmd == "init":
                print(json.dumps(proxymod.init_proxy(args.root, force=args.force)))
            elif args.proxy_cmd == "refresh":
                print(json.dumps(proxymod.refresh_proxy(args.root)))
            elif args.proxy_cmd == "add":
                print(json.dumps(proxymod.add_repo(args.root, args.repo)))
            elif args.proxy_cmd == "remove":
                print(json.dumps(proxymod.remove_repo(args.root, args.repo)))
            elif args.proxy_cmd == "status":
                rows, errors = proxymod.ProxySearcher(args.root).status()
                print(json.dumps({"repos": rows, "errors": errors}))
            elif args.proxy_cmd == "search":
                ps = proxymod.ProxySearcher(
                    args.root, lang_col=args.lang_col, url_col=args.url_col
                )
                hits, errors = ps.search(
                    args.query,
                    limit=args.limit,
                    min_score=args.min_score,
                    snippet_lines=args.snippet_lines,
                )
                for r in hits:
                    print(json.dumps(r))
                if errors:  # per-repo failures to stderr, results still usable
                    print(json.dumps({"errors": errors}), file=sys.stderr)
        elif args.cmd == "cleanup-service":
            from .server.cleanup import CleanupService

            svc = CleanupService(args.root, host=args.host, port=args.port)
            print(json.dumps({"listening": f"http://{svc.host}:{svc.port}",
                              "allowed_roots": svc.allowed_roots}), flush=True)
            try:
                svc.serve_forever()
            except KeyboardInterrupt:
                svc.shutdown()
        elif args.cmd == "mcpb":
            import os as _os

            from .server.mcpb import Bridge, BridgeClient

            server, api_key = args.server, args.api_key
            if args.root is not None:
                from .query.remote import load_remote_config

                cfg = load_remote_config(args.root)
                server = server or cfg["server_url"]
                api_key = api_key or cfg.get("api_key")
            if server is None:
                print(json.dumps({"error": "--server or --root required"}),
                      file=sys.stderr)
                return 2
            password = _os.environ.get(args.password_env) if args.username else None
            client = BridgeClient(server, api_key=api_key,
                                  username=args.username, password=password)
            Bridge(client).run()
        elif args.cmd == "remote":
            from .query import remote as remotemod

            if args.remote_cmd == "init":
                print(
                    json.dumps(
                        remotemod.init_remote(
                            args.root, args.server,
                            api_key=args.api_key, force=args.force,
                        )
                    )
                )
            elif args.remote_cmd == "status":
                rc = remotemod.RemoteClient(args.root)
                print(json.dumps({"health": rc.health(), "stats": rc.stats()}))
            elif args.remote_cmd == "uninstall":
                print(json.dumps(remotemod.uninstall_remote(args.root, dry_run=args.dry_run)))
            elif args.remote_cmd == "health":
                res = remotemod.check_remote_health(args.root, timeout=args.timeout)
                print(json.dumps(res))
                return 0 if res["connection_health"] == "healthy" else 1
            elif args.remote_cmd == "query":
                rc = remotemod.RemoteClient(args.root)
                hits = rc.search(
                    args.query,
                    limit=args.limit,
                    language=args.language,
                    min_score=args.min_score,
                    snippet_lines=args.snippet_lines,
                )
                for r in hits:
                    print(json.dumps(r))
        elif args.cmd == "verify":
            from .index.verify import verify_index

            out = verify_index(
                args.index, deep=args.deep, deep_sample=args.deep_sample
            )
            print(json.dumps(out))
            if not out["valid"]:
                return 1
        elif args.cmd == "validate":
            from .index.validation import AutoRecoveryEngine, IndexValidationEngine

            eng = IndexValidationEngine(args.tree, args.index)
            report = eng.validate_comprehensive()
            if args.recover and not report["valid"]:
                if not args.out:
                    raise ValueError("--recover needs --out")
                rec = AutoRecoveryEngine(eng, id_map=args.id_map)
                result = rec.execute_recovery(args.out, report=report)
                print(json.dumps(result))
                return 0
            print(json.dumps(report))
            if not report["valid"]:
                return 1
        elif args.cmd == "doctor":
            from .index.doctor import doctor

            out = doctor(
                args.index,
                fix=args.fix,
                prune_generations=args.prune_generations,
                deep=args.deep,
                stale_lock_after=args.stale_lock_after,
            )
            print(json.dumps(out))
            if not out["healthy"]:
                return 1
        elif args.cmd == "users":
            from .server.auth import UserManager

            um = UserManager(args.auth_dir)

            def _pw() -> str:
                if getattr(args, "password", None):
                    return str(args.password)
                return sys.stdin.readline().rstrip("\n")

            if args.users_cmd == "create":
                u = um.create_user(args.username, _pw(), args.role)
                print(json.dumps({"user": u.to_public()}))
            elif args.users_cmd == "list":
                for u in um.all_users():
                    print(json.dumps(u.to_public()))
            elif args.users_cmd == "set-role":
                u = um.update_role(args.username, args.role)
                print(json.dumps({"user": u.to_public()}))
            elif args.users_cmd == "delete":
                um.delete_user(args.username)
                print(json.dumps({"deleted": args.username}))
            elif args.users_cmd == "passwd":
                um.set_password(args.username, _pw())
                print(json.dumps({"password_changed": args.username}))
        elif args.cmd == "repos" and args.repos_cmd == "describe":
            import time as _time

            from .repometa import describe_tree

            path = describe_tree(
                args.tree, args.meta_dir, name=args.name, repo_url=args.url,
                generated_unix=int(_time.time()),
            )
            print(json.dumps({"description": path}))
        elif args.cmd == "repos":
            from .repos import GlobalRegistry

            reg = GlobalRegistry(args.root)
            if args.repos_cmd == "register":
                print(json.dumps(reg.register(
                    args.repo_name or args.alias,
                    args.alias,
                    args.index,
                    repo_url=args.repo_url,
                )))
            elif args.repos_cmd == "unregister":
                reg.unregister(args.alias)
                print(json.dumps({"unregistered": args.alias}))
            elif args.repos_cmd == "list":
                for row in reg.list_repos():
                    print(json.dumps(row))
            elif args.repos_cmd == "refresh":
                from .index.build import build_index
                from .index.buildlock import BuildLock

                def _build(out_dir: str) -> None:
                    with BuildLock(out_dir):
                        build_index(
                            args.input,
                            out_dir,
                            id_col=args.id_col,
                            text_col=args.text_col,
                            store_cols=tuple(
                                c for c in args.store_cols.split(",") if c
                            ),
                            num_shards=args.num_shards,
                        )

                new = reg.refresh(args.alias, _build)
                print(json.dumps({"alias": args.alias, "target": new}))
            elif args.repos_cmd == "gc":
                print(json.dumps({"deleted": reg.collect_garbage()}))
            elif args.repos_cmd == "tree":
                import os

                import ray.data as rd

                from .index.manifest import DOCSTORE_DIR
                from .query.explore import directory_tree, format_tree

                target = reg.resolve(args.alias)
                ds = rd.read_parquet(
                    os.path.join(target, DOCSTORE_DIR), columns=[args.url_col]
                )
                t = directory_tree(
                    ds,
                    path_col=args.url_col,
                    subdir=args.subdir,
                    max_depth=args.depth,
                    max_files_per_dir=args.cap,
                    include=tuple(args.include),
                    exclude=tuple(args.exclude),
                )
                print(format_tree(t, show_stats=args.show_stats))
            elif args.repos_cmd == "search":
                params = {"limit": args.limit}
                if args.language:
                    params["language"] = args.language
                for r in reg.search(args.alias, args.query, params):
                    print(json.dumps(r))
            elif args.repos_cmd in ("activate", "deactivate", "switch-branch", "my", "qsearch"):
                from .server.activated import ActivatedRepoManager

                am = ActivatedRepoManager(args.root, reg)
                if args.repos_cmd == "activate":
                    print(json.dumps(am.activate_repository(
                        args.user, args.alias, user_alias=args.user_alias,
                        branch=args.branch,
                    )))
                elif args.repos_cmd == "deactivate":
                    print(json.dumps({"message": am.deactivate_repository(
                        args.user, args.alias)}))
                elif args.repos_cmd == "switch-branch":
                    print(json.dumps(am.switch_branch(
                        args.user, args.alias, args.branch, create=args.create)))
                elif args.repos_cmd == "my":
                    print(json.dumps(am.list_activated_repositories(args.user)))
                else:
                    for h in am.search(args.user, args.alias, args.query,
                                       {"limit": args.limit}):
                        print(json.dumps(h))
            elif args.repos_cmd == "omni":
                from .query.omni import OmniSearchService

                svc = OmniSearchService(reg)
                out = svc.search(
                    [p for p in args.patterns.split(",") if p],
                    args.query,
                    limit=args.limit,
                    aggregation_mode=args.mode,
                )
                out.pop("cursor", None)  # meaningless across processes
                print(json.dumps(out))
        elif args.cmd == "curate":
            return _curate_cmd(args)
        elif args.cmd == "grep":
            import ray.data as rd

            from .text.grepscan import regex_search

            ds = rd.read_parquet(args.input, columns=[args.id_col, args.text_col])
            if args.id_col != "doc_id" or args.text_col != "text":
                ds = ds.rename_columns(
                    {args.id_col: "doc_id", args.text_col: "text"}
                )
            res = regex_search(
                ds, args.pattern, max_matches=args.max_matches, context=args.context
            )
            for r in res["matches"]:
                print(json.dumps(r))
            print(
                json.dumps(
                    {
                        "total_matches": res["total_matches"],
                        "truncated": res["truncated"],
                        "search_engine": res["search_engine"],
                    }
                ),
                file=sys.stderr,
            )
        return 0
    except (ValueError, KeyError) as e:
        # KeyError carries lookup misses (e.g. at-commit with an unknown
        # change id) — same clean JSON-error exit as validation failures
        print(json.dumps({"error": str(e)}), file=sys.stderr)
        return 2
    except RuntimeError as e:
        from .index.buildlock import BuildLockError
        from .query.proxy import ProxyError
        from .query.remote import RemoteError
        from .repos import RegistryError

        if isinstance(e, (ProxyError, RemoteError, RegistryError)):
            # proxy/remote config + transport errors are caller-visible
            # conditions: same clean JSON exit
            print(json.dumps({"error": str(e)}), file=sys.stderr)
            return 2
        if not isinstance(e, BuildLockError):
            raise
        # held build lock: clean JSON error, distinct exit (reference's
        # "indexing already in progress" CLI message)
        print(json.dumps({"error": str(e)}), file=sys.stderr)
        return 3
    finally:
        import ray

        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
