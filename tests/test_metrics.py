"""Metrics tier (`server/metrics.py` — reference server/telemetry metric
vocabulary on a stdlib registry): instruments, exposition format, machine
collectors, live /metrics scrape with request instrumentation."""

from __future__ import annotations

import json
import urllib.request

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.server.metrics import (
    Counter,
    Gauge,
    Histogram,
    MachineMetricsCollector,
    MetricsRegistry,
)


class TestInstruments:
    def test_counter_labels(self):
        c = Counter("http.server.request")
        c.inc(route="/search", status="200")
        c.inc(route="/search", status="200")
        c.inc(route="/mget", status="200")
        assert c.value(route="/search", status="200") == 2
        out = "\n".join(c._render())
        assert 'http_server_request_total{route="/search",status="200"} 2' in out

    def test_gauge_set_and_observable(self):
        g = Gauge("x.y")
        g.set(3.5, kind="a")
        assert 'x_y{kind="a"} 3.5' in "\n".join(g._render())
        g2 = Gauge("jobs", callback=lambda: {"running": 2, "queued": 1})
        out = "\n".join(g2._render())
        assert 'jobs{state="running"} 2' in out and 'jobs{state="queued"} 1' in out

    def test_histogram_buckets_sum_count(self):
        h = Histogram("lat", buckets=(0.01, 0.1, 1.0))
        for v in (0.005, 0.05, 0.5, 5.0):
            h.observe(v)
        out = "\n".join(h._render())
        assert 'lat_bucket{le="0.01"} 1' in out
        assert 'lat_bucket{le="0.1"} 2' in out
        assert 'lat_bucket{le="1"} 3' in out
        assert 'lat_bucket{le="+Inf"} 4' in out
        assert "lat_count 4" in out
        assert h.percentile(0.5) == 0.1

    def test_registry_dedup_and_type_conflict(self):
        r = MetricsRegistry()
        a = r.counter("c")
        assert r.counter("c") is a
        with pytest.raises(ValueError, match="already registered"):
            r.gauge("c")
        text = r.render()
        assert "# TYPE c counter" in text

    def test_machine_collectors_sane(self):
        m = MachineMetricsCollector()
        m.cpu_usage()  # first call primes the delta
        assert 0.0 <= m.cpu_usage() <= 100.0
        assert 0.0 <= m.memory_usage() <= 100.0
        assert m.disk_free() > 0
        r, w = m.disk_io()
        rx, tx = m.net_io()
        assert r >= 0 and w >= 0 and rx >= 0 and tx >= 0

    def test_machine_register_renders(self):
        reg = MetricsRegistry()
        MachineMetricsCollector().register(reg)
        text = reg.render()
        for name in ("system_cpu_usage", "system_memory_usage",
                     "system_disk_free", "system_disk_io_read",
                     "system_network_io_receive"):
            assert name in text


@pytest.fixture(scope="module")
def metrics_srv(ray_session, tmp_path_factory):
    from code_indexer_ray.index.build import build_index
    from code_indexer_ray.server.http import IndexHTTPServer

    tmp = tmp_path_factory.mktemp("msrv")
    rows = [{"doc_id": i, "text": "spark merge", "lang": "en", "url": f"f{i}.py"}
            for i in range(30)]
    src = str(tmp / "c.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    idx = str(tmp / "idx")
    build_index(src, idx, store_cols=("lang", "url"), num_shards=1, resume=False)
    srv = IndexHTTPServer(idx, port=0, warm=False, enable_metrics=True)
    srv.start()
    yield f"http://{srv.host}:{srv.port}", srv
    srv.shutdown()


@pytest.mark.usefixtures("ray_session")
class TestLiveMetrics:
    def test_requests_instrumented_and_scrape(self, metrics_srv):
        base, srv = metrics_srv
        for _ in range(3):
            with urllib.request.urlopen(base + "/search?q=spark&limit=2") as r:
                assert r.status == 200
        try:
            urllib.request.urlopen(base + "/search?q=spark&limit=5000")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        with urllib.request.urlopen(base + "/metrics") as r:
            assert r.status == 200
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        assert 'http_server_request_total{method="GET",route="/search",status="200"} 3' in text
        assert 'status="400"} 1' in text
        assert "http_server_request_duration_bucket" in text
        assert "system_cpu_usage" in text

    def test_path_params_do_not_explode_cardinality(self, metrics_srv):
        base, srv = metrics_srv
        for jid in ("abc", "def", "ghi"):
            try:
                urllib.request.urlopen(base + f"/jobs/{jid}")
            except urllib.error.HTTPError:
                pass
        text = srv.metrics.render()
        # one '/jobs' series, not one per id
        assert text.count('route="/jobs"') >= 1
        assert "abc" not in text

    def test_disabled_by_default(self, ray_session, tmp_path):
        from code_indexer_ray.index.build import build_index
        from code_indexer_ray.server.http import IndexHTTPServer

        rows = [{"doc_id": 0, "text": "x", "lang": "en", "url": "f.py"}]
        src = str(tmp_path / "c.parquet")
        pq.write_table(pa.Table.from_pylist(rows), src)
        idx = str(tmp_path / "idx")
        build_index(src, idx, store_cols=("lang", "url"), num_shards=1, resume=False)
        srv = IndexHTTPServer(idx, port=0, warm=False)
        srv.start()
        try:
            assert srv.metrics is None
            try:
                urllib.request.urlopen(f"http://{srv.host}:{srv.port}/metrics")
                raise AssertionError("expected 404")
            except urllib.error.HTTPError as e:
                assert e.code == 404
        finally:
            srv.shutdown()
