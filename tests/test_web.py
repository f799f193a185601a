"""HTML web tier (`server/web.py` — reference server/web/routes.py analog):
login/session/CSRF flow, dashboard, query page rendering the same hits the
REST fixture returns, jobs/users pages, group repo-visibility."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

GOOD_PW = "Str0ng!pass"


class _NoRedirect(urllib.request.HTTPRedirectHandler):
    def redirect_request(self, *a, **k):
        return None


_OPENER = urllib.request.build_opener(_NoRedirect)


def _req(method, url, *, data=None, cookies=None, ctype=None):
    headers = {}
    if cookies:
        headers["Cookie"] = "; ".join(f"{k}={v}" for k, v in cookies.items())
    if data is not None:
        headers["Content-Type"] = ctype or "application/x-www-form-urlencoded"
        data = data.encode() if isinstance(data, str) else data
    req = urllib.request.Request(url, data=data, headers=headers, method=method)
    try:
        with _OPENER.open(req, timeout=30) as r:
            return r.status, r.read().decode(), dict(r.headers), r.headers.get_all("Set-Cookie") or []
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode(), dict(e.headers), e.headers.get_all("Set-Cookie") or []


def _cookie_of(set_cookies, name):
    for c in set_cookies:
        if c.startswith(name + "="):
            return c.split(";")[0].split("=", 1)[1]
    return None


@pytest.fixture(scope="module")
def web_srv(ray_session, tmp_path_factory):
    from code_indexer_ray.index.build import build_index
    from code_indexer_ray.server.auth import AuthTier
    from code_indexer_ray.server.http import IndexHTTPServer

    rng = np.random.default_rng(17)
    vocab = ["spark", "merge", "window", "batch"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(vocab[j] for j in rng.integers(0, 4, 12)),
            "lang": "en",
            "url": f"src/f{i}.py",
        }
        for i in range(50)
    ]
    tmp = tmp_path_factory.mktemp("websrv")
    src = str(tmp / "c.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    idx = str(tmp / "idx")
    build_index(src, idx, store_cols=("lang", "url"), num_shards=2, resume=False)
    tier = AuthTier(str(tmp / "auth"), iterations=500, seed_admin=("admin", GOOD_PW))
    tier.users.create_user("norma", GOOD_PW, "normal_user")
    tier.users.create_user("blocked", GOOD_PW, "normal_user")
    users_group = tier.groups.get_group_by_name("users")
    power = tier.groups.get_group_by_name("powerusers")
    tier.groups.assign_user_to_group("blocked", users_group.id, "admin")
    tier.groups.assign_user_to_group("norma", power.id, "admin")
    tier.groups.grant_repo_access("web-global", power.id, "admin")
    srv = IndexHTTPServer(
        idx, port=0, warm=False, auth=tier, repo_name="web-global"
    )
    srv.start()
    yield f"http://{srv.host}:{srv.port}", tier
    srv.shutdown()


def _login(base, username, password=GOOD_PW):
    _, _, _, sc = _req("GET", base + "/web/login")
    csrf = _cookie_of(sc, "cidx_csrf")
    assert csrf
    code, _, _, sc2 = _req(
        "POST", base + "/web/login",
        data=f"username={username}&password={urllib.request.quote(password)}&csrf={csrf}",
        cookies={"cidx_csrf": csrf},
    )
    assert code == 303, code
    session = _cookie_of(sc2, "cidx_session")
    assert session
    return {"cidx_session": session}


@pytest.mark.usefixtures("ray_session")
class TestWebTier:
    def test_unauthenticated_redirects_to_login(self, web_srv):
        base, _ = web_srv
        for page in ("/web", "/web/query", "/web/jobs", "/web/users"):
            code, _, headers, _ = _req("GET", base + page)
            assert code == 303 and headers["Location"] == "/web/login", page

    def test_login_page_has_form_and_csrf_cookie(self, web_srv):
        base, _ = web_srv
        code, body, _, sc = _req("GET", base + "/web/login")
        assert code == 200
        assert '<form method="post" action="/web/login"' in body
        assert _cookie_of(sc, "cidx_csrf")

    def test_login_csrf_mismatch_403(self, web_srv):
        base, _ = web_srv
        code, body, _, _ = _req(
            "POST", base + "/web/login",
            data=f"username=admin&password={GOOD_PW}&csrf=wrong",
            cookies={"cidx_csrf": "right"},
        )
        assert code == 403 and "stale form" in body

    def test_bad_credentials_401(self, web_srv):
        base, _ = web_srv
        _, _, _, sc = _req("GET", base + "/web/login")
        csrf = _cookie_of(sc, "cidx_csrf")
        code, body, _, _ = _req(
            "POST", base + "/web/login",
            data=f"username=admin&password=nope!1Pw&csrf={csrf}",
            cookies={"cidx_csrf": csrf},
        )
        assert code == 401 and "invalid credentials" in body

    def test_dashboard_renders_stats(self, web_srv):
        base, _ = web_srv
        cookies = _login(base, "admin")
        code, body, _, _ = _req("GET", base + "/web", cookies=cookies)
        assert code == 200
        assert "dashboard" in body and ">50<" in body  # num_docs from the fixture
        assert "web-global" in body
        assert "admin (admin)" in body  # session identity in the nav

    def test_query_page_renders_same_hits_as_rest(self, web_srv):
        base, _ = web_srv
        cookies = _login(base, "admin")
        # the REST fixture: same query through /search JSON
        tok_req = urllib.request.Request(
            base + "/auth/login",
            data=json.dumps({"username": "admin", "password": GOOD_PW}).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with urllib.request.urlopen(tok_req, timeout=30) as r:
            tok = json.loads(r.read())["access_token"]
        jr = urllib.request.Request(
            base + "/search?q=spark", headers={"Authorization": "Bearer " + tok}
        )
        with urllib.request.urlopen(jr, timeout=30) as r:
            rest_hits = json.loads(r.read())["hits"]
        code, body, _, _ = _req("GET", base + "/web/query?q=spark", cookies=cookies)
        assert code == 200
        assert f"{len(rest_hits)} hits" in body
        for hit in rest_hits:
            assert hit["path"] in body  # every REST hit rendered on the page

    def test_query_page_empty_is_form_only(self, web_srv):
        base, _ = web_srv
        cookies = _login(base, "norma")
        code, body, _, _ = _req("GET", base + "/web/query", cookies=cookies)
        assert code == 200 and 'name="q"' in body and "hits" not in body

    def test_query_group_visibility(self, web_srv):
        base, _ = web_srv
        cookies = _login(base, "blocked")
        code, body, _, _ = _req("GET", base + "/web/query?q=spark", cookies=cookies)
        assert code == 403 and "not accessible" in body
        ok = _login(base, "norma")
        code, body, _, _ = _req("GET", base + "/web/query?q=spark", cookies=ok)
        assert code == 200 and "hits" in body

    def test_users_page_admin_only(self, web_srv):
        base, _ = web_srv
        norma = _login(base, "norma")
        code, body, _, _ = _req("GET", base + "/web/users", cookies=norma)
        assert code == 403 and "admin role required" in body
        admin = _login(base, "admin")
        code, body, _, _ = _req("GET", base + "/web/users", cookies=admin)
        assert code == 200
        for name in ("admin", "norma", "blocked"):
            assert f"<td>{name}</td>" in body

    def test_jobs_page_404_without_jobs_tier(self, web_srv):
        base, _ = web_srv
        cookies = _login(base, "admin")
        code, body, _, _ = _req("GET", base + "/web/jobs", cookies=cookies)
        assert code == 404 and "jobs tier not enabled" in body

    def test_logout_clears_session(self, web_srv):
        base, _ = web_srv
        cookies = _login(base, "norma")
        code, _, _, sc = _req("GET", base + "/web/logout", cookies=cookies)
        assert code == 303
        cleared = [c for c in sc if c.startswith("cidx_session=") and "Max-Age=0" in c]
        assert cleared
        code, _, headers, _ = _req("GET", base + "/web", cookies={"cidx_session": ""})
        assert code == 303 and headers["Location"] == "/web/login"

    def test_garbage_session_cookie_redirects(self, web_srv):
        base, _ = web_srv
        code, _, headers, _ = _req(
            "GET", base + "/web", cookies={"cidx_session": "ey.bogus.token"}
        )
        assert code == 303 and headers["Location"] == "/web/login"

    def test_html_escaping_in_query_echo(self, web_srv):
        base, _ = web_srv
        cookies = _login(base, "admin")
        code, body, _, _ = _req(
            "GET", base + "/web/query?q=%3Cscript%3Ealert(1)%3C/script%3E",
            cookies=cookies,
        )
        assert code in (200, 400)
        assert "<script>alert" not in body  # reflected query is escaped


@pytest.mark.usefixtures("ray_session")
class TestWebNoAuth:
    def test_pages_open_without_auth_tier(self, ray_session, tmp_path_factory):
        from code_indexer_ray.index.build import build_index
        from code_indexer_ray.server.http import IndexHTTPServer

        rows = [
            {"doc_id": i, "text": "spark lines here", "lang": "en", "url": f"g{i}.py"}
            for i in range(5)
        ]
        tmp = tmp_path_factory.mktemp("webopen")
        src = str(tmp / "c.parquet")
        pq.write_table(pa.Table.from_pylist(rows), src)
        idx = str(tmp / "idx")
        build_index(src, idx, store_cols=("lang", "url"), num_shards=1, resume=False)
        srv = IndexHTTPServer(idx, port=0, warm=False)
        srv.start()
        try:
            base = f"http://{srv.host}:{srv.port}"
            code, body, _, _ = _req("GET", base + "/web")
            assert code == 200 and "auth disabled" in body
            code, body, _, _ = _req("GET", base + "/web/query?q=spark")
            assert code == 200 and "hits" in body
            # login page is a no-op redirect without an auth tier
            code, _, headers, _ = _req("GET", base + "/web/login")
            assert code == 303 and headers["Location"] == "/web"
        finally:
            srv.shutdown()


@pytest.mark.usefixtures("ray_session")
class TestWebJobs:
    def test_jobs_page_renders_job_rows(self, ray_session, tmp_path):
        import os

        from code_indexer_ray.index.build import build_index  # noqa: F401
        from code_indexer_ray.server.http import IndexHTTPServer

        rows = [
            {"doc_id": i, "text": "spark merge", "lang": "en", "url": f"j{i}.py"}
            for i in range(5)
        ]
        src = str(tmp_path / "c.parquet")
        pq.write_table(pa.Table.from_pylist(rows), src)
        root = str(tmp_path / "root")
        os.makedirs(root)
        srv = IndexHTTPServer(root, port=0, enable_jobs=True)
        srv.start()
        try:
            base = f"http://{srv.host}:{srv.port}"
            jid = srv.jobs.submit_build(
                {"input": src, "num_shards": 1, "num_buckets": 2,
                 "store_cols": ["lang", "url"]}
            )
            srv.jobs.wait(jid, timeout=120)
            code, body, _, _ = _req("GET", base + "/web/jobs")
            assert code == 200
            assert jid in body and "completed" in body and "<td>build</td>" in body
        finally:
            srv.shutdown()
