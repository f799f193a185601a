"""Minimal HTML admin/browse tier over the existing REST surface.

Reference analog: ``server/web/routes.py`` + ``templates/`` (dashboard,
query page with results, jobs, users; session-cookie login with CSRF).
That stack is FastAPI + Jinja + htmx; this one is the same page inventory
rendered by stdlib string formatting and served by the SAME
``IndexHTTPServer`` socket — no new dependency, no new port.

Pages (all under ``/web``):

- ``/web``               dashboard: health + index stats
- ``/web/login``         GET form / POST credentials (CSRF double-submit)
- ``/web/logout``        clears the session cookie
- ``/web/query``         search box; ``?q=`` renders hits via the same
                         ``rest_search`` path ``/search`` uses
- ``/web/jobs``          job table (requires ``enable_jobs``)
- ``/web/users``         user table (admin role only)

Auth: with an ``AuthTier`` configured, every page except ``/web/login``
requires a ``cidx_session`` cookie holding a live JWT (HttpOnly; the
sliding-session refresh applies on page loads).  Group repo-visibility is
enforced for the query page exactly like ``/search`` (same gate).  With no
auth tier, pages are open — mirroring the REST tier's behavior.
"""

from __future__ import annotations

import html
import secrets
import time
from http.cookies import SimpleCookie
from urllib.parse import urlencode

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>{title} — cidx</title>
<style>
body{{font-family:system-ui,sans-serif;margin:0;background:#f6f7f9;color:#1c2128}}
nav{{background:#1c2128;color:#fff;padding:.6rem 1rem;display:flex;gap:1rem;align-items:center}}
nav a{{color:#9ecbff;text-decoration:none}} nav .who{{margin-left:auto;color:#aab}}
main{{max-width:60rem;margin:1.5rem auto;padding:0 1rem}}
table{{border-collapse:collapse;width:100%;background:#fff}}
th,td{{border:1px solid #d0d7de;padding:.35rem .6rem;text-align:left;font-size:.9rem}}
th{{background:#eef1f4}}
input[type=text],input[type=password]{{padding:.4rem;border:1px solid #d0d7de;border-radius:4px;width:16rem}}
button{{padding:.4rem .9rem;border:0;border-radius:4px;background:#2563eb;color:#fff;cursor:pointer}}
.err{{color:#b91c1c}} .card{{background:#fff;border:1px solid #d0d7de;border-radius:6px;padding:1rem;margin-bottom:1rem}}
.snippet{{white-space:pre-wrap;font-family:ui-monospace,monospace;font-size:.8rem;background:#f6f8fa;padding:.4rem;border-radius:4px}}
</style></head>
<body><nav><b>cidx</b><a href="/web">dashboard</a><a href="/web/query">query</a>{nav_extra}
<span class="who">{who}</span></nav>
<main><h2>{title}</h2>{body}</main></body></html>"""

SESSION_COOKIE = "cidx_session"
CSRF_COOKIE = "cidx_csrf"


def _esc(v) -> str:
    return html.escape(str(v if v is not None else ""))


class WebTier:
    """Renders the HTML pages; owned lazily by ``IndexHTTPServer``."""

    def __init__(self, server):
        self.server = server  # IndexHTTPServer

    # -- plumbing -------------------------------------------------------
    def _cookies(self, h) -> dict:
        c = SimpleCookie()
        c.load(h.headers.get("Cookie") or "")
        return {k: v.value for k, v in c.items()}

    def _user(self, h):
        """Live user from the session cookie, or None."""
        auth = self.server.auth
        if auth is None:
            return None
        tok = self._cookies(h).get(SESSION_COOKIE)
        if not tok:
            return None
        try:
            data = auth.jwt.validate_token(tok)
        except Exception:  # noqa: BLE001 — expired/garbage cookie = logged out
            return None
        return auth.users.get_user(data.get("username", ""))

    def _send(self, h, code: int, body: str, *, cookies: list[str] | None = None,
              location: str | None = None) -> None:
        data = body.encode()
        h._last_status = code
        h.send_response(code)
        h.send_header("Content-Type", "text/html; charset=utf-8")
        h.send_header("Content-Length", str(len(data)))
        for c in cookies or []:
            h.send_header("Set-Cookie", c)
        if location:
            h.send_header("Location", location)
        h.end_headers()
        h.wfile.write(data)

    def _redirect(self, h, to: str, *, cookies: list[str] | None = None) -> None:
        self._send(h, 303, f'<a href="{_esc(to)}">continue</a>',
                   cookies=cookies, location=to)

    def _page(self, title: str, body: str, user=None) -> str:
        nav_extra = ""
        if self.server.jobs is not None:
            nav_extra += '<a href="/web/jobs">jobs</a>'
        if user is not None and getattr(user.role, "value", "") == "admin":
            nav_extra += '<a href="/web/users">users</a>'
        if self.server.auth is not None:
            who = (
                f'{_esc(user.username)} ({_esc(user.role.value)}) '
                f'· <a href="/web/logout">logout</a>'
                if user is not None
                else '<a href="/web/login">login</a>'
            )
        else:
            who = "auth disabled"
        return _PAGE.format(title=_esc(title), body=body, nav_extra=nav_extra, who=who)

    # -- dispatch -------------------------------------------------------
    def handle(self, h, route: str, method: str, params: dict) -> None:
        if route == "/web/login":
            return self._login(h, method, params)
        user = self._user(h)
        if self.server.auth is not None and user is None:
            return self._redirect(h, "/web/login")
        if route == "/web/logout":
            return self._redirect(
                h, "/web/login",
                cookies=[f"{SESSION_COOKIE}=; Path=/; Max-Age=0; HttpOnly"],
            )
        if route in ("/web", "/web/"):
            return self._dashboard(h, user)
        if route == "/web/query":
            return self._query(h, user, params)
        if route == "/web/jobs":
            return self._jobs(h, user)
        if route == "/web/users":
            return self._users(h, user)
        self._send(h, 404, self._page("not found", "<p>no such page</p>", user))

    # -- pages ----------------------------------------------------------
    def _login(self, h, method: str, params: dict) -> None:
        if self.server.auth is None:
            return self._redirect(h, "/web")
        if method == "POST":
            cookies = self._cookies(h)
            if not params.get("csrf") or params.get("csrf") != cookies.get(CSRF_COOKIE):
                return self._send(
                    h, 403,
                    self._page("login", '<p class="err">stale form — try again'
                               ' (<a href="/web/login">reload</a>)</p>'),
                )
            user = self.server.auth.users.authenticate(
                str(params.get("username", "")), str(params.get("password", ""))
            )
            if user is None:
                form, csrf_cookie = self._login_form()
                return self._send(
                    h, 401,
                    self._page("login", '<p class="err">invalid credentials</p>' + form),
                    cookies=[csrf_cookie],
                )
            tok = self.server.auth.jwt.create_token(user.to_public())
            return self._redirect(
                h, "/web",
                cookies=[f"{SESSION_COOKIE}={tok}; Path=/; HttpOnly; SameSite=Lax"],
            )
        form, csrf_cookie = self._login_form()
        return self._send(h, 200, self._page("login", form), cookies=[csrf_cookie])

    def _login_form(self) -> tuple[str, str]:
        """(form html, csrf Set-Cookie) — double-submit: hidden field must
        match the cookie on POST."""
        csrf = secrets.token_urlsafe(16)
        cookie = f"{CSRF_COOKIE}={csrf}; Path=/web/login; SameSite=Lax"
        form = (
            f'<form method="post" action="/web/login">'
            f'<input type="hidden" name="csrf" value="{csrf}">'
            f'<p><input type="text" name="username" placeholder="username" autofocus></p>'
            f'<p><input type="password" name="password" placeholder="password"></p>'
            f"<p><button>sign in</button></p></form>"
        )
        return form, cookie

    def _dashboard(self, h, user) -> None:
        s = self.server
        health = s._r_health({})
        rows = [("status", health["status"]), ("index dir", health["index_dir"]),
                ("documents", health["num_docs"]), ("shards", health["num_shards"])]
        if health["fields"]:
            rows.append(("fields", ", ".join(health["fields"])))
        if s.searcher is not None:
            st = s._r_stats({})
            rows += [("total tokens", st["total_tokens"]), ("avgdl", st["avgdl"]),
                     ("buckets", st["num_buckets"]), ("partitions", st["partitions"])]
            if st.get("index_timestamp"):
                rows.append(("built", time.strftime(
                    "%Y-%m-%d %H:%M:%S", time.localtime(st["index_timestamp"]))))
        trs = "".join(f"<tr><th>{_esc(k)}</th><td>{_esc(v)}</td></tr>" for k, v in rows)
        body = f'<div class="card"><table>{trs}</table></div>'
        if s.repo_name:
            body = f"<p>repository: <b>{_esc(s.repo_name)}</b></p>" + body
        self._send(h, 200, self._page("dashboard", body, user))

    def _query(self, h, user, params: dict) -> None:
        s = self.server
        q = str(params.get("q", "") or "")
        # group repo-visibility: identical rule to the REST searcher gate
        if (
            user is not None
            and s.repo_name is not None
            and getattr(s.auth, "access_filter", None) is not None
            and getattr(user.role, "value", "") != "admin"
        ):
            af = s.auth.access_filter
            if not af.is_admin_user(user.username) and s.repo_name not in af.get_accessible_repos(user.username):
                return self._send(
                    h, 403,
                    self._page("query", f'<p class="err">repository '
                               f"{_esc(s.repo_name)} is not accessible to your group</p>", user),
                )
        form = (
            f'<form method="get" action="/web/query">'
            f'<input type="text" name="q" value="{_esc(q)}" placeholder="query" autofocus> '
            f"<button>search</button></form>"
        )
        body = form
        if q:
            slot = s._slots.get()
            try:
                with s._refresh_lock:
                    s._refresh()
                    replicas = s._follower.searchers
                s._tls.searcher = replicas[slot % len(replicas)] if replicas else None
                if s._tls.searcher is None:
                    body += '<p class="err">no index generation published yet</p>'
                    return self._send(h, 503, self._page("query", body, user))
                try:
                    qp = dict(params)
                    qp.setdefault("snippet_lines", "2")
                    hits = s._hits(q, qp)
                except ValueError as e:
                    return self._send(
                        h, 400,
                        self._page("query", form + f'<p class="err">{_esc(e)}</p>', user),
                    )
            finally:
                s._tls.searcher = None
                s._slots.put(slot)
            items = []
            for hit in hits:
                path = hit.get("path") or hit.get("url") or hit.get("doc_id")
                snip = hit.get("snippet") or ""
                items.append(
                    f'<div class="card"><b>{_esc(path)}</b>'
                    f' <small>score {_esc(hit.get("score"))}</small>'
                    + (f'<div class="snippet">{_esc(snip)}</div>' if snip else "")
                    + "</div>"
                )
            more = urlencode({"q": q})
            body += (
                f"<p>{len(hits)} hits · <a href=\"/search?{more}\">json</a></p>"
                + "".join(items)
            )
        self._send(h, 200, self._page("query", body, user))

    def _jobs(self, h, user) -> None:
        if self.server.jobs is None:
            return self._send(
                h, 404, self._page("jobs", "<p>jobs tier not enabled</p>", user)
            )
        rows = self.server.jobs.list(limit=100)
        trs = "".join(
            "<tr>" + "".join(
                f"<td>{_esc(r.get(k))}</td>"
                for k in ("job_id", "kind", "state", "submitted_at", "finished_at")
            ) + "</tr>"
            for r in rows
        )
        body = ("<table><tr><th>id</th><th>kind</th><th>state</th>"
                f"<th>submitted</th><th>finished</th></tr>{trs}</table>"
                if rows else "<p>no jobs yet</p>")
        self._send(h, 200, self._page("jobs", body, user))

    def _users(self, h, user) -> None:
        auth = self.server.auth
        if auth is None:
            return self._send(h, 404, self._page("users", "<p>auth disabled</p>"))
        if user is None or getattr(user.role, "value", "") != "admin":
            return self._send(
                h, 403, self._page("users", '<p class="err">admin role required</p>', user)
            )
        trs = "".join(
            f"<tr><td>{_esc(u.username)}</td><td>{_esc(u.role.value)}</td>"
            f"<td>{_esc(getattr(u, 'email', '') or '')}</td></tr>"
            for u in auth.users.all_users()
        )
        body = f"<table><tr><th>user</th><th>role</th><th>email</th></tr>{trs}</table>"
        self._send(h, 200, self._page("users", body, user))
