"""Per-user activated repositories — personal aliases over golden repos.

Reference ``server/repositories/activated_repo_manager.py``
(``ActivatedRepoManager``): a user ACTIVATES a golden repo under a personal
alias, switches branches on their activation without affecting anyone
else, re-syncs with the golden repo as it refreshes, deactivates, and
lists their activations; queries go through the activation so each user
sees their chosen branch.

Recast for this engine's storage model, honestly: the reference clones the
git repo copy-on-write because its index lives inside the working tree.
Here golden repos are IMMUTABLE index generations behind registry alias
pointers, and branch selection is a QUERY-TIME visibility filter (J4,
``index/visibility.py``) — so an activation needs no copy at all: it is a
small JSON record ``{username, user_alias, golden_alias, current_branch,
activated_at, last_synced_at}``.  Branch switch = edit the record (the
reference's ``switch_branch``); sync-with-golden = re-stamp against the
registry's CURRENT target (the alias pointer already moved — the record
keeps the audit trail the reference's sync reports); search = registry
searcher + ``branch=`` filter.  Reference error contracts kept: duplicate
activation refused, unknown golden refused, unknown branch refused unless
``create=True`` (the reference's ``-c`` branch creation).
"""

from __future__ import annotations

import json
import os
import re
import threading
import time
from typing import Callable

__all__ = ["ActivatedRepoError", "ActivatedRepoManager"]

DEFAULT_BRANCH = "main"
_ALIAS_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]{0,63}$")


class ActivatedRepoError(RuntimeError):
    pass


class ActivatedRepoManager:
    """Activation records under ``<root>/activated/<username>/<alias>.json``."""

    def __init__(self, root: str, registry, *, now_fn: Callable[[], float] = time.time):
        self.root = os.path.join(root, "activated")
        self.registry = registry
        self._now = now_fn
        self._lock = threading.Lock()
        os.makedirs(self.root, exist_ok=True)

    # -- paths / io --

    def _user_dir(self, username: str) -> str:
        if not _ALIAS_RE.match(username or ""):
            raise ActivatedRepoError(f"invalid username {username!r}")
        return os.path.join(self.root, username)

    def _rec_path(self, username: str, user_alias: str) -> str:
        if not _ALIAS_RE.match(user_alias or ""):
            raise ActivatedRepoError(f"invalid alias {user_alias!r}")
        return os.path.join(self._user_dir(username), f"{user_alias}.json")

    def _load(self, username: str, user_alias: str) -> dict:
        p = self._rec_path(username, user_alias)
        if not os.path.exists(p):
            raise ActivatedRepoError(
                f"user {username!r} has no activated repository {user_alias!r}"
            )
        with open(p) as f:
            return json.load(f)

    def _save(self, rec: dict) -> None:
        p = self._rec_path(rec["username"], rec["user_alias"])
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f, indent=1, sort_keys=True)
        os.replace(tmp, p)

    # -- branch model (J4 visibility) --

    def _known_branches(self, index_dir: str) -> set[str]:
        from ..index.visibility import _fold

        return {DEFAULT_BRANCH} | {
            b for b in _fold(index_dir) if b is not None
        }

    # -- lifecycle (reference activate/deactivate/list) --

    def activate_repository(
        self,
        username: str,
        golden_alias: str,
        *,
        user_alias: str | None = None,
        branch: str | None = None,
    ) -> dict:
        user_alias = user_alias or golden_alias
        target = self.registry.resolve(golden_alias)  # raises on unknown golden
        branch = branch or DEFAULT_BRANCH
        known = self._known_branches(target)
        if branch not in known:
            raise ActivatedRepoError(
                f"branch {branch!r} does not exist in {golden_alias!r}"
                f" (known: {sorted(known)})"
            )
        with self._lock:
            p = self._rec_path(username, user_alias)
            if os.path.exists(p):
                raise ActivatedRepoError(
                    f"user {username!r} already has an activation {user_alias!r}"
                )
            rec = {
                "username": username,
                "user_alias": user_alias,
                "golden_alias": golden_alias,
                "current_branch": branch,
                "activated_at": self._now(),
                "last_synced_at": self._now(),
                "last_synced_target": target,
            }
            self._save(rec)
        return rec

    def deactivate_repository(self, username: str, user_alias: str) -> str:
        with self._lock:
            rec = self._load(username, user_alias)
            os.unlink(self._rec_path(username, user_alias))
        return f"deactivated {rec['golden_alias']!r} alias {user_alias!r}"

    def list_activated_repositories(self, username: str) -> list[dict]:
        d = self._user_dir(username)
        if not os.path.isdir(d):
            return []
        out = []
        for name in sorted(os.listdir(d)):
            if name.endswith(".json"):
                with open(os.path.join(d, name)) as f:
                    out.append(json.load(f))
        return out

    def list_all_activated_repositories(self) -> list[dict]:
        out = []
        for user in sorted(os.listdir(self.root)):
            if os.path.isdir(os.path.join(self.root, user)):
                out.extend(self.list_activated_repositories(user))
        return out

    def find_repos_by_golden_alias(self, golden_alias: str) -> list[dict]:
        return [
            r for r in self.list_all_activated_repositories()
            if r["golden_alias"] == golden_alias
        ]

    # -- branch ops (reference switch_branch/get_current_branch) --

    def get_current_branch(self, username: str, user_alias: str) -> str:
        return self._load(username, user_alias)["current_branch"]

    def switch_branch(
        self, username: str, user_alias: str, branch: str, *, create: bool = False
    ) -> dict:
        with self._lock:
            rec = self._load(username, user_alias)
            target = self.registry.resolve(rec["golden_alias"])
            known = self._known_branches(target)
            if branch not in known and not create:
                raise ActivatedRepoError(
                    f"branch {branch!r} does not exist (use create=True; "
                    f"known: {sorted(known)})"
                )
            rec["current_branch"] = branch
            self._save(rec)
        return rec

    # -- sync with golden (reference sync_with_golden_repository) --

    def sync_with_golden_repository(self, username: str, user_alias: str) -> dict:
        """Re-stamp against the golden alias's CURRENT target.  Because the
        golden tier publishes immutable generations behind an alias pointer,
        'sync' is an audit-trail update, not a data copy — the NEXT query
        already reads the fresh target; the report says whether it moved."""
        with self._lock:
            rec = self._load(username, user_alias)
            target = self.registry.resolve(rec["golden_alias"])
            changed = target != rec.get("last_synced_target")
            rec["last_synced_target"] = target
            rec["last_synced_at"] = self._now()
            self._save(rec)
        return {"changed": changed, "target": target, **rec}

    # -- query through the activation --

    def search(
        self, username: str, user_alias: str, q: str, params: dict | None = None
    ) -> list[dict]:
        rec = self._load(username, user_alias)
        p = dict(params or {})
        # the user's branch rides every query (J4 visibility filter — 'main'
        # with no hide ops is the unfiltered base view); an explicit branch
        # param wins (ad-hoc cross-branch peek)
        p.setdefault("branch", rec["current_branch"])
        return self.registry.search(rec["golden_alias"], q, p)
