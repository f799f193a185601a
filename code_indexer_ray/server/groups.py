"""Group-based access control — groups, memberships, repo grants, and
query-time access filtering.

Reference ``server/services/group_access_manager.py`` (Stories #707/#708/
#710) + ``access_filtering_service.py``:

- three DEFAULT groups bootstrapped idempotently — ``admins`` (full
  administrative access), ``powerusers`` (all golden repos), ``users``
  (basic access to ``cidx-meta`` only) — protected from deletion;
- 1:1 user→group membership with assignment metadata (who/when);
- repo→group access grants; revoking ``cidx-meta`` from ANY group is
  refused (it is always accessible to everyone);
- new golden repos auto-assign to admins + powerusers, NEVER to users;
- query-time filtering implements the INVISIBLE-REPO pattern: results and
  listings from inaccessible repos simply don't appear (no 403s),
  ``cidx-meta`` always passes, admins see everything, membership is read
  fresh per call (no caching);
- SSO provisioning hook (Story #708): a NEW SSO user lands in ``users``
  (AC1), existing membership is never changed (AC3), errors never block
  authentication (AC6).

Implementation: sync sqlite3 + injectable clock (the reference patterns),
unix-float timestamps.
"""

from __future__ import annotations

import sqlite3
import threading
import time
from dataclasses import dataclass
from typing import Callable, Iterable, Optional

__all__ = [
    "CIDX_META_REPO",
    "DEFAULT_GROUP_ADMINS",
    "DEFAULT_GROUP_POWERUSERS",
    "DEFAULT_GROUP_USERS",
    "Group",
    "GroupMembership",
    "GroupAccessManager",
    "AccessFilteringService",
    "DefaultGroupCannotBeDeletedError",
    "GroupHasUsersError",
    "CidxMetaCannotBeRevokedError",
]

CIDX_META_REPO = "cidx-meta"
DEFAULT_GROUP_ADMINS = "admins"
DEFAULT_GROUP_POWERUSERS = "powerusers"
DEFAULT_GROUP_USERS = "users"

DEFAULT_GROUPS = (
    (DEFAULT_GROUP_ADMINS, "Full administrative access"),
    (DEFAULT_GROUP_POWERUSERS, "Access to all golden repositories"),
    (DEFAULT_GROUP_USERS, f"Basic access to {CIDX_META_REPO} only"),
)


class DefaultGroupCannotBeDeletedError(Exception):
    pass


class GroupHasUsersError(Exception):
    pass


class CidxMetaCannotBeRevokedError(Exception):
    pass


@dataclass(frozen=True)
class Group:
    id: int
    name: str
    description: str
    is_default: bool
    created_at: float


@dataclass(frozen=True)
class GroupMembership:
    user_id: str
    group_id: int
    assigned_at: float
    assigned_by: str


class GroupAccessManager:
    """Groups + 1:1 memberships + repo grants over sqlite."""

    def __init__(self, db_path: str, *, now_fn: Callable[[], float] = time.time):
        self.db_path = db_path
        self._now = now_fn
        self._lock = threading.Lock()
        with self._conn() as conn:
            conn.execute(
                "CREATE TABLE IF NOT EXISTS groups ("
                " id INTEGER PRIMARY KEY AUTOINCREMENT,"
                " name TEXT NOT NULL UNIQUE, description TEXT NOT NULL,"
                " is_default INTEGER NOT NULL DEFAULT 0, created_at REAL NOT NULL)"
            )
            conn.execute(
                "CREATE TABLE IF NOT EXISTS user_group_membership ("
                " user_id TEXT PRIMARY KEY, group_id INTEGER NOT NULL,"
                " assigned_at REAL NOT NULL, assigned_by TEXT NOT NULL)"
            )
            conn.execute(
                "CREATE TABLE IF NOT EXISTS repo_group_access ("
                " repo_name TEXT NOT NULL, group_id INTEGER NOT NULL,"
                " granted_at REAL NOT NULL, granted_by TEXT NOT NULL,"
                " PRIMARY KEY (repo_name, group_id))"
            )
            for name, desc in DEFAULT_GROUPS:
                conn.execute(
                    "INSERT OR IGNORE INTO groups (name, description, is_default,"
                    " created_at) VALUES (?, ?, 1, ?)",
                    (name, desc, self._now()),
                )

    def _conn(self) -> sqlite3.Connection:
        conn = sqlite3.connect(self.db_path, timeout=30)
        conn.row_factory = sqlite3.Row
        return conn

    @staticmethod
    def _mk(row) -> Group:
        return Group(
            id=int(row["id"]), name=row["name"], description=row["description"],
            is_default=bool(row["is_default"]), created_at=float(row["created_at"]),
        )

    # -- groups --

    def get_all_groups(self) -> list[Group]:
        with self._conn() as conn:
            return [
                self._mk(r)
                for r in conn.execute("SELECT * FROM groups ORDER BY id")
            ]

    def get_group(self, group_id: int) -> Optional[Group]:
        with self._conn() as conn:
            row = conn.execute(
                "SELECT * FROM groups WHERE id = ?", (group_id,)
            ).fetchone()
        return self._mk(row) if row else None

    def get_group_by_name(self, name: str) -> Optional[Group]:
        with self._conn() as conn:
            row = conn.execute(
                "SELECT * FROM groups WHERE name = ?", (name,)
            ).fetchone()
        return self._mk(row) if row else None

    def create_group(self, name: str, description: str) -> Group:
        if not name or not name.strip():
            raise ValueError("group name cannot be empty")
        with self._lock, self._conn() as conn:
            try:
                cur = conn.execute(
                    "INSERT INTO groups (name, description, is_default, created_at)"
                    " VALUES (?, ?, 0, ?)",
                    (name, description, self._now()),
                )
            except sqlite3.IntegrityError as e:
                raise ValueError(f"group {name!r} already exists") from e
            return Group(int(cur.lastrowid), name, description, False, self._now())

    def update_group(self, group_id: int, *, description: str) -> bool:
        with self._lock, self._conn() as conn:
            cur = conn.execute(
                "UPDATE groups SET description = ? WHERE id = ?",
                (description, group_id),
            )
            return cur.rowcount > 0

    def delete_group(self, group_id: int) -> bool:
        with self._lock, self._conn() as conn:
            row = conn.execute(
                "SELECT * FROM groups WHERE id = ?", (group_id,)
            ).fetchone()
            if row is None:
                return False
            if row["is_default"]:
                raise DefaultGroupCannotBeDeletedError(
                    f"default group {row['name']!r} cannot be deleted"
                )
            n = conn.execute(
                "SELECT count(*) AS c FROM user_group_membership WHERE group_id = ?",
                (group_id,),
            ).fetchone()["c"]
            if n:
                raise GroupHasUsersError(
                    f"group {row['name']!r} has {n} assigned user(s)"
                )
            conn.execute("DELETE FROM groups WHERE id = ?", (group_id,))
            conn.execute(
                "DELETE FROM repo_group_access WHERE group_id = ?", (group_id,)
            )
            return True

    # -- membership (1:1) --

    def assign_user_to_group(
        self, user_id: str, group_id: int, assigned_by: str
    ) -> None:
        if self.get_group(group_id) is None:
            raise KeyError(f"group id {group_id} not found")
        with self._lock, self._conn() as conn:
            conn.execute(
                "INSERT OR REPLACE INTO user_group_membership VALUES (?, ?, ?, ?)",
                (user_id, group_id, self._now(), assigned_by),
            )

    def get_user_membership(self, user_id: str) -> Optional[GroupMembership]:
        with self._conn() as conn:
            row = conn.execute(
                "SELECT * FROM user_group_membership WHERE user_id = ?", (user_id,)
            ).fetchone()
        if row is None:
            return None
        return GroupMembership(
            user_id=row["user_id"], group_id=int(row["group_id"]),
            assigned_at=float(row["assigned_at"]), assigned_by=row["assigned_by"],
        )

    def get_user_group(self, user_id: str) -> Optional[Group]:
        m = self.get_user_membership(user_id)
        return self.get_group(m.group_id) if m else None

    def get_users_in_group(self, group_id: int) -> list[str]:
        with self._conn() as conn:
            return [
                r["user_id"]
                for r in conn.execute(
                    "SELECT user_id FROM user_group_membership WHERE group_id = ?"
                    " ORDER BY user_id",
                    (group_id,),
                )
            ]

    def get_all_users_with_groups(
        self, limit: int | None = None, offset: int = 0
    ) -> tuple[list[dict], int]:
        with self._conn() as conn:
            total = conn.execute(
                "SELECT count(*) AS c FROM user_group_membership"
            ).fetchone()["c"]
            q = (
                "SELECT m.user_id, m.group_id, g.name AS group_name,"
                " m.assigned_at, m.assigned_by"
                " FROM user_group_membership m JOIN groups g ON m.group_id = g.id"
                " ORDER BY m.user_id"
            )
            if limit is not None:
                q += f" LIMIT {int(limit)} OFFSET {int(offset)}"
            rows = [dict(r) for r in conn.execute(q)]
        return rows, int(total)

    # -- repo grants --

    def grant_repo_access(
        self, repo_name: str, group_id: int, granted_by: str
    ) -> bool:
        with self._lock, self._conn() as conn:
            try:
                conn.execute(
                    "INSERT INTO repo_group_access VALUES (?, ?, ?, ?)",
                    (repo_name, group_id, self._now(), granted_by),
                )
                return True
            except sqlite3.IntegrityError:
                return False  # already granted

    def revoke_repo_access(self, repo_name: str, group_id: int) -> bool:
        if repo_name == CIDX_META_REPO:
            raise CidxMetaCannotBeRevokedError(
                f"{CIDX_META_REPO} access cannot be revoked from any group"
            )
        with self._lock, self._conn() as conn:
            cur = conn.execute(
                "DELETE FROM repo_group_access WHERE repo_name = ? AND group_id = ?",
                (repo_name, group_id),
            )
            return cur.rowcount > 0

    def get_group_repos(self, group_id: int) -> list[str]:
        with self._conn() as conn:
            return [
                r["repo_name"]
                for r in conn.execute(
                    "SELECT repo_name FROM repo_group_access WHERE group_id = ?"
                    " ORDER BY repo_name",
                    (group_id,),
                )
            ]

    def get_repo_groups(self, repo_name: str) -> list[Group]:
        with self._conn() as conn:
            rows = conn.execute(
                "SELECT g.* FROM repo_group_access a JOIN groups g"
                " ON a.group_id = g.id WHERE a.repo_name = ? ORDER BY g.id",
                (repo_name,),
            ).fetchall()
        return [self._mk(r) for r in rows]

    def all_granted_repos(self) -> set[str]:
        with self._conn() as conn:
            return {
                r["repo_name"]
                for r in conn.execute("SELECT DISTINCT repo_name FROM repo_group_access")
            }

    def auto_assign_golden_repo(self, repo_name: str) -> None:
        """New golden repo → admins + powerusers, NEVER users (AC3/AC4)."""
        for name in (DEFAULT_GROUP_ADMINS, DEFAULT_GROUP_POWERUSERS):
            g = self.get_group_by_name(name)
            if g is not None:
                self.grant_repo_access(repo_name, g.id, "system:auto-assignment")

    # -- SSO provisioning hook (Story #708) --

    def ensure_sso_membership(self, user_id: str) -> None:
        """AC1: new SSO users land in 'users'; AC3: existing membership is
        untouched; AC6: failures must never block authentication (callers
        wrap in try/except — this method itself only touches sqlite)."""
        if self.get_user_membership(user_id) is not None:
            return
        users = self.get_group_by_name(DEFAULT_GROUP_USERS)
        if users is not None:
            self.assign_user_to_group(user_id, users.id, "system:sso-provisioning")


class AccessFilteringService:
    """Query-time invisible-repo filtering (reference
    access_filtering_service.py).  Membership read fresh per call."""

    DEFAULT_OVER_FETCH_FACTOR = 2
    ADMIN_GROUP_NAME = DEFAULT_GROUP_ADMINS

    def __init__(self, group_manager: GroupAccessManager):
        self.group_manager = group_manager

    def get_accessible_repos(self, user_id: str) -> set[str]:
        group = self.group_manager.get_user_group(user_id)
        if group is None:
            return {CIDX_META_REPO}
        if group.name == self.ADMIN_GROUP_NAME:
            return self.group_manager.all_granted_repos() | {CIDX_META_REPO}
        return set(self.group_manager.get_group_repos(group.id)) | {CIDX_META_REPO}

    def is_admin_user(self, user_id: str) -> bool:
        g = self.group_manager.get_user_group(user_id)
        return g is not None and g.name == self.ADMIN_GROUP_NAME

    @staticmethod
    def _repo_of(result) -> str:
        if isinstance(result, dict):
            return str(
                result.get("repository_alias")
                or result.get("repository")
                or result.get("repo")
                or ""
            )
        return str(getattr(result, "repository_alias", ""))

    def filter_query_results(self, results: Iterable, user_id: str) -> list:
        results = list(results)
        if self.is_admin_user(user_id):
            return results
        accessible = self.get_accessible_repos(user_id)
        return [r for r in results if self._repo_of(r) in accessible]

    def filter_repo_listing(self, repos: Iterable[str], user_id: str) -> list[str]:
        repos = list(repos)
        if self.is_admin_user(user_id):
            return repos
        accessible = self.get_accessible_repos(user_id)
        return [r for r in repos if r in accessible]
