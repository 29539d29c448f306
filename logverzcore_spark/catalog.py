"""Dataset catalog + ACL — the reference's Logverz-Queries DynamoDB table
and its authorization rules, re-expressed over a JSON-lines metadata store.

Reference semantics reproduced:
- one item per collection ("C"), continuous collection ("CC"), or saved
  analysis ("A") with TableName, DatabaseName, DataType, QuerySettings,
  Owners[], Access[], Active, Archive (commonsharedv3.js:1079-1197
  ``RecordQuery``);
- visibility: admins/powerusers see everything; otherwise the caller (or
  one of their groups) must appear in Owners or Access
  (authenticationsharedv3.js:641-699 ``resourceaccessauthorization``,
  nosql.js:244-289 ``sharedqueryfiltering``);
- archive filter drops Archive==true rows (nosql.js:231);
- updates must not swap DatabaseName/TableName (privilege-escalation
  guard, nosql.js:323-335);
- metadata queries support begins_with / between / contains and
  post-query sort+limit (nosql.js:394-490, :291-307) — here plain Python
  predicates, since the catalog is small driver-side state.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import asdict, dataclass, field


@dataclass
class User:
    name: str
    groups: list[str] = field(default_factory=list)
    is_admin: bool = False
    is_poweruser: bool = False


@dataclass
class CatalogEntry:
    TableName: str
    DatabaseName: str = "default"
    DataType: str = "Custom"
    Type: str = "C"  # C=collection, CC=continuous, A=saved analysis
    QuerySettings: dict = field(default_factory=dict)
    Owners: list[str] = field(default_factory=list)
    Access: list[str] = field(default_factory=list)
    Active: bool = True
    Archive: bool = False
    ID: str = ""
    CreationUnixTime: float = 0.0

    def visible_to(self, user: User) -> bool:
        if user.is_admin or user.is_poweruser:
            return True
        principals = {user.name, *user.groups}
        return bool(principals & set(self.Owners)) or bool(principals & set(self.Access))

    def owned_by(self, user: User) -> bool:
        if user.is_admin:
            return True
        return bool({user.name, *user.groups} & set(self.Owners))


class Catalog:
    """JSON-lines-backed dataset catalog (one file per warehouse)."""

    def __init__(self, path: str | None = None):
        self.path = path
        self._entries: dict[str, CatalogEntry] = {}
        if path and os.path.exists(path):
            with open(path) as fh:
                for line in fh:
                    if line.strip():
                        e = CatalogEntry(**json.loads(line))
                        self._entries[e.ID] = e

    def _flush(self) -> None:
        if not self.path:
            return
        tmp = f"{self.path}.tmp.{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as fh:
            for e in self._entries.values():
                fh.write(json.dumps(asdict(e)) + "\n")
        os.replace(tmp, self.path)

    def record_query(self, entry: CatalogEntry, deactivate_older: bool = True) -> CatalogEntry:
        """Insert a catalog item; older active entries for the same
        (DatabaseName, TableName) are deactivated (controller.js behavior of
        superseding previous collections into the same table)."""
        if not entry.ID:
            entry.ID = uuid.uuid4().hex
        entry.CreationUnixTime = entry.CreationUnixTime or time.time()
        if deactivate_older:
            for other in self._entries.values():
                if (
                    other.Active
                    and other.TableName == entry.TableName
                    and other.DatabaseName == entry.DatabaseName
                ):
                    other.Active = False
        self._entries[entry.ID] = entry
        self._flush()
        return entry

    def update(self, entry_id: str, user: User, **changes) -> CatalogEntry:
        e = self._entries[entry_id]
        if not e.owned_by(user):
            raise PermissionError(f"{user.name} does not own {e.TableName}")
        # Immutable identity fields (privilege-escalation guard).
        for frozen in ("DatabaseName", "TableName", "ID"):
            if frozen in changes and changes[frozen] != getattr(e, frozen):
                raise ValueError(f"{frozen} is immutable on update")
        for k, v in changes.items():
            setattr(e, k, v)
        self._flush()
        return e

    def list(
        self,
        user: User,
        include_archived: bool = False,
        types: tuple[str, ...] | None = None,
        table_begins_with: str | None = None,
        table_contains: str | None = None,
        created_between: tuple[float, float] | None = None,
        sort_by: str | None = None,
        descending: bool = False,
        limit: int | None = None,
    ) -> list[CatalogEntry]:
        out = [e for e in self._entries.values() if e.visible_to(user)]
        if not include_archived:
            out = [e for e in out if not e.Archive]
        if types:
            out = [e for e in out if e.Type in types]
        if table_begins_with:
            out = [e for e in out if e.TableName.startswith(table_begins_with)]
        if table_contains:
            out = [e for e in out if table_contains in e.TableName]
        if created_between:
            lo, hi = created_between
            out = [e for e in out if lo <= e.CreationUnixTime <= hi]
        if sort_by:
            out.sort(key=lambda e: getattr(e, sort_by), reverse=descending)
        if limit is not None:
            out = out[:limit]
        return out

    def for_table(self, table: str, database: str = "default") -> CatalogEntry | None:
        live = [
            e
            for e in self._entries.values()
            if e.TableName == table and e.DatabaseName == database and e.Active
        ]
        return max(live, key=lambda e: e.CreationUnixTime) if live else None

    def authorize_tables(self, tables: list[str], user: User, database: str = "default") -> None:
        """Per-table ACL gate before query execution (Q3). Tables without a
        catalog entry are system/temp tables — admin-only. Qualified
        references (``db.table``) authorize against their own database's
        entries, not the caller-default one."""
        from logverzcore_spark.registry import split_table_ref

        for t in tables:
            if "." in t:
                db, bare = split_table_ref(t)
                entry = self.for_table(bare, db)
            else:
                entry = self.for_table(t, database)
            if entry is None:
                if not (user.is_admin or user.is_poweruser):
                    raise PermissionError(f"no catalog entry for table {t!r}")
                continue
            if not entry.visible_to(user):
                raise PermissionError(f"{user.name} may not query table {t!r}")

    def deactivate_table(self, table: str, user: User, database: str = "default") -> None:
        entry = self.for_table(table, database)
        if entry is not None:
            if not entry.owned_by(user):
                raise PermissionError(f"{user.name} does not own {table!r}")
            entry.Active = False
            self._flush()


@dataclass
class PreferenceItem:
    """One Logverz-Preferences row: a named, owner-gated opaque payload
    (UI settings, default views, dashboards). The reference keeps these
    in a DynamoDB table hash-keyed by ``Name`` only
    (infrastructure/templates/Logverz-Engine.json:240-256,
    ``LogverzPreferences``), with put/delete owner-gated through the
    same resource authorization as saved queries (nosql.js:92-103)."""

    Name: str
    Owners: list[str] = field(default_factory=list)
    Value: dict = field(default_factory=dict)
    UnixTime: float = 0.0

    def owned_by(self, user: User) -> bool:
        return user.is_admin or bool({user.name, *user.groups} & set(self.Owners))


class Preferences:
    """JSONL-backed preferences store — the Logverz-Preferences table's
    semantics on the same driver-local metadata substrate as ``Catalog``
    and ``AuditLog`` (one local write per mutation, never a Spark job).

    Semantics mirrored from the reference: items are keyed by bare
    ``Name`` (no database scoping — it is a user/UI settings table, not
    a data catalog); creating a free name claims it for the caller;
    updating or deleting an existing name requires ownership (admin
    bypass) — the nosql.js resource-based check for
    PutItem/DeleteItem on Logverz-Preferences; reads are open to any
    authenticated user (the reference gates reads only by the coarse
    user-based IAM authorize, which every interactive user passes)."""

    def __init__(self, path: str | None = None):
        self.path = path
        self._items: dict[str, PreferenceItem] = {}
        if path and os.path.exists(path):
            with open(path) as fh:
                for line in fh:
                    if line.strip():
                        it = PreferenceItem(**json.loads(line))
                        self._items[it.Name] = it

    def _flush(self) -> None:
        if not self.path:
            return
        tmp = f"{self.path}.tmp.{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as fh:
            for it in self._items.values():
                fh.write(json.dumps(asdict(it)) + "\n")
        os.replace(tmp, self.path)

    def put(self, name: str, value: dict, user: User) -> PreferenceItem:
        existing = self._items.get(name)
        if existing is not None and not existing.owned_by(user):
            raise PermissionError(
                f"{user.name} may not update preference {name!r} "
                f"owned by {existing.Owners}"
            )
        owners = existing.Owners if existing is not None else [user.name]
        item = PreferenceItem(
            Name=name, Owners=owners, Value=value, UnixTime=time.time()
        )
        self._items[name] = item
        self._flush()
        return item

    def get(self, name: str) -> PreferenceItem | None:
        return self._items.get(name)

    def delete(self, name: str, user: User) -> None:
        existing = self._items.get(name)
        if existing is None:
            return
        if not existing.owned_by(user):
            raise PermissionError(
                f"{user.name} may not delete preference {name!r} "
                f"owned by {existing.Owners}"
            )
        del self._items[name]
        self._flush()

    def list(self, name_begins_with: str | None = None) -> list[PreferenceItem]:
        out = list(self._items.values())
        if name_begins_with:
            out = [i for i in out if i.Name.startswith(name_begins_with)]
        return sorted(out, key=lambda i: i.Name)


@dataclass
class IdentityRecord:
    """One Logverz-Identities row: a persisted principal with its group
    membership and attached-policy state — the record the reference's
    identity-sync job mirrors from IAM into DynamoDB and every
    authorization check reads (Logverz-Engine.json:172-201 keys the
    table on (Name, Type); nosql.js:367-393 ``AdduserParams`` writes
    exactly these fields; authenticationsharedv3.js admincheck /
    powerusercheck read them back).

    ``Policies`` holds plain dicts (e.g. {"PolicyName": ...}) where the
    reference stores JSON strings — semantics mirrored, not the
    DynamoDB wire shape; ``Identities.resolve_user`` accepts both."""

    Name: str
    Type: str = "User"  # reference range key: User / UserAWS
    IAM: str = "true"
    IAMGroups: list[str] = field(default_factory=list)
    IAMPolicies: list = field(default_factory=list)
    Policies: dict = field(
        default_factory=lambda: {
            "GroupAttached": [], "GroupInline": [], "UserAttached": []
        }
    )
    UnixTime: float = 0.0


class Identities:
    """JSONL-backed identity store — Logverz-Identities semantics on the
    same driver-local metadata substrate as ``Catalog`` /
    ``Preferences`` / ``AuditLog``.

    Semantics mirrored from the reference:
    - records keyed by (Name, Type) (Logverz-Engine.json:177 KeySchema);
    - WRITES are admin-only: in the reference, PutItem on
      Logverz-Identities is reachable only through the identity-sync
      job / the engine role's IAM policy (Logverz-Engine.json:985),
      never through a user-gated resource check — so an interactive
      non-admin can NEVER write an identity record, which is exactly
      the escalation guard (you cannot grant yourself admin);
    - ``resolve_user`` derives the serving-seam ``User`` the way the
      reference's checks do: admin ⇔ an AdministratorAccess policy is
      attached at user/group/role level (authenticationsharedv3.js
      admincheck), poweruser ⇔ membership in a LogverzPowerUsers*
      group (powerusercheck matches 'LogverzPowerUsers-<region>' —
      prefix-matched here since the engine has no region);
    - unknown principals FAIL CLOSED: a name with no record resolves
      to a no-group, no-flag ``User`` (the reference denies when the
      identity lookup returns nothing).
    """

    ADMIN_POLICY = "AdministratorAccess"
    POWERUSER_GROUP_PREFIX = "LogverzPowerUsers"

    def __init__(self, path: str | None = None):
        self.path = path
        self._items: dict[tuple[str, str], IdentityRecord] = {}
        if path and os.path.exists(path):
            with open(path) as fh:
                for line in fh:
                    if line.strip():
                        it = IdentityRecord(**json.loads(line))
                        self._items[(it.Name, it.Type)] = it

    def _flush(self) -> None:
        if not self.path:
            return
        tmp = f"{self.path}.tmp.{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as fh:
            for it in self._items.values():
                fh.write(json.dumps(asdict(it)) + "\n")
        os.replace(tmp, self.path)

    def put(
        self,
        name: str,
        user: User,
        type: str = "User",
        iam_groups: list[str] | None = None,
        iam_policies: list | None = None,
        policies: dict | None = None,
    ) -> IdentityRecord:
        if not user.is_admin:
            raise PermissionError(
                f"{user.name} may not write identity records (admin-only "
                "store — the escalation guard: a non-admin cannot grant "
                "themselves groups or policies)"
            )
        rec = IdentityRecord(
            Name=name,
            Type=type,
            IAMGroups=list(iam_groups or []),
            IAMPolicies=list(iam_policies or []),
            Policies=policies
            or {"GroupAttached": [], "GroupInline": [], "UserAttached": []},
            UnixTime=time.time(),
        )
        self._items[(name, type)] = rec
        self._flush()
        return rec

    def delete(self, name: str, user: User, type: str = "User") -> None:
        if not user.is_admin:
            raise PermissionError(
                f"{user.name} may not delete identity records (admin-only)"
            )
        self._items.pop((name, type), None)
        self._flush()

    def get(self, name: str, type: str = "User") -> IdentityRecord | None:
        return self._items.get((name, type))

    def list(self, type: str | None = None) -> list[IdentityRecord]:
        """All records, optionally one Type partition — the TypeIndex
        GSI's access path (Logverz-Engine.json:186-192)."""
        out = list(self._items.values())
        if type is not None:
            out = [r for r in out if r.Type == type]
        return sorted(out, key=lambda r: (r.Type, r.Name))

    @staticmethod
    def _policy_names(policies) -> set[str]:
        names = set()
        for p in policies or []:
            if isinstance(p, str):
                try:
                    p = json.loads(p)
                except ValueError:
                    names.add(p)
                    continue
            if isinstance(p, dict):
                n = p.get("PolicyName")
                if n:
                    names.add(n)
            else:
                names.add(str(p))
        return names

    def resolve_user(self, name: str, type: str = "User") -> User:
        rec = self.get(name, type)
        if rec is None:
            return User(name=name)  # fail closed: no groups, no flags
        attached = set()
        for level in ("UserAttached", "GroupAttached", "GroupInline",
                      "RoleAttached"):
            attached |= self._policy_names((rec.Policies or {}).get(level))
        return User(
            name=rec.Name,
            groups=list(rec.IAMGroups),
            is_admin=self.ADMIN_POLICY in attached,
            is_poweruser=any(
                g.startswith(self.POWERUSER_GROUP_PREFIX) for g in rec.IAMGroups
            ),
        )
