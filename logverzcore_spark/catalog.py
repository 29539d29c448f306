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

Persistence has two modes, one seam (``_MetaStoreMixin``):

- ``path=<file>.jsonl`` (default): single-process JSONL with
  crash-safe whole-file flushes (tmp + os.replace) — the embedded /
  one-engine shape;
- ``shared=True, path=<directory>``: the multi-process shape — every
  mutation is an item-level CAS through
  :class:`metastore.GenerationStore`, so several engine processes
  sharing one warehouse interleave writes without loss, the parity
  point with the reference's conditional DynamoDB PutItem
  (nosql.js:309-354). Mutators are written as PURE functions over the
  parsed record map exactly so the CAS loop can re-apply them to a
  concurrent writer's outcome.
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


class _MetaStoreMixin:
    """Shared persistence for the three metadata stores (module
    docstring): legacy single-process JSONL, or shared-directory CAS
    via GenerationStore. Subclasses supply ``_parse_record`` /
    ``_record_key``; mutators call ``_mutate(fn)`` with fn PURE over
    the item map (it re-runs on CAS conflict); readers call
    ``_refresh()`` first so a shared store sees other processes'
    commits."""

    def _init_store(self, path: str | None, shared: bool, backend) -> None:
        self.path = path
        self._gen = None
        self._items: dict = {}
        if shared:
            if not path:
                raise ValueError("shared=True requires a directory path")
            from logverzcore_spark.metastore import GenerationStore

            self._gen = GenerationStore(path, backend=backend)
            self._refresh()
        elif path and os.path.exists(path):
            with open(path) as fh:
                for line in fh:
                    if line.strip():
                        obj = self._parse_record(json.loads(line))
                        self._items[self._record_key(obj)] = obj

    def _parse_record(self, d: dict):
        raise NotImplementedError

    def _record_key(self, obj):
        raise NotImplementedError

    def _parse_all(self, records: list[dict]) -> dict:
        items: dict = {}
        for d in records:
            obj = self._parse_record(d)
            items[self._record_key(obj)] = obj
        return items

    def _refresh(self) -> None:
        if self._gen is not None:
            _, records = self._gen.head()
            self._items = self._parse_all(records)

    def _mutate(self, fn):
        """Apply ``fn(items) -> result`` and persist. Single-process:
        in place + flush. Shared: CAS loop — fn re-applies to the
        freshest head on conflict, so two processes' mutations both
        land (item-level interleaving, no lost updates)."""
        if self._gen is None:
            result = fn(self._items)
            self._flush()
            return result
        state: dict = {}

        def raw_fn(records: list[dict]):
            items = self._parse_all(records)
            result = fn(items)
            state["items"], state["result"] = items, result
            return [asdict(o) for o in items.values()], result

        self._gen.mutate(raw_fn)
        self._items = state["items"]
        return state["result"]

    def _flush(self) -> None:
        if not self.path or self._gen is not None:
            return
        tmp = f"{self.path}.tmp.{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as fh:
            for obj in self._items.values():
                fh.write(json.dumps(asdict(obj)) + "\n")
        os.replace(tmp, self.path)


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


class Catalog(_MetaStoreMixin):
    """Dataset catalog — JSONL file (single-process) or shared CAS
    directory (``shared=True`` — several engine processes, no lost
    writes; the DynamoDB-parity mode)."""

    def __init__(self, path: str | None = None, shared: bool = False,
                 backend=None):
        self._init_store(path, shared, backend)

    def _parse_record(self, d: dict) -> CatalogEntry:
        return CatalogEntry(**d)

    def _record_key(self, e: CatalogEntry) -> str:
        return e.ID

    def record_query(self, entry: CatalogEntry, deactivate_older: bool = True) -> CatalogEntry:
        """Insert a catalog item; older active entries for the same
        (DatabaseName, TableName) are deactivated (controller.js behavior of
        superseding previous collections into the same table)."""
        if not entry.ID:
            entry.ID = uuid.uuid4().hex
        entry.CreationUnixTime = entry.CreationUnixTime or time.time()

        def fn(items: dict[str, CatalogEntry]) -> CatalogEntry:
            if deactivate_older:
                for other in items.values():
                    if (
                        other.Active
                        and other.TableName == entry.TableName
                        and other.DatabaseName == entry.DatabaseName
                    ):
                        other.Active = False
            items[entry.ID] = entry
            return entry

        return self._mutate(fn)

    def update(self, entry_id: str, user: User, **changes) -> CatalogEntry:
        def fn(items: dict[str, CatalogEntry]) -> CatalogEntry:
            e = items[entry_id]
            if not e.owned_by(user):
                raise PermissionError(f"{user.name} does not own {e.TableName}")
            # Immutable identity fields (privilege-escalation guard).
            for frozen in ("DatabaseName", "TableName", "ID"):
                if frozen in changes and changes[frozen] != getattr(e, frozen):
                    raise ValueError(f"{frozen} is immutable on update")
            for k, v in changes.items():
                setattr(e, k, v)
            return e

        return self._mutate(fn)

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
        self._refresh()
        out = [e for e in self._items.values() if e.visible_to(user)]
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
        self._refresh()
        live = [
            e
            for e in self._items.values()
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
        if self.for_table(table, database) is None:
            return

        def fn(items: dict[str, CatalogEntry]) -> None:
            live = [
                e for e in items.values()
                if e.TableName == table and e.DatabaseName == database and e.Active
            ]
            entry = max(live, key=lambda e: e.CreationUnixTime) if live else None
            if entry is None:
                return  # another process already deactivated it
            if not entry.owned_by(user):
                raise PermissionError(f"{user.name} does not own {table!r}")
            entry.Active = False

        self._mutate(fn)


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


class Preferences(_MetaStoreMixin):
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

    def __init__(self, path: str | None = None, shared: bool = False,
                 backend=None):
        self._init_store(path, shared, backend)

    def _parse_record(self, d: dict) -> PreferenceItem:
        return PreferenceItem(**d)

    def _record_key(self, it: PreferenceItem) -> str:
        return it.Name

    def put(self, name: str, value: dict, user: User) -> PreferenceItem:
        def fn(items: dict[str, PreferenceItem]) -> PreferenceItem:
            existing = items.get(name)
            if existing is not None and not existing.owned_by(user):
                raise PermissionError(
                    f"{user.name} may not update preference {name!r} "
                    f"owned by {existing.Owners}"
                )
            owners = existing.Owners if existing is not None else [user.name]
            item = PreferenceItem(
                Name=name, Owners=owners, Value=value, UnixTime=time.time()
            )
            items[name] = item
            return item

        return self._mutate(fn)

    def get(self, name: str) -> PreferenceItem | None:
        self._refresh()
        return self._items.get(name)

    def delete(self, name: str, user: User) -> None:
        if self.get(name) is None:
            return

        def fn(items: dict[str, PreferenceItem]) -> None:
            existing = items.get(name)
            if existing is None:
                return  # another process already deleted it
            if not existing.owned_by(user):
                raise PermissionError(
                    f"{user.name} may not delete preference {name!r} "
                    f"owned by {existing.Owners}"
                )
            del items[name]

        self._mutate(fn)

    def list(self, name_begins_with: str | None = None) -> list[PreferenceItem]:
        self._refresh()
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


class Identities(_MetaStoreMixin):
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

    def __init__(self, path: str | None = None, shared: bool = False,
                 backend=None):
        self._init_store(path, shared, backend)

    def _parse_record(self, d: dict) -> IdentityRecord:
        return IdentityRecord(**d)

    def _record_key(self, it: IdentityRecord) -> tuple[str, str]:
        return (it.Name, it.Type)

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

        def fn(items: dict[tuple[str, str], IdentityRecord]) -> IdentityRecord:
            items[(name, type)] = rec
            return rec

        return self._mutate(fn)

    def delete(self, name: str, user: User, type: str = "User") -> None:
        if not user.is_admin:
            raise PermissionError(
                f"{user.name} may not delete identity records (admin-only)"
            )

        def fn(items: dict[tuple[str, str], IdentityRecord]) -> None:
            items.pop((name, type), None)

        self._mutate(fn)

    def get(self, name: str, type: str = "User") -> IdentityRecord | None:
        self._refresh()
        return self._items.get((name, type))

    def list(self, type: str | None = None) -> list[IdentityRecord]:
        """All records, optionally one Type partition — the TypeIndex
        GSI's access path (Logverz-Engine.json:186-192)."""
        self._refresh()
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
