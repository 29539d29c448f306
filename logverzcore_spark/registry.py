"""Database registry — the reference's multi-target-DB support.

The reference keeps a registry of analytics databases in SSM
``/Logverz/Database/Registry`` (a delimited list of connection
descriptors: ``LogverzDBFriendlyName``, engine type, endpoint, port,
secret ref — commonsharedv3.js:130-198) and resolves a friendly name to
a live connection per job/query (``LookupDBParameters``,
enginesharedv3.mjs:371-407; sqlproxy.mjs resolves the query target the
same way). Collection jobs and interactive queries both address tables
as (database, table).

Spark mapping (SURVEY §1.5): a registered database is a Spark catalog
DATABASE with its own warehouse LOCATION — separate storage roots stand
in for separate RDS instances. Friendly names resolve through this
registry (never raw user strings → no SQL-injection surface on CREATE
DATABASE), and every table write/read addresses ``db``.``table``.
The registry persists as JSON lines next to the dataset catalog.
"""

from __future__ import annotations

import json
import os
import re
import uuid
from dataclasses import asdict, dataclass, field

from pyspark.sql import SparkSession

#: Friendly names must be safe SQL identifiers — the reference restricted
#: names the same way (CloudFormation parameter pattern).
_NAME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9_]{0,63}$")


@dataclass
class DatabaseEntry:
    name: str
    location: str | None = None  # None → session default warehouse
    description: str = ""
    properties: dict = field(default_factory=dict)


class DatabaseRegistry:
    """Friendly-name → Spark database resolver with JSONL persistence."""

    def __init__(self, spark: SparkSession, path: str | None = None):
        self.spark = spark
        self.path = path
        self._entries: dict[str, DatabaseEntry] = {
            "default": DatabaseEntry(name="default", description="session default warehouse")
        }
        if path and os.path.exists(path):
            with open(path) as fh:
                for line in fh:
                    if line.strip():
                        e = DatabaseEntry(**json.loads(line))
                        self._entries[e.name] = e
                        self._ensure_database(e)

    def _flush(self) -> None:
        if not self.path:
            return
        tmp = f"{self.path}.tmp.{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as fh:
            for e in self._entries.values():
                if e.name != "default":
                    fh.write(json.dumps(asdict(e)) + "\n")
        os.replace(tmp, self.path)

    def _ensure_database(self, entry: DatabaseEntry) -> None:
        loc = f" LOCATION '{entry.location}'" if entry.location else ""
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS `{entry.name}`{loc}")

    def register(
        self, name: str, location: str | None = None, description: str = ""
    ) -> DatabaseEntry:
        """Create-or-attach a database under ``name``. Re-registering an
        existing name with a DIFFERENT location is rejected (the
        reference treats the registry as append-only per name)."""
        if not _NAME_RE.match(name):
            raise ValueError(f"invalid database name: {name!r}")
        existing = self._entries.get(name)
        if existing is not None:
            if location and existing.location and location != existing.location:
                raise ValueError(
                    f"database {name!r} already registered at {existing.location!r}"
                )
            return existing
        entry = DatabaseEntry(name=name, location=location, description=description)
        self._ensure_database(entry)
        self._entries[name] = entry
        self._flush()
        return entry

    def resolve(self, name: str) -> DatabaseEntry:
        """Friendly name → entry; unknown names are an error, exactly like
        the reference's unknown ``LogverzDBFriendlyName``."""
        try:
            return self._entries[name]
        except KeyError:
            raise KeyError(
                f"database {name!r} is not registered "
                f"(known: {sorted(self._entries)})"
            ) from None

    def qualified(self, database: str, table: str) -> str:
        """Backtick-quoted ``db.table`` reference for a REGISTERED db.

        The table name gets the same identifier validation as database
        names: it can originate from user-facing job settings
        (CollectJob.table via Engine.submit_job), and a backtick inside
        an unvalidated name would escape the quoting and redirect the
        write — exactly the injection surface the registry exists to
        close."""
        self.resolve(database)
        if not _NAME_RE.match(table):
            raise ValueError(f"invalid table name: {table!r}")
        return f"`{database}`.`{table}`"

    def list(self) -> list[DatabaseEntry]:
        return sorted(self._entries.values(), key=lambda e: e.name)

    def drop(self, name: str, cascade: bool = False) -> None:
        if name == "default":
            raise ValueError("the default database cannot be dropped")
        self.resolve(name)
        self.spark.sql(f"DROP DATABASE IF EXISTS `{name}`" + (" CASCADE" if cascade else ""))
        del self._entries[name]
        self._flush()


def validate_table_name(name: str) -> str:
    """Validate a (possibly db-qualified) table name against the same
    identifier rule as database names; returns it unchanged. Applied to
    every sink name that can originate outside the engine (job target,
    quarantine/metrics tables) so no name ever needs escaping."""
    for part in name.split("."):
        if not _NAME_RE.match(part):
            raise ValueError(f"invalid table name: {name!r}")
    return name


def split_table_ref(ref: str) -> tuple[str, str]:
    """Split a possibly-qualified table reference into (database, table).

    ``t`` → ("default", "t"); ``db.t`` → ("db", "t");
    ``spark_catalog.db.t`` → ("db", "t"). Used by ACL checks so a
    db-qualified query authorizes against the right catalog entries.
    """
    parts = [p.strip("`") for p in ref.split(".")]
    if len(parts) == 1:
        return "default", parts[0]
    return parts[-2], parts[-1]


__all__ = ["DatabaseEntry", "DatabaseRegistry", "split_table_ref", "validate_table_name"]
