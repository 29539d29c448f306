"""Interactive-query audit log — the reference's Logverz-Invocations
records for the interactive path.

The reference writes one Invocations item per interactive query before
executing it (p2pconnection.js:188-195: user, query text, timestamp) so
operators can answer "who ran what, when, and did it succeed". That
store is DynamoDB — driver-side metadata, not analytic data — so here it
is the same JSONL-persisted store shape as ``Catalog``: appends are one
local write, never a Spark job, so auditing adds no per-query cluster
work (no write-amplification at any query rate). ``enabled=False``
turns recording into a no-op for tight benchmarking loops.

Denied and invalid attempts are recorded too (status ``denied`` /
``invalid``) — the audit trail is most valuable exactly when the gate
fires.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import asdict, dataclass, field


@dataclass
class AuditRecord:
    User: str
    Mode: str  # sql | explain | find | saved | chunked
    Query: str
    Tables: list[str] = field(default_factory=list)
    Status: str = "ok"  # ok | denied | invalid | error
    Error: str = ""
    ID: str = ""
    UnixTime: float = 0.0


class AuditLog:
    """Append-only invocation log with JSONL persistence."""

    def __init__(
        self,
        path: str | None = None,
        enabled: bool = True,
        max_memory_records: int = 100_000,
    ):
        """``max_memory_records`` bounds the IN-MEMORY window (what
        ``entries``/``audit_df`` serve) so a long-lived server's audit
        log cannot grow without limit; the JSONL file keeps the full
        history (the DynamoDB-table analog — archive/compact it with
        ordinary file tooling)."""
        self.path = path
        self.enabled = enabled
        self.max_memory_records = max_memory_records
        self._records: list[AuditRecord] = []
        if path and os.path.exists(path):
            # Stream the reload through a bounded deque of raw lines so
            # peak memory tracks the WINDOW, not the file: a years-old
            # history must not be fully parsed just to keep its tail.
            from collections import deque

            with open(path) as fh:
                tail = deque(
                    (line for line in fh if line.strip()),
                    maxlen=max_memory_records,
                )
            self._records = [AuditRecord(**json.loads(line)) for line in tail]

    def _trim(self) -> None:
        excess = len(self._records) - self.max_memory_records
        if excess > 0:
            del self._records[:excess]

    def record(
        self,
        user: str,
        mode: str,
        query: str,
        tables: list[str] | None = None,
        status: str = "ok",
        error: str = "",
    ) -> AuditRecord | None:
        if not self.enabled:
            return None
        rec = AuditRecord(
            User=user,
            Mode=mode,
            Query=query,
            Tables=list(tables or []),
            Status=status,
            Error=error,
            ID=uuid.uuid4().hex,
            UnixTime=time.time(),
        )
        self._records.append(rec)
        self._trim()
        if self.path:
            # One O_APPEND write() per record: the kernel positions at
            # EOF atomically per call, so records from SEVERAL engine
            # processes sharing one audit file interleave whole-line,
            # never mid-record (local filesystems; NFS's O_APPEND is
            # not atomic — give each process its own file there and
            # concatenate, the classic log-shipping shape). Appends
            # need no CAS: the audit log is a set of immutable events,
            # not read-modify-write state like the catalog
            # (test_metastore.py proves the two-process interleave).
            line = (json.dumps(asdict(rec)) + "\n").encode("utf-8")
            fd = os.open(self.path, os.O_WRONLY | os.O_APPEND | os.O_CREAT, 0o644)
            try:
                os.write(fd, line)
            finally:
                os.close(fd)
        return rec

    def entries(
        self,
        user: str | None = None,
        status: str | None = None,
        mode: str | None = None,
    ) -> list[AuditRecord]:
        out = self._records
        if user is not None:
            out = [r for r in out if r.User == user]
        if status is not None:
            out = [r for r in out if r.Status == status]
        if mode is not None:
            out = [r for r in out if r.Mode == mode]
        return list(out)


__all__ = ["AuditLog", "AuditRecord"]
