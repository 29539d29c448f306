"""Multi-process-safe metadata substrate: a generation-CAS'd record
store over the :mod:`fsutil` commit-backend seam.

WHY THIS EXISTS — the reference keeps its catalog / preferences /
identities metadata in DynamoDB, where every write is an ITEM-LEVEL
conditional PutItem (nosql.js:309-354): two engine processes sharing
one deployment never lose each other's rows. The repo's JSONL stores
(catalog.py) had single-process crash-safety (tmp + os.replace) but
were read-modify-write over the whole file — the last flush of two
processes sharing a warehouse silently dropped the other's entries.
This module closes that gap with the same optimistic-concurrency
discipline the snapshot layer enforces for manifests:

- the store's state is ONE immutable JSON file per generation,
  ``gen-%012d.json`` under the store directory; the head is the
  highest generation present;
- a mutation is CAS: read head N, apply the mutation function to the
  parsed records, commit the result as generation N+1 via the
  backend's ``put_if_absent`` (exactly-one-winner, whole-or-absent —
  fsutil's contract); a loser re-reads the NEW head and RE-APPLIES its
  mutation to the merged state, so concurrent writers interleave
  item-level like DynamoDB instead of clobbering file-level;
- generations older than ``keep_generations`` behind the head are
  pruned best-effort after each commit (readers always resolve the
  head by listing, and re-list on the narrow race where their chosen
  head was pruned underneath them — only possible when a writer has
  already advanced far past it).

The mutation function must therefore be PURE over its input records
(it may run several times under contention) — the store classes in
catalog.py build their mutators this way.

Cost model: every commit rewrites the full record list — correct
trade for this data, which is metadata-scale (catalog rows, user
records, UI preferences: thousands, not millions) and read-mostly;
the reference's DynamoDB tables are similarly small. Data-scale state
(the tables themselves, snapshots) lives in parquet + manifests, not
here.

Backends: default :class:`fsutil.LocalFSBackend` (plain-os hard-link
conditional create — lock-free, no JVM, POSIX/NFS-sound), so the
metadata stores keep working without a SparkSession; a warehouse on
HDFS passes ``HadoopRenameBackend(spark)``, an object store a
:class:`fsutil.ConditionalPutBackend` — one contract, three
deployments.
"""

from __future__ import annotations

import json
import re
from typing import Any, Callable

from logverzcore_spark.fsutil import CommitConflict, LocalFSBackend

_GEN_RE = re.compile(r"^gen-(\d{12})\.json$")


class GenerationStore:
    """CAS'd list-of-records store (see module docstring)."""

    def __init__(self, dir_path: str, backend=None, keep_generations: int = 8):
        if keep_generations < 2:
            raise ValueError("keep_generations must be >= 2")
        self.dir = dir_path.rstrip("/")
        self.backend = backend if backend is not None else LocalFSBackend()
        self.keep_generations = keep_generations

    def _gen_path(self, gen: int) -> str:
        return f"{self.dir}/gen-{gen:012d}.json"

    def _list_gens(self) -> list[int]:
        out = []
        for name in self.backend.list_dir(self.dir):
            m = _GEN_RE.match(name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def head(self) -> tuple[int, list[dict]]:
        """(generation, records) at the current head; (0, []) when the
        store is empty. Re-lists on the pruned-under-us race."""
        for _ in range(8):
            gens = self._list_gens()
            if not gens:
                return 0, []
            try:
                raw = self.backend.read_bytes(self._gen_path(gens[-1]))
            except FileNotFoundError:
                continue  # head pruned between list and read — re-list
            return gens[-1], json.loads(raw.decode("utf-8"))
        raise IOError(f"could not resolve a stable head in {self.dir}")

    def mutate(
        self,
        fn: Callable[[list[dict]], tuple[list[dict], Any]],
        max_retries: int = 64,
    ):
        """Optimistic read-modify-commit: ``fn(records) -> (new_records,
        result)`` is applied to the freshest head and committed as the
        next generation; on :class:`CommitConflict` the head is
        re-read and ``fn`` RE-APPLIED to the other writer's outcome —
        no lost updates, item-level interleaving. ``fn`` must be pure
        over its input (it may run several times)."""
        import time

        for attempt in range(max_retries):
            gen, records = self.head()
            new_records, result = fn(records)
            try:
                self.backend.put_if_absent(
                    self._gen_path(gen + 1),
                    json.dumps(new_records).encode("utf-8"),
                )
            except CommitConflict:
                # Brief growing pause before re-reading: on rename
                # backends the winner may still hold the commit lock
                # (its gen not yet visible), so an immediate retry can
                # spin on the same generation; the sleep is bounded and
                # only paid under real contention.
                time.sleep(min(0.01 * attempt, 0.2))
                continue
            self._prune(gen + 1)
            return result
        raise CommitConflict(
            f"gave up after {max_retries} CAS attempts in {self.dir} — "
            f"pathological write contention or a stuck orphan lock "
            f"(rename backends: fsutil.break_commit_lock)"
        )

    def _prune(self, head_gen: int) -> None:
        """Best-effort removal of generations far behind the head (and
        any stale rename-backend leftovers would be .part/.lock names
        the generation regex never matches)."""
        cutoff = head_gen - self.keep_generations
        for g in self._list_gens():
            if g <= cutoff:
                try:
                    self.backend.delete(self._gen_path(g))
                except OSError:
                    pass
