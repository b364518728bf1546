"""Writer leases: epoch-based fencing for the sink's single-writer
contract.

The bucketed sink (:mod:`kettleray.io.sink`) is single-writer by
contract — concurrent committers are *detected* (version-slot rename
collisions) but a **zombie driver** (an old ingest job that stalled,
was presumed dead, and was replaced) can still wake up and publish a
commit built from a stale view. Epoch leases close that hole the way
HDFS lease recovery / Delta Lake transaction epochs do (public
designs; no Kettle analog — Kettle's Carte assumes one live run):

- ``acquire_lease(root, writer_id)`` claims the next **epoch** for the
  table: a monotonically increasing integer, claimed crash-safely with
  the same fsync + ``os.link`` exclusive-claim discipline the snapshot
  catalog uses (catalog.py: commit_snapshot). Acquiring *fences every
  earlier holder* — there is no unlock step to forget, and a crashed
  holder needs no cleanup (its epoch file is inert).
- ``WriterLease.check()`` re-reads the lease directory (one listdir —
  metadata-sized, never data-sized) and raises :class:`FencedWriterError`
  if a higher epoch exists.
- The sink calls ``check_registered(root)`` inside ``_write_current``
  — the ONE choke point every committer (COW, MOR, SCD2, append_log,
  compaction, rebucket, streaming handoff) funnels through to make a
  version visible. A fenced writer's stage→vN rename may still land,
  but the version is never published: readers only trust CURRENT, and
  ``_next_version`` / ``gc_versions`` already skip and reap exactly
  this kind of orphan.

Race window, stated honestly: ``check()`` → pointer-write is not
atomic, so a writer fenced *between* those two syscalls can still
publish one last commit. That commit is built from a consistent view
and serializes before the new holder's first commit (whose
``_next_version`` scan sees it) — indistinguishable from the zombie
having committed just *before* handover, which no lease protocol can
exclude without a consensus service. What the lease guarantees is
**monotone handover**: after the new holder's first successful
publish, every later zombie publish attempt raises.

Scale shape: a lease costs one tiny JSON file per acquire and one
listdir per commit — independent of table size; suitable for the
10^10-event trickle-commit cadence.
"""
from __future__ import annotations

import json
import os
import time
import uuid

__all__ = ["FencedWriterError", "WriterLease", "acquire_lease",
           "release_lease", "current_epoch", "check_registered"]

_LEASE_DIR = "_lease"

# Most-recently-acquired lease per table root IN THIS PROCESS. The sink
# consults this from _write_current; a process that never acquired a
# lease for a root commits unguarded (fencing is opt-in per writer —
# but any acquire on disk fences every OTHER acquirer, cross-process,
# because check() reads the directory, not this dict).
_ACTIVE: dict[str, "WriterLease"] = {}


class FencedWriterError(RuntimeError):
    """This writer's lease epoch has been superseded by a newer holder."""


def _dir(root: str) -> str:
    return os.path.join(os.path.abspath(root), _LEASE_DIR)


def _epoch_path(root: str, e: int) -> str:
    return os.path.join(_dir(root), f"epoch_{e:08d}.json")


def _max_epoch(root: str) -> tuple[int | None, str | None]:
    """Highest claimed epoch on disk and its writer id (None, None if
    no lease was ever taken)."""
    d = _dir(root)
    if not os.path.isdir(d):
        return None, None
    mx, holder = None, None
    for fn in os.listdir(d):
        if not (fn.startswith("epoch_") and fn.endswith(".json")):
            continue
        try:
            e = int(fn[len("epoch_"):-len(".json")])
        except ValueError:
            continue
        if mx is None or e > mx:
            mx = e
            try:
                with open(os.path.join(d, fn)) as f:
                    holder = json.load(f).get("writer")
            except (OSError, json.JSONDecodeError):
                holder = None       # claim file torn mid-read: id unknown
    return mx, holder


class WriterLease:
    """A claimed epoch on one table root. ``check()`` before trusting
    the claim; cheap enough to run per commit."""

    def __init__(self, root: str, writer_id: str, epoch: int):
        self.root = os.path.abspath(root)
        self.writer_id = writer_id
        self.epoch = epoch

    def check(self) -> None:
        mx, holder = _max_epoch(self.root)
        if mx is None or mx > self.epoch:
            raise FencedWriterError(
                f"writer {self.writer_id!r} (epoch {self.epoch}) fenced "
                f"on {self.root}: epoch {mx} is held by {holder!r}")

    def activate(self) -> "WriterLease":
        """(Re-)register as this process's guarding lease for the root
        (acquire_lease does this automatically)."""
        _ACTIVE[self.root] = self
        return self

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return (f"WriterLease(root={self.root!r}, "
                f"writer={self.writer_id!r}, epoch={self.epoch})")


def acquire_lease(root: str, writer_id: str | None = None) -> WriterLease:
    """Claim the next epoch on ``root``, fencing all earlier holders,
    and register it as this process's guard for the root.

    Crash-safe CAS: write a tmp (fsynced), ``os.link`` it to the epoch
    slot — EEXIST means another acquirer won that epoch; rebase on the
    new max and retry. No unlink of old epochs is ever needed."""
    wid = writer_id or f"writer-{uuid.uuid4().hex[:8]}"
    d = _dir(root)
    os.makedirs(d, exist_ok=True)
    while True:
        mx, _ = _max_epoch(root)
        e = 1 if mx is None else mx + 1
        tmp = _epoch_path(root, e) + f".{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "w") as f:
            json.dump({"epoch": e, "writer": wid, "ts": time.time()}, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, _epoch_path(root, e))      # exclusive claim
        except FileExistsError:
            os.unlink(tmp)
            continue                                # lost the race: rebase
        os.unlink(tmp)
        return WriterLease(root, wid, e).activate()


def release_lease(lease: WriterLease) -> None:
    """Unregister the process-local guard. The epoch file stays (inert):
    release does NOT un-fence — only a new acquire changes who may
    write."""
    cur = _ACTIVE.get(lease.root)
    if cur is lease:
        del _ACTIVE[lease.root]


def current_epoch(root: str) -> int | None:
    """Highest epoch claimed on ``root`` (None if never leased)."""
    return _max_epoch(root)[0]


def check_registered(root: str) -> None:
    """Sink hook: if this process holds a lease for ``root``, verify it
    still wins; no-op otherwise. Called from sink._write_current so
    every publish path is covered without threading a parameter through
    each committer."""
    lease = _ACTIVE.get(os.path.abspath(root))
    if lease is not None:
        lease.check()
