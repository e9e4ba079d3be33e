"""Crash-safe directory replacement, shared by every table-commit path.

One protocol, one recovery rule (review finding: three hand-rolled copies
of the rename dance had divergent crash-window behavior):

- ``atomic_replace(path, write_fn)``: write the replacement to a hidden
  sibling via ``write_fn``, move the live dir aside, rename the new one
  in, drop the old copy.  At every instant a complete table exists at
  ``path`` or its old-sibling.
- ``heal(path)``: if a previous writer died between the two renames
  (live missing, old-sibling present), rename the old copy back.  Every
  reader/writer entry point calls this first, so the crash window
  self-repairs on the next touch instead of requiring manual recovery.

Sibling names are DOT-PREFIXED (``.<name>.__old`` / ``.<name>.__new``) so
that when ``path`` is a partition directory inside a partitioned table,
Spark's partition discovery ignores the in-flight siblings — a visible
``part_date=X.__old`` dir would be parsed as a partition with a garbage
value and silently corrupt date-pruned reads (review finding).  The same
naming is used for standalone table dirs for consistency.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable


def old_sibling(path: str) -> str:
    parent, base = os.path.split(os.path.normpath(path))
    return os.path.join(parent, f".{base}.__old")


def new_sibling(path: str) -> str:
    parent, base = os.path.split(os.path.normpath(path))
    return os.path.join(parent, f".{base}.__new")


def is_swap_sibling(name: str) -> bool:
    """True for directory BASENAMES created by this module's protocol —
    iteration over a table's partition dirs must skip these."""
    return name.startswith(".") and (
        name.endswith(".__old") or name.endswith(".__new")
    )


def heal(path: str) -> bool:
    """Restore ``path`` from its old-sibling if a crash left the live
    directory missing.  Returns True if a restore happened.

    Also recognizes the pre-dot-prefix sibling name (``<path>.__old``)
    that an earlier protocol version wrote, so debris from before the
    naming change still self-repairs instead of requiring surgery.
    """
    restored = False
    for old in (old_sibling(path), path + ".__old"):
        if os.path.exists(old):
            if not os.path.exists(path):
                os.rename(old, path)
                restored = True
            else:
                shutil.rmtree(old, ignore_errors=True)  # fully-swapped leftover
    return restored


def heal_partition_dirs(table_path: str, prefix: str = "part_date=") -> None:
    """Sweep a partitioned table dir for swap debris: restore any
    partition whose live dir is missing but whose ``.__old`` backup
    exists, and clear fully-swapped ``.__old`` / half-written ``.__new``
    siblings.  The single shared recovery pass for every per-partition
    writer (the dedup rewrite and the compactor)."""
    if not os.path.isdir(table_path):
        return
    for entry in os.listdir(table_path):
        full = os.path.join(table_path, entry)
        if not (entry.startswith(".") and entry[1:].startswith(prefix)):
            continue
        if entry.endswith(".__old"):
            live = os.path.join(table_path, entry[1 : -len(".__old")])
            if not os.path.exists(live):
                os.rename(full, live)
            else:
                shutil.rmtree(full, ignore_errors=True)
        elif entry.endswith(".__new"):
            shutil.rmtree(full, ignore_errors=True)


def atomic_replace(
    path: str,
    write_fn: Callable[[str], None],
    abort_unless: Callable[[], bool] | None = None,
) -> bool:
    """Replace the directory at ``path`` with whatever ``write_fn(tmp)``
    writes, crash-safely (see module docstring).  ``path`` need not exist
    yet (first write).

    ``abort_unless``: optional last-moment guard evaluated AFTER the tmp
    write, immediately before the swap.  Returning False aborts: tmp is
    discarded, ``path`` untouched, and this function returns False.  Used
    by compaction to detect a concurrent writer having appended files
    since the read snapshot (the remaining race window is the guard-to-
    rename gap — microseconds instead of the whole rewrite).
    """
    heal(path)
    tmp, old = new_sibling(path), old_sibling(path)
    shutil.rmtree(tmp, ignore_errors=True)
    write_fn(tmp)
    if abort_unless is not None and not abort_unless():
        shutil.rmtree(tmp, ignore_errors=True)
        return False
    shutil.rmtree(old, ignore_errors=True)  # leftover from a prior crash
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return True


# ---------------------------------------------------------------------------
# Append-only batch-directory stores (the ``root/batch=X`` commit
# primitive shared by the incremental dedup stores).
# ---------------------------------------------------------------------------


def batch_dirs(root: str) -> set[str]:
    """Live ``batch=X`` entries under ``root`` (staging dirs excluded)."""
    return {
        e for e in os.listdir(root)
        if e.startswith("batch=") and not e.startswith(".")
    }


def sweep_staging(root: str) -> None:
    """Remove stale ``.batch=X.__new`` staging dirs (a crash between the
    parquet write and the rename leaves one; it is never live)."""
    import shutil

    for e in os.listdir(root):
        if e.startswith(".") and e.endswith(".__new"):
            shutil.rmtree(os.path.join(root, e), ignore_errors=True)


def stage_batch_dir(root: str, entry: str, df) -> str:
    """Write ``df`` to the staging sibling of ``root/entry``; returns
    the staged path (publish with :func:`publish_batch_dir`)."""
    import shutil

    tmp = os.path.join(root, f".{entry}.__new")
    shutil.rmtree(tmp, ignore_errors=True)
    df.write.mode("overwrite").parquet(tmp)
    return tmp


def publish_batch_dir(root: str, entry: str, staged: str) -> None:
    """Make a staged batch dir live by one rename; idempotent — an
    already-live entry wins every race (concurrent retry discipline)."""
    import shutil

    live = os.path.join(root, entry)
    if os.path.exists(live):
        shutil.rmtree(staged, ignore_errors=True)
    else:
        os.rename(staged, live)


#: sits beside the ``batch=X`` dirs; accumulates every entry ever folded
#: into a compacted target — the REPLAY HEAL (VERDICT r10 #4): a
#: replayed pre-compaction epoch must still be recognizable as
#: committed, or it would re-decide against a store containing its own
#: rows and silently change its output.
FOLDED_MANIFEST = "_folded.json"

#: per-row attribution column written into compacted dirs when
#: ``track_origin`` — lets per-batch lookups (replay exclusion, replay
#: accepted-set reads) resolve after the source dirs are gone.
ORIGIN_COL = "origin_batch"


def folded_batches(root: str) -> set[str]:
    """Entries (``batch=X`` names) folded into a compacted target."""
    import json

    p = os.path.join(root, FOLDED_MANIFEST)
    if not os.path.exists(p):
        return set()
    with open(p) as fh:
        return set(json.load(fh).get("entries", []))


def append_folded_manifest(root: str, entries) -> None:
    """Union ``entries`` into the folded manifest, atomically
    (tmp + ``os.replace``).  Written AFTER the compacted target is live
    and BEFORE sources are deleted: a crash before the write leaves the
    sources live (dir check wins), after it both signals agree."""
    import json

    data = sorted(folded_batches(root) | set(entries))
    tmp = os.path.join(root, f".{FOLDED_MANIFEST}.__new")
    with open(tmp, "w") as fh:
        json.dump({"entries": data}, fh)
    os.replace(tmp, os.path.join(root, FOLDED_MANIFEST))


def with_origin_schema(schema):
    """``schema`` + the nullable origin_batch attribution column."""
    from pyspark.sql import types as T

    return T.StructType(
        list(schema.fields) + [T.StructField(ORIGIN_COL, T.StringType(), True)]
    )


def compact_batch_dirs(
    spark, root: str, schema, dedup_cols=None, track_origin: bool = False
) -> int:
    """Fold every live ``batch=X`` dir under ``root`` into one
    ``batch=compacted-<md5>`` dir (single-root batch-store maintenance).
    Returns the number of dirs folded (0 when <= 1 live dir).

    Crash-safe without coordination: the target name derives from the
    md5 of the folded SET, the merged rows are materialized
    (localCheckpoint) and published through the normal staged rename
    BEFORE any source is removed.  A crash between publish and the
    source deletes leaves rows duplicated across target and leftovers;
    callers must therefore only use batch stores in duplicate-insensitive
    reads (semi/anti joins — the contract both incremental stores
    already hold), and a retry derives a NEW target folding everything,
    with ``dropDuplicates`` keeping row counts from creeping.

    ``track_origin`` (the replay heal, VERDICT r10 #4): each folded row
    carries its source entry name in ``origin_batch`` (preserved through
    nested compactions) and the folded entry set lands in the
    ``_folded.json`` manifest — so a replayed pre-compaction batch can
    still be recognized (``folded_batches``) and its rows excluded or
    looked up by origin, instead of the batch silently re-deciding
    against its own history."""
    import hashlib
    import shutil

    from pyspark.sql import functions as F

    old = sorted(batch_dirs(root))
    if len(old) <= 1:
        return 0
    entry = "batch=compacted-" + hashlib.md5("|".join(old).encode()).hexdigest()[:12]
    if track_origin:
        ext = with_origin_schema(schema)
        frames = []
        for b in old:
            # nested compaction: rows already carrying an origin keep it
            # (missing parquet columns read as NULL under an explicit
            # schema, so plain dirs coalesce to their own entry name)
            frames.append(
                spark.read.schema(ext)
                .parquet(os.path.join(root, b))
                .withColumn(ORIGIN_COL, F.coalesce(F.col(ORIGIN_COL), F.lit(b)))
            )
        merged = frames[0]
        for f in frames[1:]:
            merged = merged.unionByName(f)
        merged = merged.dropDuplicates(
            (dedup_cols + [ORIGIN_COL]) if dedup_cols else None
        )
    else:
        merged = spark.read.schema(schema).parquet(
            *[os.path.join(root, b) for b in old]
        )
        merged = (
            merged.dropDuplicates(dedup_cols) if dedup_cols else merged.dropDuplicates()
        )
    merged = merged.localCheckpoint()  # materialize BEFORE sources vanish
    if not os.path.exists(os.path.join(root, entry)):
        staged = stage_batch_dir(root, entry, merged)
        publish_batch_dir(root, entry, staged)
    if track_origin:
        append_folded_manifest(root, [b for b in old if b != entry])
    for b in old:
        if b != entry:
            shutil.rmtree(os.path.join(root, b), ignore_errors=True)
    return len(old)


# ---------------------------------------------------------------------------
# Persisted-index cache hygiene (r15: ADVICE r14 #1/#2 + VERDICT r14 #4).
# Deterministic fingerprint-keyed index paths (build-once/probe-many,
# introduced r14) created three lifecycle gaps these close:
#   - the cache root lived at a predictable world-visible /tmp path that
#     another local user could pre-create and seed -> secure_cache_root
#     creates 0700 and verifies ownership+mode before reuse;
#   - no writer exclusion between the _meta.json existence check and
#     build/append -> dir_lock (O_EXCL lockfile, dead-holder steal);
#   - one stranded directory per (corpus, geometry) forever ->
#     reap_stale_cache_dirs (keep newest N per family, rename-then-rmtree
#     so a half-deleted dir is never visible under its live name).
# ---------------------------------------------------------------------------


def secure_cache_root(subdir: str = "index-cache") -> str:
    """Per-user cache root for persisted index artifacts, created 0700
    and ownership-verified before reuse (mkdtemp-style trust).

    Resolution order: ``$XDG_CACHE_HOME/hedera_etl_spark/<subdir>``,
    else ``~/.cache/hedera_etl_spark/<subdir>`` when HOME resolves, else
    ``<tempdir>/hedera_etl_spark_idx_<uid>/<subdir>``.  Every component
    from the app dir down is chmod'd 0700 on creation; if the app dir
    already exists but is owned by someone else or is group/other
    writable, raise instead of silently trusting planted artifacts —
    another local user pre-creating the predictable path must not be
    able to seed or tamper with index contents (ADVICE r14)."""
    import stat
    import tempfile

    uid = os.getuid() if hasattr(os, "getuid") else 0
    base = os.environ.get("XDG_CACHE_HOME")
    if not base:
        home = os.path.expanduser("~")
        if home and home != "~" and os.path.isdir(home):
            base = os.path.join(home, ".cache")
    if base:
        app = os.path.join(base, "hedera_etl_spark")
        os.makedirs(base, exist_ok=True)
    else:
        app = os.path.join(tempfile.gettempdir(), f"hedera_etl_spark_idx_{uid}")
    root = os.path.join(app, subdir)
    for d in (app, root):
        try:
            os.mkdir(d, 0o700)
            # umask may have stripped bits at mkdir time; re-assert
            os.chmod(d, 0o700)
        except FileExistsError:
            pass
        st = os.stat(d)
        if hasattr(os, "getuid") and st.st_uid != os.getuid():
            raise RuntimeError(
                f"index cache dir {d} is owned by uid {st.st_uid}, not "
                f"{os.getuid()} — refusing to reuse a directory another "
                "user created (possible planted artifacts)"
            )
        if not stat.S_ISDIR(st.st_mode):
            raise RuntimeError(f"index cache path {d} is not a directory")
        if st.st_mode & (stat.S_IWGRP | stat.S_IWOTH):
            raise RuntimeError(
                f"index cache dir {d} is group/other-writable "
                f"(mode {stat.S_IMODE(st.st_mode):o}) — refusing; "
                "chmod 700 it or point XDG_CACHE_HOME elsewhere"
            )
    return root


def _lock_path(path: str) -> str:
    parent, base = os.path.split(os.path.normpath(path))
    return os.path.join(parent, f".{base}.__lock")


class dir_lock:
    """Single-writer exclusion for a local index directory.

    O_CREAT|O_EXCL lockfile beside ``path`` recording the holder pid; a
    lockfile whose pid no longer runs is stolen (unlink + retry — two
    concurrent stealers race on the unlink, which one loses with
    FileNotFoundError and simply retries).  LOCAL filesystems only:
    O_EXCL+pid liveness is not meaningful across NFS clients — the
    documented single-writer-per-host assumption (ADVICE r14).  Readers
    are not excluded: a probe-only open never takes the lock; writers
    (first-batch build, batch append) serialize behind it, so two
    sessions can no longer both run the build or interleave one batch's
    append.  A reader overlapping an in-flight APPEND can still hit a
    transient missing-file error listing parquet parts — decisions are
    correct on retry; the build path has no such window because
    _meta.json (the open gate) is written last."""

    def __init__(self, path: str, timeout: float = 600.0, poll: float = 0.1):
        self.lock = _lock_path(path)
        self.timeout = timeout
        self.poll = poll
        self._fd: int | None = None

    def __enter__(self) -> "dir_lock":
        import time

        os.makedirs(os.path.dirname(self.lock) or ".", exist_ok=True)
        deadline = time.monotonic() + self.timeout
        while True:
            try:
                fd = os.open(self.lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o600)
                os.write(fd, str(os.getpid()).encode())
                os.fsync(fd)
                self._fd = fd
                return self
            except FileExistsError:
                pass
            # holder dead? (crashed before releasing) -> steal
            try:
                with open(self.lock) as fh:
                    pid = int(fh.read().strip() or "0")
                if pid > 0:
                    os.kill(pid, 0)  # raises if gone
                    alive = True
                else:
                    alive = False
            except (FileNotFoundError, ValueError, ProcessLookupError):
                alive = False
            except PermissionError:
                alive = True  # other-user pid: treat as live
            if not alive:
                try:
                    os.unlink(self.lock)
                except FileNotFoundError:
                    pass  # lost the steal race; loop
                continue
            if time.monotonic() >= deadline:
                raise TimeoutError(
                    f"could not acquire index write lock {self.lock} within "
                    f"{self.timeout}s (held by pid {pid})"
                )
            time.sleep(self.poll)

    def __exit__(self, *exc) -> None:
        if self._fd is not None:
            os.close(self._fd)
            self._fd = None
        try:
            os.unlink(self.lock)
        except FileNotFoundError:
            pass


def reap_stale_cache_dirs(
    root: str, prefix: str, keep: int = 3, exclude: tuple = ()
) -> list[str]:
    """Bounded retention for fingerprint-keyed index caches: keep the
    ``keep`` most-recently-modified ``<root>/<prefix>*`` directories
    (plus anything in ``exclude`` — the caller's live key — and any dir
    whose writer currently holds its lock), delete the rest.  Deletion
    is rename-to-hidden-sibling then rmtree, so a concurrent opener
    either sees the complete dir or no dir — never a half-deleted one.
    Returns the basenames reaped.  Unbounded growth otherwise: every
    corpus/geometry change strands one directory forever (VERDICT r14)."""
    import shutil as _sh

    if not os.path.isdir(root):
        return []
    cand = []
    for name in os.listdir(root):
        full = os.path.join(root, name)
        if (
            not name.startswith(prefix)
            or name in exclude
            or is_swap_sibling(name)
            or not os.path.isdir(full)
        ):
            continue
        # skip dirs with a live writer (lockfile with a running pid)
        lp = _lock_path(full)
        if os.path.exists(lp):
            try:
                with open(lp) as fh:
                    pid = int(fh.read().strip() or "0")
                os.kill(pid, 0)
                continue  # writer alive — not stale
            except (ValueError, ProcessLookupError, FileNotFoundError):
                pass
            except PermissionError:
                continue
        try:
            cand.append((os.stat(full).st_mtime, name))
        except FileNotFoundError:
            continue  # raced with another reaper
    cand.sort(reverse=True)
    reaped = []
    for _, name in cand[max(keep, 0):]:
        full = os.path.join(root, name)
        doomed = os.path.join(root, f".{name}.__reap")
        try:
            os.rename(full, doomed)
        except (FileNotFoundError, OSError):
            continue  # raced with another reaper or opener — leave it
        _sh.rmtree(doomed, ignore_errors=True)
        try:
            os.unlink(_lock_path(full))
        except FileNotFoundError:
            pass
        reaped.append(name)
    # sweep debris from reapers that died mid-rmtree
    for name in os.listdir(root):
        if name.startswith(".") and name.endswith(".__reap"):
            _sh.rmtree(os.path.join(root, name), ignore_errors=True)
    return reaped
