"""Atomic versioned-pointer PUBLISH for persisted index layouts
(r11, VERDICT r10 #2).

Three maintenance passes rewrite an index into a fresh directory —
LSH band compaction (``dedup.lsh_index_compact``), postings
compaction (``text.postings_index_compact``), IVF re-centroiding
(``similarity.ivf_index_recluster``) — and each docstring promised
"probes keep serving the old layout until the atomic directory
swap".  This module makes the swap executable, once, for all three:

- An index ROOT is a directory holding one or more LAYOUT
  subdirectories plus a pointer file ``_current.json`` naming the
  live one.  The pointer is the ONLY mutable object; layouts are
  immutable once published.
- ``publish(root, layout)`` atomically repoints (POSIX temp +
  ``os.replace`` — the same all-or-nothing visibility discipline as
  ``LocalObjectStoreClient.put``; on S3 the pointer is one PUT,
  which is atomic by contract).  Versions are monotone.
- ``resolve(root)`` returns the live layout directory.  A root with
  NO pointer resolves to itself, so every pre-r11 unversioned index
  keeps working and probes can take either form.

Crash contract: a maintenance pass that dies AFTER writing the new
layout but BEFORE ``publish`` leaves the pointer — and therefore
every reader — on the old version; the orphaned layout directory is
invisible (never resolved, never reused for a new version name) and
a re-run simply writes a fresh one.  A reader that resolved the
pointer immediately before a publish keeps reading the OLD layout
directory, which the publish never touches — readers always see one
consistent version end-to-end (fuzzed in tests/test_differential.py).

Scale (100 TB): the pointer is O(history) bytes of metadata; the
swap cost is independent of index size.  Old layouts are retired
explicitly via :func:`prune` (keep >= 2 so probes that resolved just
before a publish finish their scan before their layout is deleted —
the vacuum-horizon discipline of m10).
"""

from __future__ import annotations

import json
import os

POINTER = "_current.json"


def _pointer_path(index_root: str) -> str:
    return os.path.join(index_root, POINTER)


def _read_pointer(index_root: str) -> dict | None:
    path = _pointer_path(index_root)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def current_version(index_root: str) -> int | None:
    """Version number the pointer currently names, or None for an
    unversioned root (no pointer file)."""
    meta = _read_pointer(index_root)
    return None if meta is None else int(meta["version"])


def resolve(index_root: str) -> str:
    """The live layout directory for ``index_root``.

    With a pointer: ``index_root/<dir>`` for the published version.
    Without one: ``index_root`` itself — an unversioned index IS its
    own layout, so every reader can resolve unconditionally and
    pre-pointer indexes keep serving unchanged."""
    meta = _read_pointer(index_root)
    if meta is None:
        return index_root
    return os.path.join(index_root, meta["dir"])


def new_layout_dir(index_root: str, prefix: str = "layout-v") -> str:
    """A FRESH layout directory path for a writer (not created, not
    published): ``<root>/<prefix><n>`` for the smallest n greater
    than both the published version and every name already on disk —
    a crashed writer's orphan directory is never reused, so a
    half-written layout can never be mistaken for a complete one."""
    meta = _read_pointer(index_root)
    n = 0 if meta is None else int(meta["version"])
    while True:
        n += 1
        cand = os.path.join(index_root, f"{prefix}{n:05d}")
        if not os.path.exists(cand):
            return cand


def publish(index_root: str, layout_dir: str) -> int:
    """Atomically repoint ``index_root`` at ``layout_dir``; returns
    the new version number.

    ``layout_dir`` must be an existing DIRECT subdirectory of
    ``index_root`` (the pointer stores the relative name, so the
    root relocates as one unit) and must not be the currently-live
    layout (republishing the live dir is a no-op bug upstream, and
    pruning history could then delete the live layout).  The pointer
    write is temp + ``os.replace``: a reader sees the old pointer or
    the new one, never a torn file."""
    root_real = os.path.realpath(index_root)
    layout_real = os.path.realpath(layout_dir)
    if os.path.dirname(layout_real) != root_real:
        raise ValueError(
            f"layout {layout_dir!r} is not a direct subdirectory of "
            f"index root {index_root!r} — layouts live inside their "
            f"root so the pointer's relative name stays valid")
    if not os.path.isdir(layout_real):
        raise ValueError(f"layout {layout_dir!r} does not exist — "
                         f"write the layout fully, then publish")
    rel = os.path.basename(layout_real)
    if rel == POINTER:
        raise ValueError(f"{POINTER} is the pointer, not a layout")
    meta = _read_pointer(index_root)
    if meta is not None and meta["dir"] == rel:
        raise ValueError(
            f"layout {rel!r} is already the live version "
            f"{meta['version']} — a maintenance pass publishes a "
            f"FRESH directory, never re-publishes the live one")
    version = 1 if meta is None else int(meta["version"]) + 1
    history = ([] if meta is None else meta.get("history", [])) + [
        {"version": version, "dir": rel}]
    new_meta = {"version": version, "dir": rel, "history": history}
    tmp = _pointer_path(index_root) + ".inprogress"
    with open(tmp, "w") as f:
        json.dump(new_meta, f)
    os.replace(tmp, _pointer_path(index_root))
    return version


def prune(index_root: str, keep: int = 2) -> list[str]:
    """Delete layout directories of versions older than the newest
    ``keep`` published ones; returns the deleted directory paths.
    ``keep >= 2`` is the safe floor for concurrent readers: a probe
    that resolved the pointer just before a publish is still scanning
    version N-1 while N is live (the m10 vacuum-horizon argument).
    Orphaned never-published directories are NOT touched — they may
    be a maintenance pass mid-write."""
    if keep < 1:
        raise ValueError(f"keep must be >= 1, got {keep}")
    meta = _read_pointer(index_root)
    if meta is None:
        return []
    import shutil
    history = meta.get("history", [])
    retire, remain = history[:-keep], history[-keep:]
    live = meta["dir"]
    deleted = []
    for h in retire:
        if h["dir"] == live or h["dir"] in {r["dir"] for r in remain}:
            continue
        path = os.path.join(index_root, h["dir"])
        if os.path.isdir(path):
            shutil.rmtree(path)
            deleted.append(path)
    new_meta = dict(meta, history=remain)
    tmp = _pointer_path(index_root) + ".inprogress"
    with open(tmp, "w") as f:
        json.dump(new_meta, f)
    os.replace(tmp, _pointer_path(index_root))
    return deleted
