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

Two data planes, one contract (r12, VERDICT r11 #3):

- the module-level functions operate on POSIX roots (temp +
  ``os.replace`` pointer swap);
- :class:`StorePublisher` operates the SAME lifecycle over an
  ``ObjectStoreClient`` bucket — the reference's actual deployment
  surface (``README.md:114`` input/output prefixes; ``role.json``
  grants S3 object verbs).  The pointer becomes ONE PUT, atomic by
  the same contract the P8 direct-PUT commit leans on; a "layout
  directory" becomes a key PREFIX; prune becomes a paged list +
  deletes.  Readers keep the identical guarantee: resolve returns
  one consistent version, and a publish never touches the keys a
  just-resolved reader is scanning.
"""

from __future__ import annotations

import json
import os
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # import cycle: manifest imports nothing from here
    from ..pipeline.manifest import ObjectStoreClient

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


class StorePublisher:
    """The versioned-pointer lifecycle over an object-store bucket.

    Same contract as the module-level POSIX functions, re-expressed
    in the 5-verb ``ObjectStoreClient`` vocabulary (the p20/p21
    quarantine discipline, ``pipeline/manifest.py``):

    - ``root`` is a KEY PREFIX (e.g. ``indexes/lsh``); a layout is
      the prefix ``<root>/<name>`` and "exists" iff at least one
      object lives under ``<name>/`` — a flat key namespace has no
      empty directories, so a writer that crashed before its first
      object left nothing to confuse (the POSIX orphan-dir check
      degenerates away).
    - the pointer ``<root>/_current.json`` is ONE object; publish is
      ONE ``put`` — atomic by the S3 PUT contract, so no temp +
      rename dance is needed (publish.py module docstring argued
      this since r11; this class executes it).
    - ``prune`` pages over each retired layout prefix
      (``list_pages`` — driver memory bounded by page size, never by
      layout key count) and deletes; DELETE is idempotent, so a
      crashed prune re-run converges.

    Physical layout DATA still moves through Spark (parquet over the
    scheme's Hadoop connector in a real deployment; the file-backed
    double's ``fs_path`` in this sandbox) — this class owns only the
    control plane: naming, pointing, retiring.

    CONCURRENCY, two modes (ADVICE r12):

    - ``cas=False`` (default) — SINGLE-MAINTAINER: ``publish`` and
      ``prune`` are GET-modify-PUT sequences over the pointer
      object.  S3's plain PUT is atomic PER OBJECT — a reader always
      sees one complete pointer, never a torn one (fuzzed in
      tests/test_publish.py) — but it is not compare-and-swap, so
      two concurrent maintainers race: the second PUT silently wins
      and the first maintainer's version (or a publish landing
      inside prune's read-modify window) is rolled back — a LOST
      UPDATE, not corruption.  Readers are never endangered: every
      pointer state is a complete published version whose layout
      objects exist.  This mirrors the deployment assumption the
      maintenance daemon already enforces (one sweep loop per index
      root).
    - ``cas=True`` (r13) — MULTI-MAINTAINER: every pointer write
      goes through the store's conditional-PUT verb
      (``put_if``: S3 If-Match on the pointer's ETag / If-None-Match
      for the first version — public S3 API since 2024; the
      file-backed double serializes writers on an flock and ETags by
      content md5).  A maintainer that loses the race gets
      :class:`~...pipeline.manifest.PreconditionFailed`, RE-READS,
      and retries the whole read-validate-modify cycle (bounded by
      ``cas_retries``), so concurrent publishes all land — versions
      stay monotone and none is lost — and a publish inside prune's
      window survives (prune's stale PUT fails its precondition and
      the re-run recomputes against the new pointer).  Retry
      side-effects are safe: deletes are idempotent and validation
      reruns from the fresh pointer."""

    def __init__(self, store: "ObjectStoreClient", root: str,
                 cas: bool = False, cas_retries: int = 16) -> None:
        self.store = store
        self.root = root.rstrip("/")
        self.cas = cas
        self.cas_retries = cas_retries

    def _pointer_key(self) -> str:
        return f"{self.root}/{POINTER}"

    def _read_pointer(self) -> dict | None:
        try:
            return json.loads(self.store.get(self._pointer_key()))
        except FileNotFoundError:
            return None

    def _read_pointer_v(self) -> tuple[dict | None, str | None]:
        """(meta, etag) — the etag is the CAS token for the closing
        conditional PUT; (None, None) when unversioned."""
        if not self.cas:
            return self._read_pointer(), None
        try:
            raw, etag = self.store.get_with_etag(self._pointer_key())
        except FileNotFoundError:
            return None, None
        return json.loads(raw), etag

    def _put_pointer(self, new_meta: dict, etag: str | None) -> None:
        data = json.dumps(new_meta).encode()
        if self.cas:
            # etag None = first version: create-if-absent, so two
            # maintainers racing to publish v1 can't both win
            self.store.put_if(self._pointer_key(), data, etag)
        else:
            self.store.put(self._pointer_key(), data)

    def _cas_loop(self, attempt):
        """Run ``attempt`` once (plain mode) or until its conditional
        pointer PUT wins (cas mode, bounded)."""
        from ..pipeline.manifest import PreconditionFailed
        tries = self.cas_retries if self.cas else 1
        last: Exception | None = None
        for _ in range(tries):
            try:
                return attempt()
            except PreconditionFailed as e:
                last = e       # lost the race: re-read and retry
        raise PreconditionFailed(
            f"lost {tries} consecutive CAS races on "
            f"{self._pointer_key()} — raise cas_retries or reduce "
            f"maintainer concurrency") from last

    def _layout_objects(self, name: str) -> bool:
        # point-prefix lookup: first page only — membership needs one
        # object, never the full listing
        for page in self.store.list_pages(f"{self.root}/{name}/",
                                          page_size=1):
            return bool(page)
        return False

    def current_version(self) -> int | None:
        meta = self._read_pointer()
        return None if meta is None else int(meta["version"])

    def resolve(self) -> str:
        """Live layout prefix; the root itself when unversioned —
        the same reader-unconditional contract as :func:`resolve`."""
        meta = self._read_pointer()
        if meta is None:
            return self.root
        return f"{self.root}/{meta['dir']}"

    def new_layout_dir(self, prefix: str = "layout-v") -> str:
        """A fresh layout prefix for a writer: smallest n above both
        the published version and every name with objects on the
        bucket — a crashed writer's partial layout is never reused."""
        meta = self._read_pointer()
        n = 0 if meta is None else int(meta["version"])
        while True:
            n += 1
            name = f"{prefix}{n:05d}"
            if not self._layout_objects(name):
                return f"{self.root}/{name}"

    def publish(self, layout_key: str) -> int:
        """Atomically repoint the root at ``layout_key`` (one PUT —
        conditional in cas mode, retried until it wins); returns the
        new version.  Same preconditions as the POSIX
        :func:`publish`: a direct child of the root, fully written
        (>= 1 object), and not the currently-live layout."""
        key = layout_key.rstrip("/")
        head, _, rel = key.rpartition("/")
        if head != self.root or not rel:
            raise ValueError(
                f"layout {layout_key!r} is not a direct child of "
                f"index root {self.root!r} — layouts live inside "
                f"their root so the pointer's relative name stays "
                f"valid")
        if rel == POINTER:
            raise ValueError(f"{POINTER} is the pointer, not a layout")
        if not self._layout_objects(rel):
            raise ValueError(
                f"layout {layout_key!r} has no objects — write the "
                f"layout fully, then publish")

        def attempt() -> int:
            meta, etag = self._read_pointer_v()
            if meta is not None and meta["dir"] == rel:
                raise ValueError(
                    f"layout {rel!r} is already the live version "
                    f"{meta['version']} — a maintenance pass "
                    f"publishes a FRESH prefix, never re-publishes "
                    f"the live one")
            version = 1 if meta is None else int(meta["version"]) + 1
            history = ([] if meta is None
                       else meta.get("history", [])) + [
                {"version": version, "dir": rel}]
            self._put_pointer({"version": version, "dir": rel,
                               "history": history}, etag)
            return version

        return self._cas_loop(attempt)

    def prune(self, keep: int = 2) -> list[str]:
        """Delete every object under layouts older than the newest
        ``keep`` published versions; returns the retired layout
        prefixes.  ``keep >= 2`` is the concurrent-reader floor
        (module docstring).  Never-published orphan prefixes are not
        touched — they may be a maintenance pass mid-write.

        In cas mode the returned list is best-effort under
        contention: a layout whose objects fell in an attempt that
        then lost its pointer race is not re-reported by the winning
        retry (its prefix lists empty, so ``found`` stays False) —
        the deletions themselves are idempotent and complete."""
        if keep < 1:
            raise ValueError(f"keep must be >= 1, got {keep}")

        def attempt() -> list[str]:
            meta, etag = self._read_pointer_v()
            if meta is None:
                return []
            history = meta.get("history", [])
            retire, remain = history[:-keep], history[-keep:]
            live = meta["dir"]
            keep_names = {r["dir"] for r in remain}
            retired = []
            for h in retire:
                if h["dir"] == live or h["dir"] in keep_names:
                    continue
                prefix = f"{self.root}/{h['dir']}/"
                found = False
                for page in self.store.list_pages(prefix):
                    for k in page:
                        self.store.delete(k)
                        found = True
                if found:
                    retired.append(f"{self.root}/{h['dir']}")
            # cas retry is safe here: deletes are idempotent, the
            # horizon recomputes from the FRESH pointer (so a version
            # published inside this window is never rolled back), and
            # layout names below the live version are never reused
            self._put_pointer(dict(meta, history=remain), etag)
            return retired

        return self._cas_loop(attempt)
