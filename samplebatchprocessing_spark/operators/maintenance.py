"""Index MAINTENANCE sweeps — the cadence loop that actually RUNS
the measured due-predicates (r11, VERDICT r10 #3).

Round 10 left the lifecycle matrix complete but inert: the
maintenance passes (``dedup.lsh_index_compact``, ``text.
postings_index_compact``, ``similarity.ivf_index_recluster``) and
their decision predicates (``similarity.recluster_is_due``, the l17
small-file decay story) existed, but nothing executed the loop
census -> due? -> rewrite -> publish.  This module is that loop,
shaped like ``pipeline.manifest.watch_daemon``: one-shot ``*_sweep``
entry points (the ``Trigger.AvailableNow`` analog — run the decision
once, act if due, return a report row) plus
:func:`maintenance_daemon` (the ``ProcessingTime`` analog — a
caller-owned background loop over the sweeps with graceful stop,
where the CLI wires SIGINT exactly as ``__main__.cmd_watch`` does
for the file watcher).

Every sweep follows the same invariant chain:
1. CENSUS the live layout (``publish.resolve`` — one consistent
   version) with an o(index-metadata) probe;
2. apply the PURE integer due-predicate (unit-testable apart from
   the operator it steers — the ``orientation_is_skewed``
   discipline);
3. if due, rewrite into a FRESH layout directory
   (``publish.new_layout_dir`` — never in place, ADVICE r10) while
   probes keep serving the old version;
4. PUBLISH the pointer atomically and prune retired layouts beyond
   the read horizon (keep >= 2, the m10 vacuum-horizon rule).

Scale (100 TB): the census is bounded driver metadata (file counts /
one cell-keyed aggregate); the rewrite is the already-priced
maintenance pass, amortized over the cadence; the swap is O(bytes of
one JSON pointer).  A sweep that crashes mid-rewrite leaves the
pointer untouched — readers never see the partial layout and the
next sweep retries into a fresh directory.
"""

from __future__ import annotations

import glob
import os

from . import publish
from .dedup import lsh_index_compact
from .similarity import (ivf_cell_census, ivf_centroids_write,
                         ivf_index_recluster, recluster_is_due)
from .text import postings_index_compact

REPORT_SCHEMA = ("index_root string, kind string, due boolean, "
                 "acted boolean, version_before int, "
                 "version_after int, files_before int, "
                 "files_after int")


def bucket_file_census(layout_dir: str) -> tuple[int, int, int]:
    """(max_files_in_one_bucket, n_nonempty_buckets, total_files)
    over a bucket-partitioned layout (LSH band index / postings
    index) — the small-file decay measurement.  Driver-side glob of
    directory entries: o(file count) metadata, never data."""
    counts = [len(glob.glob(os.path.join(b, "*.parquet")))
              for b in glob.glob(os.path.join(layout_dir, "bucket=*"))]
    counts = [c for c in counts if c > 0]
    if not counts:
        return 0, 0, 0
    return max(counts), len(counts), sum(counts)


def compact_is_due(max_files: int, threshold: int = 4) -> bool:
    """The compaction-cadence decision predicate (pure, integer): a
    freshly-compacted bucket holds ONE file; every delta append adds
    one file per touched bucket, and each extra file costs a task +
    an open + a lost chance at cross-file row-group skipping on the
    sort key.  Compaction is due when the hottest bucket has
    accumulated >= ``threshold`` files — by then a probe of that
    bucket pays ``threshold`` opens for one bucket's worth of rows.
    ``threshold`` >= 2 (at 1 the sweep would rewrite a
    just-compacted index forever)."""
    if threshold < 2:
        raise ValueError(f"threshold must be >= 2, got {threshold}")
    return max_files >= threshold


def _require_versioned(index_root: str, kind: str) -> str:
    if publish.current_version(index_root) is None:
        raise ValueError(
            f"{kind} sweep needs a VERSIONED index root (no "
            f"{publish.POINTER} under {index_root!r}): build into "
            f"publish.new_layout_dir(root), then publish.publish it "
            f"— an unversioned directory has nowhere to swap to")
    return publish.resolve(index_root)


def lsh_maintenance_sweep(spark, index_root: str,
                          max_files_per_bucket: int = 4,
                          keep_versions: int = 2) -> dict:
    """One maintenance decision for a versioned LSH band index:
    census the live layout's bucket files, compact into a fresh
    layout iff :func:`compact_is_due`, publish, prune.  Returns the
    report row (REPORT_SCHEMA keys); ``acted=False`` sweeps cost one
    directory glob and nothing else."""
    live = _require_versioned(index_root, "LSH")
    before = publish.current_version(index_root)
    mx, _n, total = bucket_file_census(live)
    due = compact_is_due(mx, max_files_per_bucket)
    if due:
        out = publish.new_layout_dir(index_root)
        lsh_index_compact(spark, [live], out)
        publish.publish(index_root, out)
        publish.prune(index_root, keep=keep_versions)
    after_dir = publish.resolve(index_root)
    mx2, _n2, total2 = bucket_file_census(after_dir)
    return {"index_root": index_root, "kind": "lsh", "due": due,
            "acted": due, "version_before": before,
            "version_after": publish.current_version(index_root),
            "files_before": total, "files_after": total2}


def postings_maintenance_sweep(spark, index_root: str,
                               max_files_per_bucket: int = 4,
                               keep_versions: int = 2) -> dict:
    """:func:`lsh_maintenance_sweep` for the x117/x121/x123 postings
    index — same census, same due-predicate, x123's compaction as
    the rewrite."""
    live = _require_versioned(index_root, "postings")
    before = publish.current_version(index_root)
    mx, _n, total = bucket_file_census(live)
    due = compact_is_due(mx, max_files_per_bucket)
    if due:
        out = publish.new_layout_dir(index_root)
        postings_index_compact(spark, [live], out)
        publish.publish(index_root, out)
        publish.prune(index_root, keep=keep_versions)
    mx2, _n2, total2 = bucket_file_census(publish.resolve(index_root))
    return {"index_root": index_root, "kind": "postings", "due": due,
            "acted": due, "version_before": before,
            "version_after": publish.current_version(index_root),
            "files_before": total, "files_after": total2}


def ivf_maintenance_sweep(spark, index_root: str, n_cells: int = 16,
                          skew_threshold: int = 4,
                          sample_cap: int = 4096,
                          keep_versions: int = 2) -> dict:
    """One maintenance decision for a versioned IVF ANN index:
    ``ivf_cell_census`` the live layout (one cell-keyed aggregate),
    re-centroid into a fresh layout iff ``recluster_is_due``
    (drifted appends crowding stale cells — the x133 trigger), stamp
    the new centroids INTO the layout (``ivf_centroids_write``, so
    the pointer swap versions quantizer and cells together),
    publish, prune.  ``files_*`` report the max-cell row count here
    (the skew measure the predicate acts on)."""
    live = _require_versioned(index_root, "IVF")
    before = publish.current_version(index_root)
    mx, n, total = ivf_cell_census(spark, live)
    due = recluster_is_due(mx, n_cells, total, skew_threshold)
    if due:
        out = publish.new_layout_dir(index_root)
        cmat = ivf_index_recluster(spark, live, out, n_cells,
                                   sample_cap)
        ivf_centroids_write(out, cmat)
        publish.publish(index_root, out)
        publish.prune(index_root, keep=keep_versions)
    mx2, _n2, _t2 = ivf_cell_census(spark, publish.resolve(index_root))
    return {"index_root": index_root, "kind": "ivf", "due": due,
            "acted": due, "version_before": before,
            "version_after": publish.current_version(index_root),
            "files_before": mx, "files_after": mx2}


def maintenance_daemon(sweeps, poll_seconds: float = 5.0):
    """The continuously-running form (the ``watch_daemon`` analog):
    run every thunk in ``sweeps`` (zero-arg callables returning a
    report row, e.g. ``lambda: ivf_maintenance_sweep(spark, root)``)
    once per ``poll_seconds`` tick on a background thread.  Returns a
    handle whose ``stop()`` finishes the in-flight tick and joins
    (graceful SIGINT wiring is the caller's, exactly as
    ``__main__.cmd_watch`` does for the file watcher); ``reports``
    accumulates every sweep's report row for inspection.  Sweep
    exceptions stop the daemon and re-raise on ``stop()`` — a
    maintenance loop that silently skips failed sweeps would let an
    index decay unboundedly while looking healthy."""
    import threading

    class _Daemon:
        def __init__(self):
            self.reports: list[dict] = []
            self._stop = threading.Event()
            self._error: BaseException | None = None
            self._thread = threading.Thread(target=self._run,
                                            daemon=True)
            self._thread.start()

        def _run(self):
            while not self._stop.is_set():
                for sweep in sweeps:
                    try:
                        self.reports.append(sweep())
                    except BaseException as exc:  # surface on stop()
                        self._error = exc
                        return
                self._stop.wait(poll_seconds)

        def stop(self):
            self._stop.set()
            self._thread.join()
            if self._error is not None:
                raise self._error

    return _Daemon()
