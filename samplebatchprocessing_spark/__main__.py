"""Command-line entry points mirroring the reference's operational
surface (it is driven entirely from the shell):

- ``send``  <-> SendJobs.py:38-48
  ``python -m samplebatchprocessing_spark send <local_dir> <bucket_dir>
  [--in-prefix input/] [--out-prefix output/]``
  Stages every file from ``local_dir`` under ``bucket_dir/in_prefix``
  (SendJobs.py:16-28's upload loop) and writes the job manifest — the
  Spark-native stand-in for the SQS queue (SendJobs.py:31-34) — to
  ``bucket_dir/manifest.parquet``.

- ``get``   <-> GetJobs.py:67-76
  ``python -m samplebatchprocessing_spark get <bucket_dir>
  [--ext .out] [--command cp]``
  Reads the manifest and runs the pipeline: each file is transformed
  by ``[command, in, out]`` with the returncode gate
  (GetJobs.py:51-56; default ``cp`` per user-data.sh:4) and committed
  to ``bucket_dir/out_prefix/file_name + ext``.  Prints the commit
  log.

- ``watch`` <-> GetJobs.py:21-23 (the daemon form of ``get``)
  ``python -m samplebatchprocessing_spark watch <bucket_dir>
  [--ext .out] [--command cp] [--poll 5]``
  The reference consumer's infinite long-poll loop: watches
  ``bucket_dir/in_prefix`` continuously (new-file discovery == SQS
  message arrival), processes each new file through the same
  transform/commit worker, and exits gracefully on SIGINT/SIGTERM
  (GetJobs.py:63-65,80) after finishing the in-flight micro-batch.

Differences from the reference, by design: the work queue is a
manifest DataFrame (restart = re-run; Spark task retry replaces SQS
redelivery).  ``get`` is one batch execution over whatever the
manifest lists; ``watch`` is the daemon loop.
"""

from __future__ import annotations

import argparse
import os
import shutil
import signal
import sys
import threading


def _spark():
    from .session import get_spark
    return get_spark("sbp-cli")


def cmd_send(args: argparse.Namespace) -> int:
    from .pipeline.manifest import build_manifest
    in_dir = os.path.join(args.bucket_dir, args.in_prefix)
    os.makedirs(in_dir, exist_ok=True)
    n_staged = 0
    for name in sorted(os.listdir(args.local_dir)):
        src = os.path.join(args.local_dir, name)
        if os.path.isfile(src):
            shutil.copyfile(src, os.path.join(in_dir, name))
            n_staged += 1
    spark = _spark()
    manifest = build_manifest(spark, args.bucket_dir,
                              args.in_prefix, args.out_prefix)
    out = os.path.join(args.bucket_dir, "manifest.parquet")
    manifest.write.mode("overwrite").parquet(out)
    n_jobs = spark.read.parquet(out).count()
    print(f"staged {n_staged} files -> {in_dir}; "
          f"manifest {out} ({n_jobs} jobs)")
    return 0


def cmd_get(args: argparse.Namespace) -> int:
    from .pipeline.manifest import run_pipeline
    spark = _spark()
    manifest = spark.read.parquet(
        os.path.join(args.bucket_dir, "manifest.parquet"))
    log = run_pipeline(spark, manifest, command=args.command,
                       ext=args.ext, commit=args.commit)
    rows = log.collect()
    failed = [r for r in rows if not r["ok"]]
    for r in rows:
        print(f"{'ok ' if r['ok'] else 'ERR'} {r['file_name']} "
              f"{r['in_bytes']}B -> {r['out_bytes']}B {r['out_path']}")
    print(f"{len(rows) - len(failed)}/{len(rows)} files processed")
    return 1 if failed else 0


def cmd_watch(args: argparse.Namespace) -> int:
    """GetJobs.py:21-23's ``while (True)`` long-poll consumer.

    SIGINT/SIGTERM handling mirrors GetJobs.py:63-65,80 — first
    signal requests a graceful stop (finish the in-flight micro-batch,
    then exit 0).  The handler only sets an Event; ``query.stop()``
    runs on the main thread outside the handler because py4j
    connections are thread-affine and a signal handler interrupting a
    blocked gateway call must not reuse its connection.
    """
    from .pipeline.manifest import commit_log, watch_daemon
    spark = _spark()
    q = watch_daemon(spark, args.bucket_dir,
                     in_prefix=args.in_prefix, out_prefix=args.out_prefix,
                     command=args.command, ext=args.ext,
                     commit=args.commit, poll_seconds=args.poll)
    stop = threading.Event()

    def _on_signal(signum, _frame):
        print(f"signal {signum}: stopping after current micro-batch",
              file=sys.stderr, flush=True)
        stop.set()

    prev = {s: signal.signal(s, _on_signal)
            for s in (signal.SIGINT, signal.SIGTERM)}
    print(f"watching {os.path.join(args.bucket_dir, args.in_prefix)} "
          f"every {args.poll}s (SIGINT to stop)", flush=True)
    try:
        while q.isActive and not stop.is_set():
            # returns after the timeout; re-check the stop flag —
            # this loop is the daemon's "long poll" heartbeat
            q.awaitTermination(0.5)
        if q.isActive:
            q.stop()                       # graceful: GetJobs.py:64
            q.awaitTermination()
    finally:
        for s, h in prev.items():
            signal.signal(s, h)
    rows = commit_log(spark, args.bucket_dir).collect()
    n_ok = sum(1 for r in rows if r["ok"])
    print(f"stopped; commit log: {n_ok}/{len(rows)} files ok", flush=True)
    return 0


def _store_from_uri(index_root: str):
    """(store, root_prefix, spark_uri) for an object-store index
    root, or None for a plain POSIX path.

    - ``mock:///abs/path/to/index-root`` — the file-backed
      :class:`LocalObjectStoreClient`.  Any bucket/root split along
      the same absolute path is behaviorally equivalent for this
      client (keys resolve to the same backing files), so the
      canonical split is deterministic: the client roots at the
      uri's PARENT directory and the final path component is the
      index-root key.  Spark reads the double's backing files.
    - ``s3://bucket/prefix`` — the boto3
      :class:`S3ObjectStoreClient` (import-guarded; needs
      credentials + hadoop-aws jars at runtime, FIXTURES.md ask #3);
      Spark reads ``s3a://bucket/<key>`` uris."""
    from .pipeline.manifest import (LocalObjectStoreClient,
                                    S3ObjectStoreClient, _split_scheme)
    scheme, rest = _split_scheme(index_root)
    if scheme == "":
        return None
    if scheme == "mock":
        path = ("/" + rest.lstrip("/")).rstrip("/")
        parent, key = os.path.dirname(path), os.path.basename(path)
        if not key or not os.path.isdir(parent):
            raise ValueError(
                f"mock uri {index_root!r}: parent directory "
                f"{parent!r} must exist (the bucket double)")
        store = LocalObjectStoreClient(parent)
        return store, key, store.fs_path
    if scheme == "s3":
        bucket, _, root = rest.partition("/")
        if not bucket or not root:
            raise ValueError(
                f"s3 uri {index_root!r}: expected s3://bucket/prefix")
        return (S3ObjectStoreClient(bucket), root,
                lambda key: f"s3a://{bucket}/{key}")
    raise ValueError(f"unsupported index-root scheme {scheme!r} "
                     f"(supported: plain path, mock://, s3://)")


def cmd_maintain(args: argparse.Namespace) -> int:
    """The maintenance-daemon CLI (r11, VERDICT r10 #3): run the
    census -> due? -> rewrite -> publish sweep for a versioned index
    root, either once (``--once``, the AvailableNow analog — cron
    drives the cadence) or as a continuous loop with the same
    SIGINT/SIGTERM graceful-stop wiring as ``watch`` (GetJobs.py:
    63-65,80's signal discipline applied to index upkeep)."""
    from .operators import maintenance

    spark = _spark()
    if args.kind in ("vocab", "nb") and not args.fresh_parquet:
        print(f"maintain {args.kind}: --fresh-parquet is required "
              f"(the retrain due-predicate measures drift on a "
              f"fresh slice)", file=sys.stderr)
        return 2

    def _fresh():
        # re-read per sweep: daemon mode should see the slice as it
        # is NOW, not as it was at startup
        return spark.read.parquet(args.fresh_parquet)

    # index_root may be an OBJECT-STORE uri (r13): route the index
    # kinds to the store-native sweep twins, with --cas electing the
    # multi-maintainer conditional-write pointer mode.
    store_parts = _store_from_uri(args.index_root)
    if store_parts is not None:
        if args.kind in ("vocab", "nb"):
            print(f"maintain {args.kind}: trained-artifact roots are "
                  f"POSIX paths (the vocab/NB artifacts publish "
                  f"through the filesystem lifecycle); store uris "
                  f"cover the index kinds", file=sys.stderr)
            return 2
        store, root, spark_uri = store_parts
        sweeps = {
            "lsh": lambda: maintenance.lsh_maintenance_sweep_store(
                spark, store, root, cas=args.cas,
                max_files_per_bucket=args.threshold,
                spark_uri=spark_uri),
            "postings": lambda:
                maintenance.postings_maintenance_sweep_store(
                    spark, store, root, cas=args.cas,
                    max_files_per_bucket=args.threshold,
                    spark_uri=spark_uri),
            "ivf": lambda: maintenance.ivf_maintenance_sweep_store(
                spark, store, root, cas=args.cas,
                n_cells=args.n_cells,
                skew_threshold=args.threshold,
                spark_uri=spark_uri),
        }
    else:
        sweeps = {
            "lsh": lambda: maintenance.lsh_maintenance_sweep(
                spark, args.index_root,
                max_files_per_bucket=args.threshold),
            "postings": lambda: maintenance.postings_maintenance_sweep(
                spark, args.index_root,
                max_files_per_bucket=args.threshold),
            "ivf": lambda: maintenance.ivf_maintenance_sweep(
                spark, args.index_root, n_cells=args.n_cells,
                skew_threshold=args.threshold),
            "vocab": lambda: maintenance.vocab_maintenance_sweep(
                spark, args.index_root, _fresh(),
                n_merges=args.n_merges,
                max_drift_x1000=args.max_drift),
            "nb": lambda: maintenance.nb_maintenance_sweep(
                spark, args.index_root, _fresh(),
                pos_col=args.pos_col,
                max_oov_x1000=args.max_oov,
                max_prior_drift_x1000=args.max_prior_drift),
        }
    sweep = sweeps[args.kind]

    def _print(r: dict) -> None:
        if "files_before" in r:
            detail = (f"files {r['files_before']} -> "
                      f"{r['files_after']}")
        elif "fertility_fresh_x1000" in r:
            detail = (f"fertility {r['fertility_trained_x1000']} -> "
                      f"{r['fertility_fresh_x1000']} (x1000)")
        else:
            detail = (f"oov {r['oov_x1000']} prior "
                      f"{r['model_prior_x1000']} -> "
                      f"{r['fresh_prior_x1000']} (x1000)")
        print(f"{r['kind']} {r['index_root']}: due={r['due']} "
              f"v{r['version_before']} -> v{r['version_after']} "
              f"{detail}", flush=True)

    if args.once:
        _print(sweep())
        return 0

    d = maintenance.maintenance_daemon([sweep],
                                       poll_seconds=args.poll)
    stop = threading.Event()

    def _on_signal(signum, _frame):
        print(f"signal {signum}: stopping after current sweep",
              file=sys.stderr, flush=True)
        stop.set()

    prev = {s: signal.signal(s, _on_signal)
            for s in (signal.SIGINT, signal.SIGTERM)}
    print(f"maintaining {args.kind} index {args.index_root} "
          f"every {args.poll}s (SIGINT to stop)", flush=True)
    seen = 0
    try:
        while not stop.is_set():
            stop.wait(0.5)
            while seen < len(d.reports):   # stream reports as they land
                _print(d.reports[seen])
                seen += 1
        d.stop()                           # graceful: finish in-flight
        while seen < len(d.reports):
            _print(d.reports[seen])
            seen += 1
    finally:
        for s, h in prev.items():
            signal.signal(s, h)
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="samplebatchprocessing_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("send", help="stage files + write job manifest "
                        "(SendJobs equivalent)")
    ps.add_argument("local_dir")
    ps.add_argument("bucket_dir")
    ps.add_argument("--in-prefix", default="input/")
    ps.add_argument("--out-prefix", default="output/")
    ps.set_defaults(fn=cmd_send)

    pg = sub.add_parser("get", help="run the pipeline over the manifest "
                        "(GetJobs equivalent)")
    pg.add_argument("bucket_dir")
    pg.add_argument("--ext", default=".out")
    pg.add_argument("--command", default="cp",
                    help="external transform run as [command, in, out] "
                    "(default cp, per the reference deployment)")
    pg.add_argument("--commit", default="replace",
                    choices=("replace", "tempkey"))
    pg.set_defaults(fn=cmd_get)

    pw = sub.add_parser("watch", help="daemon: continuously process new "
                        "files under in-prefix (GetJobs long-poll loop)")
    pw.add_argument("bucket_dir")
    pw.add_argument("--in-prefix", default="input/")
    pw.add_argument("--out-prefix", default="output/")
    pw.add_argument("--ext", default=".out")
    pw.add_argument("--command", default="cp",
                    help="external transform run as [command, in, out] "
                    "(default cp, per the reference deployment)")
    pw.add_argument("--commit", default="replace",
                    choices=("replace", "tempkey"))
    pw.add_argument("--poll", type=float, default=5.0,
                    help="micro-batch poll interval in seconds "
                    "(the reference's 20 s long-poll wait)")
    pw.set_defaults(fn=cmd_watch)

    pm = sub.add_parser("maintain", help="maintenance daemon: "
                        "census -> due? -> rewrite -> publish for a "
                        "versioned index OR trained-artifact root")
    pm.add_argument("kind",
                    choices=("lsh", "postings", "ivf", "vocab", "nb"))
    pm.add_argument("index_root")
    pm.add_argument("--once", action="store_true",
                    help="run exactly one sweep and exit (cron mode)")
    pm.add_argument("--poll", type=float, default=60.0,
                    help="sweep interval in seconds (daemon mode)")
    pm.add_argument("--threshold", type=int, default=4,
                    help="max files per bucket (lsh/postings) or "
                    "cell-skew ratio (ivf) before maintenance fires")
    pm.add_argument("--n-cells", type=int, default=16,
                    help="IVF coarse-quantizer cell count")
    pm.add_argument("--fresh-parquet", default=None,
                    help="parquet of the fresh slice the retrain "
                    "due-predicate measures drift on (vocab: doc_id+"
                    "text; nb: doc_id+text+label column) — required "
                    "for vocab/nb kinds")
    pm.add_argument("--n-merges", type=int, default=8,
                    help="BPE merge count for a vocab retrain")
    pm.add_argument("--max-drift", type=int, default=150,
                    help="vocab retrain bound: fresh fertility minus "
                    "the stamped baseline, x1000 pieces per word")
    pm.add_argument("--pos-col", default="is_pos",
                    help="boolean label column in the nb fresh slice")
    pm.add_argument("--max-oov", type=int, default=100,
                    help="nb retrain bound: OOV token mass per mille")
    pm.add_argument("--max-prior-drift", type=int, default=250,
                    help="nb retrain bound: class-prior shift per "
                    "mille")
    pm.add_argument("--cas", action="store_true",
                    help="object-store roots only: publish/prune the "
                    "pointer via conditional writes (If-Match), so "
                    "multiple concurrent maintainers lose no updates")
    pm.set_defaults(fn=cmd_maintain)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
