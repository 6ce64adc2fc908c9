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

Differences from the reference, by design: the work queue is a
manifest DataFrame (restart = re-run; Spark task retry replaces SQS
redelivery), and there is no long-poll daemon loop — ``get`` is one
batch execution over whatever the manifest lists.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys


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

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
