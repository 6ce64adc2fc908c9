"""P8 manifest pipeline: the reference's own identity-transform
smoke test (user-data.sh:4), made exact with md5 — plus transform
plug-in and failure-gate semantics."""

from __future__ import annotations

import glob
import hashlib
import os
import shutil

import pytest
from pyspark.sql import functions as F

from samplebatchprocessing_spark.pipeline.manifest import (
    build_manifest, run_pipeline)

BUCKET = "/tmp/sbp_test_bucket"


@pytest.fixture()
def bucket(sf_smoke):
    shutil.rmtree(BUCKET, ignore_errors=True)
    in_dir = os.path.join(BUCKET, "input")
    os.makedirs(in_dir)
    for src in sorted(glob.glob(f"{sf_smoke}/*.parquet"))[:4]:
        shutil.copy(src, in_dir)
    yield BUCKET
    shutil.rmtree(BUCKET, ignore_errors=True)


def test_identity_pipeline_byte_exact(spark, bucket):
    manifest = build_manifest(spark, bucket)
    assert manifest.count() == 4
    log = run_pipeline(spark, manifest)
    rows = log.collect()
    assert len(rows) == 4 and all(r["ok"] for r in rows)
    for src in glob.glob(os.path.join(bucket, "input", "*")):
        out = os.path.join(bucket, "output",
                           os.path.basename(src) + ".out")
        a = hashlib.md5(open(src, "rb").read()).hexdigest()
        b = hashlib.md5(open(out, "rb").read()).hexdigest()
        assert a == b, f"{src} not byte-identical"


def test_pipeline_custom_transform(spark, bucket):
    log = run_pipeline(spark, build_manifest(spark, bucket),
                       transform=lambda b: b[:100], ext=".head")
    assert all(r["out_bytes"] == min(100, r["in_bytes"])
               for r in log.collect())


def test_pipeline_failure_gate(spark, bucket):
    """Failing transform -> ok=False, no output written
    (GetJobs.py:54-56: returncode gate skips upload)."""
    def boom(b: bytes) -> bytes:
        raise RuntimeError("transform failed")
    log = run_pipeline(spark, build_manifest(spark, bucket),
                       transform=boom, ext=".x")
    assert all(not r["ok"] for r in log.collect())
    assert not glob.glob(os.path.join(bucket, "output", "*.x"))


def test_pipeline_idempotent_rerun(spark, bucket):
    """Rerunning overwrites the same deterministic keys — the
    reference's at-least-once + idempotent-output contract (R8/R9)."""
    m = build_manifest(spark, bucket)
    run_pipeline(spark, m).collect()
    first = sorted(glob.glob(os.path.join(bucket, "output", "*")))
    run_pipeline(spark, m).collect()
    second = sorted(glob.glob(os.path.join(bucket, "output", "*")))
    assert first == second


def test_pipeline_subprocess_cp_byte_exact(spark, bucket):
    """The reference's true transform contract: an external command
    run as [command, in, out] (GetJobs.py:51-53), default `cp`
    (user-data.sh:4) — end-to-end byte-exact through the subprocess
    path."""
    log = run_pipeline(spark, build_manifest(spark, bucket),
                       command="cp", ext=".out")
    rows = log.collect()
    assert len(rows) == 4 and all(r["ok"] for r in rows)
    for src in glob.glob(os.path.join(bucket, "input", "*")):
        out = os.path.join(bucket, "output",
                           os.path.basename(src) + ".out")
        assert (hashlib.md5(open(src, "rb").read()).hexdigest()
                == hashlib.md5(open(out, "rb").read()).hexdigest())


def test_pipeline_subprocess_returncode_gate(spark, bucket):
    """Nonzero returncode -> no commit (GetJobs.py:54-56): `false`
    ignores its args and exits 1."""
    log = run_pipeline(spark, build_manifest(spark, bucket),
                       command="false", ext=".f")
    assert all(not r["ok"] for r in log.collect())
    assert not glob.glob(os.path.join(bucket, "output", "*.f"))


def test_pipeline_transform_and_command_exclusive(spark, bucket):
    with pytest.raises(ValueError, match="not both"):
        run_pipeline(spark, build_manifest(spark, bucket),
                     transform=lambda b: b, command="cp")


def test_pipeline_tempkey_commit(spark, bucket):
    """Object-store commit strategy: temp key + copy + delete — final
    bytes identical, no temp keys left behind."""
    log = run_pipeline(spark, build_manifest(spark, bucket),
                       commit="tempkey")
    assert all(r["ok"] for r in log.collect())
    assert not glob.glob(os.path.join(bucket, "output", "*.inprogress"))
    for src in glob.glob(os.path.join(bucket, "input", "*")):
        out = os.path.join(bucket, "output",
                           os.path.basename(src) + ".out")
        assert (hashlib.md5(open(src, "rb").read()).hexdigest()
                == hashlib.md5(open(out, "rb").read()).hexdigest())


def test_cli_send_get_end_to_end(spark, bucket, sf_smoke, capsys):
    """`python -m samplebatchprocessing_spark send|get` reproduces the
    reference's CLI flow (SendJobs.py:38-48, GetJobs.py:67-76) with
    the default cp command, byte-exactly."""
    from samplebatchprocessing_spark.__main__ import main
    local = os.path.join(bucket, "local_src")
    os.makedirs(local)
    for src in sorted(glob.glob(f"{sf_smoke}/*.parquet"))[:2]:
        shutil.copy(src, local)
    cli_bucket = os.path.join(bucket, "cli_bucket")
    assert main(["send", local, cli_bucket]) == 0
    assert main(["get", cli_bucket]) == 0
    for name in os.listdir(local):
        src = os.path.join(local, name)
        out = os.path.join(cli_bucket, "output", name + ".out")
        assert (hashlib.md5(open(src, "rb").read()).hexdigest()
                == hashlib.md5(open(out, "rb").read()).hexdigest())


def test_watch_prefix_streaming_pipeline(spark, bucket, sf_smoke):
    """Streaming GetJobs (R4): a drain run processes the backlog
    byte-exactly; a second drain with the same checkpoint redelivers
    NOTHING (the reference's delete-on-success); newly arriving files
    are picked up by the next drain."""
    from samplebatchprocessing_spark.pipeline.manifest import watch_prefix
    log1 = watch_prefix(spark, bucket)
    rows1 = log1.collect()
    assert len(rows1) == 4 and all(r["ok"] for r in rows1)
    for src in glob.glob(os.path.join(bucket, "input", "*")):
        out = os.path.join(bucket, "output",
                           os.path.basename(src) + ".out")
        assert (hashlib.md5(open(src, "rb").read()).hexdigest()
                == hashlib.md5(open(out, "rb").read()).hexdigest())

    # drain again: checkpoint == delete-on-success -> no reprocessing
    log2 = watch_prefix(spark, bucket)
    assert log2.count() == 4

    # a new file arrives -> exactly one more job on the next drain
    extra = sorted(glob.glob(f"{sf_smoke}/*.parquet"))[5]
    shutil.copy(extra, os.path.join(bucket, "input", "late_arrival.bin"))
    log3 = watch_prefix(spark, bucket)
    assert log3.count() == 5
    assert log3.filter("file_name = 'late_arrival.bin'").first()["ok"]


def test_watch_prefix_retry_dedupes_log(spark, bucket):
    """ADVICE r2: a file that FAILED under one checkpoint and
    SUCCEEDED after a fresh one must surface only its newest (ok)
    row — the cumulative _commit_log keeps both, the returned
    DataFrame dedupes to latest-per-file."""
    import os

    from samplebatchprocessing_spark.pipeline.manifest import watch_prefix

    def boom(b: bytes) -> bytes:
        raise RuntimeError("transform failed")

    bad = watch_prefix(spark, bucket, transform=boom, ext=".out",
                       checkpoint=os.path.join(bucket, "_ckpt_bad"))
    assert bad.count() == 4 and not any(r["ok"] for r in bad.collect())

    # fresh checkpoint redelivers every file; identity transform wins
    good = watch_prefix(spark, bucket,
                        checkpoint=os.path.join(bucket, "_ckpt_good"))
    rows = good.collect()
    assert len(rows) == 4, "ok=false + ok=true rows must collapse"
    assert all(r["ok"] for r in rows)
