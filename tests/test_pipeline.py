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
