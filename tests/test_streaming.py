"""S8: checkpoint recovery — the reference's at-least-once retry
(visibility timeout, README.md:44-47) made exactly-once via
checkpoint + idempotent per-epoch sink."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from samplebatchprocessing_spark.streaming.jobs import events_stream

BASE = "/tmp/sbp_stream_test"


def _run_to_sink(spark, src_dir, sink, ckpt):
    raw_schema = spark.read.parquet(
        os.path.join(src_dir, os.listdir(src_dir)[0])).schema
    sdf = (spark.readStream.schema(raw_schema)
           .option("pathGlobFilter", "*.parquet").parquet(src_dir))
    sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))

    def write_batch(df, batch_id):
        df.write.mode("overwrite").parquet(
            os.path.join(sink, f"batch={batch_id}"))

    q = (sdf.writeStream.foreachBatch(write_batch)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def test_checkpoint_restart_no_dupes_no_loss(spark, sf_smoke):
    shutil.rmtree(BASE, ignore_errors=True)
    src = os.path.join(BASE, "src")
    sink = os.path.join(BASE, "sink")
    ckpt = os.path.join(BASE, "ckpt")
    os.makedirs(src)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    fixture = f"{sf_smoke}/events.parquet"
    shutil.copy(fixture, os.path.join(src, "a.parquet"))

    # run 1: drain file A, then "crash" (query stopped)
    _run_to_sink(spark, src, sink, ckpt)
    n1 = spark.read.parquet(f"{sink}/batch=*").count()
    assert n1 == 1000

    # new file arrives; restart from the SAME checkpoint
    shutil.copy(fixture, os.path.join(src, "b.parquet"))
    _run_to_sink(spark, src, sink, ckpt)
    total = spark.read.parquet(f"{sink}/batch=*")
    assert total.count() == 2000          # no loss
    # no duplicate processing of file A: each event id appears exactly twice
    # (once per file), not 3x/4x as reprocessing would produce
    per_id = total.groupBy("event_id").count()
    assert per_id.filter(F.col("count") != 2).count() == 0

    # re-running with nothing new is a no-op (idempotent commit log)
    _run_to_sink(spark, src, sink, ckpt)
    assert spark.read.parquet(f"{sink}/batch=*").count() == 2000
    shutil.rmtree(BASE, ignore_errors=True)
