"""Schema-conformance gate (round-4, VERDICT r3 item #3).

The driver regenerates /root/testdata fixtures between rounds and has
already shifted physical dtypes twice (events.ts: TIMESTAMP(NANOS) ->
naive timestamp[us]).  These tests make any future regen surface as ONE
clear failure here instead of dozens of scattered DATATYPE_MISMATCH
errors downstream:

- every table at every sf loads through catalog.load_table and lands
  on SCHEMA_CONTRACT (post-normalization dtypes);
- normalize_events_ts handles all three ts shapes ever observed
  (nanos-as-long bigint, TIMESTAMP_NTZ, TIMESTAMP) and produces
  value-identical µs timestamps for each.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from samplebatchprocessing_spark.catalog import (
    SCHEMA_CONTRACT, SchemaDriftError, TABLES, conform, load_table,
    normalize_events_ts)

SF_DIRS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                       "/root/testdata/sf0.1") if os.path.isdir(d)]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("name", TABLES)
def test_all_tables_conform_at_all_sfs(spark, sf_dir, name):
    df = load_table(spark, sf_dir, name)  # raises SchemaDriftError on drift
    dtypes = dict(df.dtypes)
    for col, allowed in SCHEMA_CONTRACT[name].items():
        assert dtypes[col] in allowed, (name, col, dtypes[col], allowed)


def test_events_ts_is_true_timestamp_at_all_sfs(spark):
    # unix_micros / window() require TIMESTAMP (not NTZ) — the exact
    # call that broke 33 tests in round 3.
    for sf_dir in SF_DIRS:
        ev = load_table(spark, sf_dir, "events")
        assert dict(ev.dtypes)["ts"] == "timestamp"
        ev.select(F.unix_micros("ts")).limit(1).collect()


def test_normalize_ts_all_three_shapes_value_identical(spark):
    """bigint-nanos, TIMESTAMP_NTZ, TIMESTAMP inputs all normalize to
    the same µs-precision TIMESTAMP values."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    base = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00.000001"),
         (2, "2024-03-15 12:34:56.789012")],
        "event_id long, s string")
    as_ts = base.select("event_id", F.to_timestamp("s").alias("ts"))
    as_ntz = base.select(
        "event_id", F.expr("CAST(s AS TIMESTAMP_NTZ)").alias("ts"))
    as_nanos = as_ts.select(
        "event_id", (F.unix_micros("ts") * F.lit(1000)).alias("ts"))

    want = sorted((r.event_id, r.us) for r in as_ts.select(
        "event_id", F.unix_micros("ts").alias("us")).collect())
    for shaped in (as_ts, as_ntz, as_nanos):
        out = normalize_events_ts(shaped)
        assert dict(out.dtypes)["ts"] == "timestamp"
        got = sorted((r.event_id, r.us) for r in out.select(
            "event_id", F.unix_micros("ts").alias("us")).collect())
        assert got == want


def test_conform_raises_one_clear_error_on_drift(spark):
    bad = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    # missing columns (lang/source/n_chars) -> SchemaDriftError
    with pytest.raises(SchemaDriftError) as ei:
        conform("documents", bad)
    msg = str(ei.value)
    assert "documents" in msg and "lang" in msg

    drifted = spark.createDataFrame(
        [(1, "x", "en", "s", 1.5)],
        "doc_id long, text string, lang string, source string, n_chars double")
    with pytest.raises(SchemaDriftError) as ei:
        conform("documents", drifted)
    assert "n_chars" in str(ei.value)


def test_conform_allows_extra_columns(spark):
    df = load_table(spark, SF_DIRS[0], "region").withColumn(
        "extra", F.lit(1))
    conform("region", df)  # forward-compatible: no raise
