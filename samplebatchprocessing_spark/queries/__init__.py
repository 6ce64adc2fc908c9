"""Declared query registry, keyed by SURVEY.md §2B operator ids.

Each entry: name -> (spark_fn, oracle_sql_or_None) where
``spark_fn(spark, sf_dir) -> DataFrame`` and the SQL twin is ANSI SQL
runnable by DuckDB over the pre-registered fixture views.  A ``None``
oracle would fall back to the driver's weaker rows-only check — since
r10 the set is EMPTY (x44's round-unrolled twin retired the last
one; locked by tests/test_oracle_parity.py), so every entry is
hash-gated.

Determinism contract (SURVEY §2B canonicalization): every output
column is int/str/bool/date/exact-double/array-thereof; all summing
aggregates use exact decimal arithmetic (see ``exprs``); every
LIMIT/window ordering carries a total-order tie-break.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]
Entry = tuple[SparkFn, str | None]

# The driver's CORRECTNESS gate samples the FIRST 50 registry entries
# (dict order).  Through round 4 the registry was composed module-first,
# so that window was 41x relational queries and the P/S/D/L operator
# families never received a driver-green row.  DRIVER_WINDOW pins a
# curated, family-interleaved first 50: one anchor per SURVEY §2B
# family up front (so even a smaller window stays representative),
# then depth on the families that previously lacked driver evidence
# (P, S, D, L), then extended-inventory breadth (dedup clusters,
# multimodal, curation, TPC-H, maintenance).  The invariant — exactly
# 50 names, all present in the registry, all 11 §2B families covered —
# is locked by tests/test_registry_order.py.
DRIVER_WINDOW: tuple[str, ...] = (
    # r15 ROTATION: ROTATE BY RISK.  This optimization round
    # restructured queries under the semantics-preservation rule
    # (x130/x131's two-level checksum accumulation, x64's count-
    # algebra rewrite, the dsum/davg split-bigint change under ~100
    # call sites, the one-action parity compares across 17 lifecycle
    # queries, l13's staged chunking, p17's pinned stream state,
    # the m12/p20/p21 local_df conversions) — the window samples
    # exactly those, so the driver's own gate certifies every
    # restructured path with a fresh hash-green row.  Anchors: the
    # touched entry per family where one exists (p17, j9, a1, w6,
    # t5, u4, f5, s26, l13 — all on the dsum or restructure
    # surface); Q and D have no touched entry, so q3/d6 take those
    # slots.  Remaining slots go to the heaviest dsum/davg users
    # (the exact-sum rewrite is the round's widest-blast-radius
    # change).  Locked by tests/test_registry_order.py.
    #
    # one anchor per §2B family: P Q J A W T U F S D L
    "p17_python_stream_source", "q3_filter", "j9_star_join",
    "a1_pricing_summary", "w6_gapfill", "t5_range_sorted_layout",
    "u4_union_by_name", "f5_array", "s26_stream_lsh_probe",
    "d6_udaf_grouped", "l13_paragraph_dedup",
    # structurally-restructured paths
    "x130_table_checksum", "x131_incremental_checksum",
    "x64_span_dedup", "x104_cc_twophase",
    "x133_ivf_recluster", "x132_lsh_index_lifecycle",
    "l17_lsh_index_compact", "x87_ann_index_merge",
    "x134_maintenance_sweep", "x135_vocab_publish",
    "x136_model_publish", "x121_postings_merge",
    "x123_postings_compact", "x125_incremental_pack",
    "x127_incremental_tfidf", "m13_index_publish",
    "m13b_store_publish", "s25_stream_incremental_pack",
    "m12_observed_metrics", "p20_poison_quarantine",
    "p21_object_store_quarantine",
    # dsum/davg-rewrite users
    "a2_global_agg", "a6_rollup", "a6_cube", "a12_two_phase",
    "j1_inner_join", "j5_broadcast_join", "j13_temporal_join",
    "m3_salted_join", "m4_bucketed_join", "m8_time_travel",
    "p2_csv_roundtrip", "p6_parquet_sink", "p11_compaction",
    "s2_tumbling_window", "s4_session_window", "s7_stateful_agg",
    "v1_pivot", "x93_winsorize",
)




def registry() -> dict[str, Entry]:
    from . import (analytics, llm, relational, scalar_funcs, sources,
                   sqlapi, streaming, udf)

    merged: dict[str, Entry] = {}
    for mod in (relational, scalar_funcs, llm, udf, sources, streaming,
                sqlapi, analytics):
        for name, entry in mod.QUERIES.items():
            if name in merged:
                raise ValueError(f"duplicate query name: {name}")
            merged[name] = entry

    out: dict[str, Entry] = {}
    for name in DRIVER_WINDOW:  # KeyError here = window names a missing query
        out[name] = merged.pop(name)
    out.update(merged)
    return out
