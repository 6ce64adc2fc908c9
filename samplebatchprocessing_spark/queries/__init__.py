"""Declared query registry, keyed by SURVEY.md §2B operator ids.

Each entry: name -> (spark_fn, oracle_sql_or_None) where
``spark_fn(spark, sf_dir) -> DataFrame`` and the SQL twin is ANSI SQL
runnable by DuckDB over the pre-registered fixture views.  Entries
with ``None`` oracle are property/parity-checked ops (sketches,
streaming internals) that get the driver's rows-only check.

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
    # r7 ROTATION (VERDICT r6 #2): the r6 gate went 50/50 green, so
    # nothing needs re-certification — every slot is a never-sampled
    # entry (overlap with the r6 window: 0; with r5: 0), except the Q
    # anchor (q2_cast, last sampled r4) because every Q entry already
    # has driver evidence.  Priorities: the four r7 single-partition
    # rewrites (x110/x102/x96/x97) so the fixes get driver
    # re-certification in-round, every entry whose plan r7 touched
    # (j14/j15 tiebreak, x104 convergence guard, x105 checkpoint,
    # m8/m10 work-dir split, the bounded_part sweep: x33/x80/x83/
    # x95/x17/x42), then the post-window r6 rows the verdict
    # enumerated.  tests/test_registry_order.py locks the overlap
    # bound, the 50-name shape, and the family anchors.
    #
    # one anchor per §2B family: P Q J A W T U F S D L
    "p13_corrupt_csv", "q2_cast", "j14_asof_nearest",
    "a16_conditional_aggs", "w10_interval_frames", "t6_pagination",
    "u4_union_by_name", "f10_regex", "s11_stream_static_join",
    "d9_map_in_arrow", "l12_embedding_neardup",
    # the four r7 global-window rewrites
    "x110_revenue_concentration", "x102_collocations",
    "x96_market_basket", "x97_rfm",
    # entries whose code r7 touched (advice fixes + bounded_part)
    "j15_multi_asof", "x104_cc_twophase", "x105_kmeans_elbow",
    "m8_time_travel", "m10_vacuum", "x33_zipf_fit",
    "x80_survival_table", "x83_waterfill_allocation",
    "x17_vocab_coverage", "x42_bigram_perplexity",
    "x95_trigram_journeys",
    # post-window r6 rows (VERDICT r6 #2 enumeration)
    "x111_fulfillment_lag", "v30_tpch_refresh", "m11_codec_report",
    "x85_attribution", "x86_seasonal_outliers", "x88_hard_negatives",
    "x89_tokenizer_fertility", "x90_padding_waste",
    "x91_source_keywords", "x93_winsorize", "x94_path_pattern",
    "x99_ngram_novelty", "x100_datasheet_cube", "x101_semdedup_eval",
    "x106_quality_dedup_interaction", "x107_crawl_stitch",
    "x108_lsh_parameter_sweep", "mm6_interleaved_assembly",
    "s22_stream_seasonal_gate",
    # never-sampled family depth + the four NEW r7 operators (ANN
    # index lifecycle/merge, triangle census, DQ audit) so they get
    # driver evidence in their debut round — still never-sampled
    # slots, overlap unchanged.  (j8b/d8 yielded their slots: both
    # families already carry anchor + r4/r5 evidence.)
    "l6_simhash",
    "x109_ann_index_lifecycle", "x87_ann_index_merge",
    "x112_triangle_count", "x113_dq_audit",
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
