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
    # r13 ROTATION (VERDICT r12 #5): ROTATE BY EVIDENCE AGE.
    # With the r12 window green, the stalest driver evidence in the
    # book is the r6-certified block (47 entries whose last
    # driver-green row is CORRECTNESS_r06, six rounds old — the
    # P/S/D/M depth plus the r6 curation/TPC-H breadth) and the one
    # r5 survivor (s2_tumbling_batch, the S-family batch twin).
    # That pool is 48 entries; v6_cte steps aside because
    # v29_recursive_cte — in this same window — exercises a strict
    # superset of its CTE machinery, freeing 3 slots for the three
    # families the stale pool cannot anchor: Q/T/U take their
    # stalest entries anywhere outside r12 (q3_filter and
    # t4_topk_per_group from r8, u1_union from r9).  Overlap with
    # the immediately-prior r12 window is exactly 0; with r11/r10
    # also 0; with r9 {u1}, r8 {q3, t4}; the heavy overlap with the
    # FROZEN r6 window is the point — those slots hold the oldest
    # evidence in the book.  tests/test_registry_order.py locks the
    # overlap bounds, the 50-name shape, and the family anchors.
    #
    # one anchor per §2B family: P Q J A W T U F S D L
    "p2_csv_roundtrip", "q3_filter", "j2_full_outer",
    "a15_grouping_sets", "w7_distribution_ranks",
    "t4_topk_per_group", "u1_union", "f9_bitwise",
    "s2_tumbling_batch", "d6_udaf_grouped", "l10_lang_stats",
    # r13 debut (the m13b/x137/x138 debut-in-window precedent): the
    # multi-maintainer CAS pointer lifecycle.  It takes the slot of
    # x98_rag_pipeline, whose constituent operators (semantic dedup,
    # embedding outliers, k-means assignment) are each independently
    # in-window via x43/x57/x47.
    "m14_cas_publish",
    # the rest of the r6-era block, alphabetical (all equally stale)
    "d7_udtf_table_arg", "l5_ngram_lsh", "m2_scd2", "m3_salted_join",
    "m6_incremental_mv", "m7_zorder_layout", "p15_text_roundtrip",
    "p4_json_roundtrip", "p9_orc_roundtrip", "s10_stream_stream_join",
    "s12_stream_weighted_sample", "s16_stream_quality_gate",
    "s17_stream_decontaminate", "s8_foreach_batch_sink",
    "s9_custom_stateful", "v23_tpch_q6", "v25_tpch_q12_shape",
    "v29_recursive_cte", "v9_tpch_q5", "x103_prefix_filter_join",
    "x37_join_skew_report", "x40_mixture_budget", "x43_semantic_dedup",
    "x46_bpe_encode", "x47_kmeans_clusters", "x48_cluster_safe_split",
    "x50_gopher_quality", "x51_shard_pack", "x52_domain_stats",
    "x53_cluster_balanced_sample", "x55_decontaminate",
    "x56_dedup_threshold_curve", "x57_embedding_outliers",
    "x62_c4_filters", "x6_train_split", "x79_transition_matrix",
    "x92_dominant_direction", "x9_corpus_curation",
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
