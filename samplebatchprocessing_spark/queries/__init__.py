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
    # r10 ROTATION (VERDICT r9 #1): r9 went 50/50 green, so nothing
    # needs re-certification.  45 of the 50 slots are fresh (never
    # driver-sampled): 42 from the 58-entry backlog computed from
    # CORRECTNESS_r01–r09 (ALL 5 post-window r9 debuts first —
    # f11/j16/m12/s26/x132, the verdict's priority — then v1–v7,
    # then the x7–x84 wave), plus the 3 r10 debuts (p21 = verdict
    # #3's object-store sweep, l17 = verdict #2's LSH compaction,
    # d11 grouped-Arrow — debut-in-window is the p20/x132
    # precedent).  The other 5 slots are the Q/A/W/T/U anchors:
    # those families have no uncertified member left; A and W re-use
    # r4-era certified entries outside every frozen window (a2/w3 —
    # zero overlap anywhere), while Q/T/U are FULLY window-covered,
    # so q1/t3 re-use r5 slots and u2 an r6 slot (the u1-in-r9
    # precedent; overlap with any single frozen window <= 2, with
    # the immediately-prior r9 window exactly 0 <= 15).
    # After this window lands green, 16 backlog entries remain (the
    # generic-analytics tail: x26–x32, x49, x60, x69–x76, x84) —
    # r11 mops up and closes the certification debt.
    # tests/test_registry_order.py locks the overlap bounds, the
    # 50-name shape, and the family anchors.
    #
    # one anchor per §2B family: P Q J A W T U F S D L
    "p21_object_store_quarantine", "q1_project_compute",
    "j16_lateral_topk", "a2_global_agg", "w3_running_frames",
    "t3_global_topk", "u2_intersect", "f11_variant",
    "s26_stream_lsh_probe", "d11_apply_in_arrow",
    "l17_lsh_index_compact",
    # remaining post-window r9 debuts (verdict #1's first priority)
    "x132_lsh_index_lifecycle", "m12_observed_metrics",
    # the v1–v7 subquery/pivot SQL-pattern wave
    "v1_pivot", "v2_unpivot", "v3_exists_subquery", "v4_in_subquery",
    "v5_scalar_subquery", "v7_correlated_scalar",
    # the x7–x24 curation-wave tail
    "x7_stratified_sample", "x8_pack_sequences", "x10_pii_redaction",
    "x11_markup_strip", "x12_mixture_weights",
    "x14_repetition_filter", "x15_chunk_tokens",
    "x16_corpus_freq_score", "x18_quota_sample",
    "x22_bpe_pair_counts", "x23_deterministic_shuffle",
    "x24_source_overlap",
    # the x34–x84 curation/dedup/eval wave (generic-analytics tail
    # deferred to r11)
    "x34_source_drift", "x36_dupgraph_triangles",
    "x39_weighted_sample", "x41_snapshot_diff", "x44_bpe_train",
    "x45_feature_hash_embed", "x54_ngram_diversity",
    "x58_cluster_size_histogram", "x59_label_centroid_matrix",
    "x61_countmin_sketch", "x63_chat_validation",
    "x66_containment_neardup", "x67_url_dedup", "x68_bloom_prefilter",
    "x74_rrf_fusion", "x77_embedding_diversity", "x78_token_gini",
    "x81_entity_resolution", "x82_dedup_eval",
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
