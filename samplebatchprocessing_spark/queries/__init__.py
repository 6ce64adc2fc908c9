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
    # r8 ROTATION (VERDICT r7 #1): r7 went 50/50 green, so nothing
    # needs re-certification.  46 of the 50 slots come straight from
    # the 120-entry never-driver-sampled list (computed from
    # CORRECTNESS_r01–r07); the other 4 are the Q/T/U/F anchors —
    # those families have no uncertified member left, so the anchors
    # re-use r1–r4-era certified entries that appeared in NONE of the
    # r5/r6/r7 windows (q3/t4/u3/f7 -> overlap with all three frozen
    # prior windows is exactly 0).  Slot priorities follow the r7
    # verdict's enumeration: the l7 ANN variants, the l13–l16 dedup
    # materializations, the p14/p17–p19 Python data sources, TPC-H
    # v-rows, the s13–s21 serving twins, and mm2–mm5.  After this
    # window lands green, 80 entries remain uncertified (~2 more
    # rotations; the r8 debuts s23_stream_ann_probe,
    # x115_nb_quality_eval, x116_edit_distance_join,
    # x117_inverted_index, x118_kcore, x119_bnl_topk,
    # x120_label_propagation, x121_postings_merge, x122_sequence_pack,
    # x123_postings_compact, x124_sequence_census,
    # x125_incremental_pack, x126_ivf_probe_sweep,
    # x127_incremental_tfidf, x128_incremental_nb,
    # x129_nb_calibration, x130_table_checksum,
    # x131_incremental_checksum,
    # s24_stream_postings_merge and
    # s25_stream_incremental_pack head that
    # r9 backlog, then the x1–x45
    # text-curation block, the v1–v7 subquery/pivot block, the
    # remaining TPC-H v-rows, and the x26+ analytics tail).
    # tests/test_registry_order.py locks the overlap bound, the
    # 50-name shape, and the family anchors.
    #
    # one anchor per §2B family: P Q J A W T U F S D L
    "p14_python_datasource", "q3_filter", "j8b_asof_forward",
    "a17_mode", "w8_debounce", "t4_topk_per_group",
    "u3_except", "f7_json", "s13_stream_doc_scoring",
    "d8_arrow_udf", "l7_topk_ivf",
    # L depth: ANN variants + dedup materializations (verdict #1 list)
    "l5_ngram_jaccard", "l7_topk_numpy", "l7_topk_lsh", "l7_topk_pq",
    "l13_paragraph_dedup", "l14_incremental_dedup",
    "l15_fuzzy_dedup_keep", "l16_dedup_keep_best",
    "x38_incremental_fuzzy_dedup",
    # P depth: Python/Arrow data sources + maintenance readers
    "p10_watch_prefix", "p11_compaction", "p12_schema_merge",
    "p16_corrupt_json", "p17_python_stream_source",
    "p18_python_stream_sink", "p19_arrow_datasource",
    # TPC-H shapes never driver-sampled
    "v10_tpch_q10", "v11_tpch_q18", "v12_tpch_q21", "v13_tpch_q7",
    "v18_tpch_q19", "v20_tpch_q8",
    # S depth: serving twins
    "s4_session_batch", "s14_stream_semantic_dedup",
    "s15_stream_cluster_assign", "s18_stream_dsir_gate",
    "s19_stream_bloom_gate", "s21_stream_incremental_mv",
    # multimodal
    "mm2_frame_sample", "mm3_audio_features", "mm4_phash_dedup",
    "mm5_audio_dedup",
    # breadth fill from the never-sampled list + the r8 debut
    # (x114 distributed-query ANN probe gets driver evidence in its
    # debut round, the x109/x112/x113 precedent; x67_url_dedup
    # yielded its slot to the r9 backlog)
    "j8c_asof_tolerance", "w9_running_distinct", "x19_heavy_hitters",
    "x21_substring_dedup", "x29_pagerank", "x64_span_dedup",
    "x114_ann_batch_probe",
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
