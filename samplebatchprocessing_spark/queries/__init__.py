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
    # r9 ROTATION (VERDICT r8 #1): r8 went 50/50 green, so nothing
    # needs re-certification.  45 of the 50 slots are fresh (never
    # driver-sampled): 42 from the 95-entry backlog computed from
    # CORRECTNESS_r01–r08, plus the 3 r9 debuts (p20 poison
    # quarantine = verdict #5, l7_topk_ivf_dist = verdict #3's
    # registry-wired persisted+distributed ANN probe, d10 cogrouped
    # applyInPandas — debut-in-window is the x109/x112/x113/x114
    # precedent).  The other 5 slots are the Q/W/T/U/F anchors: those
    # families have no uncertified member left, so they re-use
    # r1–r4-era certified entries outside every later window
    # (q4/w2/t1/f2; U is fully window-covered, so u1 re-uses an r5
    # slot — the only overlap with ANY frozen window, 1 <= 15).
    # Slot priorities follow the r8 verdict's enumeration: ALL the r8
    # debuts (x115–x131, s23–s25), the TPC-H shapes v14–v28, m4/m5/
    # m9, j11/j13/a14, then the head of the x1–x24 curation wave.
    # After this window lands green, 58 backlog entries remain:
    # 53 pre-r9 (the x7–x24 curation tail, v1–v7 subquery/pivot,
    # x26+ analytics, x34–x84 misc) plus the 5 later r9 debuts that
    # postdate this window (x132, s26, j16, f11, m12) — r10 takes
    # ~45, r11 mops up.
    # tests/test_registry_order.py locks the overlap bounds, the
    # 50-name shape, and the family anchors.
    #
    # one anchor per §2B family: P Q J A W T U F S D L
    "p20_poison_quarantine", "q4_distinct", "j13_temporal_join",
    "a14_regression", "w2_lag_lead", "t1_multi_sort",
    "u1_union", "f2_datetime", "s23_stream_ann_probe",
    "d10_cogrouped_pandas", "l7_topk_ivf_dist",
    # the complete r8 debut block (verdict #1's first priority)
    "x115_nb_quality_eval", "x116_edit_distance_join",
    "x117_inverted_index", "x118_kcore", "x119_bnl_topk",
    "x120_label_propagation", "x121_postings_merge",
    "x122_sequence_pack", "x123_postings_compact",
    "x124_sequence_census", "x125_incremental_pack",
    "x126_ivf_probe_sweep", "x127_incremental_tfidf",
    "x128_incremental_nb", "x129_nb_calibration",
    "x130_table_checksum", "x131_incremental_checksum",
    "s24_stream_postings_merge", "s25_stream_incremental_pack",
    # TPC-H shapes never driver-sampled
    "v14_tpch_q20", "v15_tpch_q17", "v16_tpch_q15", "v17_tpch_q13",
    "v19_tpch_q22", "v21_tpch_q14", "v22_tpch_q4",
    "v24_tpch_q9_shape", "v26_tpch_q2_shape", "v27_tpch_q11_shape",
    "v28_tpch_q16_shape",
    # maintenance + join stragglers
    "m4_bucketed_join", "m5_purge", "m9_skipping_report",
    "j11_interval_overlap",
    # head of the x1–x24 curation wave
    "x1_lang_id", "x2_quality_score", "x3_fingerprint",
    "x4_text_distance", "x5_bpe_token_counts",
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
