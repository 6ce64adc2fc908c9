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
    # r12 ROTATION (VERDICT r11 #5): ROTATE BY EVIDENCE AGE.
    # Certification debt is zero (r11 closed it at 341/341), so this
    # window re-certifies the 50 entries whose last driver-green is
    # OLDEST: every r4-era survivor outside the r11 window (j9/j10/
    # x35/w5/w6/f4/f5/f6/f8 — last sampled 7 rounds ago) and the
    # deepest r5-era block (the P/S/D/L family depth of the r5
    # window, untouched since), plus the 3 r12 debuts
    # (m13b = verdict #3's object-store publish, x137/x138 =
    # verdict #4's artifact retrain sweeps — debut-in-window is the
    # p20/x132/m13 precedent).  The Q/T/U family anchors take the
    # stalest entries those families offer outside r11 (q5 from r6,
    # t6 from r7, u3 from r8).  Overlap with the immediately-prior
    # r11 window is exactly 0; with r10/r9 also 0; with r8 {u3},
    # r7 {t6}, r6 {q5}; the heavy overlap with the FROZEN r5 window
    # is the point — those slots hold the oldest evidence in the
    # book.  tests/test_registry_order.py locks the overlap bounds,
    # the 50-name shape, and the family anchors.
    #
    # one anchor per §2B family: P Q J A W T U F S D L
    "p3_csv_infer", "q5_nested_pruning", "j9_star_join",
    "a1_pricing_summary", "w5_first_last", "t6_pagination",
    "u3_except", "f4_conditional", "s2_tumbling_window",
    "d2_pandas_udf", "l2_tokenize",
    # r12 debuts: the object-store versioned-pointer publish and the
    # two trained-artifact retrain sweeps
    "m13b_store_publish", "x137_vocab_retrain_sweep",
    "x138_model_retrain_sweep",
    # remaining r4-era survivors (last driver-green 7 rounds ago)
    "j10_fuzzy_join", "x35_quality_audit", "w6_gapfill",
    "f5_array", "f6_struct_map", "f8_hash",
    # the r5-era block: the oldest evidence after r4
    "a12_two_phase", "j1_inner_join", "w1_ranking", "f1_string",
    "l3_token_counts", "l4_tfidf", "l5_jaccard_pairs",
    "l6_minhash_lsh", "l7_cosine_topk", "l8_sim_join",
    "l9_binary_ingest", "l11_dedup_clusters", "x20_pretrain_pipeline",
    "x65_dsir_weights", "mm1_image_features", "x13_contamination",
    "d3_apply_in_pandas", "d4_map_in_pandas", "d5_udtf_explode",
    "p6_parquet_sink", "p7_partitioned_sink", "p8_manifest_pipeline",
    "s3_sliding_window", "s4_session_window", "s5_watermark_append",
    "s6_stream_dedup", "s7_stateful_agg", "v8_tpch_q3", "m1_upsert",
    "x25_funnel",
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
