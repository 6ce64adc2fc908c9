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
    # r11 ROTATION (VERDICT r10 #1): CLOSE THE CERTIFICATION DEBT.
    # r10 went 50/50 green, so nothing needs re-certification; the
    # 23 fresh slots are ALL 17 never-driver-sampled entries named
    # by the r10 verdict (the generic-analytics tail x26–x84 plus
    # the x133 debut) and the 6 r11 debuts (m13 = verdict #2's
    # atomic index publish, x134 = verdict #3's maintenance sweep,
    # w11 = the GROUPS-frame composition, x135/x136/s27 = the
    # published trained-artifact lifecycles — debut-in-window is
    # the p20/x132/p21 precedent).  Landing this window green puts
    # cumulative driver certification at 341/341.
    # The 27 anchor slots re-certify the OLDEST evidence in the
    # book: 20 are r4-era certified entries that have sat outside
    # EVERY frozen window since (a3–a13, j2–j8, w4, f3 — zero
    # overlap with anything), and the remaining P/Q/T/U/S/D/L
    # family anchors re-use the oldest slots available (p1/s1/d1/l1
    # from r5, t5 from r6, q2/u4 from r7) — overlap with the
    # immediately-prior r10 window is exactly 0 <= 15, with r9/r8
    # also 0, with r7 2, r6 1, r5 4.
    # tests/test_registry_order.py locks the overlap bounds, the
    # 50-name shape, and the family anchors.
    #
    # one anchor per §2B family: P Q J A W T U F S D L
    "p1_parquet_scan", "q2_cast", "j2_left_join",
    "a3_count_distinct", "w4_range_frame", "t5_range_sorted_layout",
    "u4_union_by_name", "f3_math", "s1_stream_scan", "d1_scalar_udf",
    "l1_exact_dedup",
    # r11 debuts: the atomic versioned-pointer publish, the
    # maintenance sweep that drives it, the GROUPS-frame window
    # composition, and the two published-trained-artifact lifecycles
    # (BPE vocab, NB model) riding the same pointer
    "m13_index_publish", "x134_maintenance_sweep",
    "w11_groups_frame", "x135_vocab_publish", "x136_model_publish",
    "s27_stream_vocab_encode",
    # the 17-entry certification backlog, in full (verdict r10 #1)
    "x26_retention", "x27_peak_concurrency", "x28_histogram",
    "x30_zscore_outliers", "x31_decile_stats", "x32_conversion_lag",
    "x49_ewma", "x60_hll_union", "x69_weighted_median",
    "x70_mad_outliers", "x71_debounce_trailing", "x72_k_anonymity",
    "x73_table_profile", "x75_rolling_active_users", "x76_ab_test",
    "x84_bot_detection", "x133_ivf_recluster",
    # r4-era re-certification anchors (outside every frozen window
    # since the module-order era — the oldest driver evidence)
    "a4_stddev_var", "a5_having", "a6_rollup", "a6_cube",
    "a7_argmax", "a8_collect_list", "a9_percentile",
    "a10_approx_distinct", "a11_approx_percentile", "a13_corr_covar",
    "j3_semi_anti", "j4_cross_join", "j5_broadcast_join",
    "j6_theta_join", "j7_range_join", "j8_asof_join",
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
