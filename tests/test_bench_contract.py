"""The BENCH harness's one-JSON-line contract (VERDICT r5 #6): a
crashing query must null the headline — a partial sum would read as a
speedup — while the per-query detail and error inventory survive."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import BENCH_QUERIES, summarize


def test_summary_clean_run():
    timings = {"q1": 1.5, "q2": 0.25}
    out = summarize(timings, {}, "/root/testdata/sf0.1")
    assert out["value"] == 1.75
    assert out["queries"] == timings
    assert "errors" not in out and "n_errored" not in out
    json.dumps(out)  # one-line contract: must be JSON-serializable


def test_summary_forced_failure_nulls_headline():
    timings = {"q1": 1.5, "q2": {"err": "Boom: kaput"}}
    errors = {"q2": "Boom: kaput"}
    out = summarize(timings, errors, "/root/testdata/sf0.1")
    assert out["value"] is None          # headline never lies faster
    assert out["n_errored"] == 1
    assert out["partial_sum_sec"] == 1.5  # debugging detail survives
    assert out["errors"] == errors
    json.dumps(out)


def test_bench_queries_exist_in_registry():
    # bench-only entries time a serving shape (index probe / fresh
    # drain) that the registry form deliberately does not expose;
    # each must have an override in bench.main (checked by name here,
    # exercised by the per-round bench run).
    bench_only = {"x109_ann_index_probe", "p10_watch_drain",
                  "x117_postings_probe", "l7_ivf_dist_probe",
                  "x132_lsh_probe", "x131_delta_merge",
                  "s26_epoch_probe"}
    from samplebatchprocessing_spark.queries import registry
    reg = registry()
    missing = [n for n in BENCH_QUERIES
               if n not in reg and n not in bench_only]
    assert not missing, missing


def test_sentinel_verdict_direction_aware():
    """The contamination flag is direction-aware: JIT warmup (post
    faster than pre, measured 0.51-0.86x on every quiet run) must
    NOT flag; load ramping during the suite (post slower) must."""
    from bench import sentinel_verdict
    warm = sentinel_verdict(0.468, 0.238)      # measured quiet run
    assert warm["contaminated"] is False
    assert warm["sentinel"]["post_over_pre"] == 0.509
    loaded = sentinel_verdict(0.30, 0.95)      # box loaded mid-suite
    assert loaded["contaminated"] is True
    flat = sentinel_verdict(0.30, 0.33)        # within noise
    assert flat["contaminated"] is False
    degenerate = sentinel_verdict(0.0, 0.5)    # guard: no div-by-zero
    assert degenerate["contaminated"] is False
    assert degenerate["sentinel"]["post_over_pre"] is None
    import json
    json.dumps(warm)
