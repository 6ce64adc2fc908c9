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


def test_sentinel_verdict_interleaved_mid_samples():
    """r12 rule (VERDICT r11 #1b): a load burst confined to the
    MIDDLE of the suite is invisible to the pre/post pair — two or
    more mid controls above 1.5x the pre floor must flag, while one
    blip (mid samples are single runs) must not."""
    from bench import sentinel_verdict
    # mid-suite burst: pre/post both quiet, middle controls hot
    burst = sentinel_verdict(0.30, 0.28, mid=[0.31, 0.95, 1.10, 0.29])
    assert burst["contaminated"] is True
    assert burst["sentinel"]["mid_hot"] == 2
    # one scheduler blip: tolerated (mid samples are single runs)
    blip = sentinel_verdict(0.30, 0.28, mid=[0.31, 0.95, 0.30, 0.29])
    assert blip["contaminated"] is False
    # quiet run: mid samples keep warming like post does
    quiet = sentinel_verdict(0.30, 0.24, mid=[0.28, 0.26, 0.25])
    assert quiet["contaminated"] is False
    # back-compat: omitted mid behaves exactly as before
    assert sentinel_verdict(0.30, 0.33)["sentinel"]["mid_sec"] == []
    import json
    json.dumps(burst)


def test_tree_cpu_sec_counts_spun_cpu():
    """The per-query CPU instrument (VERDICT r11 #1a): the
    process-tree CPU counter must be monotone and must observe CPU
    burned by this process AND by a live child — getrusage(CHILDREN)
    would miss the un-reaped child, which is exactly the local[*]
    JVM's shape."""
    import subprocess
    import time as _t
    from bench import tree_cpu_sec
    c0 = tree_cpu_sec()
    # burn ~0.2 s of CPU in-process
    t_end = _t.process_time() + 0.2
    while _t.process_time() < t_end:
        pass
    # burn ~0.3 s in a LIVE (not yet reaped) child, sampled mid-run
    child = subprocess.Popen(
        [sys.executable, "-c",
         "import time\n"
         "t=time.process_time()\n"
         "while time.process_time()<t+0.3: pass\n"
         "time.sleep(5)"])
    try:
        _t.sleep(1.5)  # child has burned its CPU, still alive
        c1 = tree_cpu_sec()
        assert c1 >= c0, (c0, c1)
        assert c1 - c0 >= 0.4, (c0, c1)  # 0.2 self + 0.3 child, slack
    finally:
        child.kill()
        child.wait()


def test_paired_median_keeps_wall_cpu_from_same_sample():
    """ADVICE r12 #3: the recorded CPU must come from the SAME sample
    as the wall median, not an independently sorted series — two
    independent medians can pair sample-2 wall with sample-1 CPU and
    weaken the 'wall breaches while CPU holds' adjudication."""
    from bench import paired_median
    # wall median is sample index 2 (1.5); its CPU is 9.0 — the
    # independently-sorted CPU median would be 5.0 (from sample 0)
    wall, cpu = paired_median([1.0, 2.0, 1.5], [5.0, 1.0, 9.0])
    assert (wall, cpu) == (1.5, 9.0)
    # degenerate equal walls: any pair is a faithful pair
    wall, cpu = paired_median([1.0, 1.0, 1.0], [3.0, 1.0, 2.0])
    assert wall == 1.0 and cpu in (1.0, 2.0, 3.0)


def test_adjudicate_dual_basis_rule():
    """VERDICT r12 #3: the BASELINE.md prose rule, mechanized.
    wall <= 2x = ok; wall breach with CPU inside 1.5x = box load;
    both breached on a stable median = real; CPU in (1.5, 2] = watch
    (the r12 j15 precedent); unstable median = re-measure first (the
    r12 m9 precedent); no basis = new."""
    from bench import adjudicate
    basis = (1.0, 10.0)
    assert adjudicate(1.9, 30.0, basis)["verdict"] == "ok"
    assert adjudicate(4.7, 14.0, basis)["verdict"] == "box_load"
    assert adjudicate(4.7, 19.6, basis)["verdict"] == "watch"
    assert adjudicate(4.7, 22.0, basis)["verdict"] == "real"
    assert adjudicate(4.7, 22.0, basis,
                      unstable=True)["verdict"] == "unstable"
    # unstable never masks a box_load call: CPU holding is decisive
    assert adjudicate(4.7, 14.0, basis,
                      unstable=True)["verdict"] == "box_load"
    assert adjudicate(9.9, 9.9, None) == {"verdict": "new"}
    r = adjudicate(2.5, 18.0, basis)
    assert r["wall_ratio"] == 2.5 and r["cpu_ratio"] == 1.8


def test_adjudicate_anomalous_cpu_never_stamps_box_load():
    """VERDICT r13 #2: a query in cpu_anomalies (negative tree-CPU
    delta clamped to 0.0 — the measurement is INCOMPLETE, not small)
    must never adjudicate as box_load or real: "CPU holds" cannot be
    read off a number the instrument itself flagged as untrustworthy.
    Fixture = x103_prefix_filter_join's official r13 record, which
    stamped box_load on wall_ratio 2.28 / cpu_ratio 0.0 while sitting
    in cpu_anomalies (bench_full.json r13)."""
    from bench import BASIS, adjudicate
    basis = BASIS["x103_prefix_filter_join"]        # (6.162, 6.98)
    r = adjudicate(14.04, 0.0, basis, cpu_untrusted=True)
    assert r["verdict"] == "unstable"
    assert r["cpu_ratio"] == 0.0
    # the clamp can also land mid-query leaving a PARTIAL (nonzero
    # but low) CPU median — equally untrusted
    assert adjudicate(14.04, 3.0, basis,
                      cpu_untrusted=True)["verdict"] == "unstable"
    # untrusted CPU also blocks a real/watch call (both need a
    # trusted CPU breach)
    assert adjudicate(14.04, 30.0, basis,
                      cpu_untrusted=True)["verdict"] == "unstable"
    # wall inside the gate stays ok: no breach to adjudicate
    assert adjudicate(6.0, 0.0, basis,
                      cpu_untrusted=True)["verdict"] == "ok"
    # and a TRUSTED holding CPU still reads box_load, with or without
    # wall instability (CPU holding is decisive — unchanged rule)
    assert adjudicate(14.04, 7.0, basis,
                      unstable=True)["verdict"] == "box_load"


def _fake_full_record(n_breaches: int = 0):
    from bench import BENCH_QUERIES, adjudicate, BASIS, summarize
    timings = {n: 11.234 for n in BENCH_QUERIES}
    full = summarize(timings, {}, "/root/testdata/sf0.1")
    full["cpu_queries"] = {n: 22.345 for n in BENCH_QUERIES}
    full["cpu_total_sec"] = 987.654
    full["contaminated"] = False
    full["sentinel"] = {"pre_sec": 0.4, "post_sec": 0.3,
                        "post_over_pre": 0.75,
                        "mid_sec": [0.4] * 7, "mid_hot": 0}
    full["basis"] = "r12-unified"
    # force n_breaches real verdicts, rest ok
    full["verdicts"] = {}
    for i, n in enumerate(BENCH_QUERIES):
        if i < n_breaches:
            full["verdicts"][n] = adjudicate(99.0, 99.0, (1.0, 1.0))
        else:
            full["verdicts"][n] = adjudicate(0.5, 0.5, (1.0, 1.0))
    full["full_record"] = "/root/repo/bench_full.json"
    return full


def test_compact_line_fits_budget_and_parses():
    """VERDICT r12 #1: BENCH_r12 was unparseable because the single
    stdout line outgrew the driver's tail capture.  The compact line
    must stay under the budget — with the FULL current suite and even
    with every query breaching — and round-trip through json.loads
    with the driver-contract fields intact."""
    from bench import BENCH_QUERIES, COMPACT_LINE_BUDGET, compact_line
    for n_breaches in (0, 5, len(BENCH_QUERIES)):
        s = compact_line(_fake_full_record(n_breaches))
        assert len(s.encode()) <= COMPACT_LINE_BUDGET, (
            n_breaches, len(s.encode()))
        back = json.loads(s)
        assert back["metric"] == "bench_suite_wall_sec"
        assert len(back["queries"]) == len(BENCH_QUERIES)
        assert back["value"] is not None
        assert back["cpu_total_sec"] == 987.654
        assert back["contaminated"] is False
        assert "verdict_counts" in back


def test_compact_line_survives_error_rows():
    from bench import compact_line
    full = _fake_full_record(0)
    full["queries"]["x44_bpe_train"] = {"err": "Boom: " + "x" * 400}
    full["value"] = None
    full["n_errored"] = 1
    full["partial_sum_sec"] = 100.0
    s = compact_line(full)
    back = json.loads(s)
    assert back["n_errored"] == 1
    assert back["value"] is None


def test_basis_table_matches_baseline_md():
    """The embedded BASIS dict and BASELINE.md's r12 UNIFIED table
    are the same numbers — parse the markdown and compare, so the
    instrument can't silently drift from the human-canon record."""
    import re as _re
    from bench import BASIS
    text = (Path(__file__).resolve().parent.parent
            / "BASELINE.md").read_text()
    anchor = text.index("Round-12 UNIFIED baseline")
    rows = _re.findall(
        r"^\| (\w+) \| ([\d.]+) \| ([\d.]+) \|$",
        text[anchor:], flags=_re.M)
    table = {n: (float(w), float(c)) for n, w, c in rows}
    assert table == BASIS


def test_noop_basis_table_matches_baseline_md():
    """r15 re-anchor (guide §1.4): the embedded BASIS_NOOP dict and
    BASELINE.md's r15 UNIFIED noop table are the same numbers — the
    noop table's rows carry two extra bridge columns, so the r12
    3-column regex above cannot cross-match them."""
    import re as _re
    from bench import BASIS_NOOP, BENCH_QUERIES, ACTION_DEFAULT
    assert ACTION_DEFAULT == "noop"
    text = (Path(__file__).resolve().parent.parent
            / "BASELINE.md").read_text()
    anchor = text.index("Round-15 UNIFIED noop baseline")
    rows = _re.findall(
        r"^\| (\w+) \| ([\d.]+) \| ([\d.]+) \| [\d.]+ \| [\d.]+ \|$",
        text[anchor:], flags=_re.M)
    table = {n: (float(w), float(c)) for n, w, c in rows}
    assert table == BASIS_NOOP
    # every bench row has a noop basis (no silent debut rows)
    assert set(BASIS_NOOP) == set(BENCH_QUERIES)


def test_bandwidth_verdict_rules():
    """r13 addendum 2: the memory-bandwidth control's verdict mirrors
    the warm sentinel's direction-aware rules — post slower than
    1.5x pre flags, one mid blip tolerated, two or more sustained
    mid samples flag, no div-by-zero on a degenerate pre."""
    from bench import bandwidth_verdict
    quiet = bandwidth_verdict(0.045, 0.047, mid=[0.046, 0.044])
    assert quiet["mem_pressure"] is False
    pressured = bandwidth_verdict(0.045, 0.095)
    assert pressured["mem_pressure"] is True
    burst = bandwidth_verdict(0.045, 0.046, mid=[0.09, 0.11, 0.05])
    assert burst["mem_pressure"] is True
    assert burst["bandwidth"]["mid_hot"] == 2
    blip = bandwidth_verdict(0.045, 0.046, mid=[0.09, 0.046, 0.044])
    assert blip["mem_pressure"] is False
    degenerate = bandwidth_verdict(0.0, 0.05)
    assert degenerate["mem_pressure"] is False
    json.dumps(pressured)


def test_disk_verdict_rules():
    """r14: the uncached-disk-read control's verdict mirrors the
    other sentinels' direction-aware rules — post slower than 1.5x
    pre flags, one mid blip tolerated, two or more sustained mid
    samples flag, no div-by-zero on a degenerate pre.  io_slow is
    ADVISORY: the main() wiring must NOT fold it into contaminated
    (wall-only inflation leaves the CPU axis sound)."""
    from bench import disk_verdict
    quiet = disk_verdict(0.02, 0.021, mid=[0.019, 0.022])
    assert quiet["io_slow"] is False
    slow = disk_verdict(0.02, 0.045)
    assert slow["io_slow"] is True
    burst = disk_verdict(0.02, 0.021, mid=[0.05, 0.06, 0.02])
    assert burst["io_slow"] is True and burst["disk"]["mid_hot"] == 2
    blip = disk_verdict(0.02, 0.021, mid=[0.05, 0.02, 0.019])
    assert blip["io_slow"] is False
    assert disk_verdict(0.0, 0.05)["io_slow"] is False
    json.dumps(slow)
    # advisory, not contaminating: main() computes contaminated
    # BEFORE merging the disk verdict — lock the wiring order by
    # source inspection (the cheap honest check; a full main() run
    # needs a Spark session)
    src = (Path(__file__).resolve().parent.parent
           / "bench.py").read_text()
    fold = src.index('out["contaminated"] = out["contaminated"] or')
    disk = src.index('out.update(disk_verdict(')
    assert fold < disk, "disk verdict must not precede the " \
        "contaminated fold — io_slow is advisory only"
    assert "io_slow" not in src[fold:src.index("\n", fold)], \
        "io_slow must not fold into contaminated"


def test_disk_control_measures_an_uncached_read():
    """The control itself: writes a 32 MB file, drops its cache per
    sample, reads it back — returns seconds > 0, repeatable, and
    cleanup removes THE FILE THIS CONTROL CREATED (a bare
    no-files-at-all glob flaked on orphans a SIGTERM'd bench run of
    the same box left behind — those are the orphan sweep's job,
    not cleanup's)."""
    import glob

    from bench import make_disk_control
    before = set(glob.glob("/tmp/sbp_bench_disk_*"))
    sample, cleanup = make_disk_control()
    created = set(glob.glob("/tmp/sbp_bench_disk_*")) - before
    assert len(created) == 1
    try:
        a, b = sample(), sample()
        assert 0 < a < 30 and 0 < b < 30
    finally:
        cleanup()
    assert not (set(glob.glob("/tmp/sbp_bench_disk_*")) & created), \
        "disk-control file must be removed by cleanup"


def test_bandwidth_control_measures_the_reduction():
    """The control itself: a fixed-size float64 reduction, repeatable
    within a loose band on a single process (this is a smoke bound,
    not a perf assertion — the point is it runs and returns seconds)."""
    from bench import make_bandwidth_control
    sample = make_bandwidth_control()
    xs = [sample() for _ in range(3)]
    assert all(0 < x < 5.0 for x in xs), xs
