"""Unit tests for bench.py's ambient-drift guard (VERDICT r11 item 3).

A full-suite bench record whose MEDIAN per-query ratio vs the committed
baseline exceeds 1.3x is ambient host contention (round 11: a contended
62.1 s driver run overwrote the adjudicated idle-box 55.9 s record, with
untouched round-1 TPC-H plans drifting 1.4-1.7x), not a real regression
— real regressions move a few queries, never the median. The guard
side-files such records to BENCH_LAST_FULL_DRIFTED.json instead of
clobbering the delta baseline. Pure-Python: no Spark session needed.
"""

import bench


def test_thin_sample_never_drifts():
    # <8 comparable queries (subset/bring-up run): guard must stay off
    # even at absurd ratios — a thin sample is not evidence.
    med, drifted = bench._ambient_drift({f"q{i}": 2.0 for i in range(7)})
    assert med is None and not drifted


def test_idle_run_not_drifted():
    deltas = dict(
        zip(
            [f"q{i}" for i in range(10)],
            [0.9, 1.0, 1.1, 1.0, 0.95, 1.05, 1.0, 1.2, 2.0, 1.0],
        )
    )
    med, drifted = bench._ambient_drift(deltas)
    assert not drifted
    assert med == 1.0


def test_real_regressions_do_not_trip_the_guard():
    # Three genuine 3x regressions among nine stable queries: the
    # per-query `regressions` list must catch them (separate path) but
    # the MEDIAN stays ~1.0, so the baseline still gets written.
    deltas = {f"q{i}": 1.0 for i in range(9)}
    deltas.update({"qa": 3.0, "qb": 3.2, "qc": 2.8})
    med, drifted = bench._ambient_drift(deltas)
    assert not drifted
    assert med == 1.0


def test_contended_run_drifted():
    med, drifted = bench._ambient_drift({f"q{i}": 1.45 for i in range(10)})
    assert drifted
    assert med == 1.45


def test_even_count_median_interpolates():
    deltas = {"qa": 1.0, "qb": 1.2, "qc": 1.4, "qd": 1.6}
    deltas.update({f"q{i}": 1.3 for i in range(4)})
    med, drifted = bench._ambient_drift(deltas)
    assert med == 1.3
    assert not drifted  # 1.3 is the threshold, strictly-greater trips


def test_boundary_is_strictly_greater():
    med, drifted = bench._ambient_drift({f"q{i}": 1.3 for i in range(8)})
    assert med == 1.3 and not drifted
    med, drifted = bench._ambient_drift({f"q{i}": 1.301 for i in range(8)})
    assert drifted


# --- core-count-aware delta baseline (optimization r13, VERDICT r12
# item 2): a record taken at a different core count must never become
# the delta/drift baseline — the driver's 8-core scaling leg landing in
# BENCH_LAST_FULL.json gave the next 32-core run phantom ratios on ~50
# queries, undetectably, because records carried no core count.


def test_comparable_times_same_cpus_accepted():
    rec = {"cpus": 32, "queries": {"q1": 1.5}}
    assert bench._comparable_times(rec, 32) == {"q1": 1.5}


def test_comparable_times_other_cpus_rejected():
    rec = {"cpus": 8, "queries": {"q1": 1.5}}
    assert bench._comparable_times(rec, 32) == {}
    assert bench._comparable_times({"cpus": 32, "queries": {"q1": 1.0}}, 8) == {}


def test_comparable_times_driver_wrapper_shape():
    # Driver records stamp cpus at the TOP level and nest the bench
    # line under "parsed" — both the stamp and the times must be found.
    rec = {"cpus": 8, "parsed": {"queries": {"q1": 0.7}}}
    assert bench._comparable_times(rec, 8) == {"q1": 0.7}
    assert bench._comparable_times(rec, 32) == {}
    # cpus inside parsed (bench's own record re-wrapped) also counts.
    rec = {"parsed": {"cpus": 8, "queries": {"q1": 0.7}}}
    assert bench._comparable_times(rec, 8) == {"q1": 0.7}
    assert bench._comparable_times(rec, 32) == {}


def test_comparable_times_legacy_unstamped_is_32_core():
    # Every unstamped record predates the stamp and was a 32-core run:
    # usable at 32 cores, never at any other count.
    rec = {"queries": {"q1": 2.0}}
    assert bench._comparable_times(rec, 32) == {"q1": 2.0}
    assert bench._comparable_times(rec, 8) == {}


def test_comparable_times_failure_record_empty():
    assert bench._comparable_times({"cpus": 32}, 32) == {}
    assert bench._comparable_times({"cpus": 32, "queries": None}, 32) == {}
