"""Calibration operators (operators/calibration.py): semantic checks
beyond the oracle gate — the oracle proves Spark==DuckDB; these prove
the minimax-form isotonic fit equals the classic pool-adjacent-
violators stack algorithm, and the ECE/Brier integers equal a direct
pure-Python recomputation from the per-row lattice.
"""

from __future__ import annotations

import numpy as np

from geoparquet_python_spark.operators.calibration import (
    _N_BINS,
    _probs,
    q_calibration_bins_ece,
    q_isotonic_calibration,
)


def _pav_stack(rates, weights):
    """Reference weighted PAV via the sequential stack algorithm."""
    blocks = []  # [pooled_rate, weight, n_bins]
    for r, w in zip(rates, weights):
        blocks.append([r, w, 1])
        while len(blocks) > 1 and blocks[-2][0] >= blocks[-1][0]:
            r2, w2, k2 = blocks.pop()
            r1, w1, k1 = blocks.pop()
            blocks.append(
                [(r1 * w1 + r2 * w2) / (w1 + w2), w1 + w2, k1 + k2]
            )
    out = []
    for r, _, k in blocks:
        out.extend([r] * k)
    return out


def test_isotonic_minimax_equals_stack_pav(spark, sf_dir):
    rows = q_isotonic_calibration(spark, sf_dir).collect()
    assert rows, "no bins"
    rates = [r.pos / r.cnt for r in rows]
    weights = [r.cnt for r in rows]
    ref = _pav_stack(rates, weights)
    np.testing.assert_allclose(
        [r.fitted for r in rows], ref, rtol=0, atol=1e-9
    )


def test_isotonic_certifications_hold(spark, sf_dir):
    rows = q_isotonic_calibration(spark, sf_dir).collect()
    assert all(r.mono_ok for r in rows)
    assert all(r.bounds_ok for r in rows)
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    assert all(0 <= r.bin < _N_BINS for r in rows)
    assert all(0.0 <= r.emp_rate <= 1.0 for r in rows)
    # Monotone in the actual values, not just the certified flag.
    fitted = [r.fitted for r in rows]
    assert fitted == sorted(fitted)


def test_ece_matches_pure_python_recomputation(spark, sf_dir):
    got = q_calibration_bins_ece(spark, sf_dir).collect()[0]
    probs = _probs(spark, sf_dir).collect()
    n = len(probs)
    assert got.n_docs == n
    bins: dict[int, list[int]] = {}
    sq = 0
    for p in probs:
        b = min(p.p_ppm * _N_BINS // 1_000_000, _N_BINS - 1)
        cnt, pos, sconf = bins.setdefault(b, [0, 0, 0])
        bins[b] = [cnt + 1, pos + p.y_bit, sconf + p.p_ppm]
        d = p.p_ppm - p.y_bit * 1_000_000
        sq += d * d
    assert got.n_bins == len(bins)
    gaps = {b: abs(pos * 1_000_000 - sconf) for b, (_, pos, sconf) in bins.items()}
    assert got.ece_ppm == sum(gaps.values()) // n
    assert got.max_gap_ppm == max(g // bins[b][0] for b, g in gaps.items())
    assert got.brier_ppm == sq // (n * 1_000_000)
    # Weighted-mean gap can never exceed the worst bin's mean gap.
    assert got.ece_ppm <= got.max_gap_ppm
    assert 0 <= got.brier_ppm <= 1_000_000
