"""Lifecycle operators (operators/lifecycle.py): semantic checks —
the oracle proves Spark==DuckDB; these prove the Kaplan-Meier curve
equals a from-scratch product-limit recomputation, the RFM quartiles
partition sanely, and the erasure cascade is complete.
"""

from __future__ import annotations

import math

from geoparquet_python_spark.operators.lifecycle import (
    _CENSOR_S,
    q_rfm_segments,
    q_survival_km_retention,
    q_user_erasure_cascade,
)


def test_km_matches_product_limit_recompute(spark, duck, sf_dir):
    rows = q_survival_km_retention(spark, sf_dir).collect()
    assert rows
    lif = duck.execute(
        f"""
        WITH g AS (SELECT MAX(ts) AS mx FROM events),
        u AS (SELECT user_id, MIN(ts) f, MAX(ts) l FROM events GROUP BY 1)
        SELECT CAST((epoch(l) - epoch(f)) AS BIGINT) // 86400 AS t,
               CAST(epoch(l) <= epoch(mx) - {_CENSOR_S} AS INT) AS ev
        FROM u CROSS JOIN g
        """
    ).fetchall()
    n = len(lif)
    times = sorted({t for t, _ in lif})
    s = 1.0
    at_risk = n
    expect = {}
    for t in times:
        d = sum(1 for tt, ev in lif if tt == t and ev == 1)
        c = sum(1 for tt, ev in lif if tt == t and ev == 0)
        if d >= at_risk:
            s = 0.0
        else:
            # mirror the ppm lattice: sum of rounded lns, re-rounded
            s_ln = sum(
                expect[tt][4] for tt in times if tt < t and tt in expect
            )
            s_ln += round(math.log(1.0 - d / at_risk) * 1e6)
            s = round(math.exp(s_ln / 1e6), 6)
        lnq = (
            round(math.log(1.0 - d / at_risk) * 1e6) if d < at_risk else 0
        )
        expect[t] = (at_risk, d, c, s, lnq)
        at_risk -= d + c
    assert len(rows) == len(times)
    for r in rows:
        n_risk, d, c, s, _ = expect[r.t_days]
        assert (r.n_risk, r.churned, r.censored) == (n_risk, d, c)
        assert abs(r.survival - s) <= 2e-6
    # survival is non-increasing and within [0, 1]
    surv = [r.survival for r in rows]
    assert all(0.0 <= v <= 1.0 for v in surv)
    assert all(a >= b for a, b in zip(surv, surv[1:]))


def test_rfm_segments_partition_users(spark, duck, sf_dir):
    rows = q_rfm_segments(spark, sf_dir).collect()
    n_users = duck.execute(
        "SELECT COUNT(DISTINCT user_id) FROM events"
    ).fetchone()[0]
    assert sum(r.n_users for r in rows) == n_users
    assert all(1 <= r.r_seg <= 4 for r in rows)
    assert all(1 <= r.f_seg <= 4 for r in rows)
    assert all(1 <= r.m_seg <= 4 for r in rows)
    total_cents = duck.execute(
        "SELECT SUM(CAST(round(value * 100) AS BIGINT)) FROM events"
    ).fetchone()[0]
    assert sum(r.sum_cents for r in rows) == total_cents
    # Quartiles on a metric with many distinct values (monetary) are
    # near-balanced: no m-quartile holds more than half the users.
    from collections import defaultdict

    per_m = defaultdict(int)
    for r in rows:
        per_m[r.m_seg] += r.n_users
    assert set(per_m) == {1, 2, 3, 4}
    assert max(per_m.values()) <= n_users / 2


def test_erasure_cascade_complete_and_consistent(spark, sf_dir):
    rows = q_user_erasure_cascade(spark, sf_dir).collect()
    assert rows
    assert all(r.residual_zero for r in rows)
    assert all(r.n_total == r.n_removed + r.n_remaining for r in rows)
    assert any(r.n_removed > 0 for r in rows), "empty deletion cohort"
