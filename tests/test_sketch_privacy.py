"""Semantic checks for the certified GK quantile sketch
(operators/sketches.py) and the deterministic DP release
(operators/privacy.py) — the oracle proves Spark==DuckDB; these prove
the outputs equal independent pure-Python/numpy recomputations.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

from geoparquet_python_spark.operators.privacy import (
    _B,
    _EPS,
    _SEED,
    q_dp_noisy_counts,
)
from geoparquet_python_spark.operators.sketches import (
    _QTILES,
    q_approx_percentile_certified,
)


def test_certified_percentile_matches_numpy_ceil_rank(spark, duck, sf_dir):
    rows = q_approx_percentile_certified(spark, sf_dir).collect()
    vals = duck.execute(
        "SELECT l_returnflag, l_extendedprice FROM lineitem"
    ).df()
    flags = sorted(vals.l_returnflag.unique())
    assert [r.l_returnflag for r in rows] == [
        f for f in flags for _ in _QTILES
    ]
    for r in rows:
        v = np.sort(
            vals[vals.l_returnflag == r.l_returnflag].l_extendedprice.values
        )
        assert r.n == len(v)
        rank = math.ceil(r.qtile * len(v))
        assert r.exact_val == v[rank - 1]
        assert r.within_rank_bound


def test_dp_noise_matches_pure_python_mechanism(spark, duck, sf_dir):
    rows = q_dp_noisy_counts(spark, sf_dir).collect()
    exact = dict(
        duck.execute(
            "SELECT lang, COUNT(*) FROM documents GROUP BY lang"
        ).fetchall()
    )
    assert [r.lang for r in rows] == sorted(exact)
    some_noise = False
    for r in rows:
        h = int(hashlib.md5((_SEED + r.lang).encode()).hexdigest()[:15], 16)
        u = ((h % 999999) - 499999) / 1_000_000.0
        noise = round(-_B * math.copysign(1.0, u) * math.log(1.0 - 2.0 * abs(u)), 6) if u != 0 else 0.0
        # libm vs JVM ln can differ by 1 ulp pre-rounding; compare on
        # the 1e-6 lattice with one grid step of slack.
        assert abs((r.noisy_count - exact[r.lang]) - noise) <= 2e-6
        assert r.epsilon == _EPS
        assert r.tail_ok
        some_noise = some_noise or abs(r.noisy_count - exact[r.lang]) > 1e-9
    assert some_noise, "mechanism added no noise anywhere"
