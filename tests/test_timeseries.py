"""Gap-fill / OHLC invariants (operators/timeseries.py). Value
equality is the registered DuckDB oracles' job; these pin the grid
semantics."""

from __future__ import annotations

import datetime as dt

from geoparquet_python_spark import registry

registry.load_all()

_HOUR = dt.timedelta(hours=1)


def test_gapfill_grid_is_contiguous_and_locf_total(spark, sf_dir_small):
    rows = registry.QUERIES["q_events_gapfill_hourly"](
        spark, sf_dir_small
    ).collect()
    per_user: dict[int, list] = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(r)
    assert per_user
    for user_id, rs in per_user.items():
        rs.sort(key=lambda r: r.bucket)
        # contiguous hourly grid over the user's span
        for a, b in zip(rs, rs[1:]):
            assert b.bucket - a.bucket == _HOUR, f"gap in grid for {user_id}"
        # span endpoints carry observations; LOCF leaves no NULLs
        assert rs[0].n_events > 0 and rs[-1].n_events > 0
        assert all(r.filled_value is not None for r in rs)
        # empty buckets repeat the previous filled value
        for a, b in zip(rs, rs[1:]):
            if b.n_events == 0:
                assert b.filled_value == a.filled_value


def test_ohlc_bounds(spark, sf_dir_small):
    rows = registry.QUERIES["q_events_ohlc_hourly"](
        spark, sf_dir_small
    ).collect()
    assert rows
    for r in rows:
        assert r.low <= r.high
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        assert r.n_events >= 1
