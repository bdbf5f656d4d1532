"""Unit test: grouped OLS linear trend over synthetic hourly volumes."""

from __future__ import annotations

import datetime as dt

from python_multiproc_bigdata_spark.registry.events import events_linear_trend


def test_linear_trend_exact_fit_and_degenerate_drop(spark, tmp_path):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    # type "a": counts 2,5,8,11,14 over hours 0..4 -> slope 3, intercept 2
    for x, y in enumerate([2, 5, 8, 11, 14]):
        for _ in range(y):
            rows.append((eid, 1, "a", base + dt.timedelta(hours=x, seconds=eid % 60), 1.0))
            eid += 1
    # type "b": single active hour -> undefined slope, dropped
    rows.append((eid, 2, "b", base, 1.0))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = {r.event_type: r for r in events_linear_trend(spark, str(tmp_path)).collect()}
    assert set(out) == {"a"}
    a = out["a"]
    assert a.n_hours == 5
    assert abs(a.slope - 3.0) < 1e-9
    assert abs(a.intercept - 2.0) < 1e-9
    assert abs(a.r2 - 1.0) < 1e-9  # perfect linear fit
