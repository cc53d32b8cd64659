"""Pin window_cusum_changepoint to Page's recursion itself.

The driver's oracle compare runs the same prefix-sum identity in
DuckDB, so a shared formulation error (e.g. omitting the P_0 = 0 term
of S_i = P_i - min(0, P_1..P_i)) passes parity while diverging from
the documented statistic. This test computes S_i = max(0, S_{i-1} +
x_i - K) imperatively on a tiny fixture and checks the registered
query's peak/per-user output against it — including the case that
breaks the unclamped form: a user whose FIRST deviation is positive
(all prefix sums > 0, so min(P_1..P_i) = P_1 > 0 and the unclamped
statistic under-reports by exactly P_1).
"""

from __future__ import annotations

import datetime as dt

from protarrow_spark.queries.registry import all_queries
from protarrow_spark.queries.relational import CUSUM_REF


def _page_peak(values: list[float]) -> float:
    s = 0.0
    peak = 0.0
    for v in values:
        s = max(0.0, s + (v - CUSUM_REF))
        peak = max(peak, s)
    return peak


def test_cusum_matches_page_recursion(spark, tmp_path):
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    # User 1000: first deviation POSITIVE (the clamp-omission trap:
    # P = [40, -10, -60], min-prefix never <= 0, unclamped st == 0).
    # User 2000: first deviation negative (both forms agree: 50).
    rows = []
    fixtures = {1000: [100.0, 10.0, 10.0], 2000: [10.0, 100.0, 70.0]}
    eid = 1
    for uid, vals in fixtures.items():
        for i, v in enumerate(vals):
            rows.append(
                (eid, uid, base + dt.timedelta(minutes=i), "purchase", v)
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    q = all_queries()["window_cusum_changepoint"]
    got = {
        r["user_id"]: r["cusum_max"]
        for r in q(spark, str(tmp_path)).collect()
    }
    want = {uid: _page_peak(vals) for uid, vals in fixtures.items()}
    assert got == want
    assert want[1000] == 40.0  # the case the unclamped form reports as 0
