"""Trend-monitoring shelf end-to-end: one daily-count pass feeding the
whole detection/estimation/forecast stack.

Run: python examples/trend_monitoring.py [sf_dir]

The round-9 trend surface, composed the way a monitoring stack layers
them — each answers a different question about the SAME series:

1. daily_bursts        — "is TODAY anomalous?"   (point outlier)
2. daily_cusum         — "is a shift HAPPENING?" (online accumulation)
3. changepoint_split   — "WHERE did it shift?"   (offline locator)
4. mann_kendall        — "is it trending at all?" (rank test)
5. theil_sen           — "how steep, robustly?"  (median slope)
6. daily_acf           — "is it seasonal?"       (lag correlogram)
7. holt_linear         — "what happens next?"    (level+trend forecast)

Every operator here is oracle-checked (see COVERAGE.md); this example
shows the composition and prints a one-line verdict per key.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from event_pipeline_spark.operators.trends import (
    changepoint_split,
    daily_acf,
    daily_bursts,
    daily_cusum,
    holt_linear,
    mann_kendall,
    theil_sen,
)
from event_pipeline_spark.session import get_session, read_table


def main(sf_dir: str | None = None) -> None:
    if sf_dir is None:
        sf_dir = (
            sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
        )
    spark = get_session("trend_monitoring_example")
    events = read_table(spark, sf_dir, "events")

    bursts = {
        r["event_type"]
        for r in daily_bursts(events).where("burst").collect()
    }
    alarms = {
        r["event_type"]
        for r in daily_cusum(events).where("alarm").collect()
    }
    splits = {
        r["event_type"]: r for r in changepoint_split(events).collect()
    }
    mk = {r["event_type"]: r for r in mann_kendall(events).collect()}
    ts = {r["event_type"]: r for r in theil_sen(events).collect()}
    acf7 = {
        r["event_type"]: r
        for r in daily_acf(events).where("lag = 7").collect()
    }
    holt = {r["event_type"]: r for r in holt_linear(events).collect()}

    for k in sorted(mk):
        z = mk[k]["z"]
        trending = z is not None and abs(z) > 1.96
        print(
            f"{k}: trend={'yes' if trending else 'no'}"
            f" (MK z={z}, Theil-Sen {ts[k]['slope']:+.4f}/day)"
            f" | burst={'yes' if k in bursts else 'no'}"
            f" cusum={'yes' if k in alarms else 'no'}"
            f" | best split {splits[k]['split_day']}"
            f" ({splits[k]['mean_left']:.1f} -> "
            f"{splits[k]['mean_right']:.1f})"
            f" | acf7={acf7[k]['r']}"
            f" | holt forecast(+3d)={holt[k]['forecast_3']:.1f}"
        )


if __name__ == "__main__":
    main()
