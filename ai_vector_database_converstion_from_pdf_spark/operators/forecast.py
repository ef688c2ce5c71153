"""Per-series forecasting operators.

Holt's linear-trend exponential smoothing (the two-parameter member of
the exponential-smoothing family; Holt 1957 / Hyndman & Athanasopoulos
FPP3 ch. 8) — the capacity-planning step up from the OLS trend entry
(`events_daily_trend_ols`): OLS weights every day equally, Holt
discounts the past geometrically, so level/trend track recent shifts.

Scale shape: smoothing is inherently sequential WITHIN a series but
embarrassingly parallel ACROSS series — exactly applyInPandas' sweet
spot. Each series (event_type here; a metric/tenant/SKU in a real
pipeline with millions of series) is one group: state is two doubles
regardless of history length, the recursion is a tight per-group loop
over an integer-count day vector, and no cross-series shuffle exists
beyond the one groupBy. A window/self-join formulation would need an
O(n²) expansion (each step depends on ALL priors through the
recurrence) — the per-group loop is the right distributed shape.

Determinism: daily y values are integer counts (bit-identical in any
engine); alpha/beta default to 0.5 (exactly representable), so the
recursion is a fixed sequence of IEEE double ops replayed identically
by the DuckDB recursive-CTE oracle — results match to the last bit
BEFORE the final round(6), which both engines apply to the outputs
only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def holt_linear(
    daily: DataFrame,
    alpha: float = 0.5,
    beta: float = 0.5,
    horizon: int = 7,
    key_col: str = "event_type",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Holt's linear smoothing per series over (key, x, y) rows:
    l_1 = y_1, b_1 = 0; for t >= 2
        l_t = a*y_t + (1-a)*(l_{t-1} + b_{t-1})
        b_t = B*(l_t - l_{t-1}) + (1-B)*b_{t-1}
    Returns (key, n_days, level, trend, forecast) with
    forecast = level + horizon*trend, all rounded to 6."""
    import pandas as pd

    a, b_ = float(alpha), float(beta)

    def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(x_col)
        ys = [float(v) for v in pdf[y_col]]
        lvl, trd = ys[0], 0.0
        for y in ys[1:]:
            nl = a * y + (1.0 - a) * (lvl + trd)
            trd = b_ * (nl - lvl) + (1.0 - b_) * trd
            lvl = nl
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n_days": [len(ys)],
                "level_raw": [lvl],
                "trend_raw": [trd],
            }
        )

    out = daily.groupBy(key_col).applyInPandas(
        fn, f"{key_col} string, n_days long, level_raw double, trend_raw double"
    )
    return out.select(
        key_col,
        "n_days",
        F.round("level_raw", 6).alias("level"),
        F.round("trend_raw", 6).alias("trend"),
        F.round(
            F.col("level_raw") + F.lit(float(horizon)) * F.col("trend_raw"), 6
        ).alias("forecast"),
    )
