"""Custom stateful per-group operators (applyInPandas).

Operators whose semantics are inherently sequential (state carried
across rows) and therefore not expressible as SQL window aggregates.
Each runs as a grouped Pandas function: the group key partitions the
shuffle, each group arrives as one Arrow batch, state never crosses the
executor boundary. At 100 TB the group key (e.g. user_id) must be
high-cardinality — same contract as any stateful streaming operator.
"""

from __future__ import annotations


def ema_per_group_builder(alpha: float, value_col: str, ts_cols: list[str]):
    """Per-group exponential moving average via applyInPandas.

    EMA is inherently sequential (each value depends on the previous
    state) — not expressible as a SQL window aggregate — so it runs as a
    grouped Pandas function: one Arrow batch per group key, deterministic
    order enforced by sorting on ts_cols inside the group. The canonical
    example of a custom stateful per-group operator on the engine.
    """
    import pandas as pd  # local: keep module import light

    def ema(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_cols).reset_index(drop=True)
        # pandas ewm(adjust=False) computes exactly the recurrence
        # y_t = alpha*x_t + (1-alpha)*y_{t-1}, y_0 = x_0 — vectorized,
        # no per-row Python loop
        pdf["ema"] = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return pdf

    return ema
