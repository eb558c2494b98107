"""Property-based testing of the single-pass attribution windows
(ops/attribution.py) against the straightforward join formulation they
replaced: on random event streams — including ts ties between clicks
and purchases, duplicate timestamps, users with no clicks, and clicks
exactly on the lookback boundary — the window rewrite must be
indistinguishable from the purchases×clicks join it optimizes away.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_platform_spark.ops.attribution import (
    attribution_touches,
    prior_click_counts,
)

T0 = datetime(2026, 3, 1)
LOOKBACK_MIN = 10

# events: (user_id, offset_seconds, kind). Small second range forces ts
# collisions — the tie-semantics hot spot (click at the purchase
# instant counts as a touch but NOT as a prior click).
event_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=0, max_value=1500),
        st.sampled_from(["click", "purchase", "view"]),
    ),
    min_size=1,
    max_size=40,
)


def _frame(spark, rows):
    data = [
        (i, 100 + r[0], T0 + timedelta(seconds=r[1]), r[2], float(i))
        for i, r in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "event_id long, user_id long, ts timestamp, event_type string, "
        "value double",
    )


def _reference(rows):
    """Pure-Python join semantics: per purchase, clicks by the same user
    with c_ts <= p_ts (touches) / within [p_ts - lookback, p_ts)
    (counts)."""
    touches, counts = {}, {}
    for i, (u, s, kind) in enumerate(rows):
        if kind != "purchase":
            continue
        clicks = [
            s2
            for (u2, s2, k2) in rows
            if u2 == u and k2 == "click" and s2 <= s
        ]
        touches[i] = (min(clicks), max(clicks)) if clicks else (None, None)
        counts[i] = sum(
            1
            for (u2, s2, k2) in rows
            if u2 == u
            and k2 == "click"
            and s - LOOKBACK_MIN * 60 <= s2 < s
        )
    return touches, counts


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=event_strategy)
def test_attribution_windows_equal_join_semantics(spark_global, rows):
    ev = _frame(spark_global, rows)
    want_touches, want_counts = _reference(rows)

    got_t = {
        r.purchase_id: (r.first_touch_ts, r.last_touch_ts)
        for r in attribution_touches(ev).collect()
    }
    assert set(got_t) == set(want_touches)
    for pid, (lo, hi) in want_touches.items():
        first, last = got_t[pid]
        if lo is None:
            assert first is None and last is None
        else:
            assert first == T0 + timedelta(seconds=lo)
            assert last == T0 + timedelta(seconds=hi)

    got_c = {
        r.purchase_id: r.n_prior_clicks
        for r in prior_click_counts(ev, LOOKBACK_MIN).collect()
    }
    assert got_c == want_counts
