"""Property-based SCD2 testing (hypothesis): random snapshot sequences →
invariants hold after every application (SURVEY.md §5.2.4).

Invariants:
  I1  ≤ 1 current version per business key
  I2  valid_from < valid_to on every row
  I3  surrogate keys unique and monotone across batches
  I4  applying the same snapshot twice changes nothing (idempotency)
  I5  per key, validity intervals tile without overlap and the count of
      versions equals the number of observed attribute changes + 1
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from data_platform_spark.ops import scd2_apply

T0 = datetime(2026, 1, 1)

# snapshots: per batch, a dict key -> attr value (keys may appear/disappear)
snapshot_strategy = st.lists(
    st.dictionaries(
        keys=st.integers(min_value=1, max_value=4),
        values=st.sampled_from(["a", "b", "c", None]),
        min_size=1,
        max_size=4,
    ),
    min_size=1,
    max_size=4,
)


def _apply_all(spark, snapshots):
    dim = None
    for i, snap in enumerate(snapshots):
        stg = spark.createDataFrame(
            [(k, v, "x") for k, v in sorted(snap.items())],
            "bk int, attr string, extra string",
        )
        dim = scd2_apply(
            dim,
            stg,
            business_key="bk",
            tracked_cols=["attr"],
            carried_cols=["extra"],
            sk_col="sk",
            batch_ts=F.lit(T0 + timedelta(days=i)),
        )
        # materialize: scd2 state feeds the next batch (as the pipeline's
        # warehouse write/read cycle would)
        dim = spark.createDataFrame(dim.collect(), dim.schema)
    return dim


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(snapshots=snapshot_strategy)
def test_scd2_invariants(spark_global, snapshots):
    spark = spark_global
    dim = _apply_all(spark, snapshots)
    rows = dim.collect()

    # I1: ≤1 current per key
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r["bk"], []).append(r)
    for bk, versions in by_key.items():
        assert sum(1 for r in versions if r["is_current"]) <= 1, (bk, versions)

        # I2: valid ranges
        for r in versions:
            assert r["valid_from"] < r["valid_to"], r

        # I5: intervals tile: sorted by valid_from, each valid_to equals
        # next valid_from (closed versions) and only the last is open
        vs = sorted(versions, key=lambda r: r["valid_from"])
        for a, b in zip(vs, vs[1:]):
            assert a["valid_to"] == b["valid_from"], (bk, vs)

        # I5b: version count = observed changes + 1 over the key's history
        seen = [
            snap[bk] for snap in snapshots if bk in snap
        ]
        changes = sum(1 for x, y in zip(seen, seen[1:]) if x != y)
        assert len(versions) == changes + 1, (bk, seen, vs)

    # I3: SK uniqueness
    sks = [r["sk"] for r in rows]
    assert len(sks) == len(set(sks))

    # I4: idempotency — reapply the last snapshot
    last = snapshots[-1]
    stg = spark.createDataFrame(
        [(k, v, "x") for k, v in sorted(last.items())],
        "bk int, attr string, extra string",
    )
    dim2 = scd2_apply(
        dim, stg,
        business_key="bk", tracked_cols=["attr"], carried_cols=["extra"],
        sk_col="sk",
        batch_ts=F.lit(T0 + timedelta(days=len(snapshots) + 5)),
    )
    assert sorted(map(tuple, dim2.collect())) == sorted(map(tuple, rows))
