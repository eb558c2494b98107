"""Core relational surface: scan/filter/project/join/agg/window/sort/limit/
set-ops — the generic query capabilities backing the reference's warehouse
layers (SURVEY.md §2) expressed over the driver testdata star schema.

Reference parity notes (citations into /root/reference/):
- anti-join incrementality  → `customers_without_orders`
  (dags/dwh_fact_character_episode.py:103-107)
- semi-join existence probe → `customers_with_orders`
  (dags/configure.py:296-300)
- union-dedup               → `nationkeys_union_distinct`
  (dags/dwh_fact_character_episode.py:55-81; PG UNION dedups, Spark union
  does not — always paired with .distinct())
- JSON-array explosion      → `part_type_words`
  (dags/stg_character.py:161-173 jsonb_array_elements_text)
- SCD2 versioning           → `scd2_order_versions`
  (dags/dwh_dim_character.py:49-118 valid_from/valid_to/is_current)
- Unknown-member sentinel join → `unknown_member_events`
  (dags/dwh_fact_charer_location.py:107-112) — the disjunctive OR-join is
  rewritten as left-join + coalesce so Catalyst plans an equi-join instead
  of a broadcast-nested-loop.
- null-safe change detection → `value_change_detection`
  (dags/stg_character.py:75-81 IS DISTINCT FROM ↔ eqNullSafe)

Scale notes: every query is declarative DataFrame API — Catalyst pushes
filters/projection into the parquet scans; region/nation joins are
explicitly broadcast (bounded domains); large fact-fact joins shuffle on
their keys and AQE handles coalesce/skew at runtime. All double aggregates
are rounded (2–4 dp) so results are stable under any summation order —
required both for the DuckDB oracle hash and for deterministic re-runs on
a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_platform_spark.queries._util import fan_out, pround, sql_round
from data_platform_spark.sources.tables import load_table

# Sentinel for open-ended validity — the engine's replacement for Postgres
# 'infinity'::timestamptz (dags/dwh_dim_character.py:102).
VALID_TO_INFINITY = "9999-12-31 00:00:00"


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: filter → groupBy → multi-agg.

    Filter reaches the parquet scan (PushedFilters); partial aggregation is
    map-side so the shuffle carries only (flag,status) groups.
    """
    # NOTE: no fan_out here — repartitioning changes double-summation order,
    # making the rounded aggregates nondeterministic vs the oracle. The scan
    # parallelism (row groups at real scale) is the right source of
    # parallelism for pure aggregation queries.
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            pround(F.sum("l_quantity")).alias("sum_qty"),
            pround(F.sum("l_extendedprice")).alias("sum_base_price"),
            pround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("sum_disc_price"),
            pround(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                )
            ).alias("sum_charge"),
            pround(F.avg("l_quantity")).alias("avg_qty"),
            pround(F.avg("l_extendedprice")).alias("avg_price"),
            pround(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: 3-way join + agg + total-order sort + limit."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        cust.select("c_custkey")
        .join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            pround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style multi-join star query with broadcast dims.

    region/nation are bounded-domain dims → explicit broadcast() keeps the
    plan shuffle-free on the dim side at any scale factor.
    """
    region = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        region.join(nation, region.r_regionkey == nation.n_regionkey)
        .join(cust, nation.n_nationkey == cust.c_nationkey)
        .join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (supp.s_nationkey == cust.c_nationkey),
        )
        .groupBy("n_name")
        .agg(
            pround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
    )


def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — windowed rank, deterministic tie-break."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            pround(F.col("o_totalprice")).alias("totalprice"),
            "rk",
        )
    )


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti-join — the reference's fact-incrementality primitive."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi-join — EXISTS probe."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


def nationkeys_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with dedup — PG UNION semantics need union().distinct() in Spark."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        cust.select(F.col("c_nationkey").alias("nationkey"))
        .union(supp.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


def part_type_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array explosion — jsonb_array_elements_text analog (A1)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey", F.explode(F.split(F.col("p_type"), " ")).alias("word")
    )


def rollup_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets for the datamart layer."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        pround(F.sum("o_totalprice")).alias("total_price"),
    )


def scd2_order_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity intervals derived with window functions.

    Treats each customer's order sequence as successive versions:
    valid_from = event date, valid_to = next version's date (sentinel
    9999-12-31 when open), is_current flags the latest — the exact shape
    of the reference's dims (dags/configure.py:195-265) computed by a
    single windowed scan instead of row-wise UPDATE+INSERT.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    sentinel = F.lit(VALID_TO_INFINITY).cast("timestamp")
    # valid_to is rendered as a string: the 9999-12-31 open-interval sentinel
    # overflows pandas' ns-resolution timestamps, so timestamp-typed output
    # cannot round-trip through a pandas-based comparator.
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("valid_from"),
        F.date_format(
            F.coalesce(F.lead("o_orderdate").over(w), sentinel),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("valid_to"),
        F.lead("o_orderdate").over(w).isNull().alias("is_current"),
    )


def unknown_member_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unknown-member dimension join (J5), rewritten scale-safe.

    The reference joins facts to dim_location with a disjunctive predicate
    (url match OR (url IS NULL AND id = -1)) — a nested-loop plan. The
    engine's rewrite: plain left equi-join, then coalesce misses to the
    sentinel member (-1/'Unknown'). Equivalent semantics, hash-joinable.
    """
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        ev.join(cust, ev.user_id == cust.c_custkey, "left")
        .select(
            F.coalesce(F.col("c_custkey"), F.lit(-1).cast("long")).alias("cust_id"),
            F.coalesce(F.col("c_name"), F.lit("Unknown")).alias("cust_name"),
        )
        .groupBy("cust_id", "cust_name")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def value_change_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe change detection (P10): IS DISTINCT FROM ↔ ~eqNullSafe.

    Counts, per user, the events whose value differs from the previous
    event's value under null-safe comparison — the engine's `changed()`
    primitive used by staging upserts and SCD2 close-out.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_value", F.lag("value").over(w))
        .withColumn(
            "is_changed",
            ~F.col("value").eqNullSafe(F.col("prev_value")),
        )
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("is_changed"), 1).otherwise(0)).alias("n_changes"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_revenue_orders": q3_top_revenue_orders,
    "q5_region_revenue": q5_region_revenue,
    "topk_orders_per_customer": topk_orders_per_customer,
    "customers_without_orders": customers_without_orders,
    "customers_with_orders": customers_with_orders,
    "nationkeys_union_distinct": nationkeys_union_distinct,
    "part_type_words": part_type_words,
    "rollup_order_totals": rollup_order_totals,
    "scd2_order_versions": scd2_order_versions,
    "unknown_member_events": unknown_member_events,
    "value_change_detection": value_change_detection,
}

ORACLE = {
    "q1_pricing_summary": """
        SELECT
            l_returnflag,
            l_linestatus,
            floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sum_qty,
            floor((sum(l_extendedprice)) * 100 + 0.5) / 100 AS sum_base_price,
            floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS sum_disc_price,
            floor((sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 100 + 0.5) / 100 AS sum_charge,
            floor((avg(l_quantity)) * 100 + 0.5) / 100 AS avg_qty,
            floor((avg(l_extendedprice)) * 100 + 0.5) / 100 AS avg_price,
            floor((avg(l_discount)) * 10000 + 0.5) / 10000 AS avg_disc,
            count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_top_revenue_orders": """
        SELECT
            o.o_orderkey,
            o.o_orderdate,
            o.o_orderpriority,
            floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100 + 0.5) / 100 AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, o.o_orderkey ASC
        LIMIT 10
    """,
    "q5_region_revenue": """
        SELECT
            n.n_name,
            floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100 + 0.5) / 100 AS revenue
        FROM region r
        JOIN nation n ON r.r_regionkey = n.n_regionkey
        JOIN customer c ON n.n_nationkey = c.c_nationkey
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND s.s_nationkey = c.c_nationkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name
    """,
    "topk_orders_per_customer": """
        SELECT o_custkey, o_orderkey, totalprice, rk
        FROM (
            SELECT
                o_custkey,
                o_orderkey,
                floor((o_totalprice) * 100 + 0.5) / 100 AS totalprice,
                row_number() OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey ASC
                ) AS rk
            FROM orders
        )
        WHERE rk <= 3
    """,
    "customers_without_orders": """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        )
    """,
    "customers_with_orders": """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        )
    """,
    "nationkeys_union_distinct": """
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    "part_type_words": """
        SELECT p_partkey, unnest(string_split(p_type, ' ')) AS word
        FROM part
    """,
    "rollup_order_totals": """
        SELECT
            o_orderstatus,
            o_orderpriority,
            count(*) AS n_orders,
            floor((sum(o_totalprice)) * 100 + 0.5) / 100 AS total_price
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "scd2_order_versions": """
        SELECT
            o_custkey,
            o_orderkey,
            o_orderdate AS valid_from,
            strftime(
                coalesce(
                    lead(o_orderdate) OVER w,
                    TIMESTAMP '9999-12-31 00:00:00'
                ),
                '%Y-%m-%d %H:%M:%S'
            ) AS valid_to,
            lead(o_orderdate) OVER w IS NULL AS is_current
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "unknown_member_events": """
        SELECT
            coalesce(c.c_custkey, -1) AS cust_id,
            coalesce(c.c_name, 'Unknown') AS cust_name,
            count(*) AS n_events
        FROM events e
        LEFT JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1, 2
    """,
    "value_change_detection": """
        SELECT
            user_id,
            CAST(sum(CASE WHEN value IS DISTINCT FROM prev_value THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
            count(*) AS n_events
        FROM (
            SELECT
                user_id,
                value,
                lag(value) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                ) AS prev_value
            FROM events
        )
        GROUP BY user_id
    """,
}


# ---------------------------------------------------------------------------
# second wave: as-of join, subquery patterns, set ops, cube, pivot
# ---------------------------------------------------------------------------


def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event matched to the user's latest prior
    (or simultaneous) click. Union-merge implementation — one shuffle of
    |L|+|R| keyed rows (ops/asof.py); oracle uses DuckDB's native ASOF
    JOIN, so two independent as-of engines must agree row-for-row.
    """
    from data_platform_spark.ops.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("click_ts"))
        .distinct()
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        value_cols=["click_ts"],
        suffix="_last",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("click_ts_last").alias("last_click_ts"),
    )


def q4_priority_with_late_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: orders having ≥1 lineitem shipped after the order
    date (correlated EXISTS → left-semi join), counted per priority."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = li.alias("l").join(
        orders.alias("o"), F.col("l.l_orderkey") == F.col("o.o_orderkey")
    ).filter(F.col("l.l_shipdate") > F.col("o.o_orderdate")).select(
        F.col("l.l_orderkey").alias("late_orderkey")
    )
    qualified = orders.join(
        late, orders.o_orderkey == late.late_orderkey, "left_semi"
    )
    return qualified.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style: revenue from lineitems whose quantity is below
    half the part's average quantity (scalar correlated subquery →
    per-partition window average; l_quantity is integral so the average
    is exact and the comparison deterministic)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    below = li.withColumn("avg_qty", F.avg("l_quantity").over(w)).filter(
        F.col("l_quantity") < 0.5 * F.col("avg_qty")
    )
    return below.agg(
        pround(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_items"),
    )


def nations_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): nations having both customers and suppliers."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        cust.select(F.col("c_nationkey").alias("nationkey"))
        .intersect(supp.select(F.col("s_nationkey").alias("nationkey")))
    )


def nations_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): nations with customers but no suppliers."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        cust.select(F.col("c_nationkey").alias("nationkey"))
        .subtract(supp.select(F.col("s_nationkey").alias("nationkey")))
    )


def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over (status, priority)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        pround(F.avg("o_totalprice")).alias("avg_price"),
    )


EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def pivot_user_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-user event counts, one column per event type (explicit
    value list → stable schema; absent combinations coalesced to 0 to
    match SQL FILTER-count semantics)."""
    ev = load_table(spark, sf_dir, "events")
    pivoted = ev.groupBy("user_id").pivot("event_type", EVENT_TYPES).count()
    return pivoted.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t)
            for t in EVENT_TYPES
        ],
    )


QUERIES.update(
    {
        "asof_purchase_last_click": asof_purchase_last_click,
        "q4_priority_with_late_items": q4_priority_with_late_items,
        "q17_small_quantity_revenue": q17_small_quantity_revenue,
        "nations_intersect": nations_intersect,
        "nations_except": nations_except,
        "cube_order_stats": cube_order_stats,
        "pivot_user_event_matrix": pivot_user_event_matrix,
    }
)

ORACLE.update(
    {
        "asof_purchase_last_click": """
            SELECT
                p.event_id,
                p.user_id,
                p.ts,
                c.click_ts AS last_click_ts
            FROM (
                SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'purchase'
            ) p
            ASOF LEFT JOIN (
                SELECT DISTINCT user_id, ts AS click_ts FROM events
                WHERE event_type = 'click'
            ) c
            ON p.user_id = c.user_id AND p.ts >= c.click_ts
        """,
        "q4_priority_with_late_items": """
            SELECT o_orderpriority, count(*) AS n_orders
            FROM orders o
            WHERE EXISTS (
                SELECT 1 FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey
                  AND l.l_shipdate > o.o_orderdate
            )
            GROUP BY o_orderpriority
        """,
        "q17_small_quantity_revenue": f"""
            SELECT
                {sql_round("sum(l_extendedprice) / 7.0")} AS avg_yearly,
                count(*) AS n_items
            FROM (
                SELECT
                    l_extendedprice,
                    l_quantity,
                    avg(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
                FROM lineitem
            )
            WHERE l_quantity < 0.5 * avg_qty
        """,
        "nations_intersect": """
            SELECT c_nationkey AS nationkey FROM customer
            INTERSECT
            SELECT s_nationkey AS nationkey FROM supplier
        """,
        "nations_except": """
            SELECT c_nationkey AS nationkey FROM customer
            EXCEPT
            SELECT s_nationkey AS nationkey FROM supplier
        """,
        "cube_order_stats": f"""
            SELECT
                o_orderstatus,
                o_orderpriority,
                count(*) AS n_orders,
                {sql_round("avg(o_totalprice)")} AS avg_price
            FROM orders
            GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
        "pivot_user_event_matrix": """
            SELECT
                user_id,
                count(*) FILTER (WHERE event_type = 'click') AS click,
                count(*) FILTER (WHERE event_type = 'view') AS view,
                count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
                count(*) FILTER (WHERE event_type = 'signup') AS signup,
                count(*) FILTER (WHERE event_type = 'error') AS error
            FROM events
            GROUP BY user_id
        """,
    }
)


# ---------------------------------------------------------------------------
# third wave: skew-safe aggregation, full outer join, Spark SQL API
# ---------------------------------------------------------------------------


def skew_safe_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a genuinely skewed key
    (5 event_type values across all rows). Results are exactly equal to a
    plain GROUP BY — the salting only changes the shuffle layout
    (ops/skew.py); the oracle is the plain GROUP BY.
    """
    from data_platform_spark.ops.skew import salted_agg

    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        group_cols=["event_type"],
        aggs={
            "n_events": ("event_id", "count"),
            "max_value": ("value", "max"),
        },
        salt_cols=["event_id"],
        n_salts=16,
    )
    return out.select(
        "event_type", "n_events", pround(F.col("max_value")).alias("max_value")
    )


def nation_customer_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates: nations with customers and/or
    suppliers, zero-filled — the one outer-join shape the reference never
    uses (SURVEY.md §2.3 'absent')."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    c = cust.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    s = supp.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    return (
        c.join(s, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


def sql_api_revenue_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's Spark SQL surface: tables registered as temp views,
    query expressed as SQL and planned by the same Catalyst pipeline as
    the DataFrame API."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT
            o.o_orderstatus,
            count(DISTINCT o.o_orderkey) AS n_orders,
            floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100 + 0.5) / 100
                AS revenue
        FROM v_orders o
        JOIN v_lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderstatus
        """
    )


QUERIES.update(
    {
        "skew_safe_event_type_counts": skew_safe_event_type_counts,
        "nation_customer_supplier_counts": nation_customer_supplier_counts,
        "sql_api_revenue_by_status": sql_api_revenue_by_status,
    }
)

ORACLE.update(
    {
        "skew_safe_event_type_counts": f"""
            SELECT
                event_type,
                count(*) AS n_events,
                {sql_round("max(value)")} AS max_value
            FROM events
            GROUP BY event_type
        """,
        "nation_customer_supplier_counts": """
            SELECT
                coalesce(c.nationkey, s.nationkey) AS nationkey,
                coalesce(c.n_customers, 0) AS n_customers,
                coalesce(s.n_suppliers, 0) AS n_suppliers
            FROM (
                SELECT c_nationkey AS nationkey, count(*) AS n_customers
                FROM customer GROUP BY 1
            ) c
            FULL OUTER JOIN (
                SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
                FROM supplier GROUP BY 1
            ) s ON c.nationkey = s.nationkey
        """,
        "sql_api_revenue_by_status": f"""
            SELECT
                o.o_orderstatus,
                count(DISTINCT o.o_orderkey) AS n_orders,
                {sql_round("sum(l.l_extendedprice * (1 - l.l_discount))")} AS revenue
            FROM orders o
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderstatus
        """,
    }
)


# ---------------------------------------------------------------------------
# fourth wave: TPC-H-flavored breadth — date/string/CASE/min-window/
# disjunctive-predicate coverage
# ---------------------------------------------------------------------------


def q12_priority_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: CASE buckets aggregated per time bucket — date
    extraction (year/month) + conditional sums."""
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-revenue ratio (LIKE filter inside a
    conditional aggregate over a join)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.col("p_type").startswith("PROMO")
    return j.agg(
        pround(
            F.lit(100.0)
            * F.sum(F.when(promo, rev).otherwise(F.lit(0.0)))
            / F.sum(rev),
            4,
        ).alias("promo_revenue_pct")
    )


def q2_min_price_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN subquery → per-group window; the
    cheapest part(s) of each brand (ties kept, like the original)."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand")
    return (
        part.withColumn("min_price", F.min("p_retailprice").over(w))
        .filter(F.col("p_retailprice") == F.col("min_price"))
        .select(
            "p_brand",
            "p_partkey",
            "p_name",
            pround(F.col("p_retailprice")).alias("retailprice"),
        )
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR of conjunctive predicate groups across a join
    — Catalyst pushes the common join key and evaluates the disjunction
    as a residual filter (no nested loop)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_type") == "PROMO") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 10))
        | ((F.col("p_type") == "ECONOMY") & (F.col("p_size") <= 25) & (F.col("l_quantity") >= 5))
        | ((F.col("p_type") == "STANDARD") & (F.col("p_size") <= 50))
    )
    return j.filter(cond).agg(
        pround(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def customer_ids_parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface: regexp extraction + casts + concat —
    parse the numeric id embedded in c_name and re-render it."""
    cust = load_table(spark, sf_dir, "customer")
    parsed = F.regexp_extract(F.col("c_name"), "Customer#([0-9]+)", 1).cast("long")
    return cust.select(
        "c_custkey",
        parsed.alias("parsed_id"),
        (parsed == F.col("c_custkey")).alias("id_matches"),
        F.concat(F.upper(F.col("c_mktsegment")), F.lit(":"), F.col("c_custkey")).alias("segment_tag"),
    )


def orders_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-dimension rollforward: yearly order counts + revenue + the
    year-over-year delta (lag window over the aggregate)."""
    orders = load_table(spark, sf_dir, "orders")
    yearly = orders.groupBy(F.year("o_orderdate").alias("order_year")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        pround(F.sum("o_totalprice")).alias("revenue"),
    )
    w = Window.orderBy("order_year")
    return yearly.select(
        "order_year",
        "n_orders",
        "revenue",
        (F.col("n_orders") - F.lag("n_orders").over(w)).alias("order_delta"),
    )


QUERIES.update(
    {
        "q12_priority_by_month": q12_priority_by_month,
        "q14_promo_revenue_ratio": q14_promo_revenue_ratio,
        "q2_min_price_per_brand": q2_min_price_per_brand,
        "q19_disjunctive_revenue": q19_disjunctive_revenue,
        "customer_ids_parsed": customer_ids_parsed,
        "orders_by_year": orders_by_year,
    }
)

ORACLE.update(
    {
        "q12_priority_by_month": """
            SELECT
                year(o_orderdate) AS order_year,
                month(o_orderdate) AS order_month,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
            FROM orders
            GROUP BY 1, 2
        """,
        "q14_promo_revenue_ratio": f"""
            SELECT
                {sql_round("100.0 * sum(CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) / sum(l_extendedprice * (1 - l_discount))", 4)}
                    AS promo_revenue_pct
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
        """,
        "q2_min_price_per_brand": f"""
            SELECT
                p_brand,
                p_partkey,
                p_name,
                {sql_round("p_retailprice")} AS retailprice
            FROM (
                SELECT *,
                    min(p_retailprice) OVER (PARTITION BY p_brand) AS min_price
                FROM part
            )
            WHERE p_retailprice = min_price
        """,
        "q19_disjunctive_revenue": f"""
            SELECT
                {sql_round("sum(l_extendedprice * (1 - l_discount))")} AS revenue,
                count(*) AS n_items
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE (p_type = 'PROMO' AND p_size <= 10 AND l_quantity >= 10)
               OR (p_type = 'ECONOMY' AND p_size <= 25 AND l_quantity >= 5)
               OR (p_type = 'STANDARD' AND p_size <= 50)
        """,
        "customer_ids_parsed": """
            SELECT
                c_custkey,
                regexp_extract(c_name, 'Customer#([0-9]+)', 1)::BIGINT AS parsed_id,
                regexp_extract(c_name, 'Customer#([0-9]+)', 1)::BIGINT = c_custkey
                    AS id_matches,
                upper(c_mktsegment) || ':' || c_custkey AS segment_tag
            FROM customer
        """,
        "orders_by_year": f"""
            SELECT
                order_year,
                n_orders,
                revenue,
                n_orders - lag(n_orders) OVER (ORDER BY order_year) AS order_delta
            FROM (
                SELECT
                    year(o_orderdate) AS order_year,
                    count(*) AS n_orders,
                    {sql_round("sum(o_totalprice)")} AS revenue
                FROM orders
                GROUP BY 1
            )
        """,
    }
)


# ---------------------------------------------------------------------------
# fifth wave: direct SURVEY §2 line-item coverage (S4, P5, P6)
# ---------------------------------------------------------------------------


def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 last-writer-wins upsert semantics as a query: the current state
    table an ON CONFLICT DO UPDATE upsert would produce — newest row per
    key via a descending row_number window (exactly layers/raw.upsert_bronze).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "event_id", "event_type", pround(F.col("value")).alias("value"))
    )


def p5_guarded_date_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 guarded 'Month D, YYYY' parse over real data: render order dates
    to the reference's air_date format, then re-parse through the same
    regex-guarded path used by staging (ops.guarded_to_date); a corrupted
    variant must yield NULL."""
    from data_platform_spark.ops import guarded_to_date

    orders = load_table(spark, sf_dir, "orders")
    rendered = F.date_format("o_orderdate", "MMMM d, yyyy")
    corrupted = F.concat(F.lit("not-a-date "), rendered)
    return orders.select(
        "o_orderkey",
        rendered.alias("rendered"),
        guarded_to_date(rendered).alias("parsed"),
        guarded_to_date(corrupted).alias("parsed_garbage"),
    )


def p6_empty_url_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 NULLIF(TRIM(x), '') over real data: blank out one segment value
    then normalize — empty strings must become NULL (the load-bearing
    guard feeding the Unknown-member join)."""
    from data_platform_spark.ops import normalize_empty_to_null

    cust = load_table(spark, sf_dir, "customer")
    blanked = F.when(
        F.col("c_mktsegment") == "BUILDING", F.lit("   ")
    ).otherwise(F.col("c_mktsegment"))
    return cust.select(
        "c_custkey",
        normalize_empty_to_null(blanked).alias("segment_or_null"),
    )


QUERIES.update(
    {
        "latest_event_per_user": latest_event_per_user,
        "p5_guarded_date_roundtrip": p5_guarded_date_roundtrip,
        "p6_empty_url_normalization": p6_empty_url_normalization,
    }
)

ORACLE.update(
    {
        "latest_event_per_user": f"""
            SELECT user_id, event_id, event_type,
                   {sql_round("value")} AS value
            FROM (
                SELECT *,
                    row_number() OVER (
                        PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                    ) AS _rn
                FROM events
            )
            WHERE _rn = 1
        """,
        "p5_guarded_date_roundtrip": """
            SELECT
                o_orderkey,
                strftime(o_orderdate, '%B %-d, %Y') AS rendered,
                CASE WHEN regexp_matches(strftime(o_orderdate, '%B %-d, %Y'),
                                         '^[A-Za-z]+ [0-9]{1,2}, [0-9]{4}$')
                     THEN strptime(strftime(o_orderdate, '%B %-d, %Y'),
                                   '%B %d, %Y')::DATE
                     ELSE NULL END AS parsed,
                CASE WHEN regexp_matches('not-a-date ' || strftime(o_orderdate, '%B %-d, %Y'),
                                         '^[A-Za-z]+ [0-9]{1,2}, [0-9]{4}$')
                     THEN strptime('not-a-date ' || strftime(o_orderdate, '%B %-d, %Y'),
                                   '%B %d, %Y')::DATE
                     ELSE NULL END AS parsed_garbage
            FROM orders
        """,
        "p6_empty_url_normalization": """
            SELECT
                c_custkey,
                nullif(trim(CASE WHEN c_mktsegment = 'BUILDING'
                                 THEN '   ' ELSE c_mktsegment END), '')
                    AS segment_or_null
            FROM customer
        """,
    }
)


# ---------------------------------------------------------------------------
# sixth wave: statistical aggregates + ordered array aggregation
# ---------------------------------------------------------------------------


def order_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface: exact median / p90 (linear
    interpolation), sample stddev, min/max per order status.

    The status DOMAIN is 3 values but each status group is a third of
    the fact table — the native exact ``percentile()`` aggregate
    buffers a whole group in one task (VERDICT r7 #1), so the
    percentiles run through the two-phase grouped layout
    (ops.global_order.grouped_percentile) and join back onto the
    algebraic aggregates."""
    from data_platform_spark.ops.global_order import grouped_percentile

    orders = load_table(spark, sf_dir, "orders")
    # base agg and percentile rank phase each scan orders once — the
    # shared input is the raw (column-pruned) scan itself, so no persist
    # (pinning O(table) to save a scan-bound pass is the wrong trade;
    # see ops/monitors.daily_quality_metrics for the same call)
    base = orders.groupBy("o_orderstatus").agg(
        pround(F.stddev_samp("o_totalprice")).alias("stddev_price"),
        pround(F.min("o_totalprice")).alias("min_price"),
        pround(F.max("o_totalprice")).alias("max_price"),
    )
    pct = grouped_percentile(
        orders, ["o_orderstatus"], "o_totalprice", {"p50": 0.5, "p90": 0.9}
    )
    return base.join(pct, on="o_orderstatus", how="left").select(
        "o_orderstatus",
        pround(F.col("p50")).alias("median_price"),
        pround(F.col("p90")).alias("p90_price"),
        "stddev_price",
        "min_price",
        "max_price",
    )


def customer_order_ids_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered array aggregation: each customer's order keys as a sorted
    array (collect_list + sort_array — deterministic layout)."""
    orders = load_table(spark, sf_dir, "orders")
    # order_ids is serialized to a CSV string: pandas-based comparators cannot
    # sort/hash list-typed cells (unhashable), so the array stays internal.
    return orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.array_join(F.sort_array(F.collect_list("o_orderkey")), ",").alias(
            "order_ids"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


def value_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corr/covar surface: relationship between price and quantity."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        pround(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        pround(F.covar_samp("l_discount", "l_tax"), 6).alias("disc_tax_covar"),
    )


QUERIES.update(
    {
        "order_price_stats": order_price_stats,
        "customer_order_ids_array": customer_order_ids_array,
        "value_correlation": value_correlation,
    }
)

ORACLE.update(
    {
        "order_price_stats": f"""
            SELECT
                o_orderstatus,
                {sql_round("quantile_cont(o_totalprice, 0.5)")} AS median_price,
                {sql_round("quantile_cont(o_totalprice, 0.9)")} AS p90_price,
                {sql_round("stddev_samp(o_totalprice)")} AS stddev_price,
                {sql_round("min(o_totalprice)")} AS min_price,
                {sql_round("max(o_totalprice)")} AS max_price
            FROM orders
            GROUP BY o_orderstatus
        """,
        "customer_order_ids_array": """
            SELECT
                o_custkey AS custkey,
                array_to_string(list_sort(list(o_orderkey)), ',') AS order_ids,
                count(*) AS n_orders
            FROM orders
            GROUP BY o_custkey
        """,
        "value_correlation": f"""
            SELECT
                {sql_round("corr(l_quantity, l_extendedprice)", 4)} AS qty_price_corr,
                {sql_round("covar_samp(l_discount, l_tax)", 6)} AS disc_tax_covar
            FROM lineitem
        """,
    }
)


# ---------------------------------------------------------------------------
# seventh wave: deeper TPC-H coverage (q6, q10, q18, q22 shapes)
# ---------------------------------------------------------------------------


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter + scalar aggregate — the pushdown showcase
    (all three predicates reach the parquet scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            pround(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q10_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue from returned items
    (join + filter + agg + deterministic top-k)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            pround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING over a grouped sum + semi-join back to the
    order/customer detail."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").alias("orderdate"),
            pround(F.col("o_totalprice")).alias("totalprice"),
            pround(F.col("total_qty")).alias("total_qty"),
        )
    )


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar average subquery + anti-join — customers
    with above-average balance and no orders, grouped by a derived code
    (substring)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    idle = rich.join(
        orders, rich.c_custkey == orders.o_custkey, "left_anti"
    )
    code = F.substring(F.col("c_name"), 10, 2)
    return idle.groupBy(code.alias("code")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        pround(F.sum("c_acctbal")).alias("total_bal"),
    )


QUERIES.update(
    {
        "q6_forecast_revenue": q6_forecast_revenue,
        "q10_returned_item_customers": q10_returned_item_customers,
        "q18_large_volume_orders": q18_large_volume_orders,
        "q22_idle_customers": q22_idle_customers,
    }
)

ORACLE.update(
    {
        "q6_forecast_revenue": f"""
            SELECT
                {sql_round("sum(l_extendedprice * l_discount)")} AS revenue,
                count(*) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
              AND l_discount BETWEEN 0.03 AND 0.07
              AND l_quantity < 24
        """,
        "q10_returned_item_customers": f"""
            SELECT
                c.c_custkey,
                c.c_name,
                n.n_name,
                {sql_round("sum(l.l_extendedprice * (1 - l.l_discount))")} AS revenue
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE l.l_returnflag = 'R'
            GROUP BY 1, 2, 3
            ORDER BY revenue DESC, c.c_custkey ASC
            LIMIT 20
        """,
        "q18_large_volume_orders": f"""
            SELECT
                c.c_custkey,
                c.c_name,
                o.o_orderkey,
                o.o_orderdate AS orderdate,
                {sql_round("o.o_totalprice")} AS totalprice,
                {sql_round("big.total_qty")} AS total_qty
            FROM orders o
            JOIN (
                SELECT l_orderkey, sum(l_quantity) AS total_qty
                FROM lineitem
                GROUP BY l_orderkey
                HAVING sum(l_quantity) > 150
            ) big ON o.o_orderkey = big.l_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        "q22_idle_customers": f"""
            WITH avg_bal AS (
                SELECT avg(c_acctbal) AS avg_bal FROM customer
                WHERE c_acctbal > 0.0
            )
            SELECT
                substr(c_name, 10, 2) AS code,
                count(*) AS n_customers,
                {sql_round("sum(c_acctbal)")} AS total_bal
            FROM customer, avg_bal
            WHERE c_acctbal > avg_bal
              AND NOT EXISTS (
                  SELECT 1 FROM orders WHERE o_custkey = c_custkey
              )
            GROUP BY 1
        """,
    }
)


def monthly_order_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification: a generated month spine left-joined to
    order aggregates — months with no orders appear with zero counts
    (sequence/explode as a dimension generator)."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(
                F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 MONTH")
            )
        ).alias("month_start")
    )
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        pround(F.sum("o_totalprice")).alias("revenue"),
    )
    return spine.join(monthly, "month_start", "left").select(
        "month_start",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
    )


def customer_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window surface: ntile quartiles + percent_rank over
    account balance (deterministic tie-break on key).

    The order is total (unique c_custkey tie-break), so both ranking
    functions derive arithmetically from a two-phase global row number
    (ops.global_order) plus a broadcast total count — no single-partition
    window; ntile/percent_rank formulas match the SQL-standard window
    functions exactly under a total order."""
    from data_platform_spark.ops.global_order import (
        global_row_number,
        ntile_from_row_number,
        percent_rank_from_row_number,
    )

    cust = load_table(spark, sf_dir, "customer")
    order = [F.desc("c_acctbal"), F.asc("c_custkey")]
    ranked = global_row_number(
        cust.select("c_custkey", "c_acctbal"), order, "__rn"
    )
    total = cust.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    rn, n = F.col("__rn"), F.col("__n")
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            "c_custkey",
            pround(F.col("c_acctbal")).alias("acctbal"),
            ntile_from_row_number(rn, n, 4).alias("quartile"),
            pround(percent_rank_from_row_number(rn, n), 6).alias("pct_rank"),
        )
    )


QUERIES.update(
    {
        "monthly_order_calendar": monthly_order_calendar,
        "customer_balance_quartiles": customer_balance_quartiles,
    }
)

ORACLE.update(
    {
        "monthly_order_calendar": f"""
            WITH bounds AS (
                SELECT
                    date_trunc('month', min(o_orderdate)) AS lo,
                    date_trunc('month', max(o_orderdate)) AS hi
                FROM orders
            ),
            spine AS (
                SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH))
                    AS month_start
                FROM bounds
            ),
            monthly AS (
                SELECT
                    date_trunc('month', o_orderdate) AS month_start,
                    count(*) AS n_orders,
                    {sql_round("sum(o_totalprice)")} AS revenue
                FROM orders
                GROUP BY 1
            )
            SELECT
                s.month_start::TIMESTAMP AS month_start,
                coalesce(m.n_orders, 0) AS n_orders,
                coalesce(m.revenue, 0.0) AS revenue
            FROM spine s LEFT JOIN monthly m ON s.month_start = m.month_start
        """,
        "customer_balance_quartiles": f"""
            SELECT
                c_custkey,
                {sql_round("c_acctbal")} AS acctbal,
                ntile(4) OVER w AS quartile,
                {sql_round("percent_rank() OVER w", 6)} AS pct_rank
            FROM customer
            WINDOW w AS (ORDER BY c_acctbal DESC, c_custkey ASC)
        """,
    }
)


def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations per year —
    dual-role nation dim (supplier nation × customer nation), symmetric
    pair filter, year bucketing."""
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")
    )
    return (
        supp.join(li, supp.s_suppkey == li.l_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            pround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("volume")
        )
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional revenue per year —
    conditional-sum ratio over a 6-way join."""
    region = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    )
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        region.join(n_cust, region.r_regionkey == F.col("cn_region"))
        .join(cust, F.col("cn_key") == cust.c_nationkey)
        .join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_supp), supp.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            pround(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("nation3_share")
        )
    )


def events_props_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type surface: props parsed to map<string,int>, keys/values/
    element_at — schema-on-read for open-ended JSON objects."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,int>")
    return ev.select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(m, "k").alias("k_value"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("key_list"),
    )


QUERIES.update(
    {
        "q7_nation_trade_volume": q7_nation_trade_volume,
        "q8_market_share": q8_market_share,
        "events_props_map": events_props_map,
    }
)

ORACLE.update(
    {
        "q7_nation_trade_volume": f"""
            SELECT
                n1.n_name AS supp_nation,
                n2.n_name AS cust_nation,
                year(l.l_shipdate) AS l_year,
                {sql_round("sum(l.l_extendedprice * (1 - l.l_discount))")} AS volume
            FROM supplier s
            JOIN lineitem l ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
            WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
               OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
            GROUP BY 1, 2, 3
        """,
        "q8_market_share": f"""
            SELECT
                year(o.o_orderdate) AS o_year,
                {sql_round("sum(CASE WHEN ns.n_name = 'NATION_3' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END) / sum(l.l_extendedprice * (1 - l.l_discount))", 6)}
                    AS nation3_share
            FROM region r
            JOIN nation nc ON r.r_regionkey = nc.n_regionkey
            JOIN customer c ON nc.n_nationkey = c.c_nationkey
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation ns ON s.s_nationkey = ns.n_nationkey
            WHERE r.r_name = 'EUROPE'
            GROUP BY 1
        """,
        "events_props_map": """
            SELECT
                event_id,
                len(json_keys(props)) AS n_keys,
                json_extract(props, '$.k')::INT AS k_value,
                array_to_string(list_sort(json_keys(props)), ',') AS key_list
            FROM events
        """,
    }
)


def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube): per-status, per-
    priority, and grand-total groups with grouping_id disambiguation."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_gs")
    return spark.sql(
        """
        SELECT
            o_orderstatus,
            o_orderpriority,
            grouping(o_orderstatus) AS g_status,
            grouping(o_orderpriority) AS g_priority,
            count(*) AS n_orders
        FROM v_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def decimal_revenue_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decimal arithmetic: prices cast to DECIMAL(18,2) and summed —
    no floating-point rounding anywhere, so both engines agree to the
    last cent without portable-rounding tricks."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = F.col("l_extendedprice").cast("decimal(18,2)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(dec).cast("decimal(28,2)").alias("exact_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


QUERIES.update(
    {
        "grouping_sets_orders": grouping_sets_orders,
        "decimal_revenue_exact": decimal_revenue_exact,
    }
)

ORACLE.update(
    {
        "grouping_sets_orders": """
            SELECT
                o_orderstatus,
                o_orderpriority,
                grouping(o_orderstatus) AS g_status,
                grouping(o_orderpriority) AS g_priority,
                count(*) AS n_orders
            FROM orders
            GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """,
        "decimal_revenue_exact": """
            SELECT
                l_returnflag,
                sum(l_extendedprice::DECIMAL(18,2))::DECIMAL(28,2)
                    AS exact_revenue,
                count(*) AS n_items
            FROM lineitem
            GROUP BY l_returnflag
        """,
    }
)


def rank_vs_dense_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-aware ranking semantics: rank() (gaps) vs dense_rank() (no
    gaps) over rounded prices per status — ties are real after rounding,
    so the two functions genuinely diverge."""
    orders = load_table(spark, sf_dir, "orders")
    price2 = pround(F.col("o_totalprice"))
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc(price2))
    return (
        orders.select(
            "o_orderkey",
            "o_orderstatus",
            price2.alias("price"),
            F.rank().over(w).alias("price_rank"),
            F.dense_rank().over(w).alias("price_dense_rank"),
        )
        .filter(F.col("price_rank") <= 5)
    )


QUERIES["rank_vs_dense_rank_orders"] = rank_vs_dense_rank_orders

ORACLE["rank_vs_dense_rank_orders"] = f"""
    SELECT o_orderkey, o_orderstatus, price, price_rank, price_dense_rank
    FROM (
        SELECT
            o_orderkey,
            o_orderstatus,
            {sql_round("o_totalprice")} AS price,
            rank() OVER w AS price_rank,
            dense_rank() OVER w AS price_dense_rank
        FROM orders
        WINDOW w AS (
            PARTITION BY o_orderstatus
            ORDER BY {sql_round("o_totalprice")} DESC
        )
    )
    WHERE price_rank <= 5
"""


def nationkeys_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset semantics (each key kept min(countL,
    countR) times), distinct from the set-semantics INTERSECT."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        cust.select(F.col("c_nationkey").alias("nationkey"))
        .intersectAll(supp.select(F.col("s_nationkey").alias("nationkey")))
    )


def nationkeys_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference (occurrences subtracted, not
    eliminated wholesale)."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        cust.select(F.col("c_nationkey").alias("nationkey"))
        .exceptAll(supp.select(F.col("s_nationkey").alias("nationkey")))
    )


def order_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """width_bucket equi-width histogram of order totals (fixed bounds so
    the bucketing is scale-independent)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.width_bucket(F.col("o_totalprice"), F.lit(0.0), F.lit(600000.0), F.lit(12))
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


QUERIES.update(
    {
        "nationkeys_intersect_all": nationkeys_intersect_all,
        "nationkeys_except_all": nationkeys_except_all,
        "order_price_histogram": order_price_histogram,
    }
)

ORACLE.update(
    {
        "nationkeys_intersect_all": """
            SELECT c_nationkey AS nationkey FROM customer
            INTERSECT ALL
            SELECT s_nationkey AS nationkey FROM supplier
        """,
        "nationkeys_except_all": """
            SELECT c_nationkey AS nationkey FROM customer
            EXCEPT ALL
            SELECT s_nationkey AS nationkey FROM supplier
        """,
        # DuckDB 1.0 has no width_bucket: mirror its semantics
        # (bucket i covers [lo+(i-1)w, lo+iw); below-range -> 0,
        # >= hi -> n+1) with explicit arithmetic
        "order_price_histogram": """
            SELECT
                CASE
                    WHEN o_totalprice < 0.0 THEN 0
                    WHEN o_totalprice >= 600000.0 THEN 13
                    ELSE 1 + floor(o_totalprice / 50000.0)::BIGINT
                END AS bucket,
                count(*) AS n_orders
            FROM orders
            GROUP BY 1
        """,
    }
)


# ---------------------------------------------------------------------------
# TPC-H completion block: q9, q11, q13, q15, q16, q20, q21 — the remaining
# canonical shapes (multi-way profit join, scalar-subquery HAVING,
# left-join distribution, view+scalar-max, bridged distinct-count,
# semi-join threshold, exists/not-exists sole-offender). The driver
# testdata has no `partsupp` table, so the four queries that use it in
# TPC-H (q9/q11/q16/q20) are adapted: `lineitem` serves as the
# part<->supplier bridge and `p_retailprice` as the cost basis; the
# adaptation is documented per query.
# ---------------------------------------------------------------------------


def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style profit by (supplier nation, order year) over
    color-named parts.

    Adaptation: no partsupp in testdata, so unit cost is proxied as
    0.4 * p_retailprice (deterministic constant margin basis). The
    `p_name LIKE 'red%'` filter is pushed into the part scan; nation is
    broadcast; the big joins shuffle on partkey/orderkey and AQE
    coalesces post-filter partitions.
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.4) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(
            part.select("p_partkey", "p_retailprice"),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(supp.select("s_suppkey", "s_nationkey"), li.l_suppkey == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .join(nation, F.col("s_nationkey") == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(pround(F.sum("amount")).alias("sum_profit"))
    )


def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-style scalar-subquery HAVING over exact decimals.

    Adaptation (no partsupp): a part's "stock value" is the
    exact-decimal sum of l_extendedprice * l_quantity over lineitems
    shipped by suppliers of one nation; keep parts whose value exceeds
    1/1000 of the nation total (value * 1000 > total, kept integral in
    decimal space). Decimal arithmetic is order-independent, so both
    engines agree bit-for-bit regardless of partial-agg scheduling.
    The nation-total scalar is broadcast, not collected.
    """
    li = load_table(spark, sf_dir, "lineitem")
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    per_part = (
        li.join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_quantity").cast("decimal(4,0)")
            )
            .cast("decimal(28,2)")
            .alias("value")
        )
    )
    total = per_part.agg(F.sum("value").cast("decimal(38,2)").alias("total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") * 1000 > F.col("total"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("value") * 100).cast("bigint").alias("value_cents"),
        )
    )


def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count.

    Left join keeps zero-order customers (c_count = 0); the
    '1-URGENT' priority exclusion stands in for the reference's
    comment NOT LIKE filter. Two shuffles (custkey, then c_count) —
    the second is tiny (bounded by max orders/customer).
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: quarterly revenue "view" + scalar-max selection
    (ties kept, per spec). The max is computed as a 1-row broadcast
    crossJoin — no driver-side collect; supplier join is broadcast
    from the (tiny) max-revenue side.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        pround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style supplier counts per (brand, type, size).

    Adaptation: lineitem is the part-supplier bridge (no partsupp);
    suppliers with negative acctbal are excluded by anti-join (the
    spec's complaints exclusion analog). One shuffle on the group
    keys; countDistinct dedups map-side first.
    """
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin([2, 5, 11, 17, 23, 29, 35, 41])
    )
    li = load_table(spark, sf_dir, "lineitem")
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(
            part.select("p_partkey", "p_brand", "p_type", "p_size"),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q20_excess_red_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style: suppliers who moved more than 2x the average
    quantity of red-named parts in 1997 (threshold 1.25x).

    Adaptation: shipped quantity stands in for partsupp availability.
    Integer-valued double sums are exact under any summation order, and
    the 2x-average threshold is derived from those exact sums, so the
    comparison is engine-portable without rounding. Part filter is a
    broadcast semi-join; the scalar average is a broadcast crossJoin.
    """
    red = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    per_supp = (
        li.join(F.broadcast(red), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").cast("bigint").alias("red_qty"))
    )
    avg_qty = per_supp.agg(F.avg("red_qty").alias("avg_qty"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        per_supp.crossJoin(F.broadcast(avg_qty))
        .filter(F.col("red_qty") > 1.25 * F.col("avg_qty"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "red_qty")
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style: the sole late supplier in multi-supplier orders.

    Late = shipped more than 60 days after the order date (testdata has
    no commit/receipt dates). The classic triple self-join
    EXISTS / NOT EXISTS is rewritten as ONE aggregation per order —
    countDistinct(suppliers), countDistinct(late suppliers) — turning
    three lineitem shuffles into one; the oracle keeps the textbook
    EXISTS/NOT EXISTS formulation, so the correctness gate also proves
    the rewrite's semantic equivalence.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_order = (
        li.join(
            orders.select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_suppkey", late.alias("is_late"))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(
                F.when(F.col("is_late"), F.col("l_suppkey"))
            ).alias("n_late"),
            F.min(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("late_supp"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        per_order.groupBy("late_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(supp, F.col("late_supp") == supp.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


QUERIES.update(
    {
        "q9_profit_by_nation_year": q9_profit_by_nation_year,
        "q11_important_part_value": q11_important_part_value,
        "q13_customer_order_distribution": q13_customer_order_distribution,
        "q15_top_supplier": q15_top_supplier,
        "q16_part_supplier_counts": q16_part_supplier_counts,
        "q20_excess_red_shippers": q20_excess_red_shippers,
        "q21_waiting_suppliers": q21_waiting_suppliers,
    }
)

ORACLE.update(
    {
        "q9_profit_by_nation_year": f"""
            SELECT
                n.n_name AS nation,
                year(o.o_orderdate) AS o_year,
                {sql_round("sum(l.l_extendedprice * (1 - l.l_discount) - 0.4 * p.p_retailprice * l.l_quantity)")}
                    AS sum_profit
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            WHERE p.p_name LIKE 'red%'
            GROUP BY n.n_name, year(o.o_orderdate)
        """,
        "q11_important_part_value": """
            WITH per_part AS (
                SELECT
                    l.l_partkey AS p_partkey,
                    sum(l.l_extendedprice::DECIMAL(18,2)
                        * l.l_quantity::DECIMAL(4,0))::DECIMAL(28,2) AS value
                FROM lineitem l
                JOIN supplier s ON l.l_suppkey = s.s_suppkey
                JOIN nation n ON s.s_nationkey = n.n_nationkey
                WHERE n.n_name = 'NATION_3'
                GROUP BY l.l_partkey
            )
            SELECT p_partkey, (value * 100)::BIGINT AS value_cents
            FROM per_part
            WHERE value * 1000 > (SELECT sum(value) FROM per_part)
        """,
        "q13_customer_order_distribution": """
            SELECT c_count, count(*) AS custdist
            FROM (
                SELECT c.c_custkey, count(o.o_orderkey) AS c_count
                FROM customer c
                LEFT JOIN orders o
                  ON c.c_custkey = o.o_custkey
                 AND o.o_orderpriority <> '1-URGENT'
                GROUP BY c.c_custkey
            )
            GROUP BY c_count
        """,
        "q15_top_supplier": f"""
            WITH revenue AS (
                SELECT
                    l_suppkey,
                    {sql_round("sum(l_extendedprice * (1 - l_discount))")}
                        AS total_revenue
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
                GROUP BY l_suppkey
            )
            SELECT s.s_suppkey, s.s_name, r.total_revenue
            FROM revenue r
            JOIN supplier s ON r.l_suppkey = s.s_suppkey
            WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        """,
        "q16_part_supplier_counts": """
            SELECT
                p.p_brand, p.p_type, p.p_size,
                count(DISTINCT l.l_suppkey) AS supplier_cnt
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_brand <> 'Brand#3'
              AND p.p_type <> 'PROMO'
              AND p.p_size IN (2, 5, 11, 17, 23, 29, 35, 41)
              AND l.l_suppkey NOT IN (
                  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
              )
            GROUP BY p.p_brand, p.p_type, p.p_size
        """,
        "q20_excess_red_shippers": """
            WITH per_supp AS (
                SELECT
                    l.l_suppkey,
                    CAST(sum(l.l_quantity) AS BIGINT) AS red_qty
                FROM lineitem l
                WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
                  AND l.l_partkey IN (
                      SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
                  )
                GROUP BY l.l_suppkey
            )
            SELECT s.s_suppkey, s.s_name, p.red_qty
            FROM per_supp p
            JOIN supplier s ON p.l_suppkey = s.s_suppkey
            WHERE p.red_qty > 1.25 * (SELECT avg(red_qty) FROM per_supp)
        """,
        "q21_waiting_suppliers": """
            SELECT s.s_name, count(*) AS numwait
            FROM (
                SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
                FROM lineitem l1
                JOIN orders o
                  ON o.o_orderkey = l1.l_orderkey
                 AND o.o_orderstatus = 'F'
                WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  AND EXISTS (
                      SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey
                  )
                  AND NOT EXISTS (
                      SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  )
            ) q
            JOIN supplier s ON s.s_suppkey = q.l_suppkey
            GROUP BY s.s_name
            ORDER BY numwait DESC, s.s_name
            LIMIT 20
        """,
    }
)


# ---------------------------------------------------------------------------
# range / band join (non-equi join family)
# ---------------------------------------------------------------------------

PRICE_BANDS = [
    ("low", 0.0, 50_000.0),
    ("mid", 50_000.0, 150_000.0),
    ("high", 150_000.0, 300_000.0),
    ("premium", 300_000.0, 600_000.0),
]


def orders_price_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast range join: orders classified into price bands by a
    non-equi BETWEEN predicate against a small dimension.

    The plan is a BroadcastNestedLoopJoin — exactly right here: the build
    side is 4 rows, so "nested loop" is 4 comparisons per order row,
    streamed with zero shuffle. This is the scale pattern for any
    band/tier/SLA lookup: broadcast the bands, never sort or shuffle the
    fact. (A large-large range join instead equi-joins on a coarse
    bucket of the range key and post-filters — see
    purchase_prior_click_counts in queries/events.py.)
    """
    from data_platform_spark.queries._util import pround

    orders = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        PRICE_BANDS, "band string, lo double, hi double"
    )
    return (
        orders.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo"))
            & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            pround(F.sum("o_totalprice")).alias("total_price"),
        )
    )


QUERIES["orders_price_band_join"] = orders_price_band_join

_BANDS_VALUES = ", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in PRICE_BANDS)

ORACLE["orders_price_band_join"] = f"""
    SELECT
        band,
        count(*) AS n_orders,
        {sql_round('sum(o_totalprice)')} AS total_price
    FROM orders
    JOIN (VALUES {_BANDS_VALUES}) AS bands(band, lo, hi)
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
"""


# ---------------------------------------------------------------------------
# data-quality profiling
# ---------------------------------------------------------------------------

_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profiling (row count, null count, exact distinct count)
    in ONE scan: a single wide aggregate row unpivoted with stack().

    Multiple count(DISTINCT col) in one aggregate plan via Catalyst's
    Expand (one pass over the data, rows multiplied by the distinct-agg
    count) — the standard profile shape; at 100 TB swap exact distinct
    for approx_count_distinct per column and Expand disappears.
    """
    orders = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(
                F.when(F.col(c).isNull(), 1).otherwise(0)
            ).cast("long").alias(f"{c}__nulls"),
            F.countDistinct(F.col(c)).alias(f"{c}__distinct"),
        ]
    wide = orders.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', {c}__rows, {c}__nulls, {c}__distinct" for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_expr}) AS "
        "(column_name, n_rows, n_nulls, n_distinct)"
    )


QUERIES["orders_profile"] = orders_profile

ORACLE["orders_profile"] = " UNION ALL ".join(
    f"""
    SELECT
        '{c}' AS column_name,
        count(*) AS n_rows,
        count(*) - count({c}) AS n_nulls,
        count(DISTINCT {c}) AS n_distinct
    FROM orders
    """
    for c in _PROFILE_COLS
)


def price_quantity_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS regression aggregate surface (regr_slope / regr_intercept /
    regr_r2 / regr_count): extendedprice as a linear function of quantity
    per return flag. Linear-model fitting as a pure JVM aggregate — one
    shuffle on the group key, partial-aggregated map-side; the
    distributed path for trend fitting that never collects rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        pround(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        pround(F.regr_intercept("l_extendedprice", "l_quantity"), 2).alias(
            "intercept"
        ),
        pround(F.regr_r2("l_extendedprice", "l_quantity"), 4).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n_pairs"),
    )


QUERIES["price_quantity_regression"] = price_quantity_regression

ORACLE["price_quantity_regression"] = f"""
    SELECT
        l_returnflag,
        {sql_round("regr_slope(l_extendedprice, l_quantity)", 4)} AS slope,
        {sql_round("regr_intercept(l_extendedprice, l_quantity)", 2)} AS intercept,
        {sql_round("regr_r2(l_extendedprice, l_quantity)", 4)} AS r2,
        regr_count(l_extendedprice, l_quantity) AS n_pairs
    FROM lineitem
    GROUP BY l_returnflag
"""


def part_name_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching (edit distance) — the data-cleaning /
    entity-resolution primitive. All-pairs levenshtein is n²; the
    standard scale shape is BLOCK then verify: candidate pairs must
    already agree on a cheap key (here: first token + name length band),
    so the expensive edit distance runs only within blocks. The block
    join is a plain equi-join — shuffles only (block_key, name) — and
    block sizes bound the quadratic term exactly like LSH bands do for
    Jaccard. Verified pairs: levenshtein <= 4 over distinct part names
    sharing a first word."""
    part = load_table(spark, sf_dir, "part")
    names = part.select("p_name").distinct().select(
        F.col("p_name").alias("name"),
        F.concat_ws(
            "#",
            F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)),
            F.floor(F.length("p_name") / 4).cast("string"),
        ).alias("blk"),
    )
    a = names.select(F.col("name").alias("name_a"), "blk")
    b = names.select(F.col("name").alias("name_b"), "blk")
    return (
        a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 4)
        .distinct()
    )


QUERIES["part_name_fuzzy_pairs"] = part_name_fuzzy_pairs

ORACLE["part_name_fuzzy_pairs"] = """
    WITH names AS (
        SELECT DISTINCT
            p_name AS name,
            concat_ws('#',
                      split_part(p_name, ' ', 1),
                      CAST(CAST(floor(length(p_name) / 4) AS BIGINT) AS VARCHAR)) AS blk
        FROM part
    )
    SELECT DISTINCT
        a.name AS name_a,
        b.name AS name_b,
        levenshtein(a.name, b.name) AS edit_dist
    FROM names a
    JOIN names b ON a.blk = b.blk AND a.name < b.name
    WHERE levenshtein(a.name, b.name) <= 4
"""


def tpch_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit of the whole star schema in one result:
    every FK edge of the TPC-H-ish universe, with its orphan count.

    Scale choices are explicit per edge: enum-sized parents (region,
    nation) broadcast; row-scale parents (customer under orders, orders
    under lineitem, part/supplier under lineitem) use shuffled key joins
    — at 100 TB those parents are far past broadcast size, and the check
    costs one key-projected shuffle each, independent of the fact's
    payload width."""
    from data_platform_spark.ops.integrity import FkSpec, fk_check

    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return fk_check(
        [
            FkSpec(nation, "nation", "n_regionkey", region, "region",
                   "r_regionkey"),
            FkSpec(customer, "customer", "c_nationkey", nation, "nation",
                   "n_nationkey"),
            FkSpec(supplier, "supplier", "s_nationkey", nation, "nation",
                   "n_nationkey"),
            FkSpec(orders, "orders", "o_custkey", customer, "customer",
                   "c_custkey", broadcast_dim=False),
            FkSpec(lineitem, "lineitem", "l_orderkey", orders, "orders",
                   "o_orderkey", broadcast_dim=False),
            FkSpec(lineitem, "lineitem", "l_partkey", part, "part",
                   "p_partkey", broadcast_dim=False),
            FkSpec(lineitem, "lineitem", "l_suppkey", supplier, "supplier",
                   "s_suppkey", broadcast_dim=False),
        ]
    )


QUERIES["tpch_fk_orphans"] = tpch_fk_orphans


def _fk_edge_sql(fact: str, fk: str, ref: str, pk: str) -> str:
    return f"""
        SELECT
            '{fact}' AS fact_table,
            '{fk}' AS fk_col,
            '{ref}' AS ref_table,
            (SELECT count(*) FROM {fact}) AS n_rows,
            (SELECT count(*) FROM {fact} f
             WHERE f.{fk} IS NOT NULL
               AND NOT EXISTS (SELECT 1 FROM {ref} r WHERE r.{pk} = f.{fk})
            ) AS n_orphans
    """


ORACLE["tpch_fk_orphans"] = " UNION ALL ".join(
    [
        _fk_edge_sql("nation", "n_regionkey", "region", "r_regionkey"),
        _fk_edge_sql("customer", "c_nationkey", "nation", "n_nationkey"),
        _fk_edge_sql("supplier", "s_nationkey", "nation", "n_nationkey"),
        _fk_edge_sql("orders", "o_custkey", "customer", "c_custkey"),
        _fk_edge_sql("lineitem", "l_orderkey", "orders", "o_orderkey"),
        _fk_edge_sql("lineitem", "l_partkey", "part", "p_partkey"),
        _fk_edge_sql("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ]
)


# ---------------------------------------------------------------------------
# round 6: right-to-erasure cascade audit
# ---------------------------------------------------------------------------

ERASE_MOD = 100  # c_custkey % 100 == 0 -> tombstoned customer


def erasure_cascade_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR/CCPA right-to-erasure as a distributed cascade: tombstoned
    customers delete, their orders delete through o_custkey, those
    orders' lineitems delete through l_orderkey — three FK hops of
    semi/anti joins (ops/integrity.erase_cascade), each shuffling only
    key projections. Output is the per-table deletion audit
    (before / deleted / after), the evidence record an erasure request
    needs. Counts are exact integers — hash-stable by construction."""
    from data_platform_spark.ops.integrity import erase_cascade

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    tombstones = customer.filter(
        F.col("c_custkey") % ERASE_MOD == 0
    ).select("c_custkey")
    survivors = erase_cascade(
        customer,
        "c_custkey",
        tombstones,
        [
            ("orders", orders, "o_custkey", "root", "c_custkey"),
            ("lineitem", lineitem, "l_orderkey", "orders", "o_orderkey"),
        ],
    )
    def audit(name: str, before: DataFrame, after: DataFrame) -> DataFrame:
        b = before.agg(F.count(F.lit(1)).alias("n_before"))
        a = after.agg(F.count(F.lit(1)).alias("n_after"))
        return b.crossJoin(a).select(
            F.lit(name).alias("table_name"),
            "n_before",
            (F.col("n_before") - F.col("n_after")).alias("n_deleted"),
            "n_after",
        )

    return (
        audit("customer", customer, survivors["root"])
        .unionByName(audit("orders", orders, survivors["orders"]))
        .unionByName(audit("lineitem", lineitem, survivors["lineitem"]))
    )


QUERIES["erasure_cascade_audit"] = erasure_cascade_audit

ORACLE["erasure_cascade_audit"] = f"""
    WITH dead_cust AS (
        SELECT c_custkey FROM customer WHERE c_custkey % {ERASE_MOD} = 0
    ),
    dead_orders AS (
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM dead_cust)
    )
    SELECT 'customer' AS table_name,
           (SELECT count(*) FROM customer) AS n_before,
           (SELECT count(*) FROM dead_cust) AS n_deleted,
           (SELECT count(*) FROM customer) -
           (SELECT count(*) FROM dead_cust) AS n_after
    UNION ALL
    SELECT 'orders',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM dead_orders),
           (SELECT count(*) FROM orders) -
           (SELECT count(*) FROM dead_orders)
    UNION ALL
    SELECT 'lineitem',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM dead_orders)),
           (SELECT count(*) FROM lineitem) -
           (SELECT count(*) FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM dead_orders))
"""


def orders_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: the monthly revenue series with
    its lagged value and relative growth rate — the reporting dual of
    monthly_order_calendar (levels) that every finance dashboard
    actually plots (deltas). Aggregate first (months are metadata
    scale), THEN the lag window over the tiny series — the two-stage
    shape that never runs a global window over raw facts."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(pround(F.sum("o_totalprice"), 2).alias("revenue"))
    w = Window.orderBy(F.asc("month"))
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "revenue",
        prev.alias("prev_revenue"),
        F.when(
            prev.isNotNull() & (prev > 0),
            pround((F.col("revenue") - prev) / prev, 6),
        ).alias("growth"),
    )


QUERIES["orders_revenue_growth"] = orders_revenue_growth

ORACLE["orders_revenue_growth"] = f"""
    WITH monthly AS (
        SELECT date_trunc('month', o_orderdate) AS month,
               {sql_round("sum(o_totalprice)", 2)} AS revenue
        FROM orders GROUP BY 1
    ),
    lagged AS (
        SELECT month, revenue,
               lag(revenue) OVER (ORDER BY month ASC) AS prev_revenue
        FROM monthly
    )
    SELECT month, revenue, prev_revenue,
           CASE WHEN prev_revenue IS NOT NULL AND prev_revenue > 0
                THEN {sql_round("(revenue - prev_revenue) / prev_revenue", 6)}
           END AS growth
    FROM lagged
"""


def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic warehouse scoring: each ordering
    customer ranked on Recency (latest order date), Frequency (order
    count) and Monetary (total spend), cut into quartiles per
    dimension (1 = best), combined into the 3-digit segment code.

    Deterministic quartiles WITHOUT ntile (whose tie behavior is
    partition-sensitive): each dimension gets a GLOBAL row number
    through the two-phase ops.global_order layout (range partition +
    broadcast offsets — no single-partition window), then quartile =
    floor((rank-1)·4 / n) + 1 over the broadcast customer count; ties
    broken by custkey, identically in the oracle."""
    from data_platform_spark.ops.global_order import global_row_number

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("n_orders"),
        pround(F.sum("o_totalprice"), 2).alias("total_spend"),
    )
    n = per_cust.agg(F.count(F.lit(1)).cast("long").alias("n_cust"))
    ranked = per_cust
    for col_name, rank_name in [
        ("last_order", "r_rank"),
        ("n_orders", "f_rank"),
        ("total_spend", "m_rank"),
    ]:
        ranked = global_row_number(
            ranked,
            [F.desc(col_name), F.asc("o_custkey")],
            rank_name,
        )
    quart = lambda rank: (  # noqa: E731
        F.floor((F.col(rank) - 1) * 4 / F.col("n_cust")) + 1
    ).cast("int")
    return ranked.crossJoin(F.broadcast(n)).select(
        "o_custkey",
        "last_order",
        F.col("n_orders").cast("long").alias("n_orders"),
        "total_spend",
        quart("r_rank").alias("r_q"),
        quart("f_rank").alias("f_q"),
        quart("m_rank").alias("m_q"),
        (
            quart("r_rank") * 100 + quart("f_rank") * 10 + quart("m_rank")
        ).cast("int").alias("rfm_code"),
    )


QUERIES["customer_rfm_segments"] = customer_rfm_segments

ORACLE["customer_rfm_segments"] = f"""
    WITH per_cust AS (
        SELECT o_custkey,
               max(o_orderdate) AS last_order,
               count(*)::BIGINT AS n_orders,
               {sql_round("sum(o_totalprice)", 2)} AS total_spend
        FROM orders GROUP BY o_custkey
    ),
    n AS (SELECT count(*)::BIGINT AS n_cust FROM per_cust),
    ranked AS (
        SELECT *,
            row_number() OVER (
                ORDER BY last_order DESC, o_custkey ASC
            )::BIGINT AS r_rank,
            row_number() OVER (
                ORDER BY n_orders DESC, o_custkey ASC
            )::BIGINT AS f_rank,
            row_number() OVER (
                ORDER BY total_spend DESC, o_custkey ASC
            )::BIGINT AS m_rank
        FROM per_cust
    )
    SELECT o_custkey, last_order, n_orders, total_spend,
           (floor((r_rank - 1) * 4 / n.n_cust) + 1)::INT AS r_q,
           (floor((f_rank - 1) * 4 / n.n_cust) + 1)::INT AS f_q,
           (floor((m_rank - 1) * 4 / n.n_cust) + 1)::INT AS m_q,
           ((floor((r_rank - 1) * 4 / n.n_cust) + 1) * 100
            + (floor((f_rank - 1) * 4 / n.n_cust) + 1) * 10
            + (floor((m_rank - 1) * 4 / n.n_cust) + 1))::INT AS rfm_code
    FROM ranked, n
"""


def order_value_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier profile per order priority: exact p25/p75
    through the two-phase grouped-percentile layout (a priority class is
    an unbounded slice of the fact table — the native percentile()
    aggregate would buffer it whole, the r8 plan guard rejects it), IQR
    fences at 1.5×, and the order count outside each fence. Fences
    derive ONLY from the 2-dp-rounded quartiles, so the flag compares
    identically across engines; the rate rounds at 6 dp."""
    from data_platform_spark.ops.global_order import grouped_percentile

    orders = load_table(spark, sf_dir, "orders")
    pct = grouped_percentile(
        orders, ["o_orderpriority"], "o_totalprice", {"p25": 0.25, "p75": 0.75}
    ).select(
        "o_orderpriority",
        pround(F.col("p25")).alias("p25_price"),
        pround(F.col("p75")).alias("p75_price"),
    )
    j = orders.join(F.broadcast(pct), "o_orderpriority")
    iqr = F.col("p75_price") - F.col("p25_price")
    hi = F.col("p75_price") + 1.5 * iqr
    lo = F.col("p25_price") - 1.5 * iqr
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.max("p25_price").alias("p25_price"),
        F.max("p75_price").alias("p75_price"),
        F.sum((F.col("o_totalprice") > hi).cast("int")).alias("n_high"),
        F.sum((F.col("o_totalprice") < lo).cast("int")).alias("n_low"),
        pround(
            F.sum(
                ((F.col("o_totalprice") > hi) | (F.col("o_totalprice") < lo))
                .cast("int")
            )
            / F.count(F.lit(1)),
            6,
        ).alias("outlier_rate"),
    )


QUERIES["order_value_iqr_outliers"] = order_value_iqr_outliers

ORACLE["order_value_iqr_outliers"] = f"""
    WITH pct AS (
        SELECT o_orderpriority,
               {sql_round("quantile_cont(o_totalprice, 0.25)", 2)} AS p25_price,
               {sql_round("quantile_cont(o_totalprice, 0.75)", 2)} AS p75_price
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderpriority,
           count(*)::BIGINT AS n_orders,
           max(p.p25_price) AS p25_price,
           max(p.p75_price) AS p75_price,
           CAST(sum(CASE WHEN o.o_totalprice >
                    p.p75_price + 1.5 * (p.p75_price - p.p25_price)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           CAST(sum(CASE WHEN o.o_totalprice <
                    p.p25_price - 1.5 * (p.p75_price - p.p25_price)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           {sql_round(
               "sum(CASE WHEN o.o_totalprice >"
               " p.p75_price + 1.5 * (p.p75_price - p.p25_price)"
               " OR o.o_totalprice <"
               " p.p25_price - 1.5 * (p.p75_price - p.p25_price)"
               " THEN 1 ELSE 0 END) * 1.0 / count(*)", 6
           )} AS outlier_rate
    FROM orders o JOIN pct p USING (o_orderpriority)
    GROUP BY o.o_orderpriority
"""


def customer_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: customers grouped by first-order
    month, cumulative revenue per (cohort, months-since-first-order)
    and LTV per customer — the retention economics table every growth
    dashboard draws. Aggregate-first: revenue folds to cent-exact LONGs
    per (cohort, month) BEFORE the cumulative window (summation-order
    independence), and the running sum's window partitions by cohort
    over a calendar-bounded month series — never raw orders."""
    orders = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate"))
    first = orders.groupBy("o_custkey").agg(
        F.min(month).alias("cohort")
    )
    sizes = first.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    rev = (
        orders.join(first, "o_custkey")
        .groupBy("cohort", month.alias("month"))
        .agg(F.sum(cents).alias("rev_cents"))
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = rev.withColumn("cum_cents", F.sum("rev_cents").over(w))
    return cum.join(F.broadcast(sizes), "cohort").select(
        "cohort",
        (F.months_between(F.col("month"), F.col("cohort")))
        .cast("int")
        .alias("month_n"),
        "n_customers",
        (F.col("cum_cents") / F.lit(100.0)).alias("cum_revenue"),
        pround(F.col("cum_cents") / F.lit(100.0) / F.col("n_customers"), 4)
        .alias("ltv_per_customer"),
    )


QUERIES["customer_cohort_ltv"] = customer_cohort_ltv

ORACLE["customer_cohort_ltv"] = f"""
    WITH first AS (
        SELECT o_custkey,
               min(date_trunc('month', o_orderdate)) AS cohort
        FROM orders GROUP BY o_custkey
    ),
    sizes AS (
        SELECT cohort, count(*)::BIGINT AS n_customers
        FROM first GROUP BY cohort
    ),
    rev AS (
        SELECT f.cohort,
               date_trunc('month', o.o_orderdate) AS month,
               sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                   AS rev_cents
        FROM orders o JOIN first f USING (o_custkey)
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT cohort, month,
               sum(rev_cents) OVER (
                   PARTITION BY cohort ORDER BY month
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_cents
        FROM rev
    )
    SELECT c.cohort,
           date_diff('month', c.cohort, c.month)::INT AS month_n,
           s.n_customers,
           c.cum_cents / 100.0 AS cum_revenue,
           {sql_round("c.cum_cents / 100.0 / s.n_customers", 4)}
               AS ltv_per_customer
    FROM cum c JOIN sizes s USING (cohort)
"""


PARETO_BUCKETS = 10


def customer_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration (Pareto) curve: customers ranked by total
    spend, cut into deciles, each decile's share and CUMULATIVE share of
    total revenue — the 80/20 table every revenue dashboard opens with.
    Per-customer spend folds to cent-exact LONGs; the decile assignment
    comes from a GLOBAL rank through the two-phase ops.global_order
    layout (no single-partition window over customers), and the
    cumulative share is a lag-free running sum over the 10-row decile
    aggregate — the aggregate-first discipline end to end."""
    from data_platform_spark.ops.global_order import (
        global_row_number,
        ntile_from_row_number,
    )

    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(cents).alias("spend_cents")
    )
    n = per_cust.agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.sum("spend_cents").alias("total_cents"),
    )
    ranked = global_row_number(
        per_cust, [F.desc("spend_cents"), F.asc("o_custkey")], "rn"
    )
    deciled = ranked.crossJoin(F.broadcast(n)).select(
        ntile_from_row_number(
            F.col("rn"), F.col("n_cust"), PARETO_BUCKETS
        ).alias("decile"),
        "spend_cents",
        "total_cents",
    )
    agg = deciled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("spend_cents").alias("rev_cents"),
        F.max("total_cents").alias("total_cents"),
    )
    w = (
        Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the running sum is over the 10-row decile aggregate (bucket count
    # is a constant) — allowlisted bounded global window
    return agg.select(
        "decile",
        "n_customers",
        (F.col("rev_cents") / F.lit(100.0)).alias("revenue"),
        pround(F.col("rev_cents") / F.col("total_cents"), 6).alias(
            "rev_share"
        ),
        pround(
            F.sum("rev_cents").over(w) / F.col("total_cents"), 6
        ).alias("cum_rev_share"),
    )


QUERIES["customer_revenue_pareto"] = customer_revenue_pareto

ORACLE["customer_revenue_pareto"] = f"""
    WITH per_cust AS (
        SELECT o_custkey,
               sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS spend_cents
        FROM orders GROUP BY o_custkey
    ),
    n AS (
        SELECT count(*)::BIGINT AS n_cust,
               sum(spend_cents)::BIGINT AS total_cents
        FROM per_cust
    ),
    ranked AS (
        SELECT spend_cents,
               ntile({PARETO_BUCKETS}) OVER (
                   ORDER BY spend_cents DESC, o_custkey ASC
               )::INT AS decile
        FROM per_cust
    ),
    agg AS (
        SELECT decile,
               count(*)::BIGINT AS n_customers,
               sum(spend_cents)::BIGINT AS rev_cents
        FROM ranked GROUP BY decile
    )
    SELECT a.decile, a.n_customers,
           a.rev_cents / 100.0 AS revenue,
           {sql_round("a.rev_cents * 1.0 / n.total_cents", 6)} AS rev_share,
           {sql_round(
               "sum(a.rev_cents) OVER (ORDER BY a.decile"
               " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
               " * 1.0 / n.total_cents", 6
           )} AS cum_rev_share
    FROM agg a CROSS JOIN n
"""


def order_lineitem_count_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Order-size distribution per priority class: exact p50/p90/p99 of
    lineitems-per-order plus order and lineitem totals — the basket-
    size profile (a priority class whose p99 inflates signals batching
    or fraud upstream). Orders without lineitems don't exist in the
    star schema's integrity contract (tpch_fk_orphans audits it), so
    the per-order counts derive from lineitem alone and join priorities
    in.

    Scale shape: one count per l_orderkey (map-side partial), a
    key-partitioned join to orders for the priority, and exact
    interpolated percentiles via the grouped two-phase layout
    (ops.global_order.grouped_percentile — the priority DOMAIN is 5
    values but a class's order count is unbounded; the native exact
    percentile would buffer it in one aggregator)."""
    from data_platform_spark.ops.global_order import grouped_percentile

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_items")
    )
    sized = per_order.join(
        orders.select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
        ),
        "l_orderkey",
    )
    base = sized.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("n_items").cast("long").alias("n_lineitems"),
    )
    pct = grouped_percentile(
        sized,
        ["o_orderpriority"],
        "n_items",
        {"p50": 0.5, "p90": 0.9, "p99": 0.99},
    )
    return base.join(pct, on="o_orderpriority", how="left").select(
        "o_orderpriority",
        "n_orders",
        "n_lineitems",
        pround(F.col("p50"), 4).alias("p50_items"),
        pround(F.col("p90"), 4).alias("p90_items"),
        pround(F.col("p99"), 4).alias("p99_items"),
    )


QUERIES["order_lineitem_count_percentiles"] = order_lineitem_count_percentiles

ORACLE["order_lineitem_count_percentiles"] = f"""
    WITH per_order AS (
        SELECT l_orderkey, count(*)::BIGINT AS n_items
        FROM lineitem GROUP BY l_orderkey
    ),
    sized AS (
        SELECT o.o_orderpriority, p.n_items
        FROM per_order p JOIN orders o ON o.o_orderkey = p.l_orderkey
    )
    SELECT o_orderpriority,
           count(*)::BIGINT AS n_orders,
           sum(n_items)::BIGINT AS n_lineitems,
           {sql_round("quantile_cont(n_items, 0.5)", 4)} AS p50_items,
           {sql_round("quantile_cont(n_items, 0.9)", 4)} AS p90_items,
           {sql_round("quantile_cont(n_items, 0.99)", 4)} AS p99_items
    FROM sized
    GROUP BY o_orderpriority
"""


def order_brand_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket brand affinity: for every pair of part brands
    co-occurring in one order, the co-order count and the LIFT
    (observed co-orders vs independence) — the association-rule table
    behind cross-sell and assortment decisions.

    Scale shape: orders collapse to distinct (order, brand) first —
    the per-order brand set is bounded by the BRAND domain (~25), so
    the orderkey self-join fans out at most |brands|² per order, never
    lineitem². Supports are bounded-domain aggregates broadcast back;
    lift = (c_ab·N) / (s_a·s_b) is exact LONG products with one final
    division (6 dp)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ob = (
        li.select("l_orderkey", "l_partkey")
        .join(
            F.broadcast(
                part.select(
                    F.col("p_partkey").alias("l_partkey"), "p_brand"
                )
            ),
            "l_partkey",
        )
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n = ob.agg(
        F.countDistinct("l_orderkey").cast("long").alias("n_orders")
    )
    support = ob.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("s")
    )
    a = ob.select("l_orderkey", F.col("p_brand").alias("brand_a"))
    b = ob.select("l_orderkey", F.col("p_brand").alias("brand_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_co_orders"))
    )
    out = (
        pairs.join(
            F.broadcast(
                support.select(
                    F.col("p_brand").alias("brand_a"),
                    F.col("s").alias("s_a"),
                )
            ),
            "brand_a",
        )
        .join(
            F.broadcast(
                support.select(
                    F.col("p_brand").alias("brand_b"),
                    F.col("s").alias("s_b"),
                )
            ),
            "brand_b",
        )
        .crossJoin(F.broadcast(n))
    )
    return out.select(
        "brand_a",
        "brand_b",
        "n_co_orders",
        "s_a",
        "s_b",
        # double-first products: the co-order·N and support products
        # overflow LONG at ~1e10 orders; below 2^53 the double product
        # is the exact integer, so the gate hash is unchanged
        pround(
            (
                F.col("n_co_orders").cast("double")
                * F.col("n_orders").cast("double")
            )
            / (
                F.col("s_a").cast("double")
                * F.col("s_b").cast("double")
            ),
            6,
        ).alias("lift"),
    )


QUERIES["order_brand_affinity"] = order_brand_affinity

ORACLE["order_brand_affinity"] = f"""
    WITH ob AS (
        SELECT DISTINCT l.l_orderkey, p.p_brand
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    n AS (SELECT count(DISTINCT l_orderkey)::BIGINT AS n_orders FROM ob),
    support AS (
        SELECT p_brand, count(*)::BIGINT AS s FROM ob GROUP BY p_brand
    ),
    pairs AS (
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
               count(*)::BIGINT AS n_co_orders
        FROM ob a JOIN ob b USING (l_orderkey)
        WHERE a.p_brand < b.p_brand
        GROUP BY a.p_brand, b.p_brand
    )
    SELECT brand_a, brand_b, n_co_orders,
           sa.s AS s_a, sb.s AS s_b,
           {sql_round(
               "(n_co_orders::DOUBLE * n.n_orders::DOUBLE)"
               " / (sa.s::DOUBLE * sb.s::DOUBLE)", 6
           )} AS lift
    FROM pairs
    JOIN support sa ON sa.p_brand = pairs.brand_a
    JOIN support sb ON sb.p_brand = pairs.brand_b
    CROSS JOIN n
"""


def nation_supplier_revenue_hhi(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Supplier-concentration audit per nation: the Herfindahl-
    Hirschman index of lineitem revenue across each nation's suppliers
    (HHI 1/n = perfectly even, → 1 = single-supplier dependence) plus
    the top supplier's share — the supply-risk table.

    Determinism: revenue fixes to CENTS per lineitem (exact LONG
    sums); each supplier's share fixes to integer MICRO-units via one
    double multiply/divide before squaring, so the HHI sum is an exact
    LONG fold with one final 1e-12 scaling. Scale shape: one groupBy
    per (nation, supplier), a bounded-domain (nation) rollup, and a
    max() instead of any window."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        + F.lit(0.5)
    ).cast("long")
    per_sup = (
        li.select("l_suppkey", cents.alias("rev_cents"))
        .groupBy("l_suppkey")
        .agg(F.sum("rev_cents").alias("rev_cents"))
        .join(
            F.broadcast(
                sup.select(
                    F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
                )
            ),
            "l_suppkey",
        )
    )
    nat_tot = per_sup.groupBy("s_nationkey").agg(
        F.sum("rev_cents").alias("nation_cents"),
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
    )
    share_micro = F.floor(
        F.col("rev_cents").cast("double")
        * 1_000_000
        / F.col("nation_cents")
        + F.lit(0.5)
    ).cast("long")
    shared = per_sup.join(F.broadcast(nat_tot), "s_nationkey").select(
        "s_nationkey",
        "n_suppliers",
        share_micro.alias("share_micro"),
    )
    agg = shared.groupBy("s_nationkey", "n_suppliers").agg(
        F.sum(F.col("share_micro") * F.col("share_micro")).alias(
            "hhi_sum"
        ),
        F.max("share_micro").alias("top_share_micro"),
    )
    return agg.join(
        F.broadcast(
            nat.select(
                F.col("n_nationkey").alias("s_nationkey"), "n_name"
            )
        ),
        "s_nationkey",
    ).select(
        "n_name",
        "n_suppliers",
        pround(F.col("hhi_sum") / F.lit(1_000_000_000_000.0), 6).alias(
            "hhi"
        ),
        pround(
            F.col("top_share_micro") / F.lit(1_000_000.0), 6
        ).alias("top_supplier_share"),
    )


QUERIES["nation_supplier_revenue_hhi"] = nation_supplier_revenue_hhi

ORACLE["nation_supplier_revenue_hhi"] = f"""
    WITH per_sup AS (
        SELECT l_suppkey,
               sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                              + 0.5) AS BIGINT))::BIGINT AS rev_cents
        FROM lineitem GROUP BY l_suppkey
    ),
    located AS (
        SELECT p.rev_cents, s.s_nationkey
        FROM per_sup p JOIN supplier s ON s.s_suppkey = p.l_suppkey
    ),
    nat_tot AS (
        SELECT s_nationkey, sum(rev_cents)::BIGINT AS nation_cents,
               count(*)::BIGINT AS n_suppliers
        FROM located GROUP BY s_nationkey
    ),
    shared AS (
        SELECT l.s_nationkey, t.n_suppliers,
               CAST(floor(l.rev_cents * 1.0 * 1000000 / t.nation_cents
                          + 0.5) AS BIGINT) AS share_micro
        FROM located l JOIN nat_tot t USING (s_nationkey)
    ),
    agg AS (
        SELECT s_nationkey, n_suppliers,
               sum(share_micro * share_micro)::BIGINT AS hhi_sum,
               max(share_micro)::BIGINT AS top_share_micro
        FROM shared GROUP BY s_nationkey, n_suppliers
    )
    SELECT n.n_name, a.n_suppliers,
           {sql_round("a.hhi_sum / 1000000000000.0", 6)} AS hhi,
           {sql_round("a.top_share_micro / 1000000.0", 6)}
               AS top_supplier_share
    FROM agg a JOIN nation n ON n.n_nationkey = a.s_nationkey
"""


def orders_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue seasonality by day-of-week: order count, cent-exact
    revenue, each weekday's revenue share in micro-units, and the
    deviation from the uniform 1/7 share — the demand-shape table
    capacity planning reads. One groupBy over a 7-value domain; shares
    derive from exact LONG cents with one double division each."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    per_dow = orders.select(
        F.dayofweek("o_orderdate").alias("dow"), cents.alias("cents")
    ).groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").alias("rev_cents"),
    )
    tot = per_dow.agg(F.sum("rev_cents").alias("total_cents"))
    out = per_dow.crossJoin(F.broadcast(tot))
    share = F.col("rev_cents") / F.col("total_cents")
    return out.select(
        "dow",
        "n_orders",
        (F.col("rev_cents") / F.lit(100.0)).alias("revenue"),
        pround(share, 6).alias("revenue_share"),
        pround(share - 1.0 / 7.0, 6).alias("uniform_deviation"),
    )


QUERIES["orders_weekday_profile"] = orders_weekday_profile

ORACLE["orders_weekday_profile"] = f"""
    WITH per_dow AS (
        SELECT (dayofweek(o_orderdate) + 1)::INT AS dow,
               count(*)::BIGINT AS n_orders,
               sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))::BIGINT
                   AS rev_cents
        FROM orders GROUP BY 1
    ),
    tot AS (SELECT sum(rev_cents)::BIGINT AS total_cents FROM per_dow)
    SELECT dow, n_orders,
           rev_cents / 100.0 AS revenue,
           {sql_round("rev_cents * 1.0 / total_cents", 6)}
               AS revenue_share,
           {sql_round(
               "rev_cents * 1.0 / total_cents - 1.0 / 7.0", 6
           )} AS uniform_deviation
    FROM per_dow CROSS JOIN tot
"""


def brand_return_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand return audit: shipped lineitems, returned lineitems
    (l_returnflag = 'R'), the return rate, and the cent-exact revenue
    lost to returns — the quality/claims table a merchandiser reads
    before delisting a brand.

    Determinism: revenue fixes to CENTS per lineitem before any sum
    (exact LONG folds, order-independent); the rate is one final
    division (6 dp). Scale shape: one broadcast join to the part dim
    and one bounded-domain (brand) aggregate with map-side partials —
    a single shuffle keyed by the ~25-value brand domain."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        + F.lit(0.5)
    ).cast("long")
    is_ret = (F.col("l_returnflag") == "R").cast("long")
    joined = li.select(
        "l_partkey",
        cents.alias("rev_cents"),
        is_ret.alias("is_ret"),
    ).join(
        F.broadcast(
            part.select(F.col("p_partkey").alias("l_partkey"), "p_brand")
        ),
        "l_partkey",
    )
    agg = joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("is_ret").cast("long").alias("n_returned"),
        F.sum(F.col("is_ret") * F.col("rev_cents")).cast("long").alias(
            "returned_cents"
        ),
    )
    return agg.select(
        "p_brand",
        "n_items",
        "n_returned",
        pround(F.col("n_returned") / F.col("n_items"), 6).alias(
            "return_rate"
        ),
        (F.col("returned_cents") / 100).alias("returned_revenue"),
    )


QUERIES["brand_return_rates"] = brand_return_rates

ORACLE["brand_return_rates"] = f"""
    WITH joined AS (
        SELECT p.p_brand,
               CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                          + 0.5) AS BIGINT) AS rev_cents,
               CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS is_ret
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    )
    SELECT p_brand,
           count(*)::BIGINT AS n_items,
           sum(is_ret)::BIGINT AS n_returned,
           {sql_round("sum(is_ret) * 1.0 / count(*)", 6)} AS return_rate,
           sum(is_ret * rev_cents)::BIGINT / 100.0 AS returned_revenue
    FROM joined
    GROUP BY p_brand
"""


def part_supplier_redundancy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Supply-chain redundancy per brand: how many parts ship from
    exactly one supplier (single-source risk), from two, or from three
    or more — the resilience histogram procurement reads when a
    supplier fails. Derived from observed lineitem flows (a part's
    REAL supplier set), not a static catalog.

    Scale shape: distinct (part, supplier) first — one shuffle on the
    part key — then a per-part count and a bounded-domain (brand ×
    3-bucket) rollup; the part dim broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    per_part = ps.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").cast("long").alias("n_suppliers")
    )
    bucketed = per_part.join(
        F.broadcast(
            part.select(F.col("p_partkey").alias("l_partkey"), "p_brand")
        ),
        "l_partkey",
    ).select(
        "p_brand",
        F.when(F.col("n_suppliers") >= 3, F.lit("3+"))
        .otherwise(F.col("n_suppliers").cast("string"))
        .alias("supplier_bucket"),
    )
    agg = bucketed.groupBy("p_brand", "supplier_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts")
    )
    tot = agg.groupBy("p_brand").agg(
        F.sum("n_parts").alias("brand_parts")
    )
    return agg.join(F.broadcast(tot), "p_brand").select(
        "p_brand",
        "supplier_bucket",
        "n_parts",
        pround(F.col("n_parts") / F.col("brand_parts"), 6).alias(
            "share"
        ),
    )


QUERIES["part_supplier_redundancy"] = part_supplier_redundancy

ORACLE["part_supplier_redundancy"] = f"""
    WITH per_part AS (
        SELECT l_partkey,
               count(DISTINCT l_suppkey)::BIGINT AS n_suppliers
        FROM lineitem GROUP BY l_partkey
    ),
    bucketed AS (
        SELECT p.p_brand,
               CASE WHEN pp.n_suppliers >= 3 THEN '3+'
                    ELSE CAST(pp.n_suppliers AS VARCHAR) END
                   AS supplier_bucket
        FROM per_part pp JOIN part p ON p.p_partkey = pp.l_partkey
    ),
    agg AS (
        SELECT p_brand, supplier_bucket, count(*)::BIGINT AS n_parts
        FROM bucketed GROUP BY p_brand, supplier_bucket
    ),
    tot AS (
        SELECT p_brand, sum(n_parts)::BIGINT AS brand_parts
        FROM agg GROUP BY p_brand
    )
    SELECT a.p_brand, a.supplier_bucket, a.n_parts,
           {sql_round("a.n_parts * 1.0 / t.brand_parts", 6)} AS share
    FROM agg a JOIN tot t ON t.p_brand = a.p_brand
"""


def ship_delay_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfilment-latency SLA per priority class: exact p50/p90/p99 of
    order-to-ship delay days plus the mean — the lead-time table an
    ops team alerts on (a priority class whose p99 detaches from its
    p50 means a stuck fulfilment queue, invisible in the mean).

    Scale shape: the delay projects per lineitem after a key-
    partitioned join to orders; the priority DOMAIN is 5 values but a
    class's lineitem count is unbounded, so the exact interpolated
    percentiles ride the grouped two-phase layout
    (ops.global_order.grouped_percentile) instead of the native
    buffer-the-group aggregate; the mean is an exact LONG day-sum."""
    from data_platform_spark.ops.global_order import grouped_percentile

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    delayed = li.select("l_orderkey", "l_shipdate").join(
        orders.select(
            F.col("o_orderkey").alias("l_orderkey"),
            "o_orderdate",
            "o_orderpriority",
        ),
        "l_orderkey",
    ).select(
        "o_orderpriority",
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.col("o_orderdate").cast("date"),
        ).cast("long").alias("delay_days"),
    )
    base = delayed.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        F.sum("delay_days").cast("long").alias("sum_days"),
    )
    pct = grouped_percentile(
        delayed,
        ["o_orderpriority"],
        "delay_days",
        {"p50": 0.5, "p90": 0.9, "p99": 0.99},
    )
    return base.join(pct, on="o_orderpriority", how="left").select(
        "o_orderpriority",
        "n_lineitems",
        pround(F.col("sum_days") / F.col("n_lineitems"), 4).alias(
            "mean_days"
        ),
        pround(F.col("p50"), 4).alias("p50_days"),
        pround(F.col("p90"), 4).alias("p90_days"),
        pround(F.col("p99"), 4).alias("p99_days"),
    )


QUERIES["ship_delay_percentiles"] = ship_delay_percentiles

ORACLE["ship_delay_percentiles"] = f"""
    WITH delayed AS (
        SELECT o.o_orderpriority,
               date_diff('day', CAST(o.o_orderdate AS DATE),
                         CAST(l.l_shipdate AS DATE))::BIGINT AS delay_days
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT o_orderpriority,
           count(*)::BIGINT AS n_lineitems,
           {sql_round("sum(delay_days) * 1.0 / count(*)", 4)} AS mean_days,
           {sql_round("quantile_cont(delay_days, 0.5)", 4)} AS p50_days,
           {sql_round("quantile_cont(delay_days, 0.9)", 4)} AS p90_days,
           {sql_round("quantile_cont(delay_days, 0.99)", 4)} AS p99_days
    FROM delayed
    GROUP BY o_orderpriority
"""


def customer_order_intervals(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Repeat-purchase cadence per market segment: exact mean and
    p50/p90 of the day gaps between a customer's consecutive orders,
    plus how many customers ever reorder — the lifecycle-marketing
    table (a segment whose median gap stretches is churning before it
    shows in revenue).

    Scale shape: consecutive gaps derive from a lag window partitioned
    by customer (per-customer state only, never a global sort); the
    segment DOMAIN is 5 values but a segment's gap count is unbounded,
    so percentiles ride the grouped two-phase layout
    (ops.global_order.grouped_percentile). Ties on a same-day pair of
    orders break on o_orderkey, pinned identically in the oracle."""
    from data_platform_spark.ops.global_order import grouped_percentile

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    gaps = (
        orders.select("o_custkey", "o_orderdate", "o_orderkey")
        .withColumn(
            "gap_days",
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lag(F.col("o_orderdate").cast("date")).over(w),
            ).cast("long"),
        )
        .filter(F.col("gap_days").isNotNull())
        .join(
            F.broadcast(
                cust.select(
                    F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
                )
            ),
            "o_custkey",
        )
    )
    base = gaps.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.countDistinct("o_custkey").cast("long").alias(
            "n_repeat_customers"
        ),
        F.sum("gap_days").cast("long").alias("sum_days"),
    )
    pct = grouped_percentile(
        gaps, ["c_mktsegment"], "gap_days", {"p50": 0.5, "p90": 0.9}
    )
    return base.join(pct, on="c_mktsegment", how="left").select(
        "c_mktsegment",
        "n_gaps",
        "n_repeat_customers",
        pround(F.col("sum_days") / F.col("n_gaps"), 4).alias(
            "mean_gap_days"
        ),
        pround(F.col("p50"), 4).alias("p50_gap_days"),
        pround(F.col("p90"), 4).alias("p90_gap_days"),
    )


QUERIES["customer_order_intervals"] = customer_order_intervals

ORACLE["customer_order_intervals"] = f"""
    WITH gaps AS (
        SELECT o_custkey,
               date_diff('day',
                   lag(CAST(o_orderdate AS DATE)) OVER
                       (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey),
                   CAST(o_orderdate AS DATE))::BIGINT AS gap_days
        FROM orders
    ),
    seg AS (
        SELECT c.c_mktsegment, g.o_custkey, g.gap_days
        FROM gaps g JOIN customer c ON c.c_custkey = g.o_custkey
        WHERE g.gap_days IS NOT NULL
    )
    SELECT c_mktsegment,
           count(*)::BIGINT AS n_gaps,
           count(DISTINCT o_custkey)::BIGINT AS n_repeat_customers,
           {sql_round("sum(gap_days) * 1.0 / count(*)", 4)}
               AS mean_gap_days,
           {sql_round("quantile_cont(gap_days, 0.5)", 4)} AS p50_gap_days,
           {sql_round("quantile_cont(gap_days, 0.9)", 4)} AS p90_gap_days
    FROM seg
    GROUP BY c_mktsegment
"""


def orders_backlog_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order backlog over time: per month, orders placed, orders fully
    shipped (the month of their LAST lineitem shipment), and the
    end-of-month open backlog as the running difference — the
    work-in-progress curve an ops team tracks against capacity (a
    rising backlog with flat placements is a fulfilment slowdown).

    Scale shape: one per-order max-shipdate aggregate, two month-grain
    rollups fused by a full-outer join on the month key, and running
    sums over the CALENDAR-bounded month series (a global window over
    ~80 rows — allowlisted like orders_by_year/orders_revenue_growth;
    the unbounded inputs never meet a global window)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    placed = orders.select(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias(
            "month"
        )
    ).groupBy("month").agg(
        F.count(F.lit(1)).cast("long").alias("n_placed")
    )
    done = (
        li.groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            F.date_trunc("month", F.col("last_ship")).cast("date").alias(
                "month"
            )
        )
        .groupBy("month")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shipped"))
    )
    merged = (
        placed.join(done, on="month", how="full_outer")
        .select(
            "month",
            F.coalesce("n_placed", F.lit(0)).cast("long").alias(
                "n_placed"
            ),
            F.coalesce("n_shipped", F.lit(0)).cast("long").alias(
                "n_shipped"
            ),
        )
    )
    w = Window.orderBy("month").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return merged.select(
        "month",
        "n_placed",
        "n_shipped",
        (
            F.sum("n_placed").over(w) - F.sum("n_shipped").over(w)
        ).cast("long").alias("open_backlog"),
    )


QUERIES["orders_backlog_by_month"] = orders_backlog_by_month

ORACLE["orders_backlog_by_month"] = """
    WITH placed AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               count(*)::BIGINT AS n_placed
        FROM orders GROUP BY 1
    ),
    done AS (
        SELECT CAST(date_trunc('month', last_ship) AS DATE) AS month,
               count(*)::BIGINT AS n_shipped
        FROM (
            SELECT l_orderkey, max(l_shipdate) AS last_ship
            FROM lineitem GROUP BY l_orderkey
        ) GROUP BY 1
    ),
    merged AS (
        SELECT coalesce(p.month, d.month) AS month,
               coalesce(p.n_placed, 0)::BIGINT AS n_placed,
               coalesce(d.n_shipped, 0)::BIGINT AS n_shipped
        FROM placed p FULL OUTER JOIN done d ON d.month = p.month
    )
    SELECT month, n_placed, n_shipped,
           (sum(n_placed) OVER (ORDER BY month
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW)
            - sum(n_shipped) OVER (ORDER BY month
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW))::BIGINT
               AS open_backlog
    FROM merged
"""


def nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation trade balance: revenue its SUPPLIERS earn from
    shipped lineitems vs what its CUSTOMERS spend on orders, and the
    net balance — the macro table joining both sides of the star
    schema (a nation whose customers spend far more than its suppliers
    earn is a net importer in the corpus).

    Determinism: both sides fix to CENTS per row before exact LONG
    folds. Scale shape: the lineitem→supplier and orders→customer
    joins each broadcast a dim; both rollups land on the bounded
    25-nation domain; the final full-outer fuse is metadata-scale."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev_cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        + F.lit(0.5)
    ).cast("long")
    supply = (
        li.select("l_suppkey", rev_cents.alias("rev_cents"))
        .join(
            F.broadcast(
                sup.select(
                    F.col("s_suppkey").alias("l_suppkey"),
                    F.col("s_nationkey").alias("nationkey"),
                )
            ),
            "l_suppkey",
        )
        .groupBy("nationkey")
        .agg(F.sum("rev_cents").cast("long").alias("supplier_cents"))
    )
    spend_cents = F.floor(
        F.col("o_totalprice") * 100 + F.lit(0.5)
    ).cast("long")
    demand = (
        orders.select("o_custkey", spend_cents.alias("spend_cents"))
        .join(
            F.broadcast(
                cust.select(
                    F.col("c_custkey").alias("o_custkey"),
                    F.col("c_nationkey").alias("nationkey"),
                )
            ),
            "o_custkey",
        )
        .groupBy("nationkey")
        .agg(F.sum("spend_cents").cast("long").alias("customer_cents"))
    )
    fused = supply.join(demand, "nationkey", "full_outer").select(
        "nationkey",
        F.coalesce("supplier_cents", F.lit(0)).alias("supplier_cents"),
        F.coalesce("customer_cents", F.lit(0)).alias("customer_cents"),
    )
    return fused.join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("nationkey"), "n_name"
            )
        ),
        "nationkey",
    ).select(
        F.col("n_name").alias("nation"),
        (F.col("supplier_cents") / 100).alias("supplier_revenue"),
        (F.col("customer_cents") / 100).alias("customer_spend"),
        ((F.col("supplier_cents") - F.col("customer_cents")) / 100).alias(
            "balance"
        ),
    )


QUERIES["nation_trade_balance"] = nation_trade_balance

ORACLE["nation_trade_balance"] = """
    WITH supply AS (
        SELECT s.s_nationkey AS nationkey,
               sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                              + 0.5) AS BIGINT))::BIGINT AS supplier_cents
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY s.s_nationkey
    ),
    demand AS (
        SELECT c.c_nationkey AS nationkey,
               sum(CAST(floor(o.o_totalprice * 100 + 0.5)
                        AS BIGINT))::BIGINT AS customer_cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY c.c_nationkey
    ),
    fused AS (
        SELECT coalesce(s.nationkey, d.nationkey) AS nationkey,
               coalesce(s.supplier_cents, 0) AS supplier_cents,
               coalesce(d.customer_cents, 0) AS customer_cents
        FROM supply s FULL OUTER JOIN demand d
          ON d.nationkey = s.nationkey
    )
    SELECT n.n_name AS nation,
           f.supplier_cents / 100.0 AS supplier_revenue,
           f.customer_cents / 100.0 AS customer_spend,
           (f.supplier_cents - f.customer_cents) / 100.0 AS balance
    FROM fused f JOIN nation n ON n.n_nationkey = f.nationkey
"""


_SPEND_BAND = (
    "CASE WHEN spend_cents IS NULL THEN 'absent' "
    "WHEN spend_cents < 200000000 THEN 'low' "
    "WHEN spend_cents < 300000000 THEN 'mid' "
    "ELSE 'high' END"
)


def customer_spend_band_migration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Customer lifecycle migration matrix: each customer's spend band
    (absent / low / mid / high, fixed cent thresholds) in the first
    half of the order calendar vs the second, with customer counts per
    (from, to) cell — the segment-flow table a CRM team reads for
    churn (high→absent) and growth (low→high) at a glance.

    Determinism: halves split at the fixed literal 1998-01-01 (the
    corpus calendar midpoint) and spend fixes to CENTS before the
    per-customer LONG fold. Scale shape: one customer-keyed aggregate
    per half over a pruned (date < / >=) scan, one full-outer fuse on
    the customer key, one bounded 16-cell rollup."""
    orders = load_table(spark, sf_dir, "orders")
    spend_cents = F.floor(
        F.col("o_totalprice") * 100 + F.lit(0.5)
    ).cast("long")
    split = F.lit("1998-01-01").cast("date")
    base = orders.select(
        "o_custkey",
        spend_cents.alias("cents"),
        (F.col("o_orderdate").cast("date") < split).alias("is_h1"),
    )

    def half(flag: bool) -> DataFrame:
        tag = "h1" if flag else "h2"
        return (
            base.filter(F.col("is_h1") == flag)
            .groupBy("o_custkey")
            .agg(F.sum("cents").cast("long").alias(f"{tag}_cents"))
        )

    fused = half(True).join(half(False), "o_custkey", "full_outer")
    band = lambda c: (  # noqa: E731 — kept inline with its thresholds
        F.when(F.col(c).isNull(), "absent")
        .when(F.col(c) < 200_000_000, "low")
        .when(F.col(c) < 300_000_000, "mid")
        .otherwise("high")
    )
    return (
        fused.select(
            band("h1_cents").alias("h1_band"),
            band("h2_cents").alias("h2_band"),
        )
        .groupBy("h1_band", "h2_band")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )


QUERIES["customer_spend_band_migration"] = customer_spend_band_migration

ORACLE["customer_spend_band_migration"] = f"""
    WITH h1 AS (
        SELECT o_custkey,
               sum(CAST(floor(o_totalprice * 100 + 0.5)
                        AS BIGINT))::BIGINT AS spend_cents
        FROM orders
        WHERE CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        GROUP BY o_custkey
    ),
    h2 AS (
        SELECT o_custkey,
               sum(CAST(floor(o_totalprice * 100 + 0.5)
                        AS BIGINT))::BIGINT AS spend_cents
        FROM orders
        WHERE CAST(o_orderdate AS DATE) >= DATE '1998-01-01'
        GROUP BY o_custkey
    ),
    fused AS (
        SELECT
            (SELECT {_SPEND_BAND} FROM (SELECT h1.spend_cents))
                AS h1_band,
            (SELECT {_SPEND_BAND} FROM (SELECT h2.spend_cents))
                AS h2_band
        FROM h1 FULL OUTER JOIN h2 ON h2.o_custkey = h1.o_custkey
    )
    SELECT h1_band, h2_band, count(*)::BIGINT AS n_customers
    FROM fused
    GROUP BY h1_band, h2_band
"""


def part_type_market_share_by_region(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Part-type revenue share within each customer region — the
    TPC-H Q8-flavored market-share table over the full star join
    (lineitem→orders→customer→nation→region + part): which product
    types dominate which geography.

    Determinism: revenue fixes to CENTS per lineitem before exact
    LONG folds; shares are one final division (6 dp). Scale shape:
    the ONLY big shuffle is lineitem⋈orders on the order key; part,
    customer, nation and region are broadcast dims (customer is
    sf-scaled but orders of magnitude under the fact — at 100 TB it
    would bucket instead); the rollup domain is bounded at
    |region|×|p_type| (30 cells) with map-side partials."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")
    rev_cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        + F.lit(0.5)
    ).cast("long")
    geo = (
        cust.select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("c_nationkey"),
                    "n_regionkey",
                )
            ),
            "c_nationkey",
        )
        .join(
            F.broadcast(
                region.select(
                    F.col("r_regionkey").alias("n_regionkey"), "r_name"
                )
            ),
            "n_regionkey",
        )
        .select(F.col("c_custkey").alias("o_custkey"), "r_name")
    )
    fact = (
        li.select("l_orderkey", "l_partkey", rev_cents.alias("rev_cents"))
        .join(
            orders.select(
                F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
            ),
            "l_orderkey",
        )
        .join(F.broadcast(geo), "o_custkey")
        .join(
            F.broadcast(
                part.select(F.col("p_partkey").alias("l_partkey"), "p_type")
            ),
            "l_partkey",
        )
    )
    cells = fact.groupBy("r_name", "p_type").agg(
        F.sum("rev_cents").cast("long").alias("cell_cents"),
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
    )
    wtot = Window.partitionBy("r_name")
    return cells.select(
        F.col("r_name").alias("region"),
        "p_type",
        "n_lineitems",
        (F.col("cell_cents") / 100).alias("revenue"),
        pround(
            F.col("cell_cents") / F.sum("cell_cents").over(wtot), 6
        ).alias("region_share"),
    )


QUERIES["part_type_market_share_by_region"] = (
    part_type_market_share_by_region
)

ORACLE["part_type_market_share_by_region"] = f"""
    WITH cells AS (
        SELECT r.r_name AS region, p.p_type,
               count(*)::BIGINT AS n_lineitems,
               sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                              + 0.5) AS BIGINT))::BIGINT AS cell_cents
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n   ON n.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        JOIN part p     ON p.p_partkey = l.l_partkey
        GROUP BY r.r_name, p.p_type
    )
    SELECT region, p_type, n_lineitems,
           cell_cents / 100.0 AS revenue,
           {sql_round(
               "cell_cents * 1.0 / sum(cell_cents) OVER "
               "(PARTITION BY region)", 6
           )} AS region_share
    FROM cells
"""


def ship_delay_monthly_trend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fulfilment lead-time TREND: per order month, the lineitem
    count, exact mean and p50/p90 order-to-ship delay — the time-series
    complement of ship_delay_percentiles (per priority class): a
    rising monthly p90 is a capacity problem building months before
    the mean moves.

    Scale shape: one key-partitioned lineitem⋈orders join, delay as
    an exact integer day diff; the month DOMAIN is calendar-bounded
    but a month's lineitem count is unbounded, so percentiles ride
    the grouped two-phase layout (ops.global_order
    .grouped_percentile); the mean is an exact LONG day-sum."""
    from data_platform_spark.ops.global_order import grouped_percentile

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    delayed = li.select("l_orderkey", "l_shipdate").join(
        orders.select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
        ),
        "l_orderkey",
    ).select(
        F.date_trunc("month", F.col("o_orderdate")).alias("month"),
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.col("o_orderdate").cast("date"),
        ).cast("long").alias("delay_days"),
    )
    base = delayed.groupBy("month").agg(
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        F.sum("delay_days").cast("long").alias("sum_days"),
    )
    pct = grouped_percentile(
        delayed, ["month"], "delay_days", {"p50": 0.5, "p90": 0.9}
    )
    return base.join(pct, on="month", how="left").select(
        "month",
        "n_lineitems",
        pround(F.col("sum_days") / F.col("n_lineitems"), 4).alias(
            "mean_days"
        ),
        pround(F.col("p50"), 4).alias("p50_days"),
        pround(F.col("p90"), 4).alias("p90_days"),
    )


QUERIES["ship_delay_monthly_trend"] = ship_delay_monthly_trend

ORACLE["ship_delay_monthly_trend"] = f"""
    WITH delayed AS (
        SELECT date_trunc('month', o.o_orderdate) AS month,
               date_diff('day', CAST(o.o_orderdate AS DATE),
                         CAST(l.l_shipdate AS DATE))::BIGINT AS delay_days
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT month,
           count(*)::BIGINT AS n_lineitems,
           {sql_round("sum(delay_days) * 1.0 / count(*)", 4)} AS mean_days,
           {sql_round("quantile_cont(delay_days, 0.5)", 4)} AS p50_days,
           {sql_round("quantile_cont(delay_days, 0.9)", 4)} AS p90_days
    FROM delayed
    GROUP BY month
"""


def order_fulfilment_span(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Intra-order fulfilment span per priority class: how many days
    separate an order's FIRST and LAST lineitem shipment — exact mean
    plus p50/p90 of the span, and the share of orders shipped in one
    day. The multi-shipment coherence table ship_delay_percentiles
    can't see (that one scores each lineitem independently; this one
    scores the ORDER as a unit — a priority class whose spans stretch
    means split shipments, partial stock, or a stuck line).

    Determinism: the span is an integer day difference of per-order
    min/max ship dates. Scale shape: one groupBy on l_orderkey
    (min/max/count — algebraic, map-side partial) joined to the order
    dim on the same key; the mean/share rollup lands on the bounded
    5-priority domain; the exact percentiles ride the grouped
    two-phase layout because a class's order count is unbounded."""
    from data_platform_spark.ops.global_order import grouped_percentile

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    spans = (
        li.groupBy(F.col("l_orderkey"))
        .agg(
            F.datediff(
                F.max(F.col("l_shipdate").cast("date")),
                F.min(F.col("l_shipdate").cast("date")),
            ).cast("long").alias("span_days"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
        .join(
            orders.select(
                F.col("o_orderkey").alias("l_orderkey"),
                "o_orderpriority",
            ),
            "l_orderkey",
        )
    )
    base = spans.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("span_days").cast("long").alias("sum_span"),
        F.sum(
            F.when(F.col("span_days") == 0, F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("n_single_day"),
    )
    pct = grouped_percentile(
        spans, ["o_orderpriority"], "span_days", {"p50": 0.5, "p90": 0.9}
    )
    return base.join(pct, on="o_orderpriority", how="left").select(
        "o_orderpriority",
        "n_orders",
        pround(F.col("n_single_day") / F.col("n_orders"), 6).alias(
            "single_day_share"
        ),
        pround(F.col("sum_span") / F.col("n_orders"), 4).alias(
            "mean_span_days"
        ),
        pround(F.col("p50"), 4).alias("p50_span_days"),
        pround(F.col("p90"), 4).alias("p90_span_days"),
    )


QUERIES["order_fulfilment_span"] = order_fulfilment_span

ORACLE["order_fulfilment_span"] = f"""
    WITH spans AS (
        SELECT l.l_orderkey,
               date_diff('day', min(CAST(l.l_shipdate AS DATE)),
                         max(CAST(l.l_shipdate AS DATE)))::BIGINT
                   AS span_days
        FROM lineitem l
        GROUP BY l.l_orderkey
    )
    SELECT o.o_orderpriority,
           count(*)::BIGINT AS n_orders,
           {sql_round(
               "sum(CASE WHEN span_days = 0 THEN 1 ELSE 0 END)"
               " * 1.0 / count(*)", 6
           )} AS single_day_share,
           {sql_round("sum(span_days) * 1.0 / count(*)", 4)}
               AS mean_span_days,
           {sql_round("quantile_cont(span_days, 0.5)", 4)} AS p50_span_days,
           {sql_round("quantile_cont(span_days, 0.9)", 4)} AS p90_span_days
    FROM spans s JOIN orders o ON o.o_orderkey = s.l_orderkey
    GROUP BY o.o_orderpriority
"""


def orders_priority_mix_shift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Order-priority mix drift by month: each month's share of every
    priority class next to the corpus-wide share and the signed
    deviation — the composition-shift monitor that catches an upstream
    segment change (a surge of URGENT orders) even when total volume
    is flat, the categorical twin of the value-drift monitors.

    Determinism: shares are double divisions of exact LONG counts
    computed by one fixed expression. Scale shape: one groupBy on the
    bounded (month × 5-priority) domain; the month totals and the
    corpus-wide priority shares are metadata-scale relations joined
    back by broadcast; the overall total rides a 1-row broadcast."""
    orders = load_table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month"),
        "o_orderpriority",
    ).agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    month_tot = cells.groupBy("month").agg(
        F.sum("n_orders").cast("long").alias("month_total")
    )
    prio_tot = cells.groupBy("o_orderpriority").agg(
        F.sum("n_orders").cast("long").alias("prio_total")
    )
    grand = cells.agg(F.sum("n_orders").cast("long").alias("grand_total"))
    month_share = F.col("n_orders") / F.col("month_total")
    overall_share = F.col("prio_total") / F.col("grand_total")
    return (
        cells.join(F.broadcast(month_tot), "month")
        .join(F.broadcast(prio_tot), "o_orderpriority")
        .crossJoin(F.broadcast(grand))
        .select(
            "month",
            "o_orderpriority",
            "n_orders",
            pround(month_share, 6).alias("month_share"),
            pround(overall_share, 6).alias("overall_share"),
            pround(month_share - overall_share, 6).alias("share_shift"),
        )
    )


QUERIES["orders_priority_mix_shift"] = orders_priority_mix_shift

ORACLE["orders_priority_mix_shift"] = f"""
    WITH cells AS (
        SELECT date_trunc('month', o_orderdate) AS month,
               o_orderpriority,
               count(*)::BIGINT AS n_orders
        FROM orders
        GROUP BY 1, 2
    ),
    month_tot AS (
        SELECT month, sum(n_orders)::BIGINT AS month_total
        FROM cells GROUP BY month
    ),
    prio_tot AS (
        SELECT o_orderpriority, sum(n_orders)::BIGINT AS prio_total
        FROM cells GROUP BY o_orderpriority
    ),
    grand AS (SELECT sum(n_orders)::BIGINT AS grand_total FROM cells)
    SELECT c.month,
           c.o_orderpriority,
           c.n_orders,
           {sql_round("c.n_orders * 1.0 / m.month_total", 6)}
               AS month_share,
           {sql_round("p.prio_total * 1.0 / g.grand_total", 6)}
               AS overall_share,
           {sql_round(
               "c.n_orders * 1.0 / m.month_total"
               " - p.prio_total * 1.0 / g.grand_total", 6
           )} AS share_shift
    FROM cells c
    JOIN month_tot m ON m.month = c.month
    JOIN prio_tot p ON p.o_orderpriority = c.o_orderpriority
    CROSS JOIN grand g
"""


def segment_priority_contingency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Market-segment × order-priority contingency table with expected
    counts under independence, lift, and per-cell chi² contributions —
    the categorical-independence audit (does AUTOMOBILE order URGENT
    more than chance?). A cell's chi² contribution localizes WHERE an
    association lives; the lift is its effect size. The bounded 5×5
    domain makes every derived statistic metadata-scale.

    Determinism: observed counts are exact LONGs; expected/lift/chi²
    derive by one fixed double expression. Scale shape: the
    orders→customer join is key-partitioned on custkey (large-large —
    AQE may broadcast at small SF, must shuffle at 100 TB); the cell
    rollup lands on the bounded domain; row/column totals broadcast;
    the grand total rides a 1-row broadcast."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cells = (
        orders.select(F.col("o_custkey").alias("c_custkey"), "o_orderpriority")
        .join(cust.select("c_custkey", "c_mktsegment"), "c_custkey")
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )
    row_tot = cells.groupBy("c_mktsegment").agg(
        F.sum("n_orders").cast("long").alias("seg_total")
    )
    col_tot = cells.groupBy("o_orderpriority").agg(
        F.sum("n_orders").cast("long").alias("prio_total")
    )
    grand = cells.agg(F.sum("n_orders").cast("long").alias("grand_total"))
    expected = (
        F.col("seg_total").cast("double")
        * F.col("prio_total").cast("double")
        / F.col("grand_total").cast("double")
    )
    lift = F.col("n_orders").cast("double") / expected
    chi2 = (F.col("n_orders").cast("double") - expected) ** 2 / expected
    return (
        cells.join(F.broadcast(row_tot), "c_mktsegment")
        .join(F.broadcast(col_tot), "o_orderpriority")
        .crossJoin(F.broadcast(grand))
        .select(
            "c_mktsegment",
            "o_orderpriority",
            "n_orders",
            pround(expected, 4).alias("expected"),
            pround(lift, 4).alias("lift"),
            pround(chi2, 4).alias("chi2_contrib"),
        )
    )


QUERIES["segment_priority_contingency"] = segment_priority_contingency

ORACLE["segment_priority_contingency"] = f"""
    WITH cells AS (
        SELECT c.c_mktsegment, o.o_orderpriority,
               count(*)::BIGINT AS n_orders
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ),
    row_tot AS (
        SELECT c_mktsegment, sum(n_orders)::BIGINT AS seg_total
        FROM cells GROUP BY 1
    ),
    col_tot AS (
        SELECT o_orderpriority, sum(n_orders)::BIGINT AS prio_total
        FROM cells GROUP BY 1
    ),
    grand AS (SELECT sum(n_orders)::BIGINT AS grand_total FROM cells)
    SELECT ce.c_mktsegment,
           ce.o_orderpriority,
           ce.n_orders,
           {sql_round(
               "r.seg_total::DOUBLE * c.prio_total::DOUBLE"
               " / g.grand_total::DOUBLE", 4
           )} AS expected,
           {sql_round(
               "ce.n_orders::DOUBLE"
               " / (r.seg_total::DOUBLE * c.prio_total::DOUBLE"
               "    / g.grand_total::DOUBLE)", 4
           )} AS lift,
           {sql_round(
               "pow(ce.n_orders::DOUBLE"
               "    - r.seg_total::DOUBLE * c.prio_total::DOUBLE"
               "      / g.grand_total::DOUBLE, 2)"
               " / (r.seg_total::DOUBLE * c.prio_total::DOUBLE"
               "    / g.grand_total::DOUBLE)", 4
           )} AS chi2_contrib
    FROM cells ce
    JOIN row_tot r ON r.c_mktsegment = ce.c_mktsegment
    JOIN col_tot c ON c.o_orderpriority = ce.o_orderpriority
    CROSS JOIN grand g
"""


def nation_self_trade_share(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Import-dependency diagonal: per CUSTOMER nation, the share of
    its purchase revenue supplied by its OWN nation's suppliers — the
    one-row-per-nation summary of q7_nation_trade_volume's pair matrix
    (a nation whose domestic share collapses is import-dependent; the
    supply-chain-risk complement of nation_supplier_revenue_hhi's
    concentration view).

    Determinism: revenue fixes to CENTS per lineitem before exact LONG
    folds; the share is one double division. Scale shape: the
    lineitem→orders join is key-partitioned on orderkey (large-large);
    customer and supplier dims broadcast; the rollup lands on the
    bounded 25-nation domain."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    rev_cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        + F.lit(0.5)
    ).cast("long")
    flows = (
        li.select("l_orderkey", "l_suppkey", rev_cents.alias("rev_cents"))
        .join(
            orders.select(
                F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
            ),
            "l_orderkey",
        )
        .join(
            F.broadcast(
                cust.select(
                    F.col("c_custkey").alias("o_custkey"),
                    F.col("c_nationkey").alias("cust_nation"),
                )
            ),
            "o_custkey",
        )
        .join(
            F.broadcast(
                sup.select(
                    F.col("s_suppkey").alias("l_suppkey"),
                    F.col("s_nationkey").alias("supp_nation"),
                )
            ),
            "l_suppkey",
        )
    )
    agg = flows.groupBy("cust_nation").agg(
        F.sum("rev_cents").cast("long").alias("total_cents"),
        F.sum(
            F.when(
                F.col("supp_nation") == F.col("cust_nation"),
                F.col("rev_cents"),
            ).otherwise(F.lit(0))
        ).cast("long").alias("domestic_cents"),
    )
    return agg.join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("cust_nation"), "n_name"
            )
        ),
        "cust_nation",
    ).select(
        F.col("n_name").alias("nation"),
        (F.col("total_cents") / 100).alias("purchase_revenue"),
        (F.col("domestic_cents") / 100).alias("domestic_revenue"),
        pround(
            F.col("domestic_cents") / F.col("total_cents"), 6
        ).alias("domestic_share"),
    )


QUERIES["nation_self_trade_share"] = nation_self_trade_share

ORACLE["nation_self_trade_share"] = f"""
    WITH flows AS (
        SELECT c.c_nationkey AS cust_nation,
               s.s_nationkey AS supp_nation,
               CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                          + 0.5) AS BIGINT) AS rev_cents
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
    ),
    agg AS (
        SELECT cust_nation,
               sum(rev_cents)::BIGINT AS total_cents,
               sum(CASE WHEN supp_nation = cust_nation
                        THEN rev_cents ELSE 0 END)::BIGINT
                   AS domestic_cents
        FROM flows
        GROUP BY cust_nation
    )
    SELECT n.n_name AS nation,
           a.total_cents / 100.0 AS purchase_revenue,
           a.domestic_cents / 100.0 AS domestic_revenue,
           {sql_round("a.domestic_cents * 1.0 / a.total_cents", 6)}
               AS domestic_share
    FROM agg a JOIN nation n ON n.n_nationkey = a.cust_nation
"""


def brand_unit_price_dispersion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pricing-consistency audit per part brand: mean realized UNIT
    price (extendedprice/quantity) and its coefficient of variation —
    a brand whose CV detaches from the fleet means inconsistent list
    pricing, heavy selective discounting, or a data bug upstream (the
    unit price should be the part's price, not a per-deal number).

    Determinism: unit prices fix to integer CENTS per lineitem (one
    floor per row; cent squares keep ~1e8 rows per brand inside LONG
    headroom — drop the unit beyond that) before exact LONG folds;
    mean/CV derive by one fixed double expression. Scale shape: the
    lineitem→part join broadcasts the dim at test SF and shuffles
    key-partitioned at 100 TB (AQE decides); the rollup lands on the
    bounded 25-brand domain."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    unit_cents = F.floor(
        F.col("l_extendedprice") / F.col("l_quantity") * 100 + F.lit(0.5)
    ).cast("long")
    joined = li.select("l_partkey", unit_cents.alias("u")).join(
        part.select(F.col("p_partkey").alias("l_partkey"), "p_brand"),
        "l_partkey",
    )
    agg = joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("u").cast("long").alias("su"),
        F.sum(F.col("u") * F.col("u")).cast("long").alias("suu"),
    )
    mean = F.col("su") / F.col("n")
    var = F.col("suu") * 1.0 / F.col("n") - mean * mean
    return agg.select(
        F.col("p_brand"),
        F.col("n").alias("n_lineitems"),
        pround(mean / 100.0, 4).alias("mean_unit_price"),
        pround(
            F.when(mean > 0, F.sqrt(var) / mean), 6
        ).alias("unit_price_cv"),
    )


QUERIES["brand_unit_price_dispersion"] = brand_unit_price_dispersion

ORACLE["brand_unit_price_dispersion"] = f"""
    WITH joined AS (
        SELECT p.p_brand,
               CAST(floor(l.l_extendedprice / l.l_quantity * 100 + 0.5)
                    AS BIGINT) AS u
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    agg AS (
        SELECT p_brand,
               count(*)::BIGINT AS n,
               sum(u)::BIGINT AS su,
               sum(u * u)::BIGINT AS suu
        FROM joined
        GROUP BY p_brand
    )
    SELECT p_brand,
           n AS n_lineitems,
           {sql_round("(su * 1.0 / n) / 100.0", 4)} AS mean_unit_price,
           {sql_round(
               "CASE WHEN su * 1.0 / n > 0"
               "     THEN sqrt(suu * 1.0 / n"
               "               - (su * 1.0 / n) * (su * 1.0 / n))"
               "          / (su * 1.0 / n) END", 6
           )} AS unit_price_cv
    FROM agg
"""


def brand_price_size_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand price-vs-size regression: closed-form OLS slope,
    intercept, and r² of retail price on part size — the pricing-curve
    audit (a brand whose slope flips negative or whose r² collapses
    has inconsistent pricing, a catalog-data error signal). Extends the
    corr/covar surface (value_correlation) to full per-group regression.

    Determinism: prices fix to cents; the five OLS sums
    (Σx Σy Σxy Σx² Σy²) are exact LONG folds (x = size, bounded small,
    so products stay far from overflow); slope/intercept/r² are one
    fixed double expression each (6 dp). Scale shape: one map-side-
    combined groupBy on the bounded brand domain — no joins, no
    windows, no shuffles beyond the single bounded-key aggregate."""
    part = load_table(spark, sf_dir, "part")
    yc = F.floor(F.col("p_retailprice") * 100 + F.lit(0.5)).cast("long")
    x = F.col("p_size").cast("long")
    sums = part.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(yc).alias("sy"),
        F.sum(x * yc).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(yc * yc).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope_c = num.cast("double") / den_x.cast("double")
    intercept = (
        F.col("sy").cast("double") - slope_c * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    r2 = (num.cast("double") * num.cast("double")) / (
        den_x.cast("double") * den_y.cast("double")
    )
    return sums.select(
        F.col("p_brand").alias("brand"),
        F.col("n").alias("n_parts"),
        pround(F.when(den_x > 0, slope_c / 100.0), 6).alias("price_per_size"),
        pround(F.when(den_x > 0, intercept / 100.0), 6).alias(
            "intercept_price"
        ),
        pround(F.when((den_x > 0) & (den_y > 0), r2), 6).alias("r_squared"),
    )


QUERIES["brand_price_size_slope"] = brand_price_size_slope

ORACLE["brand_price_size_slope"] = f"""
    WITH sums AS (
        SELECT p_brand,
               count(*)::BIGINT AS n,
               sum(p_size::BIGINT)::BIGINT AS sx,
               sum(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT))::BIGINT
                   AS sy,
               sum(p_size::BIGINT
                   * CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
                  )::BIGINT AS sxy,
               sum(p_size::BIGINT * p_size::BIGINT)::BIGINT AS sxx,
               sum(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
                   * CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
                  )::BIGINT AS syy
        FROM part GROUP BY p_brand
    )
    SELECT p_brand AS brand,
           n AS n_parts,
           {sql_round(
               "CASE WHEN n * sxx - sx * sx > 0 THEN"
               " ((n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx)::DOUBLE)"
               " / 100.0 END", 6
           )} AS price_per_size,
           {sql_round(
               "CASE WHEN n * sxx - sx * sx > 0 THEN"
               " ((sy::DOUBLE - ((n * sxy - sx * sy)::DOUBLE"
               "   / (n * sxx - sx * sx)::DOUBLE) * sx::DOUBLE)"
               "  / n::DOUBLE) / 100.0 END", 6
           )} AS intercept_price,
           {sql_round(
               "CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0"
               " THEN ((n * sxy - sx * sy)::DOUBLE * (n * sxy - sx * sy)::DOUBLE)"
               " / ((n * sxx - sx * sx)::DOUBLE * (n * syy - sy * sy)::DOUBLE)"
               " END", 6
           )} AS r_squared
    FROM sums
"""


def nation_revenue_rank_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """League-table motion: each nation's customer-revenue RANK in the
    corpus's first order-year vs its last, with the rank change — the
    market-movement summary a yearly business review opens with (a
    nation climbing five places matters in a way raw revenue deltas
    obscure). Nations active in only one of the two years drop (no
    defined shift).

    Determinism: revenue folds cent-exact per (nation, year); ranks
    order by (revenue DESC, nation name ASC) — a total order.
    Scale shape: one fact aggregate onto the bounded nation×year
    domain (customer/nation dims broadcast into the join), then rank
    windows PARTITIONED BY YEAR over ≤ |nations| rows per partition —
    bounded by the entity domain, never data volume; the first/last
    year bounds are a 1-row broadcast."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    per = (
        orders.select(
            "o_custkey", F.year("o_orderdate").alias("yr"), cents.alias("c")
        )
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "yr")
        .agg(F.sum("c").alias("rev_cents"))
    )
    bounds = orders.agg(
        F.min(F.year("o_orderdate")).alias("y0"),
        F.max(F.year("o_orderdate")).alias("y1"),
    )
    w = Window.partitionBy("yr").orderBy(
        F.desc("rev_cents"), F.asc("n_name")
    )
    ranked = per.withColumn("rnk", F.row_number().over(w))
    b = F.broadcast(bounds)
    first = ranked.crossJoin(b).filter(F.col("yr") == F.col("y0")).select(
        "n_name",
        F.col("rnk").alias("first_rank"),
        (F.col("rev_cents") / 100.0).alias("first_revenue"),
    )
    last = ranked.crossJoin(b).filter(F.col("yr") == F.col("y1")).select(
        "n_name",
        F.col("rnk").alias("last_rank"),
        (F.col("rev_cents") / 100.0).alias("last_revenue"),
    )
    return first.join(last, "n_name").select(
        F.col("n_name").alias("nation"),
        F.col("first_rank").cast("long").alias("first_rank"),
        F.col("last_rank").cast("long").alias("last_rank"),
        (F.col("first_rank") - F.col("last_rank")).cast("long").alias(
            "rank_gain"
        ),
        "first_revenue",
        "last_revenue",
    )


QUERIES["nation_revenue_rank_shift"] = nation_revenue_rank_shift

ORACLE["nation_revenue_rank_shift"] = """
    WITH per AS (
        SELECT n.n_name, year(o.o_orderdate) AS yr,
               sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
                  )::BIGINT AS rev_cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name, year(o.o_orderdate)
    ),
    bounds AS (
        SELECT min(year(o_orderdate)) AS y0, max(year(o_orderdate)) AS y1
        FROM orders
    ),
    ranked AS (
        SELECT n_name, yr, rev_cents,
               row_number() OVER (
                   PARTITION BY yr ORDER BY rev_cents DESC, n_name ASC
               ) AS rnk
        FROM per
    )
    SELECT f.n_name AS nation,
           f.rnk::BIGINT AS first_rank,
           l.rnk::BIGINT AS last_rank,
           (f.rnk - l.rnk)::BIGINT AS rank_gain,
           f.rev_cents / 100.0 AS first_revenue,
           l.rev_cents / 100.0 AS last_revenue
    FROM ranked f
    JOIN ranked l ON l.n_name = f.n_name
    CROSS JOIN bounds b
    WHERE f.yr = b.y0 AND l.yr = b.y1
"""


def customer_repeat_rate_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Repeat-purchase economics per market segment: active-customer
    count, share of customers with 2+ orders (the repeat rate), mean
    orders per active customer, and the cent-exact share of segment
    revenue that comes FROM repeat customers — the retention headline
    that tells a business where its revenue durability lives (a
    segment can look big on volume while its revenue is all one-shot
    buyers).

    Determinism: order counts and cents are exact LONG folds; shares
    are one division each (6 dp). Scale shape: one per-customer
    aggregate (customer-keyed shuffle over the fact), one bounded
    segment rollup after a broadcast dim join. No windows."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(cents).alias("rev_cents"),
    )
    seg = per_cust.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    agg = seg.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum(
            F.when(F.col("n_orders") >= 2, F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("n_repeat"),
        F.sum("n_orders").alias("sum_orders"),
        F.sum("rev_cents").alias("sum_cents"),
        F.sum(F.when(F.col("n_orders") >= 2, F.col("rev_cents")).otherwise(
            F.lit(0)
        )).alias("repeat_cents"),
    )
    return agg.select(
        F.col("c_mktsegment").alias("segment"),
        "n_customers",
        pround(F.col("n_repeat") / F.col("n_customers"), 6).alias(
            "repeat_rate"
        ),
        pround(F.col("sum_orders") / F.col("n_customers"), 4).alias(
            "mean_orders"
        ),
        pround(F.col("repeat_cents") / F.col("sum_cents"), 6).alias(
            "repeat_revenue_share"
        ),
    )


QUERIES["customer_repeat_rate_by_segment"] = customer_repeat_rate_by_segment

ORACLE["customer_repeat_rate_by_segment"] = f"""
    WITH per_cust AS (
        SELECT o_custkey,
               count(*)::BIGINT AS n_orders,
               sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                  )::BIGINT AS rev_cents
        FROM orders GROUP BY o_custkey
    ),
    agg AS (
        SELECT c.c_mktsegment,
               count(*)::BIGINT AS n_customers,
               sum(CASE WHEN p.n_orders >= 2 THEN 1 ELSE 0 END)::BIGINT
                   AS n_repeat,
               sum(p.n_orders)::BIGINT AS sum_orders,
               sum(p.rev_cents)::BIGINT AS sum_cents,
               sum(CASE WHEN p.n_orders >= 2 THEN p.rev_cents
                        ELSE 0 END)::BIGINT AS repeat_cents
        FROM per_cust p
        JOIN customer c ON c.c_custkey = p.o_custkey
        GROUP BY c.c_mktsegment
    )
    SELECT c_mktsegment AS segment,
           n_customers,
           {sql_round("n_repeat * 1.0 / n_customers", 6)} AS repeat_rate,
           {sql_round("sum_orders * 1.0 / n_customers", 4)} AS mean_orders,
           {sql_round("repeat_cents * 1.0 / sum_cents", 6)}
               AS repeat_revenue_share
    FROM agg
"""


def supplier_price_premium(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Who sells above market? Per supplier: the mean deviation of their
    observed unit price (extendedprice/quantity, fixed to cents per
    row) from each part's cross-supplier mean unit price, plus the
    share of their line items priced above that mean — the procurement
    negotiation list (a supplier consistently +X over market on parts
    others also stock is a switching opportunity; one below market is
    a capacity risk to protect).

    Determinism: unit prices fix to cents (exact LONG folds build each
    part's mean as exact sums); the per-row deviation against the
    part-mean double quantizes to 4-dp units before the per-supplier
    LONG sum. Scale shape: one part-keyed aggregate, a part-keyed join
    back (both sides fact-scale, equi-keyed — the SMJ/shuffle-hash
    plan is correct there), one supplier rollup; the supplier dim
    broadcasts for names."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    u_cents = F.floor(
        F.col("l_extendedprice") / F.col("l_quantity") * 100 + F.lit(0.5)
    ).cast("long")
    items = li.select("l_partkey", "l_suppkey", u_cents.alias("u"))
    part_mean = items.groupBy("l_partkey").agg(
        F.sum("u").alias("su"), F.count(F.lit(1)).cast("long").alias("nu")
    )
    dev = items.join(part_mean, "l_partkey").select(
        "l_suppkey",
        "l_partkey",
        F.floor(
            (
                F.col("u").cast("double")
                - F.col("su").cast("double") / F.col("nu").cast("double")
            )
            * 10_000
            + F.lit(0.5)
        ).cast("long").alias("dev_4dp"),
    )
    per_sup = dev.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.count_distinct("l_partkey").cast("long").alias("n_parts"),
        F.sum("dev_4dp").alias("sum_dev"),
        F.sum(F.when(F.col("dev_4dp") > 0, F.lit(1)).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_above"),
    )
    return per_sup.join(
        F.broadcast(sup.select("s_suppkey", "s_name")),
        F.col("l_suppkey") == F.col("s_suppkey"),
    ).select(
        F.col("s_name").alias("supplier"),
        "n_items",
        "n_parts",
        pround(F.col("sum_dev") / 10_000.0 / 100.0 / F.col("n_items"), 6)
        .alias("mean_premium"),
        pround(F.col("n_above") / F.col("n_items"), 6).alias(
            "above_market_share"
        ),
    )


QUERIES["supplier_price_premium"] = supplier_price_premium

ORACLE["supplier_price_premium"] = f"""
    WITH items AS (
        SELECT l_partkey, l_suppkey,
               CAST(floor(l_extendedprice / l_quantity * 100 + 0.5)
                    AS BIGINT) AS u
        FROM lineitem
    ),
    part_mean AS (
        SELECT l_partkey, sum(u)::BIGINT AS su, count(*)::BIGINT AS nu
        FROM items GROUP BY l_partkey
    ),
    dev AS (
        SELECT i.l_suppkey, i.l_partkey,
               CAST(floor((i.u::DOUBLE - p.su::DOUBLE / p.nu::DOUBLE)
                          * 10000 + 0.5) AS BIGINT) AS dev_4dp
        FROM items i JOIN part_mean p ON p.l_partkey = i.l_partkey
    ),
    per_sup AS (
        SELECT l_suppkey,
               count(*)::BIGINT AS n_items,
               count(DISTINCT l_partkey)::BIGINT AS n_parts,
               sum(dev_4dp)::BIGINT AS sum_dev,
               sum(CASE WHEN dev_4dp > 0 THEN 1 ELSE 0 END)::BIGINT
                   AS n_above
        FROM dev GROUP BY l_suppkey
    )
    SELECT s.s_name AS supplier,
           p.n_items,
           p.n_parts,
           {sql_round("p.sum_dev / 10000.0 / 100.0 / p.n_items", 6)}
               AS mean_premium,
           {sql_round("p.n_above * 1.0 / p.n_items", 6)}
               AS above_market_share
    FROM per_sup p JOIN supplier s ON s.s_suppkey = p.l_suppkey
"""


RETURN_DELAY_BANDS = ((0, 30, "0-30"), (31, 60, "31-60"),
                      (61, 90, "61-90"), (91, 10_000, "91+"))


def lineitem_return_delay_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Do late shipments come back? Line items banded by order-to-ship
    delay (0-30 / 31-60 / 61-90 / 91+ days), each band reporting item
    count, return rate (returnflag = 'R'), cent-exact revenue, and the
    revenue share lost to returns — the fulfilment-quality causal
    screen (a return rate climbing with delay says lateness drives
    returns; flat says returns are product-driven and expediting won't
    help).

    Determinism: integer day bands from exact date arithmetic; counts
    and cents are exact LONG folds; rates one division each (6 dp).
    Scale shape: one fact-fact equi-join on the order key (both sides
    data-bound — the shuffle join is correct), one bounded 4-band
    rollup. No windows."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    j = li.select(
        "l_orderkey", "l_shipdate", "l_returnflag", cents.alias("c")
    ).join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    delay = F.datediff(
        F.date_trunc("day", F.col("l_shipdate")),
        F.date_trunc("day", F.col("o_orderdate")),
    )
    band = F.lit(None).cast("string")
    for lo, hi, label in reversed(RETURN_DELAY_BANDS):
        band = F.when(
            (delay >= lo) & (delay <= hi), F.lit(label)
        ).otherwise(band)
    agg = j.select(
        band.alias("delay_band"),
        "l_returnflag",
        "c",
    ).groupBy("delay_band").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(
            F.when(F.col("l_returnflag") == "R", F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("n_returned"),
        F.sum("c").alias("rev_cents"),
        F.sum(
            F.when(F.col("l_returnflag") == "R", F.col("c")).otherwise(
                F.lit(0)
            )
        ).alias("ret_cents"),
    )
    return agg.select(
        "delay_band",
        "n_items",
        pround(F.col("n_returned") / F.col("n_items"), 6).alias(
            "return_rate"
        ),
        (F.col("rev_cents") / 100.0).alias("revenue"),
        pround(F.col("ret_cents") / F.col("rev_cents").cast("double"), 6)
        .alias("returned_revenue_share"),
    )


QUERIES["lineitem_return_delay_profile"] = lineitem_return_delay_profile


def _return_delay_oracle() -> str:
    band = "CASE " + " ".join(
        f"WHEN date_diff('day', date_trunc('day', o.o_orderdate), "
        f"date_trunc('day', l.l_shipdate)) BETWEEN {lo} AND {hi} "
        f"THEN '{label}'"
        for lo, hi, label in RETURN_DELAY_BANDS
    ) + " END"
    return f"""
        WITH banded AS (
            SELECT {band} AS delay_band,
                   l.l_returnflag,
                   CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                       AS c
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
        ),
        agg AS (
            SELECT delay_band,
                   count(*)::BIGINT AS n_items,
                   sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
                      )::BIGINT AS n_returned,
                   sum(c)::BIGINT AS rev_cents,
                   sum(CASE WHEN l_returnflag = 'R' THEN c ELSE 0 END
                      )::BIGINT AS ret_cents
            FROM banded GROUP BY delay_band
        )
        SELECT delay_band,
               n_items,
               {sql_round("n_returned * 1.0 / n_items", 6)} AS return_rate,
               rev_cents / 100.0 AS revenue,
               {sql_round("ret_cents * 1.0 / rev_cents", 6)}
                   AS returned_revenue_share
        FROM agg
    """


ORACLE["lineitem_return_delay_profile"] = _return_delay_oracle()


DISCOUNT_BANDS = ((0.0, 0.0, "none"), (0.01, 0.05, "1-5%"),
                  (0.06, 0.10, "6-10%"), (0.11, 1.0, ">10%"))


def discount_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does discounting buy volume? Line items banded by discount rate
    (none / 1-5% / 6-10% / >10%), each band reporting item count,
    cent-exact gross and discounted revenue, revenue share, the implied
    give-away (gross − discounted), and mean quantity per item — the
    pricing-policy table (mean quantity flat across bands says
    discounts transfer margin without moving volume).

    Determinism: discounts quantize to integer percent per row before
    banding (exact boundary tests — never float range checks on raw
    doubles); revenues are cent-exact LONG folds; the discounted cents
    fix per row as floor(extprice·(1−disc)·100+0.5). Scale shape: one
    projection + one bounded 4-band rollup; the share divisor is a
    1-row broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    pct = F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("int")
    gross = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    net = F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
        + F.lit(0.5)
    ).cast("long")
    band = F.lit(None).cast("string")
    for lo, hi, label in reversed(DISCOUNT_BANDS):
        band = F.when(
            (pct >= int(lo * 100)) & (pct <= int(hi * 100)), F.lit(label)
        ).otherwise(band)
    qty = F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")
    agg = li.select(
        band.alias("discount_band"),
        gross.alias("g"),
        net.alias("n"),
        qty.alias("q"),
    ).groupBy("discount_band").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("g").alias("gross_cents"),
        F.sum("n").alias("net_cents"),
        F.sum("q").alias("qty_centi"),
    )
    total = agg.agg(F.sum("net_cents").alias("t"))
    return agg.crossJoin(F.broadcast(total)).select(
        "discount_band",
        "n_items",
        (F.col("gross_cents") / 100.0).alias("gross_revenue"),
        (F.col("net_cents") / 100.0).alias("net_revenue"),
        pround(F.col("net_cents") / F.col("t").cast("double"), 6).alias(
            "net_revenue_share"
        ),
        ((F.col("gross_cents") - F.col("net_cents")) / 100.0).alias(
            "discount_given"
        ),
        pround(F.col("qty_centi") / 100.0 / F.col("n_items"), 4).alias(
            "mean_quantity"
        ),
    )


QUERIES["discount_band_revenue"] = discount_band_revenue


def _discount_band_oracle() -> str:
    band = "CASE " + " ".join(
        f"WHEN CAST(floor(l_discount * 100 + 0.5) AS INT)"
        f" BETWEEN {int(lo * 100)} AND {int(hi * 100)} THEN '{label}'"
        for lo, hi, label in DISCOUNT_BANDS
    ) + " END"
    return f"""
        WITH banded AS (
            SELECT {band} AS discount_band,
                   CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS g,
                   CAST(floor(l_extendedprice * (1.0 - l_discount) * 100
                              + 0.5) AS BIGINT) AS n,
                   CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS q
            FROM lineitem
        ),
        agg AS (
            SELECT discount_band,
                   count(*)::BIGINT AS n_items,
                   sum(g)::BIGINT AS gross_cents,
                   sum(n)::BIGINT AS net_cents,
                   sum(q)::BIGINT AS qty_centi
            FROM banded GROUP BY discount_band
        )
        SELECT discount_band,
               n_items,
               gross_cents / 100.0 AS gross_revenue,
               net_cents / 100.0 AS net_revenue,
               {sql_round(
                   "net_cents * 1.0 / (SELECT sum(net_cents) FROM agg)", 6
               )} AS net_revenue_share,
               (gross_cents - net_cents) / 100.0 AS discount_given,
               {sql_round("qty_centi / 100.0 / n_items", 4)}
                   AS mean_quantity
        FROM agg
    """


ORACLE["discount_band_revenue"] = _discount_band_oracle()


def orders_priority_value_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does order priority predict order value? One-way variance
    decomposition: R² = SS_between(priority) / SS_total over order
    totals, one row per priority carrying its count, cent-exact mean,
    deviation from the grand mean, and the shared R² — near-zero says
    priority is operational routing, not a value signal (so value-
    weighted SLAs need another key); large says expedite-handling
    capacity should follow the money.

    Determinism: the MEANS fix to cents (exact LONG folds); the
    QUADRATIC sums quantize per row to whole dollars first — order
    totals run to ~1e7 cents, so Σ(cents²) overflows LONG at gate
    scale already, while Σ(dollars²) keeps four orders of magnitude of
    headroom (R² is a ratio of variances, insensitive to the unit;
    the quantization is identical in both engines). Per-group
    S_g²/n_g terms quantize to centi-units before the LONG sum (the
    events_hourly_seasonality_strength discipline); one fixed double
    expression closes R² (6 dp). Scale shape: one bounded-domain
    groupBy + a 1-row broadcast — no joins, no windows."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    dollars = F.floor(F.col("o_totalprice") + F.lit(0.5)).cast("long")
    per = orders.select(
        "o_orderpriority", cents.alias("c"), dollars.alias("d")
    ).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("c").alias("s_gc"),
        F.sum("d").alias("s_g"),
        F.sum(F.col("d") * F.col("d")).alias("q_g"),
    )
    term = F.floor(
        F.col("s_g").cast("double")
        * F.col("s_g").cast("double")
        / F.col("n_g").cast("double")
        * 100
        + F.lit(0.5)
    ).cast("long")
    tot = per.agg(
        F.sum("n_g").alias("n"),
        F.sum("s_gc").alias("sc"),
        F.sum("s_g").alias("s"),
        F.sum("q_g").alias("q"),
        F.sum(term).alias("a_centi"),
    )
    c = F.col("s").cast("double") * F.col("s").cast("double") / F.col(
        "n"
    ).cast("double")
    r2 = F.when(
        F.col("q").cast("double") - c > 0,
        (F.col("a_centi") / 100.0 - c) / (F.col("q").cast("double") - c),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        F.col("o_orderpriority").alias("priority"),
        F.col("n_g").alias("n_orders"),
        pround(F.col("s_gc") / 100.0 / F.col("n_g"), 4).alias("mean_value"),
        pround(
            F.col("s_gc") / 100.0 / F.col("n_g")
            - F.col("sc") / 100.0 / F.col("n"),
            4,
        ).alias("mean_vs_grand"),
        pround(r2, 6).alias("priority_r2"),
    )


QUERIES["orders_priority_value_anova"] = orders_priority_value_anova

ORACLE["orders_priority_value_anova"] = f"""
    WITH per AS (
        SELECT o_orderpriority,
               count(*)::BIGINT AS n_g,
               sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                  )::BIGINT AS s_gc,
               sum(CAST(floor(o_totalprice + 0.5) AS BIGINT)
                  )::BIGINT AS s_g,
               sum(CAST(floor(o_totalprice + 0.5) AS BIGINT)
                   * CAST(floor(o_totalprice + 0.5) AS BIGINT)
                  )::BIGINT AS q_g
        FROM orders GROUP BY o_orderpriority
    ),
    tot AS (
        SELECT sum(n_g)::BIGINT AS n,
               sum(s_gc)::BIGINT AS sc,
               sum(s_g)::BIGINT AS s,
               sum(q_g)::BIGINT AS q,
               sum(CAST(floor(s_g::DOUBLE * s_g::DOUBLE / n_g::DOUBLE
                              * 100 + 0.5) AS BIGINT))::BIGINT AS a_centi
        FROM per
    )
    SELECT p.o_orderpriority AS priority,
           p.n_g AS n_orders,
           {sql_round("p.s_gc / 100.0 / p.n_g", 4)} AS mean_value,
           {sql_round(
               "p.s_gc / 100.0 / p.n_g - t.sc / 100.0 / t.n", 4
           )} AS mean_vs_grand,
           {sql_round(
               "CASE WHEN t.q::DOUBLE - t.s::DOUBLE * t.s::DOUBLE"
               " / t.n::DOUBLE > 0"
               " THEN (t.a_centi / 100.0 - t.s::DOUBLE * t.s::DOUBLE"
               "       / t.n::DOUBLE)"
               "    / (t.q::DOUBLE - t.s::DOUBLE * t.s::DOUBLE"
               "       / t.n::DOUBLE) END", 6
           )} AS priority_r2
    FROM per p CROSS JOIN tot t
"""


def order_customer_view_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental join-view maintenance, gate-checked end-to-end: the
    denormalized orders ⋈ customer view maintained through the delta
    rule ΔV = ΔF ⋈ D ∪ F ⋈ ΔD (ops/join_view.py) instead of re-joined
    per batch — the O(batch + touched-keys) refresh a 100 TB enrichment
    view needs. The simulated history exercises every maintenance leg:

    1. first load + one fact batch (orders with o_orderkey mod 3 ∈
       {0, 1}) against a PARTIAL dim image (customers with c_custkey
       mod 5 ≠ 0) — orders referencing the missing customers park in
       the orphan ledger instead of dropping;
    2. one dim-upsert batch: the missing mod-5 customers INSERT
       (promoting their orphans into the view) and the mod-7 customers
       UPDATE in place (c_acctbal + 100, c_mktsegment ‖ '_V2') —
       already-landed view rows from step 1 must refresh to the new
       image without touching any unaffected row;
    3. the last fact batch (mod 3 = 2) against the final dim image.

    The oracle is the ONE-SHOT join of all orders against the final
    (mutated) customer image: maintenance must be indistinguishable
    from full recompute. Scale shape: fact batches join only the batch
    (dim side broadcast-sized); the dim delta touches only rows whose
    key changed via semi-join probes; the per-segment aggregate is one
    map-side-combined groupBy on a bounded domain."""
    from data_platform_spark.ops.join_view import (
        JoinViewState,
        apply_dim_upsert,
        apply_fact_batch,
        init_join_view,
    )

    def checkpointed(state: JoinViewState) -> JoinViewState:
        # each maintenance step references the prior state several times
        # (upsert anti-join + semi-join probes), so each step's ledgers
        # need a materialization boundary or the whole history re-derives
        # per branch. r17 (guide §1.2/§5, VERDICT r16 item 3): LAZY
        # localCheckpoint instead of scoped_persist — persist keeps the
        # full logical lineage, so Catalyst re-analyzed the ENTIRE
        # maintenance history at every subsequent step (~40% of this
        # query's wall clock was compose-time plan work, zero jobs);
        # the lazy checkpoint truncates the logical plan at each step,
        # so per-step analysis cost stays O(step). Under AQE the
        # checkpoint's toRdd does run each step's intermediate shuffle
        # stages at compose time — the step's real work, executed
        # exactly once instead of once per consuming branch; only the
        # final result stage waits for the first action (measured:
        # build+materialize 3.2 s → 2.4 s, materialize-phase jobs
        # 27 → 7). Blocks release when the run's DataFrames are GC'd —
        # nothing outlives the run that a later identical run could be
        # served from.
        return JoinViewState(
            view=state.view.localCheckpoint(eager=False),
            orphans=state.orphans.localCheckpoint(eager=False),
        )

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    dim_payload = ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]

    mutated_bal = F.col("c_acctbal") + F.when(
        F.pmod("c_custkey", F.lit(7)) == 0, F.lit(100.0)
    ).otherwise(F.lit(0.0))
    mutated_seg = F.when(
        F.pmod("c_custkey", F.lit(7)) == 0,
        F.concat(F.col("c_mktsegment"), F.lit("_V2")),
    ).otherwise(F.col("c_mktsegment"))

    dim0 = cust.filter(F.pmod("c_custkey", F.lit(5)) != 0)
    state = checkpointed(init_join_view(
        orders.filter(F.pmod("o_orderkey", F.lit(3)) == 0),
        dim0,
        "o_custkey",
        "c_custkey",
    ))
    state = apply_fact_batch(
        state,
        orders.filter(F.pmod("o_orderkey", F.lit(3)) == 1),
        dim0,
        "o_custkey",
        "c_custkey",
        "o_orderkey",
    )
    state = checkpointed(state)
    upserts = cust.filter(
        (F.pmod("c_custkey", F.lit(5)) == 0) | (F.pmod("c_custkey", F.lit(7)) == 0)
    ).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        mutated_bal.alias("c_acctbal"),
        mutated_seg.alias("c_mktsegment"),
    )
    state = checkpointed(apply_dim_upsert(
        state, upserts, "o_custkey", "c_custkey", "o_orderkey", dim_payload
    ))
    dim1 = cust.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        mutated_bal.alias("c_acctbal"),
        mutated_seg.alias("c_mktsegment"),
    )
    state = apply_fact_batch(
        state,
        orders.filter(F.pmod("o_orderkey", F.lit(3)) == 2),
        dim1,
        "o_custkey",
        "c_custkey",
        "o_orderkey",
    )
    return state.view.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        pround(F.sum("o_totalprice")).alias("total_price"),
        pround(F.sum("c_acctbal")).alias("acctbal_sum"),
        F.count_distinct("o_custkey").cast("long").alias("n_customers"),
    )


QUERIES["order_customer_view_incremental"] = order_customer_view_incremental

ORACLE["order_customer_view_incremental"] = f"""
    WITH dim AS (
        SELECT c_custkey,
               c_acctbal + CASE WHEN c_custkey % 7 = 0
                                THEN 100 ELSE 0 END AS c_acctbal,
               CASE WHEN c_custkey % 7 = 0
                    THEN c_mktsegment || '_V2'
                    ELSE c_mktsegment END AS c_mktsegment
        FROM customer
    )
    SELECT d.c_mktsegment,
           count(*)::BIGINT AS n_orders,
           {sql_round("sum(o.o_totalprice)")} AS total_price,
           {sql_round("sum(d.c_acctbal)")} AS acctbal_sum,
           count(DISTINCT o.o_custkey)::BIGINT AS n_customers
    FROM orders o JOIN dim d ON d.c_custkey = o.o_custkey
    GROUP BY 1
"""


def orders_customer_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time SCD2 enrichment: every order joins the dimension
    VERSION that was valid on its order date — the temporal join a
    warehouse fact load runs against an SCD2 dimension (the J2/P9
    family generalized from is_current to as-of-date), and the lookup
    the reference's SK-resolution join approximates with is_current
    (dags/dwh_fact_charer_location.py:107-112 — correct only for
    current-dated facts; this query is the correct form for backfills
    and late-arriving facts).

    The versioned dimension is derived deterministically so the oracle
    can rebuild it: version 1 is the raw customer row valid
    [-inf, cutoff), version 2 applies the standard mod-7 mutation
    (c_acctbal + 100, c_mktsegment ‖ '_V2') valid [cutoff, +inf), with
    cutoff = min(o_orderdate) + 800 days (a 1-row broadcast, the q15
    scalar pattern — mid-history, so both versions receive orders).
    Unchanged (non-mod-7) customers carry one logical image in both
    versions; orders on either side of the cutoff must resolve
    identically for them.

    Scale shape: the version table is 2× dimension-sized — still a
    broadcast; the join is an EQUI-join on the customer key with the
    validity range as a residual predicate (BroadcastHashJoin + filter,
    never a range-only BNLJ); the per-segment rollup is one map-side-
    combined groupBy on a bounded domain."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    cutoff = orders.agg(
        (F.min("o_orderdate") + F.expr("INTERVAL 800 DAYS")).alias("__cutoff")
    )
    lo = F.to_timestamp(F.lit("1000-01-01"))
    hi = F.to_timestamp(F.lit("5000-01-01"))
    mutated_bal = F.col("c_acctbal") + F.when(
        F.pmod("c_custkey", F.lit(7)) == 0, F.lit(100.0)
    ).otherwise(F.lit(0.0))
    mutated_seg = F.when(
        F.pmod("c_custkey", F.lit(7)) == 0,
        F.concat(F.col("c_mktsegment"), F.lit("_V2")),
    ).otherwise(F.col("c_mktsegment"))

    v1 = cust.crossJoin(F.broadcast(cutoff)).select(
        "c_custkey",
        F.col("c_acctbal").alias("bal"),
        F.col("c_mktsegment").alias("segment"),
        lo.alias("valid_from"),
        F.col("__cutoff").alias("valid_to"),
    )
    v2 = cust.crossJoin(F.broadcast(cutoff)).select(
        "c_custkey",
        mutated_bal.alias("bal"),
        mutated_seg.alias("segment"),
        F.col("__cutoff").alias("valid_from"),
        hi.alias("valid_to"),
    )
    dim = v1.unionByName(v2)
    joined = orders.join(
        F.broadcast(dim),
        (orders["o_custkey"] == dim["c_custkey"])
        & (orders["o_orderdate"] >= dim["valid_from"])
        & (orders["o_orderdate"] < dim["valid_to"]),
        "inner",
    )
    return joined.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        pround(F.sum("o_totalprice")).alias("total_price"),
        pround(F.sum("bal")).alias("bal_sum"),
    )


QUERIES["orders_customer_point_in_time"] = orders_customer_point_in_time

ORACLE["orders_customer_point_in_time"] = f"""
    WITH cut AS (
        SELECT min(o_orderdate) + INTERVAL 800 DAY AS c FROM orders
    ),
    enriched AS (
        SELECT
            CASE WHEN o.o_orderdate >= cut.c AND c_custkey % 7 = 0
                 THEN d.c_mktsegment || '_V2'
                 ELSE d.c_mktsegment END AS segment,
            CASE WHEN o.o_orderdate >= cut.c AND c_custkey % 7 = 0
                 THEN d.c_acctbal + 100 ELSE d.c_acctbal END AS bal,
            o.o_totalprice
        FROM orders o
        JOIN customer d ON d.c_custkey = o.o_custkey
        CROSS JOIN cut
    )
    SELECT segment,
           count(*)::BIGINT AS n_orders,
           {sql_round("sum(o_totalprice)")} AS total_price,
           {sql_round("sum(bal)")} AS bal_sum
    FROM enriched
    GROUP BY segment
"""


def order_customer_scd2_view_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SCD2-versioned incremental join-view maintenance, gate-checked
    end-to-end (ops/scd2_join_view.py): the denormalized orders ⋈
    customer view where the dimension is VERSIONED and every order
    resolves against the version valid on its order date — the
    maintained form of ``orders_customer_point_in_time`` and the correct
    incremental SK-resolution join for backfills/late facts (the
    reference's is_current join, dags/dwh_fact_charer_location.py:107-112,
    is the current-dated special case). The simulated history exercises
    every temporal maintenance leg:

    1. first load + one fact batch (o_orderkey mod 3 ∈ {0, 1}) against
       the PRE-batch version table: one open version per key, raw
       image, mod-5 customers ABSENT (their orders park as orphans);
    2. one SCD2 dim batch at cutoff 1998-01-01: mod-7 keys close v1 and
       open a mutated v2 (c_acctbal + 100, c_mktsegment ‖ '_V2'),
       mod-11 keys (not mod-7) are SOFT-CLOSED with no successor (their
       post-cutoff facts demote to orphans), mod-5 keys insert
       BACKDATED (valid_from below the cutoff — their parked orphans
       promote at the version covering each order date). Only
       future-dated view rows of touched keys are re-resolved; facts on
       closed versions are never read;
    3. the last fact batch (mod 3 = 2) against the final version table —
       its pre-cutoff orders of mod-7 customers resolve to the CLOSED
       v1 image (the late-arriving-fact case is_current gets wrong).

    The oracle CASE-rebuilds the as-of resolution of ALL orders against
    the final version table: maintenance must be indistinguishable from
    the one-shot temporal join, orphans included (the ``__ORPHANED``
    rows). ``n_v2`` pins the view's ``valid_from`` column — the count of
    rows resolved to the reopened version.

    Scale shape: fact batches as-of join only the batch (version table
    broadcast — equi-join on the key, validity range as a residual
    predicate, never a range BNLJ); the dim delta touches only
    future-dated rows of touched keys via semi-join probes — strictly
    fewer rows than the SCD1 dim delta; the final rollup is one
    map-side-combined groupBy on a bounded domain."""
    import datetime

    from data_platform_spark.ops.scd2_join_view import (
        apply_fact_batch_scd2,
        apply_scd2_dim_batch,
        init_scd2_join_view,
    )

    def checkpointed(state):
        # lazy localCheckpoint boundaries, not persists — truncates the
        # logical plan per maintenance step so Catalyst stops re-analyzing
        # the whole 4-step history at every subsequent step (r17, guide
        # §1.2/§5; this query's profile was ~2–3 s of pure driver-side
        # analysis, zero jobs; measured build+materialize 4.5 s → 3.8 s,
        # materialize-phase jobs 42 → 9 — under AQE each step's shuffle
        # stages run at compose, once, and only the final stage waits
        # for the first action). See order_customer_view_incremental.
        from data_platform_spark.ops.join_view import JoinViewState

        return JoinViewState(
            view=state.view.localCheckpoint(eager=False),
            orphans=state.orphans.localCheckpoint(eager=False),
        )

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    payload = ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    lo = F.to_timestamp(F.lit("1000-01-01"))
    hi = F.to_timestamp(F.lit("5000-01-01"))
    cut_lit = "1998-01-01"
    cut = F.to_timestamp(F.lit(cut_lit))
    is7 = F.pmod("c_custkey", F.lit(7)) == 0
    is11 = F.pmod("c_custkey", F.lit(11)) == 0

    # pre-batch version table: one open raw version per key, mod-5 absent
    v0 = cust.filter(F.pmod("c_custkey", F.lit(5)) != 0).select(
        "c_custkey", *payload, lo.alias("valid_from"), hi.alias("valid_to")
    )
    # post-batch version table: mod-7 close+reopen mutated, mod-11 (not
    # mod-7) soft-close, mod-5 insert backdated, everyone else untouched
    v1a = cust.select(
        "c_custkey",
        *payload,
        lo.alias("valid_from"),
        F.when(is7 | is11, cut).otherwise(hi).alias("valid_to"),
    )
    v1b = cust.filter(is7).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        (F.col("c_acctbal") + F.lit(100.0)).alias("c_acctbal"),
        F.concat(F.col("c_mktsegment"), F.lit("_V2")).alias("c_mktsegment"),
        cut.alias("valid_from"),
        hi.alias("valid_to"),
    )
    v1 = v1a.unionByName(v1b)
    touched = cust.filter(
        (F.pmod("c_custkey", F.lit(5)) == 0) | is7 | is11
    ).select("c_custkey")

    state = checkpointed(init_scd2_join_view(
        orders.filter(F.pmod("o_orderkey", F.lit(3)) == 0),
        v0, "o_custkey", "c_custkey", "o_orderdate",
    ))
    state = checkpointed(apply_fact_batch_scd2(
        state,
        orders.filter(F.pmod("o_orderkey", F.lit(3)) == 1),
        v0, "o_custkey", "c_custkey", "o_orderkey", "o_orderdate",
    ))
    state = checkpointed(apply_scd2_dim_batch(
        state, v1, touched, datetime.datetime(1998, 1, 1),
        "o_custkey", "c_custkey", "o_orderkey", "o_orderdate", payload,
    ))
    state = apply_fact_batch_scd2(
        state,
        orders.filter(F.pmod("o_orderkey", F.lit(3)) == 2),
        v1, "o_custkey", "c_custkey", "o_orderkey", "o_orderdate",
    )

    era = F.col("o_orderdate") >= cut
    view_agg = state.view.groupBy(
        F.col("c_mktsegment").alias("segment"),
        era.alias("post_cutoff"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        pround(F.sum("o_totalprice")).alias("total_price"),
        pround(F.sum("c_acctbal")).alias("bal_sum"),
        F.count_distinct("o_custkey").cast("long").alias("n_customers"),
        F.sum(F.when(F.col("valid_from") == cut, 1).otherwise(0))
        .cast("long")
        .alias("n_v2"),
    )
    orph_agg = state.orphans.groupBy(era.alias("post_cutoff")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        pround(F.sum("o_totalprice")).alias("total_price"),
        F.count_distinct("o_custkey").cast("long").alias("n_customers"),
    ).select(
        F.lit("__ORPHANED").alias("segment"),
        "post_cutoff",
        "n_orders",
        "total_price",
        F.lit(None).cast("double").alias("bal_sum"),
        "n_customers",
        F.lit(0).cast("long").alias("n_v2"),
    )
    return view_agg.unionByName(orph_agg)


QUERIES["order_customer_scd2_view_incremental"] = (
    order_customer_scd2_view_incremental
)

ORACLE["order_customer_scd2_view_incremental"] = f"""
    WITH enriched AS (
        SELECT
            o.o_custkey,
            o.o_totalprice,
            o.o_orderdate >= TIMESTAMP '1998-01-01' AS post_cutoff,
            CASE WHEN o.o_orderdate >= TIMESTAMP '1998-01-01'
                      AND c.c_custkey % 11 = 0 AND c.c_custkey % 7 <> 0
                 THEN NULL
                 WHEN o.o_orderdate >= TIMESTAMP '1998-01-01'
                      AND c.c_custkey % 7 = 0
                 THEN c.c_mktsegment || '_V2'
                 ELSE c.c_mktsegment END AS segment,
            CASE WHEN o.o_orderdate >= TIMESTAMP '1998-01-01'
                      AND c.c_custkey % 11 = 0 AND c.c_custkey % 7 <> 0
                 THEN NULL
                 WHEN o.o_orderdate >= TIMESTAMP '1998-01-01'
                      AND c.c_custkey % 7 = 0
                 THEN c.c_acctbal + 100
                 ELSE c.c_acctbal END AS bal,
            CASE WHEN o.o_orderdate >= TIMESTAMP '1998-01-01'
                      AND c.c_custkey % 7 = 0
                 THEN 1 ELSE 0 END AS to_v2
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
    )
    SELECT coalesce(segment, '__ORPHANED') AS segment,
           post_cutoff,
           count(*)::BIGINT AS n_orders,
           {sql_round("sum(o_totalprice)")} AS total_price,
           {sql_round("sum(bal)")} AS bal_sum,
           count(DISTINCT o_custkey)::BIGINT AS n_customers,
           sum(CASE WHEN segment IS NULL THEN 0 ELSE to_v2 END)::BIGINT AS n_v2
    FROM enriched
    GROUP BY 1, 2
"""


def order_customer_view_persisted_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The PERSISTED join-view surface under the CORRECTNESS GATE: the
    same simulated history as ``order_customer_view_incremental`` —
    partial-dim first load, two fact batches, one dim insert+update
    batch, a final fact batch — driven through the Warehouse-backed legs
    (ops/join_view.incremental_join_view /
    join_view_dim_upsert_persisted: partition-pruned journaled merges,
    inserts-before-deletes crash ordering, namespaced replay markers)
    into a temp warehouse, then COMPACTED (compact_join_view — one file
    per partition through the journaled swap) and read back. Identical
    history and final aggregate make the result bit-identical to the
    in-memory gate query, so its oracle is REUSED verbatim: the driver
    verifies the stored maintenance + compaction end-to-end (the
    semantic_index_roundtrip discipline applied to the join-view
    family)."""
    from data_platform_spark.queries._util import scratch_dir

    from data_platform_spark.ops.join_view import (
        compact_join_view,
        incremental_join_view,
        join_view_dim_upsert_persisted,
    )
    from data_platform_spark.pipeline import Warehouse

    base = scratch_dir("dps_jv_rt_")
    wh = Warehouse(base + "/wh")
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    cust = load_table(spark, sf_dir, "customer")
    kw = dict(
        fact_on="o_custkey",
        dim_on="c_custkey",
        fact_key="o_orderkey",
        dim_payload=["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
        partition_col="o_month",
    )
    mutated_bal = F.col("c_acctbal") + F.when(
        F.pmod("c_custkey", F.lit(7)) == 0, F.lit(100.0)
    ).otherwise(F.lit(0.0))
    mutated_seg = F.when(
        F.pmod("c_custkey", F.lit(7)) == 0,
        F.concat(F.col("c_mktsegment"), F.lit("_V2")),
    ).otherwise(F.col("c_mktsegment"))
    dim0 = cust.filter(F.pmod("c_custkey", F.lit(5)) != 0)
    dim1 = cust.select(
        "c_custkey", "c_name", "c_nationkey",
        mutated_bal.alias("c_acctbal"), mutated_seg.alias("c_mktsegment"),
    )
    upserts = dim1.filter(
        (F.pmod("c_custkey", F.lit(5)) == 0)
        | (F.pmod("c_custkey", F.lit(7)) == 0)
    )
    for i, dim in ((0, dim0), (1, dim0)):
        incremental_join_view(
            spark, wh, "dwh", "oc",
            orders.filter(F.pmod("o_orderkey", F.lit(3)) == i),
            dim, batch_id=f"b{i}", **kw,
        )
    join_view_dim_upsert_persisted(
        spark, wh, "dwh", "oc", upserts, batch_id="d0", **kw
    )
    incremental_join_view(
        spark, wh, "dwh", "oc",
        orders.filter(F.pmod("o_orderkey", F.lit(3)) == 2),
        dim1, batch_id="b2", **kw,
    )
    compact_join_view(spark, wh, "dwh", "oc", "o_month")
    view = wh.read(spark, "dwh", "oc")
    return view.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        pround(F.sum("o_totalprice")).alias("total_price"),
        pround(F.sum("c_acctbal")).alias("acctbal_sum"),
        F.count_distinct("o_custkey").cast("long").alias("n_customers"),
    )


QUERIES["order_customer_view_persisted_roundtrip"] = (
    order_customer_view_persisted_roundtrip
)
# bit-identical to the in-memory maintained history: oracle reused verbatim
ORACLE["order_customer_view_persisted_roundtrip"] = ORACLE[
    "order_customer_view_incremental"
]


def order_customer_scd2_view_persisted_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The persisted SCD2 join-view surface under the gate: the same
    temporal history as ``order_customer_scd2_view_incremental`` driven
    through ops/scd2_join_view's Warehouse-backed legs (as-of fact
    merges, the future-dated-only dim re-resolution, demotions and
    backdated promotions across the stored ledgers), compacted, and read
    back — result bit-identical to the in-memory gate query, oracle
    reused verbatim. Driver-verifies the stored temporal maintenance +
    compaction end-to-end."""
    import datetime
    from data_platform_spark.queries._util import scratch_dir

    from data_platform_spark.ops.join_view import compact_join_view
    from data_platform_spark.ops.scd2_join_view import (
        incremental_scd2_join_view,
        scd2_join_view_dim_persisted,
    )
    from data_platform_spark.pipeline import Warehouse

    base = scratch_dir("dps_jv2_rt_")
    wh = Warehouse(base + "/wh")
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    cust = load_table(spark, sf_dir, "customer")
    payload = ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    lo = F.to_timestamp(F.lit("1000-01-01"))
    hi = F.to_timestamp(F.lit("5000-01-01"))
    cut = F.to_timestamp(F.lit("1998-01-01"))
    is7 = F.pmod("c_custkey", F.lit(7)) == 0
    is11 = F.pmod("c_custkey", F.lit(11)) == 0
    v0 = cust.filter(F.pmod("c_custkey", F.lit(5)) != 0).select(
        "c_custkey", *payload, lo.alias("valid_from"), hi.alias("valid_to")
    )
    v1a = cust.select(
        "c_custkey", *payload, lo.alias("valid_from"),
        F.when(is7 | is11, cut).otherwise(hi).alias("valid_to"),
    )
    v1b = cust.filter(is7).select(
        "c_custkey", "c_name", "c_nationkey",
        (F.col("c_acctbal") + F.lit(100.0)).alias("c_acctbal"),
        F.concat(F.col("c_mktsegment"), F.lit("_V2")).alias("c_mktsegment"),
        cut.alias("valid_from"), hi.alias("valid_to"),
    )
    v1 = v1a.unionByName(v1b)
    touched = cust.filter(
        (F.pmod("c_custkey", F.lit(5)) == 0) | is7 | is11
    ).select("c_custkey")
    kw = dict(
        fact_on="o_custkey",
        dim_on="c_custkey",
        fact_key="o_orderkey",
        event_col="o_orderdate",
        dim_payload=payload,
        partition_col="o_month",
    )
    for i, dimv in ((0, v0), (1, v0)):
        incremental_scd2_join_view(
            spark, wh, "dwh", "oc2",
            orders.filter(F.pmod("o_orderkey", F.lit(3)) == i),
            dimv, batch_id=f"b{i}", **kw,
        )
    scd2_join_view_dim_persisted(
        spark, wh, "dwh", "oc2", v1, touched,
        datetime.datetime(1998, 1, 1), batch_id="d0", **kw,
    )
    incremental_scd2_join_view(
        spark, wh, "dwh", "oc2",
        orders.filter(F.pmod("o_orderkey", F.lit(3)) == 2),
        v1, batch_id="b2", **kw,
    )
    compact_join_view(spark, wh, "dwh", "oc2", "o_month")
    view = wh.read(spark, "dwh", "oc2")
    orphans = wh.read(spark, "dwh", "oc2__orphans")

    era = F.col("o_orderdate") >= cut
    view_agg = view.groupBy(
        F.col("c_mktsegment").alias("segment"),
        era.alias("post_cutoff"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        pround(F.sum("o_totalprice")).alias("total_price"),
        pround(F.sum("c_acctbal")).alias("bal_sum"),
        F.count_distinct("o_custkey").cast("long").alias("n_customers"),
        F.sum(F.when(F.col("valid_from") == cut, 1).otherwise(0))
        .cast("long")
        .alias("n_v2"),
    )
    orph_agg = orphans.groupBy(era.alias("post_cutoff")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        pround(F.sum("o_totalprice")).alias("total_price"),
        F.count_distinct("o_custkey").cast("long").alias("n_customers"),
    ).select(
        F.lit("__ORPHANED").alias("segment"),
        "post_cutoff",
        "n_orders",
        "total_price",
        F.lit(None).cast("double").alias("bal_sum"),
        "n_customers",
        F.lit(0).cast("long").alias("n_v2"),
    )
    return view_agg.unionByName(orph_agg)


QUERIES["order_customer_scd2_view_persisted_roundtrip"] = (
    order_customer_scd2_view_persisted_roundtrip
)
# bit-identical to the in-memory maintained history: oracle reused verbatim
ORACLE["order_customer_scd2_view_persisted_roundtrip"] = ORACLE[
    "order_customer_scd2_view_incremental"
]


def warehouse_time_travel_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Snapshot retention + time travel under the CORRECTNESS GATE (the
    O2 transactional-storage family, driver-unreachable until now): a
    per-status revenue rollup is written to a temp warehouse with
    ``retain_versions=2``, then OVERWRITTEN twice with deliberately
    perturbed images (revenue zeroed, then counts zeroed). The query
    reads snapshot v1 back via ``Warehouse.read_version`` — the
    PRE-overwrite image — and returns it alongside the current corrupted
    image's row count, proving the atomic-swap retention keeps bit-exact
    history while the live table moved on (the training-data rollback
    path: a bad pipeline run is recoverable by snapshot, SURVEY §2 O2).
    Oracle = the v1 rollup recomputed from source, with the live-table
    drift columns CASE-rebuilt."""
    from data_platform_spark.queries._util import scratch_dir

    from data_platform_spark.pipeline import Warehouse

    base = scratch_dir("dps_tt_rt_")
    wh = Warehouse(base + "/wh", retain_versions=2)
    orders = load_table(spark, sf_dir, "orders")
    rollup = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        pround(F.sum("o_totalprice")).alias("revenue"),
    )
    wh.write(rollup, "mart", "status_rollup")
    wh.write(
        rollup.withColumn("revenue", F.lit(0.0)), "mart", "status_rollup"
    )
    wh.write(
        rollup.withColumn("n_orders", F.lit(0).cast("long")),
        "mart",
        "status_rollup",
    )
    v1 = wh.read_version(spark, "mart", "status_rollup", 1)
    live = wh.read(spark, "mart", "status_rollup")
    live_drift = live.agg(
        F.sum("n_orders").cast("long").alias("live_n_orders_sum"),
        pround(F.sum("revenue")).alias("live_revenue_sum"),
    )
    return v1.crossJoin(F.broadcast(live_drift))


QUERIES["warehouse_time_travel_roundtrip"] = warehouse_time_travel_roundtrip

ORACLE["warehouse_time_travel_roundtrip"] = f"""
    WITH v1 AS (
        SELECT o_orderstatus,
               count(*)::BIGINT AS n_orders,
               {sql_round("sum(o_totalprice)")} AS revenue
        FROM orders
        GROUP BY 1
    )
    SELECT v1.*,
           0::BIGINT AS live_n_orders_sum,
           {sql_round("(SELECT sum(revenue) FROM v1)")} AS live_revenue_sum
    FROM v1
"""


def merge_schema_evolution_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Schema evolution on MERGE under the gate (the O6 family,
    driver-unreachable until now): a per-month order rollup lands in a
    temp warehouse, then a batch carrying a NEW column (priority_flag,
    present only for 1998+ months) merges with ``allow_new_columns`` —
    the Delta mergeSchema analog. Old partitions' rows must read back
    NULL-filled, merged rows carry the flag, untouched-month rows keep
    their original measures. Oracle = the widened table CASE-rebuilt
    from source."""
    from data_platform_spark.queries._util import scratch_dir

    from data_platform_spark.pipeline import Warehouse

    base = scratch_dir("dps_evo_rt_")
    wh = Warehouse(base + "/wh")
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    rollup = orders.groupBy("o_month").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        pround(F.sum("o_totalprice")).alias("revenue"),
    )
    wh.write(rollup, "mart", "monthly", partition_by=["o_month"])
    widened = (
        orders.filter(F.col("o_month") >= "1998")
        .groupBy("o_month")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            pround(F.sum("o_totalprice")).alias("revenue"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            )
            .cast("long")
            .alias("n_urgent"),
        )
    )
    wh.merge(
        spark,
        "mart",
        "monthly",
        widened,
        keys=["o_month"],
        partition_col="o_month",
        allow_new_columns=True,
    )
    return wh.read(spark, "mart", "monthly").select(
        "o_month", "n_orders", "revenue", "n_urgent"
    )


QUERIES["merge_schema_evolution_roundtrip"] = merge_schema_evolution_roundtrip

ORACLE["merge_schema_evolution_roundtrip"] = f"""
    SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
           count(*)::BIGINT AS n_orders,
           {sql_round("sum(o_totalprice)")} AS revenue,
           CASE WHEN strftime(o_orderdate, '%Y-%m') >= '1998'
                THEN sum(CASE WHEN o_orderpriority = '1-URGENT'
                              THEN 1 ELSE 0 END)::BIGINT
                ELSE NULL END AS n_urgent
    FROM orders
    GROUP BY 1
"""


def pipeline_manifest_publish_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-table ATOMIC publish under the CORRECTNESS GATE (VERDICT r14
    item 2 — the warehouse-manifest catalog, ops/manifest.py): dims and
    facts commit through a table→version manifest flipped by ONE atomic
    rename, so a crash between table publishes can never expose new-dim +
    old-fact (the torn snapshot run_pipeline's per-table swaps allowed,
    and the reference's implicit cross-DAG ordering never solved —
    SURVEY §3.3). The query drives the full lifecycle into a temp
    warehouse: tx1 publishes (dim v1 = full customer image, fact v1 =
    orders with o_orderkey%3 < 2); tx2 — dim v2 (accounts %7==0 get
    +100 balance and a _V2 segment) plus the FULL fact image — is
    CRASHED after staging the dim, before the commit. A reader pinned at
    the committed manifest then aggregates the dim⋈fact join: it must
    see tx1's CONSISTENT pair (phase ``pre_crash`` — old dim AND old
    fact, never the staged dim). ``recover()`` sweeps the uncommitted
    version dir, the publish replays to completion, and the same reader
    at the new manifest sees tx2's pair (phase ``replayed``). Oracle =
    both phases' aggregates CASE-rebuilt from source."""
    from data_platform_spark.ops.manifest import ManifestCatalog
    from data_platform_spark.pipeline import Warehouse
    from data_platform_spark.queries._util import scratch_dir

    base = scratch_dir("dps_man_rt_")
    cat = ManifestCatalog(Warehouse(base + "/wh"))
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    fact_v1 = orders.filter(F.pmod("o_orderkey", F.lit(3)) < 2)
    dim_v2 = cust.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        (
            F.col("c_acctbal")
            + F.when(F.pmod("c_custkey", F.lit(7)) == 0, F.lit(100.0))
            .otherwise(F.lit(0.0))
        ).alias("c_acctbal"),
        F.when(
            F.pmod("c_custkey", F.lit(7)) == 0,
            F.concat(F.col("c_mktsegment"), F.lit("_V2")),
        )
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    cat.publish({("dwh", "dim"): cust, ("dwh", "fact"): fact_v1})
    try:
        cat.publish(
            {("dwh", "dim"): dim_v2, ("dwh", "fact"): orders},
            crash_after=1,  # dim staged, fact NOT, manifest NOT flipped
        )
    except RuntimeError:
        pass

    def _phase(m: dict, name: str) -> DataFrame:
        dim = cat.read(spark, "dwh", "dim", m)
        fact = cat.read(spark, "dwh", "fact", m)
        return (
            fact.join(
                dim, fact["o_custkey"] == dim["c_custkey"], "inner"
            )
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_orders"),
                pround(F.sum("o_totalprice")).alias("total_price"),
                pround(F.sum("c_acctbal")).alias("acctbal_sum"),
            )
            .withColumn("phase", F.lit(name))
        )

    pre_crash = _phase(cat.load(), "pre_crash")
    cat.recover()
    cat.publish({("dwh", "dim"): dim_v2, ("dwh", "fact"): orders})
    replayed = _phase(cat.load(), "replayed")
    return pre_crash.unionByName(replayed)


QUERIES["pipeline_manifest_publish_roundtrip"] = (
    pipeline_manifest_publish_roundtrip
)

ORACLE["pipeline_manifest_publish_roundtrip"] = f"""
    WITH dim_v2 AS (
        SELECT c_custkey,
               c_acctbal + CASE WHEN c_custkey % 7 = 0
                                THEN 100.0 ELSE 0.0 END AS c_acctbal,
               CASE WHEN c_custkey % 7 = 0
                    THEN c_mktsegment || '_V2'
                    ELSE c_mktsegment END AS c_mktsegment
        FROM customer
    ),
    pre_crash AS (
        SELECT c.c_mktsegment,
               count(*)::BIGINT AS n_orders,
               {sql_round("sum(o.o_totalprice)")} AS total_price,
               {sql_round("sum(c.c_acctbal)")} AS acctbal_sum,
               'pre_crash' AS phase
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderkey % 3 < 2
        GROUP BY 1
    ),
    replayed AS (
        SELECT c.c_mktsegment,
               count(*)::BIGINT AS n_orders,
               {sql_round("sum(o.o_totalprice)")} AS total_price,
               {sql_round("sum(c.c_acctbal)")} AS acctbal_sum,
               'replayed' AS phase
        FROM orders o JOIN dim_v2 c ON o.o_custkey = c.c_custkey
        GROUP BY 1
    )
    SELECT * FROM pre_crash UNION ALL SELECT * FROM replayed
"""
