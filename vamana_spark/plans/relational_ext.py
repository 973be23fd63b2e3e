"""Extended relational surface — breadth queries over the star schema
(rollup/cube, set ops, semi/anti joins, string/date functions, pivot,
window functions, JSON extraction). All DuckDB-oracle-able; registered
into the same declared-query gate as plans.declared.

These go beyond the reference surface (which has no SQL at all) to make
the engine a complete relational layer for pipeline work — SURVEY.md §2b
X8's "the DataFrame layer the pipeline sits on".
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from vamana_spark.operators import relational
from vamana_spark.plans.declared import _events, declare
from vamana_spark.sources import load_table


@declare(
    "q_rollup_revenue",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS total,
           CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
    FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
)
def q_rollup_revenue(spark, sf_dir):
    """ROLLUP hierarchy totals (subtotal + grand-total rows)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double"), 2
            ).alias("total"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


@declare(
    "q_cube_counts",
    """
    SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def q_cube_counts(spark, sf_dir):
    """CUBE over two dimensions (all 2^2 grouping sets)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").cast("long").alias("n")
    )


@declare(
    "q_anti_join",
    """
    WITH cust AS (
      SELECT c_custkey FROM customer
      UNION ALL
      SELECT * FROM (VALUES (9000001), (9000002), (9000003)) v(c_custkey)
    )
    SELECT c_custkey FROM cust
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_anti_join(spark, sf_dir):
    """Customers with no orders — left_anti join (NOT EXISTS). Every
    sf0.01 customer has orders, so three order-less customers are
    planted in-query (the q_gopher_filter de-vacuation pattern) — the
    anti-join must emit exactly them, not 0-rows-vs-0-rows."""
    t = relational.load_tables(spark, sf_dir, "customer", "orders")
    planted = spark.createDataFrame(
        [(9000001,), (9000002,), (9000003,)], "c_custkey long"
    )
    cust = t["customer"].select("c_custkey").unionByName(planted)
    return cust.join(
        t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey")


@declare(
    "q_semi_join",
    """
    SELECT s_suppkey, s_name FROM supplier
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_suppkey = s_suppkey AND l_quantity > 45
    )
    """,
)
def q_semi_join(spark, sf_dir):
    """Suppliers with any high-quantity lineitem — left_semi (EXISTS)."""
    t = relational.load_tables(spark, sf_dir, "supplier", "lineitem")
    big = t["lineitem"].where(F.col("l_quantity") > 45)
    return t["supplier"].join(
        big, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")


@declare(
    "q_set_ops_buyers",
    """
    SELECT 'intersect' AS op, o_custkey FROM (
      SELECT o_custkey FROM orders WHERE o_totalprice > 50000
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    UNION ALL
    SELECT 'except' AS op, o_custkey FROM (
      SELECT o_custkey FROM orders
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    """,
)
def q_set_ops_buyers(spark, sf_dir):
    """INTERSECT + EXCEPT in one op-tagged projection (r13 consolidation
    of the former q_intersect_buyers / q_except_buyers — identical
    gates, one registry slot: the 2-round driver-staleness contract
    caps the registry at 150 under the 50-query window, and r13
    declares q_semantic_probe_recovery; same-schema set-op twins were
    the cheapest slot to reclaim). 'intersect' rows: customers with a
    >50k order AND an urgent order; 'except' rows: customers who never
    have a finished order."""
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_totalprice") > 50000).select("o_custkey")
    b = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    inter = a.intersect(b).select(
        F.lit("intersect").alias("op"), "o_custkey"
    )
    # subtract = EXCEPT DISTINCT (set semantics, matching the SQL oracle);
    # exceptAll would be bag semantics and keep multi-order customers
    exc = (
        o.select("o_custkey")
        .subtract(o.where(F.col("o_orderstatus") == "F").select("o_custkey"))
        .select(F.lit("except").alias("op"), "o_custkey")
    )
    return inter.unionByName(exc)


@declare(
    "q_string_funcs",
    """
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           CAST(length(p_name) AS BIGINT) AS name_len,
           replace(p_brand, 'Brand', 'B') AS brand_short,
           substr(p_type, 1, 5) AS type_prefix,
           concat_ws('|', p_brand, p_type) AS brand_type
    FROM part
    """,
)
def q_string_funcs(spark, sf_dir):
    """String scalar functions over part."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.replace(F.col("p_brand"), F.lit("Brand"), F.lit("B")).alias("brand_short"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


@declare(
    "q_date_funcs",
    """
    SELECT strftime(o_orderdate, '%Y-%m') AS ym,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS total
    FROM orders GROUP BY 1, 2, 3
    """,
)
def q_date_funcs(spark, sf_dir):
    """Date extraction + per-month aggregation."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
        )
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double"), 2
            ).alias("total"),
        )
    )


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@declare(
    "q_pivot_priority",
    """
    SELECT o_orderstatus,
           CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS p_urgent,
           CAST(count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS BIGINT) AS p_high,
           CAST(count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS BIGINT) AS p_medium,
           CAST(count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS p_notspec,
           CAST(count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT) AS p_low
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_pivot_priority(spark, sf_dir):
    """Pivot order priorities into columns (fixed value list)."""
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    return piv.toDF(
        "o_orderstatus", "p_urgent", "p_high", "p_medium", "p_notspec", "p_low"
    ).select(
        "o_orderstatus",
        *[F.col(c).cast("long").alias(c)
          for c in ("p_urgent", "p_high", "p_medium", "p_notspec", "p_low")],
    )


@declare(
    "q_window_funcs",
    """
    SELECT o_orderkey,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           round(CAST(lag(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE), 2) AS prev_price,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                 OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate, o_orderkey
                       ROWS UNBOUNDED PRECEDING) AS DOUBLE), 2) AS running_total
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_funcs(spark, sf_dir):
    """Window functions: row_number, lag, running sum (decimal-exact)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    dec = F.col("o_totalprice").cast("decimal(18,6)")
    return o.select(
        "o_orderkey",
        F.row_number().over(w).cast("long").alias("rn"),
        F.round(F.lag(dec).over(w).cast("double"), 2).alias("prev_price"),
        F.round(
            F.sum(dec).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"),
            2,
        ).alias("running_total"),
    )


@declare(
    "q_json_extract",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
)
def q_json_extract(spark, sf_dir):
    """JSON field extraction from the events props payload."""
    e = _events(spark, sf_dir)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
    )


@declare(
    "q_distinct_users",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type
    """,
)
def q_distinct_users(spark, sf_dir):
    """Distinct aggregation per group."""
    e = _events(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.count("*").cast("long").alias("n_events"),
    )


@declare(
    "q_approx_distinct",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           TRUE AS hll_within_5pct
    FROM events GROUP BY event_type
    """,
)
def q_approx_distinct(spark, sf_dir):
    """Approximate aggregates (HLL): approx_count_distinct per event_type.

    The HLL sketch value itself is engine-specific, so the projection
    is the deterministic part (exact distinct, row count) plus the
    accuracy invariant AS a column — ``hll_within_5pct`` is computed
    from the live approx_count_distinct output, so a broken HLL path
    flips the hash (the q_gopher_filter in-query-verification pattern).
    """
    e = _events(spark, sf_dir)
    agg = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"),
        F.countDistinct("user_id").cast("long").alias("exact_users"),
        F.count("*").cast("long").alias("n_events"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        "n_events",
        (
            F.abs(F.col("_approx") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("hll_within_5pct"),
    )


@declare(
    "q_percentiles",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
           round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
           round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95), 4) AS p95_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (Spark `percentile` == SQL
    quantile_cont linear interpolation)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("p50_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 4).alias("p90_qty"),
        F.round(
            F.percentile(F.col("l_extendedprice").cast("double"), F.lit(0.95)), 4
        ).alias("p95_price"),
    )


@declare(
    "q_array_funcs",
    """
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 4) AS first_val,
           round(CAST(list_max(embedding) AS DOUBLE), 4) AS max_val,
           round(CAST(list_min(embedding) AS DOUBLE), 4) AS min_val,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS sum_val,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive
    FROM embeddings
    """,
)
def q_array_funcs(spark, sf_dir):
    """Array scalar functions over the embedding column — the array-ops
    layer every vector operator builds on."""
    from vamana_spark.plans.declared import _emb

    e = _emb(spark, sf_dir)
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("first_val"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("max_val"),
        F.round(F.array_min("embedding").cast("double"), 4).alias("min_val"),
        F.round(
            F.aggregate(
                F.transform("embedding", lambda x: x.cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            4,
        ).alias("sum_val"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_positive"),
    )


@declare(
    "q_asof_join",
    """
    WITH clicks AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    ),
    signups AS (
      SELECT user_id, ts, event_id AS signup_event FROM events
      WHERE event_type = 'signup'
    )
    SELECT c.event_id, c.user_id, s.signup_event AS asof_signup_event
    FROM clicks c ASOF LEFT JOIN signups s
      ON c.user_id = s.user_id AND c.ts >= s.ts
    """,
)
def q_asof_join(spark, sf_dir):
    """As-of join (an operator Spark lacks natively): each click matched
    to the user's latest prior signup. Union-tag-window encoding vs
    DuckDB's native ASOF JOIN as the oracle."""
    from vamana_spark.operators.temporal import asof_join

    e = _events(spark, sf_dir)
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    signups = e.where(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("event_id").alias("signup_event")
    )
    out = asof_join(
        clicks, signups,
        key_cols=["user_id"], left_ts="ts", right_ts="ts",
        right_payload=["signup_event"],
    )
    return out.select("event_id", "user_id", "asof_signup_event")


@declare(
    "q_interval_join",
    """
    SELECT c.event_id, c.user_id, s.event_id AS signup_event
    FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') c
    JOIN (SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup') s
      ON c.user_id = s.user_id
     AND c.ts >= s.ts AND c.ts <= s.ts + INTERVAL 2 HOUR
    """,
)
def q_interval_join(spark, sf_dir):
    """Point-in-interval (range) join — clicks within 2 hours after a
    signup, per user. The engine's bucketized equi-join form
    (operators/temporal.py: (key, floor(ts/width)) join + residual
    filter — never a per-key cross product) vs DuckDB's native
    inequality join as the oracle."""
    from vamana_spark.operators.temporal import interval_join

    e = _events(spark, sf_dir)
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    signups = e.where(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
        F.col("event_id").alias("signup_event"),
    )
    out = interval_join(
        clicks, signups, ["user_id"], "ts", "start_ts", "end_ts",
        bucket="2 hours",
    )
    return out.select("event_id", "user_id", "signup_event")


# ------------------------------------------------------- TPC-H classics
# (adapted to the driver schema: no partsupp/shipmode/phone columns)


@declare(
    "q_shipping_priority",
    """
    SELECT l_orderkey,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                          * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 2)
               AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1998-01-01'
      AND l_shipdate > DATE '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3: top unshipped-revenue orders for one market segment.
    Customer filter joins into the orders x lineitem join
    (broadcast by AQE while it fits; no forced hint — customer scales)."""
    t = relational.load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    c, o, li = t["customer"], t["orders"], t["lineitem"]
    # customer scales with SF: no forced broadcast (AQE broadcasts it
    # while it fits; the plan survives when it does not)
    cb = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rev = F.col("l_extendedprice").cast("decimal(18,6)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,6)")
    )
    return (
        o.where(F.col("o_orderdate") < "1998-01-01")
        .join(cb, o["o_custkey"] == cb["c_custkey"])
        .join(
            li.where(F.col("l_shipdate") > "1998-01-01"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(rev).cast("double"), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@declare(
    "q_custdist",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q_custdist(spark, sf_dir):
    """TPC-H Q13: distribution of customers by order count (zero-order
    customers kept by the left join)."""
    t = relational.load_tables(spark, sf_dir, "customer", "orders")
    c, o = t["customer"], t["orders"]
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("long").alias("custdist")
    )


@declare(
    "q_promo_revenue",
    """
    SELECT
      round(CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,6))
                      * (1 - CAST(l_discount AS DECIMAL(18,6)))
                 ELSE 0 END) AS DOUBLE), 2) AS promo_rev,
      round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                     * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 2)
          AS total_rev,
      round(100.0
            * round(CAST(sum(CASE WHEN p_type = 'PROMO'
                       THEN CAST(l_extendedprice AS DECIMAL(18,6))
                            * (1 - CAST(l_discount AS DECIMAL(18,6)))
                       ELSE 0 END) AS DOUBLE), 2)
            / round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                             * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 2),
            4) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-02-01'
    """,
)
def q_promo_revenue(spark, sf_dir):
    """TPC-H Q14: promo-part revenue share for one month. The ratio is
    computed from the two ROUNDED decimal sums so both engines divide
    bit-identical doubles."""
    t = relational.load_tables(spark, sf_dir, "lineitem", "part")
    li, p = t["lineitem"], t["part"]
    rev = F.col("l_extendedprice").cast("decimal(18,6)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,6)")
    )
    j = (
        li.where(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1997-02-01")
        )
        .join(p.select("p_partkey", "p_type"),
              F.col("l_partkey") == F.col("p_partkey"))
    )
    agg = j.agg(
        F.round(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).cast(
                "double"
            ),
            2,
        ).alias("promo_rev"),
        F.round(F.sum(rev).cast("double"), 2).alias("total_rev"),
    )
    return agg.select(
        "promo_rev",
        "total_rev",
        F.round(
            F.lit(100.0) * F.col("promo_rev") / F.col("total_rev"), 4
        ).alias("promo_pct"),
    )


@declare(
    "q_large_orders",
    """
    SELECT c_custkey, o_orderkey, o_orderdate,
           round(CAST(o_totalprice AS DOUBLE), 2) AS totalprice,
           round(CAST(q.sum_qty AS DOUBLE), 2) AS sum_qty
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN (
      SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,6))) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 250
    ) q ON q.l_orderkey = o_orderkey
    """,
)
def q_large_orders(spark, sf_dir):
    """TPC-H Q18: orders whose total quantity exceeds a threshold. The
    HAVING filter runs inside the lineitem aggregation (partial-agg
    friendly) before the joins."""
    t = relational.load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    c, o, li = t["customer"], t["orders"], t["lineitem"]
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
    )
    return (
        o.join(big, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice").cast("double"), 2).alias("totalprice"),
            F.round(F.col("sum_qty").cast("double"), 2).alias("sum_qty"),
        )
    )


@declare(
    "q_idle_rich_customers",
    """
    SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
           round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE), 2)
               AS totacctbal
    FROM customer
    WHERE c_acctbal > (
            SELECT round(avg(CAST(c_acctbal AS DOUBLE)), 2)
            FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= DATE '2000-01-01')
    GROUP BY c_nationkey
    """,
)
def q_idle_rich_customers(spark, sf_dir):
    """TPC-H Q22 analog: above-average-balance customers with no RECENT
    orders (the driver data has no fully order-less customers), grouped
    by nation. The scalar average is rounded to 2 decimals on both sides
    so the comparison threshold is engine-identical."""
    t = relational.load_tables(spark, sf_dir, "customer", "orders")
    c, o = t["customer"], t["orders"]
    thresh = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(F.round(F.avg(F.col("c_acctbal").cast("double")), 2).alias("t"))
        .first()["t"]
    )
    return (
        c.where(F.col("c_acctbal") > float(thresh))
        .join(
            o.where(F.col("o_orderdate") >= "2000-01-01"),
            c["c_custkey"] == o["o_custkey"],
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double"), 2
            ).alias("totacctbal"),
        )
    )


@declare(
    "q_nation_trade_volume",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                          * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 2)
               AS revenue
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE year(o_orderdate) = 1998
    GROUP BY n1.n_name, n2.n_name, year(o_orderdate)
    """,
)
def q_nation_trade_volume(spark, sf_dir):
    """TPC-H Q7 analog: supplier-nation x customer-nation revenue for one
    year. Nation (and supplier) sides broadcast; the only wide shuffle is
    the orders-lineitem join + final group."""
    t = relational.load_tables(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation"
    )
    c, o, li, s, n = (
        t["customer"], t["orders"], t["lineitem"], t["supplier"], t["nation"]
    )
    rev = F.col("l_extendedprice").cast("decimal(18,6)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,6)")
    )
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(
            o.where(F.year("o_orderdate") == 1998),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(c.select("c_custkey", "c_nationkey"),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(s.select("s_suppkey", "s_nationkey"),
              F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("s_nk") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("c_nk") == F.col("c_nationkey"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(rev).cast("double"), 2).alias("revenue"))
    )

@declare(
    "q_forecast_revenue",
    """
    SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                           * CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE), 2)
               AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: revenue change from dropping small-quantity discounts.
    Pure scan-filter-agg: predicates push to the parquet scan, the agg is
    a map-side partial + 1-row final — the cheapest possible 100-TB plan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,6)")
                    * F.col("l_discount").cast("decimal(18,6)")
                ).cast("double"),
                2,
            ).alias("revenue")
        )
    )


@declare(
    "q_returned_items",
    """
    SELECT c_custkey, c_name,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                          * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 2)
               AS revenue,
           n_name,
           round(CAST(c_acctbal AS DOUBLE), 2) AS acctbal
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_returned_items(spark, sf_dir):
    """TPC-H Q10: customers who returned the most revenue in a quarter.
    Nation broadcast; orders date filter cuts the fact join early; the
    top-20 is TakeOrderedAndProject, never a global sort."""
    t = relational.load_tables(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    c, o, li, n = t["customer"], t["orders"], t["lineitem"], t["nation"]
    rev = F.col("l_extendedprice").cast("decimal(18,6)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,6)")
    )
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(
            o.where(
                (F.col("o_orderdate") >= "1997-01-01")
                & (F.col("o_orderdate") < "1997-04-01")
            ).select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            c.select("c_custkey", "c_name", "c_nationkey", "c_acctbal"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.round(F.sum(rev).cast("double"), 2).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            "n_name",
            F.round(F.col("c_acctbal").cast("double"), 2).alias("acctbal"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@declare(
    "q_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey,
             round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                            * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 2)
                 AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
)
def q_top_supplier(spark, sf_dir):
    """TPC-H Q15: supplier(s) with the max quarterly revenue. The max is
    a broadcast 1-row join against the per-supplier rollup (computed
    once, reused for both sides), never a driver collect."""
    t = relational.load_tables(spark, sf_dir, "lineitem", "supplier")
    li, s = t["lineitem"], t["supplier"]
    rev = F.col("l_extendedprice").cast("decimal(18,6)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,6)")
    )
    per_supp = (
        li.where(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1997-04-01")
        )
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(rev).cast("double"), 2).alias("total_revenue"))
    )
    mx = per_supp.agg(F.max("total_revenue").alias("_mx"))
    return (
        per_supp.join(F.broadcast(mx), F.col("total_revenue") == F.col("_mx"))
        .join(
            s.select("s_suppkey", "s_name"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@declare(
    "q_small_qty_revenue",
    """
    WITH pa AS (
      SELECT l_partkey AS pk, 0.2 * avg(CAST(l_quantity AS DOUBLE)) AS qty_thresh
      FROM lineitem GROUP BY l_partkey
    )
    SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                 / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pa ON pk = l_partkey
    WHERE p_type = 'MEDIUM' AND l_quantity < qty_thresh
    """,
)
def q_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 analog: revenue lost if sub-20%-of-average-quantity
    orders for one part type were dropped. The correlated subquery is
    decorrelated into a per-part avg rollup joined back on partkey —
    quantities are integers so the 0.2*avg threshold is engine-exact."""
    t = relational.load_tables(spark, sf_dir, "lineitem", "part")
    li, p = t["lineitem"], t["part"]
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2) * F.avg(F.col("l_quantity").cast("double"))).alias(
            "qty_thresh"
        )
    )
    return (
        li.join(
            p.where(F.col("p_type") == "MEDIUM").select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(pa, F.col("pk") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast(
                    "double"
                )
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


@declare(
    "q_discounted_revenue",
    """
    SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                           * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 2)
               AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 15)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
           AND l_quantity BETWEEN 10 AND 25)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 20 AND 35)
    """,
)
def q_discounted_revenue(spark, sf_dir):
    """TPC-H Q19 analog: revenue from three disjunctive brand/size/
    quantity baskets. Part side broadcast with the brand filter pushed
    below the join; the OR-of-ANDs evaluates post-join in one codegen
    stage (no union-of-three-scans blowup)."""
    t = relational.load_tables(spark, sf_dir, "lineitem", "part")
    li, p = t["lineitem"], t["part"]
    rev = F.col("l_extendedprice").cast("decimal(18,6)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,6)")
    )
    pf = p.where(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
    ).select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        (F.col("p_brand") == "Brand#12")
        & sz.between(1, 15)
        & q.between(1, 15)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & sz.between(1, 20)
        & q.between(10, 25)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & sz.between(1, 25)
        & q.between(20, 35)
    )
    return (
        li.join(pf, F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(F.round(F.sum(rev).cast("double"), 2).alias("revenue"))
    )


# Q2/Q11/Q16/Q21 SHAPES adapted to the driver schema (no partsupp /
# commitdate): same query patterns — correlated min, scalar-subquery
# HAVING, distinct agg + NOT IN, double-correlation EXISTS — over the
# columns that exist.


@declare(
    "q_min_cost_supplier",
    """
    WITH up AS (
      SELECT l_partkey, l_suppkey,
             min(CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE))
                 AS unit
      FROM lineitem WHERE l_quantity > 0
      GROUP BY l_partkey, l_suppkey
    ), ranked AS (
      SELECT l_partkey, l_suppkey, unit,
             row_number() OVER (PARTITION BY l_partkey
                                ORDER BY unit, l_suppkey) AS rn
      FROM up
    )
    SELECT p_partkey, s_name,
           CAST(floor(unit * 10000) AS BIGINT) AS unit_price_e4
    FROM ranked
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE rn = 1 AND p_size < 15
    ORDER BY p_partkey
    """,
)
def q_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (correlated minimum): per part, the supplier with
    the lowest observed unit price, ties broken by supplier key. The
    correlated subquery becomes a per-part window rank; part and
    supplier dims joined onto the winner rows (size-scaling: no hint)."""
    t = relational.load_tables(spark, sf_dir, "lineitem", "part", "supplier")
    li, p, s = t["lineitem"], t["part"], t["supplier"]
    up = (
        li.where(F.col("l_quantity") > 0)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(
                F.col("l_extendedprice").cast("double")
                / F.col("l_quantity").cast("double")
            ).alias("unit")
        )
    )
    w = Window.partitionBy("l_partkey").orderBy("unit", "l_suppkey")
    best = up.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return (
        best.join(
            p.where(F.col("p_size") < 15),
            best["l_partkey"] == F.col("p_partkey"),
        )
        .join(s, best["l_suppkey"] == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "s_name",
            # floor of a scaled double is bit-deterministic across
            # engines; round() on a raw double is not (decimal-repr
            # HALF_UP vs binary-scaled rounding diverge on halfway values)
            F.floor(F.col("unit") * 10000).cast("long").alias("unit_price_e4"),
        )
        .orderBy("p_partkey")
    )


@declare(
    "q_revenue_concentration",
    """
    WITH nrev AS (
      SELECT n_name,
             sum(CAST(l_extendedprice AS DECIMAL(18,6))
                 * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS rev
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey
      GROUP BY n_name
    )
    SELECT n_name, CAST(round(rev, 2) AS DOUBLE) AS revenue
    FROM nrev
    WHERE CAST(rev AS DOUBLE) * 20 > (SELECT CAST(sum(rev) AS DOUBLE) FROM nrev)
    ORDER BY revenue DESC, n_name
    """,
)
def q_revenue_concentration(spark, sf_dir):
    """TPC-H Q11 shape (HAVING against a global scalar subquery):
    nations holding more than 1/20 of worldwide revenue (1/15 was
    vacuous on the near-uniform 25-nation test data — 0 rows prove
    nothing). Money sums in
    DECIMAL on both engines; the scalar total enters as a broadcast
    cross join, not a driver collect."""
    t = relational.load_tables(
        spark, sf_dir, "lineitem", "orders", "customer", "nation"
    )
    li, o, c, n = t["lineitem"], t["orders"], t["customer"], t["nation"]
    rev = F.col("l_extendedprice").cast("decimal(18,6)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,6)")
    )
    nrev = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(F.sum(rev).alias("rev"))
    )
    total = nrev.agg(F.sum("rev").cast("double").alias("_total"))
    return (
        nrev.crossJoin(F.broadcast(total))
        .where(F.col("rev").cast("double") * 20 > F.col("_total"))
        .select(
            "n_name",
            # round the exact DECIMAL (HALF_UP on both engines), THEN
            # cast — rounding the double is engine-dependent at halfway
            F.round(F.col("rev"), 2).cast("double").alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@declare(
    "q_supplier_part_variety",
    """
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 50
    """,
)
def q_supplier_part_variety(spark, sf_dir):
    """TPC-H Q16 shape (distinct aggregate + NOT IN): how many distinct
    suppliers ship each (brand, type, size), excluding flagged suppliers
    (negative balance stands in for the complaints predicate). NOT IN
    becomes a left-anti join (broadcast by AQE at small SF)."""
    t = relational.load_tables(spark, sf_dir, "lineitem", "part", "supplier")
    li, p, s = t["lineitem"], t["part"], t["supplier"]
    flagged = s.where(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        li.join(flagged, "l_suppkey", "left_anti")
        .join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
        .limit(50)
    )


@declare(
    "q_sole_supplier_orders",
    """
    SELECT s_name, CAST(count(DISTINCT l1.l_orderkey) AS BIGINT) AS n_orders
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND NOT EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    ORDER BY n_orders DESC, s_name
    LIMIT 20
    """,
)
def q_sole_supplier_orders(spark, sf_dir):
    """TPC-H Q21 shape (correlated EXISTS/NOT EXISTS pair): suppliers
    solely responsible for finished orders — no other supplier shipped a
    line on the order. The correlation collapses to a per-order
    distinct-supplier count (1 shuffle) instead of a per-row rescan."""
    t = relational.load_tables(spark, sf_dir, "lineitem", "orders", "supplier")
    li, o, s = t["lineitem"], t["orders"], t["supplier"]
    sole = (
        li.groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("_ns"))
        .where(F.col("_ns") == 1)
        .select("l_orderkey")
    )
    return (
        li.join(sole, "l_orderkey")
        .join(
            o.where(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count_distinct("l_orderkey").cast("long").alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "s_name")
        .limit(20)
    )


@declare(
    "q_market_share",
    """
    WITH rev AS (
      SELECT CAST(year(o_orderdate) AS INT) AS yr,
             CAST(l_extendedprice AS DECIMAL(18,6))
               * (1 - CAST(l_discount AS DECIMAL(18,6))) AS r,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region   ON cn.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE r_name = 'ASIA'
    )
    SELECT yr,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN r ELSE 0 END)
                      AS DOUBLE), 2) AS nation_rev,
           round(CAST(sum(r) AS DOUBLE), 2) AS total_rev,
           round(round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN r ELSE 0 END)
                            AS DOUBLE), 2)
                 / round(CAST(sum(r) AS DOUBLE), 2), 6) AS mkt_share
    FROM rev GROUP BY yr
    """,
)
def q_market_share(spark, sf_dir):
    """TPC-H Q8 shape (market share): of the revenue sold to customers
    in one region, the fraction supplied by one nation, per order year.
    Two nation roles (customer-side, supplier-side) join as separate
    aliases; the share divides the two ROUNDED decimal sums (the Q14
    convention) so both engines divide bit-identical doubles."""
    t = relational.load_tables(
        spark, sf_dir,
        "lineitem", "orders", "customer", "supplier", "nation", "region",
    )
    li, o, c, s = t["lineitem"], t["orders"], t["customer"], t["supplier"]
    cn = t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    sn = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    r = t["region"].where(F.col("r_name") == "ASIA").select("r_regionkey")
    rev = F.col("l_extendedprice").cast("decimal(18,6)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,6)")
    )
    j = (
        li.join(o.select("o_orderkey", "o_custkey", "o_orderdate"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(s.select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
    )
    agg = j.groupBy(F.year("o_orderdate").cast("int").alias("yr")).agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0))
            ).cast("double"),
            2,
        ).alias("nation_rev"),
        F.round(F.sum(rev).cast("double"), 2).alias("total_rev"),
    )
    return agg.select(
        "yr",
        "nation_rev",
        "total_rev",
        F.round(F.col("nation_rev") / F.col("total_rev"), 6).alias("mkt_share"),
    )


@declare(
    "q_profit_by_nation",
    """
    SELECT sn.n_name AS nation, CAST(year(o_orderdate) AS INT) AS yr,
           round(CAST(sum(
             CAST(l_extendedprice AS DECIMAL(18,6))
               * (1 - CAST(l_discount AS DECIMAL(18,6)))
             - CAST(l_quantity AS DECIMAL(18,6))
               * CAST(p_retailprice AS DECIMAL(18,6))
           ) AS DOUBLE), 2) AS margin
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def q_profit_by_nation(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit by nation and year). The
    schema ships no partsupp, so cost-of-goods is proxied by the
    list-price value (p_retailprice x quantity) — margin = revenue
    minus list value; all money stays in DECIMAL(18,6) products summed
    exactly on both engines."""
    t = relational.load_tables(
        spark, sf_dir, "lineitem", "orders", "part", "supplier", "nation"
    )
    li, o, p, s = t["lineitem"], t["orders"], t["part"], t["supplier"]
    sn = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    margin = F.col("l_extendedprice").cast("decimal(18,6)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,6)")
    ) - F.col("l_quantity").cast("decimal(18,6)") * F.col(
        "p_retailprice"
    ).cast("decimal(18,6)")
    return (
        li.join(o.select("o_orderkey", "o_orderdate"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(p.where(F.col("p_name").like("%widget%"))
               .select("p_partkey", "p_retailprice"),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(s.select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(
            F.col("nation"), F.year("o_orderdate").cast("int").alias("yr")
        )
        .agg(F.round(F.sum(margin).cast("double"), 2).alias("margin"))
    )


@declare(
    "q_ship_delay_class",
    """
    SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60
                THEN 'slow' ELSE 'fast' END AS ship_class,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
)
def q_ship_delay_class(spark, sf_dir):
    """TPC-H Q12 shape (shipmode priority counts): the schema has no
    l_shipmode, so lineitems class as fast/slow by ship delay
    (>60 days after the order date); high- vs low-priority line counts
    per class. Midnight-aligned timestamps make datediff and DuckDB's
    date_diff('day') agree exactly."""
    t = relational.load_tables(spark, sf_dir, "lineitem", "orders")
    li, o = t["lineitem"], t["orders"]
    cls = F.when(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60, "slow"
    ).otherwise("fast")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o.select("o_orderkey", "o_orderdate", "o_orderpriority"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(cls.alias("ship_class"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@declare(
    "q_bulk_part_suppliers",
    """
    SELECT s_name FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%widget%' AND l_shipdate >= DATE '1997-01-01'
      GROUP BY l_suppkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,6))) > 800
    )
    """,
)
def q_bulk_part_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (nested IN over a grouped HAVING): suppliers who
    moved bulk volume of one part family in a window. The IN-subquery
    becomes a left-semi join onto the HAVING-filtered aggregate; the
    quantity sum stays decimal so the threshold cut is exact on both
    engines."""
    t = relational.load_tables(spark, sf_dir, "lineitem", "part", "supplier")
    li, p, s = t["lineitem"], t["part"], t["supplier"]
    bulk = (
        li.where(F.col("l_shipdate") >= "1997-01-01")
        .join(p.where(F.col("p_name").like("%widget%")).select("p_partkey"),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("_q"))
        .where(F.col("_q") > 800)
        .select("l_suppkey")
    )
    return s.join(
        bulk, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_name")
