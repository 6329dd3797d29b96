"""Relational core: aggregations, joins, windows, sorts, set ops.

Covers the reference's operator inventory A1-A8/O1-O7 (SURVEY.md §2) on the
driver's TPC-H-ish tables, plus the join/window operators the north_rule
adds. Money flows through DECIMAL(18,2) on both engines so sums are exact;
ratios are rounded; percents use integer division (the reference's
CommonUtils.java:245-251 semantics).

Output-type contract (the round-1 hash lesson): final result columns are
only string / bigint / int / double / boolean / epoch-bigint — never
DECIMAL and never a DuckDB HUGEINT. DuckDB widens sum(DECIMAL(18,2)) to
DECIMAL(38,2) and integer sums to HUGEINT, which the driver's value hash
renders differently from Spark's decimal(28,2)/bigint (and HUGEINT/DECIMAL
become float64 in pandas). So every decimal aggregate finishes with an
exact ::DOUBLE cast on BOTH engines (the summed value is exact decimal,
cast-to-nearest-double is deterministic and identical), and every DuckDB
integer sum / integer division carries ::BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from schema_inference_spark.queries import QuerySpec
from schema_inference_spark.sources.tables import load_table


def _dec(col):
    return F.col(col).cast("decimal(18,2)")


# --- A1-A4 analog: hash agg with partial aggregation + decimal exactness ---


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount")))
            ).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity::DECIMAL(18,2))::DOUBLE AS sum_qty,
       sum(l_extendedprice::DECIMAL(18,2))::DOUBLE AS sum_base_price,
       sum(l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DOUBLE AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- 3-way join + top-k by aggregate (broadcast dims, TakeOrderedAndProject) ---


def q3_topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # Top-k selection happens on the EXACT decimal revenue; only the final
    # projection casts to double, so boundary ties can't change the result set.
    topk = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount")))
            .alias("revenue_dec")
        )
        .orderBy(F.desc("revenue_dec"), F.asc("l_orderkey"))
        .limit(10)
    )
    return topk.select(
        "l_orderkey", F.col("revenue_dec").cast("double").alias("revenue")
    ).orderBy("l_orderkey")


Q3_SQL = """
SELECT l_orderkey, revenue_dec::DOUBLE AS revenue
FROM (
  SELECT l_orderkey,
         sum(l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2))) AS revenue_dec
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
  GROUP BY l_orderkey
  ORDER BY revenue_dec DESC, l_orderkey ASC
  LIMIT 10
)
ORDER BY l_orderkey
"""


# --- semi join (EXISTS) ---


def orders_with_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-06-01")
    )
    return (
        orders.join(li.select("l_orderkey").distinct(), orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


LATE_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- anti join (referential orphans, north_rule §2.4) ---


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders.select("o_custkey").distinct(), cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


NO_ORDERS_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


# --- duplicate-key detection (uniqueness-check shape, inverted A1) ---


def parts_with_many_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.countDistinct("l_suppkey").alias("n_suppliers"))
        .where(F.col("n_suppliers") > 3)
        .orderBy("l_partkey")
    )


MANY_SUPP_SQL = """
SELECT l_partkey, count(DISTINCT l_suppkey) AS n_suppliers
FROM lineitem GROUP BY l_partkey HAVING count(DISTINCT l_suppkey) > 3
ORDER BY l_partkey
"""


# --- window: top-k per group (deterministic tie-break) ---


def top_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("c_mktsegment", "rn", "o_orderkey", F.col("o_totalprice").alias("totalprice"))
        .orderBy("c_mktsegment", "rn")
    )


TOP_PER_SEG_SQL = """
SELECT c_mktsegment, rn::INT AS rn, o_orderkey, totalprice
FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice AS totalprice,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rn <= 3
ORDER BY c_mktsegment, rn
"""


# --- percent-of-total (A3 semantics: integer division) ---


def priority_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("_t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select("o_orderpriority", "n", F.expr("n * 100 DIV _t").alias("percent"))
        .orderBy("o_orderpriority")
    )


PRIORITY_SHARE_SQL = """
WITH counts AS (SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY o_orderpriority)
SELECT o_orderpriority, n, ((n * 100) // (SELECT sum(n) FROM counts))::BIGINT AS percent
FROM counts ORDER BY o_orderpriority
"""


# --- exact distinct counts per group (A1/A2) ---


def distinct_parts_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


DISTINCT_SQL = """
SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --- fixed-edge histogram (profile-pass primitive) ---


def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bucket = F.least(F.lit(15), F.greatest(F.lit(0), F.floor(F.col("l_extendedprice") / 7000.0))).cast(
        "int"
    )
    return (
        li.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


HIST_SQL = """
SELECT least(15, greatest(0, floor(l_extendedprice / 7000.0)))::INT AS bucket, count(*) AS n
FROM lineitem GROUP BY 1 ORDER BY bucket
"""


# --- drift (PSI) fully in SQL: first-half vs second-half of lineitem ---


def quantity_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bucket = (F.col("l_quantity").cast("int") - 1).alias("bucket")
    side = (F.col("l_orderkey") % 2 == 0).alias("side_a")
    h = (
        li.select(bucket, side)
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("side_a"), 1).otherwise(0)).alias("cnt_a"),
            F.sum(F.when(F.col("side_a"), 0).otherwise(1)).alias("cnt_b"),
        )
    )
    tot = h.agg(F.sum("cnt_a").alias("ta"), F.sum("cnt_b").alias("tb"))
    return (
        h.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.round(
                ((F.col("cnt_a") + 0.5) / (F.col("ta") + 25.0)
                 - (F.col("cnt_b") + 0.5) / (F.col("tb") + 25.0))
                * F.log(
                    ((F.col("cnt_a") + 0.5) / (F.col("ta") + 25.0))
                    / ((F.col("cnt_b") + 0.5) / (F.col("tb") + 25.0))
                ),
                8,
            ).alias("psi_term"),
        )
        .orderBy("bucket")
    )


PSI_SQL = """
WITH h AS (
  SELECT (l_quantity::INT - 1) AS bucket,
         sum(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS cnt_a,
         sum(CASE WHEN l_orderkey % 2 = 0 THEN 0 ELSE 1 END) AS cnt_b
  FROM lineitem GROUP BY 1
), tot AS (SELECT sum(cnt_a) AS ta, sum(cnt_b) AS tb FROM h)
SELECT bucket,
       round(((cnt_a + 0.5) / (ta + 25.0) - (cnt_b + 0.5) / (tb + 25.0))
             * ln(((cnt_a + 0.5) / (ta + 25.0)) / ((cnt_b + 0.5) / (tb + 25.0))), 8) AS psi_term
FROM h, tot ORDER BY bucket
"""


# --- KS drift statistic fully relational (CDF diff via bucket-ordered window) ---


def quantity_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    h = (
        li.select(
            (F.col("l_quantity").cast("int") - 1).alias("bucket"),
            (F.col("l_orderkey") % 2 == 0).alias("side_a"),
        )
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("side_a"), 1).otherwise(0)).alias("cnt_a"),
            F.sum(F.when(F.col("side_a"), 0).otherwise(1)).alias("cnt_b"),
        )
    )
    tot = h.agg(F.sum("cnt_a").alias("ta"), F.sum("cnt_b").alias("tb"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cdf = (
        h.crossJoin(F.broadcast(tot))
        .withColumn("cdf_a", F.sum("cnt_a").over(w) / F.col("ta"))
        .withColumn("cdf_b", F.sum("cnt_b").over(w) / F.col("tb"))
    )
    return cdf.agg(
        F.round(F.max(F.abs(F.col("cdf_a") - F.col("cdf_b"))), 8).alias("ks_stat"),
        F.count(F.lit(1)).alias("n_buckets"),
    )


KS_SQL = """
WITH h AS (
  SELECT (l_quantity::INT - 1) AS bucket,
         sum(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS cnt_a,
         sum(CASE WHEN l_orderkey % 2 = 0 THEN 0 ELSE 1 END) AS cnt_b
  FROM lineitem GROUP BY 1
), tot AS (SELECT sum(cnt_a) AS ta, sum(cnt_b) AS tb FROM h),
cdf AS (
  SELECT bucket,
         sum(cnt_a) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) / ta AS cdf_a,
         sum(cnt_b) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) / tb AS cdf_b
  FROM h, tot
)
SELECT round(max(abs(cdf_a - cdf_b)), 8) AS ks_stat, count(*) AS n_buckets FROM cdf
"""


# --- time windows (streaming-equivalent batch agg; epoch output for parity) ---


def hourly_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
        .orderBy("hour_epoch", "event_type")
    )


HOURLY_SQL = """
SELECT floor(epoch(date_trunc('hour', ts)))::BIGINT AS hour_epoch, event_type,
       count(*) AS n, sum(value::DECIMAL(18,2))::DOUBLE AS sum_value
FROM events GROUP BY 1, 2 ORDER BY hour_epoch, event_type
"""


# --- sessionization: gaps-and-islands via lag + running sum ---


def user_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = ev.withColumn("new_sess", new_sess).withColumn(
        "session_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id")
        .agg(F.max("session_id").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
        .orderBy("user_id")
    )


SESSION_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, max(session_id)::BIGINT AS n_sessions, count(*) AS n_events
FROM sess GROUP BY user_id ORDER BY user_id
"""


# --- built-in session windows (the native analog of the gaps-and-islands
#     sessionization above; also the streaming-ready formulation) ---


def user_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via F.session_window (30-min gap): per-user session
    count + per-session event totals, reduced to a per-user summary. The
    same groupBy runs unchanged under Structured Streaming with a
    watermark; the oracle is the precise-epoch gaps-and-islands equivalent
    (an event extends a session iff ts - prev_ts < gap, i.e. a new session
    starts at diff >= 1800s)."""
    ev = load_table(spark, sf_dir, "events")
    sessions = ev.groupBy("user_id", F.session_window("ts", "30 minutes")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("n_events").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


SESSION_WINDOW_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800.0
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
), per_session AS (
  SELECT user_id, session_id, count(*) AS n_events
  FROM sess GROUP BY user_id, session_id
)
SELECT user_id, count(*)::BIGINT AS n_sessions,
       sum(n_events)::BIGINT AS n_events,
       max(n_events)::BIGINT AS max_session_events
FROM per_session GROUP BY user_id ORDER BY user_id
"""


# --- multi-column sort + limit (O2/O6) ---


def event_sample_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # Sort and project the RAW double: a post-sort decimal cast would let
    # rows that tie after rounding enter/leave the limit differently per
    # engine (DuckDB resolves ORDER BY aliases to the casted output).
    return (
        ev.orderBy("event_type", F.desc("value"), "event_id")
        .limit(100)
        .select("event_id", "event_type", "value")
    )


SORTED_SQL = """
SELECT event_id, event_type, value
FROM events ORDER BY event_type, value DESC, event_id LIMIT 100
"""


# --- null-fraction profile (stats-pass primitive) ---


def event_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("props").isNull(), 1).otherwise(0)).alias("null_props"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.countDistinct("user_id").alias("n_users"),
    ).orderBy("event_type")


EVENT_PROFILE_SQL = """
SELECT event_type, count(*) AS n_rows,
       sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_props,
       min(value) AS min_value, max(value) AS max_value,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""


# --- as-of join (training-pipeline staple; DuckDB ASOF JOIN is the oracle) ---


def error_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    from schema_inference_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    joined = asof_join(errors, clicks, key="user_id", ts="ts", right_value_cols=["click_value"])
    return joined.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("ts_epoch"),
        F.col("click_value_asof"),
    ).orderBy("event_id")


ASOF_SQL = """
SELECT l.event_id, l.user_id, floor(epoch(l.ts))::BIGINT AS ts_epoch,
       r.value AS click_value_asof
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') l
ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'click') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY event_id
"""


# --- rollup (multi-level aggregation) ---


def order_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
        .orderBy("status", "priority")
    )


ROLLUP_SQL = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n, sum(o_totalprice::DECIMAL(18,2))::DOUBLE AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY status, priority
"""


# --- set difference (violation-delta shape: EXCEPT ALL) ---


def customers_minus_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    buyers = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    ).distinct()
    return cust.exceptAll(buyers).orderBy("custkey")


EXCEPT_SQL = """
SELECT c_custkey AS custkey FROM customer
EXCEPT ALL
SELECT DISTINCT o_custkey AS custkey FROM orders
ORDER BY custkey
"""


# --- pivot (wide aggregation; CASE-based SQL both engines execute) ---

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def user_bucket_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bucketed = ev.withColumn("user_bucket", (F.col("user_id") % 10).cast("int"))
    return (
        bucketed.groupBy("user_bucket")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .orderBy("user_bucket")
    )


PIVOT_SQL = (
    "SELECT (user_id % 10)::INT AS user_bucket, "
    + ", ".join(
        f"count(*) FILTER (WHERE event_type = '{t}') AS {t}" for t in EVENT_TYPES
    )
    + " FROM events GROUP BY 1 ORDER BY user_bucket"
)


# --- HLL cardinality (north_rule: approx_count_distinct; rows-only check —
#     the estimate is implementation-defined, accuracy asserted in pytest) ---


def partkey_cardinality_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.approx_count_distinct("l_suppkey").alias("approx_supps"),
        )
        .orderBy("l_returnflag")
    )


# --- exact percentiles (interpolated; verified identical to quantile_cont) ---


def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.25)"), 6).alias("p25"),
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(l_extendedprice, 0.95)"), 6).alias("p95"),
        )
        .orderBy("l_returnflag")
    )


PERCENTILES_SQL = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
       round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
       round(quantile_cont(l_extendedprice, 0.95), 6) AS p95
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


SPECS = [
    QuerySpec("q1_pricing_summary", q1_pricing_summary, Q1_SQL, "A1-A4: grouped agg, decimal-exact"),
    QuerySpec("price_percentiles", price_percentiles, PERCENTILES_SQL, "exact percentiles"),
    QuerySpec("q3_topk_revenue", q3_topk_revenue, Q3_SQL, "3-way join + top-k"),
    QuerySpec("orders_with_late_lines", orders_with_late_lines, LATE_SQL, "left-semi join"),
    QuerySpec("customers_without_orders", customers_without_orders, NO_ORDERS_SQL, "anti join"),
    QuerySpec("parts_with_many_suppliers", parts_with_many_suppliers, MANY_SUPP_SQL, "dup keys"),
    QuerySpec("top_orders_per_segment", top_orders_per_segment, TOP_PER_SEG_SQL, "window top-k"),
    QuerySpec("priority_share", priority_share, PRIORITY_SHARE_SQL, "percent-of-total"),
    QuerySpec("distinct_parts_by_flag", distinct_parts_by_flag, DISTINCT_SQL, "exact distinct"),
    QuerySpec("price_histogram", price_histogram, HIST_SQL, "fixed-edge histogram"),
    QuerySpec("quantity_drift_psi", quantity_drift_psi, PSI_SQL, "PSI drift in SQL"),
    QuerySpec("quantity_drift_ks", quantity_drift_ks, KS_SQL, "KS drift in SQL"),
    QuerySpec("hourly_event_windows", hourly_event_windows, HOURLY_SQL, "time windows"),
    QuerySpec("user_session_counts", user_session_counts, SESSION_SQL, "sessionization"),
    QuerySpec("user_session_windows", user_session_windows, SESSION_WINDOW_SQL,
              "built-in session_window sessionization (streaming-ready)"),
    QuerySpec("event_sample_sorted", event_sample_sorted, SORTED_SQL, "multi-col sort+limit"),
    QuerySpec("event_profile", event_profile, EVENT_PROFILE_SQL, "null-fraction profile"),
    QuerySpec("error_asof_last_click", error_asof_last_click, ASOF_SQL, "as-of join"),
    QuerySpec("order_rollup", order_rollup, ROLLUP_SQL, "rollup aggregation"),
    # customers_minus_buyers rotated to catalog_extra in r5 (registry
    # rotation policy, COVERAGE.md): 0 rows at every SF and the set-op
    # family keeps order_rollup + user_bucket_event_pivot; its slot went to
    # doc_cross_batch_near_dups (catalog_text) — still strict-checked at
    # both SFs via test_extra_parity.
    QuerySpec("user_bucket_event_pivot", user_bucket_event_pivot, PIVOT_SQL, "pivot"),
]
