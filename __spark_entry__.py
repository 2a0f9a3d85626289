"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps operator names → (spark, sf_dir) → DataFrame;
``oracle_sql()`` maps the same names → ANSI SQL for the DuckDB oracle.
Every pair is engineered for bit-exact agreement:

- money accumulates in DECIMAL(18,2) (order-independent) then casts to
  DOUBLE; ratios divide identical doubles then ROUND(…,2);
- integers cast to BIGINT on both sides; dates/timestamps render to
  strings with explicit formats;
- all window orderings carry total tiebreakers.

The silver/gold semantics mirror the reference models (see SURVEY.md §2
and data_lakehouse_spark/operators/{silver,gold}.py docstrings). The
``events`` fixture maps onto the reference event schema with
ts→event_time, value→price and 'click' standing in for the 'cart'
stage (FIXTURES.md §2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lakehouse_spark.operators import gold
from data_lakehouse_spark.operators.silver import silver_events
from data_lakehouse_spark.sources.readers import load_tables

# Fixed "today" for CURRENT_DATE-dependent marts (data ends 2024-01-30).
AS_OF_DATE = "2024-02-01"
CART_TYPE = "click"  # the events fixture's stand-in for the 'cart' stage


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

def _ensure_conf(spark: SparkSession) -> None:
    """Pin session confs the comparisons depend on (the driver owns the
    session, so set runtime-mutable knobs defensively per query)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # events.parquet stores TIMESTAMP(NANOS) which Spark rejects by
    # default; read as long and convert explicitly (silver_events).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def _events_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_conf(spark)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return silver_events(events)


def _date_str(df: DataFrame, *cols: str) -> DataFrame:
    for c in cols:
        df = df.withColumn(c, F.date_format(F.col(c), "yyyy-MM-dd"))
    return df


#: DuckDB rendering of the silver transform (keeps event_id for the
#: dedup tiebreaker; final SELECTs drop it). Mirrors silver_events().
_SILVER_CTE = """
WITH silver_base AS (
    SELECT
        event_id,
        md5(concat_ws('|',
            CAST(user_id AS VARCHAR),
            'NULL',
            event_type,
            strftime(ts, '%Y-%m-%d %H:%M:%S.%f'))) AS event_unique_id,
        ts AS event_timestamp,
        CAST(ts AS DATE) AS event_date,
        CAST(hour(ts) AS BIGINT) AS event_hour,
        CAST(dayofweek(ts) + 1 AS BIGINT) AS day_of_week_num,
        lower(trim(event_type)) AS event_type,
        CAST(user_id AS BIGINT) AS user_id,
        CAST(NULL AS VARCHAR) AS user_session,
        CAST(NULL AS BIGINT) AS product_id,
        CAST(NULL AS VARCHAR) AS category_level_1,
        CAST(NULL AS VARCHAR) AS category_level_2,
        CAST(NULL AS VARCHAR) AS category_level_3,
        CAST(NULL AS VARCHAR) AS brand,
        CASE WHEN value IS NULL OR value < 0 THEN NULL
             ELSE floor((value) * 100 + 0.5) / 100 END AS price,
        CASE WHEN value IS NULL THEN 'UNKNOWN'
             WHEN value < 50 THEN '0-50'
             WHEN value < 100 THEN '50-100'
             WHEN value < 200 THEN '100-200'
             WHEN value < 500 THEN '200-500'
             ELSE '500+' END AS price_bucket,
        CASE WHEN hour(ts) >= 6 AND hour(ts) < 12 THEN 'MORNING'
             WHEN hour(ts) >= 12 AND hour(ts) < 18 THEN 'AFTERNOON'
             WHEN hour(ts) >= 18 AND hour(ts) < 22 THEN 'EVENING'
             ELSE 'NIGHT' END AS time_of_day,
        dayofweek(ts) + 1 IN (1, 7) AS is_weekend,
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events
    WHERE user_id IS NOT NULL
),
silver AS (
    SELECT * EXCLUDE (rn) FROM (
        SELECT *, row_number() OVER (
            PARTITION BY event_unique_id
            ORDER BY event_timestamp DESC, event_id DESC) AS rn
        FROM silver_base
    ) WHERE rn = 1
)
"""


# --------------------------------------------------------------------------
# query implementations (Spark side)
# --------------------------------------------------------------------------

def q_silver_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events_silver(spark, sf_dir)
    df = _date_str(df, "event_date")
    return df.select(
        "event_unique_id",
        F.date_format("event_timestamp", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "event_ts_str"
        ),
        "event_date",
        "event_hour",
        "day_of_week_num",
        "event_type",
        "user_id",
        "price",
        "price_bucket",
        "time_of_day",
        "is_weekend",
        "prop_k",
    )


def q_daily_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = gold.daily_sales_summary(_events_silver(spark, sf_dir), cart_type=CART_TYPE)
    return _date_str(df, "sale_date")


def q_product_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = gold.product_performance(
        _events_silver(spark, sf_dir),
        cart_type=CART_TYPE,
        as_of_date=AS_OF_DATE,
        product_col="prop_k",
    )
    df = _date_str(df, "last_sold_date")
    return df.drop("category_level_1", "category_level_2", "brand")


def q_user_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = gold.user_rfm_segments(_events_silver(spark, sf_dir), as_of_date=AS_OF_DATE)
    return _date_str(df, "first_purchase_date", "last_purchase_date")


def q_user_journey_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = gold.user_journey_funnel(_events_silver(spark, sf_dir), cart_type=CART_TYPE)
    return _date_str(
        df,
        "first_view_date",
        "first_cart_date",
        "first_purchase_date",
        "last_activity_date",
    )


def q_conversion_funnel_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = gold.conversion_funnel_daily(
        _events_silver(spark, sf_dir), cart_type=CART_TYPE
    )
    df = _date_str(df, "analysis_date")
    return df.drop("category_level_1", "category_level_2")


def q_hourly_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = gold.hourly_traffic(_events_silver(spark, sf_dir), cart_type=CART_TYPE)
    return _date_str(df, "event_date")


def q_category_performance_tpch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """category_performance (W2 top-1-per-group + J1 3-key left join)
    instantiated over lineitem⋈part: month × part-type categories,
    p_brand as brand, extended price as revenue."""
    _ensure_conf(spark)
    t = load_tables(spark, sf_dir, ["lineitem", "part"], register_views=False)
    silver_like = (
        t["lineitem"]
        .join(F.broadcast(t["part"]), t["lineitem"].l_partkey == t["part"].p_partkey)
        .select(
            F.to_date(F.date_trunc("month", "l_shipdate")).alias("event_date"),
            F.col("p_type").alias("category_level_1"),
            F.col("p_size").cast("string").alias("category_level_2"),
            F.col("p_brand").alias("brand"),
            F.col("l_extendedprice").alias("price"),
            F.col("l_orderkey").alias("user_id"),
            F.lit("purchase").alias("event_type"),
        )
    )
    df = gold.category_performance(silver_like)
    return _date_str(df, "analysis_date")


# --------------------------------------------------------------------------
# contract functions
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: daily sales summary over sf0.001 events."""
    return q_daily_sales(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "silver_events": q_silver_events,
        "gold_daily_sales_summary": q_daily_sales,
        "gold_product_performance": q_product_performance,
        "gold_user_rfm_segments": q_user_rfm_segments,
        "gold_user_journey_funnel": q_user_journey_funnel,
        "gold_conversion_funnel_daily": q_conversion_funnel_daily,
        "gold_hourly_traffic": q_hourly_traffic,
        "gold_category_performance": q_category_performance_tpch,
    }


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}

    sql["silver_events"] = (
        _SILVER_CTE
        + """
SELECT
    event_unique_id,
    strftime(event_timestamp, '%Y-%m-%d %H:%M:%S.%f') AS event_ts_str,
    strftime(event_date, '%Y-%m-%d') AS event_date,
    event_hour,
    day_of_week_num,
    event_type,
    user_id,
    price,
    price_bucket,
    time_of_day,
    is_weekend,
    prop_k
FROM silver
"""
    )

    sql["gold_daily_sales_summary"] = (
        _SILVER_CTE
        + """
, daily AS (
    SELECT
        event_date AS sale_date,
        CAST(SUM(CASE WHEN event_type = 'purchase'
                 THEN CAST(coalesce(price, 0) AS DECIMAL(18,2))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS total_revenue,
        CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS total_orders,
        CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS BIGINT) AS unique_customers,
        CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS total_items_purchased,
        CAST(COUNT(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS BIGINT) AS unique_viewers,
        CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS total_views,
        CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS total_carts
    FROM silver
    GROUP BY event_date
)
SELECT
    strftime(sale_date, '%Y-%m-%d') AS sale_date,
    total_revenue, total_orders, unique_customers, total_items_purchased,
    unique_viewers, total_views, total_carts,
    floor((total_revenue / nullif(total_orders, 0)) * 100 + 0.5) / 100 AS avg_order_value,
    floor((total_orders * 100.0 / nullif(total_views, 0)) * 100 + 0.5) / 100 AS conversion_rate,
    floor(((total_carts - total_orders) * 100.0 / nullif(total_carts, 0)) * 100 + 0.5) / 100 AS cart_abandonment_rate
FROM daily
"""
    )

    sql["gold_product_performance"] = (
        _SILVER_CTE
        + """
, pm AS (
    SELECT
        prop_k AS product_id,
        CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS total_views,
        CAST(COUNT(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS BIGINT) AS unique_viewers,
        CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS total_carts,
        CAST(COUNT(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS BIGINT) AS unique_carters,
        CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS total_purchases,
        CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS BIGINT) AS unique_buyers,
        CAST(SUM(CASE WHEN event_type = 'purchase'
                 THEN CAST(coalesce(price, 0) AS DECIMAL(18,2))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS total_revenue,
        CAST(SUM(CASE WHEN event_type = 'purchase'
                 THEN CAST(price AS DECIMAL(18,2)) END) AS DOUBLE) AS _psum,
        CAST(COUNT(CASE WHEN event_type = 'purchase' AND price IS NOT NULL THEN 1 END) AS BIGINT) AS _pcnt,
        MAX(CASE WHEN event_type = 'purchase' THEN event_date END) AS last_sold_date
    FROM silver
    WHERE prop_k IS NOT NULL
    GROUP BY prop_k
)
SELECT
    product_id, total_views, unique_viewers, total_carts, unique_carters,
    total_purchases, unique_buyers, total_revenue,
    strftime(last_sold_date, '%Y-%m-%d') AS last_sold_date,
    floor((_psum / nullif(_pcnt, 0)) * 100 + 0.5) / 100 AS avg_price,
    floor((total_carts * 100.0 / nullif(total_views, 0)) * 100 + 0.5) / 100 AS view_to_cart_rate,
    floor((total_purchases * 100.0 / nullif(total_carts, 0)) * 100 + 0.5) / 100 AS cart_to_purchase_rate,
    floor((total_purchases * 100.0 / nullif(total_views, 0)) * 100 + 0.5) / 100 AS overall_conversion_rate,
    CAST(datediff('day', last_sold_date, DATE '{as_of}') AS BIGINT) AS days_since_last_sale
FROM pm
""".format(as_of=AS_OF_DATE)
    )

    sql["gold_user_rfm_segments"] = (
        _SILVER_CTE
        + """
, uph AS (
    SELECT
        user_id,
        MIN(CASE WHEN event_type = 'purchase' THEN event_date END) AS first_purchase_date,
        MAX(CASE WHEN event_type = 'purchase' THEN event_date END) AS last_purchase_date,
        CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS frequency,
        CAST(SUM(CASE WHEN event_type = 'purchase'
                 THEN CAST(coalesce(price, 0) AS DECIMAL(18,2))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS monetary_value,
        CAST(COUNT(DISTINCT user_session) AS BIGINT) AS total_sessions
    FROM silver
    WHERE user_id IS NOT NULL
    GROUP BY user_id
    HAVING COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) > 0
),
rfm AS (
    SELECT *,
        CAST(datediff('day', last_purchase_date, DATE '{as_of}') AS BIGINT) AS recency_days,
        floor((monetary_value / nullif(frequency, 0)) * 100 + 0.5) / 100 AS avg_order_value
    FROM uph
),
scored AS (
    SELECT *,
        CAST(ntile(5) OVER (ORDER BY recency_days ASC, user_id ASC) AS BIGINT) AS rfm_recency_score,
        CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id ASC) AS BIGINT) AS rfm_frequency_score,
        CAST(ntile(5) OVER (ORDER BY monetary_value DESC, user_id ASC) AS BIGINT) AS rfm_monetary_score
    FROM rfm
)
SELECT
    user_id,
    strftime(first_purchase_date, '%Y-%m-%d') AS first_purchase_date,
    strftime(last_purchase_date, '%Y-%m-%d') AS last_purchase_date,
    frequency, monetary_value, total_sessions, recency_days, avg_order_value,
    rfm_recency_score, rfm_frequency_score, rfm_monetary_score,
    CASE
        WHEN rfm_recency_score >= 4 AND rfm_frequency_score >= 4 AND rfm_monetary_score >= 4 THEN 'Champions'
        WHEN rfm_recency_score >= 3 AND rfm_frequency_score >= 3 AND rfm_monetary_score >= 3 THEN 'Loyal Customers'
        WHEN rfm_recency_score >= 4 AND rfm_frequency_score <= 2 THEN 'Potential Loyalists'
        WHEN rfm_recency_score <= 2 AND rfm_frequency_score >= 4 THEN 'At Risk'
        WHEN rfm_recency_score <= 2 AND rfm_frequency_score >= 3 AND rfm_monetary_score >= 4 THEN 'Cannot Lose Them'
        WHEN rfm_recency_score <= 2 AND rfm_frequency_score <= 2 THEN 'Hibernating'
        WHEN rfm_recency_score = 1 AND rfm_frequency_score = 1 THEN 'Lost'
        ELSE 'New Customers'
    END AS rfm_segment,
    floor((monetary_value * 1.5) * 100 + 0.5) / 100 AS customer_lifetime_value
FROM scored
""".format(as_of=AS_OF_DATE)
    )

    sql["gold_user_journey_funnel"] = (
        _SILVER_CTE
        + """
, ue AS (
    SELECT
        user_id,
        MIN(CASE WHEN event_type = 'view' THEN event_date END) AS first_view_date,
        MIN(CASE WHEN event_type = 'click' THEN event_date END) AS first_cart_date,
        MIN(CASE WHEN event_type = 'purchase' THEN event_date END) AS first_purchase_date,
        MAX(event_date) AS last_activity_date,
        CAST(MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS has_viewed,
        CAST(MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS has_added_to_cart,
        CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS has_purchased,
        CAST(MAX(CASE WHEN event_type = 'remove_from_cart' THEN 1 ELSE 0 END) AS BIGINT) AS has_removed_from_cart,
        CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS total_views,
        CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS total_carts,
        CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS total_purchases,
        CAST(COUNT(CASE WHEN event_type = 'remove_from_cart' THEN 1 END) AS BIGINT) AS total_cart_removals,
        CAST(COUNT(DISTINCT user_session) AS BIGINT) AS total_sessions
    FROM silver
    WHERE user_id IS NOT NULL
    GROUP BY user_id
)
SELECT
    user_id,
    strftime(first_view_date, '%Y-%m-%d') AS first_view_date,
    strftime(first_cart_date, '%Y-%m-%d') AS first_cart_date,
    strftime(first_purchase_date, '%Y-%m-%d') AS first_purchase_date,
    strftime(last_activity_date, '%Y-%m-%d') AS last_activity_date,
    has_viewed, has_added_to_cart, has_purchased, has_removed_from_cart,
    total_views, total_carts, total_purchases, total_cart_removals, total_sessions,
    'lifetime' AS analysis_period,
    CAST(datediff('day', first_view_date, first_cart_date) AS BIGINT) AS days_to_first_cart,
    CAST(datediff('day', first_view_date, first_purchase_date) AS BIGINT) AS days_to_first_purchase,
    CASE
        WHEN has_purchased = 1 AND total_purchases >= 3 THEN 'repeat_buyer'
        WHEN has_purchased = 1 THEN 'purchaser'
        WHEN has_added_to_cart = 1 AND has_purchased = 0 THEN 'cart_abandoner'
        WHEN has_viewed = 1 AND has_added_to_cart = 0 THEN 'viewer_only'
        ELSE 'unknown'
    END AS current_funnel_stage,
    has_added_to_cart = 1 AND has_purchased = 0 AS is_cart_abandoner,
    CASE WHEN has_purchased = 1
          AND datediff('day', first_view_date, first_purchase_date) <= 0
         THEN TRUE ELSE FALSE END AS is_impulse_buyer,
    total_views >= 5 AS is_researcher
FROM ue
"""
    )

    sql["gold_conversion_funnel_daily"] = (
        _SILVER_CTE
        + """
, fm AS (
    SELECT
        event_date AS analysis_date,
        time_of_day,
        is_weekend,
        CAST(COUNT(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS BIGINT) AS stage_1_view_users,
        CAST(COUNT(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS BIGINT) AS stage_2_cart_users,
        CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS BIGINT) AS stage_3_purchase_users,
        CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS stage_1_view_events,
        CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS stage_2_cart_events,
        CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS stage_3_purchase_events,
        CAST(SUM(CASE WHEN event_type = 'purchase'
                 THEN CAST(coalesce(price, 0) AS DECIMAL(18,2))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS total_revenue
    FROM silver
    GROUP BY event_date, time_of_day, is_weekend
)
SELECT
    strftime(analysis_date, '%Y-%m-%d') AS analysis_date,
    time_of_day, is_weekend,
    stage_1_view_users, stage_2_cart_users, stage_3_purchase_users,
    stage_1_view_events, stage_2_cart_events, stage_3_purchase_events,
    total_revenue,
    floor((stage_2_cart_users * 100.0 / nullif(stage_1_view_users, 0)) * 100 + 0.5) / 100 AS view_to_cart_rate,
    floor((stage_3_purchase_users * 100.0 / nullif(stage_2_cart_users, 0)) * 100 + 0.5) / 100 AS cart_to_purchase_rate,
    floor((stage_3_purchase_users * 100.0 / nullif(stage_1_view_users, 0)) * 100 + 0.5) / 100 AS overall_conversion_rate,
    CAST(stage_1_view_users - stage_2_cart_users AS BIGINT) AS dropoff_after_view,
    CAST(stage_2_cart_users - stage_3_purchase_users AS BIGINT) AS dropoff_after_cart,
    floor(((stage_1_view_users - stage_2_cart_users) * 100.0 / nullif(stage_1_view_users, 0)) * 100 + 0.5) / 100 AS dropoff_rate_view,
    floor(((stage_2_cart_users - stage_3_purchase_users) * 100.0 / nullif(stage_2_cart_users, 0)) * 100 + 0.5) / 100 AS dropoff_rate_cart,
    floor((total_revenue / nullif(stage_3_purchase_users, 0)) * 100 + 0.5) / 100 AS avg_order_value,
    floor((total_revenue / nullif(stage_1_view_users, 0)) * 100 + 0.5) / 100 AS revenue_per_viewer
FROM fm
WHERE stage_1_view_users > 0
"""
    )

    sql["gold_hourly_traffic"] = (
        _SILVER_CTE
        + """
SELECT
    strftime(event_date, '%Y-%m-%d') AS event_date,
    event_hour,
    CAST(COUNT(*) AS BIGINT) AS total_events,
    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS unique_users,
    CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS total_views,
    CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS total_carts,
    CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS total_purchases,
    CAST(SUM(CASE WHEN event_type = 'purchase'
             THEN CAST(coalesce(price, 0) AS DECIMAL(18,2))
             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS revenue,
    CASE day_of_week_num
        WHEN 1 THEN 'Sunday' WHEN 2 THEN 'Monday' WHEN 3 THEN 'Tuesday'
        WHEN 4 THEN 'Wednesday' WHEN 5 THEN 'Thursday' WHEN 6 THEN 'Friday'
        WHEN 7 THEN 'Saturday' END AS day_of_week
FROM silver
GROUP BY event_date, event_hour, day_of_week_num
"""
    )

    sql["gold_category_performance"] = """
WITH silver_like AS (
    SELECT
        CAST(date_trunc('month', l_shipdate) AS DATE) AS event_date,
        p_type AS category_level_1,
        CAST(p_size AS VARCHAR) AS category_level_2,
        p_brand AS brand,
        l_extendedprice AS price,
        l_orderkey AS user_id
    FROM lineitem JOIN part ON l_partkey = p_partkey
),
category_daily AS (
    SELECT
        event_date AS analysis_date,
        category_level_1,
        category_level_2,
        CAST(SUM(CAST(coalesce(price, 0) AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
        CAST(COUNT(*) AS BIGINT) AS total_orders,
        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS unique_customers
    FROM silver_like
    WHERE category_level_1 IS NOT NULL
    GROUP BY 1, 2, 3
),
brand_daily AS (
    SELECT
        event_date AS analysis_date,
        category_level_1, category_level_2, brand,
        CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS brand_revenue
    FROM silver_like
    WHERE brand IS NOT NULL AND category_level_1 IS NOT NULL
    GROUP BY 1, 2, 3, 4
),
top_brand AS (
    SELECT analysis_date, category_level_1, category_level_2,
           brand AS top_brand, brand_revenue AS top_brand_revenue
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY analysis_date, category_level_1, category_level_2
            ORDER BY brand_revenue DESC, brand ASC) AS brand_rank
        FROM brand_daily
    ) WHERE brand_rank = 1
)
SELECT
    strftime(cd.analysis_date, '%Y-%m-%d') AS analysis_date,
    cd.category_level_1, cd.category_level_2,
    cd.total_revenue, cd.total_orders, cd.unique_customers,
    floor((cd.total_revenue / nullif(cd.total_orders, 0)) * 100 + 0.5) / 100 AS avg_order_value,
    tb.top_brand, tb.top_brand_revenue
FROM category_daily cd
LEFT JOIN top_brand tb
  ON cd.analysis_date = tb.analysis_date
 AND cd.category_level_1 = tb.category_level_1
 AND cd.category_level_2 = tb.category_level_2
"""

    return sql
