"""Relational query layer over the TPC-H-ish star schema.

The reference has no general query surface (it is one hard-coded
pipeline), but its operators decompose into scans, projections,
filters, equi-joins, hash aggregations, sorts and dense ranks
(SURVEY.md §2). This module exercises those operators — plus the
standard relational repertoire any replacement engine needs — over the
driver's star schema, each with a DuckDB oracle.

Float discipline: money columns carry exactly 2 decimal places, so every
SUM goes through an exact DECIMAL cast and back to double at the end —
Spark and DuckDB then agree bit-for-bit regardless of partial-agg order.
AVG is computed as exact-sum / count for the same reason.

Scale notes:
- fact-fact joins (lineitem⋈orders) shuffle on the orderkey; dimension
  joins (customer, nation, region, supplier, part) are broadcasts —
  dimensions grow ~log(fact) in star schemas.
- every aggregation is a partial+final hash agg (map-side combine).
- top-k = per-partition partial top-k via window only on the already-
  aggregated (small) relation, never on raw facts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from capstone_etl_spark.functions.windows import bounded_window_key
from capstone_etl_spark.sources.tables import load_table
from capstone_etl_spark.session import cached


def _dsum(col: Column, scale_expr: str = "decimal(18,2)") -> Column:
    """Exact decimal SUM → double (see module docstring)."""
    return F.sum(col.cast(scale_expr)).cast("double")


# ---------------------------------------------------------------- queries

def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analogue: scan-filter-groupBy-agg over the largest fact
    table. Catalyst pushes the shipdate filter to the parquet reader."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc_price, "decimal(24,4)").alias("sum_disc_price"),
            _dsum(charge, "decimal(30,6)").alias("sum_charge"),
            (_dsum(F.col("l_quantity")) / F.count("*")).alias("avg_qty"),
            (_dsum(F.col("l_extendedprice")) / F.count("*")).alias("avg_price"),
            (_dsum(F.col("l_discount"), "decimal(18,2)") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,4))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per customer; top 10.

    Plan: PRE-AGGREGATE lineitem revenue per orderkey BEFORE the
    fact-fact join (a rewrite Catalyst does not perform itself) — the
    join then carries one row per order instead of one per line item
    (~4× less at TPC-H shape, and the orderkey exchange from the
    aggregation is reused by the join), and the per-customer
    countDistinct(o_orderkey) collapses to a plain count(*) because
    orderkey is unique post-agg. Decimal sums stay exact through the
    two-level aggregation (associative)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(revenue.cast("decimal(24,4)")).alias("order_rev")
    )
    return (
        per_order.join(orders, per_order["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum("order_rev").cast("double").alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(10)
    )


TOP_CUSTOMERS_SQL = """
SELECT
  c_custkey,
  c_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,4))) AS DOUBLE) AS revenue,
  COUNT(DISTINCT o_orderkey) AS n_orders
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 10
"""


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style multi-join through the full dimension chain
    (lineitem⋈orders⋈customer⋈nation⋈region). Dimensions broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            _dsum(revenue, "decimal(24,4)").alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


REVENUE_BY_NATION_SQL = """
SELECT
  r_name,
  n_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,4))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


def orders_per_customer_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window ranking: each customer's 3 largest orders (row_number over
    partitioned window — runs on the orders relation, never on facts)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rank_in_cust", F.row_number().over(w).cast("long"))
        .filter(F.col("rank_in_cust") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank_in_cust")
        .orderBy("o_custkey", "rank_in_cust")
    )


ORDERS_PER_CUSTOMER_RANK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rank_in_cust
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank_in_cust
  FROM orders
) t
WHERE rank_in_cust <= 3
ORDER BY o_custkey, rank_in_cust
"""


def segment_status_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-style conditional aggregation: order counts and totals per
    market segment × order status (expressed as portable CASE aggs)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def status_sum(status: str) -> Column:
        return F.sum(
            F.when(F.col("o_orderstatus") == status, F.col("o_totalprice").cast("decimal(18,2)")).otherwise(
                F.lit(0).cast("decimal(18,2)")
            )
        ).cast("double")

    def status_cnt(status: str) -> Column:
        return F.count(F.when(F.col("o_orderstatus") == status, F.lit(1)))

    return (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            status_cnt("O").alias("n_open"),
            status_cnt("F").alias("n_filled"),
            status_cnt("P").alias("n_pending"),
            status_sum("O").alias("total_open"),
            status_sum("F").alias("total_filled"),
            status_sum("P").alias("total_pending"),
        )
        .orderBy("c_mktsegment")
    )


SEGMENT_STATUS_MATRIX_SQL = """
SELECT
  c_mktsegment,
  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_filled,
  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_pending,
  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS total_open,
  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS total_filled,
  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS total_pending
FROM orders
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def parts_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join: parts never ordered (NOT EXISTS). Broadcast the
    distinct fact keys when small; at scale this flips to shuffle —
    left as a plain anti-join so Catalyst/AQE pick the strategy."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        part.join(li.select("l_partkey").distinct(), part["p_partkey"] == F.col("l_partkey"), "left_anti")
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
    )


PARTS_WITHOUT_ORDERS_SQL = """
SELECT p_partkey, p_name, p_brand
FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
ORDER BY p_partkey
"""


def supplier_part_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join + agg: per-supplier shipped quantity and distinct parts,
    only for suppliers that actually shipped (left_semi before agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_suppkey", "s_name")
        .agg(
            _dsum(F.col("l_quantity")).alias("total_qty"),
            F.countDistinct("l_partkey").alias("n_parts"),
        )
        .orderBy("s_suppkey")
    )


SUPPLIER_PART_VOLUME_SQL = """
SELECT s_suppkey, s_name,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
  COUNT(DISTINCT l_partkey) AS n_parts
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_suppkey, s_name
ORDER BY s_suppkey
"""


def order_date_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-bucketed agg with running window total: orders per month +
    cumulative revenue (lag/frame window over the monthly rollup)."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count("*").alias("n_orders"),
            _dsum(F.col("o_totalprice")).alias("month_total"),
        )
    )
    # decimal window sum: DuckDB's windowed double-SUM associates via a
    # segment tree, so agree exactly by accumulating in decimal.
    # The window input is one row per calendar month — bounded by time,
    # not data volume; bounded_window_key states that explicitly.
    w = (
        # bound: ≤ one row per calendar month of data (time, not volume)
        Window.partitionBy(bounded_window_key("month"))
        .orderBy("month")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        monthly.withColumn(
            "running_total",
            F.sum(F.col("month_total").cast("decimal(18,2)")).over(w).cast("double"),
        )
        .orderBy("month")
    )


ORDER_DATE_ROLLUP_SQL = """
WITH monthly AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS month_total
  FROM orders
  GROUP BY 1
)
SELECT month, n_orders, month_total,
       CAST(SUM(CAST(month_total AS DECIMAL(18,2))) OVER (ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM monthly
ORDER BY month
"""


def order_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP (year, priority): per-(year,priority) rows plus
    year subtotals plus a grand total in ONE pass — Spark expands the
    grouping sets before the hash agg (no extra scans). grouping_id
    disambiguates genuine NULL keys from subtotal rows."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup(
            F.year("o_orderdate").alias("year"), F.col("o_orderpriority").alias("priority")
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_orders"),
            _dsum(F.col("o_totalprice")).alias("revenue"),
        )
        .select("year", "priority", "gid", "n_orders", "revenue")
    )


ORDER_PRIORITY_ROLLUP_SQL = """
SELECT year(o_orderdate) AS year, o_orderpriority AS priority,
       CAST(GROUPING(year(o_orderdate), o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY ROLLUP (year(o_orderdate), o_orderpriority)
"""


def customer_year_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (§2.6 — absent in the reference, Spark built-ins):
    customers ordering in 1996 vs 1997 sliced into INTERSECT ('both'),
    EXCEPT ('only_1996' / 'only_1997') segments. Each set op is a
    distinct-style hash aggregation shuffling on the full row — keys
    here are single bigints, uniform."""
    orders = load_table(spark, sf_dir, "orders")

    def custs(year: int) -> DataFrame:
        return (
            orders.filter(F.year("o_orderdate") == year).select("o_custkey").distinct()
        )

    y96, y97 = custs(1996), custs(1997)
    tag = lambda df, t: df.select(F.lit(t).alias("segment"), "o_custkey")  # noqa: E731
    return (
        tag(y96.intersect(y97), "both")
        .unionByName(tag(y96.subtract(y97), "only_1996"))
        .unionByName(tag(y97.subtract(y96), "only_1997"))
    )


CUSTOMER_YEAR_SETOPS_SQL = """
WITH y96 AS (
  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
), y97 AS (
  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997
)
SELECT 'both' AS segment, o_custkey FROM (SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y97)
UNION ALL
SELECT 'only_1996', o_custkey FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y97)
UNION ALL
SELECT 'only_1997', o_custkey FROM (SELECT o_custkey FROM y97 EXCEPT SELECT o_custkey FROM y96)
"""


def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style correlated scalar subquery, decorrelated: per
    part of one brand, the average-yearly revenue of lineitems whose
    quantity is below 20% of THAT part's average quantity.

    The correlated `(SELECT 0.2*avg(l_quantity) WHERE l_partkey = p)`
    becomes a per-part pre-aggregate joined back onto the fact — the
    classic Catalyst-friendly rewrite: one scan of lineitem feeds both
    the threshold agg and the probe (self-join on partkey), the brand
    filter prunes parts BEFORE either join so the fact is filtered by
    a broadcast semi-join, never scanned per-part. l_quantity is
    integral-valued, so avg = exact-int-sum / count is deterministic
    across engines; revenue accumulates in DECIMAL for exactness."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    brand_parts = part.filter(F.col("p_brand") == "Brand#12").select("p_partkey")
    branded = li.join(
        F.broadcast(brand_parts),
        li["l_partkey"] == brand_parts["p_partkey"],
        "left_semi",
    )
    thresholds = branded.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        branded.join(F.broadcast(thresholds), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            (_dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"),
            F.count("*").alias("n_lineitems"),
        )
    )


SMALL_QTY_REVENUE_SQL = """
WITH branded AS (
  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
  FROM lineitem l
  WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#12')
), thresholds AS (
  SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_cut
  FROM branded GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(b.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_lineitems
FROM branded b JOIN thresholds t USING (l_partkey)
WHERE b.l_quantity < t.qty_cut
"""


def nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style bilateral trade: revenue flowing between two named
    nations (supplier side vs customer side), per order year.

    Two independent dimension chains hang off the same fact row —
    lineitem→supplier→nation and lineitem→orders→customer→nation. Both
    chains broadcast (supplier and customer are dimensions); the only
    shuffle is the fact-fact lineitem⋈orders join on orderkey. The
    disjunctive nation-pair predicate evaluates AFTER both chains so it
    can't push to either scan, but the per-side nation equality lists
    CAN: Catalyst pushes `n_name IN (A,B)` into each broadcast build."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    pair = ("NATION_1", "NATION_2")
    n1 = nation.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
        .groupBy("supp_nation", "cust_nation", F.year("o_orderdate").alias("order_year"))
        .agg(
            _dsum(revenue, "decimal(24,4)").alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("supp_nation", "cust_nation", "order_year")
    )


NATION_TRADE_FLOWS_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(o_orderdate) AS order_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY n1.n_name, n2.n_name, year(o_orderdate)
ORDER BY supp_nation, cust_nation, order_year
"""


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style market share: of all PROMO-part revenue sold to
    EUROPE customers, the fraction supplied by NATION_5, per year.

    share = conditional-sum / total-sum in ONE aggregation pass (no
    self-join, no second scan). Part/customer/region prune the fact via
    broadcast joins before the orderkey shuffle; both sums accumulate
    in DECIMAL so numerator and denominator are exact and the final
    double division is bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")
    promo = part.filter(F.col("p_type") == "PROMO").select("p_partkey")
    eu_nations = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            nation["n_regionkey"] == region["r_regionkey"],
        ).select(F.col("n_nationkey").alias("cust_nkey"))
    )
    supp_nation = nation.select(
        F.col("n_nationkey").alias("supp_nkey"), F.col("n_name").alias("supp_nation")
    )
    rev_dec = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(24,4)")
    zero = F.lit(0).cast("decimal(24,4)")
    return (
        li.join(F.broadcast(promo), li["l_partkey"] == promo["p_partkey"], "left_semi")
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(eu_nations), F.col("c_nationkey") == F.col("cust_nkey"), "left_semi")
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("supp_nkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_5", rev_dec).otherwise(zero)).cast("double")
                / F.sum(rev_dec).cast("double")
            ).alias("mkt_share"),
            F.sum(rev_dec).cast("double").alias("total_revenue"),
        )
        .orderBy("order_year")
    )


MARKET_SHARE_SQL = """
SELECT year(o_orderdate) AS order_year,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_5'
                     THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,4))
                     ELSE CAST(0 AS DECIMAL(24,4)) END) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,4))) AS DOUBLE) AS mkt_share,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,4))) AS DOUBLE) AS total_revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
  AND c_nationkey IN (
    SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE')
GROUP BY year(o_orderdate)
ORDER BY order_year
"""


def product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style product profit: per supplier nation per year,
    profit = revenue − cost proxy (0.5·retailprice·qty — the schema has
    no partsupp.ps_supplycost) over parts whose name contains 'red'.

    The part-name filter is a broadcast semi-join that prunes the fact
    before anything else; the profit expression is computed per row in
    DECIMAL so the grouped sum is associative-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    red_parts = part.filter(F.col("p_name").contains("red")).select("p_partkey", "p_retailprice")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(24,4)")
    return (
        li.join(F.broadcast(red_parts), li["l_partkey"] == red_parts["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), F.col("s_nationkey") == nation["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("order_year"))
        .agg(F.sum(profit).cast("double").alias("profit"), F.count("*").alias("n_items"))
        .orderBy("nation", F.desc("order_year"))
    )


PRODUCT_PROFIT_SQL = """
SELECT n_name AS nation, year(o_orderdate) AS order_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     - 0.5 * p_retailprice * l_quantity AS DECIMAL(24,4))) AS DOUBLE) AS profit,
       COUNT(*) AS n_items
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, order_year DESC
"""


def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promo share: of lineitems shipped in 1997, the
    percentage of revenue from PROMO-type parts. Single fact scan with
    the shipdate range pushed to parquet; part broadcasts; one
    conditional aggregate — no subquery, no second pass."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev_dec = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(24,4)")
    zero = F.lit(0).cast("decimal(24,4)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev_dec).otherwise(zero)).cast("double")
                / F.sum(rev_dec).cast("double")
            ).alias("promo_pct"),
            F.count("*").alias("n_items"),
        )
    )


PROMO_REVENUE_SQL = """
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                             THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,4))
                             ELSE CAST(0 AS DECIMAL(24,4)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,4))) AS DOUBLE) AS promo_pct,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
"""


def disjunctive_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style disjunctive join predicate: revenue from three
    OR'd (brand × size-range × quantity-range) clauses.

    The predicate spans both join sides, so it can't be a pure join
    key — but Catalyst still extracts the join-independent residuals:
    the per-side implied filters (brand IN (...), size BETWEEN 1..25,
    quantity BETWEEN 1..30 — the union of the clause ranges) push to
    the scans, and the equi-join on partkey stays a hash join with the
    disjunction as a post-join filter rather than degrading to a
    nested-loop theta join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(20, 30)
        )
    )
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(24,4)")
    return joined.filter(clause).agg(
        F.sum(revenue).cast("double").alias("revenue"), F.count("*").alias("n_items")
    )


DISJUNCTIVE_PART_REVENUE_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20 AND 30)
"""


def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: customers with above-average positive balance
    and no order since 2000, counted per nation (lapsed high-value
    accounts).

    The global-average scalar subquery is a 1-row aggregate CROSS
    JOINed into the plan (never `.collect()`ed to the driver — the
    whole query stays one lazy DAG); the `NOT EXISTS` is a left_anti
    join against the distinct recent-order custkeys, with the date
    filter pushed below the distinct so the anti build side is small.
    At scale the anti-join shuffles on custkey (uniform); the 1-row
    broadcast is free."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = (
        orders.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust["c_custkey"] == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_customers"),
            _dsum(F.col("c_acctbal")).alias("total_bal"),
        )
        .orderBy("nation")
    )


IDLE_RICH_CUSTOMERS_SQL = """
SELECT n_name AS nation, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY n_name
ORDER BY nation
"""


def blocking_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style "suppliers who kept orders waiting": orders where
    at least one line shipped late (>90 days after the order date) and
    EVERY late line came from the same single supplier — charged to
    that supplier.

    Q21's EXISTS + NOT EXISTS double-correlation collapses into ONE
    per-order aggregation: count late lines, count distinct late
    suppliers, and pick the unique late supplier with a conditional
    max — one orderkey shuffle instead of two correlated re-scans of
    the fact. The supplier name lookup broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)
    per_order = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_orderkey")
        .agg(
            F.count(F.when(late, F.lit(1))).alias("n_late"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supp"),
            F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
            F.countDistinct("l_suppkey").alias("n_supp"),
        )
        .filter((F.col("n_late") > 0) & (F.col("n_late_supp") == 1) & (F.col("n_supp") > 1))
    )
    return (
        per_order.join(F.broadcast(supp), per_order["late_supp"] == supp["s_suppkey"])
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(20)
    )


BLOCKING_SUPPLIERS_SQL = """
WITH per_order AS (
  SELECT l_orderkey,
         COUNT(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 1 END) AS n_late,
         COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN l_suppkey END) AS n_late_supp,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN l_suppkey END) AS late_supp,
         COUNT(DISTINCT l_suppkey) AS n_supp
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_orderkey
)
SELECT s_suppkey, s_name, COUNT(*) AS numwait
FROM per_order JOIN supplier ON late_supp = s_suppkey
WHERE n_late > 0 AND n_late_supp = 1 AND n_supp > 1
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey
LIMIT 20
"""


def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style argmax WITH ties: the supplier(s) whose revenue
    over 1997-H1 shipments equals the maximum such revenue.

    The MAX scalar subquery is a 1-row aggregate OVER the per-supplier
    rollup, cross-joined back and compared — two passes over the small
    aggregated relation, one pass over the fact. Revenue is compared
    as exact DECIMAL (an argmax on drifting doubles could select
    different suppliers per engine). Ties survive (no arbitrary
    LIMIT 1), matching Q15's VIEW + WHERE total = (SELECT MAX...)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(24,4)")).alias(
                "total_rev"
            )
        )
        # consumed twice (the relation and its MAX) — cache so the fact
        # scan + rollup runs once
        .transform(cached)
    )
    max_rev = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


TOP_SUPPLIER_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,4))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
ORDER BY s_suppkey
"""


def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style large-volume orders: orders whose total line
    quantity exceeds 300, with customer context.

    The HAVING subquery is a pre-aggregation of the fact on orderkey
    (map-side combine collapses ~6 lines/order before the shuffle) and
    the filter prunes BEFORE the joins — orders/customer join only the
    few surviving keys. Quantity is integral-valued, so the sum and
    the >300 cut are exact on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(_dsum(F.col("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
    )


LARGE_ORDERS_SQL = """
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_totalprice, sum_qty
FROM (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300
) big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
"""


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style shipping priority: top-10 orders by outstanding
    revenue for one market segment — orders placed before a date whose
    items shipped after it. Segment prunes customers into a broadcast
    semi-join BEFORE the fact-fact join; both date filters push to the
    scans; the top-10 runs on the aggregated per-order relation."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cut = F.lit("1998-01-01").cast("timestamp")
    seg = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(24,4)")
    return (
        li.filter(F.col("l_shipdate") > cut)
        .join(orders.filter(F.col("o_orderdate") < cut), li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(seg), orders["o_custkey"] == seg["c_custkey"], "left_semi")
        .groupBy(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


SHIPPING_PRIORITY_SQL = """
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
GROUP BY o_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def priority_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: orders per priority in one quarter that had at
    least one late-shipping item. The EXISTS subquery is a left_semi
    join against the late lineitem keys — the date filter narrows the
    orders side before the semi shuffle; no fact row survives the
    join, only membership."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    late = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li["l_orderkey"] == F.col("o_orderkey"),
    ).filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)).select("l_orderkey")
    q = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    return (
        q.join(late, q["o_orderkey"] == late["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


PRIORITY_ORDER_COUNTS_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    JOIN orders o2 ON l_orderkey = o2.o_orderkey
    WHERE l_orderkey = o.o_orderkey
      AND l_shipdate > o2.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the pure scan-filter-aggregate — discount-band revenue
    in one year. Every predicate pushes to the parquet reader
    (`PushedFilters` on shipdate/discount/quantity); zero joins, one
    1-row aggregate. The simplest possible plan, kept as the pushdown
    canary."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(24,4)"))
            .cast("double")
            .alias("revenue_delta"),
            F.count("*").alias("n_items"),
        )
    )


FORECAST_REVENUE_CHANGE_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(24,4))) AS DOUBLE) AS revenue_delta,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def returned_item_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: top-20 customers by revenue lost to returns in
    one quarter (l_returnflag = 'R'). Return-flag + date filters push
    to the scans; customer/nation broadcast; top-k over the aggregated
    per-customer relation."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(24,4)")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
            ),
            li["l_orderkey"] == orders["o_orderkey"],
        )
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"), "c_acctbal")
        .agg(F.sum(revenue).cast("double").alias("lost_revenue"))
        .orderBy(F.desc("lost_revenue"), "c_custkey")
        .limit(20)
    )


RETURNED_ITEM_LOSSES_SQL = """
SELECT c_custkey, c_name, n_name AS nation, c_acctbal,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,4))) AS DOUBLE) AS lost_revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY lost_revenue DESC, c_custkey
LIMIT 20
"""


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: the distribution of customers by how many orders they
    placed, INCLUDING the zero-order bucket — the left outer join +
    double aggregation shape (join → per-customer count with NULLs →
    histogram over the counts). The left join preserves customers with
    no orders (count = 0 via counting the join's order keys, not
    rows)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count("*").alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


CUSTOMER_ORDER_DISTRIBUTION_SQL = """
SELECT n_orders, COUNT(*) AS n_customers
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS n_orders
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) t
GROUP BY n_orders
ORDER BY n_customers DESC, n_orders DESC
"""


def customer_yoy_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (the one outer flavor the other queries don't
    exercise): per-customer 1996 vs 1997 revenue side by side,
    INCLUDING customers active in only one year — churn shows as a
    NULL-backed zero on one side, which no inner/left form preserves
    in both directions. Aggregate-then-join: the full-outer runs on
    two per-customer rollups (small), never on raw facts."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(24,4)")

    def year_rev(year: int) -> DataFrame:
        return (
            li.join(
                orders.filter(F.year("o_orderdate") == year),
                li["l_orderkey"] == orders["o_orderkey"],
            )
            .groupBy(F.col("o_custkey").alias("custkey"))
            .agg(F.sum(revenue).alias("rev"))
        )

    a = year_rev(1996).select("custkey", F.col("rev").alias("rev_1996"))
    b = year_rev(1997).select("custkey", F.col("rev").alias("rev_1997"))
    zero = F.lit(0).cast("decimal(24,4)")
    return (
        a.join(b, "custkey", "full_outer")
        .select(
            "custkey",
            F.coalesce("rev_1996", zero).cast("double").alias("rev_1996"),
            F.coalesce("rev_1997", zero).cast("double").alias("rev_1997"),
            (F.coalesce("rev_1997", zero) - F.coalesce("rev_1996", zero))
            .cast("double")
            .alias("yoy_delta"),
        )
        .orderBy("custkey")
    )


CUSTOMER_YOY_REVENUE_SQL = """
WITH a AS (
  SELECT o_custkey AS custkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,4))) AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE year(o_orderdate) = 1996 GROUP BY o_custkey
), b AS (
  SELECT o_custkey AS custkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,4))) AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE year(o_orderdate) = 1997 GROUP BY o_custkey
)
SELECT COALESCE(a.custkey, b.custkey) AS custkey,
       CAST(COALESCE(a.rev, 0) AS DOUBLE) AS rev_1996,
       CAST(COALESCE(b.rev, 0) AS DOUBLE) AS rev_1997,
       CAST(COALESCE(b.rev, 0) - COALESCE(a.rev, 0) AS DOUBLE) AS yoy_delta
FROM a FULL OUTER JOIN b ON a.custkey = b.custkey
ORDER BY custkey
"""


COOCCURRENCE_TOP_K = 20


def part_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top-20 part pairs most often
    ordered together. The pair generation is a self equi-join ON THE
    ORDER KEY of the deduplicated (order, part) relation — pair count
    per order is (parts/order choose 2), bounded by basket size, never
    |parts|²; the p1<p2 canonical orientation halves it. Support
    counting is one hash agg on the pair key; top-k runs on the
    aggregated relation."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p1"))
    b = op.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p2"))
    return (
        a.join(b, "ok")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count("*").alias("support"))
        .orderBy(F.desc("support"), "p1", "p2")
        .limit(COOCCURRENCE_TOP_K)
    )


PART_COOCCURRENCE_SQL = f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS support
FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY a.l_partkey, b.l_partkey
ORDER BY support DESC, p1, p2
LIMIT {COOCCURRENCE_TOP_K}
"""


TRI_MIN_SUPPORT = 2  # co-order support for a graph edge


def cooccurrence_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration over the part co-occurrence graph (parts as
    nodes, an edge when ≥ TRI_MIN_SUPPORT orders contain both) — the
    graph-analytics primitive behind clustering coefficients and
    community seeds, and the repo's first wedge-closing algorithm.

    DEGREE ORIENTATION, the distributed-triangle textbook trick
    (Suri & Vassilvitskii 2011): every edge is directed from its
    lower-(degree, id) endpoint to the higher one, so wedges are only
    generated at a node's OUT-neighbors — out-degree is O(√m) on any
    graph, bounding wedge volume by O(m^1.5) regardless of skew (a
    celebrity node with degree d generates ZERO wedges at itself once
    oriented away). The closing check is one equi-join of wedges
    against oriented edges. Orientation compares (deg, id) structs —
    deterministic and engine-identical; output triples are re-sorted by
    part id so the relation is canonical."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p1"))
    b = op.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p2"))
    und = cached(
        a.join(b, "ok")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= TRI_MIN_SUPPORT)
        .select("p1", "p2")
    )
    deg = (
        und.select(F.col("p1").alias("p"))
        .unionByName(und.select(F.col("p2").alias("p")))
        .groupBy("p")
        .agg(F.count("*").alias("deg"))
    )
    e = (
        und.join(deg.select(F.col("p").alias("p1"), F.col("deg").alias("d1")), "p1")
        .join(deg.select(F.col("p").alias("p2"), F.col("deg").alias("d2")), "p2")
    )
    fwd = F.struct(F.col("d1"), F.col("p1")) < F.struct(F.col("d2"), F.col("p2"))
    oriented = cached(
        e.select(
            F.when(fwd, F.col("p1")).otherwise(F.col("p2")).alias("src"),
            F.when(fwd, F.col("p2")).otherwise(F.col("p1")).alias("dst"),
            F.when(fwd, F.col("d2")).otherwise(F.col("d1")).alias("ddst"),
        )
    )
    o1 = oriented.select("src", F.col("dst").alias("v"), F.col("ddst").alias("dv"))
    o2 = oriented.select("src", F.col("dst").alias("w"), F.col("ddst").alias("dw"))
    wedges = o1.join(o2, "src").filter(
        F.struct(F.col("dv"), F.col("v")) < F.struct(F.col("dw"), F.col("w"))
    )
    closed = wedges.join(
        oriented.select(F.col("src").alias("v"), F.col("dst").alias("w")),
        ["v", "w"],
        "left_semi",
    )
    tri = F.array_sort(F.array("src", "v", "w"))
    return closed.select(
        tri[0].alias("pa"), tri[1].alias("pb"), tri[2].alias("pc")
    )


COOCCURRENCE_TRIANGLES_SQL = f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
und AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {TRI_MIN_SUPPORT}
),
deg AS (
  SELECT p, COUNT(*) AS deg FROM (
    SELECT p1 AS p FROM und UNION ALL SELECT p2 AS p FROM und
  ) GROUP BY p
),
oriented AS (
  SELECT CASE WHEN (da.deg, u.p1) < (db.deg, u.p2) THEN u.p1 ELSE u.p2 END AS src,
         CASE WHEN (da.deg, u.p1) < (db.deg, u.p2) THEN u.p2 ELSE u.p1 END AS dst,
         CASE WHEN (da.deg, u.p1) < (db.deg, u.p2) THEN db.deg ELSE da.deg END AS ddst
  FROM und u
  JOIN deg da ON da.p = u.p1
  JOIN deg db ON db.p = u.p2
),
wedges AS (
  SELECT o1.src, o1.dst AS v, o2.dst AS w
  FROM oriented o1 JOIN oriented o2 ON o1.src = o2.src
  WHERE (o1.ddst, o1.dst) < (o2.ddst, o2.dst)
),
closed AS (
  SELECT wg.src, wg.v, wg.w
  FROM wedges wg
  WHERE EXISTS (SELECT 1 FROM oriented o WHERE o.src = wg.v AND o.dst = wg.w)
)
SELECT least(src, v, w) AS pa,
       CASE WHEN src NOT IN (least(src, v, w), greatest(src, v, w)) THEN src
            WHEN v NOT IN (least(src, v, w), greatest(src, v, w)) THEN v
            ELSE w END AS pb,
       greatest(src, v, w) AS pc
FROM closed
"""


FUZZY_MAX_DIST = 2


def fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string join (entity resolution): distinct part-name pairs
    within Levenshtein distance ≤ 2, candidates generated by LENGTH
    blocking instead of all-pairs.

    The blocking exploits lev(a,b) ≤ k ⇒ |len(a)−len(b)| ≤ k: the
    right side re-emits each name under its 2k+1 admissible lengths,
    turning the band predicate into an EQUI join key (hash-
    shuffleable; never a nested-loop theta join), and the expensive
    edit distance runs on candidates only. Each true pair matches
    under exactly one shift, so no dedup pass is needed. Runs on the
    DISTINCT name catalog (dimension-sized), not the part rows."""
    part = load_table(spark, sf_dir, "part")
    names = part.select("p_name").distinct()
    a = names.select(F.col("p_name").alias("n1"), F.length("p_name").alias("l1"))
    b = names.select(F.col("p_name").alias("n2"), F.length("p_name").alias("l2")).withColumn(
        "lk",
        F.explode(F.array(*[F.col("l2") + d for d in range(-FUZZY_MAX_DIST, FUZZY_MAX_DIST + 1)])),
    )
    dist = F.levenshtein("n1", "n2")
    return (
        a.join(b, F.col("l1") == F.col("lk"))
        .filter(F.col("n1") < F.col("n2"))
        .filter(dist <= FUZZY_MAX_DIST)
        .select("n1", "n2", dist.cast("long").alias("dist"))
        .orderBy("n1", "n2")
    )


FUZZY_PART_NAMES_SQL = f"""
WITH names AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS n1, b.p_name AS n2,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM names a JOIN names b
  ON a.p_name < b.p_name
 AND abs(length(a.p_name) - length(b.p_name)) <= {FUZZY_MAX_DIST}
WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
ORDER BY n1, n2
"""


# ---------------------------------------------------------------- round-5
# The six TPC-H shapes the schema previously left uncovered (Q2, Q5,
# Q11, Q12, Q16, Q20), adapted to the driver's reduced star schema
# (no partsupp / shipmode / comment columns): each keeps the defining
# operator shape of its TPC-H original — the correlated-min supplier
# lookup, the customer==supplier nation join, the global-fraction
# HAVING, the conditional late-shipment counts, the anti-joined
# distinct-supplier rollup, and the more-than-half-of-part-volume
# semi-join chain.


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for every EUROPE-supplied part of size ≤ 15,
    the supplier(s) achieving the MINIMUM unit price, with the
    correlated `cost = (SELECT MIN ...)` subquery decorrelated into a
    per-part aggregate joined back.

    Exactness: unit price = extendedprice·(1−discount)/quantity is a
    PER-ROW double expression (identical operands → identical IEEE
    result in both engines), and MIN is order-insensitive — so unlike
    a summed measure there is no partial-agg drift and the equality
    join on the min is safe. Ties survive, as in Q2's ORDER BY over
    all matching suppliers."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    eu_supp = (
        supp.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
                    nation["n_regionkey"] == region["r_regionkey"],
                ).select("n_nationkey", "n_name")
            ),
            supp["s_nationkey"] == F.col("n_nationkey"),
        ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    small_parts = part.filter(F.col("p_size") <= 15).select(
        "p_partkey", "p_name", "p_size"
    )
    unit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ) / F.col("l_quantity")
    offers = (
        li.join(F.broadcast(small_parts), li["l_partkey"] == F.col("p_partkey"))
        .join(F.broadcast(eu_supp), li["l_suppkey"] == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(unit).alias("unit_cost"))
        .transform(cached)
    )
    best = offers.groupBy(F.col("p_partkey").alias("bp")).agg(
        F.min("unit_cost").alias("best_cost")
    )
    return (
        offers.join(
            F.broadcast(best),
            (offers["p_partkey"] == F.col("bp"))
            & (offers["unit_cost"] == F.col("best_cost")),
        )
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            "s_acctbal",
            F.col("n_name").alias("supp_nation"),
            F.round("unit_cost", 6).alias("unit_cost"),
        )
        .orderBy("p_partkey", "s_suppkey")
    )


MIN_COST_SUPPLIER_SQL = """
WITH eu_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), offers AS (
  SELECT l_partkey AS p_partkey, p.p_name, s.s_suppkey, s.s_name, s.s_acctbal, s.n_name,
         MIN(l_extendedprice * (1 - l_discount) / l_quantity) AS unit_cost
  FROM lineitem
  JOIN part p ON l_partkey = p.p_partkey AND p.p_size <= 15
  JOIN eu_supp s ON l_suppkey = s.s_suppkey
  GROUP BY 1, 2, 3, 4, 5, 6
)
SELECT o.p_partkey, o.p_name, o.s_suppkey, o.s_name, o.s_acctbal,
       o.n_name AS supp_nation, ROUND(o.unit_cost, 6) AS unit_cost
FROM offers o
JOIN (SELECT p_partkey, MIN(unit_cost) AS best_cost FROM offers GROUP BY 1) b
  ON b.p_partkey = o.p_partkey AND o.unit_cost = b.best_cost
ORDER BY o.p_partkey, o.s_suppkey
"""


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue per nation from 1997 orders where customer and
    supplier share the nation, restricted to the ASIA region — the
    six-table join whose defining predicate (c_nationkey ==
    s_nationkey) is a join condition between two DIMENSION paths of the
    same fact row. Dimensions broadcast; the only shuffle is
    lineitem⋈orders on the orderkey."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    asia = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            nation["n_regionkey"] == region["r_regionkey"],
        ).select("n_nationkey", "n_name")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(24,4)")
    return (
        li.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(asia), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


LOCAL_SUPPLIER_VOLUME_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value shipped by NATION_3 suppliers,
    keeping parts whose value exceeds a FRACTION of the nation's total
    — the global-scalar HAVING. The total enters as a 1-row broadcast
    (never a driver-side collect); value sums are exact decimal so the
    threshold compare (2000·value > total, exact decimal arithmetic)
    cannot flip on partial-agg order."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n3_supp = (
        supp.join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_3")),
            supp["s_nationkey"] == nation["n_nationkey"],
        ).select("s_suppkey")
    )
    val = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(24,4)")
    per_part = (
        li.join(F.broadcast(n3_supp), li["l_suppkey"] == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(val).alias("value"))
        .transform(cached)
    )
    total = per_part.agg(F.sum("value").alias("total_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") * 2000 > F.col("total_value"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("value").cast("double").alias("value"),
        )
        .orderBy(F.desc("value"), "p_partkey")
    )


IMPORTANT_PARTS_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,4))) AS value
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3')
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, CAST(value AS DOUBLE) AS value
FROM per_part
WHERE value * 2000 > (SELECT SUM(value) FROM per_part)
ORDER BY value DESC, p_partkey
"""


def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: lineitems shipped LATE (more than 75 days after
    the order date), bucketed by return flag, counting high-priority
    (1-URGENT / 2-HIGH) vs lower-priority orders — the conditional
    CASE-count pair over a fact-fact join with a date-interval
    predicate. Counts are exact longs."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 75 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_priority_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_priority_count"),
        )
        .orderBy("l_returnflag")
    )


LATE_SHIPMENT_PRIORITY_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS high_priority_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
         AS low_priority_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 75 DAY
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def supplier_count_by_part_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many DISTINCT suppliers ship each
    (brand, type, size) part class, with negative predicates on the
    class (not Brand#9, not PROMO, size in a fixed set) and an
    ANTI-JOINED supplier exclusion list (suppliers in bad standing:
    negative account balance — standing in for Q16's complaint-comment
    NOT IN). Distinct-count after broadcast-pruning the fact."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    klass = part.filter(
        (F.col("p_brand") != "Brand#9")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    excluded = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(klass), li["l_partkey"] == F.col("p_partkey"))
        .join(F.broadcast(excluded), li["l_suppkey"] == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


SUPPLIER_COUNT_BY_PART_CLASS_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#9'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def dominant_bolt_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped MORE THAN HALF of some
    bolt part's total 1997 volume — the nested semi-join chain
    (supplier ← lineitem ← part-name filter) with the correlated
    half-of-total threshold decorrelated into a per-part aggregate.
    All quantity sums are exact decimal and the threshold is compared
    as 2·supplier_qty > total_qty — no doubles anywhere, so the
    boundary cannot flip across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    bolts = part.filter(F.col("p_name").like("%bolt")).select("p_partkey")
    li97 = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(bolts), li["l_partkey"] == F.col("p_partkey"), "left_semi")
        .select("l_partkey", "l_suppkey", F.col("l_quantity").cast("decimal(18,2)").alias("qty"))
        .transform(cached)
    )
    per_supp = li97.groupBy("l_partkey", "l_suppkey").agg(F.sum("qty").alias("s_qty"))
    per_part = li97.groupBy(F.col("l_partkey").alias("tp")).agg(
        F.sum("qty").alias("total_qty")
    )
    dominant = (
        per_supp.join(F.broadcast(per_part), per_supp["l_partkey"] == F.col("tp"))
        .filter(per_supp["s_qty"] * 2 > F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(dominant, supp["s_suppkey"] == dominant["l_suppkey"], "left_semi")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            supp["s_nationkey"] == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .orderBy("s_suppkey")
    )


DOMINANT_BOLT_SUPPLIERS_SQL = """
WITH li97 AS (
  SELECT l_partkey, l_suppkey, CAST(l_quantity AS DECIMAL(18,2)) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt')
), per_supp AS (
  SELECT l_partkey, l_suppkey, SUM(qty) AS s_qty FROM li97 GROUP BY 1, 2
), per_part AS (
  SELECT l_partkey, SUM(qty) AS total_qty FROM li97 GROUP BY 1
)
SELECT s_suppkey, s_name, n_name AS nation
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT DISTINCT ps.l_suppkey
  FROM per_supp ps JOIN per_part pp ON ps.l_partkey = pp.l_partkey
  WHERE ps.s_qty * 2 > pp.total_qty)
ORDER BY s_suppkey
"""


QUERIES = {
    "pricing_summary": pricing_summary,
    "top_customers": top_customers,
    "revenue_by_nation": revenue_by_nation,
    "orders_per_customer_rank": orders_per_customer_rank,
    "segment_status_matrix": segment_status_matrix,
    "parts_without_orders": parts_without_orders,
    "supplier_part_volume": supplier_part_volume,
    "order_date_rollup": order_date_rollup,
    "order_priority_rollup": order_priority_rollup,
    "customer_year_setops": customer_year_setops,
    "small_qty_revenue": small_qty_revenue,
    "nation_trade_flows": nation_trade_flows,
    "market_share": market_share,
    "product_profit": product_profit,
    "promo_revenue": promo_revenue,
    "disjunctive_part_revenue": disjunctive_part_revenue,
    "idle_rich_customers": idle_rich_customers,
    "blocking_suppliers": blocking_suppliers,
    "top_supplier": top_supplier,
    "large_orders": large_orders,
    "fuzzy_part_names": fuzzy_part_names,
    "shipping_priority": shipping_priority,
    "priority_order_counts": priority_order_counts,
    "forecast_revenue_change": forecast_revenue_change,
    "returned_item_losses": returned_item_losses,
    "customer_order_distribution": customer_order_distribution,
    "customer_yoy_revenue": customer_yoy_revenue,
    "min_cost_supplier": min_cost_supplier,
    "local_supplier_volume": local_supplier_volume,
    "important_parts": important_parts,
    "late_shipment_priority": late_shipment_priority,
    "supplier_count_by_part_class": supplier_count_by_part_class,
    "dominant_bolt_suppliers": dominant_bolt_suppliers,
    "part_cooccurrence": part_cooccurrence,
    "cooccurrence_triangles": cooccurrence_triangles,
}

ORACLE_SQL = {
    "pricing_summary": PRICING_SUMMARY_SQL,
    "top_customers": TOP_CUSTOMERS_SQL,
    "revenue_by_nation": REVENUE_BY_NATION_SQL,
    "orders_per_customer_rank": ORDERS_PER_CUSTOMER_RANK_SQL,
    "segment_status_matrix": SEGMENT_STATUS_MATRIX_SQL,
    "parts_without_orders": PARTS_WITHOUT_ORDERS_SQL,
    "supplier_part_volume": SUPPLIER_PART_VOLUME_SQL,
    "order_date_rollup": ORDER_DATE_ROLLUP_SQL,
    "order_priority_rollup": ORDER_PRIORITY_ROLLUP_SQL,
    "customer_year_setops": CUSTOMER_YEAR_SETOPS_SQL,
    "small_qty_revenue": SMALL_QTY_REVENUE_SQL,
    "nation_trade_flows": NATION_TRADE_FLOWS_SQL,
    "market_share": MARKET_SHARE_SQL,
    "product_profit": PRODUCT_PROFIT_SQL,
    "promo_revenue": PROMO_REVENUE_SQL,
    "disjunctive_part_revenue": DISJUNCTIVE_PART_REVENUE_SQL,
    "idle_rich_customers": IDLE_RICH_CUSTOMERS_SQL,
    "blocking_suppliers": BLOCKING_SUPPLIERS_SQL,
    "top_supplier": TOP_SUPPLIER_SQL,
    "large_orders": LARGE_ORDERS_SQL,
    "fuzzy_part_names": FUZZY_PART_NAMES_SQL,
    "shipping_priority": SHIPPING_PRIORITY_SQL,
    "priority_order_counts": PRIORITY_ORDER_COUNTS_SQL,
    "forecast_revenue_change": FORECAST_REVENUE_CHANGE_SQL,
    "returned_item_losses": RETURNED_ITEM_LOSSES_SQL,
    "customer_order_distribution": CUSTOMER_ORDER_DISTRIBUTION_SQL,
    "customer_yoy_revenue": CUSTOMER_YOY_REVENUE_SQL,
    "min_cost_supplier": MIN_COST_SUPPLIER_SQL,
    "local_supplier_volume": LOCAL_SUPPLIER_VOLUME_SQL,
    "important_parts": IMPORTANT_PARTS_SQL,
    "late_shipment_priority": LATE_SHIPMENT_PRIORITY_SQL,
    "supplier_count_by_part_class": SUPPLIER_COUNT_BY_PART_CLASS_SQL,
    "dominant_bolt_suppliers": DOMINANT_BOLT_SUPPLIERS_SQL,
    "part_cooccurrence": PART_COOCCURRENCE_SQL,
    "cooccurrence_triangles": COOCCURRENCE_TRIANGLES_SQL,
}
