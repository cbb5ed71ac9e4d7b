package graft.queries

import graft.Tables.t
import graft.Exact._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Window functions — SURVEY.md §2.5 (W1-W6) + §2.6 top-k. Every window
  * ordering carries a unique tiebreak key (orderkey) so results are
  * deterministic across engines (SURVEY §7.4.5). ROW_NUMBER/RANK are cast
  * to BIGINT to match DuckDB's window-function result type.
  */
object WindowQueries extends QueryPack {

  /** One oracle for both trailing-window forms (whole-key-window
    * q_window_trailing_range and two-grid-cell
    * q_window_trailing_scalable): the forms must hash-match each other
    * through it.
    */
  private val trailingRangeOracle =
    """SELECT o_custkey, o_orderkey,
                CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
                  AS epoch_day,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                  PARTITION BY o_custkey
                  ORDER BY CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                    AS BIGINT)
                  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
                  AS trailing30_sales
         FROM orders"""

  val queries: Map[String, Q] = Map(
    // W1: ROW_NUMBER dedup-keep-latest (latest order per customer).
    // Ref: tools.load_crm_cust_info_v1.sql:102-112
    "q_window_dedup_latest" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("o_custkey"),
          col("o_orderkey").as("latest_orderkey"),
          col("o_orderdate").cast(DateType).as("latest_orderdate"),
          col("o_totalprice").as("latest_totalprice"))
    }),

    // W2: ROW_NUMBER surrogate key over a global ordering. Single-task at
    // dim scale (25 rows); the 100TB path for big dims is
    // zipWithIndex/monotonically_increasing_id (SURVEY §7.3).
    // Ref: Integration_dim_customers.sql:2-5
    "q_window_surrogate_key" -> ((s, dir) => {
      t(s, dir, "nation")
        .select(
          row_number().over(Window.orderBy(col("n_name"), col("n_nationkey")))
            .cast(LongType).as("nation_key"),
          col("n_name"), col("n_nationkey"))
    }),

    // W3: LEAD - 1 day SCD2 end-dating (order validity windows per customer).
    // Ref: tools.load_crm_prd_info_v1.sql:90-96
    "q_window_scd2_enddate" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast(DateType).as("valid_from"),
        date_sub(lead(col("o_orderdate"), 1).over(w).cast(DateType), 1)
          .as("valid_to"))
    }),

    // W4 + A5: LAG inter-order gap, then AVG per customer.
    // Ref: materialized_view.sql:96-111
    "q_window_order_gap" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
        .where(col("prev_date").isNotNull) // P8: drop first row per partition
        .withColumn("gap_days",
          datediff(col("o_orderdate").cast(DateType), col("prev_date").cast(DateType))
            .cast(LongType))
        .groupBy(col("o_custkey"))
        .agg(
          (sum(col("gap_days")).cast(DoubleType) / count(lit(1))).as("avg_gap_days"),
          cnt.as("n_gaps"))
    }),

    // W5: running SUM with explicit ROWS frame.
    // Ref: materialized_view.sql:42-53
    "q_window_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast(DoubleType).as("running_sales"))
    }),

    // Time-RANGE window frame (RANGE BETWEEN 30 PRECEDING AND CURRENT
    // ROW over epoch days): trailing spend per customer over the
    // current day plus the prior 30 — 31 calendar days inclusive
    // (day-30 through day-0; a true 30-day window would be
    // rangeBetween(-29, 0)) — the
    // frame rows-offsets cannot express (bounded by VALUE distance:
    // same-day orders are peers sharing one frame, calendar gaps
    // shrink it). Range frames are peer-inclusive, so ties need no
    // ordering tiebreak to be deterministic. Scale: one custkey
    // shuffle like any partitioned window; the epoch-day long keeps
    // the range arithmetic integer-exact and the decimal sum keeps
    // money exact on both engines.
    "q_window_trailing_range" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("epoch_day")).rangeBetween(-30, 0)
      t(s, dir, "orders")
        .withColumn("epoch_day",
          datediff(col("o_orderdate"), to_date(lit("1970-01-01")))
            .cast(LongType))
        .select(col("o_custkey"), col("o_orderkey"), col("epoch_day"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
            .cast(DoubleType).as("trailing30_sales"))
    }),

    // The hot-key production form of q_window_trailing_range: identical
    // semantics, but the trailing frame runs inside (custkey, time-cell)
    // partitions over HorizonAgg's two offset grids, so a customer who
    // is 40% of a 100 TB fact table spreads across its time cells
    // instead of landing one whole-history window task (the
    // q_join_asof_epoch argument, for RANGE frames). Same oracle as
    // q_window_trailing_range — the two forms must hash-match
    // through it.
    "q_window_trailing_scalable" -> ((s, dir) => {
      val base = t(s, dir, "orders")
        .withColumn("epoch_day",
          datediff(col("o_orderdate"), to_date(lit("1970-01-01")))
            .cast(LongType))
        .select(col("o_custkey"), col("o_orderkey"), col("epoch_day"),
          col("o_totalprice"))
      graft.operators.HorizonAgg.backward(base, Seq("o_custkey"),
          "epoch_day", horizonMicros = 30L,
          aggs = Seq("t30" ->
            sum(col("o_totalprice").cast(DecimalType(18, 2)))))
        .select(col("o_custkey"), col("o_orderkey"), col("epoch_day"),
          col("t30").cast(DoubleType).as("trailing30_sales"))
    }),

    // W6 + P6 + O2: RANK top-3 parts per brand by exact revenue.
    // Ref: materialized_view.sql:57-76
    "q_window_topk_per_group" -> ((s, dir) => {
      // NO scan spread here (r21 resume: tried per the range_binned
      // precedent, MEASURED flat-to-worse, reverted): the revenue map
      // feeds a map-side-combinable aggregate, so the original plan
      // shuffles only partials — the spread traded that for a 13.5 MB
      // row exchange (written by the same 3 scan tasks) AND fanned the
      // partial-agg output 10x (each of 32 tasks emits up to |part|
      // partial rows; guide §2.3 "aggregate before you shuffle")
      val revenue = t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_partkey"))
        .agg(sum(money2(col("l_extendedprice")) * rate2(lit(1.0) - col("l_discount")))
          .cast(DoubleType).as("revenue"))
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("revenue").desc, col("p_partkey"))
      revenue
        .withColumn("rank_sales", rank().over(w).cast(LongType))
        .where(col("rank_sales") <= 3)
    }),

    // Decile analysis per market: purchasing users ranked into NTILE
    // deciles of total spend WITHIN their nation. The window partitions
    // by nation (lint-safe — the same per-key bound as every PARTITION
    // BY window here); the spend aggregate shuffles on user_id. The
    // customer join deliberately carries NO broadcast hint — the user
    // dim grows with the corpus (millions of rows at 100 TB), so the
    // planner/AQE must stay free to pick sort-merge; both join sides
    // already hash by user_id. Spend sums through the decimal cast so
    // the rank order is cross-engine exact.
    "q_window_ntile_deciles" -> ((s, dir) => {
      val spend = graft.Tables.events(s, dir)
        .where(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(dsum(col("value")).as("total_spend"))
      val cust = t(s, dir, "customer")
        .select(col("c_custkey").as("user_id"),
          col("c_nationkey").as("nation"))
      val w = Window.partitionBy(col("nation"))
        .orderBy(col("total_spend").desc, col("user_id"))
      spend.join(cust, "user_id")
        .withColumn("decile", ntile(10).over(w).cast(LongType))
    }))

  val oracleSql: Map[String, String] = Map(
    "q_window_dedup_latest" ->
      """SELECT o_custkey, o_orderkey AS latest_orderkey,
                CAST(o_orderdate AS DATE) AS latest_orderdate,
                o_totalprice AS latest_totalprice
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
         WHERE rn = 1""",
    "q_window_surrogate_key" ->
      """SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_name, n_nationkey) AS BIGINT)
                  AS nation_key,
                n_name, n_nationkey
         FROM nation""",
    "q_window_scd2_enddate" ->
      """SELECT o_custkey, o_orderkey,
                CAST(o_orderdate AS DATE) AS valid_from,
                CAST(LEAD(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey) - INTERVAL 1 DAY AS DATE)
                  AS valid_to
         FROM orders""",
    "q_window_order_gap" ->
      """WITH gaps AS (
           SELECT o_custkey, o_orderdate,
                  LAG(o_orderdate) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS prev_date
           FROM orders)
         SELECT o_custkey,
                CAST(SUM(CAST(DATE_DIFF('day', CAST(prev_date AS DATE),
                  CAST(o_orderdate AS DATE)) AS BIGINT)) AS DOUBLE) / COUNT(*)
                  AS avg_gap_days,
                COUNT(*) AS n_gaps
         FROM gaps WHERE prev_date IS NOT NULL
         GROUP BY o_custkey""",
    "q_window_running_sum" ->
      """SELECT o_custkey, o_orderkey,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                  AS running_sales
         FROM orders""",
    "q_window_trailing_range" -> trailingRangeOracle,
    // identical contract on purpose: the whole-key-window and
    // two-grid-cell forms must agree through one oracle
    "q_window_trailing_scalable" -> trailingRangeOracle,
    "q_window_topk_per_group" ->
      """WITH revenue AS (
           SELECT p_brand, p_partkey,
                  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
           FROM lineitem JOIN part ON l_partkey = p_partkey
           GROUP BY p_brand, p_partkey)
         SELECT p_brand, p_partkey, revenue,
                CAST(rank_sales AS BIGINT) AS rank_sales
         FROM (SELECT *, RANK() OVER (PARTITION BY p_brand
                 ORDER BY revenue DESC, p_partkey) AS rank_sales FROM revenue)
         WHERE rank_sales <= 3""",
    "q_window_ntile_deciles" ->
      """WITH spend AS (
           SELECT user_id,
                  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                    AS total_spend
           FROM events WHERE event_type = 'purchase' GROUP BY user_id)
         SELECT s.user_id, c.c_nationkey AS nation, s.total_spend,
                CAST(NTILE(10) OVER (PARTITION BY c.c_nationkey
                  ORDER BY s.total_spend DESC, s.user_id) AS BIGINT) AS decile
         FROM spend s JOIN customer c ON s.user_id = c.c_custkey""")
}
