package graft.queries

import graft.Tables.t
import graft.Exact._
import graft.plans.Recursion
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** J5: the recursive self-join with a theta conjunct (delayed-orders
  * chain, materialized_view.sql:127-149) re-expressed over `orders`.
  * Seed = urgent orders; a chain step links to a later order of the same
  * customer within 30 days. The equi key (o_custkey) stays the join key
  * so each level is a hash join; the date conjuncts are post-join
  * filters. Levels capped at 4 on both engines.
  */
object RecursiveQueries extends QueryPack {
  private val MaxLevels = 4

  val queries: Map[String, Q] = Map(
    "q_recursive_chain" -> ((s, dir) => {
      // NO cut + keyed repartition here (r21: tried the
      // delayedOrdersChain discipline, MEASURED WORSE 1.07 -> 1.51 s,
      // reverted): this base is a BARE pushdown scan — re-reading 3
      // parquet columns per level costs less than materializing and
      // re-exchanging them once. The cut pays off only when the base
      // is itself a derived slice (distinct + aggregate + join), as in
      // the seeded delayed chain.
      val orders = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      val seed = t(s, dir, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          lit(1L).as("level"))

      def step(prev: org.apache.spark.sql.DataFrame) = {
        val p = prev.select(
          col("o_custkey").as("p_custkey"),
          col("o_orderdate").as("p_orderdate"),
          col("level").as("p_level"))
        orders.join(p, col("o_custkey") === col("p_custkey")
            && col("o_orderdate") > col("p_orderdate")
            && col("o_orderdate") <= col("p_orderdate") + expr("INTERVAL 30 DAYS"))
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            (col("p_level") + 1L).as("level"))
      }

      Recursion.iterate(seed, step, MaxLevels)
        .groupBy(col("level"))
        .agg(cnt.as("n_chain_rows"),
          countDistinct(col("o_orderkey")).cast(LongType).as("n_distinct_orders"))
    }),

    // The same chain via Spark 4's native WITH RECURSIVE — the engine
    // runs the fixpoint loop (one hash join per level, recursion capped
    // by the level predicate) instead of the driver-side iterate in
    // plans/Recursion.scala. Both variants stay registered: the manual
    // loop controls checkpointing per level (the 100 TB lever), the CTE
    // form is the declarative path now that the engine supports it.
    "q_recursive_cte" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("rec_orders")
      s.sql(
        s"""WITH RECURSIVE chain AS (
              SELECT o_custkey, o_orderkey, o_orderdate, CAST(1 AS BIGINT) AS level
              FROM rec_orders WHERE o_orderpriority = '1-URGENT'
              UNION ALL
              SELECT o.o_custkey, o.o_orderkey, o.o_orderdate, c.level + 1
              FROM rec_orders o JOIN chain c
                ON o.o_custkey = c.o_custkey
               AND o.o_orderdate > c.o_orderdate
               AND o.o_orderdate <= c.o_orderdate + INTERVAL 30 DAYS
              WHERE c.level < $MaxLevels)
            SELECT level, COUNT(*) AS n_chain_rows,
                   CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct_orders
            FROM chain GROUP BY level""")
    }))

  val oracleSql: Map[String, String] = Map(
    "q_recursive_chain" ->
      """WITH RECURSIVE chain AS (
           SELECT o_custkey, o_orderkey, o_orderdate, CAST(1 AS BIGINT) AS level
           FROM orders WHERE o_orderpriority = '1-URGENT'
           UNION ALL
           SELECT o.o_custkey, o.o_orderkey, o.o_orderdate, c.level + 1
           FROM orders o
           JOIN chain c ON o.o_custkey = c.o_custkey
             AND o.o_orderdate > c.o_orderdate
             AND o.o_orderdate <= c.o_orderdate + INTERVAL 30 DAY
           WHERE c.level < 4)
         SELECT level, COUNT(*) AS n_chain_rows,
                CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct_orders
         FROM chain GROUP BY level""",
    "q_recursive_cte" ->
      """WITH RECURSIVE chain AS (
           SELECT o_custkey, o_orderkey, o_orderdate, CAST(1 AS BIGINT) AS level
           FROM orders WHERE o_orderpriority = '1-URGENT'
           UNION ALL
           SELECT o.o_custkey, o.o_orderkey, o.o_orderdate, c.level + 1
           FROM orders o
           JOIN chain c ON o.o_custkey = c.o_custkey
             AND o.o_orderdate > c.o_orderdate
             AND o.o_orderdate <= c.o_orderdate + INTERVAL 30 DAY
           WHERE c.level < 4)
         SELECT level, COUNT(*) AS n_chain_rows,
                CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct_orders
         FROM chain GROUP BY level""")
}
