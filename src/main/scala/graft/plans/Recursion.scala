package graft.plans


import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{count, lit}

/** Iterative UNION ALL fixpoint — the Spark-side replacement for
  * Postgres `WITH RECURSIVE` (reference: sql/gold/materialized_view.sql:127-149,
  * the delayed-orders chain). Spark SQL has no recursive CTE, so the
  * recursion becomes a driver loop: seed, then repeatedly apply `step`
  * to the previous frontier and union, until the frontier is empty or
  * the level cap trips.
  *
  * Scale notes (100 TB): each level is a full distributed join — only the
  * loop control lives on the driver, never row data. Lineage is cut each
  * level so plans don't grow exponentially ([[Checkpoints]] —
  * localCheckpoint by default, reliable checkpoint under
  * spark.graft.checkpoint.dir for cluster fault tolerance).
  * The equi conjunct of the step join should stay the join key so each
  * level is a hash join (theta conjuncts become post-join filters).
  *
  * ONE action per level (optimization guide §1/§2 — the KCore
  * Observation discipline): the frontier row count rides the level
  * cut's materialization as an Observation instead of a second
  * `isEmpty` job per level — halving the actions (and, at scale, the
  * scheduling barriers) the loop schedules.
  */
object Recursion {
  def iterate(seed: DataFrame, step: DataFrame => DataFrame,
              maxLevels: Int): DataFrame = {
    // every level's frontier is read by the final union — PINNED, and
    // reclaimed (reliable policy) by one sealing materialization
    val chain = Checkpoints.chain()
    def pinCounted(df: DataFrame): (DataFrame, Long) = {
      val obs = org.apache.spark.sql.Observation()
      val out = chain.pin(df.observe(obs, count(lit(1)).as("n")))
      (out, obs.get("n").asInstanceOf[Long])
    }
    var (frontier, n) = pinCounted(seed)
    var acc = frontier
    var level = 1
    while (level < maxLevels && n > 0L) {
      val (f2, n2) = pinCounted(step(frontier))
      frontier = f2
      n = n2
      acc = acc.unionAll(frontier)
      level += 1
    }
    chain.sealIfReliable(acc)
  }
}
