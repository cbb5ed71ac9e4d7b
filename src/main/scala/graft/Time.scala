package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time selected registered queries (noop-sink materialized,
  * same discipline as Bench) with a warmup pass, so hot-spot work can
  * iterate without running the full bench.
  *
  * Usage: runMain graft.Time [sfDir] [queryName...]
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE sizes cached plans by bytes (scale-neutral; see Bench)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    run("q_surrogate_lookup") // warmup
    names.foreach { n =>
      val t1 = run(n)
      val t2 = run(n)
      // Locale-pinned like Bench, so output parses the same everywhere.
      println(String.format(java.util.Locale.ROOT,
        "TIME %-28s run1=%7.3f s  run2=%7.3f s", n, Double.box(t1), Double.box(t2)))
    }
    spark.stop()
  }
}
