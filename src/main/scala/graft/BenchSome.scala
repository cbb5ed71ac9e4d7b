package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: Bench's exact timing discipline (same session shape, noop
  * sink, one untimed session warmup + per-query warmup run + median of
  * the timed runs) applied to a NAMED SUBSET of queries — the
  * measure-first loop's fast inner cycle, so a candidate optimization
  * is judged on the same statistic the driver's bench reports without
  * paying the full 228-row sweep. Never replaces graft.Bench: the
  * round's committed before/after evidence is the full bench artifact.
  *
  * Usage: runMain graft.BenchSome [sfDir] queryName...
  * Env: SPARK_GRAFT_BENCH_RUNS (default 3; 1 warmup + rest timed)
  */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHED_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val benchRuns = math.max(2,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    try run("q_surrogate_lookup") catch { case _: Throwable => () }
    names.filter(_ == "lifecycle").foreach { _ =>
      // pseudo-row: the LifecycleBench walk (min over 2 fresh
      // warehouses — its own noise discipline), for iterating on the
      // maintenance plane without the full bench
      val stages = graft.run.LifecycleBench.run(spark, sfDir, 2)
      println("BENCHSOME lifecycle " + stages.map { case (k, v) =>
        f"$k=$v%.3f" }.mkString(" "))
    }
    names.filterNot(_ == "lifecycle").foreach { name =>
      try {
        run(name) // per-query warmup (excluded, the Bench discipline)
        val ts = (1 until benchRuns).map(_ => run(name)).sorted
        val med = if (ts.size % 2 == 1) ts(ts.size / 2)
                  else (ts(ts.size / 2 - 1) + ts(ts.size / 2)) / 2
        println(f"BENCHSOME $name%-40s med=$med%.3f s spread=${ts.last - ts.head}%.3f runs=${ts.size}")
      } catch { case e: Throwable =>
        println(s"BENCHSOME $name ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
