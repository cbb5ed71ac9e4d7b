package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-JOB breakdown of one registered query's noop-sink run —
  * wall per Spark job, stage/task counts, shuffle bytes — so hot-spot
  * work targets the job that actually costs (guide §1: measure first,
  * §7.1: map stages back to operators). Same session shape as Bench.
  *
  * Usage: runMain graft.Profile [sfDir] queryName...
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val repeats = 1
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

    final case class Job(id: Int, desc: String, start: Long,
                         var end: Long = 0L, var stages: Int = 0,
                         var tasks: Int = 0, var shuffleRead: Long = 0L,
                         var shuffleWrite: Long = 0L,
                         var runTimeMs: Long = 0L)
    val jobs = new scala.collection.mutable.ArrayBuffer[Job]()
    val stageToJob = new scala.collection.mutable.HashMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          jobs += Job(e.jobId,
            Option(e.properties.getProperty("spark.job.description"))
              .getOrElse(""), e.time)
          e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.find(_.id == e.jobId).foreach(_.end = e.time)
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          val s = e.stageInfo
          stageToJob.get(s.stageId)
            .flatMap(jid => jobs.find(_.id == jid)).foreach { j =>
            j.stages += 1
            j.tasks += s.numTasks
            j.shuffleRead += s.taskMetrics.shuffleReadMetrics.remoteBytesRead +
              s.taskMetrics.shuffleReadMetrics.localBytesRead
            j.shuffleWrite += s.taskMetrics.shuffleWriteMetrics.bytesWritten
            j.runTimeMs += s.taskMetrics.executorRunTime
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    def run(qname: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(qname)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    run("q_surrogate_lookup") // session warmup
    names.foreach { name =>
      run(name) // per-query warmup (bench discipline: excluded)
      (1 to repeats).foreach { i =>
        jobs.synchronized(jobs.clear())
        val wall = run(name)
        val snapshot = jobs.synchronized(jobs.toVector)
        println(f"RUN $i%d $name%s wall=$wall%.3f s, jobs=${snapshot.size}%d")
        snapshot.foreach { j =>
          println(f"  job ${j.id}%4d ${(j.end - j.start) / 1e3}%7.3f s stages=${j.stages}%2d tasks=${j.tasks}%4d shufR=${j.shuffleRead}%9d shufW=${j.shuffleWrite}%9d cpuMs=${j.runTimeMs}%6d ${j.desc.take(60)}%s")
        }
        val jobSum = snapshot.map(j => (j.end - j.start) / 1e3).sum
        println(f"  sum(job wall)=$jobSum%.3f s (gap to wall = driver/planning time)")
      }
    }
    spark.sparkContext.removeSparkListener(listener)
    spark.stop()
  }
}
