package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime re-planning guards: the two AQE/DPP behaviors the 100 TB
  * plans lean on must actually engage on this Spark build —
  * - AQE skew-join splitting (the zero-code alternative to the manual
  *   salted join in operators/SkewJoin: AQE splits oversized shuffle
  *   partitions at runtime, so a skewed key doesn't serialize one task);
  * - dynamic partition pruning (a selective dim filter prunes fact
  *   partitions at runtime — the star-schema scan killer).
  */
class AdaptiveExecSpec extends AnyFunSuite with SparkTestBase {

  test("AQE splits a skewed shuffle partition (skew=true in final plan)") {
    import spark.implicits._
    val conf = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      // one hot key carrying ~99% of the rows, plus a long tail
      val skewed = spark.range(0, 200000)
        .select(when(col("id") % 100 =!= 0, 0L).otherwise(col("id")).as("k"),
          concat(lit("payload_"), col("id")).as("v"))
      val dim = spark.range(0, 2000).select(col("id").as("k"),
        concat(lit("d_"), col("id")).as("d"))
      val joined = skewed.join(dim, "k")
      // execute through THIS QueryExecution — collect() runs
      // joined.queryExecution itself; write/foreach/count each plan a
      // fresh one and would leave this adaptive plan unfinalized
      // 198001 rows with k=0 (all non-multiples of 100, plus id=0) and
      // 19 tail keys 100..1900 matching the 2000-key dim
      assert(joined.collect().length === 198020)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("dynamic partition pruning fires on a partitioned fact scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    import spark.implicits._
    // fact partitioned by a date-like key; dim maps keys to a category
    spark.range(0, 20000)
      .select(col("id"), (col("id") % 20).as("part_key"))
      .write.partitionBy("part_key").mode("overwrite").parquet(s"$dir/fact")
    (0L until 20L).map(k => (k, if (k < 2) "hot" else "cold"))
      .toDF("part_key", "cat")
      .write.mode("overwrite").parquet(s"$dir/dim")
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      // broadcast path is the common DPP trigger; keep it enabled
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").where(col("cat") === "hot")
      val joined = fact.join(dim, "part_key")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"no dynamic partition pruning in plan:\n$plan")
      // and the pruned result is correct: only 2 of 20 partitions survive
      assert(joined.count() === 2000)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("AQE erases the LSH hot-star branch when no bucket saturates") {
    // LshBandJoin's saturated-bucket star join is UNHINTED by design:
    // on a healthy corpus the saturated list is empty and AQE's
    // empty-relation propagation must remove the whole branch at
    // runtime (LocalTableScan in the final plan, not a join) — the
    // plan-level proof that the bounded-buffer form pays no second
    // pass in the common case.
    import spark.implicits._
    val bands = (0L until 200L).flatMap(i =>
      Seq((i, s"b${i % 40}"), (i, s"c${i % 37}"))).toDF("id", "band_key")
    val pairs = graft.operators.LshBandJoin
      .candidatePairs(bands, "id", maxBucket = 1024)
    // Execute THIS Dataset (count() builds its own QueryExecution, which
    // would leave pairs' adaptive plan un-finalized — isFinalPlan=false —
    // and the assertions below reading the initial, pre-AQE plan).
    assert(pairs.collect().length > 0)
    val planStr = pairs.queryExecution.executedPlan.toString
    assert(planStr.contains("isFinalPlan=true"),
      s"adaptive plan not finalized — assertions would be vacuous:\n${
        planStr.take(2000)}")
    // The finalized string prints BOTH sections; the initial plan still
    // (correctly) shows the pre-AQE union + hot-star join, so the
    // assertions must scope to the final section only.
    val finalPlan = planStr.split("== Initial Plan ==").head
    // The healthy-corpus contract: AQE's empty-relation propagation
    // erases the hot-star side entirely — no Union of the two branches
    // and NO runtime join of any strategy remains (the hot-star branch
    // is the plan's only join; on local inputs it would plan as
    // BroadcastHashJoin, so checking just SortMergeJoin proves
    // nothing).
    assert(!finalPlan.contains("Union"),
      s"empty hot branch not propagated away:\n${finalPlan.take(2000)}")
    assert(!finalPlan.contains("Join"),
      s"hot-star branch survived as a runtime join on a healthy corpus:\n${
        finalPlan.take(2000)}")
  }
}
