package graft

import graft.run.Orchestrator
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Small-file compaction: bin-pack a layer table's batch partitions to
  * target-sized files, content-preserving, idempotent, and refused on
  * bucketed tables (whose bucket-to-file mapping a blind rewrite would
  * break).
  */
class CompactionSpec extends AnyFunSuite with SparkTestBase {

  private def parquetFiles(dir: String): Array[java.io.File] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
  }

  test("compaction bin-packs partitions, preserves content, and is idempotent") {
    val dir = "/root/testdata/sf0.001"
    val wh = java.nio.file.Files.createTempDirectory("graft_compact_wh").toString
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .withColumn("dwh_batch_id",
        concat(lit("B"), (col("o_orderkey") % 3).cast("string")))

    // land 3 batches x 20 small files each (the ingest-cadence storm)
    orders.repartition(20)
      .write.partitionBy("dwh_batch_id").parquet(s"$wh/bronze/orders")
    val before = parquetFiles(s"$wh/bronze/orders/dwh_batch_id=B0").length
    assert(before === 20)

    val baseline = orders.groupBy("dwh_batch_id")
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice").cast("decimal(18,2)")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet

    val run = new Orchestrator.Run(spark, wh, "MAINT01")
    val compacted = run.compactBatches("bronze/orders")
    assert(compacted.map(_._1).toSet
      === Set("dwh_batch_id=B0", "dwh_batch_id=B1", "dwh_batch_id=B2"))
    compacted.foreach { case (_, nBefore, nAfter) =>
      assert(nBefore === 20); assert(nAfter === 1)
    }
    assert(parquetFiles(s"$wh/bronze/orders/dwh_batch_id=B0").length === 1)

    // content identical after the rewrite (counts + exact sums per batch)
    val after = spark.read.parquet(s"$wh/bronze/orders")
      .groupBy("dwh_batch_id")
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice").cast("decimal(18,2)")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    assert(after === baseline)

    // idempotent: a second run finds nothing to rewrite
    assert(run.compactBatches("bronze/orders").isEmpty)

    // audit plane recorded the rewrites
    assert(run.auditLog.count(l => l.step == "compact"
      && l.status == "SUCCESS") === 3)
  }

  test("compaction refuses bucketed tables") {
    val dir = "/root/testdata/sf0.001"
    val wh = java.nio.file.Files.createTempDirectory("graft_compact_bkt").toString
    try {
      val run = new Orchestrator.Run(spark, wh, "BATCH000001")
      run.writeBucketedBatch(
        spark.read.parquet(s"$dir/orders.parquet"),
        "gold/orders_cbkt", Seq("o_custkey"), 4)
      val e = intercept[IllegalArgumentException] {
        run.compactBatches("gold/orders_cbkt")
      }
      assert(e.getMessage.contains("bucketed"))
    } finally spark.sql("DROP TABLE IF EXISTS gold_orders_cbkt")
  }

  test("compaction refuses the ANN generation-plane tables by prescription") {
    val wh = java.nio.file.Files.createTempDirectory("graft_compact_ann").toString
    val run = new Orchestrator.Run(spark, wh, "BATCH000001")
    // a raw-path scan would silently no-op (the tables live under the
    // generation dir), and a generation-dir swap would race a rebuild's
    // commit — the refusal must name the rebuild as the compaction path
    for (t <- Seq("indexes/ann_lists", "indexes/ann_centroids")) {
      val e = intercept[IllegalArgumentException] {
        run.compactBatches(t)
      }
      assert(e.getMessage.contains("rebuildAnnIndex"), t)
    }
  }
}
