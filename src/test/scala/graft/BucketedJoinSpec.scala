package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located join via bucketing: both sides bucketed by the join key
  * land pre-partitioned, so the join plans WITHOUT a shuffle exchange —
  * the 100 TB answer for repeated large-x-large joins on a stable key
  * (bucket once at write time, join shuffle-free forever after).
  */
class BucketedJoinSpec extends AnyFunSuite with SparkTestBase {

  test("bucketed tables join without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.read.parquet(s"$dir/orders.parquet")
        .write.mode(SaveMode.Overwrite)
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("orders_bkt")
      spark.read.parquet(s"$dir/customer.parquet")
        .write.mode(SaveMode.Overwrite)
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("customer_bkt")

      val joined = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString

      // the join itself must not introduce a shuffle on either side
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      // and the result matches the plain (shuffled) join
      val expected = spark.read.parquet(s"$dir/orders.parquet")
        .join(spark.read.parquet(s"$dir/customer.parquet"),
          col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }

  test("bucketed warehouse table: multi-batch, idempotent, catalog-recoverable") {
    import graft.run.Orchestrator
    val dir = "/root/testdata/sf0.001"
    val wh = java.nio.file.Files.createTempDirectory("graft_bkt_wh").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = spark.read.parquet(s"$dir/orders.parquet")
      val b1 = orders.where(col("o_orderkey") % 2 === 0)
      val b2 = orders.where(col("o_orderkey") % 2 === 1)

      // two successive batches through the bucketed write path
      new Orchestrator.Run(spark, wh, "BATCH000001")
        .writeBucketedBatch(b1, "gold/orders_bkt", Seq("o_custkey"), 8)
      val run2 = new Orchestrator.Run(spark, wh, "BATCH000002")
      val n2 = run2.writeBucketedBatch(b2, "gold/orders_bkt", Seq("o_custkey"), 8)

      // S8 idempotency: a re-run of batch 2 replaces its own partition
      val n2b = new Orchestrator.Run(spark, wh, "BATCH000002")
        .writeBucketedBatch(b2, "gold/orders_bkt", Seq("o_custkey"), 8)
      assert(n2b === n2)
      val total = run2.readBucketed("gold/orders_bkt").count()
      assert(total === orders.count())

      // bucketing survives insertInto: a join on the bucket key over
      // BOTH batch partitions still plans without a shuffle on the
      // bucketed side (dim side bucketed too → no exchange at all)
      spark.read.parquet(s"$dir/customer.parquet")
        .write.mode(SaveMode.Overwrite)
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("customer_bkt2")
      def joined = run2.readBucketed("gold/orders_bkt")
        .join(spark.table("customer_bkt2"),
          col("o_custkey") === col("c_custkey"))
      assert(!joined.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"),
        joined.queryExecution.executedPlan.toString)

      // and a group-by on the bucket key reuses the write-time
      // partitioning as well — no exchange before the aggregate
      val agg = run2.readBucketed("gold/orders_bkt")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      assert(!agg.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"),
        agg.queryExecution.executedPlan.toString)

      // catalog loss (fresh cluster, durable files): DROP on an external
      // table removes only metadata; re-registration recovers the
      // partitions AND the bucket-spec-driven plan shape
      spark.sql("DROP TABLE gold_orders_bkt")
      val run3 = new Orchestrator.Run(spark, wh, "BATCH000003")
      run3.ensureBucketedRegistered("gold/orders_bkt", Seq("o_custkey"), 8)
      assert(run3.readBucketed("gold/orders_bkt").count() === total)
      assert(!joined.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS gold_orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt2")
    }
  }
}
