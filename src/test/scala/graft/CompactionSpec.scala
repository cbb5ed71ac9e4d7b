package graft

import graft.run.{Orchestrator, WarehouseFs}
import graft.sources.CompactedLayout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pointer-committed small-file compaction: bin-pack a layer table's
  * batch partitions into hidden generation dirs, commit each partition
  * with one atomic pointer publish (no directory rename — atomic on
  * object stores too), park the previous layout as the in-flight
  * grace window, GC it through vacuumCompacted. Content-preserving,
  * idempotent, crash-healing, and refused on bucketed and
  * generation-pointer tables.
  */
class CompactionSpec extends AnyFunSuite with SparkTestBase {

  private def parquetFiles(dir: String): Array[java.io.File] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
  }

  private def landOrders(wh: String): Set[(String, Long, java.math.BigDecimal)] = {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .withColumn("dwh_batch_id",
        concat(lit("B"), (col("o_orderkey") % 3).cast("string")))
    // land 3 batches x 20 small files each (the ingest-cadence storm)
    orders.repartition(20)
      .write.partitionBy("dwh_batch_id").parquet(s"$wh/bronze/orders")
    orders.groupBy("dwh_batch_id")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
      .toSet
  }

  private def batchSums(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("dwh_batch_id")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
      .toSet

  test("compaction pointer-commits, preserves content, parks, GCs, is idempotent") {
    val wh = java.nio.file.Files.createTempDirectory("graft_compact_wh").toString
    val baseline = landOrders(wh)
    val part0 = s"$wh/bronze/orders/dwh_batch_id=B0"
    assert(parquetFiles(part0).length === 20)

    val run = new Orchestrator.Run(spark, wh, "MAINT01")
    val compacted = run.compactBatches("bronze/orders")
    assert(compacted.map(_._1).toSet
      === Set("dwh_batch_id=B0", "dwh_batch_id=B1", "dwh_batch_id=B2"))
    compacted.foreach { case (_, nBefore, nAfter) =>
      assert(nBefore === 20); assert(nAfter === 1)
    }

    // the commit is a pointer naming a UNIQUE generation dir, the live
    // layout is that dir, and the previous loose files are PARKED
    // (grace window), so a plain root read stays content-identical
    // until GC
    assert(CompactedLayout.liveGen(part0) === 1L)
    assert(parquetFiles(CompactedLayout.livePartitionPath(part0)).length === 1)
    assert(parquetFiles(part0).length === 20, "parked, not deleted")
    assert(batchSums(spark.read.parquet(s"$wh/bronze/orders")) === baseline)

    // the resolver read routes through the pointers — and PRUNES:
    // a batch filter must plan as a PartitionFilter, not a post-scan
    val resolved = run.readTable("bronze/orders")
    assert(batchSums(resolved) === baseline)
    val pruned = resolved.where(col("dwh_batch_id") === "B1")
    assert(pruned.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [isnotnull(dwh_batch_id"),
      "partition pruning must survive the pointer-routed path list")
    assert(pruned.count() === baseline.find(_._1 == "B1").get._2)

    // idempotent: the live layout is already optimal
    assert(run.compactBatches("bronze/orders").isEmpty)

    // GC the parked layout through the vacuum plane
    val gcd = run.vacuumCompacted("bronze/orders")
    assert(gcd.map(_._1).toSet
      === Set("dwh_batch_id=B0", "dwh_batch_id=B1", "dwh_batch_id=B2"))
    gcd.foreach { case (_, parked, staleGens) =>
      assert(parked === 20); assert(staleGens === 0)
    }
    assert(parquetFiles(part0).isEmpty, "parked files dropped")
    assert(batchSums(run.readTable("bronze/orders")) === baseline)
    assert(run.vacuumCompacted("bronze/orders").isEmpty, "GC idempotent")

    // audit plane recorded rewrites and the GC
    assert(run.auditLog.count(l => l.step == "compact"
      && l.status == "SUCCESS") === 3)
    assert(run.auditLog.count(l => l.step == "vacuum_compact"
      && l.status == "SUCCESS") === 3)

    // a SECOND compaction generation: re-split the live gen is not
    // possible (content-preserving), so force one by compacting with a
    // tiny target after re-landing many files — instead assert the
    // gen-2 path via a fresh batch landed loose then compacted again
    new Orchestrator.Run(spark, wh, "B9").writeBatch(
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .limit(100).repartition(5), "bronze/orders")
    val second = run.compactBatches("bronze/orders")
    assert(second.map(_._1) === Seq("dwh_batch_id=B9"))
    assert(CompactedLayout.liveGen(s"$wh/bronze/orders/dwh_batch_id=B9") === 1L)
  }

  test("pointer commit works on an object-store scheme (no atomic renames)") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.s3a.impl", classOf[MockS3aFileSystem].getName)
    val local = java.nio.file.Files
      .createTempDirectory("graft_compact_s3").toString
    val wh = s"s3a://$local"
    assert(!WarehouseFs.hasAtomicRenames(wh),
      "the scheme table must classify the mock as an object store")
    val baseline = landOrders(wh)
    val run = new Orchestrator.Run(spark, wh, "MAINT01")
    // the old design REFUSED here; the pointer commit must succeed
    val compacted = run.compactBatches("bronze/orders")
    assert(compacted.length === 3)
    assert(CompactedLayout.liveGen(s"$wh/bronze/orders/dwh_batch_id=B0") === 1L)
    assert(batchSums(run.readTable("bronze/orders")) === baseline)
    assert(run.vacuumCompacted("bronze/orders").length === 3)
    assert(batchSums(run.readTable("bronze/orders")) === baseline)
  }

  test("a crash mid-staging leaves the live layout untouched and heals") {
    val wh = java.nio.file.Files.createTempDirectory("graft_compact_cr").toString
    val baseline = landOrders(wh)
    val part0 = s"$wh/bronze/orders/dwh_batch_id=B0"
    // simulate a crashed staging: a partial generation dir, NO pointer
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .limit(7).write.parquet(s"$part0/.cgen/g000001")
    val run = new Orchestrator.Run(spark, wh, "MAINT01")
    // readers are untouched by the partial staging (hidden dir, no pointer)
    assert(batchSums(run.readTable("bronze/orders")) === baseline)
    // the re-run clears the crashed staging and compacts cleanly
    val compacted = run.compactBatches("bronze/orders")
    assert(compacted.length === 3)
    assert(batchSums(run.readTable("bronze/orders")) === baseline)
    assert(!new java.io.File(s"$part0/.cgen/g000001").exists(),
      "the crashed partial staging must be cleared")
    assert(parquetFiles(CompactedLayout.livePartitionPath(part0)).length === 1,
      "the committed generation replaces the crashed staging")
  }

  test("a re-land reverts a compacted partition to loose files (S8)") {
    val wh = java.nio.file.Files.createTempDirectory("graft_compact_rl").toString
    landOrders(wh)
    val part0 = s"$wh/bronze/orders/dwh_batch_id=B0"
    val run = new Orchestrator.Run(spark, wh, "MAINT01")
    run.compactBatches("bronze/orders")
    assert(CompactedLayout.liveGen(part0) === 1L)
    // replay batch B0 with different content — dynamic overwrite
    // deletes the partition dir whole (pointer and generations too)
    val replay = new Orchestrator.Run(spark, wh, "B0")
    replay.writeBatch(
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet").limit(10),
      "bronze/orders")
    assert(CompactedLayout.liveGen(part0) === 0L,
      "the pointer must not survive a re-land")
    assert(run.readTable("bronze/orders")
      .where(col("dwh_batch_id") === "B0").count() === 10L)
  }

  test("compacting a bloom-indexed table heals the manifest; lookups stay exact") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_compact_bl").toString
    Seq("B1", "B2").foreach { id =>
      val df = (1L to 40L).map(i => (i, s"$id-row$i")).toDF("k", "s")
        .repartition(10)
      new Orchestrator.Run(spark, wh, id).writeBatchIndexed(df, "bronze/tbl", "k")
    }
    val run = new Orchestrator.Run(spark, wh, "MAINT01")
    assert(run.readTablePointLookup("bronze/tbl", "k", Seq(7L)).count() === 2L)
    val compacted = run.compactBatches("bronze/tbl")
    assert(compacted.length === 2)
    // the manifest was refreshed over the live generation: the
    // file-identity guard passes and the probe still prunes + matches
    assert(run.readTablePointLookup("bronze/tbl", "k", Seq(7L)).count() === 2L)
    assert(run.readTablePointLookup("bronze/tbl", "k", Seq(999L)).count() === 0L)
    // and survives the GC of the parked files
    run.vacuumCompacted("bronze/tbl")
    assert(run.readTablePointLookup("bronze/tbl", "k", Seq(7L)).count() === 2L)
  }

  test("out-of-contract appends into a compacted partition refuse loudly") {
    val wh = java.nio.file.Files.createTempDirectory("graft_compact_ap").toString
    landOrders(wh)
    val part0 = s"$wh/bronze/orders/dwh_batch_id=B0"
    val run = new Orchestrator.Run(spark, wh, "MAINT01")
    run.compactBatches("bronze/orders")
    Thread.sleep(50) // modtime granularity: the stray must be NEWER
    // an append the S8 writer never produces: a loose file into an
    // already-compacted partition — invisible to pointer-routed reads
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet").limit(3)
      .coalesce(1).write.mode("append").parquet(part0)
    // GC would FINALIZE the data loss; compaction would entrench it —
    // both must refuse with the re-land prescription
    val e1 = intercept[IllegalArgumentException] {
      run.vacuumCompacted("bronze/orders")
    }
    assert(e1.getMessage.contains("at-or-after"))
    // the refusal names the timestamp-tie possibility so an operator
    // on a coarse-mtime store doesn't chase a phantom writer
    assert(e1.getMessage.contains("granule"))
    val e2 = intercept[IllegalArgumentException] {
      run.compactBatches("bronze/orders")
    }
    assert(e2.getMessage.contains("at-or-after"))
    assert(e2.getMessage.contains("granule"))
    // the prescription heals: re-land resets the partition to loose
    new Orchestrator.Run(spark, wh, "B0").writeBatch(
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet").limit(10),
      "bronze/orders")
    assert(CompactedLayout.liveGen(part0) === 0L)
    assert(run.vacuumCompacted("bronze/orders")
      .forall(_._1 != "dwh_batch_id=B0"))
  }

  test("one compactor/GC per table: the lock excludes the second") {
    val wh = java.nio.file.Files.createTempDirectory("graft_compact_lk").toString
    landOrders(wh)
    val root = s"$wh/bronze/orders"
    WarehouseFs.publishAtomic(CompactedLayout.lockPath(root), "")
    val run = new Orchestrator.Run(spark, wh, "MAINT01")
    val e1 = intercept[IllegalArgumentException] {
      run.compactBatches("bronze/orders")
    }
    assert(e1.getMessage.contains("lock"))
    WarehouseFs.deleteFile(CompactedLayout.lockPath(root))
    assert(run.compactBatches("bronze/orders").length === 3,
      "released lock: compaction proceeds (and releases its own lock)")
    // vacuumCompacted only reaches its lock on a compacted table
    WarehouseFs.publishAtomic(CompactedLayout.lockPath(root), "")
    val e2 = intercept[IllegalArgumentException] {
      run.vacuumCompacted("bronze/orders")
    }
    assert(e2.getMessage.contains("lock"))
    WarehouseFs.deleteFile(CompactedLayout.lockPath(root))
    assert(run.vacuumCompacted("bronze/orders").length === 3)
  }

  test("lease walk: fresh lock blocks, stale lock reclaims with an audit row") {
    val wh = java.nio.file.Files.createTempDirectory("graft_compact_ls").toString
    landOrders(wh)
    val root = s"$wh/bronze/orders"
    val lock = CompactedLayout.lockPath(root)
    val run = new Orchestrator.Run(spark, wh, "MAINT01")
    spark.conf.set(WarehouseFs.LeaseConf, "60000")
    try {
      // FRESH foreign lock (age 0 < lease): still blocks, holder named
      WarehouseFs.publishAtomic(lock, "owner=somebody-else acquired_ms=0")
      val e = intercept[IllegalArgumentException] {
        run.compactBatches("bronze/orders")
      }
      assert(e.getMessage.contains("lock")
        && e.getMessage.contains("somebody-else"))

      // STALE lock (age > lease): reclaimed loudly, the op proceeds
      assert(new java.io.File(lock)
        .setLastModified(System.currentTimeMillis() - 120000))
      assert(run.compactBatches("bronze/orders").length === 3,
        "stale lock must reclaim and the compaction proceed")
      val reclaims = run.auditLog.filter(l => l.step == "compact"
        && l.status == "WARN" && l.message.contains("RECLAIMED"))
      assert(reclaims.nonEmpty, "the reclaim must land a loud audit row")
      assert(reclaims.head.message.contains("somebody-else"),
        "the audit row names the displaced holder's stamp")
      // the winner released its own lock on the way out
      assert(!new java.io.File(lock).exists())

      // lease OFF (the default): even an ancient lock blocks
      spark.conf.unset(WarehouseFs.LeaseConf)
      WarehouseFs.publishAtomic(lock, "owner=crashed acquired_ms=0")
      assert(new java.io.File(lock)
        .setLastModified(System.currentTimeMillis() - 600000))
      val e2 = intercept[IllegalArgumentException] {
        run.vacuumCompacted("bronze/orders")
      }
      assert(e2.getMessage.contains(WarehouseFs.LeaseConf),
        "the refusal must name the lease conf as the remedy")
    } finally {
      spark.conf.unset(WarehouseFs.LeaseConf)
      WarehouseFs.deleteFile(lock)
    }
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
    // generation dir), and a second pointer plane would race the
    // rebuild's commit — the refusal must name the rebuild
    for (t <- Seq("indexes/ann_lists", "indexes/ann_centroids")) {
      val e = intercept[IllegalArgumentException] { run.compactBatches(t) }
      assert(e.getMessage.contains("rebuildAnnIndex"), t)
      val e2 = intercept[IllegalArgumentException] { run.vacuumCompacted(t) }
      assert(e2.getMessage.contains("rebuildAnnIndex"), t)
    }
  }
}
