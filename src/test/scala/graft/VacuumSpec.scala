package graft

import graft.run.Orchestrator
import org.scalatest.funsuite.AnyFunSuite

/** Retention (vacuumBatches) + the AS-OF retention guard: dropped
  * vintages disappear from full reads, snapshots at or below the
  * watermark refuse with the prescription, re-vacuum is a no-op, and
  * the keepLast floor refuses table-emptying "retention".
  */
class VacuumSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def land(wh: String, id: String, v: Long): Orchestrator.Run = {
    val run = new Orchestrator.Run(spark, wh, id)
    run.writeBatch(Seq((v, s"row$v")).toDF("k", "s"), "bronze/t")
    run
  }

  test("vacuum drops oldest vintages; AS-OF refuses below the watermark") {
    val wh = java.nio.file.Files.createTempDirectory("graft_vac").toString
    land(wh, "B1", 1L); land(wh, "B2", 2L)
    val r3 = land(wh, "B3", 3L)

    assert(r3.vacuumBatches("bronze/t", keepLast = 2) === Seq("B1"))
    // full read sees exactly the survivors
    assert(r3.readTable("bronze/t").select("k").as[Long].collect().toSet
      === Set(2L, 3L))
    // snapshots above the watermark still work and are exact
    assert(r3.readTableAsOf("bronze/t", "B2").select("k")
      .as[Long].collect().toSet === Set(2L))
    // at or below the watermark: loud refusal, not a partial snapshot
    val e = intercept[IllegalArgumentException] {
      r3.readTableAsOf("bronze/t", "B1")
    }
    assert(e.getMessage.contains("PARTIAL") && e.getMessage.contains("B1"),
      e.getMessage)

    // idempotent: nothing below the keep window -> no-op, no new row
    val auditRows = spark.read.parquet(s"$wh/tools/audit_log")
      .where("step = 'vacuum'").count()
    assert(r3.vacuumBatches("bronze/t", keepLast = 2) === Seq.empty)
    assert(spark.read.parquet(s"$wh/tools/audit_log")
      .where("step = 'vacuum'").count() === auditRows)

    // a second vacuum advances the watermark and the guard follows
    assert(r3.vacuumBatches("bronze/t", keepLast = 1) === Seq("B2"))
    intercept[IllegalArgumentException] {
      r3.readTableAsOf("bronze/t", "B2")
    }
    assert(r3.readTableAsOf("bronze/t", "B3").select("k")
      .as[Long].collect().toSet === Set(3L))
  }

  test("keepLast floor: vacuuming a table to empty is refused") {
    val wh = java.nio.file.Files.createTempDirectory("graft_vac2").toString
    val r = land(wh, "B1", 1L)
    val e = intercept[IllegalArgumentException] {
      r.vacuumBatches("bronze/t", keepLast = 0)
    }
    assert(e.getMessage.contains("drop-table"), e.getMessage)
    assert(r.readTable("bronze/t").count() === 1L, "nothing was dropped")
  }

  test("config-driven retention: opt-in per table, loud on a bad value") {
    import graft.run.ToolsConfig
    val wh = java.nio.file.Files.createTempDirectory("graft_vac4").toString
    land(wh, "B1", 1L); land(wh, "B2", 2L)
    val r3 = land(wh, "B3", 3L)
    // retention is OPT-IN: no config plane / no row -> strict no-op
    assert(r3.vacuumIfConfigured("bronze/t") === Seq.empty)
    assert(r3.readTable("bronze/t").count() === 3L)
    ToolsConfig.writeConfigFile(ToolsConfig.mvConfigPath(wh), Seq(
      """{"target_table":"bronze/t","retention_keep_last":2}""",
      """{"target_table":"bronze/u","retention_keep_last":0}"""))
    assert(r3.vacuumIfConfigured("bronze/t") === Seq("B1"))
    assert(r3.readTable("bronze/t").count() === 2L)
    // a configured value below the floor is a config error, not a wipe
    val e = intercept[IllegalArgumentException] {
      ToolsConfig.retentionKeepLast(spark, wh, "bronze/u")
    }
    assert(e.getMessage.contains("drop-table"), e.getMessage)

    // typing tolerance vs loudness: a STRING-typed number applies (a
    // silently-nulled value would leave retention off while looking
    // configured), a non-numeric value is a loud config error
    ToolsConfig.writeConfigFile(ToolsConfig.mvConfigPath(wh), Seq(
      """{"target_table":"bronze/t","retention_keep_last":"2"}""",
      """{"target_table":"bronze/w","retention_keep_last":"soon"}"""))
    assert(ToolsConfig.retentionKeepLast(spark, wh, "bronze/t")
      === Some(2))
    val e2 = intercept[IllegalArgumentException] {
      ToolsConfig.retentionKeepLast(spark, wh, "bronze/w")
    }
    assert(e2.getMessage.contains("not an integer"), e2.getMessage)
  }

  test("vacuum of a bloom-indexed table drops manifest partitions too") {
    val wh = java.nio.file.Files.createTempDirectory("graft_vac6").toString
    Seq(("B1", 1L), ("B2", 2L), ("B3", 3L)).foreach { case (id, v) =>
      new Orchestrator.Run(spark, wh, id).writeBatchIndexed(
        Seq((v, s"row$v")).toDF("k", "s"), "bronze/ti", "k")
    }
    val r = new Orchestrator.Run(spark, wh, "B3")
    assert(r.readTablePointLookup("bronze/ti", "k", Seq(1L)).count() === 1L)
    assert(r.vacuumBatches("bronze/ti", keepLast = 2) === Seq("B1"))
    // without the manifest cleanup this is the stale-manifest refusal
    // (rows naming vanished files); with it, point lookups keep
    // working over exactly the surviving vintages
    assert(r.readTablePointLookup("bronze/ti", "k", Seq(2L, 3L))
      .count() === 2L)
    assert(r.readTablePointLookup("bronze/ti", "k", Seq(1L)).count() === 0L)
    assert(!new java.io.File(s"$wh/bronze/ti/_bloomidx/pid=B1").exists())
  }

  test("generation-pointer tables refuse vacuum by prescription") {
    val wh = java.nio.file.Files.createTempDirectory("graft_vac7").toString
    val r = new Orchestrator.Run(spark, wh, "B1")
    // tablePath resolves these into the LIVE generation dir — dropping
    // vintage partitions there races a rebuild's pointer commit (the
    // drops silently survive in the new generation behind a SUCCESS
    // audit row + watermark); the refusal must name the rebuild
    for (t <- Seq("indexes/ann_lists", "indexes/ann_centroids")) {
      val e = intercept[IllegalArgumentException] {
        r.vacuumBatches(t, keepLast = 1)
      }
      assert(e.getMessage.contains("rebuildAnnIndex"), t)
    }
  }

  test("catalog-registered bucketed tables refuse directory vacuum") {
    val wh = java.nio.file.Files.createTempDirectory("graft_vac5").toString
    val r1 = new Orchestrator.Run(spark, wh, "B1")
    r1.writeBucketedBatch(Seq((1L, "a")).toDF("k", "s"),
      "gold/t_bkt", Seq("k"), 2)
    val e = intercept[IllegalArgumentException] {
      r1.vacuumBatches("gold/t_bkt", keepLast = 1)
    }
    assert(e.getMessage.contains("metastore"), e.getMessage)
  }

  test("bucketed vacuum drops through the catalog AND deletes the files") {
    val wh = java.nio.file.Files.createTempDirectory("graft_vac6").toString
    val table = "gold/t_bvac"
    try {
      for ((id, v) <- Seq(("B1", 1L), ("B2", 2L), ("B3", 3L))) {
        new Orchestrator.Run(spark, wh, id).writeBucketedBatch(
          Seq((v, s"row$v")).toDF("k", "s"), table, Seq("k"), 2)
      }
      val r = new Orchestrator.Run(spark, wh, "B3")
      assert(r.vacuumBucketedBatches(table, keepLast = 1)
        === Seq("B1", "B2"))
      // the catalog stopped naming the vintages AND the bytes are gone
      assert(spark.sql("SHOW PARTITIONS gold_t_bvac").collect()
        .map(_.getString(0)).toSeq === Seq("dwh_batch_id=B3"))
      assert(!graft.run.WarehouseFs.exists(s"$wh/$table/dwh_batch_id=B1"))
      assert(!graft.run.WarehouseFs.exists(s"$wh/$table/dwh_batch_id=B2"))
      assert(r.readBucketed(table).select("k").as[Long].collect().toSeq
        === Seq(3L))
      // one retention semantics across both physical planes: the AS-OF
      // guard reads the same watermark row
      intercept[IllegalArgumentException] {
        r.readTableAsOf(table, "B2")
      }
      // idempotent: nothing below the keep window on the re-run
      assert(r.vacuumBucketedBatches(table, keepLast = 1) === Seq.empty)
      // the keepLast floor holds on this plane too
      intercept[IllegalArgumentException] {
        r.vacuumBucketedBatches(table, keepLast = 0)
      }
    } finally spark.sql("DROP TABLE IF EXISTS gold_t_bvac")
  }

  test("bucketed vacuum heals a crash between catalog drop and file delete") {
    val wh = java.nio.file.Files.createTempDirectory("graft_vac7").toString
    val table = "gold/t_bheal"
    try {
      for ((id, v) <- Seq(("B1", 1L), ("B2", 2L), ("B3", 3L))) {
        new Orchestrator.Run(spark, wh, id).writeBucketedBatch(
          Seq((v, s"row$v")).toDF("k", "s"), table, Seq("k"), 2)
      }
      // simulate the crash window: the catalog already dropped B1 but
      // its directory survived — a SHOW PARTITIONS plan would never
      // see B1 again (and MSCK would RESURRECT it); the
      // filesystem-sourced plan must re-drop and delete it
      spark.sql("ALTER TABLE gold_t_bheal DROP IF EXISTS PARTITION " +
        "(dwh_batch_id = 'B1')")
      assert(graft.run.WarehouseFs.exists(s"$wh/$table/dwh_batch_id=B1"),
        "fixture: the orphan dir must exist for the heal to mean anything")
      val r = new Orchestrator.Run(spark, wh, "B3")
      assert(r.vacuumBucketedBatches(table, keepLast = 1)
        === Seq("B1", "B2"))
      assert(!graft.run.WarehouseFs.exists(s"$wh/$table/dwh_batch_id=B1"),
        "the orphan's bytes must be gone")
      assert(spark.sql("SHOW PARTITIONS gold_t_bheal").collect()
        .map(_.getString(0)).toSeq === Seq("dwh_batch_id=B3"))
    } finally spark.sql("DROP TABLE IF EXISTS gold_t_bheal")
  }

  test("a deliberate re-land resurrects a vacuumed vintage (S8 recovery)") {
    val wh = java.nio.file.Files.createTempDirectory("graft_vac3").toString
    land(wh, "B1", 1L)
    val r2 = land(wh, "B2", 2L)
    r2.vacuumBatches("bronze/t", keepLast = 1)
    land(wh, "B1", 1L) // the documented recovery path
    assert(r2.readTable("bronze/t").select("k").as[Long].collect().toSet
      === Set(1L, 2L))
    // the AS-OF guard stays conservative: the watermark does not
    // un-advance just because the data came back
    intercept[IllegalArgumentException] {
      r2.readTableAsOf("bronze/t", "B1")
    }
    // this state — watermark durable, targeted dir present — is also
    // exactly the watermark-first crash window (flush landed, deletes
    // did not): the re-run must complete the interrupted vacuum
    assert(r2.vacuumBatches("bronze/t", keepLast = 1) === Seq("B1"))
    assert(r2.readTable("bronze/t").select("k").as[Long].collect().toSet
      === Set(2L))
  }
}
