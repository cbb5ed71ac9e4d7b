package graft

import graft.run.Orchestrator
import org.scalatest.funsuite.AnyFunSuite

/** The warehouse-table form of incremental entity resolution
  * (Orchestrator.indexFuzzyBatch / fuzzyMatchAgainstIndex): landed
  * batches accumulate the master variant index, probes match against
  * the TABLE (never re-blocking the master list), a replayed index
  * batch rewrites its own partition, and a batch never matches against
  * its own index rows.
  */
class FuzzyIndexSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def probe(run: Orchestrator.Run, keys: Seq[String]) =
    run.fuzzyMatchAgainstIndex(keys.toDF("k"), "k", maxDist = 1)
      .collect().map(r => r.getString(0) -> (Option(r.getString(1)),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3))).toMap

  test("land, probe, replay idempotently, exclude own batch") {
    val wh = java.nio.file.Files.createTempDirectory("graft_fuzzyidx").toString
    val b1 = new Orchestrator.Run(spark, wh, "B1")
    b1.indexFuzzyBatch(Seq("small ring", "red widget").toDF("k"), "k", 1)
    val b2 = new Orchestrator.Run(spark, wh, "B2")
    b2.indexFuzzyBatch(Seq("blue bolt").toDF("k"), "k", 1)

    // a probe from a fresh batch id sees the whole accumulated index
    val b3 = new Orchestrator.Run(spark, wh, "B3")
    val got = probe(b3, Seq("mall ring", "blue boltz", "zzzz"))
    assert(got("mall ring") === ((Some("small ring"), 1L, true)))
    assert(got("blue boltz") === ((Some("blue bolt"), 1L, true)))
    assert(got("zzzz") === ((None, -1L, false)), "no silent drop")

    // replaying B1's index load rewrites its own partition — the probe
    // result is unchanged, not doubled or broken
    val b1replay = new Orchestrator.Run(spark, wh, "B1")
    b1replay.indexFuzzyBatch(Seq("small ring", "red widget").toDF("k"), "k", 1)
    assert(probe(b3, Seq("mall ring", "blue boltz", "zzzz")) === got)
    val idx = spark.read.parquet(s"$wh/indexes/fuzzy_key_variants")
    assert(idx.where(org.apache.spark.sql.functions.col("name_master")
      === "small ring").select("dwh_batch_id").distinct().count() === 1)

    // a batch id that indexed its own keys must not match against them
    // (restart safety: index-then-match within one batch), but still
    // sees OTHER batches' keys
    val self = probe(b1replay, Seq("small ring", "blue boltz"))
    assert(self("small ring") === ((None, -1L, false)),
      "own-batch index rows must be excluded from the probe")
    assert(self("blue boltz") === ((Some("blue bolt"), 1L, true)))

    // probing at a DIFFERENT depth than the index was built with must
    // fail loudly — the SymSpell theorem needs both sides at the same
    // d, so a deeper probe would silently lose true matches
    val e = intercept[IllegalArgumentException] {
      b3.fuzzyMatchAgainstIndex(Seq("mall ring").toDF("k"), "k",
        maxDist = 2).collect()
    }
    assert(e.getMessage.contains("depth mismatch"), e.getMessage)

    // an index partition landed by pre-__d code (missing the depth
    // column; reads as null under mergeSchema) must hit the SAME loud
    // require as "unknown" — never an opaque NPE, never a silent
    // assume-it-matches
    import org.apache.spark.sql.functions.{lit, xxhash64, col => c}
    Seq("green gear").toDF("name_master")
      .withColumn("__vh", xxhash64(c("name_master")))
      .withColumn("dwh_batch_id", lit("LEGACY"))
      .write.mode("append").partitionBy("dwh_batch_id")
      .parquet(s"$wh/indexes/fuzzy_key_variants")
    val e2 = intercept[IllegalArgumentException] {
      probe(b3, Seq("mall ring"))
    }
    assert(e2.getMessage.contains("unknown"), e2.getMessage)
  }
}
