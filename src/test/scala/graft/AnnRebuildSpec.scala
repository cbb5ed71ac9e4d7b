package graft

import graft.run.Orchestrator
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Orchestrator.rebuildAnnIndex — the retrain + staged re-index +
  * GENERATION-POINTER commit lifecycle the indexAnnBatch contract
  * documents: search-after-rebuild must equal a fresh-trained search
  * (proven against an in-memory Lloyd twin), batch partitions must
  * survive the commit, refusals (lock held, landing during staging)
  * must leave the live index untouched, and the pointer-commit
  * contract must hold with NO rename-atomicity assumption: a partial
  * staging generation is invisible until the one atomic pointer
  * publish, the previous generation survives as a reader grace window,
  * and the next rebuild clears it.
  */
class AnnRebuildSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def centsPath(wh: String) =
    Orchestrator.tablePath(wh, "indexes/ann_centroids")
  private def listsPath(wh: String) =
    Orchestrator.tablePath(wh, "indexes/ann_lists")

  private def q(f: Seq[Float]): Array[Long] =
    f.map(x => math.floor(x.toDouble * 1000).toLong).toArray
  private def l2(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => val d = x - y; d * d }.sum

  /** In-memory twin of LloydKmeans.train: seed = the nlist smallest
    * vec_ids, ties to the smallest cent_id, floored component means,
    * empty clusters drop.
    */
  private def lloydTwin(vecs: Map[Long, Array[Long]], nlist: Int,
                        iters: Int): Map[Long, Array[Long]] = {
    var cents: Map[Long, Array[Long]] =
      vecs.keys.toSeq.sorted.take(nlist).map(id => id -> vecs(id)).toMap
    for (_ <- 1 to iters) {
      val assign = vecs.map { case (id, v) =>
        id -> cents.toSeq.map { case (c, cv) => (l2(v, cv), c) }.min._2
      }
      cents = assign.groupBy(_._2).map { case (c, members) =>
        val vs = members.keys.map(vecs).toSeq
        c -> Array.tabulate(vs.head.length)(d =>
          math.floor(vs.map(_(d)).sum.toDouble / vs.size).toLong)
      }
    }
    cents
  }

  private def landTwoBatches(wh: String): Map[Long, Array[Long]] = {
    val emb = Tables.t(spark, dir, "embeddings").select("vec_id", "embedding")
    val r1 = new Orchestrator.Run(spark, wh, "B1")
    r1.writeBatch(emb.where(col("vec_id") % 10 =!= 0), "bronze/embeddings")
    r1.indexAnnBatch(r1.readBatch("bronze/embeddings")
      .select("vec_id", "embedding"), nlist = 16)
    r1.flushAudit() // stage boundary: the cadence reads persisted rows
    val r2 = new Orchestrator.Run(spark, wh, "B2")
    r2.writeBatch(emb.where(col("vec_id") % 10 === 0), "bronze/embeddings")
    r2.indexAnnBatch(r2.readBatch("bronze/embeddings")
      .select("vec_id", "embedding"), nlist = 16)
    r2.flushAudit()
    emb.collect().map(r => r.getLong(0) -> q(r.getSeq[Float](1))).toMap
  }

  test("retrain + re-index + swap: search-after-rebuild == fresh-trained") {
    val wh = java.nio.file.Files.createTempDirectory("graft_annrb").toString
    val vecs = landTwoBatches(wh)
    val r3 = new Orchestrator.Run(spark, wh, "B3")
    val n = r3.rebuildAnnIndex(nlist = 16, trainIters = 2)
    assert(n === vecs.size.toLong, "every listed vector re-indexed")

    // centroid table == the Lloyd twin, landed under the rebuild batch
    val want = lloydTwin(vecs, 16, 2)
    val gotCents = spark.read.parquet(centsPath(wh))
      .select("cent_id", "cv").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    assert(gotCents.keySet === want.keySet)
    gotCents.foreach { case (c, cv) =>
      assert(cv.toSeq === want(c).toSeq, s"centroid $c drifted") }
    assert(graft.run.WarehouseFs.listNames(centsPath(wh))
      .filter(_.startsWith("dwh_batch_id=")) === Seq("dwh_batch_id=B3"))

    // list table: nearest-centroid assignment under the NEW centroids,
    // with every vector's ORIGINAL batch partition preserved
    def nearest(v: Array[Long]) =
      want.toSeq.map { case (c, cv) => (l2(v, cv), c) }.min._2
    val lists = spark.read.parquet(listsPath(wh))
      .select("vec_id", "cent_id", "dwh_batch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(lists.length === vecs.size)
    lists.foreach { case (v, c, b) =>
      assert(c === nearest(vecs(v)), s"assignment of $v drifted")
      assert(b === (if (v % 10 == 0) "B2" else "B1"),
        s"batch partition of $v not preserved")
    }

    // search through the rebuilt tables == ground truth under the new
    // centroids (the fresh-trained search): top-3 lists, exact rerank
    val emb = Tables.t(spark, dir, "embeddings").select("vec_id", "embedding")
    val got = r3.annSearchIndexes(emb.where(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), col("embedding")), k = 5, nprobe = 3)
      .select("q_id", "vec_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val assignGT = vecs.map { case (id, v) => id -> nearest(v) }
    val wantSearch = vecs.keys.filter(_ % 50 == 0).flatMap { qid =>
      val top3 = want.toSeq.map { case (c, cv) => (l2(vecs(qid), cv), c) }
        .sorted.take(3).map(_._2).toSet
      vecs.keys.filter(v => v != qid && top3.contains(assignGT(v)))
        .map(v => (l2(vecs(qid), vecs(v)), v))
        .toSeq.sorted.take(5).zipWithIndex
        .map { case ((_, v), i) => (qid, v, i + 1) }
    }.toSet
    assert(got === wantSearch)
    assert(wantSearch.nonEmpty, "no search results — vacuous")

    // the commit is the pointer publish: generation advanced to 1, the
    // live paths resolve INSIDE the committed generation dir, the
    // previous generation is retained as the reader grace window, and
    // no lock outlives the rebuild; the lifecycle rides the audit plane
    assert(Orchestrator.annGen(wh) === 1L)
    assert(centsPath(wh).contains("/indexes/ann/g000001/"))
    assert(graft.run.WarehouseFs.exists(s"$wh/indexes/ann/g000000/lists"),
      "the previous generation must survive as the reader grace window")
    assert(!graft.run.WarehouseFs.exists(s"$wh/indexes/ann/_rebuild_lock"))
    assert(r3.auditLog.exists(l => l.step == "ann_rebuild"
      && l.status == "SUCCESS" && l.rows == n))

    // the rebuild counts as a landing for dependent cadences: the kNN
    // graph (default refresh_every = 1) refreshes immediately instead
    // of serving pre-rebuild edges until the next organic landing
    assert(r3.refreshKnnGraphIfDue(k = 3, nprobe = 2).exists(_ > 0L))

    // ...and a batch landed AFTER the rebuild assigns against the new
    // centroids without re-bootstrapping (the lifecycle continues)
    val r4 = new Orchestrator.Run(spark, wh, "B4")
    r4.writeBatch(emb.where(col("vec_id") % 10 === 3).limit(5)
      .withColumn("vec_id", col("vec_id") + 100000), "bronze/embeddings")
    r4.indexAnnBatch(r4.readBatch("bronze/embeddings")
      .select("vec_id", "embedding"), nlist = 16)
    assert(spark.read.parquet(centsPath(wh))
      .select("cent_id").distinct().count() === want.size.toLong,
      "post-rebuild landing must not re-bootstrap the centroids")
  }

  test("refusals leave the live index untouched; stale lock recovery works") {
    val wh = java.nio.file.Files.createTempDirectory("graft_annrb2").toString
    landTwoBatches(wh)
    val before = (
      spark.read.parquet(centsPath(wh)).collect().toSet,
      spark.read.parquet(listsPath(wh)).collect().toSet)

    // a held lock refuses BOTH a second rebuild and a landing, loudly
    val lock = s"$wh/indexes/ann/_rebuild_lock"
    assert(graft.run.WarehouseFs.createExclusive(lock))
    val r3 = new Orchestrator.Run(spark, wh, "B3")
    assert(intercept[IllegalArgumentException] {
      r3.rebuildAnnIndex(nlist = 16)
    }.getMessage.contains("rebuild"))
    val emb = Tables.t(spark, dir, "embeddings").select("vec_id", "embedding")
    assert(intercept[IllegalArgumentException] {
      r3.indexAnnBatch(emb.limit(3), nlist = 16)
    }.getMessage.contains("rebuild"))
    assert(graft.run.WarehouseFs.exists(lock),
      "a refusal must not delete a lock it doesn't hold")
    assert((spark.read.parquet(centsPath(wh)).collect().toSet,
      spark.read.parquet(listsPath(wh)).collect().toSet) === before,
      "refusals must leave the live index byte-equal")

    // stale-lock recovery per the message: delete it, rebuild proceeds
    graft.run.WarehouseFs.deleteFile(lock)
    assert(r3.rebuildAnnIndex(nlist = 16, trainIters = 2) > 0L)

    // a rebuild on an empty warehouse refuses with the bootstrap hint
    val whEmpty = java.nio.file.Files.createTempDirectory("graft_annrb3").toString
    assert(intercept[IllegalArgumentException] {
      new Orchestrator.Run(spark, whEmpty, "B1").rebuildAnnIndex()
    }.getMessage.contains("indexAnnBatch"))
  }

  test("a re-landed vector trains once but keeps both list partitions") {
    val wh = java.nio.file.Files.createTempDirectory("graft_annrb5").toString
    val emb = Tables.t(spark, dir, "embeddings").select("vec_id", "embedding")
    val r1 = new Orchestrator.Run(spark, wh, "B1")
    r1.writeBatch(emb.where(col("vec_id") % 10 =!= 0), "bronze/embeddings")
    r1.indexAnnBatch(r1.readBatch("bronze/embeddings")
      .select("vec_id", "embedding"), nlist = 16)
    // B2 re-lands vector 7 (already indexed under B1) beside its own
    // slice — the replay-across-batches case the population contract
    // tolerates (same embedding by the correction contract)
    val r2 = new Orchestrator.Run(spark, wh, "B2")
    r2.writeBatch(emb.where(col("vec_id") % 10 === 0
      || col("vec_id") === 7), "bronze/embeddings")
    r2.indexAnnBatch(r2.readBatch("bronze/embeddings")
      .select("vec_id", "embedding"), nlist = 16)

    val r3 = new Orchestrator.Run(spark, wh, "B3")
    val n = r3.rebuildAnnIndex(nlist = 16, trainIters = 2)
    // the twin trains on the DISTINCT vector set: if the rebuild
    // double-weighted vec 7, its cluster's floored means would differ
    val vecs = emb.collect().map(r => r.getLong(0) -> q(r.getSeq[Float](1)))
      .toMap
    val want = lloydTwin(vecs, 16, 2)
    val gotCents = spark.read.parquet(centsPath(wh))
      .select("cent_id", "cv").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    assert(gotCents.keySet === want.keySet)
    gotCents.foreach { case (c, cv) =>
      assert(cv.toSeq === want(c).toSeq,
        s"centroid $c drifted — re-landed vector double-weighted?") }
    // ...while the LIST table keeps one row per (vec, batch): vec 7
    // under B1 AND B2, both assigned to its (single) nearest centroid
    assert(n === vecs.size.toLong + 1L)
    val sevens = spark.read.parquet(listsPath(wh))
      .where(col("vec_id") === 7)
      .select("cent_id", "dwh_batch_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    def nearest(v: Array[Long]) =
      want.toSeq.map { case (c, cv) => (l2(v, cv), c) }.min._2
    assert(sevens === Set((nearest(vecs(7L)), "B1"), (nearest(vecs(7L)), "B2")))
  }

  test("a dead rebuild lands FAILED; a clean retry under the same batch heals it") {
    val wh = java.nio.file.Files.createTempDirectory("graft_annrb4").toString
    landTwoBatches(wh)
    val emb = Tables.t(spark, dir, "embeddings").select("vec_id", "embedding")
    // sabotage: replay B2's bronze partition with a SUBSET, leaving
    // listed vectors without stored embeddings — the rebuild's in-plan
    // guard must kill the job and land a FAILED audit row
    new Orchestrator.Run(spark, wh, "B2").writeBatch(
      emb.where(col("vec_id") % 10 === 0 && col("vec_id") < 100),
      "bronze/embeddings")
    val r3 = new Orchestrator.Run(spark, wh, "B3")
    intercept[Exception] { r3.rebuildAnnIndex(nlist = 16, trainIters = 2) }
    r3.flushAudit()
    assert(Orchestrator.failedTargets(spark, wh, "B3")
      .contains("indexes/ann_lists"),
      "the reprocess cycle must see the dead rebuild")
    assert(!graft.run.WarehouseFs.exists(s"$wh/indexes/ann/_rebuild_lock"),
      "a failed rebuild must release its lock")
    assert(Orchestrator.annGen(wh) === 0L,
      "a dead rebuild must not advance the generation pointer")
    // repair the feed; stamp a kNN refresh BEFORE the retry so the
    // batch-id watermark already covers every landed list batch
    new Orchestrator.Run(spark, wh, "B2").writeBatch(
      emb.where(col("vec_id") % 10 === 0), "bronze/embeddings")
    val r3b = new Orchestrator.Run(spark, wh, "B3")
    assert(r3b.refreshKnnGraphIfDue(k = 3, nprobe = 2).isDefined)
    assert(r3b.refreshKnnGraphIfDue(k = 3, nprobe = 2) === None)

    // retry under the SAME batch id (the reference's same-batch
    // reprocess model): the swap succeeds and the SUCCESS row heals
    // the target
    assert(r3b.rebuildAnnIndex(nlist = 16, trainIters = 2) > 0L)
    r3b.flushAudit()
    assert(!Orchestrator.failedTargets(spark, wh, "B3")
      .contains("indexes/ann_lists"),
      "a clean retried rebuild must heal the failed target")

    // the rebuild re-wrote every list row, and its batch id (B3) sorts
    // NO LATER than the stamped covers marker — the rebuild COUNT in
    // the stamp is what must make the graph due, or it would serve
    // pre-rebuild edges until the next organic landing
    assert(r3b.refreshKnnGraphIfDue(k = 3, nprobe = 2).isDefined,
      "a same-id rebuild retry must make the kNN graph refresh due")
    assert(r3b.refreshKnnGraphIfDue(k = 3, nprobe = 2) === None,
      "the rebuild-count watermark must advance with the refresh")
  }

  test("pointer commit: a crashed rebuild's partial staging is invisible and healed") {
    import graft.run.WarehouseFs
    val wh = java.nio.file.Files.createTempDirectory("graft_annrb6").toString
    val vecs = landTwoBatches(wh)
    val liveBefore = spark.read.parquet(listsPath(wh)).collect().toSet

    // simulate a rebuild that died mid-staging: a PARTIAL next
    // generation on disk (junk centroids, no lists) and no pointer
    // advance — the rename-swap design's torn window, which the
    // pointer design makes a non-event
    spark.range(1).selectExpr("id as cent_id", "array(id) as cv")
      .write.parquet(s"$wh/indexes/ann/g000001/centroids")
    assert(Orchestrator.annGen(wh) === 0L,
      "a partial staging generation must not be visible")
    assert(listsPath(wh).contains("/g000000/"),
      "reads must keep resolving the committed generation")
    assert(spark.read.parquet(listsPath(wh)).collect().toSet === liveBefore,
      "the live index must be untouched by the crashed staging")

    // the next rebuild clears the partial staging and commits cleanly
    val r3 = new Orchestrator.Run(spark, wh, "B3")
    assert(r3.rebuildAnnIndex(nlist = 16, trainIters = 2)
      === vecs.size.toLong)
    assert(Orchestrator.annGen(wh) === 1L)
    val want = lloydTwin(vecs, 16, 2)
    val gotCents = spark.read.parquet(centsPath(wh))
      .select("cent_id", "cv").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    assert(gotCents.keySet === want.keySet,
      "the junk staging must be fully replaced, not merged")
    assert(!WarehouseFs.exists(s"$wh/indexes/ann/_rebuild_lock"))
  }

  test("generations roll: the next rebuild clears the grace window") {
    import graft.run.WarehouseFs
    val wh = java.nio.file.Files.createTempDirectory("graft_annrb7").toString
    val vecs = landTwoBatches(wh)
    new Orchestrator.Run(spark, wh, "B3").rebuildAnnIndex(nlist = 16)
    assert(Orchestrator.annGen(wh) === 1L)
    assert(WarehouseFs.exists(s"$wh/indexes/ann/g000000/lists"),
      "generation 0 is the grace window after the first rebuild")
    new Orchestrator.Run(spark, wh, "B4").rebuildAnnIndex(nlist = 16)
    assert(Orchestrator.annGen(wh) === 2L)
    assert(!WarehouseFs.exists(s"$wh/indexes/ann/g000000"),
      "the second rebuild must clear the old grace window")
    assert(WarehouseFs.exists(s"$wh/indexes/ann/g000001/lists"),
      "generation 1 becomes the new grace window")
    assert(listsPath(wh).contains("/g000002/"))
    assert(spark.read.parquet(listsPath(wh)).count() === vecs.size.toLong,
      "the committed generation serves the full corpus")
  }
}
