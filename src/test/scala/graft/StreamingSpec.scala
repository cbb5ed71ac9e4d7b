package graft

import graft.streaming.StreamingJobs
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, count, explode, expr, lit, sum}
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Structured Streaming jobs driven through MemoryStream: the streaming
  * results must equal the batch-computed expectation on the same rows
  * (the contract EventQueries' oracle-checked batch analogs define).
  */
class StreamingSpec extends AnyFunSuite with SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                event_type: String, value: Double)

  private val events = Seq(
    Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
    Ev(2, ts("2024-01-01 10:10:00"), 1, "click", 2.0),
    Ev(3, ts("2024-01-01 11:30:00"), 1, "view", 4.0), // > 30 min gap -> new session
    Ev(4, ts("2024-01-01 10:05:00"), 2, "click", 8.0),
    Ev(5, ts("2024-01-02 09:00:00"), 2, "view", 16.0))

  test("tumbling daily window matches batch expectation") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(events)
    val q = StreamingJobs.tumblingDaily(ms.toDF())
      .writeStream.format("memory").queryName("tumble")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("tumble")
      .collect().map(r => (r.getDate(0).toString, r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    assert(got === Set(
      ("2024-01-01", "click", 3L, 11.0),
      ("2024-01-01", "view", 1L, 4.0),
      ("2024-01-02", "view", 1L, 16.0)))
  }

  test("sliding daily windows put each event in exactly two windows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(events)
    val q = StreamingJobs.slidingDaily(ms.toDF())
      .writeStream.format("memory").queryName("slide")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("slide")
    assert(got.agg(org.apache.spark.sql.functions.sum("n_events"))
      .collect().head.getLong(0) === 2L * events.length)
  }

  test("streaming anomaly verdicts equal the batch detector on fixture events") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // batch truth + its stats plane over the same data
    val hourly = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("hour_id"))
      .agg(count(lit(1)).as("c"))
    val baseline = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("q"))
    val want = graft.queries.EventQueries.queries("q_events_anomaly")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(want.nonEmpty, "no spikes in fixture — test is vacuous")
    val rows = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"), col("value"))
      .as[graft.streaming.StreamingJobs.Event].collect().toSeq
    val ms = MemoryStream[graft.streaming.StreamingJobs.Event]
    ms.addData(rows)
    val q = StreamingJobs.anomalyStream(ms.toDF(), baseline)
      .writeStream.format("memory").queryName("anom")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("anom")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(got === want, "streaming verdicts != batch verdicts")
  }

  test("session windows (30-min gap) match batch sessionization") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(events)
    val q = StreamingJobs.sessionStats(ms.toDF())
      .writeStream.format("memory").queryName("sess")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("sess")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getLong(2), r.getDouble(3))).toSet
    assert(got === Set(
      (1L, "2024-01-01 10:00:00.0", 2L, 3.0),  // 10:00 + 10:10 merge
      (1L, "2024-01-01 11:30:00.0", 1L, 4.0),  // gap > 30 min
      (2L, "2024-01-01 10:05:00.0", 1L, 8.0),
      (2L, "2024-01-02 09:00:00.0", 1L, 16.0)))
  }

  test("watermarked streaming dedup drops in-horizon duplicate event_ids") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamingJobs.dedupEvents(ms.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      ms.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0), // same-batch dup
        Ev(2, ts("2024-01-01 10:10:00"), 1, "view", 2.0))
      q.processAllAvailable()
      ms.addData( // retry of event 2 arrives within the watermark horizon
        Ev(2, ts("2024-01-01 10:10:00"), 1, "view", 2.0),
        Ev(3, ts("2024-01-01 10:20:00"), 2, "click", 4.0))
      q.processAllAvailable()
      val got = spark.table("dedup").collect().map(_.getLong(0)).sorted
      assert(got === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stream-static enrich joins each micro-batch to the dimension") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val ms = MemoryStream[Ev]
    ms.addData(events)
    val q = StreamingJobs.enrichEvents(ms.toDF(), dim)
      .writeStream.format("memory").queryName("enrich")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("enrich").select("event_id", "tier")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "gold"), (2L, "gold"), (3L, "gold"),
      (4L, "basic"), (5L, "basic")))
  }

  test("streaming near-dup candidates equal the batch MinHash-LSH pairs") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // real corpus slice: batch pairs on the same docs are the expectation
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
      .as[(Long, String)].collect().toSeq
    val expected = SparkEntry.queries("q_dedup_minhash_lsh")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "no batch pairs — vacuous comparison")

    val ms = MemoryStream[(Long, String)]
    val q = StreamingJobs.nearDupCandidates(
        ms.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    try {
      val (first, rest) = docs.splitAt(docs.length / 2)
      ms.addData(first); q.processAllAvailable()
      ms.addData(rest); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("neardup")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
  }

  test("streaming corpus gate equals the batch gate on real documents") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").na.fill("", Seq("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)
    val base = ts("2024-01-01 00:00:00").getTime
    val rows = docs.map { case (id, text) =>
      (id, text, new Timestamp(base + id * 1000)) }
    val ms = MemoryStream[(Long, String, Timestamp)]
    val out = StreamingJobs.cleanDocsStream(
      ms.toDF().toDF("doc_id", "text", "ts"))
    val q = out.writeStream.format("memory").queryName("clean_docs")
      .outputMode("append").start()
    try {
      ms.addData(rows.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("clean_docs")
    // same gates computed in batch (the shared builders run on a plain
    // DataFrame too): kept content-key set must match
    val batch = rows.toSeq.toDF("doc_id", "text", "ts")
    val expected = StreamingJobs.gateDocs(batch)
      .select("text_key").distinct().as[String].collect().toSet
    assert(expected.nonEmpty, "gate kept nothing — vacuous")
    assert(got.select("text_key").as[String].collect().toSet === expected)
    // exactly one survivor per content key
    assert(got.count() === expected.size)
  }

  test("streaming gopher gate equals the batch rules row") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.t(spark, dir, "documents")
      .select("doc_id", "text").na.fill("", Seq("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    val ms = MemoryStream[(Long, String)]
    val q = StreamingJobs.gopherGateStream(ms.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("gopher_gate")
      .outputMode("append").start()
    try {
      ms.addData(docs.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("gopher_gate")
      .select("doc_id", "gopher_pass")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val want = SparkEntry.queries("q_text_gopher_rules")(spark, dir)
      .select(col("doc_id"), col("gopher_pass"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === want)
    assert(got.values.exists(identity) && got.values.exists(!_),
      "gate verdicts degenerate — vacuous")
  }

  test("streaming DSIR gate equals the join-based batch weights") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // frozen model trained on the batch corpus (the warehouse side)
    val model = graft.queries.TextQueries.dsirModelArray(spark, dir)
    assert(model.length === 1024)
    val docs = Tables.t(spark, dir, "documents")
      .select("doc_id", "text").na.fill("", Seq("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    val ms = MemoryStream[(Long, String)]
    val q = StreamingJobs.dsirGateStream(
      ms.toDF().toDF("doc_id", "text"), model)
      .writeStream.format("memory").queryName("dsir_gate")
      .outputMode("append").start()
    try {
      ms.addData(docs.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("dsir_gate")
      .select("doc_id", "n_feats", "w_micro")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.size === docs.length, "gate must emit a verdict per doc")
    // the batch path is a genuinely different execution: explode +
    // bucket-model JOIN + doc_id aggregate vs the stream's map-only
    // frozen-array fold — bit-identical weights required
    val want = graft.queries.TextQueries.dsirWeights(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    want.foreach { case (id, nw) =>
      assert(got(id) === nw, s"doc $id stream/batch weight drift")
    }
    // docs the batch row drops (featureless) must gate with weight 0
    (got.keySet -- want.keySet).foreach { id =>
      assert(got(id)._2 === 0L, s"featureless doc $id scored nonzero")
    }
    assert(got.values.map(_._2).toSet.size > 1, "weights degenerate")
  }

  test("streaming calibrated-quality gate equals the batch ECDF row " +
    "and handles unseen sources/buckets") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val model = graft.queries.TextQueries.calibrationModelFrame(spark, dir)
    val docs = Tables.t(spark, dir, "documents")
      .select("doc_id", "source", "text").na.fill("", Seq("text"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    // plus one doc from a source the model never saw, and one empty-text
    // doc from a KNOWN source (its score bucket is unseen in any corpus
    // slice that has real text)
    val novel = (900001L, "src_never_seen", "the quick brown fox")
    val unseenBucket = (900002L, docs.head._2, "")
    val nullText: (Long, String, String) = (900003L, docs.head._2, null)
    val ms = MemoryStream[(Long, String, String)]
    val q = StreamingJobs.calibratedGateStream(
      ms.toDF().toDF("doc_id", "source", "text"), model)
      .writeStream.format("memory").queryName("calib_gate")
      .outputMode("append").start()
    try {
      ms.addData(docs.toSeq :+ novel :+ unseenBucket :+ nullText)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("calib_gate").collect().map { r =>
      r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) null else Long.box(r.getLong(3)),
        r.getBoolean(4), r.getBoolean(5))
    }.toMap
    // corpus docs: bit-identical to the batch registered row
    val want = SparkEntry.queries("q_text_quality_calibrated")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    want.foreach { case (id, (src, milli, pct, keep)) =>
      val (gSrc, gMilli, gPct, gKnown, gKeep) = got(id)
      assert(gSrc === src && gMilli === milli && gPct === Long.box(pct) &&
        gKnown && gKeep === keep, s"doc $id stream/batch drift")
    }
    // unknown source: no silent verdict
    val (_, _, nPct, nKnown, nKeep) = got(900001L)
    assert(nPct === null && !nKnown && !nKeep)
    // known source, unseen score bucket: exact left-limit ECDF
    val (uSrc, uMilli, uPct, uKnown, _) = got(900002L)
    assert(uKnown, "known source misreported")
    val srcDocs = want.values.filter(_._1 == uSrc).toSeq
    val below = srcDocs.count(_._2 < uMilli).toLong
    val eqCnt = srcDocs.count(_._2 == uMilli).toLong
    // empty text lands at bucket 252 (ttr exactly 1), which real docs
    // essentially never hit — but compute the expectation by the full
    // seen/unseen formula so a fixture coincidence can't flake the test
    val expected =
      if (eqCnt > 0) 1000000L * (2 * below + eqCnt + 1) / (2 * srcDocs.size)
      else 1000000L * below / srcDocs.size
    assert(uPct === Long.box(expected), s"unseen-bucket ECDF wrong: $uPct")
    // unscorable doc (null text, known source): the verdict must be an
    // explicit false, never a null that vanishes from both filters
    val (_, _, zPct, zKnown, zKeep) = got(900003L)
    assert(zPct === null && zKnown && zKeep === false,
      s"null-text verdict wrong: pct=$zPct known=$zKnown keep=$zKeep")
  }

  test("streaming drift gate: per-micro-batch chi2 reports equal the " +
    "batch builder and replay idempotently") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val all = Tables.t(spark, dir, "documents")
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect().sortBy(_._1)
    // frozen corpus model = the high-id warehouse slice; feed = the
    // low-id docs, split in two micro-batches so per-batch semantics
    // are visible. An ID-RANGE split, not mod-10: this fixture assigns
    // source = src(doc_id % 20), so any mod-10 split makes feed and
    // corpus sources DISJOINT and every chi2 term degenerates to the
    // guarded null — the range split gives every source both corpus
    // and feed docs, so real terms exist
    val corpus = all.filter(_._1 >= 100)
    val feed = all.filter(_._1 < 100)
    val (feedA, feedB) = feed.splitAt(feed.length / 2)
    val hist = graft.queries.TextQueries.driftHistogramOf(
      corpus.toSeq.toDF("doc_id", "source", "text")).cache()
    val root = java.nio.file.Files.createTempDirectory("graft_drift").toString
    val wh = s"$root/wh"
    val cp = s"$root/cp"
    val ms = MemoryStream[(Long, String, String)]
    val q1 = StreamingJobs.driftGateSink(
      ms.toDF().toDF("doc_id", "source", "text"), hist, wh, cp)
    try {
      ms.addData(feedA.toSeq); q1.processAllAvailable()
      ms.addData(feedB.toSeq); q1.processAllAvailable()
    } finally q1.stop()
    val reports = spark.read.parquet(s"$wh/qa/drift_chi2")
    val batchIds = reports.select("dwh_batch_id").distinct()
      .as[String].collect().sorted
    assert(batchIds.length === 2, s"one report per micro-batch: $batchIds")
    // each micro-batch's report must equal the shared builder applied
    // to exactly that batch's rows — the stream/batch no-drift contract
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) null else Long.box(r.getLong(4)),
          if (r.isNullAt(5)) null else Long.box(r.getLong(5)))
    val cols = Seq("source", "bucket", "n_batch", "n_corpus",
      "term_micro", "chi2_micro")
    Seq(feedA, feedB).zip(batchIds).foreach { case (slice, bid) =>
      val got = reports.where(col("dwh_batch_id") === bid)
        .select(cols.head, cols.tail: _*).collect().map(key).toMap
      val want = graft.queries.TextQueries.chi2DriftOf(
        slice.toSeq.toDF("doc_id", "source", "text"), hist)
        .select(cols.head, cols.tail: _*).collect().map(key).toMap
      assert(got === want, s"stream/batch drift in report $bid")
      assert(want.nonEmpty, "vacuous report")
    }
    // non-vacuity: the fixture must produce at least one real chi2 term
    assert(reports.where(col("term_micro").isNotNull).count() > 0)
    // restart from the same checkpoint with no new data: no duplicate
    // reports (the idempotent-partition discipline)
    val q2 = StreamingJobs.driftGateSink(
      ms.toDF().toDF("doc_id", "source", "text"), hist, wh, cp)
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(s"$wh/qa/drift_chi2")
      .select("dwh_batch_id").distinct().count() === 2)
    hist.unpersist()
  }

  test("streaming fuzzy key-match gate equals the batch incremental row") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val model = graft.queries.GraphQueries.masterVariantModel(spark, dir)
    val d = graft.queries.GraphQueries.IncrFuzzyDist
    val keys = graft.queries.GraphQueries.dirtyBatchKeys(spark, dir)
      .as[String].collect().sorted
    // plus a key no master is within distance d of: the gate must say
    // so explicitly (matched=false), never drop the row
    val novel = "zzzz qqqq"
    val ms = MemoryStream[String]
    val q = StreamingJobs.fuzzyMatchStream(
      ms.toDF().toDF("name_new"), "name_new", model, d)
      .writeStream.format("memory").queryName("fuzzy_gate")
      .outputMode("append").start()
    try {
      ms.addData(keys.toSeq :+ novel)
      q.processAllAvailable()
    } finally q.stop()
    def asMap(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      r.getString(0) -> (Option(r.getString(1)),
        if (r.isNullAt(2)) null else Long.box(r.getLong(2)),
        r.getBoolean(3))).toMap
    val got = asMap(spark.table("fuzzy_gate").collect())
    assert(got.size === keys.length + 1, "one verdict per input key")
    // the batch path is a genuinely different execution (persisted
    // variant-index equi-join + window pick vs the stream's map-only
    // literal-map probe + lambda reduce) — verdicts must be identical
    val want = asMap(
      SparkEntry.queries("q_dedup_fuzzy_incremental")(spark, dir).collect())
    want.foreach { case (k, v) =>
      assert(got(k) === v, s"key '$k' stream/batch drift")
    }
    assert(got(novel) === ((None, null, false)))
    // non-vacuity: the dirty feed must actually fuzzy-match (dist 1 —
    // not exact-equality hits), or the fixture proves nothing
    assert(want.values.exists(v => v._3 && v._2 == Long.box(1L)),
      "no near-match in the fixture")
  }

  test("streaming host-quality gate equals the batch row; unknown host " +
    "is an explicit non-keep") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val ranks = graft.queries.GraphQueries.hostRanks(spark, dir)
    val docs = Tables.t(spark, dir, "documents")
      .select("doc_id", "source")
      .as[(Long, String)].collect().sortBy(_._1)
    val novel = (900001L, "host_never_ranked")
    val ms = MemoryStream[(Long, String)]
    val q = StreamingJobs.hostGateStream(
      ms.toDF().toDF("doc_id", "source"), ranks)
      .writeStream.format("memory").queryName("host_gate")
      .outputMode("append").start()
    try {
      ms.addData(docs.toSeq :+ novel)
      q.processAllAvailable()
    } finally q.stop()
    def asMap(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) null else Long.box(r.getLong(2)),
        r.getBoolean(3), r.getBoolean(4))).toMap
    val got = asMap(spark.table("host_gate").collect())
    val want = asMap(
      SparkEntry.queries("q_graph_host_gate")(spark, dir).collect())
    want.foreach { case (id, v) =>
      assert(got(id) === v, s"doc $id stream/batch drift")
    }
    // unknown host: explicit false verdicts, null rank — never a drop
    assert(got(900001L) === (("host_never_ranked", null, false, false)))
    // non-vacuity: the fixture must exercise both verdicts
    assert(want.values.exists(_._4) && want.values.exists(!_._4),
      "gate verdicts degenerate on this fixture")
  }

  test("streaming link-farm gate equals the batch row; unknown host " +
    "is an explicit non-flag") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val tri = graft.queries.GraphQueries.sourceTriangleCounts(spark, dir)
    val docs = Tables.t(spark, dir, "documents")
      .select("doc_id", "source")
      .as[(Long, String)].collect().sortBy(_._1)
    val novel = (900002L, "host_never_linked")
    val ms = MemoryStream[(Long, String)]
    val q = StreamingJobs.linkFarmGateStream(
      ms.toDF().toDF("doc_id", "source"), tri)
      .writeStream.format("memory").queryName("linkfarm_gate")
      .outputMode("append").start()
    try {
      ms.addData(docs.toSeq :+ novel)
      q.processAllAvailable()
    } finally q.stop()
    def asMap(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(3)) null else Long.box(r.getLong(3)),
        r.getBoolean(4), r.getBoolean(5))).toMap
    val got = asMap(spark.table("linkfarm_gate").collect())
    val want = asMap(
      SparkEntry.queries("q_graph_linkfarm_gate")(spark, dir).collect())
    want.foreach { case (id, v) =>
      assert(got(id) === v, s"doc $id stream/batch drift")
    }
    // unknown host: explicit false verdicts, null stats — never a drop
    assert(got(900002L) === (("host_never_linked", null, false, false)))
    // non-vacuity: both verdicts, and the flagged class is the CLIQUE
    // ring, not merely the high-degree one (the whole point of lcc)
    assert(want.values.exists(_._4) && want.values.exists(!_._4),
      "gate verdicts degenerate on this fixture")
  }

  test("streaming core gate equals the batch row; unknown hosts explicit") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val cores = graft.queries.GraphQueries.sourceCoreNumbers(spark, dir)
    val docs = Tables.t(spark, dir, "documents")
      .select("doc_id", "source")
      .as[(Long, String)].collect().sortBy(_._1)
    val novel = (900003L, "host_not_in_graph")
    val ms = MemoryStream[(Long, String)]
    val q = StreamingJobs.coreGateStream(
      ms.toDF().toDF("doc_id", "source"), cores,
      graft.queries.GraphQueries.CoreGateMinCore)
      .writeStream.format("memory").queryName("core_gate")
      .outputMode("append").start()
    try {
      ms.addData(docs.toSeq :+ novel)
      q.processAllAvailable()
    } finally q.stop()
    def asMap(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) null else Long.box(r.getLong(2)),
        r.getBoolean(3), r.getBoolean(4))).toMap
    val got = asMap(spark.table("core_gate").collect())
    val want = asMap(
      SparkEntry.queries("q_graph_core_gate")(spark, dir).collect())
    want.foreach { case (id, v) =>
      assert(got(id) === v, s"doc $id stream/batch drift")
    }
    assert(got(900003L) === (("host_not_in_graph", null, false, false)))
    // non-vacuity: the threshold separates the clique ring (kept) from
    // the equal-or-higher-DEGREE ring nodes (dropped)
    assert(want.values.exists(_._4) && want.values.exists(!_._4),
      "gate verdicts degenerate on this fixture")
  }

  test("streaming BPE encode equals the batch row per document") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.t(spark, dir, "documents")
      .select("doc_id", "text").na.fill("", Seq("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    val ms = MemoryStream[(Long, String)]
    val q = StreamingJobs.bpeEncodeStream(ms.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("bpe_enc")
      .outputMode("append").start()
    try {
      ms.addData(docs.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("bpe_enc")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    val want = SparkEntry.queries("q_text_bpe_encode")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(got === want)
    assert(want.values.map(_._1).sum > 0, "no tokens — vacuous")
  }

  test("streaming PII scrub equals the batch redaction kernel") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = ts("2024-01-01 00:00:00").getTime
    // seeded the same way the batch row seeds PII (plus a clean doc and
    // a doc with BOTH kinds twice, so counts > 1 are exercised)
    val rows = Seq(
      (1L, "plain words only", new Timestamp(base)),
      (2L, "mail a@b.io and c.d@e-f.org tel 555-1234 then 555-9999",
        new Timestamp(base + 1000)),
      (3L, "edge 555-12345 is not a phone but 555-0042 is",
        new Timestamp(base + 2000)))
    val ms = MemoryStream[(Long, String, Timestamp)]
    val out = StreamingJobs.scrubDocsStream(
      ms.toDF().toDF("doc_id", "text", "ts"))
    val q = out.writeStream.format("memory").queryName("scrub_docs")
      .outputMode("append").start()
    try {
      ms.addData(rows)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("scrub_docs")
      .select("doc_id", "n_emails", "n_phones", "redacted")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 0L, 0L, "plain words only"),
      (2L, 2L, 2L, "mail <EMAIL> and <EMAIL> tel <PHONE> then <PHONE>"),
      // 555-12345: the \b after 4 digits fails against the 5th digit,
      // so it is NOT redacted — the word-boundary contract
      (3L, 0L, 1L, "edge 555-12345 is not a phone but <PHONE> is")))
  }

  test("continuous packing equals the per-source batch prefix sum") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import StreamingJobs.DocTok
    val docs = Seq(
      DocTok("web", 1L, 1000), DocTok("web", 2L, 1500), DocTok("web", 3L, 600),
      DocTok("books", 4L, 2047), DocTok("books", 5L, 1), DocTok("web", 6L, 4096))
    val ms = MemoryStream[DocTok]
    val out = StreamingJobs.packDocsStream(ms.toDS(), budget = 2048)
    val q = out.writeStream.format("memory").queryName("packed")
      .outputMode("append").start()
    try {
      ms.addData(docs.take(4)) // first micro-batch
      q.processAllAvailable()
      ms.addData(docs.drop(4)) // state carries offsets across batches
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("packed")
      .select("source", "doc_id", "tok_offset", "first_bin", "last_bin")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // batch expectation: per-source exclusive prefix sum in doc_id order
    val expected = docs.groupBy(_.source).flatMap { case (src, ds) =>
      ds.sortBy(_.doc_id).scanLeft(("", 0L, 0L)) { case ((_, _, acc), d) =>
        (src + ":" + d.doc_id, acc, acc + d.n_tokens)
      }.drop(1).zip(ds.sortBy(_.doc_id)).map { case ((_, off, _), d) =>
        (src, d.doc_id, off, off / 2048, (off + math.max(d.n_tokens - 1, 0)) / 2048)
      }
    }.toSet
    assert(got === expected)
  }

  test("warehouse sink: micro-batches land as idempotent batch partitions") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_whsink").toString
    val wh = s"$root/wh"
    val cp = s"$root/cp"
    val ms = MemoryStream[Ev]
    val q1 = StreamingJobs.warehouseSink(ms.toDF(), wh, "bronze/events", cp)
    try {
      ms.addData(events.take(3))
      q1.processAllAvailable()
    } finally q1.stop()
    val afterFirst = spark.read.parquet(s"$wh/bronze/events")
    assert(afterFirst.count() === 3)
    // one partition per micro-batch, stamped with its batch id
    val batches1 = afterFirst.select("dwh_batch_id").distinct().as[String]
      .collect().toSet
    assert(batches1.forall(_.startsWith("SBATCH")))
    // restart from the same checkpoint: only NEW data lands, and the
    // audit plane shows idempotent writes (no duplicated rows)
    val q2 = StreamingJobs.warehouseSink(ms.toDF(), wh, "bronze/events", cp)
    try {
      ms.addData(events.drop(3))
      q2.processAllAvailable()
    } finally q2.stop()
    val all = spark.read.parquet(s"$wh/bronze/events")
    assert(all.count() === events.size.toLong)
    assert(all.select("event_id").distinct().count() === events.size.toLong)
  }

  test("streaming-fed compaction: sink lands, pointer-compacts, replay reverts, reads exact") {
    // the end-to-end interplay the compaction plane exists for: the
    // STREAMING sink is the warehouse's main small-file producer, so
    // (1) its micro-batch partitions must pointer-compact, (2) a real
    // foreachBatch RESTART REPLAY (uncommitted batch re-run from the
    // checkpoint) must revert the compacted partition to loose files
    // via the S8 dynamic overwrite, and (3) resolver reads must stay
    // exact at every step — never torn, never double-counted
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_whcomp").toString
    val wh = s"$root/wh"
    val cp = s"$root/cp"
    val ms = MemoryStream[Ev]
    val q1 = StreamingJobs.warehouseSink(ms.toDF(), wh, "bronze/events", cp)
    try {
      ms.addData(events.take(1)); q1.processAllAvailable() // batch 0
      // batch 1: three blocks pending at once -> one micro-batch whose
      // frame carries >= 2 partitions -> a genuinely fragmented landing
      events.drop(1).foreach(e => ms.addData(Seq(e)))
      q1.processAllAvailable()
    } finally q1.stop()

    val table = s"$wh/bronze/events"
    val total = events.size.toLong
    val run = new graft.run.Orchestrator.Run(spark, wh, "MAINT01")
    assert(run.readTable("bronze/events").count() === total)
    val part1 = spark.read.parquet(table).where(col("dwh_batch_id")
      .endsWith("_000001")).select("dwh_batch_id").as[String].head()
    val part1Path = s"$table/dwh_batch_id=$part1"

    // (1) the streamed table compacts under the pointer plane
    val compacted = run.compactBatches("bronze/events")
    assert(compacted.exists(_._1 == s"dwh_batch_id=$part1"),
      s"the fragmented micro-batch partition must rewrite, got $compacted")
    assert(graft.sources.CompactedLayout.liveGen(part1Path) === 1L)
    assert(run.readTable("bronze/events").count() === total)
    assert(run.readTable("bronze/events")
      .select("event_id").distinct().count() === total)

    // (2) REAL restart replay: drop batch 1's commit marker so the
    // restarted query re-executes that micro-batch through foreachBatch
    graft.run.WarehouseFs.deleteFile(s"$cp/commits/1")
    val q2 = StreamingJobs.warehouseSink(ms.toDF(), wh, "bronze/events", cp)
    try q2.processAllAvailable() finally q2.stop()

    // the replayed partition REVERTED to loose files (the dynamic
    // overwrite deletes the partition dir whole — pointer included)
    assert(graft.sources.CompactedLayout.liveGen(part1Path) === 0L,
      "a replayed micro-batch must revert its partition to loose files")
    // (3) reads stay exact: no duplicates, no losses, resolver routed
    assert(run.readTable("bronze/events").count() === total)
    assert(run.readTable("bronze/events")
      .select("event_id").distinct().count() === total)

    // and the lifecycle continues: the reverted partition re-compacts,
    // GC reclaims the parked layout, reads unchanged
    val again = run.compactBatches("bronze/events")
    assert(again.exists(_._1 == s"dwh_batch_id=$part1"))
    assert(run.vacuumCompacted("bronze/events").nonEmpty)
    assert(run.readTable("bronze/events").count() === total)
  }

  test("warehouse sink with bloom key: streamed table point-skips, replay-safe") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_whbloom").toString
    val wh = s"$root/wh"
    val cp = s"$root/cp"
    val ms = MemoryStream[Ev]
    val q1 = StreamingJobs.warehouseSink(ms.toDF(), wh, "bronze/events", cp,
      bloomKey = Some("event_id"))
    try {
      ms.addData(events.take(3)); q1.processAllAvailable()
      ms.addData(events.drop(3)); q1.processAllAvailable()
    } finally q1.stop()
    val path = s"$wh/bronze/events"
    // point probe reads FEWER files than the table holds, same rows as
    // a plain filtered scan (no false negatives by Bloom contract)
    val (pruned, kept, total) = graft.sources.BloomIndexLayout.prunedRead(
      spark, path, "event_id", Seq(events.head.event_id))
    assert(total >= 2, s"expected a file per micro-batch, saw $total")
    assert(kept < total, s"probe kept $kept of $total files — no skipping")
    assert(pruned.select("event_id").as[Long].collect().toSeq ===
      Seq(events.head.event_id))
    // replayed micro-batch (the restart contract): same batch id re-lands
    // data AND its manifest partition; the identity-checked point lookup
    // stays consistent instead of tripping on vanished files
    val scope = java.security.MessageDigest.getInstance("MD5")
      .digest(cp.getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString
    val replayRows = events.drop(3)
      .map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    new graft.run.Orchestrator.Run(spark, wh, f"SBATCH${scope}_${1L}%06d")
      .writeBatchIndexed(replayRows, "bronze/events", "event_id")
    val after = new graft.run.Orchestrator.Run(spark, wh, "Q")
      .readTablePointLookup("bronze/events", "event_id",
        events.drop(3).map(_.event_id))
    assert(after.select("event_id").as[Long].collect().sorted.toSeq ===
      events.drop(3).map(_.event_id).sorted)
    assert(spark.read.parquet(path).count() === events.size.toLong)
  }

  test("media near-dup gate stream: verdicts equal the batch incremental row") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // batch truth: the registered incremental row's full verdict
    val want = SparkEntry.queries("q_multimodal_neardup_incremental")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(want.values.exists(_._1) && want.values.exists(!_._1),
      "fixture too weak: both verdict branches must be exercised")
    // frozen corpus side: the shared bounded band-payload table
    val payload = graft.queries.MultimodalQueries
      .mediaIncrCorpusPayload(spark, dir)
    val batch = graft.queries.MultimodalQueries
      .mediaIncrBatchPayloads(spark, dir)
      .as[(Long, Array[Byte])].collect().sortBy(_._1)
    val ms = MemoryStream[(Long, Array[Byte])]
    val out = StreamingJobs.mediaNeardupStream(
      ms.toDF().toDF("doc_id", "payload"), payload)
    val q = out.writeStream.format("memory")
      .queryName("media_gate").outputMode("append").start()
    try {
      // two micro-batches: verdicts must not depend on arrival slicing
      val (a, b) = batch.splitAt(batch.length / 2)
      ms.addData(a); q.processAllAvailable()
      ms.addData(b); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("media_gate").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(got === want, "stream gate must equal the batch row bit-for-bit")
  }

  test("semantic gate stream: verdicts equal the batch incremental row") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // batch truth: the registered incremental row's is_dup bit
    val want = SparkEntry.queries("q_dedup_semantic_incremental")(spark, dir)
      .select("vec_id", "is_dup").as[(Long, Boolean)].collect().toMap
    assert(want.values.exists(identity) && want.values.exists(!_),
      "fixture too weak: both verdict branches must be exercised")
    // frozen artifacts: centroid model literal + per-list payload
    val model = graft.queries.SimQueries.semIncrCentModel(spark, dir)
    val payload = graft.queries.SimQueries.semIncrCentPayload(spark, dir)
    val batchVecs = Tables.t(spark, dir, "embeddings")
      .where(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val ms = MemoryStream[(Long, Array[Float])]
    val out = StreamingJobs.semanticGateStream(
      ms.toDF().toDF("vec_id", "embedding"), model, payload,
      graft.queries.SimQueries.SemanticEps)
    val q = out.writeStream.format("memory")
      .queryName("semgate").outputMode("append").start()
    try {
      // two arrival waves (order within the feed must not matter)
      val (w1, w2) = batchVecs.splitAt(batchVecs.length / 2)
      ms.addData(w2.toSeq); q.processAllAvailable()
      ms.addData(w1.toSeq); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("semgate").as[(Long, Boolean)].collect().toMap
    assert(got === want, "stream verdicts != batch verdicts")
  }

  test("ann ingest sink: streaming index equals batch index, replay-safe") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_annsink").toString
    val vecs = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val (slice1, slice2) = vecs.splitAt(vecs.length / 2)
    // batch ids are checkpoint-scoped (the warehouseSink invariant, so
    // a fresh checkpoint cannot overwrite an old stream's partitions) —
    // compute the scope the sink will use
    val scope = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$root/cp".getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString
    // batch reference: two Run ingests over the same two slices
    val whB = s"$root/whB"
    new graft.run.Orchestrator.Run(spark, whB, s"STREAMANN_${scope}_000000")
      .indexAnnBatch(slice1.toSeq.toDF("vec_id", "embedding"), nlist = 8)
    new graft.run.Orchestrator.Run(spark, whB, s"STREAMANN_${scope}_000001")
      .indexAnnBatch(slice2.toSeq.toDF("vec_id", "embedding"), nlist = 8)
    // streaming: same slices as two micro-batches
    val whS = s"$root/whS"
    val ms = MemoryStream[(Long, Array[Float])]
    val q = StreamingJobs.annIngestSink(
      ms.toDF().toDF("vec_id", "embedding"), whS, s"$root/cp", nlist = 8)
    try {
      ms.addData(slice1.toSeq); q.processAllAvailable()
      ms.addData(slice2.toSeq); q.processAllAvailable()
    } finally q.stop()
    def lists(wh: String) = spark.read.parquet(
        graft.run.Orchestrator.tablePath(wh, "indexes/ann_lists"))
      .select("vec_id", "cent_id").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(lists(whS) === lists(whB), "streaming index != batch index")
    assert(lists(whS).map(_._1) === vecs.map(_._1).toSeq)
    // replayed micro-batch: same batch id overwrites its own partition
    new graft.run.Orchestrator.Run(spark, whS, s"STREAMANN_${scope}_000001")
      .indexAnnBatch(slice2.toSeq.toDF("vec_id", "embedding"), nlist = 8)
    assert(lists(whS) === lists(whB), "replay changed the index")
    // and search serves over the streamed index
    val probe = Seq((1L, vecs.head._2)).toDF("q_id", "embedding")
    val hits = new graft.run.Orchestrator.Run(spark, whS, "Q")
      .annSearchIndexes(probe, k = 3, nprobe = 2)
    assert(hits.count() === 3)
  }

  test("warehouse sink: two file-source batches with an overlapping replay") {
    import spark.implicits._
    import graft.streaming.StreamingJobs.Event
    // the streaming face of the S8 idempotency contract, across a crash:
    // batch 0 lands, the checkpoint's commit marker is lost (crash after
    // the sink wrote but before the commit), new files arrive, and the
    // restarted query REPLAYS batch 0 under the same batch id before
    // processing batch 1 — dynamic partition overwrite must absorb the
    // replay with zero duplicates and one partition per micro-batch
    val root = java.nio.file.Files.createTempDirectory("graft_whsink2").toString
    val (in, wh, cp) = (s"$root/in", s"$root/wh", s"$root/cp")
    def writeFiles(evs: Seq[Event]): Unit =
      evs.toDF().write.mode("append").parquet(in)
    def drainOnce(): Unit = {
      val q = StreamingJobs.warehouseSink(
        StreamingJobs.readEventsStream(spark, in), wh, "bronze/events", cp)
      try q.processAllAvailable() finally q.stop()
      // stop() can return before the manager releases the checkpoint —
      // the restart below would then see a phantom concurrent query
      while (spark.streams.active.exists(_.id == q.id)) Thread.sleep(50)
    }
    val batch1 = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:05:00"), 2, "view", 2.0),
      Event(3, ts("2024-01-01 10:10:00"), 1, "click", 3.0))
    val batch2 = Seq(
      Event(4, ts("2024-01-01 11:00:00"), 3, "click", 4.0),
      Event(5, ts("2024-01-01 11:05:00"), 1, "view", 5.0))
    writeFiles(batch1)
    drainOnce()
    assert(spark.read.parquet(s"$wh/bronze/events").count() === 3)

    // crash window: batch 0 wrote its partition, but its commit marker
    // never landed — the restart must replay it under the SAME id
    val commit0 = new java.io.File(s"$cp/commits/0")
    assert(commit0.exists(), "precondition: batch 0 committed")
    assert(commit0.delete())
    // the local FS keeps a checksum sibling; left behind it makes the
    // replay's commit re-write fail as a phantom concurrent writer
    val crc0 = new java.io.File(s"$cp/commits/.0.crc")
    if (crc0.exists()) assert(crc0.delete())
    writeFiles(batch2)
    drainOnce()

    val all = spark.read.parquet(s"$wh/bronze/events")
    assert(all.count() === 5, "replayed batch duplicated rows")
    assert(all.select("event_id").distinct().count() === 5)
    // partition layout: exactly one dwh_batch_id directory per
    // micro-batch, both under this checkpoint's id scope
    val parts = new java.io.File(s"$wh/bronze/events").listFiles()
      .filter(_.getName.startsWith("dwh_batch_id=")).map(_.getName).sorted
    assert(parts.length === 2, s"partition layout: ${parts.mkString(", ")}")
    assert(parts.forall(_.startsWith("dwh_batch_id=SBATCH")))
    assert(parts(0).endsWith("_000000") && parts(1).endsWith("_000001"))
    // and each micro-batch's rows live in exactly their own partition
    import org.apache.spark.sql.functions.{collect_list, sort_array}
    val byPart = all.groupBy(col("dwh_batch_id"))
      .agg(sort_array(collect_list(col("event_id"))).as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(byPart.values.toSet === Set(Seq(1L, 2L, 3L), Seq(4L, 5L)))
  }

  test("streaming decontamination equals the batch overlap counts") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val batch = SparkEntry.queries("q_text_decontaminate")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(batch.values.exists(_._2), "no contaminated docs — vacuous")

    // the benchmark fingerprint set, exactly as the batch query builds it
    import graft.functions.TextHashDefaults.{WinB, WinK, WinP, WinW}
    import graft.functions.TextHashFunctions.winnowedFingerprints
    val benchFps = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") % 100 === 7)
      .select(explode(winnowedFingerprints(col("text"), WinK, WinW, WinB, WinP))
        .as("fp")).distinct()

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").na.fill("", Seq("text"))
      .as[(Long, String)].collect().toSeq
    val ms = MemoryStream[(Long, String)]
    val q = StreamingJobs.decontaminateStream(
        ms.toDF().toDF("doc_id", "text"), benchFps)
      .writeStream.format("memory").queryName("decon")
      .outputMode("append").start()
    try {
      val (first, rest) = docs.splitAt(docs.length / 2)
      ms.addData(first); q.processAllAvailable()
      ms.addData(rest); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("decon")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got.size === batch.size)
    // overlap counts agree everywhere; the contaminated flag agrees off
    // the benchmark membership (batch additionally un-flags benchmark
    // members themselves — a corpus-side rule, not a stream concern)
    got.foreach { case (id, (n, c)) =>
      assert(n === batch(id)._1, s"doc $id overlap")
      if (id % 100 != 7) assert(c === batch(id)._2, s"doc $id flag")
    }
  }

  test("streaming decontamination restart: no duplicate verdicts") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("graft_decon_").toString
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    val benchFps = Seq(1L, 2L).toDF("fp").where(lit(false)) // empty set

    def drainOnce(): Unit = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING").parquet(in)
      val q = StreamingJobs.decontaminateStream(stream, benchFps)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    Seq((1L, "aa bb cc dd ee ff gg hh"), (2L, "ii jj kk ll mm nn oo pp"))
      .toDF("doc_id", "text").write.mode("append").parquet(in)
    drainOnce()
    Seq((3L, "qq rr ss tt uu vv ww xx"))
      .toDF("doc_id", "text").write.mode("append").parquet(in)
    drainOnce() // restart from the checkpoint: docs 1-2 not reprocessed
    val got = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(got === Seq(1L, 2L, 3L))
  }

  test("file-source stream resumes exactly-once across restarts") {
    import spark.implicits._
    import graft.streaming.StreamingJobs.Event
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("graft_stream_").toString
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")

    def writeBatch(evs: Seq[Event]): Unit =
      evs.toDF().write.mode("append").parquet(in)

    def drainOnce(): Unit = {
      val q = StreamingJobs.readEventsStream(spark, in)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    writeBatch(Seq(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:10:00"), 1, "view", 2.0)))
    drainOnce()
    writeBatch(Seq(
      Event(3, ts("2024-01-01 10:20:00"), 2, "click", 4.0)))
    drainOnce() // restart from the same checkpoint: batch 1 files must
                // NOT be reprocessed, batch 2 files must appear once
    val got = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(got === Seq(1L, 2L, 3L))
  }

  test("flatMapGroupsWithState sessionizer emits closed sessions on gap and timeout") {
    import spark.implicits._
    import graft.streaming.StreamingJobs.Event
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StreamingJobs.sessionizeCustomState(ms.toDS())
      .writeStream.format("memory").queryName("custom_sess")
      .outputMode("append").start()
    try {
      // batch 1: two users, one session each (open at batch end)
      ms.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:10:00"), 1, "click", 2.0),
        Event(3, ts("2024-01-01 10:05:00"), 2, "view", 8.0))
      q.processAllAvailable()
      // batch 2: far-future event advances the watermark past both open
      // sessions' gap deadlines -> both time out and emit; user 1 opens
      // a new (unemitted) session
      ms.addData(Event(4, ts("2024-01-01 13:00:00"), 1, "view", 4.0))
      q.processAllAvailable()

      val got = spark.table("custom_sess")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getLong(2), r.getDouble(3))).toSet
      assert(got === Set(
        (1L, "2024-01-01 10:00:00.0", 2L, 3.0),
        (2L, "2024-01-01 10:05:00.0", 1L, 8.0)))
    } finally q.stop()
  }

  test("streaming as-of enrich equals the batch as-of join across batches") {
    import spark.implicits._
    import graft.streaming.StreamingJobs.Event
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // user 1: quote before probe (same batch), a tied-timestamp quote
    // pair (max event_id must win), an equal-ts probe (inclusive bound),
    // and a probe in a LATER batch matching a batch-1 quote; user 2:
    // probe with no quote ever (null enrich)
    val batch1 = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 1, "purchase", 5.0),
      Event(2, ts("2024-01-01 10:05:00"), 1, "click", 0.0),
      Event(3, ts("2024-01-01 10:05:00"), 2, "click", 0.0),
      Event(4, ts("2024-01-01 10:30:00"), 1, "purchase", 7.0),
      Event(5, ts("2024-01-01 10:30:00"), 1, "purchase", 9.0),
      Event(6, ts("2024-01-01 10:30:00"), 1, "click", 0.0))
    val batch2 = Seq(
      Event(7, ts("2024-01-01 11:00:00"), 1, "click", 0.0))
    val ms = MemoryStream[Event]
    val q = StreamingJobs.asofEnrichStream(ms.toDS(), "click", "purchase")
      .writeStream.format("memory").queryName("asof_enrich")
      .outputMode("append").start()
    try {
      ms.addData(batch1); q.processAllAvailable()
      ms.addData(batch2); q.processAllAvailable()
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), Option(r.get(3)).map(_.toString),
        Option(r.get(4)).map(_.toString), Option(r.get(5)).map(_.toString))
    val got = spark.table("asof_enrich")
      .select("event_id", "user_id", "ts",
        "matched_ts", "matched_event_id", "matched_value")
      .collect().map(key).toSet
    // the batch operator on the same rows is the ground truth
    val all = (batch1 ++ batch2).toDS()
    val want = graft.operators.AsofJoin.backward(
        all.where($"event_type" === "click")
          .select($"event_id", $"user_id", $"ts"),
        all.where($"event_type" === "purchase")
          .select($"user_id", $"ts".as("matched_ts"),
            $"event_id".as("matched_event_id"), $"value".as("matched_value")),
        key = "user_id", probeTime = "ts", quoteTime = "matched_ts",
        tieBreak = "matched_event_id")
      .select("event_id", "user_id", "ts",
        "matched_ts", "matched_event_id", "matched_value")
      .collect().map(key).toSet
    assert(got === want)
    // the interesting shapes really occurred: a null enrich, a tie
    // resolved to event 5, and the cross-batch carry to event 7
    assert(want.exists(_._3.isEmpty))
    assert(got.contains((6L, Some("2024-01-01 10:30:00.0"), Some("5"), Some("9.0"))))
    assert(got.contains((7L, Some("2024-01-01 10:30:00.0"), Some("5"), Some("9.0"))))
  }

  test("exact as-of enrich equals batch on a seeded random permutation across batches") {
    import spark.implicits._
    import graft.streaming.StreamingJobs.Event
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 40 seeded-random events over a 2 h span, then crafted shapes:
    // user 9's probe (101) arrives in batch 0 but its WINNING quote
    // (104, an equal-ts tie resolved by max event_id) only in batch 2 —
    // the out-of-order carry the eager variant cannot produce — plus a
    // non-winning out-of-order quote (102) in the last batch, and a
    // never-quoted user 10 probe (null enrich)
    val rnd = new scala.util.Random(7)
    def at(sec: Int) = new Timestamp(ts("2024-01-01 10:00:00").getTime + sec * 1000L)
    val base = (1 to 40).map { i =>
      Event(i.toLong, at(rnd.nextInt(7200)), 1L + rnd.nextInt(4),
        if (rnd.nextInt(3) == 0) "purchase" else "click",
        rnd.nextInt(100).toDouble)
    }
    val shuffled = rnd.shuffle(base).grouped(10).toSeq
    val batches = Seq(
      shuffled(0) :+ Event(101, ts("2024-01-01 10:30:00"), 9, "click", 0.0)
        :+ Event(105, ts("2024-01-01 10:05:00"), 10, "click", 0.0),
      shuffled(1) :+ Event(103, ts("2024-01-01 10:30:00"), 9, "purchase", 2.0),
      shuffled(2) :+ Event(104, ts("2024-01-01 10:30:00"), 9, "purchase", 3.0),
      shuffled(3) :+ Event(102, ts("2024-01-01 10:00:00"), 9, "purchase", 1.0))
    val ms = MemoryStream[Event]
    // lateness covers the whole fixture span: no permuted row is late
    val q = StreamingJobs.asofEnrichStreamExact(ms.toDS(), "click", "purchase",
        lateness = "1 day")
      .writeStream.format("memory").queryName("asof_exact")
      .outputMode("append").start()
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      // two flush batches: the first advances the watermark past every
      // event, the second runs the timeout batch that emits the verdicts
      ms.addData(Event(900, ts("2024-01-02 12:00:00"), 1, "view", 0.0))
      q.processAllAvailable()
      ms.addData(Event(901, ts("2024-01-03 12:00:00"), 1, "view", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), Option(r.get(3)).map(_.toString),
        Option(r.get(4)).map(_.toString), Option(r.get(5)).map(_.toString))
    val got = spark.table("asof_exact")
      .select("event_id", "user_id", "ts",
        "matched_ts", "matched_event_id", "matched_value")
      .collect().map(key).toSet
    val all = batches.flatten
    val want = graft.operators.AsofJoin.backward(
        all.toDS().where($"event_type" === "click")
          .select($"event_id", $"user_id", $"ts"),
        all.toDS().where($"event_type" === "purchase")
          .select($"user_id", $"ts".as("matched_ts"),
            $"event_id".as("matched_event_id"), $"value".as("matched_value")),
        key = "user_id", probeTime = "ts", quoteTime = "matched_ts",
        tieBreak = "matched_event_id")
      .select("event_id", "user_id", "ts",
        "matched_ts", "matched_event_id", "matched_value")
      .collect().map(key).toSet
    assert(got === want)
    // the witnesses really occurred: the later-batch winning quote
    // (eager would have emitted 101 unmatched at batch 0) and the
    // never-quoted null enrich
    assert(got.contains((101L, Some("2024-01-01 10:30:00.0"), Some("104"), Some("3.0"))))
    assert(got.contains((105L, None, None, None)))
  }

  test("exact variants are permutation-invariant across random seeds") {
    import spark.implicits._
    import graft.streaming.StreamingJobs.Event
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // four independent seeds, each a fresh random event set AND a fresh
    // random batch split — the streaming results must equal the batch
    // operator every time, not just on the crafted fixtures above
    val h = java.time.Duration.ofMinutes(30)
    for (seed <- Seq(2, 3, 5, 8)) {
      val rnd = new scala.util.Random(seed)
      def at(sec: Int) =
        new Timestamp(ts("2024-01-01 10:00:00").getTime + sec * 1000L)
      val base = (1 to 30).map { i =>
        Event(i.toLong, at(rnd.nextInt(3600)), 1L + rnd.nextInt(3),
          if (rnd.nextBoolean()) "purchase" else "click",
          rnd.nextInt(100).toDouble)
      }
      val batches = rnd.shuffle(base).grouped(1 + rnd.nextInt(9)).toSeq

      // as-of: streaming == AsofJoin.backward
      val ms1 = MemoryStream[Event]
      val q1 = StreamingJobs.asofEnrichStreamExact(ms1.toDS(),
          "click", "purchase", lateness = "1 day")
        .writeStream.format("memory").queryName(s"pi_asof_$seed")
        .outputMode("append").start()
      try {
        batches.foreach { b => ms1.addData(b); q1.processAllAvailable() }
        Seq(ts("2024-01-03 12:00:00"), ts("2024-01-04 12:00:00")).foreach { f =>
          ms1.addData(Event(900, f, 1, "view", 0.0)); q1.processAllAvailable()
        }
      } finally q1.stop()
      val asofRows = spark.table(s"pi_asof_$seed")
        .select("event_id", "matched_event_id")
        .collect().map(r => (r.getLong(0), Option(r.get(1))))
      val gotAsof = asofRows.toMap
      // toMap would silently absorb a double emission — the classic
      // stateful-streaming regression this sweep exists to catch
      assert(asofRows.length === gotAsof.size,
        s"duplicate as-of verdicts at seed $seed")
      val wantAsof = graft.operators.AsofJoin.backward(
          base.toDS().where($"event_type" === "click")
            .select($"event_id", $"user_id", $"ts"),
          base.toDS().where($"event_type" === "purchase")
            .select($"user_id", $"ts".as("m_ts"), $"event_id".as("m_id"),
              $"value".as("m_v")),
          key = "user_id", probeTime = "ts", quoteTime = "m_ts",
          tieBreak = "m_id")
        .select("event_id", "m_id")
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
      assert(gotAsof === wantAsof, s"as-of diverged at seed $seed")

      // conversion: streaming == forward-asof-with-horizon model
      val ms2 = MemoryStream[Event]
      val q2 = StreamingJobs.conversionStreamExact(ms2.toDS(),
          "click", "purchase", h, lateness = "1 day")
        .writeStream.format("memory").queryName(s"pi_conv_$seed")
        .outputMode("append").start()
      try {
        batches.foreach { b => ms2.addData(b); q2.processAllAvailable() }
        Seq(ts("2024-01-03 12:00:00"), ts("2024-01-04 12:00:00")).foreach { f =>
          ms2.addData(Event(900, f, 1, "view", 0.0)); q2.processAllAvailable()
        }
      } finally q2.stop()
      val convRows = spark.table(s"pi_conv_$seed")
        .select("event_id", "converted", "matched_event_id")
        .collect().map(r => (r.getLong(0),
          (r.getBoolean(1), Option(r.get(2)))))
      val gotConv = convRows.toMap
      assert(convRows.length === gotConv.size,
        s"duplicate conversion verdicts at seed $seed")
      val hs = h.getSeconds * 1000
      val wantConv = base.filter(_.event_type == "click").map { p =>
        val best = base.filter(e => e.event_type == "purchase"
            && e.user_id == p.user_id
            && e.ts.getTime >= p.ts.getTime
            && e.ts.getTime <= p.ts.getTime + hs)
          .sortBy(e => (e.ts.getTime, ~e.event_id)).headOption
        p.event_id -> ((best.isDefined, best.map(_.event_id)))
      }.toMap
      assert(gotConv === wantConv, s"conversion diverged at seed $seed")
    }
  }

  test("exact as-of enrich resolves a post-restart out-of-order quote") {
    import spark.implicits._
    import graft.streaming.StreamingJobs.Event
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("graft_asofx_").toString
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    def writeBatch(evs: Seq[Event]): Unit =
      evs.toDF().write.mode("append").parquet(in)
    def drainOnce(): Unit = {
      val q = StreamingJobs.asofEnrichStreamExact(
          StreamingJobs.readEventsStream(spark, in).as[Event],
          "click", "purchase", lateness = "2 hours")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // before the restart: a pending probe, a later quote that must NOT
    // match it (backward join), and user 2's quote held for a future probe
    writeBatch(Seq(
      Event(1, ts("2024-01-01 10:30:00"), 1, "click", 0.0),
      Event(2, ts("2024-01-01 10:40:00"), 1, "purchase", 5.0),
      Event(3, ts("2024-01-01 10:00:00"), 2, "purchase", 7.0)))
    drainOnce()
    // after the restart: quote 4 arrives OUT OF EVENT-TIME ORDER (before
    // the still-buffered probe 1 — the rebuilt state must re-resolve it),
    // probe 5 matches the pre-restart quote 3, and the far-future view
    // advances the watermark so the trailing no-data batch emits verdicts
    writeBatch(Seq(
      Event(4, ts("2024-01-01 10:10:00"), 1, "purchase", 9.0),
      Event(5, ts("2024-01-01 10:05:00"), 2, "click", 0.0),
      Event(6, ts("2024-01-01 20:00:00"), 1, "view", 0.0)))
    drainOnce()
    val got = spark.read.parquet(out)
      .select("event_id", "matched_event_id", "matched_value")
      .collect().map(r => (r.getLong(0),
        (Option(r.get(1)), Option(r.get(2))))).toMap
    assert(got === Map(
      1L -> ((Some(4L), Some(9.0))),  // out-of-order quote landed post-restart
      5L -> ((Some(3L), Some(7.0))))) // quote buffered across the restart
  }

  test("exact conversion attribution equals batch on a seeded random permutation") {
    import spark.implicits._
    import graft.streaming.StreamingJobs.Event
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val h = java.time.Duration.ofMinutes(30)
    // seeded random base + crafted witnesses: probe 101 arrives in batch
    // 0 but its winning quote 103 (equal-ts tie with 102, larger id
    // wins) only in batch 2 — and probe 105 arrives one batch AFTER its
    // in-window quote 104 (the documented eager-variant gap: it would
    // never convert there); probe 106 has no quote in its window
    val rnd = new scala.util.Random(11)
    def at(sec: Int) = new Timestamp(ts("2024-01-01 10:00:00").getTime + sec * 1000L)
    val base = (1 to 40).map { i =>
      Event(i.toLong, at(rnd.nextInt(7200)), 1L + rnd.nextInt(4),
        if (rnd.nextInt(3) == 0) "purchase" else "click",
        rnd.nextInt(100).toDouble)
    }
    val shuffled = rnd.shuffle(base).grouped(10).toSeq
    val batches = Seq(
      shuffled(0) :+ Event(101, ts("2024-01-01 10:30:00"), 9, "click", 0.0),
      shuffled(1) :+ Event(102, ts("2024-01-01 10:40:00"), 9, "purchase", 1.0)
        :+ Event(104, ts("2024-01-01 12:00:00"), 10, "purchase", 2.0),
      shuffled(2) :+ Event(103, ts("2024-01-01 10:40:00"), 9, "purchase", 3.0)
        :+ Event(105, ts("2024-01-01 11:50:00"), 10, "click", 0.0),
      shuffled(3) :+ Event(106, ts("2024-01-01 13:00:00"), 9, "click", 0.0))
    val ms = MemoryStream[Event]
    val q = StreamingJobs.conversionStreamExact(ms.toDS(), "click", "purchase",
        h, lateness = "1 day")
      .writeStream.format("memory").queryName("conv_exact")
      .outputMode("append").start()
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      ms.addData(Event(900, ts("2024-01-03 12:00:00"), 1, "view", 0.0))
      q.processAllAvailable()
      ms.addData(Event(901, ts("2024-01-04 12:00:00"), 1, "view", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("conv_exact")
      .select("event_id", "converted", "matched_event_id", "delay_seconds")
      .collect().map(r => (r.getLong(0),
        (r.getBoolean(1), Option(r.get(2)), Option(r.get(3))))).toMap
    // ground truth: forward as-of with horizon clamp, computed directly
    // (the oracle-checked q_funnel_conversion semantics): earliest
    // in-window quote, largest event_id at equal ts
    val all = batches.flatten
    val hs = h.getSeconds * 1000
    val want = all.filter(_.event_type == "click").map { p =>
      val cands = all.filter(e => e.event_type == "purchase"
        && e.user_id == p.user_id
        && e.ts.getTime >= p.ts.getTime && e.ts.getTime <= p.ts.getTime + hs)
      val best = cands.sortBy(e => (e.ts.getTime, ~e.event_id)).headOption
      p.event_id -> ((best.isDefined, best.map(_.event_id),
        best.map(e => (e.ts.getTime - p.ts.getTime) / 1000.0)))
    }.toMap
    assert(got === want)
    // witnesses really occurred: cross-batch tie resolved to 103, the
    // probe-after-quote conversion (105 -> 104), and a timeout (106)
    assert(got(101L) === ((true, Some(103L), Some(600.0))))
    assert(got(105L) === ((true, Some(104L), Some(600.0))))
    assert(got(106L) === ((false, None, None)))
  }

  test("exact conversion attribution converts a probe arriving after a restart") {
    import spark.implicits._
    import graft.streaming.StreamingJobs.Event
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("graft_convx_").toString
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    def writeBatch(evs: Seq[Event]): Unit =
      evs.toDF().write.mode("append").parquet(in)
    def drainOnce(): Unit = {
      val q = StreamingJobs.conversionStreamExact(
          StreamingJobs.readEventsStream(spark, in).as[Event],
          "click", "purchase", java.time.Duration.ofMinutes(30),
          lateness = "2 hours")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // the quote lands BEFORE the restart; its probe only after (with an
    // event time before the quote) — the rebuilt quote buffer must
    // still convert it; probe 2's window passes with no quote
    writeBatch(Seq(
      Event(1, ts("2024-01-01 10:20:00"), 1, "purchase", 5.0),
      Event(2, ts("2024-01-01 10:00:00"), 2, "click", 0.0)))
    drainOnce()
    writeBatch(Seq(
      Event(3, ts("2024-01-01 10:10:00"), 1, "click", 0.0),
      Event(4, ts("2024-01-01 20:00:00"), 1, "view", 0.0)))
    drainOnce()
    val got = spark.read.parquet(out)
      .select("event_id", "converted", "matched_event_id")
      .collect().map(r => (r.getLong(0), (r.getBoolean(1), Option(r.get(2)))))
      .toMap
    assert(got === Map(
      3L -> ((true, Some(1L))),  // quote buffered across the restart
      2L -> ((false, None))))    // deadline passed, no quote
  }

  test("streaming incremental dedup equals the batch verdicts") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // same fixture split as q_dedup_incremental: doc_id % 10 == 0 is the
    // "new batch" (streamed), the rest is the corpus (static indexes)
    val dir = "/root/testdata/sf0.001"
    val expected = SparkEntry.queries("q_dedup_incremental")(spark, dir)
      .collect().map(r => (r.getLong(0),
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(expected.values.exists(_._2), "no near-dup verdict — vacuous")
    assert(expected.values.exists(_._3), "nothing kept — vacuous")

    import graft.queries.TextQueries.{bandKeysCol, minhashCol, textKeyCol}
    import org.apache.spark.sql.functions.explode
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") % 10 =!= 0)
    val corpusKeys = corpus.select(textKeyCol.as("text_key")).distinct()
    val corpusBands = corpus.select(minhashCol.as("mh"))
      .where(col("mh").isNotNull)
      .select(explode(bandKeysCol(col("mh"))).as("band_key")).distinct()

    val newDocs = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") % 10 === 0)
      .select("doc_id", "text")
      .as[(Long, String)].collect().toSeq
    val ms = MemoryStream[(Long, String)]
    val q = StreamingJobs.dedupIncrementalStream(
        ms.toDF().toDF("doc_id", "text"), corpusKeys, corpusBands)
      .writeStream.format("memory").queryName("inc_dedup")
      .outputMode("append").start()
    try {
      val (first, rest) = newDocs.splitAt(newDocs.length / 2)
      ms.addData(first); q.processAllAvailable()
      ms.addData(rest); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("inc_dedup")
      .collect().map(r => (r.getLong(0),
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(got === expected)
  }

  test("as-of enrich quote state survives a checkpoint restart") {
    import spark.implicits._
    import graft.streaming.StreamingJobs.Event
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("graft_asof_").toString
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    def writeBatch(evs: Seq[Event]): Unit =
      evs.toDF().write.mode("append").parquet(in)
    def drainOnce(): Unit = {
      val q = StreamingJobs.asofEnrichStream(
          StreamingJobs.readEventsStream(spark, in).as[Event],
          "click", "purchase")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // the quote lands BEFORE the restart; its probes only after — the
    // one-record-per-key GroupState must be rebuilt from the state store
    writeBatch(Seq(Event(1, ts("2024-01-01 10:00:00"), 1, "purchase", 5.0)))
    drainOnce()
    writeBatch(Seq(
      Event(2, ts("2024-01-01 11:00:00"), 1, "click", 0.0),
      Event(3, ts("2024-01-01 11:00:00"), 2, "click", 0.0)))
    drainOnce()
    val got = spark.read.parquet(out)
      .select("event_id", "matched_event_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(got === Map(2L -> Some(1L), 3L -> None))
  }

  test("conversion attribution: converts on quote arrival, times out unconverted") {
    import spark.implicits._
    import graft.streaming.StreamingJobs.Event
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StreamingJobs.conversionStream(ms.toDS(), "click", "purchase",
        java.time.Duration.ofMinutes(30))
      .writeStream.format("memory").queryName("conv")
      .outputMode("append").start()
    try {
      // user 1: click converts 10 min later; a second click's window
      // passes with no purchase; user 2: equal-ts purchase (inclusive),
      // and a purchase AFTER the window that must NOT match
      ms.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 0.0),
        Event(2, ts("2024-01-01 10:10:00"), 1, "purchase", 5.0),
        Event(3, ts("2024-01-01 10:20:00"), 1, "click", 0.0),
        Event(4, ts("2024-01-01 10:00:00"), 2, "click", 0.0),
        Event(5, ts("2024-01-01 10:00:00"), 2, "purchase", 7.0),
        Event(6, ts("2024-01-01 11:00:00"), 2, "click", 0.0))
      q.processAllAvailable()
      // watermark advance: 13:00 - 10min lateness = 12:50 is past every
      // open deadline (10:50, 11:30) -> both pending clicks time out
      ms.addData(Event(7, ts("2024-01-01 13:00:00"), 2, "purchase", 9.0))
      q.processAllAvailable()
      ms.addData(Event(8, ts("2024-01-01 13:30:00"), 1, "view", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("conv")
      .select("event_id", "converted", "matched_event_id", "delay_seconds")
      .collect().map(r => (r.getLong(0),
        (r.getBoolean(1), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(got === Map(
      1L -> ((true, Some(2L), Some(600.0))),   // converted in 10 min
      3L -> ((false, None, None)),             // window passed, no purchase
      4L -> ((true, Some(5L), Some(0.0))),     // equal-ts inclusive
      6L -> ((false, None, None))))            // 13:00 purchase is past 11:30
  }

  test("conversion attribution pending probes survive a checkpoint restart") {
    import spark.implicits._
    import graft.streaming.StreamingJobs.Event
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("graft_conv_").toString
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    def writeBatch(evs: Seq[Event]): Unit =
      evs.toDF().write.mode("append").parquet(in)
    def drainOnce(): Unit = {
      val q = StreamingJobs.conversionStream(
          StreamingJobs.readEventsStream(spark, in).as[Event],
          "click", "purchase", java.time.Duration.ofMinutes(30))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // two probes land BEFORE the restart, still inside their windows
    writeBatch(Seq(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 0.0),
      Event(2, ts("2024-01-01 10:05:00"), 2, "click", 0.0)))
    drainOnce()
    // after restart: user 1's purchase arrives in-window -> converted;
    // user 2 never converts — the 12:00 VIEW event advances the
    // watermark past its 10:35 deadline (the watermark sits before the
    // type filter precisely so unrelated events keep the clock moving)
    // and the run's trailing no-data batch fires the timeout
    writeBatch(Seq(
      Event(3, ts("2024-01-01 10:20:00"), 1, "purchase", 5.0),
      Event(4, ts("2024-01-01 12:00:00"), 1, "view", 0.0)))
    drainOnce()
    val got = spark.read.parquet(out)
      .select("event_id", "converted", "matched_event_id")
      .collect().map(r => (r.getLong(0), (r.getBoolean(1), Option(r.get(2)))))
      .toMap
    assert(got === Map(
      1L -> ((true, Some(3L))),   // state carried the pending probe
      2L -> ((false, None))))     // timed out after the restart
  }

  test("stream-stream interval join equals the batch banded range join") {
    import spark.implicits._
    import graft.streaming.StreamingJobs.Event
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // boundary shapes on purpose: an exact ts+1h partner (included), an
    // equal-ts pair (excluded), a just-outside partner, and a
    // cross-micro-batch pair
    val batch1 = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:30:00"), 1, "click", 2.0),
      Event(3, ts("2024-01-01 10:00:00"), 2, "click", 3.0), // equal ts as 1
      Event(4, ts("2024-01-01 11:00:00"), 1, "click", 4.0)) // == 1.ts + 1h
    val batch2 = Seq(
      Event(5, ts("2024-01-01 11:20:00"), 2, "click", 5.0), // pairs with 2, 4
      Event(6, ts("2024-01-01 12:00:01"), 1, "click", 6.0)) // 1s past 4's window? no: 4+1h = 12:00 -> excluded
    val ms = MemoryStream[Event]
    val q = StreamingJobs.intervalJoinStream(ms.toDF(), ms.toDF())
      .select("l_id", "r_id")
      .writeStream.format("memory").queryName("interval_join")
      .outputMode("append").start()
    try {
      ms.addData(batch1); q.processAllAvailable()
      ms.addData(batch2); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("interval_join")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: the batch banded range join on the same rows
    val all = (batch1 ++ batch2).toDF()
    val want = graft.operators.RangeBinJoin.leftRangeJoin(
        all.select($"event_id".as("l_id"), $"event_type".as("k"), $"ts".as("l_ts")),
        all.select($"event_id".as("r_id"), $"event_type".as("rk"), $"ts".as("r_ts")),
        "k", "rk", "l_ts", "r_ts", 3600L * 1000000L)
      .where($"r_id".isNotNull)
      .select("l_id", "r_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    // the shapes really occurred: inclusive end (1,4), cross-batch
    // (2,5) and (4,5), and NOT the equal-ts or past-window pairs
    assert(got.contains((1L, 4L)) && got.contains((2L, 5L)) && got.contains((4L, 5L)))
    assert(!got.contains((1L, 3L)) && !got.contains((4L, 6L)))
  }

  test("exact streaming transitions equal batch LEAD pairs on a seeded permutation") {
    import spark.implicits._
    import graft.streaming.StreamingJobs.Event
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // seeded random events shuffled ACROSS micro-batches: successors
    // routinely arrive before their predecessors, which the
    // watermark-buffered pairing must reorder back to event time
    val rnd = new scala.util.Random(11)
    def at(sec: Int) =
      new Timestamp(ts("2024-01-01 10:00:00").getTime + sec * 1000L)
    val base = (1 to 60).map { i =>
      Event(i.toLong, at(rnd.nextInt(7200)), 1L + rnd.nextInt(5),
        Seq("view", "click", "purchase")(rnd.nextInt(3)), 0.0)
    }
    val batches = rnd.shuffle(base).grouped(12).toSeq
    val ms = MemoryStream[Event]
    val q = StreamingJobs.transitionsStreamExact(ms.toDS(), lateness = "1 day")
      .writeStream.format("memory").queryName("trans_exact")
      .outputMode("append").start()
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      // flush 1 advances the watermark past every base event; flush 2
      // runs the timeout batch that emits the remaining pairs
      ms.addData(Event(900, ts("2024-01-02 12:00:00"), 99, "view", 0.0))
      q.processAllAvailable()
      ms.addData(Event(901, ts("2024-01-03 12:00:00"), 99, "view", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("trans_exact")
      .select("user_id", "cur_event", "next_event", "cur_event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    // ground truth: per-user consecutive pairs in (ts, event_id) order —
    // the q_events_transitions LEAD semantics
    val want = base.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
      es.sortBy(e => (e.ts.getTime, e.event_id)).sliding(2).collect {
        case Seq(a, b) => (u, a.event_type, b.event_type, a.event_id)
      }
    }.toSet
    assert(got === want)
    assert(got.size >= 50) // 60 events over 5 users -> 55 pairs
  }
}
