package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: binary payload schema, narrow (shuffle-free)
  * plan shape, and decode-stub features verified against a direct md5
  * computation.
  */
class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  private def docs = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(0L, "hello world"), Row(1L, "spark"), Row(2L, "")), 2),
      schema)
  }

  test("synthesize produces a real binary payload column with metadata") {
    val media = Multimodal.synthesize(docs)
    val schema = media.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(schema("payload") === BinaryType)
    assert(schema("kind") === StringType)
    assert(schema("width") === IntegerType)
    val kinds = media.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("kind")).toMap
    assert(kinds === Map(0L -> "image", 1L -> "audio", 2L -> "video"))
    assert(media.collect().forall(_.getAs[Array[Byte]]("payload").length == 16))
  }

  test("featurize is narrow: no shuffle in the physical plan") {
    val plan = Multimodal.documentFeatures(spark, docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("resize stub rescales payloads and updates metadata") {
    import spark.implicits._
    val media = Multimodal.synthesize(docs).as[Multimodal.MediaRecord]
    val resized = Multimodal.resize(media, 64, 64).collect()
    assert(resized.forall(_.payload.length === 4))  // 64*64/1024
    assert(resized.forall(m => m.width === 64 && m.height === 64))
    // deterministic: first byte of the resampled payload = first source byte
    val md = java.security.MessageDigest.getInstance("MD5")
    val src = md.digest("hello world".getBytes("UTF-8"))
    assert(resized.find(_.doc_id == 0L).get.payload.head === src.head)
  }

  test("frame sampling keeps every stride-th fixed-size block") {
    import spark.implicits._
    val media = Multimodal.synthesize(docs).as[Multimodal.MediaRecord]
    val frames = Multimodal.sampleFrames(media, frameBytes = 4, stride = 2)
    // 16-byte payload -> 4 frames -> keep indices 0 and 2
    val byDoc = frames.collect().groupBy(_.getLong(0))
    assert(byDoc.values.forall(_.map(_.getLong(2)).sorted.sameElements(Array(0L, 2L))))
    assert(frames.collect().forall(_.getAs[Array[Byte]]("frame").length === 4))
  }

  test("exact media dedup collapses byte-identical payloads within a modality") {
    // doc_ids 0/3/6 are all 'image' (doc_id % 3 == 0); 0 and 6 share
    // text, so their payloads are byte-identical and must collapse to
    // one group keeping the min doc_id; 3 differs and stands alone.
    // The fixture corpus has no exact payload dups, so this is the
    // non-vacuous pin of q_multimodal_dedup's collapse semantics.
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(0L, "same bytes"), Row(3L, "other"), Row(6L, "same bytes")), 2),
      schema)
    import org.apache.spark.sql.functions._
    val grouped = Multimodal.synthesize(d)
      .groupBy(col("kind"), hex(col("payload")).as("payload_md5"))
      .agg(min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).as("n_copies"))
      .collect()
    assert(grouped.length === 2)
    val dup = grouped.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("keep_doc_id") === 0L)
    assert(grouped.find(_.getAs[Long]("n_copies") == 1L)
      .get.getAs[Long]("keep_doc_id") === 3L)
  }

  test("decode-stub features match direct md5 byte statistics") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = md.digest("hello world".getBytes("UTF-8")).map(_ & 0xff)
    val row = Multimodal.documentFeatures(spark, docs)
      .where("doc_id = 0").collect().head
    assert(row.getAs[Long]("n_bytes") === 16L)
    assert(row.getAs[Long]("first_byte") === expected.head.toLong)
    assert(row.getAs[Long]("byte_sum") === expected.map(_.toLong).sum)
    assert(row.getAs[Double]("mean_byte") === expected.map(_.toLong).sum.toDouble / 16)
  }

  test("audio frame energy matches a direct BE-int16 PCM decode") {
    import spark.implicits._
    // doc 1 is the audio row of the fixture ("spark")
    val md = java.security.MessageDigest.getInstance("MD5")
    val bytes = md.digest("spark".getBytes("UTF-8"))
    val samples = (0 until 8).map(i =>
      (((bytes(2 * i) & 0xff) << 8) | (bytes(2 * i + 1) & 0xff))
        .toShort.toLong)
    val expected = samples.grouped(4).zipWithIndex.map { case (fr, i) =>
      (1L, i.toLong, fr.map(s => s * s).sum)
    }.toSeq
    val media = Multimodal.synthesize(docs).as[Multimodal.MediaRecord]
    val got = Multimodal.audioFrameEnergy(media, 4, Long.MaxValue)
      .collect().toSeq
    // modality routing: only the audio doc produces frames
    assert(got.map(_.doc_id).distinct === Seq(1L))
    assert(got.map(r => (r.doc_id, r.frame_index, r.energy)) === expected)
    assert(got.forall(_.is_silence), "threshold = MaxValue: all silent")
    val loud = Multimodal.audioFrameEnergy(media, 4, 0L).collect()
    assert(loud.forall(!_.is_silence), "threshold = 0: nothing silent")
  }

  test("dhash64: deterministic gradient bits, SQL-registered, tolerant") {
    import graft.functions.MediaHash
    import spark.implicits._
    // hand-computable payload: 72 bytes ascending → every gradient
    // strictly rising → p(r,c) > p(r,c+1) never holds → hash 0; the
    // reverse (descending) sets every comparison bit → -1 (all 64)
    val asc = Array.tabulate(72)(_.toByte)
    val desc = asc.reverse
    assert(MediaHash.dhash64(asc) === 0L)
    assert(MediaHash.dhash64(desc) === -1L)
    assert(MediaHash.dhash64(Array.emptyByteArray) === 0L,
      "empty payload: no gradients")
    // a one-byte wiggle is a NEAR-dup: few bits, never a new identity
    val wig = asc.clone(); wig(30) = (wig(30) + 120).toByte
    val d = java.lang.Long.bitCount(
      MediaHash.dhash64(asc) ^ MediaHash.dhash64(wig))
    assert(d >= 1 && d <= 4, s"one-byte wiggle flipped $d bits")
    // SQL registration through GraftExtensions
    graft.functions.GraftExtensions.install(spark)
    val viaSql = Seq(Tuple1(desc)).toDF("payload")
      .selectExpr("dhash64(payload)").head().getLong(0)
    assert(viaSql === -1L)
  }

  test("phash64: integer-DCT bits, nonnegative, SQL-registered, complements dhash") {
    import graft.functions.MediaHash
    import spark.implicits._
    assert(MediaHash.phash64(Array.emptyByteArray) === 0L,
      "empty payload: no coefficients")
    // bits live at positions 0..62 (DC dropped), so the hash is always
    // nonnegative — the oracle reassembles it without two's-complement
    val payloads = (0 until 50).map { s =>
      Array.tabulate(80)(i => ((i * 37 + s * 13) % 256).toByte)
    }
    payloads.foreach(p => assert(MediaHash.phash64(p) >= 0L))
    // a constant plane has every AC coefficient 0 = median -> hash 0
    assert(MediaHash.phash64(Array.fill(80)(7.toByte)) === 0L)
    // dhash is EXACTLY invariant under a strictly monotone intensity
    // remap (it compares neighbors); phash moves only slightly
    def mono(p: Array[Byte]) =
      p.map(b => math.min((b & 0xff) / 2 + 120, 255).toByte)
    // alternating dither is the published dhash weakness: near-tie
    // gradients flip while phash's low-frequency energy averages out
    def dither(p: Array[Byte]) = p.zipWithIndex.map { case (b, i) =>
      if (i % 2 == 0) math.min((b & 0xff) + 16, 255).toByte
      else math.max((b & 0xff) - 16, 0).toByte
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val rnd = (0 until 50).map(i => (0 until 5).flatMap(j =>
      md.digest(s"doc $i block $j".getBytes("UTF-8")).toSeq).toArray)
    val ditherD = rnd.map(p => java.lang.Long.bitCount(
      MediaHash.dhash64(p) ^ MediaHash.dhash64(dither(p))))
    val ditherP = rnd.map(p => java.lang.Long.bitCount(
      MediaHash.phash64(p) ^ MediaHash.phash64(dither(p))))
    assert(ditherP.forall(_ <= 6),
      s"phash must survive dither: ${ditherP.max} bits flipped")
    assert(ditherD.sum > ditherP.sum * 2,
      s"dither must hurt dhash more (d=${ditherD.sum}, p=${ditherP.sum})")
    // monotone remap: dhash identical up to the ties /2 introduces
    rnd.take(10).foreach { p =>
      val dd = java.lang.Long.bitCount(
        MediaHash.dhash64(p) ^ MediaHash.dhash64(mono(p)))
      assert(dd <= 6, s"monotone remap flipped $dd dhash bits")
    }
    // SQL registration through GraftExtensions
    graft.functions.GraftExtensions.install(spark)
    val p0 = rnd.head
    val viaSql = Seq(Tuple1(p0)).toDF("payload")
      .selectExpr("phash64(payload)").head().getLong(0)
    assert(viaSql === MediaHash.phash64(p0))
  }

  test("phash A/B row: three families measured, phash wins dither, both see reencode") {
    import spark.implicits._
    val rows = graft.queries.MultimodalQueries
      .queries("q_multimodal_phash_ab")(spark, "/root/testdata/sf0.001")
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(rows.keySet === Set("reencode", "levels", "dither")
      .flatMap(f => Set((f, "dhash"), (f, "phash"))))
    rows.values.foreach { case (pairs, caught, ppm) =>
      assert(pairs === 100L) // 500 docs / mod 5
      assert(ppm === caught * 1000000L / pairs)
    }
    // the measured complement: dhash catches every re-encode, phash
    // survives the dither dhash mostly misses
    assert(rows(("reencode", "dhash"))._2 === 100L)
    assert(rows(("dither", "phash"))._2 === 100L)
    assert(rows(("dither", "dhash"))._2 < 60L,
      "dither must separate the kernels or the A/B measures nothing")
    assert(rows(("levels", "dhash"))._2 === 100L)
  }

  test("phash banded near-dup: variants within threshold pair with their originals") {
    import spark.implicits._
    val pairs = graft.queries.MultimodalQueries
      .queries("q_multimodal_neardup_phash")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty)
    val variantPairs = pairs.filter(_._2 >= 1000000000L)
    assert(variantPairs.nonEmpty,
      "pHash must catch re-encoded variants through the banded join")
    variantPairs.foreach { case (a, b, h) =>
      assert(b - 1000000000L === a, s"variant $b paired with stranger $a")
      assert(h <= 6L)
    }
    // the A/B row's measured truth (phash ~97% on reencode): fewer or
    // equal variant catches than dhash's 100%, never zero
    val dhashVariants = graft.queries.MultimodalQueries
      .queries("q_multimodal_neardup")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect().count(_._2 >= 1000000000L)
    assert(variantPairs.length <= dhashVariants)
  }

  test("perceptual near-dup catches re-encodes the byte digest misses") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val pairs = graft.queries.MultimodalQueries
      .queries("q_multimodal_neardup")(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty)
    // every variant (re-encoded copy at doc_id + 1e9) must pair with
    // its own original, within the threshold — the catch the exact
    // byte-digest dedup is blind to (payload bytes differ)
    val variantPairs = pairs.filter(_._2 >= 1000000000L)
    assert(variantPairs.nonEmpty)
    variantPairs.foreach { case (a, b, h) =>
      assert(b - 1000000000L === a, s"variant $b paired with stranger $a")
      assert(h <= 6L)
    }
    val nVariants = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") % 7 === 3).count()
    assert(variantPairs.length.toLong === nVariants,
      "every re-encoded variant must surface exactly once")
    // and the recall A/B row measures the 4x16 banding against the
    // lossless 7-band exact baseline
    val r = graft.queries.MultimodalQueries
      .queries("q_multimodal_neardup_recall")(spark, dir)
      .as[(Long, Long, Long)].head()
    assert(r._1 > 0L && r._2 <= r._1)
    assert(r._3 === (r._2 * 1000000L) / r._1)
    // the canonical face: every variant clusters under its original
    // (min-id canonical — keep=false for the re-encode, true for the
    // original), singletons keep themselves
    val canon = graft.queries.MultimodalQueries
      .queries("q_multimodal_neardup_canonical")(spark, dir)
      .as[(Long, Long, Boolean)].collect()
    val byId = canon.map(c => c._1 -> c).toMap
    variantPairs.foreach { case (a, b, _) =>
      assert(byId(b) === ((b, a, false)), s"variant $b must yield to $a")
      assert(byId(a)._3, s"original $a must be the canonical keeper")
    }
    assert(canon.count(!_._3) === variantPairs.length,
      "exactly the variants lose the canonical pick on this fixture")
  }
}
