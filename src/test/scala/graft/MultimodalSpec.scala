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
}
