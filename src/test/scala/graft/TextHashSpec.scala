package graft

import graft.functions.TextHashFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.scalatest.funsuite.AnyFunSuite

/** The native per-row text-hash expressions (MinHashSignature, SimHash64,
  * ShingleHashes) must reproduce EXACTLY what the composed built-in
  * pipelines compute (explode → md5 → conv → aggregate), on real document
  * data — the composed forms are what the DuckDB oracle mirrors.
  */
class TextHashSpec extends AnyFunSuite with SparkTestBase {

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  private def words(c: org.apache.spark.sql.Column) = split(trim(c), "\\s+")

  private def h64(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  private def stringShingles(c: org.apache.spark.sql.Column, n: Int) = {
    val w = words(c)
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", slice(w, i, lit(n)))))
      .otherwise(array())
  }

  test("ShingleHashes = sorted distinct h64 over string shingles") {
    for (dir <- dirs) {
      val docs = Tables.t(spark, dir, "documents")
      val native = docs.select(col("doc_id"),
          shingleHashes(words(col("text")), 3).as("hs"))
        .select(col("doc_id"), explode(col("hs")).as("h"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val composed = docs.select(col("doc_id"),
          explode(stringShingles(col("text"), 3)).as("s"))
        .select(col("doc_id"), h64(col("s")).as("h")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(native === composed, dir)
      assert(native.nonEmpty, s"$dir produced no shingles — vacuous")
    }
  }

  test("MinHashSignature = groupBy-min over exploded shingle hashes") {
    val (k, p) = (8, 2147483647L)
    val a = Seq(1000003L, 2000003L, 3000017L, 4000037L,
      5000011L, 6000011L, 7000003L, 8000009L)
    val b = Seq(12345L, 54321L, 192837L, 918273L,
      111111L, 222222L, 333333L, 444444L)
    for (dir <- dirs) {
      val docs = Tables.t(spark, dir, "documents")
      val native = docs.select(col("doc_id"),
          minhashSignature(words(col("text")), 3, k, a, b, p).as("mh"))
        .where(col("mh").isNotNull)
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
      val sh = docs.select(col("doc_id"),
          explode(stringShingles(col("text"), 3)).as("s"))
        .withColumn("h0",
          conv(substring(md5(col("s")), 1, 9), 16, 10).cast(LongType))
      val minCols = (0 until k).map(i =>
        min((lit(a(i)) * col("h0") + lit(b(i))) % p).as(s"h$i"))
      val composed = sh.groupBy(col("doc_id"))
        .agg(minCols.head, minCols.tail: _*)
        .collect().map(r => (r.getLong(0), (1 to k).map(r.getLong).toSeq)).toMap
      assert(native === composed, dir)
      assert(native.nonEmpty, s"$dir produced no signatures — vacuous")
    }
  }

  test("SimHash64 = 32-column bit-count aggregate over exploded tokens") {
    val bits = 32
    for (dir <- dirs) {
      val docs = Tables.t(spark, dir, "documents")
      val native = docs.select(col("doc_id"),
          simhash64(words(col("text")), bits).as("simhash"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val tok = docs.select(col("doc_id"), explode(words(col("text"))).as("w"))
        .withColumn("h", h64(col("w")))
      val bitCols = (0 until bits).map(j =>
        sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1))
          .as(s"b$j"))
      val sums = tok.groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
      val sim = (0 until bits).map(j =>
        when(col(s"b$j") > 0, lit(1L << j)).otherwise(0L)).reduce(_ + _)
      val composed = sums.select(col("doc_id"), sim.as("simhash"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(native === composed, dir)
    }
  }

  test("TopNgramCount = max group size over exploded n-gram strings") {
    import graft.functions.TextHashFunctions.topNgramCount
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = Tables.t(spark, dir, "documents")
      val native = docs.select(col("doc_id"),
          topNgramCount(words(col("text")), 2).as("top"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val composed = docs
        .select(col("doc_id"), explode(when(size(words(col("text"))) >= 2,
          transform(sequence(lit(1), size(words(col("text"))) - 1),
            i => concat_ws(" ", element_at(words(col("text")), i),
              element_at(words(col("text")), i + 1))))
          .otherwise(array())).as("g"))
        .groupBy(col("doc_id"), col("g")).count()
        .groupBy(col("doc_id")).agg(max(col("count")).as("top"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      // docs with < 2 words have no composed rows; kernel returns 0
      native.foreach { case (id, top) =>
        assert(top === composed.getOrElse(id, 0L), s"doc $id at $dir")
      }
    }
    // edge cases: empty, single-word, all-equal
    import spark.implicits._
    val edge = Seq((1L, ""), (2L, "one"), (3L, "x x x x"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), topNgramCount(words(col("text")), 2).as("top"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edge === Set((1L, 0L), (2L, 0L), (3L, 3L)))
  }

  test("short and empty docs: null signature, empty shingle set") {
    import spark.implicits._
    val df = Seq((1L, "one two"), (2L, ""), (3L, "a b c d")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        minhashSignature(words(col("text")), 3, 2,
          Seq(1L, 2L), Seq(0L, 1L), 2147483647L).as("mh"),
        shingleHashes(words(col("text")), 3).as("hs"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1), r.getSeq[Long](2).length))
      .toSet
    // "" splits to [""] (one token) -> too short for 3-grams; "a b c d" has 2
    assert(out === Set((1L, true, 0), (2L, true, 0), (3L, false, 2)))
  }
}
