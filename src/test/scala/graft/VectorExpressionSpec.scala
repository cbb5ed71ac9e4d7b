package graft

import graft.functions.{GraftExtensions, VectorFunctions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.scalatest.funsuite.AnyFunSuite

/** The native QuantizedDot expression must be bit-identical to the
  * composed built-in form (transform → zip_with → aggregate) it
  * replaces, across real embedding data and edge cases, and must
  * resolve from SQL via GraftExtensions.
  */
class VectorExpressionSpec extends AnyFunSuite with SparkTestBase {

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    def q(c: org.apache.spark.sql.Column) =
      transform(c, x => floor(x.cast(DoubleType) * 1000).cast(LongType))
    aggregate(zip_with(q(a), q(b), (x, y) => x * y), lit(0L), (acc, x) => acc + x)
  }

  test("native dot equals composed-HOF dot on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val both = e.select(
      VectorFunctions.quantizedNorm(col("embedding")).as("native"),
      hofDot(col("embedding"), col("embedding")).as("hof"))
    assert(both.where(col("native") =!= col("hof")).count() === 0)
    // cross products on a small sample
    val s = e.limit(20).select(col("vec_id").as("ida"), col("embedding").as("a"))
    val t = e.limit(20).select(col("vec_id").as("idb"), col("embedding").as("b"))
    val cross = s.crossJoin(t).select(
      VectorFunctions.quantizedDot(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof"))
    assert(cross.where(col("native") =!= col("hof")).count() === 0)
  }

  test("native L2 equals composed-HOF L2 on real quantized vectors") {
    def q(c: org.apache.spark.sql.Column) =
      transform(c, x => floor(x.cast(DoubleType) * 1000).cast(LongType))
    def hofL2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L),
        (acc, x) => acc + x)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), q(col("embedding")).as("qv"))
    val s = e.limit(25).select(col("vec_id").as("ida"), col("qv").as("a"))
    val t = e.limit(25).select(col("vec_id").as("idb"), col("qv").as("b"))
    val cross = s.crossJoin(t).select(
      VectorFunctions.quantizedL2(col("a"), col("b")).as("native"),
      hofL2(col("a"), col("b")).as("hof"))
    assert(cross.where(col("native") =!= col("hof")).count() === 0)
    // self-distance is zero; empty arrays give zero
    import spark.implicits._
    val edge = Seq((Array(3L, -4L), Array(3L, -4L), 0L),
      (Array.empty[Long], Array.empty[Long], 0L),
      (Array(5L), Array(-5L), 100L)).toDF("a", "b", "expected")
    assert(edge.select(VectorFunctions.quantizedL2(col("a"), col("b"))
      .as("got"), col("expected"))
      .where(col("got") =!= col("expected")).count() === 0)
  }

  test("edge cases: empty arrays, negatives") {
    import spark.implicits._
    val df = Seq(
      (Array.empty[Float], Array.empty[Float], 0L),
      (Array(-0.5f, 2.0f), Array(1.0f, 1.0f), -500L * 1000 + 2000L * 1000),
      (Array(0.0015f, -0.0015f), Array(1.0f, 1.0f), 1000L - 2 * 1000L)) // floor(-1.5)=-2
      .toDF("a", "b", "expected")
    val bad = df.select(
      VectorFunctions.quantizedDot(col("a"), col("b")).as("got"), col("expected"))
      .where(col("got") =!= col("expected"))
    assert(bad.count() === 0)
  }

  test("quantized_dot resolves from SQL once installed") {
    // extensions are consumed at session construction; on the shared
    // test session use the live-registry install path
    GraftExtensions.install(spark)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb")
    try {
      val r = spark.sql(
        "SELECT quantized_dot(embedding, embedding) AS n FROM emb LIMIT 1")
        .collect().head.getLong(0)
      assert(r > 0L)
      // quantized_l2: self-distance on the quantized lattice is 0
      val l2 = spark.sql(
        """SELECT quantized_l2(
             transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE)*1000) AS LONG)),
             transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE)*1000) AS LONG))) AS d
           FROM emb LIMIT 1""").collect().head.getLong(0)
      assert(l2 === 0L)
    } finally spark.catalog.dropTempView("emb")
  }

  test("text-hash functions resolve from SQL once installed") {
    GraftExtensions.install(spark)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("docs_ext")
    try {
      val row = spark.sql(
        """SELECT simhash64(split(trim(text), '\\s+')) AS sh,
                  size(shingle_hashes(split(trim(text), '\\s+'), 3)) AS nsh,
                  size(minhash_signature(split(trim(text), '\\s+'), 3)) AS nmh,
                  size(winnowed_fingerprints(text)) AS nfp,
                  top_ngram_count(split(trim(text), '\\s+'), 2) AS topc
           FROM docs_ext WHERE length(text) > 50 LIMIT 1""").collect().head
      assert(row.getInt(1) > 0, "shingle set empty")
      assert(row.getInt(2) === 8, "minhash signature should have k=8 values")
      assert(row.getInt(3) > 0, "no winnowed fingerprints")
      assert(row.getLong(4) > 0, "top n-gram count empty")
    } finally spark.catalog.dropTempView("docs_ext")
  }

  test("hyperplane_sketch resolves from SQL and matches the column API") {
    GraftExtensions.install(spark)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb_hs")
    try {
      val viaSql = spark.sql(
        "SELECT vec_id, hyperplane_sketch(embedding, 16, 64) AS s FROM emb_hs")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaApi = spark.table("emb_hs")
        .select(col("vec_id"), VectorFunctions.hyperplaneSketch(col("embedding"),
          graft.functions.HyperplaneSketch.md5Signs(16, 64)).as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaSql === viaApi)
      assert(viaSql.values.toSet.size > 1, "sketches degenerate")
    } finally spark.catalog.dropTempView("emb_hs")
  }
}
