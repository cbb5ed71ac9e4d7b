package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQ8 scalar quantization: the per-dimension reconstruction bound
  * that makes a byte per dimension nearly lossless on this corpus, and
  * the recall the bound buys. The bound is the operator's whole
  * contract — code = trunc((q-lo)*255/(hi-lo)) dequantizes to
  * y = 255*lo + code*(hi-lo), so 0 <= 255*q - y < (hi-lo): every
  * coded coordinate sits within ONE range-step below its exact value,
  * never above it and never further.
  */
class SqQuantSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("every coded coordinate reconstructs within one range-step") {
    val coded = graft.queries.SimQueries.sq8Coded(spark, dir)
      .select(col("vec_id"), posexplode(col("yv")).as(Seq("d", "y")))
    val exact = graft.Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), posexplode(
        expr("transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE)*1000) AS BIGINT))"))
        .as(Seq("d", "qval")))
    val stats = exact.groupBy(col("d"))
      .agg(min(col("qval")).as("lo"), max(col("qval")).as("hi"))
    val bad = coded.join(exact, Seq("vec_id", "d"))
      .join(stats, "d")
      .where(!(lit(255L) * col("qval") - col("y") >= 0
        && (lit(255L) * col("qval") - col("y") < col("hi") - col("lo")
          || (col("hi") === col("lo")
            && lit(255L) * col("qval") === col("y")))))
    assert(bad.count() === 0L, bad.take(5).mkString("; "))
  }

  test("the byte per dimension keeps recall@10 near exact") {
    val recalls = graft.queries.SimQueries
      .queries("q_sim_ann_sq_recall")(spark, dir)
      .select(col("recall")).as[Double].collect()
    assert(recalls.nonEmpty)
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.9, s"SQ8 mean recall collapsed to $mean")
  }
}
