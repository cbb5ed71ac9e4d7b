package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The point of training the quantizers: Lloyd-trained IVF centroids
  * and PQ codebooks must retrieve at least as much of the exact top-10
  * as their untrained (modulo-sample / md5-grid) seeds at the driver's
  * verification scale. (At sf0.001 the 20-centroid IVF comparison is
  * one-found-hit noise either way; sf0.01 and sf0.1 both show clear
  * gains — IVF 40→46 and 61→86 found, PQ overlap 8→21 and 12→39.)
  */
class TrainedAnnSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.01"

  test("k-means-trained IVF recall >= untrained at the verification scale") {
    def totals(q: String) = SparkEntry.queries(q)(spark, dir)
      .agg(sum(col("n_found")).as("f"), sum(col("n_exact")).as("e")).head()
    val u = totals("q_sim_ann_ivf_recall")
    val t = totals("q_sim_ann_ivf_recall_trained")
    assert(t.getLong(1) === u.getLong(1), "same exact denominator")
    assert(t.getLong(0) >= u.getLong(0),
      s"trained IVF found ${t.getLong(0)} < untrained ${u.getLong(0)}")
  }

  test("trained PQ top-10 overlaps the exact top-10 more than the grid seed") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    val exact = SparkEntry.queries("q_sim_cosine_topk")(spark, dir)
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 10)
      .select(col("q_id"), col("vec_id"))
    def overlap(q: String): Long = SparkEntry.queries(q)(spark, dir)
      .select(col("q_id"), col("vec_id"))
      .join(exact, Seq("q_id", "vec_id"), "left_semi").count()
    val u = overlap("q_sim_ann_pq")
    val t = overlap("q_sim_ann_pq_trained")
    assert(t >= u, s"trained PQ overlap $t < untrained $u")
    assert(t > 0)
  }
}
