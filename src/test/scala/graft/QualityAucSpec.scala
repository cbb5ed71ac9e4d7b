package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent verification of the bucketed Mann-Whitney AUC: at
  * fixture scale the O(n_pos x n_neg) pairwise definition is cheap, so
  * recompute U2 directly from score pairs and require exact equality
  * with the bucket-cumulative form the registered query uses.
  */
class QualityAucSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.01"

  test("bucketed U2 equals the pairwise definition exactly") {
    val row = SparkEntry.queries("q_text_quality_auc")(spark, dir)
      .collect().head
    val (nPos, nNeg, u2, auc) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3))

    // brute-force: every (pos, neg) score pair; win = 2, tie = 1
    val scored = SparkEntry.queries("q_text_quality")(spark, dir)
      .join(graft.Tables.t(spark, dir, "documents")
        .select(col("doc_id"), col("lang")), "doc_id")
      .select(floor(col("quality_score") * 1000000L).cast("long").as("qs"),
        (col("lang") === "en").as("pos"))
      .where(col("qs").isNotNull)
    val p = scored.where(col("pos")).select(col("qs").as("ps"))
    val n = scored.where(!col("pos")).select(col("qs").as("ns"))
    val pairwise = p.crossJoin(n)
      .select(when(col("ps") > col("ns"), 2L)
        .when(col("ps") === col("ns"), 1L).otherwise(0L).as("w"))
      .agg(sum(col("w"))).collect().head.getLong(0)

    assert(nPos > 0L && nNeg > 0L, "degenerate label split")
    assert(u2 === pairwise, s"bucketed U2 $u2 != pairwise $pairwise")
    assert(auc === (1000000L * u2) / (2L * nPos * nNeg))
    assert(auc >= 0L && auc <= 1000000L)
  }
}
