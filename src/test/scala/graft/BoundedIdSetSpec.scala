package graft

import graft.functions.BoundedIdSet.boundedIdSet
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Model-based properties of the native bounded_collect_ids aggregate
  * (functions/BoundedIdSet): for random multisets under random
  * partitionings (Spark picks the merge tree), the result must equal
  * the reference model — sorted distinct ids and exact min when the
  * distinct count fits the cap, (empty, exact min, saturated) past it —
  * regardless of duplicates, arrival order, or where saturation happens
  * (map side, merge, or never). This pins the manual serialize /
  * deserialize / merge path a plan actually exercises.
  */
class BoundedIdSetSpec extends AnyFunSuite with SparkTestBase {

  private val rnd = new Random(77)

  test("random multisets match the reference model under any partitioning") {
    import spark.implicits._
    for (trial <- 1 to 12) {
      val cap = 1 + rnd.nextInt(12)
      val nGroups = 1 + rnd.nextInt(5)
      val rows = (0 until 40 + rnd.nextInt(200)).map { _ =>
        (s"g${rnd.nextInt(nGroups)}",
          rnd.nextInt(cap * 3).toLong) // dup-heavy domain straddles cap
      }
      val model = rows.groupBy(_._1).map { case (g, rs) =>
        val distinct = rs.map(_._2).distinct.sorted
        g -> (if (distinct.size > cap) (Seq.empty[Long], distinct.min, true)
              else (distinct, distinct.min, false))
      }
      val got = rows.toDF("g", "id")
        .repartition(1 + rnd.nextInt(8)) // random merge tree
        .groupBy(col("g")).agg(boundedIdSet(cap)(col("id")).as("bs"))
        .collect().map { r =>
          val s = r.getStruct(1)
          r.getString(0) -> (s.getSeq[Long](0), s.getLong(1), s.getBoolean(2))
        }.toMap
      assert(got === model, s"trial $trial cap=$cap")
    }
  }

  test("nulls are ignored like collect_set; all-null group is empty") {
    import spark.implicits._
    val df = Seq(("a", Some(3L)), ("a", None), ("a", Some(1L)),
      ("b", None)).toDF("g", "id")
    val got = df.groupBy(col("g")).agg(boundedIdSet(5)(col("id")).as("bs"))
      .collect().map { r =>
        val s = r.getStruct(1)
        r.getString(0) -> (s.getSeq[Long](0), s.getBoolean(2))
      }.toMap
    assert(got("a") === (Seq(1L, 3L), false))
    assert(got("b") === (Seq.empty[Long], false))
  }
}
