package graft

import graft.operators.LshBandJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed-group-by candidate enumeration must agree exactly with
  * the definitional band self-join (the r11 implementation), and the
  * hot-bucket cap must drop exactly the oversized buckets — loudly.
  */
class LshBandJoinSpec extends AnyFunSuite with SparkTestBase {

  /** The definitional form: self-join on band_key, ordered pairs. */
  private def selfJoinPairs(bands: DataFrame, idCol: String): DataFrame = {
    val (a, b) = (s"${idCol}_a", s"${idCol}_b")
    bands.select(col(idCol).as(a), col("band_key"))
      .join(bands.select(col(idCol).as(b), col("band_key").as("bk_r")),
        col("band_key") === col("bk_r") && col(a) < col(b))
      .select(col(a), col(b)).distinct()
  }

  private def bandsDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "band_key")
  }

  test("bucketed enumeration equals the definitional self-join") {
    // pseudo-random bands: 40 ids x 3 bands over a small key space, so
    // buckets of size 0..n and cross-band duplicate pairs all occur
    val rows = for {
      id <- 0L until 40L
      b <- 0 until 3
    } yield (id, s"${b}_${(id * (b + 3) * 2654435761L) % 7}")
    val bands = bandsDf(rows)
    val got = LshBandJoin.candidatePairs(bands, "id")
      .orderBy("id_a", "id_b").collect().toSeq
    val want = selfJoinPairs(bands, "id")
      .orderBy("id_a", "id_b").collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("duplicate (id, band_key) rows do not duplicate pairs") {
    val bands = bandsDf(Seq((1L, "x"), (1L, "x"), (2L, "x"), (3L, "y")))
    val got = LshBandJoin.candidatePairs(bands, "id").collect().toSeq
    assert(got.map(r => (r.getLong(0), r.getLong(1))) == Seq((1L, 2L)))
  }

  test("hot-bucket cap drops oversized buckets and reports them") {
    // bucket "hot" holds 6 ids, bucket "ok" holds 3; cap at 5
    val rows = (0L until 6L).map(i => (i, "hot")) ++
      Seq((10L, "ok"), (11L, "ok"), (12L, "ok"))
    val bands = bandsDf(rows)
    val capped = LshBandJoin.candidatePairs(bands, "id", maxBucket = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // only the ok-bucket pairs survive
    assert(capped == Set((10L, 11L), (10L, 12L), (11L, 12L)))
    // and the dropped bucket is loudly reported with its size
    val over = LshBandJoin.oversizedBuckets(bands, "id", maxBucket = 5)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(over == Seq(("hot", 6)))
    // with the default cap nothing is dropped and the pair set is full
    val full = LshBandJoin.candidatePairs(bands, "id")
      .count()
    assert(full == 15 + 3)
    assert(LshBandJoin.oversizedBuckets(bands, "id").isEmpty)
  }
}
