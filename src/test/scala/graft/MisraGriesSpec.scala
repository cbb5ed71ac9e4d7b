package graft

import graft.functions.MisraGries
import org.scalatest.funsuite.AnyFunSuite

/** The Misra-Gries deterministic guarantee, exercised as a hard
  * property over seeded random streams and arbitrary merge trees:
  * every item above n/(k+1) survives, every counter undercounts by at
  * most n/(k+1). Plus the Spark end-to-end face via the Aggregator.
  */
class MisraGriesSpec extends AnyFunSuite with SparkTestBase {

  private def summarize(k: Int, xs: Seq[Long]): Map[Long, Long] =
    xs.foldLeft(Map.empty[Long, Long]) { (m, x) =>
      m.get(x) match {
        case Some(c) => m.updated(x, c + 1)
        case None if m.size < k => m.updated(x, 1L)
        case None => m.collect { case (i, c) if c > 1 => i -> (c - 1) }
      }
    }

  private def checkGuarantee(k: Int, xs: Seq[Long],
                             summary: Map[Long, Long]): Unit = {
    val n = xs.length
    val exact = xs.groupBy(identity).map { case (i, g) => i -> g.length.toLong }
    assert(summary.size <= k)
    exact.foreach { case (i, c) =>
      if (c * (k + 1) > n) assert(summary.contains(i),
        s"heavy item $i (freq $c of $n, k=$k) missing from $summary")
    }
    summary.foreach { case (i, est) =>
      val c = exact(i)
      assert(est <= c, s"overcount: item $i est $est > exact $c")
      assert((c - est) * (k + 1) <= n,
        s"undercount beyond bound: item $i est $est exact $c n $n k $k")
    }
  }

  test("guarantee holds on seeded skewed streams for several k") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 20; k <- Seq(1, 2, 4, 8)) {
      // zipf-ish: item j drawn with weight ~ 1/(j+1)
      val xs = Seq.fill(500 + trial * 37) {
        val u = rnd.nextDouble()
        (math.floor(math.pow(20.0, u)) - 1).toLong
      }
      checkGuarantee(k, xs, summarize(k, xs))
    }
  }

  test("merging arbitrary splits preserves the guarantee") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 20; k <- Seq(2, 4)) {
      val xs = Seq.fill(800) {
        (math.floor(math.pow(12.0, rnd.nextDouble())) - 1).toLong
      }
      // random partition into 2-6 chunks, summarize each, fold-merge
      val nChunks = 2 + rnd.nextInt(5)
      val chunks = xs.grouped(math.max(1, xs.length / nChunks)).toSeq
      val merged = chunks.map(summarize(k, _))
        .reduce(MisraGries.combine(k, _, _))
      checkGuarantee(k, xs, merged)
    }
  }

  test("Spark aggregator matches the guarantee end-to-end") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val k = 3
    val xs = Seq.fill(2000) {
      ("g" + rnd.nextInt(2),
        (math.floor(math.pow(15.0, rnd.nextDouble())) - 1).toLong)
    }
    val mapEnc = implicitly[org.apache.spark.sql.Encoder[Map[Long, Long]]]
    val mg = new MisraGries.HeavyHitters[(String, Long)](k, _._2, mapEnc)
    val got = xs.toDS().repartition(5).groupByKey(_._1)
      .agg(mg.toColumn.name("summary")).collect().toMap
    xs.groupBy(_._1).foreach { case (g, rows) =>
      checkGuarantee(k, rows.map(_._2), got(g))
    }
    // rollup face: merging the per-group summaries covers the full stream
    val mgAll = new MisraGries.MergeSummaries(k, mapEnc)
    val all = got.values.toSeq.toDS().groupByKey(_ => "ALL")
      .agg(mgAll.toColumn.name("s")).collect().head._2
    checkGuarantee(k, xs.map(_._2), all)
  }
}
