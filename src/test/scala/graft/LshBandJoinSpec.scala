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
    val got = LshBandJoin.candidatePairs(bands, "id", LshBandJoin.DefaultMaxBucket)
      .orderBy("id_a", "id_b").collect().toSeq
    val want = selfJoinPairs(bands, "id")
      .orderBy("id_a", "id_b").collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("duplicate (id, band_key) rows do not duplicate pairs") {
    val bands = bandsDf(Seq((1L, "x"), (1L, "x"), (2L, "x"), (3L, "y")))
    val got = LshBandJoin.candidatePairs(bands, "id",
      LshBandJoin.DefaultMaxBucket).collect().toSeq
    assert(got.map(r => (r.getLong(0), r.getLong(1))) == Seq((1L, 2L)))
  }

  test("hot-bucket cap degrades oversized buckets to the min-id star") {
    // bucket "hot" holds 6 ids, bucket "ok" holds 3; cap at 5
    val rows = (0L until 6L).map(i => (i, "hot")) ++
      Seq((10L, "ok"), (11L, "ok"), (12L, "ok"))
    val bands = bandsDf(rows)
    val capped = LshBandJoin.candidatePairs(bands, "id", maxBucket = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ok-bucket pairs in full; hot bucket degrades to the min-id star
    // (0 paired with each of 1..5 — connected, linear fan-out)
    assert(capped == Set((10L, 11L), (10L, 12L), (11L, 12L),
      (0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L)))
    // and the degraded bucket is loudly reported with its size
    val over = LshBandJoin.oversizedBuckets(bands, "id", maxBucket = 5)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(over == Seq(("hot", 6)))
    // with the default cap nothing degrades and the pair set is full
    val full = LshBandJoin.candidatePairs(bands, "id", LshBandJoin.DefaultMaxBucket)
      .count()
    assert(full == 15 + 3)
    assert(LshBandJoin.oversizedBuckets(bands, "id", LshBandJoin.DefaultMaxBucket).isEmpty)
  }

  /** The cap's recall cost, MEASURED (r12 argued it away, this commits
    * the numbers): on a near-dup-DENSE synthetic family (one 80-member
    * near-identical cluster — each member perturbs 2 of 60 tokens — in
    * a sea of small families and singletons, the real minhash/band
    * machinery). The r12 DROP semantics measured 10% pair recall here —
    * the "pairs re-meet in other, smaller bands" claim was false for a
    * dense family, which is why the cap now degrades to the min-id STAR
    * instead: pair-level recall improves and, the actual contract,
    * the candidate graph's connected components (what dedup keep-sets
    * derive from) are IDENTICAL to full enumeration — a star connects
    * exactly the vertex set its bucket's clique would.
    */
  test("recall A/B: capped vs uncapped pair recall on a dense family") {
    import graft.queries.TextQueries
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 1000).map(i => s"t$i")
    def baseDoc(): Array[String] =
      Array.fill(60)(vocab(rnd.nextInt(vocab.size)))
    var id = 0L
    val rows = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    def family(n: Int): Unit = {
      val base = baseDoc()
      (0 until n).foreach { m =>
        val doc = base.clone()
        // each member perturbs 2 token positions with member-unique tokens
        (0 until 2).foreach { k =>
          doc(rnd.nextInt(doc.length)) = s"u${id}_$k"
        }
        rows += ((id, doc.mkString(" "))); id += 1
      }
    }
    family(80)                       // the dense near-dup cluster
    (0 until 10).foreach(_ => family(8)) // ordinary small families
    (0 until 100).foreach { _ =>     // unrelated singletons
      rows += ((id, baseDoc().mkString(" "))); id += 1
    }
    import spark.implicits._
    val docs = rows.toSeq.toDF("doc_id", "text")
    val bands = docs
      .select(col("doc_id"), TextQueries.minhashCol.as("mh"))
      .where(col("mh").isNotNull)
      .select(col("doc_id"),
        explode(TextQueries.bandKeysCol(col("mh"))).as("band_key"))
      .persist()
    try {
      val cap = 32
      // non-vacuous: the dense family's hot buckets really exceed the cap
      val degraded = LshBandJoin.oversizedBuckets(bands, "doc_id", cap)
        .collect().map(_.getInt(1))
      assert(degraded.nonEmpty, "no oversized bucket — fixture too sparse")
      assert(degraded.max > cap * 3 / 2, "hot bucket barely over the cap")
      def pairSet(maxBucket: Int) =
        LshBandJoin.candidatePairs(bands, "doc_id", maxBucket)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val uncapped = pairSet(Int.MaxValue)
      val capped = pairSet(cap)
      assert(capped.subsetOf(uncapped))
      assert(capped.size < uncapped.size,
        "cap degraded buckets but thinned no pairs — fixture not " +
          "actually exercising the trade-off")
      val recall = capped.size.toDouble / uncapped.size
      info(f"star-vs-uncapped pair recall at cap=$cap: $recall%.3f " +
        s"(${capped.size}/${uncapped.size}, degraded buckets: ${degraded.toSeq.sorted.mkString(",")})")

      // THE contract: connected components of the candidate graph are
      // identical — dedup keep-sets cannot differ under the cap.
      def components(pairs: Set[(Long, Long)]): Map[Long, Long] = {
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        pairs.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        parent.keys.map(k => k -> find(k)).toMap
      }
      assert(components(capped) === components(uncapped),
        "star degradation changed the candidate graph's components")
    } finally bands.unpersist()
  }
}
