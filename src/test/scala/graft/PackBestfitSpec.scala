package graft

import org.scalatest.funsuite.AnyFunSuite

/** q_pack_bestfit invariants the oracle hash can't express directly:
  * no bin ever exceeds the token budget or its class capacity, offsets
  * are consistent prefix sums, the waste row's ordering holds (chunk ≤
  * packed ≪ one-doc-per-bin), and an oversize document fails loudly
  * with the chunk-first prescription instead of corrupting a bin.
  */
class PackBestfitSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val B = 2048L

  test("no bin overflows its budget, class capacity, or offset chain") {
    val packed = SparkEntry.queries("q_pack_bestfit")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(packed.length === 500, "every doc packs exactly once")
    assert(packed.map(_._1).distinct.length === packed.length)
    packed.groupBy(_._4).foreach { case (bin, docs) =>
      assert(docs.map(_._2).sum <= B, s"bin $bin overflows the budget")
      val ks = docs.map(_._3).distinct
      assert(ks.length === 1, s"bin $bin mixes length classes")
      assert(docs.length <= ks.head, s"bin $bin exceeds class capacity")
      // offsets are the prefix sums of earlier docs in pack order
      val sorted = docs.sortBy(_._5)
      assert(sorted.map(_._2).scanLeft(0L)(_ + _).init.toSeq
        === sorted.map(_._5).toSeq, s"bin $bin offset chain broken")
    }
  }

  test("waste row: packed beats the naive loader, chunk bounds the bins") {
    val w = SparkEntry.queries("q_pack_bestfit_waste")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    val (chunkBins, tot, _, chunkPreserves) = w("concat_chunk")
    val (_, _, onePad, _) = w("one_doc_per_bin")
    val (pkBins, pkTot, pkPad, pkPreserves) = w("length_class_packed")
    assert(tot === pkTot, "both sides must count the same tokens")
    assert(!chunkPreserves && pkPreserves)
    assert(pkPad === pkBins * B - tot, "padding identity")
    assert(pkBins >= chunkBins, "chunk is the bin-count lower bound")
    // the win is material on the fixture, not a rounding artifact
    assert(pkPad * 5 < onePad,
      s"expected >=5x padding reduction over one-doc-per-bin: $pkPad vs $onePad")
  }

  test("oversize document fails loudly with the chunk-first prescription") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_pack").toString
    Seq((1L, "s0", ("w " * 3000).trim), (2L, "s1", "a b c"))
      .toDF("doc_id", "source", "text")
      .write.parquet(s"$tmp/documents.parquet")
    val e = intercept[Exception] {
      SparkEntry.queries("q_pack_bestfit")(spark, tmp).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => String.valueOf(t.getMessage)).toSeq
    assert(msgs.exists(_.contains("chunk oversize docs")),
      s"expected the chunk-first prescription, got: ${msgs.mkString(" | ")}")
  }
}
