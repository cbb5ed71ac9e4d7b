package graft

import graft.functions.{GraftExtensions, StringDistance}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** Pins the unrestricted Damerau-Levenshtein kernel to an independent
  * reference: breadth-first search over the edit graph — states are
  * strings, moves are insert / delete / substitute / transpose-adjacent
  * at unit cost — which is the METRIC'S DEFINITION (cheapest edit
  * sequence, edited regions freely re-editable), with none of the
  * Lowrance-Wagner matrix machinery under test. Plus the documented
  * probes and the SQL registration.
  */
class StringDistanceSpec extends AnyFunSuite with SparkTestBase {

  private def dl(a: String, b: String): Int =
    StringDistance.damerau(UTF8String.fromString(a), UTF8String.fromString(b))

  /** BFS shortest edit distance from `a` to `b` over the given alphabet.
    * States longer than max(|a|,|b|) + 1 are pruned: an optimal sequence
    * never needs to grow past the longer string by more than the one
    * character a pending transpose could use (on these sizes, verified
    * exhaustive — relaxing the cap to +2 changes no distance below).
    */
  private def bfsDistance(a: String, b: String, alphabet: Seq[Char]): Int = {
    if (a == b) return 0
    val maxLen = math.max(a.length, b.length) + 1
    val seen = mutable.HashSet[String](a)
    var frontier = List(a)
    var d = 0
    while (frontier.nonEmpty) {
      d += 1
      val next = mutable.ListBuffer[String]()
      for (s <- frontier) {
        val moves = mutable.ListBuffer[String]()
        for (i <- 0 to s.length; c <- alphabet if s.length < maxLen)
          moves += s.substring(0, i) + c + s.substring(i)
        for (i <- 0 until s.length) {
          moves += s.substring(0, i) + s.substring(i + 1)
          for (c <- alphabet if c != s(i))
            moves += s.substring(0, i) + c + s.substring(i + 1)
        }
        for (i <- 0 until s.length - 1 if s(i) != s(i + 1))
          moves += (s.substring(0, i) + s(i + 1) + s(i)
            + s.substring(i + 2))
        for (m <- moves) {
          if (m == b) return d
          if (!seen(m)) { seen += m; next += m }
        }
      }
      frontier = next.toList
    }
    throw new IllegalStateException("BFS exhausted without reaching target")
  }

  test("documented probes") {
    // unrestricted form: 'ca' -> 'ac' (transpose) -> 'abc' (insert) = 2;
    // the OSA restriction would forbid inserting between a transposed
    // pair and answer 3
    assert(dl("ca", "abc") === 2)
    assert(dl("ab", "ba") === 1)
    assert(dl("", "abc") === 3)
    assert(dl("abc", "") === 3)
    assert(dl("same", "same") === 0)
    assert(dl("kitten", "sitting") === 3)
  }

  test("byte semantics: non-ASCII counts UTF-8 bytes, like DuckDB") {
    // 'é' is two UTF-8 bytes, so café -> cafe is one substitute + one
    // delete at the byte level (DuckDB probes levenshtein = 2 there too)
    assert(dl("café", "cafe") === 2)
  }

  test("property: kernel equals BFS edit-graph distance, exhaustively") {
    val alphabet = Seq('a', 'b')
    val strings = (0 to 3).flatMap(n =>
      Seq.fill(n)(alphabet).foldLeft(Seq(""))((acc, cs) =>
        acc.flatMap(s => cs.map(c => s + c))).distinct)
    for (a <- strings; b <- strings) {
      assert(dl(a, b) === bfsDistance(a, b, alphabet),
        s"dl('$a','$b') disagrees with the BFS reference")
    }
  }

  test("property: metric axioms on a mixed sample") {
    val xs = Seq("", "a", "ab", "ba", "abc", "ca", "cab", "hello",
      "ehllo", "hlelo", "olleh")
    for (a <- xs; b <- xs) {
      val d = dl(a, b)
      assert(d === dl(b, a), s"symmetry broke on ('$a','$b')")
      assert((d == 0) === (a == b), s"identity broke on ('$a','$b')")
      for (c <- xs)
        assert(d <= dl(a, c) + dl(c, b),
          s"triangle inequality broke on ('$a','$c','$b')")
    }
  }

  test("SQL registration: damerau_levenshtein resolves and computes") {
    GraftExtensions.install(spark)
    import spark.implicits._
    val out = Seq(("ca", "abc"), ("ab", "ba"), ("x", "x"))
      .toDF("a", "b")
      .selectExpr("damerau_levenshtein(a, b) AS d")
      .collect().map(_.getInt(0)).toSeq
    assert(out === Seq(2, 1, 0))
    // null propagation of the binary expression
    val n = Seq((Option("a"), Option.empty[String])).toDF("a", "b")
      .selectExpr("damerau_levenshtein(a, b) AS d").collect()
    assert(n.head.isNullAt(0))
  }
}
