package graft

import graft.operators.FuzzyJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SymSpell blocking must be LOSSLESS (candidates ⊇ true matches —
  * the deletion-neighborhood theorem), the hot-bucket guard must fail
  * loudly rather than thin matches, and reserved internal columns must
  * be rejected instead of clobbered.
  */
class FuzzyJoinSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  /** Every string over {a,b} up to the given length — small enough to
    * brute-force, adversarial for blocking (dense neighborhoods, the ""
    * meeting point, repeated characters).
    */
  private def universe(maxLen: Int): Seq[String] =
    (0 to maxLen).flatMap(n =>
      Seq.fill(n)(Seq('a', 'b')).foldLeft(Seq(""))((acc, cs) =>
        acc.flatMap(s => cs.map(c => s + c))).distinct)

  private def bruteMatches(xs: Seq[String], ys: Seq[String], d: Int) = {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    (for (x <- xs; y <- ys; dist = lev(x, y) if dist <= d)
      yield (x, y, dist.toLong)).toSet
  }

  test("join equals the brute-force edit-distance join (d=1 and d=2)") {
    val xs = universe(3)
    val ys = universe(2).map(s => s.replace('b', 'c')) // overlap + misses
    val l = xs.toDF("ka")
    val r = ys.toDF("kb")
    for (d <- Seq(1, 2)) {
      val got = FuzzyJoin.join(l, r, "ka", "kb", d)
        .select(col("ka"), col("kb"), col("dist").cast("long"))
        .as[(String, String, Long)].collect().toSet
      assert(got === bruteMatches(xs, ys, d), s"mismatch at d=$d")
    }
  }

  test("empty string participates (the '' meeting point under d=1)") {
    // 'a'~'b' (substitute, d=1) meet ONLY at the "" deletion variant,
    // so the length-1 strings must block into the "" bucket — a guard
    // that skipped short strings would lose the pair
    val got = FuzzyJoin.join(Seq("a", "").toDF("ka"),
        Seq("b", "").toDF("kb"), "ka", "kb", 1)
      .select(col("ka"), col("kb")).as[(String, String)].collect().toSet
    assert(got === Set(("a", ""), ("", "b"), ("", ""), ("a", "b")))
  }

  test("hot-bucket guard fails loudly, never thins matches") {
    // 40 strings all one insert away from the shared base "xy": every
    // one has "xy" in its deletion neighborhood, so the "xy" variant
    // bucket holds all 40 — over a cap of 10 the query must THROW with
    // the diagnostic, not drop candidates
    val hot = (0 until 40).map(i => s"x${('a' + i % 26).toChar}y${i / 26}")
      .distinct.toDF("ka")
    val probe = Seq("xy").toDF("kb")
    val e = intercept[Exception] {
      FuzzyJoin.join(hot, probe, "ka", "kb", 1, maxBucket = 10).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("FuzzyJoin")),
      s"guard error should carry the FuzzyJoin diagnostic, got: $e")
  }

  test("reserved internal columns are rejected") {
    val bad = Seq(("a", 1)).toDF("ka", "__vh")
    val ok = Seq("b").toDF("kb")
    val e = intercept[IllegalArgumentException] {
      FuzzyJoin.join(bad, ok, "ka", "kb", 1)
    }
    assert(e.getMessage.contains("__vh"))
    val bad2 = Seq(("a", 1)).toDF("kb", "dist")
    val e2 = intercept[IllegalArgumentException] {
      FuzzyJoin.join(ok.toDF("ka"), bad2, "ka", "kb", 1)
    }
    assert(e2.getMessage.contains("dist"))
  }

  test("join releases its internal variant persists before returning") {
    // r16 contract: the two per-side variant frames stayed persisted for
    // the session lifetime, accumulating cache entries per call unless
    // callers memoized. r17 closes it: the candidate frame is eagerly
    // checkpointed and both variant persists are released inside join(),
    // so the only block-manager entry a call may leave behind is the
    // checkpointed candidate RDD the RESULT depends on (ContextCleaner
    // frees it with the result). Net persisted-RDD growth per call must
    // therefore be <= 1 — under the old contract it was 2.
    val sc = spark.sparkContext
    val l = universe(2).toDF("ka")
    val r = universe(2).map(_.replace('b', 'c')).toDF("kb")
    val before = sc.getPersistentRDDs.keySet
    val out = FuzzyJoin.join(l, r, "ka", "kb", 1)
    val afterReturn = sc.getPersistentRDDs.keySet -- before
    assert(afterReturn.size <= 1,
      s"join() left ${afterReturn.size} persisted RDDs behind " +
        "(variant frames not released)")
    // ...and the released persists did not break the result (the
    // checkpoint pinned the candidates before the unpersist)
    assert(out.count() > 0)
  }

  test("bestMatch keeps exactly one deterministic row per left key") {
    val l = Seq("cat", "dog").toDF("ka")
    val r = Seq("cot", "cut", "dig", "dug", "cat").toDF("kb")
    val got = FuzzyJoin.bestMatch(l, r, "ka", "kb", 2)
      .select(col("ka"), col("kb"), col("dist").cast("long"))
      .as[(String, String, Long)].collect().toSet
    // cat -> itself at 0; dog -> dig (dist 1, ties broken on kb asc)
    assert(got === Set(("cat", "cat", 0L), ("dog", "dig", 1L)))
  }
}
