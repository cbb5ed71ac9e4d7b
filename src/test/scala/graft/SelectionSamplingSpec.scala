package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the round-13 selection/sampling/sequence additions:
  *
  *  - q_agg_exact_median: the two-level histogram selection returns the
  *    SAME value as a plain sort-based rank-k pick (the thing it avoids
  *    computing distributively), per group, at two SFs — and its plan
  *    contains no corpus-wide sort.
  *  - q_sample_pps_systematic: exactly k total hits; every doc longer
  *    than the stride is necessarily hit; hit counts never exceed
  *    ceil(w/stride)+1 (a grid of spacing `stride` can cut an interval
  *    of length w at most that many times).
  *  - q_events_top_paths: paths are genuine (ts, event_id)-ordered
  *    prefixes — recomputing one user's path row-by-row matches — and
  *    the report is exactly the deterministic top-20.
  */
class SelectionSamplingSpec extends AnyFunSuite with SparkTestBase {

  test("exact median equals the sort-based rank-k value per group") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val got = SparkEntry.queries("q_agg_exact_median")(spark, dir)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val want = Tables.t(spark, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"))
        .collect()
        .groupBy(_.getString(0))
        .map { case (flag, rows) =>
          val vs = rows.map(_.getDouble(1)).sorted
          flag -> vs(((vs.length + 1) / 2) - 1)
        }
      assert(got === want, s"median mismatch at $dir")
    }
  }

  test("exact median fails loudly on a bucket that is not grid-bounded") {
    import spark.implicits._
    import graft.queries.AggQueries
    // every value inside ONE 1000-wide bucket, with more distinct values
    // than the cap: the promised bucket-local pass 2 would silently rank
    // the whole group — the in-plan guard must fail the query instead
    val df = (1 to 50).map(i => ("g", 500.0 + i * 0.001)).toDF("g", "x")
    val e = intercept[Exception] {
      AggQueries.exactGroupedMedian(df, "g", "x", "p50",
        maxBucketDistinct = 10L).collect()
    }
    assert(e.getMessage.contains("distinct-value bound") ||
      Option(e.getCause).exists(_.getMessage.contains("distinct-value bound")),
      s"wrong failure: $e")
    // under the real bound the same frame yields the true rank-k median
    val ok = AggQueries.exactGroupedMedian(df, "g", "x", "p50").collect()
    assert(ok.length === 1)
    assert(ok(0).getDouble(1) === 500.0 + 25 * 0.001)
  }

  test("exact median plan contains no global sort of the fact table") {
    val plan = SparkEntry.queries("q_agg_exact_median")(
      spark, "/root/testdata/sf0.01").queryExecution.executedPlan.toString
    // window sorts are bucket/histogram-local (partitioned by flag);
    // a corpus-wide selection sort would show a global Sort + single
    // partition exchange pair, which PlanLint already forbids — here we
    // additionally pin that no Sort node sorts on the raw value without
    // a partitioning key (the shape a naive median would produce)
    assert(!plan.contains("rangepartitioning"),
      "median plan range-partitions (global sort) the fact table:\n" + plan)
  }

  test("weighted median equals the sort-based cumulative-weight pick") {
    val dir = "/root/testdata/sf0.01"
    val got = SparkEntry.queries("q_agg_exact_weighted_median")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = Tables.t(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_quantity").cast("long"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (flag, rows) =>
        val vs = rows.map(r => (r.getDouble(1), r.getLong(2))).sortBy(_._1)
        val total = vs.map(_._2).sum
        val k = (total + 1) / 2
        var cum = 0L
        flag -> vs.find { case (_, w) => cum += w; cum >= k }.get._1
      }
    assert(got === want)
    // weighting matters: at least one group's weighted median must
    // differ from the unweighted one, or the test is vacuous
    val unweighted = SparkEntry.queries("q_agg_exact_median")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got != unweighted, "weighted == unweighted — vacuous fixture")
  }

  test("exact quartiles are ordered and match sort-based rank-k values") {
    val dir = "/root/testdata/sf0.01"
    val got = SparkEntry.queries("q_agg_exact_quartiles")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val byFlag = Tables.t(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"))
      .collect().groupBy(_.getString(0))
    byFlag.foreach { case (flag, rows) =>
      val vs = rows.map(_.getDouble(1)).sorted
      val n = vs.length
      for (m <- 1 to 3) {
        val k = math.max(1, (m * (n + 1)) / 4)
        assert(got((flag, m * 25L)) === vs(k - 1),
          s"quartile p${m * 25} mismatch for $flag")
      }
      assert(got((flag, 25L)) <= got((flag, 50L)) &&
        got((flag, 50L)) <= got((flag, 75L)))
    }
  }

  test("span stripping removes exactly the covered tokens") {
    val dir = "/root/testdata/sf0.01"
    val stripped = SparkEntry.queries("q_text_strip_dup_spans")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val spans = SparkEntry.queries("q_text_dup_spans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val docs = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(spans.nonEmpty, "fixture lost its planted duplicate spans")
    val spanned = spans.map(_._1).toSet
    docs.foreach { case (id, text) =>
      val words = text.trim.split("\\s+").toSeq
      val (clean, nKept) = stripped(id)
      if (!spanned(id)) {
        // no duplicated window -> text survives verbatim (token-joined)
        assert(clean === words.mkString(" "), s"doc $id altered")
        assert(nKept === words.length.toLong)
      } else {
        // covered tokens = union of the reported spans
        val covered = spans.filter(_._1 == id)
          .flatMap { case (_, start, len) => start until (start + len) }.toSet
        val want = words.zipWithIndex.collect {
          case (w, i) if !covered(i + 1L) => w
        }
        assert(clean === want.mkString(" "), s"doc $id wrong strip")
        assert(nKept === want.length.toLong)
      }
    }
  }

  test("systematic PPS draws exactly k hits with PPS multiplicity bounds") {
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q_sample_pps_systematic")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).sum === 10L, "total hits != k")
    val wtot = Tables.t(spark, dir, "documents")
      .agg(sum(coalesce(col("n_chars").cast("long"), lit(0L)))).head.getLong(0)
    val stride = wtot / 10
    // every selected doc respects the grid-multiplicity bound
    rows.foreach { case (id, w, h) =>
      assert(h <= w / stride + 1, s"doc $id: $h hits for weight $w")
    }
    // inclusion is monotone in weight at the extreme: any doc with
    // w >= stride MUST be hit (its interval spans a full grid gap)
    val big = Tables.t(spark, dir, "documents")
      .where(col("n_chars") >= stride).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val hit = rows.map(_._1).toSet
    assert(big.subsetOf(hit), s"docs >= stride missed: ${big -- hit}")
  }

  test("DSIR weights match a local bag-of-buckets recompute; selection " +
    "is the exact Gumbel top-k and enriches the target language") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val B = 1024L
    val got = SparkEntry.queries("q_sample_dsir")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.length === 100)
    // independent recompute of bucketing/counting/summation/top-k: local
    // bigram bag per doc, local bucket counts — only the llr quantization
    // reuses the engine's log2 (evaluated on a 1-row-per-bucket frame) so
    // the test pins the PLUMBING, not libm; the DuckDB oracle row is the
    // cross-engine float gate
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val docs = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val bags = docs.map { case (id, lang, text) =>
      val w = text.trim.split("\\s+")
      val bg = if (w.length >= 2)
        w.sliding(2).map(p => h60(p.mkString(" ")) % B).toSeq else Seq.empty
      (id, lang, bg)
    }
    val ct = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val cr = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    bags.foreach { case (_, lang, bg) =>
      bg.foreach { b => cr(b) += 1; if (lang == "en") ct(b) += 1 }
    }
    val (tt, tr) = (ct.values.sum, cr.values.sum)
    val llr = cr.keys.toSeq.map { b => (b, ct(b), cr(b)) }
      .toDF("bucket", "ct", "cr")
      .select(col("bucket"), floor(log2(
        ((col("ct").cast("double") + lit(1.0)) / lit(tt.toDouble + B)) /
          ((col("cr").cast("double") + lit(1.0)) / lit(tr.toDouble + B))) *
        lit(1000000.0)).cast("long").as("llr"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gumVals = docs.toSeq.map { case (id, _, _) =>
      (id, ((h60(s"dsir:$id") % 1000000L).toDouble + 0.5) / 1000000.0)
    }.toDF("id", "u")
      .select(col("id"), floor(-log2(-log2(col("u"))) * lit(1000000.0))
        .cast("long").as("g"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = bags.filter(_._3.nonEmpty).map { case (id, lang, bg) =>
      val w = bg.map(llr).sum
      (id, lang, bg.length.toLong, w, w + gumVals(id))
    }.sortBy { case (id, _, _, _, k) => (-k, id) }.take(100)
    assert(got.toSeq === want.toSeq)
    // the selected slice must be enriched in the target language vs the
    // corpus rate — the operator's entire point
    val corpusEn = docs.count(_._2 == "en").toDouble / docs.length
    val selEn = got.count(_._2 == "en").toDouble / got.length
    assert(selEn > corpusEn,
      s"DSIR did not enrich the target: selected en=$selEn corpus=$corpusEn")
  }

  test("calibrated quality rank is the within-source mid-rank ECDF and " +
    "the global cut keeps ~the same share of every source") {
    val dir = "/root/testdata/sf0.01"
    val got = SparkEntry.queries("q_text_quality_calibrated")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    // independent mid-rank ECDF recompute from the raw quality frame
    val raw = SparkEntry.queries("q_text_quality")(spark, dir)
      .select(col("doc_id"), col("source"),
        floor(col("quality_score") * lit(1000.0)).cast("long").as("m"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySrc = raw.groupBy(_._2)
    val want = raw.map { case (id, src, m) =>
      val ms = bySrc(src).map(_._3)
      val below = ms.count(_ < m).toLong
      val eq = ms.count(_ == m).toLong
      val pct = (1000000L * (2 * below + eq + 1)) / (2 * ms.length)
      (id, src, m, pct, pct >= 200000L)
    }
    assert(got.sortBy(_._1).toSeq === want.sortBy(_._1).toSeq)
    // the calibrated cut keeps close to 80% of EVERY source (slack for
    // bucket-boundary ties); a raw-score global cut has no such bound
    got.groupBy(_._2).foreach { case (src, rows) =>
      val kept = rows.count(_._5).toDouble / rows.length
      assert(kept >= 0.7 && kept <= 0.9,
        s"source $src kept $kept — calibration failed to equalize")
    }
  }

  test("DSIR eval KLs carry the finite-sample structure, not a pathology") {
    val dir = "/root/testdata/sf0.01"
    val r = SparkEntry.queries("q_sample_dsir_eval")(spark, dir).head
    val (raw, sel, rnd) = (r.getLong(0), r.getLong(1), r.getLong(2))
    // KL >= 0 up to floor-quantization (each of the 1024 terms loses
    // < 1 micro)
    Seq(raw, sel, rnd).foreach(v => assert(v >= -1024L, s"negative KL $v"))
    // both k-doc slices sit on the same finite-sample noise floor,
    // far above the full-corpus number (B/(2N ln2) scaling) — and the
    // selected slice must be WITHIN noise of the random one, not
    // pathologically concentrated (an all-one-language selection would
    // blow it past 3x random; the doc-level enrichment the operator
    // exists for is the separate DSIR spec above)
    assert(raw < sel && raw < rnd,
      s"slice KLs below corpus KL: raw=$raw sel=$sel rnd=$rnd")
    assert(sel < 3 * rnd && rnd < 3 * sel,
      s"slice KLs not within noise: sel=$sel rnd=$rnd")
  }

  test("CCNet buckets are perplexity-ordered terciles within each lang") {
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q_text_ccnet_buckets")(spark, dir)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getString(4)))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val byB = rs.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
      // ordering: every head doc's perplexity <= every middle's <= tail's
      for {
        h <- byB.get("head"); m <- byB.get("middle")
      } assert(h.max <= m.min, s"$lang: head above middle")
      for {
        m <- byB.get("middle"); t <- byB.get("tail")
      } assert(m.max <= t.min, s"$lang: middle above tail")
      // balance: mid-rank terciles put roughly a third in each bucket
      // (slack for bucket-level ties)
      val n = rs.length.toDouble
      byB.foreach { case (b, xs) =>
        assert(xs.length / n > 0.15 && xs.length / n < 0.55,
          s"$lang/$b grossly unbalanced: ${xs.length}/$n")
      }
      assert(byB.keySet === Set("head", "middle", "tail"),
        s"$lang missing a bucket: ${byB.keySet}")
    }
  }

  test("top paths are true ordered prefixes and the exact top-20") {
    val dir = "/root/testdata/sf0.01"
    val got = SparkEntry.queries("q_events_top_paths")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.length === 20)
    // independently recompute every user's first-5 path with a plain
    // local sort, then take the same deterministic top-20
    val want = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (_, evs) =>
        evs.map(r => (r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
          .sortBy(e => (e._1, e._2)).take(5).map(_._3).mkString(">")
      }
      .groupBy(identity).map { case (p, xs) => (p, xs.size.toLong) }
      .toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    assert(got.toSeq === want)
  }
}
