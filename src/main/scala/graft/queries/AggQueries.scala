package graft.queries

import graft.Tables.t
import graft.Exact._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregations — SURVEY.md §2.4 (A1-A10). All monetary sums go through
  * Exact.dsum (decimal-cast) so partial/final hash-agg order can't change
  * the result vs the DuckDB oracle. Map-side partial aggregation is
  * automatic for all of these.
  */
object AggQueries extends QueryPack {

  /** Distinct-value cap on the exact-median pass-2 bucket. The 1000-wide
    * buckets over a 2-decimal value grid hold at most 100,001 distinct
    * values, so the in-plan guard (1.5x slack for a coarser grid) can
    * only fire when the domain is NOT on the expected grid — the case
    * where "bucket-local rank" silently degrades toward a corpus-wide
    * rank. Package-visible so SelectionSamplingSpec can drive the
    * degenerate case with a tiny cap.
    */
  private[graft] val MedianMaxBucketDistinct = 150000L

  /** EXACT grouped median by two-level histogram selection — see the
    * q_agg_exact_median registration for the algorithm and scale notes.
    * Factored so the spec can run it on a degenerate (single-bucket,
    * off-grid) distribution; `maxBucketDistinct` is the loud-failure
    * bound on pass 2's frame ([[MedianMaxBucketDistinct]]).
    */
  private[graft] def exactGroupedMedian(
      vals0: org.apache.spark.sql.DataFrame, groupCol: String,
      valCol: String, out: String,
      maxBucketDistinct: Long = MedianMaxBucketDistinct,
      weightCol: Option[String] = None)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // With a weight column the selection runs over cumulative WEIGHT
    // (median = the value at half the total mass — e.g. token-weighted
    // document statistics); the algebra below is unchanged because
    // weights are positive integers, so the cumulative is still
    // strictly increasing and rank k falls in exactly one bucket/value.
    val wt = weightCol.map(col(_).cast(LongType)).getOrElse(lit(1L))
    val vals = vals0
      .select(col(groupCol).as("flag"), col(valCol).as("v"), wt.as("__wt"))
      .withColumn("__bucket", expr("CAST(v AS BIGINT) div 1000"))
    // Pass 1: bounded histogram — |groups| x ~|value range / 1000| rows
    val hist = vals.groupBy(col("flag"), col("__bucket"))
      .agg(sum(col("__wt")).as("c"))
    val wCum = Window.partitionBy(col("flag")).orderBy(col("__bucket"))
    // target bucket per group: first bucket whose cumulative count
    // reaches k; local_k = k's rank within it
    val tgt = hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("k",
        expr("(SUM(c) OVER (PARTITION BY flag) + 1) div 2"))
      .where(col("cum") >= col("k") && col("cum") - col("c") < col("k"))
      .select(col("flag"), col("__bucket"),
        (col("k") - (col("cum") - col("c"))).as("local_k"))
    // Pass 2: bucket-filtered re-scan + rank within the target bucket.
    // The guard window shares wFlag's partitioning (one exchange): if
    // the selected bucket holds more distinct values than the grid
    // argument bounds, pass 2 is no longer bucket-local — fail loudly
    // (the IntervalOverlapJoin discipline) instead of silently ranking
    // the whole group.
    val wFlag = Window.partitionBy(col("flag")).orderBy(col("v"))
    val wAll = Window.partitionBy(col("flag"))
    vals.join(broadcast(tgt), Seq("flag", "__bucket"))
      .groupBy(col("flag"), col("local_k"), col("v"))
      .agg(sum(col("__wt")).as("c"))
      .withColumn("__nd", count(lit(1)).over(wAll))
      .where(coalesce(assert_true(col("__nd") <= lit(maxBucketDistinct),
        lit("exact-median pass-2 bucket exceeds the distinct-value bound " +
          s"($maxBucketDistinct): the value domain is not on the expected " +
          "grid — narrow the bucket width (or add a selection level) " +
          "before trusting bucket-local ranking")), lit(true)))
      .withColumn("cum", sum(col("c")).over(wFlag))
      .where(col("cum") >= col("local_k") &&
        col("cum") - col("c") < col("local_k"))
      .select(col("flag").as(groupCol),
        col("v").cast(DoubleType).as(out))
  }

  val queries: Map[String, Q] = Map(
    // A1: TPC-H Q1-style pricing summary (hash group-by + multiple SUMs,
    // derived-expression sums, COUNT).
    // Ref: sql/gold/materialized_view.sql:2-12
    // Pearson correlation matrix over the pricing columns — the
    // feature-analysis pass a training pipeline runs before feeding a
    // model (collinear features, leakage checks). Cross-engine float
    // discipline: the textbook corr of doubles is summation-order-
    // dependent, so every sufficient statistic is an EXACT Decimal(38)
    // sum of per-row integer products (quantity is integral, price in
    // cents, discount in basis points — the FLOOR(x*100) quantization);
    // corr then needs exactly three IEEE ops per pair (two sqrt, one
    // divide) after the correctly-rounded decimal→double conversions —
    // the dsum discipline extended from sums to second moments. ONE
    // map-side-combinable aggregate over the table; the matrix math
    // happens on the single stats row.
    "q_agg_correlations" -> ((s, dir) => {
      val D = DecimalType(38, 0)
      def d(c: String) = col(c).cast(D)
      val q = t(s, dir, "lineitem").select(
        expr("CAST(FLOOR(l_quantity) AS BIGINT)").as("x"),
        expr("CAST(FLOOR(l_extendedprice * 100) AS BIGINT)").as("y"),
        expr("CAST(FLOOR(l_discount * 100) AS BIGINT)").as("z"))
      val a = q.agg(
        cnt.cast(D).as("n"),
        sum(d("x")).as("sx"), sum(d("y")).as("sy"), sum(d("z")).as("sz"),
        sum(d("x") * d("x")).as("sxx"), sum(d("y") * d("y")).as("syy"),
        sum(d("z") * d("z")).as("szz"),
        sum(d("x") * d("y")).as("sxy"), sum(d("x") * d("z")).as("sxz"),
        sum(d("y") * d("z")).as("syz"))
      def corr(sab: String, a1: String, b1: String,
               saa: String, sbb: String) =
        (col(sab).cast(D) * col("n") - col(a1) * col(b1))
          .cast(DoubleType) /
          (sqrt((col(saa) * col("n") - col(a1) * col(a1))
            .cast(DoubleType))
            * sqrt((col(sbb) * col("n") - col(b1) * col(b1))
              .cast(DoubleType)))
      a.select(col("n").cast(LongType).as("n_rows"),
        corr("sxy", "sx", "sy", "sxx", "syy").as("corr_qty_price"),
        corr("sxz", "sx", "sz", "sxx", "szz").as("corr_qty_disc"),
        corr("syz", "sy", "sz", "syy", "szz").as("corr_price_disc"))
    }),

    "q_agg_pricing_summary" -> ((s, dir) => {
      // NO scan spread here (r21 resume: tried per the range_binned
      // precedent, MEASURED flat-to-worse, reverted): the decimal map
      // feeds a map-side-combinable aggregate, so the original plan
      // shuffles ~1 KB of partials — the spread traded that for a
      // 9 MB row exchange whose write side still ran in the same 3
      // scan tasks (guide §2.3 "aggregate before you shuffle" beats
      // §2.5 spreading when the per-row work is one multiply)
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          // exact decimal products: the inputs sit on a 2-decimal grid, so
          // money2/rate2 casts are unambiguous and the multiply is exact
          sum(money2(col("l_extendedprice")) * rate2(lit(1.0) - col("l_discount")))
            .cast(DoubleType).as("sum_disc_price"),
          sum(money2(col("l_extendedprice")) * rate2(lit(1.0) - col("l_discount"))
            * rate2(lit(1.0) + col("l_tax"))).cast(DoubleType).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          cnt.as("count_order"))
    }),

    // A2: group-by-sum at customer grain (monthly sales per customer analog).
    // Ref: materialized_view.sql:16-25
    "q_agg_customer_sales" -> ((s, dir) => {
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("c_custkey"))
        .agg(dsum(col("o_totalprice")).as("total_sales"),
          cnt.as("n_orders"))
    }),

    // A3: SUM + COUNT(DISTINCT) (customer-lifetime-value shape).
    // Ref: materialized_view.sql:29-38
    "q_agg_count_distinct" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          dsum(col("o_totalprice")).as("total_sales"),
          countDistinct(col("o_custkey")).cast(LongType).as("n_customers"),
          cnt.as("n_orders"))
    }),

    // Sketch variant of A3 for the 100 TB regime: HLL++ approximate
    // distinct (fixed-size sketch, no per-key state explosion). HLL
    // estimates are engine-specific, so instead of comparing the raw
    // estimate the query emits the exact count plus a deterministic
    // bounded-error boolean (|approx-exact|/exact <= 5%, well above the
    // configured 2% rsd); the oracle emits the same exact count and a
    // literal TRUE — hash-comparable while still exercising the sketch.
    "q_agg_approx_distinct" -> ((s, dir) => {
      // Two clean aggregates joined on the 5-row group key rather than
      // one mixed distinct+HLL aggregate: the mixed form plans an
      // Expand that duplicates every input row through the (imperative,
      // non-codegen) HLL update — measured ~2x slower at sf0.1.
      val orders = t(s, dir, "orders")
      val exact = orders.groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).cast(LongType).as("n_exact"))
      val approx = orders.groupBy(col("o_orderpriority"))
        .agg(approx_count_distinct(col("o_custkey"), 0.02).cast(LongType)
          .as("n_approx"))
      exact.join(approx, "o_orderpriority")
        .select(col("o_orderpriority"), col("n_exact"),
          (abs(col("n_approx") - col("n_exact")).cast(DoubleType)
            / col("n_exact") <= 0.05).as("approx_ok"))
    }),

    // Quantile sketch beside HLL: approx_percentile (GK sketch — fixed
    // memory per group, mergeable partials, the 100 TB-safe percentile)
    // checked the same bounded-error way. The exact p50 is defined as
    // the discrete percentile (value at rank ceil(n/2) in value order) —
    // computed with an identical window formula on both engines so the
    // exact column hash-matches bit-for-bit; the sketch must land within
    // 5% of it. Caveat: GK guarantees RANK error (n/accuracy rows), not
    // value error — the 5% value bound holds because accuracy=10000
    // keeps the rank slack within a few rows of the median on these
    // smooth distributions (verified green at sf0.001/0.01/0.1); a
    // pathologically sparse distribution around p50 could violate it.
    "q_agg_approx_percentile" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val byPrio = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderpriority"))
      val exact = orders
        .withColumn("rn", row_number().over(
          byPrio.orderBy(col("o_totalprice"), col("o_orderkey"))))
        .withColumn("n", count(lit(1)).over(byPrio))
        .where(col("rn") === floor((col("n") + 1) / lit(2.0)).cast(LongType))
        .select(col("o_orderpriority"),
          col("o_totalprice").cast(DoubleType).as("exact_p50"))
      val approx = orders
        .groupBy(col("o_orderpriority"))
        .agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(10000))
          .cast(DoubleType).as("approx_p50"))
      exact.join(approx, "o_orderpriority")
        .select(col("o_orderpriority"), col("exact_p50"),
          (abs(col("approx_p50") - col("exact_p50")) / col("exact_p50") <= 0.05)
            .as("approx_ok"))
    }),

    // Mergeable sketch rollup (DataSketches HLL): the 100 TB pattern
    // where per-partition sketch tables are PERSISTED and any rollup —
    // here per-event_type distinct users unioned to the global count —
    // is a cheap sketch merge instead of a re-scan of raw data (plain
    // approx_count_distinct results can't be merged after the fact).
    // Bounded-error contract vs the exact distinct, same as
    // q_agg_approx_distinct; the sketch and exact aggregates stay
    // separate to avoid the Expand-through-imperative-agg plan.
    "q_agg_hll_merge" -> ((s, dir) => {
      val ev = graft.Tables.events(s, dir)
      val exact = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).cast(LongType).as("n_exact"))
      val sketches = ev.groupBy(col("event_type"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val per = exact.join(sketches, "event_type")
        .select(col("event_type"), col("n_exact"),
          (abs(hll_sketch_estimate(col("sk")) - col("n_exact"))
            .cast(DoubleType) / col("n_exact") <= 0.05).as("approx_ok"))
      // the rollup: union the 5 per-type sketches — never re-reads events
      val merged = sketches.agg(hll_union_agg(col("sk")).as("sku"))
        .select(hll_sketch_estimate(col("sku")).as("est"))
      val global = ev.agg(countDistinct(col("user_id")).cast(LongType)
          .as("n_exact"))
        .crossJoin(merged) // 1x1: both sides aggregate-reduced
        .select(lit("ALL").as("event_type"), col("n_exact"),
          (abs(col("est") - col("n_exact")).cast(DoubleType)
            / col("n_exact") <= 0.05).as("approx_ok"))
      per.unionByName(global)
    }),

    // Mergeable QUANTILE sketch rollup (DataSketches KLL) — the
    // quantile sibling of q_agg_hll_merge: per-event_type sketches over
    // `value` merge to the global median without re-scanning raw data.
    // Verified by the bound KLL actually guarantees — RANK error: the
    // exact rank of the estimated p50 must sit within 5% of 0.5
    // (default k=200 gives ~1.65%). Per-type rows also carry the exact
    // discrete p50 (window partitioned by type — lint-safe); the ALL
    // row's exact value is deliberately NULL: a global exact order
    // statistic needs the very global sort the sketch exists to avoid,
    // so the honest scalable check is the rank bound alone.
    "q_agg_kll_merge" -> ((s, dir) => {
      val ev = graft.Tables.events(s, dir)
        .select(col("event_type"), col("event_id"), col("value"))
      val byType = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
      val exactPer = ev
        .withColumn("rn", row_number().over(
          byType.orderBy(col("value").asc_nulls_last, col("event_id"))))
        .withColumn("n", count(lit(1)).over(byType))
        .where(col("rn") === floor((col("n") + 1) / lit(2.0)).cast(LongType))
        .select(col("event_type"), col("value").cast(DoubleType).as("exact_p50"))
      val sk = ev.groupBy(col("event_type"))
        .agg(kll_sketch_agg_double(col("value")).as("sk"))
      val estPer = sk.select(col("event_type"),
        kll_sketch_get_quantile_double(col("sk"), lit(0.5)).as("est"))
      // denominator = non-null values only: NULL value rows can never
      // satisfy value <= est, so counting them would bias the measured
      // rank low and fail the bound spuriously on null-bearing data
      def rankOk = (abs(count(when(col("value") <= col("est"), 1))
        .cast(DoubleType) / count(col("value")) - 0.5) <= 0.05).as("approx_ok")
      val per = ev.join(broadcast(estPer), "event_type")
        .groupBy(col("event_type")).agg(rankOk)
        .join(exactPer, "event_type")
        .select(col("event_type").as("scope"), col("exact_p50"),
          col("approx_ok"))
      // the rollup: merge the 5 sketches, never re-reading events
      val estAll = sk.agg(kll_merge_agg_double(col("sk")).as("sku"))
        .select(kll_sketch_get_quantile_double(col("sku"), lit(0.5)).as("est"))
      val allRow = ev.crossJoin(estAll) // 1-row est, aggregate-reduced
        .agg(rankOk)
        .select(lit("ALL").as("scope"),
          lit(null).cast(DoubleType).as("exact_p50"), col("approx_ok"))
      per.unionByName(allRow)
    }),

    // Mergeable FREQUENT-ITEMS rollup (Misra-Gries) — the heavy-hitters
    // sibling of q_agg_hll_merge / q_agg_kll_merge: per-event_type
    // k-counter summaries over the metric's magnitude class (digit
    // count — integer-exact in both engines, no libm), merged to the
    // ALL scope WITHOUT re-reading events. k=2 against a 3-value
    // domain, so the summary genuinely overflows (decrements happen)
    // and the ~70%-mass bucket is a true heavy hitter at every sf.
    // mg_ok asserts the DETERMINISTIC MG guarantee per scope: every
    // item above n/(k+1) is present, and every stored counter
    // undercounts by at most n/(k+1) — a hard invariant, not a
    // probabilistic bound. Exact top columns come from a scope-
    // partitioned window (lint-safe).
    "q_agg_heavy_hitters" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.MisraGries
      import org.apache.spark.sql.expressions.Window
      val k = 2
      val mapEnc = implicitly[org.apache.spark.sql.Encoder[Map[Long, Long]]]
      // NO scan spread here (r20 regression, reverted r21): ev feeds
      // FOUR consumers (typed MG agg, two exact groupBys, n) — a
      // repartition-after-read exchange re-executes per consumer, and
      // the four 32-partition shuffles measured 1.6-3.6x SLOWER than
      // the single-task scans on both the builder box and the driver
      // (scaling ratio 0.46: slower at 32 cores than 8). The map passes
      // are map-side-combinable aggregates, so at scale the plain
      // multi-split scan parallelizes on its own.
      val ev = graft.Tables.events(s, dir)
        .where(col("value").isNotNull)
        .select(col("event_type"),
          length(floor(col("value")).cast(LongType).cast(StringType))
            .cast(LongType).as("bkt"))
      val mg = new MisraGries.HeavyHitters[(String, Long)](k, _._2, mapEnc)
      val sk = ev.as[(String, Long)].groupByKey(_._1)
        .agg(mg.toColumn.name("summary")).toDF("scope", "summary")
      val mgAll = new MisraGries.MergeSummaries(k, mapEnc)
      val skAll = sk.select(col("summary")).as[Map[Long, Long]]
        .groupByKey(_ => "ALL")
        .agg(mgAll.toColumn.name("summary")).toDF("scope", "summary")
      val summaries = sk.unionByName(skAll)
      val exact = ev.groupBy(col("event_type").as("scope"), col("bkt"))
        .agg(cnt.as("c"))
        .unionByName(ev.groupBy(col("bkt")).agg(cnt.as("c"))
          .select(lit("ALL").as("scope"), col("bkt"), col("c")))
      val n = exact.groupBy("scope").agg(sum(col("c")).cast(LongType).as("n"))
      val cand = summaries.select(col("scope"),
        explode(col("summary")).as(Seq("bkt", "est")))
      // every stored counter est <= exact <= est + n/(k+1)
      val errOk = cand.join(exact, Seq("scope", "bkt")).join(n, "scope")
        .groupBy("scope")
        .agg(min(col("est") <= col("c")
          && (col("c") - col("est")) * (k + 1) <= col("n")).as("err_ok"))
      // every exact-heavy item (freq > n/(k+1)) must be in the summary
      val missing = exact.join(n, "scope")
        .where(col("c") * (k + 1) > col("n"))
        .join(cand.select("scope", "bkt"), Seq("scope", "bkt"), "left_anti")
        .groupBy("scope").agg(cnt.as("n_missing"))
      val top = exact
        .withColumn("rk", row_number().over(Window.partitionBy(col("scope"))
          .orderBy(col("c").desc, col("bkt"))))
        .where(col("rk") === 1)
        .select(col("scope"), col("bkt").as("top_bucket"), col("c").as("n_top"))
      top.join(errOk, "scope").join(missing, Seq("scope"), "left")
        .select(col("scope"), col("top_bucket"), col("n_top"),
          (col("err_ok") && col("n_missing").isNull).as("mg_ok"))
    }),

    // A4: MIN/MAX + churn flag against a pinned reference date
    // (current_date made deterministic — SURVEY §7.4.3).
    // Ref: materialized_view.sql:80-91
    "q_agg_churn" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(
          min(col("o_orderdate")).cast(DateType).as("first_order"),
          max(col("o_orderdate")).cast(DateType).as("last_order"))
        .withColumn("is_churned",
          col("last_order") < add_months(lit("1998-12-01").cast(DateType), -6))
    }),

    // A6: ROLLUP grouping sets over region/nation.
    // Ref: materialized_view.sql:113-122
    "q_agg_rollup" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(dsum(col("c_acctbal")).as("total_acctbal"), cnt.as("n_cust"))
    }),

    // A6-ext: CUBE — all four grouping-set combinations in one pass
    // (Spark expands to a single Expand + hash-agg; no re-scan per set).
    "q_agg_cube" -> ((s, dir) => {
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(dsum(col("o_totalprice")).as("total_price"), cnt.as("n_orders"))
    }),

    // A6-ext: explicit GROUPING SETS (status-only, priority-only, grand
    // total) — the general form ROLLUP/CUBE specialize.
    "q_agg_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(dsum(col("o_totalprice")).as("total_price"), cnt.as("n_orders"))
    }),

    // A-ext: PIVOT with an explicit value list — listing the pivot values
    // avoids the extra distinct-collect job Spark otherwise runs, which
    // also makes the plan static (essential when the pivot feeds a view).
    // An explicit list silently drops any value outside it (NULL
    // included) from every total, so the domain is guarded INSIDE the
    // plan: a 1-row broadcast aggregate counts out-of-domain/NULL rows
    // and assert_true fails the query at execution if any exist. In-plan
    // (not a construction-time collect) so the builder registry stays
    // lazy for plan-only consumers, and NULL-safe via the coalesce —
    // `!isin` alone evaluates to NULL for a NULL status and would slip
    // the guard.
    "q_pivot_status" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val domain = Seq("O", "F", "P")
      val bad = orders.agg(count(when(
        !coalesce(col("o_orderstatus").isin(domain: _*), lit(false)), 1))
        .as("n_bad"))
      orders.crossJoin(broadcast(bad))
        .where(coalesce(assert_true(col("n_bad") === 0,
          lit(s"q_pivot_status: o_orderstatus outside pivot domain " +
            s"${domain.mkString("{", ",", "}")} would be silently dropped")),
          lit(true)))
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", domain)
        .agg(dsum(col("o_totalprice")))
        .select(col("o_orderpriority"),
          col("O").as("total_open"), col("F").as("total_fulfilled"),
          col("P").as("total_pending"))
    }),

    // A-ext: UNPIVOT (melt) wide metric columns into (metric, value) rows —
    // map-only Expand, no shuffle; values pass through bit-exact.
    // Contract: Spark's UNPIVOT excludes rows whose melted value is NULL,
    // while the plain UNION ALL form keeps them — so the melted metrics
    // are COALESCEd to 0.0 on BOTH engines. lineitem's metrics are
    // non-null (output unchanged here), but reuse on a nullable column
    // now yields identical results instead of silently diverging.
    "q_unpivot_metrics" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_orderkey") % 100 === 0)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(coalesce(col("l_quantity"), lit(0.0)).as("l_quantity"),
            coalesce(col("l_extendedprice"), lit(0.0)).as("l_extendedprice"),
            coalesce(col("l_discount"), lit(0.0)).as("l_discount")),
          "metric", "value")
    }),

    // A7: HAVING-style duplicate detector (multi-order days per customer).
    // Ref: Methods_crm_cust_info.sql:4-9
    "q_agg_having_dups" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate").cast(DateType).as("order_day"))
        .agg(cnt.as("n_orders"))
        .where(col("n_orders") > 1)
    }),

    // Exact grouped MODE with a deterministic tiebreak: the most
    // frequent market segment per nation — the imputation/profiling
    // aggregate (fill missing categoricals with the group's mode).
    // Two map-side-combined aggregates, no window: count per (group,
    // value), then max(struct(count, value)) — ties break on the
    // LARGER value string, mirrored by the oracle's ROW_NUMBER pick
    // over (count DESC, value DESC).
    "q_agg_grouped_mode" -> ((s, dir) => {
      t(s, dir, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(cnt.as("c"))
        .groupBy(col("c_nationkey"))
        .agg(max(struct(col("c"), col("c_mktsegment"))).as("best"),
          sum(col("c")).as("n_rows"))
        .select(col("c_nationkey"),
          col("best.c_mktsegment").as("mode_segment"),
          col("best.c").as("mode_count"), col("n_rows"))
    }),

    // A8: count-minus-distinct duplicate stats over normalized keys.
    // Ref: scripts/validate_row.py:172-173,413-419
    "q_agg_dup_stats" -> ((s, dir) => {
      val norm = coalesce(nullif(lower(trim(col("text"))), lit("")), lit("<NULL>"))
      t(s, dir, "documents").agg(
        cnt.as("n_rows"),
        countDistinct(norm).cast(LongType).as("n_distinct"),
        (cnt - countDistinct(norm).cast(LongType)).as("n_dups"))
    }),

    // A9: single-pass per-column null/blank profile (replaces the
    // reference's N+1 separate scans with one aggregate — SURVEY §4).
    // Ref: scripts/validate_row.py:404-411
    "q_agg_null_profile" -> ((s, dir) => {
      def nulls(c: String) =
        sum(when(col(c).isNull || trim(col(c).cast(StringType)) === "", 1)
          .otherwise(0)).cast(LongType)
      t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(
          nulls("text").as("text_blank"),
          nulls("lang").as("lang_blank"),
          cnt.as("n_rows"))
    }),

    // A-ext: EXACT grouped median with NO global sort — the two-level
    // histogram-selection algorithm. percentile_approx (and the KLL row)
    // cover the sketch path; this is the exact path at scale: pass 1
    // builds a coarse value histogram per group (bounded by
    // |groups| x |value domain / width| — a metadata-sized aggregate),
    // an in-plan window over THAT bounded table selects the one bucket
    // per group holding the global k-th element (and the element's
    // local rank inside it), and pass 2 re-scans with a broadcast
    // semi-filter on the selected (group, bucket) pairs, ranking only
    // the <= width/cent distinct values inside each. Total cost: two
    // scans + one bucket-local rank — never a corpus-wide sort; every
    // window here runs over histogram-sized frames. At 100 TB the same
    // two passes hold (a bucket-partitioned layout would turn the
    // pass-2 broadcast filter into partition pruning). A pathologically
    // wide bucket — a value domain OFF the 2-decimal grid concentrated
    // in one 1000-wide bucket — fails LOUDLY via the in-plan
    // distinct-value guard (see exactGroupedMedian) rather than
    // silently degrading pass 2 to a whole-group rank.
    // Fully lazy — no construction-time job, per the builder-registry
    // contract. k = FLOOR((n+1)/2) matches the q_agg_approx_percentile /
    // q_agg_kll_merge exact-rank convention (the VALUE at rank k is
    // well-defined regardless of tie order). l_extendedprice sits on a
    // 2-decimal grid, so each 1000-wide bucket holds at most 100k
    // distinct values.
    "q_agg_exact_median" -> ((s, dir) =>
      exactGroupedMedian(
        t(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_extendedprice")),
        "l_returnflag", "l_extendedprice", "exact_p50")),

    // A-ext: EXACT grouped WEIGHTED median — the value at half the
    // total MASS (here: price at half the shipped quantity; in a
    // corpus: the doc-stat value at half the token mass). Same
    // histogram selection with cumulative weights instead of counts —
    // positive integer weights keep the cumulative strictly increasing,
    // so every step of the two-pass algebra and the loud guard hold
    // unchanged.
    "q_agg_exact_weighted_median" -> ((s, dir) =>
      exactGroupedMedian(
        t(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_extendedprice"),
            col("l_quantity")),
        "l_returnflag", "l_extendedprice", "exact_wmedian",
        weightCol = Some("l_quantity"))),

    // A-ext: EXACT grouped MAD (median absolute deviation) — the robust
    // dispersion measure outlier gates want (stddev is itself dragged
    // by the outliers it should flag). Composes the histogram-selection
    // machinery twice: the group medians (|groups| rows) broadcast back
    // over the fact table, absolute deviations re-enter the identical
    // two-pass selection. Four scans total, never a corpus-wide sort;
    // deviations stay on the value grid (|v - med| of grid values is
    // grid-valued), so the bucket arithmetic and the guard hold
    // unchanged. abs/- are IEEE-exact, so both engines derive identical
    // deviation values.
    "q_agg_exact_mad" -> ((s, dir) => {
      // NO scan spread here (r20 regression, reverted r21): vals feeds
      // FOUR selection passes (median pass 1/2, MAD pass 1/2) — the
      // repartition exchange re-executed per pass and cost more than
      // the single-task CPU it spread (0.57x builder, 2.2x driver,
      // scaling ratio 0.52). The histogram passes are map-side
      // aggregates; at scale the multi-split scan parallelizes itself.
      val vals = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"))
      val med = exactGroupedMedian(vals, "l_returnflag", "l_extendedprice",
        "med")
      val dev = vals.join(broadcast(med), Seq("l_returnflag"))
        .select(col("l_returnflag"),
          abs(col("l_extendedprice") - col("med")).as("adev"))
      exactGroupedMedian(dev, "l_returnflag", "adev", "exact_mad")
    }),

    // A-ext: robust outlier report — the QA gate the exact median and
    // MAD exist to feed: a row is an outlier when its absolute
    // deviation from the group median exceeds a MAD multiple (the
    // Hampel / robust-z rule; mean±k·stddev is dragged by the very
    // outliers it should flag). Threshold corpus-calibrated at 1.5×MAD
    // (uniform-ish fixture prices put the production 3·1.4826·MAD cut
    // beyond the max deviation — the q_dedup_embedding calibration
    // precedent); per-group output, so the result is |groups|-sized.
    // Third composition of the histogram selection: two selection
    // passes + one final scan — still no corpus-wide sort anywhere.
    "q_agg_robust_outliers" -> ((s, dir) => {
      // NO scan spread here (r20 regression, reverted r21): vals feeds
      // FIVE passes (median 1/2, MAD 1/2, final outlier scan) — same
      // re-executed-exchange regression as q_agg_exact_mad (0.62x
      // builder, 1.7x driver, scaling ratio 0.59).
      val vals = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"))
      val med = exactGroupedMedian(vals, "l_returnflag", "l_extendedprice",
        "med")
      val dev = vals.join(broadcast(med), Seq("l_returnflag"))
        .select(col("l_returnflag"),
          abs(col("l_extendedprice") - col("med")).as("adev"))
      val mad = exactGroupedMedian(dev, "l_returnflag", "adev", "mad")
      dev.join(broadcast(mad), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(cnt.as("n_rows"),
          sum(when(col("adev") > col("mad") * lit(1.5), 1L).otherwise(0L))
            .as("n_outliers"))
        .withColumn("outlier_rate",
          col("n_outliers").cast(DoubleType) / col("n_rows"))
    }),

    // A-ext: EXACT grouped quartiles (p25/p50/p75) — the multi-rank
    // generalization of the histogram selection: ONE pass-1 histogram
    // serves all three targets (each rank picks its own bucket from
    // the same cumulative table), pass 2 re-scans once with the union
    // of selected (group, bucket) pairs broadcast, and the in-bucket
    // rank window partitions by (group, pct) so a bucket serving two
    // quartiles ranks each independently. Same cost class as the
    // median — two scans + bucket-local ranks, never a corpus-wide
    // sort — and the same loud distinct-value guard. Rank convention
    // k_m = max(1, (m·(n+1)) div 4), which reduces to the median's
    // (n+1) div 2 at m = 2.
    "q_agg_exact_quartiles" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val vals = t(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"), col("l_extendedprice").as("v"))
        .withColumn("__bucket", expr("CAST(v AS BIGINT) div 1000"))
      val hist = vals.groupBy(col("flag"), col("__bucket")).agg(cnt.as("c"))
      val wCum = Window.partitionBy(col("flag")).orderBy(col("__bucket"))
      val cum = hist
        .withColumn("cum", sum(col("c")).over(wCum))
        .withColumn("n", expr("SUM(c) OVER (PARTITION BY flag)"))
      val tgt = Seq(1, 2, 3).map { m =>
        cum.withColumn("k",
            greatest(lit(1L), expr(s"($m * (n + 1)) div 4")))
          .where(col("cum") >= col("k") && col("cum") - col("c") < col("k"))
          .select(col("flag"), col("__bucket"),
            (col("k") - (col("cum") - col("c"))).as("local_k"),
            lit(m * 25L).as("pct"))
      }.reduce(_ unionAll _)
      val wFlagQ = Window.partitionBy(col("flag"), col("pct")).orderBy(col("v"))
      val wAllQ = Window.partitionBy(col("flag"), col("pct"))
      vals.join(broadcast(tgt), Seq("flag", "__bucket"))
        .groupBy(col("flag"), col("pct"), col("local_k"), col("v"))
        .agg(cnt.as("c"))
        .withColumn("__nd", count(lit(1)).over(wAllQ))
        .where(coalesce(assert_true(col("__nd") <= lit(MedianMaxBucketDistinct),
          lit("exact-quartiles pass-2 bucket exceeds the distinct-value " +
            s"bound ($MedianMaxBucketDistinct) — see exactGroupedMedian")),
          lit(true)))
        .withColumn("cum", sum(col("c")).over(wFlagQ))
        .where(col("cum") >= col("local_k") &&
          col("cum") - col("c") < col("local_k"))
        .select(col("flag").as("l_returnflag"), col("pct"),
          col("v").cast(DoubleType).as("value"))
    }))

  val oracleSql: Map[String, String] = Map(
    "q_agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2)) * CAST(1.0 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
                COUNT(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         GROUP BY l_returnflag, l_linestatus""",
    // HUGEINT (int128) mirrors the Decimal(38,0) sufficient statistics
    // exactly; the same two-sqrt-one-divide tail follows the same
    // correctly-rounded int→double conversions
    "q_agg_correlations" ->
      """WITH q AS (
           SELECT CAST(FLOOR(l_quantity) AS HUGEINT) AS x,
                  CAST(FLOOR(l_extendedprice * 100) AS HUGEINT) AS y,
                  CAST(FLOOR(l_discount * 100) AS HUGEINT) AS z
           FROM lineitem),
         a AS (
           SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                  SUM(x) AS sx, SUM(y) AS sy, SUM(z) AS sz,
                  SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(z*z) AS szz,
                  SUM(x*y) AS sxy, SUM(x*z) AS sxz, SUM(y*z) AS syz
           FROM q)
         SELECT CAST(n AS BIGINT) AS n_rows,
                CAST(sxy*n - sx*sy AS DOUBLE)
                  / (SQRT(CAST(sxx*n - sx*sx AS DOUBLE))
                     * SQRT(CAST(syy*n - sy*sy AS DOUBLE)))
                  AS corr_qty_price,
                CAST(sxz*n - sx*sz AS DOUBLE)
                  / (SQRT(CAST(sxx*n - sx*sx AS DOUBLE))
                     * SQRT(CAST(szz*n - sz*sz AS DOUBLE)))
                  AS corr_qty_disc,
                CAST(syz*n - sy*sz AS DOUBLE)
                  / (SQRT(CAST(syy*n - sy*sy AS DOUBLE))
                     * SQRT(CAST(szz*n - sz*sz AS DOUBLE)))
                  AS corr_price_disc
         FROM a""",
    "q_agg_customer_sales" ->
      """SELECT c_mktsegment, c_custkey,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales,
                COUNT(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment, c_custkey""",
    "q_agg_count_distinct" ->
      """SELECT o_orderpriority,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales,
                CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
                COUNT(*) AS n_orders
         FROM orders GROUP BY o_orderpriority""",
    "q_agg_approx_distinct" ->
      """SELECT o_orderpriority,
                CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact,
                TRUE AS approx_ok
         FROM orders GROUP BY o_orderpriority""",
    "q_agg_hll_merge" ->
      """SELECT event_type,
                CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
                TRUE AS approx_ok
         FROM events GROUP BY event_type
         UNION ALL
         SELECT 'ALL' AS event_type,
                CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
                TRUE AS approx_ok
         FROM events""",
    "q_agg_heavy_hitters" ->
      """WITH b AS (
           SELECT event_type,
                  CAST(LENGTH(CAST(CAST(FLOOR(value) AS BIGINT) AS VARCHAR))
                       AS BIGINT) AS bkt
           FROM events WHERE value IS NOT NULL),
         e AS (
           SELECT event_type AS scope, bkt, CAST(COUNT(*) AS BIGINT) AS c
           FROM b GROUP BY 1, 2
           UNION ALL
           SELECT 'ALL', bkt, CAST(COUNT(*) AS BIGINT) FROM b GROUP BY 2),
         r AS (
           SELECT scope, bkt, c,
                  ROW_NUMBER() OVER (PARTITION BY scope
                                     ORDER BY c DESC, bkt) AS rn
           FROM e)
         SELECT scope, bkt AS top_bucket, c AS n_top, TRUE AS mg_ok
         FROM r WHERE rn = 1""",
    "q_agg_kll_merge" ->
      """WITH ranked AS (
           SELECT event_type, CAST(value AS DOUBLE) AS v,
                  ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY value ASC NULLS LAST,
                                              event_id) AS rn,
                  COUNT(*) OVER (PARTITION BY event_type) AS n
           FROM events)
         SELECT event_type AS scope, v AS exact_p50, TRUE AS approx_ok
         FROM ranked WHERE rn = CAST(FLOOR((n + 1) / 2.0) AS BIGINT)
         UNION ALL
         SELECT 'ALL' AS scope, CAST(NULL AS DOUBLE) AS exact_p50,
                TRUE AS approx_ok""",
    "q_agg_approx_percentile" ->
      """WITH ranked AS (
           SELECT o_orderpriority,
                  CAST(o_totalprice AS DOUBLE) AS price,
                  ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                     ORDER BY o_totalprice, o_orderkey) AS rn,
                  COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
           FROM orders)
         SELECT o_orderpriority, price AS exact_p50, TRUE AS approx_ok
         FROM ranked
         WHERE rn = CAST(FLOOR((n + 1) / 2.0) AS BIGINT)""",
    "q_agg_churn" ->
      """SELECT o_custkey,
                CAST(MIN(o_orderdate) AS DATE) AS first_order,
                CAST(MAX(o_orderdate) AS DATE) AS last_order,
                CAST(MAX(o_orderdate) AS DATE) < (DATE '1998-12-01' - INTERVAL 6 MONTH)
                  AS is_churned
         FROM orders GROUP BY o_custkey""",
    "q_agg_rollup" ->
      """SELECT r_name, n_name,
                CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal,
                COUNT(*) AS n_cust
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)""",
    "q_agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
                COUNT(*) AS n_orders
         FROM orders
         GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
    "q_agg_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
                COUNT(*) AS n_orders
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""",
    "q_pivot_status" ->
      """SELECT o_orderpriority,
                CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS total_open,
                CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS total_fulfilled,
                CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS total_pending
         FROM orders GROUP BY o_orderpriority""",
    "q_unpivot_metrics" ->
      """SELECT l_orderkey, l_linenumber, metric, value FROM (
           SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, COALESCE(l_quantity, 0.0) AS value FROM lineitem
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'l_extendedprice', COALESCE(l_extendedprice, 0.0) FROM lineitem
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'l_discount', COALESCE(l_discount, 0.0) FROM lineitem)
         WHERE l_orderkey % 100 = 0""",
    "q_agg_having_dups" ->
      """SELECT o_custkey, CAST(o_orderdate AS DATE) AS order_day, COUNT(*) AS n_orders
         FROM orders
         GROUP BY o_custkey, CAST(o_orderdate AS DATE)
         HAVING COUNT(*) > 1""",
    "q_agg_grouped_mode" ->
      """WITH c AS (
           SELECT c_nationkey, c_mktsegment, COUNT(*) AS c
           FROM customer GROUP BY 1, 2),
         r AS (
           SELECT c_nationkey, c_mktsegment, c,
                  ROW_NUMBER() OVER (PARTITION BY c_nationkey
                    ORDER BY c DESC, c_mktsegment DESC) AS rn,
                  SUM(c) OVER (PARTITION BY c_nationkey) AS nr
           FROM c)
         SELECT c_nationkey, c_mktsegment AS mode_segment,
                CAST(c AS BIGINT) AS mode_count,
                CAST(nr AS BIGINT) AS n_rows
         FROM r WHERE rn = 1""",
    "q_agg_dup_stats" ->
      """SELECT COUNT(*) AS n_rows,
                CAST(COUNT(DISTINCT COALESCE(NULLIF(LOWER(TRIM(text)), ''), '<NULL>')) AS BIGINT) AS n_distinct,
                COUNT(*) - CAST(COUNT(DISTINCT COALESCE(NULLIF(LOWER(TRIM(text)), ''), '<NULL>')) AS BIGINT) AS n_dups
         FROM documents""",
    "q_agg_null_profile" ->
      """SELECT source,
                CAST(SUM(CASE WHEN text IS NULL OR TRIM(CAST(text AS VARCHAR)) = '' THEN 1 ELSE 0 END) AS BIGINT) AS text_blank,
                CAST(SUM(CASE WHEN lang IS NULL OR TRIM(CAST(lang AS VARCHAR)) = '' THEN 1 ELSE 0 END) AS BIGINT) AS lang_blank,
                COUNT(*) AS n_rows
         FROM documents GROUP BY source""",
    "q_agg_exact_median" ->
      """WITH ranked AS (
           SELECT l_returnflag,
                  CAST(l_extendedprice AS DOUBLE) AS v,
                  ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                     ORDER BY l_extendedprice) AS rn,
                  COUNT(*) OVER (PARTITION BY l_returnflag) AS n
           FROM lineitem)
         SELECT l_returnflag, v AS exact_p50
         FROM ranked WHERE rn = CAST(FLOOR((n + 1) / 2.0) AS BIGINT)""",
    "q_agg_robust_outliers" ->
      """WITH ranked AS (
           SELECT l_returnflag,
                  CAST(l_extendedprice AS DOUBLE) AS v,
                  ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                     ORDER BY l_extendedprice) AS rn,
                  COUNT(*) OVER (PARTITION BY l_returnflag) AS n
           FROM lineitem),
         med AS (
           SELECT l_returnflag, v AS med
           FROM ranked WHERE rn = CAST(FLOOR((n + 1) / 2.0) AS BIGINT)),
         dev AS (
           SELECT l.l_returnflag,
                  abs(CAST(l.l_extendedprice AS DOUBLE) - m.med) AS adev
           FROM lineitem l JOIN med m USING (l_returnflag)),
         ranked2 AS (
           SELECT l_returnflag, adev,
                  ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                     ORDER BY adev) AS rn,
                  COUNT(*) OVER (PARTITION BY l_returnflag) AS n
           FROM dev),
         mad AS (
           SELECT l_returnflag, adev AS mad
           FROM ranked2 WHERE rn = CAST(FLOOR((n + 1) / 2.0) AS BIGINT)),
         agg AS (
           SELECT d.l_returnflag,
                  CAST(COUNT(*) AS BIGINT) AS n_rows,
                  CAST(SUM(CASE WHEN d.adev > m.mad * 1.5 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers
           FROM dev d JOIN mad m USING (l_returnflag)
           GROUP BY d.l_returnflag)
         SELECT l_returnflag, n_rows, n_outliers,
                CAST(n_outliers AS DOUBLE) / n_rows AS outlier_rate
         FROM agg""",
    "q_agg_exact_weighted_median" ->
      """WITH v AS (
           SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS v,
                  CAST(l_quantity AS BIGINT) AS wt
           FROM lineitem),
         g AS (SELECT l_returnflag, v, SUM(wt) AS c
               FROM v GROUP BY l_returnflag, v),
         r AS (SELECT l_returnflag, v, c,
                      SUM(c) OVER (PARTITION BY l_returnflag
                                   ORDER BY v) AS cum,
                      SUM(c) OVER (PARTITION BY l_returnflag) AS tot
               FROM g)
         SELECT l_returnflag, v AS exact_wmedian
         FROM r WHERE cum >= (tot + 1) // 2 AND cum - c < (tot + 1) // 2""",
    "q_agg_exact_mad" ->
      """WITH ranked AS (
           SELECT l_returnflag,
                  CAST(l_extendedprice AS DOUBLE) AS v,
                  ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                     ORDER BY l_extendedprice) AS rn,
                  COUNT(*) OVER (PARTITION BY l_returnflag) AS n
           FROM lineitem),
         med AS (
           SELECT l_returnflag, v AS med
           FROM ranked WHERE rn = CAST(FLOOR((n + 1) / 2.0) AS BIGINT)),
         dev AS (
           SELECT l.l_returnflag,
                  abs(CAST(l.l_extendedprice AS DOUBLE) - m.med) AS adev
           FROM lineitem l JOIN med m USING (l_returnflag)),
         ranked2 AS (
           SELECT l_returnflag, adev,
                  ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                     ORDER BY adev) AS rn,
                  COUNT(*) OVER (PARTITION BY l_returnflag) AS n
           FROM dev)
         SELECT l_returnflag, adev AS exact_mad
         FROM ranked2 WHERE rn = CAST(FLOOR((n + 1) / 2.0) AS BIGINT)""",
    "q_agg_exact_quartiles" ->
      """WITH ranked AS (
           SELECT l_returnflag,
                  CAST(l_extendedprice AS DOUBLE) AS v,
                  ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                     ORDER BY l_extendedprice) AS rn,
                  COUNT(*) OVER (PARTITION BY l_returnflag) AS n
           FROM lineitem),
         m AS (SELECT unnest([1, 2, 3]) AS m)
         SELECT r.l_returnflag, CAST(m.m * 25 AS BIGINT) AS pct,
                r.v AS value
         FROM ranked r JOIN m
           ON r.rn = greatest(1, (m.m * (r.n + 1)) // 4)""")
}
