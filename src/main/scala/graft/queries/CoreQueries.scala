package graft.queries

import graft.Tables.t
import graft.Exact._
import graft.operators.{AsofJoin, HorizonAgg, IntervalOverlapJoin, RangeBinJoin}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scans, projections, filters, joins, set ops and scalar functions —
  * SURVEY.md §2.1/§2.2/§2.3/§2.7/§2.8, re-expressed over the driver
  * testdata. Every query is a declarative DataFrame chain so Catalyst
  * pushes filters/projections into the parquet scan and picks
  * broadcast-hash for the small dimension sides.
  */
object CoreQueries extends QueryPack {

  /** One oracle for both range-join forms (pair-join q_join_range_binned
    * and two-grid-window q_join_range_window): the forms must hash-match
    * each other through it.
    */
  private val rangeNextHourOracle =
    """WITH ev AS (
           SELECT event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
           FROM events)
         SELECT a.event_id, a.event_type,
                CAST(COUNT(b.event_id) AS BIGINT) AS n_next_hour,
                CAST(COALESCE(SUM(CAST(b.value AS DECIMAL(18,2))), 0) AS DOUBLE)
                  AS value_next_hour
         FROM ev a LEFT JOIN ev b
           ON a.event_type = b.event_type
          AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
         GROUP BY a.event_id, a.event_type"""

  /** Shared probe/quote frames for the as-of family: probes = clicks;
    * quotes = purchases pre-deduped to one row per (user_id, ts) keeping
    * the max event_id, so equal-timestamp picks are deterministic on
    * both engines (the oracle mirrors the dedup with MAX/MAX_BY).
    */
  private def asofInputs(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val ev = graft.Tables.events(s, dir)
    val probes = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val quotes = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("matched_ts"),
        col("event_id"), col("value"))
      .groupBy(col("user_id"), col("matched_ts"))
      .agg(max(col("event_id")).as("matched_event_id"),
        max_by(col("value"), col("event_id")).as("matched_value"))
    (probes, quotes)
  }

  val queries: Map[String, Q] = Map(
    // S4/S9 + P4-style pruned scan: projection + predicates reach the
    // parquet reader (PushedFilters + 3-column ReadSchema).
    // Ref: scripts/load_to_bronze.py:570-576, tools.load_crm_cust_info_v1.sql:108-111
    "q_scan_pruned" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    }),

    // P1/P2/P3: mapping-driven projection+rename, "smart id-cast"
    // (round(double)->bigint), literal batch column.
    // Ref: scripts/load_to_bronze.py:527-560 (P1), 246-262 (P2), 559 (P3)
    "q_mapping_projection" -> ((s, dir) => {
      t(s, dir, "customer").select(
        round(col("c_custkey").cast(DoubleType)).cast(LongType).as("customer_id"),
        trim(col("c_name")).as("customer_name"),
        upper(col("c_mktsegment")).as("segment"),
        lit("BATCH000001").as("dwh_batch_id"))
    }),

    // J1/J2: left-outer dim-enrichment joins (customer -> nation -> region).
    // nation/region are tiny -> Catalyst broadcasts automatically.
    // Ref: tools.load_dim_customers_v1.sql:77-84, tools.load_dim_products_v1.sql:76-79
    "q_join_enrich" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"), "left")
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"), "left")
        .select(col("c_custkey"), col("c_name"),
          col("n_name").as("nation"), col("r_name").as("region"))
    }),

    // J3: surrogate-key lookup join with unknown-member fallback (-1).
    // Ref: tools.load_fact_sales_v1.sql:63-81
    "q_surrogate_lookup" -> ((s, dir) => {
      val dim = t(s, dir, "customer")
        .where(col("c_acctbal") > 0)
        .select(col("c_custkey"))
      t(s, dir, "orders")
        .join(dim, col("o_custkey") === col("c_custkey"), "left")
        .select(col("o_orderkey"),
          coalesce(col("c_custkey"), lit(-1L)).as("customer_key"),
          col("o_totalprice"))
    }),

    // J6: anti join — parts never shipped in bulk (quantity > 49).
    // Ref: Methods_crm_sales_details.sql:84-88 (NOT IN referential check)
    "q_anti_join" -> ((s, dir) => {
      val bulk = t(s, dir, "lineitem")
        .where(col("l_quantity") > 49).select(col("l_partkey"))
      t(s, dir, "part")
        .join(bulk, col("p_partkey") === col("l_partkey"), "left_anti")
        .select(col("p_partkey"), col("p_name"))
    }),

    // Semi join — suppliers with at least one high-value shipment.
    "q_semi_join" -> ((s, dir) => {
      val hot = t(s, dir, "lineitem")
        .where(col("l_extendedprice") > 90000).select(col("l_suppkey"))
      t(s, dir, "supplier")
        .join(hot, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
    }),

    // U1: UNION ALL of two tagged slices.
    // Ref: sql/gold/materialized_view.sql:137
    "q_union_all" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.where(col("o_totalprice") > 400000)
        .select(col("o_orderkey"), lit("high_value").as("src"))
        .unionAll(
          o.where(col("o_orderpriority") === "1-URGENT")
            .select(col("o_orderkey"), lit("urgent").as("src")))
    }),

    // U-family completion: INTERSECT / EXCEPT with set (distinct)
    // semantics on both engines — retained vs churned customer keys
    // across two order years. Spark plans these as an aggregate-dedup +
    // semi/anti join, i.e. two key shuffles, the same cost class as any
    // distinct — no row explosion at scale.
    "q_intersect" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_custkey"),
        year(col("o_orderdate").cast(DateType)).as("y"))
      o.where(col("y") === 1995).select(col("o_custkey"))
        .intersect(o.where(col("y") === 1996).select(col("o_custkey")))
    }),

    "q_except" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_custkey"),
        year(col("o_orderdate").cast(DateType)).as("y"))
      o.where(col("y") === 1995).select(col("o_custkey"))
        .except(o.where(col("y") === 1996).select(col("o_custkey")))
    }),

    // Extension: backward AS-OF join — for each click, the latest
    // purchase of the same user at or before the click. Spark lacks the
    // operator; operators/AsofJoin implements the one-shuffle union+window
    // plan (oracle: DuckDB ASOF LEFT JOIN over the same deduped quotes).
    "q_join_asof" -> ((s, dir) => {
      val (probes, quotes) = asofInputs(s, dir)
      AsofJoin.backward(probes, quotes,
        key = "user_id", probeTime = "ts", quoteTime = "matched_ts",
        tieBreak = "matched_event_id")
    }),

    // Forward as-of: for each click, the EARLIEST purchase at or after
    // it — the time-to-conversion shape. Same plan walking time
    // descending; oracle = DuckDB ASOF LEFT JOIN with the inequality
    // flipped.
    "q_join_asof_forward" -> ((s, dir) => {
      val (probes, quotes) = asofInputs(s, dir)
      AsofJoin.forward(probes, quotes,
        key = "user_id", probeTime = "ts", quoteTime = "matched_ts",
        tieBreak = "matched_event_id")
    }),

    // Funnel conversion (batch form of StreamingJobs.conversionStream):
    // each click either converts to the earliest purchase within 30
    // minutes (with its delay) or is unconverted — the forward as-of
    // clamped to a horizon. Delay = integer-micros difference divided
    // once into double: IEEE-identical on both engines.
    "q_funnel_conversion" -> ((s, dir) => {
      val h = 1800L * 1000000L
      val fwd = queries("q_join_asof_forward")(s, dir)
      val inWin = col("matched_ts").isNotNull &&
        unix_micros(col("matched_ts")) <= unix_micros(col("ts")) + h
      fwd.select(col("event_id"), col("user_id"), col("ts"),
        inWin.as("converted"),
        when(inWin, col("matched_event_id")).as("conv_event_id"),
        when(inWin, (unix_micros(col("matched_ts")) - unix_micros(col("ts")))
          .cast(DoubleType) / 1e6).as("delay_seconds"))
    }),

    // The hot-key production form of q_join_asof: identical semantics,
    // but the fill is two-phase over (user, 1-day epoch) partitions so
    // no window task ever holds a whole key. Same DuckDB ASOF oracle —
    // the two variants must hash-match each other through it.
    "q_join_asof_epoch" -> ((s, dir) => {
      val (probes, quotes) = asofInputs(s, dir)
      AsofJoin.backwardEpoched(probes, quotes,
        key = "user_id", probeTime = "ts", quoteTime = "matched_ts",
        tieBreak = "matched_event_id", epochMicros = 86400L * 1000000L)
    }),

    // Extension: banded range join — per event, how many same-type events
    // (and their value total) land in the following hour. A bare non-equi
    // join would be quadratic per event_type (5 hot keys);
    // operators/RangeBinJoin makes it equi on (type, hour-bin) with the
    // range check residual. Exact decimal sum (Exact.dsum contract).
    "q_join_range_binned" -> ((s, dir) => {
      // spread the unsplittable small scan (guide §2.5, Tables.spreadBySize
      // scaladoc): the bin explode + candidate join serialized 1.45 s of
      // CPU on ONE task at sf0.1; at scale the gate is dead and the read
      // is plan-identical
      val ev = graft.Tables.eventsSpread(s, dir, "event_id")
      val pairs = RangeBinJoin.leftRangeJoin(
        ev.select(col("event_id"), col("event_type"), col("ts")),
        ev.select(col("event_type").as("r_type"), col("ts").as("r_ts"),
          col("event_id").as("r_event_id"), col("value").as("r_value")),
        leftKey = "event_type", rightKey = "r_type",
        leftTime = "ts", rightTime = "r_ts",
        horizonMicros = 3600L * 1000000L)
      pairs.groupBy(col("event_id"), col("event_type"))
        .agg(count(col("r_event_id")).cast(LongType).as("n_next_hour"),
          coalesce(sum(col("r_value").cast(DecimalType(18, 2))),
            lit(0).cast(DecimalType(18, 2)))
            .cast(DoubleType).as("value_next_hour"))
    }),

    // The aggregate-pushdown form of q_join_range_binned: when the
    // consumer is a per-event aggregate, the candidate-pair stream is
    // pure overhead — and it grows with per-(type, hour) DENSITY²
    // (this fixture: 10x events in the same 30-day span -> 100x
    // pairs, 27.7k -> 2.77M). operators/HorizonAgg computes the
    // identical answer with two (type, cell) window shuffles — linear
    // in events, density-INDEPENDENT: the plan that survives a 100x
    // scale-up of a hot event type. Same oracle as
    // q_join_range_binned; the two forms must hash-match through it.
    "q_join_range_window" -> ((s, dir) => {
      val ev = graft.Tables.events(s, dir)
        .select(col("event_id"), col("event_type"), col("value"),
          unix_micros(col("ts")).as("t_us"))
      HorizonAgg.forward(ev, Seq("event_type"), "t_us",
        horizonMicros = 3600L * 1000000L,
        aggs = Seq(
          "n_raw" -> count(col("event_id")),
          "v_raw" -> sum(col("value").cast(DecimalType(18, 2)))))
        .select(col("event_id"), col("event_type"),
          // coalesce mirrors the pair join: no matches (including the
          // NULL-key/NULL-time quarantine rows) count 0 and sum 0
          coalesce(col("n_raw"), lit(0L)).cast(LongType).as("n_next_hour"),
          coalesce(col("v_raw"), lit(0).cast(DecimalType(18, 2)))
            .cast(DoubleType).as("value_next_hour"))
    }),

    // Extension: interval-OVERLAP join (both sides ranged) — concurrent
    // activity-window detection: each purchase's 30-min window against
    // each same-user click's 30-min window. operators/IntervalOverlapJoin
    // bins both sides by the length bound so the join is equi on
    // (user, bin) with <=3x left fan-out and every true pair meeting
    // exactly once — never the per-user quadratic residual of a bare
    // overlap predicate. Inner semantics; the aggregate keeps output at
    // one row per purchase with an overlapping click.
    "q_join_interval_overlap" -> ((s, dir) => {
      val ev = graft.Tables.events(s, dir)
      val win = expr("INTERVAL 30 MINUTES")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          (col("ts") + win).as("ts_end"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("c_event_id"),
          col("user_id").as("c_user_id"),
          col("ts").as("c_ts"), (col("ts") + win).as("c_ts_end"))
      IntervalOverlapJoin.overlapJoin(purchases, clicks,
        leftKey = "user_id", rightKey = "c_user_id",
        leftStart = "ts", leftEnd = "ts_end",
        rightStart = "c_ts", rightEnd = "c_ts_end",
        maxLenMicros = 1800L * 1000000L)
        .groupBy(col("event_id"), col("user_id"))
        .agg(cnt.as("n_overlap_clicks"),
          min(col("c_event_id")).as("first_click_id"))
    }),

    // F7/F2/F4/F8: CASE-WHEN enum decode, UPPER/LOWER, SUBSTRING, COALESCE/NULLIF.
    // Ref: tools.load_crm_cust_info_v1.sql:82-91, tools.load_erp_loc_a101_v1.sql:72-77
    "q_case_decode" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        when(upper(trim(col("o_orderstatus"))) === "O", "Open")
          .when(upper(trim(col("o_orderstatus"))) === "F", "Fulfilled")
          .when(upper(trim(col("o_orderstatus"))) === "P", "Pending")
          .otherwise("n/a").as("status_decoded"),
        substring(col("o_orderpriority"), 1, 1).as("priority_code"),
        coalesce(nullif(lower(col("o_orderpriority")), lit("")), lit("unknown"))
          .as("priority_norm"))
    }),

    // F11-F15: date part extraction, month truncation, yyyyMMdd int
    // round-trip, datediff against a pinned reference date (F12 is made
    // deterministic by injecting the date — SURVEY §7.4.3).
    // Ref: tools.load_crm_sales_details_v1.sql:81-95, materialized_view.sql:4
    "q_date_functions" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast(LongType).as("o_year"),
        month(col("o_orderdate")).cast(LongType).as("o_month"),
        date_trunc("month", col("o_orderdate")).cast(DateType).as("month_start"),
        date_format(col("o_orderdate"), "yyyyMMdd").cast(LongType).as("date_int"),
        to_date(date_format(col("o_orderdate"), "yyyyMMdd"), "yyyyMMdd")
          .as("roundtrip_date"),
        datediff(lit("1998-12-01").cast(DateType), col("o_orderdate"))
          .cast(LongType).as("days_to_ref"))
    }),

    // F16/F8/F9/F10: repair arithmetic — ABS, NULLIF div-by-zero guard, ROUND.
    // Ref: tools.load_crm_sales_details_v1.sql:96-109
    "q_repair_arithmetic" -> ((s, dir) => {
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        // plain double division is IEEE-identical across engines; ROUND on
        // arbitrary doubles is NOT (string-repr vs binary rounding)
        (abs(col("l_extendedprice")) / nullif(col("l_quantity"), lit(0.0)))
          .cast(DoubleType).as("unit_price"),
        when(col("l_extendedprice") <= 0,
          col("l_quantity") * abs(col("l_extendedprice")))
          .otherwise(col("l_extendedprice")).as("sales_repaired"))
    }))

  /** Shared oracle CTE for the as-of family — mirrors [[asofInputs]]. */
  private val asofOracleCte =
    """WITH probes AS (
           SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'click'),
         quotes AS (
           SELECT user_id, CAST(ts AS TIMESTAMP) AS matched_ts,
                  MAX(event_id) AS matched_event_id,
                  MAX_BY(value, event_id) AS matched_value
           FROM events WHERE event_type = 'purchase'
           GROUP BY user_id, CAST(ts AS TIMESTAMP))"""

  val oracleSql: Map[String, String] = Map(
    "q_scan_pruned" ->
      """SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_quantity > 45""",
    "q_mapping_projection" ->
      """SELECT CAST(ROUND(CAST(c_custkey AS DOUBLE)) AS BIGINT) AS customer_id,
                TRIM(c_name) AS customer_name,
                UPPER(c_mktsegment) AS segment,
                'BATCH000001' AS dwh_batch_id
         FROM customer""",
    "q_join_enrich" ->
      """SELECT c_custkey, c_name, n_name AS nation, r_name AS region
         FROM customer
         LEFT JOIN nation ON c_nationkey = n_nationkey
         LEFT JOIN region ON n_regionkey = r_regionkey""",
    "q_surrogate_lookup" ->
      """SELECT o_orderkey, COALESCE(c.c_custkey, -1) AS customer_key, o_totalprice
         FROM orders o
         LEFT JOIN (SELECT c_custkey FROM customer WHERE c_acctbal > 0) c
           ON o.o_custkey = c.c_custkey""",
    "q_anti_join" ->
      """SELECT p_partkey, p_name FROM part
         WHERE NOT EXISTS (SELECT 1 FROM lineitem
                           WHERE l_quantity > 49 AND l_partkey = p_partkey)""",
    "q_semi_join" ->
      """SELECT s_suppkey, s_name FROM supplier
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_extendedprice > 90000 AND l_suppkey = s_suppkey)""",
    "q_union_all" ->
      """SELECT o_orderkey, 'high_value' AS src FROM orders WHERE o_totalprice > 400000
         UNION ALL
         SELECT o_orderkey, 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'""",
    "q_intersect" ->
      """SELECT o_custkey FROM orders
         WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
         INTERSECT
         SELECT o_custkey FROM orders
         WHERE EXTRACT(YEAR FROM o_orderdate) = 1996""",
    "q_except" ->
      """SELECT o_custkey FROM orders
         WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
         EXCEPT
         SELECT o_custkey FROM orders
         WHERE EXTRACT(YEAR FROM o_orderdate) = 1996""",
    "q_join_asof" -> (asofOracleCte +
      """
         SELECT p.event_id, p.user_id, p.ts,
                q.matched_ts, q.matched_event_id, q.matched_value
         FROM probes p ASOF LEFT JOIN quotes q
           ON p.user_id = q.user_id AND p.ts >= q.matched_ts"""),
    "q_join_asof_forward" -> (asofOracleCte +
      """
         SELECT p.event_id, p.user_id, p.ts,
                q.matched_ts, q.matched_event_id, q.matched_value
         FROM probes p ASOF LEFT JOIN quotes q
           ON p.user_id = q.user_id AND p.ts <= q.matched_ts"""),
    "q_funnel_conversion" -> (asofOracleCte +
      """,
         fwd AS (
           SELECT p.event_id, p.user_id, p.ts, q.matched_ts, q.matched_event_id
           FROM probes p ASOF LEFT JOIN quotes q
             ON p.user_id = q.user_id AND p.ts <= q.matched_ts)
         SELECT event_id, user_id, ts,
                matched_ts IS NOT NULL
                  AND epoch_us(matched_ts) <= epoch_us(ts) + 1800000000
                  AS converted,
                CASE WHEN matched_ts IS NOT NULL
                       AND epoch_us(matched_ts) <= epoch_us(ts) + 1800000000
                     THEN matched_event_id END AS conv_event_id,
                CASE WHEN matched_ts IS NOT NULL
                       AND epoch_us(matched_ts) <= epoch_us(ts) + 1800000000
                     THEN CAST(epoch_us(matched_ts) - epoch_us(ts) AS DOUBLE)
                          / 1e6 END AS delay_seconds
         FROM fwd"""),
    "q_join_asof_epoch" -> (asofOracleCte +
      """
         SELECT p.event_id, p.user_id, p.ts,
                q.matched_ts, q.matched_event_id, q.matched_value
         FROM probes p ASOF LEFT JOIN quotes q
           ON p.user_id = q.user_id AND p.ts >= q.matched_ts"""),
    "q_join_range_binned" -> rangeNextHourOracle,
    // identical contract on purpose: the pair-join and two-grid-window
    // forms must agree through one oracle
    "q_join_range_window" -> rangeNextHourOracle,
    "q_join_interval_overlap" ->
      """WITH ev AS (
           SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
           FROM events),
         p AS (
           SELECT event_id, user_id, ts, ts + INTERVAL 30 MINUTE AS ts_end
           FROM ev WHERE event_type = 'purchase'),
         c AS (
           SELECT event_id AS c_event_id, user_id AS c_user_id,
                  ts AS c_ts, ts + INTERVAL 30 MINUTE AS c_ts_end
           FROM ev WHERE event_type = 'click')
         SELECT p.event_id, p.user_id,
                CAST(COUNT(*) AS BIGINT) AS n_overlap_clicks,
                MIN(c.c_event_id) AS first_click_id
         FROM p JOIN c ON p.user_id = c.c_user_id
           AND p.ts <= c.c_ts_end AND c.c_ts <= p.ts_end
         GROUP BY p.event_id, p.user_id""",
    "q_case_decode" ->
      """SELECT o_orderkey,
                CASE UPPER(TRIM(o_orderstatus))
                  WHEN 'O' THEN 'Open' WHEN 'F' THEN 'Fulfilled'
                  WHEN 'P' THEN 'Pending' ELSE 'n/a' END AS status_decoded,
                SUBSTRING(o_orderpriority, 1, 1) AS priority_code,
                COALESCE(NULLIF(LOWER(o_orderpriority), ''), 'unknown') AS priority_norm
         FROM orders""",
    "q_date_functions" ->
      """SELECT o_orderkey,
                CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
                CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS o_month,
                CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
                CAST(STRFTIME(o_orderdate, '%Y%m%d') AS BIGINT) AS date_int,
                CAST(STRPTIME(STRFTIME(o_orderdate, '%Y%m%d'), '%Y%m%d') AS DATE)
                  AS roundtrip_date,
                CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '1998-12-01')
                  AS BIGINT) AS days_to_ref
         FROM orders""",
    "q_repair_arithmetic" ->
      """SELECT l_orderkey, l_linenumber,
                CAST(ABS(l_extendedprice) / NULLIF(l_quantity, 0) AS DOUBLE)
                  AS unit_price,
                CASE WHEN l_extendedprice <= 0
                     THEN l_quantity * ABS(l_extendedprice)
                     ELSE l_extendedprice END AS sales_repaired
         FROM lineitem""")
}
