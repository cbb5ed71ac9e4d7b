package graft.queries

import graft.Tables.t
import graft.Exact._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-table analytics: the batch-equivalent shapes of the streaming
  * operators (tumbling windows, sessionization). These batch versions
  * carry the oracle-checked semantics; see graft.streaming for the
  * Structured Streaming counterparts.
  */
object EventQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // Tumbling daily window per event type (streaming: groupBy(window($"ts","1 day"))).
    "q_events_tumbling_daily" -> ((s, dir) => {
      graft.Tables.events(s, dir)
        .groupBy(col("ts").cast(DateType).as("day"), col("event_type"))
        .agg(cnt.as("n_events"),
          dsum(col("value")).as("total_value"),
          countDistinct(col("user_id")).cast(LongType).as("n_users"))
    }),

    // Sliding window: 1-day windows every 12 hours — each event lands in
    // exactly two windows (streaming: groupBy(window($"ts","1 day","12 hours"))).
    "q_events_sliding_daily" -> ((s, dir) => {
      graft.Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 day", "12 hours").as("w"),
          col("event_type"))
        .agg(cnt.as("n_events"), dsum(col("value")).as("total_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n_events"), col("total_value"))
    }),

    // Feed-health anomaly detection: hours where an event type's count
    // exceeds its own mean + 3 sigma — EXACTLY. The textbook float
    // z-score diverges across engines, so the test is algebra instead:
    // with n hours, S = sum(c), Q = sum(c^2), population variance =
    // (nQ - S^2)/n^2, and c > mean + 3*sigma is equivalent to
    // L = c*n - S > 0 AND L^2 > 9*(nQ - S^2) — every term an integer,
    // computed in Decimal(38,0) so the squares cannot overflow longs at
    // production hour counts. Plan: one (type, hour) aggregate, a
    // type-keyed stats aggregate (rows = #types), broadcast-joined
    // back; hour ids are epoch-hour longs so the engines agree without
    // timestamp rendering.
    "q_events_anomaly" -> ((s, dir) => {
      val D = DecimalType(38, 0)
      val hourly = graft.Tables.events(s, dir)
        .groupBy(col("event_type"), epochHourCol.as("hour_id"))
        .agg(cnt.as("c"))
      val stats = hourly.groupBy(col("event_type"))
        .agg(cnt.as("n"), sum(col("c")).as("s"),
          sum(col("c") * col("c")).as("q"))
      val lift = col("c").cast(D) * col("n").cast(D) - col("s").cast(D)
      hourly.join(broadcast(stats), "event_type")
        .where(lift > 0 && lift * lift >
          (col("n").cast(D) * col("q").cast(D)
            - col("s").cast(D) * col("s").cast(D)) * lit(9))
        .select(col("event_type"), col("hour_id"), col("c").as("n_events"))
    }),

    // Semi-structured extraction: parse the props JSON column with an
    // explicit schema (from_json — schema-on-read, codegen'd, no UDF)
    // and aggregate the extracted field. Integer sums stay exact in
    // BIGINT; the mean is one double division, IEEE-identical in both
    // engines.
    "q_events_json_extract" -> ((s, dir) => {
      val k = from_json(col("props"), StructType(Seq(
        StructField("k", LongType)))).getField("k")
      graft.Tables.events(s, dir)
        .select(col("event_type"), k.as("k"))
        .groupBy(col("event_type"))
        .agg(cnt.as("n_events"),
          sum(col("k")).as("sum_k"),
          count(when(col("k") > 50, 1)).cast(LongType).as("n_high"),
          (sum(col("k")).cast(DoubleType) / count(col("k"))).as("mean_k"))
    }),

    // Sessionization with a 30-minute inactivity gap — the batch analog of
    // session windows: a new session starts when the gap from the previous
    // event of the same user exceeds the timeout.
    "q_events_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      graft.Tables.events(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull
            || col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1L)
            .otherwise(0L))
        .withColumn("session_seq",
          sum(col("new_session")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(cnt.as("n_events"), dsum(col("value")).as("session_value"))
    }),

    // Cohort retention: each user joins the cohort of their first-seen
    // date; the retention curve counts distinct active users per
    // (cohort, day-offset) cell. Two shuffles — the per-user MIN and
    // the user-keyed join back — both on user_id, so at 100 TB the
    // cohort table co-partitions with the event shuffle (no broadcast:
    // the cohort side is user-cardinality, not dimension-sized). The
    // cell grid itself is tiny (days x days).
    "q_events_retention" -> ((s, dir) => {
      val ev = graft.Tables.events(s, dir)
        .select(col("user_id"), col("ts").cast(DateType).as("d"))
      val cohort = ev.groupBy(col("user_id"))
        .agg(min(col("d")).as("cohort_date"))
      ev.join(cohort, "user_id")
        .groupBy(col("cohort_date"),
          datediff(col("d"), col("cohort_date")).cast(LongType)
            .as("day_offset"))
        .agg(countDistinct(col("user_id")).cast(LongType).as("n_active"))
    }),

    // First-order Markov transition matrix over per-user event
    // sequences — the path-analysis operator behind "what do users do
    // next" (and the input to Markov-chain attribution). LEAD over the
    // (ts, event_id)-ordered per-user stream pairs each event with its
    // successor; one aggregate counts the (cur, next) cells, and the
    // row-conditional probability P(next|cur) normalizes by the
    // event_type-partitioned window total — one double division, exact
    // in both engines. Scale: ONE user_id shuffle for the window, then
    // the cell aggregate's map-side combine collapses the stream to
    // |event_types|^2 rows before its exchange; the normalizing window
    // runs over that tiny cell grid, not the event stream.
    "q_events_transitions" -> ((s, dir) => {
      val seq = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      graft.Tables.events(s, dir)
        .select(col("user_id"), col("event_type").as("cur_event"),
          col("ts"), col("event_id"))
        .withColumn("next_event", lead(col("cur_event"), 1).over(seq))
        .where(col("next_event").isNotNull)
        .groupBy(col("cur_event"), col("next_event"))
        .agg(cnt.as("n_transitions"))
        .withColumn("p_next", col("n_transitions").cast(DoubleType) /
          sum(col("n_transitions"))
            .over(Window.partitionBy(col("cur_event"))))
    }),

    // Ordered multi-step funnel (view -> click -> purchase): per user,
    // the earliest step-k event at or after the earliest step-(k-1)
    // completion AND within its 24 h follow-up horizon — the
    // sequence-matching operator behind "how far did each user get"
    // (the horizon is what makes the stage discriminate: unbounded,
    // every long-lived user trivially completes). Three aggregates
    // chained by user-keyed joins: every shuffle rides user_id, so at
    // 100 TB the whole cascade co-partitions after the first exchange
    // (no broadcast of user-cardinality sides, no windows).
    "q_events_funnel_stages" -> ((s, dir) => {
      val step = expr("INTERVAL 24 HOURS")
      val ev = graft.Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"))
      val s1 = ev.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val s2 = ev.where(col("event_type") === "click")
        .join(s1, "user_id")
        .where(col("ts") >= col("t1") && col("ts") <= col("t1") + step)
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val s3 = ev.where(col("event_type") === "purchase")
        .join(s2, "user_id")
        .where(col("ts") >= col("t2") && col("ts") <= col("t2") + step)
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      s1.join(s2, Seq("user_id"), "left")
        .join(s3, Seq("user_id"), "left")
        .select(col("user_id"), col("t1"), col("t2"), col("t3"),
          (lit(1L) + col("t2").isNotNull.cast(LongType)
            + col("t3").isNotNull.cast(LongType)).as("stage"))
    }),

    // Top-k session paths (sequence mining): each user's first 5 events
    // in (ts, event_id) order collapse to one '>'-joined path string;
    // the 20 most common paths (ties broken by path) are the behavioral
    // fingerprint report q_events_transitions's first-order matrix
    // can't express (it forgets everything before the previous step).
    // Scale discipline: the per-user prefix is cut BEFORE collection —
    // a row_number window on the user-keyed shuffle keeps only rank
    // <= 5, so the collect_list state is bounded at 5 elements per user
    // regardless of user activity skew; array_sort on the (rn, event)
    // structs makes the collected order deterministic (collect_list
    // order is not); the final top-20 is TakeOrderedAndProject (per-
    // partition heaps, no global sort).
    "q_events_top_paths" -> ((s, dir) => {
      val wU = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      graft.Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("rn", row_number().over(wU))
        .where(col("rn") <= 5)
        .groupBy(col("user_id"))
        .agg(array_sort(collect_list(struct(col("rn"), col("event_type"))))
          .as("a"))
        .select(concat_ws(">", expr("transform(a, x -> x.event_type)"))
          .as("path"))
        .groupBy(col("path")).agg(cnt.as("n_users"))
        .orderBy(col("n_users").desc, col("path"))
        .limit(20)
    }),

    // Time-grid densification + forward fill (gap-fill) — the resample
    // operator every metric/feature pipeline needs before a model sees
    // the series: hourly per-type totals on a COMPLETE hour grid, an
    // absent hour carrying the last observed value with an explicit
    // filled flag (a silent carry would be indistinguishable from a
    // real observation downstream; hours before a type's first
    // observation stay NULL rather than inventing a zero). Cross-
    // engine float discipline: per-row cents quantization
    // (FLOOR(value*100) — floor of an IEEE-identical product, never a
    // round-vs-truncate cast) makes the hourly SUM order-free integer
    // arithmetic; hour ids are epoch-hour longs (the q_events_anomaly
    // convention). Scale: one (type, hour) aggregate over the stream;
    // the grid is |types| x |hours| — generated from a broadcast 1-row
    // bounds frame, NEVER by exploding per event — and the forward-
    // fill window runs over that bounded grid, not the event stream.
    "q_events_gapfill" -> ((s, dir) =>
      gapfillOf(hourlyCents(graft.Tables.events(s, dir)))))

  /** ONE cell definition for the gap-fill family — the batch row, the
    * streaming ingest (StreamingJobs.gapfillCellSink) and its read
    * view all aggregate through this builder so the three faces cannot
    * drift: (event_type, hour_id, cents), hour ids on the epoch-hour
    * lattice, cents quantized per row BEFORE the sum so the aggregate
    * is order-free integer arithmetic (micro-batch partials merge by a
    * further SUM without a float in sight).
    */
  /** ONE epoch-hour bucket definition for every hour-keyed event row
    * (gap-fill cells, anomaly counts) and its oracles: FLOOR division
    * of event micros. Spark's `div` AND DuckDB's `//` BOTH truncate
    * toward zero (verified on the oracle engine), so BOTH sides carry
    * the same negative-remainder correction — otherwise a pre-1970
    * timestamp lands in a different hour bucket per engine, and floor
    * is the right semantics anyway (Spark's window() floor-aligns, so
    * the streaming faces agree by construction).
    */
  private[graft] val epochHourCol =
    expr("(unix_micros(ts) div 3600000000) - " +
      "(case when unix_micros(ts) % 3600000000 < 0 then 1 else 0 end)")

  /** [[epochHourCol]]'s DuckDB mirror (epoch_us + the same floor
    * correction — `//` truncates there too).
    */
  private val epochHourSql =
    """CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000
         - CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) % 3600000000 < 0
                THEN 1 ELSE 0 END AS BIGINT)"""

  private[graft] def hourlyCents(ev: DataFrame): DataFrame =
    ev.groupBy(col("event_type"), epochHourCol.as("hour_id"))
      .agg(sum(expr("CAST(FLOOR(value * 100) AS BIGINT)")).as("cents"))

  /** ONE fill definition over (event_type, hour_id, cents) cells: the
    * complete per-type hour grid between the observed bounds, observed
    * cells carrying their own value, gap cells carrying the last
    * observed value with filled=true, leading gaps staying NULL. The
    * grid builds from a broadcast 1-row bounds frame (never a
    * per-event explode) and the forward-fill window runs over the
    * bounded |types| x |hours| grid, not the event stream.
    */
  private[graft] def gapfillOf(cells: DataFrame): DataFrame = {
    val bounds = cells.agg(
      min(col("hour_id")).as("lo"), max(col("hour_id")).as("hi"))
    val grid = cells.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds)) // 1-row, aggregate-reduced
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"))).as("hour_id"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(cells, Seq("event_type", "hour_id"), "left")
      .select(col("event_type"), col("hour_id"),
        last(col("cents"), ignoreNulls = true).over(w)
          .as("cents_filled"),
        col("cents").isNull.as("filled"))
  }

  val oracleSql: Map[String, String] = Map(
    "q_events_gapfill" ->
      s"""WITH hourly AS (
           SELECT event_type,
                  $epochHourSql AS hour_id,
                  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
                    AS cents
           FROM events GROUP BY 1, 2),
         b AS (SELECT MIN(hour_id) AS lo, MAX(hour_id) AS hi FROM hourly),
         g AS (SELECT t.event_type, u.hr AS hour_id
               FROM (SELECT DISTINCT event_type FROM events) t
               CROSS JOIN b
               CROSS JOIN UNNEST(generate_series(b.lo, b.hi)) AS u(hr))
         SELECT g.event_type, g.hour_id,
                last_value(h.cents IGNORE NULLS) OVER (
                  PARTITION BY g.event_type ORDER BY g.hour_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS cents_filled,
                h.cents IS NULL AS filled
         FROM g LEFT JOIN hourly h
           ON h.event_type = g.event_type AND h.hour_id = g.hour_id""",

    "q_events_anomaly" ->
      s"""WITH h AS (
           SELECT event_type,
                  $epochHourSql AS hour_id,
                  COUNT(*) AS c
           FROM events GROUP BY 1, 2),
         st AS (SELECT event_type, COUNT(*) AS n, SUM(c) AS s,
                       SUM(c*c) AS q
                FROM h GROUP BY 1)
         SELECT h.event_type, hour_id, CAST(c AS BIGINT) AS n_events
         FROM h JOIN st USING (event_type)
         WHERE CAST(c AS DECIMAL(38,0)) * n - s > 0
           AND (CAST(c AS DECIMAL(38,0)) * n - s)
               * (CAST(c AS DECIMAL(38,0)) * n - s)
               > 9 * (CAST(n AS DECIMAL(38,0)) * q
                      - CAST(s AS DECIMAL(38,0)) * s)""",
    "q_events_tumbling_daily" ->
      """SELECT CAST(ts AS DATE) AS day, event_type,
                COUNT(*) AS n_events,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
                CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
         FROM events GROUP BY CAST(ts AS DATE), event_type""",
    "q_events_sliding_daily" ->
      """WITH ev AS (
           SELECT event_type, value, CAST(ts AS TIMESTAMP) AS ts FROM events),
         wins AS (
           -- slide 12h, width 24h: every event belongs to exactly the
           -- two epoch-aligned starts bucket(ts) and bucket(ts) - 12h
           SELECT event_type, value,
                  time_bucket(INTERVAL 12 HOUR, ts)
                    - CAST(k AS INT) * INTERVAL 12 HOUR AS window_start
           FROM ev, range(2) t(k))
         SELECT window_start, event_type,
                COUNT(*) AS n_events,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM wins GROUP BY window_start, event_type""",
    "q_events_json_extract" ->
      """WITH ev AS (
           SELECT event_type,
                  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
           FROM events)
         SELECT event_type, COUNT(*) AS n_events,
                CAST(SUM(k) AS BIGINT) AS sum_k,
                CAST(COUNT(CASE WHEN k > 50 THEN 1 END) AS BIGINT) AS n_high,
                CAST(SUM(k) AS DOUBLE) / COUNT(k) AS mean_k
         FROM ev GROUP BY event_type""",
    "q_events_sessionize" ->
      """WITH ev AS (
           -- truncate TIMESTAMP_NS to micros to match Spark's read
           -- (Tables.events: nanosAsLong + integer div), so a session
           -- boundary tie at exactly 30min can't flip on sub-us digits
           SELECT event_id, user_id, value, CAST(ts AS TIMESTAMP) AS ts
           FROM events),
         marked AS (
           SELECT user_id, value,
                  CASE WHEN prev_ts IS NULL
                         OR ts > prev_ts + INTERVAL 30 MINUTE
                       THEN 1 ELSE 0 END AS new_session,
                  ts, event_id
           FROM (SELECT *, LAG(ts) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS prev_ts FROM ev)),
         sessions AS (
           SELECT user_id, value,
                  SUM(new_session) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
           FROM marked)
         SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                COUNT(*) AS n_events,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
         FROM sessions GROUP BY user_id, session_seq""",
    "q_events_retention" ->
      """WITH ev AS (
           SELECT user_id, CAST(ts AS DATE) AS d FROM events),
         cohort AS (
           SELECT user_id, MIN(d) AS cohort_date FROM ev GROUP BY user_id)
         SELECT cohort_date,
                CAST(datediff('day', cohort_date, d) AS BIGINT) AS day_offset,
                CAST(COUNT(DISTINCT ev.user_id) AS BIGINT) AS n_active
         FROM ev JOIN cohort USING (user_id)
         GROUP BY cohort_date, day_offset""",
    "q_events_transitions" ->
      """WITH seq AS (
           SELECT user_id, event_type AS cur_event,
                  LEAD(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS next_event
           FROM events)
         SELECT cur_event, next_event,
                COUNT(*) AS n_transitions,
                CAST(COUNT(*) AS DOUBLE)
                  / SUM(COUNT(*)) OVER (PARTITION BY cur_event) AS p_next
         FROM seq WHERE next_event IS NOT NULL
         GROUP BY cur_event, next_event""",
    "q_events_top_paths" ->
      """WITH r AS (
           SELECT user_id, event_type,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn
           FROM events),
         p AS (
           SELECT user_id,
                  string_agg(event_type, '>' ORDER BY rn) AS path
           FROM r WHERE rn <= 5 GROUP BY user_id)
         SELECT path, COUNT(*) AS n_users
         FROM p GROUP BY path
         ORDER BY n_users DESC, path
         LIMIT 20""",
    "q_events_funnel_stages" ->
      """WITH ev AS (
           SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
           FROM events),
         s1 AS (
           SELECT user_id, MIN(ts) AS t1 FROM ev
           WHERE event_type = 'view' GROUP BY user_id),
         s2 AS (
           SELECT e.user_id, MIN(e.ts) AS t2
           FROM ev e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'click' AND e.ts >= s1.t1
             AND e.ts <= s1.t1 + INTERVAL 24 HOUR
           GROUP BY e.user_id),
         s3 AS (
           SELECT e.user_id, MIN(e.ts) AS t3
           FROM ev e JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
             AND e.ts <= s2.t2 + INTERVAL 24 HOUR
           GROUP BY e.user_id)
         SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
                CAST(1 + CAST(s2.user_id IS NOT NULL AS INT)
                       + CAST(s3.user_id IS NOT NULL AS INT) AS BIGINT)
                  AS stage
         FROM s1
         LEFT JOIN s2 ON s1.user_id = s2.user_id
         LEFT JOIN s3 ON s1.user_id = s3.user_id""")
}
