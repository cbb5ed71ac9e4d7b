package graft.queries

import graft.Tables.{events, t}
import graft.Exact._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** QA predicates, ordering/limit operators, string-function batteries and
  * the scalable surrogate-key variant — the SURVEY.md §2 rows that were
  * still open after round 1: P10 (LIKE prefix), P11 (validity ranges),
  * the NaN-aware null detector (P9), O1/O3 (ordered output, deterministic
  * LIMIT-1 pick), F3/F5/F6 (REPLACE/LENGTH/concat), and the partitioned
  * W2 surrogate-key assignment for the 100 TB path.
  */
object QaQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // Whole-table column profiler — the ANALYZE TABLE face every
    // warehouse needs before trusting a new feed: per column, row/
    // filled/null counts, EXACT distinct cardinality, and min/max.
    // Shape: melt to (col_name, val) via one stack projection (k x
    // rows, map-side only — never k table scans), then ONE two-phase
    // distinct aggregate keyed by col_name; the distinct phase's key
    // space is Σ per-column NDV, so the shuffle is cardinality-sized,
    // not corpus-sized. Cross-engine string discipline: values profile
    // as strings (min/max are lexicographic BY CONTRACT — a profile
    // compares feeds, not arithmetic), longs/dates stringify
    // identically everywhere, and the money double goes through
    // DECIMAL(12,2) first because raw double stringification is the
    // one cast the engines render differently.
    "q_profile_table" -> ((s, dir) => {
      // spread the unsplittable small scan (guide §2.5): the stack(6)
      // fan-out + casts serialized 1.5 s of CPU on ONE task at sf0.1
      graft.Tables.tSpread(s, dir, "orders", "o_orderkey").select(expr(
        """stack(6,
             'o_orderkey',     CAST(o_orderkey AS STRING),
             'o_custkey',      CAST(o_custkey AS STRING),
             'o_orderstatus',  o_orderstatus,
             'o_orderpriority', o_orderpriority,
             'o_orderdate',    CAST(CAST(o_orderdate AS DATE) AS STRING),
             'o_totalprice',   CAST(CAST(o_totalprice AS DECIMAL(12,2))
                                    AS STRING)
           ) AS (col_name, val)"""))
        .groupBy(col("col_name"))
        .agg(cnt.as("n_rows"),
          count(col("val")).cast(LongType).as("n_filled"),
          countDistinct(col("val")).cast(LongType).as("n_distinct"),
          min(col("val")).as("min_str"),
          max(col("val")).as("max_str"))
        .withColumn("n_null", col("n_rows") - col("n_filled"))
    }),

    // P10 + F3/F4/F5/F6: LIKE-prefix filter with prefix strip, dash
    // removal, length and concat — the erp_cust_az12 'NAS%' shape.
    // Ref: tools.load_erp_cust_az12_v1.sql:72-75, tools.load_erp_loc_a101_v1.sql:71
    "q_like_prefix_strip" -> ((s, dir) => {
      t(s, dir, "part")
        .where(col("p_type").like("PROMO%"))
        .select(
          col("p_partkey"),
          col("p_type"),
          substring(col("p_type"), 7, 60).as("type_rest"),
          regexp_replace(col("p_type"), " ", "_").as("type_key"),
          length(col("p_type")).cast(LongType).as("type_len"),
          concat(col("p_brand"), lit(" / "), col("p_type")).as("brand_type"))
    }),

    // P11: validity-range QA probes as a single-pass one-row summary
    // (date window, receipt-before-ship, non-positive qty/price).
    // Ref: Methods_crm_sales_details.sql:96-132, Methods_erp_cust_az12.sql:38-44
    "q_validity_ranges" -> ((s, dir) => {
      def bad(c: org.apache.spark.sql.Column) =
        sum(when(c, 1).otherwise(0)).cast(LongType)
      t(s, dir, "lineitem").agg(
        bad(col("l_shipdate") < lit("1992-01-01").cast("timestamp")
          || col("l_shipdate") > lit("1998-12-31").cast("timestamp"))
          .as("ship_out_of_range"),
        bad(col("l_quantity") <= 0).as("nonpositive_qty"),
        bad(col("l_extendedprice") <= 0).as("nonpositive_price"),
        bad(col("l_discount") < 0 || col("l_discount") > 1).as("discount_out_of_range"),
        bad(col("l_tax") < 0).as("negative_tax"),
        cnt.as("n_rows"))
    }),

    // Cross-table pairing QA: every document should carry exactly one
    // embedding and vice versa — the text↔vector alignment invariant a
    // multimodal/retrieval pipeline silently corrupts when one side is
    // re-keyed or partially reprocessed. Two anti-join counts + totals
    // in one row; anti joins are key-shuffle class, no row explosion.
    "q_qa_embedding_coverage" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val vecs = t(s, dir, "embeddings").select(col("vec_id"))
      val docsOnly = docs.join(vecs, col("doc_id") === col("vec_id"),
        "left_anti").agg(cnt.as("n")).select(col("n"))
      val vecsOnly = vecs.join(docs, col("vec_id") === col("doc_id"),
        "left_anti").agg(cnt.as("n")).select(col("n"))
      docs.agg(cnt.as("n_docs"))
        .crossJoin(vecs.agg(cnt.as("n_vecs")))          // 1-row frames:
        .crossJoin(docsOnly.withColumnRenamed("n", "docs_without_vec"))
        .crossJoin(vecsOnly.withColumnRenamed("n", "vecs_without_doc"))
        .withColumn("aligned",
          col("docs_without_vec") === 0 && col("vecs_without_doc") === 0)
    }),

    // P9 (full): NaN-aware null/blank detector — the reference's
    // `c <> c` NaN check (Spark: isnan; `c =!= c` is NOT a NaN test in
    // Spark, whose NaN = NaN evaluates true).
    // Ref: scripts/validate_row.py:168-169
    "q_null_nan_profile" -> ((s, dir) => {
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          sum(when(col("props").isNull
            || trim(col("props").cast(StringType)) === "", 1).otherwise(0))
            .cast(LongType).as("props_blank"),
          sum(when(col("value").isNull || isnan(col("value")), 1).otherwise(0))
            .cast(LongType).as("value_null_or_nan"),
          cnt.as("n_rows"))
    }),

    // O1 + O2: globally ordered top-N presentation query. Spark plans
    // this as TakeOrderedAndProject (per-partition top-N + merge), not a
    // full global sort — the scalable shape.
    // Ref: exploratory_data_analysis.sql:13,26,43
    "q_ordered_topn" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderdate").cast(DateType).as("o_orderdate"))
    }),

    // O3: deterministic single-row pick (latest-audit-row shape).
    // Ref: handlers/batch_processing.py:559-567
    "q_limit_pick" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_orderdate").desc_nulls_last,
          col("o_orderkey").desc)
        .limit(1)
        .select(col("o_orderkey"),
          col("o_orderdate").cast(DateType).as("o_orderdate"),
          col("o_totalprice"))
    }),

    // Skew remedy: salted join — result must equal the plain join (the
    // oracle is the unsalted form), proving salting changes the shuffle
    // layout, never the semantics.
    // Ref: SURVEY §7 scale notes; skew-salting per the driver brief
    "q_join_salted_skew" -> ((s, dir) => {
      graft.operators.SkewJoin.saltedInnerJoin(
        t(s, dir, "lineitem"), t(s, dir, "part"),
        col("l_partkey"), col("p_partkey"),
        col("l_orderkey"), salts = 8)
        .groupBy(col("p_brand"))
        .agg(dsum(col("l_extendedprice")).as("revenue"), cnt.as("n_items"))
    }),

    // W2 at scale: surrogate keys with NO single-partition window — per-
    // partition ROW_NUMBER (partitioned by nation) plus an exclusive
    // running offset computed over the tiny per-partition count table.
    // Equals ROW_NUMBER() OVER (ORDER BY c_nationkey, c_custkey) but the
    // only unpartitioned window runs over ~#partitions rows. The bucket
    // rides a synthetic `__`-prefixed alias — the PlanLint convention
    // marking a provably bounded grouping key (one row per bucket enters
    // the single-partition offsets window).
    // Ref: Integration_dim_customers.sql:2-5; SURVEY §7.3
    "q_surrogate_key_scalable" -> ((s, dir) => {
      val cust = t(s, dir, "customer").withColumn("__bucket", col("c_nationkey"))
      val wPart = Window.partitionBy(col("__bucket")).orderBy(col("c_custkey"))
      val counts = cust.groupBy(col("__bucket")).agg(cnt.as("n"))
      val wOff = Window.orderBy(col("__bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = counts
        .withColumn("off", coalesce(sum(col("n")).over(wOff), lit(0L)))
        .select(col("__bucket"), col("off"))
      cust.join(broadcast(offsets), "__bucket")
        .select(
          (col("off") + row_number().over(wPart)).cast(LongType)
            .as("customer_key"),
          col("c_custkey"), col("c_nationkey"))
    }))

  val oracleSql: Map[String, String] = Map(
    "q_profile_table" ->
      """WITH m AS (
           SELECT 'o_orderkey' AS col_name,
                  CAST(o_orderkey AS VARCHAR) AS val FROM orders
           UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR)
           FROM orders
           UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
           UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders
           UNION ALL SELECT 'o_orderdate',
                  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) FROM orders
           UNION ALL SELECT 'o_totalprice',
                  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR)
           FROM orders)
         SELECT col_name,
                CAST(COUNT(*) AS BIGINT) AS n_rows,
                CAST(COUNT(val) AS BIGINT) AS n_filled,
                CAST(COUNT(DISTINCT val) AS BIGINT) AS n_distinct,
                MIN(val) AS min_str,
                MAX(val) AS max_str,
                CAST(COUNT(*) - COUNT(val) AS BIGINT) AS n_null
         FROM m GROUP BY col_name""",

    "q_like_prefix_strip" ->
      """SELECT p_partkey, p_type,
                SUBSTRING(p_type, 7, 60) AS type_rest,
                REPLACE(p_type, ' ', '_') AS type_key,
                CAST(LENGTH(p_type) AS BIGINT) AS type_len,
                CONCAT(p_brand, ' / ', p_type) AS brand_type
         FROM part WHERE p_type LIKE 'PROMO%'""",
    "q_qa_embedding_coverage" ->
      """SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
                (SELECT COUNT(*) FROM embeddings) AS n_vecs,
                (SELECT COUNT(*) FROM documents d
                 WHERE NOT EXISTS (SELECT 1 FROM embeddings e
                                   WHERE e.vec_id = d.doc_id))
                  AS docs_without_vec,
                (SELECT COUNT(*) FROM embeddings e
                 WHERE NOT EXISTS (SELECT 1 FROM documents d
                                   WHERE d.doc_id = e.vec_id))
                  AS vecs_without_doc,
                (SELECT COUNT(*) FROM documents d
                 WHERE NOT EXISTS (SELECT 1 FROM embeddings e
                                   WHERE e.vec_id = d.doc_id)) = 0
                AND
                (SELECT COUNT(*) FROM embeddings e
                 WHERE NOT EXISTS (SELECT 1 FROM documents d
                                   WHERE d.doc_id = e.vec_id)) = 0
                  AS aligned""",
    "q_validity_ranges" ->
      """SELECT CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1992-01-01'
                               OR l_shipdate > TIMESTAMP '1998-12-31'
                              THEN 1 ELSE 0 END) AS BIGINT) AS ship_out_of_range,
                CAST(SUM(CASE WHEN l_quantity <= 0
                              THEN 1 ELSE 0 END) AS BIGINT) AS nonpositive_qty,
                CAST(SUM(CASE WHEN l_extendedprice <= 0
                              THEN 1 ELSE 0 END) AS BIGINT) AS nonpositive_price,
                CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1
                              THEN 1 ELSE 0 END) AS BIGINT) AS discount_out_of_range,
                CAST(SUM(CASE WHEN l_tax < 0
                              THEN 1 ELSE 0 END) AS BIGINT) AS negative_tax,
                COUNT(*) AS n_rows
         FROM lineitem""",
    "q_null_nan_profile" ->
      """SELECT event_type,
                CAST(SUM(CASE WHEN props IS NULL
                               OR TRIM(CAST(props AS VARCHAR)) = ''
                              THEN 1 ELSE 0 END) AS BIGINT) AS props_blank,
                CAST(SUM(CASE WHEN value IS NULL OR ISNAN(value)
                              THEN 1 ELSE 0 END) AS BIGINT) AS value_null_or_nan,
                COUNT(*) AS n_rows
         FROM events GROUP BY event_type""",
    "q_ordered_topn" ->
      """SELECT o_orderkey, o_totalprice, CAST(o_orderdate AS DATE) AS o_orderdate
         FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",
    "q_limit_pick" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice
         FROM orders
         ORDER BY o_orderdate DESC NULLS LAST, o_orderkey DESC LIMIT 1""",
    "q_join_salted_skew" ->
      """SELECT p_brand,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                COUNT(*) AS n_items
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand""",
    "q_surrogate_key_scalable" ->
      """WITH counts AS (
           SELECT c_nationkey, COUNT(*) AS n FROM customer GROUP BY c_nationkey),
         offsets AS (
           SELECT c_nationkey,
                  COALESCE(SUM(n) OVER (ORDER BY c_nationkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
           FROM counts)
         SELECT CAST(o.off + ROW_NUMBER() OVER (PARTITION BY c.c_nationkey
                  ORDER BY c.c_custkey) AS BIGINT) AS customer_key,
                c.c_custkey, c.c_nationkey
         FROM customer c JOIN offsets o ON c.c_nationkey = o.c_nationkey""")
}
