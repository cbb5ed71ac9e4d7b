package graft.queries

import graft.Tables.t
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental MERGE semantics as pure queries — the batch face of the
  * warehouse upsert the reference rebuilds wholesale each run (its
  * silver/gold loads are full TRUNCATE+INSERT; production at 100 TB
  * applies a change batch instead). Ref: tools.load_crm_cust_info_v1.sql
  * truncates and reloads the whole dim per batch — these queries express
  * the incremental alternative over the same data model.
  *
  * Scale notes: each query is one equi-join shuffle between the dim and
  * the (much smaller) change batch; the three output branches (closed /
  * new-version / untouched) reference identical join subtrees, which
  * Catalyst dedups via ReusedExchange — the dim is shuffled ONCE, not
  * three times. No window over the whole dim, no driver loop. The
  * physical COW variant that rewrites only touched key-buckets lives in
  * run/Orchestrator.scala (mergeScd1/mergeScd2) with spec evidence that
  * untouched partitions' files are byte-identical after a merge.
  */
object MergeQueries extends QueryPack {

  /** Current dim snapshot: every customer is version 1, effective from a
    * fixed epoch. Deterministic on both engines.
    */
  private def dimV1(s: org.apache.spark.sql.SparkSession, dir: String) =
    t(s, dir, "customer").select(
      col("c_custkey").as("custkey"),
      col("c_mktsegment").as("segment"),
      to_date(lit("2026-01-01")).as("valid_from"))

  /** Change batch: every 10th customer moves to a new segment; every
    * 20th-plus-5 appears in the batch with an UNCHANGED value (a no-op
    * update the merge must NOT version — change detection is part of the
    * contract, CDC feeds routinely re-emit unchanged rows).
    */
  private def updates(s: org.apache.spark.sql.SparkSession, dir: String) =
    t(s, dir, "customer")
      .where(col("c_custkey") % 10 === 0 || col("c_custkey") % 20 === 5)
      .select(
        col("c_custkey").as("custkey"),
        when(col("c_custkey") % 20 === 5, col("c_mktsegment"))
          .otherwise(concat(col("c_mktsegment"), lit("_V2"))).as("new_segment"),
        to_date(lit("2026-06-15")).as("eff"))

  val queries: Map[String, Q] = Map(
    // SCD2 merge-apply: close the current version of each genuinely
    // changed key (valid_to = effective - 1 day, mirroring the W3
    // LEAD-1-day convention), open the new version, pass untouched and
    // no-op keys through. One dim<->updates equi-join; branches reuse it.
    "q_scd2_merge_apply" -> ((s, dir) => {
      val dim = dimV1(s, dir)
      val chg = updates(s, dir).join(dim, "custkey")
        .where(col("new_segment") =!= col("segment"))
        .select(col("custkey"), col("new_segment"), col("eff"))
      val closed = dim.join(chg, "custkey").select(
        col("custkey"), col("segment").as("mktsegment"), col("valid_from"),
        date_sub(col("eff"), 1).as("valid_to"),
        lit(false).as("is_current"))
      val opened = chg.select(
        col("custkey"), col("new_segment").as("mktsegment"),
        col("eff").as("valid_from"),
        lit(null).cast(DateType).as("valid_to"),
        lit(true).as("is_current"))
      val untouched = dim.join(chg, Seq("custkey"), "left_anti").select(
        col("custkey"), col("segment").as("mktsegment"), col("valid_from"),
        lit(null).cast(DateType).as("valid_to"),
        lit(true).as("is_current"))
      closed.unionByName(opened).unionByName(untouched)
    }),

    // SCD1 merge-apply (upsert, keep-latest): same change batch, but
    // history is overwritten in place — changed keys carry the new value
    // and a bumped version counter; no-op and untouched keys stay at
    // version 1. The `version` column is what makes the no-op contract
    // observable in the hash compare.
    "q_scd1_merge_apply" -> ((s, dir) => {
      val dim = dimV1(s, dir).drop("valid_from")
      val chg = updates(s, dir).join(dim, "custkey")
        .where(col("new_segment") =!= col("segment"))
        .select(col("custkey"), col("new_segment"))
      dim.join(chg, Seq("custkey"), "left").select(
        col("custkey"),
        coalesce(col("new_segment"), col("segment")).as("segment"),
        when(col("new_segment").isNotNull, lit(2L)).otherwise(lit(1L))
          .as("version"))
    }))

  val oracleSql: Map[String, String] = Map(
    "q_scd2_merge_apply" ->
      """WITH dim AS (
           SELECT c_custkey AS custkey, c_mktsegment AS segment,
                  DATE '2026-01-01' AS valid_from
           FROM customer),
         upd AS (
           SELECT c_custkey AS custkey,
                  CASE WHEN c_custkey % 20 = 5 THEN c_mktsegment
                       ELSE c_mktsegment || '_V2' END AS new_segment,
                  DATE '2026-06-15' AS eff
           FROM customer
           WHERE c_custkey % 10 = 0 OR c_custkey % 20 = 5),
         chg AS (
           SELECT u.custkey, u.new_segment, u.eff
           FROM upd u JOIN dim d ON u.custkey = d.custkey
           WHERE u.new_segment <> d.segment)
         SELECT d.custkey, d.segment AS mktsegment, d.valid_from,
                CAST(c.eff - INTERVAL 1 DAY AS DATE) AS valid_to,
                FALSE AS is_current
         FROM dim d JOIN chg c ON d.custkey = c.custkey
         UNION ALL
         SELECT custkey, new_segment AS mktsegment, eff AS valid_from,
                CAST(NULL AS DATE) AS valid_to, TRUE AS is_current
         FROM chg
         UNION ALL
         SELECT d.custkey, d.segment AS mktsegment, d.valid_from,
                CAST(NULL AS DATE) AS valid_to, TRUE AS is_current
         FROM dim d
         WHERE NOT EXISTS (SELECT 1 FROM chg c WHERE c.custkey = d.custkey)""",
    "q_scd1_merge_apply" ->
      """WITH dim AS (
           SELECT c_custkey AS custkey, c_mktsegment AS segment
           FROM customer),
         upd AS (
           SELECT c_custkey AS custkey,
                  CASE WHEN c_custkey % 20 = 5 THEN c_mktsegment
                       ELSE c_mktsegment || '_V2' END AS new_segment
           FROM customer
           WHERE c_custkey % 10 = 0 OR c_custkey % 20 = 5),
         chg AS (
           SELECT u.custkey, u.new_segment
           FROM upd u JOIN dim d ON u.custkey = d.custkey
           WHERE u.new_segment <> d.segment)
         SELECT d.custkey,
                COALESCE(c.new_segment, d.segment) AS segment,
                CAST(CASE WHEN c.new_segment IS NOT NULL THEN 2 ELSE 1 END
                  AS BIGINT) AS version
         FROM dim d LEFT JOIN chg c ON d.custkey = c.custkey""")
}
