package graft.queries

import graft.Tables.t
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline over `documents`: text → opaque binary
  * payload column (+ metadata) → per-partition decode-stub feature
  * extraction (graft.multimodal.Multimodal). The oracle recomputes the
  * same deterministic features from the md5 hex digest in SQL, so the
  * whole binary round-trip (unhex → bytes → stats) is value-checked.
  */
object MultimodalQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    "q_multimodal_features" -> ((s, dir) =>
      Multimodal.documentFeatures(s,
        t(s, dir, "documents")
          .select(col("doc_id"), coalesce(col("text"), lit("")).as("text")))))

  val oracleSql: Map[String, String] = Map(
    "q_multimodal_features" ->
      """WITH hexed AS (
           SELECT doc_id, md5(COALESCE(text, '')) AS h FROM documents),
         summed AS (
           SELECT doc_id, h,
                  CAST(list_sum(list_transform(range(16),
                    i -> CAST(CONCAT('0x', SUBSTRING(h, CAST(2*i+1 AS INT), 2))
                         AS BIGINT))) AS BIGINT) AS byte_sum
           FROM hexed)
         SELECT doc_id,
                CASE WHEN doc_id % 3 = 0 THEN 'image'
                     WHEN doc_id % 3 = 1 THEN 'audio'
                     ELSE 'video' END AS kind,
                CAST(16 AS BIGINT) AS n_bytes,
                CAST(CONCAT('0x', SUBSTRING(h, 1, 2)) AS BIGINT) AS first_byte,
                byte_sum,
                CAST(byte_sum AS DOUBLE) / 16 AS mean_byte
         FROM summed""")
}
