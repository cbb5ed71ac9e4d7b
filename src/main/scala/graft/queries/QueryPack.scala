package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One pack per SURVEY.md §2 operator family. Each named query has a
  * Spark implementation and (where SQL-expressible) a DuckDB oracle over
  * the same parquet tables; column names/types are aligned on both sides
  * so the driver's sorted-column hash compare succeeds.
  */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracleSql: Map[String, String]
}
