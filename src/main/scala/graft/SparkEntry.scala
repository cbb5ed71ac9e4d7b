package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are organized into packs, one per SURVEY.md §2 operator
  * family; each pack pairs the Spark implementation with a DuckDB oracle
  * over the same parquet tables.
  */
object SparkEntry {
  private val packs: Seq[QueryPack] = Seq(
    CoreQueries,
    AggQueries,
    WindowQueries,
    RecursiveQueries,
    EventQueries,
    TextQueries,
    SimQueries,
    IoQueries,
    QaQueries,
    GraphQueries,
    MergeQueries,
    PipelineQueries,
    MultimodalQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AggQueries.queries("q_agg_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracleSql).toMap
}
