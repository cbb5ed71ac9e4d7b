package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Required-column QA: per-column null/blank/NaN counts plus a
  * normalized-key duplicate count — the reference's row validation gate
  * (scripts/validate_row.py:397-481), collapsed from its N+1 separate
  * DuckDB scans into ONE distributed aggregate pass (SURVEY §4).
  */
object RowValidator {

  final case class RowReport(totalRows: Long, nullCounts: Map[String, Long],
                             duplicateRows: Long) {
    def passed: Boolean = duplicateRows == 0 && nullCounts.values.forall(_ == 0)
  }

  /** Null/blank/NaN detector (validate_row.py:168-169). The `c <> c`
    * NaN idiom is NOT portable to Spark (whose NaN = NaN is true), so
    * numeric columns use isnan explicitly.
    */
  def nullish(df: DataFrame, c: String): Column = {
    val base = col(c).isNull || trim(col(c).cast(StringType)) === ""
    df.schema(c).dataType match {
      case DoubleType | FloatType => base || isnan(col(c))
      case _ => base
    }
  }

  /** Normalized composite dup key (validate_row.py:172-173):
    * per-column COALESCE(NULLIF(LOWER(TRIM(CAST(c AS VARCHAR))),''),'<NULL>')
    * joined with a unit separator.
    */
  def dupKey(cols: Seq[String]): Column =
    concat_ws("", cols.map(c =>
      coalesce(nullif(lower(trim(col(c).cast(StringType))), lit("")),
        lit("<NULL>"))): _*)

  /** One pass for everything: total count, per-required-column nullish
    * counts, and count-minus-distinct duplicates (A8 + A9).
    */
  def validate(df: DataFrame, requiredCols: Seq[String]): RowReport = {
    val nullAggs = requiredCols.map(c =>
      sum(when(nullish(df, c), 1L).otherwise(0L)).as(s"n_$c"))
    val aggs = Seq(
      count(lit(1)).as("n_rows"),
      countDistinct(dupKey(requiredCols)).as("n_distinct")) ++ nullAggs
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    RowReport(
      totalRows = row.getAs[Long]("n_rows"),
      nullCounts = requiredCols
        .map(c => c -> row.getAs[Long](s"n_$c")).toMap,
      duplicateRows = row.getAs[Long]("n_rows") - row.getAs[Long]("n_distinct"))
  }
}
