package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-contract validation + mapping application — the engine's
  * front-door gate (U2 set diff, F17 identifier canonicalization, F18
  * batch-id extraction, P1 projection/rename, P2 smart id-cast).
  *
  * The reference declares the expected schema per logical source file in
  * tools.column_mapping and fails a file when the normalized column-name
  * SETS differ in either direction (scripts/validate_mapping.py:480-555);
  * loading then renames source→target and applies a name-heuristic cast
  * (scripts/load_to_bronze.py:246-262,527-560).
  */
object MappingValidator {

  /** F17: identifier canonicalization (validate_mapping.py:50-58):
    * trim, lowercase, spaces/dashes → underscores.
    */
  def normalizeIdent(name: String): String =
    name.trim.toLowerCase.replace(" ", "_").replace("-", "_")

  /** F18: batch-id extraction from a landed filename
    * (convert_to_parquet.py:82-84).
    */
  private val BatchRe = raw"(BATCH\d{6})".r
  def batchIdOf(fileName: String): Option[String] =
    BatchRe.findFirstIn(fileName)

  /** One tools.column_mapping row: rename source→target and cast to the
    * declared bronze type.
    */
  final case class ColumnMapping(sourceColumn: String, targetColumn: String,
                                 targetType: DataType)

  sealed trait MappingResult
  case object MappingOk extends MappingResult
  final case class MappingMismatch(missing: Set[String], extra: Set[String])
      extends MappingResult {
    override def toString =
      s"missing=${missing.toSeq.sorted.mkString(",")} extra=${extra.toSeq.sorted.mkString(",")}"
  }

  /** U2: normalized set-equality of observed vs declared columns — both
    * missing AND extra columns are failures (validate_mapping.py:483-490).
    */
  def validate(observed: StructType, declared: Seq[ColumnMapping]): MappingResult = {
    val obs = observed.fieldNames.map(normalizeIdent).toSet
    val dec = declared.map(m => normalizeIdent(m.sourceColumn)).toSet
    val missing = dec -- obs
    val extra = obs -- dec
    if (missing.isEmpty && extra.isEmpty) MappingOk
    else MappingMismatch(missing, extra)
  }

  /** P2: the reference's "smart id-cast" name heuristic
    * (load_to_bronze.py:246-262): `id`, `*_id`, `id_*`, or one letter + id.
    */
  def isIdColumn(name: String): Boolean = {
    val n = normalizeIdent(name)
    n == "id" || n.endsWith("_id") || n.startsWith("id_") ||
      n.matches("^[a-z]?id$")
  }

  /** P1 + P2: build the typed bronze projection. Id-named columns headed
    * for an integral type go through round(double) first — the
    * pandas-null-promotion repair (load_to_bronze.py:533-553).
    */
  def applyMapping(df: DataFrame, mappings: Seq[ColumnMapping]): DataFrame = {
    val byNorm = df.columns.map(c => normalizeIdent(c) -> c).toMap
    df.select(mappings.map { m =>
      val src = col(byNorm(normalizeIdent(m.sourceColumn)))
      val casted: Column = m.targetType match {
        case LongType | IntegerType if isIdColumn(m.targetColumn) =>
          round(src.cast(DoubleType)).cast(m.targetType)
        case t => src.cast(t)
      }
      casted.as(m.targetColumn)
    }: _*)
  }
}
