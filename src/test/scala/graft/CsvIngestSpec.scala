package graft

import graft.ingest.MappingValidator._
import graft.pipeline.ReferenceFixtures
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The real front door end-to-end: the raw reference CSV (with its
  * header typo and blank cells) through the Spark CSV scan + mapping
  * gate + smart id-cast must land the SAME typed bronze rows as the
  * reference's pandas→parquet conversion path (ReferenceFixtures reads
  * the converted parquet). This ties S1 + P1/P2 + U2 together against
  * real dirty data.
  */
class CsvIngestSpec extends AnyFunSuite with SparkTestBase {

  private val csvPath =
    "/root/reference/raw/client1/crm/archive/cust_info_BATCH000014.csv"

  private val mappings = Seq(
    ColumnMapping("cst_id", "cst_id", LongType),
    ColumnMapping("cst_key", "cst_key", StringType),
    ColumnMapping("cst_firstname", "cst_firstname", StringType),
    ColumnMapping("cst_lastname", "cst_lastname", StringType),
    ColumnMapping("cst_marital_status", "cst_marital_status", StringType),
    // the CSV header typo the reference maps away (ddl_bronze_client1.sql:12)
    ColumnMapping("cst_gendr", "cst_gndr", StringType),
    ColumnMapping("cst_create_date", "cst_create_date", DateType))

  test("raw CSV through the mapping gate equals the converted-parquet bronze") {
    val raw = spark.read
      .option("header", "true").option("inferSchema", "true")
      .csv(csvPath)
    assert(validate(raw.schema, mappings) === MappingOk)

    val fromCsv = applyMapping(raw, mappings)
    val fromParquet = ReferenceFixtures.crmCustInfo(spark).drop("dwh_batch_id")

    assert(fromCsv.schema === fromParquet.schema)
    assert(fromCsv.count() === 18494)
    assert(fromCsv.exceptAll(fromParquet).count() === 0)
    assert(fromParquet.exceptAll(fromCsv).count() === 0)
  }

  test("mapping gate rejects the raw header without the typo mapping") {
    val raw = spark.read.option("header", "true").csv(csvPath)
    val wrong = mappings.map(m =>
      if (m.sourceColumn == "cst_gendr") m.copy(sourceColumn = "cst_gndr") else m)
    validate(raw.schema, wrong) match {
      case MappingMismatch(missing, extra) =>
        assert(missing === Set("cst_gndr"))
        assert(extra === Set("cst_gendr"))
      case other => fail(s"expected mismatch, got $other")
    }
  }
}
