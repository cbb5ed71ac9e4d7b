package graft

import graft.sources.ExcelScan
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** ExcelScan.readXlsxMany: executor-side parse of a directory of
  * workbooks (binaryFile → mapPartitions StAX), per-file lineage, and
  * the loud header contract — a workbook with a drifted header fails
  * naming the file instead of aligning columns by position.
  */
class ExcelManySpec extends AnyFunSuite with SparkTestBase {

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("graft_xlsx_many").toString

  test("reads every workbook with lineage; sparse cells align") {
    val d = tmpDir()
    ExcelScan.writeXlsx(Seq(
      Seq[Any]("id", "name", "qty"),
      Seq[Any](1, "alpha", 10),
      Seq[Any](2, null, 20)), s"$d/a.xlsx")
    ExcelScan.writeXlsx(Seq(
      Seq[Any]("id", "name", "qty"),
      Seq[Any](3, "gamma", 30)), s"$d/b.xlsx")
    val got = ExcelScan.readXlsxMany(spark, s"$d/*.xlsx",
        Seq("id", "name", "qty"))
      .collect().map(r => (r.getString(1), Option(r.getString(2)),
        r.getString(3), r.getString(0).contains("a.xlsx")))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      ("1", Some("alpha"), "10", true),
      ("2", None, "20", true),
      ("3", Some("gamma"), "30", false)))
  }

  test("header drift fails loudly, naming the offending file") {
    val d = tmpDir()
    ExcelScan.writeXlsx(Seq(
      Seq[Any]("id", "name", "qty"),
      Seq[Any](1, "alpha", 10)), s"$d/good.xlsx")
    ExcelScan.writeXlsx(Seq(
      Seq[Any]("id", "label", "qty"), // renamed column
      Seq[Any](2, "beta", 20)), s"$d/drifted.xlsx")
    val e = intercept[Exception] {
      ExcelScan.readXlsxMany(spark, s"$d/*.xlsx",
        Seq("id", "name", "qty")).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => String.valueOf(t.getMessage)).toSeq
    assert(msgs.exists(m => m.contains("header mismatch")
      && m.contains("drifted.xlsx")), msgs.mkString(" | "))
  }

  test("a data row wider than the header fails loudly, naming file and row") {
    val d = tmpDir()
    ExcelScan.writeXlsx(Seq(
      Seq[Any]("id", "name", "qty"),
      Seq[Any](1, "alpha", 10),
      Seq[Any](2, "beta", 20, "EXTRA")), s"$d/wide.xlsx") // appended column
    val e = intercept[Exception] {
      ExcelScan.readXlsxMany(spark, s"$d/*.xlsx",
        Seq("id", "name", "qty")).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => String.valueOf(t.getMessage)).toSeq
    assert(msgs.exists(m => m.contains("wide.xlsx") && m.contains("row 3")
      && m.contains("4 cells")), msgs.mkString(" | "))
  }
}
