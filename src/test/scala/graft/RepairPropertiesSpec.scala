package graft

import graft.pipeline.SilverTransforms
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Date
import scala.util.Random

/** Model-based property tests for the silver repair functions: generate
  * dirty bronze rows with a seeded RNG, run the DataFrame transform
  * once, and compare every output row against a pure-Scala model of the
  * reference semantics (tools.load_crm_sales_details_v1.sql:75-115,
  * tools.load_crm_cust_info_v1.sql:79-100). This checks totality (no
  * crash on any dirt pattern) and exact rule equivalence.
  */
class RepairPropertiesSpec extends AnyFunSuite with SparkTestBase {

  private val rnd = new Random(42)

  test("sales repair matches the reference rules on 500 dirty rows") {
    val rows = (1 to 500).map { i =>
      val qty = rnd.nextInt(10) + 1
      val price: java.lang.Double = rnd.nextInt(4) match {
        case 0 => null // null price -> backfill from sales
        case 1 => -(rnd.nextInt(100) + 1).toDouble // negative -> backfill
        case _ => (rnd.nextInt(100) + 1).toDouble
      }
      val trueSales =
        if (price == null) (rnd.nextInt(500) + 1).toDouble
        else qty * math.abs(price)
      val sales: java.lang.Double = rnd.nextInt(4) match {
        case 0 => null
        case 1 => 0.0
        case 2 => trueSales + 7 // inconsistent
        case _ => trueSales
      }
      val dt: Long = rnd.nextInt(4) match {
        case 0 => 0L
        case 1 => 123L // wrong length
        case 2 => 201101L // wrong length
        case _ => 20110000L + (rnd.nextInt(12) + 1) * 100 + rnd.nextInt(28) + 1
      }
      Row(s"SO$i", s"PK-$i", i.toLong, dt, dt, dt, sales, qty.toLong, price,
        "BATCH000001")
    }
    val schema = StructType(Seq(
      StructField("sls_ord_num", StringType), StructField("sls_prd_key", StringType),
      StructField("sls_cust_id", LongType), StructField("sls_order_dt", LongType),
      StructField("sls_ship_dt", LongType), StructField("sls_due_dt", LongType),
      StructField("sls_sales", DoubleType), StructField("sls_quantity", LongType),
      StructField("sls_price", DoubleType), StructField("dwh_batch_id", StringType)))
    val bronze = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)

    val out = SilverTransforms.crmSalesDetails(bronze)
      .select("sls_ord_num", "sls_order_dt", "sls_sales", "sls_quantity", "sls_price")
      .collect().map(r => r.getString(0) -> r).toMap

    // pure-Scala model of the reference CASE logic
    def modelDate(d: Long): Option[Date] =
      if (d == 0 || d.toString.length != 8) None
      else Some(Date.valueOf(s"${d / 10000}-${"%02d".format(d / 100 % 100)}-${"%02d".format(d % 100)}"))
    // three-valued logic: a NULL price makes the != conjunct UNKNOWN, so
    // a valid positive sales value is KEPT (ELSE branch) — mirrored here
    def modelSales(s: java.lang.Double, q: Long, p: java.lang.Double): java.lang.Double =
      if (s == null || s <= 0) { if (p == null) null else q * math.abs(p) }
      else if (p != null && s.doubleValue != q * math.abs(p)) q * math.abs(p)
      else s
    def modelPrice(s: java.lang.Double, q: Long, p: java.lang.Double): java.lang.Double =
      if (p == null || p <= 0)
        if (s == null || q == 0) null else math.abs(s) / q
      else p

    rows.foreach { in =>
      val key = in.getString(0)
      val (dt, s0, q, p0) =
        (in.getLong(3), in.getAs[java.lang.Double](6), in.getLong(7),
          in.getAs[java.lang.Double](8))
      val got = out(key)
      assert(Option(got.getDate(1)) === modelDate(dt), s"$key date")
      assert(got.getAs[java.lang.Double]("sls_sales") === modelSales(s0, q, p0), s"$key sales")
      assert(got.getAs[java.lang.Double]("sls_price") === modelPrice(s0, q, p0), s"$key price")
    }
  }

  test("enum decode + year clamp match the reference rules") {
    val maritals = Seq("M", "S", " m ", "s  ", "", null, "X", "married")
    val genders = Seq("F", "M", " f", "m ", "", null, "Z")
    val dates = Seq("2020-05-05", "2026-03-09", "2030-12-31", null)
    val rows = for {
      (m, i) <- maritals.zipWithIndex
      (g, j) <- genders.zipWithIndex
      (d, k) <- dates.zipWithIndex
    } yield Row((i * 100 + j * 10 + k).toLong, s"K$i$j$k", "fn", "ln", m, g,
      if (d == null) null else Date.valueOf(d), "BATCH000001")
    val schema = StructType(Seq(
      StructField("cst_id", LongType), StructField("cst_key", StringType),
      StructField("cst_firstname", StringType), StructField("cst_lastname", StringType),
      StructField("cst_marital_status", StringType), StructField("cst_gndr", StringType),
      StructField("cst_create_date", DateType), StructField("dwh_batch_id", StringType)))
    val bronze = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

    val out = SilverTransforms.crmCustInfo(bronze, "2025-09-12")
      .select("cst_id", "cst_marital_status", "cst_gndr", "cst_create_date")
      .collect().map(r => r.getLong(0) -> r).toMap

    def dec(v: String, m: Map[String, String]): String =
      Option(v).map(_.trim.toUpperCase).flatMap(m.get).getOrElse("Unknown")
    rows.foreach { in =>
      val got = out(in.getLong(0))
      assert(got.getString(1) === dec(in.getString(4), Map("M" -> "Married", "S" -> "Single")))
      assert(got.getString(2) === dec(in.getString(5), Map("F" -> "Female", "M" -> "Male")))
      val d = in.getAs[Date](6)
      val expected =
        if (d == null) null
        else if (d.toLocalDate.getYear > 2025)
          Date.valueOf(d.toLocalDate.withYear(2025))
        else d
      assert(got.getAs[Date](3) === expected)
    }
  }
}
