package graft

import graft.pipeline.GoldViews
import graft.run.MvIncremental
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic equivalence of the incremental MV maintenance: for EVERY
  * spec, (union of per-batch partials) |> rebuild must equal the full
  * GoldViews computation over the union of batches — on a synthetic
  * multi-batch plane built to be adversarial where the fixture is not:
  *
  *  - order numbers REPEAT across batches for the same customer (the
  *    cross-batch COUNT(DISTINCT) trap that per-batch distinct counts
  *    would double-count);
  *  - surrogate keys are PER-BATCH (the same natural customer gets a
  *    different customer_key in every batch, like the reference's
  *    delete-then-insert renumbering);
  *  - some order dates are NULL (the asc_nulls_last window edge);
  *  - batch sizes are uneven and one batch has no rows for some
  *    customers.
  *
  * OrchestratorSpec proves the same equality through the warehouse
  * (parquet partials, reruns); this spec isolates the merge algebra so
  * a future spec edit that breaks decomposability fails here in
  * seconds, with no warehouse in the loop.
  */
class MvIncrementalSpec extends AnyFunSuite with SparkTestBase {

  private val RefDate = "2020-06-01"
  private val batches = Seq("B1", "B2", "B3")

  // 12 natural customers, 4 products; per-batch surrogate keys are a
  // deterministic batch-dependent permutation (index + batch offset)
  private def dimC(b: String): DataFrame = {
    import spark.implicits._
    val off = batches.indexOf(b) * 100
    (1 to 12).map(i => (i + off, 1000L + i, s"First$i", s"Last$i",
      if (i % 3 == 0) "Germany" else "USA", b))
      .toDF("customer_key", "customer_id", "customer_firstname",
        "customer_lastname", "country", "dwh_batch_id")
  }

  private def dimP(b: String): DataFrame = {
    import spark.implicits._
    val off = batches.indexOf(b) * 100
    (1 to 4).map(j => (j + off, s"Prod$j", s"Cat${j % 2}", s"Sub$j",
      s"Line${j % 2}", b))
      .toDF("product_key", "product_name", "category", "sub_category",
        "product_line", "dwh_batch_id")
  }

  // deterministic fact rows; order numbers "o<k>" repeat across batches
  // for the same natural customer, (order_number, product_key) is
  // unique per (customer, date) so window tiebreaks are total.
  // shipping/due dates feed the recursive chain spec: every 5th order
  // ships late (due + 3), the rest on time, so per-batch seeds exist
  // and same-customer later orders chain off them.
  private def fact(b: String): DataFrame = {
    import spark.implicits._
    val bi = batches.indexOf(b)
    val off = bi * 100
    val n = 60 + bi * 30 // uneven batch sizes
    val rows = (0 until n).map { i =>
      val cust = 1 + i % (if (bi == 2) 8 else 12) // B3: customer gaps
      val prod = 1 + (i * 5 + bi) % 4
      // bi-independent (cust, order) mapping: the same pair recurs in
      // every batch — the cross-batch distinct trap by construction
      val orderNo = s"o${i % 20}"
      val date: java.sql.Date =
        if (i % 17 == 0) null
        else java.sql.Date.valueOf(f"2020-0${1 + (i + bi) % 6}%s-${1 + (i * 11) % 27}%02d")
      def plus(d: java.sql.Date, days: Int): java.sql.Date =
        if (d == null) null
        else java.sql.Date.valueOf(d.toLocalDate.plusDays(days))
      val due = plus(date, 4)
      val ship = plus(date, if (i % 5 == 0) 7 else 2) // every 5th late
      val sales = ((i % 9) + 1) * 10.0
      (orderNo, cust + off, prod + off, date, ship, due, sales, b)
    }
    rows.toDF("order_number", "customer_key", "product_key",
      "order_date", "shipping_date", "due_date", "sales", "dwh_batch_id")
  }

  private lazy val factAll = batches.map(fact).reduce(_ unionAll _)
  private lazy val dimCAll = batches.map(dimC).reduce(_ unionAll _)
  private lazy val dimPAll = batches.map(dimP).reduce(_ unionAll _)

  private def fullMv(name: String): DataFrame = name match {
    case "sales_monthly_productline" =>
      GoldViews.salesMonthlyProductline(factAll, dimPAll)
    case "sales_customer_country" =>
      GoldViews.salesCustomerCountry(factAll, dimCAll)
    case "customer_lifetime_value" =>
      GoldViews.customerLifetimeValue(factAll, dimCAll)
    case "running_sales_customer" =>
      GoldViews.runningSalesCustomer(factAll, dimCAll)
    case "top3_products_month_country" =>
      GoldViews.top3ProductsMonthCountry(factAll, dimCAll, dimPAll)
    case "customer_churn" =>
      GoldViews.customerChurn(factAll, dimCAll, RefDate)
    case "customer_order_gap" =>
      GoldViews.customerOrderGap(factAll, dimCAll)
    case "sales_rollup_product" =>
      GoldViews.salesRollupProduct(factAll, dimPAll)
    case "delayed_orders_chain" =>
      GoldViews.delayedOrdersChain(factAll)
  }

  for (sp <- MvIncremental.specs(RefDate)) {
    test(s"${sp.name}: merged per-batch partials equal the full view") {
      val partials = batches
        .map(b => sp.partial(fact(b), dimC(b), dimP(b)))
        .reduce(_ unionAll _)
      val inc = sp.rebuild(partials)
      val full = fullMv(sp.name)
      assert(full.count() > 0, "vacuous fixture")
      assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty,
        s"${sp.name}: incremental != full")
    }
  }

  test("the chain fixture recurses past the seed (non-vacuous)") {
    // without level >= 2 rows the chain equivalence above would only
    // prove seed = seed, never exercising the per-batch recursion step
    val maxLevel = GoldViews.delayedOrdersChain(factAll)
      .agg(max(col("level"))).head.getLong(0)
    assert(maxLevel >= 2L, s"chain max level $maxLevel — fixture trivial")
  }

  test("the fixture actually exercises the cross-batch distinct trap") {
    // at least one (customer, order_number) pair appears in >1 batch —
    // otherwise per-batch COUNT(DISTINCT) would coincidentally merge
    val crossBatch = factAll.join(dimCAll, Seq("customer_key", "dwh_batch_id"))
      .select(col("customer_id"), col("order_number"), col("dwh_batch_id"))
      .distinct()
      .groupBy(col("customer_id"), col("order_number"))
      .agg(countDistinct(col("dwh_batch_id")).as("nb"))
      .where(col("nb") > 1)
    assert(crossBatch.count() > 0)
  }
}
