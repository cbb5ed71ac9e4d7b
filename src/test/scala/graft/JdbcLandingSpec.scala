package graft

import graft.sources.JdbcLanding
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.sql.DriverManager

/** The JDBC bronze landing under the S8 idempotency contract, against
  * embedded Derby (the one RDBMS on the classpath): a batch re-land
  * replaces exactly its own rows — changed rows win, counts never
  * inflate, other batches are untouched — mirroring the reference's
  * DELETE-then-COPY (scripts/load_to_bronze.py:591-604).
  */
class JdbcLandingSpec extends AnyFunSuite with SparkTestBase {

  private lazy val url = {
    val dir = Files.createTempDirectory("graft_jdbc").toString
    s"jdbc:derby:$dir/bronze;create=true"
  }

  private def exec(sql: String): Unit = {
    val c = DriverManager.getConnection(url)
    try { val st = c.createStatement(); try st.executeUpdate(sql) finally st.close() }
    finally c.close()
  }

  private def rows(): Seq[(Long, String, String)] = {
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      try {
        val rs = st.executeQuery(
          "SELECT id, payload, dwh_batch_id FROM crm_cust_info ORDER BY id")
        val buf = scala.collection.mutable.ArrayBuffer[(Long, String, String)]()
        while (rs.next()) buf += ((rs.getLong(1), rs.getString(2), rs.getString(3)))
        buf.toSeq
      } finally st.close()
    } finally c.close()
  }

  private def df(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("id", "payload")
  }

  test("batch re-land replaces its own rows only (S8 over JDBC)") {
    // DDL-managed bronze table, like the reference's ddl_bronze scripts
    exec("""CREATE TABLE crm_cust_info (
             id BIGINT, payload VARCHAR(64), dwh_batch_id VARCHAR(32))""")

    JdbcLanding.landBatch(df(Seq(1L -> "a", 2L -> "b", 3L -> "c")),
      url, "crm_cust_info", "BATCH000001")
    JdbcLanding.landBatch(df(Seq(10L -> "x", 11L -> "y")),
      url, "crm_cust_info", "BATCH000002")
    assert(rows().size === 5)

    // rerun of batch 1 with a CHANGED row set: replaced, not appended;
    // batch 2 untouched
    JdbcLanding.landBatch(df(Seq(1L -> "a2", 2L -> "b")),
      url, "crm_cust_info", "BATCH000001")
    assert(rows() === Seq(
      (1L, "a2", "BATCH000001"), (2L, "b", "BATCH000001"),
      (10L, "x", "BATCH000002"), (11L, "y", "BATCH000002")))

    // exact rerun is a no-op on counts (idempotency proper)
    JdbcLanding.landBatch(df(Seq(1L -> "a2", 2L -> "b")),
      url, "crm_cust_info", "BATCH000001")
    assert(rows().size === 4)

    // and the landed table round-trips through the Spark JDBC source
    val back = spark.read.jdbc(url, "crm_cust_info",
      new java.util.Properties)
    assert(back.count() === 4)
  }

  test("re-land heals a partial/duplicated crash state (recovery = rerun)") {
    // the delete and the distributed append are separate transactions
    // (see JdbcLanding scaladoc): simulate the two bad outcomes — rows
    // missing after a crash mid-land, and rows duplicated by a
    // retried-after-commit writer task — and prove one re-land restores
    // the exact batch
    exec("""CREATE TABLE crm_prd_info (
             id BIGINT, payload VARCHAR(64), dwh_batch_id VARCHAR(32))""")
    // crashed land: only one of three rows made it, and a task retry
    // double-inserted it
    exec("INSERT INTO crm_prd_info VALUES (1, 'p1', 'BATCH000009')")
    exec("INSERT INTO crm_prd_info VALUES (1, 'p1', 'BATCH000009')")
    JdbcLanding.landBatch(df(Seq(1L -> "p1", 2L -> "p2", 3L -> "p3")),
      url, "crm_prd_info", "BATCH000009")
    val c = DriverManager.getConnection(url)
    val rows = try {
      val st = c.createStatement()
      try {
        val rs = st.executeQuery(
          "SELECT id, payload FROM crm_prd_info ORDER BY id")
        val buf = scala.collection.mutable.ArrayBuffer[(Long, String)]()
        while (rs.next()) buf += ((rs.getLong(1), rs.getString(2)))
        buf.toSeq
      } finally st.close()
    } finally c.close()
    assert(rows === Seq((1L, "p1"), (2L, "p2"), (3L, "p3")))
  }
}
