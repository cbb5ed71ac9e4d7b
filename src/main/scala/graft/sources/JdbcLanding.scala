package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** S1-adjacent JDBC warehouse landing — the reference's Postgres bronze
  * hop (scripts/load_to_bronze.py:591-604: `DELETE WHERE dwh_batch_id =
  * <batch>` then `COPY FROM STDIN`), re-expressed for any JDBC
  * warehouse under the same S8 idempotency contract as the parquet
  * layer: a batch re-land replaces exactly its own rows, never
  * duplicates and never touches other batches.
  *
  * Scale shape: the delete is ONE statement on the driver (a
  * metadata-plane call — the warehouse does the work); the insert is
  * Spark's distributed JDBC writer (one connection per partition, rows
  * streamed with `batchsize`-chunked prepared statements), so landing
  * parallelism is the DataFrame's partitioning, exactly like every
  * other sink here. The engine's own warehouse stays parquet (S7/S8);
  * this exists for the migrating user whose system of record is an
  * external RDBMS, proven against embedded Derby in JdbcLandingSpec.
  *
  * Like the reference, the bronze table itself is DDL-managed
  * (sql/bronze/ddl_bronze_client1.sql) — `landBatch` appends into an
  * existing table and leaves creation to the schema owner, which also
  * sidesteps Spark-dialect type-mapping surprises (e.g. StringType →
  * CLOB on Derby, which cannot even be compared in a WHERE clause).
  *
  * Atomicity contract, stated honestly: the delete and the distributed
  * append are SEPARATE transactions (each writer partition commits its
  * own connection — no RDBMS gives a cross-connection distributed
  * transaction here, and the reference's single-connection
  * DELETE+COPY cannot be distributed). A crash between them, a failed
  * write job, or a retried-after-commit task leaves the batch partial
  * or row-duplicated — and the RERUN is the recovery mechanism: the
  * re-land's delete clears every row of the batch (partials and task
  * duplicates included) before re-inserting, so recovery = re-run the
  * batch, exactly the reprocess discipline of the parquet S8 plane.
  * JdbcLandingSpec proves the heal from a seeded partial/duplicated
  * state.
  */
object JdbcLanding {

  /** Idempotently land one batch of `df` into JDBC `table`:
    * delete-this-batch, then distributed append with a `dwh_batch_id`
    * literal column (the reference's batch column, README.md:101-106).
    */
  def landBatch(df: DataFrame, url: String, table: String,
                batchId: String,
                props: java.util.Properties = new java.util.Properties)
  : Unit = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.prepareStatement(
        s"DELETE FROM $table WHERE dwh_batch_id = ?")
      try { st.setString(1, batchId); st.executeUpdate() }
      finally st.close()
    } finally conn.close()
    df.withColumn("dwh_batch_id", lit(batchId))
      .write.mode(SaveMode.Append).jdbc(url, table, props)
  }
}
