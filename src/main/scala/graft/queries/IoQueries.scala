package graft.queries

import graft.Tables.t
import graft.Exact._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sources and sinks — SURVEY.md §2.1: CSV scan (S1) over the reference
  * fixture data, JSON scan (S3) over a committed JSONL fixture, and the
  * idempotent batch-partition overwrite write path (S8).
  *
  * Inference differences between engines (Spark CSV/JSON inference vs
  * DuckDB read_csv_auto/read_json_auto) are neutralized by casting every
  * projected column to an explicit type on BOTH sides — the same
  * discipline the reference applies when loading inferred parquet into
  * typed bronze tables (scripts/load_to_bronze.py:527-560).
  */
object IoQueries extends QueryPack {

  private val CsvPath =
    "/root/reference/raw/client1/crm/archive/cust_info_BATCH000014.csv"
  private val JsonPath = "/root/repo/fixtures/api_orders_sample.jsonl"

  val queries: Map[String, Q] = Map(
    // S1: header CSV scan with inferred schema, then explicit casts.
    // Ref: handlers/convert_to_parquet.py:183-184
    "q_scan_csv" -> ((s, _) => {
      s.read.option("header", "true").option("inferSchema", "true")
        .csv(CsvPath)
        .select(
          col("cst_id").cast(LongType).as("cst_id"),
          col("cst_key").cast(StringType).as("cst_key"),
          col("cst_firstname").cast(StringType).as("cst_firstname"),
          col("cst_lastname").cast(StringType).as("cst_lastname"),
          col("cst_marital_status").cast(StringType).as("cst_marital_status"),
          col("cst_gendr").cast(StringType).as("cst_gendr"),
          col("cst_create_date").cast(DateType).as("cst_create_date"))
    }),

    // S3: JSONL (newline-delimited) scan — Spark's native JSON format.
    // Ref: handlers/convert_to_parquet.py:187-191
    "q_scan_json" -> ((s, _) => {
      s.read.json(JsonPath)
        .select(
          col("id").cast(LongType).as("id"),
          col("sku").cast(StringType).as("sku"),
          col("qty").cast(LongType).as("qty"),
          col("price").cast(DoubleType).as("price"),
          col("order_date").cast(DateType).as("order_date"),
          col("note").cast(StringType).as("note"))
    }),

    // S3's whole-document fallback: the reference's JSON loader falls
    // back from JSONL to one whole-file document (handlers/
    // convert_to_parquet.py:187-191 — pd.read_json without lines=True);
    // Spark's native multiLine mode is that branch. Same rows as the
    // JSONL fixture, pretty-printed as one array (each file parses as a
    // unit, so at scale parallelism is per-FILE — the documented cost
    // of the fallback; JSONL stays the scalable default).
    "q_scan_json_multiline" -> ((s, _) => {
      s.read.option("multiLine", "true")
        .json("/root/repo/fixtures/api_orders_multiline.json")
        .select(
          col("id").cast(LongType).as("id"),
          col("sku").cast(StringType).as("sku"),
          col("qty").cast(LongType).as("qty"),
          col("price").cast(DoubleType).as("price"),
          col("order_date").cast(DateType).as("order_date"),
          col("note").cast(StringType).as("note"))
    }),

    // S2: Excel scan — round-trip proof: the nation table is written to
    // a minimal xlsx (deterministic order) and read back through the
    // StAX-based ExcelScan; the oracle is the original table, so any
    // parse defect (typing, escaping, sparse cells) breaks the match.
    // Ref: handlers/convert_to_parquet.py:185-186
    "q_scan_excel" -> ((s, dir) => {
      import graft.sources.ExcelScan
      val path = "/tmp/graft_nation.xlsx"
      val rows = t(s, dir, "nation")
        .orderBy(col("n_nationkey"))
        .collect() // fixture generation at dim scale, not a data-plane op
        .map(r => Seq[Any](r.get(0), r.getString(1), r.get(2)))
      ExcelScan.writeXlsx(
        Seq(Seq[Any]("n_nationkey", "n_name", "n_regionkey")) ++ rows, path)
      ExcelScan.readXlsx(s, path)
        .select(
          col("n_nationkey").cast(LongType).as("n_nationkey"),
          col("n_name").cast(StringType).as("n_name"),
          col("n_regionkey").cast(LongType).as("n_regionkey"))
    }),

    // S2 at landing scale: MANY workbooks, parsed on EXECUTORS — the
    // round-trip proof for ExcelScan.readXlsxMany. The nation table is
    // split across two xlsx fixtures (key parity) written driver-side
    // at dim scale; the READ path is the production one: binaryFile
    // listing → mapPartitions StAX parse, driver never holding workbook
    // bytes. The oracle is the original table, so any parse defect,
    // lost row, or cross-file misalignment breaks the hash.
    "q_scan_excel_many" -> ((s, dir) => {
      import graft.sources.ExcelScan
      val out = s"/tmp/graft_xlsx_many_${ProcessHandle.current().pid()}_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      val header = Seq("n_nationkey", "n_name", "n_regionkey")
      val even = new java.io.File(s"$out/nation_even.xlsx")
      val odd = new java.io.File(s"$out/nation_odd.xlsx")
      // fixture generated ONCE per (pid, dir) — the path is pid-scoped,
      // so an existing pair is this process's own earlier write (bench
      // runs each registered query 3x; re-collecting and rewriting the
      // workbooks per invocation timed fixture IO, not the scan).
      // deleteOnExit registration order: dir first, files after — the
      // JVM deletes in reverse registration order, so files go first
      // and the then-empty dir can drop too.
      if (!(even.exists() && odd.exists())) {
        val dirF = new java.io.File(out)
        dirF.mkdirs()
        dirF.deleteOnExit(); even.deleteOnExit(); odd.deleteOnExit()
        val rows = t(s, dir, "nation")
          .orderBy(col("n_nationkey"))
          .collect() // fixture generation at dim scale, not a data-plane op
          .map(r => (r.get(0).toString.toLong,
            Seq[Any](r.get(0), r.getString(1), r.get(2))))
        val headerRow = header.map(x => (x: Any))
        ExcelScan.writeXlsx(Seq(headerRow)
          ++ rows.filter(_._1 % 2 == 0).map(_._2), even.getPath)
        ExcelScan.writeXlsx(Seq(headerRow)
          ++ rows.filter(_._1 % 2 == 1).map(_._2), odd.getPath)
      }
      ExcelScan.readXlsxMany(s, s"$out/*.xlsx", header)
        .select(
          col("n_nationkey").cast(LongType).as("n_nationkey"),
          col("n_name").cast(StringType).as("n_name"),
          col("n_regionkey").cast(LongType).as("n_regionkey"))
    }),

    // ORC round-trip (extension beyond the reference's CSV/Excel/JSON/
    // parquet matrix): write supplier to ORC, scan it back with a
    // predicate — ORC is the other columnar format Spark reads natively
    // with pushdown + column pruning, and the oracle is the ORIGINAL
    // table, so any round-trip typing/encoding defect breaks the hash.
    "q_scan_orc" -> ((s, dir) => {
      val path = "/tmp/graft_supplier_orc"
      t(s, dir, "supplier").write.mode("overwrite").orc(path)
      s.read.orc(path)
        .where(col("s_acctbal") > 1000)
        .select(
          col("s_suppkey").cast(LongType).as("s_suppkey"),
          col("s_name").cast(StringType).as("s_name"),
          col("s_acctbal").cast(DoubleType).as("s_acctbal"))
    }),

    // XML round-trip (extension; Spark 4 ships the XML source natively
    // — the spark-xml package was merged upstream): part goes out
    // through the distributed XML sink (one element per row under
    // rowTag) and comes back typed with a predicate; the oracle is the
    // ORIGINAL table, so any escaping/typing/formatting defect in
    // either direction breaks the hash. Same per-process temp-path
    // isolation as the CSV export.
    "q_scan_xml" -> ((s, dir) => {
      val out = s"/tmp/graft_xml_part_${ProcessHandle.current().pid()}_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      // spread the single-rowgroup part scan (guide §2.5): one task
      // otherwise writes ONE xml file, and the read-back parse — the
      // row's real cost — then runs on one core too
      graft.Tables.tSpread(s, dir, "part", "p_partkey")
        .select(col("p_partkey"), col("p_name"), col("p_brand"),
          col("p_retailprice"))
        .write.format("xml").option("rowTag", "part")
        .mode("overwrite").save(out)
      // EXPLICIT read schema (r21, guide §1.2): XML schema inference is
      // a whole extra pass over the files (profiled 0.84 s single-task
      // at sf0.1 — the row's largest job) for types this round-trip
      // already declares; the typed read still proves parse/escaping
      // fidelity through the oracle hash, and the final casts keep the
      // published schema byte-identical.
      val xmlSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("p_partkey", LongType),
        org.apache.spark.sql.types.StructField("p_name", StringType),
        org.apache.spark.sql.types.StructField("p_brand", StringType),
        org.apache.spark.sql.types.StructField("p_retailprice", DoubleType)))
      s.read.format("xml").option("rowTag", "part").schema(xmlSchema)
        .load(out)
        .where(col("p_retailprice") > 950)
        .select(
          col("p_partkey").cast(LongType).as("p_partkey"),
          col("p_name").cast(StringType).as("p_name"),
          col("p_brand").cast(StringType).as("p_brand"),
          col("p_retailprice").cast(DoubleType).as("p_retailprice"))
    }),

    // S6: CSV export sink — the reference's warehouse staging hop dumps
    // each table to CSV for a Postgres COPY (scripts/load_to_bronze.py:
    // 570-571). Spark writes warehouse tables directly (S7/S8), so the
    // hop is architecturally unnecessary here — this row closes the
    // coverage line with the round-trip proof anyway: customer goes out
    // through the distributed CSV sink (header + explicit null marker,
    // per-partition files like any 100 TB export) and comes back typed;
    // the oracle is the ORIGINAL table, so any quoting/escaping/null or
    // float-formatting defect in the sink breaks the hash (Spark's
    // shortest-repr double formatting round-trips bit-exact).
    "q_write_csv_export" -> ((s, dir) => {
      // per-(process, dataset-dir) output: concurrent sessions — two SF
      // dirs, or bench + correctness over the SAME dir in separate
      // JVMs — must not overwrite each other mid-read
      val out = s"/tmp/graft_s6_csv_export_${ProcessHandle.current().pid()}_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      t(s, dir, "customer").write
        .option("header", "true").option("nullValue", "\\N")
        .mode("overwrite").csv(out)
      s.read.option("header", "true").option("nullValue", "\\N").csv(out)
        .select(
          col("c_custkey").cast(LongType).as("c_custkey"),
          col("c_name").cast(StringType).as("c_name"),
          col("c_nationkey").cast(LongType).as("c_nationkey"),
          col("c_acctbal").cast(DoubleType).as("c_acctbal"),
          col("c_mktsegment").cast(StringType).as("c_mktsegment"))
    }),

    // S8: idempotent batch overwrite. Write all batches, then RE-RUN one
    // batch with dynamic partition overwrite (the Spark replacement for
    // the reference's DELETE WHERE dwh_batch_id + INSERT), and read back.
    // If the re-run duplicated rows, the per-batch counts would differ
    // from the oracle computed directly over orders.
    // Ref: scripts/load_to_bronze.py:591-601, README.md:101-106
    "q_write_idempotent" -> ((s, dir) => {
      // per-(process, dataset-dir) output, same concurrent-session
      // isolation as the CSV export above
      val out = s"/tmp/graft_s8_idempotent_${ProcessHandle.current().pid()}_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      val batched = t(s, dir, "orders")
        .withColumn("dwh_batch_id",
          concat(lit("BATCH"),
            lpad((col("o_orderkey") % 3).cast(StringType), 6, "0")))
      batched.write
        .partitionBy("dwh_batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(out)
      // re-run of one batch: replaces only that partition, no duplication
      batched.where(col("o_orderkey") % 3 === 1).write
        .partitionBy("dwh_batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(out)
      s.read.parquet(out)
        .groupBy(col("dwh_batch_id"))
        .agg(cnt.as("n_rows"), dsum(col("o_totalprice")).as("total_price"))
    }),

    // Small-file compaction (maintenance plane): land orders as 4 batch
    // partitions x ~25 small files (the ingest-cadence storm that makes
    // a 100 TB scan metadata-bound), bin-pack via
    // Orchestrator.compactBatches — each partition POINTER-COMMITTED
    // into a hidden generation dir (atomic on object stores too; no
    // directory rename anywhere) — then GC the parked previous layout
    // through vacuumCompacted and read back through the pointer
    // resolver. The oracle over the original orders proves the rewrite
    // is content-preserving; the require()s prove it actually rewrote
    // (every partition down to one file) AND actually dropped the
    // parked files, so after the GC the rows can only come from the
    // committed generations — the row cannot pass vacuously.
    "q_compact_files" -> ((s, dir) => {
      import graft.run.Orchestrator
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      val wh = s"/tmp/graft_compact_$tag"
      val table = "bronze/orders_cmp"
      val dirF = new java.io.File(s"$wh/$table")
      if (dirF.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
        }
        rm(dirF)
      }
      t(s, dir, "orders")
        .withColumn("dwh_batch_id",
          concat(lit("CB"), (col("o_orderkey") % 4).cast(StringType)))
        .repartition(25)
        .write.partitionBy("dwh_batch_id").parquet(s"$wh/$table")
      val run = new Orchestrator.Run(s, wh, "MAINT")
      val done = run.compactBatches(table)
      require(done.size == 4 && done.forall(_._3 == 1),
        s"compaction did not bin-pack: $done")
      val gcd = run.vacuumCompacted(table)
      require(gcd.size == 4 && gcd.forall(_._2 > 0),
        s"GC dropped no parked files: $gcd")
      run.readTable(table)
        .groupBy(col("dwh_batch_id"))
        .agg(cnt.as("n_rows"), dsum(col("o_totalprice")).as("total_price"))
    }),

    // Z-order + zone-map pruned scan (layout plane): lineitem is written
    // clustered by the interleaved bits of (l_partkey, l_suppkey) with a
    // per-file min/max manifest, and the read resolves a 2-D range box
    // against the manifest BEFORE handing Spark a file list — the
    // Iceberg/Delta manifest-pruning shape, where a selective predicate
    // on EITHER key touches a handful of files instead of the whole
    // table. The require() proves files were actually skipped (the row
    // cannot pass vacuously); the oracle over the original table proves
    // the skip lost no rows. Layout is memoized per sf dir (the write is
    // the batch-time cost, the read is the per-query win); the `v1` token
    // invalidates the memo if the layout code changes shape.
    "q_scan_zonemap_pruned" -> ((s, dir) => {
      import graft.sources.ZoneMapLayout
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = s"/tmp/graft_zmap_v1_$tag"
      if (!new java.io.File(s"$path/_zonemap").exists())
        ZoneMapLayout.writeZordered(
          t(s, dir, "lineitem"), path,
          zCols = Seq("l_partkey", "l_suppkey"),
          statsCols = Seq("l_partkey", "l_suppkey"), nFiles = 16)
      val (df, kept, total) = ZoneMapLayout.prunedRead(s, path,
        Seq(("l_partkey", 100L, 180L), ("l_suppkey", 10L, 60L)))
      require(kept < total, s"zone map pruned nothing ($kept/$total)")
      df.select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber").cast(LongType).as("l_linenumber"),
        col("l_quantity"))
    }),

    // Bloom-manifest point-lookup pruning — the skip a min/max zone map
    // CANNOT make: the table is laid out by o_orderdate (the natural
    // production time layout), so every file's o_orderkey [min, max]
    // spans essentially the whole domain (fixture-verified: orderkey is
    // uncorrelated with date) and a range manifest keeps all files for
    // an orderkey probe. The per-file Bloom manifest keeps ~1 file per
    // probe key + fpp noise instead. No false negatives → the pruned
    // read is exactly the plain filtered scan, which is what the oracle
    // checks; the kept < total require makes the SKIP itself part of
    // the contract (and BloomIndexSpec quantifies it). Layout is
    // memoized per sf dir like the zone-map row: the one-time write is
    // batch maintenance, the per-query win is the pruned read.
    "q_scan_bloom_pruned" -> ((s, dir) => {
      import graft.sources.BloomIndexLayout
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = s"/tmp/graft_bloomidx_v1_$tag"
      if (!new java.io.File(s"$path/_bloomidx").exists())
        BloomIndexLayout.writeBloomIndexed(
          t(s, dir, "orders"), path,
          keyCol = "o_orderkey", layoutCol = "o_orderdate",
          nFiles = 16, expectedItemsPerFile = 1 << 16)
      val probes = Seq(1L, 7L, 33L, 512L, 4242L)
      val (df, kept, total) = BloomIndexLayout.prunedRead(
        s, path, "o_orderkey", probes)
      require(kept < total, s"bloom index pruned nothing ($kept/$total)")
      df.select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), col("o_orderdate").cast(DateType).as("o_orderdate"))
    }),

    // Bucketed co-located join: both sides bucketed on the join key at
    // write time, so the join itself plans with ZERO exchanges — the
    // 100 TB pattern for repeated large-x-large joins on a stable key
    // (bucket once, join shuffle-free forever after; the production
    // maintenance path is Orchestrator.writeBucketedBatch). The merge
    // hint pins SortMergeJoin so the shuffle-free shape is what runs
    // regardless of broadcast thresholds; BucketedJoinSpec asserts the
    // plan, this row proves the result. Paths/names keyed on the sf dir
    // so concurrent harness JVMs don't collide.
    "q_join_bucketed" -> ((s, dir) => {
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      // Bucketizing is the one-time batch-maintenance cost (the
      // production path is Orchestrator.writeBucketedBatch); the
      // per-query win this row measures is the shuffle-free join, so the
      // layout is memoized per (table, sf dir) within the session — a
      // bench re-run times the join, not a redundant rewrite.
      // BucketedJoinSpec exercises the write itself.
      def bucketize(src: String, key: String): String = {
        val name = s"graft_bkt_${src}_$tag"
        if (!s.catalog.tableExists(name)) {
          s.read.parquet(s"$dir/$src.parquet").write
            .mode("overwrite")
            .bucketBy(8, key).sortBy(key)
            .option("path", s"/tmp/graft_bkt_$tag/$src")
            .format("parquet")
            .saveAsTable(name)
        }
        name
      }
      val orders = s.table(bucketize("orders", "o_custkey"))
      val customer = s.table(bucketize("customer", "c_custkey"))
      orders.hint("merge")
        .join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(cnt.as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
    }))

  val oracleSql: Map[String, String] = Map(
    // the ORC file is a round-trip of supplier, so the oracle reads the
    // original table
    "q_scan_orc" ->
      """SELECT s_suppkey, s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
         FROM supplier WHERE s_acctbal > 1000""",
    // the XML tree is a round-trip of part, so the oracle reads the
    // original table
    "q_scan_xml" ->
      """SELECT p_partkey, CAST(p_name AS VARCHAR) AS p_name,
                CAST(p_brand AS VARCHAR) AS p_brand,
                CAST(p_retailprice AS DOUBLE) AS p_retailprice
         FROM part WHERE p_retailprice > 950""",
    "q_scan_csv" ->
      s"""SELECT CAST(cst_id AS BIGINT) AS cst_id,
                 CAST(cst_key AS VARCHAR) AS cst_key,
                 CAST(cst_firstname AS VARCHAR) AS cst_firstname,
                 CAST(cst_lastname AS VARCHAR) AS cst_lastname,
                 CAST(cst_marital_status AS VARCHAR) AS cst_marital_status,
                 CAST(cst_gendr AS VARCHAR) AS cst_gendr,
                 CAST(cst_create_date AS DATE) AS cst_create_date
          FROM read_csv_auto('$CsvPath', header=true)""",
    "q_scan_json" ->
      s"""SELECT CAST(id AS BIGINT) AS id,
                 CAST(sku AS VARCHAR) AS sku,
                 CAST(qty AS BIGINT) AS qty,
                 CAST(price AS DOUBLE) AS price,
                 CAST(order_date AS DATE) AS order_date,
                 CAST(note AS VARCHAR) AS note
          FROM read_json_auto('$JsonPath', format='newline_delimited')""",
    "q_scan_json_multiline" ->
      s"""SELECT CAST(id AS BIGINT) AS id,
                 CAST(sku AS VARCHAR) AS sku,
                 CAST(qty AS BIGINT) AS qty,
                 CAST(price AS DOUBLE) AS price,
                 CAST(order_date AS DATE) AS order_date,
                 CAST(note AS VARCHAR) AS note
          FROM read_json_auto(
            '/root/repo/fixtures/api_orders_multiline.json',
            format='array')""",
    "q_scan_excel" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
                CAST(n_regionkey AS BIGINT) AS n_regionkey
         FROM nation""",
    "q_scan_excel_many" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
                CAST(n_regionkey AS BIGINT) AS n_regionkey
         FROM nation""",
    "q_compact_files" ->
      """SELECT CONCAT('CB', CAST(o_orderkey % 4 AS VARCHAR)) AS dwh_batch_id,
                COUNT(*) AS n_rows,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS total_price
         FROM orders
         GROUP BY CONCAT('CB', CAST(o_orderkey % 4 AS VARCHAR))""",
    "q_scan_zonemap_pruned" ->
      """SELECT l_orderkey, l_partkey, l_suppkey,
                CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity
         FROM lineitem
         WHERE l_partkey BETWEEN 100 AND 180
           AND l_suppkey BETWEEN 10 AND 60""",
    "q_scan_bloom_pruned" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
                CAST(o_orderdate AS DATE) AS o_orderdate
         FROM orders
         WHERE o_orderkey IN (1, 7, 33, 512, 4242)""",
    "q_join_bucketed" ->
      """SELECT c_mktsegment,
                COUNT(*) AS n_orders,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS total_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    // the CSV export is a round-trip of customer, so the oracle reads
    // the original table
    "q_write_csv_export" ->
      """SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS c_nationkey,
                CAST(c_acctbal AS DOUBLE) AS c_acctbal, c_mktsegment
         FROM customer""",
    "q_write_idempotent" ->
      """SELECT CONCAT('BATCH', LPAD(CAST(o_orderkey % 3 AS VARCHAR), 6, '0'))
                  AS dwh_batch_id,
                COUNT(*) AS n_rows,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS total_price
         FROM orders
         GROUP BY CONCAT('BATCH', LPAD(CAST(o_orderkey % 3 AS VARCHAR), 6, '0'))""")
}
