package graft.streaming

import graft.plans.Checkpoints.CutOps
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import java.sql.Timestamp

/** Structured Streaming counterparts of the batch event analytics in
  * graft.queries.EventQueries. The reference is a file-triggered
  * micro-batch system (SURVEY §2.9) whose exact semantics map to a file
  * source + Trigger.AvailableNow; these transforms are written against
  * unbounded DataFrames so the same code runs on `readStream` input
  * (tested via MemoryStream) and on batch input.
  */
object StreamingJobs {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** File-source stream over a parquet event directory — the streaming
    * front door matching the reference's incoming-directory watch
    * (handlers/batch_processing.py:390-398). Drive it with
    * Trigger.AvailableNow for the reference's drain-then-stop batches.
    */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Tumbling daily window per event type — the streaming form of
    * EventQueries.q_events_tumbling_daily. With a watermark the state
    * store evicts windows older than the allowed lateness.
    */
  def tumblingDaily(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("w.start").cast(DateType).as("day"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Streaming feed-health anomaly detection — the streaming face of
    * q_events_anomaly: hourly windowed counts per event type compared
    * against a STATIC per-type baseline (n, s=Σc, q=Σc² from history,
    * e.g. the batch row's stats plane) with the same exact integer
    * algebra (L = c·n − s > 0 AND L² > 9(nq − s²), Decimal(38,0)) —
    * spike verdicts are bit-identical to batch over the same counts.
    * Stream-static broadcast join (baseline is types-sized); windowed
    * state evicts past the watermark.
    */
  def anomalyStream(events: DataFrame, baseline: DataFrame,
                    lateness: String = "1 hour"): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(38, 0)
    val lift = col("c").cast(D) * col("n").cast(D) - col("s").cast(D)
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .join(broadcast(baseline), "event_type")
      .where(lift > 0 && lift * lift >
        (col("n").cast(D) * col("q").cast(D)
          - col("s").cast(D) * col("s").cast(D)) * lit(9))
      .select(col("event_type"),
        // integer `div`, matching the batch q_events_anomaly exactly —
        // float division then cast relies on micros < 2^53 and
        // hour-aligned starts, a fragile equivalence for a contract of
        // bit-identical verdicts
        expr("unix_micros(w.start) div 3600000000").as("hour_id"),
        col("c").as("n_events"))
  }

  /** Sliding 1-day windows every 12 hours — each event contributes to
    * two overlapping windows (batch analog: q_events_sliding_daily).
    */
  def slidingDaily(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day", "12 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Session windows with a 30-minute inactivity gap — the native
    * streaming form of EventQueries.q_events_sessionize (session_window
    * merges/extends sessions as late rows arrive; state is scoped per
    * user_id so it shards across executors).
    */
  def sessionStats(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"), col("session_value"))

  /** Streaming exact dedup on event_id — the streaming face of the
    * batch W1/exact-dedup operators. dropDuplicatesWithinWatermark keeps
    * per-key state only until the watermark passes it, so state is
    * bounded by the lateness horizon instead of the whole stream's key
    * cardinality (dropDuplicates without a watermark grows forever —
    * unusable at 100 TB/day).
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrich join: the streaming form of the J1 dimension
    * enrich — each micro-batch hash-joins against the static dimension
    * snapshot, which Spark re-broadcasts per batch (no shuffle of the
    * stream side, no state store involvement for inner equi-joins
    * against static data).
    */
  def enrichEvents(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(broadcast(userDim), Seq("user_id"), "left")

  /** Checkpoint-scope prefix for stream-minted batch ids: 12 hex chars
    * (48 bits) of the checkpoint path's MD5. ONE definition for every
    * foreachBatch sink so no sink can silently keep a narrower —
    * collision-prone — scope.
    *
    * MIGRATION NOTE: the scope width is part of the partition naming,
    * so changing it (8 -> 12 hex in round 14) breaks replay idempotence
    * across the upgrade boundary — a restart's replayed micro-batch
    * would land in a NEW `SBATCH<scope>_N` partition beside the
    * old-scope one instead of overwriting it. Before upgrading a live
    * deployment: stop the stream at a fully-committed checkpoint (no
    * pending replay), or re-land/compact the old-scope partitions.
    */
  private def scopeOf(checkpoint: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(checkpoint.getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString

  /** Streaming warehouse ingestion: drain a stream into a
    * batch-partitioned warehouse table through the Orchestrator's
    * idempotent writer — each micro-batch becomes one dwh_batch_id
    * partition (dynamic partition overwrite + audit row). On restart
    * from the checkpoint, a replayed micro-batch carries the SAME batch
    * id and rewrites its own partition instead of appending duplicates:
    * table-level exactly-once on top of the source's at-least-once
    * replay — precisely the reference's batch-id idempotency contract
    * extended to the streaming front door.
    */
  def warehouseSink(df: DataFrame, warehouse: String, table: String,
                    checkpoint: String,
                    batchPrefix: String = "SBATCH",
                    bloomKey: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    // batch ids are scoped to the CHECKPOINT: the micro-batch counter is
    // only stable within one checkpoint lineage, so a fresh checkpoint
    // (or a second stream into the same table) must mint fresh ids —
    // otherwise its batch 0 dynamically overwrites the old stream's
    // partition 0 (silent data loss). A moved checkpoint degrades to
    // duplicate ids-with-new-scope (detectable), never to overwrite.
    // 12 hex chars (48 bits): a 32-bit scope reaches birthday-collision
    // odds at ~65k streams sharing one warehouse — within reach of a
    // large deployment; 48 bits pushes that past 16M streams.
    val scope = scopeOf(checkpoint)
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val run = new graft.run.Orchestrator.Run(
          batch.sparkSession, warehouse, f"$batchPrefix${scope}_$id%06d")
        // With a bloomKey, each micro-batch also refreshes exactly its
        // own Bloom-manifest partition (writeBatchIndexed) — streamed
        // tables get the same point-lookup file skipping as batch-landed
        // ones, and a REPLAYED micro-batch rewrites data partition and
        // manifest partition under the same batch id (the S8 argument:
        // an index row naming a vanished file would make point probes
        // silently skip live data).
        bloomKey match {
          case Some(key) => run.writeBatchIndexed(batch.toDF(), table, key)
          case None => run.writeBatch(batch.toDF(), table)
        }
        ()
      }
      .outputMode("append")
      .start()
  }

  /** Streaming ANN index ingest: drain an embedding stream
    * (vec_id, embedding) into the PERSISTED IVF index
    * (Orchestrator.indexAnnBatch) — the streaming face of the
    * index-maintenance plane. Each micro-batch becomes one
    * dwh_batch_id partition of indexes/ann_lists, so a replayed
    * micro-batch overwrites exactly its own partition (the
    * warehouseSink idempotency discipline); centroids bootstrap once
    * from the first non-empty batch and stay frozen, so assignments
    * remain comparable across the stream (the indexAnnBatch rebuild
    * contract). annSearchIndexes serves over the same tables while
    * the stream appends lists — index growth is O(batch x nlist) per
    * micro-batch, never a corpus rescan. Each micro-batch lands BOTH
    * the raw vectors (bronze/embeddings — the store annSearchIndexes
    * exact-reranks against; an index without its vectors cannot serve)
    * and the list assignments, under the same batch id, so data and
    * index replay together.
    */
  def annIngestSink(embeddings: DataFrame, warehouse: String,
                    checkpoint: String, nlist: Int = 1024,
                    batchPrefix: String = "STREAMANN_")
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // batch ids are scoped to the CHECKPOINT (the warehouseSink
    // invariant): the micro-batch counter is only stable within one
    // checkpoint lineage, so a fresh checkpoint or a second stream
    // into the same warehouse must mint fresh ids — otherwise its
    // batch 0 dynamic-partition-overwrites the old stream's partition
    // 0 in BOTH the vector store and the list table (silent index
    // corruption).
    val scope = scopeOf(checkpoint)
    embeddings.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val run = new graft.run.Orchestrator.Run(
          batch.sparkSession, warehouse, f"$batchPrefix${scope}_$id%06d")
        // two sinks, one compute — chained so the per-micro-batch cut's
        // reliable-checkpoint files are reclaimed once both sinks have
        // landed (an unmanaged cut here would leak one frame per
        // micro-batch for the stream's whole life)
        val chain = graft.plans.Checkpoints.chain()
        val b = chain.cut(batch.toDF())
        run.writeBatch(b, "bronze/embeddings")
        run.indexAnnBatch(b, nlist)
        chain.reclaimAll()
        ()
      }
      .outputMode("append")
      .start()
  }

  /** Streaming gap-fill ingest — the table-backed face of
    * EventQueries.gapfillOf. Each micro-batch aggregates ITS OWN rows
    * to partial (event_type, hour_id, cents) cells through the ONE
    * shared cell builder (EventQueries.hourlyCents) and lands them as
    * one idempotent batch partition; [[gapfillView]] merges partials
    * by a further SUM (cents are per-row-quantized integers, so the
    * partial-merge is associative and order-free) and applies the ONE
    * shared fill builder. Consequences, each pinned by
    * GapfillStreamSpec: stream-landed ≡ batch bit-for-bit once the
    * same events have landed, under ANY arrival permutation (integer
    * sums commute across micro-batch boundaries), and a replayed
    * micro-batch rewrites exactly its own partition (the warehouseSink
    * batch-id discipline) instead of double-counting its cells — the
    * failure mode a naive append-the-aggregate sink cannot avoid.
    * Heavy state lives in the TABLE, not executor memory: the stream
    * itself is stateless (per-batch aggregate only), so watermark
    * lateness never drops an hour — a late event lands as one more
    * partial cell and the read view absorbs it.
    */
  def gapfillCellSink(events: DataFrame, warehouse: String,
                      checkpoint: String,
                      batchPrefix: String = "SBATCH")
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val scope = scopeOf(checkpoint)
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val run = new graft.run.Orchestrator.Run(
          batch.sparkSession, warehouse, f"$batchPrefix${scope}_$id%06d")
        run.writeBatch(
          graft.queries.EventQueries.hourlyCents(batch.toDF()),
          "silver/events_hourly_cells")
        ()
      }
      .outputMode("append")
      .start()
  }

  /** The read view over [[gapfillCellSink]]'s landed partials: merge
    * to final cells (one SUM per (type, hour)), then the shared fill.
    */
  def gapfillView(spark: SparkSession, warehouse: String): DataFrame = {
    val path = s"$warehouse/silver/events_hourly_cells"
    require(graft.run.WarehouseFs.exists(path),
      s"gapfillView: no hourly-cell table at $path — run gapfillCellSink " +
        "(or land cells in batch) before reading the filled grid; an " +
        "empty-grid fallback would be indistinguishable from a dead feed")
    graft.queries.EventQueries.gapfillOf(
      graft.sources.CompactedLayout.read(spark, path)
        .groupBy(col("event_type"), col("hour_id"))
        .agg(sum(col("cents")).as("cents")))
  }

  /** Streaming CDC apply: drain a change stream into a key-bucketed
    * SCD2 dim (Orchestrator.mergeScd2). Each micro-batch first
    * collapses to one row per key (keep-latest by `seqCol` — CDC feeds
    * emit several changes per key per window, and the merge's
    * MERGE-style contract is one match per key), then merges with the
    * batch's max `effCol` as the effective date. Replayed micro-batches
    * are no-ops by CHANGE DETECTION rather than batch-id bookkeeping:
    * re-merging already-applied values classifies every row as a noop
    * and rewrites nothing — the streaming face of the COW contract
    * ScdMergeSpec pins. Per-key state never accumulates in the stream
    * itself (the window is within one micro-batch); history lives in
    * the warehouse table.
    */
  def scdMergeSink(updates: DataFrame, warehouse: String, table: String,
                   key: String, attrCols: Seq[String],
                   seqCol: String, effCol: String,
                   checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty) {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col(key)).orderBy(col(seqCol).desc)
          val latest = batch.toDF()
            .withColumn("__rn", row_number().over(w))
            .where(col("__rn") === 1).drop("__rn")
          val eff = latest.agg(max(col(effCol))).head().getDate(0)
          val run = new graft.run.Orchestrator.Run(
            batch.sparkSession, warehouse, f"SCDM$id%06d")
          run.mergeScd2(table, latest.drop(effCol), key, attrCols, eff)
          run.flushAudit()
          ()
        }
      }
      .outputMode("append")
      .start()

  case class BandDoc(band_key: String, doc_id: Long)
  case class CandPair(doc_a: Long, doc_b: Long)

  /** Streaming MinHash-LSH near-dup candidates over a document stream
    * (doc_id, text): the native per-row signature explodes into band
    * keys, and per-bucket GroupState holds the doc ids seen in that
    * bucket — each arriving doc emits a candidate pair against every
    * prior bucket member. State is per band bucket (shards across
    * executors) and capped at `maxPerBucket` ids (oldest evicted), so a
    * hot bucket cannot grow state without bound; candidates may repeat
    * across bands/batches — dedup downstream (stateful dropDuplicates
    * or the batch exact-cosine re-rank) as the batch path does.
    */
  def nearDupCandidates(docs: DataFrame, maxPerBucket: Int = 64): Dataset[CandPair] = {
    import docs.sparkSession.implicits._
    import graft.functions.TextHashDefaults._
    import graft.functions.TextHashFunctions.minhashSignature
    val mins = docs.select(col("doc_id"),
        minhashSignature(split(trim(col("text")), "\\s+"), 3, MinHashK,
          MinHashA, MinHashB, MinHashP).as("mh"))
      .where(col("mh").isNotNull)
    val bands = mins.select(explode(array(
        (0 until MinHashK / 2).map(b =>
          concat_ws("_", lit(b), element_at(col("mh"), 2 * b + 1),
            element_at(col("mh"), 2 * b + 2))): _*)).as("band_key"),
        col("doc_id"))
      .as[BandDoc]
    bands.groupByKey(_.band_key)
      .flatMapGroupsWithState[Seq[Long], CandPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, rows, state: GroupState[Seq[Long]]) =>
          var seen = state.getOption.getOrElse(Seq.empty)
          val out = Seq.newBuilder[CandPair]
          rows.foreach { r =>
            if (!seen.contains(r.doc_id)) {
              seen.foreach { s =>
                out += CandPair(math.min(s, r.doc_id), math.max(s, r.doc_id))
              }
              seen = (seen :+ r.doc_id).takeRight(maxPerBucket)
            }
          }
          state.update(seen)
          out.result().distinct.iterator
      }
  }

  /** Streaming corpus gate: the per-row stages of the batch cleaning
    * pipeline (quality gate + language gate — the SAME column builders
    * graft.queries.TextQueries uses, so stream and batch cannot drift)
    * followed by watermarked exact dedup on the normalized content key.
    * Gates are stateless map-only projections; the dedup state is
    * bounded by the lateness horizon, not the stream's key cardinality.
    * Input: (doc_id, text, ts).
    */
  def gateDocs(docs: DataFrame): DataFrame = {
    import graft.queries.TextQueries.{gatePass, langPredCol, qualityScoreCol, textKeyCol}
    docs
      .withColumn("quality_score", qualityScoreCol)
      .withColumn("padded", concat(lit(" "), lower(trim(col("text"))), lit(" ")))
      .withColumn("lang_pred", langPredCol(col("padded")))
      .where(gatePass(col("quality_score"), col("lang_pred")))
      .select(col("doc_id"), col("ts"), textKeyCol.as("text_key"),
        col("quality_score"), col("lang_pred"))
  }

  def cleanDocsStream(docs: DataFrame): DataFrame =
    gateDocs(docs)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("text_key")

  /** Streaming PII scrub: the batch redaction kernel
    * (TextQueries.q_text_redact_pii — SAME patterns, placeholders and
    * count expressions, so stream and batch cannot drift) applied to a
    * document stream. Entirely STATELESS map-only projection: no state
    * store, no watermark; restart semantics reduce to the sink's
    * idempotency. Input: (doc_id, text, ts).
    */
  def scrubDocsStream(docs: DataFrame): DataFrame = {
    import graft.queries.TextQueries.{PiiEmailRe, PiiPhoneRe,
      piiCountCol, redactedPiiCol}
    docs.select(col("doc_id"), col("ts"),
      piiCountCol(col("text"), PiiEmailRe).as("n_emails"),
      piiCountCol(col("text"), PiiPhoneRe).as("n_phones"),
      redactedPiiCol(col("text")).as("redacted"))
  }

  /** Streaming benchmark decontamination: winnowed-fingerprint overlap
    * of a document stream against the (small, broadcast) benchmark
    * fingerprint set — the streaming face of q_text_decontaminate,
    * built from the SAME native winnowing kernel, parameters and ≥3
    * threshold (graft.queries.TextQueries), so stream and batch cannot
    * drift. Entirely STATELESS map-side work: each row's fingerprints
    * are computed natively and intersected against the broadcast set
    * (winnowed fingerprints are distinct per doc, so array_intersect ≡
    * the batch join+count) — no state store, no watermark, and restart
    * semantics reduce to the sink's idempotency. At 100 TB/day the
    * benchmark side stays what it is in batch: a broadcast set.
    *
    * @param docs     streaming (doc_id, text, ...) frame
    * @param benchFps static one-column `fp` frame of benchmark
    *                 fingerprints (e.g. the winnowed eval corpus)
    */
  def decontaminateStream(docs: DataFrame, benchFps: DataFrame): DataFrame = {
    import graft.functions.TextHashDefaults.{WinB, WinK, WinP, WinW}
    import graft.functions.TextHashFunctions.winnowedFingerprints
    val bench = benchFps.agg(collect_set(col("fp")).as("bench_fps"))
    docs.crossJoin(broadcast(bench))
      .withColumn("n_overlap",
        coalesce(size(array_intersect(
          winnowedFingerprints(col("text"), WinK, WinW, WinB, WinP),
          col("bench_fps"))).cast(LongType), lit(0L)))
      .select(col("doc_id"), col("n_overlap"),
        (col("n_overlap") >= 3).as("is_contaminated"))
  }

  /** Streaming incremental corpus dedup — the streaming face of
    * q_dedup_incremental: each arriving document probes the PERSISTED
    * corpus indexes (content-key table, LSH band-key table) and gets its
    * exact/near-dup verdict row-by-row. Entirely stateless on the stream
    * side: exact membership is one stream-static left join on the
    * content key, and near membership is a FIXED number of stream-static
    * left joins — one per LSH band (MinHashK/2 = 4) — against the band
    * index, so no streaming aggregation (and no unbounded state) is ever
    * needed to fold bands back to one verdict per document. Band
    * construction reuses the batch builders (TextQueries.minhashCol /
    * bandKeysCol), so stream and batch cannot drift; StreamingSpec
    * asserts streaming ≡ the batch q_dedup_incremental verdicts.
    *
    * @param docs        streaming (doc_id, text, ...) frame
    * @param corpusKeys  static one-column `text_key` index of the corpus
    * @param corpusBands static one-column `band_key` index of the corpus
    */
  def dedupIncrementalStream(docs: DataFrame, corpusKeys: DataFrame,
                             corpusBands: DataFrame): DataFrame = {
    import graft.queries.TextQueries.{bandKeysCol, minhashCol, textKeyCol}
    val nBands = graft.functions.TextHashDefaults.MinHashK / 2
    // a null signature (doc under 3 words) must null the WHOLE band
    // array — concat_ws skips nulls, so feeding it a null signature
    // would mint degenerate "b"-only keys instead of no keys
    val keyed = docs
      .withColumn("__mh", minhashCol)
      .select(col("doc_id"), textKeyCol.as("text_key"),
        when(col("__mh").isNotNull, bandKeysCol(col("__mh"))).as("__bands"))
    val exact = keyed.join(
      corpusKeys.withColumn("__e", lit(1L)), Seq("text_key"), "left")
    val banded = (0 until nBands).foldLeft(exact) { (df, b) =>
      df.withColumn(s"__bk$b", element_at(col("__bands"), b + 1))
        .join(corpusBands.select(col("band_key").as(s"__bk$b"),
          lit(1L).as(s"__n$b")), Seq(s"__bk$b"), "left")
    }
    val near = (0 until nBands).map(b => col(s"__n$b").isNotNull)
      .reduce(_ || _)
    banded.select(col("doc_id"),
      col("__e").isNotNull.as("exact_dup"),
      near.as("near_dup"),
      (col("__e").isNull && !near).as("keep"))
  }

  /** Streaming incremental-SemDeDup gate — the streaming face of
    * q_dedup_semantic_incremental's verdict bit: each arriving
    * embedding is near-dup-checked against the FROZEN corpus
    * artifacts, stateless and append-mode at any rate.
    *
    * Shape: the ≤1024-entry centroid model rides in the plan as a
    * literal (the dsirGateStream discipline), so the `nprobe` nearest
    * lists are picked MAP-SIDE (array_sort over struct(d2, cent_id) —
    * the exact tie order of the batch row's rank window); each probe
    * slot then equi-joins the static per-centroid payload table and an
    * `exists` over the list's (vec_id, qv) entries tests the epsilon
    * in place. No stream-side window, aggregation, or state — the
    * re-collapse problem of explode-then-semi never arises because the
    * probe slots are COLUMNS, not rows. Distances use interpreted
    * zip_with/aggregate HOFs rather than the native kernel (lambda
    * variables, not plan children) — the gate trades codegen for
    * statelessness, and per-row cost is nprobe bounded-list scans,
    * which is exactly what an IVF probe pays. Verdicts equal the batch
    * row's is_dup bit-for-bit (StreamingSpec pins it); a vector whose
    * probed lists hold no within-eps neighbor is explicit
    * is_dup=false, never dropped. The model is frozen for the DSIR
    * reason: verdicts must be comparable across the feed; retraining
    * is a redeploy.
    *
    * @param vecs        streaming frame with (vec_id, embedding)
    * @param centModel   cent_id → quantized centroid (plan literal)
    * @param centPayload STATIC (cent_id, vs: array<struct<vec_id,qv>>)
    * @param eps         quantized squared-L2 near-dup threshold
    */
  def semanticGateStream(vecs: DataFrame, centModel: Map[Long, Seq[Long]],
                         centPayload: DataFrame, eps: Long,
                         nprobe: Int = 3): DataFrame = {
    require(centModel.nonEmpty, "semanticGateStream: empty centroid model")
    require(nprobe >= 1, s"semanticGateStream: nprobe must be >= 1, got $nprobe")
    def l2hof(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, x) => acc + x)
    val entries = map_entries(typedlit(centModel))
    val probes = transform(
      slice(array_sort(transform(entries,
        e => struct(l2hof(col("__qq"), e.getField("value")).as("d2"),
          e.getField("key").as("cent_id")))), 1, nprobe),
      s => s.getField("cent_id"))
    val keyed = vecs.select(col("vec_id"),
        graft.functions.VectorFunctions.lattice(col("embedding")).as("__qq"))
      .withColumn("__probes", probes)
    val gated = (0 until nprobe).foldLeft(keyed) { (df, b) =>
      // a model smaller than nprobe leaves trailing slots null: get()
      // is the ANSI-safe indexer (null out of bounds, never an
      // INVALID_ARRAY_INDEX error like element_at under ANSI mode —
      // the fuzzyMatchStream head-pick lesson); the left join keeps
      // the row, exists sees null, coalesce says false
      df.withColumn(s"__c$b", get(col("__probes"), lit(b)))
        .join(centPayload.select(col("cent_id").as(s"__c$b"),
          col("vs").as(s"__vs$b")), Seq(s"__c$b"), "left")
        .withColumn(s"__hit$b", coalesce(exists(col(s"__vs$b"),
          v => l2hof(col("__qq"), v.getField("qv")) <= eps
            && v.getField("vec_id") =!= col("vec_id")), lit(false)))
    }
    gated.select(col("vec_id"),
      (0 until nprobe).map(b => col(s"__hit$b")).reduce(_ || _).as("is_dup"))
  }

  /** Streaming media near-dup gate — the streaming face of
    * q_multimodal_neardup_incremental: each arriving media payload is
    * dHashed and probed against the FROZEN corpus band-payload table
    * ([[graft.queries.MultimodalQueries.mediaBandPayload]] — bounded
    * buckets, refusal on degenerate corpora), verdicts through the ONE
    * shared probe ([[graft.queries.MultimodalQueries
    * .mediaNeardupVerdicts]] — 4 band-slot joins + in-array exact-
    * Hamming verify and min pick, no window, no state), so the stream
    * gate, the registered row and the warehouse face cannot drift.
    * Append mode at any rate; StreamingSpec pins stream ≡ batch.
    *
    * @param media       streaming (doc_id, payload binary)
    * @param bandPayload the static corpus side (band_key -> vs)
    * @return (doc_id, is_dup, match_doc_id, hamming)
    */
  def mediaNeardupStream(media: DataFrame,
                         bandPayload: DataFrame): DataFrame =
    graft.queries.MultimodalQueries.mediaNeardupVerdicts(
      media.select(col("doc_id"),
        graft.functions.MediaHash.dhash(col("payload")).as("h64")),
      bandPayload)

  /** Streaming Gopher-rules gate — the streaming face of
    * q_text_gopher_rules: each arriving document gets every rule
    * metric + verdict row-by-row through the ONE shared builder
    * (TextQueries.gopherFrameOf), so the stream gate and the batch
    * filter cannot drift. Map-only — no state, no watermark, append
    * mode at any rate.
    */
  def gopherGateStream(docs: DataFrame): DataFrame =
    graft.queries.TextQueries.gopherFrameOf(docs)

  /** Streaming DSIR gate — the streaming face of q_sample_dsir's
    * scoring half: each arriving document is scored against a FROZEN
    * model (the <=1024-long LLR array from TextQueries.dsirModelArray,
    * trained once on the reference corpus — the production shape:
    * train-on-warehouse, gate-the-feed) entirely map-side via the ONE
    * shared builder (TextQueries.dsirScoreFrameOf), so stream and
    * batch weights are bit-identical. Zero shuffles, no state, no
    * watermark — the model rides in the plan as a literal; append mode
    * at any rate. Retrain cadence is a redeploy (the model is frozen
    * by design — DSIR weights must be comparable across the whole
    * selection pass, so a drifting online model would be WRONG, not
    * just stale).
    */
  def dsirGateStream(docs: DataFrame, model: Array[Long]): DataFrame =
    graft.queries.TextQueries.dsirScoreFrameOf(docs, model)

  /** Streaming calibrated-quality gate — the streaming face of
    * q_text_quality_calibrated: each arriving document's raw quality
    * score maps to its mid-rank ECDF under a FROZEN per-source
    * calibration model (TextQueries.calibrationModelFrame, trained
    * once on the warehouse corpus: one row per source with dense
    * eq/below arrays over the bounded score_milli domain, so even a
    * score bucket the training corpus never produced gets its exact
    * mid-rank percentile). Stream-static broadcast join on `source`
    * (|sources| rows), map-only after — no state, no watermark.
    * Unknown sources surface as known_source=false, never a silent
    * pass/fail. Frozen like the DSIR model and for the same reason:
    * percentile cuts must be comparable across the whole gating pass.
    */
  def calibratedGateStream(docs: DataFrame, model: DataFrame): DataFrame =
    graft.queries.TextQueries.calibratedScoreFrameOf(docs, model)

  /** Streaming frozen-vocab BPE encode — the streaming face of
    * q_text_bpe_encode: each arriving document encodes map-only
    * through the native BpeEncodeDelim kernel with the COMMITTED
    * vocabulary (the ONE shared builder, TextQueries.bpeEncodeFrameOf,
    * so stream and batch token counts cannot drift). Zero shuffles,
    * zero state, append at any rate — live token accounting for a
    * landing feed (the per-batch face of q_text_bpe_token_stats'
    * budgeting role). Vocabulary changes are a redeploy: tokens must
    * mean the same thing across the whole corpus, so an online-mutating
    * vocab would be wrong, not just stale (the DSIR-model argument).
    */
  def bpeEncodeStream(docs: DataFrame): DataFrame =
    graft.queries.TextQueries.bpeEncodeFrameOf(docs)

  /** Streaming duplicated-window marking — the streaming face of the
    * span plane: each arriving document's word-8-gram windows (the
    * shared TextQueries.windowPositionsOf builder, so stream and batch
    * cannot drift) probe the PERSISTED corpus window-hash index; the
    * output is the marked-window stream (doc_id, i) — per-WINDOW
    * verdicts, deliberately un-aggregated so the job is STATELESS
    * (explode is a flatMap, the index probe one stream-static
    * semi-join; a per-doc verdict would need a variable-width streaming
    * aggregation and watermark state). Downstream batch passes (the
    * island/span merge, the strip) group the marks exactly as the batch
    * rows do. Batch-internal repeats are intentionally NOT part of the
    * stream contract — micro-batch boundaries are arbitrary, so a
    * within-batch >= 2 rule would make verdicts depend on batching; the
    * ingest's batch report (Orchestrator.spanReportAgainstIndex) owns
    * that rule at indexing time.
    */
  def spanMarkStream(docs: DataFrame, corpusWindowIdx: DataFrame): DataFrame =
    graft.queries.TextQueries.windowPositionsOf(docs)
      .join(corpusWindowIdx.select(col("h")), Seq("h"), "left_semi")
      .select(col("doc_id"), col("i"))

  /** Streaming distribution-drift gate — the per-ingest face of
    * q_qa_drift_chi2: every micro-batch's per-source quality-decile
    * histogram is chi-squared against a FROZEN corpus histogram
    * (TextQueries.driftHistogramOf, built once on the warehouse corpus
    * — the train-on-warehouse, gate-the-feed shape of the DSIR and
    * calibrated gates) through the ONE shared builder
    * (TextQueries.chi2DriftOf), so stream and batch verdicts over the
    * same rows are bit-identical. foreachBatch, not a streaming
    * aggregation, because the drift CONTRACT is per-ingest-batch — a
    * running all-time histogram would dilute a drifting feed into the
    * stream's own history, and chi-square needs the batch's per-source
    * totals (a second aggregation level streaming update mode cannot
    * stack). Reports land as idempotent dwh_batch_id partitions
    * (warehouseSink discipline: a replayed micro-batch rewrites its own
    * report, never appends a duplicate). The model is frozen for the
    * DSIR reason: drift verdicts must be comparable across batches, so
    * a drifting reference would be WRONG, not just stale.
    */
  def driftGateSink(docs: DataFrame, corpusHist: DataFrame,
                    warehouse: String, checkpoint: String,
                    batchPrefix: String = "DRIFT"): org.apache.spark.sql.streaming.StreamingQuery = {
    val scope = scopeOf(checkpoint)
    // SNAPSHOT the model at sink construction: a lazy frame referenced
    // inside foreachBatch would re-read its source per micro-batch —
    // one corpus scan per ingest, and a mid-stream warehouse append
    // would silently CHANGE the "frozen" reference, making verdicts
    // incomparable across batches (the contract the docstring pins).
    // localCheckpoint materializes the |sources| x 12 cell grid once.
    val frozenHist = corpusHist.cutLineage()
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val run = new graft.run.Orchestrator.Run(
          batch.sparkSession, warehouse, f"$batchPrefix${scope}_$id%06d")
        run.writeBatch(
          graft.queries.TextQueries.chi2DriftOf(batch.toDF(), frozenHist),
          "qa/drift_chi2")
        ()
      }
      .outputMode("append")
      .start()
  }

  /** Streaming fuzzy key-match gate — the streaming face of
    * q_dedup_fuzzy_incremental: each arriving key is matched against
    * the FROZEN master variant model (GraphQueries.masterVariantModel,
    * built once on the warehouse master list and shipped as a plan
    * literal — the DSIR-gate pattern, with the same loud size cap at
    * build time) entirely MAP-SIDE: the key's deletion-neighborhood
    * hashes probe the literal map (per-variant lookups, never a
    * |master| scan), the candidate names take the exact
    * threshold-levenshtein filter, and the best match reduces with the
    * batch row's exact tiebreak (min dist, then lexicographic). Zero
    * shuffles, zero state, no watermark — append at any rate. The
    * model is frozen for the DSIR reason: match verdicts must be
    * comparable across the whole gating pass. Shares
    * FuzzyJoin.deletionVariants with the batch index build, so stream
    * and batch neighborhoods cannot drift.
    */
  def fuzzyMatchStream(keys: DataFrame, nameCol: String,
                       model: Map[Long, Seq[String]],
                       maxDist: Int): DataFrame = {
    // rename FIRST, derive everything from the renamed column — deriving
    // from col(nameCol) after the select would fail analysis for any
    // nameCol other than "name_new"
    val keyed = keys.select(col(nameCol).as("name_new"))
    val name = col("name_new")
    val idx = typedlit(model)
    val vhs = transform(
      graft.operators.FuzzyJoin.deletionVariants(name, maxDist),
      v => xxhash64(v))
    val cands = array_distinct(flatten(transform(vhs,
      h => coalesce(element_at(idx, h), array().cast("array<string>")))))
    // one O(|s|^2) distance per candidate, computed exactly once: score
    // every candidate into (dist, name) structs, drop the over-bound
    // ones (threshold levenshtein returns -1 above maxDist), and let
    // array_sort's field-order struct comparator realize the batch
    // row's exact tiebreak (min dist, then lexicographic). get(_, 0) is
    // the ANSI-safe head: null on no match, never an index error.
    val scored = array_sort(filter(
      transform(cands, c =>
        struct(levenshtein(name, c, maxDist).as("dist"), c.as("m"))),
      s => s.getField("dist") >= 0))
    keyed
      .withColumn("__best", get(scored, lit(0)))
      .withColumn("matched_master", col("__best.m"))
      .withColumn("dist", col("__best.dist").cast("long"))
      .withColumn("matched", col("__best").isNotNull)
      .drop("__best")
  }

  /** Streaming host-quality gate — the streaming face of
    * q_graph_host_gate: each arriving document left-joins the FROZEN
    * host rank table (the PageRank output a curation pipeline persists
    * — hosts-sized, so it broadcasts) and keeps iff its host clears
    * the inbound-trust cut, through the ONE shared builder
    * (GraphQueries.hostGateOf), so stream and batch verdicts cannot
    * drift. Unknown hosts surface as known_host=false, never a silent
    * pass/fail. Stream-static broadcast join, map-only after — no
    * state, no watermark, append at any rate. The rank table is frozen
    * for the DSIR reason: gate verdicts must be comparable across the
    * whole feed; rescoring the graph is a redeploy.
    */
  def hostGateStream(docs: DataFrame, hostRanks: DataFrame): DataFrame =
    graft.queries.GraphQueries.hostGateOf(docs, hostRanks)

  /** Stateless per-document link-farm gate over a streaming document
    * frame against the static (persisted) triangle-count table — the
    * hostGateStream shape on the community-density signal: broadcast
    * join + map-side verdicts, so the gate works unchanged in a
    * micro-batch pipeline with zero state and zero watermark loss.
    */
  def linkFarmGateStream(docs: DataFrame,
                         triangleCounts: DataFrame): DataFrame =
    graft.queries.GraphQueries.linkFarmGateOf(docs, triangleCounts)

  /** Stateless per-document core-depth gate over a streaming document
    * frame against the static (persisted) core-number table — the
    * hostGateStream shape on the robust-embedding signal, through the
    * ONE shared builder (GraphQueries.coreGateOf) so stream, batch row
    * and table face cannot drift. The threshold is a call-site choice
    * reading the one decomposition table — per-source cuts without a
    * re-peel, in the stream too.
    */
  def coreGateStream(docs: DataFrame, coreNumbers: DataFrame,
                     minCore: Long): DataFrame =
    graft.queries.GraphQueries.coreGateOf(docs, coreNumbers, minCore)

  case class PendingProbe(event_id: Long, tsMicros: Long)
  case class Conversion(event_id: Long, user_id: Long, ts: Timestamp,
                        converted: Boolean,
                        matched_event_id: Option[Long],
                        delay_seconds: Option[Double])

  /** Streaming conversion attribution (the funnel pattern): every
    * probe-type event either converts to the EARLIEST quote-type event
    * of the same key within `horizon` — emitted the moment that quote
    * arrives — or is emitted unconverted once the event-time watermark
    * passes its deadline (probe time + horizon). This is the streaming
    * form of a forward as-of join with a horizon (AsofJoin.forward +
    * in-window clamp), and the timeout half is what batch cannot do:
    * the "did NOT convert" verdict fires as soon as it is KNOWABLE,
    * horizon + lateness after the probe, not at end-of-day.
    *
    * State per key = only the probes still inside their horizon
    * (bounded by probe rate x horizon); quotes are never stored —
    * within a micro-batch rows process in event-time order, and a quote
    * matches (and clears) every pending probe at or before it. The
    * cross-batch contract is therefore ARRIVAL-ORDER: because quotes
    * are not buffered, ANY probe that arrives in a later micro-batch
    * than its matching quote (probe ts <= quote ts, both inside
    * watermark lateness) will not convert — not only probes that had
    * already timed out. An in-event-time-order stream matches batch
    * q_funnel_conversion exactly; shuffled cross-batch arrival is
    * best-effort. For exact-under-permutation semantics use
    * [[conversionStreamExact]] (watermark-buffered both sides, verdicts
    * emitted when knowable against the watermark), or route late data
    * through the batch operator. The trade is verdict latency: this
    * variant converts the instant the quote ARRIVES, the exact one
    * `lateness` after the quote's event time.
    */
  def conversionStream(events: Dataset[Event], probeType: String,
                       quoteType: String, horizon: java.time.Duration,
                       lateness: String = "10 minutes"): Dataset[Conversion] = {
    import events.sparkSession.implicits._
    val hMicros = horizon.toNanos / 1000L
    events
      // watermark BEFORE the type filter: every event advances event
      // time, so an unconverted verdict still fires when only unrelated
      // event types flow (filtered-first would freeze the clock — and
      // the timeout with it — whenever no probes/quotes arrive)
      .withWatermark("ts", lateness)
      .filter(e => e.event_type == probeType || e.event_type == quoteType)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Seq[PendingProbe], Conversion](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[Seq[PendingProbe]]) =>
          def expire(pending: Seq[PendingProbe], wmMicros: Long) = {
            val (dead, alive) = pending.partition(_.tsMicros + hMicros < wmMicros)
            (dead.map(p => Conversion(p.event_id, user, microsToTs(p.tsMicros),
              converted = false, None, None)), alive)
          }
          val wm = state.getCurrentWatermarkMs() * 1000L
          if (state.hasTimedOut) {
            val (out, alive) = expire(state.getOption.getOrElse(Seq.empty), wm)
            if (alive.isEmpty) state.remove()
            else {
              state.update(alive)
              state.setTimeoutTimestamp(math.max(
                (alive.map(_.tsMicros).min + hMicros) / 1000L,
                state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          } else {
            var pending = state.getOption.getOrElse(Seq.empty)
            val out = Seq.newBuilder[Conversion]
            // FORWARD tie order: probes BEFORE quotes at equal
            // timestamps, so an equal-ts quote sees the probe pending
            // (the p.ts <= q.ts inclusive bound) — the mirror of the
            // backward enrich's quote-first order. Among equal-ts
            // quotes the LARGEST event_id processes first and takes the
            // match — the same max-tieBreak rule as AsofJoin.forward.
            // bitwise complement (not arithmetic negation) for the
            // descending quote order: -Long.MinValue overflows to itself
            rows.toSeq.sortBy(e =>
              (tsMicros(e.ts), if (e.event_type == probeType) 0 else 1,
                if (e.event_type == quoteType) ~e.event_id else e.event_id))
              .foreach { e =>
              if (e.event_type == probeType)
                pending = pending :+ PendingProbe(e.event_id, tsMicros(e.ts))
              else {
                val q = tsMicros(e.ts)
                val (hit, miss) = pending.partition(p =>
                  p.tsMicros <= q && q <= p.tsMicros + hMicros)
                hit.foreach(p => out += Conversion(p.event_id, user,
                  microsToTs(p.tsMicros), converted = true, Some(e.event_id),
                  Some((q - p.tsMicros) / 1e6)))
                pending = miss
              }
            }
            // probes whose deadline the watermark already passed (the
            // quote never came) leave as unconverted now
            val (dead, alive) = expire(pending, wm)
            out ++= dead
            if (alive.nonEmpty) {
              state.update(alive)
              state.setTimeoutTimestamp(math.max(
                (alive.map(_.tsMicros).min + hMicros) / 1000L,
                state.getCurrentWatermarkMs() + 1))
            } else state.remove()
            out.result().iterator
          }
      }
  }

  case class ConvExactBuf(quotes: Seq[QuoteState], probes: Seq[PendingProbe])

  /** EXACT-under-permutation conversion attribution — the
    * watermark-buffered form of [[conversionStream]], closing its
    * documented arrival-order gap: a probe arriving in a later
    * micro-batch than its matching quote still converts. Both sides
    * buffer in GroupState; a probe's verdict emits as soon as it is
    * KNOWABLE against the watermark rather than on arrival order:
    *
    *  - CONVERTED once the watermark strictly passes its earliest
    *    in-window quote (any later-arriving quote has event time at or
    *    above the watermark, so it can be neither earlier nor an
    *    equal-ts/larger-id tie) — not at the deadline, so a conversion
    *    still fires ~lateness after the quote, mirroring the eager
    *    variant's fire-on-quote up to the lateness delay;
    *  - UNCONVERTED once the watermark strictly passes the probe's
    *    deadline (probe ts + horizon) with no in-window quote buffered.
    *
    * State per key stays bounded by rate x (horizon + lateness): quotes
    * are dropped the moment they are both behind the watermark and
    * outside every pending probe's window (future probes arrive at or
    * above the watermark, so a behind-watermark quote can never enter a
    * new window). StreamingSpec proves streaming == the batch
    * forward-as-of-with-horizon semantics on a seeded random arrival
    * permutation across micro-batches, restart-safe.
    */
  def conversionStreamExact(events: Dataset[Event], probeType: String,
                            quoteType: String, horizon: java.time.Duration,
                            lateness: String = "10 minutes"): Dataset[Conversion] = {
    import events.sparkSession.implicits._
    val hMicros = horizon.toNanos / 1000L
    events
      .withWatermark("ts", lateness) // BEFORE the filter, as always
      .filter(e => e.event_type == probeType || e.event_type == quoteType)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ConvExactBuf, Conversion](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[ConvExactBuf]) =>
          val prior = state.getOption.getOrElse(ConvExactBuf(Nil, Nil))
          var quotes = prior.quotes
          var probes = prior.probes
          if (!state.hasTimedOut) rows.foreach { e =>
            if (e.event_type == quoteType)
              quotes = quotes :+ QuoteState(tsMicros(e.ts), e.event_id, e.value)
            else probes = probes :+ PendingProbe(e.event_id, tsMicros(e.ts))
          }
          val wm = state.getCurrentWatermarkMs() * 1000L
          val out = Seq.newBuilder[Conversion]
          val still = Seq.newBuilder[PendingProbe]
          var wakes = List.empty[Long]
          probes.sortBy(p => (p.tsMicros, p.event_id)).foreach { p =>
            val cands = quotes.filter(q =>
              p.tsMicros <= q.tsMicros && q.tsMicros <= p.tsMicros + hMicros)
            // earliest quote wins; at equal ts the LARGEST event_id
            // (bitwise complement orders descending without overflow)
            val best =
              if (cands.isEmpty) None
              else Some(cands.minBy(q => (q.tsMicros, ~q.event_id)))
            best match {
              case Some(q) if q.tsMicros < wm =>
                out += Conversion(p.event_id, user, microsToTs(p.tsMicros),
                  converted = true, Some(q.event_id),
                  Some((q.tsMicros - p.tsMicros) / 1e6))
              case None if p.tsMicros + hMicros < wm =>
                out += Conversion(p.event_id, user, microsToTs(p.tsMicros),
                  converted = false, None, None)
              case Some(q) => still += p; wakes ::= q.tsMicros
              case None    => still += p; wakes ::= p.tsMicros + hMicros
            }
          }
          val remaining = still.result()
          val kept = quotes.filter(q => q.tsMicros >= wm ||
            remaining.exists(p =>
              p.tsMicros <= q.tsMicros && q.tsMicros <= p.tsMicros + hMicros))
          if (remaining.isEmpty && kept.isEmpty) state.remove()
          else {
            state.update(ConvExactBuf(kept, remaining))
            // wake at the earliest verdict point; with no probes left,
            // at the earliest quote so the buffer GCs even on a key
            // that only ever sees quotes
            val next =
              if (wakes.nonEmpty) Some(wakes.min)
              else kept.map(_.tsMicros).reduceOption(_ min _)
            next.foreach(n => state.setTimeoutTimestamp(
              math.max(n / 1000L, state.getCurrentWatermarkMs() + 1)))
          }
          out.result().iterator
      }
  }

  case class DocTok(source: String, doc_id: Long, n_tokens: Long)
  case class PackedDoc(source: String, doc_id: Long, n_tokens: Long,
                       tok_offset: Long, first_bin: Long, last_bin: Long)

  /** Continuous sequence packing: the streaming form of
    * q_pack_sequences — an incoming document stream is packed into
    * fixed-budget context windows per source, with one running token
    * offset held in GroupState per source key. State is ONE long per
    * source (shards across executors); within a micro-batch documents
    * pack in doc_id order, so replaying a batch reproduces identical
    * offsets. The global-order batch variant needs the whole corpus;
    * this is the form a 24/7 ingest pipeline actually runs.
    */
  def packDocsStream(docs: Dataset[DocTok], budget: Long): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[Long, PackedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (src, rows, state: GroupState[Long]) =>
          var off = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_.doc_id).map { d =>
            val p = PackedDoc(src, d.doc_id, d.n_tokens, off,
              off / budget, (off + math.max(d.n_tokens - 1, 0)) / budget)
            off += d.n_tokens
            p
          }
          state.update(off)
          out.iterator
      }
  }

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  /** Stream-stream interval join — the streaming face of
    * operators/RangeBinJoin (batch oracle row q_join_range_binned):
    * pair each left event with the right events of the same key whose
    * time falls in `(l.ts, l.ts + horizon]`. This one is NATIVE in
    * Structured Streaming: an equi condition plus an event-time range
    * gives Spark exactly the state-retention bound it needs — the left
    * watermark tells it when a right row can no longer find future
    * partners (and vice versa), so both state stores evict by horizon +
    * lateness instead of growing with the stream. INNER semantics (the
    * batch operator's LEFT form needs the watermark to close a row
    * before emitting its no-partner result; Spark supports that too via
    * left outer stream-stream join, at the cost of results delayed by
    * the watermark — we keep the inner form as the canonical pattern).
    *
    * @param left    streaming events frame (the probe side)
    * @param right   streaming events frame (the match side)
    * @param horizon join window, e.g. "1 hour" (also bounds state)
    */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
                         horizon: String = "1 hour"): DataFrame = {
    val l = left.select(col("event_id").as("l_id"),
        col("event_type").as("l_type"), col("ts").as("l_ts"))
      .withWatermark("l_ts", "10 minutes")
    val r = right.select(col("event_id").as("r_id"),
        col("event_type").as("r_type"), col("ts").as("r_ts"),
        col("value").as("r_value"))
      .withWatermark("r_ts", "10 minutes")
    l.join(r,
      col("l_type") === col("r_type") &&
        col("r_ts") > col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $horizon"))
  }

  case class QuoteState(tsMicros: Long, event_id: Long, value: Double)
  case class AsofEnriched(event_id: Long, user_id: Long, ts: Timestamp,
                          matched_ts: Option[Timestamp],
                          matched_event_id: Option[Long],
                          matched_value: Option[Double])

  private def tsMicros(t: Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

  private def microsToTs(m: Long): Timestamp = Timestamp.from(
    java.time.Instant.ofEpochSecond(
      Math.floorDiv(m, 1000000L), Math.floorMod(m, 1000000L) * 1000L))

  /** Streaming backward as-of enrich — the streaming face of
    * operators/AsofJoin (batch oracle row q_join_asof): every probe-type
    * event is enriched with the latest quote-type event of the same user
    * at or before it. State is ONE small record per key (the current
    * best quote), so the store is bounded by key cardinality, not stream
    * length, and shards across executors like any keyed state.
    *
    * Within a micro-batch rows are processed in full event-time order
    * with the SAME tie rules as the batch operator (equal-timestamp
    * quotes visible to probes, max event_id wins among tied quotes), so
    * an in-event-time-order stream produces exactly the batch as-of
    * result — StreamingSpec asserts streaming ≡ AsofJoin.backward,
    * including a quote and its probes split across micro-batches.
    * ACROSS batches the enrich is necessarily arrival-order best-effort:
    * a quote arriving after a probe was already emitted cannot
    * retroactively re-enrich it (the same contract as any streaming
    * stream-static/lookup enrich; route late data through the batch
    * operator if retroactive joins are required).
    */
  def asofEnrichStream(events: Dataset[Event], probeType: String,
                       quoteType: String): Dataset[AsofEnriched] = {
    import events.sparkSession.implicits._
    events
      .filter(e => e.event_type == probeType || e.event_type == quoteType)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[QuoteState, AsofEnriched](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[QuoteState]) =>
          var best = state.getOption
          // event-time order; at equal (ts, kind) larger event_id later;
          // quotes before probes at the same timestamp (inclusive bound)
          val ordered = rows.toSeq.sortBy(e =>
            (tsMicros(e.ts), if (e.event_type == quoteType) 0 else 1, e.event_id))
          val out = Seq.newBuilder[AsofEnriched]
          ordered.foreach { e =>
            if (e.event_type == quoteType) {
              val m = tsMicros(e.ts)
              if (best.forall(b =>
                  m > b.tsMicros || (m == b.tsMicros && e.event_id > b.event_id)))
                best = Some(QuoteState(m, e.event_id, e.value))
            } else {
              out += AsofEnriched(e.event_id, user, e.ts,
                best.map(b => microsToTs(b.tsMicros)),
                best.map(_.event_id), best.map(_.value))
            }
          }
          best.foreach(state.update)
          out.result().iterator
      }
  }
  case class AsofExactBuf(quotes: Seq[QuoteState], probes: Seq[PendingProbe])

  /** EXACT-under-permutation streaming backward as-of enrich — the
    * watermark-buffered form of [[asofEnrichStream]]. Where the eager
    * variant emits each probe on arrival (arrival-order best-effort
    * across micro-batches), this one holds BOTH sides in GroupState and
    * emits a probe's verdict only once the event-time watermark has
    * strictly passed the probe's timestamp: from that point Spark drops
    * any later-arriving quote at-or-before the probe as late data, so
    * the "latest quote <= probe.ts" answer is final no matter which
    * micro-batch each row arrived in. Streaming == AsofJoin.backward
    * for every arrival permutation of non-late rows (StreamingSpec
    * proves it on a seeded random shuffle across batches, restart-safe).
    *
    * State per key is bounded by the lateness window, not the stream:
    * pending probes still inside lateness, quotes not yet passed by the
    * watermark, plus ONE compressed best-quote record for everything
    * older (any future probe has ts >= watermark, so only the max
    * (ts, event_id) quote below the watermark can ever win again —
    * the same one-record bound the eager variant keeps). EventTime
    * timeouts both flush resolvable probes when only unrelated traffic
    * advances the clock and shrink the quote buffer back to one record.
    * The trade against the eager variant is the inherent one: verdicts
    * arrive `lateness` after event time instead of immediately.
    */
  def asofEnrichStreamExact(events: Dataset[Event], probeType: String,
                            quoteType: String,
                            lateness: String = "10 minutes"): Dataset[AsofEnriched] = {
    import events.sparkSession.implicits._
    events
      // watermark BEFORE the type filter — unrelated event types must
      // still advance the clock (same rule as conversionStream)
      .withWatermark("ts", lateness)
      .filter(e => e.event_type == probeType || e.event_type == quoteType)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofExactBuf, AsofEnriched](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[AsofExactBuf]) =>
          val prior = state.getOption.getOrElse(AsofExactBuf(Nil, Nil))
          var quotes = prior.quotes
          var probes = prior.probes
          if (!state.hasTimedOut) rows.foreach { e =>
            if (e.event_type == quoteType)
              quotes = quotes :+ QuoteState(tsMicros(e.ts), e.event_id, e.value)
            else probes = probes :+ PendingProbe(e.event_id, tsMicros(e.ts))
          }
          val wm = state.getCurrentWatermarkMs() * 1000L
          // resolve BEFORE compressing: probes strictly below the
          // watermark are final (future quotes all have ts >= wm)
          val (done, still) = probes.partition(_.tsMicros < wm)
          val out = done.sortBy(p => (p.tsMicros, p.event_id)).map { p =>
            val best = quotes.filter(_.tsMicros <= p.tsMicros)
              .sortBy(q => (q.tsMicros, q.event_id)).lastOption
            AsofEnriched(p.event_id, user, microsToTs(p.tsMicros),
              best.map(b => microsToTs(b.tsMicros)), best.map(_.event_id),
              best.map(_.value))
          }
          // compress: quotes strictly below the watermark collapse to
          // the single best — every surviving/future probe sits at or
          // above the watermark, so only the max can ever match again
          val (old, fresh) = quotes.partition(_.tsMicros < wm)
          val kept = old.sortBy(q => (q.tsMicros, q.event_id)).lastOption.toSeq ++ fresh
          if (still.isEmpty && kept.isEmpty) state.remove()
          else {
            state.update(AsofExactBuf(kept, still))
            // wake once the watermark passes the earliest pending probe
            // (to emit it) or uncompressed quote (to shrink the buffer);
            // a lone compressed record needs no timeout — it is the
            // same one-record-per-key residency as the eager variant
            (still.map(_.tsMicros) ++ fresh.map(_.tsMicros))
              .reduceOption(_ min _)
              .foreach(n => state.setTimeoutTimestamp(
                math.max(n / 1000L, state.getCurrentWatermarkMs() + 1)))
          }
          out.iterator
      }
  }

  case class SessionBuf(start: Long, lastTs: Long, n: Long, value: Double)
  case class ClosedSession(user_id: Long, session_start: Timestamp,
                           n_events: Long, session_value: Double)

  private val GapMs = 30L * 60 * 1000

  /** Custom-state sessionization via flatMapGroupsWithState — the
    * explicit-GroupState form of sessionStats, for session semantics
    * session_window can't express (e.g. richer per-session payloads).
    * Emits a session when a new event closes it by gap, or when the
    * event-time timeout fires (watermark passed the open session's gap
    * deadline). State is one small buffer per user — shards across
    * executors, evicted on timeout, no unbounded growth.
    */
  def sessionizeCustomState(events: Dataset[Event]): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuf, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionBuf]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(b =>
              ClosedSession(user, new Timestamp(b.start), b.n, b.value)).toList
            state.remove()
            out.iterator
          } else {
            val closed = List.newBuilder[ClosedSession]
            var buf = state.getOption
            rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              buf match {
                case Some(b) if e.ts.getTime - b.lastTs <= GapMs =>
                  buf = Some(b.copy(lastTs = math.max(b.lastTs, e.ts.getTime),
                    n = b.n + 1, value = b.value + e.value))
                case Some(b) =>
                  closed += ClosedSession(user, new Timestamp(b.start), b.n, b.value)
                  buf = Some(SessionBuf(e.ts.getTime, e.ts.getTime, 1, e.value))
                case None =>
                  buf = Some(SessionBuf(e.ts.getTime, e.ts.getTime, 1, e.value))
              }
            }
            buf.foreach { b =>
              state.update(b)
              // deadline must sit above the current watermark
              state.setTimeoutTimestamp(
                math.max(b.lastTs + GapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }

  case class PendingEvt(tsMicros: Long, event_id: Long, event_type: String)
  case class Transition(user_id: Long, cur_event: String,
                        next_event: String, cur_ts: Timestamp,
                        cur_event_id: Long)

  /** EXACT-under-permutation streaming event transitions — the
    * streaming face of q_events_transitions' LEAD pairing (downstream,
    * a watermarked groupBy over the emitted rows yields the running
    * Markov matrix). Each per-user event pairs with its SUCCESSOR in
    * final event-time order (ts, event_id); the pair (e1 -> e2) is
    * emitted only once the event-time watermark has STRICTLY passed
    * e2's timestamp: from then on every non-late future arrival has
    * ts >= watermark > e2.ts, so nothing can ever slot between e1 and
    * e2 and the pairing is final no matter which micro-batch each row
    * arrived in (the asofEnrichStreamExact discipline). Emitting
    * consumes e1; e2 becomes the head awaiting ITS successor.
    *
    * State per key is bounded by the lateness window: the buffer holds
    * at most the events whose successor is not yet watermark-final —
    * everything older has been consumed — plus one head element.
    * EventTime timeouts flush pairs when only other keys' traffic
    * advances the clock.
    */
  def transitionsStreamExact(events: Dataset[Event],
                             lateness: String = "10 minutes"): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Seq[PendingEvt], Transition](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[Seq[PendingEvt]]) =>
          // Stored state is ALWAYS (ts, event_id)-sorted (every update
          // below writes the sorted remainder), so a timeout-only
          // invocation pays no sort at all, and an invocation with k
          // new rows pays one O((n+k) log(n+k)) array sort — never the
          // O(n^2) per-batch cost of List :+ appends, which a hot user
          // with a deep lateness buffer would otherwise hit every
          // micro-batch.
          val prev = state.getOption.getOrElse(Seq.empty)
          val added = scala.collection.mutable.ArrayBuffer.empty[PendingEvt]
          if (!state.hasTimedOut) rows.foreach { e =>
            added += PendingEvt(tsMicros(e.ts), e.event_id, e.event_type)
          }
          val merged: Array[PendingEvt] =
            if (added.isEmpty) prev.toArray
            else {
              val a = new Array[PendingEvt](prev.length + added.length)
              prev.copyToArray(a)
              added.copyToArray(a, prev.length)
              java.util.Arrays.sort(a, Ordering.by(
                (p: PendingEvt) => (p.tsMicros, p.event_id)))
              a
            }
          val wm = state.getCurrentWatermarkMs() * 1000L
          val out = Seq.newBuilder[Transition]
          var i = 0
          while (merged.length - i >= 2 && merged(i + 1).tsMicros < wm) {
            val e1 = merged(i)
            val e2 = merged(i + 1)
            out += Transition(user, e1.event_type, e2.event_type,
              microsToTs(e1.tsMicros), e1.event_id)
            i += 1
          }
          if (i == merged.length) state.remove()
          else {
            val remaining = java.util.Arrays
              .copyOfRange(merged, i, merged.length)
            state.update(remaining.toIndexedSeq)
            // wake once the watermark passes the 2nd pending event so
            // its pair emits without needing same-key traffic; a lone
            // head has no emittable pair and needs no timeout
            if (remaining.length >= 2)
              state.setTimeoutTimestamp(
                math.max(remaining(1).tsMicros / 1000L,
                  state.getCurrentWatermarkMs() + 1))
          }
          out.result().iterator
      }
  }
}
