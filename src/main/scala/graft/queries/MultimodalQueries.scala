package graft.queries

import graft.Tables.t
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline over `documents`: text → opaque binary
  * payload column (+ metadata) → per-partition decode-stub feature
  * extraction (graft.multimodal.Multimodal). The oracle recomputes the
  * same deterministic features from the md5 hex digest in SQL, so the
  * whole binary round-trip (unhex → bytes → stats) is value-checked.
  */
object MultimodalQueries extends QueryPack {

  /** Silence cut for q_multimodal_audio_energy: a 4-sample frame of
    * uniform int16 noise has expected energy ~1.4e9, so 5e8 lands
    * mid-distribution — both verdicts occur at every SF.
    */
  private val SilenceThreshold = 500000000L

  private def media(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    Multimodal.synthesize(
      t(s, dir, "documents")
        .select(col("doc_id"), coalesce(col("text"), lit("")).as("text")))
      .as[Multimodal.MediaRecord]
  }

  val queries: Map[String, Q] = Map(
    "q_multimodal_features" -> ((s, dir) =>
      Multimodal.documentFeatures(s,
        t(s, dir, "documents")
          .select(col("doc_id"), coalesce(col("text"), lit("")).as("text")))),

    // Frame sampling over the binary payload (4-byte frames, keep every
    // 2nd): the video-sampling plumbing with the codec stubbed to byte
    // slicing — one output row per kept frame. The binary frame is
    // hex-encoded for the compare (the driver's pandas comparator can't
    // sort raw bytes); both sides emit identical uppercase hex.
    "q_multimodal_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(media(s, dir), frameBytes = 4, stride = 2)
        .withColumn("frame", hex(col("frame")))),

    // Resize stub: nearest-neighbor byte resample of the 16-byte payload
    // to the 64x64 target's 4-byte budget, metadata rewritten to match.
    // Payload hex-encoded for the compare, same as frames above.
    "q_multimodal_resize" -> ((s, dir) => {
      import s.implicits._
      Multimodal.resize(media(s, dir), 64, 64).toDF()
        .withColumn("payload", hex(col("payload")))
    }),

    // Exact media dedup — the byte-identical-payload face of W1/exact
    // dedup for binary columns (re-scraped images, mirrored audio): one
    // hash group-by per (modality, payload digest), keep-first verdict
    // by min doc_id. At 100 TB the group key is the 16-byte digest, not
    // the payload — a real build hashes each blob map-side (here the
    // synthetic payload IS its digest) and shuffles only (kind, digest,
    // doc_id), so dedup cost is independent of media size.
    // Audio frame energy + silence verdict over the binary payload
    // decoded as BE int16 PCM (decode stubbed; the Spark plumbing —
    // modality routing, per-partition decode, frame explosion — is
    // real). 4-sample frames of the 8-sample fake => 2 frames/doc; the
    // threshold sits mid-distribution so both verdicts occur.
    "q_multimodal_audio_energy" -> ((s, dir) =>
      Multimodal.audioFrameEnergy(media(s, dir), samplesPerFrame = 4,
        silenceThreshold = SilenceThreshold).toDF()),

    "q_multimodal_dedup" -> ((s, dir) =>
      media(s, dir)
        .groupBy(col("kind"), hex(col("payload")).as("payload_md5"))
        .agg(min(col("doc_id")).as("keep_doc_id"),
          count(lit(1)).as("n_copies"))))

  val oracleSql: Map[String, String] = Map(
    "q_multimodal_features" ->
      """WITH hexed AS (
           SELECT doc_id, md5(COALESCE(text, '')) AS h FROM documents),
         summed AS (
           SELECT doc_id, h,
                  CAST(list_sum(list_transform(range(16),
                    i -> CAST(CONCAT('0x', SUBSTRING(h, CAST(2*i+1 AS INT), 2))
                         AS BIGINT))) AS BIGINT) AS byte_sum
           FROM hexed)
         SELECT doc_id,
                CASE WHEN doc_id % 3 = 0 THEN 'image'
                     WHEN doc_id % 3 = 1 THEN 'audio'
                     ELSE 'video' END AS kind,
                CAST(16 AS BIGINT) AS n_bytes,
                CAST(CONCAT('0x', SUBSTRING(h, 1, 2)) AS BIGINT) AS first_byte,
                byte_sum,
                CAST(byte_sum AS DOUBLE) / 16 AS mean_byte
         FROM summed""",
    "q_multimodal_frames" ->
      """WITH hexed AS (
           SELECT doc_id, md5(COALESCE(text, '')) AS h FROM documents)
         SELECT doc_id,
                CASE WHEN doc_id % 3 = 0 THEN 'image'
                     WHEN doc_id % 3 = 1 THEN 'audio'
                     ELSE 'video' END AS kind,
                CAST(f AS BIGINT) AS frame_index,
                UPPER(SUBSTRING(h, CAST(8*f + 1 AS INT), 8)) AS frame
         FROM hexed, (SELECT unnest([0, 2]) AS f)""",
    "q_multimodal_resize" ->
      """WITH hexed AS (
           SELECT doc_id, md5(COALESCE(text, '')) AS h FROM documents)
         SELECT doc_id,
                CASE WHEN doc_id % 3 = 0 THEN 'image'
                     WHEN doc_id % 3 = 1 THEN 'audio'
                     ELSE 'video' END AS kind,
                CAST(64 AS INT) AS width,
                CAST(64 AS INT) AS height,
                UPPER(CONCAT(SUBSTRING(h, 1, 2), SUBSTRING(h, 9, 2),
                             SUBSTRING(h, 17, 2), SUBSTRING(h, 25, 2))) AS payload
         FROM hexed""",
    // BE int16 decode of consecutive md5-hex byte pairs; DuckDB's
    // '0x…' string cast parses the hex (the PQ-oracle idiom)
    "q_multimodal_audio_energy" ->
      s"""WITH hexed AS (
           SELECT doc_id, md5(COALESCE(text, '')) AS h
           FROM documents WHERE doc_id % 3 = 1),
         samp AS (
           SELECT doc_id, CAST(t.i AS BIGINT) AS i,
                  CAST(CONCAT('0x',
                    SUBSTRING(h, CAST(4*t.i + 1 AS INT), 4)) AS BIGINT) AS u
           FROM hexed, range(8) t(i)),
         sgn AS (
           SELECT doc_id, i,
                  CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS s
           FROM samp)
         SELECT doc_id, CAST(i // 4 AS BIGINT) AS frame_index,
                CAST(SUM(s*s) AS BIGINT) AS energy,
                CAST(SUM(s*s) AS BIGINT) < $SilenceThreshold AS is_silence
         FROM sgn GROUP BY doc_id, i // 4""",

    "q_multimodal_dedup" ->
      """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                     WHEN doc_id % 3 = 1 THEN 'audio'
                     ELSE 'video' END AS kind,
                UPPER(md5(COALESCE(text, ''))) AS payload_md5,
                MIN(doc_id) AS keep_doc_id,
                COUNT(*) AS n_copies
         FROM documents
         GROUP BY 1, 2""")
}
