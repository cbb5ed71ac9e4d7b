package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride through
  * the engine as opaque `binary` columns with typed metadata, and
  * decode / feature-extraction runs as per-partition imperative logic
  * over a typed Dataset (the Scala analog of mapInPandas batches).
  *
  * The decode step is a STUB by design — no image/audio codecs exist in
  * this environment — implemented as a deterministic fake (md5-derived
  * payload bytes, byte-statistics "features"), so the Spark-side
  * plumbing that matters at 100 TB is real and testable: binary column
  * schema, metadata struct, per-partition batch iteration, and a
  * shuffle-free narrow pipeline (synthesize → featurize is map-only).
  */
object Multimodal {

  /** One media row: payload is opaque bytes + enough metadata to route
    * decode (the reference's file-plane analog: bytes + manifest entry).
    */
  case class MediaRecord(
      doc_id: Long,
      kind: String,
      width: Int,
      height: Int,
      payload: Array[Byte])

  case class MediaFeatures(
      doc_id: Long,
      kind: String,
      n_bytes: Long,
      first_byte: Long,
      byte_sum: Long,
      mean_byte: Double)

  /** Attach a deterministic fake payload to each document: 16 md5 bytes
    * of the text (a real `BinaryType` column) plus metadata columns.
    * NULL text coalesces to '' exactly like every multimodal oracle's
    * `md5(COALESCE(text,''))` — without it a NULL row would carry a
    * NULL payload, diverge from the oracle, and NPE in the decode
    * paths that read `payload.length`.
    */
  def synthesize(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      (col("doc_id") % 640 + 16).cast(IntegerType).as("width"),
      (col("doc_id") % 480 + 16).cast(IntegerType).as("height"),
      unhex(md5(coalesce(col("text"), lit("")))).as("payload"))

  /** Decode-stub + feature extraction as imperative per-partition code
    * over the typed Dataset — where a real build would call the codec
    * on each payload. Narrow (no shuffle); batches stream through the
    * partition iterator without materializing the whole partition.
    */
  def featurize(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val bytes = m.payload.map(_ & 0xff)
        MediaFeatures(
          doc_id = m.doc_id,
          kind = m.kind,
          n_bytes = bytes.length.toLong,
          first_byte = if (bytes.isEmpty) -1L else bytes.head.toLong,
          byte_sum = bytes.foldLeft(0L)(_ + _),
          mean_byte = if (bytes.isEmpty) 0.0
                      else bytes.foldLeft(0L)(_ + _).toDouble / bytes.length)
      }
    }
  }

  /** End-to-end: documents → binary media column → decoded features. */
  def documentFeatures(s: SparkSession, documents: DataFrame): DataFrame = {
    import s.implicits._
    featurize(synthesize(documents).as[MediaRecord]).toDF()
  }

  /** Resize stub: a real codec would decode, scale to (w, h) and
    * re-encode; the deterministic fake resamples the payload bytes to
    * the target length by index scaling (nearest-neighbor over the byte
    * stream), keeping metadata consistent. Narrow, streaming through
    * the partition iterator like featurize.
    */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    val targetLen = math.max(1, (w * h) / 1024)
    media.mapPartitions(_.map { m =>
      val src = m.payload
      val out =
        if (src.isEmpty) src
        else Array.tabulate(targetLen)(i => src((i * src.length) / targetLen))
      m.copy(width = w, height = h, payload = out)
    })
  }

  /** Frame-sample stub: treat the payload as fixed-size frames and keep
    * every `stride`-th frame — the shape of video frame sampling with
    * the codec stubbed to byte-block slicing. Emits one row per kept
    * frame: (doc_id, kind, frame_index, frame: binary).
    */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int,
                   stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      m.payload.grouped(frameBytes).zipWithIndex
        .collect { case (frame, i) if i % stride == 0 =>
          (m.doc_id, m.kind, i.toLong, frame)
        }
    }.toDF("doc_id", "kind", "frame_index", "frame")
  }

  case class AudioFrameEnergy(
      doc_id: Long,
      frame_index: Long,
      energy: Long,
      is_silence: Boolean)

  /** Audio feature stub — the voice-activity / trim-silence shape: the
    * payload decodes as big-endian signed 16-bit PCM (a real build
    * calls the audio codec here), each `samplesPerFrame` window scores
    * energy = Σ sample² (exact integers, so the oracle compares
    * hash-exactly), and frames under `silenceThreshold` flag as
    * silence. Routed to AUDIO rows only — a real pipeline dispatches
    * per modality, and running a PCM decode over image bytes would be
    * garbage-in. Narrow/map-only like every decode stub here; at
    * 100 TB the frame explosion is payload-proportional and stays
    * inside the partition (no shuffle until someone aggregates).
    */
  def audioFrameEnergy(media: Dataset[MediaRecord], samplesPerFrame: Int,
                       silenceThreshold: Long): Dataset[AudioFrameEnergy] = {
    require(samplesPerFrame >= 1,
      s"audioFrameEnergy: samplesPerFrame must be >= 1, got $samplesPerFrame")
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions(_.flatMap { m =>
      val n = m.payload.length / 2
      val samples = Array.tabulate(n) { i =>
        (((m.payload(2 * i) & 0xff) << 8)
          | (m.payload(2 * i + 1) & 0xff)).toShort.toLong
      }
      samples.grouped(samplesPerFrame).zipWithIndex.map { case (fr, i) =>
        val e = fr.foldLeft(0L)((a, s) => a + s * s)
        AudioFrameEnergy(m.doc_id, i.toLong, e, e < silenceThreshold)
      }
    })
  }
}
